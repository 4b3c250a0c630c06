"""Multi-touch marketing attribution over an event log.

The conversion-credit layer on top of the temporal toolkit
(temporal.py sessionizes, this module answers "which channel gets
credit for the purchase"): every conversion event is joined to the
touch events that preceded it within a lookback window, and each
(conversion, touch) pair is scored under the five standard
attribution models in ONE window pass:

- ``last_touch`` / ``first_touch``: all credit to the latest /
  earliest touch;
- ``linear``: 1/k to each of the k touches;
- ``time_decay``: exponential half-life weights ``2^(−Δt/halflife)``
  normalized per conversion;
- ``position``: U-shaped 40/20/40 (first 0.4, last 0.4, middle
  touches share 0.2; degenerate k=1 → 1.0, k=2 → 0.5/0.5).

Each model's credits sum to exactly 1.0 per touched conversion, so a
channel report under any model sums to the number of touched
conversions — a useful invariant the tests pin.

Scale shape: the only join is the user-key equi-join between the
conversion slice and the touch slice of the SAME relation — both
sides shuffle once on ``user_id`` and the time predicate is applied
inside the join (no row amplification beyond true pairs). Per-user
pair fan-out is bounded by touch density × lookback; for adversarial
heavy users, pre-bucket by (user, day) with
``temporal.interval_bucket_join``'s bucket trick. The scoring windows
partition by conversion id (cardinality = conversions, never total
events), and the final report is a map-side-combinable aggregation on
the low-cardinality channel key.

Reference scope note: the reference engine (master.py:27-150) is
K-Means only; attribution is extension scope per the build brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DAY_NS = 24 * 3_600 * 1_000_000_000


def touch_conversion_pairs(
    events: DataFrame,
    conv_type: str,
    touch_types: Sequence[str],
    channel: Column,
    lookback_ns: int = 7 * DAY_NS,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """(conversion, touch) pairs within the lookback window.

    Returns ``(conv_id, conv_ts, touch_id, touch_ts, channel, rn, k)``
    where ``rn`` is the touch's 1-based position in the conversion's
    path (ordered by time, event-id tie-break — deterministic under
    retries) and ``k`` the path length. Touches strictly BEFORE the
    conversion only; ``ts_col`` must be bigint epoch-nanos (the
    engine's canonical event time, sources/loaders.py:48).
    """
    conv = events.where(F.col("event_type") == conv_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = events.where(
        F.col("event_type").isin(list(touch_types))
    ).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
        channel.alias("channel"),
    )
    pairs = conv.join(touch, on="_u").where(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.lit(lookback_ns))
    )
    w = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    wk = Window.partitionBy("conv_id")
    return pairs.select(
        "conv_id",
        "conv_ts",
        "touch_id",
        "touch_ts",
        "channel",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )


def attribution_credits(
    pairs: DataFrame, halflife_ns: int = DAY_NS
) -> DataFrame:
    """Adds the five per-model credit columns to a
    ``touch_conversion_pairs`` result. Pure window/codegen arithmetic;
    every model's credits sum to 1.0 within each conversion."""
    k = F.col("k").cast("double")
    rn = F.col("rn")
    last = F.when(rn == F.col("k"), 1.0).otherwise(0.0)
    first = F.when(rn == 1, 1.0).otherwise(0.0)
    linear = F.lit(1.0) / k
    wdecay = F.pow(
        F.lit(2.0),
        -(F.col("conv_ts") - F.col("touch_ts")).cast("double")
        / F.lit(float(halflife_ns)),
    )
    wsum = F.sum(wdecay).over(Window.partitionBy("conv_id"))
    position = (
        F.when(F.col("k") == 1, 1.0)
        .when(F.col("k") == 2, 0.5)
        .when((rn == 1) | (rn == F.col("k")), 0.4)
        .otherwise(F.lit(0.2) / (k - 2.0))
    )
    return pairs.select(
        "*",
        last.alias("last_touch"),
        first.alias("first_touch"),
        linear.alias("linear"),
        (wdecay / wsum).alias("time_decay"),
        position.alias("position"),
    )


def attribution_report(credits: DataFrame) -> DataFrame:
    """Per-channel credit totals:
    ``(channel, conversions, touches, last_touch, first_touch,
    linear, time_decay, position)`` — ``conversions`` counts distinct
    conversions the channel participated in; the credit columns are
    fractional-conversion totals under each model."""
    return credits.groupBy("channel").agg(
        F.countDistinct("conv_id").alias("conversions"),
        F.count(F.lit(1)).alias("touches"),
        F.sum("last_touch").alias("last_touch"),
        F.sum("first_touch").alias("first_touch"),
        F.sum("linear").alias("linear"),
        F.sum("time_decay").alias("time_decay"),
        F.sum("position").alias("position"),
    )


def shapley_attribution(
    events: DataFrame,
    *,
    channels: Sequence[str] = ("view", "click", "signup"),
    conv_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Shapley-value channel attribution over EXPOSURE SETS — the
    game-theoretic member of the credit-model family
    (:func:`attribution_credits` covers the path heuristics): estimate
    the coalition value v(T) as the observed conversion rate of users
    exposed to exactly channel set T, then split credit by the exact
    3-player Shapley formula

        φ_c = Σ_{T ⊆ C\\{c}} |T|!·(|C|−|T|−1)!/|C|! · [v(T∪{c}) − v(T)]

    with v(∅) = the OBSERVED conversion rate of unexposed users (the
    organic baseline), so by efficiency Σφ = v(C) − v(∅): channels
    share only the lift over organic conversion. (When no unexposed
    user converts this reduces to the v(∅) = 0 convention.) This is
    the data-driven model marketing stacks run next to last-touch —
    order-free, so it needs only per-user exposure FLAGS, not paths.

    Exactly 3 channels (8 coalition cells, weights 1/3, 1/6, 1/3) —
    the closed form stays enumerable and oracle-checkable; for larger
    C the factorial blowup wants sampling, out of scope here.

    Scale shape: one user-keyed groupBy builds 4 boolean flags, one
    8-cell conditional aggregate reduces to INTEGER (n, k) pairs per
    coalition, and the Shapley arithmetic runs driver-side on those
    integers — identical doubles in any engine, no float-order risk.

    Returns 3 rows ``(channel, n_exposed, n_converted, shapley)``.
    """
    if len(channels) != 3:
        raise ValueError(
            f"shapley_attribution is the explicit 3-channel closed "
            f"form, got {len(channels)} channels"
        )
    if conv_type in channels:
        raise ValueError(f"conversion {conv_type!r} cannot be a channel")
    t = F.col(type_col)
    flags = events.where(F.col(user_col).isNotNull()).groupBy(
        F.col(user_col)
    ).agg(
        *[
            F.max(F.when(t == ch, 1).otherwise(0)).alias(f"c{i}")
            for i, ch in enumerate(channels, 1)
        ],
        F.max(F.when(t == conv_type, 1).otherwise(0)).alias("conv"),
    )
    cells = {}
    aggs = []
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                m = (
                    (F.col("c1") == a)
                    & (F.col("c2") == b)
                    & (F.col("c3") == c)
                )
                key = f"{a}{b}{c}"
                cells[key] = m
                aggs.append(
                    F.sum(F.when(m, 1).otherwise(0))
                    .cast("long")
                    .alias(f"n{key}")
                )
                aggs.append(
                    F.sum(F.when(m, F.col("conv")).otherwise(0))
                    .cast("long")
                    .alias(f"k{key}")
                )
    s = flags.agg(*aggs).collect()[0]
    if s["n000"] is None:
        # single-row agg over an empty (or all-NULL-user) frame yields
        # NULL cells; surface a clean error instead of float(None)
        # TypeErrors downstream (ADVICE r6)
        raise ValueError(
            "shapley_attribution needs at least one user with a "
            "non-null user id"
        )

    def v(key: str) -> float:
        n = s[f"n{key}"]
        return (float(s[f"k{key}"]) / float(n)) if n > 0 else 0.0

    def phi(pos: int) -> float:
        # subsets of the other two channels: weights 1/3, 1/6, 1/6, 1/3
        def k(me: int, o1: int, o2: int) -> str:
            bits = [0, 0, 0]
            bits[pos] = me
            others = [i for i in range(3) if i != pos]
            bits[others[0]], bits[others[1]] = o1, o2
            return "".join(map(str, bits))

        return (
            (v(k(1, 0, 0)) - v(k(0, 0, 0))) / 3.0
            + (v(k(1, 1, 0)) - v(k(0, 1, 0))) / 6.0
            + (v(k(1, 0, 1)) - v(k(0, 0, 1))) / 6.0
            + (v(k(1, 1, 1)) - v(k(0, 1, 1))) / 3.0
        )

    def exposed(pos: int) -> tuple[int, int]:
        n = k = 0
        for key in cells:
            if key[pos] == "1":
                n += s[f"n{key}"]
                k += s[f"k{key}"]
        return n, k

    rows = []
    for i, ch in enumerate(channels):
        n, k = exposed(i)
        rows.append((ch, n, k, phi(i)))
    return _k_row_df(events.sparkSession, 
        rows, "channel string, n_exposed long, n_converted long, "
        "shapley double"
    )


def markov_attribution(
    events: DataFrame,
    *,
    channels: Sequence[str] = ("view", "click", "signup"),
    conv_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    rounds: int = 40,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al.) — the
    path-structure member of the credit-model family, between the
    heuristics (:func:`attribution_credits`) and the order-free game
    (:func:`shapley_attribution`): build the first-order chain over
    per-user touch paths (states start → channels → conv/null,
    truncated at the first conversion), compute the chain's absorption
    probability P(conv | start), then re-score it with each channel
    REMOVED (its inbound transition mass falls to the null sink,
    denominators unchanged — the standard removal convention). Credit
    is the normalized removal effect 1 − P₋c/P.

    Absorption probabilities come from ``rounds`` unrolled fixpoint
    iterations ``p ← P_conv + P_transient·p`` from p = 0 — a strictly
    monotone contraction, and an EXACT shared float program: the SQL
    oracle replays the identical rounds term for term (the PageRank
    in-plan-fold doctrine applied to a 4-state chain), so the hash
    gate never depends on a linear-solver's pivoting.

    Returns one row per channel:
    ``(channel, p_conv_full, p_conv_removed, removal_effect,
    credit)``.

    Scale shape: ONE user-keyed window pass builds transitions (the
    corpus reduces to ≤ (|channels|+2)² integer counts), the chain
    math runs driver-side on those integers, and nothing else touches
    the data.
    """
    if not channels or conv_type in channels:
        raise ValueError(
            "channels must be non-empty and exclude the conversion type"
        )
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    chans = list(channels)
    keep = chans + [conv_type]
    w = Window.partitionBy("_u").orderBy("_ts", "_id")
    seq = (
        events.where(
            F.col(type_col).isin(keep)
            & F.col(user_col).isNotNull()
            # NULL ts ranks NULLS-FIRST in Spark, NULLS-LAST in SQL
            # engines — exclude it from path order outright
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.col(type_col).alias("_t"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_conv_rn",
            F.min(
                F.when(F.col("_t") == conv_type, F.col("_rn"))
            ).over(Window.partitionBy("_u")),
        )
        .where(
            F.col("_conv_rn").isNull()
            | (F.col("_rn") <= F.col("_conv_rn"))
        )
    )
    steps = seq.select(
        "_u",
        "_rn",
        F.coalesce(F.lag("_t").over(w), F.lit("start")).alias("src"),
        F.when(F.col("_t") == conv_type, F.lit("conv"))
        .otherwise(F.col("_t"))
        .alias("dst"),
    )
    last = seq.groupBy("_u").agg(
        F.max_by("_t", "_rn").alias("_lt")
    ).where(F.col("_lt") != conv_type)
    terminals = last.select(
        F.col("_lt").alias("src"), F.lit("null").alias("dst")
    )
    counts = (
        steps.select("src", "dst")
        .unionAll(terminals)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cnt = {(r["src"], r["dst"]): r["n"] for r in counts}
    transient = ["start", *chans]
    out_n = {s: sum(v for (a, _), v in cnt.items() if a == s) for s in transient}

    def p(s: str, d: str) -> float:
        tot = out_n.get(s, 0)
        return (cnt.get((s, d), 0) / tot) if tot else 0.0

    def absorb(removed: "str | None") -> float:
        cur = {s: 0.0 for s in transient}
        for _ in range(rounds):
            nxt = {}
            for s in transient:
                acc = p(s, "conv")
                for d in chans:
                    if d == removed:
                        continue
                    acc = acc + p(s, d) * cur[d]
                nxt[s] = acc
            cur = nxt
        return cur["start"]

    p_full = absorb(None)
    res = []
    for c in chans:
        p_rem = absorb(c)
        re = 1.0 - p_rem / p_full if p_full > 0.0 else 0.0
        res.append([c, p_rem, re])
    total_re = sum(r[2] for r in res)
    rows = [
        (
            c,
            p_full,
            p_rem,
            re,
            (re / total_re) if total_re > 0.0 else 0.0,
        )
        for c, p_rem, re in res
    ]
    return _k_row_df(events.sparkSession, 
        rows,
        "channel string, p_conv_full double, p_conv_removed double, "
        "removal_effect double, credit double",
    )
