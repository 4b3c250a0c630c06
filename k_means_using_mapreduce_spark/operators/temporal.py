"""Temporal operators: sessionization, as-of join, time-bucket rollup.

The reference has no temporal operators at all (SURVEY.md §2: no joins,
no windows, no timestamps anywhere in its schema — `mapreduce.proto:6-9`
is x/y floats only). These are the event-time primitives a training-data
pipeline needs over the `events` stream table, built Spark-first:

- every operator is ONE shuffle on the partition key (`user_id`-style),
  then window/aggregate work that stays inside the partition — no
  self-joins, no cross products, no driver collects;
- `asof_join` uses the union-then-window formulation instead of a range
  join: at 100 TB a range join explodes into an O(n·m) interval overlap
  per key, while union+window is a single sort-merge pass per key — the
  same trick backing pandas `merge_asof`, kdb `aj`, and QuestDB ASOF;
- timestamps are plain bigint nanoseconds (what `load_table` surfaces
  for TIMESTAMP(NANOS) parquet — see sources/loaders.py); all derived
  values stay integer-exact, so oracle hashes match bit-for-bit.

Skew note: partitions are per-user. A hot user bounds one task; for
pathological single-key skew, compose with operators/skew.py salting
on the aggregate side (sessionize itself must see a user's full
ordered history, so its per-user sort is irreducible).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 30 minutes in nanoseconds — the classic web-analytics session gap.
DEFAULT_SESSION_GAP_NS = 30 * 60 * 1_000_000_000


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_ns: int = DEFAULT_SESSION_GAP_NS,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts whenever the
    user's inter-event gap exceeds ``gap_ns``.

    Classic lag-flag-cumsum: ``lag`` marks session starts, a running
    ``sum`` over the flags numbers them 1..n per user. Both windows
    share one partitioning (single shuffle; Catalyst plans one Exchange
    + one Sort for both WindowExecs). ``order_col`` breaks equal-ts
    ties deterministically.

    Returns the input plus ``session_seq`` (1-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) - prev_ts > F.lit(gap_ns)), 1
    ).otherwise(0)
    return events.withColumn("_is_new", is_new).withColumn(
        "session_seq",
        F.sum("_is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_is_new")


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_ns: int = DEFAULT_SESSION_GAP_NS,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output.

    The groupBy key ``(user, session_seq)`` is a refinement of the
    window partitioning, so AQE can often satisfy the aggregation
    without a second full shuffle. All outputs are integer-exact.
    """
    sess = sessionize(
        events, user_col=user_col, ts_col=ts_col, order_col=order_col, gap_ns=gap_ns
    )
    return sess.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ns"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_ns"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
    right_order: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the columns of the
    latest right row with ``right.ts <= left.ts`` and equal ``by`` key
    (backward-inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``,
    pandas ``merge_asof(direction="backward")``). Left rows with no
    prior right row keep NULLs.

    ``direction="forward"`` matches the EARLIEST right row with
    ``right.ts >= left.ts`` instead (pandas ``direction="forward"``;
    the next-event attribution shape). The plan is the mirror image:
    right rows sort after left at equal ts and ``first(...,
    ignorenulls)`` scans the following frame — still one exchange.
    With ``right_order`` the tie among right peers at equal ts still
    resolves to the MAX value (the sort flips to descending so
    ``first`` lands on it).

    ``direction="nearest"`` takes whichever of the two candidates has
    the smaller absolute gap, backward winning exact ties (equal-ts
    matches have gap 0 on the backward side and always win). Plan: the
    right side unions in TWICE (once per fill direction, each copy
    carrying only its own direction's columns), so both window fills
    ride ONE key exchange — the cost is a 2× replication of the right
    relation, not a second shuffle or a join.

    ``tolerance`` (same unit as the ts columns) nulls out matches
    farther than the given gap — pandas ``merge_asof(tolerance=...)``.
    Applied as a post-window projection on the matched right ts, so it
    adds no shuffle.

    Implementation: tag both inputs, union, and take ``last(..,
    ignorenulls)`` over ``(by) ORDER BY (ts, side)`` — right rows sort
    before left rows at equal ts, so "inclusive" falls out of the sort
    order. One shuffle on ``by``, one per-partition sort, zero row
    amplification; survives arbitrary right-side cardinality where a
    range-join would explode.

    If several right rows share ``(by, ts)``, the union keeps them all
    and ``last`` takes the final one in sort order. Pass ``right_order``
    (a column named in ``right_cols``) to make that tie deterministic —
    the window then sorts right-side peers by it ascending, so the
    *maximum* ``right_order`` value wins. This is strictly cheaper than
    pre-deduping the right side with a groupBy, which would cost an
    extra shuffle before the union.
    """
    if "_asof_side" in left.columns or "_asof_side" in right.columns:
        raise ValueError("inputs may not contain reserved column _asof_side")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    if right_order is not None and right_order not in right_cols:
        raise ValueError(f"right_order {right_order!r} must be one of right_cols")
    if direction == "nearest":
        return _asof_nearest(
            left, right, by, left_ts, right_ts, list(right_cols), prefix,
            right_order, tolerance,
        )
    backward = direction == "backward"
    # at equal ts the right row must fall INSIDE the left row's frame:
    # before it (backward, preceding frame) or after it (forward,
    # following frame)
    right_tag = 0 if backward else 2
    track_mts = tolerance is not None
    extra_mts = (
        [F.col(right_ts).cast("long").alias(f"{prefix}_mts")] if track_mts else []
    )
    tagged_r = right.select(
        F.col(by).alias(by),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(right_tag).alias("_asof_side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        *extra_mts,
    )
    tagged_l = left.withColumn("_asof_ts", F.col(left_ts)).withColumn(
        "_asof_side", F.lit(1)
    )
    merged = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    order = [F.col("_asof_ts").asc(), F.col("_asof_side").asc()]
    if right_order is not None:
        if right_order not in right_cols:
            raise ValueError(
                f"right_order {right_order!r} must be one of right_cols"
            )
        # left rows are separated by _asof_side already; among right
        # peers at equal ts this makes the picked edge the max value
        # (`last` of ascending, or `first` of descending)
        oc = F.col(f"{prefix}{right_order}")
        order.append(oc.asc() if backward else oc.desc())
    frame = (
        (Window.unboundedPreceding, Window.currentRow)
        if backward
        else (Window.currentRow, Window.unboundedFollowing)
    )
    w = Window.partitionBy(by).orderBy(*order).rowsBetween(*frame)
    fill = F.last if backward else F.first
    fill_cols = [f"{prefix}{c}" for c in right_cols] + (
        [f"{prefix}_mts"] if track_mts else []
    )
    for c in fill_cols:
        merged = merged.withColumn(c, fill(c, ignorenulls=True).over(w))
    out = merged.where(F.col("_asof_side") == 1)
    if track_mts:
        gap = (
            F.col("_asof_ts").cast("long") - F.col(f"{prefix}_mts")
            if backward
            else F.col(f"{prefix}_mts") - F.col("_asof_ts").cast("long")
        )
        ok = F.col(f"{prefix}_mts").isNotNull() & (gap <= F.lit(tolerance))
        for c in right_cols:
            out = out.withColumn(
                f"{prefix}{c}", F.when(ok, F.col(f"{prefix}{c}"))
            )
        out = out.drop(f"{prefix}_mts")
    return out.drop("_asof_ts", "_asof_side")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str,
    right_order: str | None,
    tolerance: int | None,
) -> DataFrame:
    """nearest-direction as-of: backward and forward candidates filled
    over ONE key exchange (right side unioned twice, once per fill
    direction), then the smaller absolute gap wins per row; backward
    wins ties. Internal — dispatched from ``asof_join``."""
    tagged_rb = right.select(
        F.col(by).alias(by),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.col(c).alias(f"_b_{c}") for c in right_cols],
        F.col(right_ts).cast("long").alias("_bmts"),
    )
    tagged_rf = right.select(
        F.col(by).alias(by),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(2).alias("_asof_side"),
        *[F.col(c).alias(f"_f_{c}") for c in right_cols],
        F.col(right_ts).cast("long").alias("_fmts"),
    )
    tagged_l = left.withColumn("_asof_ts", F.col(left_ts)).withColumn(
        "_asof_side", F.lit(1)
    )
    merged = tagged_l.unionByName(
        tagged_rb, allowMissingColumns=True
    ).unionByName(tagged_rf, allowMissingColumns=True)

    base_order = [F.col("_asof_ts").asc(), F.col("_asof_side").asc()]
    order_b = list(base_order)
    order_f = list(base_order)
    if right_order is not None:
        # max-value tie-break among equal-ts right peers, per direction
        order_b.append(F.col(f"_b_{right_order}").asc_nulls_first())
        order_f.append(F.col(f"_f_{right_order}").desc_nulls_last())
    wb = (
        Window.partitionBy(by)
        .orderBy(*order_b)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(*order_f)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in [f"_b_{c}" for c in right_cols] + ["_bmts"]:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(wb))
    for c in [f"_f_{c}" for c in right_cols] + ["_fmts"]:
        merged = merged.withColumn(c, F.first(c, ignorenulls=True).over(wf))

    out = merged.where(F.col("_asof_side") == 1)
    lt = F.col("_asof_ts").cast("long")
    bgap = lt - F.col("_bmts")
    fgap = F.col("_fmts") - lt
    b_ok = F.col("_bmts").isNotNull()
    f_ok = F.col("_fmts").isNotNull()
    if tolerance is not None:
        b_ok = b_ok & (bgap <= F.lit(tolerance))
        f_ok = f_ok & (fgap <= F.lit(tolerance))
    use_b = b_ok & (~f_ok | (bgap <= fgap))
    for c in right_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.when(use_b, F.col(f"_b_{c}")).when(f_ok, F.col(f"_f_{c}")),
        )
    drop = (
        [f"_b_{c}" for c in right_cols]
        + [f"_f_{c}" for c in right_cols]
        + ["_bmts", "_fmts", "_asof_ts", "_asof_side"]
    )
    return out.drop(*drop)


def time_bucket(ts_col: Column | str, bucket_ns: int) -> Column:
    """Tumbling-window bucket start (bigint ns): ``floor(ts / width) *
    width``. The batch twin of Structured Streaming's ``F.window`` —
    hypertable-rollup-style continuous aggregates reduce to a plain
    groupBy on this column, which Catalyst folds into one partial+final
    hash aggregation with no shuffle beyond the bucket key.

    Uses ``pmod`` (not ``%``, which truncates toward zero) so pre-epoch
    timestamps floor correctly: ``time_bucket(-1500, 1000) == -2000``.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (c - F.pmod(c, F.lit(bucket_ns))).cast("long")


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_days: int = 1,
) -> DataFrame:
    """Range (interval-containment) join without an equi-key:
    point rows match interval rows where ``start <= point < end``.

    Spark has no native band/IEJoin, and the naive formulation is a
    cross join with a post-filter — O(N·M). This is the standard
    bucketized rewrite: each interval explodes into its covered
    day-buckets (bounded by the interval width), each point maps to
    exactly one bucket, and the range predicate becomes a bucket
    EQUI-join plus an exact residual filter. Because buckets partition
    time disjointly and a point has one bucket, every qualifying
    (point, interval) pair meets exactly once — no dedup step.

    Shuffle profile at scale: one hash shuffle on the bucket key; the
    explode factor is ``interval_width / bucket_days``, chosen so the
    per-bucket row volume (density × width) keeps each join task
    bounded. Skewed buckets (hot days) compose with the salting in
    operators/skew.py.

    Timestamp columns must be TIMESTAMP/TIMESTAMP_NTZ with
    ``end - start`` bounded; both inputs keep all their columns.

    Buckets are anchored to a COMMON epoch grid — bucket id =
    ``floor(days_since_epoch / bucket_days)`` — for points and
    intervals alike. (Anchoring the interval's stride at its own start
    day would emit buckets the point side never lands in when
    ``bucket_days > 1``, silently dropping matches.)
    """
    if bucket_days < 1:
        raise ValueError(f"bucket_days must be >= 1, got {bucket_days}")
    epoch = F.lit("1970-01-01")

    def _bucket_of(c: Column) -> Column:
        return F.floor(F.datediff(F.to_date(c), F.to_date(epoch)) / bucket_days)

    pts = points.withColumn("_ibj_bucket", _bucket_of(F.col(point_ts)))
    spans = intervals.withColumn(
        "_ibj_bucket",
        F.explode(
            F.sequence(
                _bucket_of(F.col(start_ts)),
                # sequence() is inclusive; the end bucket is needed even
                # for half-open intervals because a point earlier in that
                # bucket can still be < end
                _bucket_of(F.col(end_ts)),
            )
        ),
    )
    return (
        pts.join(spans, "_ibj_bucket")
        .where((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("_ibj_bucket")
    )


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """One row per key: the row with the greatest ``order_cols`` tuple —
    CDC/log compaction ("current state of each entity from its event
    stream"). Ties on the full order tuple are broken arbitrarily but
    deterministically only if the caller makes the tuple unique (append
    a unique id as the last order column, as the contracts do).

    One key-partitioned window shuffle. At 100 TB this is the snapshot
    step of every mutable-entity pipeline; the streaming twin is
    streaming/sinks.py's idempotent upsert (same key semantics,
    incremental instead of full-scan).
    """
    if not key_cols or not order_cols:
        raise ValueError("latest_by_key needs key_cols and order_cols")
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_intervals(
    df: DataFrame,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key (interval union).

    The islands-and-gaps pattern: order a key's intervals by start, flag
    an interval as opening a new island when its start exceeds the
    running max of all previous ends, prefix-sum the flags into island
    ids, then aggregate each island to its envelope. Output:
    ``(key, island, start, end, n_merged)``.

    Touching intervals (next.start == prev.end) merge — the union of
    half-open [start, end) ranges. Works on any ordered numeric/date
    type; use integer epoch time for engine-portable results (the
    bigint-ns doctrine of this module).

    One key-partitioned window shuffle (two chained frames share it),
    then the island aggregate reuses the same partitioning. The
    reference has no interval algebra; this is the temporal-family
    closure op (sessionize = merge_intervals over point±gap ranges).
    """
    w_order = Window.partitionBy(key_col).orderBy(
        F.col(start_col), F.col(end_col)
    )
    prev_max_end = F.max(F.col(end_col)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    flagged = df.select(
        F.col(key_col), F.col(start_col), F.col(end_col), is_new.alias("_new")
    )
    island = F.sum("_new").over(
        w_order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("island", island.cast("long"))
        .groupBy(key_col, "island")
        .agg(
            F.min(start_col).alias("start"),
            F.max(end_col).alias("end"),
            F.count("*").cast("long").alias("n_merged"),
        )
    )


def scd2_history(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    end_of_time=None,
) -> DataFrame:
    """Build slowly-changing-dimension (type 2) validity intervals from
    a change log: one row per (key, change) with ``valid_from`` = the
    change's timestamp, ``valid_to`` = the NEXT change's timestamp (or
    ``end_of_time``/NULL for the current row) and ``is_current``.

    Consecutive rows whose ``attr_cols`` are unchanged are collapsed
    first (a re-stated identical record extends no interval — the
    standard SCD2 dedup), so downstream as-of joins see one row per
    actual state. Ties on (key, ts) keep the LAST record in the log's
    ordering guarantee and must be disambiguated upstream if the log
    has none.

    One key-partitioned window shuffle shared by the change-collapse
    lag and the interval lead.
    """
    attr_cols = list(attr_cols)
    if not attr_cols:
        raise ValueError("scd2_history needs attr_cols")
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        F.lag(state).over(w).isNull() | (F.lag(state).over(w) != state)
    )
    collapsed = df.withColumn("_chg", changed).where(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    out = (
        collapsed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    if end_of_time is not None:
        out = out.withColumn(
            "valid_to", F.coalesce(F.col("valid_to"), F.lit(end_of_time))
        )
    return out


def debounce(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    within,
) -> DataFrame:
    """Burst-collapse debounce: within each key, a *burst* is a maximal
    run of rows each less than ``within`` (in ``ts_col``'s own units)
    after its predecessor; every burst collapses to its FIRST row —
    double-click / retry / telemetry-burst suppression.

    This is deliberately burst semantics, not the sequential
    keep-if-``within``-since-last-KEPT rule: the sequential rule needs
    an order-dependent scan (a slow drizzle spaced just under
    ``within`` would keep every other row), while burst collapse keeps
    exactly one row per burst no matter how long the burst drags on.
    The two agree whenever bursts are separated by at least ``within``
    — the case debouncing exists for.

    A row is first-of-burst exactly when its gap to the previous raw
    row is ≥ ``within`` (or it has none), so the whole operator is one
    lag + filter over a single key-partitioned window.
    """
    if not key_cols:
        raise ValueError("debounce needs key_cols")
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
    gap_ok = (
        F.lag(F.col(ts_col)).over(w).isNull()
        | ((F.col(ts_col) - F.lag(F.col(ts_col)).over(w)) >= within)
    )
    return df.withColumn("_keep", gap_ok).where(F.col("_keep")).drop("_keep")


def rfm_scores(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bins: int = 5,
) -> DataFrame:
    """Classic RFM segmentation: per user, Recency (µs since the
    user's last event, measured from the corpus max), Frequency
    (event count) and Monetary (value sum), each scored 1..``bins``
    by quantile tile with ``bins`` = best (most recent / most active /
    highest spend) — the marketing-standard customer grid, computed
    relationally.

    One user-keyed aggregate reduces the corpus to |users| rows; the
    three ``ntile`` windows run over THAT table with deterministic
    (metric, user) total orders, so equal metrics split reproducibly.
    The corpus max timestamp is a 1-row broadcast.

    Returns per-user rows ``(user, recency_us, frequency, monetary,
    r_score, f_score, m_score)``.
    """
    from pyspark.sql.window import Window

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    us = F.unix_micros(F.col(ts_col))
    per = (
        events.where(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.max(us).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.coalesce(
                F.sum(F.col(value_col).cast("double")), F.lit(0.0)
            ).alias("monetary"),
        )
    )
    mx = per.agg(F.max("_last").alias("_mx"))
    scored = per.crossJoin(F.broadcast(mx)).withColumn(
        "recency_us", F.col("_mx") - F.col("_last")
    )

    def tile(order_cols) -> F.Column:
        return (
            F.lit(bins + 1)
            - F.ntile(bins).over(Window.orderBy(*order_cols))
        ).cast("int")

    return scored.select(
        "user",
        "recency_us",
        "frequency",
        "monetary",
        tile([F.col("recency_us").asc(), F.col("user")]).alias("r_score"),
        tile([F.col("frequency").desc(), F.col("user")]).alias("f_score"),
        tile([F.col("monetary").desc(), F.col("user")]).alias("m_score"),
    )
