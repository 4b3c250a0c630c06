"""Data-quality validation: declarative constraint checks + exact
histograms.

The deequ-lite shape: before a 100 TB corpus feeds a training run, the
pipeline asserts its invariants (keys unique, columns non-null, values
in range/set) and profiles distributions. Both operators compile to a
SINGLE aggregation pass — the constraint set becomes one row of
conditional counts, never one job per rule.

Scale notes:
- ``check_constraints``: every rule is a conditional-count expression in
  ONE global aggregate (0-row shuffle, partial-combined); the unique
  rule adds one count-distinct. A 50-rule suite costs one scan.
- ``numeric_histogram``: bucket index is a narrow projection; the count
  groupBy shuffles |bins| rows after map-side combine. Bounds come from
  one min/max aggregate folded in as literals (same pattern as
  operators/quantize.py).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative constraint: ``name`` labels the output row,
    ``kind`` ∈ {not_null, unique, in_range, in_set, matches} with the
    obvious parameters."""

    name: str
    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    values: tuple | None = None
    pattern: str | None = None


def not_null(column: str) -> Rule:
    return Rule(f"{column}_not_null", "not_null", column)


def unique(column: str) -> Rule:
    return Rule(f"{column}_unique", "unique", column)


def in_range(column: str, lo: float, hi: float) -> Rule:
    return Rule(f"{column}_in_range", "in_range", column, lo=lo, hi=hi)


def in_set(column: str, values) -> Rule:
    return Rule(f"{column}_in_set", "in_set", column, values=tuple(values))


def matches(column: str, pattern: str) -> Rule:
    """Full-match regex — keep patterns in the Java/RE2 common subset
    (the cleaning-module doctrine) so oracles can run them too."""
    return Rule(f"{column}_matches", "matches", column, pattern=pattern)


def _violations(rule: Rule):
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if rule.kind == "in_range":
        ok = c.isNotNull() & (c >= rule.lo) & (c <= rule.hi)
        return F.sum(F.when(ok, 0).otherwise(1))
    if rule.kind == "in_set":
        ok = c.isNotNull() & c.isin(list(rule.values))
        return F.sum(F.when(ok, 0).otherwise(1))
    if rule.kind == "matches":
        ok = c.isNotNull() & c.rlike(f"^(?:{rule.pattern})$")
        return F.sum(F.when(ok, 0).otherwise(1))
    if rule.kind == "unique":
        # rows beyond the first of each value; ALL nulls count as one
        # shared value: distinct_incl_null = countDistinct + has_null
        has_null = F.max(F.when(c.isNull(), 1).otherwise(0))
        return F.count("*") - F.countDistinct(c) - has_null
    raise ValueError(f"unknown rule kind {rule.kind!r}")


def check_constraints(df: DataFrame, rules) -> DataFrame:
    """Evaluate every rule in one aggregation pass.

    Output: one row per rule — ``(rule, column, n_rows, violations,
    passed)``. ``unique`` counts duplicate occurrences beyond each
    value's first (null is one value)."""
    rules = list(rules)
    if not rules:
        raise ValueError("check_constraints needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    aggs = [F.count("*").cast("long").alias("_n")]
    for r in rules:
        aggs.append(_violations(r).cast("long").alias(f"_v_{r.name}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.lit(r.column).alias("column"),
                F.col("_n").alias("n_rows"),
                F.coalesce(F.col(f"_v_{r.name}"), F.lit(0)).alias("violations"),
                (F.coalesce(F.col(f"_v_{r.name}"), F.lit(0)) == 0).alias("passed"),
            )
            for r in rules
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")


def numeric_histogram(
    df: DataFrame, column: str, *, bins: int = 10
) -> DataFrame:
    """Exact equi-width histogram over the observed [min, max].

    Output: one row per non-empty bucket — ``(bucket, lo, hi, n)``,
    bucket ∈ [0, bins); the max value lands in the LAST bucket (closed
    upper edge). Null values are ignored. A constant column collapses
    to one bucket 0 spanning [v, v]."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    bounds = df.agg(
        F.min(column).cast("double").alias("lo"),
        F.max(column).cast("double").alias("hi"),
    ).first()
    if bounds["lo"] is None:
        raise ValueError(f"column {column!r} has no non-null values")
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    width = (hi - lo) / bins
    c = F.col(column).cast("double")
    if width == 0.0:
        bucket = F.when(c.isNotNull(), F.lit(0))
    else:
        bucket = F.least(
            F.floor((c - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(bins - 1),
        )
    return (
        df.where(c.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )


def lexical_diversity(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document lexical-diversity metrics from the term-frequency
    histogram: ``(id, n_tokens, n_types, ttr, yule_k)``.

    - ``ttr`` — type/token ratio V/N, the crude richness measure
      (length-sensitive: long documents trend lower).
    - ``yule_k`` — Yule's characteristic K = 10⁴·(Σ m²·V(m) − N)/N²
      (Yule 1944), equivalently 10⁴·(Σ tf² − N)/N² over the tf
      histogram — repetitiveness that is far less length-sensitive
      than TTR; boilerplate and template text score high, diverse
      prose low. The quality-filter companion to the Gopher
      repetition fractions (operators/repetition.py), computed from
      frequencies alone (no n-gram pass).

    One explode + (id, token) aggregate + per-id aggregate — the
    standard token-histogram shape, map-side combinable both stages.
    Documents with no tokens produce no row (diversity of nothing is
    undefined)."""
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    )
    tf = toks.groupBy("id", "token").agg(F.count("*").alias("tf"))
    n = F.sum("tf").cast("double")
    return tf.groupBy("id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_types"),
        (F.count("*") / n).alias("ttr"),
        (
            F.lit(10000.0)
            * (F.sum(F.col("tf") * F.col("tf")) - n)
            / (n * n)
        ).alias("yule_k"),
    ).withColumnRenamed("id", id_col)


def key_candidates(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Candidate-key discovery: per column ``(column, n_nonnull,
    n_distinct, is_key)`` where ``is_key`` = 1 iff the column's
    non-null values are unique across the relation (and cover it).

    Implementation is ONE shuffle: each column's values are stacked
    into a long ``(column, value)`` relation (stringified — injective
    per column, which is all distinctness needs) and reduced with a
    single groupBy. Exact counts; at 100 TB swap the countDistinct for
    HLL sketches (operators/sketch.py) — same plan shape.
    """
    if not cols:
        raise ValueError("key_candidates needs at least one column")
    total = df.count()
    stacked = None
    for c in cols:
        part = df.select(
            F.lit(c).alias("column"),
            F.col(c).cast("string").alias("value"),
        ).where(F.col(c).isNotNull())
        stacked = part if stacked is None else stacked.unionAll(part)
    agg = stacked.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_nonnull"),
        F.countDistinct("value").alias("n_distinct"),
    )
    return agg.select(
        "column",
        "n_nonnull",
        "n_distinct",
        (
            (F.col("n_distinct") == F.col("n_nonnull"))
            & (F.col("n_nonnull") == F.lit(total))
        )
        .cast("int")
        .alias("is_key"),
    )


def functional_dependencies(
    df: DataFrame, cols: "list[str]"
) -> DataFrame:
    """Exact functional-dependency discovery over a column subset:
    for every ordered pair (det → dep), ``holds`` = 1 iff each
    determinant value maps to exactly one dependent value, with
    ``violations = |distinct (det, dep)| − |distinct det|`` as the
    repair distance. Rows where either side is NULL are excluded from
    that pair's check (NULL determines nothing).

    ONE scan, one explode, one LINEAR rollup over INT pair ids:
    UNORDERED pairs are exploded once (the (a,b)/(b,a) candidates
    share one distinct (value-a, value-b) set and one joint-non-null
    filter) and deduped by ``(pid, va, vb)``; each surviving distinct
    pair then fans out to its two orientations carrying ONLY the
    determinant value — after dedupe, ``n_pair`` per orientation is
    the plain row count and ``n_det`` the distinct determinant count,
    so the dependent value never re-shuffles. Two more group-bys with
    strictly shrinking keys finish it: ``(oid, dv)`` counts dependent
    values per determinant value, ``(oid)`` sums to ``n_pair`` while
    its group count IS ``n_det``. No multi-``countDistinct`` (which
    would Expand the deduped relation ×3 and reshuffle it — the
    round-5 residual cost), no union; the heavy shuffles move small
    ints, not repeated column-name strings (round-6: 1.9 → 1.4 s at
    sf0.1). Profiling scope: the explode multiplies rows by
    |unordered pairs|, so prune the column list (or sample) on very
    wide tables.
    """
    if len(cols) < 2:
        raise ValueError("functional_dependencies needs >= 2 columns")
    upairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("pid"),
                F.col(a).cast("string").alias("va"),
                F.col(b).cast("string").alias("vb"),
            )
            for i, (a, b) in enumerate(upairs)
        ]
    )
    udeduped = (
        df.select(F.explode(arr).alias("p"))
        .select("p.*")
        .where(F.col("va").isNotNull() & F.col("vb").isNotNull())
        .groupBy("pid", "va", "vb")
        .agg(F.lit(1).alias("_one"))
    )
    both = F.array(
        F.struct(
            (F.col("pid") * 2).alias("oid"), F.col("va").alias("dv")
        ),
        F.struct(
            (F.col("pid") * 2 + 1).alias("oid"), F.col("vb").alias("dv")
        ),
    )
    per_det_value = (
        udeduped.select(F.explode(both).alias("p"))
        .select("p.*")
        .groupBy("oid", "dv")
        .agg(F.count(F.lit(1)).alias("_n_dep_vals"))
    )
    agg = per_det_value.groupBy("oid").agg(
        F.count(F.lit(1)).alias("n_det"),
        F.sum("_n_dep_vals").alias("n_pair"),
    )
    # oid -> (det, dep) names: element_at on K-element literal arrays
    det_names = F.array(
        *[F.lit(n) for a, b in upairs for n in (a, b)]
    )
    dep_names = F.array(
        *[F.lit(n) for a, b in upairs for n in (b, a)]
    )
    return agg.select(
        F.element_at(det_names, F.col("oid") + 1).alias("det"),
        F.element_at(dep_names, F.col("oid") + 1).alias("dep"),
        "n_det",
        "n_pair",
        (F.col("n_pair") - F.col("n_det")).alias("violations"),
        (F.col("n_pair") == F.col("n_det")).cast("int").alias("holds"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: "list[str]",
    *,
    method: str = "pearson",
) -> DataFrame:
    """All-pairs correlation over numeric columns in ONE aggregation —
    the profiling step that tells a pipeline which features are
    redundant before any model sees them.

    ``method='pearson'`` computes every (i<j) pair's moment sums as
    conditional expressions in a single scan (p(p−1)/2·4 + p·3 doubles
    of state, map-side combined — the FD-discovery doctrine of one
    shuffle for the whole matrix). ``method='spearman'`` first
    replaces each column by its MIDRANK over the complete rows (ties
    get the average rank, the scipy convention), then runs the same
    Pearson pass on ranks — p global sorts of the complete-row subset,
    each over one double column.

    Semantics: COMPLETE-ROWS — rows with a NULL in ANY of ``cols`` are
    dropped for every pair, so the matrix is a true Gram correlation
    (positive semidefinite), not pairwise-deletion patchwork; ``n`` is
    therefore identical on every output row. Constant columns yield
    NULL correlations (undefined, surfaced not zeroed).

    Returns p(p−1)/2 rows ``(col_x, col_y, n, corr)`` in the given
    column order.
    """
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {len(cols)}")
    if method not in ("pearson", "spearman"):
        raise ValueError(f"method must be pearson|spearman, got {method!r}")
    from pyspark.sql.window import Window

    keep = None
    for c in cols:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep & cond)
    base = df.where(keep).select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    if method == "spearman":
        # midrank(v) = rows_before(v) + (ties+1)/2, per DISTINCT VALUE.
        # Round-10 restructure, two problems fixed at once:
        # (1) the old per-column blocks derived from the PROGRESSIVELY
        #     JOINED base, so each join's subtree re-contained every
        #     previous join — 2^|cols| plan growth (32 parquet scans in
        #     the round-9 plan); all midranks now come from the original
        #     projection in ONE stacked pass (row multiset is unchanged
        #     by the value-keyed inner joins, so this is identical);
        # (2) the cumulative count ran as a Window over the EMPTY
        #     partition key — a single-task total sort (the one
        #     acknowledged scale-killer shape left in round 9). It is
        #     now a distributed prefix sum: range-partition the distinct
        #     values, cumsum within each partition, add per-partition
        #     offsets computed from a <= |cols|*npart row collect.
        #     Counts are integers, exactly representable as doubles, so
        #     the regrouped additions are bit-identical.
        spark_ = df.sparkSession
        stacked = base.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("_cid"), F.col(c).alias("_val")
                        )
                        for i, c in enumerate(cols)
                    ]
                )
            ).alias("_s")
        ).select("_s.*")
        npart = max(2, spark_.sparkContext.defaultParallelism)
        # pin the counts BEFORE repartitionByRange: range sampling
        # executes its child once for boundaries and again for the
        # exchange — on the pinned table both passes are cheap reads
        # instead of two runs of the explode+groupBy
        counts_by_val = (
            stacked.groupBy("_cid", "_val")
            .agg(F.count(F.lit(1)).cast("double").alias("_t"))
            .localCheckpoint(eager=True)
        )
        t = (
            counts_by_val.repartitionByRange(npart, "_cid", "_val")
            .withColumn("_pid", F.spark_partition_id())
            # eager pin freezes the sampled range boundaries and the
            # partition ids the offsets below are keyed on, and the
            # table is consumed twice (offsets + midrank emit)
            .localCheckpoint(eager=True)
        )
        # rows-before offset per (column, partition): K-row metadata
        # (<= |cols| x npart), the canonical distributed-prefix-sum
        # driver step
        totals = (
            t.groupBy("_cid", "_pid").agg(F.sum("_t").alias("_s")).collect()
        )
        by_cid: "dict[int, dict[int, float]]" = {}
        for r in totals:
            by_cid.setdefault(r["_cid"], {})[r["_pid"]] = r["_s"]
        off_rows = []
        for cid in sorted(by_cid):
            run = 0.0
            for pid in sorted(by_cid[cid]):
                off_rows.append((cid, pid, run))
                run += by_cid[cid][pid]
        from ..sources.loaders import k_row_df

        offs = k_row_df(spark_, off_rows, "_cid int, _pid int, _off double")
        cum = (
            Window.partitionBy("_cid", "_pid")
            .orderBy("_val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        mids = (
            t.join(F.broadcast(offs), ["_cid", "_pid"])
            .select(
                "_cid",
                "_val",
                (
                    F.col("_off")
                    + F.sum("_t").over(cum)
                    - F.col("_t")
                    + (F.col("_t") + F.lit(1.0)) / F.lit(2.0)
                ).alias("_mid"),
            )
            # consumed once per column by the value-keyed joins below
            .localCheckpoint(eager=True)
        )
        for i, c in enumerate(cols):
            blocks = mids.where(F.col("_cid") == i).select("_val", "_mid")
            base = (
                base.join(blocks, base[c] == blocks["_val"], "inner")
                .drop(c, "_val")
                .withColumnRenamed("_mid", c)
            )

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"q_{c}"))
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"p_{a}_{b}"))
    s = base.agg(*aggs)

    n = F.col("n")

    def corr(a: str, b: str):
        num = n * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        vx = n * F.col(f"q_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vy = n * F.col(f"q_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        return num / F.nullif(F.sqrt(vx * vy), F.lit(0.0))

    out = s.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_x"),
                        F.lit(b).alias("col_y"),
                        n.cast("long").alias("n"),
                        corr(a, b).alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("r")
    )
    return out.select("r.col_x", "r.col_y", "r.n", "r.corr")


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    directions: "tuple[str, str]" = ("max", "max"),
) -> DataFrame:
    """2-D skyline: the value pairs not dominated by any other pair
    (``(x', y')`` dominates ``(x, y)`` when it is ≥ on both axes and
    strictly better on at least one). The classic multi-criteria
    shortlist operator — "largest order at the earliest date",
    "highest quality at the lowest duplication" — that a top-k on
    either axis alone cannot answer.

    Algorithm: reduce to DISTINCT pairs with row counts (one grouped
    aggregate — the corpus never sorts), then one ordered window over
    the |distinct|-row table: sorted by (x desc, y desc), a pair is
    dominated iff some earlier pair's y ≥ its y (earlier = strictly
    better x, or equal x with strictly better y — exactly the
    dominance cases; exact duplicates are collapsed by the distinct so
    they cannot shadow each other). ``directions`` flips either axis
    to ``'min'`` by negating it internally; outputs keep original
    values.

    Returns frontier rows ``(x, y, n_rows)`` named after the inputs.
    """
    for d in directions:
        if d not in ("max", "min"):
            raise ValueError(f"directions must be max|min, got {d!r}")
    from pyspark.sql.window import Window

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    sx = x if directions[0] == "max" else -x
    sy = y if directions[1] == "max" else -y
    pairs = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(
            sx.alias("_sx"),
            sy.alias("_sy"),
            x.alias(x_col),
            y.alias(y_col),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = Window.orderBy(F.col("_sx").desc(), F.col("_sy").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        pairs.withColumn("_prev_max", F.max("_sy").over(w))
        .where(
            F.col("_prev_max").isNull()
            | (F.col("_prev_max") < F.col("_sy"))
        )
        .select(x_col, y_col, "n_rows")
    )


def association_matrix(
    df: DataFrame,
    cols: "list[str]",
) -> DataFrame:
    """All-pairs categorical association (Cramér's V with chi-square)
    — :func:`correlation_matrix`'s twin for label columns: which
    categorical fields carry the same information (redundant
    stratifiers, leaking features) before a pipeline conditions on
    them.

    One pass: every row emits its p(p−1)/2 category pairs (an explode
    of a p²-free struct array — columns, not rows, bound the blowup),
    ONE ``(pair, a, b)`` count aggregate, margins derived per pair
    from that table (no second scan), then
    ``χ² = Σ (o − e)²/e`` over observed cells plus the missing-cell
    mass ``n − Σe_observed`` (absent combinations contribute their
    expected count exactly), and ``V = √(χ²/(n·(min(r,c)−1)))``.

    NULL categories are a real level (``'<null>'``) — missingness
    association is usually the finding. Returns p(p−1)/2 rows
    ``(col_x, col_y, n, chi2, cramers_v)``; V is NULL for degenerate
    pairs (a single-level column).
    """
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {len(cols)}")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    long = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{a}|{b}").alias("pair"),
                        F.coalesce(F.col(a).cast("string"), F.lit("<null>"))
                        .alias("a"),
                        F.coalesce(F.col(b).cast("string"), F.lit("<null>"))
                        .alias("b"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("s")
    ).select("s.*")
    cells = long.groupBy("pair", "a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    ma = cells.groupBy("pair", "a").agg(F.sum("o").alias("na"))
    mb = cells.groupBy("pair", "b").agg(F.sum("o").alias("nb"))
    nn = cells.groupBy("pair").agg(
        F.sum("o").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    joined = (
        cells.join(ma, ["pair", "a"])
        .join(mb, ["pair", "b"])
        .join(F.broadcast(nn), "pair")
    )
    per_pair = joined.groupBy("pair").agg(
        F.first("n").alias("n"),
        F.first("r").alias("r"),
        F.first("c").alias("c"),
        F.sum(
            (F.col("o") - F.col("na") * F.col("nb") / F.col("n"))
            * (F.col("o") - F.col("na") * F.col("nb") / F.col("n"))
            / (F.col("na") * F.col("nb") / F.col("n"))
        ).alias("chi2_obs"),
        F.sum(F.col("na") * F.col("nb") / F.col("n")).alias("e_obs"),
    )
    chi2 = F.col("chi2_obs") + (F.col("n") - F.col("e_obs"))
    out = per_pair.select(
        F.col("pair"),
        F.col("n").cast("long").alias("n"),
        chi2.alias("chi2"),
        F.sqrt(
            chi2
            / F.nullif(
                F.col("n")
                * (F.least(F.col("r"), F.col("c")) - F.lit(1)).cast(
                    "double"
                ),
                F.lit(0.0),
            )
        ).alias("cramers_v"),
    )
    return out.select(
        F.split(F.col("pair"), "\\|").getItem(0).alias("col_x"),
        F.split(F.col("pair"), "\\|").getItem(1).alias("col_y"),
        "n",
        "chi2",
        "cramers_v",
    )


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
) -> DataFrame:
    """First-order partial correlation ``r(x,y | z)`` — the x↔y
    association with the confounder z regressed out of both sides:
    ``(r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²))``. The numeric twin
    of :func:`correlation_matrix`'s screen — "quantity and price look
    correlated, but is it just the discount moving both?"

    One scan of the three pairwise moment sets (complete-rows
    semantics, like correlation_matrix); everything after is
    arithmetic on the 1-row aggregate. NULL when any marginal
    correlation is degenerate or |r_xz| or |r_yz| is 1 (z explains a
    variable exactly — the partial is undefined).

    Returns one row ``(n, r_xy, r_xz, r_yz, r_xy_given_z)``.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    z = F.col(z_col).cast("double")
    rows = df.where(x.isNotNull() & y.isNotNull() & z.isNotNull())
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"), F.sum(z).alias("sz"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(z * z).alias("szz"),
        F.sum(x * y).alias("sxy"), F.sum(x * z).alias("sxz"),
        F.sum(y * z).alias("syz"),
    )
    n = F.col("n")

    def corr(sab, sa, sb, saa, sbb):
        num = n * F.col(sab) - F.col(sa) * F.col(sb)
        den = F.sqrt(
            (n * F.col(saa) - F.col(sa) * F.col(sa))
            * (n * F.col(sbb) - F.col(sb) * F.col(sb))
        )
        return num / F.nullif(den, F.lit(0.0))

    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    ryz = corr("syz", "sy", "sz", "syy", "szz")
    partial = (rxy - rxz * ryz) / F.nullif(
        F.sqrt(
            (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
        ),
        F.lit(0.0),
    )
    return s.select(
        n.cast("long").alias("n"),
        rxy.alias("r_xy"),
        rxz.alias("r_xz"),
        ryz.alias("r_yz"),
        partial.alias("r_xy_given_z"),
    )


def uncertainty_coefficient(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil's uncertainty coefficient ``U(x|y) = (H(x) − H(x|y)) /
    H(x)`` — the ASYMMETRIC categorical-association measure
    :func:`association_matrix` deliberately isn't: "knowing y removes
    this fraction of x's entropy" answers direction (y predicts x)
    where Cramér's V only answers strength. Both directions returned.

    One ``(x, y)`` count aggregate; margins and entropies derive from
    it (NULL categories are a real level, the association_matrix
    convention). Zero-entropy marginals yield NULL coefficients.

    Returns one row ``(n, h_x, h_y, mutual_info, u_x_given_y,
    u_y_given_x)`` with entropies in nats.
    """
    a = F.coalesce(F.col(x_col).cast("string"), F.lit("<null>"))
    b = F.coalesce(F.col(y_col).cast("string"), F.lit("<null>"))
    cells = df.groupBy(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    ma = cells.groupBy("a").agg(F.sum("c").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("c").alias("nb"))
    tot = cells.agg(F.sum("c").alias("nn"))
    j = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("c") / F.col("nn")
    pa = F.col("na") / F.col("nn")
    pb = F.col("nb") / F.col("nn")
    agg = j.agg(
        F.first("nn").cast("long").alias("n"),
        F.sum(p * F.log(p / (pa * pb))).alias("mutual_info"),
        (-F.sum(p * F.log(pa))).alias("h_x"),
        (-F.sum(p * F.log(pb))).alias("h_y"),
    )
    return agg.select(
        "n",
        "h_x",
        "h_y",
        "mutual_info",
        (F.col("mutual_info") / F.nullif(F.col("h_x"), F.lit(0.0))).alias(
            "u_x_given_y"
        ),
        (F.col("mutual_info") / F.nullif(F.col("h_y"), F.lit(0.0))).alias(
            "u_y_given_x"
        ),
    )


def skyline(
    df: DataFrame,
    criteria: "list[tuple[str, str]]",
    *,
    local_prune: bool = True,
) -> DataFrame:
    """d-dimensional Pareto skyline: rows not dominated by any other
    row, where row ``b`` dominates row ``a`` when ``b`` is at least as
    good on EVERY criterion and strictly better on at least one.
    ``criteria`` is ``[(col, "min"|"max"), ...]`` with d ≥ 2 — the
    general form of :func:`pareto_frontier`'s 2-D window trick, which
    stops working at d ≥ 3 (no single sort order serializes dominance).

    Algorithm (Börzsönyi/Kossmann/Stocker, ICDE 2001 distributed
    variant):

    1. drop rows with any NULL criterion (dominance is undefined);
    2. LOCAL PRUNE: per Arrow batch, a sort-based skyline kernel
       (sorted lexicographically best-first, each row tested against
       the kept set). Dominance is transitive, so the global skyline
       is a subset of the union of local skylines — the corpus
       collapses to candidates without any shuffle;
    3. GLOBAL: candidates anti-join candidates on the dominance
       predicate (broadcast nested loop over the small pruned set).

    At 100 TB step 2 is the load-bearing stage: the full relation
    never shuffles, and the candidate set that reaches the quadratic
    stage is bounded by the per-batch skyline sizes, not corpus rows.
    Rows with identical criterion tuples do not dominate each other
    (strictness fails) — all duplicates survive; pre-aggregate if you
    want one row per tuple.

    Returns the surviving rows with the input's full schema.
    """
    if len(criteria) < 2:
        raise ValueError(f"need >= 2 criteria, got {len(criteria)}")
    for _, d in criteria:
        if d not in ("max", "min"):
            raise ValueError(f"directions must be max|min, got {d!r}")
    cols = [c for c, _ in criteria]
    clean = df.na.drop(subset=cols)
    sgn = [1.0 if d == "max" else -1.0 for _, d in criteria]

    if local_prune:
        schema = clean.schema

        def _local_skyline(batches):
            import numpy as np

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                a = pdf[cols].to_numpy(dtype="float64") * np.asarray(sgn)
                # best-first lexicographic order: a row can only be
                # dominated by one sorted before it
                order = np.lexsort(tuple(-a[:, j] for j in range(a.shape[1] - 1, -1, -1)))
                kept_idx: list[int] = []
                kept = np.empty((0, a.shape[1]))
                for i in order:
                    row = a[i]
                    if len(kept_idx) and bool(
                        ((kept >= row).all(axis=1) & (kept > row).any(axis=1)).any()
                    ):
                        continue
                    kept_idx.append(i)
                    kept = np.vstack([kept, row])
                yield pdf.iloc[sorted(kept_idx)]

        cand = clean.mapInPandas(_local_skyline, schema)
    else:
        cand = clean

    left = cand.alias("l")
    right = cand.alias("r")
    better_eq = [
        (F.col(f"r.{c}") >= F.col(f"l.{c}"))
        if d == "max"
        else (F.col(f"r.{c}") <= F.col(f"l.{c}"))
        for c, d in criteria
    ]
    strictly = [
        (F.col(f"r.{c}") > F.col(f"l.{c}"))
        if d == "max"
        else (F.col(f"r.{c}") < F.col(f"l.{c}"))
        for c, d in criteria
    ]
    cond_all = better_eq[0]
    for b in better_eq[1:]:
        cond_all = cond_all & b
    cond_any = strictly[0]
    for s in strictly[1:]:
        cond_any = cond_any | s
    return left.join(
        F.broadcast(right), cond_all & cond_any, "left_anti"
    ).select(*[F.col(f"l.{c.name}").alias(c.name) for c in df.schema])


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.6,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style named document-quality rules (Rae et al. 2021,
    "Scaling Language Models", table A1 — the filter battery most
    LLM-corpus pipelines start from), evaluated as ONE projection of
    boolean flags — no UDFs, no extra passes, composable with the
    quality-percentile and classifier gates:

    - ``r_word_count``: token count in [min_tokens, max_tokens]
    - ``r_mean_len``: mean token length in [min_mean_len, max_mean_len]
    - ``r_symbol``: (# + ellipsis) per token ≤ max_symbol_ratio
    - ``r_bullet``: share of non-blank lines starting '- '/'* '
      ≤ max_bullet_ratio
    - ``r_ellipsis``: share of non-blank lines ending '...'
      ≤ max_ellipsis_ratio
    - ``r_alpha``: alphabetic character ratio ≥ min_alpha_ratio
    - ``r_stopword``: ≥ min_stopword_hits common-stopword occurrences
    - ``pass_all``: conjunction of the seven

    Returns the input plus the eight flags. All components reuse the
    hash-gated text expressions (functions/text.py), so a SQL oracle
    can mirror every branch bit for bit.
    """
    from ..functions.text import (
        QUALITY_STOPWORDS,
        alpha_ratio,
        mean_token_len,
        stopword_count,
        token_count,
    )

    t = F.col(text_col)
    n = token_count(t).cast("double")
    mean_len = mean_token_len(t)
    hash_cnt = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ).cast("double")
    ell_cnt = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ).cast("double")
    sym_ratio = F.when(n > 0, (hash_cnt + ell_cnt) / n).otherwise(F.lit(0.0))
    lines = F.filter(
        F.split(t, "\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    nl = F.size(lines).cast("double")
    bullets = F.size(
        F.filter(
            lines,
            lambda ln: F.ltrim(ln).startswith("- ")
            | F.ltrim(ln).startswith("* "),
        )
    ).cast("double")
    ell_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).endswith("..."))
    ).cast("double")
    bullet_ratio = F.when(nl > 0, bullets / nl).otherwise(F.lit(0.0))
    ell_line_ratio = F.when(nl > 0, ell_lines / nl).otherwise(F.lit(0.0))
    flags = {
        "r_word_count": (n >= F.lit(float(min_tokens)))
        & (n <= F.lit(float(max_tokens))),
        "r_mean_len": mean_len.isNotNull()
        & (mean_len >= F.lit(min_mean_len))
        & (mean_len <= F.lit(max_mean_len)),
        "r_symbol": sym_ratio <= F.lit(max_symbol_ratio),
        "r_bullet": bullet_ratio <= F.lit(max_bullet_ratio),
        "r_ellipsis": ell_line_ratio <= F.lit(max_ellipsis_ratio),
        "r_alpha": alpha_ratio(t) >= F.lit(min_alpha_ratio),
        "r_stopword": stopword_count(t, QUALITY_STOPWORDS)
        >= F.lit(int(min_stopword_hits)),
    }
    out = df
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    pass_all = None
    for name in flags:
        pass_all = (
            F.col(name) if pass_all is None else pass_all & F.col(name)
        )
    return out.withColumn("pass_all", pass_all)


def gopher_summary(
    flagged: DataFrame, by: str = "source"
) -> DataFrame:
    """Per-group rule-failure accounting over :func:`gopher_rules`
    output: how many documents each named rule rejects, and how many
    survive the whole battery — the corpus-triage report. One grouped
    aggregate of conditional counts (map-side combinable)."""
    rules = [
        "r_word_count",
        "r_mean_len",
        "r_symbol",
        "r_bullet",
        "r_ellipsis",
        "r_alpha",
        "r_stopword",
    ]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for r in rules:
        aggs.append(
            F.sum(F.when(~F.col(r), 1).otherwise(0)).alias(f"fail_{r[2:]}")
        )
    aggs.append(
        F.sum(F.when(F.col("pass_all"), 1).otherwise(0)).alias("n_pass")
    )
    return flagged.groupBy(by).agg(*aggs)


def inclusion_dependencies(
    sources: "dict[str, tuple[DataFrame, str]]",
) -> DataFrame:
    """Unary inclusion-dependency (IND) discovery across attributes —
    the cross-table sibling of :func:`key_candidates` (which finds
    keys) and :func:`functional_dependencies` (which finds intra-table
    implications): for every ordered attribute pair (A, B), decide
    whether values(A) ⊆ values(B), the precondition for A being a
    foreign key into B.

    ``sources`` maps an attribute label to ``(df, column)``; values
    are compared as strings so heterogeneous column types can share
    one lattice.

    Scale shape (the SPIDER / S-INDD attribute-set idea, re-expressed
    declaratively): per attribute a DISTINCT projection (map-side
    combinable), one union, then ONE value-keyed aggregation that
    collects the set of attributes containing each value. Pairs are
    exploded from those per-value attribute sets — bounded by
    |attrs|² per value, never by row count — so no candidate pair
    ever triggers an all-pairs join over data. A ⊆ B is then just
    ``shared(A,B) = |values(A)|`` checked against the per-attribute
    distinct counts (broadcast, |attrs| rows).

    Emits every ordered pair with at least one shared value:
    ``(lhs, rhs, lhs_values, shared_values, contained)``, ordered
    columns only — callers filter ``contained`` for the IND set.
    """
    if len(sources) < 2:
        raise ValueError(
            f"need at least 2 attributes to compare, got {len(sources)}"
        )
    parts = []
    for label, (df, col) in sorted(sources.items()):
        parts.append(
            df.where(F.col(col).isNotNull()).select(
                F.lit(label).alias("a"),
                F.col(col).cast("string").alias("v"),
            )
        )
    raw = parts[0]
    for p in parts[1:]:
        raw = raw.unionAll(p)
    # no fan_out here (unlike the n-ary sibling): the narrow unary
    # stack's partial collect_set per union leg is cheaper than the
    # round-robin exchange of the whole union (measured 2.9 s vs 3.4 s
    # solo, round 10)
    return _spider_containment(raw, ["v"])


def nary_inclusion_dependencies(
    sources: "dict[str, tuple[DataFrame, Sequence[str]]]",
) -> DataFrame:
    """N-ary composite inclusion-dependency verification — level n of
    the candidate lattice above :func:`inclusion_dependencies` (unary,
    level 1). For every ordered pair of composite attributes
    (A₁..Aₙ, B₁..Bₙ), decide whether the distinct VALUE-TUPLE set of
    the left side is contained in the right's — the check that
    recovers composite foreign keys (and, just as importantly, refutes
    the spurious composite candidates a dense-integer unary skeleton
    implies: two unary INDs A₁⊆B₁, A₂⊆B₂ rarely survive as
    (A₁,A₂)⊆(B₁,B₂)).

    ``sources`` maps an attribute label to ``(df, [col₁..colₙ])``;
    every entry must share the same arity n. Tuples with any NULL
    coordinate are excluded (SQL semantics: a NULL never witnesses
    containment). Values are compared as strings per coordinate, so
    heterogeneous column types can share one lattice.

    Scale shape — identical to the unary SPIDER pass, with the value
    key widened to the n-tuple: per composite attribute one DISTINCT
    projection (map-side combinable), one union, ONE value-tuple-keyed
    aggregation collecting each tuple's attribute set, pairs exploded
    from those per-tuple sets (bounded by |attrs|² per tuple, never by
    row count). Candidate pruning belongs in the caller: at scale,
    feed only composites whose coordinate-wise unary INDs hold
    (level-(n−1) survivors), which this verification then confirms or
    refutes.

    Emits every ordered pair sharing at least one value tuple:
    ``(lhs, rhs, lhs_values, shared_values, contained)``.
    """
    if len(sources) < 2:
        raise ValueError(
            f"need at least 2 composite attributes, got {len(sources)}"
        )
    arities = {len(cols) for _, (_, cols) in sources.items()}
    if len(arities) != 1:
        raise ValueError(
            f"all composite attributes must share one arity, got {arities}"
        )
    n = arities.pop()
    if n < 1:
        raise ValueError("composite attributes need at least one column")
    vcols = [f"v{i}" for i in range(n)]
    from ..sources.loaders import fan_out

    parts = []
    for label, (df, cols) in sorted(sources.items()):
        notnull = None
        for c in cols:
            cond = F.col(c).isNotNull()
            notnull = cond if notnull is None else notnull & cond
        parts.append(
            df.where(notnull).select(
                F.lit(label).alias("a"),
                *[
                    F.col(c).cast("string").alias(v)
                    for c, v in zip(cols, vcols)
                ],
            )
        )
    raw = parts[0]
    for p in parts[1:]:
        raw = raw.unionAll(p)
    # fan_out first: the string-cast + hash-agg map side otherwise
    # runs on the one task per single-row-group scan (guide §2.5;
    # no-op at real scale).
    return _spider_containment(fan_out(raw), vcols)


def _spider_pairs(vals: DataFrame, vcols: "list[str]") -> DataFrame:
    """ONE aggregation chain over a raw (NOT pre-deduped) ``(a,
    v0..vn)`` stack producing every ordered attribute pair's shared
    distinct-tuple count, INCLUDING the diagonal ``lhs == rhs`` —
    whose count is |distinct tuples of lhs|, the containment
    denominator, for free.

    Round-10 restructure (guide §2.4 — remove shuffles outright):
    ``groupBy(tuple).collect_set(a)`` dedupes on its own, so the old
    ``distinct()`` pass (one extra full-stack exchange + aggregation)
    is gone; and deriving the per-attribute counts from the SAME pair
    aggregation's diagonal removes the second consumption of the big
    stack (which previously cost either a recompute of the whole
    union or an eager checkpoint of it). Pairs explode from the
    per-tuple attribute sets — bounded by |attrs|² per tuple, never
    by row count.

    Output: ``(lhs, rhs, shared_values)``, at most |attrs|² rows.
    """
    sets = vals.groupBy(*vcols).agg(F.collect_set("a").alias("attrs"))
    return (
        sets.select(F.explode("attrs").alias("lhs"), "attrs")
        .select("lhs", F.explode("attrs").alias("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).alias("shared_values"))
    )


def _spider_containment(vals: DataFrame, vcols: "list[str]") -> DataFrame:
    """Shared SPIDER tail: the :func:`_spider_pairs` matrix checkpointed
    once (k rows — |attrs|², orders smaller than the stack it came
    from; the heavy upstream then runs exactly once), the diagonal
    split out as the per-attribute distinct counts, containment =
    shared == |lhs|."""
    pairs_all = _spider_pairs(vals, vcols).localCheckpoint(eager=True)
    counts = pairs_all.where(F.col("lhs") == F.col("rhs")).select(
        "lhs", F.col("shared_values").alias("lhs_values")
    )
    return (
        pairs_all.where(F.col("lhs") != F.col("rhs"))
        .join(F.broadcast(counts), "lhs")
        .select(
            "lhs",
            "rhs",
            "lhs_values",
            "shared_values",
            (F.col("shared_values") == F.col("lhs_values")).alias("contained"),
        )
    )


def nary_functional_dependencies(
    df: DataFrame, cols: "list[str]"
) -> DataFrame:
    """Level-2-determinant FD discovery — the lattice step above
    :func:`functional_dependencies` (single determinant): for every
    unordered column pair (A, B) and every dependent C ∉ {A, B},
    does (A, B) → C hold exactly, and is it MINIMAL (i.e. not already
    implied by A → C or B → C alone — TANE's pruning rule, reported
    as a flag rather than silently dropped so the full candidate
    lattice stays auditable). Rows with a NULL in any of the three
    columns are excluded from that candidate's check; a candidate
    whose support is thereby empty is still emitted (``n_groups =
    n_triples = 0``, vacuously ``holds = 1``) rather than silently
    dropped.

    Scale shape, inherited from the unary rollup: one scan, one
    explode (×|candidates|), dedupe on (cid, detA, detB, dep), then
    two group-bys with strictly shrinking int keys — per-determinant-
    group dependent counts, then per-candidate totals. ``violations``
    = |distinct (a,b,c)| − |distinct (a,b)| is the repair distance.
    The unary `holds` needed for the minimality flag reuses
    :func:`functional_dependencies` (k-row broadcast join).

    Emits ``(det_a, det_b, dep, n_groups, n_triples, violations,
    holds, implied_by_unary)`` for every candidate.
    """
    if len(cols) < 3:
        raise ValueError(
            "nary_functional_dependencies needs >= 3 columns"
        )
    cands = [
        (a, b, c)
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
        for c in cols
        if c != a and c != b
    ]
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("cid"),
                F.col(a).cast("string").alias("da"),
                F.col(b).cast("string").alias("db"),
                F.col(c).cast("string").alias("dc"),
            )
            for i, (a, b, c) in enumerate(cands)
        ]
    )
    from ..sources.loaders import fan_out

    # ×|candidates| explode + string casts on a single-row-group scan
    # otherwise run on one core (guide §2.5); spread the needed columns
    deduped = (
        fan_out(df.select(*sorted({c for cand in cands for c in cand})))
        .select(F.explode(arr).alias("p"))
        .select("p.*")
        .where(
            F.col("da").isNotNull()
            & F.col("db").isNotNull()
            & F.col("dc").isNotNull()
        )
        .groupBy("cid", "da", "db", "dc")
        .agg(F.lit(1).alias("_one"))
    )
    per_group = deduped.groupBy("cid", "da", "db").agg(
        F.count(F.lit(1)).alias("_n_dep_vals")
    )
    per_cand = per_group.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("_n_dep_vals").cast("long").alias("n_triples"),
    )
    spark = df.sparkSession
    names = _k_row_df(spark, 
        [(i, a, b, c) for i, (a, b, c) in enumerate(cands)],
        "cid int, det_a string, det_b string, dep string",
    )
    unary = functional_dependencies(df, cols).select(
        F.col("det").alias("_ud"),
        F.col("dep").alias("_up"),
        F.col("holds").alias("_uh"),
    )
    # right-join against the full candidate list so a degenerate
    # candidate (every row NULL in one of its three columns → zero
    # groups) is still emitted, with the vacuous-truth convention
    # n_groups = n_triples = 0, holds = 1 — matching the per-candidate
    # UNION ALL oracle, which aggregates over the empty relation
    out = (
        names.join(F.broadcast(per_cand), "cid", "left")
        .select(
            "cid",
            "det_a",
            "det_b",
            "dep",
            F.coalesce(F.col("n_groups"), F.lit(0).cast("long")).alias(
                "n_groups"
            ),
            F.coalesce(F.col("n_triples"), F.lit(0).cast("long")).alias(
                "n_triples"
            ),
        )
        .join(
            F.broadcast(unary),
            (F.col("det_a") == F.col("_ud"))
            & (F.col("dep") == F.col("_up")),
            "left",
        )
        .withColumnRenamed("_uh", "_ha")
        .drop("_ud", "_up")
        .join(
            F.broadcast(unary),
            (F.col("det_b") == F.col("_ud"))
            & (F.col("dep") == F.col("_up")),
            "left",
        )
        .withColumnRenamed("_uh", "_hb")
        .drop("_ud", "_up")
    )
    return out.select(
        "det_a",
        "det_b",
        "dep",
        "n_groups",
        "n_triples",
        (F.col("n_triples") - F.col("n_groups")).alias("violations"),
        (F.col("n_triples") == F.col("n_groups"))
        .cast("int")
        .alias("holds"),
        (
            # a missing unary row means that (det, dep) pair had zero
            # joint-non-null support — vacuously holds (the oracle's
            # per-pair aggregate over the empty relation yields
            # count(*) = count(DISTINCT) = 0 → uh = 1)
            (
                F.coalesce(F.col("_ha"), F.lit(1))
                + F.coalesce(F.col("_hb"), F.lit(1))
            )
            > 0
        )
        .cast("int")
        .alias("implied_by_unary"),
    )


def ind_apriori_candidates(
    inds: "Sequence[tuple[tuple[str, Sequence[str]], tuple[str, Sequence[str]]]]",
) -> "list[tuple[tuple[str, tuple[str, ...]], tuple[str, tuple[str, ...]]]]":
    """MIND-style Apriori level-up for the IND lattice (De Marchi et
    al.): given the VERIFIED level-(n−1) INDs, generate the level-n
    candidates whose every (n−1)-ary projection is among them — the
    step that connects :func:`inclusion_dependencies` (level 1) to
    :func:`nary_inclusion_dependencies` (verification of any level),
    completing the lattice walk 1 → 2 → 3 → ….

    Each IND is ``((lhs_rel, lhs_cols), (rhs_rel, rhs_cols))`` with
    coordinate i of the left side mapping to coordinate i of the
    right. Candidates are generated canonically (lhs columns in
    strictly increasing name order, so each composite appears once),
    require distinct columns on each side, and are pruned unless ALL
    n coordinate-deleting projections are verified INDs — at level
    2→3 that is the three pair projections, which is what makes the
    walk sound: a refuted pair kills every triple containing it.

    Scale note: this is driver-side METADATA arithmetic — input and
    output are attribute combinations (|attrs| choose n), never data.
    The data-touching verification of the emitted candidates is the
    distributed SPIDER pass in :func:`nary_inclusion_dependencies`.
    """
    canon = set()
    arities = set()
    for (lrel, lcols), (rrel, rcols) in inds:
        lc, rc = tuple(lcols), tuple(rcols)
        if len(lc) != len(rc):
            raise ValueError(
                f"IND sides must share arity, got {len(lc)} vs {len(rc)}"
            )
        arities.add(len(lc))
        canon.add(((lrel, lc), (rrel, rc)))
    if not canon:
        return []
    if len(arities) != 1:
        raise ValueError(f"all input INDs must share one arity: {arities}")
    n_in = arities.pop()

    by_pair: dict[tuple[str, str], list] = {}
    for (lrel, lc), (rrel, rc) in canon:
        by_pair.setdefault((lrel, rrel), []).append((lc, rc))
    out = []
    for (lrel, rrel), sigs in by_pair.items():
        sigs.sort()
        for i, (lc1, rc1) in enumerate(sigs):
            for lc2, rc2 in sigs[i + 1 :]:
                if lc1[:-1] != lc2[:-1] or rc1[:-1] != rc2[:-1]:
                    continue
                if lc1[-1] >= lc2[-1]:
                    continue
                lc = lc1 + (lc2[-1],)
                rc = rc1 + (rc2[-1],)
                if len(set(lc)) <= n_in or len(set(rc)) <= n_in:
                    continue
                if all(
                    (
                        (lrel, lc[:j] + lc[j + 1 :]),
                        (rrel, rc[:j] + rc[j + 1 :]),
                    )
                    in canon
                    for j in range(n_in + 1)
                ):
                    out.append(((lrel, lc), (rrel, rc)))
    return sorted(out)


_IND_SEP = "\x1f"


def ind_lattice_walk(
    sources: "dict[str, tuple[DataFrame, Sequence[str]]]",
    *,
    max_level: "int | None" = None,
) -> DataFrame:
    """The full MIND fixpoint over the IND lattice (De Marchi et al.):
    discover every canonical inclusion dependency among the given
    relations' columns at EVERY arity — level 1 verified exhaustively
    by the unary SPIDER pass (:func:`inclusion_dependencies`), each
    higher level generated by Apriori from the previous level's
    survivors (:func:`ind_apriori_candidates`) and verified by the
    value-tuple SPIDER pass (:func:`nary_inclusion_dependencies`) —
    until a level yields no candidates (or ``max_level``).

    ``sources`` maps a relation label to ``(df, columns)``. Canonical
    form: lhs columns in strictly increasing name order, rhs any
    duplicate-free column sequence of the same arity (coordinate i
    maps to coordinate i) — every IND is equivalent to exactly one
    canonical form, so completeness is per equivalence class. For
    relations with NO NULLs in the profiled columns, the emitted set
    equals ALL true canonical INDs up to the stop level (Apriori
    soundness: a true level-n IND has all n projections true, hence
    is generated and verified). With NULLs, tuples with any NULL
    coordinate are excluded at every level, and that breaks
    projection monotonicity: a composite can hold on its
    null-complete tuples while a unary projection fails only because
    of rows the composite never sees — MIND's standard completeness
    assumption (De Marchi et al. work over complete relations), and
    the documented behavior here: such null-dependent composites are
    pruned, never falsely emitted (verification itself is always
    exact).

    Returns a k-row metadata DataFrame (one row per VERIFIED IND):
    ``(level, lhs_rel, lhs_cols, rhs_rel, rhs_cols, n_values)`` with
    comma-joined column lists and ``n_values`` = the lhs's distinct
    (tuple) count. Driver work is lattice bookkeeping only; each
    level runs exactly one distributed SPIDER job.
    """
    if len(sources) < 1:
        raise ValueError("ind_lattice_walk needs at least one relation")
    for rel, (_, cols) in sources.items():
        for c in list(cols) + [rel]:
            if _IND_SEP in c or "," in c:
                raise ValueError(
                    f"relation/column names must not contain ',' or "
                    f"\\x1f: {c!r}"
                )

    def _label(rel: str, cols: "tuple[str, ...]") -> str:
        return rel + _IND_SEP + ",".join(cols)

    def _parse(label: str) -> "tuple[str, tuple[str, ...]]":
        rel, cols = label.split(_IND_SEP, 1)
        return rel, tuple(cols.split(","))

    spark = next(iter(sources.values()))[0].sparkSession
    out_rows: "list[tuple]" = []
    schema = (
        "level int, lhs_rel string, lhs_cols string, "
        "rhs_rel string, rhs_cols string, n_values bigint"
    )
    dfs = {rel: df for rel, (df, _) in sources.items()}

    def _verify(
        composites: "set[tuple[str, tuple[str, ...]]]", n: int
    ) -> "dict[tuple[str, str], int]":
        """One SPIDER job for a whole level: each RELATION is scanned
        once, its composites exploded as (label, v0..vn) structs, the
        whole stack deduped in one shuffle (a per-label scan+distinct
        — the nary_inclusion_dependencies construction, which cannot
        assume shared parents — cost ~20 s per level on this scope;
        one scan per relation is the walk's advantage for knowing the
        composites come from a handful of relations)."""
        vcols = [f"v{i}" for i in range(n)]
        by_rel: "dict[str, list[tuple[str, ...]]]" = {}
        for rel, cols in composites:
            by_rel.setdefault(rel, []).append(cols)
        parts = []
        for rel, col_lists in sorted(by_rel.items()):
            structs = [
                F.struct(
                    F.lit(_label(rel, cols)).alias("a"),
                    *[
                        F.col(c).cast("string").alias(v)
                        for c, v in zip(cols, vcols)
                    ],
                )
                for cols in sorted(col_lists)
            ]
            notnull = F.col(vcols[0]).isNotNull()
            for v in vcols[1:]:
                notnull = notnull & F.col(v).isNotNull()
            from ..sources.loaders import fan_out

            rel_cols = sorted({c for cols in col_lists for c in cols})
            parts.append(
                # fan_out BEFORE the explode: the ×|composites| struct
                # fan-out and string casts are the map-side CPU, and a
                # single-row-group scan would run them on one core
                fan_out(dfs[rel].select(*rel_cols))
                .select(F.explode(F.array(*structs)).alias("s"))
                .select("s.*")
                .where(notnull)
            )
        raw = parts[0]
        for p in parts[1:]:
            raw = raw.unionAll(p)
        # ONE job for the whole level: collect the |composites|²-row
        # pair matrix (diagonal included) and decide containment on
        # the driver — the level's survivors were being collected
        # anyway, so the old containment tail (checkpoint + counts
        # join) only added jobs (round-10; guide §2.4)
        shared = {
            (r["lhs"], r["rhs"]): r["shared_values"]
            for r in _spider_pairs(raw, vcols).collect()
        }
        return {
            (l, r): shared[(l, l)]
            for (l, r), s in shared.items()
            if l != r and s == shared[(l, l)]
        }

    # ---- level 1: exhaustive unary pass ------------------------------
    unary = {
        (rel, (c,)) for rel, (_, cols) in sources.items() for c in cols
    }
    if len(unary) < 2:
        return _k_row_df(spark, [], schema)
    verified = _verify(unary, 1)
    survivors = []
    for (lhs, rhs), n_vals in sorted(verified.items()):
        lrel, lc = _parse(lhs)
        rrel, rc = _parse(rhs)
        survivors.append(((lrel, lc), (rrel, rc)))
        out_rows.append(
            (1, lrel, ",".join(lc), rrel, ",".join(rc), n_vals)
        )

    # ---- levels 2..: Apriori generate, one SPIDER job per level ------
    level = 2
    while survivors and (max_level is None or level <= max_level):
        cands = ind_apriori_candidates(survivors)
        if not cands:
            break
        composites = {side for cand in cands for side in cand}
        if len(composites) < 2:
            break
        verified = _verify(composites, level)
        survivors = []
        for (lrel, lc), (rrel, rc) in cands:
            key = (_label(lrel, lc), _label(rrel, rc))
            if key in verified:
                survivors.append(((lrel, lc), (rrel, rc)))
                out_rows.append(
                    (
                        level,
                        lrel,
                        ",".join(lc),
                        rrel,
                        ",".join(rc),
                        verified[key],
                    )
                )
        level += 1
    return _k_row_df(spark, out_rows, schema)


def approximate_fds(
    df: DataFrame, cols: "list[str]", *, max_error: float = 0.01
) -> DataFrame:
    """Approximate functional-dependency discovery (the g3 metric of
    Kivinen & Mannila / TANE): for every ordered pair (det → dep),
    ``error`` is the minimum fraction of rows that must be removed for
    the FD to hold exactly — ``1 − Σ_det max_dep count(det, dep) / n``
    — and ``holds`` is ``error <= max_error``. The tolerant sibling of
    :func:`functional_dependencies` (exact, distinct-pair based):
    real data carries entry errors, and a 0.1%-violated dependency is
    a discovery, not a miss.

    Rows where either side is NULL are excluded from that pair's
    check (NULL determines nothing).

    Scale shape mirrors the exact operator's linear rollup: ONE scan
    explodes each row into its |unordered pairs| value structs, one
    multiplicity count per (pid, va, vb) serves BOTH orientations
    (max over the other side per determinant value), then two
    strictly-shrinking int-keyed group-bys finish. No per-pair jobs,
    no countDistinct Expand.
    """
    if len(cols) < 2:
        raise ValueError("approximate_fds needs >= 2 columns")
    if not 0.0 <= max_error < 1.0:
        raise ValueError(f"max_error must be in [0, 1), got {max_error}")
    upairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("pid"),
                F.col(a).cast("string").alias("va"),
                F.col(b).cast("string").alias("vb"),
            )
            for i, (a, b) in enumerate(upairs)
        ]
    )
    counted = (
        df.select(F.explode(arr).alias("p"))
        .select("p.*")
        .where(F.col("va").isNotNull() & F.col("vb").isNotNull())
        .groupBy("pid", "va", "vb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    both = F.array(
        F.struct(
            (F.col("pid") * 2).alias("oid"),
            F.col("va").alias("dv"),
            F.col("c").alias("c"),
        ),
        F.struct(
            (F.col("pid") * 2 + 1).alias("oid"),
            F.col("vb").alias("dv"),
            F.col("c").alias("c"),
        ),
    )
    per_det = (
        counted.select(F.explode(both).alias("p"))
        .select("p.*")
        .groupBy("oid", "dv")
        .agg(F.max("c").alias("mx"), F.sum("c").alias("s"))
    )
    agg = per_det.groupBy("oid").agg(
        F.sum("mx").alias("keep"), F.sum("s").alias("n")
    )
    det_names = F.array(*[F.lit(n) for a, b in upairs for n in (a, b)])
    dep_names = F.array(*[F.lit(n) for a, b in upairs for n in (b, a)])
    err = F.lit(1.0) - F.col("keep").cast("double") / F.col("n").cast(
        "double"
    )
    return agg.select(
        F.element_at(det_names, F.col("oid") + 1).alias("det"),
        F.element_at(dep_names, F.col("oid") + 1).alias("dep"),
        F.col("n").cast("long").alias("n"),
        F.col("keep").cast("long").alias("keep"),
        err.alias("error"),
        (err <= F.lit(float(max_error))).alias("holds"),
    )


def conditional_fds(
    df: DataFrame,
    det: str,
    dep: str,
    cond: str,
) -> DataFrame:
    """Constant conditional-FD discovery: for each value of ``cond``,
    does ``det → dep`` hold WITHIN that partition of the data? The
    pattern-tableau special case (one condition attribute, constant
    patterns) of CFD mining (Fan et al., TODS 2008) — the dependency
    a repair tool reports as "holds for status='F' rows, 12
    violations elsewhere". Rows with a NULL on any of the three
    columns are excluded (NULL determines nothing, and a NULL
    condition names no partition).

    One distinct-triple aggregation, then two shrinking group-bys —
    per condition value: ``n_det`` distinct determinant values,
    ``violations = |distinct (det, dep)| − n_det``, ``holds`` iff 0.
    Scale: shuffle keys are (cond, det[, dep]) values; never row
    count.
    """
    c, a, b = F.col(cond), F.col(det), F.col(dep)
    triples = (
        df.where(c.isNotNull() & a.isNotNull() & b.isNotNull())
        .select(
            c.cast("string").alias("cv"),
            a.cast("string").alias("dv"),
            b.cast("string").alias("bv"),
        )
        .groupBy("cv", "dv", "bv")
        .agg(F.count(F.lit(1)).alias("rows_"))
    )
    per_det = triples.groupBy("cv", "dv").agg(
        F.count(F.lit(1)).alias("n_dep_vals"),
        F.sum("rows_").alias("rows_"),
    )
    out = per_det.groupBy("cv").agg(
        F.sum("rows_").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_det"),
        (F.sum("n_dep_vals") - F.count(F.lit(1)))
        .cast("long")
        .alias("violations"),
    )
    return out.select(
        F.col("cv").alias("cond_value"),
        "n",
        "n_det",
        "violations",
        (F.col("violations") == 0).alias("holds"),
    )
