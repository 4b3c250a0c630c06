"""Mergeable sketches: pre-aggregate once, roll up anywhere.

``count(DISTINCT user)`` and ``percentile(value, q)`` are the two
aggregates that do NOT partial-combine: exact distinct over 100 TB must
shuffle every distinct key, a per-day exact count can never be summed
into a weekly one, and a weekly p99 is not any function of daily p99s.
The warehouse-standard fix (Apache DataSketches, used by Druid/Hive/
BigQuery and built into Spark 4 as ``hll_sketch_agg``/``hll_union``,
``kll_sketch_agg_double``/``kll_merge_agg_double``,
``theta_sketch_agg``/``theta_union_agg``) is to materialize per-bucket
sketches — a few KB each, mergeable by design — so any coarser rollup
(week from days, all-sources from per-source, trailing windows) becomes
a union of sketches instead of a rescan of raw events.

Three sketch families, three distinct capabilities:

- **HLL** (``build_distinct_sketches`` …): distinct counts, smallest
  binaries, union-only set algebra.
- **KLL** (``build_quantile_sketches`` / ``rollup_quantiles`` /
  ``sliding_quantile``): mergeable quantiles — a persisted daily KLL
  table answers "p95 latency, any grouping, any trailing window"
  without re-touching raw rows. Rank error is ~1.7% at the default
  k=200 (Karnin-Lang-Liberty 2016), independent of data size.
- **Theta** (``build_theta_sketches`` / ``rollup_theta_distinct`` /
  ``bucket_retention``): distinct counts WITH full set algebra —
  intersection and difference, not just union. Retention ("users
  active in both week N and week N+1") and churn ("in N, gone in
  N+1") become lag-window expressions over KB binaries; HLL cannot
  express either (inclusion-exclusion on HLL unions amplifies error
  catastrophically for small intersections).

Scale shape:

- ``build_distinct_sketches`` — ONE pass over raw data, map-side
  combined (sketches merge associatively, so partial aggregation
  applies); output cardinality = bucket count, each row carrying a
  ~2^lg_k-register binary. This is the table you persist.
- ``rollup_distinct`` / ``sliding_distinct`` — operate on the
  *sketch table* (bucket-count rows, not event rows). A 90-day
  trailing-distinct over 3 years of days unions 90 KB-sized binaries
  per output row; raw events are never touched again.

Estimates are deterministic (the sketch is hash-based, no RNG): the
same input always produces the same registers, and a union of daily
sketches estimates EXACTLY what one sketch over the concatenated data
estimates — tests pin both properties. Error is the standard HLL
~1.04/sqrt(2^lg_k) (±1.6% at the default lg_k=12).

No DuckDB oracle: the sketch binary is library-specific, so the
contract layer doesn't expose these (DuckDB's approx_distinct uses a
different estimator); coverage is the pytest suite, which checks the
estimates against exact distinct counts within the HLL error bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_LG_K = 12


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` plus exact row count.

    The materialization pass: one map-side-combined aggregation; the
    output is the persistable pre-aggregate (group keys, ``n_rows``,
    ``sketch`` binary, and the group's own ``distinct_est``).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return (
        df.groupBy(*group_cols)
        .agg(
            F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
            F.count("*").alias("n_rows"),
        )
        .withColumn(
            "distinct_est", F.hll_sketch_estimate(F.col("sketch")).cast("long")
        )
    )


def rollup_distinct(
    sketches: DataFrame,
    group_cols: list[str],
    *,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Distinct estimate at a coarser grouping by unioning sketches.

    Runs on the sketch table only. ``group_cols=[]`` produces the
    single grand-total row (one tiny all-to-one union — the sketches
    are KBs, so SinglePartition here is the cheap, correct plan).
    """
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .cast("long")
        .alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


def sliding_distinct(
    sketches: DataFrame,
    order_col: str,
    *,
    partition_cols: list[str] | None = None,
    preceding: int = 6,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Trailing-window distinct estimate per bucket — e.g. 7-day
    rolling distinct users from daily sketches (``preceding=6``).

    The query exact counting cannot answer from per-day partials AT
    ALL: trailing distinct is not a sum of daily distincts. With
    sketches it is a windowed union over ``preceding + 1`` KB-sized
    binaries. ``order_col`` must be integer-like (day number, hour
    bucket); ``rangeBetween`` makes gaps in the series behave
    correctly (a missing day contributes nothing, the frame is by
    VALUE not row position).
    """
    w = (
        Window.partitionBy(*(partition_cols or []))
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-preceding, 0)
    )
    return sketches.select(
        *(partition_cols or []),
        order_col,
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)).over(w))
        .cast("long")
        .alias("trailing_distinct_est"),
    )


def distinct_error_bound(lg_k: int = DEFAULT_LG_K) -> float:
    """The standard HLL relative standard error for a given lg_k."""
    return 1.04 / ((2 ** lg_k) ** 0.5)


def day_bucket(ts_nanos: Column) -> Column:
    """Epoch-anchored day number from the engine's canonical bigint
    epoch-nanos event time (see sources/loaders.py) — integer-exact,
    timezone-free, the same construction the temporal operators use."""
    return F.floor(ts_nanos / F.lit(86_400_000_000_000)).cast("long")


# --------------------------------------------------------------------
# KLL quantile sketches: mergeable percentiles
# --------------------------------------------------------------------

DEFAULT_KLL_K = 200


def _q_name(q: float) -> str:
    """Column name for a rank: 0.5 → p50, 0.999 → p99_9."""
    s = f"{q * 100:g}".replace(".", "_")
    return f"p{s}"


def build_quantile_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: int = DEFAULT_KLL_K,
) -> DataFrame:
    """Per-group KLL doubles sketch of ``value_col`` plus exact count.

    The quantile twin of ``build_distinct_sketches``: one map-side-
    combined pass, output cardinality = bucket count, each row a
    ~3 KB binary (k=200) from which ANY rank can later be read. NULL
    values are skipped by the aggregate (like percentile_approx).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias("qsketch"),
        F.count(value_col).alias("n_rows"),
    )


def rollup_quantiles(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
    *,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Quantile estimates at a coarser grouping by merging KLL
    sketches — the query exact percentiles cannot answer from
    partials at all (a week's p99 is not a function of daily p99s).

    Runs on the sketch table only; ``group_cols=[]`` gives the
    grand-total row. One output column per rank (0.95 → ``p95``).
    """
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile ranks must be in [0, 1], got {q}")
    merged = F.kll_merge_agg_double(F.col(sketch_col)).alias("_m")
    agg = sketches.groupBy(*group_cols).agg(merged, F.sum("n_rows").alias("n_rows")) \
        if group_cols else sketches.agg(merged, F.sum("n_rows").alias("n_rows"))
    return agg.select(
        *group_cols,
        "n_rows",
        *[
            F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(float(q)))
            .alias(_q_name(q))
            for q in quantiles
        ],
    )


def sliding_quantile(
    sketches: DataFrame,
    order_col: str,
    quantiles: Sequence[float] = (0.5, 0.99),
    *,
    partition_cols: list[str] | None = None,
    preceding: int = 6,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Trailing-window quantiles per bucket — e.g. 7-day rolling p99
    from daily sketches (``preceding=6``). Same value-based
    ``rangeBetween`` frame as ``sliding_distinct``: a missing bucket
    contributes nothing rather than shifting the frame."""
    w = (
        Window.partitionBy(*(partition_cols or []))
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-preceding, 0)
    )
    merged = F.kll_merge_agg_double(F.col(sketch_col)).over(w)
    return sketches.select(
        *(partition_cols or []),
        order_col,
        *[
            F.kll_sketch_get_quantile_double(merged, F.lit(float(q)))
            .alias(f"trailing_{_q_name(q)}")
            for q in quantiles
        ],
    )


# --------------------------------------------------------------------
# Theta sketches: distinct counts with set algebra
# --------------------------------------------------------------------


def build_theta_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group Theta sketch of ``value_col`` plus exact row count.

    Same materialization shape as the HLL builder, but the binary
    supports intersection/difference downstream. Use Theta when the
    rollups need set algebra (retention, churn, audience overlap);
    stay on HLL when union-only rollups suffice (smaller binaries).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return (
        df.groupBy(*group_cols)
        .agg(
            F.theta_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("tsketch"),
            F.count("*").alias("n_rows"),
        )
        .withColumn(
            "distinct_est",
            F.theta_sketch_estimate(F.col("tsketch")).cast("long"),
        )
    )


def rollup_theta_distinct(
    sketches: DataFrame,
    group_cols: list[str],
    *,
    sketch_col: str = "tsketch",
) -> DataFrame:
    """Distinct estimate at a coarser grouping by theta-union — the
    Theta twin of ``rollup_distinct``."""
    agg = [
        F.theta_sketch_estimate(F.theta_union_agg(F.col(sketch_col)))
        .cast("long")
        .alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


def bucket_retention(
    sketches: DataFrame,
    order_col: str,
    *,
    partition_cols: list[str] | None = None,
    sketch_col: str = "tsketch",
) -> DataFrame:
    """Consecutive-bucket retention/churn from the theta table alone.

    For each bucket (ordered by ``order_col`` within
    ``partition_cols``): ``retained_est`` = |current ∩ previous|,
    ``churned_est`` = |previous \\ current|, ``new_est`` =
    |current \\ previous|. One lag window over KB-sized binaries — raw
    events are never re-read, and no exact-count formulation can
    compute this from per-bucket partials at all. The first bucket per
    partition reports NULLs (no predecessor).

    Buckets are ROW-adjacent (``lag(1)``), so gaps in ``order_col``
    pair a bucket with its nearest existing predecessor; pre-gap-fill
    the sketch table if calendar adjacency matters.
    """
    w = Window.partitionBy(*(partition_cols or [])).orderBy(
        F.col(order_col).cast("long")
    )
    prev = F.lag(F.col(sketch_col)).over(w)
    cur = F.col(sketch_col)
    est = F.theta_sketch_estimate
    return sketches.select(
        *(partition_cols or []),
        order_col,
        F.col("distinct_est"),
        F.when(prev.isNotNull(), est(F.theta_intersection(cur, prev)))
        .cast("long")
        .alias("retained_est"),
        F.when(prev.isNotNull(), est(F.theta_difference(prev, cur)))
        .cast("long")
        .alias("churned_est"),
        F.when(prev.isNotNull(), est(F.theta_difference(cur, prev)))
        .cast("long")
        .alias("new_est"),
    )


def minhash_distinct_estimate(
    df: DataFrame,
    value_col: str,
    group_cols: "list[str]",
    *,
    num_hashes: int = 16,
) -> DataFrame:
    """Deterministic distinct-count ESTIMATE per group from k
    independent minimum hashes — the oracle-reproducible companion to
    the HLL/theta sketches above (whose binary registers no SQL engine
    can replay).

    Each value hashes once (house md5-int60 mod P), the frozen affine
    family (operators/dedup.py::MINHASH_AFFINE) derives ``num_hashes``
    uniform (0,1] variates, and the group keeps each variate's MIN —
    k plain ``min`` aggregates, ONE map-side-combined scan, 8k bytes
    of state per group at any scale. For D distinct values the minima
    are ≈ Beta(1, D), so ``D̂ = k / Σᵢ uᵢ − 1`` is the standard MLE
    (exponential-spacings argument; relative error ~1/√k). NULLs are
    ignored; an empty group yields NULL estimate.

    Exactness note: the ESTIMATOR is deterministic (md5 + exact int64
    affine mixes + fixed fold order), so the DuckDB oracle reproduces
    the estimate bit-for-bit even though the estimate itself is
    approximate — the house md5-coin doctrine applied to cardinality.

    Returns ``(group..., n_rows, distinct_est)``.
    """
    from .dedup import MINHASH_AFFINE, MINHASH_P

    if not 1 <= num_hashes <= len(MINHASH_AFFINE):
        raise ValueError(
            f"num_hashes must be in [1, {len(MINHASH_AFFINE)}], got {num_hashes}"
        )
    x = (
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
        % MINHASH_P
    )
    base = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, x.alias("_x")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for i, (a, b) in enumerate(MINHASH_AFFINE[:num_hashes]):
        u = ((F.lit(a) * F.col("_x") + F.lit(b)) % MINHASH_P + 1).cast(
            "double"
        ) / F.lit(float(MINHASH_P))
        aggs.append(F.min(u).alias(f"_u{i}"))
    g = base.groupBy(*group_cols).agg(*aggs)
    s = F.col("_u0")
    for i in range(1, num_hashes):
        s = s + F.col(f"_u{i}")
    return g.select(
        *group_cols,
        "n_rows",
        (F.lit(float(num_hashes)) / s - F.lit(1.0)).alias("distinct_est"),
    )
