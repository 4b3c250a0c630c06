"""Mergeable distinct-count sketches: pre-aggregate once, roll up
anywhere.

``count(DISTINCT user)`` is the one aggregate that does NOT
partial-combine: exact distinct over 100 TB must shuffle every distinct
key, and a per-day exact count can never be summed into a weekly one.
The warehouse-standard fix (Apache DataSketches, used by Druid/Hive/
BigQuery and built into Spark 4 as ``hll_sketch_agg``/``hll_union``) is
to materialize per-bucket HLL sketches — a few KB each, mergeable by
design — so any coarser rollup (week from days, all-sources from
per-source, trailing windows) becomes a union of sketches instead of a
rescan of raw events.

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
