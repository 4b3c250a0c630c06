"""Streaming distribution-profile maintenance — the monitor that
watches features drift while the data arrives.

The streaming twin of operators/cleaning.py::numeric_profile /
profile_drift: exact means/stds over an unbounded stream need only
the MERGEABLE moments (n, non_null, Σv, Σv², min, max) per column —
a |columns|-row table, merged per micro-batch by plain addition
(min/max by min/max), exactly the numbers a single batch pass over
all events so far would produce. Medians are NOT maintained (order
statistics don't merge); the KLL sink (streaming/quantiles.py) is
the quantile half of this monitor.

Exactly-once: moment addition is not idempotent, so the base sink's
replay guard (committed marker version >= batch id -> skip) is
load-bearing, as for the count-min and HLL sinks.

At scale: each batch reduces map-side to one moments row per column
before the sink sees it; the snapshot is KBs regardless of stream
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import ParquetUpsertSink


def _moments(df: DataFrame, columns: list[str]) -> DataFrame:
    """(col_name, n_rows, non_null, sum_v, sum_sq, min_v, max_v) —
    one aggregate pass, stack-unpivoted."""
    aggs = [F.count("*").alias("_n")]
    for c in columns:
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"_nn_{c}"),
            F.coalesce(F.sum(v), F.lit(0.0)).alias(f"_s_{c}"),
            F.coalesce(F.sum(v * v), F.lit(0.0)).alias(f"_q_{c}"),
            F.min(v).alias(f"_mn_{c}"),
            F.max(v).alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _s_{c}, _q_{c}, _mn_{c}, _mx_{c}" for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack}) as "
            "(col_name, non_null, sum_v, sum_sq, min_v, max_v)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("col_name", "n_rows", "non_null", "sum_v", "sum_sq", "min_v", "max_v")


class ProfileMergeSink(ParquetUpsertSink):
    """foreachBatch handler maintaining mergeable numeric-column
    moments; ``profile()`` derives mean/std on read, ``drift_vs``
    scores the live profile against a frozen baseline."""

    def __init__(self, spark: SparkSession, path: str, columns: list[str]):
        if not columns:
            raise ValueError("columns must be non-empty")
        super().__init__(spark, path, ["col_name"])
        self.columns = list(columns)

    def _merge(self, prev: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        batch_m = _moments(batch_df, self.columns)
        if prev is None:
            return batch_m
        return (
            prev.unionByName(batch_m)
            .groupBy("col_name")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("non_null").alias("non_null"),
                F.sum("sum_v").alias("sum_v"),
                F.sum("sum_sq").alias("sum_sq"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )

    def profile(self) -> DataFrame | None:
        """Derived live profile ``(col_name, n_rows, non_null, mean,
        std, min_v, max_v)`` (None before the first batch). std is
        the sample std from raw moments — NULL when non_null < 2."""
        snap = self.current()
        if snap is None:
            return None
        nn = F.col("non_null").cast("double")
        mean = F.col("sum_v") / F.nullif(nn, F.lit(0.0))
        var = (F.col("sum_sq") - F.col("sum_v") * F.col("sum_v") / nn) / (
            F.nullif(nn - 1, F.lit(0.0))
        )
        return snap.select(
            "col_name",
            "n_rows",
            "non_null",
            mean.alias("mean"),
            # var NULL (non_null < 2) stays NULL; tiny negative values
            # from float cancellation clamp to 0
            F.when(var.isNull(), F.lit(None).cast("double"))
            .when(var >= 0, F.sqrt(var))
            .otherwise(F.lit(0.0))
            .alias("std"),
            "min_v",
            "max_v",
        )

    def drift_vs(self, baseline: DataFrame) -> DataFrame | None:
        """Live-vs-baseline drift per column. ``baseline`` is any
        ``(col_name, mean, std)``-shaped profile — a frozen
        ``profile()`` snapshot or operators/cleaning.numeric_profile
        output. Returns ``(col_name, mean_base, mean_live,
        mean_shift_sigmas, std_ratio)`` (None before data)."""
        live = self.profile()
        if live is None:
            return None
        b = baseline.select(
            "col_name",
            F.col("mean").alias("mean_base"),
            F.col("std").alias("std_base"),
        )
        return live.join(b, "col_name").select(
            "col_name",
            "mean_base",
            F.col("mean").alias("mean_live"),
            (
                (F.col("mean") - F.col("mean_base"))
                / F.nullif(F.col("std_base"), F.lit(0.0))
            ).alias("mean_shift_sigmas"),
            (F.col("std") / F.nullif(F.col("std_base"), F.lit(0.0))).alias(
                "std_ratio"
            ),
        )
