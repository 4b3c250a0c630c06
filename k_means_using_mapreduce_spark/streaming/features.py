"""Streaming time-decayed feature maintenance.

The streaming twin of operators/timeseries.py::decayed_aggregate,
exploiting the exponential kernel's composition law: a decayed sum
"as of t₂" is the decayed sum as of t₁ scaled by ``0.5^((t₂-t₁)/hl)``
plus the new events' contributions — so the entire history compresses
into ``(group, decayed_sum, decayed_n, asof_us)`` state rows that
each micro-batch re-aligns and adds to. The maintained value is
EXACTLY what one batch pass over all events so far would produce
(parity-tested), at per-batch cost proportional to the batch.

The reference snapshot instant advances to the max event time seen
(batch data decides it — deterministic on replay, no now() anywhere:
the engine's determinism doctrine). A late batch whose events are all
older than the current asof decays those events' contributions INTO
the existing reference frame rather than rewinding it — the math is
associative either way.

Exactly-once: decayed addition is not idempotent; the base sink's
replay guard is load-bearing, as for the moments/count-min/HLL sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import decayed_aggregate
from .sinks import ParquetUpsertSink


class DecayedFeatureSink(ParquetUpsertSink):
    """foreachBatch handler maintaining per-group decayed sum/count;
    ``features()`` returns the live state incl. the derived decayed
    mean."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: list[str],
        value_col: str,
        ts_col: str,
        *,
        half_life_us: int,
    ):
        if not group_cols:
            raise ValueError("group_cols must be non-empty")
        if half_life_us <= 0:
            raise ValueError(f"half_life_us must be > 0, got {half_life_us}")
        super().__init__(spark, path, group_cols)
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.ts_col = ts_col
        self.half_life_us = half_life_us

    def _merge(self, prev: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        from ..sources.loaders import ns_to_us

        batch_max = batch_df.agg(F.max(ns_to_us(self.ts_col))).first()[0]
        if batch_max is None:  # empty batch: state unchanged
            if prev is not None:
                return prev
            # empty FIRST batch: 0-row state with the group columns'
            # REAL types (a string-typed placeholder would poison the
            # snapshot schema for every later unionByName)
            return (
                batch_df.select(*self.group_cols)
                .limit(0)
                .withColumn("decayed_sum", F.lit(0.0))
                .withColumn("decayed_n", F.lit(0.0))
                .withColumn("asof_us", F.lit(0).cast("long"))
            )
        prev_asof = None
        if prev is not None:
            prev_asof = prev.agg(F.max("asof_us")).first()[0]
        asof_new = (
            batch_max if prev_asof is None else max(batch_max, prev_asof)
        )
        b = decayed_aggregate(
            batch_df,
            self.group_cols,
            self.value_col,
            self.ts_col,
            half_life_us=self.half_life_us,
            asof_us=asof_new,
        ).select(
            *self.group_cols,
            "decayed_sum",
            "decayed_n",
            F.lit(asof_new).alias("asof_us"),
        )
        if prev is None:
            return b
        scale = F.pow(
            F.lit(0.5),
            (F.lit(asof_new) - F.col("asof_us")).cast("double")
            / F.lit(float(self.half_life_us)),
        )
        aligned_prev = prev.select(
            *self.group_cols,
            (F.col("decayed_sum") * scale).alias("decayed_sum"),
            (F.col("decayed_n") * scale).alias("decayed_n"),
            F.lit(asof_new).alias("asof_us"),
        )
        return (
            aligned_prev.unionByName(b)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("decayed_sum").alias("decayed_sum"),
                F.sum("decayed_n").alias("decayed_n"),
                F.max("asof_us").alias("asof_us"),
            )
        )

    def features(self) -> DataFrame | None:
        """Live state ``(group..., decayed_sum, decayed_n,
        decayed_mean, asof_us)`` (None before the first batch)."""
        snap = self.current()
        if snap is None:
            return None
        return snap.select(
            *self.group_cols,
            "decayed_sum",
            "decayed_n",
            (
                F.col("decayed_sum") / F.nullif(F.col("decayed_n"), F.lit(0.0))
            ).alias("decayed_mean"),
            "asof_us",
        )
