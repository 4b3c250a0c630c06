"""Streaming distinct-count maintenance via mergeable HLL sketches.

The streaming twin of ``operators/sketch.py``: exact streaming
``count(DISTINCT)`` needs unbounded keyed state (every seen value),
which watermarks cannot bound for all-time metrics. The sketch answer:
each micro-batch aggregates to per-key HLL binaries (KBs), and a
``foreachBatch`` sink merges them into a persistent sketch table —
bounded state, mergeable forever, and the SAME table the batch
``rollup_distinct`` / ``sliding_distinct`` operators query. This is
the lambda split the streaming anomaly scorer already uses: the 24/7
stream carries per-key kilobytes, analytics run on the sketch table.

Exactly-once: sketch union is register-wise max — re-merging a batch
already present would be idempotent for the sketch itself, but the
companion ``n_rows`` sum would double-count; the base sink's replay
guard (marker version >= batch id → skip) makes replays no-ops, which
is the stronger property and covers both columns.

At scale: the sink rewrites a snapshot of |keys| rows (not events);
each micro-batch shuffles only its own per-key partial sketches
(map-side combined, like any aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import DEFAULT_LG_K
from .sinks import ParquetUpsertSink


class SketchMergeSink(ParquetUpsertSink):
    """foreachBatch handler maintaining a per-key HLL sketch table.

    Incoming batch rows are aggregated to ``(keys..., sketch, n_rows)``
    and UNIONED into the snapshot (register-wise max + count sum),
    unlike the base sink's last-writer-wins replace.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        value_col: str,
        *,
        lg_k: int = DEFAULT_LG_K,
    ):
        super().__init__(spark, path, keys)
        self.value_col = value_col
        self.lg_k = lg_k

    def _merge(self, prev: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        batch_sk = batch_df.groupBy(*self.keys).agg(
            F.hll_sketch_agg(F.col(self.value_col), F.lit(self.lg_k)).alias(
                "sketch"
            ),
            F.count("*").alias("n_rows"),
        )
        if prev is None:
            merged = batch_sk
        else:
            merged = (
                prev.select(*self.keys, "sketch", "n_rows")
                .unionByName(batch_sk)
                .groupBy(*self.keys)
                .agg(
                    # allowDifferentLgConfigK: a redeployed stream with a
                    # changed lg_k keeps merging (at the coarser precision)
                    # instead of poisoning the snapshot
                    F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("sketch"),
                    F.sum("n_rows").alias("n_rows"),
                )
            )
        return merged.withColumn(
            "distinct_est", F.hll_sketch_estimate(F.col("sketch")).cast("long")
        )

    def estimates(self) -> DataFrame | None:
        """Current ``(keys..., n_rows, distinct_est)`` — the queryable
        face of the sketch table (sketch binary omitted)."""
        cur = self.current()
        if cur is None:
            return None
        return cur.select(*self.keys, "n_rows", "distinct_est")
