"""Streaming quantile maintenance via mergeable KLL sketches.

The quantile twin of ``streaming/distinct.py``, and the streaming face
of ``operators/sketch.py``'s KLL family: exact streaming percentiles
need every observed value as state (a percentile is not a function of
any bounded summary — except a sketch). Each micro-batch aggregates to
per-key KLL binaries, and a ``foreachBatch`` sink merges them into a
persistent sketch table — bounded state (~3 KB per key at k=200),
queryable at ANY rank at any time, and the SAME table the batch
``rollup_quantiles`` / ``sliding_quantile`` operators read.

The p99-latency-dashboard shape: the 24/7 stream maintains per-
(service, hour) sketches; dashboards read ranks from KB binaries with
no raw-event rescans and no pre-committed percentile list.

Exactly-once: the base sink's replay guard (marker version >= batch id
→ skip) makes replays no-ops, covering both the sketch and the
``n_rows`` companion count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import DEFAULT_KLL_K, _q_name
from .sinks import ParquetUpsertSink


class QuantileSketchMergeSink(ParquetUpsertSink):
    """foreachBatch handler maintaining a per-key KLL sketch table.

    Incoming batch rows aggregate to ``(keys..., qsketch, n_rows)``
    and MERGE into the snapshot (KLL compactor merge + count sum),
    unlike the base sink's last-writer-wins replace.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        value_col: str,
        *,
        k: int = DEFAULT_KLL_K,
    ):
        super().__init__(spark, path, keys)
        self.value_col = value_col
        self.k = k

    def _merge(self, prev: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        batch_sk = batch_df.groupBy(*self.keys).agg(
            F.kll_sketch_agg_double(
                F.col(self.value_col).cast("double"), F.lit(self.k)
            ).alias("qsketch"),
            F.count(self.value_col).alias("n_rows"),
        )
        if prev is None:
            return batch_sk
        return (
            prev.select(*self.keys, "qsketch", "n_rows")
            .unionByName(batch_sk)
            .groupBy(*self.keys)
            .agg(
                F.kll_merge_agg_double(F.col("qsketch")).alias("qsketch"),
                F.sum("n_rows").alias("n_rows"),
            )
        )

    def quantiles(
        self, ranks: Sequence[float] = (0.5, 0.95, 0.99)
    ) -> DataFrame | None:
        """Current ``(keys..., n_rows, p50, p95, ...)`` — rank reads
        over the persisted binaries (one column per requested rank)."""
        cur = self.current()
        if cur is None:
            return None
        for q in ranks:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantile ranks must be in [0, 1], got {q}")
        return cur.select(
            *self.keys,
            "n_rows",
            *[
                F.kll_sketch_get_quantile_double(
                    F.col("qsketch"), F.lit(float(q))
                ).alias(_q_name(q))
                for q in ranks
            ],
        )
