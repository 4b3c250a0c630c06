"""Streaming count-min frequency maintenance.

The streaming twin of operators/freq.py, completing the sketch-sink
family (HLL distinct: streaming/distinct.py; KLL quantiles:
streaming/quantiles.py): exact streaming per-value counts need state
proportional to the vocabulary (unbounded for open-ended token
streams), while the count-min matrix is a FIXED depth x width counter
grid per group. Each micro-batch aggregates to its own sparse sketch
rows and a ``foreachBatch`` sink adds them into the persistent sketch
table — counters sum elementwise, so the maintained table is exactly
the sketch a single batch pass over all events would build, and the
same table the batch ``estimate_counts`` / ``rollup_freq`` operators
query.

Exactly-once: counter addition is NOT idempotent, so the base sink's
replay guard (committed marker version >= batch id -> skip) is
load-bearing here, the same way it is for the HLL sink's ``n_rows``.

At scale: per batch, the map-side explode x depth collapses to
<= depth x width rows per group before the shuffle; the snapshot holds
sketch rows (bounded), never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.freq import DEFAULT_DEPTH, DEFAULT_WIDTH, build_freq_sketch
from .sinks import ParquetUpsertSink


class FreqSketchMergeSink(ParquetUpsertSink):
    """foreachBatch handler maintaining a count-min sketch table.

    ``group_cols`` scope one sketch per group (e.g. per source);
    ``[]`` maintains the single global sketch. The snapshot rows are
    ``(group..., d, bucket, cnt)`` — directly consumable by
    ``operators.freq.estimate_counts`` / ``rollup_freq``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: list[str],
        value_col: str,
        *,
        depth: int = DEFAULT_DEPTH,
        width: int = DEFAULT_WIDTH,
    ):
        super().__init__(spark, path, [*group_cols, "d", "bucket"])
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.depth = depth
        self.width = width

    def _merge(self, prev: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        batch_sk = build_freq_sketch(
            batch_df,
            self.group_cols,
            self.value_col,
            depth=self.depth,
            width=self.width,
        )
        if prev is None:
            return batch_sk
        return (
            prev.select(*self.keys, "cnt")
            .unionByName(batch_sk)
            .groupBy(*self.keys)
            .agg(F.sum("cnt").alias("cnt"))
        )

    def sketch(self) -> DataFrame | None:
        """Current sketch table (None before the first batch)."""
        return self.current()
