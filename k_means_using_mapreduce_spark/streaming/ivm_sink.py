"""Streaming incremental-view-maintenance sink.

The streaming face of operators/ivm.py: a change stream (rows tagged
insert/delete, e.g. a CDC feed or ``ChangeFeedSink`` output mapped to
ops) drives a MAINTAINED grouped rollup — each micro-batch folds its
signed delta into the parquet snapshot, so consumers always read the
aggregate of the full logical state without anyone ever rescanning
the base relation.

Exactly-once: the delta merge is ACCUMULATING (not last-writer-wins),
so the base class's replay guard is load-bearing — a replayed batch id
returns before the merge, preventing double-application; the guard +
atomic marker swap reasoning is inherited from ``ParquetUpsertSink``
(streaming/sinks.py:12-22).

State size: |groups| rows of ``(keys..., n, sum_v)`` regardless of
stream volume — the same model-sized-state doctrine as the sketch
sinks. Groups maintained down to zero count leave the snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ivm import delta_aggregate, merge_aggregate
from .sinks import ParquetUpsertSink


class IvmRollupSink(ParquetUpsertSink):
    """foreachBatch handler maintaining a SUM/COUNT rollup over a
    change stream.

    ``value_col`` is summed with its incoming type preserved — feed a
    DECIMAL column for order-independent money exactness (the same
    trade documented on ``operators.ivm``). ``strict`` validates op
    codes per batch (one extra pass over the micro-batch; a poisoned
    feed fails the batch loudly instead of silently dropping rows).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        value_col: str,
        *,
        op_col: str = "op",
        strict: bool = True,
    ):
        super().__init__(spark, path, keys)
        self.value_col = value_col
        self.op_col = op_col
        self.strict = strict

    def _merge(self, prev: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        delta = delta_aggregate(
            batch_df,
            self.keys,
            self.value_col,
            op_col=self.op_col,
            strict=self.strict,
        )
        if prev is None:
            return delta.where(F.col("n") > 0)
        return merge_aggregate(prev, delta, self.keys)
