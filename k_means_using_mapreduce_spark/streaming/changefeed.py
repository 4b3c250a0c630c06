"""Streaming change feed: a CDC stream derived from an upsert stream.

Composes the batch snapshot-diff classifier (operators/diff.py) with
the streaming upsert sink (streaming/sinks.py): each micro-batch first
merges into the keyed snapshot as usual, then the (previous snapshot,
next snapshot) pair is diffed and the added/changed/removed keys are
APPENDED to a feed directory stamped with the batch id. Downstream
consumers — incremental dedup, index ingestion, cache invalidation —
read the feed instead of re-diffing or rescanning state, the
Delta/Iceberg "change data feed" pattern on plain parquet.

Exactly-once: the snapshot swap is the base sink's replay-guarded
commit; the feed append for a batch happens BEFORE the marker moves,
and a replayed batch (marker already at or past it) skips both, so
the feed holds each batch's changes exactly once. Feed partitions are
``batch=N`` subdirectories — idempotent overwrite per batch, ordered
reads for consumers (``feed().where(batch >= last_seen)``).

At scale the diff runs snapshot-vs-snapshot over (key, hash) rows
(see operators/diff.py scale notes); the feed appends only changed
keys, so a mostly-stable keyed state emits near-empty batches no
matter how large the snapshot is.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.diff import snapshot_diff
from .sinks import ParquetUpsertSink


class ChangeFeedSink(ParquetUpsertSink):
    """foreachBatch handler: keyed upsert snapshot + per-batch change
    feed.

    ``compare_cols`` defaults to all shared non-key columns (the
    snapshot schema is stable across batches, so this is the full
    payload). ``removed`` rows only occur when a subclass ``_merge``
    deletes keys — the base last-writer-wins upsert never removes.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        *,
        compare_cols: list[str] | None = None,
    ):
        super().__init__(spark, path, keys)
        self.compare_cols = compare_cols
        self.feed_path = os.path.join(path, "_feed")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        latest = self.latest_version()
        if latest is not None and latest >= batch_id:
            return  # replay: snapshot AND feed already committed
        prev = self.current()
        merged = self._merge(prev, batch_df).localCheckpoint()
        if prev is None:
            changes = merged.select(
                *self.keys, F.lit("added").alias("change")
            )
        else:
            changes = snapshot_diff(
                prev, merged, self.keys, self.compare_cols
            )
        # idempotent per-batch subtree; lands BEFORE the marker moves so
        # a crash between the two replays into the same overwrite. The
        # batch id rides as the hive partition dir, not a data column.
        changes.write.mode("overwrite").parquet(
            os.path.join(self.feed_path, f"batch={batch_id}")
        )
        out = self._snapshot_dir(batch_id)
        merged.write.mode("overwrite").parquet(out)
        marker = os.path.join(self.path, "_LATEST")
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(os.path.basename(out))
        os.replace(tmp, marker)
        self._gc_snapshots(batch_id)

    def feed(self, since_batch: int | None = None) -> DataFrame | None:
        """The accumulated change feed ``(keys..., change, batch)``
        (None before the first batch); ``since_batch`` filters to
        batches strictly after a consumer's checkpoint — a hive
        partition-pruned read, old batches' files untouched.

        Only COMMITTED batches are visible: the per-batch feed subtree
        lands before the snapshot marker moves, so after a crash in
        that window an uncommitted ``batch=N`` directory exists whose
        snapshot never became current. Filtering to
        ``batch <= latest_version()`` keeps consumers from seeing
        changes the next (replayed) run will rewrite."""
        latest = self.latest_version()
        if latest is None or not os.path.isdir(self.feed_path):
            return None
        df = self.spark.read.option("basePath", self.feed_path).parquet(
            self.feed_path
        )
        df = df.where(F.col("batch") <= latest)
        if since_batch is not None:
            df = df.where(F.col("batch") > since_batch)
        return df
