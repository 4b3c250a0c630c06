"""Streaming deduplication — the ingest-time twin of the batch dedup
family (operators/dedup.py).

A 24/7 ingest pipeline cannot afford the batch re-dedup of the whole
corpus per drop; it drops duplicates AT THE DOOR. Two regimes:

- ``streaming_dedup_within_watermark``: duplicate suppression with
  BOUNDED state via ``dropDuplicatesWithinWatermark`` — a key's state
  is held only until the watermark passes its last-seen event time +
  delay, then evicted. The contract is windowed exactness: duplicates
  arriving within the delay of each other are suppressed; a re-send
  after eviction is re-emitted (re-admission is the price of bounded
  state — downstream idempotent sinks, e.g. streaming/sinks.py's
  upsert, absorb it). This is the right operator for at-least-once
  sources (Kafka redeliveries, retried uploads) where duplicates
  cluster in time.
- ``streaming_dedup_all_time``: exact all-time ``dropDuplicates`` —
  state grows with the distinct-key count, documented unbounded; only
  for keyspaces known small (dimension upserts), never raw documents.

Content identity uses the batch family's exact rule: sha2-256 of the
raw text (operators/dedup.py::exact_duplicates), so a document
admitted by the stream and one admitted by a batch backfill dedup the
same way.

At scale: ``dropDuplicatesWithinWatermark`` keys state by the dedup
columns — shuffle is the 32-byte hash, never the payload; state store
size ≈ distinct keys per watermark horizon. The reference has no
streaming surface at all (SURVEY.md §2); this extends the rebuild's
Structured Streaming family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str,
    delay: str,
) -> DataFrame:
    """Suppress rows repeating any ``keys`` combination within the
    watermark horizon (``delay``, e.g. ``"10 minutes"``). Emits the
    FIRST arrival; state for a key is evicted once the watermark
    passes its event time + delay."""
    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    if not stream.isStreaming:
        raise ValueError(
            "streaming_dedup_within_watermark needs a streaming DataFrame; "
            "use DataFrame.dropDuplicates for batch inputs"
        )
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


def streaming_dedup_all_time(
    stream: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Exact all-time streaming dedup — UNBOUNDED state (one entry per
    distinct key, forever). Reserve for small keyspaces."""
    keys = list(keys)
    if not keys:
        raise ValueError("keys must be non-empty")
    return stream.dropDuplicates(keys)


def content_keyed(
    stream: DataFrame, text_col: str, *, out_col: str = "content_sha"
) -> DataFrame:
    """Add the batch-compatible content identity (sha2-256 of the raw
    text — operators/dedup.py's exact rule) for content-level streaming
    dedup."""
    return stream.withColumn(out_col, F.sha2(F.col(text_col), 256))
