"""Streaming sessionization: gap-based session windows.

The streaming twin of the batch operator (operators/temporal.py::
sessionize): Spark's native ``F.session_window`` merges events into
per-key sessions that close when the event-time gap exceeds the
configured gap — the same semantics as the batch lag-flag-cumsum, but
maintained incrementally in the state store.

Scale notes: state is one open session row per active key; the
watermark closes (and emits) sessions whose end precedes event-time −
watermark, which both bounds state size and makes output append-mode.
This is exactly the 100 TB shape: no global sort, state sharded by
key across the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(user, session-window) aggregates over a streaming
    DataFrame whose ``ts_col`` is a real timestamp column.

    Output: user, session_start, session_end, n_events — appendable
    once the watermark passes each session's end.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def batch_sessions_via_session_window(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """The same ``session_window`` aggregation run in batch mode —
    useful for backfill jobs that must agree with the streaming
    pipeline, and for testing stream/batch consistency against
    operators/temporal.py::sessionize.

    Boundary semantics match ``sessionize(gap_ns)``: an event exactly
    ``gap`` after the previous one merges into the same session in
    both (session_window's merge test is ``ts <= last_event + gap``;
    sessionize splits only on strict ``> gap_ns``) — pinned by
    tests/test_streaming_sessions.py.
    """
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key
    within the watermark horizon (`dropDuplicatesWithinWatermark`).

    The streaming twin of operators/dedup.py::dedup_exact. State holds
    one row per distinct key seen inside the horizon and is evicted as
    the watermark advances — the only way exact dedup is tractable on
    an unbounded stream. Duplicates farther apart than the watermark
    are NOT caught (by design; widen the watermark or run the batch
    dedup downstream for full-history guarantees).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
