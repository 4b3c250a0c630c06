"""Streaming session windows + batch/stream consistency."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.temporal import sessionize
from k_means_using_mapreduce_spark.streaming import (
    batch_sessions_via_session_window,
    streaming_sessions,
)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "sess_in"
    d.mkdir()
    return d


def _write_batch(d, name, rows):
    with open(d / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


EVENTS = [
    {"user_id": 1, "ts": "2024-01-01 00:00:00"},
    {"user_id": 1, "ts": "2024-01-01 00:10:00"},  # same session
    {"user_id": 1, "ts": "2024-01-01 01:00:00"},  # 50-min gap → new session
    {"user_id": 2, "ts": "2024-01-01 00:05:00"},
]


def test_streaming_sessions_counts(spark, stream_dir, tmp_path):
    _write_batch(stream_dir, "b0", EVENTS)
    stream = (
        spark.readStream.schema("user_id LONG, ts STRING")
        .json(str(stream_dir))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = streaming_sessions(stream, gap="30 minutes", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline and len(rows) < 3:
            q.processAllAvailable()
            rows = spark.sql(
                "select user_id, n_events from sess_out order by user_id, session_start"
            ).collect()
        assert [(r["user_id"], r["n_events"]) for r in rows] == [
            (1, 2),
            (1, 1),
            (2, 1),
        ]
    finally:
        q.stop()


def test_batch_session_window_matches_sessionize(spark):
    """session_window (batch mode) and the lag-cumsum sessionize agree
    on session count and sizes for gaps strictly inside/outside the
    boundary."""
    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate([
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:29:00"),
            (1, "2024-01-01 01:30:00"),
            (2, "2024-01-01 00:00:00"),
        ])],
        "event_id long, user_id long, ts_str string",
    ).withColumn("ts", F.to_timestamp("ts_str"))

    sw = batch_sessions_via_session_window(df, gap="30 minutes")
    sw_counts = sorted(
        (r["user_id"], r["n_events"]) for r in sw.collect()
    )

    ns = df.withColumn("ts_ns", F.unix_timestamp("ts") * F.lit(1_000_000_000))
    lagged = sessionize(
        ns.select("event_id", "user_id", F.col("ts_ns").alias("ts")),
        gap_ns=30 * 60 * 1_000_000_000,
    )
    lag_counts = sorted(
        (r["user_id"], r["n"])
        for r in lagged.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sw_counts == lag_counts == [(1, 1), (1, 2), (2, 1)]


def test_session_window_boundary_merges_at_exact_gap(spark):
    """Events exactly `gap` apart merge in BOTH session_window and
    sessionize — pinned so the documented equivalence stays true."""
    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00"), (2, 1, "2024-01-01 00:30:00")],
        "event_id long, user_id long, ts_str string",
    ).withColumn("ts", F.to_timestamp("ts_str"))

    sw = batch_sessions_via_session_window(df, gap="30 minutes")
    assert sw.count() == 1  # merged

    ns = df.withColumn("ts_ns", F.unix_timestamp("ts") * F.lit(1_000_000_000))
    merged = sessionize(
        ns.select("event_id", "user_id", F.col("ts_ns").alias("ts")),
        gap_ns=30 * 60 * 1_000_000_000,
    )
    assert merged.select("session_seq").distinct().count() == 1  # merged
