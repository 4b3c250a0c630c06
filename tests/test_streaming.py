"""Structured Streaming operators, driven with the rate/memory testing
pattern: file-source streams over a temp directory + memory sink."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.streaming import (
    streaming_assign,
    windowed_cluster_stats,
)

CENTROIDS = [(1, [0.0, 0.0]), (2, [10.0, 10.0])]


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    return d


def _write_batch(d, name, rows):
    # one JSON file per micro-batch
    with open(d / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _await_rows(spark, query, table, want, timeout=60):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        got = spark.sql(f"select count(*) c from {table}").first()["c"]
        if got >= want:
            return got
    return spark.sql(f"select count(*) c from {table}").first()["c"]


def test_streaming_assign(spark, stream_dir):
    _write_batch(stream_dir, "b0", [
        {"event_id": 1, "x": 0.5, "y": 0.1},
        {"event_id": 2, "x": 9.5, "y": 10.2},
    ])
    stream = (
        spark.readStream.schema("event_id LONG, x DOUBLE, y DOUBLE")
        .json(str(stream_dir))
        .select("event_id", F.array("x", "y").alias("features"))
    )
    assigned = streaming_assign(stream, CENTROIDS)
    assert assigned.isStreaming
    q = (
        assigned.writeStream.format("memory")
        .queryName("t_assign")
        .outputMode("append")
        .start()
    )
    try:
        got = _await_rows(spark, q, "t_assign", 2)
        assert got == 2
        rows = {r["event_id"]: r["cid"] for r in spark.sql("select * from t_assign").collect()}
        assert rows == {1: 1, 2: 2}
        # late second batch flows through incrementally
        _write_batch(stream_dir, "b1", [{"event_id": 3, "x": 10.0, "y": 9.0}])
        got = _await_rows(spark, q, "t_assign", 3)
        assert got == 3
    finally:
        q.stop()


def test_windowed_cluster_stats(spark, stream_dir):
    base = "2024-01-01T00:00:"
    _write_batch(stream_dir, "b0", [
        {"ts": base + "05", "x": 0.1, "y": 0.0},
        {"ts": base + "10", "x": 0.2, "y": 0.1},
        {"ts": base + "15", "x": 9.9, "y": 10.1},
    ])
    stream = (
        spark.readStream.schema("ts TIMESTAMP, x DOUBLE, y DOUBLE")
        .json(str(stream_dir))
        .select("ts", F.array("x", "y").alias("features"))
    )
    stats = windowed_cluster_stats(stream, CENTROIDS, window="1 minute", watermark="2 minutes")
    q = (
        stats.writeStream.format("memory")
        .queryName("t_winstats")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from t_winstats").collect()
        by_cid = {r["cid"]: r for r in rows}
        assert by_cid[1]["n"] == 2 and by_cid[2]["n"] == 1
        assert all(r["window_start"] is not None for r in rows)
    finally:
        q.stop()


def test_foreach_batch_upsert_sink(spark, stream_dir, tmp_path):
    """foreachBatch upsert: later batches replace earlier rows per key;
    replaying a batch (retry semantics) leaves the snapshot unchanged."""
    from k_means_using_mapreduce_spark.streaming.sinks import ParquetUpsertSink

    sink = ParquetUpsertSink(spark, str(tmp_path / "state"), keys=["user"])
    _write_batch(stream_dir, "b0", [
        {"user": "a", "n": 1}, {"user": "b", "n": 5}])
    src = (
        spark.readStream.schema("user string, n long")
        .json(str(stream_dir))
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snap = {r["user"]: r["n"] for r in sink.current().collect()}
    assert snap == {"a": 1, "b": 5}

    _write_batch(stream_dir, "b1", [
        {"user": "a", "n": 9}, {"user": "c", "n": 2}])
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snap = {r["user"]: r["n"] for r in sink.current().collect()}
    assert snap == {"a": 9, "b": 5, "c": 2}

    # idempotent replay: re-running the same batch content with the same
    # batch id must not change the snapshot
    before = sorted(map(tuple, snap.items()))
    sink(spark.createDataFrame([("a", 9), ("c", 2)], "user string, n long"), 1)
    after = sorted(
        (r["user"], r["n"]) for r in sink.current().collect()
    )
    assert after == before


def test_upsert_sink_gc_old_snapshots(spark, tmp_path):
    """The sink keeps only the current snapshot + one predecessor —
    state storage must not grow with batch count (ADVICE r2)."""
    import os

    from k_means_using_mapreduce_spark.streaming.sinks import ParquetUpsertSink

    sink = ParquetUpsertSink(spark, str(tmp_path / "state"), keys=["user"])
    os.makedirs(tmp_path / "state", exist_ok=True)
    for bid in range(4):
        batch = spark.createDataFrame(
            [{"user": "a", "n": bid}, {"user": f"u{bid}", "n": bid}]
        )
        sink(batch, bid)
    snaps = sorted(
        d for d in os.listdir(tmp_path / "state") if d.startswith("_snapshot_v")
    )
    assert snaps == ["_snapshot_v2", "_snapshot_v3"]
    snap = {r["user"]: r["n"] for r in sink.current().collect()}
    assert snap["a"] == 3 and {"u0", "u1", "u2", "u3"} <= set(snap)
