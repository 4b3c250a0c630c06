"""streaming/dedup.py: watermark-bounded duplicate suppression — first
arrival wins, in-horizon duplicates suppressed, state evicted after the
watermark passes (re-admission), batch-compatible content identity."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.streaming.dedup import (
    content_keyed,
    streaming_dedup_all_time,
    streaming_dedup_within_watermark,
)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "dedup_in"
    d.mkdir()
    return d


def _write_batch(d, name, rows):
    with open(d / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, d):
    return (
        spark.readStream.schema("doc_id LONG, ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )


def test_within_watermark_suppresses_then_readmits(spark, stream_dir):
    _write_batch(stream_dir, "b0", [
        {"doc_id": 1, "ts": "2024-01-01 10:00:00", "text": "alpha"},
        {"doc_id": 2, "ts": "2024-01-01 10:00:30", "text": "beta"},
    ])
    out = streaming_dedup_within_watermark(
        _stream(spark, stream_dir), ["doc_id"],
        ts_col="ts", delay="10 minutes",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # duplicate of doc 1 within the horizon -> suppressed
        _write_batch(stream_dir, "b1", [
            {"doc_id": 1, "ts": "2024-01-01 10:01:00", "text": "alpha"},
            {"doc_id": 3, "ts": "2024-01-01 10:02:00", "text": "gamma"},
        ])
        q.processAllAvailable()
        got = {
            r["doc_id"]
            for r in spark.sql("select doc_id from t_sdedup").collect()
        }
        assert got == {1, 2, 3}
        # advance the watermark far past doc 1's eviction point...
        _write_batch(stream_dir, "b2", [
            {"doc_id": 9, "ts": "2024-01-01 11:00:00", "text": "omega"},
        ])
        q.processAllAvailable()
        # ...then a fresh duplicate of doc 1 is RE-ADMITTED (state gone)
        _write_batch(stream_dir, "b3", [
            {"doc_id": 1, "ts": "2024-01-01 11:01:00", "text": "alpha"},
        ])
        q.processAllAvailable()
        rows = spark.sql(
            "select doc_id, count(*) n from t_sdedup group by doc_id"
        ).collect()
        by = {r["doc_id"]: r["n"] for r in rows}
        assert by[1] == 2  # once per horizon
        assert by[2] == by[3] == by[9] == 1
    finally:
        q.stop()


def test_content_keyed_dedup_matches_batch_rule(spark, stream_dir):
    """Same text under different doc_ids dedups to one row when keyed
    by the content hash; the hash equals the batch sha2-256."""
    _write_batch(stream_dir, "b0", [
        {"doc_id": 1, "ts": "2024-01-01 10:00:00", "text": "same words"},
        {"doc_id": 2, "ts": "2024-01-01 10:00:10", "text": "same words"},
        {"doc_id": 3, "ts": "2024-01-01 10:00:20", "text": "other"},
    ])
    out = streaming_dedup_within_watermark(
        content_keyed(_stream(spark, stream_dir), "text"),
        ["content_sha"],
        ts_col="ts",
        delay="5 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_cdedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from t_cdedup").collect()
        assert len(rows) == 2
        batch_hash = (
            spark.createDataFrame([("same words",)], "text string")
            .select(F.sha2("text", 256).alias("h"))
            .collect()[0]["h"]
        )
        assert {r["content_sha"] for r in rows if r["text"] == "same words"} == {
            batch_hash
        }
    finally:
        q.stop()


def test_all_time_dedup_and_guards(spark, stream_dir):
    _write_batch(stream_dir, "b0", [
        {"doc_id": 1, "ts": "2024-01-01 10:00:00", "text": "a"},
    ])
    src = _stream(spark, stream_dir)
    out = streaming_dedup_all_time(src, ["doc_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("t_adedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(stream_dir, "b1", [
            {"doc_id": 1, "ts": "2024-01-02 10:00:00", "text": "a"},
            {"doc_id": 2, "ts": "2024-01-02 10:00:01", "text": "b"},
        ])
        q.processAllAvailable()
        assert spark.sql("select count(*) c from t_adedup").first()["c"] == 2
    finally:
        q.stop()
    with pytest.raises(ValueError, match="non-empty"):
        streaming_dedup_all_time(src, [])
    batch_df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="streaming"):
        streaming_dedup_within_watermark(
            batch_df, ["doc_id"], ts_col="ts", delay="1 minute"
        )
