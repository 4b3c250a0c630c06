"""Streaming HLL sketch maintenance (streaming/distinct.py): cross-batch
union semantics, overlap dedup across batches, replay no-op, and parity
with the batch sketch operators on the same data."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.sketch import (
    build_distinct_sketches,
    rollup_distinct,
)
from k_means_using_mapreduce_spark.streaming.distinct import SketchMergeSink


def _write_batch(stream_dir, name, rows):
    p = stream_dir / f"{name}.json"
    with open(p, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    return d


def test_sketch_sink_merges_across_batches(spark, stream_dir, tmp_path):
    sink = SketchMergeSink(
        spark, str(tmp_path / "state"), keys=["src"], value_col="user"
    )
    src = spark.readStream.schema("src string, user long").json(str(stream_dir))
    ckpt = str(tmp_path / "ckpt")

    _write_batch(stream_dir, "b0", [{"src": "a", "user": u} for u in range(50)])
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    est = {r["src"]: r for r in sink.estimates().collect()}
    assert est["a"]["n_rows"] == 50
    assert abs(est["a"]["distinct_est"] - 50) <= 2

    # second batch overlaps 25 users — distinct must NOT double-count
    _write_batch(
        stream_dir, "b1", [{"src": "a", "user": u} for u in range(25, 100)]
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    est = {r["src"]: r for r in sink.estimates().collect()}
    assert est["a"]["n_rows"] == 125
    assert abs(est["a"]["distinct_est"] - 100) <= 3


def test_replay_is_noop(spark, tmp_path):
    sink = SketchMergeSink(
        spark, str(tmp_path / "state"), keys=["src"], value_col="user"
    )
    b0 = spark.createDataFrame(
        [("a", u) for u in range(30)], "src string, user long"
    )
    sink(b0, 0)
    before = sink.estimates().first()
    # replaying the SAME batch id must not double-apply n_rows
    sink(b0, 0)
    after = sink.estimates().first()
    assert after["n_rows"] == before["n_rows"] == 30
    assert after["distinct_est"] == before["distinct_est"]


def test_matches_batch_sketches(spark, tmp_path):
    rows = [("a", u) for u in range(80)] + [("b", u) for u in range(40, 60)]
    df = spark.createDataFrame(rows, "src string, user long")
    sink = SketchMergeSink(
        spark, str(tmp_path / "state"), keys=["src"], value_col="user"
    )
    # feed as two disjoint micro-batches
    sink(df.where(F.col("user") < 50), 0)
    sink(df.where(F.col("user") >= 50), 1)
    stream_est = {
        r["src"]: r["distinct_est"] for r in sink.estimates().collect()
    }
    batch = build_distinct_sketches(df, ["src"], "user")
    batch_est = {r["src"]: r["distinct_est"] for r in batch.collect()}
    assert stream_est == batch_est  # identical registers -> identical est

    # and the persisted snapshot feeds the batch rollup operators as-is:
    # distinct over ALL sources = users 0..79 (b's 40..59 overlap a's)
    total = rollup_distinct(sink.current(), []).first()
    assert abs(total["distinct_est"] - 80) <= 3
