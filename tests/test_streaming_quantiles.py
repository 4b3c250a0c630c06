"""Streaming KLL quantile maintenance (streaming/quantiles.py):
cross-batch merge semantics, replay no-op, parity with the batch KLL
operators, and rank reads over the persisted snapshot."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.sketch import (
    build_quantile_sketches,
    rollup_quantiles,
)
from k_means_using_mapreduce_spark.streaming.quantiles import (
    QuantileSketchMergeSink,
)


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


def test_quantile_sink_merges_across_batches(spark, stream_dir, tmp_path):
    sink = QuantileSketchMergeSink(
        spark, str(tmp_path / "state"), keys=["svc"], value_col="latency"
    )
    src = spark.readStream.schema("svc string, latency double").json(str(stream_dir))
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        stream_dir, "b0", [{"svc": "a", "latency": float(v)} for v in range(100)]
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["svc"]: r for r in sink.quantiles((0.5,)).collect()}
    assert got["a"]["n_rows"] == 100
    assert got["a"]["p50"] == pytest.approx(49.5, abs=2)

    # second batch shifts the distribution up — the merged median moves
    _write_batch(
        stream_dir, "b1", [{"svc": "a", "latency": float(v)} for v in range(100, 300)]
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["svc"]: r for r in sink.quantiles((0.5, 0.99)).collect()}
    assert got["a"]["n_rows"] == 300
    assert got["a"]["p50"] == pytest.approx(149.5, abs=6)
    assert got["a"]["p99"] >= 290


def test_replay_is_noop(spark, tmp_path):
    sink = QuantileSketchMergeSink(
        spark, str(tmp_path / "state"), keys=["svc"], value_col="latency"
    )
    b0 = spark.createDataFrame(
        [("a", float(v)) for v in range(50)], "svc string, latency double"
    )
    sink(b0, 0)
    before = sink.quantiles((0.5,)).first()
    sink(b0, 0)  # same batch id → must not re-apply
    after = sink.quantiles((0.5,)).first()
    assert after["n_rows"] == before["n_rows"] == 50
    assert after["p50"] == before["p50"]


def test_matches_batch_sketches_and_rollup(spark, tmp_path):
    rows = [("a", float(v)) for v in range(200)] + [
        ("b", float(v)) for v in range(1000, 1100)
    ]
    df = spark.createDataFrame(rows, "svc string, latency double")
    sink = QuantileSketchMergeSink(
        spark, str(tmp_path / "state"), keys=["svc"], value_col="latency"
    )
    sink(df.where(F.col("latency") % 2 == 0), 0)
    sink(df.where(F.col("latency") % 2 == 1), 1)
    stream_q = {
        r["svc"]: r["p50"] for r in sink.quantiles((0.5,)).collect()
    }
    batch = build_quantile_sketches(df, ["svc"], "latency")
    batch_q = {
        r["svc"]: r["p50"]
        for r in rollup_quantiles(batch, ["svc"], quantiles=(0.5,)).collect()
    }
    # merged-sketch estimates land within sketch error of each other
    for svc in ("a", "b"):
        assert stream_q[svc] == pytest.approx(batch_q[svc], abs=3)

    # the persisted snapshot feeds the batch rollup operators directly
    total = rollup_quantiles(sink.current(), [], quantiles=(0.9,)).first()
    assert total["n_rows"] == 300
    assert 190 <= total["p90"] <= 1100


def test_rank_validation(spark, tmp_path):
    sink = QuantileSketchMergeSink(
        spark, str(tmp_path / "state"), keys=["svc"], value_col="latency"
    )
    sink(
        spark.createDataFrame([("a", 1.0)], "svc string, latency double"), 0
    )
    with pytest.raises(ValueError):
        sink.quantiles((2.0,))
