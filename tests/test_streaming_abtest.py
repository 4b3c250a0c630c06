"""Streaming SPRT A/B monitor (streaming/abtest.py): evidence
accumulation across batches, Wald threshold decisions, replay no-op,
availableNow end-to-end."""

from __future__ import annotations

import json
import math

import pytest

from k_means_using_mapreduce_spark.streaming.abtest import SprtSink

P0, P1 = 0.2, 0.4


def _batch(spark, rows):
    return spark.createDataFrame(rows, "arm string, ok boolean")


def _mk(spark, tmp_path, **kw):
    args = dict(p0=P0, p1=P1, alpha=0.05, beta=0.2)
    args.update(kw)
    return SprtSink(spark, str(tmp_path / "state"), "arm", "ok", **args)


def _dec(sink):
    return {r["arm"]: r for r in sink.decision().collect()}


def test_accumulation_and_llr_math(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink(_batch(spark, [("a", True), ("a", False), ("b", True)]), 0)
    sink(_batch(spark, [("a", True), ("b", False), ("b", False)]), 1)
    d = _dec(sink)
    assert (d["a"]["n"], d["a"]["x"]) == (3, 2)
    assert (d["b"]["n"], d["b"]["x"]) == (3, 1)
    want = 2 * math.log(P1 / P0) + 1 * math.log((1 - P1) / (1 - P0))
    assert d["a"]["llr"] == pytest.approx(want)


def test_decisions_cross_thresholds(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    # arm 'hi': 30/40 successes — overwhelming H1 evidence;
    # arm 'lo': 0/40 — overwhelming H0 evidence
    rows = [("hi", i < 30) for i in range(40)] + [
        ("lo", False) for _ in range(40)
    ]
    sink(_batch(spark, rows), 0)
    d = _dec(sink)
    assert d["hi"]["verdict"] == "accept_h1"
    assert d["lo"]["verdict"] == "accept_h0"


def test_small_sample_continues(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    sink(_batch(spark, [("a", True), ("a", False)]), 0)
    assert _dec(sink)["a"]["verdict"] == "continue"


def test_replay_is_noop(spark, tmp_path):
    sink = _mk(spark, tmp_path)
    b = _batch(spark, [("a", True)] * 5)
    sink(b, 0)
    sink(b, 0)  # replayed batch id must not double-apply
    d = _dec(sink)
    assert (d["a"]["n"], d["a"]["x"]) == (5, 5)


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        _mk(spark, tmp_path, p0=0.3, p1=0.3)
    with pytest.raises(ValueError):
        _mk(spark, tmp_path, alpha=0.0)
    sink = _mk(spark, tmp_path)
    with pytest.raises(ValueError):
        sink.decision()


def test_streaming_end_to_end(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "b0.json", "w") as fh:
        for i in range(50):
            fh.write(
                json.dumps({"arm": "a" if i % 2 else "b", "ok": i % 5 == 0})
                + "\n"
            )
    sink = _mk(spark, tmp_path)
    src = spark.readStream.schema("arm string, ok boolean").json(str(d))
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dec = _dec(sink)
    assert dec["a"]["n"] + dec["b"]["n"] == 50
    assert set(dec["a"].asDict()) == {
        "arm", "n", "x", "rate", "llr", "verdict"
    }
