"""Streaming count-min maintenance (streaming/freq.py): cross-batch
counter addition, replay no-op, and exact parity with the batch sketch
on the same data."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.freq import (
    build_freq_sketch,
    estimate_counts,
)
from k_means_using_mapreduce_spark.streaming.freq import FreqSketchMergeSink

DEPTH, WIDTH = 2, 32


def _as_map(df):
    return {(r["d"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_sink_accumulates_and_matches_batch(spark, tmp_path):
    rows = [(i, "tok%d" % (i % 9)) for i in range(120)]
    df = spark.createDataFrame(rows, "i int, token string").select("token", "i")
    sink = FreqSketchMergeSink(
        spark, str(tmp_path / "state"), [], "token", depth=DEPTH, width=WIDTH
    )
    sink(df.where(F.col("i") < 70), 0)
    sink(df.where(F.col("i") >= 70), 1)
    single = build_freq_sketch(df, [], "token", depth=DEPTH, width=WIDTH)
    assert _as_map(sink.sketch()) == _as_map(single)

    # the maintained table feeds the batch estimator directly
    probes = spark.createDataFrame([("tok0",), ("nope",)], "probe string")
    est = {
        r["probe"]: r["est"]
        for r in estimate_counts(
            sink.sketch(), probes, "probe", depth=DEPTH, width=WIDTH
        ).collect()
    }
    exact_tok0 = df.where(F.col("token") == "tok0").count()
    assert est["tok0"] >= exact_tok0


def test_replay_does_not_double_count(spark, tmp_path):
    df = spark.createDataFrame([("a",)] * 10, "token string")
    sink = FreqSketchMergeSink(
        spark, str(tmp_path / "state"), [], "token", depth=DEPTH, width=WIDTH
    )
    sink(df, 0)
    before = sum(r["cnt"] for r in sink.sketch().collect())
    sink(df, 0)  # replayed batch id — counters must NOT double
    after = sum(r["cnt"] for r in sink.sketch().collect())
    assert before == after == 10 * DEPTH


def test_streaming_source_end_to_end(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "b0.json", "w") as fh:
        for i in range(40):
            fh.write(json.dumps({"token": f"t{i % 4}"}) + "\n")
    sink = FreqSketchMergeSink(
        spark, str(tmp_path / "state"), [], "token", depth=DEPTH, width=WIDTH
    )
    src = spark.readStream.schema("token string").json(str(d))
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = sum(r["cnt"] for r in sink.sketch().collect())
    assert total == 40 * DEPTH
