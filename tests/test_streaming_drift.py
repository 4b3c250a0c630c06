"""Streaming profile maintenance (streaming/drift.py): cross-batch
moment merge equals the single-pass profile, replay no-op, derived
mean/std correctness, and drift scoring against a frozen baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.streaming.drift import (
    ProfileMergeSink,
    _moments,
)


def _prof(df):
    return {r["col_name"]: r.asDict() for r in df.collect()}


def test_batches_merge_to_single_pass_profile(spark, tmp_path):
    rows = [(float(i), float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y double")
    sink = ProfileMergeSink(spark, str(tmp_path / "state"), ["x", "y"])
    sink(df.where(F.col("x") < 40), 0)
    sink(df.where(F.col("x") >= 40), 1)
    merged = _prof(sink.profile())
    direct = {
        r["col_name"]: r.asDict()
        for r in spark.createDataFrame(rows, "x double, y double")
        .transform(lambda d: _moments(d, ["x", "y"]))
        .collect()
    }
    assert merged["x"]["n_rows"] == 100 and merged["x"]["non_null"] == 100
    assert merged["x"]["mean"] == pytest.approx(sum(range(100)) / 100)
    import statistics

    assert merged["x"]["std"] == pytest.approx(
        statistics.stdev(range(100)), rel=1e-9
    )
    assert merged["y"]["min_v"] == 0.0 and merged["y"]["max_v"] == 6.0
    assert direct["x"]["sum_v"] == pytest.approx(sum(range(100)))


def test_replay_does_not_double_count(spark, tmp_path):
    df = spark.createDataFrame([(1.0,), (3.0,)], "x double")
    sink = ProfileMergeSink(spark, str(tmp_path / "state"), ["x"])
    sink(df, 0)
    sink(df, 0)  # replayed batch id: no-op
    p = _prof(sink.profile())
    assert p["x"]["n_rows"] == 2 and p["x"]["mean"] == pytest.approx(2.0)


def test_nulls_and_single_value_std(spark, tmp_path):
    df = spark.createDataFrame([(1.0,), (None,)], "x double")
    sink = ProfileMergeSink(spark, str(tmp_path / "state"), ["x"])
    sink(df, 0)
    p = _prof(sink.profile())
    assert p["x"]["n_rows"] == 2 and p["x"]["non_null"] == 1
    assert p["x"]["std"] is None  # undefined below 2 samples, not 0/crash


def test_drift_vs_baseline_flags_shift(spark, tmp_path):
    base_rows = [(float(i % 10),) for i in range(200)]  # mean 4.5
    sink0 = ProfileMergeSink(spark, str(tmp_path / "base"), ["x"])
    sink0(spark.createDataFrame(base_rows, "x double"), 0)
    baseline = sink0.profile()

    live = ProfileMergeSink(spark, str(tmp_path / "live"), ["x"])
    live(spark.createDataFrame([(float(i % 10 + 20),) for i in range(50)], "x double"), 0)
    import statistics

    drift = _prof(live.drift_vs(baseline))
    assert drift["x"]["mean_shift_sigmas"] == pytest.approx(
        20.0 / baseline.first()["std"], rel=1e-9
    )
    # same population shape but different n: sample-std ratio carries
    # the (n/(n-1)) correction, not exactly 1
    expect = statistics.stdev([i % 10 + 20 for i in range(50)]) / statistics.stdev(
        [i % 10 for i in range(200)]
    )
    assert drift["x"]["std_ratio"] == pytest.approx(expect, rel=1e-9)
    assert live.drift_vs(baseline).count() == 1


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="columns"):
        ProfileMergeSink(spark, str(tmp_path / "s"), [])


def test_streaming_end_to_end(spark, tmp_path):
    import json

    d = tmp_path / "in"
    d.mkdir()
    with open(d / "b0.json", "w") as fh:
        for i in range(30):
            fh.write(json.dumps({"x": float(i)}) + "\n")
    sink = ProfileMergeSink(spark, str(tmp_path / "state"), ["x"])
    src = spark.readStream.schema("x double").json(str(d))
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    p = _prof(sink.profile())
    assert p["x"]["n_rows"] == 30 and p["x"]["mean"] == pytest.approx(14.5)
