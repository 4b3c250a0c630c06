"""streaming/anomaly.py: windowed counts scored against a static
baseline; append semantics; unseen keys pass through unscored."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.streaming.anomaly import (
    baseline_from_series,
    score_stream,
)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "anom_in"
    d.mkdir()
    return d


def _write_batch(d, name, rows):
    with open(d / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_baseline_from_series(spark):
    series = spark.createDataFrame(
        [("a", i, 10) for i in range(5)] + [("b", 0, 3)],
        "key string, bucket int, n int",
    )
    base = {r["key"]: r for r in baseline_from_series(series).collect()}
    assert base["a"]["mean_base"] == 10.0 and base["a"]["std_base"] == 0.0
    assert base["b"]["std_base"] is None  # single bucket: no variance


def test_score_stream_flags_spike_and_passes_unknown_keys(spark, stream_dir):
    baseline = spark.createDataFrame(
        [("view", 2.0, 1.0)], "key string, mean_base double, std_base double"
    )
    rows = (
        # window 10:00-11:00 for 'view': 6 events -> z = 4 -> anomaly
        [{"event_type": "view", "ts": f"2024-01-01T10:00:{s:02d}"} for s in range(6)]
        # window 12:00-13:00: 2 events -> z = 0 -> normal
        + [{"event_type": "view", "ts": "2024-01-01T12:00:01"},
           {"event_type": "view", "ts": "2024-01-01T12:30:00"}]
        # unseen key: emitted, unscored
        + [{"event_type": "novel", "ts": "2024-01-01T10:15:00"}]
        # late sentinel far ahead so the watermark closes everything above
        + [{"event_type": "view", "ts": "2024-01-02T23:00:00"}]
    )
    _write_batch(stream_dir, "b0", rows)
    stream = (
        spark.readStream.schema("event_type STRING, ts TIMESTAMP")
        .json(str(stream_dir))
    )
    out = score_stream(stream, baseline, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["key"], r["window_start"]): r
        for r in spark.sql("select * from anom_out").collect()
    }
    spike = got[("view", datetime(2024, 1, 1, 10))]
    assert spike["n"] == 6 and spike["zscore"] == pytest.approx(4.0)
    assert spike["is_anomaly"]
    normal = got[("view", datetime(2024, 1, 1, 12))]
    assert normal["n"] == 2 and not normal["is_anomaly"]
    novel = got[("novel", datetime(2024, 1, 1, 10))]
    assert novel["zscore"] is None and not novel["is_anomaly"]


def test_score_stream_validation(spark):
    baseline = spark.createDataFrame(
        [("a", 1.0, 1.0)], "key string, mean_base double, std_base double"
    )
    df = spark.createDataFrame([], "event_type string, ts timestamp")
    with pytest.raises(ValueError):
        score_stream(df, baseline, z=0)
