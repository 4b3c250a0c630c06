"""operators/timeseries.forecast_backtest: hand-computed MASE/sMAPE
on tiny hourly series (events replicated per bucket so the resampled
count equals the intended series value)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.timeseries import (
    forecast_backtest,
)

_HOUR_US = 3_600_000_000


def _series(spark, per_key_values):
    rows = []
    eid = 0
    for key, values in per_key_values.items():
        for i, v in enumerate(values):
            for _ in range(v):  # v events in hour i -> count v
                rows.append((eid, key, i * _HOUR_US))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, k string, ts_us long")
    return df.select(
        "event_id", F.col("k"), F.timestamp_micros("ts_us").alias("ts")
    )


def _run(spark, per_key_values, season=2, holdout=2):
    ev = _series(spark, per_key_values)
    out = forecast_backtest(
        ev, ts_col="ts", key_col="k", unit="hour",
        season=season, holdout=holdout,
    )
    return {r["key"]: r for r in out.collect()}


def test_hand_computed_metrics_and_null_mase(spark):
    out = _run(
        spark,
        {
            # train perfectly seasonal (scale 0 -> mase NULL);
            # holdout errs 4 and 0.
            "a": [1, 2, 1, 2, 1, 2, 1, 2, 5, 2],
            # train scale 1/3, holdout mae 1 -> mase 3.
            "b": [1, 2, 2, 2, 1, 2, 1, 2, 1, 4],
        },
    )
    a, b = out["a"], out["b"]
    assert a["h"] == 2 and b["h"] == 2
    assert a["mae"] == pytest.approx(2.0)
    assert a["rmse"] == pytest.approx(8.0**0.5)
    assert a["smape"] == pytest.approx((2 * 4 / (1 + 5)) / 2)
    assert a["mase"] is None  # perfectly seasonal training prefix
    assert b["mae"] == pytest.approx(1.0)
    assert b["mase"] == pytest.approx(3.0)


def test_zero_series_smape_is_zero(spark):
    # one early event then silence: holdout is 0-vs-0 everywhere.
    # key "d" anchors the global grid to 10 buckets.
    out = _run(spark, {"c": [1] + [0] * 9, "d": [1] * 10})
    c = out["c"]
    assert c["mae"] == pytest.approx(0.0)
    assert c["smape"] == pytest.approx(0.0)
    assert c["mase"] == pytest.approx(0.0)  # scale 1/6 > 0, mae 0
    d = out["d"]
    assert d["mae"] == pytest.approx(0.0)
    assert d["mase"] is None  # constant series: zero training scale


def test_validation(spark):
    ev = _series(spark, {"a": [1, 1]})
    with pytest.raises(ValueError):
        forecast_backtest(ev, ts_col="ts", key_col="k", season=0)
    with pytest.raises(ValueError):
        forecast_backtest(ev, ts_col="ts", key_col="k", holdout=0)
