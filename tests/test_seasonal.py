"""timeseries.seasonal_strength: pure-seasonal and pure-trend series
hit the measure's extremes; degenerate variances go NULL, not wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.timeseries import (
    seasonal_strength,
)

_HOUR_US = 3_600_000_000


def _series(spark, per_key_values):
    rows = []
    eid = 0
    for key, values in per_key_values.items():
        for i, v in enumerate(values):
            for _ in range(v):
                rows.append((eid, key, i * _HOUR_US))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, k string, ts_us long")
    return df.select("event_id", "k", F.timestamp_micros("ts_us").alias("ts"))


def test_pure_seasonal_and_pure_trend(spark):
    out = {
        r["key"]: r
        for r in seasonal_strength(
            _series(
                spark,
                {
                    "season": [3, 1] * 6,        # flat trend, period 2
                    "trend": list(range(1, 13)),  # linear, no season
                },
            ),
            ts_col="ts",
            key_col="k",
            season=2,
        ).collect()
    }
    s, t = out["season"], out["trend"]
    # alternating series: remainder 0 -> seasonal strength exactly 1;
    # detrended trend series is flat -> trend strength NULL (0/0).
    assert s["seasonal_strength"] == pytest.approx(1.0)
    assert s["trend_strength"] is None  # var(y - S) = 0 for flat trend
    assert s["peak_pos"] == 0  # the 3s sit at even positions
    # linear series: MA reproduces it exactly -> remainder 0,
    # trend strength 1; no seasonal signal -> strength NULL (0/0).
    assert t["trend_strength"] == pytest.approx(1.0)
    assert t["seasonal_strength"] is None
    assert s["n_interior"] == 10 and t["n_interior"] == 10


def test_strengths_bounded_on_noisy_series(spark):
    vals = [(i * 7) % 5 + (1 if i % 4 == 0 else 0) for i in range(40)]
    out = seasonal_strength(
        _series(spark, {"x": vals}), ts_col="ts", key_col="k", season=4
    ).first()
    assert 0.0 <= out["trend_strength"] <= 1.0
    assert 0.0 <= out["seasonal_strength"] <= 1.0
    assert 0 <= out["peak_pos"] < 4


def test_season_must_be_even(spark):
    df = _series(spark, {"x": [1, 2, 3]})
    with pytest.raises(ValueError):
        seasonal_strength(df, ts_col="ts", key_col="k", season=3)
    with pytest.raises(ValueError):
        seasonal_strength(df, ts_col="ts", key_col="k", season=0)
