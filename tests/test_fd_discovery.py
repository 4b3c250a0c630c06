"""quality.key_candidates / functional_dependencies and
timeseries.lead_lag_correlation unit checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.quality import (
    functional_dependencies,
    key_candidates,
)
from k_means_using_mapreduce_spark.operators.timeseries import (
    lead_lag_correlation,
)

_HOUR_US = 3_600_000_000


def _tbl(spark):
    rows = [
        (1, "a", "x"),
        (2, "a", "x"),
        (3, "b", "y"),
        (4, "b", "z"),   # b -> {y, z}: violates b->c
        (None, "c", "w"),
    ]
    return spark.createDataFrame(rows, "pk int, grp string, val string")


def test_key_candidates(spark):
    out = {r["column"]: r for r in key_candidates(_tbl(spark), ["pk", "grp", "val"]).collect()}
    # pk unique among non-null but has a NULL -> not a full key
    assert out["pk"]["n_distinct"] == 4 and out["pk"]["is_key"] == 0
    assert out["grp"]["n_distinct"] == 3 and out["grp"]["is_key"] == 0
    # val: 5 non-null, 4 distinct (x twice) -> not a key
    assert out["val"]["is_key"] == 0
    uniq = _tbl(spark).where("pk is not null")
    out2 = {r["column"]: r for r in key_candidates(uniq, ["pk"]).collect()}
    assert out2["pk"]["is_key"] == 1


def test_functional_dependencies(spark):
    out = {
        (r["det"], r["dep"]): r
        for r in functional_dependencies(
            _tbl(spark), ["pk", "grp", "val"]
        ).collect()
    }
    assert out[("pk", "grp")]["holds"] == 1  # pk determines everything
    assert out[("pk", "val")]["holds"] == 1
    assert out[("grp", "val")]["holds"] == 0
    assert out[("grp", "val")]["violations"] == 1  # b maps to y AND z
    assert out[("val", "grp")]["holds"] == 1  # x->a, y->b, z->b, w->c
    with pytest.raises(ValueError):
        functional_dependencies(_tbl(spark), ["pk"])
    with pytest.raises(ValueError):
        key_candidates(_tbl(spark), [])


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


def test_lead_lag_detects_shift(spark):
    # b is a copied one-bucket-later: best lag should be +1 with r = 1.
    base = [1, 5, 2, 7, 3, 6, 1, 4, 2, 8, 3, 5]
    shifted = [1] + base[:-1]
    out = lead_lag_correlation(
        _series(spark, {"a": base, "b": shifted}),
        ts_col="ts", key_col="k", max_lag=3,
    ).first()
    assert (out["key_a"], out["key_b"]) == ("a", "b")
    assert out["best_lag"] == 1
    assert out["best_r"] == pytest.approx(1.0, abs=0.05)
    assert abs(out["r0"]) < 0.9  # contemporaneous correlation weaker
    with pytest.raises(ValueError):
        lead_lag_correlation(_series(spark, {"a": base}), max_lag=-1)
