"""operators/coreset.py: probability law, unbiased weighting,
determinism under repartition, and fit-on-coreset SSE parity."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.coreset import (
    lightweight_coreset,
)


def _blob_df(spark, n_per=150, seed=3):
    rng = random.Random(seed)
    centers = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    rows = []
    i = 0
    for cx, cy in centers:
        for _ in range(n_per):
            rows.append(
                (i, [cx + rng.gauss(0, 1), cy + rng.gauss(0, 1)])
            )
            i += 1
    return spark.createDataFrame(rows, "id long, features array<double>")


def test_probability_law_and_weights(spark):
    df = _blob_df(spark)
    n = df.count()
    out = lightweight_coreset(df, "features", "id", m=100).collect()
    assert 0 < len(out) < n
    for r in out:
        assert r["q"] >= 0.5 / n - 1e-12  # uniform floor
        assert 0.0 < r["p"] <= 1.0
        assert r["weight"] == pytest.approx(1.0 / r["p"])
    # Poisson sampling is unbiased: E[Σw] = n (loose 3-sigma-ish band)
    wsum = sum(r["weight"] for r in out)
    assert abs(wsum - n) < 0.5 * n


def test_far_outlier_is_near_certain(spark):
    rows = [(i, [0.0, 0.0]) for i in range(200)] + [(999, [1000.0, 1000.0])]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    out = lightweight_coreset(df, "features", "id", m=20)
    sel = {r["id"]: r for r in out.collect()}
    assert 999 in sel  # q ~ 0.5 -> p = 1 at m=20
    assert sel[999]["p"] == pytest.approx(1.0)
    assert sel[999]["weight"] == pytest.approx(1.0)


def test_repartition_invariant_selection(spark):
    df = _blob_df(spark)
    a = sorted(
        r["id"] for r in lightweight_coreset(df, "features", "id", m=80).collect()
    )
    b = sorted(
        r["id"]
        for r in lightweight_coreset(
            df.repartition(13), "features", "id", m=80
        ).collect()
    )
    assert a == b


def test_identical_points_fall_back_to_uniform(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(100)], "id long, features array<double>"
    )
    out = lightweight_coreset(df, "features", "id", m=30).collect()
    n = 100
    for r in out:
        assert r["q"] == pytest.approx(0.5 / n)  # s == 0 branch


def test_fit_on_coreset_sse_parity(spark):
    """Weighted K-Means on the coreset lands near the full-data fit:
    full-data SSE evaluated at the coreset centroids within 15% of the
    full fit's SSE (the coreset guarantee, loosely checked)."""
    from k_means_using_mapreduce_spark.operators.kmeans import (
        assign,
        kmeans_fit,
    )

    df = _blob_df(spark).cache()
    try:
        full = kmeans_fit(df, 3, seed=11, features_col="features")
        core = lightweight_coreset(df, "features", "id", m=120).cache()
        sub = kmeans_fit(
            core, 3, seed=11, features_col="features", weight_col="weight"
        )
        a = assign(df, sub.centroids, features_col="features")
        sse_core_on_full = a.agg(F.sum("sq_dist")).first()[0]
        assert sse_core_on_full <= full.sse * 1.15
    finally:
        df.unpersist()


def test_input_guards(spark):
    df = spark.createDataFrame([], "id long, features array<double>")
    with pytest.raises(ValueError, match="empty"):
        lightweight_coreset(df, "features", "id", m=10)
    df2 = spark.createDataFrame([(1, [0.0])], "id long, features array<double>")
    with pytest.raises(ValueError, match="m must be"):
        lightweight_coreset(df2, "features", "id", m=0)
