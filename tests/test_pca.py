"""operators/pca.py: covariance vs numpy, component recovery on
anisotropic data, projection law, sign canonicalization, guards."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.pca import (
    covariance_matrix,
    pca_fit,
    pca_project,
)


def _aniso_df(spark, n=300, seed=5):
    """2-D data stretched along (1,1)/sqrt(2), embedded in 4-D."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        t = rng.gauss(0, 3)  # principal direction
        s = rng.gauss(0, 0.5)
        x = [t + s, t - s, rng.gauss(0, 0.1), 0.0]
        rows.append((i, x))
    return rows, spark.createDataFrame(
        rows, "id long, features array<double>"
    )


def test_covariance_matches_numpy(spark):
    rows, df = _aniso_df(spark, n=120)
    mat = np.array([r[1] for r in rows])
    expected = np.cov(mat, rowvar=False, ddof=1)
    got = covariance_matrix(df, "features", "id").collect()
    assert len(got) == 4 * 5 // 2
    for r in got:
        assert r["cov"] == pytest.approx(
            expected[r["i"], r["j"]], rel=1e-9, abs=1e-12
        )


def test_fit_recovers_principal_direction(spark):
    rows, df = _aniso_df(spark)
    model = pca_fit(df, "features", "id", k=2)
    c0 = np.array(model.components[0])
    expected = np.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
    assert abs(float(np.dot(c0, expected))) > 0.99
    # variance-ordered, ratios in (0,1] and decreasing
    assert model.explained_variance[0] >= model.explained_variance[1] > 0
    assert 0.9 < model.explained_variance_ratio[0] <= 1.0
    # components orthonormal
    c1 = np.array(model.components[1])
    assert float(np.dot(c0, c0)) == pytest.approx(1.0)
    assert float(np.dot(c0, c1)) == pytest.approx(0.0, abs=1e-9)
    # sign canon: largest-|coord| positive
    for comp in model.components:
        v = np.array(comp)
        assert v[int(np.argmax(np.abs(v)))] > 0


def test_projection_scores_match_numpy(spark):
    rows, df = _aniso_df(spark, n=80)
    model = pca_fit(df, "features", "id", k=2)
    out = pca_project(df, "features", model).orderBy("id").collect()
    mat = np.array([r[1] for r in rows])
    centered = mat - np.array(model.mean)
    expected = centered @ np.array(model.components).T
    for r, exp in zip(out, expected):
        assert np.allclose(r["pca"], exp, rtol=1e-9, atol=1e-9)
    # score variance along component 0 ~ its eigenvalue
    var0 = float(np.var(expected[:, 0], ddof=1))
    assert var0 == pytest.approx(model.explained_variance[0], rel=1e-6)


def test_null_vectors_dropped_and_guards(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "id long, features array<double>",
    )
    assert covariance_matrix(df, "features", "id").count() == 3
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, "features", "id", k=0)
    with pytest.raises(ValueError, match="exceeds dimensionality"):
        pca_fit(df, "features", "id", k=5)
    empty = spark.createDataFrame([], "id long, features array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, "features", "id", k=1)


def test_mahalanobis_full_rank_matches_numpy(spark):
    from k_means_using_mapreduce_spark.operators.pca import (
        mahalanobis_scores,
    )

    rows, df = _aniso_df(spark, n=200)
    model = pca_fit(df, "features", "id", k=4)
    out = mahalanobis_scores(df, "features", model).orderBy("id").collect()
    mat = np.array([r[1] for r in rows])
    cov = np.cov(mat, rowvar=False, ddof=1)
    # last dim is constant-zero -> rank-deficient; pinv on the retained
    # subspace == the operator's skip-degenerate rule
    centered = mat - mat.mean(axis=0)
    inv = np.linalg.pinv(cov, rcond=1e-8)
    expected = np.einsum("ij,jk,ik->i", centered, inv, centered)
    assert out[0][f"maha2_dof"] == 3  # zero-variance dim skipped
    got = np.array([r["maha2"] for r in out])
    assert np.allclose(got, expected, rtol=1e-6, atol=1e-8)
    # the mean itself scores ~0; a far outlier scores huge
    assert got.min() >= 0


def test_mahalanobis_flags_off_axis_outlier(spark):
    from k_means_using_mapreduce_spark.operators.pca import (
        mahalanobis_scores,
    )

    rows, df = _aniso_df(spark, n=150)
    model = pca_fit(df, "features", "id", k=4)
    # (5, -5): small euclidean norm but ACROSS the thin axis -> extreme
    probe = spark.createDataFrame(
        [(0, [5.0, -5.0, 0.0, 0.0]), (1, [5.0, 5.0, 0.0, 0.0])],
        "id long, features array<double>",
    )
    out = {r["id"]: r["maha2"] for r in mahalanobis_scores(
        probe, "features", model
    ).collect()}
    assert out[0] > 20 * out[1]  # off-axis ≫ on-axis at equal radius


def test_effective_dim_isotropic_vs_collapsed(spark):
    from k_means_using_mapreduce_spark.operators.pca import effective_dim

    # isotropic 3-D: unit variance per axis via orthogonal patterns
    iso = []
    vid = 0
    for a in (-1.0, 1.0):
        for b in (-1.0, 1.0):
            for c in (-1.0, 1.0):
                iso.append((vid, [a, b, c])); vid += 1
    df = spark.createDataFrame(iso, "vec_id long, embedding array<double>")
    r = effective_dim(df, "embedding", "vec_id").collect()[0]
    assert r["d"] == 3 and r["n_vecs"] == 8
    assert r["effective_dim"] == pytest.approx(3.0)

    # rank-1 collapse: every vector a multiple of (1, 2, 3)
    col = [
        (i, [1.0 * i, 2.0 * i, 3.0 * i]) for i in range(1, 9)
    ]
    df2 = spark.createDataFrame(col, "vec_id long, embedding array<double>")
    r2 = effective_dim(df2, "embedding", "vec_id").collect()[0]
    assert r2["effective_dim"] == pytest.approx(1.0)
    # constant corpus: zero covariance everywhere -> NULL (undefined)
    const = spark.createDataFrame(
        [(i, [5.0, 5.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    assert (
        effective_dim(const, "embedding", "vec_id").collect()[0][
            "effective_dim"
        ]
        is None
    )
