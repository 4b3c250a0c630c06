"""operators/recommend.py (ALS): half-step solves match a local numpy
reference, the alternating fit reduces training RMSE, rank-2 closed
form agrees with the general pandas path, top-k semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.recommend import (
    als_fit,
    als_half_step,
    hash_init_factors,
    recommend_topk,
)

REG = 0.5


@pytest.fixture(scope="module")
def ratings(spark):
    rng = np.random.default_rng(7)
    users, items = 20, 12
    xu = rng.normal(size=(users, 2))
    yi = rng.normal(size=(items, 2))
    rows = [
        (u, i, float(xu[u] @ yi[i] + 0.01 * rng.normal()))
        for u in range(users)
        for i in range(items)
        if (u + i) % 3 != 0  # leave holes: a sparse interaction list
    ]
    return spark.createDataFrame(rows, "user long, item long, rating double")


def _factors_np(df, id_col):
    return {r[id_col]: np.array(r["factors"]) for r in df.collect()}


def test_half_step_matches_numpy_ridge(spark, ratings):
    item_ids = ratings.select(F.col("item").alias("id")).distinct()
    item_f = hash_init_factors(item_ids, rank=2, seed=1)
    got = _factors_np(als_half_step(ratings, item_f, rank=2, reg=REG), "user")
    y = _factors_np(item_f, "id")
    r = ratings.collect()
    for user in {row["user"] for row in r}:
        mine = [(row["item"], row["rating"]) for row in r if row["user"] == user]
        Y = np.stack([y[i] for i, _ in mine])
        b = np.array([v for _, v in mine])
        ref = np.linalg.solve(Y.T @ Y + REG * np.eye(2), Y.T @ b)
        assert got[user] == pytest.approx(ref, rel=1e-9)


def test_rank3_pandas_path_matches_numpy(spark, ratings):
    item_ids = ratings.select(F.col("item").alias("id")).distinct()
    item_f = hash_init_factors(item_ids, rank=3, seed=1)
    got = _factors_np(als_half_step(ratings, item_f, rank=3, reg=REG), "user")
    y = _factors_np(item_f, "id")
    r = ratings.collect()
    for user in sorted({row["user"] for row in r})[:5]:
        mine = [(row["item"], row["rating"]) for row in r if row["user"] == user]
        Y = np.stack([y[i] for i, _ in mine])
        b = np.array([v for _, v in mine])
        ref = np.linalg.solve(Y.T @ Y + REG * np.eye(3), Y.T @ b)
        assert got[user] == pytest.approx(ref, rel=1e-9)


def test_fit_reduces_rmse_and_is_deterministic(ratings):
    _, _, hist = als_fit(ratings, rank=2, iterations=3, reg=0.1, seed=0)
    assert len(hist) == 3
    assert hist[-1] < hist[0]
    assert hist[-1] < 0.5  # planted rank-2 structure is recoverable
    _, _, hist2 = als_fit(ratings, rank=2, iterations=3, reg=0.1, seed=0)
    assert hist == hist2


def test_recommend_topk_shape_and_order(spark, ratings):
    uf, itf, _ = als_fit(ratings, rank=2, iterations=2, reg=0.1, seed=0)
    rec = recommend_topk(uf, itf, k=3).collect()
    by_user = {}
    for row in rec:
        by_user.setdefault(row["user"], []).append(row)
    assert all(len(v) == 3 for v in by_user.values())
    for rows in by_user.values():
        rows.sort(key=lambda r: r["rank"])
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_validation(spark, ratings):
    ids = ratings.select(F.col("item").alias("id")).distinct()
    with pytest.raises(ValueError):
        hash_init_factors(ids, rank=0)
    itf = hash_init_factors(ids, rank=2)
    with pytest.raises(ValueError):
        als_half_step(ratings, itf, rank=2, reg=0.0)
    with pytest.raises(ValueError):
        als_fit(ratings, rank=2, iterations=0)
    with pytest.raises(ValueError):
        recommend_topk(itf, itf, k=0)


def test_holdout_hitrate_counts(spark):
    from k_means_using_mapreduce_spark.operators.recommend import (
        holdout_hitrate,
    )

    held = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (3, 30)], "user long, item long"
    )
    recs = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 21), (3, 30)], "user long, item long"
    )
    r = holdout_hitrate(held, recs).first()
    assert (r["n_holdout"], r["users_evaluated"], r["hits"]) == (4, 3, 2)
    assert r["hit_rate"] == pytest.approx(0.5)
