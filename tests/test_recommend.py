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


def test_recommend_topk_gemm_matches_window_path(spark):
    """The GEMM kernel must be row-for-row identical to the windowed
    recommend_topk — including score ties resolved by item id (users
    u2/u3 tie two items exactly)."""
    from k_means_using_mapreduce_spark.operators.recommend import (
        recommend_topk,
        recommend_topk_gemm,
    )

    uf = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 1.0]),
        ],
        "user long, factors array<double>",
    )
    itf = spark.createDataFrame(
        [
            (10, [2.0, 0.0]),
            (11, [0.0, 2.0]),
            (12, [1.0, 1.0]),
            (13, [1.0, 1.0]),  # exact tie with 12 for every user
            (14, [-1.0, -1.0]),
        ],
        "id long, factors array<double>",
    )
    for k in (1, 2, 3, 5, 9):
        a = sorted(
            recommend_topk(
                uf, itf.withColumnRenamed("id", "item"), k=k, rank=2
            ).collect()
        )
        g = sorted(
            recommend_topk_gemm(
                uf, itf.withColumnRenamed("id", "item"), k=k
            ).collect()
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in g], f"k={k}"


def test_recommend_topk_gemm_matches_on_contract_inputs(spark, sf_small):
    """End-to-end on the ALS contract's own factor tables at sf0.001:
    the holdout hit-rate integers must be unchanged by the GEMM swap
    (the VERDICT r7 item-3 acceptance bar)."""
    from k_means_using_mapreduce_spark.contracts.recommend_queries import (
        EVAL_K,
        RANK,
        REG,
        SEED,
    )
    from k_means_using_mapreduce_spark.operators.recommend import (
        als_half_step,
        hash_init_factors,
        implicit_ratings,
        recommend_topk,
        recommend_topk_gemm,
    )
    from k_means_using_mapreduce_spark.sources.loaders import load_table

    ratings = implicit_ratings(
        load_table(spark, sf_small, "orders"),
        load_table(spark, sf_small, "lineitem"),
    )
    items = load_table(spark, sf_small, "part").select(
        F.col("p_partkey").alias("id")
    )
    item_f = hash_init_factors(items, rank=RANK, seed=SEED)
    user_f = als_half_step(ratings, item_f, rank=RANK, reg=REG)
    itf = item_f.withColumnRenamed("id", "item")
    a = sorted(
        (r["user"], r["item"], r["rank"])
        for r in recommend_topk(user_f, itf, k=EVAL_K, rank=RANK).collect()
    )
    g = sorted(
        (r["user"], r["item"], r["rank"])
        for r in recommend_topk_gemm(user_f, itf, k=EVAL_K).collect()
    )
    assert a == g and len(a) > 0


def test_recommend_topk_gemm_guards(spark):
    from k_means_using_mapreduce_spark.operators.recommend import (
        recommend_topk_gemm,
    )

    uf = spark.createDataFrame(
        [(1, [1.0, 0.0])], "user long, factors array<double>"
    )
    empty = spark.createDataFrame([], "item long, factors array<double>")
    with pytest.raises(ValueError, match="k must be"):
        recommend_topk_gemm(uf, empty, k=0)
    with pytest.raises(ValueError, match="empty item catalog"):
        recommend_topk_gemm(uf, empty, k=1)


def test_recommend_topk_gemm_rank2_pins_two_rounding_order(spark):
    """ADVICE r8: np.dot may dispatch to an FMA dgemm that contracts
    the rank-2 multiply-add and drifts 1 ulp from the expression
    path. The rank-2 kernel must avoid BLAS and produce EXACTLY
    round(u0*y0) + round(u1*y1) — checked bit-for-bit against a
    scalar Python computation on values dense enough that any
    contraction difference would show."""
    import numpy as np

    from k_means_using_mapreduce_spark.operators.recommend import (
        recommend_topk_gemm,
    )

    rng = np.random.default_rng(7)
    U = rng.standard_normal((40, 2)) * 1e3 + rng.standard_normal((40, 2))
    Y = rng.standard_normal((25, 2)) * 1e-3 + rng.standard_normal((25, 2))
    uf = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(U)],
        "user long, factors array<double>",
    )
    itf = spark.createDataFrame(
        [(j, [float(a), float(b)]) for j, (a, b) in enumerate(Y)],
        "item long, factors array<double>",
    )
    got = {
        (r["user"], r["item"]): r["score"]
        for r in recommend_topk_gemm(uf, itf, k=25).collect()
    }
    assert len(got) == 40 * 25
    for (i, j), s in got.items():
        u0, u1 = float(U[i][0]), float(U[i][1])
        y0, y1 = float(Y[j][0]), float(Y[j][1])
        expected = u0 * y0 + u1 * y1  # scalar: round each, then sum
        assert s == expected, (i, j, s.hex(), expected.hex())


def test_recommend_topk_gemm_rejects_nonintegral_item_ids(spark):
    """ADVICE r8: string/decimal item ids used to crash inside numpy;
    they must raise a clear ValueError up front instead."""
    from k_means_using_mapreduce_spark.operators.recommend import (
        recommend_topk_gemm,
    )

    uf = spark.createDataFrame(
        [(1, [1.0, 0.0])], "user long, factors array<double>"
    )
    itf = spark.createDataFrame(
        [("a", [1.0, 0.0])], "item string, factors array<double>"
    )
    with pytest.raises(ValueError, match="integral id types only"):
        recommend_topk_gemm(uf, itf, k=1)
