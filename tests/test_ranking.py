"""operators/ranking.py: hand-computed AUC (with ties), ranked-list
metrics on a known ordering, degenerate-group NULLs, grouped vs pooled
consistency, and plan shape (one exchange for the metric windows)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.ranking import (
    binary_auc,
    mean_ranking_metrics,
    ranking_metrics,
)
from k_means_using_mapreduce_spark.plans.explain import exchange_count


@pytest.fixture(scope="module")
def scored(spark):
    # scores: pos at 0.9/0.8/0.4, neg at 0.8/0.3/0.1 — one tie (0.8)
    rows = [
        (1, 0.9, 1),
        (2, 0.8, 1),
        (3, 0.4, 1),
        (4, 0.8, 0),
        (5, 0.3, 0),
        (6, 0.1, 0),
    ]
    return spark.createDataFrame(rows, "id long, score double, label int")


def test_auc_hand_computed_with_ties(scored):
    # ascending ranks: 0.1→1, 0.3→2, 0.4→3, 0.8→avg(4,5)=4.5, 0.9→6
    # pos rank-sum = 3 + 4.5 + 6 = 13.5; AUC = (13.5 - 6) / 9 = 5/6
    row = binary_auc(scored, "score", "label").collect()[0]
    assert row["n_pos"] == 3 and row["n_neg"] == 3
    assert row["auc"] == pytest.approx(7.5 / 9.0)


def test_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [(i, float(i), 1 if i > 2 else 0) for i in range(1, 6)],
        "id long, score double, label int",
    )
    assert binary_auc(df, "score", "label").collect()[0]["auc"] == 1.0
    inv = df.withColumn("score", -F.col("score"))
    assert binary_auc(inv, "score", "label").collect()[0]["auc"] == 0.0


def test_auc_degenerate_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 0), ("b", 1.0, 1), ("b", 2.0, 1)],
        "g string, score double, label int",
    )
    out = {
        r["g"]: r for r in binary_auc(df, "score", "label", ["g"]).collect()
    }
    assert out["a"]["auc"] == 0.0
    assert out["b"]["auc"] is None and out["b"]["n_neg"] == 0


def test_auc_grouped_matches_pooled_per_group(scored):
    # one group; grouped path must agree with the global path exactly
    g = scored.withColumn("g", F.lit("x"))
    pooled = binary_auc(scored, "score", "label").collect()[0]["auc"]
    grouped = binary_auc(g, "score", "label", ["g"]).collect()[0]["auc"]
    assert grouped == pooled


@pytest.fixture(scope="module")
def judged(spark):
    # group q1 ranked by score desc: ids 1(rel),2,3(rel),4,5 —
    # rel at ranks 1 and 3
    rows = [
        ("q1", 1, 0.9, 1),
        ("q1", 2, 0.8, 0),
        ("q1", 3, 0.7, 1),
        ("q1", 4, 0.6, 0),
        ("q1", 5, 0.5, 0),
        ("q2", 6, 1.0, 0),
        ("q2", 7, 0.9, 0),
    ]
    return spark.createDataFrame(
        rows, "q string, id long, score double, rel int"
    )


def test_ranked_metrics_hand_computed(judged):
    out = {
        r["q"]: r
        for r in ranking_metrics(
            judged, "q", "id", "score", "rel", k=2
        ).collect()
    }
    q1 = out["q1"]
    assert q1["n_items"] == 5 and q1["n_rel"] == 2
    assert q1["precision_at_k"] == pytest.approx(0.5)  # 1 hit in top-2
    assert q1["recall_at_k"] == pytest.approx(0.5)
    assert q1["mrr"] == 1.0
    # AP = (1/1 + 2/3) / 2
    assert q1["ap"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
    # DCG@2 = 1/log2(2); IDCG@2 = 1/log2(2) + 1/log2(3)
    assert q1["ndcg_at_k"] == pytest.approx(
        1.0 / (1.0 + 1.0 / math.log2(3.0))
    )
    q2 = out["q2"]
    assert q2["n_rel"] == 0
    for c in ("mrr", "ap", "recall_at_k", "ndcg_at_k"):
        assert q2[c] is None
    assert q2["precision_at_k"] == 0.0


def test_perfect_ranking_is_all_ones(spark):
    df = spark.createDataFrame(
        [("q", i, 10.0 - i, 1 if i <= 3 else 0) for i in range(1, 8)],
        "q string, id long, score double, rel int",
    )
    row = ranking_metrics(df, "q", "id", "score", "rel", k=3).collect()[0]
    for c in ("precision_at_k", "recall_at_k", "mrr", "ap", "ndcg_at_k"):
        assert row[c] == pytest.approx(1.0), c


def test_tie_break_is_deterministic_under_repartition(judged):
    tied = judged.withColumn("score", F.lit(1.0))
    a = ranking_metrics(tied, "q", "id", "score", "rel", k=2)
    b = ranking_metrics(
        tied.repartition(7), "q", "id", "score", "rel", k=2
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_k_validation(judged):
    with pytest.raises(ValueError):
        ranking_metrics(judged, "q", "id", "score", "rel", k=0)


def test_mean_metrics_skip_undefined_groups(judged):
    per = ranking_metrics(judged, "q", "id", "score", "rel", k=2)
    row = mean_ranking_metrics(per).collect()[0]
    assert row["n_groups"] == 2 and row["n_eval_groups"] == 1
    # only q1 contributes — means equal q1's values
    assert row["map"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
    assert row["mean_precision_at_k"] == pytest.approx(0.5)


def test_ranking_metrics_single_exchange(judged):
    # both windows and the final groupBy share the group-key hash
    # partitioning: exactly one shuffle in the whole plan
    plan = ranking_metrics(judged, "q", "id", "score", "rel", k=2)
    assert exchange_count(plan) == 1
