"""Semantic dedup (operators/semdedup.py): cluster-local pruning, both
keep policies, determinism, and the no-cross-cluster guarantee."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_summary,
    semantic_dedup_survivors,
)

# two well-separated clusters on the plane
CENTROIDS = [(1, [10.0, 0.0]), (2, [-10.0, 0.0])]


def _vec(angle_deg: float, r: float, cx: float) -> list[float]:
    a = math.radians(angle_deg)
    return [cx + r * math.cos(a), r * math.sin(a)]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        # cluster 1: ids 1,2 nearly parallel (near-dups), 3 orthogonal-ish
        (1, [10.0, 1.0]),
        (2, [10.2, 1.02]),
        (3, [1.0, 14.0]),
        # cluster 2: ids 4,5 nearly antiparallel to cluster 1 pair but
        # parallel to each other; 6 distinct
        (4, [-10.0, -1.0]),
        (5, [-10.1, -1.01]),
        (6, [-1.0, 12.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_min_id_keeps_lowest(emb):
    out = {
        r["id"]: r["is_dup"]
        for r in semantic_dedup(emb, CENTROIDS, threshold=0.99).collect()
    }
    assert out[1] is False and out[2] is True  # 2 loses to 1
    assert out[4] is False and out[5] is True  # 5 loses to 4
    assert out[3] is False and out[6] is False


def test_no_cross_cluster_pruning(spark):
    # identical vectors assigned to different clusters never pair
    rows = [(1, [10.0, 5.0]), (2, [-10.0, 5.0])]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb2, CENTROIDS, threshold=0.0).collect()
    assert all(r["is_dup"] is False for r in out)
    cids = {r["id"]: r["cid"] for r in out}
    assert cids[1] != cids[2]


def test_far_from_centroid_policy(emb):
    # ids 1,2 are near-dups; the survivor must be the one LESS similar
    # to centroid 1. Vector 3 ([1,14]) points away from the centroid
    # direction, so among 1 and 2 whichever has lower cos to [10,0].
    out = {
        r["id"]: r["is_dup"]
        for r in semantic_dedup(
            emb, CENTROIDS, threshold=0.99, keep="far_from_centroid"
        ).collect()
    }
    # cos([10,1],[10,0]) > cos([10.2,1.02],[10,0])? both ~same angle;
    # compute expected on the driver
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    c1 = cos([10.0, 1.0], [10.0, 0.0])
    c2 = cos([10.2, 1.02], [10.0, 0.0])
    expect_survivor = 1 if (c1, 1) < (c2, 2) else 2
    assert out[expect_survivor] is False
    assert out[3 - expect_survivor] is True


def test_survivors_and_summary_consistent(emb):
    surv = semantic_dedup_survivors(emb, CENTROIDS, threshold=0.99)
    summ = semantic_dedup_summary(emb, CENTROIDS, threshold=0.99)
    n_surv = surv.count()
    agg = summ.agg(
        F.sum("n_members").alias("m"),
        F.sum("n_survivors").alias("s"),
    ).first()
    assert agg["m"] == emb.count()
    assert agg["s"] == n_surv
    ratios = [r["drop_ratio"] for r in summ.collect()]
    assert all(0.0 <= x <= 1.0 for x in ratios)


def test_deterministic(emb):
    a = sorted(
        (r["id"], r["is_dup"])
        for r in semantic_dedup(
            emb, CENTROIDS, threshold=0.99, keep="far_from_centroid"
        ).collect()
    )
    b = sorted(
        (r["id"], r["is_dup"])
        for r in semantic_dedup(
            emb, CENTROIDS, threshold=0.99, keep="far_from_centroid"
        ).collect()
    )
    assert a == b


def test_rejects_unknown_policy(emb):
    with pytest.raises(ValueError):
        semantic_dedup(emb, CENTROIDS, keep="random")
