"""Clustering-evaluation operators: silhouette + elbow sweep."""

from __future__ import annotations

import random

import pytest

from k_means_using_mapreduce_spark.operators.evaluation import (
    silhouette,
    sse_by_k,
)

CENTERS = [(0.0, 0.0), (50.0, 50.0)]


@pytest.fixture(scope="module")
def blobs(spark):
    rng = random.Random(11)
    rows = [
        ([cx + rng.gauss(0, 1.0), cy + rng.gauss(0, 1.0)],)
        for cx, cy in CENTERS
        for _ in range(40)
    ]
    return spark.createDataFrame(rows, "features array<double>").cache()


def test_silhouette_high_for_true_centers(blobs):
    good = silhouette(blobs, [(1, [0.0, 0.0]), (2, [50.0, 50.0])])
    assert 0.9 < good <= 1.0
    # centers that split the first blob down the middle: clusters mix
    # nearby points, silhouette collapses
    bad = silhouette(blobs, [(1, [-1.0, -1.0]), (2, [1.0, 1.0])])
    assert bad < 0.8 < good


def test_silhouette_single_cluster_raises_clearly(blobs):
    with pytest.raises(ValueError, match="2 non-empty clusters"):
        silhouette(blobs, [(1, [25.0, 25.0]), (2, [99999.0, 99999.0])])


def test_sse_by_k_monotone_and_elbow(blobs):
    sweep = dict(sse_by_k(blobs, [1, 2, 4], seed=3))
    assert sweep[1] > sweep[2] > sweep[4]  # SSE decreases with k
    # true structure is 2 blobs: the k=1→2 drop dwarfs k=2→4
    assert (sweep[1] - sweep[2]) > 10 * (sweep[2] - sweep[4])


def test_label_centroid_drift_hand_values(spark):
    """Two orthogonal label clouds: each centroid sits 45 degrees from
    the global mean (cos = 1/sqrt(2)), at distance sqrt(0.5)."""
    import math

    from k_means_using_mapreduce_spark.operators.evaluation import (
        label_centroid_drift,
    )

    rows = [("A", [1.0, 0.0])] * 2 + [("B", [0.0, 1.0])] * 2
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    got = {r["label"]: r for r in label_centroid_drift(df).collect()}
    for lab in ("A", "B"):
        r = got[lab]
        assert r["n_vecs"] == 2
        assert r["centroid_l2"] == pytest.approx(1.0)
        assert r["cos_to_global"] == pytest.approx(1 / math.sqrt(2))
        assert r["dist_to_global"] == pytest.approx(math.sqrt(0.5))


def test_label_centroid_drift_no_shift(spark):
    """Labels with identical distributions show cos 1, distance 0."""
    from k_means_using_mapreduce_spark.operators.evaluation import (
        label_centroid_drift,
    )

    rows = [(lab, [float(i), float(3 - i)]) for lab in ("x", "y") for i in range(4)]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    for r in label_centroid_drift(df).collect():
        assert r["cos_to_global"] == pytest.approx(1.0)
        assert r["dist_to_global"] == pytest.approx(0.0, abs=1e-12)


def test_contract_simplified_silhouette_matches_numpy(spark, sf_small):
    """The expression-only per-cluster SIMPLIFIED silhouette (contract
    query) must match a driver-side numpy recompute of the same
    formula point-for-point."""
    import numpy as np

    from k_means_using_mapreduce_spark.contracts.kmeans_queries import (
        silhouette_embeddings_by_cluster,
        _embeddings_features,
    )
    from k_means_using_mapreduce_spark.contract_constants import (
        EMBEDDING_CENTROIDS,
    )

    per = {
        r["cid"]: r
        for r in silhouette_embeddings_by_cluster(spark, sf_small).collect()
    }
    feats = _embeddings_features(spark, sf_small).collect()
    cents = {cid: np.array(v) for cid, v in EMBEDDING_CENTROIDS}
    agg: dict[int, list[float]] = {}
    for r in feats:
        x = np.array(r["features"])
        d = {cid: float(((x - c) ** 2).sum()) for cid, c in cents.items()}
        cid = min(d, key=lambda k: (d[k], k))
        a = d[cid]
        b = min(v for k, v in d.items() if k != cid)
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        agg.setdefault(cid, []).append(s)
    for cid, ss in agg.items():
        assert per[cid]["n"] == len(ss)
        assert per[cid]["mean_silhouette"] == pytest.approx(
            sum(ss) / len(ss), rel=1e-9
        )


def test_best_split_stump_perfect_and_degenerate(spark):
    import pyspark.sql.functions as F

    from k_means_using_mapreduce_spark.operators.evaluation import (
        best_split_stump,
    )

    rows = [(float(x), 0.0 if x <= 4 else 1.0) for x in range(1, 11) for _ in range(3)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = best_split_stump(df, "x", F.col("y")).collect()[0]
    assert r["threshold"] == 4.0
    assert r["gini_gain"] == pytest.approx(r["gini_parent"])  # perfect split
    assert r["pos_rate_left"] == 0.0 and r["pos_rate_right"] == 1.0

    one = spark.createDataFrame([(1.0, 1.0), (1.0, 0.0)], "x double, y double")
    r1 = best_split_stump(one, "x", F.col("y")).collect()[0]
    assert r1["threshold"] is None and r1["gini_gain"] is None
    assert r1["n"] == 2
