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
