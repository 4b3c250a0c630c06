"""k-means++ initialization: D²-weighted seeding properties."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.kmeans import (
    init_centroids_pp,
    kmeans_fit,
)

BLOB_CENTERS = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0)]


@pytest.fixture(scope="module")
def blobs(spark):
    rng = random.Random(7)
    rows = []
    for cx, cy in BLOB_CENTERS:
        rows += [
            ([cx + rng.gauss(0, 0.1), cy + rng.gauss(0, 0.1)],)
            for _ in range(50)
        ]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "features array<double>").repartition(4).cache()


def _blob_of(vec):
    return min(
        range(len(BLOB_CENTERS)),
        key=lambda i: (vec[0] - BLOB_CENTERS[i][0]) ** 2
        + (vec[1] - BLOB_CENTERS[i][1]) ** 2,
    )


def test_pp_covers_all_separated_blobs(blobs):
    cents = init_centroids_pp(blobs, 4, seed=42)
    assert len(cents) == 4
    assert [c for c, _ in cents] == [1, 2, 3, 4]
    # D² weighting makes one-pick-per-blob near-certain at this
    # separation (intra-blob D² ~ 0.01 vs inter-blob ~ 10^4)
    assert {_blob_of(vec) for _, vec in cents} == {0, 1, 2, 3}


def test_pp_deterministic_for_seed(blobs):
    a = init_centroids_pp(blobs, 4, seed=123)
    b = init_centroids_pp(blobs, 4, seed=123)
    assert a == b


def test_pp_all_duplicate_rows(spark):
    df = spark.createDataFrame([([1.0, 2.0],)] * 10, "features array<double>")
    cents = init_centroids_pp(df, 2, seed=1)
    assert len(cents) == 2
    assert all(vec == [1.0, 2.0] for _, vec in cents)


def test_fit_with_pp_init_converges(blobs):
    res = kmeans_fit(blobs, 4, seed=42, max_iter=10, init="k-means++")
    assert res.converged
    # with per-blob seeding, each cluster holds exactly one blob
    assert sorted(res.cluster_sizes.values()) == [50, 50, 50, 50]
    assert res.sse < 50 * 4 * 0.1  # tight clusters, tiny SSE


def test_fit_rejects_unknown_init(blobs):
    with pytest.raises(ValueError, match="unknown init"):
        kmeans_fit(blobs, 2, init="zzz")


def test_pp_empty_input(spark):
    empty = spark.createDataFrame([], "features array<double>")
    with pytest.raises(ValueError, match="empty"):
        init_centroids_pp(empty, 2, seed=1)
