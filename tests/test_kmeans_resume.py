"""Driver-loop fault tolerance: kmeans_fit_resumable checkpoints
centroids per iteration and resumes to the exact uninterrupted result
(Lloyd's iteration is a pure function of (data, centroids))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.kmeans import (
    kmeans_fit,
    kmeans_fit_resumable,
)


@pytest.fixture(scope="module")
def feats(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    return emb.select(F.col("embedding").cast("array<double>").alias("features"))


def test_resume_matches_uninterrupted(feats, tmp_path):
    state = str(tmp_path / "state")
    full = kmeans_fit(feats, 4, seed=7, max_iter=6, tol=0.0)

    # "crash" after 2 iterations, then resume to 6
    part = kmeans_fit_resumable(feats, 4, state, seed=7, max_iter=2, tol=0.0)
    assert part.iterations == 2
    resumed = kmeans_fit_resumable(feats, 4, state, seed=7, max_iter=6, tol=0.0)
    assert resumed.iterations == 6
    assert resumed.sse == pytest.approx(full.sse, rel=1e-12)
    for (ca, va), (cb, vb) in zip(resumed.centroids, full.centroids):
        assert ca == cb
        assert va == pytest.approx(vb, rel=1e-12)


def test_resume_is_noop_when_done(feats, tmp_path):
    state = str(tmp_path / "state2")
    kmeans_fit_resumable(feats, 3, state, seed=1, max_iter=3, tol=0.0)
    again = kmeans_fit_resumable(feats, 3, state, seed=1, max_iter=3, tol=0.0)
    assert again.iterations == 3  # nothing re-run beyond the SSE pass


def test_checkpoint_every_skips_intermediate_versions(feats, tmp_path):
    from k_means_using_mapreduce_spark.operators.kmeans import (
        _list_checkpoint_iters,
    )

    state = str(tmp_path / "state3")
    kmeans_fit_resumable(
        feats, 3, state, seed=1, max_iter=4, tol=0.0, checkpoint_every=2
    )
    assert _list_checkpoint_iters(feats.sparkSession, state) == [2, 4]


def test_validation(feats, tmp_path):
    with pytest.raises(ValueError):
        kmeans_fit_resumable(feats, 3, str(tmp_path), checkpoint_every=0)
