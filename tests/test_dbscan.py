"""operators/dbscan.py: hand-checkable geometry, role assignment,
cluster labels, cross-cell neighbors, determinism."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.dbscan import (
    dbscan,
    dbscan_classes,
)


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "pid long, x double, y double",
    )


def test_two_blobs_and_a_stray(spark):
    blob_a = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)]
    blob_b = [(10.0, 10.0), (10.5, 10.0), (10.0, 10.5), (10.5, 10.5)]
    stray = [(50.0, 50.0)]
    df = _df(spark, blob_a + blob_b + stray)
    out = {r["id"]: r for r in dbscan(df, "x", "y", "pid", eps=1.0, min_pts=4).collect()}
    # each blob member sees all 4 blob points -> everyone core
    for i in range(8):
        assert out[i]["cls"] == "core"
    assert out[8]["cls"] == "noise" and out[8]["cluster"] == -1
    a_clusters = {out[i]["cluster"] for i in range(4)}
    b_clusters = {out[i]["cluster"] for i in range(4, 8)}
    assert len(a_clusters) == 1 and len(b_clusters) == 1
    assert a_clusters != b_clusters
    assert a_clusters == {0}  # min-id labeling


def test_border_points_attach_to_min_cluster(spark):
    # dense core line + one point within eps of a core but itself sparse
    core_line = [(float(i) * 0.4, 0.0) for i in range(6)]
    border = [(2.0, 0.9)]  # near the line, only ~3 neighbors
    df = _df(spark, core_line + border)
    out = {r["id"]: r for r in dbscan(df, "x", "y", "pid", eps=1.0, min_pts=5).collect()}
    assert out[6]["cls"] == "border"
    assert out[6]["cluster"] == out[0]["cluster"] != -1


def test_neighbors_across_cell_boundaries(spark):
    """Points straddling a grid boundary at distance exactly < eps must
    still pair (the 9-offset join correctness)."""
    df = _df(spark, [(0.99, 0.0), (1.01, 0.0), (0.99, 0.99), (1.01, 1.01)])
    out = dbscan_classes(df, "x", "y", "pid", eps=1.0, min_pts=2).collect()
    by = {r["id"]: r["n_neighbors"] for r in out}
    assert by[0] >= 2 and by[1] >= 2  # cross-boundary pair found
    assert by[2] >= 2 and by[3] >= 2


def test_min_pts_one_everything_core(spark):
    df = _df(spark, [(0.0, 0.0), (100.0, 100.0)])
    out = dbscan(df, "x", "y", "pid", eps=1.0, min_pts=1).collect()
    assert all(r["cls"] == "core" for r in out)
    assert {r["cluster"] for r in out} == {0, 1}  # isolated singletons


def test_partitioning_invariance(spark):
    import random

    rng = random.Random(1)
    pts = [(rng.uniform(0, 5), rng.uniform(0, 5)) for _ in range(120)]
    df = _df(spark, pts)
    a = sorted(
        (r["id"], r["cls"], r["cluster"])
        for r in dbscan(df, "x", "y", "pid", eps=0.7, min_pts=6).collect()
    )
    b = sorted(
        (r["id"], r["cls"], r["cluster"])
        for r in dbscan(
            df.repartition(11), "x", "y", "pid", eps=0.7, min_pts=6
        ).collect()
    )
    assert a == b


def test_guards(spark):
    df = _df(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError, match="eps"):
        dbscan_classes(df, "x", "y", "pid", eps=0.0, min_pts=2)
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_classes(df, "x", "y", "pid", eps=1.0, min_pts=0)
