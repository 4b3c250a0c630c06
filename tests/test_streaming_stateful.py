"""applyInPandasWithState running-centroid operator: state carries
across micro-batches and converges to the global mean."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.streaming import streaming_assign
from k_means_using_mapreduce_spark.streaming.stateful import running_centroids

CENTROIDS = [(1, [0.0, 0.0]), (2, [10.0, 10.0])]


def _write_batch(d, name, rows):
    with open(d / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_centroids_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_batch(d, "b0", [
        {"x": 1.0, "y": 0.0},
        {"x": 3.0, "y": 0.0},
        {"x": 9.0, "y": 10.0},
    ])
    stream = (
        spark.readStream.schema("x DOUBLE, y DOUBLE")
        .json(str(d))
        .select(F.array("x", "y").alias("features"))
    )
    assigned = streaming_assign(stream, CENTROIDS).select("cid", "features")
    out = running_centroids(assigned)
    q = (
        out.writeStream.format("memory")
        .queryName("run_cents")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["cid"]: r for r in spark.sql(
            "select * from run_cents").collect()}
        assert rows[1]["n"] == 2 and rows[1]["centroid"] == [2.0, 0.0]
        assert rows[2]["n"] == 1 and rows[2]["centroid"] == [9.0, 10.0]

        # second micro-batch folds into existing state
        _write_batch(d, "b1", [
            {"x": 5.0, "y": 3.0},     # cluster 1
            {"x": 11.0, "y": 12.0},   # cluster 2
        ])
        q.processAllAvailable()
        latest = {}
        for r in spark.sql("select * from run_cents").collect():
            latest[(r["cid"], r["n"])] = r["centroid"]
        # running mean over ALL rows seen: cluster1 = mean of (1,0),(3,0),(5,3)
        assert latest[(1, 3)] == [3.0, 1.0]
        assert latest[(2, 2)] == [10.0, 11.0]
    finally:
        q.stop()
