"""timeseries.trend_test (Mann-Kendall/Theil-Sen hand examples) and
graph.bfs_hops (path/star/disconnected graphs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.graph import bfs_hops
from k_means_using_mapreduce_spark.operators.timeseries import trend_test

_HOUR_US = 3_600_000_000


def _series(spark, per_key_values):
    rows = []
    eid = 0
    for key, values in per_key_values.items():
        for i, v in enumerate(values):
            for _ in range(v):
                rows.append((eid, key, i * _HOUR_US))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, k string, ts_us long")
    return df.select("event_id", "k", F.timestamp_micros("ts_us").alias("ts"))


def test_mann_kendall_monotone_series(spark):
    # strictly increasing y = 1..5: S = C(5,2) = 10, no ties,
    # var = 5*4*15/18, z = 9/sqrt(var); Sen slope = 1 exactly.
    out = {
        r["key"]: r
        for r in trend_test(
            _series(spark, {"up": [1, 2, 3, 4, 5], "dn": [5, 4, 3, 2, 1]}),
            ts_col="ts", key_col="k",
        ).collect()
    }
    up, dn = out["up"], out["dn"]
    assert up["s"] == 10 and dn["s"] == -10
    var = 5 * 4 * 15 / 18.0
    assert up["var_s"] == pytest.approx(var)
    assert up["z"] == pytest.approx(9 / var**0.5)
    assert dn["z"] == pytest.approx(-9 / var**0.5)
    assert up["sen_slope"] == pytest.approx(1.0)
    assert dn["sen_slope"] == pytest.approx(-1.0)


def test_mann_kendall_constant_series_null_z(spark):
    out = trend_test(
        _series(spark, {"flat": [2, 2, 2, 2]}), ts_col="ts", key_col="k"
    ).first()
    assert out["s"] == 0
    # all 4 values tied: tie term equals the n term -> var 0 -> z NULL
    assert out["var_s"] == pytest.approx(0.0)
    assert out["z"] is None


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _start(spark, node):
    return spark.createDataFrame([(node,)], "node long")


def test_bfs_path_graph_hops(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = dict(
        (r["node"], r["hop"]) for r in bfs_hops(e, _start(spark, 1)).collect()
    )
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_honors_max_hops_and_disconnection(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    out = dict(
        (r["node"], r["hop"])
        for r in bfs_hops(e, _start(spark, 1), max_hops=2).collect()
    )
    assert out == {1: 0, 2: 1, 3: 2}  # 4 beyond horizon, 10/11 unreachable


def test_bfs_min_hop_not_any_hop(spark):
    # two routes to node 4: 1-2-4 (2 hops) and 1-3-5-4 (3 hops)
    e = _edges(spark, [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4)])
    out = dict(
        (r["node"], r["hop"]) for r in bfs_hops(e, _start(spark, 1)).collect()
    )
    assert out[4] == 2


def test_bfs_directed_mode(spark):
    e = _edges(spark, [(2, 1), (2, 3)])
    out = dict(
        (r["node"], r["hop"])
        for r in bfs_hops(e, _start(spark, 1), directed=True).collect()
    )
    assert out == {1: 0}  # no out-edges from 1 in directed mode
    with pytest.raises(ValueError):
        bfs_hops(e, _start(spark, 1), max_hops=-1)
