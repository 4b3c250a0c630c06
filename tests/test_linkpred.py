"""operators/graph.py::link_prediction_scores: hand-computed
Adamic-Adar / neighbor-Jaccard on a known graph, adjacency exclusion,
hub-center truncation."""

from __future__ import annotations

import math

import pytest

from k_means_using_mapreduce_spark.operators.graph import (
    link_prediction_scores,
)


@pytest.fixture(scope="module")
def path_graph(spark):
    # path 1-2-3-4 plus chord 1-3:
    # degrees: 1:2, 2:2, 3:3, 4:1
    rows = [(1, 2), (2, 3), (3, 4), (1, 3)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_hand_computed_scores(path_graph):
    out = {
        (r["node_a"], r["node_b"]): r
        for r in link_prediction_scores(path_graph).collect()
    }
    # non-adjacent pairs with common neighbors:
    # (1,4): common {3} → AA = 1/ln(3); jacc = 1/(2+1-1)
    # (2,4): common {3} → AA = 1/ln(3); jacc = 1/(2+1-1)
    assert set(out) == {(1, 4), (2, 4)}
    r14 = out[(1, 4)]
    assert r14["common"] == 1 and (r14["deg_a"], r14["deg_b"]) == (2, 1)
    assert r14["adamic_adar"] == pytest.approx(1 / math.log(3))
    assert r14["jaccard_nbrs"] == pytest.approx(0.5)


def test_adjacent_pairs_excluded(path_graph):
    # 1-2 share neighbor 3, but are adjacent → must not appear
    got = {
        (r["node_a"], r["node_b"])
        for r in link_prediction_scores(path_graph).collect()
    }
    assert (1, 2) not in got and (1, 3) not in got


def test_hub_truncation(spark):
    # star: hub 0 connected to 1..4; every leaf pair shares only the
    # hub — capping max_degree below the hub's degree empties the result
    rows = [(0, i) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "src long, dst long")
    assert link_prediction_scores(df).count() == 6  # C(4,2) leaf pairs
    assert link_prediction_scores(df, max_degree=3).count() == 0
    with pytest.raises(ValueError):
        link_prediction_scores(df, max_degree=1)


def test_common_neighbor_degree_at_least_two_no_div_zero(spark):
    # two disjoint edges: no common neighbors at all → empty, and no
    # ln(1) division anywhere
    df = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    assert link_prediction_scores(df).count() == 0
