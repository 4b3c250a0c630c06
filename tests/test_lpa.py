"""operators/graph.py::label_propagation: community recovery on
planted structures, tie determinism, fixed-round semantics."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.graph import label_propagation


def _labels(spark, rows, **kw):
    df = spark.createDataFrame(rows, "src long, dst long")
    return {r["node"]: r["label"] for r in label_propagation(df, **kw).collect()}


def test_two_cliques_two_communities(spark):
    k4a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k4b = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    lab = _labels(spark, k4a + k4b)
    assert len({lab[n] for n in range(1, 5)}) == 1
    assert len({lab[n] for n in range(11, 15)}) == 1
    assert lab[1] != lab[11]


def test_min_label_tiebreak_on_clique(spark):
    # round 1: every node's neighbor labels are all distinct -> each
    # picks the smallest neighbor label; clique converges to label 1
    k3 = [(1, 2), (2, 3), (1, 3)]
    lab = _labels(spark, k3, rounds=3)
    assert set(lab.values()) == {1}


def test_fixed_rounds_deterministic(spark):
    rows = [(a, b) for a in range(1, 7) for b in range(a + 1, 7) if (a + b) % 3]
    one = _labels(spark, rows, rounds=4)
    two = _labels(spark, rows, rounds=4)
    assert one == two


def test_single_edge_oscillates_as_documented(spark):
    # bipartite oscillation (the docstring's reason for fixed-round
    # semantics): one round swaps the labels, two rounds swap back
    assert _labels(spark, [(5, 9)], rounds=1) == {5: 9, 9: 5}
    assert _labels(spark, [(5, 9)], rounds=2) == {5: 5, 9: 9}


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)
