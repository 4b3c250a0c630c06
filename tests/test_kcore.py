"""operators/graph.py::k_core_edges / k_core_nodes: hand-built graphs
with known cores, pendant-chain peeling depth, fixpoint invariants."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.contracts.graph_queries import (
    K_CORE_ROUNDS,
)
from k_means_using_mapreduce_spark.operators.graph import (
    k_core_edges,
    k_core_nodes,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_triangle_with_pendant(spark):
    # triangle {1,2,3} + pendant 3-4: 2-core = the triangle
    e = _df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    core = {(r["src"], r["dst"]) for r in k_core_edges(e, 2).collect()}
    assert core == {(1, 2), (2, 3), (1, 3)}
    nodes = {r["node"]: r["deg"] for r in k_core_nodes(e, 2).collect()}
    assert nodes == {1: 2, 2: 2, 3: 2}


def test_cascading_peel_chain(spark):
    # path 1-2-3-4-5: 2-core empty, but only after CASCADING rounds
    # (endpoints peel first, then the new endpoints, ...)
    e = _df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert k_core_edges(e, 2).count() == 0
    # 1-core of anything non-empty is everything
    assert k_core_edges(e, 1).count() == 4


def test_k4_survives_k3(spark):
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    # K4 + a dangling triangle off node 1
    e = _df(spark, k4 + [(1, 10), (1, 11), (10, 11)])
    nodes = {r["node"] for r in k_core_nodes(e, 3).collect()}
    assert nodes == {1, 2, 3, 4}
    degs = {r["deg"] for r in k_core_nodes(e, 3).collect()}
    assert degs == {3}


def test_core_is_fixpoint(spark):
    # peeling the core again changes nothing
    e = _df(spark, [(a, b) for a in range(1, 6) for b in range(a + 1, 6)])
    core = k_core_edges(e, 3)
    again = k_core_edges(core, 3)
    assert sorted(map(tuple, core.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_oracle_rounds_cover_contract_depth(spark, sf_oracle):
    # the contract's fixed-round oracle is only valid if the engine
    # converges within K_CORE_ROUNDS on the contract graph
    from k_means_using_mapreduce_spark.contracts.graph_queries import (
        K_CORE_K,
        _user_cooc_edges,
    )

    e = _user_cooc_edges(spark, sf_oracle)
    fewer = k_core_nodes(e, K_CORE_K, max_rounds=K_CORE_ROUNDS - 5)
    full = k_core_nodes(e, K_CORE_K, max_rounds=K_CORE_ROUNDS)
    assert sorted(map(tuple, fewer.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_validation(spark):
    e = _df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        k_core_edges(e, 0)
    with pytest.raises(ValueError):
        k_core_edges(e, 2, max_rounds=0)
