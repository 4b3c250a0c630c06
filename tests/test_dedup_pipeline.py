"""Near-dedup pipeline: transitive duplicate groups collapse to one
representative; unique docs survive untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.dedup_pipeline import (
    connected_components,
    near_dedup,
)


def test_connected_components_transitive(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    comps = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[10] == comps[11] == 10
    assert comps[20] == comps[21] == comps[22] == comps[23] == 20


def test_connected_components_chain(spark):
    # worst-case path graph: 0-1-2-...-7 — needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a long, id_b long"
    )
    comps = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(comps.values()) == {0}


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today ok"
    v1 = base.replace("today", "tomorrow")           # near dup of base
    v2 = base.replace("today ok", "tomorrow no")     # near dup of v1 (chain)
    rows = [
        (1, base),
        (2, base),       # exact dup
        (3, v1),         # near dup
        (4, v2),         # transitive near dup
        (5, "spark shuffles hash partitions across many executors with adaptive query plans"),
        (6, "completely different text about nothing in particular at all whatsoever"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dedup_keeps_one_per_group(corpus):
    out = near_dedup(corpus, jaccard_threshold=0.5, bands=6)
    rows = {r["doc_id"]: r["dup_group_size"] for r in out.collect()}
    assert 1 in rows and rows[1] >= 3        # group representative
    assert 2 not in rows and 3 not in rows   # collapsed into doc 1
    assert rows[5] == 1 and rows[6] == 1     # uniques untouched
    # total rows = uniques + one representative per dup group
    assert len(rows) == 3 or (len(rows) == 4 and 4 in rows)


def test_near_dedup_no_dups_is_identity(spark):
    df = spark.createDataFrame(
        [(i, f"totally unique document number {i} with words w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(8)],
        "doc_id long, text string",
    )
    out = near_dedup(df)
    assert out.count() == 8
    assert all(r["dup_group_size"] == 1 for r in out.collect())


def test_connected_components_driver_fastpath_matches_distributed(spark):
    """Union-find fast path == distributed label propagation on a graph
    with chains, a cycle, and singleton-free structure."""
    from k_means_using_mapreduce_spark.operators.dedup_pipeline import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21), (3, 4)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        (r["id"], r["component"])
        for r in connected_components(pairs, driver_threshold=10**6).collect()
    }
    dist = {
        (r["id"], r["component"])
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist
    assert fast == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_string_ids_both_regimes(spark):
    """String doc ids must work in BOTH regimes with the same output
    schema (ADVICE r2: the driver path hardcoded long ids)."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    for thr in (10**6, 0):
        out = connected_components(pairs, driver_threshold=thr)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "string", "string",
        ]
        comps = {r["id"]: r["component"] for r in out.collect()}
        assert comps == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_random_graphs_property(spark):
    """Alternating large-star/small-star == driver union-find on random
    graphs (chains, cliques, forests) — seeded, 6 draws."""
    import random

    rng = random.Random(7)
    for trial in range(6):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        fast = {
            (r["id"], r["component"])
            for r in connected_components(pairs, driver_threshold=10**6).collect()
        }
        dist = {
            (r["id"], r["component"])
            for r in connected_components(pairs, driver_threshold=0).collect()
        }
        assert fast == dist, f"trial={trial} edges={edges}"


def test_connected_components_long_chain_distributed_few_rounds(spark):
    """A 64-node path graph converges within the default max_iter via
    star contraction (min-label propagation would need ~64 rounds)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    comps = {
        r["id"]: r["component"]
        for r in connected_components(pairs, driver_threshold=0, max_iter=10).collect()
    }
    assert set(comps.values()) == {0}
    assert len(comps) == 64


def test_pick_representatives_by_quality(spark):
    import pytest as _pytest

    from k_means_using_mapreduce_spark.operators.dedup_pipeline import (
        pick_representatives,
    )

    docs = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, 0.99), (4, 0.1), (5, 0.7)],
        "doc_id long, q double",
    )
    comps = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20)], "id long, component long"
    )
    kept = sorted(
        r["doc_id"]
        for r in pick_representatives(
            docs, comps, score_col="q", higher_is_better=True
        ).collect()
    )
    # group 10 keeps doc 3 (best q), group 20 keeps its only member,
    # doc 5 was never matched and survives
    assert kept == [3, 4, 5]
    lowest = sorted(
        r["doc_id"]
        for r in pick_representatives(
            docs, comps, score_col="q", higher_is_better=False
        ).collect()
    )
    assert lowest == [2, 4, 5]
    # ties break by id
    tied = spark.createDataFrame([(1, 1.0), (2, 1.0)], "doc_id long, q double")
    tcomp = spark.createDataFrame([(1, 9), (2, 9)], "id long, component long")
    assert [
        r["doc_id"]
        for r in pick_representatives(tied, tcomp, score_col="q").collect()
    ] == [1]
