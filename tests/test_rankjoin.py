"""Top-k ranking similarity join (operators/rankjoin.py): ranking
determinism, Fagin footrule exactness vs a brute-force python twin,
blocking recall bound, validation."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.rankjoin import (
    ranking_join_summary,
    ranking_similarity_join,
    top_k_rankings,
)


def _events(spark, per_user):
    rows = []
    eid = 0
    for user, items in per_user.items():
        for it in items:
            rows.append((eid, user, it))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    )


def _footrule(ra, rb, k):
    pos_a = {it: i + 1 for i, it in enumerate(ra)}
    pos_b = {it: i + 1 for i, it in enumerate(rb)}
    items = set(ra) | set(rb)
    return sum(
        abs(pos_a.get(it, k + 1) - pos_b.get(it, k + 1)) for it in items
    )


def test_rankings_deterministic_count_then_name(spark):
    """Counts order first; exact count ties break by item name asc."""
    df = _events(spark, {1: ["b"] * 3 + ["a"] * 3 + ["c"]})
    out = top_k_rankings(df, k=3).collect()
    assert out[0]["ranking"] == ["a", "b", "c"]

    with pytest.raises(ValueError, match="k must be"):
        top_k_rankings(df, k=0)


def test_footrule_matches_brute_force_and_blocking_bound(spark):
    """Pairs sharing a top-1 item: engine footrule equals the python
    Fagin twin for every candidate pair; identical rankings score 0;
    a top-1 disagreement (footrule 2 by the bound) is excluded by
    blocking — the documented recall trade."""
    per_user = {
        1: ["x"] * 5 + ["y"] * 3 + ["z"],          # ranking x,y,z
        2: ["x"] * 4 + ["y"] * 2 + ["z"],          # ranking x,y,z (same)
        3: ["x"] * 6 + ["z"] * 3 + ["y"] * 2,      # ranking x,z,y
        4: ["y"] * 9 + ["x"] * 5 + ["z"],          # ranking y,x,z (top-1 differs)
    }
    k = 3
    df = _events(spark, per_user)
    ranks = top_k_rankings(df, k=k)
    rmap = {r["entity"]: list(r["ranking"]) for r in ranks.collect()}
    pairs = ranking_similarity_join(
        ranks, k=k, max_footrule=100, block_prefix=1
    ).collect()
    got = {(r["entity_a"], r["entity_b"]): r["footrule"] for r in pairs}
    # candidates = pairs among {1,2,3} (top-1 'x'); user 4 blocked out
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    for (ea, eb), d in got.items():
        assert d == _footrule(rmap[ea], rmap[eb], k)
    assert got[(1, 2)] == 0
    # user 4 vs 1 would have scored exactly 2 (top-2 swap) — the
    # blocking bound says only footrule <= 1 is guaranteed caught
    assert _footrule(rmap[1], rmap[4], k) == 2

    summ = ranking_join_summary(
        ranking_similarity_join(ranks, k=k, max_footrule=4), ranks
    ).collect()[0]
    assert summ["n_entities"] == 4
    assert summ["n_identical"] == 1
    assert summ["n_pairs"] == len(
        [d for d in got.values() if d <= 4]
    )

    with pytest.raises(ValueError, match="block_prefix"):
        ranking_similarity_join(ranks, k=k, max_footrule=2, block_prefix=0)
    with pytest.raises(ValueError, match="max_footrule"):
        ranking_similarity_join(ranks, k=k, max_footrule=-1)


def test_footrule_expr_default_path_duplicates_and_empty(spark):
    """ADVICE r6: the standalone helper (no precomputed maps) must not
    throw on duplicate items (first occurrence wins) or empty arrays
    (footrule 0 over an empty union)."""
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.rankjoin import (
        footrule_expr,
    )

    df = spark.createDataFrame(
        [
            (["x", "x", "y"], ["y", "x"]),
            ([], []),
            (["a"], []),
        ],
        "a array<string>, b array<string>",
    )
    rows = df.select(
        footrule_expr(F.col("a"), F.col("b"), 3).alias("d")
    ).collect()
    # row 1: union(a,b) = [x,y]; pos_a(x)=1 (first occurrence),
    # pos_a(y)=3, pos_b(x)=2, pos_b(y)=1 -> |1-2| + |3-1| = 3
    assert rows[0]["d"] == 3
    assert rows[1]["d"] == 0
    # row 3: union=[a]; pos_a=1, pos_b=k+1=4 -> 3
    assert rows[2]["d"] == 3
