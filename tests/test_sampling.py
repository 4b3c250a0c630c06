"""Deterministic hash-sampling invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(10_000).withColumnRenamed("id", "key").cache()


def test_sample_deterministic_and_sized(ids):
    a = {r["key"] for r in hash_sample(ids, "key", keep=10).collect()}
    b = {r["key"] for r in hash_sample(ids, "key", keep=10).collect()}
    assert a == b  # rerun identical
    assert 0.07 < len(a) / 10_000 < 0.13  # ~10%

    # repartitioning must not change membership (the rand() failure mode)
    c = {
        r["key"]
        for r in hash_sample(ids.repartition(13), "key", keep=10).collect()
    }
    assert a == c


def test_sample_nested_subsets(ids):
    # keep=5 sample ⊂ keep=10 sample (bucket < 5 implies bucket < 10)
    small = {r["key"] for r in hash_sample(ids, "key", keep=5).collect()}
    big = {r["key"] for r in hash_sample(ids, "key", keep=10).collect()}
    assert small <= big


def test_split_disjoint_exhaustive(ids):
    out = train_test_split(ids, "key", test_pct=20)
    counts = dict(
        (r["split"], r["n"])
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert counts["test"] + counts["train"] == 10_000
    assert 0.16 < counts["test"] / 10_000 < 0.24


def test_bucket_range_and_validation(ids, spark):
    mx = ids.select(F.max(hash_bucket("key", 7)).alias("m")).collect()[0]["m"]
    assert 0 <= mx < 7
    with pytest.raises(ValueError):
        hash_bucket("key", 0)
    with pytest.raises(ValueError):
        hash_sample(ids, "key", keep=0)
    with pytest.raises(ValueError):
        train_test_split(ids, "key", test_pct=100)


def test_stratified_consistent_with_hash_sample(spark, sf_small):
    """A stratum at rate r keeps exactly the hash_sample(keep=r) rows."""
    from k_means_using_mapreduce_spark.operators.sampling import (
        hash_sample,
        stratified_hash_sample,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    strat = stratified_hash_sample(
        docs, "doc_id", "source", {"src0": 30}, default_keep=0
    )
    direct = hash_sample(docs.filter("source = 'src0'"), "doc_id", keep=30)
    assert sorted(r["doc_id"] for r in strat.collect()) == sorted(
        r["doc_id"] for r in direct.collect()
    )


def test_stratified_rejects_bad_rates(spark, sf_small):
    import pytest

    from k_means_using_mapreduce_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    with pytest.raises(ValueError, match="out of range"):
        stratified_hash_sample(docs, "doc_id", "source", {"src0": 101})
    with pytest.raises(ValueError, match="default_keep"):
        stratified_hash_sample(docs, "doc_id", "source", {}, default_keep=-1)


# ---------------------------------------------------------------- A-ES


def test_weighted_sample_matches_python_recomputation(spark):
    """The Spark A-ES selection equals a driver-side recomputation of
    the same md5 -> uniform -> ln(u)/w priorities (exact parity with
    the hash family the oracle SQL also uses)."""
    import hashlib
    import math

    from k_means_using_mapreduce_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [
        (g, i, float(1 + (i * 7) % 13))
        for g in ("a", "b", "c")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "grp string, key int, w double")
    got = {
        (r["grp"], r["key"])
        for r in weighted_sample_per_group(df, "grp", "key", "w", k=4).collect()
    }

    def priority(key: int, w: float) -> float:
        h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
        return math.log((h + 1.0) / float(1 << 60)) / w

    want = set()
    for g in ("a", "b", "c"):
        grp = [(g, i, priority(i, float(1 + (i * 7) % 13))) for i in range(50)]
        grp.sort(key=lambda t: (-t[2], t[1]))
        want |= {(g, i) for g, i, _ in grp[:4]}
    assert got == want


def test_weighted_sample_determinism_size_and_exclusions(spark):
    from k_means_using_mapreduce_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = (
        [("g1", i, 1.0) for i in range(20)]
        + [("g2", 100 + i, 0.0) for i in range(5)]  # all ineligible
        + [("g3", 200, 2.5), ("g3", 201, None)]  # one eligible
    )
    df = spark.createDataFrame(rows, "grp string, key int, w double")
    out = weighted_sample_per_group(df, "grp", "key", "w", k=3)
    rows1 = sorted((r["grp"], r["key"]) for r in out.collect())
    rows2 = sorted(
        (r["grp"], r["key"])
        for r in weighted_sample_per_group(
            df.repartition(7), "grp", "key", "w", k=3
        ).collect()
    )
    assert rows1 == rows2  # retry/repartition-stable
    by_grp = {}
    for g, k in rows1:
        by_grp.setdefault(g, []).append(k)
    assert len(by_grp.get("g1", [])) == 3
    assert "g2" not in by_grp  # zero weights can never win
    assert by_grp.get("g3") == [200]  # null weight excluded

    with pytest.raises(ValueError):
        weighted_sample_per_group(df, "grp", "key", "w", k=0)


def test_weighted_sample_favors_heavy_rows(spark):
    """Across many 2-row groups with weights 400:1, the heavy row must
    win k=1 in the overwhelming majority (deterministic given md5)."""
    from k_means_using_mapreduce_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = []
    for g in range(300):
        rows.append((g, g * 2, 400.0))  # heavy: even keys
        rows.append((g, g * 2 + 1, 1.0))
    df = spark.createDataFrame(rows, "grp int, key int, w double")
    picked = weighted_sample_per_group(df, "grp", "key", "w", k=1).collect()
    heavy_wins = sum(1 for r in picked if r["key"] % 2 == 0)
    assert len(picked) == 300
    assert heavy_wins >= 280  # E[wins] ≈ 300·(400/401)


def test_weighted_sample_duplicate_keys_stable_multiset(spark):
    """Duplicate key values in a group tie on (priority, key); the
    content tie-break must make the selected MULTISET independent of
    partitioning (round-3 advice). Rows that are exact duplicates
    remain interchangeable, which is value-identical by definition."""
    from k_means_using_mapreduce_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [("g", "dup", 1.0, v) for v in ["x", "y", "z"]] + [
        ("g", f"k{i}", 1.0, "p") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "grp string, key string, w double, payload string")

    def picked(d):
        return sorted(
            (r["key"], r["payload"])
            for r in weighted_sample_per_group(d, "grp", "key", "w", k=4).collect()
        )

    base = picked(df.repartition(1))
    for nparts in (2, 7):
        assert picked(df.repartition(nparts)) == base
    assert len(base) == 4


def test_hash_ring_negatives_shape_and_determinism(spark):
    """Every id draws exactly k negatives, no self-pairs, and the
    pairing is invariant under repartitioning; a different salt yields
    a different ring order."""
    from k_means_using_mapreduce_spark.operators.sampling import (
        hash_ring_negatives,
    )

    df = spark.range(50).withColumnRenamed("id", "key")
    out = hash_ring_negatives(df, "key", k=3)
    rows = out.collect()
    assert len(rows) == 150
    per_id = {}
    for r in rows:
        assert r["id"] != r["neg_id"]
        per_id.setdefault(r["id"], set()).add((r["slot"], r["neg_id"]))
    assert all(len(v) == 3 for v in per_id.values())

    base = sorted((r["id"], r["slot"], r["neg_id"]) for r in rows)
    again = sorted(
        (r["id"], r["slot"], r["neg_id"])
        for r in hash_ring_negatives(df.repartition(7), "key", k=3).collect()
    )
    assert again == base

    other = sorted(
        (r["id"], r["slot"], r["neg_id"])
        for r in hash_ring_negatives(df, "key", k=3, salt="epoch2").collect()
    )
    assert other != base

    with pytest.raises(ValueError):
        hash_ring_negatives(df, "key", k=0)


def test_hash_ring_negatives_rejects_k_ge_ring_size(spark):
    from k_means_using_mapreduce_spark.operators.sampling import (
        hash_ring_negatives,
    )

    ids = spark.createDataFrame([(i,) for i in range(1, 4)], "id long")
    # valid: every id gets exactly k negatives, no self-pairs
    out = hash_ring_negatives(ids, "id", k=2).collect()
    assert len(out) == 6
    assert all(r["id"] != r["neg_id"] for r in out)
    per = {}
    for r in out:
        per.setdefault(r["id"], set()).add(r["neg_id"])
    assert all(len(v) == 2 for v in per.values())
    # invalid: k >= ring size would wrap onto self-pairs
    import pytest

    with pytest.raises(ValueError, match="self-pairs"):
        hash_ring_negatives(ids, "id", k=3)


def test_hash_ring_negatives_dedups_ids_and_guards_distinct(spark):
    """Duplicate input ids must neither fool the k-guard (row count vs
    ring size) nor appear twice on the ring (self-pair negatives)."""
    import pytest as _p

    from k_means_using_mapreduce_spark.operators.sampling import (
        hash_ring_negatives,
    )

    dup = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",)], "id string"
    )
    # 5 rows but only 3 distinct ids: k=3 must be rejected
    with _p.raises(ValueError, match="distinct"):
        hash_ring_negatives(dup, "id", k=3)
    out = hash_ring_negatives(dup, "id", k=2).collect()
    assert len(out) == 6  # 3 distinct ids x exactly k
    for r in out:
        assert r["id"] != r["neg_id"]


def test_neyman_allocation_favors_variable_strata(spark):
    """Two equal-size strata, one constant and one variable: Neyman
    sends (almost) the whole budget to the variable stratum while
    proportional splits evenly; allocations sum to the budget."""
    from k_means_using_mapreduce_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = [("flat", 5.0)] * 50 + [
        ("wild", float(10 * (i % 7))) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "s string, v double")
    out = {
        r["stratum"]: r
        for r in neyman_allocation(df, "s", "v", total_n=100).collect()
    }
    assert out["flat"]["stddev"] == 0.0
    assert out["flat"]["alloc_neyman"] == pytest.approx(0.0)
    assert out["wild"]["alloc_neyman"] == pytest.approx(100.0)
    assert out["flat"]["alloc_proportional"] == pytest.approx(50.0)
    total = sum(r["alloc_neyman"] for r in out.values())
    assert total == pytest.approx(100.0)

    # all-constant corpus: falls back to proportional
    dfc = spark.createDataFrame(
        [("a", 1.0)] * 30 + [("b", 2.0)] * 10, "s string, v double"
    )
    out = {
        r["stratum"]: r
        for r in neyman_allocation(dfc, "s", "v", total_n=40).collect()
    }
    assert out["a"]["alloc_neyman"] == pytest.approx(30.0)
    assert out["b"]["alloc_neyman"] == pytest.approx(10.0)

    with pytest.raises(ValueError, match="total_n"):
        neyman_allocation(df, "s", "v", total_n=0)
