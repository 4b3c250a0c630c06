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
