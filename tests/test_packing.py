"""Chunking / packing operator semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.packing import (
    chunk_documents,
    pack_documents,
    pack_summary,
)


def test_chunking_splits_and_keeps_remainder(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(7))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["chunk_seq"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=3).collect()
    )
    assert out == [
        (1, 0, "t0 t1 t2", 3),
        (1, 1, "t3 t4 t5", 3),
        (1, 2, "t6", 1),  # remainder chunk, unpadded
        (2, 0, "a b", 2),
        # doc 3 (no tokens) absent
    ]


def test_chunking_reassembles_to_original_tokens(spark, sf_small):
    """Lossless: concatenating each doc's chunks in order recovers the
    doc's full token stream."""
    from k_means_using_mapreduce_spark.functions.text import tokens
    from k_means_using_mapreduce_spark.sources.loaders import load_table

    docs = load_table(spark, sf_small, "documents")
    rebuilt = (
        chunk_documents(docs, chunk_tokens=32)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("chunk_seq", "chunk_text"))
                        ),
                        lambda s: F.split(s["chunk_text"], " "),
                    )
                ),
                " ",
            ).alias("joined")
        )
    )
    orig = docs.select(
        "doc_id", F.array_join(tokens("text"), " ").alias("joined")
    ).where(F.length("joined") > 0)
    assert rebuilt.join(orig, "doc_id").where(
        rebuilt.joined != orig.joined
    ).count() == 0
    assert rebuilt.count() == orig.count()


def test_packing_fills_bins_in_order(spark):
    # one shard → strictly sequential fill; budget 10
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(0, 4), (1, 4), (2, 4), (3, 9), (4, 1)]],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bin"] for r in pack_documents(df, 10, shards=1).collect()}
    # pre-sums: 0,4,8,12,21 → bins 0,0,0,1,2
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2}


def test_packing_deterministic_and_sharded(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_documents(df, 16, shards=4).collect()))
    b = sorted(map(tuple, pack_documents(df, 16, shards=4).collect()))
    assert a == b
    assert {r[1] for r in a} == {0, 1, 2, 3}  # shard = doc_id mod 4


def test_pack_summary_overflow_bound(spark):
    """Each bin exceeds the budget by less than its last document:
    total_tokens - budget < max single-doc tokens for every overflowing
    bin (the streaming-packing bound)."""
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (i * 13 % 29 + 1))) for i in range(60)],
        "doc_id long, text string",
    )
    packed = pack_documents(df, 32, shards=2)
    summ = pack_summary(packed).collect()
    max_doc = 29
    assert all(r["total_tokens"] < 32 + max_doc for r in summ)
    # every doc accounted for exactly once
    assert sum(r["n_docs"] for r in summ) == 60


def test_packing_validates_args(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="budget_tokens"):
        pack_documents(df, 0)
    with pytest.raises(ValueError, match="shards"):
        pack_documents(df, 10, shards=0)
    from k_means_using_mapreduce_spark.operators.packing import chunk_documents as cd

    with pytest.raises(ValueError, match="chunk_tokens"):
        cd(df, chunk_tokens=0)


# ---------------- epoch shuffle ----------------


def test_epoch_shuffle_deterministic_and_seed_sensitive(spark):
    from k_means_using_mapreduce_spark.operators.packing import epoch_shuffle

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
    )
    a = sorted(
        (r["doc_id"], r["shard"], r["epoch_pos"])
        for r in epoch_shuffle(df, seed=1, shards=4).collect()
    )
    b = sorted(
        (r["doc_id"], r["shard"], r["epoch_pos"])
        for r in epoch_shuffle(df, seed=1, shards=4).collect()
    )
    assert a == b  # same seed → identical permutation, every run
    c = sorted(
        (r["doc_id"], r["shard"], r["epoch_pos"])
        for r in epoch_shuffle(df, seed=2, shards=4).collect()
    )
    assert a != c  # new seed → new permutation


def test_epoch_shuffle_is_a_permutation_with_balanced_shards(spark):
    from k_means_using_mapreduce_spark.operators.packing import epoch_shuffle

    df = spark.createDataFrame(
        [(i, "x") for i in range(400)], "doc_id long, text string"
    )
    rows = epoch_shuffle(df, seed=7, shards=4).collect()
    assert len(rows) == 400
    assert len({r["doc_id"] for r in rows}) == 400  # every row exactly once
    # (shard, epoch_pos) is a dense unique order key
    pos = {(r["shard"], r["epoch_pos"]) for r in rows}
    assert len(pos) == 400
    per_shard = {}
    for r in rows:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + 1
    assert set(per_shard) == {0, 1, 2, 3}
    for n in per_shard.values():
        assert n >= 400 // 4 * 0.5  # hash-uniform, no empty/hot shard
    # epoch_pos dense within each shard: 1..n
    for s, n in per_shard.items():
        ps = sorted(p for sh, p in pos if sh == s)
        assert ps == list(range(1, n + 1))


def test_epoch_shuffle_single_exchange(spark):
    from k_means_using_mapreduce_spark.operators.packing import epoch_shuffle
    from k_means_using_mapreduce_spark.plans import exchange_count

    df = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id long, text string"
    )
    out = epoch_shuffle(df, seed=3, shards=4)
    assert exchange_count(out) == 1


def test_epoch_shuffle_validation(spark):
    import pytest

    from k_means_using_mapreduce_spark.operators.packing import epoch_shuffle

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        epoch_shuffle(df, seed=1, shards=0)
