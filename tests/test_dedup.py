"""Dedup operators on planted duplicates: the contract corpus has no
exact dups, so recall/precision semantics are proven here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    other = "spark shuffles hash partitions across executors with adaptive plans"
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, base.upper()),              # normalized dup of 1
        (4, near),                      # near dup of 1
        (5, other),
        (6, "completely different text about nothing in particular at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r["n_copies"] for r in D.dedup_exact(docs).collect()}
    assert out[1] == 2          # 1 and 2 collapse
    assert 2 not in out
    assert out[3] == 1          # case differs → distinct for exact
    assert len(out) == 5


def test_normalized_dedup(docs):
    out = {r["doc_id"]: r["n_copies"] for r in D.dedup_exact_normalized(docs).collect()}
    assert out[1] == 3          # 1, 2, and case-folded 3 collapse
    assert len(out) == 4


def test_minhash_candidates_find_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(docs, num_hashes=12, bands=6).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) in pairs or (2, 4) in pairs  # near-dup caught by some band
    assert not any(5 in p or 6 in p for p in pairs)


def test_jaccard_exact_verifier(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0  # tokens lowercased
    assert 0.5 <= pairs[(1, 4)] < 1.0
    assert not any(5 in k or 6 in k for k in pairs)


def test_simhash_hamming_close_for_near_dups(docs, spark):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sh[1] == sh[2] == sh[3]
    ham_near = bin(sh[1] ^ sh[4]).count("1")
    ham_far = bin(sh[1] ^ sh[5]).count("1")
    assert ham_near < ham_far


def test_simhash_near_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_pairs(docs, max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
    assert not any((5 in k and 6 in k) for k in pairs)


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
        (4, [-1.0, 0.0, 0.0]),     # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in D.embedding_near_dup(df, threshold=0.98).collect()}
    assert pairs == {(1, 2)}


def test_embedding_near_dup_bucketed_matches_exact_within_bucket(spark):
    rows = [(i, [float(i % 2) * 10 + d * 0.001, 1.0]) for i, d in
            [(1, 1), (2, 2), (3, 1), (4, 2)]]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(1, [0.0, 1.0]), (2, [10.0, 1.0])]
    exact = {(r["id_a"], r["id_b"]) for r in D.embedding_near_dup(df, threshold=0.999).collect()}
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_near_dup_bucketed(df, cents, threshold=0.999).collect()
    }
    assert bucketed <= exact
    # same-bucket pairs must all be found
    assert (2, 4) in bucketed and (1, 3) in bucketed


def test_embedding_near_dup_gemm_matches_crossjoin(spark, sf_small):
    """The blocked-GEMM pair kernel must produce the exact pair set of
    the cross-join baseline, with cosines equal to fp noise (<1e-12)."""
    from k_means_using_mapreduce_spark.operators.dedup import (
        embedding_near_dup,
        embedding_near_dup_gemm,
    )

    df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    ref = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup(df, threshold=0.30).collect()
    }
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_gemm(
            df, threshold=0.30, block_size=64
        ).collect()
    }
    assert set(ref) == set(got)
    assert max(abs(ref[k] - got[k]) for k in ref) < 1e-12


def test_embedding_near_dup_gemm_empty(spark):
    from k_means_using_mapreduce_spark.operators.dedup import (
        embedding_near_dup_gemm,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_near_dup_gemm(empty).count() == 0


def test_dedup_incremental_semantics(spark):
    from k_means_using_mapreduce_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(100, "Seen Before!"), (101, "old news")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "seen   before"),   # normalizes to corpus doc 100 → dropped
            (2, "fresh thing"),
            (3, "FRESH thing"),     # in-batch dup of 2 → collapsed, id 2 wins
            (4, "another new one"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["n_copies_in_batch"])
        for r in dedup_incremental(batch, corpus).collect()
    )
    assert out == [(2, 2), (4, 1)]


def test_containment_catches_asymmetric_pairs(spark):
    """A short doc quoted whole inside a long one: Jaccard is low but
    containment(A->B) is 1.0 — the Broder resemblance-vs-containment
    distinction containment_pairs exists for."""
    from k_means_using_mapreduce_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long_ = (
        short
        + " one two three four five six seven eight nine ten "
        + "eleven twelve thirteen fourteen fifteen sixteen"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    cont = containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert row["containment_a"] == 1.0  # every shingle of A is in B
    assert row["containment_b"] < 0.5
    # symmetric jaccard at the same bar finds nothing
    assert jaccard_pairs(df, threshold=0.9).count() == 0


def test_gemm_empty_block_no_duplicate_pairs(spark):
    """Regression: when hashing leaves a block EMPTY, off-diagonal
    groups arrive with only 'a' rows; inferring self-pair mode from
    emptiness would re-emit the diagonal group's pairs. The diag flag
    must prevent that — every pair appears exactly once."""
    from k_means_using_mapreduce_spark.operators.dedup import (
        embedding_near_dup_gemm,
    )

    # 3 identical vectors, block_size=1 -> 3 blocks; with 3 ids the
    # hash very likely leaves some block empty (and the test is valid
    # either way: pair multiplicity must be exactly 1).
    rows = [(i, [1.0, 0.0]) for i in range(1, 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = [
        (r.id_a, r.id_b)
        for r in embedding_near_dup_gemm(df, threshold=0.99, block_size=1).collect()
    ]
    assert sorted(pairs) == [(1, 2), (1, 3), (2, 3)]


def test_pairs_from_bucketed_gemm_matches_expression_pairs(spark, sf_small):
    """The per-cluster GEMM membership kernel must reproduce the
    expression join's pair set on the bucketed space, across block
    sizes that do and don't tile."""
    from k_means_using_mapreduce_spark.contract_constants import (
        EMBEDDING_CENTROIDS,
    )
    from k_means_using_mapreduce_spark.operators.dedup import (
        bucketed_features,
        pairs_from_bucketed,
        pairs_from_bucketed_gemm,
    )

    df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    b = bucketed_features(df, EMBEDDING_CENTROIDS).localCheckpoint()
    ref = {
        (r.id_a, r.id_b) for r in pairs_from_bucketed(b, 0.30).collect()
    }
    for bs in (4096, 37, 1):
        got = [
            (r.id_a, r.id_b)
            for r in pairs_from_bucketed_gemm(b, 0.30, block_size=bs).collect()
        ]
        assert len(got) == len(set(got)), f"duplicate pairs at block_size={bs}"
        assert set(got) == ref, f"pair set mismatch at block_size={bs}"
