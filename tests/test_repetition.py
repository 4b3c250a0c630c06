"""Repetition / novelty operator semantics."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.repetition import (
    repetition_stats,
    shingle_novelty,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b a b"),          # 2-grams: ab,ba,ab,ba,ab → heavy repeat
        (2, "one two three four"),    # all distinct
        (3, "x x x x"),               # single repeated token
        (4, ""),                      # no tokens → absent from output
        (5, "solo"),                  # 1 token < n → whole-text shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_fracs(docs):
    out = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    # doc1: grams = [a b, b a, a b, b a, a b] → 5 total, 2 distinct
    assert out[1]["n_grams"] == 5 and out[1]["distinct_grams"] == 2
    assert out[1]["dup_gram_frac"] == pytest.approx(3 / 5)
    assert out[1]["top_gram_frac"] == pytest.approx(3 / 5)
    assert out[1]["top_gram"] == "a b"
    # doc2: 3 distinct 2-grams, no repeats
    assert out[2]["dup_gram_frac"] == 0.0 and out[2]["top_gram_frac"] == pytest.approx(1 / 3)
    # doc3: "x x" ×3 → fully repetitive
    assert out[3]["dup_gram_frac"] == pytest.approx(2 / 3)
    assert out[3]["top_gram"] == "x x"
    # doc4 absent; doc5 degenerates to its whole text
    assert 4 not in out
    assert out[5]["n_grams"] == 1 and out[5]["top_gram"] == "solo"


def test_repetition_top_gram_tiebreak_lexicographic(spark):
    df = spark.createDataFrame(
        [(1, "b a b a")],  # grams: "b a","a b","b a" → wait: b a, a b, b a
        "doc_id long, text string",
    )
    row = repetition_stats(df, n=2).first()
    # counts: "b a"×2, "a b"×1 → unique max, no tie; now force a tie:
    df2 = spark.createDataFrame([(1, "b a c a")], "doc_id long, text string")
    row2 = repetition_stats(df2, n=2).first()
    # grams: "b a","a c","c a" — all count 1 → tie broken to lexicographic min
    assert row2["top_gram"] == "a c"
    assert row["top_gram"] == "b a"


def test_novelty_fracs(spark):
    df = spark.createDataFrame(
        [
            (1, "p q r s"),        # shingles: "p q r","q r s"
            (2, "p q r t"),        # shares "p q r" with doc1
            (3, "u v w x y"),      # fully unique
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in shingle_novelty(df, shingle_n=3).collect()}
    assert out[1]["distinct_shingles"] == 2
    assert out[1]["novel_frac"] == pytest.approx(1 / 2)  # "q r s" unique
    assert out[2]["novel_frac"] == pytest.approx(1 / 2)  # "q r t" unique
    assert out[3]["novel_frac"] == 1.0


def test_novelty_counts_distinct_within_doc_once(spark):
    # the same shingle repeated WITHIN one doc must not make it corpus-common
    df = spark.createDataFrame(
        [(1, "m n o m n o"), (2, "z z z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in shingle_novelty(df, shingle_n=3).collect()}
    # doc1 shingles (distinct): "m n o","n o m","o m n" — none in doc2
    assert out[1]["novel_frac"] == 1.0
    assert out[2]["novel_frac"] == 1.0
