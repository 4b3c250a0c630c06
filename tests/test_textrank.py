"""operators/index.py::textrank_keywords: central words outrank
peripheral ones, min_len filtering, window-2 pairing semantics."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.index import textrank_keywords


def _ranks(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["term"]: r["rk"] for r in textrank_keywords(df, **kw).collect()}


def test_central_term_wins(spark):
    # 'pivot' co-occurs with everything; satellites only with pivot
    texts = [
        "pivot alpha pivot beta",
        "gamma pivot delta pivot",
        "pivot epsilon",
    ]
    r = _ranks(spark, texts, min_len=4, top=10)
    assert r["pivot"] == 1
    assert set(r) <= {"pivot", "alpha", "beta", "gamma", "delta", "epsilon"}


def test_min_len_filters_short_tokens(spark):
    r = _ranks(spark, ["aa bb longword otherword longword otherword"], min_len=4)
    assert "aa" not in r and "bb" not in r
    assert "longword" in r and "otherword" in r


def test_self_loops_excluded_and_single_word_docs_ok(spark):
    # doc with one qualifying token contributes no edges; repeated
    # word pairs (x, x) are dropped
    r = _ranks(spark, ["solo", "word word word", "left right left right"])
    assert set(r) == {"left", "right"}


def test_top_limits_output(spark):
    texts = [f"word{i:02d} word{(i + 1) % 30:02d}" for i in range(30)]
    r = _ranks(spark, texts, top=5)
    assert len(r) == 5
    assert sorted(r.values()) == [1, 2, 3, 4, 5]


def test_validation(spark):
    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textrank_keywords(df, min_len=0)
    with pytest.raises(ValueError):
        textrank_keywords(df, top=0)
