"""Text-analysis function semantics (parity with the oracle is covered
by test_entry_oracle; these pin the intended behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.functions import text as T


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "The quick brown fox and the lazy dog"),
        (2, "der hund und die katze ist nicht hier"),
        (3, "le chat est une belle surprise pour nous"),
        (4, "xyzzy plugh"),
        (5, "los datos y el modelo es un problema de verdad"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df, col, doc_id):
    return df.filter(F.col("doc_id") == doc_id).select(col.alias("v")).first()["v"]


def test_token_count(df):
    assert _one(df, T.token_count("text"), 1) == 8


def test_tokens_lowercased(df):
    assert _one(df, T.tokens("text"), 1)[0] == "the"


def test_stopword_count_counts_repeats(df):
    assert _one(df, T.stopword_count("text", ["the"]), 1) == 2


def test_lang_id(df):
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", T.lang_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "unknown"
    assert got[5] == "es"


def test_quality_score_bounds(df):
    scores = [r["q"] for r in df.select(T.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO ... world")],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    sh = df.select(T.shingles("text", 3).alias("s")).first()["s"]
    assert sh == ["only two"]


def test_bpe_ish_token_count(spark):
    # "hello" → ceil(5/4)=2, "hi" → 1, "abcdefgh" → 2
    df = spark.createDataFrame([(1, "hello hi abcdefgh")], "doc_id long, text string")
    assert df.select(T.bpe_ish_token_count("text").alias("n")).first()["n"] == 5


def test_empty_text_semantics(spark):
    """Round-1 ADVICE: empty/whitespace-only text must yield 0 tokens,
    defined (non-NULL) quality, alpha_ratio 0.0 for '', empty shingles."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        T.tokens("text").alias("toks"),
        T.token_count("text").alias("n"),
        T.bpe_ish_token_count("text").alias("bpe"),
        T.mean_token_len("text").alias("mtl"),
        T.alpha_ratio("text").alias("ar"),
        T.quality_score("text").alias("q"),
        T.shingles("text", 3).alias("sh"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    for i in (1, 2):
        assert by_id[i]["toks"] == []
        assert by_id[i]["n"] == 0
        assert by_id[i]["bpe"] == 0
        assert by_id[i]["mtl"] is None
        assert by_id[i]["q"] is not None and 0.0 <= by_id[i]["q"] <= 1.0
        assert by_id[i]["sh"] == []
    assert by_id[1]["ar"] == 0.0
    assert by_id[2]["ar"] == 1.0  # spaces count as alpha-or-space chars
    assert by_id[3]["n"] == 2 and by_id[3]["sh"] == ["one two"]
