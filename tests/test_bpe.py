"""BPE vocabulary induction (operators/bpe.py): histogram counts, pair
statistics, the greedy merge loop (vs a hand-traced Sennrich example),
determinism, and the Arrow-batched encoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.bpe import (
    _merge_pair,
    bpe_train,
    encode_token_counts,
    encode_word,
    pair_counts,
    word_counts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic BPE toy corpus: low/lower/newest/widest frequencies
    rows = [
        (1, " ".join(["low"] * 5)),
        (2, " ".join(["lower"] * 2)),
        (3, " ".join(["newest"] * 6)),
        (4, " ".join(["widest"] * 3)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts(corpus):
    wc = {r["word"]: r["n"] for r in word_counts(corpus).collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_pair_counts_weighted(corpus):
    pc = {
        r["pair"]: r["n_pairs"]
        for r in pair_counts(word_counts(corpus)).collect()
    }
    # 'e s' appears once in newest (6) and once in widest (3)
    assert pc["e s"] == 9
    # 'l o' in low (5) and lower (2)
    assert pc["l o"] == 7
    # 's t' in newest (6) + widest (3)
    assert pc["s t"] == 9
    # single chars of 1-char words would contribute nothing
    assert all(" " in p and len(p) == 3 for p in pc)


def test_pair_counts_top_k_deterministic(corpus):
    top = pair_counts(word_counts(corpus), top_k=2).collect()
    # both 'e s' and 's t' have 9; tie breaks on pair ascending
    assert [r["pair"] for r in top] == ["e s", "s t"]


def test_merge_pair_pass():
    assert _merge_pair(("a", "b", "a", "b", "c"), ("a", "b")) == ("ab", "ab", "c")
    # overlapping occurrences merge left-to-right
    assert _merge_pair(("a", "a", "a"), ("a", "a")) == ("aa", "a")


def test_bpe_train_matches_hand_trace(corpus):
    # Sennrich's example: with these frequencies the first merges build
    # up 'est' inside newest/widest ('e s' and 's t' tie at 9 -> 'e s'
    # first by the lexicographic tie-break, then 'es t').
    merges = bpe_train(corpus, num_merges=3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_bpe_train_deterministic(corpus):
    a = bpe_train(corpus, num_merges=8)
    b = bpe_train(corpus, num_merges=8)
    assert a == b


def test_bpe_train_stops_when_exhausted(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = bpe_train(df, num_merges=50)
    # only one possible merge exists
    assert merges == [("a", "b")]


def test_encode_word_applies_ranks():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("l", "o"): 2}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("low", ranks) == ["lo", "w"]
    assert encode_word("a", ranks) == ["a"]


def test_encode_token_counts(corpus):
    merges = bpe_train(corpus, num_merges=3)
    out = {
        r["id"]: r["n_bpe_tokens"]
        for r in encode_token_counts(corpus, merges).collect()
    }
    # doc 3 is 'newest' x6; with est merged each word is n,e,w,est = 4
    assert out[3] == 24
    # doc 1 is 'low' x5; no low-merges in the first 3 -> 3 symbols each
    assert out[1] in (5 * 3, 5 * 2)  # depends on 3rd merge
    assert set(out) == {1, 2, 3, 4}


def test_encode_no_shuffle(corpus):
    from k_means_using_mapreduce_spark.plans.explain import exchange_count

    df = encode_token_counts(corpus, [("e", "s")])
    assert exchange_count(df) == 0


def test_train_rejects_bad_num_merges(corpus):
    with pytest.raises(ValueError):
        bpe_train(corpus, num_merges=0)
