"""Behavioral tests for winnowing fingerprints (operators/winnow.py)
and hashing-trick classifier scoring (operators/classifier.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.classifier import (
    pseudo_weights,
    score_documents,
)
from k_means_using_mapreduce_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)
from k_means_using_mapreduce_spark.plans import broadcast_join_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED_RUN = "one two three four five six seven eight nine ten"


@pytest.fixture(scope="module")
def plagiarism_corpus(spark):
    return _docs(
        spark,
        [
            (1, f"intro alpha beta {SHARED_RUN} closing words here"),
            (2, f"different opening text {SHARED_RUN} and another ending"),
            (3, "completely unrelated vocabulary nothing matches at all ever"),
        ],
    )


def test_winnow_local_containment_guarantee(spark, plagiarism_corpus):
    """Schleimer et al. Thm: a shared token run of length >= window+k-1
    (here 4+3-1=6 < 10) forces at least one identical fingerprint."""
    pairs = winnow_pairs(plagiarism_corpus, k=3, window=4, min_shared=1).collect()
    keys = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in keys
    assert not any(3 in k for k in keys)


def test_winnow_short_doc_still_fingerprints(spark):
    # 4 tokens -> 2 3-grams < window=4 -> single partial window, 1 fp
    df = _docs(spark, [(1, "just four tokens here")])
    fps = winnow_fingerprints(df, k=3, window=4).collect()
    assert len(fps) == 1


def test_winnow_density_near_expected(spark):
    """Expected selected density is ~2/(window+1) on random-ish text
    (paper §4); allow generous slack for a small sample."""
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(10_000)}" for _ in range(800)]
    df = _docs(spark, [(1, " ".join(words))])
    n_fp = winnow_fingerprints(df, k=3, window=4).count()
    n_grams = 800 - 2
    density = n_fp / n_grams
    assert 0.2 < density < 0.6  # 2/(4+1) = 0.4


def test_winnow_validates_window(spark, plagiarism_corpus):
    with pytest.raises(ValueError):
        winnow_fingerprints(plagiarism_corpus, window=0)


# --------------------------------------------------------------------------
# classifier
# --------------------------------------------------------------------------


def _expected_z(text: str, dim: int, weights: dict[int, float], bias: float) -> float:
    z = bias
    for tok in text.lower().split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        z += weights.get(h % dim, 0.0)
    return z


def test_score_documents_matches_manual(spark):
    docs = _docs(spark, [(1, "good great text"), (2, "bad awful words"), (3, "")])
    dim = 64
    wdf = pseudo_weights(spark, dim=dim)
    wmap = {r["idx"]: r["w"] for r in wdf.collect()}
    out = {
        r["doc_id"]: r
        for r in score_documents(docs, wdf, dim=dim, bias=0.25).collect()
    }
    assert len(out) == 3
    for doc_id, text in [(1, "good great text"), (2, "bad awful words")]:
        assert out[doc_id]["z"] == pytest.approx(
            _expected_z(text, dim, wmap, 0.25), rel=1e-12
        )
    # empty doc present at z = bias
    assert out[3]["z"] == pytest.approx(0.25)
    for r in out.values():
        assert 0.0 < r["prob"] < 1.0
        assert r["keep"] == (r["prob"] >= 0.5)


def test_score_documents_missing_weights_are_zero(spark):
    docs = _docs(spark, [(1, "alpha beta gamma")])
    # empty weight table -> every feature contributes 0 -> z = bias
    empty_w = spark.createDataFrame([], "idx long, w double")
    row = score_documents(docs, empty_w, dim=32, bias=-1.5).collect()[0]
    assert row["z"] == pytest.approx(-1.5)
    assert row["keep"] is False


def test_score_documents_weights_broadcast(spark):
    docs = _docs(spark, [(1, "alpha beta gamma")])
    wdf = pseudo_weights(spark, dim=128)
    assert broadcast_join_count(score_documents(docs, wdf, dim=128)) >= 1


def test_score_documents_validates_dim(spark):
    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        score_documents(docs, pseudo_weights(spark, dim=8), dim=0)


def test_tf_weighting_counts_repeats(spark):
    """A token appearing 3x contributes 3x its weight (tf, not set)."""
    docs = _docs(spark, [(1, "word"), (2, "word word word")])
    dim = 16
    wdf = pseudo_weights(spark, dim=dim)
    out = {r["doc_id"]: r["z"] for r in score_documents(docs, wdf, dim=dim).collect()}
    assert out[2] == pytest.approx(3 * out[1], rel=1e-12)


# --------------------------------------------------------------------------
# property: the winnowing guarantee on random corpora
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_K, _W = 3, 4
_GUARANTEE = _W + _K - 1  # shared token run length that forces a shared fp

_word = st.integers(min_value=0, max_value=50).map(lambda i: f"t{i}")
_prefix = st.lists(_word, min_size=0, max_size=12)
_run = st.lists(_word, min_size=_GUARANTEE, max_size=_GUARANTEE + 4)


@given(run=_run, pre_a=_prefix, suf_a=_prefix, pre_b=_prefix, suf_b=_prefix)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winnow_guarantee_on_random_texts(spark, run, pre_a, suf_a, pre_b, suf_b):
    """Schleimer et al. §3: any shared contiguous run of >= w+k-1
    tokens yields >= 1 identical selected fingerprint in both docs —
    for ANY surrounding context."""
    a = " ".join(pre_a + run + suf_a)
    b = " ".join(pre_b + run + suf_b)
    df = _docs(spark, [(1, a), (2, b)])
    fps = winnow_fingerprints(df, k=_K, window=_W)
    shared = (
        fps.where(F.col("doc_id") == 1)
        .select("fp")
        .intersect(fps.where(F.col("doc_id") == 2).select("fp"))
        .count()
    )
    assert shared >= 1


def test_score_documents_null_text_scores_bias(spark):
    """Review regression: NULL text = empty bag at z = bias, present in
    the output (was silently dropped)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           score_documents(docs, pseudo_weights(spark, dim=16), dim=16, bias=0.5).collect()}
    assert set(out) == {1, 2}
    assert out[2]["z"] == pytest.approx(0.5)


def test_winnow_summary_consistent_with_fingerprints(spark, plagiarism_corpus):
    """The one-pass summary equals the compose-it-yourself form."""
    from k_means_using_mapreduce_spark.operators.winnow import winnow_summary

    summ = {r["doc_id"]: r for r in winnow_summary(plagiarism_corpus).collect()}
    fps = winnow_fingerprints(plagiarism_corpus)
    n_fp = {
        r["doc_id"]: r["n"]
        for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(summ) == set(n_fp)
    for doc_id, row in summ.items():
        assert row["n_fingerprints"] == n_fp[doc_id]
        assert row["n_grams"] >= row["n_fingerprints"]
        assert row["density"] == pytest.approx(
            row["n_fingerprints"] / row["n_grams"]
        )
