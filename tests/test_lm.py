"""operators/lm.py: smoothed model mass, OOV handling on new batches,
score ordering (gibberish scores below typical text), plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.lm import (
    fit_unigram_model,
    score_documents,
)
from k_means_using_mapreduce_spark.plans.explain import sort_merge_join_count


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "the cat sat on the mat") for i in range(1, 5)]
    rows.append((5, "the dog sat"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_probabilities_sum_below_one(corpus):
    model = fit_unigram_model(corpus).collect()
    total_mass = sum(math.exp(r["logprob"]) for r in model)
    # the missing mass is exactly the reserved unknown share
    assert 0 < total_mass < 1
    n = sum(r["n"] for r in model)
    v = len(model)
    assert total_mass == pytest.approx((n + v) / (n + v + 1))


def test_model_counts_and_ranking(corpus):
    model = {r["token"]: r for r in fit_unigram_model(corpus).collect()}
    assert model["the"]["n"] == 9
    assert model["dog"]["n"] == 1
    assert model["the"]["logprob"] > model["dog"]["logprob"]


def test_scores_rank_typical_above_gibberish(spark, corpus):
    model = fit_unigram_model(corpus)
    batch = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zyx qwv jkl")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in score_documents(batch, model).collect()}
    assert out[10]["avg_logprob"] > out[11]["avg_logprob"]
    assert out[10]["n_tokens"] == 3


def test_oov_uses_reserved_mass(spark, corpus):
    model = fit_unigram_model(corpus)
    rows = model.collect()
    n = sum(r["n"] for r in rows)
    v = len(rows)
    expected_unk = math.log(1.0 / (n + (v + 1.0)))
    batch = spark.createDataFrame([(10, "zzzz")], "doc_id long, text string")
    out = score_documents(batch, model).collect()[0]
    assert out["avg_logprob"] == pytest.approx(expected_unk)


def test_tokenless_docs_omitted(spark, corpus):
    model = fit_unigram_model(corpus)
    batch = spark.createDataFrame([(10, "   ")], "doc_id long, text string")
    assert score_documents(batch, model).count() == 0


def test_validation(corpus):
    with pytest.raises(ValueError):
        fit_unigram_model(corpus, alpha=0)
    with pytest.raises(ValueError):
        score_documents(corpus, fit_unigram_model(corpus), alpha=-1)


def test_scoring_broadcasts_model(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    out = score_documents(docs, fit_unigram_model(docs))
    out.collect()
    assert sort_merge_join_count(out) == 0  # |vocab|-row model: broadcast


def test_source_divergence(spark):
    import math as m

    from k_means_using_mapreduce_spark.operators.lm import source_divergence

    rows = [
        # sources a and b have IDENTICAL distributions -> corpus matches
        # both -> KL = 0 for each
        (1, "x x y", "a"),
        (2, "x x y", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in source_divergence(df).collect()}
    for s in ("a", "b"):
        assert out[s]["kl_corpus"] == pytest.approx(0.0, abs=1e-12)
        # H([2/3, 1/3])
        expect = -(2 / 3) * m.log(2 / 3) - (1 / 3) * m.log(1 / 3)
        assert out[s]["entropy"] == pytest.approx(expect)
        assert out[s]["n_tokens"] == 3

    skew = spark.createDataFrame(
        [(1, "x x x x", "a"), (2, "y y y y", "b")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_divergence(skew).collect()}
    # each source is a point mass, corpus is 50/50 -> KL = ln 2
    for s in ("a", "b"):
        assert out[s]["kl_corpus"] == pytest.approx(m.log(2))
        assert out[s]["entropy"] == pytest.approx(0.0, abs=1e-12)


def test_bigram_model_counts_and_margins(spark):
    from k_means_using_mapreduce_spark.operators.lm import fit_bigram_model

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a")], "doc_id long, text string"
    )
    big = {(r["w1"], r["w2"]): r for r in fit_bigram_model(df).collect()}
    assert big[("a", "b")]["n12"] == 2 and big[("a", "b")]["n1"] == 2
    assert big[("b", "c")]["n12"] == 1
    # single-token doc contributes no pairs
    assert all(k[0] != "a" or k[1] in ("b",) for k in big)


def test_bigram_scoring_prefers_seen_transitions(spark):
    from k_means_using_mapreduce_spark.operators.lm import (
        fit_bigram_model,
        fit_unigram_model,
        score_documents_bigram,
    )

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    big, uni = fit_bigram_model(corpus), fit_unigram_model(corpus)
    batch = spark.createDataFrame(
        [(10, "the cat sat"),      # fluent: every transition seen
         (11, "cat the on sat"),   # same words, unseen transitions
         (12, "zz qq")],           # full OOV
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_logprob"]
           for r in score_documents_bigram(batch, big, uni).collect()}
    assert out[10] > out[11] > out[12]
    with pytest.raises(ValueError):
        score_documents_bigram(batch, big, uni, lam=1.0)


def test_collocations_exact_pmi(spark):
    """Hand-computed PMI on a 4-bigram corpus, plus min_count pruning."""
    import math

    from k_means_using_mapreduce_spark.operators.lm import collocations

    docs = spark.createDataFrame(
        [("a b",), ("a b",), ("a c",), ("d b",)], "text string"
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in collocations(docs, min_count=1).collect()
    }
    # bigrams: (a,b)x2 (a,c)x1 (d,b)x1; N=4; n1: a=3 d=1; n2: b=3 c=1
    assert set(rows) == {("a", "b"), ("a", "c"), ("d", "b")}
    ab = rows[("a", "b")]
    assert (ab["n12"], ab["n1"], ab["n2"]) == (2, 3, 3)
    assert ab["pmi"] == pytest.approx(math.log(2 * 4 / (3 * 3)))
    dc = rows[("d", "b")]
    assert dc["pmi"] == pytest.approx(math.log(1 * 4 / (1 * 3)))
    # min_count prunes hapax pairs (whose PMI is maximal and useless)
    pruned = collocations(docs, min_count=2)
    assert [
        (r["w1"], r["w2"]) for r in pruned.collect()
    ] == [("a", "b")]

    with pytest.raises(ValueError, match="min_count"):
        collocations(docs, min_count=0)


def test_kneser_ney_closed_form_and_normalization(spark):
    """Hand-checkable corpus + the KN normalization law: for every
    observed context w1, Σ_w2 P_KN(w2|w1) over ALL words (observed
    pairs + backoff for unseen) equals 1."""
    import pytest as _pt

    from k_means_using_mapreduce_spark.operators.lm import (
        kneser_ney_bigrams,
    )

    D = 0.75
    df = spark.createDataFrame(
        [("a b a b",), ("a c",)], "text string"
    )
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> types: 3; n1(a)=3, n1(b)=1
    # succ types: a->{b,c}=2, b->{a}=1; pred types: b<-{a}=1, a<-{b}=1, c<-{a}=1
    rows = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigrams(df, discount=D).collect()
    }
    p_ab = rows[("a", "b")]["p_kn"]
    assert p_ab == _pt.approx((2 - D) / 3 + (D * 2 / 3) * (1 / 3))
    assert rows[("b", "a")]["p_kn"] == _pt.approx((1 - D) / 1 + (D * 1 / 1) * (1 / 3))
    # normalization: observed pairs + unseen backoff mass sum to 1 per context
    pcont = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    for w1, n1, t1 in [("a", 3, 2), ("b", 1, 1)]:
        observed = sum(
            r["p_kn"] for (x, _), r in rows.items() if x == w1
        )
        unseen = sum(
            (D * t1 / n1) * pcont[w2]
            for w2 in pcont
            if (w1, w2) not in rows
        )
        assert observed + unseen == _pt.approx(1.0, abs=1e-12)
    with _pt.raises(ValueError, match="discount"):
        kneser_ney_bigrams(df, discount=1.0)


def test_score_documents_kn_backoff_branches(spark):
    """Held-out text exercises all four probability branches; scores
    stay finite and ordered (in-domain text scores higher than
    unseen-vocabulary text)."""
    import math

    import pytest as _pt

    from k_means_using_mapreduce_spark.operators.lm import (
        kneser_ney_bigrams,
        score_documents_kn,
    )

    train = spark.createDataFrame([("a b a b a c",)], "text string")
    kn = kneser_ney_bigrams(train, discount=0.75)
    test = spark.createDataFrame(
        [
            (1, "a b a b"),     # all pairs observed
            (2, "b c"),         # unseen pair, known context + known w2
            (3, "zzz a"),       # unknown context
            (4, "zzz qqq"),     # nothing known -> floor
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in score_documents_kn(test, kn, discount=0.75).collect()
    }
    for r in got.values():
        assert math.isfinite(r["avg_logprob"])
        assert r["n_tokens"] == 2 or r["doc_id"] == 1
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"] > got[4]["avg_logprob"]
    assert got[4]["avg_logprob"] < math.log(1e-9)  # floor territory
    with _pt.raises(ValueError, match="unseen_floor"):
        score_documents_kn(test, kn, unseen_floor=0.0)


def test_zipf_fit_exact_power_law(spark):
    from k_means_using_mapreduce_spark.operators.lm import zipf_fit

    # construct a corpus whose token frequencies are freq_r = 64/r for
    # ranks 1,2,4,8,...: exact slope -1 on the log-log line
    words = []
    for i in range(1, 7):  # freq_i = 60 / i at rank i: exact Zipf
        words += [f"w{i}"] * (60 // i)
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    out = zipf_fit(df).collect()[0]
    assert out["vocab"] == 6
    assert out["slope"] == pytest.approx(-1.0)
    assert out["r2"] == pytest.approx(1.0)


def test_zipf_fit_min_count_and_degenerate(spark):
    import pytest as _p

    from k_means_using_mapreduce_spark.operators.lm import zipf_fit

    df = spark.createDataFrame(
        [(0, "a a a b")], "doc_id long, text string"
    )
    out = zipf_fit(df, min_count=2).collect()[0]
    assert out["vocab"] == 1  # 'b' trimmed
    assert out["slope"] is None  # single point: undefined
    with _p.raises(ValueError):
        zipf_fit(df, min_count=0)


def test_spectral_loading_is_dominant_eigenvector(spark):
    import numpy as np

    from k_means_using_mapreduce_spark.operators.lm import (
        spectral_token_loading,
    )

    # two word communities with heavy in-community adjacency; the
    # dominant eigenvector concentrates on the denser community
    docs = []
    for i in range(30):
        docs.append((i, "alpha beta alpha beta alpha beta"))
    for i in range(30, 40):
        docs.append((i, "gamma delta gamma delta"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["token"]: r["loading"]
        for r in spectral_token_loading(df, iters=8, min_count=2).collect()
    }
    # Perron-Frobenius: all loadings non-negative; unit norm
    assert all(v >= 0 for v in out.values())
    assert sum(v * v for v in out.values()) == pytest.approx(1.0)

    # numpy reference on the same PPMI matrix (built from the operator
    # contract: collocations clipped at 0, symmetrized)
    from k_means_using_mapreduce_spark.operators.lm import collocations

    col = collocations(df, min_count=2).collect()
    toks = sorted(out)
    idx = {t: i for i, t in enumerate(toks)}
    M = np.zeros((len(toks), len(toks)))
    for r in col:
        m = max(r["pmi"], 0.0)
        if m > 0 and r["w1"] in idx and r["w2"] in idx:
            M[idx[r["w1"]], idx[r["w2"]]] += m
            M[idx[r["w2"]], idx[r["w1"]]] += m
    v = np.ones(len(toks))
    for _ in range(8):
        v = M @ v
        v = v / np.linalg.norm(v)
    for t in toks:
        assert out[t] == pytest.approx(v[idx[t]], abs=1e-9)


def test_spectral_loading_guards(spark):
    import pytest as _p

    from k_means_using_mapreduce_spark.operators.lm import (
        spectral_token_loading,
    )

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with _p.raises(ValueError):
        spectral_token_loading(df, iters=0)
    # nothing survives min_count: empty result, no crash
    assert spectral_token_loading(df, min_count=5).count() == 0


def test_vocab_growth_monotone_and_totals(spark):
    from k_means_using_mapreduce_spark.operators.lm import vocab_growth

    # vocabulary stops growing after the early docs: growth saturates
    docs = [(i, "alpha beta gamma") for i in range(20)]
    docs += [(100 + i, f"word{i} alpha") for i in range(20)]  # debuts late
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = vocab_growth(df, milestones=4).orderBy("milestone").collect()
    assert [r["milestone"] for r in out] == [1, 2, 3, 4]
    toks = [r["cum_tokens"] for r in out]
    typs = [r["cum_types"] for r in out]
    assert toks == sorted(toks) and typs == sorted(typs)
    assert out[-1]["cum_tokens"] == 20 * 3 + 20 * 2
    assert out[-1]["cum_types"] == 3 + 20
    assert sum(r["n_docs"] for r in out) == 40
    import pytest as _p

    with _p.raises(ValueError):
        vocab_growth(df, milestones=1)
