"""operators/selection.py (DSIR importance resampling): model shape,
weight direction, resampling semantics, determinism, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.selection import (
    dsir_log_ratio,
    dsir_log_weights,
    dsir_resample,
)

B = 64


@pytest.fixture(scope="module")
def corpora(spark):
    # target: spammy "buy pills now"-style docs; raw: mixed
    target = spark.createDataFrame(
        [(i, "buy cheap pills now buy pills") for i in range(10)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, "buy cheap pills now") for i in range(5)]
        + [(100 + i, "the quiet brown fox reads poetry") for i in range(5)],
        "doc_id long, text string",
    )
    return target, raw


def test_ratio_table_dense_and_consistent(corpora):
    target, raw = corpora
    ratio = dsir_log_ratio(target, raw, buckets=B).collect()
    assert len(ratio) == B
    assert sorted(r["bucket"] for r in ratio) == list(range(B))
    # untouched buckets share the smoothing-only log-ratio
    base = {r["log_ratio"] for r in ratio if r["target_cnt"] == 0 and r["raw_cnt"] == 0}
    assert len(base) == 1


def test_weights_separate_in_vs_out_of_distribution(corpora):
    target, raw = corpora
    ratio = dsir_log_ratio(target, raw, buckets=B)
    w = {r["doc_id"]: r for r in dsir_log_weights(raw, ratio).collect()}
    assert len(w) == 10
    # every target-like doc outweighs every fox-poetry doc
    assert min(w[i]["log_weight"] for i in range(5)) > max(
        w[100 + i]["log_weight"] for i in range(5)
    )
    assert w[0]["n_grams"] == 4 + 3  # 4 unigrams + 3 bigrams


def test_empty_text_weight_zero(spark, corpora):
    target, raw = corpora
    ratio = dsir_log_ratio(target, raw, buckets=B)
    empty = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    rows = dsir_log_weights(empty, ratio).collect()
    assert {(r["n_grams"], r["log_weight"]) for r in rows} == {(0, 0.0)}


def test_resample_deterministic_and_sized(corpora):
    target, raw = corpora
    ratio = dsir_log_ratio(target, raw, buckets=B)
    w = dsir_log_weights(raw, ratio)
    a = {r["doc_id"] for r in dsir_resample(w, k=4, seed=7).collect()}
    b = {r["doc_id"] for r in dsir_resample(w, k=4, seed=7).collect()}
    assert a == b and len(a) == 4
    # a different seed may pick a different sample, but stays valid
    c = dsir_resample(w, k=4, seed=8)
    assert c.count() == 4
    # k >= N keeps everything
    assert dsir_resample(w, k=100, seed=7).count() == 10


def test_low_temperature_is_argmax_selection(corpora):
    target, raw = corpora
    ratio = dsir_log_ratio(target, raw, buckets=B)
    w = dsir_log_weights(raw, ratio)
    got = {
        r["doc_id"]
        for r in dsir_resample(w, k=5, temperature=1e-9, seed=3).collect()
    }
    assert got == {0, 1, 2, 3, 4}  # the five target-like docs, noise-free


def test_validation(corpora):
    target, raw = corpora
    with pytest.raises(ValueError):
        dsir_log_ratio(target, raw, buckets=1)
    with pytest.raises(ValueError):
        dsir_log_ratio(target, raw, alpha=0.0)
    ratio = dsir_log_ratio(target, raw, buckets=B)
    w = dsir_log_weights(raw, ratio)
    with pytest.raises(ValueError):
        dsir_resample(w, k=0)
    with pytest.raises(ValueError):
        dsir_resample(w, k=1, temperature=0.0)
    with pytest.raises(ValueError):
        dsir_log_weights(raw, ratio.limit(1))


def test_source_ablation_identifies_harmful_source(spark):
    import pyspark.sql.functions as F

    from k_means_using_mapreduce_spark.operators.selection import (
        source_ablation,
    )

    rows = (
        [("good", 0.9)] * 50 + [("bad", 0.1)] * 10 + [("mid", 0.5)] * 40
    )
    df = spark.createDataFrame(rows, "src string, q double")
    got = {r["src"]: r for r in source_ablation(df, "src", F.col("q"), metric_name="q").collect()}
    # removing 'bad' raises the mean -> positive delta; removing 'good' lowers it
    assert got["bad"]["delta"] > 0 > got["good"]["delta"]
    # arithmetic identity: mean_rest = (ts - s)/(tn - n)
    assert got["bad"]["q_rest"] == pytest.approx((0.9 * 50 + 0.5 * 40) / 90)
    # single-source corpus: NULL rest/delta
    one = spark.createDataFrame([("only", 1.0)], "src string, q double")
    r1 = source_ablation(one, "src", F.col("q"), metric_name="q").collect()[0]
    assert r1["q_rest"] is None and r1["delta"] is None
