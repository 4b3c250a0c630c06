"""Unit + plan tests for operators/cleaning.py (decontamination, PII,
mixture planning, profiling). Behavioral tests use crafted in-memory
corpora with known answers; the contract queries in
contracts/cleaning_queries.py carry the oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.cleaning import (
    apply_mixture,
    decontaminate,
    eval_ngram_bloom,
    mixture_plan,
    pii_redact,
    pii_scan,
    profile_table,
)
from k_means_using_mapreduce_spark.plans import broadcast_join_count, exchange_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def contamination_corpus(spark):
    eval_df = _docs(spark, [(100, "the quick brown fox jumps over dogs", "eval")])
    train = _docs(
        spark,
        [
            # identical to the eval doc -> contamination 1.0
            (1, "the quick brown fox jumps over dogs", "a"),
            # shares a prefix -> partial overlap
            (2, "the quick brown fox eats red berries today", "a"),
            # disjoint vocabulary -> 0.0
            (3, "alpha beta gamma delta epsilon zeta eta", "b"),
        ],
    )
    return train, eval_df


def test_decontaminate_flags_overlap(spark, contamination_corpus):
    train, eval_df = contamination_corpus
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, eval_df, shingle_n=3, threshold=0.5).collect()
    }
    assert out[1]["contamination_frac"] == 1.0
    assert out[1]["is_contaminated"]
    # doc 2: 6 distinct 3-grams, 2 shared ("the quick brown","quick brown fox")
    assert out[2]["distinct_shingles"] == 6
    assert out[2]["contaminated_shingles"] == 2
    assert not out[2]["is_contaminated"]
    assert out[3]["contaminated_shingles"] == 0
    assert out[3]["contamination_frac"] == 0.0


def test_decontaminate_eval_side_broadcast(spark, contamination_corpus):
    train, eval_df = contamination_corpus
    df = decontaminate(train, eval_df)
    assert broadcast_join_count(df) >= 1


def test_eval_ngram_bloom_no_false_negatives(spark, contamination_corpus):
    train, eval_df = contamination_corpus
    bloom = eval_ngram_bloom(eval_df, expected_items=1000, fpp=0.01)
    from k_means_using_mapreduce_spark.functions.text import shingles_of, tokens
    from k_means_using_mapreduce_spark.operators.dedup import md5_int60

    eval_hashes = [
        r["h"]
        for r in eval_df.select(tokens("text").alias("t"))
        .select(F.explode(shingles_of(F.col("t"), 3)).alias("sh"))
        .select(md5_int60(F.col("sh")).alias("h"))
        .collect()
    ]
    assert eval_hashes and all(bloom.mightContain(h) for h in eval_hashes)


# --------------------------------------------------------------------------
# PII
# --------------------------------------------------------------------------

PII_TEXT = (
    "reach me at jane.doe+spam@mail.example.org or +44-020-7946-0958; "
    "server 192.168.1.250 logged order 123456789 twice"
)


def test_pii_scan_counts(spark):
    df = _docs(spark, [(1, PII_TEXT, "s")])
    row = pii_scan(df).collect()[0]
    assert row["n_email"] == 1
    assert row["n_phone"] == 1
    assert row["n_ipv4"] == 1
    # order id + the phone's 7946-0958? no: runs are 44,020,7946,0958 all <6
    assert row["n_id_number"] == 1
    assert row["pii_total"] == 4


def test_pii_redact_replaces_and_counts_once(spark):
    df = _docs(spark, [(1, PII_TEXT, "s")])
    row = pii_redact(df).collect()[0]
    red = row["redacted"]
    assert "<EMAIL>" in red and "<PHONE>" in red and "<IP>" in red and "<ID>" in red
    assert "jane.doe" not in red and "192.168" not in red
    assert row["n_redacted"] == 4


def test_pii_redact_no_double_count_inside_email(spark):
    # the digit run lives inside the email -> consumed by <EMAIL>,
    # not counted again as an id_number
    df = _docs(spark, [(1, "mail 123456789@example.com end", "s")])
    row = pii_redact(df).collect()[0]
    assert row["n_redacted"] == 1
    assert row["redacted"] == "mail <EMAIL> end"
    # but the scan (against the ORIGINAL text) sees both patterns
    srow = pii_scan(df).collect()[0]
    assert srow["n_email"] == 1 and srow["n_id_number"] == 1


def test_pii_ops_shuffle_free(spark):
    df = _docs(spark, [(1, PII_TEXT, "s")])
    assert exchange_count(pii_scan(df)) == 0
    assert exchange_count(pii_redact(df)) == 0


# --------------------------------------------------------------------------
# mixture
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mixture_corpus(spark):
    rows = [(i, "tok " * (i % 7 + 1), ["web", "code", "books"][i % 3]) for i in range(300)]
    return _docs(spark, [(i, t.strip(), s) for i, t, s in rows])


def test_mixture_plan_rates(spark, mixture_corpus):
    plan = {
        r["source"]: r
        for r in mixture_plan(
            mixture_corpus,
            weights={"web": 1.0, "code": 3.0},
            budget_frac=0.5,
        ).collect()
    }
    assert set(plan) == {"web", "code", "books"}
    assert plan["books"]["weight"] == 0.0 and plan["books"]["rate"] == 0.0
    assert all(0.0 <= p["rate"] <= 1.0 for p in plan.values())
    # code gets 3x web's target; same source_tokens by construction
    assert plan["code"]["target_tokens"] == pytest.approx(
        3 * plan["web"]["target_tokens"]
    )


def test_mixture_plan_validates_budget(spark, mixture_corpus):
    with pytest.raises(ValueError):
        mixture_plan(mixture_corpus, budget_frac=0.0)
    with pytest.raises(ValueError):
        mixture_plan(mixture_corpus, budget_frac=1.5)


def test_apply_mixture_deterministic_and_bounded(spark, mixture_corpus):
    plan = mixture_plan(mixture_corpus, budget_frac=0.4)
    kept1 = sorted(r["doc_id"] for r in apply_mixture(mixture_corpus, plan).collect())
    kept2 = sorted(r["doc_id"] for r in apply_mixture(mixture_corpus, plan).collect())
    assert kept1 == kept2  # hash sampling: retry/run stable
    assert 0 < len(kept1) < 300
    # the plan side is broadcast
    assert broadcast_join_count(apply_mixture(mixture_corpus, plan)) >= 1


# --------------------------------------------------------------------------
# profiling
# --------------------------------------------------------------------------


def test_profile_table_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "b")], "k long, v string"
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_rows"] == 4 and prof["k"]["non_null"] == 4
    assert prof["k"]["n_distinct"] == 3
    assert prof["k"]["min_value"] == "1" and prof["k"]["max_value"] == "3"
    assert prof["v"]["non_null"] == 3 and prof["v"]["n_distinct"] == 2


def test_profile_table_approx_and_validation(spark):
    df = spark.createDataFrame([(i, str(i % 5)) for i in range(100)], "k long, v string")
    prof = {r["col_name"]: r for r in profile_table(df, exact=False).collect()}
    assert prof["v"]["n_distinct"] == pytest.approx(5, abs=1)
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
