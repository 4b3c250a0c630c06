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


# --------------------------------------------------------------------------
# property tests (hypothesis) + streaming compatibility
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_text_st = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), whitelist_characters="@.+-"
    ),
    max_size=120,
)


@given(texts=st.lists(_text_st, min_size=1, max_size=8))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pii_redact_idempotent(spark, texts):
    """Redacting already-redacted text is a no-op: replacement tokens
    contain no characters any PII rule matches."""
    df = _docs(spark, [(i, t, "s") for i, t in enumerate(texts)])
    once = pii_redact(df).select(
        F.col("doc_id"), F.col("redacted").alias("text"), F.lit("s").alias("source")
    )
    twice = pii_redact(once).collect()
    first = {r["doc_id"]: r["redacted"] for r in pii_redact(df).collect()}
    for r in twice:
        assert r["redacted"] == first[r["doc_id"]]
        assert r["n_redacted"] == 0


@given(
    weights=st.dictionaries(
        st.sampled_from(["web", "code", "books"]),
        st.floats(min_value=0.1, max_value=10.0, allow_nan=False),
        min_size=1,
    ),
    budget=st.floats(min_value=0.05, max_value=1.0),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mixture_plan_invariants(spark, weights, budget):
    df = _docs(
        spark,
        [(i, "w " * (i % 5 + 1), ["web", "code", "books"][i % 3]) for i in range(60)],
    )
    rows = mixture_plan(df, weights=weights, budget_frac=budget).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["rate"] <= 1.0
        # a source kept whole never exceeds its own size; otherwise the
        # expected kept tokens equal the target
        assert r["rate"] * r["source_tokens"] <= r["source_tokens"] + 1e-9
    total_target = sum(r["target_tokens"] for r in rows)
    total_tokens = sum(r["source_tokens"] for r in rows)
    assert total_target == pytest.approx(budget * total_tokens, rel=1e-9)


def test_pii_redact_works_on_streams(spark, tmp_path):
    """The PII projection is stateless, so it must run unchanged under
    Structured Streaming (the batch/stream shared-kernel doctrine of
    streaming/kmeans_stream.py)."""
    src = str(tmp_path / "in")
    df = _docs(spark, [(1, PII_TEXT, "s"), (2, "no pii here", "s")])
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = pii_redact(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("pii_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["doc_id"]: r for r in spark.sql("select * from pii_stream_test").collect()}
    assert rows[1]["n_redacted"] == 4 and "<EMAIL>" in rows[1]["redacted"]
    assert rows[2]["n_redacted"] == 0


# --------------------------------------------------------------------------
# raw text ingestion + heavy hitters + streaming decontamination
# --------------------------------------------------------------------------


def test_load_text_corpus_wholetext_and_lines(spark, tmp_path):
    from k_means_using_mapreduce_spark.sources.loaders import load_text_corpus

    d = tmp_path / "web"
    d.mkdir()
    (d / "a.txt").write_text("alpha beta gamma")
    (d / "b.txt").write_text("one\ntwo\nthree")

    whole = load_text_corpus(spark, str(d), wholetext=True).collect()
    assert len(whole) == 2
    assert {r["source"] for r in whole} == {"web"}
    texts = {r["text"] for r in whole}
    assert "alpha beta gamma" in texts
    assert len({r["doc_id"] for r in whole}) == 2

    lines = load_text_corpus(spark, str(d), wholetext=False).collect()
    assert sorted(r["text"] for r in lines) == [
        "alpha beta gamma", "one", "three", "two",
    ]
    assert len({r["doc_id"] for r in lines}) == 4
    # determinism: same ids on re-read
    again = load_text_corpus(spark, str(d), wholetext=False).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in lines}


def test_heavy_hitter_grams_match_exact_when_tracked(spark):
    from k_means_using_mapreduce_spark.functions.text import shingles_of, tokens
    from k_means_using_mapreduce_spark.operators.repetition import heavy_hitter_grams

    # top-4 bigram counts strictly separated (10, 9, 5, 4) so the
    # sketch's arbitrary tie-break at the count-1 tail can't matter
    docs = _docs(
        spark, [(1, "x y " * 10 + "p q " * 5 + "r s", "s")]
    )
    approx = heavy_hitter_grams(docs, n=2, k=4).collect()
    exact = (
        docs.select(F.explode(shingles_of(tokens("text"), 2)).alias("g"))
        .groupBy("g").count().orderBy(F.desc("count"), F.asc("g")).limit(4).collect()
    )
    # all items tracked -> sketch counts are exact, same ranked set
    assert [(r["gram"], r["approx_count"]) for r in approx] == [
        (r["g"], r["count"]) for r in exact
    ]
    assert [r["rank"] for r in approx] == [1, 2, 3, 4]


def test_decontaminate_works_on_streams(spark, tmp_path, contamination_corpus):
    """Decontamination is a broadcast join + agg — runs under
    Structured Streaming in complete/update mode with a static eval
    side."""
    train, eval_df = contamination_corpus
    src = str(tmp_path / "stream_in")
    train.write.parquet(src)
    stream = spark.readStream.schema(train.schema).parquet(src)
    out = decontaminate(stream, eval_df, shingle_n=3, threshold=0.5)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("decon_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        r["doc_id"]: r for r in spark.sql("select * from decon_stream_test").collect()
    }
    assert rows[1]["is_contaminated"] and rows[3]["contaminated_shingles"] == 0


def test_apply_mixture_works_on_streams(spark, tmp_path, mixture_corpus):
    """The mixture filter is a broadcast join + deterministic hash
    predicate — stream-compatible with a static plan side, and the
    streamed sample equals the batch sample exactly."""
    plan = mixture_plan(mixture_corpus, budget_frac=0.4)
    batch_ids = sorted(
        r["doc_id"] for r in apply_mixture(mixture_corpus, plan).collect()
    )
    src = str(tmp_path / "mix_in")
    mixture_corpus.write.parquet(src)
    stream = spark.readStream.schema(mixture_corpus.schema).parquet(src)
    out = apply_mixture(stream, plan)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("mix_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    stream_ids = sorted(
        r["doc_id"] for r in spark.sql("select doc_id from mix_stream_test").collect()
    )
    assert stream_ids == batch_ids


def test_mixture_plan_degenerate_inputs_defined(spark, mixture_corpus):
    """Review regression: a weights dict matching no observed source
    must yield all-zero rates (empty sample), not DIVIDE_BY_ZERO; a
    zero-token source gets rate 0."""
    rows = mixture_plan(
        mixture_corpus, weights={"no_such_source": 1.0}, budget_frac=0.5
    ).collect()
    assert rows and all(r["rate"] == 0.0 and r["target_tokens"] == 0.0 for r in rows)
    empty_src = _docs(spark, [(1, "tok", "web"), (2, "  ", "hollow")])
    plan = {r["source"]: r for r in mixture_plan(empty_src, budget_frac=0.5).collect()}
    assert plan["hollow"]["source_tokens"] == 0 and plan["hollow"]["rate"] == 0.0


def test_eval_ngram_bloom_sizes_from_actual_items(spark, contamination_corpus):
    _, eval_df = contamination_corpus
    bloom = eval_ngram_bloom(eval_df)  # no expected_items: size from data
    # 5 shingles -> a few hundred bits, not the old 1M-item default
    assert bloom.m < 1000
    override = eval_ngram_bloom(eval_df, expected_items=100_000)
    assert override.m > bloom.m


def test_decontaminate_bloom_equals_exact(spark, contamination_corpus):
    """The Bloom-prefiltered path returns row-for-row the same result
    as plain decontaminate (no false negatives by construction; false
    positives only route a doc through the exact join)."""
    from k_means_using_mapreduce_spark.operators.cleaning import decontaminate_bloom

    train, eval_df = contamination_corpus
    exact = sorted(
        map(tuple, decontaminate(train, eval_df, shingle_n=3, threshold=0.5).collect())
    )
    bloomed = sorted(
        map(
            tuple,
            decontaminate_bloom(
                train, eval_df, shingle_n=3, threshold=0.5
            ).collect(),
        )
    )
    assert bloomed == exact


def test_decontaminate_bloom_larger_corpus(spark):
    """On a corpus where most docs share nothing with the eval set, the
    bloom path still agrees with the exact operator."""
    from k_means_using_mapreduce_spark.operators.cleaning import decontaminate_bloom

    eval_df = _docs(spark, [(900, "mark these exact words as contaminated now", "e")])
    train = _docs(
        spark,
        [(i, f"doc {i} about topic{i % 17} with words w{i} w{i+1} w{i+2} end", "s")
         for i in range(120)]
        + [(500, "mark these exact words as contaminated now", "s")],
    )
    exact = sorted(map(tuple, decontaminate(train, eval_df).collect()))
    bloomed = sorted(map(tuple, decontaminate_bloom(train, eval_df).collect()))
    assert bloomed == exact
    flagged = [r for r in bloomed if r[4]]
    assert [r[0] for r in flagged] == [500]


def test_temperature_alpha_one_is_flat_budget(spark, mixture_corpus):
    """alpha=1: weight = share, so target = budget x tt x share =
    budget x source_tokens — every source's rate IS budget_frac (the
    natural distribution, uniformly downsampled)."""
    from k_means_using_mapreduce_spark.operators.cleaning import (
        temperature_mixture_plan,
    )

    plan = temperature_mixture_plan(
        mixture_corpus, alpha=1.0, budget_frac=0.4
    ).collect()
    for r in plan:
        assert r["rate"] == pytest.approx(0.4, rel=1e-9)


def test_temperature_flattens_toward_tail(spark):
    """Low alpha upweights rare sources: the dominant source's rate
    drops below budget_frac, the rare source saturates at 1.0, and
    shares sum to 1."""
    from k_means_using_mapreduce_spark.operators.cleaning import (
        temperature_mixture_plan,
    )

    rows = [(i, "tok " * 10, "big" if i < 280 else "small") for i in range(300)]
    docs = _docs(spark, [(i, t.strip(), s) for i, t, s in rows])
    plan = {
        r["source"]: r
        for r in temperature_mixture_plan(
            docs, alpha=0.1, budget_frac=0.5
        ).collect()
    }
    assert sum(r["share"] for r in plan.values()) == pytest.approx(1.0)
    assert plan["small"]["rate"] == 1.0  # no-upsampling cap
    assert plan["big"]["rate"] < 0.5  # head pays for the flattened tail
    # weights are share^alpha: monotone but compressed
    assert plan["big"]["weight"] > plan["small"]["weight"]
    assert (
        plan["big"]["weight"] / plan["small"]["weight"]
        < plan["big"]["share"] / plan["small"]["share"]
    )


def test_temperature_validation_and_apply(spark, mixture_corpus):
    from k_means_using_mapreduce_spark.operators.cleaning import (
        temperature_mixture_plan,
    )

    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture_plan(mixture_corpus, alpha=0.0)
    with pytest.raises(ValueError, match="budget_frac"):
        temperature_mixture_plan(mixture_corpus, budget_frac=1.5)
    plan = temperature_mixture_plan(mixture_corpus, alpha=0.5, budget_frac=0.5)
    kept = apply_mixture(mixture_corpus, plan, key="doc_id")
    # the plan feeds apply_mixture unchanged and keeps a nonempty,
    # strictly-downsampled corpus
    n = kept.count()
    assert 0 < n < mixture_corpus.count()


def test_profile_drift_closed_form(spark):
    from k_means_using_mapreduce_spark.operators.cleaning import (
        numeric_profile,
        profile_drift,
    )
    import pytest as _pt

    old = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0), (None, 5.0)], "x double, c double"
    )
    new = spark.createDataFrame(
        [(3.0, 5.0), (4.0, 5.0), (5.0, 5.0), (6.0, 5.0)], "x double, c double"
    )
    prof = {r["col_name"]: r for r in numeric_profile(old, ["x", "c"]).collect()}
    assert prof["x"]["non_null"] == 3 and prof["x"]["mean"] == _pt.approx(2.0)
    assert prof["x"]["p50"] == _pt.approx(2.0)
    drift = {r["col_name"]: r for r in profile_drift(old, new, ["x", "c"]).collect()}
    x = drift["x"]
    assert x["null_rate_old"] == _pt.approx(0.25)
    assert x["null_rate_delta"] == _pt.approx(-0.25)
    assert x["mean_shift_sigmas"] == _pt.approx((4.5 - 2.0) / 1.0)  # std_old=1
    # constant column: shift in sigmas undefined, not infinite
    assert drift["c"]["mean_shift_sigmas"] is None
    assert drift["c"]["std_ratio"] is None
    with _pt.raises(ValueError, match="columns"):
        numeric_profile(old, [])


def test_psi_drift_behavior(spark):
    from k_means_using_mapreduce_spark.operators.cleaning import psi_drift
    import pytest as _pt
    from pyspark.sql import functions as SF

    base = spark.range(0, 1000).select(SF.col("id").cast("double").alias("v"))
    same = psi_drift(base, base, "v", bins=10)
    rows = same.collect()
    assert len(rows) == 10
    assert sum(r["psi_term"] for r in rows) == _pt.approx(0.0, abs=1e-12)
    assert all(r["n_old"] == r["n_new"] for r in rows)
    # shifted population concentrates in the top bins -> PSI large
    shifted = spark.range(0, 1000).select(
        (SF.col("id").cast("double") * 0.2 + 900).alias("v")
    )
    psi = sum(r["psi_term"] for r in psi_drift(base, shifted, "v", bins=10).collect())
    assert psi > 0.25  # "shifted" on the standard rule of thumb
    with _pt.raises(ValueError, match="bins"):
        psi_drift(base, base, "v", bins=1)
    empty = base.where(SF.lit(False))
    with _pt.raises(ValueError, match="no non-null"):
        psi_drift(empty, base, "v")


def test_k_anonymity_report_closed_form(spark):
    from k_means_using_mapreduce_spark.operators.cleaning import (
        k_anonymity_report,
    )
    import pytest as _pt

    rows = [("a", 1)] * 12 + [("a", 2)] * 3 + [("b", None)] * 2
    df = spark.createDataFrame(rows, "t string, b int")
    r = k_anonymity_report(df, ["t", "b"], k=10).first()
    assert r["n_groups"] == 3
    assert r["violating_groups"] == 2  # (a,2)=3 and (b,NULL)=2
    assert r["violating_rows"] == 5
    assert r["max_violating_n"] == 3
    clean = k_anonymity_report(df.where("t = 'a' and b = 1"), ["t"], k=10).first()
    assert clean["violating_groups"] == 0 and clean["max_violating_n"] == 0
    with _pt.raises(ValueError, match="k must"):
        k_anonymity_report(df, ["t"], k=1)


def test_wasserstein_shifted_uniform_is_the_shift(spark):
    from k_means_using_mapreduce_spark.operators.cleaning import (
        wasserstein_to_global,
    )

    # group a: uniform on {0..9}; group b: the same + 10. The global
    # is the 50/50 mixture; each group's W1 to the mixture is half the
    # shift = 5.0
    rows = [("a", float(i)) for i in range(10)]
    rows += [("b", float(i) + 10.0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r["w1"]
        for r in wasserstein_to_global(df, "v", "g", quantize=None).collect()
    }
    assert out["a"] == pytest.approx(5.0)
    assert out["b"] == pytest.approx(5.0)


def test_wasserstein_identical_groups_zero(spark):
    from k_means_using_mapreduce_spark.operators.cleaning import (
        wasserstein_to_global,
    )

    rows = [(g, float(i % 7)) for g in ("a", "b") for i in range(21)]
    df = spark.createDataFrame(rows, "g string, v double")
    for r in wasserstein_to_global(df, "v", "g", quantize=None).collect():
        assert r["w1"] == pytest.approx(0.0, abs=1e-12)
        assert r["n"] == 21


def test_wasserstein_quantize_guard(spark):
    import pytest as _p

    from k_means_using_mapreduce_spark.operators.cleaning import (
        wasserstein_to_global,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with _p.raises(ValueError):
        wasserstein_to_global(df, "v", "g", quantize=-1)


def test_t_closeness_identical_and_skewed_classes(spark):
    """A class matching the global distribution has EMD 0; a class
    with all mass on the extreme value has the maximal cumulative gap;
    hand-computed EMD matches; m=1 degenerate is 0, and guards raise."""
    from k_means_using_mapreduce_spark.operators.cleaning import (
        t_closeness_report,
    )

    # global values {0,1,2}; class A mirrors global exactly, class B
    # concentrates on value 2.
    rows = (
        [("A", v) for v in (0, 0, 1, 1, 2, 2)]
        + [("B", 2)] * 6
    )
    df = spark.createDataFrame(rows, "q string, v int")
    # global: counts 2,2,8 over 12 -> cum (1/6, 1/3, 1)
    # class A: cum (1/3, 2/3, 1); gaps |1/3-1/6| + |2/3-1/3| = 1/2
    # EMD_A = (1/2)/2 = 1/4; class B: cum (0,0,1);
    # gaps 1/6 + 1/3 -> EMD_B = (1/2)/2 = 1/4
    r = t_closeness_report(df, ["q"], "v", t=0.3).collect()[0]
    assert r["n_groups"] == 2
    assert r["violating_groups"] == 0
    assert r["max_emd"] == pytest.approx(0.25)
    r = t_closeness_report(df, ["q"], "v", t=0.2).collect()[0]
    assert r["violating_groups"] == 2 and r["violating_rows"] == 12

    # one global value: EMD defined as 0 for every class
    df1 = spark.createDataFrame(
        [("A", 7), ("B", 7)], "q string, v int"
    )
    r = t_closeness_report(df1, ["q"], "v", t=0.1).collect()[0]
    assert r["max_emd"] == 0.0 and r["violating_groups"] == 0

    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_report(df, [], "v")
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        t_closeness_report(df, ["q"], "v", t=1.0)


def test_mondrian_generalize_median_cuts_and_k_floor(spark):
    """A 40-row grid: depth-1 cuts at the lower median of attr 1;
    deeper cuts respect the k floor (no leaf below k); leaf ranges
    partition the space; a k too large for any cut returns the root."""
    from k_means_using_mapreduce_spark.operators.cleaning import (
        mondrian_generalize,
    )

    rows = [(float(i % 10), float(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "x double, h double")
    out = {
        r["cell"]: r
        for r in mondrian_generalize(df, ["x", "h"], k=5, depth=2).collect()
    }
    # every leaf >= k
    assert all(r["n"] >= 5 for r in out.values())
    assert sum(r["n"] for r in out.values()) == 40
    # depth-1 split on x at the lower median: x in 0..9 uniform,
    # lower median = 4.0 -> left gets x <= 4 (20 rows)
    left_cells = [c for c in out if c.startswith("rL")]
    assert all(out[c]["max_a1"] <= 4.0 for c in left_cells)
    right_cells = [c for c in out if c.startswith("rR")]
    assert all(out[c]["min_a1"] > 4.0 for c in right_cells)

    root = mondrian_generalize(df, ["x", "h"], k=30, depth=3).collect()
    assert len(root) == 1 and root[0]["cell"] == "r" and root[0]["n"] == 40

    with pytest.raises(ValueError, match="2-attribute"):
        mondrian_generalize(df, ["x"], k=5)
    with pytest.raises(ValueError, match="k must be"):
        mondrian_generalize(df, ["x", "h"], k=1)


def test_mondrian_axis_stuck_recovers_on_next_round(spark):
    """Attribute 1 constant (axis stuck, no valid cut) must not stop
    the recursion: round 2 still cuts on attribute 2."""
    from k_means_using_mapreduce_spark.operators.cleaning import (
        mondrian_generalize,
    )

    rows = [(1.0, float(i % 8)) for i in range(32)]
    df = spark.createDataFrame(rows, "x double, h double")
    out = mondrian_generalize(df, ["x", "h"], k=4, depth=2).collect()
    assert len(out) == 2  # one h-cut happened despite the stuck x axis
    assert {r["cell"] for r in out} == {"rL", "rR"}
