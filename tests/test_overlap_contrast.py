"""operators/overlap.py + contrast.py: hand-computed overlap matrices,
containment direction, log-odds sign/symmetry, and plan shape (hash
keys on the self-join, broadcast size lookups)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.contrast import (
    group_token_counts,
    log_odds_terms,
    signature_terms,
)
from k_means_using_mapreduce_spark.operators.overlap import (
    group_shingle_sets,
    overlap_matrix,
    pairwise_overlap,
)
from k_means_using_mapreduce_spark.plans.explain import (
    broadcast_join_count,
    sort_merge_join_count,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # unigram shingles would be simplest, but shingles() uses n=3
    # windows: craft docs around shared 3-token phrases
    rows = [
        ("a", "alpha beta gamma delta"),   # shingles: abg, bgd
        ("a", "alpha beta gamma"),          # abg (dup within group)
        ("b", "alpha beta gamma epsilon"),  # abg, bge
        ("c", "zeta eta theta"),            # zet (disjoint from a, b)
    ]
    return spark.createDataFrame(rows, "source string, text string")


def test_shingle_sets_are_distinct(corpus):
    sets = group_shingle_sets(corpus, "source", "text")
    # group a: {abg, bgd} — the duplicated abg collapses
    assert sets.where(F.col("grp") == "a").count() == 2
    assert sets.where(F.col("grp") == "c").count() == 1


def test_overlap_matrix_hand_computed(corpus):
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in overlap_matrix(corpus, "source").collect()
    }
    # only (a, b) share anything: |A|=2, |B|=2, inter=1 (abg)
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert (r["size_a"], r["size_b"], r["inter"]) == (2, 2, 1)
    assert r["jaccard"] == pytest.approx(1 / 3)
    assert r["containment_a_in_b"] == pytest.approx(0.5)
    assert r["containment_b_in_a"] == pytest.approx(0.5)


def test_containment_direction_asymmetric(spark):
    # A is a subset of B: containment_a_in_b = 1, b_in_a < 1
    rows = [("small", "one two three"), ("big", "one two three four five")]
    df = spark.createDataFrame(rows, "source string, text string")
    r = overlap_matrix(df, "source").collect()[0]
    small_first = r["grp_a"] == "big"  # 'big' < 'small' lexically
    assert small_first
    # big has shingles {123,234,345}, small {123}: inter=1
    assert r["containment_b_in_a"] == pytest.approx(1.0)  # small in big
    assert r["containment_a_in_b"] == pytest.approx(1 / 3)


def test_overlap_plan_broadcasts_sizes(corpus):
    plan = overlap_matrix(corpus, "source")
    assert broadcast_join_count(plan) >= 2  # both size lookups
    assert sort_merge_join_count(plan) <= 1  # only the sh self-join


def test_log_odds_sign_and_symmetry(spark):
    # two groups, one token each + one shared token: each group's own
    # token must score positive, the other group's negative; with
    # symmetric counts the z-scores mirror
    rows = [("g1", "apple apple shared"), ("g2", "banana banana shared")]
    df = spark.createDataFrame(rows, "source string, text string")
    scored = {
        (r["grp"], r["token"]): r
        for r in log_odds_terms(
            group_token_counts(df), prior_strength=10.0
        ).collect()
    }
    # only OBSERVED (group, token) pairs are scored — sparse by design
    assert ("g2", "apple") not in scored
    assert scored[("g1", "apple")]["z"] > 0
    assert scored[("g1", "apple")]["z"] == pytest.approx(
        scored[("g2", "banana")]["z"]
    )
    # the shared token is symmetric across the two equal-size groups
    assert scored[("g1", "shared")]["z"] == pytest.approx(
        scored[("g2", "shared")]["z"]
    )
    # a token fully concentrated in one group (y_rest=0) stays finite
    # thanks to the prior mass
    assert math.isfinite(scored[("g1", "apple")]["delta"])


def test_signature_terms_top_k_and_rank(spark):
    rows = [
        ("g1", "apple apple apple pear"),
        ("g2", "banana banana pear pear"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = signature_terms(df, k=1, prior_strength=10.0).collect()
    top = {r["grp"]: r["token"] for r in out}
    assert top == {"g1": "apple", "g2": "banana"}
    assert all(r["rank"] == 1 for r in out)


def test_validation_errors(spark):
    df = spark.createDataFrame([("g", "a b c")], "source string, text string")
    with pytest.raises(ValueError):
        signature_terms(df, k=0)
    with pytest.raises(ValueError):
        log_odds_terms(group_token_counts(df), prior_strength=0.0)
