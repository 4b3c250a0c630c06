"""Log-rank (operators/survival.py) and diff-in-differences
(operators/hypothesis.py): hand-checked evidence accounting."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.hypothesis import diff_in_diff
from k_means_using_mapreduce_spark.operators.survival import log_rank_test


def test_logrank_identical_groups_zero(spark):
    rows = [(g, d, 1) for g in ("a", "b") for d in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, duration int, event int")
    r = log_rank_test(df, "g", "duration", "event", group_a="a", group_b="b").first()
    assert r["o_minus_e"] == pytest.approx(0.0)
    assert r["chi2"] == pytest.approx(0.0)
    assert (r["n_a"], r["events_a"]) == (4, 4)


def test_logrank_separated_groups_large_chi2(spark):
    rows = [("a", d, 1) for d in (1, 2, 3, 4, 5)] + [
        ("b", d, 1) for d in (10, 11, 12, 13, 14)
    ]
    df = spark.createDataFrame(rows, "g string, duration int, event int")
    r = log_rank_test(df, "g", "duration", "event", group_a="a", group_b="b").first()
    # group a dies strictly first: strong negative-vs-expected evidence
    assert r["chi2"] > 5
    assert r["z"] > 0  # a has MORE events than expected early on


def test_logrank_hand_first_time_term(spark):
    # a={1 event}, b={2 censored}: only time 1 contributes:
    # n=3, n_a=1, d=1 -> E_a=1/3, V=(1/3)(2/3)(2/2)=2/9
    rows = [("a", 1, 1), ("b", 2, 0), ("b", 2, 0)]
    df = spark.createDataFrame(rows, "g string, duration int, event int")
    r = log_rank_test(df, "g", "duration", "event", group_a="a", group_b="b").first()
    assert r["o_minus_e"] == pytest.approx(1 - 1 / 3)
    assert r["var"] == pytest.approx(2 / 9)


def test_logrank_all_censored_zero_evidence(spark):
    rows = [("a", 5, 0), ("b", 7, 0)]
    df = spark.createDataFrame(rows, "g string, duration int, event int")
    r = log_rank_test(df, "g", "duration", "event", group_a="a", group_b="b").first()
    assert (r["events_a"], r["events_b"]) == (0, 0)
    assert r["o_minus_e"] == 0.0 and r["var"] == 0.0
    assert r["chi2"] is None and r["z"] is None


def test_did_hand_values(spark):
    # ctrl: 10 -> 12 (+2); treat: 20 -> 27 (+7) => DID = 5
    rows = (
        [(0, 0, 10.0 + d) for d in (-1.0, 0.0, 1.0)]
        + [(0, 1, 12.0 + d) for d in (-1.0, 0.0, 1.0)]
        + [(1, 0, 20.0 + d) for d in (-1.0, 0.0, 1.0)]
        + [(1, 1, 27.0 + d) for d in (-1.0, 0.0, 1.0)]
    )
    df = spark.createDataFrame(rows, "treat int, post int, v double")
    r = diff_in_diff(df, "treat", "post", "v").first()
    assert r["ctrl_pre"] == pytest.approx(10.0)
    assert r["treat_post"] == pytest.approx(27.0)
    assert r["did"] == pytest.approx(5.0)
    # each cell: sample var 1, n=3 -> se = sqrt(4/3)
    assert r["se"] == pytest.approx((4 / 3) ** 0.5)
    assert r["z"] == pytest.approx(5.0 / (4 / 3) ** 0.5)
