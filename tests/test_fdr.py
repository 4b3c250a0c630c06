"""operators/hypothesis.fdr_bh + hoeffding_mean_shift_p: textbook BH
example, tie stability, and the bound's monotonicity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.hypothesis import (
    fdr_bh,
    hoeffding_mean_shift_p,
)


def _ps(spark, ps):
    return spark.createDataFrame(
        [(f"h{i}", float(p)) for i, p in enumerate(ps)], "hid string, p double"
    )


def test_bh_textbook_example(spark):
    # Classic: m=5, p = .01 .02 .03 .04 .25, q = .05.
    # p_adj = .05 .05 .05 .05 .25 -> first four rejected.
    out = {
        r["hid"]: r
        for r in fdr_bh(
            _ps(spark, [0.01, 0.02, 0.03, 0.04, 0.25]), "p", q=0.05,
            tie_cols=["hid"],
        ).collect()
    }
    assert out["h0"]["p_adj"] == pytest.approx(0.05)
    assert out["h3"]["p_adj"] == pytest.approx(0.05)
    assert out["h4"]["p_adj"] == pytest.approx(0.25)
    assert [out[f"h{i}"]["rejected"] for i in range(5)] == [1, 1, 1, 1, 0]
    assert out["h0"]["rank"] == 1 and out["h4"]["rank"] == 5


def test_bh_ties_get_equal_qvalues(spark):
    out = fdr_bh(
        _ps(spark, [0.02, 0.02, 0.9]), "p", q=0.05, tie_cols=["hid"]
    ).collect()
    tied = [r["p_adj"] for r in out if r["p"] == 0.02]
    assert tied[0] == pytest.approx(tied[1])
    # q-value for the tie block: min(.02*3/1, .02*3/2, .9*3/3) = .03
    assert tied[0] == pytest.approx(0.03)


def test_bh_caps_at_one_and_drops_null(spark):
    df = spark.createDataFrame(
        [("a", 0.9), ("b", 0.95), ("c", None)], "hid string, p double"
    )
    out = fdr_bh(df, "p", q=0.1, tie_cols=["hid"]).collect()
    assert len(out) == 2  # NULL p dropped
    assert all(r["p_adj"] <= 1.0 for r in out)


def test_bh_validates_q(spark):
    with pytest.raises(ValueError):
        fdr_bh(_ps(spark, [0.5]), "p", q=1.5)


def test_hoeffding_bound_hand_value(spark):
    # groups: a = {0,10} (mean 5 = global mean -> p=1 capped),
    #         b = {0,0} (mean 0, t=5, R=10, n=2 -> 2exp(-2*2*25/100))
    rows = [("a", 0.0), ("a", 10.0), ("b", 0.0), ("b", 0.0), ("c", 10.0), ("c", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in hoeffding_mean_shift_p(df, "v", by=["g"]).collect()}
    assert out["a"]["p_bound"] == pytest.approx(1.0)
    assert out["b"]["p_bound"] == pytest.approx(2 * math.exp(-1.0))
    assert out["c"]["p_bound"] == pytest.approx(2 * math.exp(-1.0))
    assert out["b"]["n"] == 2 and out["b"]["mean_v"] == 0.0


def test_screen_feeds_fdr(spark):
    rows = [("g%d" % (i % 4), float(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = fdr_bh(
        hoeffding_mean_shift_p(df, "v", by=["g"]), "p_bound", q=0.05,
        tie_cols=["g"],
    )
    got = out.collect()
    assert len(got) == 4
    assert set(out.columns) >= {"g", "n", "mean_v", "p_bound", "rank", "p_adj", "rejected"}
