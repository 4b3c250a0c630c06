"""operators/encode.py WOE/IV: hand-computed smoothing, direction,
IV aggregation."""

from __future__ import annotations

import math

import pytest

from k_means_using_mapreduce_spark.operators.encode import (
    information_value,
    woe_table,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rows = (
        [("good", 1)] * 8 + [("good", 0)] * 2
        + [("bad", 1)] * 2 + [("bad", 0)] * 8
    )
    return spark.createDataFrame(rows, "cat string, y int")


def test_woe_hand_values(labeled):
    t = {r["cat"]: r for r in woe_table(labeled, "cat", "y", alpha=0.5).collect()}
    # totals: pos 10, neg 10, C=2 -> denom 11 each
    want_good = math.log((8.5 / 11) / (2.5 / 11))
    assert t["good"]["woe"] == pytest.approx(want_good)
    assert t["bad"]["woe"] == pytest.approx(-want_good)  # symmetric design
    assert (t["good"]["n"], t["good"]["pos"], t["good"]["neg"]) == (10, 8, 2)


def test_iv_sums_terms(labeled):
    t = woe_table(labeled, "cat", "y", alpha=0.5).collect()
    iv = information_value(labeled, "cat", "y", alpha=0.5).first()
    assert iv["categories"] == 2
    assert iv["iv"] == pytest.approx(sum(r["iv_term"] for r in t))
    assert iv["iv"] > 0.3  # a strongly separating feature


def test_validation(labeled):
    with pytest.raises(ValueError):
        woe_table(labeled, "cat", "y", alpha=0.0)
