"""Feature encoding (operators/encode.py): closed-form smoothing,
leave-one-out leakage defense, MI edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.encode import (
    mutual_information,
    target_encode,
    target_encode_loo,
)


def test_target_encode_closed_form(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", None)]
    df = spark.createDataFrame(rows, "cat string, t double")
    enc = {r["category"]: r for r in target_encode(df, "cat", "t", alpha=2.0).collect()}
    prior = (1 + 3 + 10) / 3  # null excluded
    assert enc["a"]["n"] == 2
    assert enc["a"]["encoding"] == pytest.approx((4 + 2 * prior) / (2 + 2))
    assert enc["b"]["n"] == 1
    assert enc["b"]["encoding"] == pytest.approx((10 + 2 * prior) / (1 + 2))
    with pytest.raises(ValueError, match="alpha"):
        target_encode(df, "cat", "t", alpha=-1)


def test_loo_excludes_own_label(spark):
    rows = [(1, "a", 1.0), (2, "a", 3.0), (3, "a", 5.0), (4, "b", 10.0)]
    df = spark.createDataFrame(rows, "id long, cat string, t double")
    out = {r["id"]: r["loo_encoding"] for r in target_encode_loo(df, "cat", "t", alpha=0.0).collect()}
    # alpha=0: pure leave-one-out means
    assert out[1] == pytest.approx((3 + 5) / 2)
    assert out[2] == pytest.approx((1 + 5) / 2)
    # singleton category at alpha=0: undefined -> NULL, not an ANSI error
    assert out[4] is None
    prior = (1 + 3 + 5 + 10) / 4
    smoothed = {
        r["id"]: r["loo_encoding"]
        for r in target_encode_loo(df, "cat", "t", alpha=4.0).collect()
    }
    assert smoothed[4] == pytest.approx((0 + 4 * prior) / (0 + 4))


def test_loo_null_target_rows_pass_through(spark):
    rows = [(1, "a", 2.0), (2, "a", 4.0), (3, "a", None)]
    df = spark.createDataFrame(rows, "id long, cat string, t double")
    out = {r["id"]: r["loo_encoding"] for r in target_encode_loo(df, "cat", "t", alpha=0.0).collect()}
    # the null-target row is encoded from the FULL category stat
    assert out[3] == pytest.approx(3.0)
    assert out[1] == pytest.approx(4.0)


def test_mutual_information_edges(spark):
    # independent columns: MI == 0 exactly (uniform 2x2)
    ind = spark.createDataFrame(
        [("x1", "y1"), ("x1", "y2"), ("x2", "y1"), ("x2", "y2")],
        "x string, y string",
    )
    assert mutual_information(ind, "x", "y").first()["mi"] == pytest.approx(0.0, abs=1e-12)
    # y determined by x: MI == H(X) == ln 2 for a balanced binary x
    det = spark.createDataFrame(
        [("x1", "y1"), ("x1", "y1"), ("x2", "y2"), ("x2", "y2")],
        "x string, y string",
    )
    assert mutual_information(det, "x", "y").first()["mi"] == pytest.approx(
        math.log(2), rel=1e-12
    )


def test_loo_null_category_encodes_to_prior(spark):
    """NULL-category rows never match the stats join; they must encode
    to the smoothed prior, never subtract from an empty statistic."""
    rows = [(1, "a", 2.0), (2, "a", 4.0), (3, None, 9.0)]
    df = spark.createDataFrame(rows, "id long, cat string, t double")
    prior = (2 + 4 + 9) / 3
    out = {
        r["id"]: r["loo_encoding"]
        for r in target_encode_loo(df, "cat", "t", alpha=3.0).collect()
    }
    assert out[3] == pytest.approx(prior)  # (0 + 3*prior) / (0 + 3)


# ------------------------------------------------- quantile normalization


def test_quantile_normalize_aligns_shifted_groups(spark):
    """Two groups with the same shape but shifted location normalize to
    near-identical values at equal within-group ranks."""
    import pytest as _pytest

    from k_means_using_mapreduce_spark.operators.encode import (
        quantile_normalize,
    )

    rows = [(i, "a", float(i)) for i in range(100)] + [
        (100 + i, "b", 1000.0 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = quantile_normalize(df, "v", "g", "id", grid=100)
    got = {(r["g"], r["id"] % 100): r["normalized"] for r in out.collect()}
    for i in range(100):
        assert got[("a", i)] == _pytest.approx(got[("b", i)], abs=1e-9)
    # monotone within group
    a_vals = [got[("a", i)] for i in range(100)]
    assert a_vals == sorted(a_vals)


def test_quantile_normalize_output_range_is_global(spark):
    from k_means_using_mapreduce_spark.operators.encode import (
        quantile_normalize,
    )

    rows = [(i, "a", float(i)) for i in range(50)] + [
        (50 + i, "b", 500.0 + i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    vals = [r["normalized"] for r in quantile_normalize(df, "v", "g", "id").collect()]
    assert min(vals) >= 0.0 and max(vals) <= 549.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grid"):
        quantile_normalize(df, "v", "g", "id", grid=5)
