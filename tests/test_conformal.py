"""operators/calibration.py conformal: order-statistic qhat, clamp,
coverage accounting, null handling."""

from __future__ import annotations

import pytest

from k_means_using_mapreduce_spark.operators.calibration import (
    conformal_coverage,
    conformal_quantile,
)


def _cal(spark, residuals):
    # pred 0, actual = residual -> |actual - pred| = residual
    return spark.createDataFrame(
        [(0.0, float(r)) for r in residuals], "pred double, actual double"
    )


def test_qhat_is_kth_order_statistic(spark):
    # n=9, alpha=0.1 -> k = ceil(0.9 * 10) = 9 -> largest residual
    df = _cal(spark, range(1, 10))
    r = conformal_quantile(df, "pred", "actual", alpha=0.1).first()
    assert (r["n_cal"], r["k"], r["qhat"]) == (9, 9, 9.0)
    # alpha=0.5 -> k = ceil(0.5*10) = 5 -> the median order statistic
    r2 = conformal_quantile(df, "pred", "actual", alpha=0.5).first()
    assert (r2["k"], r2["qhat"]) == (5, 5.0)


def test_k_clamped_to_n(spark):
    df = _cal(spark, [1.0, 2.0])
    r = conformal_quantile(df, "pred", "actual", alpha=0.01).first()
    assert (r["n_cal"], r["k"], r["qhat"]) == (2, 2, 2.0)


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0), (0.0, None), (None, 3.0)], "pred double, actual double"
    )
    r = conformal_quantile(df, "pred", "actual", alpha=0.5).first()
    assert r["n_cal"] == 1 and r["qhat"] == 1.0


def test_coverage_counts(spark):
    q = conformal_quantile(_cal(spark, [1, 2, 3, 4]), "pred", "actual", alpha=0.5)
    # qhat = ceil(0.5*5)=3rd smallest = 3.0
    test = _cal(spark, [0.5, 2.9, 3.0, 5.0])
    r = conformal_coverage(test, q, "pred", "actual").first()
    assert (r["n_test"], r["covered"]) == (4, 3)
    assert r["coverage"] == pytest.approx(0.75)


def test_validation(spark):
    df = _cal(spark, [1.0])
    with pytest.raises(ValueError):
        conformal_quantile(df, "pred", "actual", alpha=0.0)
    with pytest.raises(ValueError):
        conformal_quantile(df, "pred", "actual", alpha=1.0)
