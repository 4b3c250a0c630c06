"""operators/privacy.py (Laplace mechanism): noise distribution
shape, determinism, clipping-as-sensitivity, epsilon scaling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.privacy import (
    noised_counts,
    noised_means,
    noised_sums,
    laplace_noise,
)


@pytest.fixture(scope="module")
def groups(spark):
    rows = [(i, f"g{i % 50}", float(i % 7)) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _noise_sample(spark, b, n=2000):
    df = spark.range(n)
    col = laplace_noise(b, seed=1, key_cols=[F.col("id")])
    return [r[0] for r in df.select(col).collect()]


def test_noise_is_laplace_shaped(spark):
    b = 2.0
    xs = _noise_sample(spark, b)
    xs.sort()
    n = len(xs)
    # symmetric around 0
    assert abs(sum(x > 0 for x in xs) / n - 0.5) < 0.05
    # median |x| of Laplace(b) = b ln 2
    med_abs = sorted(abs(x) for x in xs)[n // 2]
    assert med_abs == pytest.approx(b * math.log(2), rel=0.15)
    # mean |x| = b
    assert sum(abs(x) for x in xs) / n == pytest.approx(b, rel=0.15)


def test_counts_deterministic_and_near_truth(groups):
    a = {r["grp"]: r["noisy_count"] for r in noised_counts(groups, ["grp"], epsilon=1.0, seed=3).collect()}
    b = {r["grp"]: r["noisy_count"] for r in noised_counts(groups, ["grp"], epsilon=1.0, seed=3).collect()}
    assert a == b and len(a) == 50
    # true count is 20 per group; eps=1 noise rarely exceeds ~8
    assert all(abs(v - 20.0) < 15 for v in a.values())
    c = noised_counts(groups, ["grp"], epsilon=1.0, seed=4).collect()
    assert {r["grp"]: r["noisy_count"] for r in c} != a  # seed matters


def test_epsilon_scales_noise(groups):
    tight = noised_counts(groups, ["grp"], epsilon=100.0, seed=3).collect()
    loose = noised_counts(groups, ["grp"], epsilon=0.5, seed=3).collect()
    err_t = sum(abs(r["noisy_count"] - 20.0) for r in tight)
    err_l = sum(abs(r["noisy_count"] - 20.0) for r in loose)
    # identical uniforms, so the ratio is exactly eps_l/eps_t per cell
    assert err_l == pytest.approx(err_t * 200.0, rel=1e-9)


def test_sums_clip_enforced(spark):
    rows = [(1, "a", 1000.0), (2, "a", -50.0), (3, "a", 2.0)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = noised_sums(df, ["grp"], "v", epsilon=1000.0, clip=10.0, seed=1).collect()
    # clipped sum = 10 + 0 + 2 = 12; eps huge -> noise negligible vs clip/eps=0.01
    assert out[0]["noisy_sum"] == pytest.approx(12.0, abs=0.5)


def test_means_compose(groups):
    out = {r["grp"]: r["noisy_mean"] for r in noised_means(groups, ["grp"], "v", epsilon=200.0, clip=7.0, seed=3).collect()}
    # true mean per group is mean of (i%7) over its members ~ 3.0
    assert all(abs(v) < 8.0 for v in out.values())
    again = {r["grp"]: r["noisy_mean"] for r in noised_means(groups, ["grp"], "v", epsilon=200.0, clip=7.0, seed=3).collect()}
    assert out == again


def test_validation(groups):
    with pytest.raises(ValueError):
        noised_counts(groups, ["grp"], epsilon=0.0, seed=1)
    with pytest.raises(ValueError):
        noised_counts(groups, [], epsilon=1.0, seed=1)
    with pytest.raises(ValueError):
        noised_sums(groups, ["grp"], "v", epsilon=1.0, clip=0.0, seed=1)
    with pytest.raises(ValueError):
        noised_means(groups, ["grp"], "v", epsilon=1.0, clip=-1.0, seed=1)
    # the seed is REQUIRED: a defaulted seed invites accidental reuse of
    # a public draw (the vacuous-DP failure the rename documents)
    with pytest.raises(TypeError):
        noised_counts(groups, ["grp"], epsilon=1.0)
