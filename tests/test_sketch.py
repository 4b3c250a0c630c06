"""Mergeable HLL distinct sketches (operators/sketch.py): estimate
accuracy vs exact counts, merge identity (union of daily sketches ==
one global sketch), trailing windows with gaps, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.sketch import (
    bucket_retention,
    build_distinct_sketches,
    build_quantile_sketches,
    build_theta_sketches,
    day_bucket,
    distinct_error_bound,
    rollup_distinct,
    rollup_quantiles,
    rollup_theta_distinct,
    sliding_distinct,
    sliding_quantile,
)


@pytest.fixture(scope="module")
def events(spark):
    # 3 days x users; day 1: users 0..99, day 2: 50..149, day 4: 100..199
    rows = []
    for day, lo, hi in [(1, 0, 100), (2, 50, 150), (4, 100, 200)]:
        rows += [(day, u) for u in range(lo, hi)]
    return spark.createDataFrame(rows, "day long, user_id long")


def test_daily_estimates_near_exact(events):
    sk = build_distinct_sketches(events, ["day"], "user_id")
    got = {r["day"]: r for r in sk.collect()}
    err = distinct_error_bound() * 3  # 3-sigma
    for day in (1, 2, 4):
        assert got[day]["n_rows"] == 100
        assert abs(got[day]["distinct_est"] - 100) <= max(3, 100 * err)


def test_merge_identity(events):
    # union of per-day sketches must estimate the same as one global
    # sketch over all rows — the mergeability contract
    daily = build_distinct_sketches(events, ["day"], "user_id")
    merged = rollup_distinct(daily, []).first()
    direct = build_distinct_sketches(
        events.withColumn("all", F.lit(1)), ["all"], "user_id"
    ).first()
    assert merged["distinct_est"] == direct["distinct_est"]
    assert merged["n_rows"] == 300
    exact = events.select("user_id").distinct().count()  # 200
    err = distinct_error_bound() * 3
    assert abs(merged["distinct_est"] - exact) <= max(5, exact * err)


def test_rollup_subgroup(spark):
    rows = [("a", 1, u) for u in range(50)] + [("a", 2, u) for u in range(25, 75)] \
        + [("b", 1, u) for u in range(10)]
    df = spark.createDataFrame(rows, "src string, day long, user_id long")
    daily = build_distinct_sketches(df, ["src", "day"], "user_id")
    per_src = {r["src"]: r for r in rollup_distinct(daily, ["src"]).collect()}
    assert abs(per_src["a"]["distinct_est"] - 75) <= 3
    assert per_src["b"]["distinct_est"] == 10


def test_sliding_distinct_respects_value_gaps(events):
    daily = build_distinct_sketches(events, ["day"], "user_id")
    out = {
        r["day"]: r["trailing_distinct_est"]
        for r in sliding_distinct(daily, "day", preceding=1).collect()
    }
    err = distinct_error_bound() * 3
    # day 2 window = {1,2} -> users 0..149 = 150
    assert abs(out[2] - 150) <= max(4, 150 * err)
    # day 4 window = {3,4}; day 3 absent -> only day 4's 100 users
    # (rangeBetween is by VALUE: day 2 is outside [3,4])
    assert abs(out[4] - 100) <= max(3, 100 * err)


def test_deterministic(events):
    a = sorted(
        (r["day"], r["distinct_est"])
        for r in build_distinct_sketches(events, ["day"], "user_id").collect()
    )
    b = sorted(
        (r["day"], r["distinct_est"])
        for r in build_distinct_sketches(events, ["day"], "user_id").collect()
    )
    assert a == b


def test_day_bucket_epoch_anchored(spark):
    ns = 86_400_000_000_000
    df = spark.createDataFrame(
        [(0,), (ns - 1,), (ns,), (3 * ns + 5,)], "ts long"
    )
    got = [r["d"] for r in df.select(day_bucket(F.col("ts")).alias("d")).collect()]
    assert got == [0, 0, 1, 3]


def test_empty_group_cols_rejected(events):
    with pytest.raises(ValueError):
        build_distinct_sketches(events, [], "user_id")
    with pytest.raises(ValueError):
        build_quantile_sketches(events, [], "user_id")
    with pytest.raises(ValueError):
        build_theta_sketches(events, [], "user_id")


# ---------------- KLL quantile sketches ----------------


@pytest.fixture(scope="module")
def values(spark):
    # 3 days x 200 values: day d holds d*1000 .. d*1000+199, so exact
    # per-day p50 = d*1000+99.5-ish and the global quantiles are known
    rows = [(d, float(d * 1000 + v)) for d in (1, 2, 4) for v in range(200)]
    return spark.createDataFrame(rows, "day long, v double")


def test_quantile_rollup_matches_exact(values):
    daily = build_quantile_sketches(values, ["day"], "v")
    got = rollup_quantiles(daily, [], quantiles=(0.5, 0.95)).first()
    assert got["n_rows"] == 600
    exact_p50, exact_p95 = values.selectExpr(
        "percentile(v, 0.5) AS a", "percentile(v, 0.95) AS b"
    ).first()
    # KLL rank error ~1.7% at k=200 → value must sit within ±2% of
    # ranks around the target; on this data that is a few tens of units
    assert abs(got["p50"] - exact_p50) <= 60
    assert abs(got["p95"] - exact_p95) <= 60


def test_quantile_per_group_and_names(values):
    daily = build_quantile_sketches(values, ["day"], "v")
    per_day = {
        r["day"]: r
        for r in rollup_quantiles(daily, ["day"], quantiles=(0.5, 0.999)).collect()
    }
    for d in (1, 2, 4):
        # within a 200-row group the sketch is exact (k=200 holds all)
        assert per_day[d]["p50"] == pytest.approx(d * 1000 + 99, abs=1.5)
        assert "p99_9" in per_day[d].asDict()


def test_sliding_quantile_value_gaps(values):
    daily = build_quantile_sketches(values, ["day"], "v")
    out = {
        r["day"]: r["trailing_p50"]
        for r in sliding_quantile(daily, "day", quantiles=(0.5,), preceding=1).collect()
    }
    # day 2 window = {1,2} → median of 1000..1199 ∪ 2000..2199 ≈ boundary
    assert 1150 <= out[2] <= 2050
    # day 4 window = {3,4}; day 3 absent → day 4 alone
    assert out[4] == pytest.approx(4099, abs=2)


def test_quantile_rank_validation(values):
    daily = build_quantile_sketches(values, ["day"], "v")
    with pytest.raises(ValueError):
        rollup_quantiles(daily, [], quantiles=(1.5,))


# ---------------- Theta sketches: set algebra ----------------


def test_theta_union_matches_exact(events):
    daily = build_theta_sketches(events, ["day"], "user_id")
    merged = rollup_theta_distinct(daily, []).first()
    exact = events.select("user_id").distinct().count()  # 200
    assert abs(merged["distinct_est"] - exact) <= max(5, exact * 0.05)
    assert merged["n_rows"] == 300


def test_bucket_retention_vs_exact_sets(events):
    # day 1: 0..99, day 2: 50..149, day 4: 100..199 (row-adjacent lag)
    daily = build_theta_sketches(events, ["day"], "user_id")
    out = {r["day"]: r for r in bucket_retention(daily, "day").collect()}
    assert out[1]["retained_est"] is None  # no predecessor
    # day 2 vs day 1: ∩ = 50..99 (50), new = 100..149 (50), churn = 0..49
    assert abs(out[2]["retained_est"] - 50) <= 5
    assert abs(out[2]["new_est"] - 50) <= 5
    assert abs(out[2]["churned_est"] - 50) <= 5
    # day 4 vs day 2: ∩ = 100..149
    assert abs(out[4]["retained_est"] - 50) <= 5
    assert out[4]["distinct_est"] == pytest.approx(100, abs=5)


def test_theta_deterministic(events):
    daily = build_theta_sketches(events, ["day"], "user_id")
    a = sorted((r["day"], r["retained_est"]) for r in bucket_retention(daily, "day").collect())
    b = sorted((r["day"], r["retained_est"]) for r in bucket_retention(daily, "day").collect())
    assert a == b


def test_minhash_distinct_estimate_accuracy_and_determinism(spark):
    from k_means_using_mapreduce_spark.operators.sketch import (
        minhash_distinct_estimate,
    )

    # 500 distinct values, heavy duplication
    rows = [("g", i % 500) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = minhash_distinct_estimate(df, "v", ["g"], num_hashes=16).collect()[0]
    assert r["n_rows"] == 5000
    # ~1/sqrt(16) = 25% relative error bound; allow 2x margin
    assert 250 <= r["distinct_est"] <= 1000
    # determinism: identical on re-run
    r2 = minhash_distinct_estimate(df, "v", ["g"], num_hashes=16).collect()[0]
    assert r2["distinct_est"] == r["distinct_est"]
    # duplication-invariance: the estimate depends only on the SET
    dup = spark.createDataFrame(rows * 3, "g string, v long")
    r3 = minhash_distinct_estimate(dup, "v", ["g"], num_hashes=16).collect()[0]
    assert r3["distinct_est"] == r["distinct_est"]
    import pytest as _p

    with _p.raises(ValueError):
        minhash_distinct_estimate(df, "v", ["g"], num_hashes=99)
