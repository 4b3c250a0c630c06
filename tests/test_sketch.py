"""Mergeable HLL distinct sketches (operators/sketch.py): estimate
accuracy vs exact counts, merge identity (union of daily sketches ==
one global sketch), trailing windows with gaps, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.sketch import (
    build_distinct_sketches,
    day_bucket,
    distinct_error_bound,
    rollup_distinct,
    sliding_distinct,
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
