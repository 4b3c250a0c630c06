"""operators/timeseries.py: gap-fill grid correctness, moving average,
funnel ordering semantics, and the single-exchange funnel plan."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.timeseries import funnel, resample_counts
from k_means_using_mapreduce_spark.plans.explain import exchange_count


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # key "a": events at hours 0 and 3 -> hours 1, 2 must appear as 0
        (1, _ts(0, 5), "a", 1.0),
        (2, _ts(0, 45), "a", 2.0),
        (3, _ts(3, 10), "a", 4.0),
        # key "b": only hour 1 -> leading/trailing zeros on the shared grid
        (4, _ts(1, 30), "b", 8.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_gapfill_dense_grid_with_zeros(ev):
    out = resample_counts(ev, value_col="value").orderBy("key", "bucket")
    rows = out.collect()
    # 2 keys x 4 hourly buckets (00..03) = 8 rows
    assert len(rows) == 8
    a = [(r["bucket"].hour, r["n"], r["total"]) for r in rows if r["key"] == "a"]
    assert a == [(0, 2, 3.0), (1, 0, 0.0), (2, 0, 0.0), (3, 1, 4.0)]
    b = [(r["bucket"].hour, r["n"]) for r in rows if r["key"] == "b"]
    assert b == [(0, 0), (1, 1), (2, 0), (3, 0)]


def test_gapfill_moving_average_over_dense_grid(ev):
    out = resample_counts(ev, moving_avg=2).orderBy("key", "bucket")
    a = [r["ma_2"] for r in out.collect() if r["key"] == "a"]
    # n = [2,0,0,1] -> trailing-2 means [2, 1, 0, 0.5]
    assert a == [2.0, 1.0, 0.0, 0.5]


def test_gapfill_validation(ev):
    with pytest.raises(ValueError):
        resample_counts(ev, unit="month")
    with pytest.raises(ValueError):
        resample_counts(ev, moving_avg=0)


def test_funnel_requires_order(spark):
    rows = [
        (1, _ts(1), "view"),   # user 1: view -> click -> purchase (full)
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        (2, _ts(2), "view"),   # user 2: click BEFORE view -> no step 2
        (2, _ts(1), "click"),
        (3, _ts(1), "view"),   # user 3: view only
        (4, _ts(1), "click"),  # user 4: never viewed -> not even step 1
        (4, _ts(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r for r in funnel(ev, ("view", "click", "purchase")).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["view"]["conversion"] == 1.0
    assert out["click"]["conversion"] == pytest.approx(1 / 3)
    assert out["purchase"]["conversion"] == 1.0


def test_funnel_equal_ts_not_counted(spark):
    # strict ordering: the next step must be strictly after the previous
    rows = [(1, _ts(1), "view"), (1, _ts(1), "click")]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r["n_users"] for r in funnel(ev, ("view", "click")).collect()}
    assert out == {"view": 1, "click": 0}


def test_funnel_validation(spark):
    ev = spark.createDataFrame([(1, _ts(1), "view")],
                               "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        funnel(ev, ("view",))


def test_funnel_single_exchange_for_all_steps(spark, sf_oracle):
    from k_means_using_mapreduce_spark.sources.loaders import load_table

    ev = load_table(spark, sf_oracle, "events")
    out = funnel(ev, ("view", "click", "purchase"))
    out.collect()
    # chained window mins share one hash exchange on user_id; the final
    # 1-row aggregate adds its own single-partition exchange
    assert exchange_count(out) <= 2


def test_retention_cohorts(spark):
    from datetime import datetime, timedelta

    from k_means_using_mapreduce_spark.operators.timeseries import (
        retention_cohorts,
    )

    d0 = datetime(2024, 1, 1, 12)

    def day(n):
        return d0 + timedelta(days=n)

    rows = [
        (1, day(0)), (1, day(1)), (1, day(2)),   # cohort d0, returns d1 d2
        (2, day(0)), (2, day(2)),                # cohort d0, returns d2
        (3, day(1)),                             # cohort d1, never returns
        (1, day(0)),                             # duplicate activity same day
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort"], r["offset"]): r
        for r in retention_cohorts(ev, unit="day").collect()
    }
    c0 = min(c for c, _ in out)
    assert out[(c0, 0)]["n_users"] == 2 and out[(c0, 0)]["retention"] == 1.0
    assert out[(c0, 1)]["n_users"] == 1 and out[(c0, 1)]["retention"] == 0.5
    assert out[(c0, 2)]["n_users"] == 2
    c1 = max(c for c, _ in out)
    assert out[(c1, 0)]["n_users"] == 1
    assert len(out) == 4


def test_anomaly_flags_trailing_window(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import anomaly_flags

    # flat baseline of 10s, then a spike
    rows = [("a", i, 10) for i in range(8)] + [("a", 8, 11), ("a", 9, 100)]
    df = spark.createDataFrame(rows, "key string, bucket int, n int")
    out = {r["bucket"]: r for r in anomaly_flags(df, window=8, z=3.0).collect()}
    assert not out[0]["is_anomaly"]  # no baseline
    assert out[0]["zscore"] is None
    assert not out[8]["is_anomaly"]  # zero-variance baseline -> no flag
    assert out[9]["is_anomaly"]      # spike vs [10..10,11] baseline
    # the spike's own value is NOT in its baseline
    assert out[9]["mean_w"] == pytest.approx((10 * 7 + 11) / 8)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        anomaly_flags(df, window=1)
    with _pytest.raises(ValueError):
        anomaly_flags(df, z=0)


def test_decayed_aggregate_closed_form(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        decayed_aggregate,
    )

    HL = 1_000_000  # 1 second half-life, in µs
    asof = 10_000_000  # t=10s
    rows = [
        # user 1: value 8 at t=9s (age 1s -> w=0.5), value 4 at t=8s (w=0.25)
        (1, 9_000_000_000, 8.0),
        (1, 8_000_000_000, 4.0),
        # future event must be excluded
        (1, 11_000_000_000, 100.0),
        # user 2: exactly at asof -> w=1
        (2, 10_000_000_000, 6.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = {
        r["user_id"]: r
        for r in decayed_aggregate(
            df, ["user_id"], "value", "ts", half_life_us=HL, asof_us=asof
        ).collect()
    }
    assert out[1]["decayed_sum"] == pytest.approx(8 * 0.5 + 4 * 0.25)
    assert out[1]["decayed_n"] == pytest.approx(0.75)
    assert out[1]["decayed_mean"] == pytest.approx(5.0 / 0.75)
    assert out[2]["decayed_sum"] == pytest.approx(6.0)
    with pytest.raises(ValueError, match="half_life"):
        decayed_aggregate(df, ["user_id"], "value", "ts", half_life_us=0, asof_us=asof)


# ---------------------------------------------------------------- CUSUM


def _cusum_reference(values, slack, threshold):
    """Page's recursion on a 1e-6-quantized z grid (exact Decimal
    arithmetic) — the ground truth the closed form must reproduce."""
    from decimal import ROUND_HALF_UP, Decimal

    n = len(values)
    mean = sum(values) / n
    var = sum((v - mean) ** 2 for v in values) / (n - 1) if n > 1 else 0.0
    zs = [(v - mean) / var**0.5 if var > 0 else 0.0 for v in values]
    q = [
        Decimal(repr(z)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        for z in zs
    ]
    k = Decimal(repr(slack))
    sp = sn = Decimal(0)
    out = []
    for z in q:
        sp = max(Decimal(0), sp + z - k)
        sn = max(Decimal(0), sn - z - k)
        out.append((float(sp), float(sn)))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cusum_matches_pages_recursion(spark, seed):
    """The prefix-min closed form equals the sequential recursion
    (random series with an injected level shift)."""
    import random

    from k_means_using_mapreduce_spark.operators.timeseries import (
        cusum_statistics,
    )

    rng = random.Random(seed)
    vals = [rng.randint(0, 20) for _ in range(40)]
    vals += [v + 15 for v in (rng.randint(0, 20) for _ in range(20))]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "key string, bucket long, n long"
    )
    out = (
        cusum_statistics(df, slack=0.25, threshold=4.0)
        .orderBy("bucket")
        .collect()
    )
    ref = _cusum_reference([float(v) for v in vals], 0.25, 4.0)
    for row, (sp, sn) in zip(out, ref):
        assert row["cusum_pos"] == pytest.approx(sp, abs=1e-9)
        assert row["cusum_neg"] == pytest.approx(sn, abs=1e-9)
        assert row["shift_up"] == int(sp > 4.0)
        assert row["shift_down"] == int(sn > 4.0)
    # the injected +15-sigma-ish shift must be detected, and not before it
    assert any(r["shift_up"] == 1 for r in out[40:])
    assert all(r["shift_up"] == 0 for r in out[:35])


def test_cusum_constant_series_never_flags(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        cusum_statistics,
    )

    df = spark.createDataFrame(
        [("k", i, 7) for i in range(20)], "key string, bucket long, n long"
    )
    rows = cusum_statistics(df).collect()
    assert all(r["zscore"] == 0.0 for r in rows)
    assert all(r["shift_up"] == 0 and r["shift_down"] == 0 for r in rows)


def test_changepoint_summary_sentinels_and_direction(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        changepoint_summary,
    )

    flat = [("flat", i, 5 + (i % 2)) for i in range(60)]
    up = [("up", i, 3 + (i % 3)) for i in range(30)] + [
        ("up", 30 + i, 40) for i in range(30)
    ]
    down = [("down", i, 40 + (i % 3)) for i in range(30)] + [
        ("down", 30 + i, 3) for i in range(30)
    ]
    df = spark.createDataFrame(
        flat + up + down, "key string, bucket long, n long"
    )
    by_key = {
        r["key"]: r
        for r in changepoint_summary(
            df, threshold=4.0, baseline_buckets=30
        ).collect()
    }
    assert by_key["flat"]["direction"] == "none"
    assert by_key["flat"]["first_shift"] == -1
    assert by_key["up"]["direction"] == "up"
    assert by_key["up"]["first_shift"] >= 30
    assert by_key["down"]["direction"] == "down"
    assert by_key["down"]["first_shift"] >= 30


def test_cusum_single_exchange_plan(spark):
    """Moments window + both cumulative passes share ONE hash exchange
    on the key column."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        cusum_statistics,
    )

    df = spark.createDataFrame(
        [("k", i, i % 5) for i in range(50)], "key string, bucket long, n long"
    )
    assert exchange_count(cusum_statistics(df)) == 1


def test_locf_carries_and_drops_leading(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        resample_locf,
    )

    rows = [
        # key a: hour0 = 5 (latest of two), gap at hour1-2, hour3 = 9
        (1, _ts(0, 5), "a", 3.0),
        (2, _ts(0, 45), "a", 5.0),
        (3, _ts(3, 10), "a", 9.0),
        # key b: first observation at hour 2 -> hours 0-1 dropped
        (4, _ts(2, 0), "b", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = resample_locf(ev).orderBy("key", "bucket_us").collect()
    a = [(r["bucket_us"], r["value"], r["is_carried"]) for r in out if r["key"] == "a"]
    hours = [b // 3_600_000_000 % 24 for b, _, _ in a]
    assert hours == [0, 1, 2, 3]
    assert [v for _, v, _ in a] == [5.0, 5.0, 5.0, 9.0]
    assert [c for _, _, c in a] == [0, 1, 1, 0]
    b = [(r["value"], r["is_carried"]) for r in out if r["key"] == "b"]
    assert b == [(7.0, 0), (7.0, 1)]  # hours 2,3 only — leading dropped


def test_locf_tie_break_by_event_id(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        resample_locf,
    )

    rows = [
        (1, _ts(0, 0), "a", 1.0),
        (2, _ts(0, 0), "a", 2.0),  # same ts: higher event_id wins
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = resample_locf(ev).collect()
    assert len(out) == 1 and out[0]["value"] == 2.0


def test_cohort_ltv_hand_case(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        cohort_ltv,
    )

    # day units. users A,B join day 0 (cohort 0); A spends 10 on day 0
    # and 6 on day 2; B spends 4 on day 0 and is then inactive.
    day = 86_400_000_000
    rows = [
        ("A", 0, 10.0), ("A", 2 * day, 6.0), ("B", 0, 4.0),
        ("C", day, 8.0),  # second cohort, single member
    ]
    df = spark.createDataFrame(
        [(u, t, v) for u, t, v in rows], "user_id string, us long, value double"
    )
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.timestamp_micros(F.col("us")))
    out = {
        (r["cohort"], r["age"]): r
        for r in cohort_ltv(df, unit="day").collect()
    }
    c0 = out[(0, 0)]
    assert c0["n_users"] == 2
    assert c0["period_value"] == pytest.approx(14.0)
    assert c0["cum_value_per_user"] == pytest.approx(7.0)
    c0a2 = out[(0, 2)]
    assert c0a2["period_value"] == pytest.approx(6.0)
    # cumulative: (14 + 6) / 2 members = 10 per user
    assert c0a2["cum_value_per_user"] == pytest.approx(10.0)
    assert out[(day, 0)]["n_users"] == 1
    assert out[(day, 0)]["cum_value_per_user"] == pytest.approx(8.0)


def test_cohort_ltv_null_value_counts_activity(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.timeseries import (
        cohort_ltv,
    )

    df = spark.createDataFrame(
        [("A", 0, None)], "user_id string, us long, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("us")))
    r = cohort_ltv(df, unit="day").collect()[0]
    assert r["period_value"] == pytest.approx(0.0)
    assert r["n_users"] == 1
    import pytest as _p

    with _p.raises(ValueError):
        cohort_ltv(df, unit="year")


def test_pvm_bridge_reconciles_and_hand_case(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        price_volume_mix,
    )

    old = spark.createDataFrame(
        [("a", 10.0, 100.0), ("a", 10.0, 100.0),  # q=20 r=200 p=10
         ("gone", 5.0, 50.0)],
        "g string, q double, r double",
    )
    new = spark.createDataFrame(
        [("a", 30.0, 360.0),  # q=30 r=360 p=12
         ("new", 2.0, 40.0)],
        "g string, q double, r double",
    )
    out = {
        r["g"]: r
        for r in price_volume_mix(
            old, new, ["g"], qty_col="q", revenue_col="r"
        ).collect()
    }
    a = out["a"]
    # volume (30-20)*10=100, price (12-10)*20=40, mix 10*2=20; sum=160=dR
    assert a["volume_effect"] == pytest.approx(100.0)
    assert a["price_effect"] == pytest.approx(40.0)
    assert a["mix_effect"] == pytest.approx(20.0)
    assert a["d_revenue"] == pytest.approx(160.0)
    assert out["new"]["new_effect"] == pytest.approx(40.0)
    assert out["gone"]["gone_effect"] == pytest.approx(-50.0)
    # bridge identity on every row
    for r in out.values():
        assert r["d_revenue"] == pytest.approx(
            r["volume_effect"] + r["price_effect"] + r["mix_effect"]
            + r["new_effect"] + r["gone_effect"]
        )


def test_pvm_degenerate_zero_quantity_goes_to_mix(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        price_volume_mix,
    )

    old = spark.createDataFrame([("a", 0.0, 10.0)], "g string, q double, r double")
    new = spark.createDataFrame([("a", 5.0, 30.0)], "g string, q double, r double")
    r = price_volume_mix(old, new, ["g"], qty_col="q", revenue_col="r").collect()[0]
    assert r["mix_effect"] == pytest.approx(20.0)
    assert r["volume_effect"] == 0.0 and r["price_effect"] == 0.0
    import pytest as _p

    with _p.raises(ValueError):
        price_volume_mix(old, new, [], qty_col="q", revenue_col="r")


def test_funnel_latency_hand_case(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.timeseries import (
        funnel_latency,
    )

    # user A: view@0 click@10 buy@25; user B: view@0 click@30 (no buy);
    # user C: click@5 only (never views -> no qualifying click)
    rows = [
        ("A", 0, "view"), ("A", 10, "click"), ("A", 25, "purchase"),
        ("B", 0, "view"), ("B", 30, "click"),
        ("C", 5, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, us long, event_type string"
    ).withColumn("ts", F.timestamp_micros(F.col("us")))
    out = {
        r["step"]: r
        for r in funnel_latency(df, ["view", "click", "purchase"]).collect()
    }
    click = out["click"]
    assert click["n_converted"] == 2
    assert click["p50_us"] == pytest.approx(20.0)  # median of {10, 30}
    assert click["max_us"] == pytest.approx(30.0)
    buy = out["purchase"]
    assert buy["n_converted"] == 1
    assert buy["p50_us"] == pytest.approx(15.0)


def test_funnel_latency_no_conversion_sentinel(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.timeseries import (
        funnel_latency,
    )

    df = spark.createDataFrame(
        [("A", 0, "view")], "user_id string, us long, event_type string"
    ).withColumn("ts", F.timestamp_micros(F.col("us")))
    out = {
        r["step"]: r
        for r in funnel_latency(df, ["view", "click"]).collect()
    }
    assert out["click"]["n_converted"] == 0
    assert out["click"]["p50_us"] == -1.0
    import pytest as _p

    with _p.raises(ValueError):
        funnel_latency(df, ["view"])


def test_time_of_day_profile_pinned_vs_uniform(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.timeseries import (
        time_of_day_profile,
    )

    hour = 3_600_000_000
    rows = [("cron", 5 * hour + i * 24 * hour) for i in range(48)]
    rows += [("organic", h * hour) for h in range(24) for _ in range(2)]
    df = spark.createDataFrame(
        rows, "event_type string, us long"
    ).withColumn("ts", F.timestamp_micros(F.col("us")))
    out = {
        r["event_type"]: r for r in time_of_day_profile(df).collect()
    }
    cron = out["cron"]
    assert cron["peak_hour"] == 5
    assert cron["peak_share"] == pytest.approx(1.0)
    assert cron["entropy"] == pytest.approx(0.0, abs=1e-12)
    org = out["organic"]
    assert org["entropy"] == pytest.approx(1.0)
    assert org["peak_share"] == pytest.approx(1.0 / 24.0)
    assert org["peak_hour"] == 0  # tie -> earliest hour


def test_autocorrelation_period_two_series(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        autocorrelation,
    )

    # alternating series: acf(1) = -1, acf(2) = +1
    rows = [("a", i, float(i % 2)) for i in range(40)]
    grid = spark.createDataFrame(rows, "key string, bucket int, n double")
    out = {
        r["lag"]: r["acf"]
        for r in autocorrelation(grid, max_lag=3).collect()
    }
    assert out[1] == pytest.approx(-1.0)
    assert out[2] == pytest.approx(1.0)
    assert out[3] == pytest.approx(-1.0)


def test_autocorrelation_short_and_constant(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        autocorrelation,
    )

    rows = [("c", i, 5.0) for i in range(10)]  # constant -> NULL acf
    rows += [("s", 0, 1.0), ("s", 1, 2.0)]     # too short for lag 2
    grid = spark.createDataFrame(rows, "key string, bucket int, n double")
    out = {
        (r["key"], r["lag"]): r
        for r in autocorrelation(grid, max_lag=2).collect()
    }
    assert out[("c", 1)]["acf"] is None
    assert ("s", 2) not in out  # no overlapping pairs at all
    import pytest as _p

    with _p.raises(ValueError):
        autocorrelation(grid, max_lag=0)


def test_changepoint_localizes_level_shift(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        changepoint_argmax,
    )

    # flat 10s for 30 points, then flat 20s: change after position 30
    rows = [("a", i, 10.0 if i < 30 else 20.0) for i in range(60)]
    # noise-free constant series has no changepoint: stat_norm NULL
    rows += [("c", i, 7.0) for i in range(40)]
    grid = spark.createDataFrame(rows, "key string, bucket int, n double")
    out = {r["key"]: r for r in changepoint_argmax(grid).collect()}
    a = out["a"]
    assert a["cp_pos"] == 30
    assert a["cp_at"] == 29  # 0-indexed bucket of the 30th point
    assert a["shift"] == pytest.approx(10.0)
    assert a["stat_norm"] > 5.0
    assert out["c"]["stat_norm"] is None


def test_interpolate_linear_interior_and_edges(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = [
        ("a", 0, None),   # leading -> bfill 10
        ("a", 1, 10.0),
        ("a", 2, None),   # interior: 10 -> 40 over 3 steps => 20
        ("a", 3, None),   # => 30
        ("a", 4, 40.0),
        ("a", 5, None),   # trailing -> ffill 40
        ("b", 0, None),   # all-null series stays null
    ]
    grid = spark.createDataFrame(rows, "key string, bucket int, v double")
    out = {
        (r["key"], r["bucket"]): r["v_interp"]
        for r in interpolate_linear(grid).collect()
    }
    assert out[("a", 0)] == 10.0
    assert out[("a", 2)] == pytest.approx(20.0)
    assert out[("a", 3)] == pytest.approx(30.0)
    assert out[("a", 5)] == 40.0
    assert out[("b", 0)] is None


def test_interpolate_linear_respects_order_distance(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        interpolate_linear,
    )

    # sparse positions: gap at pos 4 between (0, 0.0) and (10, 10.0)
    # must interpolate in POSITION space -> 4.0, not row space
    grid = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 4, None), ("a", 10, 10.0)],
        "key string, bucket int, v double",
    )
    out = {r["bucket"]: r["v_interp"] for r in interpolate_linear(grid).collect()}
    assert out[4] == pytest.approx(4.0)


def test_ewma_matches_pandas_truncated(spark):
    """Hand-checkable EWMA: constant series -> itself; step series ->
    the truncated adjust=True weighting."""
    from k_means_using_mapreduce_spark.operators.timeseries import ewma_by_key

    rows = [("a", i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, bucket int, n double")
    got = ewma_by_key(df, alpha=0.4, window=6).collect()
    assert all(r["ewma"] == pytest.approx(5.0) for r in got)

    step = [("s", i, 0.0 if i < 5 else 10.0) for i in range(10)]
    df2 = spark.createDataFrame(step, "key string, bucket int, n double")
    got2 = {r["bucket"]: r["ewma"] for r in ewma_by_key(df2, alpha=0.4, window=6).collect()}
    # at t=5: weights (1, .6, .36, .216, .1296, .07776) over x=(10,0,0,0,0,0)
    ws = [0.6**k for k in range(6)]
    assert got2[5] == pytest.approx(10.0 * ws[0] / sum(ws))
    # first point: only its own weight -> raw value
    assert got2[0] == pytest.approx(0.0)
    # monotone approach to 10 after the step
    assert got2[5] < got2[6] < got2[7] < got2[8] < got2[9] < 10.0


def test_ar2_yule_walker_recovers_planted_ar2(spark):
    """Deterministic AR(2) path (phi=0.5, -0.3, fixed pseudo-noise):
    Yule-Walker estimates land near the planted coefficients and the
    process is flagged stationary."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        ar2_yule_walker,
    )

    import math

    xs = [0.0, 0.0]
    for t in range(2, 800):
        eps = math.sin(t * 12.9898) * 43758.5453
        eps = eps - math.floor(eps) - 0.5  # deterministic U(-.5,.5)
        xs.append(0.5 * xs[-1] - 0.3 * xs[-2] + eps)
    rows = [("s", t, v) for t, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, bucket int, n double")
    r = ar2_yule_walker(df).collect()[0]
    assert r["phi1"] == pytest.approx(0.5, abs=0.1)
    assert r["phi2"] == pytest.approx(-0.3, abs=0.1)
    assert r["stationary"] is True
    assert 0.0 < r["innovation_ratio"] <= 1.0

    # constant series: undefined ACF -> NULL coefficients
    const = spark.createDataFrame(
        [("c", t, 1.0) for t in range(50)], "key string, bucket int, n double"
    )
    rc = ar2_yule_walker(const).collect()[0]
    assert rc["phi1"] is None and rc["phi2"] is None


def test_theil_sen_ignores_outlier_bucket(spark):
    """Line y = 2x + 1 with one wild outlier: Theil-Sen recovers the
    exact slope/intercept; OLS would not."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        theil_sen_trend,
    )

    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(20)]
    rows[10] = ("a", 10.0, 1000.0)  # outlier
    df = spark.createDataFrame(rows, "key string, x double, y double")
    r = theil_sen_trend(df).collect()[0]
    assert r["slope"] == pytest.approx(2.0)
    assert r["intercept"] == pytest.approx(1.0)
    assert r["n_points"] == 20 and r["n_pairs"] == 190

    # duplicate x values contribute no pair
    dup = spark.createDataFrame(
        [("d", 1.0, 1.0), ("d", 1.0, 5.0), ("d", 2.0, 3.0)],
        "key string, x double, y double",
    )
    rd = theil_sen_trend(dup).collect()[0]
    assert rd["n_pairs"] == 2


def test_rolling_correlation_tracks_regimes(spark):
    from k_means_using_mapreduce_spark.operators.timeseries import (
        rolling_correlation,
    )

    # first 30 buckets: y = x (corr 1); next 30: y = -x + 100 (corr -1)
    xs = [("t", i, float(i % 7) + 1) for i in range(60)]
    ys = [("t", i, (float(i % 7) + 1) if i < 30 else (100.0 - (float(i % 7) + 1))) for i in range(60)]
    a = spark.createDataFrame(xs, "key string, bucket int, n double")
    b = spark.createDataFrame(ys, "key string, bucket int, n double")
    got = {r["bucket"]: r for r in rolling_correlation(a, b, window=10).collect()}
    assert got[29]["corr"] == pytest.approx(1.0)
    assert got[59]["corr"] == pytest.approx(-1.0)
    # undefined head windows: sentinel, never NULL
    assert got[0]["corr"] == -2.0 and got[1]["corr"] == -2.0
    assert got[2]["n_win"] == 3


def _hourly_events(spark, counts, key="k"):
    """One event row per unit of count, n[i] events in hour i."""
    from datetime import timedelta

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for hour, n in enumerate(counts):
        for j in range(n):
            rows.append(
                (eid, base + timedelta(hours=hour, minutes=min(j, 59)),
                 key, 1.0)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_trend_test_monotone_series_hits_max_s(spark):
    """Strictly increasing hourly counts: every pair is concordant, so
    S = T(T-1)/2, the Sen slope equals the exact common difference,
    and z is the continuity-corrected positive statistic."""
    import math

    from k_means_using_mapreduce_spark.operators.timeseries import trend_test

    counts = [1, 3, 5, 7, 9, 11]  # slope exactly +2/hour
    r = trend_test(_hourly_events(spark, counts)).collect()[0]
    t = len(counts)
    assert r["n"] == t
    assert r["s"] == t * (t - 1) // 2
    assert r["sen_slope"] == pytest.approx(2.0, abs=0.0)
    var_s = t * (t - 1) * (2 * t + 5) / 18.0  # no ties
    assert r["var_s"] == pytest.approx(var_s)
    assert r["z"] == pytest.approx((r["s"] - 1.0) / math.sqrt(var_s))


def test_trend_test_constant_series_no_evidence(spark):
    """All-equal counts: S = 0, full tie correction zeroes var_s, and
    z is NULL (the kernel's NaN nulls through Arrow — a constant
    series carries no trend evidence)."""
    from k_means_using_mapreduce_spark.operators.timeseries import trend_test

    r = trend_test(_hourly_events(spark, [4, 4, 4, 4])).collect()[0]
    assert r["s"] == 0
    assert r["var_s"] == pytest.approx(0.0)
    assert r["z"] is None
    assert r["sen_slope"] == pytest.approx(0.0)


def test_trend_test_tie_correction_and_decreasing(spark):
    """Mixed series with tied count values: the tie term subtracts
    t(t-1)(2t+5) per tied group; a decreasing series flips the sign
    of S and applies the +1 continuity correction."""
    import math

    from k_means_using_mapreduce_spark.operators.timeseries import trend_test

    counts = [9, 7, 7, 3, 1]  # one tie group of size 2, decreasing
    r = trend_test(_hourly_events(spark, counts)).collect()[0]
    # pairwise signs by hand: all decreasing except the 7==7 tie
    assert r["s"] == -(10 - 1)  # 9 strict decreases, 1 tie
    t = 5.0
    tie_term = 2.0 * 1.0 * 9.0  # t=2 group: 2*(2-1)*(2*2+5)
    var_s = (t * (t - 1) * (2 * t + 5) - tie_term) / 18.0
    assert r["var_s"] == pytest.approx(var_s)
    assert r["z"] == pytest.approx((r["s"] + 1.0) / math.sqrt(var_s))
    assert r["sen_slope"] < 0


def test_holt_linear_tracks_exact_trend(spark):
    """Perfectly linear counts: the one-step predictions converge onto
    the line, trend approaches the true slope, and the forecast
    extrapolates it."""
    from k_means_using_mapreduce_spark.operators.timeseries import holt_linear

    counts = [10 + 2 * i for i in range(48)]  # slope exactly +2/hour
    r = holt_linear(
        _hourly_events(spark, counts), alpha=0.5, beta=0.3, horizon=10
    ).collect()[0]
    assert r["n"] == 48
    assert r["trend"] == pytest.approx(2.0, abs=0.05)
    assert r["level"] == pytest.approx(counts[-1], abs=1.0)
    assert r["forecast"] == pytest.approx(counts[-1] + 10 * 2.0, abs=2.0)

    # hand-replay the recurrence: bit-identical state
    lvl, trd, sse = float(counts[0]), 0.0, 0.0
    for y in [float(c) for c in counts[1:]]:
        err = y - (lvl + trd)
        sse = sse + err * err
        nl = 0.5 * y + (1.0 - 0.5) * (lvl + trd)
        trd = 0.3 * (nl - lvl) + (1.0 - 0.3) * trd
        lvl = nl
    assert r["level"] == lvl and r["trend"] == trd and r["sse"] == sse

    import pytest as _p

    with _p.raises(ValueError, match="alpha"):
        holt_linear(_hourly_events(spark, [1, 2]), alpha=0.0)
    with _p.raises(ValueError, match="horizon"):
        holt_linear(_hourly_events(spark, [1, 2]), horizon=-1)


def test_holt_winters_recovers_pure_seasonal_pattern(spark):
    """A flat series with an exact period-4 additive pattern: trend ~ 0,
    seasonal amplitude recovers the pattern's range, and the h-step
    forecast lands on the seasonally matching value."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        holt_winters,
    )

    pattern = [10, 16, 12, 6]  # mean 11, amplitude 10
    counts = pattern * 12  # 48 hours, 12 full seasons
    r = holt_winters(
        _hourly_events(spark, counts),
        period=4,
        alpha=0.3,
        beta=0.05,
        gamma=0.3,
        horizon=4,
    ).collect()[0]
    assert r["n"] == 48
    assert r["trend"] == pytest.approx(0.0, abs=0.01)
    assert r["level"] == pytest.approx(11.0, abs=0.2)
    assert r["s_amp"] == pytest.approx(10.0, abs=0.5)
    # horizon=4 wraps to the same phase as the last observed bucket
    assert r["forecast"] == pytest.approx(counts[-1], abs=0.5)


def test_holt_winters_hand_replay_and_guards(spark):
    """Bit-identical state vs a hand replay of the FPP additive
    recurrence; keys shorter than two seasons are dropped; parameter
    validation raises."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        holt_winters,
    )

    counts = [3, 7, 5, 1, 4, 9, 6, 2, 5, 11, 7, 3]  # period 4, 3 seasons
    m, a, b, g = 4, 0.4, 0.2, 0.3
    r = holt_winters(
        _hourly_events(spark, counts),
        period=m,
        alpha=a,
        beta=b,
        gamma=g,
        horizon=6,
    ).collect()[0]
    ys = [float(c) for c in counts]
    m1 = sum(ys[:m]) / m
    m2 = sum(ys[m : 2 * m]) / m
    lvl, trd = m1, (m2 - m1) / m
    seas = [y - m1 for y in ys[:m]]
    sse = 0.0
    for y in ys[m:]:
        s_old = seas[0]
        err = y - (lvl + trd + s_old)
        sse = sse + err * err
        nl = a * (y - s_old) + (1.0 - a) * (lvl + trd)
        ns = g * (y - lvl - trd) + (1.0 - g) * s_old
        trd = b * (nl - lvl) + (1.0 - b) * trd
        lvl = nl
        seas = seas[1:] + [ns]
    assert r["level"] == lvl and r["trend"] == trd and r["sse"] == sse
    assert r["s_amp"] == max(seas) - min(seas)
    assert r["forecast"] == lvl + 6.0 * trd + seas[(6 - 1) % m]

    # shorter than two full seasons -> key dropped, empty result
    short = holt_winters(_hourly_events(spark, [1, 2, 3]), period=4)
    assert short.count() == 0

    with pytest.raises(ValueError, match="alpha"):
        holt_winters(_hourly_events(spark, [1, 2]), alpha=0.0)
    with pytest.raises(ValueError, match="period"):
        holt_winters(_hourly_events(spark, [1, 2]), period=1)
    with pytest.raises(ValueError, match="horizon"):
        holt_winters(_hourly_events(spark, [1, 2]), horizon=0)


def _two_series_events(spark, xs, ys):
    """Hourly events for two keys with given per-hour counts."""
    from datetime import timedelta

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for hour, (nx, ny) in enumerate(zip(xs, ys)):
        for key, n in (("click", nx), ("purchase", ny)):
            for j in range(n):
                rows.append(
                    (eid, base + timedelta(hours=hour, minutes=min(j, 59)),
                     key, 1.0)
                )
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_granger_detects_lagged_driver(spark):
    """y is literally x shifted one hour (plus own noise-free lag 0):
    the cause's lag explains y almost perfectly, so F is large and
    beta_cause recovers the unit transfer; an unrelated constant
    series yields F ~ 0."""
    import random

    from k_means_using_mapreduce_spark.operators.timeseries import (
        granger_test,
    )

    rng = random.Random(5)
    xs = [rng.randint(0, 12) for _ in range(80)]
    # y_t = x_{t-1} + 0/1 jitter (a noise-free fit would make SSE_u
    # exactly 0 and f_stat NULL by the degenerate-design guard)
    ys = [0] + [x + rng.randint(0, 1) for x in xs[:-1]]
    r = granger_test(_two_series_events(spark, xs, ys)).collect()[0]
    assert r["n"] == 79
    assert r["beta_cause"] == pytest.approx(1.0, abs=0.05)
    assert r["f_stat"] > 100.0
    assert r["sse_u"] < r["sse_r"]

    # independent target: x lag adds nothing beyond y's own lag
    ys2 = [rng.randint(0, 12) for _ in range(80)]
    r2 = granger_test(_two_series_events(spark, xs, ys2)).collect()[0]
    assert r2["f_stat"] < 6.0

    with pytest.raises(ValueError, match="lagged buckets"):
        granger_test(_two_series_events(spark, [1, 2], [2, 1]))


def test_kalman_level_constant_series_and_hand_replay(spark):
    """A constant series has zero innovation SSE and the level pinned
    at the constant; the state variance contracts toward the
    steady-state Riccati fixpoint p* = (q + sqrt(q^2 + 4qr)) / 2
    discounted by (1-k), and the hand replay is bit-identical."""
    import math as _m

    from k_means_using_mapreduce_spark.operators.timeseries import (
        kalman_level,
    )

    r = kalman_level(
        _hourly_events(spark, [7] * 30), q=4.0, r=16.0
    ).collect()[0]
    assert r["n"] == 30
    assert r["level"] == 7.0
    assert r["sse"] == 0.0
    # steady-state gain: with u = p_pred* = p* + q and
    # p* = (1-k*)·u, k* = u/(u+r), the Riccati fixpoint gives
    # u^2 - q·u - q·r = 0  =>  u = (q + sqrt(q^2 + 4qr)) / 2
    u = (4.0 + _m.sqrt(16.0 + 4 * 4.0 * 16.0)) / 2.0
    k_star = u / (u + 16.0)
    assert r["gain"] == pytest.approx(k_star, abs=1e-6)

    counts = [10, 14, 9, 30, 11, 12, 8, 40, 10]
    r = kalman_level(_hourly_events(spark, counts), q=2.0, r=9.0).collect()[0]
    lvl, p, gain, sse = float(counts[0]), 9.0, 0.0, 0.0
    for y in [float(c) for c in counts[1:]]:
        p_pred = p + 2.0
        gain = p_pred / (p_pred + 9.0)
        err = y - lvl
        sse = sse + err * err
        lvl = lvl + gain * err
        p = (1.0 - gain) * p_pred
    assert r["level"] == lvl and r["p"] == p
    assert r["gain"] == gain and r["sse"] == sse

    with pytest.raises(ValueError, match="q > 0"):
        kalman_level(_hourly_events(spark, [1, 2]), q=0.0)


def test_kalman_level_adapts_faster_than_settled_gain(spark):
    """Early gain exceeds the settled gain (diffuse-ish p_1 = r trusts
    the prior less at the start), and a level shift mid-series pulls
    the filtered level toward the new regime."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        kalman_level,
    )

    # first-step gain from p_1 = r: (r+q)/(r+2q+r)... computed directly
    q, rr = 4.0, 16.0
    first_gain = (rr + q) / ((rr + q) + rr)
    r = kalman_level(
        _hourly_events(spark, [5, 5] + [50] * 40), q=q, r=rr
    ).collect()[0]
    assert first_gain > r["gain"]  # gain settles downward
    assert r["level"] == pytest.approx(50.0, abs=0.5)


def _two_type_events(spark, a_counts, b_counts, a_key="click",
                     b_key="purchase"):
    rows = []
    eid = 0
    for h, c in enumerate(a_counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, 3_600_000_000_000 * (h + 1), 1, a_key, 1.0))
    for h, c in enumerate(b_counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, 3_600_000_000_000 * (h + 1), 1, b_key, 1.0))
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double",
    ).withColumn("ts", (F.col("ts") / 1e9).cast("timestamp"))


def test_dtw_identical_series_is_zero_and_hand_dp(spark):
    """Identical series warp at zero cost; a hand-computed 3x3 DP
    matches exactly (integers)."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        dtw_distance,
    )

    r = dtw_distance(
        _two_type_events(spark, [3, 1, 4], [3, 1, 4])
    ).collect()[0]
    assert r["t"] == 3 and r["dtw"] == 0 and r["avg_cost"] == 0.0

    # a=[2,0,1], b=[1,1,0]: full DP by hand
    a, b = [2, 0, 1], [1, 1, 0]
    inf = 1 << 62
    prev = [0] + [inf] * 3
    for i in range(1, 4):
        cur = [inf]
        for j in range(1, 4):
            c = (a[i - 1] - b[j - 1]) ** 2
            cur.append(c + min(prev[j], cur[j - 1], prev[j - 1]))
        prev = cur
    r = dtw_distance(_two_type_events(spark, a, b)).collect()[0]
    assert r["dtw"] == prev[3]
    assert r["avg_cost"] == pytest.approx(prev[3] / 5.0)


def test_dtw_absorbs_time_shift_lockstep_does_not(spark):
    """A one-bucket-shifted copy of a spiky series: DTW stays near
    zero while the lockstep (diagonal-only) cost is large — the whole
    point of warping."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        dtw_distance,
    )

    base = [1, 9, 1, 1, 8, 1, 1, 7, 1]
    shifted = [1] + base[:-1]
    r = dtw_distance(_two_type_events(spark, base, shifted)).collect()[0]
    lockstep = sum((x - y) ** 2 for x, y in zip(base, shifted))
    assert r["dtw"] < lockstep / 4


def test_dtw_absent_key_zero_fills(spark):
    """ADVICE r6: an event type absent from the corpus yields an
    all-zero series (oracle parity), not a silently empty frame."""
    from k_means_using_mapreduce_spark.operators.timeseries import (
        dtw_distance,
    )

    df = _two_type_events(spark, [2, 0, 1], [0, 0, 0]).where(
        "event_type <> 'b'"
    )
    r = dtw_distance(df).collect()
    assert len(r) == 1
    # b-series zero-filled: DTW of [2,0,1] vs zeros = best warp cost
    assert r[0]["t"] == 3 and r[0]["dtw"] > 0
