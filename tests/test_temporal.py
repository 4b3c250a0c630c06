"""Semantics tests for temporal operators (sessionize / asof_join /
time_bucket) on hand-built data with known answers, plus multi-level
grouping invariants for the rollup/cube contract queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.contracts import rollup_queries
from k_means_using_mapreduce_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
    time_bucket,
)

M = 60 * 1_000_000_000  # one minute in ns


@pytest.fixture(scope="module")
def events(spark):
    # user 1: events at t=0,10m,50m (gap 40m splits) ; user 2: single event
    rows = [
        (1, 1, 0 * M, "click"),
        (2, 1, 10 * M, "purchase"),
        (3, 1, 50 * M, "click"),
        (4, 2, 5 * M, "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )


class TestSessionize:
    def test_gap_splits_sessions(self, events):
        out = {
            r["event_id"]: r["session_seq"]
            for r in sessionize(events, gap_ns=30 * M).collect()
        }
        assert out == {1: 1, 2: 1, 3: 2, 4: 1}

    def test_gap_exactly_equal_stays_in_session(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 0, "a"), (2, 1, 30 * M, "a"), (3, 1, 30 * M + 30 * M + 1, "a")],
            "event_id long, user_id long, ts long, event_type string",
        )
        # strict > gap starts a new session: 30m gap keeps, 30m+1ns splits
        seqs = [
            r["session_seq"]
            for r in sessionize(df, gap_ns=30 * M).orderBy("event_id").collect()
        ]
        assert seqs == [1, 1, 2]

    def test_session_stats(self, events):
        stats = {
            (r["user_id"], r["session_seq"]): (
                r["n_events"],
                r["duration_ns"],
                r["n_event_types"],
            )
            for r in session_stats(events, gap_ns=30 * M).collect()
        }
        assert stats == {
            (1, 1): (2, 10 * M, 2),
            (1, 2): (1, 0, 1),
            (2, 1): (1, 0, 1),
        }


class TestAsofJoin:
    def test_backward_inclusive_and_null(self, spark):
        left = spark.createDataFrame(
            [(1, 100, 10), (1, 200, 20), (1, 50, 5), (2, 100, 1)],
            "user_id long, ts long, lval long",
        )
        right = spark.createDataFrame(
            [(1, 100, "a"), (1, 150, "b"), (3, 1, "z")],
            "user_id long, ts long, tag string",
        )
        out = {
            (r["user_id"], r["ts"]): r["asof_tag"]
            for r in asof_join(
                left,
                right,
                by="user_id",
                left_ts="ts",
                right_ts="ts",
                right_cols=["tag"],
            ).collect()
        }
        assert out == {
            (1, 50): None,  # no prior right row
            (1, 100): "a",  # inclusive: equal ts matches
            (1, 200): "b",  # latest prior wins
            (2, 100): None,  # key never in right
        }

    def test_no_row_amplification(self, spark):
        left = spark.range(100).select(
            F.lit(1).alias("user_id"), F.col("id").alias("ts")
        )
        right = spark.range(500).select(
            F.lit(1).alias("user_id"), (F.col("id") % 50).alias("ts"),
            F.col("id").alias("rid"),
        )
        joined = asof_join(
            left, right, by="user_id", left_ts="ts", right_ts="ts",
            right_cols=["rid"],
        )
        assert joined.count() == 100

    def test_right_order_tiebreak_picks_max(self, spark):
        left = spark.createDataFrame([(1, 100)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(1, 100, 7), (1, 100, 9), (1, 100, 3)],
            "user_id long, ts long, rid long",
        )
        out = asof_join(
            left, right, by="user_id", left_ts="ts", right_ts="ts",
            right_cols=["rid"], right_order="rid",
        ).collect()
        assert [r["asof_rid"] for r in out] == [9]
        with pytest.raises(ValueError, match="right_order"):
            asof_join(left, right, by="user_id", left_ts="ts", right_ts="ts",
                      right_cols=["rid"], right_order="nope")

    def test_forward_inclusive_and_null(self, spark):
        left = spark.createDataFrame(
            [(1, 100), (1, 160), (1, 300), (2, 100)],
            "user_id long, ts long",
        )
        right = spark.createDataFrame(
            [(1, 100, "a"), (1, 150, "b"), (3, 1, "z")],
            "user_id long, ts long, tag string",
        )
        out = {
            (r["user_id"], r["ts"]): r["asof_tag"]
            for r in asof_join(
                left, right, by="user_id", left_ts="ts", right_ts="ts",
                right_cols=["tag"], direction="forward",
            ).collect()
        }
        assert out == {
            (1, 100): "a",  # inclusive: equal ts matches
            (1, 160): None,  # no following right row
            (1, 300): None,
            (2, 100): None,
        }

    def test_forward_picks_earliest_following(self, spark):
        left = spark.createDataFrame([(1, 100)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(1, 120, "near"), (1, 500, "far")],
            "user_id long, ts long, tag string",
        )
        out = asof_join(
            left, right, by="user_id", left_ts="ts", right_ts="ts",
            right_cols=["tag"], direction="forward",
        ).collect()
        assert [r["asof_tag"] for r in out] == ["near"]

    def test_forward_tiebreak_picks_max(self, spark):
        left = spark.createDataFrame([(1, 100)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(1, 100, 7), (1, 100, 9), (1, 100, 3)],
            "user_id long, ts long, rid long",
        )
        out = asof_join(
            left, right, by="user_id", left_ts="ts", right_ts="ts",
            right_cols=["rid"], right_order="rid", direction="forward",
        ).collect()
        assert [r["asof_rid"] for r in out] == [9]

    def test_tolerance_nulls_far_matches(self, spark):
        left = spark.createDataFrame(
            [(1, 100), (1, 400)], "user_id long, ts long"
        )
        right = spark.createDataFrame(
            [(1, 90, "x")], "user_id long, ts long, tag string"
        )
        out = {
            r["ts"]: r["asof_tag"]
            for r in asof_join(
                left, right, by="user_id", left_ts="ts", right_ts="ts",
                right_cols=["tag"], tolerance=50,
            ).collect()
        }
        assert out == {100: "x", 400: None}  # gap 310 > 50 -> nulled
        fwd = {
            r["ts"]: r["asof_tag"]
            for r in asof_join(
                left, right.withColumn("ts", F.lit(420)),
                by="user_id", left_ts="ts", right_ts="ts",
                right_cols=["tag"], direction="forward", tolerance=50,
            ).collect()
        }
        assert fwd == {100: None, 400: "x"}

    def test_nearest_picks_smaller_gap(self, spark):
        left = spark.createDataFrame(
            [(1, 100), (1, 200), (1, 310)], "user_id long, ts long"
        )
        right = spark.createDataFrame(
            [(1, 90, "b90"), (1, 220, "f220"), (1, 300, "b300")],
            "user_id long, ts long, tag string",
        )
        out = {
            r["ts"]: r["asof_tag"]
            for r in asof_join(
                left, right, by="user_id", left_ts="ts", right_ts="ts",
                right_cols=["tag"], direction="nearest",
            ).collect()
        }
        # 100: back gap 10 vs fwd gap 120 -> b90
        # 200: back gap 110 vs fwd gap 20 -> f220
        # 310: back gap 10 vs fwd gap none -> b300
        assert out == {100: "b90", 200: "f220", 310: "b300"}

    def test_nearest_tie_prefers_backward(self, spark):
        left = spark.createDataFrame([(1, 100)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(1, 90, "b"), (1, 110, "f")], "user_id long, ts long, tag string"
        )
        out = asof_join(
            left, right, by="user_id", left_ts="ts", right_ts="ts",
            right_cols=["tag"], direction="nearest",
        ).collect()
        assert out[0]["asof_tag"] == "b"
        # equal ts counts as backward with gap 0
        right2 = spark.createDataFrame(
            [(1, 100, "eq"), (1, 101, "f")], "user_id long, ts long, tag string"
        )
        out2 = asof_join(
            left, right2, by="user_id", left_ts="ts", right_ts="ts",
            right_cols=["tag"], direction="nearest",
        ).collect()
        assert out2[0]["asof_tag"] == "eq"

    def test_nearest_with_tolerance_and_order(self, spark):
        left = spark.createDataFrame([(1, 100), (1, 500)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(1, 130, 7), (1, 130, 9)], "user_id long, ts long, rid long"
        )
        out = {
            r["ts"]: r["asof_rid"]
            for r in asof_join(
                left, right, by="user_id", left_ts="ts", right_ts="ts",
                right_cols=["rid"], right_order="rid",
                direction="nearest", tolerance=50,
            ).collect()
        }
        assert out == {100: 9, 500: None}  # max-rid tie-break; 370 > 50

    def test_nearest_single_exchange(self, spark):
        from k_means_using_mapreduce_spark.plans.explain import exchange_count

        left = spark.createDataFrame([(1, 100)], "user_id long, ts long")
        right = spark.createDataFrame(
            [(1, 90, "x")], "user_id long, ts long, tag string"
        )
        df = asof_join(
            left, right, by="user_id", left_ts="ts", right_ts="ts",
            right_cols=["tag"], direction="nearest",
        )
        df.write.format("noop").mode("overwrite").save()
        assert exchange_count(df) == 1

    def test_direction_validated(self, spark):
        df = spark.createDataFrame([(1, 1)], "user_id long, ts long")
        with pytest.raises(ValueError, match="direction"):
            asof_join(df, df, by="user_id", left_ts="ts", right_ts="ts",
                      right_cols=["ts"], direction="sideways")
        with pytest.raises(ValueError, match="tolerance"):
            asof_join(df, df, by="user_id", left_ts="ts", right_ts="ts",
                      right_cols=["ts"], tolerance=-1)

    def test_reserved_column_rejected(self, spark):
        df = spark.range(1).select(
            F.lit(1).alias("user_id"), F.lit(1).alias("ts"),
            F.lit(0).alias("_asof_side"),
        )
        with pytest.raises(ValueError, match="_asof_side"):
            asof_join(df, df, by="user_id", left_ts="ts", right_ts="ts",
                      right_cols=["ts"])


def test_time_bucket_floors(spark):
    df = spark.range(1).select(
        time_bucket(F.lit(3_600_000_000_123).cast("long"), 3_600_000_000_000).alias("b"),
        # pre-epoch: true floor, not truncation toward zero
        time_bucket(F.lit(-1500).cast("long"), 1000).alias("neg"),
    )
    row = df.collect()[0]
    assert row["b"] == 3_600_000_000_000
    assert row["neg"] == -2000


class TestRollupQueries:
    def test_rollup_levels(self, spark, sf_small):
        rows = rollup_queries.acctbal_rollup_region_nation(
            spark, sf_small
        ).collect()
        grand = [r for r in rows if r["g_region"] == 1 and r["g_nation"] == 1]
        assert len(grand) == 1 and grand[0]["r_name"] is None
        per_region = [r for r in rows if r["g_region"] == 0 and r["g_nation"] == 1]
        per_nation = [r for r in rows if r["g_region"] == 0 and r["g_nation"] == 0]
        assert grand[0]["n_customers"] == sum(r["n_customers"] for r in per_region)
        assert grand[0]["n_customers"] == sum(r["n_customers"] for r in per_nation)

    def test_cube_levels(self, spark, sf_small):
        rows = rollup_queries.lineitem_cube_flags(spark, sf_small).collect()
        # 2^2 grouping levels present
        levels = {(r["g_returnflag"], r["g_linestatus"]) for r in rows}
        assert levels == {(0, 0), (0, 1), (1, 0), (1, 1)}
        grand = [r for r in rows if r["g_returnflag"] and r["g_linestatus"]]
        detail = [r for r in rows if not r["g_returnflag"] and not r["g_linestatus"]]
        assert grand[0]["n_items"] == sum(r["n_items"] for r in detail)


def test_interval_bucket_join_matches_naive(spark):
    """Bucketized range join == cross-join + BETWEEN filter, including
    intervals spanning bucket boundaries and empty matches."""
    from k_means_using_mapreduce_spark.operators.temporal import (
        interval_bucket_join,
    )

    pts = spark.createDataFrame(
        [(i, f"2020-01-{d:02d} {h:02d}:30:00") for i, (d, h) in enumerate(
            [(1, 0), (1, 23), (2, 5), (3, 12), (5, 0), (9, 18)]
        )],
        "pid long, ts_s string",
    ).select("pid", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    iv = spark.createDataFrame(
        [
            (100, "2020-01-01 12:00:00", "2020-01-03 00:00:00"),
            (200, "2020-01-02 00:00:00", "2020-01-02 06:00:00"),
            (300, "2020-01-06 00:00:00", "2020-01-08 00:00:00"),  # empty
        ],
        "iid long, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp_ntz").alias("start"),
        F.col("e").cast("timestamp_ntz").alias("end"),
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_bucket_join(pts, iv, "ts", "start", "end").collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(iv)
        .where((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    )
    assert got == naive and len(got) == 3


def test_interval_bucket_join_multiday_buckets(spark):
    """bucket_days > 1 must match the naive join: both sides bucket on a
    COMMON epoch-anchored grid (ADVICE r2 — the old interval-anchored
    stride silently dropped matches)."""
    from k_means_using_mapreduce_spark.operators.temporal import (
        interval_bucket_join,
    )

    pts = spark.createDataFrame(
        [(i, f"2020-01-{d:02d} 12:00:00") for i, d in enumerate(
            [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
        )],
        "pid long, ts_s string",
    ).select("pid", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    iv = spark.createDataFrame(
        [
            (100, "2020-01-01 00:00:00", "2020-01-05 06:00:00"),  # day0-day4
            (200, "2020-01-03 18:00:00", "2020-01-04 06:00:00"),
            (300, "2020-01-08 00:00:00", "2020-01-09 00:00:00"),
        ],
        "iid long, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp_ntz").alias("start"),
        F.col("e").cast("timestamp_ntz").alias("end"),
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(iv)
        .where((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    )
    for bucket_days in (1, 2, 3, 7):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_bucket_join(
                pts, iv, "ts", "start", "end", bucket_days=bucket_days
            ).collect()
        )
        assert got == naive, f"bucket_days={bucket_days}"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        interval_bucket_join(pts, iv, "ts", "start", "end", bucket_days=0)


def test_latest_by_key_cdc_compaction(spark):
    import pytest as _pytest

    from k_means_using_mapreduce_spark.operators.temporal import latest_by_key

    rows = [
        (1, 10, "a"), (1, 20, "b"),          # user 1: keep v=20
        (2, 5, "c"),                          # singleton
        (3, 7, "d"), (3, 7, "e"),             # tie on ts -> id breaks it
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, payload string")
    out = {r["user_id"]: r for r in latest_by_key(df, ["user_id"], ["ts", "payload"]).collect()}
    assert out[1]["payload"] == "b"
    assert out[2]["payload"] == "c"
    assert out[3]["payload"] == "e"
    assert len(out) == 3
    with _pytest.raises(ValueError):
        latest_by_key(df, [], ["ts"])


def test_merge_intervals_islands(spark):
    from k_means_using_mapreduce_spark.operators.temporal import merge_intervals

    rows = [
        ("u", 0, 10), ("u", 5, 12),    # overlap -> one island
        ("u", 12, 20),                  # touching joins (half-open union)
        ("u", 30, 40),                  # gap -> new island
        ("u", 31, 33),                  # nested inside previous
        ("v", 0, 1),                    # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = merge_intervals(df, key_col="k", start_col="s", end_col="e")
    got = sorted(
        (r["k"], r["start"], r["end"], r["n_merged"]) for r in out.collect()
    )
    assert got == [("u", 0, 20, 3), ("u", 30, 40, 2), ("v", 0, 1, 1)]


def test_scd2_history_collapse_and_intervals(spark):
    import pytest as _pytest

    from k_means_using_mapreduce_spark.operators.temporal import scd2_history

    rows = [
        (1, 10, "free"),
        (1, 20, "free"),   # restated identical state: collapsed away
        (1, 30, "pro"),
        (1, 40, "free"),   # back to a previous value = a NEW interval
        (2, 15, "pro"),
    ]
    df = spark.createDataFrame(rows, "user long, ts long, plan string")
    out = scd2_history(df, key_col="user", ts_col="ts", attr_cols=["plan"])
    got = sorted(
        (r["user"], r["valid_from"], r["valid_to"], r["plan"], r["is_current"])
        for r in out.collect()
    )
    assert got == [
        (1, 10, 30, "free", False),
        (1, 30, 40, "pro", False),
        (1, 40, None, "free", True),
        (2, 15, None, "pro", True),
    ]
    capped = scd2_history(
        df, key_col="user", ts_col="ts", attr_cols=["plan"], end_of_time=999
    )
    assert {r["valid_to"] for r in capped.collect() if r["is_current"]} == {999}
    with _pytest.raises(ValueError):
        scd2_history(df, key_col="user", ts_col="ts", attr_cols=[])


def test_debounce_burst_collapse(spark):
    import pytest as _pytest

    from k_means_using_mapreduce_spark.operators.temporal import debounce

    rows = [
        ("u", 0), ("u", 3), ("u", 5),    # burst -> keep t=0
        ("u", 20), ("u", 24),            # next burst -> keep t=20
        ("v", 0), ("v", 10),             # gap == within: both kept
    ]
    df = spark.createDataFrame(rows, "k string, ts long")
    out = sorted(
        (r["k"], r["ts"])
        for r in debounce(df, key_cols=["k"], ts_col="ts", within=10).collect()
    )
    assert out == [("u", 0), ("u", 20), ("v", 0), ("v", 10)]
    with _pytest.raises(ValueError):
        debounce(df, key_cols=[], ts_col="ts", within=10)


def test_rfm_scores_orderings(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.temporal import rfm_scores

    # 10 users: user i has i+1 events, last at hour i, spend 10*i
    hour = 3_600_000_000
    rows = []
    for u in range(10):
        for j in range(u + 1):
            rows.append((u, j * 60_000_000 + u * hour, 10.0 * u / (u + 1)))
    df = spark.createDataFrame(
        rows, "user_id long, us long, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("us")))
    out = {r["user"]: r for r in rfm_scores(df).collect()}
    # user 9: most recent, most frequent, highest spend -> all 5s
    assert (out[9]["r_score"], out[9]["f_score"], out[9]["m_score"]) == (5, 5, 5)
    # user 0: oldest, least frequent, zero spend -> all 1s
    assert (out[0]["r_score"], out[0]["f_score"], out[0]["m_score"]) == (1, 1, 1)
    assert out[0]["recency_us"] > out[9]["recency_us"] == 0
    import pytest as _p

    with _p.raises(ValueError):
        rfm_scores(df, bins=1)
