"""Watermarked stream-stream joins: inner matches within the interval,
out-of-window rows excluded, outer rows emitted once the watermark
proves no match, and stream/batch agreement.
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.streaming import purchase_click_attribution

PURCHASE_SCHEMA = "user_id LONG, order_id LONG, purchase_ts STRING"
CLICK_SCHEMA = "user_id LONG, click_id LONG, click_ts STRING"


def _write_batch(d, name, rows):
    with open(d / f"{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _streams(spark, tmp_path):
    pd_ = tmp_path / "purchases"
    cd = tmp_path / "clicks"
    pd_.mkdir()
    cd.mkdir()
    purchases = (
        spark.readStream.schema(PURCHASE_SCHEMA)
        .json(str(pd_))
        .withColumn("purchase_ts", F.to_timestamp("purchase_ts"))
    )
    clicks = (
        spark.readStream.schema(CLICK_SCHEMA)
        .json(str(cd))
        .withColumn("click_ts", F.to_timestamp("click_ts"))
    )
    return pd_, cd, purchases, clicks


PURCHASES = [
    {"user_id": 1, "order_id": 100, "purchase_ts": "2024-01-01 01:00:00"},
    {"user_id": 2, "order_id": 200, "purchase_ts": "2024-01-01 01:00:00"},
]
CLICKS = [
    # u1: one click inside the 30-min window, one before it, one after purchase
    {"user_id": 1, "click_id": 10, "click_ts": "2024-01-01 00:45:00"},
    {"user_id": 1, "click_id": 11, "click_ts": "2024-01-01 00:10:00"},
    {"user_id": 1, "click_id": 12, "click_ts": "2024-01-01 01:05:00"},
    # u3: matching window but wrong key
    {"user_id": 3, "click_id": 30, "click_ts": "2024-01-01 00:50:00"},
]


def _drain(spark, q, table, want, secs=60):
    deadline = time.time() + secs
    rows = []
    while time.time() < deadline and len(rows) < want:
        q.processAllAvailable()
        rows = spark.sql(f"select * from {table}").collect()
    return rows


def test_inner_join_window_semantics(spark, tmp_path):
    """Only the same-user click inside [purchase-30min, purchase]
    joins: earlier clicks, later clicks, and other users' clicks are
    all excluded."""
    pd_, cd, purchases, clicks = _streams(spark, tmp_path)
    _write_batch(pd_, "b0", PURCHASES)
    _write_batch(cd, "b0", CLICKS)
    out = purchase_click_attribution(purchases, clicks)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_inner")
        .outputMode("append")
        .start()
    )
    try:
        rows = _drain(spark, q, "attr_inner", want=1)
        got = [(r["user_id"], r["order_id"], r["click_id"]) for r in rows]
        assert got == [(1, 100, 10)]
    finally:
        q.stop()


def test_stream_matches_batch_join(spark, tmp_path):
    """The streaming interval join and the equivalent batch range join
    produce the same pair set on the same data."""
    pd_, cd, purchases, clicks = _streams(spark, tmp_path)
    _write_batch(pd_, "b0", PURCHASES)
    _write_batch(cd, "b0", CLICKS)
    out = purchase_click_attribution(purchases, clicks)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_sb")
        .outputMode("append")
        .start()
    )
    try:
        rows = _drain(spark, q, "attr_sb", want=1)
        stream_pairs = sorted((r["order_id"], r["click_id"]) for r in rows)
    finally:
        q.stop()

    p = spark.createDataFrame(
        [(r["user_id"], r["order_id"], r["purchase_ts"]) for r in PURCHASES],
        PURCHASE_SCHEMA,
    ).withColumn("purchase_ts", F.to_timestamp("purchase_ts"))
    c = spark.createDataFrame(
        [(r["user_id"], r["click_id"], r["click_ts"]) for r in CLICKS],
        CLICK_SCHEMA,
    ).withColumn("click_ts", F.to_timestamp("click_ts"))
    batch_pairs = sorted(
        (r["order_id"], r["click_id"])
        for r in p.join(
            c,
            (p.user_id == c.user_id)
            & (c.click_ts >= p.purchase_ts - F.expr("interval 30 minutes"))
            & (c.click_ts <= p.purchase_ts),
        ).collect()
    )
    assert stream_pairs == batch_pairs == [(100, 10)]


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter: the purchase with no qualifying click emits a
    null-click row — but only after the click-side watermark passes the
    end of its match window (forced here by a far-later batch)."""
    pd_, cd, purchases, clicks = _streams(spark, tmp_path)
    _write_batch(pd_, "b0", PURCHASES)
    _write_batch(cd, "b0", CLICKS)
    out = purchase_click_attribution(
        purchases, clicks, watermark="1 minute", how="leftOuter"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_outer")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance both watermarks far past every match window
        _write_batch(
            pd_,
            "b1",
            [{"user_id": 9, "order_id": 900, "purchase_ts": "2024-01-01 09:00:00"}],
        )
        _write_batch(
            cd,
            "b1",
            [{"user_id": 9, "click_id": 90, "click_ts": "2024-01-01 09:00:00"}],
        )
        rows = _drain(spark, q, "attr_outer", want=2)
        by_order = {r["order_id"]: r["click_id"] for r in rows}
        assert by_order[100] == 10  # matched pair
        assert 200 in by_order and by_order[200] is None  # emitted as unmatched
    finally:
        q.stop()


def test_stream_stream_join_rejects_shared_payload_columns(spark):
    """Review regression: same-named payload columns on both sides
    would make the output projection ambiguous — rejected up front."""
    import pytest as _pytest

    from k_means_using_mapreduce_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    left = spark.createDataFrame(
        [], "k string, lts timestamp, region string"
    )
    right = spark.createDataFrame(
        [], "k string, rts timestamp, region string"
    )
    with _pytest.raises(ValueError, match="region"):
        stream_stream_interval_join(
            left, right, key="k", left_ts="lts", right_ts="rts"
        )
