"""Change-feed sink (streaming/changefeed.py): per-batch CDC emission,
replay no-op, snapshot/feed consistency, and consumer checkpoint reads."""

from __future__ import annotations

import json

from k_means_using_mapreduce_spark.streaming.changefeed import ChangeFeedSink


def _feed_rows(sink, since=None):
    return sorted(
        (r["k"], r["change"], r["batch"])
        for r in sink.feed(since_batch=since).collect()
    )


def test_feed_classifies_per_batch(spark, tmp_path):
    sink = ChangeFeedSink(spark, str(tmp_path / "state"), ["k"])
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    sink(b0, 0)
    assert _feed_rows(sink) == [(1, "added", 0), (2, "added", 0)]

    # batch 1: key 2 rewritten, key 3 new, key 1 untouched
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    sink(b1, 1)
    assert _feed_rows(sink) == [
        (1, "added", 0),
        (2, "added", 0),
        (2, "changed", 1),
        (3, "added", 1),
    ]
    # an upsert with the SAME value is invisible to the feed
    sink(spark.createDataFrame([(3, "c")], "k int, v string"), 2)
    assert _feed_rows(sink, since=1) == []

    # snapshot agrees with the replayed feed
    snap = {r["k"]: r["v"] for r in sink.current().collect()}
    assert snap == {1: "a", 2: "B", 3: "c"}


def test_replay_emits_nothing_twice(spark, tmp_path):
    sink = ChangeFeedSink(spark, str(tmp_path / "state"), ["k"])
    b0 = spark.createDataFrame([(1, "a")], "k int, v string")
    sink(b0, 0)
    before = _feed_rows(sink)
    sink(b0, 0)  # replayed batch id: neither snapshot nor feed move
    assert _feed_rows(sink) == before == [(1, "added", 0)]


def test_streaming_source_end_to_end(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "b0.json", "w") as fh:
        for i in range(6):
            fh.write(json.dumps({"k": i, "v": f"v{i}"}) + "\n")
    sink = ChangeFeedSink(spark, str(tmp_path / "state"), ["k"])
    src = spark.readStream.schema("k long, v string").json(str(d))
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    feed = sink.feed()
    assert feed.count() == 6
    assert {r["change"] for r in feed.collect()} == {"added"}
    # consumer checkpoint semantics: nothing after the only batch
    assert sink.feed(since_batch=feed.agg({"batch": "max"}).first()[0]).count() == 0


def test_feed_hides_uncommitted_batch(spark, tmp_path):
    """Crash window: the per-batch feed subtree lands BEFORE the
    snapshot marker commits. A feed directory whose batch id is past
    the committed marker must be invisible to consumers until the
    replayed batch commits it (round-3 advice)."""
    sink = ChangeFeedSink(spark, str(tmp_path / "state"), ["k"])
    sink(spark.createDataFrame([(1, "a")], "k int, v string"), 0)
    # simulate the crash: feed for batch 1 written, marker still at 0
    orphan = spark.createDataFrame(
        [(9, "added")], "k int, change string"
    )
    orphan.write.mode("overwrite").parquet(str(tmp_path / "state" / "_feed" / "batch=1"))
    assert _feed_rows(sink) == [(1, "added", 0)]  # orphan invisible
    # the replayed batch 1 commits normally and the feed catches up
    sink(spark.createDataFrame([(9, "z")], "k int, v string"), 1)
    assert (9, "added", 1) in _feed_rows(sink)
