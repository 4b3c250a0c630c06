"""Line-level dedup (operators/lines.py): newline + token-window
segmentation, frequent-line detection, keep-first semantics, and the
plan shape (frequent set broadcast, no sort-merge self-join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.lines import (
    drop_frequent_lines,
    frequent_lines,
    segment_lines,
)
from k_means_using_mapreduce_spark.plans.explain import (
    broadcast_join_count,
    sort_merge_join_count,
)

BOILER = "subscribe to our newsletter"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"alpha beta gamma\n{BOILER}\ndelta"),
        (2, f"{BOILER}\nepsilon zeta"),
        (3, f"eta theta\n{BOILER}\niota kappa"),
        (4, "unique text only\nnothing shared"),
        (5, "   \n\n"),  # whitespace-only lines -> no segments
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_newline_segments_skip_blank_lines(docs):
    segs = segment_lines(docs)
    assert segs.where(F.col("doc_id") == 5).count() == 0
    got = [
        r["line"]
        for r in segs.where(F.col("doc_id") == 1).orderBy("line_no").collect()
    ]
    assert got == ["alpha beta gamma", BOILER, "delta"]


def test_window_segments_cover_all_tokens(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    segs = segment_lines(df, window=3).orderBy("line_no").collect()
    assert [r["line"] for r in segs] == ["a b c", "d e f", "g"]
    assert [r["line_no"] for r in segs] == [0, 1, 2]


def test_frequent_lines_counts_distinct_docs(spark):
    # a line repeated twice INSIDE one doc is not cross-doc boilerplate
    df = spark.createDataFrame(
        [(1, "dup\ndup"), (2, "other")], "doc_id long, text string"
    )
    assert frequent_lines(segment_lines(df), min_docs=2).count() == 0


def test_drop_frequent_lines_all_copies(docs):
    out = drop_frequent_lines(docs, min_docs=3)
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert by_id[1]["dropped_lines"] == 1
    assert by_id[1]["cleaned_text"] == "alpha beta gamma\ndelta"
    assert by_id[2]["cleaned_text"] == "epsilon zeta"
    assert by_id[4]["dropped_lines"] == 0
    # segment-less doc still gets its one row, zeroed
    assert by_id[5]["n_lines"] == 0 and by_id[5]["cleaned_text"] == ""


def test_drop_frequent_lines_keep_first(docs):
    out = drop_frequent_lines(docs, min_docs=3, keep_first=True)
    by_id = {r["doc_id"]: r for r in out.collect()}
    # lowest (doc_id, line_no) occurrence survives: doc 1
    assert by_id[1]["dropped_lines"] == 0
    assert BOILER in by_id[1]["cleaned_text"]
    assert by_id[2]["dropped_lines"] == 1
    assert by_id[3]["dropped_lines"] == 1


def test_validation(docs):
    with pytest.raises(ValueError):
        segment_lines(docs, window=0)
    with pytest.raises(ValueError):
        frequent_lines(segment_lines(docs), min_docs=0)


def test_plan_broadcasts_frequent_set(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    out = drop_frequent_lines(docs, window=3, min_docs=5)
    out.collect()
    assert broadcast_join_count(out) >= 1
    assert sort_merge_join_count(out) == 0
