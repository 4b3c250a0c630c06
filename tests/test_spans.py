"""Substring-duplicate spans (operators/spans.py): gram grid coverage,
cross-document detection, interval merging, summary ratios, and the
plan shape (hash-keyed aggregation, no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.spans import (
    char_grams,
    duplicate_grams,
    duplicate_span_summary,
    duplicate_spans,
)
from k_means_using_mapreduce_spark.plans.explain import executed_plan

SHARED = "x" * 25 + "y" * 25  # 50-char verbatim block


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, SHARED + "unique tail one", "s1"),
        (2, SHARED + "another different tail", "s1"),
        (3, "entirely distinct content with no reuse at all here", "s2"),
        (4, "short", "s2"),  # shorter than gram_len -> no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_char_grams_grid(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    got = (
        char_grams(df, gram_len=4, stride=3)
        .orderBy("pos")
        .select("pos")
        .collect()
    )
    # offsets 0,3,6 (9 would overrun: 9+4 > 10)
    assert [r["pos"] for r in got] == [0, 3, 6]


def test_short_docs_emit_no_grams(docs):
    grams = char_grams(docs, gram_len=40, stride=10)
    assert grams.where(F.col("id") == 4).count() == 0


def test_same_slice_same_hash(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgh")], "doc_id long, text string"
    )
    g = char_grams(df, gram_len=8, stride=8).collect()
    assert len(g) == 2
    assert g[0]["gram_hash"] == g[1]["gram_hash"]


def test_duplicate_grams_min_and_max_docs(docs):
    grams = char_grams(docs, gram_len=20, stride=5)
    dup = duplicate_grams(grams, min_docs=2)
    # only the shared prefix block is duplicated
    assert dup.count() > 0
    capped = duplicate_grams(grams, min_docs=2, max_docs=1)
    assert capped.count() == 0  # every dup gram is in >=2 docs


def test_duplicate_grams_rejects_min_docs_one(docs):
    with pytest.raises(ValueError):
        duplicate_grams(char_grams(docs), min_docs=1)


def test_spans_cover_shared_block(docs):
    spans = duplicate_spans(docs, gram_len=20, stride=5, min_docs=2)
    rows = {r["id"]: r for r in spans.collect()}
    # docs 1 and 2 share the 50-char block; 3 and 4 have no spans
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["span_start"] == 0
        # maximal merged span reaches the end of the shared block
        assert r["span_end"] >= len(SHARED) - 5  # grid resolution slack
        assert r["n_grams"] >= 2


def test_adjacent_grams_merge_into_one_span(spark):
    # stride == gram_len: grams touch but never overlap; adjacency must
    # still merge them into a single span
    block = "abcdefghij" * 4  # 40 chars
    df = spark.createDataFrame(
        [(1, block), (2, block)], "doc_id long, text string"
    )
    spans = duplicate_spans(df, gram_len=10, stride=10, min_docs=2)
    got = spans.where(F.col("id") == 1).collect()
    assert len(got) == 1
    assert (got[0]["span_start"], got[0]["span_end"]) == (0, 40)
    assert got[0]["n_grams"] == 4


def test_disjoint_duplicated_regions_stay_separate(spark):
    shared_a = "A" * 20
    shared_b = "B" * 20
    filler1 = "m" * 30
    filler2 = "n" * 30
    df = spark.createDataFrame(
        [
            (1, shared_a + filler1 + shared_b),
            (2, shared_a + filler2 + shared_b),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_spans(df, gram_len=10, stride=5, min_docs=2)
    per_doc = (
        spans.groupBy("id").agg(F.count("*").alias("k")).orderBy("id").collect()
    )
    assert [r["k"] for r in per_doc] == [2, 2]


def test_summary_ratio_and_counts(docs):
    out = duplicate_span_summary(
        docs, gram_len=20, stride=5, min_docs=2
    ).orderBy("source").collect()
    by_src = {r["source"]: r for r in out}
    assert by_src["s1"]["docs_with_dups"] == 2
    assert by_src["s2"]["docs_with_dups"] == 0
    assert by_src["s2"]["dup_chars"] == 0
    assert 0.0 < by_src["s1"]["dup_char_ratio"] <= 1.0


def test_plan_no_cartesian(docs):
    spans = duplicate_spans(docs, gram_len=20, stride=5, min_docs=2)
    spans.write.format("noop").mode("overwrite").save()
    plan = executed_plan(spans)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_param_validation(docs):
    with pytest.raises(ValueError):
        char_grams(docs, gram_len=1)
    with pytest.raises(ValueError):
        char_grams(docs, stride=0)
