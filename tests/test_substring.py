"""Substring-level dedup (operators/substring.py): repeated n-gram
spans, keeper rule, interval merge, removal application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.substring import (
    ngram_occurrences,
    repeated_ngram_doc_stats,
    repeated_ngram_spans,
    strip_repeated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_planted_repeat_keeps_first_occurrence(spark):
    """A 4-token passage shared by three docs: the globally-first
    occurrence (lowest doc_id) is NOT marked; the other two docs get
    exactly the repeated window as their merged span."""
    boiler = "all rights reserved worldwide"
    df = _docs(
        spark,
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"other words here {boiler} tail tokens two"),
            (3, f"{boiler} leading copy case"),
        ],
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in repeated_ngram_spans(df, n=4).collect()
    }
    # doc 1 owns the first occurrence (start 2) -> unmarked
    assert 1 not in out
    assert out[2] == (3, 7, 4)
    assert out[3] == (0, 4, 4)


def test_spans_overlapping_windows_merge_into_one_island(spark):
    """A 6-token repeated passage at n=4 yields three overlapping
    duplicated windows (starts s, s+1, s+2) that must merge into ONE
    [s, s+6) span, not three."""
    passage = "the quick brown fox jumps high"
    df = _docs(
        spark,
        [
            (1, f"{passage} unique one two"),
            (2, f"prefix tokens {passage}"),
        ],
    )
    out = repeated_ngram_spans(df, n=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) == (
        2,
        2,
        8,
        6,
    )


def test_spans_disjoint_islands_stay_separate(spark):
    """Two repeated 3-grams separated by unique tokens in the same doc
    produce two distinct merged spans."""
    df = _docs(
        spark,
        [
            (1, "aa bb cc xx yy zz"),
            (2, "aa bb cc qq ww ee rr xx yy zz"),
        ],
    )
    out = sorted(
        (r["span_start"], r["span_end"])
        for r in repeated_ngram_spans(df, n=3)
        .where(F.col("doc_id") == 2)
        .collect()
    )
    assert out == [(0, 3), (7, 10)]


def test_within_doc_repeat_is_marked(spark):
    """The same gram twice in ONE document: the second occurrence is a
    duplicate of the first (start order breaks the tie)."""
    df = _docs(spark, [(5, "x1 x2 x3 pad1 pad2 x1 x2 x3")])
    out = repeated_ngram_spans(df, n=3).collect()
    assert len(out) == 1
    assert (out[0]["span_start"], out[0]["span_end"]) == (5, 8)


def test_short_docs_and_guards(spark):
    df = _docs(spark, [(1, "one two"), (2, "one two"), (3, None)])
    # both docs shorter than n: no occurrences, no spans (positional
    # windows have no whole-document fallback)
    assert ngram_occurrences(df, n=3).count() == 0
    assert repeated_ngram_spans(df, n=3).count() == 0
    with pytest.raises(ValueError, match="n must be"):
        ngram_occurrences(df, n=0)


def test_doc_stats_cover_all_docs_with_zeros(spark):
    df = _docs(
        spark,
        [
            (1, "p q r s t u"),
            (2, "p q r s other words here"),
            (3, "completely different text entirely"),
            (4, None),
        ],
    )
    out = {
        r["doc_id"]: (
            r["token_count"],
            r["n_spans"],
            r["dup_tokens"],
            r["dup_frac"],
        )
        for r in repeated_ngram_doc_stats(df, n=4).collect()
    }
    assert len(out) == 4
    assert out[2] == (7, 1, 4, pytest.approx(4 / 7))
    assert out[1][1:] == (0, 0, 0.0)  # keeper doc: no spans
    assert out[3][1:] == (0, 0, 0.0)


def test_strip_repeated_spans_removes_only_marked_tokens(spark):
    boiler = "all rights reserved worldwide"
    df = _docs(
        spark,
        [
            (1, f"alpha beta {boiler}"),
            (2, f"head {boiler} tail1 tail2"),
        ],
    )
    spans = repeated_ngram_spans(df, n=4)
    out = {
        r["doc_id"]: r["clean_text"]
        for r in strip_repeated_spans(df, spans).collect()
    }
    assert out[1] == f"alpha beta {boiler}"  # keeper untouched
    assert out[2] == "head tail1 tail2"


def test_spans_single_shuffle_per_stage_plan(spark):
    """Plan pin for the module docstring's claim: the groupBy after
    the per-doc interval-merge window reuses the window's hash
    partitioning on doc_id — exactly TWO exchanges total (gram-hash
    ranking, doc-id merge), not three."""
    df = _docs(spark, [(1, "a b c d e f g h i")])
    plan = (
        repeated_ngram_spans(df, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
