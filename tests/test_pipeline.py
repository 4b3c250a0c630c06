"""End-to-end corpus preparation pipeline (operators/pipeline.py):
each stage's effect is observable on a crafted corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.pipeline import (
    PipelineConfig,
    prepare_corpus,
)

GOOD = (
    "the data pipeline reads input and writes output while the scheduler "
    "keeps all of the workers busy and the results are checked for errors "
    "and then stored in the table for later analysis by the team"
)
GOOD2 = (
    "a second document with the usual words about tables and queries and "
    "the ways that all of this data is grouped and joined and written out "
    "for people to read in their reports every single morning"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD, "web"),
        (2, GOOD, "web"),  # exact duplicate of 1
        (3, GOOD + " tiny extra tail words", "web"),  # near duplicate of 1
        (4, GOOD2, "books"),
        (5, "low quality", "web"),  # fails the quality gate
        (6, GOOD2 + " contact me me@spam.io today", "books"),  # near-dup w/ PII
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_full_pipeline_stages(spark, corpus):
    eval_df = spark.createDataFrame(
        [(100, GOOD2, "eval")], "doc_id long, text string, source string"
    )
    out, rep = prepare_corpus(corpus, eval_df, report=True)
    stages = dict(rep.stages)
    assert stages["input"] == 6
    assert stages["quality_gate"] == 5  # doc 5 dropped
    assert stages["exact_dedup"] == 4  # doc 2 dropped (copy of 1)
    assert stages["near_dedup"] == 2  # docs 3, 6 collapse into 1, 4
    # eval set IS doc 4's text -> decontamination drops it
    assert stages["decontaminated"] == 1
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_tokens"] > 0


def test_pipeline_redacts_before_hashing(spark, corpus):
    out, _ = prepare_corpus(corpus, report=False)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 6 survives near-dedup as a member of doc 4's group or alone;
    # whichever text survives, no raw email may remain anywhere
    assert all("me@spam.io" not in t for t in texts.values())


def test_pipeline_mixture_stage(spark, corpus):
    cfg = PipelineConfig(mixture_budget_frac=0.99)
    out, rep = prepare_corpus(corpus, config=cfg, report=True)
    stages = dict(rep.stages)
    assert "mixture_sampled" in stages
    assert stages["mixture_sampled"] <= stages["near_dedup"]


def test_pipeline_report_false_skips_stage_counts(spark, corpus):
    """report=False performs no per-stage count actions (near_dedup's
    internal LSH materialization still runs — it localCheckpoints its
    shared shingle relation — but no count() per stage)."""
    out, rep = prepare_corpus(corpus, report=False)
    assert rep.stages == []
    assert out.count() >= 1
