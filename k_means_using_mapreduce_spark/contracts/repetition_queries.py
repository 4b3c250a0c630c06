"""Repetition / novelty contract queries (documents table).

Gopher-style repeated-n-gram cut signals and corpus-level shingle
novelty — see operators/repetition.py for the scale rationale. All
ratios are single divisions of exact integers, so the driver's value
hash matches without rounding slack.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.repetition import repetition_stats, shingle_novelty
from ..sources.loaders import load_table
from ._sql_text import sql_shingles


def repetition_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"), n=2)


REPETITION_STATS_SQL = f"""
WITH grams AS (
  SELECT doc_id, unnest({sql_shingles('text', 2)}) AS gram FROM documents
), counts AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
), ranked AS (
  SELECT *, max(c) OVER (PARTITION BY doc_id) AS maxc FROM counts
)
SELECT doc_id,
  CAST(sum(c) AS INTEGER) AS n_grams,
  CAST(count(*) AS INTEGER) AS distinct_grams,
  CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_gram_frac,
  CAST(max(c) AS DOUBLE) / sum(c) AS top_gram_frac,
  min(CASE WHEN c = maxc THEN gram END) AS top_gram
FROM ranked GROUP BY doc_id
"""


def shingle_novelty_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingle_novelty(load_table(spark, sf_dir, "documents"), shingle_n=3)


SHINGLE_NOVELTY_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest({sql_shingles('text', 3)}) AS sh FROM documents)
), freq AS (
  SELECT h, count(*) AS n_docs FROM pairs GROUP BY h
)
SELECT doc_id,
  CAST(count(*) AS INTEGER) AS distinct_shingles,
  CAST(sum(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
    AS novel_frac
FROM pairs JOIN freq USING (h) GROUP BY doc_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "repetition_stats_documents": repetition_stats_documents,
    "shingle_novelty_documents": shingle_novelty_documents,
}

ORACLE_SQL: dict[str, str] = {
    "repetition_stats_documents": REPETITION_STATS_SQL,
    "shingle_novelty_documents": SHINGLE_NOVELTY_SQL,
}
