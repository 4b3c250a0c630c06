"""Substring-duplicate-span + BPE contract queries
(operators/spans.py, operators/bpe.py).

Span parameters: gram_len=40, stride=20 — a 40-char gram is ~6 words
of the synthetic vocabulary, long enough that chance collisions are
negligible and shared spans reflect real verbatim reuse (the corpus
contains planted near/exact duplicates, see dedup_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import pair_counts, word_counts
from ..operators.spans import duplicate_span_summary, duplicate_spans
from ..sources.loaders import load_table
from ._sql_text import sql_tokens

_GRAM = 40
_STRIDE = 20
_TOP_PAIRS = 30


def duplicate_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(
        docs, gram_len=_GRAM, stride=_STRIDE, min_docs=2
    ).select(
        F.col("id").alias("doc_id"),
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )


def _sql_spans(gram: int, stride: int) -> str:
    """DuckDB twin of operators/spans.py::duplicate_spans: the same
    grid offsets, the same 60-bit md5 gram hash, the same
    islands-and-gaps interval merge."""
    return f"""
grams0 AS (
  SELECT doc_id AS id,
         unnest(range(0, greatest(len(text) - {gram} + 1, 0), {stride})) AS gs,
         text
  FROM documents
),
grams AS (
  SELECT id, CAST(gs AS INT) AS pos,
         ('0x' || substr(md5(substr(text, CAST(gs AS INT) + 1, {gram})), 1, 15))::BIGINT AS gram_hash
  FROM grams0
),
dup AS (
  SELECT gram_hash FROM grams GROUP BY gram_hash
  HAVING count(DISTINCT id) >= 2
),
hits AS (
  SELECT id, pos FROM grams WHERE gram_hash IN (SELECT gram_hash FROM dup)
),
flagged AS (
  SELECT id, pos,
         CASE WHEN max(pos + {gram}) OVER (
                PARTITION BY id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > max(pos + {gram}) OVER (
                PARTITION BY id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ni
  FROM hits
),
isl AS (
  SELECT id, pos,
         sum(ni) OVER (PARTITION BY id ORDER BY pos) AS island
  FROM flagged
),
spans AS (
  SELECT id AS doc_id,
         CAST(min(pos) AS INT) AS span_start,
         CAST(max(pos) + {gram} AS INT) AS span_end,
         CAST(count(*) AS BIGINT) AS n_grams
  FROM isl GROUP BY id, island
)
"""


DUPLICATE_SPANS_SQL = f"""
WITH {_sql_spans(_GRAM, _STRIDE)}
SELECT doc_id, span_start, span_end, n_grams FROM spans
"""


def span_summary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_span_summary(
        docs, gram_len=_GRAM, stride=_STRIDE, min_docs=2
    ).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("docs_with_dups").cast("long").alias("docs_with_dups"),
        F.col("dup_chars").cast("long").alias("dup_chars"),
        F.col("n_spans").cast("long").alias("n_spans"),
        "dup_char_ratio",
    )


SPAN_SUMMARY_SQL = f"""
WITH {_sql_spans(_GRAM, _STRIDE)},
per_doc AS (
  SELECT doc_id,
         sum(span_end - span_start) AS dup_chars,
         count(*) AS n_spans
  FROM spans GROUP BY doc_id
),
joined AS (
  SELECT d.source,
         len(d.text) AS n_chars,
         coalesce(p.dup_chars, 0) AS dup_chars,
         coalesce(p.n_spans, 0) AS n_spans,
         CASE WHEN p.dup_chars IS NOT NULL THEN 1 ELSE 0 END AS has_dup
  FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(has_dup) AS BIGINT) AS docs_with_dups,
       CAST(sum(dup_chars) AS BIGINT) AS dup_chars,
       CAST(sum(n_spans) AS BIGINT) AS n_spans,
       round(CAST(sum(dup_chars) AS BIGINT) / CAST(sum(n_chars) AS BIGINT), 6)
         AS dup_char_ratio
FROM joined GROUP BY source
"""


def bpe_pair_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = word_counts(docs)
    return pair_counts(wc, top_k=_TOP_PAIRS).select(
        "pair", F.col("n_pairs").cast("long").alias("n_pairs")
    )


BPE_PAIR_COUNTS_SQL = f"""
WITH toks AS (SELECT {sql_tokens('text')} AS t FROM documents),
words AS (SELECT unnest(t) AS word FROM toks),
wc AS (SELECT word, count(*) AS n FROM words GROUP BY word),
widx AS (SELECT word, n, unnest(range(1, len(word))) AS gi FROM wc),
pairs AS (
  SELECT substr(word, CAST(gi AS INT), 1) || ' ' ||
         substr(word, CAST(gi AS INT) + 1, 1) AS pair, n
  FROM widx
)
SELECT pair, CAST(sum(n) AS BIGINT) AS n_pairs
FROM pairs GROUP BY pair
ORDER BY n_pairs DESC, pair ASC
LIMIT {_TOP_PAIRS}
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "duplicate_spans_documents": duplicate_spans_documents,
    "span_summary_documents": span_summary_documents,
    "bpe_pair_counts_documents": bpe_pair_counts_documents,
}

ORACLE_SQL: dict[str, str] = {
    "duplicate_spans_documents": DUPLICATE_SPANS_SQL,
    "span_summary_documents": SPAN_SUMMARY_SQL,
    "bpe_pair_counts_documents": BPE_PAIR_COUNTS_SQL,
}
