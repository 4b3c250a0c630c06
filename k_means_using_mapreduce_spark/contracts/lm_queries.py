"""Unigram-LM scoring contract (operators/lm.py): the CCNet-style
perplexity-filter shape, self-scored (model fit on the corpus itself,
so every token is in-vocabulary and the oracle needs no unknown-mass
branch)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.lm import fit_unigram_model, score_documents, source_divergence
from ..sources.loaders import load_table
from ._sql_text import sql_tokens


def unigram_logprob_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    model = fit_unigram_model(docs)
    return score_documents(docs, model)


UNIGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS token FROM documents
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token
), tot AS (
  SELECT sum(n) AS total, count(*) AS vocab FROM counts
), model AS (
  SELECT token, ln((n + 1.0) / (total + 1.0 * (vocab + 1.0))) AS logprob
  FROM counts, tot
)
SELECT t.doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  sum(m.logprob) AS logprob_sum,
  avg(m.logprob) AS avg_logprob
FROM toks t JOIN model m USING (token)
GROUP BY t.doc_id
"""


def source_divergence_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return source_divergence(docs)


DIVERGENCE_SQL = f"""
WITH toks AS (
  SELECT source AS grp, unnest({sql_tokens('text')}) AS token FROM documents
), gcounts AS (
  SELECT grp, token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
), corpus AS (
  SELECT token, sum(n) AS cn FROM gcounts GROUP BY 1
), tot AS (
  SELECT sum(cn) AS ct FROM corpus
), gt AS (
  SELECT grp, sum(n) AS gtot FROM gcounts GROUP BY 1
)
SELECT g.grp AS source,
  CAST(any_value(gt.gtot) AS BIGINT) AS n_tokens,
  -sum((g.n / gt.gtot) * ln(g.n / gt.gtot)) AS entropy,
  sum((g.n / gt.gtot) * ln((g.n / gt.gtot) / (c.cn / t.ct))) AS kl_corpus
FROM gcounts g JOIN corpus c USING (token) JOIN gt USING (grp), tot t
GROUP BY g.grp
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "unigram_logprob_documents": unigram_logprob_documents,
    "source_divergence_documents": source_divergence_documents,
}

ORACLE_SQL: dict[str, str] = {
    "unigram_logprob_documents": UNIGRAM_SQL,
    "source_divergence_documents": DIVERGENCE_SQL,
}
