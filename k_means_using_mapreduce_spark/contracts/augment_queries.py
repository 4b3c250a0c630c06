"""Augmentation contracts (operators/augment.py): deterministic token
dropout over the documents table — per-document survivor hashes and
the corpus dropout accounting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import load_table

_DROP_PCT = 10


def augment_dropout_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document token dropout (operators/augment.py::token_dropout,
    10% hash-coin rate): token counts before/after and the md5 of the
    space-joined surviving tokens — content gated through a hash so
    the engines must drop EXACTLY the same positions."""
    from ..operators.augment import token_dropout

    return token_dropout(
        load_table(spark, sf_dir, "documents"), drop_pct=_DROP_PCT
    )


def augment_summary_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus dropout accounting (operators/augment.py::
    dropout_summary): realized rate must sit at the nominal 10%."""
    from ..operators.augment import dropout_summary

    return dropout_summary(
        load_table(spark, sf_dir, "documents"), drop_pct=_DROP_PCT
    )


def _coin_sql(pos_expr: str) -> str:
    return (
        "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
        f"CAST({pos_expr} AS VARCHAR)), 1, 15))::BIGINT % 100)"
    )


_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
    "t -> t <> '')"
)

_DROPOUT_CORE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
),
kept AS (
  SELECT doc_id, len(ts) AS n_tokens,
         list_filter(ts, (t, i) -> {_coin_sql("i")} >= {_DROP_PCT}) AS ks
  FROM toks
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(ks) AS BIGINT) AS n_kept,
       md5(array_to_string(ks, ' ')) AS aug_md5
FROM kept
"""

AUGMENT_DROPOUT_SQL = _DROPOUT_CORE

AUGMENT_SUMMARY_SQL = f"""
WITH per AS ({_DROPOUT_CORE})
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
       CAST(sum(n_kept) AS BIGINT) AS tokens_after,
       1.0 - CAST(sum(n_kept) AS DOUBLE)
           / CAST(sum(n_tokens) AS DOUBLE) AS drop_rate
FROM per
"""

QUERIES = {
    "augment_dropout_documents": augment_dropout_documents,
    "augment_summary_documents": augment_summary_documents,
}
ORACLE_SQL = {
    "augment_dropout_documents": AUGMENT_DROPOUT_SQL,
    "augment_summary_documents": AUGMENT_SUMMARY_SQL,
}
