"""Dataset-card contract: the one-glance corpus summary a dataset
release ships with, composed from the engine's own text-analysis
stack (functions/text.py) — each metric a (metric, value) row so the
card is a single tidy relation.

Branch-per-metric (no multi-distinct Expand — the profile_table
lesson): every branch is a pruned single aggregate and the UNION
shares the scan. The oracle mirrors each branch with the shared
_sql_text fragments."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._sql_text import sql_fingerprint, sql_quality_score, sql_token_count
from ..sources.loaders import load_table


def dataset_card_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(metric, value) summary rows for the documents corpus."""
    from ..functions.text import fingerprint, quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")

    def m(name, df_agg):
        return df_agg.select(
            F.lit(name).alias("metric"),
            F.col("v").cast("double").alias("value"),
        )

    n_docs = m("n_docs", docs.agg(F.count("*").alias("v")))
    n_sources = m(
        "n_sources", docs.agg(F.countDistinct("source").alias("v"))
    )
    n_langs = m("n_langs", docs.agg(F.countDistinct("lang").alias("v")))
    total_tokens = m(
        "total_tokens",
        docs.agg(F.sum(token_count("text")).alias("v")),
    )
    mean_quality = m(
        "mean_quality", docs.agg(F.avg(quality_score("text")).alias("v"))
    )
    unique_contents = m(
        "unique_contents",
        docs.agg(F.countDistinct(fingerprint("text")).alias("v")),
    )
    mean_chars = m("mean_chars", docs.agg(F.avg("n_chars").alias("v")))
    out = n_docs
    for part in (
        n_sources,
        n_langs,
        total_tokens,
        mean_quality,
        unique_contents,
        mean_chars,
    ):
        out = out.unionByName(part)
    return out


DATASET_CARD_SQL = f"""
SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM documents
UNION ALL
SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM documents
UNION ALL
SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM documents
UNION ALL
SELECT 'total_tokens', CAST(sum({sql_token_count("text")}) AS DOUBLE)
FROM documents
UNION ALL
SELECT 'mean_quality', avg({sql_quality_score("text")}) FROM documents
UNION ALL
SELECT 'unique_contents',
       CAST(count(DISTINCT {sql_fingerprint("text")}) AS DOUBLE)
FROM documents
UNION ALL
SELECT 'mean_chars', avg(CAST(n_chars AS DOUBLE)) FROM documents
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dataset_card_documents": dataset_card_documents,
}

ORACLE_SQL: dict[str, str] = {
    "dataset_card_documents": DATASET_CARD_SQL,
}
