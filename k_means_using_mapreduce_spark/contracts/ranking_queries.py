"""Ranker-evaluation contracts (operators/ranking.py): tie-aware AUC of
a scoring column against a binary label, and per-group ranked-list
metrics (P@k / recall@k / MRR / AP / NDCG@k) — the evaluation loop a
quality-classifier or retrieval pipeline runs at corpus scale.

Score/label choices are synthetic but deterministic: ``n_chars`` scored
against ``lang='en'`` (documents), ``value`` against
``event_type='purchase'`` (events) — correctness of the rank arithmetic
is what is under test, not the ranker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import (
    binary_auc,
    mean_ranking_metrics,
    ranking_metrics,
)
from ..sources.loaders import load_table

RANK_K = 10


def _labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )


def classifier_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped tie-aware AUC: does doc length predict English, per
    source? Degenerate groups (single-class) are dropped — their AUC is
    undefined and the NULL would not round-trip through the oracle."""
    out = binary_auc(
        _labeled_docs(spark, sf_dir), "score", "label", group_cols=["source"]
    )
    return out.where(F.col("auc").isNotNull())


AUC_BY_SOURCE_SQL = """
WITH base AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lab
  FROM documents
), blocks AS (
  SELECT source, s, count(*) AS c, sum(lab) AS p FROM base GROUP BY 1, 2
), ranked AS (
  SELECT source, c, p,
    sum(c) OVER (PARTITION BY source ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM blocks
), agg AS (
  SELECT source,
    sum(p * (CAST(cum - c AS DOUBLE) + (c + 1) / 2.0)) AS rs,
    CAST(sum(p) AS BIGINT) AS n_pos,
    CAST(sum(c) - sum(p) AS BIGINT) AS n_neg
  FROM ranked GROUP BY 1
)
SELECT source, n_pos, n_neg,
  (rs - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * 1.0 * n_neg) AS auc
FROM agg WHERE n_pos > 0 AND n_neg > 0
"""


def classifier_auc_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped AUC — exercises the single-task global window, which
    sees only |distinct scores| block rows, not N rows."""
    out = binary_auc(_labeled_docs(spark, sf_dir), "score", "label")
    return out.where(F.col("auc").isNotNull())


AUC_GLOBAL_SQL = """
WITH base AS (
  SELECT CAST(n_chars AS DOUBLE) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lab
  FROM documents
), blocks AS (
  SELECT s, count(*) AS c, sum(lab) AS p FROM base GROUP BY 1
), ranked AS (
  SELECT c, p,
    sum(c) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM blocks
), agg AS (
  SELECT
    sum(p * (CAST(cum - c AS DOUBLE) + (c + 1) / 2.0)) AS rs,
    CAST(sum(p) AS BIGINT) AS n_pos,
    CAST(sum(c) - sum(p) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
  (rs - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * 1.0 * n_neg) AS auc
FROM agg WHERE n_pos > 0 AND n_neg > 0
"""


def _event_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("rel"),
    )


def retrieval_metrics_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ranked-list metrics: events ranked by value, purchases
    as the relevant set, k=10. Users with no purchase are dropped (their
    MRR/AP/recall/NDCG are undefined NULLs)."""
    out = ranking_metrics(
        _event_relevance(spark, sf_dir),
        group_col="user_id",
        id_col="event_id",
        score_col="score",
        rel_col="rel",
        k=RANK_K,
    )
    return out.where(F.col("n_rel") > 0)


RETRIEVAL_METRICS_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, value AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
  FROM events
), ranked AS (
  SELECT user_id, rel,
    row_number() OVER (PARTITION BY user_id ORDER BY s DESC, event_id)
      AS rn,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY rel DESC, s DESC, event_id) AS irn,
    sum(rel) OVER (PARTITION BY user_id ORDER BY s DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cumrel
  FROM base
), agg AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_items,
    CAST(sum(rel) AS BIGINT) AS n_rel,
    CAST(sum(CASE WHEN rn <= {RANK_K} THEN rel ELSE 0 END) AS BIGINT)
      AS hits_k,
    max(CASE WHEN rel = 1 THEN 1.0 / rn END) AS mrr,
    sum(CASE WHEN rel = 1 THEN CAST(cumrel AS DOUBLE) / rn
        ELSE 0.0 END) AS ap_num,
    sum(CASE WHEN rn <= {RANK_K}
        THEN rel / (ln(rn + 1.0) / ln(2.0)) ELSE 0.0 END) AS dcg,
    sum(CASE WHEN irn <= {RANK_K}
        THEN rel / (ln(irn + 1.0) / ln(2.0)) ELSE 0.0 END) AS idcg
  FROM ranked GROUP BY 1
)
SELECT user_id, n_items, n_rel,
  hits_k / {float(RANK_K)!r} AS precision_at_k,
  hits_k / CAST(n_rel AS DOUBLE) AS recall_at_k,
  mrr,
  ap_num / n_rel AS ap,
  dcg / idcg AS ndcg_at_k
FROM agg WHERE n_rel > 0
"""


def retrieval_summary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level MAP / mean-NDCG summary of the per-user metrics —
    one row; means average only users with >= 1 relevant event."""
    per_group = ranking_metrics(
        _event_relevance(spark, sf_dir),
        group_col="user_id",
        id_col="event_id",
        score_col="score",
        rel_col="rel",
        k=RANK_K,
    )
    return mean_ranking_metrics(per_group)


RETRIEVAL_SUMMARY_SQL = f"""
WITH per_group AS ({RETRIEVAL_METRICS_SQL.replace("WHERE n_rel > 0", "")}),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
    CAST(sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_eval_groups,
    avg(CASE WHEN n_rel > 0 THEN precision_at_k END)
      AS mean_precision_at_k,
    avg(CASE WHEN n_rel > 0 THEN recall_at_k END) AS mean_recall_at_k,
    avg(CASE WHEN n_rel > 0 THEN mrr END) AS mean_mrr,
    avg(CASE WHEN n_rel > 0 THEN ap END) AS "map",
    avg(CASE WHEN n_rel > 0 THEN ndcg_at_k END) AS mean_ndcg_at_k
  FROM per_group
)
SELECT * FROM tot
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "classifier_auc_by_source": classifier_auc_by_source,
    "classifier_auc_global": classifier_auc_global,
    "retrieval_metrics_events": retrieval_metrics_events,
    "retrieval_summary_events": retrieval_summary_events,
}

ORACLE_SQL: dict[str, str] = {
    "classifier_auc_by_source": AUC_BY_SOURCE_SQL,
    "classifier_auc_global": AUC_GLOBAL_SQL,
    "retrieval_metrics_events": RETRIEVAL_METRICS_SQL,
    "retrieval_summary_events": RETRIEVAL_SUMMARY_SQL,
}
