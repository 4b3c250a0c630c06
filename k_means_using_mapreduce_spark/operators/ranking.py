"""Ranking / classifier evaluation metrics as relational programs —
AUC, precision@k, recall@k, MRR, MAP, and NDCG@k computed with window
functions, never a collect.

A training-data pipeline that scores documents with a quality
classifier (operators/classifier.py) or retrieves neighbors
(operators/similarity.py, index.py) needs to EVALUATE those rankers at
corpus scale: AUC of the quality filter against a labeled slice,
NDCG/MRR of a retrieval run against relevance judgments. Both are pure
rank arithmetic:

* **AUC** is the Mann-Whitney statistic: with tie-aware average ranks
  ``r_i`` over the pooled scores, ``AUC = (Σ_{i∈pos} r_i −
  n⁺(n⁺+1)/2) / (n⁺ n⁻)`` — no pairwise comparison, no O(n²). Ranks
  come from ONE cumulative-count window over per-score blocks, so ties
  are exact, not sampled away.
* **Ranked-list metrics** (precision@k, recall@k, MRR, AP, NDCG@k) are
  one ``row_number`` window per ordering (actual and ideal) plus a
  running-sum — per-group, embarrassingly parallel.

Scale shape: everything is ``Window.partitionBy(group)`` — one shuffle
keyed by group/query id, then per-partition sequential scans. The
global (ungrouped) AUC first collapses to per-score blocks
(``groupBy(score)`` with map-side combine), so the single-task window
sees at most |distinct scores| rows — bucket scores first (e.g.
``round(score, 6)``) if that is still too many at 100 TB.

Determinism doctrine: ranked-list orderings tie-break on the id
column, so retries/repartitions reproduce the exact metric; AUC needs
no tie-break at all because ties enter the formula analytically.

Reference scope: the reference engine (master.py:27-150) computes only
SSE-style fit metrics; this module is part of the LLM-data-pipeline
extension surface (quality-filter and retrieval evaluation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tie-aware ROC AUC per group: ``(group..., n_pos, n_neg, auc)``.

    ``label_col`` is boolean or 0/1. ``auc`` is NULL for degenerate
    groups (no positives or no negatives) — filter or coalesce
    downstream; a numeric sentinel here would silently poison means.

    Exactness: average ranks are halves (x.0 / x.5), the rank-sum
    stays below 2^53 for any realistic group, so the result is one
    exact-rational double division — bit-identical across engines and
    partitionings.
    """
    groups = list(group_cols or [])
    lab = F.col(label_col).cast("int")
    blocks = df.groupBy(*groups, F.col(score_col).alias("_s")).agg(
        F.count("*").alias("_c"), F.sum(lab).alias("_p")
    )
    w = (
        Window.partitionBy(*groups).orderBy("_s")
        if groups
        else Window.orderBy("_s")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("_c").over(w)
    avg_rank = (
        (cum - F.col("_c")).cast("double")
        + (F.col("_c") + F.lit(1)).cast("double") / F.lit(2.0)
    )
    agg = (
        blocks.withColumn("_ar", avg_rank)
        .groupBy(*groups)
        .agg(
            F.sum(F.col("_p").cast("double") * F.col("_ar")).alias("_rs"),
            F.sum("_p").alias("n_pos"),
            (F.sum("_c") - F.sum("_p")).alias("n_neg"),
        )
    )
    np_d = F.col("n_pos").cast("double")
    auc = (F.col("_rs") - np_d * (np_d + F.lit(1.0)) / F.lit(2.0)) / F.nullif(
        np_d * F.col("n_neg").cast("double"), F.lit(0.0)
    )
    return agg.select(*groups, "n_pos", "n_neg", auc.alias("auc"))


def ranking_metrics(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    *,
    k: int,
) -> DataFrame:
    """Per-group ranked-list metrics for binary relevance: ``(group,
    n_items, n_rel, precision_at_k, recall_at_k, mrr, ap, ndcg_at_k)``.

    Items rank by ``score_col`` descending, ties broken by ``id_col``
    ascending (deterministic under retries). ``rel_col`` is boolean or
    0/1. Groups with no relevant item get NULL ``mrr``/``ap``/
    ``recall_at_k``/``ndcg_at_k`` (undefined, not zero). ``precision@k``
    divides by ``k`` even when the group has fewer than k items — the
    standard retrieval convention.

    NDCG uses linear binary gain ``rel / log2(rank+1)``; the ideal
    ordering is relevance-first with the same (score, id) tie-break,
    computed by a second row_number over the SAME shuffled partition —
    no extra exchange.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rel = F.col(rel_col).cast("int")
    ln2 = F.log(F.lit(2.0))
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_ideal = Window.partitionBy(group_col).orderBy(
        rel.desc(), F.col(score_col).desc(), F.col(id_col)
    )
    # keep the group column UN-aliased: the groupBy below then reuses the
    # windows' hashpartitioning(group_col) and the whole metric is ONE
    # shuffle (an alias breaks Catalyst's partitioning propagation and
    # costs a second Exchange — pinned by test_ranking_metrics_single_
    # exchange)
    rows = df.select(
        F.col(group_col),
        rel.alias("_rel"),
        F.row_number().over(w_rank).alias("_rn"),
        F.row_number().over(w_ideal).alias("_irn"),
        F.sum(rel).over(w_run).alias("_cumrel"),
    )
    gain = lambda rank: F.col("_rel").cast("double") / (  # noqa: E731
        F.log(rank.cast("double") + F.lit(1.0)) / ln2
    )
    agg = rows.groupBy(group_col).agg(
        F.count("*").alias("n_items"),
        F.sum("_rel").alias("n_rel"),
        F.sum(F.when(F.col("_rn") <= k, F.col("_rel")).otherwise(0)).alias(
            "_hits_k"
        ),
        F.max(
            F.when(
                F.col("_rel") == 1, F.lit(1.0) / F.col("_rn").cast("double")
            )
        ).alias("mrr"),
        F.sum(
            F.when(
                F.col("_rel") == 1,
                F.col("_cumrel").cast("double") / F.col("_rn").cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("_ap_num"),
        F.sum(
            F.when(F.col("_rn") <= k, gain(F.col("_rn"))).otherwise(F.lit(0.0))
        ).alias("_dcg"),
        F.sum(
            F.when(F.col("_irn") <= k, gain(F.col("_irn"))).otherwise(
                F.lit(0.0)
            )
        ).alias("_idcg"),
    )
    nrel_d = F.nullif(F.col("n_rel").cast("double"), F.lit(0.0))
    return agg.select(
        group_col,
        "n_items",
        "n_rel",
        (F.col("_hits_k").cast("double") / F.lit(float(k))).alias(
            "precision_at_k"
        ),
        (F.col("_hits_k").cast("double") / nrel_d).alias("recall_at_k"),
        "mrr",
        (F.col("_ap_num") / nrel_d).alias("ap"),
        (F.col("_dcg") / F.nullif(F.col("_idcg"), F.lit(0.0))).alias(
            "ndcg_at_k"
        ),
    )


def mean_ranking_metrics(per_group: DataFrame) -> DataFrame:
    """Corpus-level summary of :func:`ranking_metrics` output: one row
    ``(n_groups, n_eval_groups, mean_precision_at_k, mean_recall_at_k,
    mean_mrr, map, mean_ndcg_at_k)``. Means average only groups with
    at least one relevant item (``n_eval_groups``) — the groups where
    the metrics are defined; ``map`` is the mean of per-group AP."""
    evalable = F.col("n_rel") > 0
    mean_if = lambda c: F.avg(F.when(evalable, F.col(c)))  # noqa: E731
    return per_group.agg(
        F.count("*").alias("n_groups"),
        F.sum(evalable.cast("int")).alias("n_eval_groups"),
        mean_if("precision_at_k").alias("mean_precision_at_k"),
        mean_if("recall_at_k").alias("mean_recall_at_k"),
        mean_if("mrr").alias("mean_mrr"),
        mean_if("ap").alias("map"),
        mean_if("ndcg_at_k").alias("mean_ndcg_at_k"),
    )
