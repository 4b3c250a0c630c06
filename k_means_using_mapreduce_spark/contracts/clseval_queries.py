"""Classification-evaluation contracts (operators/clseval.py): the
lang-id heuristic (functions/text.py::lang_id) evaluated against the
corpus's gold ``lang`` column — a real classifier-vs-gold confusion
matrix, per-class P/R/F1, and corpus accuracy/kappa/MCC, all
oracle-checked cell by cell."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.clseval import (
    class_metrics,
    classification_summary,
    confusion_matrix,
)
from ..sources.loaders import load_table
from ._sql_text import sql_lang_hits


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("lang").alias("label"), T.lang_id("text").alias("pred")
    )


def _sql_pred() -> str:
    """The lang_id CASE expression — strict argmax over stopword hits,
    'unknown' on ties/zero (mirrors text_queries.LANG_ID_SQL)."""
    hits = sql_lang_hits("text")
    langs = list(hits)
    arms = []
    for lang in langs:
        conds = [f"{hits[lang]} > 0"] + [
            f"{hits[lang]} > {hits[o]}" for o in langs if o != lang
        ]
        arms.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(arms) + " ELSE 'unknown' END"


_BASE_SQL = f"SELECT lang AS label, {_sql_pred()} AS pred FROM documents"

_CLASSES_SQL = f"""
WITH base AS ({_BASE_SQL}),
cm AS (
  SELECT label, pred, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1, 2
), gold AS (
  SELECT label AS class, CAST(sum(n) AS BIGINT) AS n_gold FROM cm GROUP BY 1
), predm AS (
  SELECT pred AS class, CAST(sum(n) AS BIGINT) AS n_pred FROM cm GROUP BY 1
), diag AS (
  SELECT label AS class, n AS tp FROM cm WHERE label = pred
), classes AS (
  SELECT coalesce(g.class, p.class) AS class,
         coalesce(g.n_gold, 0) AS n_gold,
         coalesce(p.n_pred, 0) AS n_pred,
         coalesce(d.tp, 0) AS tp
  FROM gold g FULL OUTER JOIN predm p ON g.class = p.class
  LEFT JOIN diag d ON coalesce(g.class, p.class) = d.class
), pr AS (
  SELECT class, n_gold, n_pred, tp,
    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred
         ELSE 0.0 END AS "precision",
    CASE WHEN n_gold > 0 THEN CAST(tp AS DOUBLE) / n_gold
         ELSE 0.0 END AS recall
  FROM classes
)
SELECT class, n_gold, n_pred, tp, "precision", recall,
  CASE WHEN "precision" + recall > 0
       THEN 2.0 * "precision" * recall / ("precision" + recall)
       ELSE 0.0 END AS f1
FROM pr
"""


def lang_confusion_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return confusion_matrix(_base(spark, sf_dir), "label", "pred")


LANG_CONFUSION_SQL = f"""
WITH base AS ({_BASE_SQL})
SELECT label, pred, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1, 2
"""


def lang_eval_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return class_metrics(_base(spark, sf_dir), "label", "pred")


def lang_eval_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classification_summary(_base(spark, sf_dir), "label", "pred")


LANG_EVAL_SUMMARY_SQL = f"""
WITH prf AS ({_CLASSES_SQL}),
agg AS (
  SELECT CAST(sum(n_gold) AS BIGINT) AS n, CAST(sum(tp) AS BIGINT) AS tp,
    sum(CAST(n_gold AS DOUBLE) * n_pred) AS gp,
    sum(CAST(n_gold AS DOUBLE) * n_gold) AS gg,
    sum(CAST(n_pred AS DOUBLE) * n_pred) AS pp,
    avg(CASE WHEN n_gold > 0 THEN "precision" END) AS macro_precision,
    avg(CASE WHEN n_gold > 0 THEN recall END) AS macro_recall,
    avg(CASE WHEN n_gold > 0 THEN f1 END) AS macro_f1,
    sum(CAST(n_gold AS DOUBLE) * f1) / CAST(sum(n_gold) AS DOUBLE)
      AS weighted_f1
  FROM prf
)
SELECT n,
  CAST(tp AS DOUBLE) / n AS accuracy,
  (CAST(tp AS DOUBLE) / n - gp / (CAST(n AS DOUBLE) * n))
    / nullif(1.0 - gp / (CAST(n AS DOUBLE) * n), 0.0) AS kappa,
  (CAST(n AS DOUBLE) * tp - gp)
    / nullif(sqrt((CAST(n AS DOUBLE) * n - pp)
                  * (CAST(n AS DOUBLE) * n - gg)), 0.0) AS mcc,
  macro_precision, macro_recall, macro_f1, weighted_f1
FROM agg
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lang_confusion_documents": lang_confusion_documents,
    "lang_eval_classes": lang_eval_classes,
    "lang_eval_summary": lang_eval_summary,
}

ORACLE_SQL: dict[str, str] = {
    "lang_confusion_documents": LANG_CONFUSION_SQL,
    "lang_eval_classes": _CLASSES_SQL,
    "lang_eval_summary": LANG_EVAL_SUMMARY_SQL,
}


def nb_lang_confusion_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trained multinomial Naive Bayes lang classifier: fit on the 80%
    hash-split train docs, confusion matrix on the 20% holdout
    (operators/classifier.py::naive_bayes_confusion) — the TRAINED
    counterpart of the rule-based lang_confusion_documents above."""
    from ..operators.classifier import naive_bayes_confusion

    return naive_bayes_confusion(
        load_table(spark, sf_dir, "documents"), "lang", test_pct=20
    )


from ._sql_text import sql_tokens as _sql_tokens  # noqa: E402

NB_CONFUSION_SQL = f"""
WITH b AS MATERIALIZED (
  SELECT doc_id AS id, lang AS label, {_sql_tokens('text')} AS t,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 20 AS is_test
  FROM documents
  WHERE lang IS NOT NULL AND doc_id IS NOT NULL
),
counts AS MATERIALIZED (
  SELECT label, token, CAST(count(*) AS DOUBLE) AS cnt
  FROM (SELECT label, unnest(t) AS token FROM b WHERE NOT is_test)
  GROUP BY 1, 2
),
voc AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM counts),
ntr AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_all FROM b WHERE NOT is_test
),
denoms AS MATERIALIZED (
  SELECT t.label, t.n_tok + 1.0 * (v + 1.0) AS denom, p.prior
  FROM (SELECT label, sum(cnt) AS n_tok FROM counts GROUP BY 1) t
  CROSS JOIN voc
  JOIN (
    SELECT label,
           ln(CAST(count(*) AS DOUBLE) / (SELECT n_all FROM ntr)) AS prior
    FROM b WHERE NOT is_test GROUP BY 1
  ) p USING (label)
),
tscore AS MATERIALIZED (
  SELECT id, true_label, label, sum(lp) AS tok_score
  FROM (
    SELECT pr.id, pr.true_label, d.label,
           ln((coalesce(c.cnt, 0.0) + 1.0) / d.denom) AS lp
    FROM (
      SELECT id, label AS true_label, unnest(t) AS token
      FROM b WHERE is_test
    ) pr
    CROSS JOIN denoms d
    LEFT JOIN counts c ON c.label = d.label AND c.token = pr.token
  ) s
  GROUP BY 1, 2, 3
),
dl AS (
  SELECT tb.id, tb.true_label, d.label,
         d.prior + coalesce(ts.tok_score, 0.0) AS score
  FROM (SELECT id, label AS true_label FROM b WHERE is_test) tb
  CROSS JOIN denoms d
  LEFT JOIN tscore ts ON ts.id = tb.id AND ts.label = d.label
)
SELECT true_label AS label, label AS pred_label,
       CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY id ORDER BY score DESC, label
  ) AS rk FROM dl
) f
WHERE rk = 1
GROUP BY 1, 2
"""

QUERIES["nb_lang_confusion_documents"] = nb_lang_confusion_documents
ORACLE_SQL["nb_lang_confusion_documents"] = NB_CONFUSION_SQL


def purchase_value_auc_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Does event value rank purchases above other events? ROC-AUC +
    KS via the tie-corrected midrank estimator, one grouped pass
    (operators/clseval.py::binary_rank_metrics)."""
    from ..operators.clseval import binary_rank_metrics

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    ev = ev.withColumn(
        "is_purchase",
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0),
    )
    return binary_rank_metrics(ev, "value", "is_purchase")


AUC_SQL = """
WITH r AS (
  SELECT value AS s,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
),
blocks AS (
  SELECT s, CAST(count(*) AS DOUBLE) AS n, sum(y) AS n_pos
  FROM r GROUP BY 1
),
cum AS (
  SELECT n, n_pos,
    sum(n) OVER w - n AS cum_before,
    sum(n_pos) OVER w AS cum_pos,
    sum(n - n_pos) OVER w AS cum_neg
  FROM blocks
  WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
tot AS (SELECT sum(n_pos) AS p, sum(n - n_pos) AS q FROM blocks)
SELECT CAST(p AS BIGINT) AS n_pos, CAST(q AS BIGINT) AS n_neg,
  (sum(n_pos * (cum_before + (n + 1.0) / 2.0)) - p * (p + 1) / 2)
    / nullif(p * q, 0.0) AS auc,
  CASE WHEN p > 0 AND q > 0 THEN
    max(abs(cum_pos / nullif(p, 0.0) - cum_neg / nullif(q, 0.0)))
  END AS ks
FROM cum CROSS JOIN tot
GROUP BY p, q
"""

QUERIES["purchase_value_auc_events"] = purchase_value_auc_events
ORACLE_SQL["purchase_value_auc_events"] = AUC_SQL


def mcnemar_langid_vs_majority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Is the rule-based lang_id actually better than always-'en'?
    McNemar's paired test on per-document correctness
    (operators/hypothesis.py::mcnemar_test) — the pairing-aware
    version of comparing the two accuracies."""
    from ..operators.hypothesis import mcnemar_test

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull()
    )
    return mcnemar_test(
        docs,
        T.lang_id("text") == F.col("lang"),
        F.col("lang") == F.lit("en"),
    )


MCNEMAR_SQL = f"""
WITH base AS (
  SELECT CASE WHEN {_sql_pred()} = lang THEN 1.0 ELSE 0.0 END AS a,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS b
  FROM documents WHERE lang IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n,
  sum(a) / CAST(count(*) AS DOUBLE) AS acc_a,
  sum(b) / CAST(count(*) AS DOUBLE) AS acc_b,
  CAST(sum(a * (1.0 - b)) AS BIGINT) AS b_discordant,
  CAST(sum((1.0 - a) * b) AS BIGINT) AS c_discordant,
  (abs(sum(a * (1.0 - b)) - sum((1.0 - a) * b)) - 1.0)
    * (abs(sum(a * (1.0 - b)) - sum((1.0 - a) * b)) - 1.0)
    / nullif(sum(a * (1.0 - b)) + sum((1.0 - a) * b), 0.0)
    AS mcnemar_chi2
FROM base
"""

QUERIES["mcnemar_langid_vs_majority"] = mcnemar_langid_vs_majority
ORACLE_SQL["mcnemar_langid_vs_majority"] = MCNEMAR_SQL


def purchase_decile_lift_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gains/lift table: does ranking events by value concentrate
    purchases in the top tiles
    (operators/clseval.py::decile_lift)?"""
    from ..operators.clseval import decile_lift

    ev = load_table(spark, sf_dir, "events").withColumn(
        "is_purchase",
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0),
    )
    return decile_lift(ev, "value", "is_purchase", id_col="event_id")


LIFT_SQL = """
WITH tiled AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
         ntile(10) OVER (ORDER BY CAST(value AS DOUBLE) DESC, event_id)
           AS tile
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
per AS (
  SELECT tile, CAST(count(*) AS DOUBLE) AS n, sum(y) AS n_pos
  FROM tiled GROUP BY 1
),
tot AS (SELECT sum(n) AS nn, sum(n_pos) AS pp FROM per)
SELECT tile, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
  n_pos / n AS response_rate,
  (n_pos / n) / nullif(pp / nn, 0.0) AS lift,
  sum(n_pos) OVER (ORDER BY tile ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) / nullif(pp, 0.0) AS cum_capture
FROM per CROSS JOIN tot
"""

QUERIES["purchase_decile_lift_events"] = purchase_decile_lift_events
ORACLE_SQL["purchase_decile_lift_events"] = LIFT_SQL


def returns_split_stump_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best Gini decision stump for predicting returns from quantity
    (operators/evaluation.py::best_split_stump): the one-feature
    screening answer to "does quantity separate returned line items"."""
    from ..operators.evaluation import best_split_stump

    li = load_table(spark, sf_dir, "lineitem")
    return best_split_stump(
        li, "l_quantity", (F.col("l_returnflag") == "R")
    )


STUMP_SQL = """
WITH base AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
), blocks AS (
  SELECT x, CAST(count(*) AS DOUBLE) AS bn, sum(y) AS bp
  FROM base GROUP BY 1
), pref AS (
  SELECT x,
         sum(bn) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS nl,
         sum(bp) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS pl
  FROM blocks
), tot AS (SELECT sum(bn) AS n, sum(bp) AS p FROM blocks),
cand AS (
  SELECT pref.x AS threshold, t.n, t.p, nl, pl,
         t.n - nl AS nr, t.p - pl AS pr
  FROM pref CROSS JOIN tot t WHERE nl < t.n
), scored AS (
  SELECT threshold, n, p, nl, nr, pl / nl AS prl, pr / nr AS prr,
    (1.0 - (p / n) * (p / n) - (1.0 - p / n) * (1.0 - p / n))
    - (nl / n * (1.0 - (pl / nl) * (pl / nl)
                 - (1.0 - pl / nl) * (1.0 - pl / nl))
       + nr / n * (1.0 - (pr / nr) * (pr / nr)
                   - (1.0 - pr / nr) * (1.0 - pr / nr))) AS gain
  FROM cand
)
SELECT CAST(n AS BIGINT) AS n, p / n AS pos_rate,
  1.0 - (p / n) * (p / n) - (1.0 - p / n) * (1.0 - p / n) AS gini_parent,
  threshold,
  CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
  prl AS pos_rate_left, prr AS pos_rate_right, gain AS gini_gain
FROM scored
ORDER BY gain DESC, threshold
LIMIT 1
"""

QUERIES["returns_split_stump_lineitem"] = returns_split_stump_lineitem
ORACLE_SQL["returns_split_stump_lineitem"] = STUMP_SQL


def kmeans_k_stability_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition agreement between the K=4 embedding assignment and a
    coarser 2-centroid assignment (operators/clseval.py::
    clustering_agreement): ARI + NMI answer "how much of the K=4
    structure survives at K=2" — the stability check run before
    trusting a single K.

    Both assignments are arg-mins over the SAME feature vector, so
    they are computed in ONE narrow scan (no per-k assign + id join:
    that join is a full shuffle of the corpus at scale — round-7
    plan fix after the round-6 bench flagged this contract)."""
    from ..contract_constants import EMBEDDING_CENTROIDS
    from ..functions.vectors import argmin_centroid
    from ..operators.clseval import clustering_agreement

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("features")
    )
    cid_fine, _ = argmin_centroid(F.col("features"), EMBEDDING_CENTROIDS)
    cid_coarse, _ = argmin_centroid(
        F.col("features"), EMBEDDING_CENTROIDS[:2]
    )
    both = emb.select(
        cid_fine.alias("cid_fine"), cid_coarse.alias("cid_coarse")
    )
    return clustering_agreement(both, "cid_fine", "cid_coarse")


def _k_stability_sql() -> str:
    from ..contract_constants import EMBEDDING_CENTROIDS
    from .kmeans_queries import _sq_dist_sql_vec

    def assign_sql(cents, alias):
        rows = ", ".join(
            f"({cid}, {_sq_dist_sql_vec('embedding', vec)})"
            for cid, vec in cents
        )
        return f"""
  SELECT vec_id AS id, cid AS {alias} FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY c.d, c.cid) AS rn
    FROM embeddings e, LATERAL (VALUES {rows}) AS c(cid, d)
  ) WHERE rn = 1"""

    fine = assign_sql(EMBEDDING_CENTROIDS, "a")
    coarse = assign_sql(EMBEDDING_CENTROIDS[:2], "b")
    return f"""
WITH fine AS MATERIALIZED ({fine}),
coarse AS MATERIALIZED ({coarse}),
cells AS MATERIALIZED (
  SELECT f.a AS _a, c.b AS _b, CAST(count(*) AS DOUBLE) AS nij
  FROM fine f JOIN coarse c USING (id) GROUP BY 1, 2
),
am AS (SELECT _a, sum(nij) AS ai FROM cells GROUP BY 1),
bm AS (SELECT _b, sum(nij) AS bj FROM cells GROUP BY 1),
s AS (SELECT sum(nij) AS n, sum(nij * (nij - 1.0) / 2.0) AS sum_cij FROM cells),
sa AS (SELECT sum(ai * (ai - 1.0) / 2.0) AS sum_ca,
              CAST(count(*) AS BIGINT) AS k_a,
              sum(ai * ln(ai)) AS slog_a FROM am),
sb AS (SELECT sum(bj * (bj - 1.0) / 2.0) AS sum_cb,
              CAST(count(*) AS BIGINT) AS k_b,
              sum(bj * ln(bj)) AS slog_b FROM bm),
mix AS (
  SELECT sum(c.nij * ln(c.nij / (am.ai * bm.bj))) AS smix
  FROM cells c JOIN am USING (_a) JOIN bm USING (_b)
)
SELECT CAST(n AS BIGINT) AS n, k_a, k_b,
  (sum_cij - sum_ca * sum_cb / (n * (n - 1.0) / 2.0))
    / nullif((sum_ca + sum_cb) / 2.0
             - sum_ca * sum_cb / (n * (n - 1.0) / 2.0), 0.0) AS ari,
  (smix / n + ln(n))
    / nullif(sqrt((ln(n) - slog_a / n) * (ln(n) - slog_b / n)), 0.0) AS nmi
FROM s CROSS JOIN sa CROSS JOIN sb CROSS JOIN mix
"""


QUERIES["kmeans_k_stability_embeddings"] = kmeans_k_stability_embeddings
ORACLE_SQL["kmeans_k_stability_embeddings"] = _k_stability_sql()
