"""Calibration contract (operators/calibration.py): the binned
reliability table feeding isotonic regression — quality score vs the
is-English label over documents, 20 equal-count bins on a total
(score, id) order so binning is deterministic cross-engine."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..sources.loaders import load_table
from ._sql_text import sql_quality_score

CAL_BINS = 20


def calibration_bins_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.calibration import binned_calibration

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score("text").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return binned_calibration(
        docs, "score", "label", "doc_id", n_bins=CAL_BINS
    )


CALIBRATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, {sql_quality_score('text')} AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents
),
binned AS (
  SELECT score, label,
         ntile({CAL_BINS}) OVER (ORDER BY score, doc_id) AS bin
  FROM scored
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
  min(score) AS min_score, max(score) AS max_score,
  avg(score) AS mean_score,
  avg(CAST(label AS DOUBLE)) AS pos_rate
FROM binned GROUP BY bin
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "calibration_bins_documents": calibration_bins_documents,
}

ORACLE_SQL: dict[str, str] = {
    "calibration_bins_documents": CALIBRATION_SQL,
}


CONF_ALPHA = 0.1


def _conformal_parts(spark: SparkSession, sf_dir: str):
    from ..operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").withColumn(
        "fold", hash_bucket("event_id", 3)
    )
    model = (
        ev.where(F.col("fold") == 0)
        .groupBy("event_type")
        .agg(F.avg(F.col("value").cast("double")).alias("pred"))
    )
    cal = ev.where(F.col("fold") == 1).join(F.broadcast(model), "event_type")
    test = ev.where(F.col("fold") == 2).join(F.broadcast(model), "event_type")
    return cal, test


def conformal_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% band for the per-type-mean value
    predictor (model fold 0, calibration fold 1, evaluation fold 2 —
    deterministic md5 folds) with held-out coverage."""
    from ..operators.calibration import conformal_coverage, conformal_quantile

    cal, test = _conformal_parts(spark, sf_dir)
    q = conformal_quantile(cal, "pred", "value", alpha=CONF_ALPHA)
    return conformal_coverage(test, q, "pred", "value")


CONFORMAL_SQL = f"""
WITH folded AS (
  SELECT *, ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 3
           AS fold
  FROM events
),
model AS (
  SELECT event_type, avg(CAST(value AS DOUBLE)) AS pred
  FROM folded WHERE fold = 0 GROUP BY 1
),
cal AS (
  SELECT abs(CAST(value AS DOUBLE) - pred) AS r
  FROM folded JOIN model USING (event_type)
  WHERE fold = 1 AND value IS NOT NULL AND pred IS NOT NULL
),
ranked AS (
  SELECT r, row_number() OVER (ORDER BY r) AS rk,
         count(*) OVER () AS n_cal
  FROM cal
),
q AS (
  SELECT CAST(n_cal AS BIGINT) AS n_cal,
         least(CAST(ceil({1.0 - CONF_ALPHA} * (n_cal + 1)) AS BIGINT),
               CAST(n_cal AS BIGINT)) AS k,
         r AS qhat
  FROM ranked
  WHERE rk = least(CAST(ceil({1.0 - CONF_ALPHA} * (n_cal + 1)) AS BIGINT),
                   CAST(n_cal AS BIGINT))
),
hits AS (
  SELECT n_cal, k, qhat,
         CASE WHEN abs(CAST(value AS DOUBLE) - pred) <= qhat
              THEN 1 ELSE 0 END AS hit
  FROM folded JOIN model USING (event_type) CROSS JOIN q
  WHERE fold = 2 AND value IS NOT NULL AND pred IS NOT NULL
)
SELECT n_cal, k, qhat,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(hit) AS BIGINT) AS covered,
       sum(hit) / CAST(count(*) AS DOUBLE) AS coverage
FROM hits GROUP BY 1, 2, 3
"""

QUERIES["conformal_value_band"] = conformal_value_band
ORACLE_SQL["conformal_value_band"] = CONFORMAL_SQL


def qnorm_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize the quality score across sources, then show
    the calibration effect per source: raw means differ, normalized
    means align (operators/calibration.py::quantile_normalize)."""
    from ..operators.calibration import quantile_normalize

    docs = load_table(spark, sf_dir, "documents").select(
        "source", quality_score("text").alias("score")
    )
    normed = quantile_normalize(docs, "score", "source")
    return normed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("score").alias("mean_raw"),
        F.avg("qnorm").alias("mean_qnorm"),
    )


_QN_GRID = 101
_QN_FRACS = ", ".join(repr(i / (_QN_GRID - 1)) for i in range(_QN_GRID))

QNORM_SQL = f"""
WITH r AS MATERIALIZED (
  SELECT source, CAST({sql_quality_score('text')} AS DOUBLE) AS v
  FROM documents
  WHERE source IS NOT NULL AND {sql_quality_score('text')} IS NOT NULL
),
g AS (SELECT quantile_cont(v, [{_QN_FRACS}]) AS q FROM r),
p AS (
  SELECT source, v,
         percent_rank() OVER (PARTITION BY source ORDER BY v)
           * {float(_QN_GRID - 1)!r} AS x
  FROM r
),
i AS (
  SELECT source, v, x,
         CAST(least(floor(x), {_QN_GRID - 2}) AS INTEGER) AS idx
  FROM p
),
n AS (
  SELECT source, v,
         q[idx + 1] + (x - CAST(idx AS DOUBLE))
           * (q[idx + 2] - q[idx + 1]) AS qnorm
  FROM i CROSS JOIN g
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       avg(v) AS mean_raw, avg(qnorm) AS mean_qnorm
FROM n GROUP BY 1
"""

QUERIES["qnorm_quality_by_source"] = qnorm_quality_by_source
ORACLE_SQL["qnorm_quality_by_source"] = QNORM_SQL


def brier_quality_english(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the quality score as a probability of
    'lang = en' (operators/calibration.py::brier_decomposition) — is
    the score calibrated, and does it discriminate at all?"""
    from ..operators.calibration import brier_decomposition

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score("text").alias("score"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("is_en"),
    )
    return brier_decomposition(docs, "score", "is_en", id_col="doc_id")


BRIER_SQL = f"""
WITH rows0 AS (
  SELECT CAST({sql_quality_score('text')} AS DOUBLE) AS s,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         doc_id
  FROM documents
  WHERE {sql_quality_score('text')} IS NOT NULL AND lang IS NOT NULL
),
tiled AS (
  SELECT s, y, ntile(10) OVER (ORDER BY s, doc_id) AS b FROM rows0
),
per AS (
  SELECT b, CAST(count(*) AS DOUBLE) AS nb, avg(s) AS fb, avg(y) AS ob
  FROM tiled GROUP BY 1
),
tot AS (
  SELECT sum(nb) AS n, sum(nb * ob) / sum(nb) AS obar FROM per
),
agg AS (
  SELECT any_value(n) AS n, any_value(obar) AS obar,
    sum(nb * (fb - ob) * (fb - ob)) AS rel_sum,
    sum(nb * (ob - obar) * (ob - obar)) AS res_sum
  FROM per CROSS JOIN tot
)
SELECT CAST(n AS BIGINT) AS n, obar AS base_rate,
  rel_sum / n - res_sum / n + obar * (1.0 - obar) AS brier,
  rel_sum / n AS reliability,
  res_sum / n AS resolution,
  obar * (1.0 - obar) AS uncertainty
FROM agg
"""

QUERIES["brier_quality_english"] = brier_quality_english
ORACLE_SQL["brier_quality_english"] = BRIER_SQL


def isotonic_price_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact in-plan isotonic regression of mean extended price on
    quantity (operators/calibration.py::isotonic_exact): the PAVA
    solution via the max-min block-mean representation, hash-gated —
    TPC-H price is monotone-ish in quantity, so pooling is light but
    present wherever unit-price mix inverts the trend."""
    from ..operators.calibration import isotonic_exact

    li = load_table(spark, sf_dir, "lineitem")
    return isotonic_exact(li, "l_quantity", "l_extendedprice").select(
        F.col("x").alias("quantity"), "n", "y_mean", "y_iso"
    )


ISOTONIC_SQL = """
WITH blocks AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(l_extendedprice AS DOUBLE)) AS sy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
), pref AS (
  SELECT x, n, sy,
         sum(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cn,
         sum(sy) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cs
  FROM blocks
), pair AS (
  SELECT lo.x AS xj, hi.x AS xk,
         (hi.cs - (lo.cs - lo.sy)) / (hi.cn - (lo.cn - lo.n)) AS m
  FROM pref lo JOIN pref hi ON lo.x <= hi.x
), minmean AS (
  SELECT xj, xk AS xi,
         min(m) OVER (PARTITION BY xj ORDER BY xk DESC
                      ROWS UNBOUNDED PRECEDING) AS mm
  FROM pair
), iso AS (
  SELECT xi, max(mm) AS y_iso FROM minmean GROUP BY 1
)
SELECT b.x AS quantity, CAST(b.n AS BIGINT) AS n,
       b.sy / b.n AS y_mean, iso.y_iso
FROM blocks b JOIN iso ON b.x = iso.xi
"""

QUERIES["isotonic_price_by_quantity"] = isotonic_price_by_quantity
ORACLE_SQL["isotonic_price_by_quantity"] = ISOTONIC_SQL
