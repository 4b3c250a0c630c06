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
