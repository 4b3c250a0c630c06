"""Embedding scalar-quantization contract (operators/quantize.py).

Value-hashes the per-dimension quantizer parameters AND the
reconstruction-error profile, so the oracle re-derives the full
quantize→dequantize round trip bit-for-bit (float32 inputs widened to
double on both sides; round-half-up on non-negative operands matches
DuckDB's round-half-away)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.quantize import quantization_error_stats
from ..sources.loaders import load_table


def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantization_error_stats(emb)


QUANTIZE_STATS_SQL = """
WITH ex AS (
  SELECT vec_id, unnest(range(len(embedding))) AS dim, embedding
  FROM embeddings
), vals AS (
  SELECT vec_id, CAST(dim AS INTEGER) AS dim,
         CAST(embedding[CAST(dim AS INTEGER) + 1] AS DOUBLE) AS v
  FROM ex
), stats AS (
  SELECT dim, min(v) AS dmin, max(v) AS dmax,
         (max(v) - min(v)) / 255.0 AS scale
  FROM vals GROUP BY dim
), coded AS (
  SELECT vals.dim, v, dmin, dmax, scale,
         CASE WHEN scale = 0 THEN 0.0
              ELSE least(greatest(round((v - dmin) / scale), 0.0), 255.0)
         END AS code
  FROM vals JOIN stats USING (dim)
)
SELECT dim, any_value(dmin) AS dmin, any_value(dmax) AS dmax,
       any_value(scale) AS scale,
       avg(abs(v - (dmin + code * scale))) AS avg_abs_err,
       max(abs(v - (dmin + code * scale))) AS max_abs_err
FROM coded GROUP BY dim
"""




def label_centroid_drift_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label mean embedding vs the global mean — the embedding-
    space distribution-shift monitor."""
    from ..operators.evaluation import label_centroid_drift

    return label_centroid_drift(load_table(spark, sf_dir, "embeddings"))


LABEL_DRIFT_SQL = """
WITH ex AS (
  SELECT label, unnest(range(len(embedding))) AS dim, embedding
  FROM embeddings
), vals AS (
  SELECT label, CAST(dim AS INTEGER) AS pos,
         CAST(embedding[CAST(dim AS INTEGER) + 1] AS DOUBLE) AS v
  FROM ex
), per AS (
  SELECT label, pos, avg(v) AS m FROM vals GROUP BY 1, 2
), gmean AS (
  SELECT pos, avg(v) AS g FROM vals GROUP BY 1
), n AS (
  SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1
)
SELECT label, n_vecs,
  sqrt(sum(m * m)) AS centroid_l2,
  sum(m * g) / (sqrt(sum(m * m)) * sqrt(sum(g * g))) AS cos_to_global,
  sqrt(sum((m - g) * (m - g))) AS dist_to_global
FROM per JOIN gmean USING (pos) JOIN n USING (label)
GROUP BY label, n_vecs
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embedding_quantize_stats": embedding_quantize_stats,
    "label_centroid_drift_embeddings": label_centroid_drift_embeddings,
}

ORACLE_SQL: dict[str, str] = {
    "embedding_quantize_stats": QUANTIZE_STATS_SQL,
    "label_centroid_drift_embeddings": LABEL_DRIFT_SQL,
}
