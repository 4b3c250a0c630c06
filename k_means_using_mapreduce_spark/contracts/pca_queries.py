"""PCA contract (operators/pca.py): the exact moment-identity
covariance matrix of the embeddings table — the data-sized half of the
PCA split (the driver eigensolve is numpy, covered by tests)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import covariance_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    out = covariance_matrix(emb, "embedding", "vec_id")
    return out.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "cov",
    )


COVARIANCE_SQL = """
WITH expl AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS pos
  FROM embeddings WHERE embedding IS NOT NULL
),
pairs AS (
  SELECT a.pos AS i, b.pos AS j, a.v AS x, b.v AS y
  FROM expl a JOIN expl b ON a.vec_id = b.vec_id AND a.pos <= b.pos
)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
  CASE WHEN count(*) > 1
       THEN (sum(x * y) - sum(x) * sum(y) / CAST(count(*) AS DOUBLE))
            / (CAST(count(*) AS DOUBLE) - 1)
       ELSE 0.0 END AS cov
FROM pairs GROUP BY i, j
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embedding_covariance": embedding_covariance,
}

ORACLE_SQL: dict[str, str] = {
    "embedding_covariance": COVARIANCE_SQL,
}


def embedding_effective_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation-ratio effective dimensionality of the embedding
    corpus — anisotropy-collapse screen
    (operators/pca.py::effective_dim)."""
    from ..operators.pca import effective_dim

    return effective_dim(
        load_table(spark, sf_dir, "embeddings"), "embedding", "vec_id"
    )


EFFECTIVE_DIM_SQL = """
WITH expl AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS pos
  FROM embeddings WHERE embedding IS NOT NULL
),
pairs AS (
  SELECT a.pos AS i, b.pos AS j, a.v AS x, b.v AS y
  FROM expl a JOIN expl b ON a.vec_id = b.vec_id AND a.pos <= b.pos
),
cov AS (
  SELECT i, j,
    CASE WHEN count(*) > 1
         THEN (sum(x * y) - sum(x) * sum(y) / CAST(count(*) AS DOUBLE))
              / (CAST(count(*) AS DOUBLE) - 1)
         ELSE 0.0 END AS cov
  FROM pairs GROUP BY 1, 2
),
agg AS (
  SELECT CAST(max(j) + 1 AS INTEGER) AS d,
    sum(CASE WHEN i = j THEN cov ELSE 0.0 END) AS trace_var,
    sum(CASE WHEN i = j THEN cov * cov ELSE 2.0 * cov * cov END)
      AS tr2
  FROM cov
),
nv AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vecs
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT n_vecs, d, trace_var,
  trace_var * trace_var / nullif(tr2, 0.0) AS effective_dim
FROM agg CROSS JOIN nv
"""

QUERIES["embedding_effective_dim"] = embedding_effective_dim
ORACLE_SQL["embedding_effective_dim"] = EFFECTIVE_DIM_SQL
