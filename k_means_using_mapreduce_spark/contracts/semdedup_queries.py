"""Semantic-dedup contract queries (operators/semdedup.py).

Fixed centroids (contract_constants.EMBEDDING_CENTROIDS, the same
literals the kmeans_assign_embeddings contract folds) make the cluster
assignment — and therefore the whole SemDeDup sweep — replayable in
ANSI SQL. The cosine threshold is dedup_queries.COSINE_DUP_THRESHOLD
(0.30): the same value the global near-dup contract uses, so the two
queries differ only by the cluster-locality restriction, which is the
property worth testing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contract_constants import EMBEDDING_CENTROIDS
from ..operators.semdedup import semantic_dedup_summary, semantic_dedup_survivors
from ..sources.loaders import load_table
from .dedup_queries import COSINE_DUP_THRESHOLD
from .kmeans_queries import _assign_embeddings_inner

_COS = (
    "list_reduce(list_transform(list_zip(a.v, b.v), z -> z[1] * z[2]), (x, y) -> x + y)"
    " / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (p, q) -> p + q))"
    " * sqrt(list_reduce(list_transform(b.v, x -> x * x), (p, q) -> p + q)))"
)

# assignment (rn=1 argmin over the fixed centroid literals) + member
# vectors + within-cluster pair edges + NMS-style min-id survivor sweep
_SEMDEDUP_CTE = f"""
asg AS (
  SELECT vec_id, cid FROM ({_assign_embeddings_inner()}) t WHERE rn = 1
),
mem AS (
  SELECT g.vec_id, g.cid, em.embedding::DOUBLE[] AS v
  FROM asg g JOIN embeddings em ON g.vec_id = em.vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_COS} >= {COSINE_DUP_THRESHOLD!r}
),
verdicts AS (
  SELECT g.vec_id, g.cid,
         g.vec_id IN (SELECT id_b FROM pairs) AS is_dup
  FROM asg g
)
"""


def semantic_dedup_survivors_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_survivors(
        emb, EMBEDDING_CENTROIDS, threshold=COSINE_DUP_THRESHOLD, keep="min_id"
    ).select(F.col("id").alias("vec_id"), F.col("cid").cast("int").alias("cid"))


SEMANTIC_DEDUP_SURVIVORS_SQL = f"""
WITH {_SEMDEDUP_CTE}
SELECT vec_id, CAST(cid AS INTEGER) AS cid FROM verdicts WHERE NOT is_dup
"""


def semantic_dedup_summary_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_summary(
        emb, EMBEDDING_CENTROIDS, threshold=COSINE_DUP_THRESHOLD, keep="min_id"
    ).select(
        F.col("cid").cast("int").alias("cid"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.col("n_survivors").cast("long").alias("n_survivors"),
        "drop_ratio",
    )


SEMANTIC_DEDUP_SUMMARY_SQL = f"""
WITH {_SEMDEDUP_CTE}
SELECT CAST(cid AS INTEGER) AS cid,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) / count(*), 6)
         AS drop_ratio
FROM verdicts GROUP BY cid
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "semantic_dedup_survivors_embeddings": semantic_dedup_survivors_embeddings,
    "semantic_dedup_summary_embeddings": semantic_dedup_summary_embeddings,
}

ORACLE_SQL: dict[str, str] = {
    "semantic_dedup_survivors_embeddings": SEMANTIC_DEDUP_SURVIVORS_SQL,
    "semantic_dedup_summary_embeddings": SEMANTIC_DEDUP_SUMMARY_SQL,
}
