"""Lightweight-coreset contract (operators/coreset.py): deterministic
Poisson sampling with closed-form Bachem-2018 probabilities over the
embeddings table — selection, probabilities and weights all
reproducible by the DuckDB oracle via the house md5 coin."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import load_table

CORESET_M = 150


def lightweight_coreset_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.coreset import lightweight_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    out = lightweight_coreset(
        emb, "embedding", "vec_id", m=CORESET_M, salt="lwcs"
    )
    return out.select("vec_id", "q", "p", "weight")


CORESET_SQL = f"""
WITH expl AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dims AS (
  SELECT i AS dim, avg(CAST(v AS DOUBLE)) AS mval
  FROM expl GROUP BY i
),
d2 AS (
  SELECT vec_id,
         sum((CAST(v AS DOUBLE) - mval) * (CAST(v AS DOUBLE) - mval)) AS d2
  FROM expl JOIN dims ON dims.dim = expl.i
  GROUP BY vec_id
),
tot AS (SELECT sum(d2) AS s, count(*) AS n FROM d2),
scored AS (
  SELECT vec_id,
    0.5 / n + CASE WHEN s > 0 THEN 0.5 * d2 / s ELSE 0.0 END AS q
  FROM d2, tot
),
sel AS (
  SELECT vec_id, q,
    least(1.0, {float(CORESET_M)!r} * q) AS p,
    (('0x' || substr(md5('lwcs:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
     + 1) / {float(1 << 60)!r} AS u
  FROM scored
)
SELECT vec_id, q, p, 1.0 / p AS weight FROM sel WHERE u <= p
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lightweight_coreset_embeddings": lightweight_coreset_embeddings,
}

ORACLE_SQL: dict[str, str] = {
    "lightweight_coreset_embeddings": CORESET_SQL,
}
