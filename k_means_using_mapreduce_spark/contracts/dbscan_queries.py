"""DBSCAN contracts (operators/dbscan.py) over a one-month lineitem
slice in (quantity, price/1000) space.

The oracle skips the grid trick and pairs points by a direct distance
theta-join — valid because eps-cell pruning is EXACT (|Δx| ≤ eps ⟹
cell indexes differ by ≤ 1), so both sides see identical neighbor
sets; d² is the same left-to-right expression in both engines, making
even boundary ties bit-identical. Cluster labels use the recursive-CTE
transitive closure (the near_dedup oracle pattern) — that query is
quadratic in component size, so the clusters contract stays at the
driver's sf0.01 and is deliberately NOT a bench entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table

DBSCAN_EPS = 1.5
DBSCAN_MIN_PTS = 5


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
    ).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pid"),
        F.col("l_quantity").cast("double").alias("x"),
        (F.col("l_extendedprice") / 1000).alias("y"),
    )


def dbscan_classes_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point DBSCAN role (core/border/noise) with neighbor counts."""
    from ..operators.dbscan import dbscan_classes

    return dbscan_classes(
        _points(spark, sf_dir), "x", "y", "pid",
        eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS,
    )


def dbscan_clusters_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size census: (cluster, n_points), noise under -1."""
    from ..operators.dbscan import dbscan

    out = dbscan(
        _points(spark, sf_dir), "x", "y", "pid",
        eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS,
    )
    return out.groupBy("cluster").agg(F.count("*").alias("n_points"))


_PTS_SQL = """
pts AS (
  SELECT l_orderkey * 10 + l_linenumber AS pid,
         CAST(l_quantity AS DOUBLE) AS x,
         l_extendedprice / 1000 AS y
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-02-01'
)"""

_EPS2 = DBSCAN_EPS * DBSCAN_EPS

_CLASSES_SQL_CORE = f"""
{_PTS_SQL},
nb AS (
  SELECT a.pid AS id, b.pid AS nid
  FROM pts a JOIN pts b
    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_EPS2!r}
),
counts AS (SELECT id, CAST(count(*) AS BIGINT) AS n_neighbors FROM nb GROUP BY 1),
core AS (SELECT id FROM counts WHERE n_neighbors >= {DBSCAN_MIN_PTS}),
hasc AS (
  SELECT DISTINCT nb.id FROM nb
  JOIN core ON core.id = nb.nid
  WHERE nb.id <> nb.nid
),
classes AS (
  SELECT c.id, c.n_neighbors,
    CASE WHEN c.n_neighbors >= {DBSCAN_MIN_PTS} THEN 'core'
         WHEN hasc.id IS NOT NULL THEN 'border'
         ELSE 'noise' END AS cls
  FROM counts c LEFT JOIN hasc ON hasc.id = c.id
)"""

DBSCAN_CLASSES_SQL = (
    "WITH " + _CLASSES_SQL_CORE + "\nSELECT id, n_neighbors, cls FROM classes"
)

DBSCAN_CLUSTERS_SQL = (
    "WITH RECURSIVE "
    + _CLASSES_SQL_CORE
    + f""",
core_edges AS (
  SELECT nb.id AS src, nb.nid AS dst FROM nb
  JOIN core ca ON ca.id = nb.id
  JOIN core cb ON cb.id = nb.nid
  WHERE nb.id <> nb.nid
),
reach AS (
  SELECT src AS id, src AS r FROM core_edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN core_edges e ON e.src = reach.id
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
core_lbl AS (
  SELECT core.id, coalesce(comp.component, core.id) AS cluster
  FROM core LEFT JOIN comp ON comp.id = core.id
),
border_lbl AS (
  SELECT nb.id, min(cl.cluster) AS cluster
  FROM nb JOIN core_lbl cl ON cl.id = nb.nid
  WHERE nb.id <> nb.nid
  GROUP BY nb.id
),
labeled AS (
  SELECT classes.id,
    CASE WHEN classes.cls = 'core' THEN core_lbl.cluster
         WHEN classes.cls = 'border' THEN border_lbl.cluster
         ELSE -1 END AS cluster
  FROM classes
  LEFT JOIN core_lbl ON core_lbl.id = classes.id
  LEFT JOIN border_lbl ON border_lbl.id = classes.id
)
SELECT cluster, CAST(count(*) AS BIGINT) AS n_points
FROM labeled GROUP BY cluster"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dbscan_classes_lineitem": dbscan_classes_lineitem,
    "dbscan_clusters_lineitem": dbscan_clusters_lineitem,
}

ORACLE_SQL: dict[str, str] = {
    "dbscan_classes_lineitem": DBSCAN_CLASSES_SQL,
    "dbscan_clusters_lineitem": DBSCAN_CLUSTERS_SQL,
}
