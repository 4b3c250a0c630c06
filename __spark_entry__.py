"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (iterative seeded K-Means on the
sf0.001 embeddings table). ``queries()``/``oracle_sql()`` re-export the
engine's contract registry (k_means_using_mapreduce_spark.contract):
each implemented operator from SURVEY.md §2 as a (PySpark builder,
DuckDB oracle SQL) pair checked by the driver at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from k_means_using_mapreduce_spark import contracts  # noqa: E402
from k_means_using_mapreduce_spark.sources.loaders import k_row_df  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: seeded iterative K-Means (k=4) over the 64-D embeddings
    at sf0.001 — the reference's whole analytics surface (Lloyd's
    algorithm, SURVEY.md §0) generalized to n-D DataFrame input.
    Returns one row per cluster: (cid, n, sse-contribution, centroid).
    """
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.kmeans import assign, kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    feats = emb.select(F.col("embedding").cast("array<double>").alias("features"))
    result = kmeans_fit(feats, k=4, seed=42, max_iter=20)
    assigned = assign(feats, result.centroids)
    return (
        assigned.groupBy("cid")
        .agg(F.count("*").alias("n"), F.sum("sq_dist").alias("cluster_sse"))
        .join(
            k_row_df(
                spark,
                [(c, v) for c, v in result.centroids],
                "cid int, centroid array<double>",
            ),
            "cid",
        )
        .orderBy("cid")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contracts.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contracts.ORACLE_SQL)
