"""Entity-resolution contract (operators/entity.py): blocked candidate
pairs over the customer table — (nation, market segment) blocks, name
edit distance ≤ 2."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.entity import blocked_match_candidates
from ..sources.loaders import load_table

_MAX_D = 2


def customer_match_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    out = blocked_match_candidates(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        max_distance=_MAX_D,
    )
    return out.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    )


ENTITY_SQL = f"""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS distance
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {_MAX_D}
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "customer_match_candidates": customer_match_candidates,
}

ORACLE_SQL: dict[str, str] = {
    "customer_match_candidates": ENTITY_SQL,
}
