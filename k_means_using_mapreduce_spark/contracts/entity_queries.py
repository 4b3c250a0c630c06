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


SN_WINDOW = 2


def sorted_neighborhood_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidates over (segment, balance) order —
    the multi-attribute pass that catches near-duplicates whose
    equi-blocking key itself is dirty (operators/entity.py::
    sorted_neighborhood_candidates)."""
    from ..operators.entity import sorted_neighborhood_candidates

    cust = load_table(spark, sf_dir, "customer")
    return sorted_neighborhood_candidates(
        cust,
        F.struct(F.col("c_mktsegment"), F.col("c_acctbal")),
        id_col="c_custkey",
        window=SN_WINDOW,
    )


SORTED_NEIGHBORHOOD_SQL = f"""
WITH ranked AS (
  SELECT c_custkey AS id,
         row_number() OVER (
           ORDER BY c_mktsegment, c_acctbal, c_custkey
         ) AS rk
  FROM customer
)
SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
       CAST(b.rk - a.rk AS INTEGER) AS rank_gap
FROM ranked a JOIN ranked b
  ON b.rk BETWEEN a.rk + 1 AND a.rk + {SN_WINDOW}
"""

QUERIES["sorted_neighborhood_customers"] = sorted_neighborhood_customers
ORACLE_SQL["sorted_neighborhood_customers"] = SORTED_NEIGHBORHOOD_SQL
