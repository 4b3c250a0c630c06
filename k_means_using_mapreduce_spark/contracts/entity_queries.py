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


import math

FS_FIELDS = ["nation", "segment", "balance", "name"]
FS_M = {"nation": 0.95, "segment": 0.9, "balance": 0.8, "name": 0.7}
FS_U = {"nation": 0.04, "segment": 0.2, "balance": 0.01, "name": 0.001}
FS_UPPER, FS_LOWER = 3.0, -3.0
_BAL_TOL = 100.0
_NAME_D = 3


def fs_u_probabilities_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data-driven u-probabilities (value-collision rates) for the
    customer linkage fields (operators/entity.py::fs_u_probabilities)."""
    from ..operators.entity import fs_u_probabilities

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    return fs_u_probabilities(cust, ["nation", "segment", "bal_bucket"])


FS_U_SQL = """
WITH tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM customer),
vals AS (
  SELECT 'nation' AS field, CAST(c_nationkey AS VARCHAR) AS value
  FROM customer
  UNION ALL
  SELECT 'segment', c_mktsegment FROM customer
  UNION ALL
  SELECT 'bal_bucket',
         CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)
  FROM customer
),
counts AS (SELECT field, value, count(*) AS cnt FROM vals GROUP BY 1, 2)
SELECT field,
       sum((CAST(cnt AS DOUBLE) / n) * (CAST(cnt AS DOUBLE) / n)) AS u
FROM counts, tot GROUP BY field
"""


def fs_match_scores_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter scoring of the sorted-neighborhood candidate
    pairs: 4 agreement fields, log2 likelihood weights, 3-way decision
    (operators/entity.py::fs_score_pairs)."""
    from ..operators.entity import (
        fs_score_pairs,
        sorted_neighborhood_candidates,
    )

    cust = load_table(spark, sf_dir, "customer")
    pairs = sorted_neighborhood_candidates(
        cust,
        F.struct(F.col("c_mktsegment"), F.col("c_acctbal")),
        id_col="c_custkey",
        window=SN_WINDOW,
    )
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("nation_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_acctbal").alias("bal_a"),
        F.col("c_name").alias("name_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("nation_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("c_acctbal").alias("bal_b"),
        F.col("c_name").alias("name_b"),
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    scored = fs_score_pairs(
        joined,
        {
            "nation": F.col("nation_a") == F.col("nation_b"),
            "segment": F.col("seg_a") == F.col("seg_b"),
            "balance": F.abs(F.col("bal_a") - F.col("bal_b")) < _BAL_TOL,
            "name": F.levenshtein("name_a", "name_b") <= _NAME_D,
        },
        FS_M,
        FS_U,
        upper=FS_UPPER,
        lower=FS_LOWER,
    )
    return scored.select(
        "id_a", "id_b",
        "agree_nation", "agree_segment", "agree_balance", "agree_name",
        "weight", "decision",
    )


def _fs_w(f: str) -> tuple[float, float]:
    return (
        math.log2(FS_M[f] / FS_U[f]),
        math.log2((1.0 - FS_M[f]) / (1.0 - FS_U[f])),
    )


def _fs_weight_sql() -> str:
    terms = []
    conds = {
        "nation": "a.c_nationkey = b.c_nationkey",
        "segment": "a.c_mktsegment = b.c_mktsegment",
        "balance": f"abs(a.c_acctbal - b.c_acctbal) < {_BAL_TOL!r}",
        "name": f"levenshtein(a.c_name, b.c_name) <= {_NAME_D}",
    }
    for f in FS_FIELDS:
        wa, wd = _fs_w(f)
        terms.append(
            f"(CASE WHEN {conds[f]} THEN {wa!r} ELSE {wd!r} END)"
        )
    return " + ".join(terms), conds


_FS_WEIGHT_EXPR, _FS_CONDS = _fs_weight_sql()

FS_SCORES_SQL = f"""
WITH ranked AS (
  SELECT c_custkey AS id,
         row_number() OVER (
           ORDER BY c_mktsegment, c_acctbal, c_custkey
         ) AS rk
  FROM customer
),
pairs AS (
  SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
  FROM ranked a JOIN ranked b
    ON b.rk BETWEEN a.rk + 1 AND a.rk + {SN_WINDOW}
)
SELECT p.id_a, p.id_b,
  CAST({_FS_CONDS['nation']} AS INTEGER) AS agree_nation,
  CAST({_FS_CONDS['segment']} AS INTEGER) AS agree_segment,
  CAST({_FS_CONDS['balance']} AS INTEGER) AS agree_balance,
  CAST({_FS_CONDS['name']} AS INTEGER) AS agree_name,
  {_FS_WEIGHT_EXPR} AS weight,
  CASE WHEN {_FS_WEIGHT_EXPR} > {FS_UPPER!r} THEN 'match'
       WHEN {_FS_WEIGHT_EXPR} < {FS_LOWER!r} THEN 'non_match'
       ELSE 'possible' END AS decision
FROM pairs p
JOIN customer a ON a.c_custkey = p.id_a
JOIN customer b ON b.c_custkey = p.id_b
"""

QUERIES["fs_u_probabilities_customers"] = fs_u_probabilities_customers
ORACLE_SQL["fs_u_probabilities_customers"] = FS_U_SQL
QUERIES["fs_match_scores_customers"] = fs_match_scores_customers
ORACLE_SQL["fs_match_scores_customers"] = FS_SCORES_SQL


def _customer_pairs(spark: SparkSession, sf_dir: str):
    cust = load_table(spark, sf_dir, "customer")
    pairs = blocked_match_candidates(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        max_distance=_MAX_D,
    ).select("id_a", "id_b")
    return cust, pairs


_COMP_SQL = f"""
cand AS ({ENTITY_SQL}),
edges AS (SELECT id_a AS src, id_b AS dst FROM cand
          UNION SELECT id_b, id_a FROM cand),
reach AS (SELECT src AS id, src AS r FROM edges
          UNION SELECT e.dst, reach.r FROM reach
                 JOIN edges e ON e.src = reach.id),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
"""


def customer_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-id assignment: transitive closure of the blocked match
    pairs (operators/entity.py::resolve_entities); singletons keep
    their own key. Oracle: WITH RECURSIVE reachability."""
    from ..operators.entity import resolve_entities

    cust, pairs = _customer_pairs(spark, sf_dir)
    return resolve_entities(cust, pairs, "c_custkey")


CUSTOMER_ENTITIES_SQL = f"""
WITH RECURSIVE {_COMP_SQL}
SELECT c.c_custkey AS id,
       coalesce(comp.component, c.c_custkey) AS entity_id
FROM customer c LEFT JOIN comp ON comp.id = c.c_custkey
"""


def customer_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship after resolution: per entity, the highest-balance
    member's identity fields + the max balance across members
    (operators/entity.py::golden_records)."""
    from ..operators.entity import golden_records, resolve_entities

    cust, pairs = _customer_pairs(spark, sf_dir)
    ent = resolve_entities(cust, pairs, "c_custkey")
    joined = cust.join(
        ent, cust["c_custkey"] == ent["id"]
    ).drop("id")
    return golden_records(
        joined,
        entity_col="entity_id",
        id_col="c_custkey",
        prefer=[("c_acctbal", "desc")],
        carry=["c_name", "c_mktsegment"],
        agg_max=["c_acctbal"],
    )


CUSTOMER_GOLDEN_SQL = f"""
WITH RECURSIVE {_COMP_SQL},
resolved AS (
  SELECT c.*, coalesce(comp.component, c.c_custkey) AS entity_id
  FROM customer c LEFT JOIN comp ON comp.id = c.c_custkey
), ranked AS (
  SELECT entity_id, c_custkey, c_name, c_mktsegment,
    row_number() OVER (PARTITION BY entity_id
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM resolved
), members AS (
  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
         max(c_acctbal) AS max_c_acctbal
  FROM resolved GROUP BY 1
)
SELECT m.entity_id, m.n_members, m.max_c_acctbal,
       r.c_custkey AS survivor_id, r.c_name, r.c_mktsegment
FROM members m JOIN ranked r ON r.entity_id = m.entity_id AND r.rn = 1
"""

QUERIES["customer_entities"] = customer_entities
ORACLE_SQL["customer_entities"] = CUSTOMER_ENTITIES_SQL
QUERIES["customer_golden_records"] = customer_golden_records
ORACLE_SQL["customer_golden_records"] = CUSTOMER_GOLDEN_SQL
