"""Bloom semi-join contracts (operators/bloomjoin.py) with DuckDB
oracles that reproduce membership — including false positives —
bit-for-bit via the house md5 hash family.

The bitmap is deliberately small (2^17 bits) against ~sf-dependent
build sizes so the false-positive path is actually exercised at sf0.01
instead of being a zero column; correctness is pinned at any sf because
both engines compute identical positions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloomjoin import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom_bitmap,
)
from ..sources.loaders import load_table

BLOOM_BITS = 1 << 17
BLOOM_K = 5
_PRIORITY = "1-URGENT"


def _sql_pos(key_expr: str, i: int) -> str:
    """Mirror of operators/bloomjoin.py: Kirsch–Mitzenmacher double
    hashing — two independent int60 bases from ONE md5 (hex chars
    1–15 and 16–30, the latter mod 2^57), position i = (h1 + i*h2)
    mod num_bits."""
    from ..operators.bloomjoin import _H2_MOD

    md5 = f"md5(CAST({key_expr} AS VARCHAR))"
    h1 = f"('0x' || substr({md5}, 1, 15))::BIGINT"
    h2 = f"(('0x' || substr({md5}, 16, 15))::BIGINT % {_H2_MOD})"
    return f"(({h1} + {i} * {h2}) % {BLOOM_BITS})"


def bloom_prefilter_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered lineitem rows (build side: urgent orders),
    aggregated per return flag — the pre-shuffle candidate set a real
    pipeline would feed to the exact join."""
    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == _PRIORITY
    )
    passed = bloom_semi_join(
        li, urgent, "l_orderkey", "o_orderkey",
        num_bits=BLOOM_BITS, num_hashes=BLOOM_K,
    )
    return passed.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("total_qty"),
    )


def _bits_cte() -> str:
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT {_sql_pos('key', i)} AS pos FROM build"
        for i in range(BLOOM_K)
    )
    return f"""
build AS (
  SELECT DISTINCT o_orderkey AS key FROM orders
  WHERE o_orderpriority = '{_PRIORITY}'
),
bits AS (
  SELECT DISTINCT pos FROM (
    {unions}
  )
)"""


def _sql_is_bloom(key_expr: str) -> str:
    return " AND ".join(
        f"{_sql_pos(key_expr, i)} IN (SELECT pos FROM bits)"
        for i in range(BLOOM_K)
    )


BLOOM_PREFILTER_SQL = f"""
WITH {_bits_cte()}
SELECT l_returnflag,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(l_quantity) AS DOUBLE) AS total_qty
FROM lineitem
WHERE {_sql_is_bloom('l_orderkey')}
GROUP BY l_returnflag
"""


def bloom_vs_exact_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-quality audit: per return flag, bloom-passed rows vs the
    exact semi-join, and the false-positive overshoot (always >= 0 —
    the superset guarantee, oracle-checked)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey"
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == _PRIORITY
    )
    bitmap = build_bloom_bitmap(
        urgent, "o_orderkey", num_bits=BLOOM_BITS, num_hashes=BLOOM_K
    )
    keys = urgent.select(F.col("o_orderkey").alias("k")).distinct()
    probe = li.join(F.broadcast(bitmap)).join(
        F.broadcast(keys), F.col("l_orderkey") == F.col("k"), "left"
    )
    is_bloom = bloom_might_contain(
        F.col("l_orderkey"), F.col("words"),
        num_bits=BLOOM_BITS, num_hashes=BLOOM_K,
    )
    is_exact = F.col("k").isNotNull()
    return probe.groupBy("l_returnflag").agg(
        F.sum(is_bloom.cast("long")).alias("bloom_rows"),
        F.sum(is_exact.cast("long")).alias("exact_rows"),
        F.sum((is_bloom & ~is_exact).cast("long")).alias("false_positives"),
    )


BLOOM_VS_EXACT_SQL = f"""
WITH {_bits_cte()},
probe AS (
  SELECT l_returnflag,
    CASE WHEN {_sql_is_bloom('l_orderkey')} THEN 1 ELSE 0 END AS is_bloom,
    CASE WHEN l_orderkey IN (SELECT key FROM build) THEN 1 ELSE 0 END
      AS is_exact
  FROM lineitem
)
SELECT l_returnflag,
  CAST(sum(is_bloom) AS BIGINT) AS bloom_rows,
  CAST(sum(is_exact) AS BIGINT) AS exact_rows,
  CAST(sum(CASE WHEN is_bloom = 1 AND is_exact = 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS false_positives
FROM probe GROUP BY l_returnflag
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bloom_prefilter_lineitem": bloom_prefilter_lineitem,
    "bloom_vs_exact_lineitem": bloom_vs_exact_lineitem,
}

ORACLE_SQL: dict[str, str] = {
    "bloom_prefilter_lineitem": BLOOM_PREFILTER_SQL,
    "bloom_vs_exact_lineitem": BLOOM_VS_EXACT_SQL,
}
