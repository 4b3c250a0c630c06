"""Skew-mitigation contract queries with DuckDB oracles.

The salted operators (operators/skew.py) exist to change the SHUFFLE
DISTRIBUTION, never the answer — so their oracle is simply the plain
GROUP BY / plain join SQL. A green row here proves the two-phase salt
decomposition and the replicated-dimension join are result-identical
to the direct formulation (the property that makes them safe drop-in
mitigations), while the salt math itself stays engine-internal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_aggregate, salted_broadcast_left
from ..sources.loaders import load_table


def salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type count and value sum via the two-phase salted
    aggregate — must equal the plain GROUP BY exactly."""
    events = load_table(spark, sf_dir, "events")
    # per-row DECIMAL(18,6) cast -> exact (order-independent) decimal
    # addition through BOTH salt phases — the engine's money-sum policy
    # (contracts/tpch_queries.py::_dec_sum)
    prepped = events.select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("value")
    )
    return salted_aggregate(
        prepped, ["event_type"], sums=["value"], buckets=16
    ).select(
        "event_type", "n", F.col("sum_value").cast("double").alias("sum_value")
    )


SALTED_EVENT_STATS_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


def salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part brand through the salted replicated-dimension
    join — row multiplicity (and therefore every aggregate) must match
    the plain equi-join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    joined = salted_broadcast_left(li, part, "partkey", buckets=8)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )


SALTED_BRAND_REVENUE_SQL = """
SELECT p_brand, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "salted_event_type_stats": salted_event_type_stats,
    "salted_brand_revenue": salted_brand_revenue,
}

ORACLE_SQL: dict[str, str] = {
    "salted_event_type_stats": SALTED_EVENT_STATS_SQL,
    "salted_brand_revenue": SALTED_BRAND_REVENUE_SQL,
}


def heavy_keys_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest l_partkey values with their row share — the
    measure-first half of skew mitigation."""
    from ..operators.skew import heavy_keys

    return heavy_keys(load_table(spark, sf_dir, "lineitem"), ["l_partkey"], top=10)


HEAVY_KEYS_SQL = """
WITH c AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
), t AS (
  SELECT CAST(count(*) AS DOUBLE) AS total FROM lineitem
)
SELECT l_partkey, n, n / total AS share
FROM c CROSS JOIN t
ORDER BY n DESC, l_partkey ASC
LIMIT 10
"""


def key_skew_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row l_partkey distribution report (max/p50/p99 of per-key
    counts, skew factor, recommended salt buckets)."""
    from ..operators.skew import skew_report

    return skew_report(load_table(spark, sf_dir, "lineitem"), ["l_partkey"])


SKEW_REPORT_SQL = """
WITH c AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS total_rows,
       max(n) AS max_key_n,
       quantile_cont(n, 0.5) AS p50_key_n,
       quantile_cont(n, 0.99) AS p99_key_n,
       CAST(max(n) AS DOUBLE) / sum(n) AS top1_share,
       CAST(max(n) AS DOUBLE) / quantile_cont(n, 0.5) AS skew_factor,
       least(64, CAST(ceil(CAST(max(n) AS DOUBLE) / quantile_cont(n, 0.5))
                      AS BIGINT)) AS recommended_buckets
FROM c
"""

QUERIES["heavy_keys_lineitem"] = heavy_keys_lineitem
QUERIES["key_skew_report_lineitem"] = key_skew_report_lineitem
ORACLE_SQL["heavy_keys_lineitem"] = HEAVY_KEYS_SQL
ORACLE_SQL["key_skew_report_lineitem"] = SKEW_REPORT_SQL


def join_advice_lineitem_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured join-strategy recommendation for lineitem ⋈ part on
    partkey with a deliberately tiny broadcast limit, so the decision
    exercised is the skew branch, not the trivial broadcast one."""
    from ..operators.skew import join_plan_advice

    return join_plan_advice(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        "l_partkey",
        "p_partkey",
        broadcast_row_limit=100,
        skew_threshold=2.0,
    )


JOIN_ADVICE_SQL = """
WITH c AS (
  SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS fact_keys,
         CAST(sum(n) AS BIGINT) AS fact_rows,
         max(n) AS max_key_n,
         quantile_cont(n, 0.5) AS p50_key_n
  FROM c
), d AS (
  SELECT CAST(count(*) AS BIGINT) AS dim_rows FROM part
)
SELECT fact_rows, dim_rows, fact_keys, max_key_n, p50_key_n,
       max_key_n / p50_key_n AS skew_factor,
       CASE WHEN dim_rows <= 100 THEN 'broadcast'
            WHEN max_key_n / p50_key_n > 2.0 THEN 'salted_shuffle'
            ELSE 'shuffle' END AS strategy,
       CASE WHEN dim_rows > 100 AND max_key_n / p50_key_n > 2.0
            THEN least(64, CAST(ceil(max_key_n / p50_key_n) AS BIGINT))
            ELSE 0 END AS salt_buckets
FROM s CROSS JOIN d
"""

QUERIES["join_advice_lineitem_part"] = join_advice_lineitem_part
ORACLE_SQL["join_advice_lineitem_part"] = JOIN_ADVICE_SQL
