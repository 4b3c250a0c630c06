"""ROLLUP / CUBE / GROUPING SETS contract queries with DuckDB oracles.

Multi-level aggregation — a family the reference lacks outright
(SURVEY.md §2: "Grouping sets / cube / rollup: absent"). Spark plans
these as a single Expand + hash-aggregate (one shuffle for every
grouping level at once), which is exactly how a 100 TB rollup should
run — never N separate groupBys unioned.

Float policy (memory: oracle-parity tricks): AVG only (reduce-order
noise shrinks by 1/n) or decimal-cast sums; GROUPING() markers and
counts are integer-exact and disambiguate the NULL-vs-subtotal rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def acctbal_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region → nation hierarchy: per-nation, per-region
    subtotal, and grand-total customer stats. Dims broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("long").alias("g_region"),
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.count("*").alias("n_customers"),
        F.avg("c_acctbal").alias("avg_acctbal"),
    )


ACCTBAL_ROLLUP_SQL = """
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       count(*) AS n_customers,
       avg(c_acctbal) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def lineitem_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping levels in
    one Expand+aggregate pass. Sum is decimal-exact, avg absorbs fp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_returnflag"),
        F.grouping("l_linestatus").cast("long").alias("g_linestatus"),
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_qty"),
        F.avg("l_discount").alias("avg_discount"),
    )


LINEITEM_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_returnflag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_linestatus,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       avg(l_discount) AS avg_discount
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — (status), (priority), (): two unrelated
    single-dim breakdowns plus a grand total in one shuffle, where the
    naive formulation would scan orders three times."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n_orders,
               avg(o_totalprice) AS avg_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


ORDERS_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       count(*) AS n_orders,
       avg(o_totalprice) AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "acctbal_rollup_region_nation": acctbal_rollup_region_nation,
    "lineitem_cube_flags": lineitem_cube_flags,
    "orders_grouping_sets": orders_grouping_sets,
}

ORACLE_SQL: dict[str, str] = {
    "acctbal_rollup_region_nation": ACCTBAL_ROLLUP_SQL,
    "lineitem_cube_flags": LINEITEM_CUBE_SQL,
    "orders_grouping_sets": ORDERS_GROUPING_SETS_SQL,
}
