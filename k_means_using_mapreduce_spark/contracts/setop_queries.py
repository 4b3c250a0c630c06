"""Set-operation / semi-anti-join contract queries with oracles.

Rounds out the relational operator families the reference lacks
entirely (SURVEY.md §2: "Set ops: only implicit UNION ALL via file
concat; no intersect/except/distinct"): DISTINCT, UNION, EXCEPT-shaped
anti join, IN-shaped semi join, and an exists-aggregate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection."""
    return load_table(spark, sf_dir, "events").select("event_type").distinct()


DISTINCT_EVENT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never placed an order. The orders side
    reduces to its join key before the anti join, so only keys shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = (
    "SELECT c_custkey, c_name, c_mktsegment FROM customer "
    "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
)


def suppliers_of_shipped_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: suppliers with at least one lineitem."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


SUPPLIERS_OF_SHIPPED_PARTS_SQL = (
    "SELECT s_suppkey, s_name FROM supplier "
    "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)"
)


def nation_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (deduplicating) of two label sets — the explicit set-op
    the reference only had implicitly as multi-file concat (O2)."""
    nations = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("label")
    )
    segments = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("label")
    )
    return nations.union(segments).distinct()


NATION_UNION_SEGMENTS_SQL = (
    "SELECT n_name AS label FROM nation UNION SELECT c_mktsegment AS label FROM customer"
)


def deep_discount_small_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics — Spark ``subtract``): partkeys shipped at
    deep discount, minus large-size parts."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    discounted = (
        li.filter(F.col("l_discount") > 0.09)
        .select(F.col("l_partkey").alias("partkey"))
        .distinct()
    )
    large = part.filter(F.col("p_size") > 10).select(
        F.col("p_partkey").alias("partkey")
    )
    return discounted.subtract(large)


DEEP_DISCOUNT_SMALL_PARTS_SQL = (
    "SELECT DISTINCT l_partkey AS partkey FROM lineitem WHERE l_discount > 0.09 "
    "EXCEPT SELECT p_partkey AS partkey FROM part WHERE p_size > 10"
)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-flavored: pure filter + single aggregate. Output is a
    decimal-exact revenue (order-independent) plus the row count."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * F.col("l_discount")
    return (
        li.filter(
            (F.col("l_quantity") < 24)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
        )
        .agg(
            F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = (
    "SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) "
    "AS revenue, count(*) AS n_items FROM lineitem "
    "WHERE l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07"
)


def common_active_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): market segments that appear both among
    positive-balance customers and among customers with an order in
    1996+. Spark's ``intersect`` == SQL INTERSECT (dedups both sides);
    plans as a distinct-aggregated semi join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.where(F.col("c_acctbal") > 0).select("c_mktsegment")
    active = (
        cust.join(
            orders.where(
                F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
            ),
            cust.c_custkey == orders.o_custkey,
            "left_semi",
        ).select("c_mktsegment")
    )
    return rich.intersect(active)


COMMON_ACTIVE_SEGMENTS_SQL = """
SELECT c_mktsegment FROM customer WHERE c_acctbal > 0
INTERSECT
SELECT c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
"""


def nation_segment_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per nation, the sorted set of market segments
    among its customers. ``sort_array(collect_set(..))`` is the
    engine-portable form — ``collect_list`` order is shuffle-dependent
    and must never appear in a deterministic contract. The set is
    emitted as a joined string: array-typed output columns cross the
    oracle's pandas bridge as numpy arrays and canonicalize
    differently from Spark's lists, so contract outputs stay scalar."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


NATION_SEGMENT_SETS_SQL = """
SELECT n_name,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       count(DISTINCT c_mktsegment) AS n_segments
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "distinct_event_types": distinct_event_types,
    "customers_without_orders": customers_without_orders,
    "suppliers_of_shipped_parts": suppliers_of_shipped_parts,
    "nation_union_segments": nation_union_segments,
    "deep_discount_small_parts": deep_discount_small_parts,
    "q6_forecast_revenue": q6_forecast_revenue,
    "common_active_segments": common_active_segments,
    "nation_segment_sets": nation_segment_sets,
}

ORACLE_SQL: dict[str, str] = {
    "distinct_event_types": DISTINCT_EVENT_TYPES_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "suppliers_of_shipped_parts": SUPPLIERS_OF_SHIPPED_PARTS_SQL,
    "nation_union_segments": NATION_UNION_SEGMENTS_SQL,
    "deep_discount_small_parts": DEEP_DISCOUNT_SMALL_PARTS_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "common_active_segments": COMMON_ACTIVE_SEGMENTS_SQL,
    "nation_segment_sets": NATION_SEGMENT_SETS_SQL,
}
