"""Relational bench queries (TPC-H-flavored) with DuckDB oracles.

The reference implements no joins, filters, windows, or grouped
aggregates beyond the K-Means shapes (SURVEY.md §2 "categories with NO
implementation"); these queries document that the Spark rebuild gets the
full relational algebra from the platform, and they are the sf0.1 bench
workload (bench.py).

Determinism: money sums go through DECIMAL(18,6) per-row casts (both
engines round the bit-identical double the same way, and decimal
addition is exact and order-independent), then back to double. Plain
double SUMs over 60k rows carry ~1e-4 reduce-order noise — bigger than
the driver's rounding grid — so every revenue aggregate is decimal-
summed. Timestamps: orders/lineitem store millis → Spark TIMESTAMP_NTZ, compared
against NTZ literals; DuckDB compares TIMESTAMP literals directly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def _ts(y: int, m: int, d: int):
    """TIMESTAMP_NTZ literal matching the parquet columns' type (orders/
    lineitem timestamps are millis → TimestampNTZType in Spark; only
    events.ts is TIMESTAMP(NANOS) → bigint, see sources.loaders)."""
    return F.lit(f"{y}-{m:02d}-{d:02d} 00:00:00").cast("timestamp_ntz")


def _dec_sum(col):
    """Order-independent money sum: per-row cast to DECIMAL(18,6), exact
    decimal addition, result back to double."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")


Q1_CUTOFF = (2001, 9, 2)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy grouped aggregation with filter pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts(*Q1_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(disc_price).alias("sum_disc_price"),
            _dec_sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF[0]}-{Q1_CUTOFF[1]:02d}-{Q1_CUTOFF[2]:02d} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


Q3_SEGMENT = "BUILDING"
Q3_ORDERDATE_LT = (1999, 1, 1)
Q3_TOPN = 10


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-flavored: 3-way join (broadcast dims), grouped revenue,
    global top-N. Customer is broadcast; lineitem never shuffles its
    payload — only the grouped (orderkey, revenue) rows sort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts(*Q3_ORDERDATE_LT)
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(_dec_sum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(Q3_TOPN)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_ORDERDATE_LT[0]}-{Q3_ORDERDATE_LT[1]:02d}-{Q3_ORDERDATE_LT[2]:02d} 00:00:00'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {Q3_TOPN}
"""


NATION_REVENUE_RANGE = ((1996, 1, 1), (1998, 1, 1))


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavored: star join through region→nation→customer→
    orders→lineitem with all dimension sides broadcast."""
    lo, hi = NATION_REVENUE_RANGE
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(*lo)) & (F.col("o_orderdate") < _ts(*hi))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dec_sum(revenue).alias("revenue"),
            F.count_distinct("o_orderkey").alias("n_orders"),
        )
    )


NATION_REVENUE_SQL = f"""
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '{NATION_REVENUE_RANGE[0][0]}-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '{NATION_REVENUE_RANGE[1][0]}-01-01 00:00:00'
GROUP BY r_name, n_name
"""


TOP_ORDERS_PER_PRIORITY_N = 3


def top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-N per group (the operator family the reference's
    arg-min is the degenerate k=1 case of — SURVEY.md §2)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_ORDERS_PER_PRIORITY_N)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    )


TOP_ORDERS_SQL = f"""
SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) t WHERE rank <= {TOP_ORDERS_PER_PRIORITY_N}
"""


def supplier_part_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-size equi-join + grouped agg over part/supplier via lineitem:
    per-brand supplier count and shipped quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count_distinct("s_suppkey").alias("n_suppliers"),
            F.sum("l_quantity").alias("total_qty"),
        )
    )


SUPPLIER_PART_SQL = """
SELECT p_brand, count(DISTINCT s_suppkey) AS n_suppliers, sum(l_quantity) AS total_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


def q4_slow_shipping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape on available columns: orders (per priority) with
    at least one lineitem shipped >60 days after the order date.
    EXISTS → left-semi join; the lineitem side reduces to keys before
    the join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on available columns (no l_shipmode/receiptdate:
    l_returnflag stands in for shipmode, l_shipdate >= o_orderdate for
    the receipt-ordering predicate): per ship group, conditional counts
    of high- vs low-priority orders. The join reduces orders to
    (key, priority) before the shuffle; the CASE-sums are map-side
    partial aggregates."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(1996, 1, 1))
        & (F.col("l_shipdate") < _ts(1997, 1, 1))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue from returned
    lineitems. Deterministic order: decimal-exact revenue desc, then
    custkey. Only lineitem⋈orders shuffles; customer/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 150 —
    aggregate-HAVING, then join back to orders/customer. The HAVING
    filter runs on the aggregated (small) side before the joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM (SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING total_qty > 150) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: yearly revenue flowing between two nations —
    supplier in one, ordering customer in the other, either direction
    (synthetic nation names — the testdata uses NATION_0..24).
    Supplier/customer/nation broadcast; lineitem⋈orders is the one
    real shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue per ASIA nation from 1996 orders where the
    SUPPLIER sits in the customer's own nation — the local-supplier
    co-nation condition is Q5's defining structural element (the
    sibling `asia_nation_revenue` covers the customer-side rollup
    without it). Supplier/customer/nation/region AND the
    year-filtered orders slice broadcast (round-8 pin) — the plan's
    only exchange is the final k-row groupBy. The orders hint is a
    bench-SF pin with an explicit ceiling (it bypasses AQE's fits
    check and the slice grows linearly with SF); past ~sf50
    per-executor memory drop the hint and let AQE convert — see
    asia_nation_revenue's docstring for the arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts(1996, 1, 1))
        & (F.col("o_orderdate") < _ts(1997, 1, 1))
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dec_sum(rev).alias("revenue"), F.count("*").alias("n_items"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q1_pricing_summary": q1_pricing_summary,
    "q5_local_supplier_revenue": q5_local_supplier_revenue,
    "q3_top_orders": q3_top_orders,
    "nation_revenue": nation_revenue,
    "top_orders_per_priority": top_orders_per_priority,
    "supplier_part_join": supplier_part_join,
    "q4_slow_shipping_orders": q4_slow_shipping_orders,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q10_returned_revenue": q10_returned_revenue,
    "q18_large_orders": q18_large_orders,
    "q7_nation_trade_volume": q7_nation_trade_volume,
}

ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": Q1_SQL,
    "q5_local_supplier_revenue": Q5_SQL,
    "q3_top_orders": Q3_SQL,
    "nation_revenue": NATION_REVENUE_SQL,
    "top_orders_per_priority": TOP_ORDERS_SQL,
    "supplier_part_join": SUPPLIER_PART_SQL,
    "q4_slow_shipping_orders": Q4_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "q10_returned_revenue": Q10_SQL,
    "q18_large_orders": Q18_SQL,
    "q7_nation_trade_volume": Q7_SQL,
}
