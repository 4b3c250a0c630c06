"""Advanced TPC-H-shaped queries: correlated subqueries, scalar
subqueries, semi/anti self-joins, conditional-aggregate ratios,
histogram-of-counts — the plan shapes tpch_queries.py doesn't cover
(Q2/Q13/Q14/Q15/Q16/Q17/Q19/Q21/Q22 analogues on the driver tables;
the reference implements none of these, SURVEY.md §2 "categories with
NO implementation").

fp policy (see tpch_queries.py): every aggregate that feeds an exact
comparison (= MIN, = MAX, < 0.2·AVG) is computed as an exact
DECIMAL(18,6) sum — both engines then derive bit-identical doubles, so
threshold/equality predicates can't flip between Spark and DuckDB.

Scale notes: all dimension joins broadcast; correlated subqueries are
expressed as window functions or aggregate-then-broadcast-join so each
query keeps a single fact shuffle (plan-shape asserts in
tests/test_plans.py cover the q2/q15 window-vs-self-join choice).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loaders import load_table
from .tpch_queries import _dec_sum, _ts

# ---------------------------------------------------------------- Q2 shape


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (correlated MIN subquery): for each small STANDARD part,
    the supplier(s) selling it at the minimum average price.

    Spark-first: instead of a correlated subquery per part (a
    re-executed scan at 100 TB), compute per-(part, supplier) averages
    once and take ``min() OVER (PARTITION BY part)`` — one shuffle, no
    self-join. The average is exact-decimal so the ``= min`` predicate
    is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    small = part.filter((F.col("p_size") < 10) & (F.col("p_type") == "STANDARD"))
    per_ps = (
        li.join(F.broadcast(small), li.l_partkey == small.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(
            (_dec_sum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price")
        )
    )
    w = Window.partitionBy("p_partkey")
    best = per_ps.withColumn("min_price", F.min("avg_price").over(w)).filter(
        F.col("avg_price") == F.col("min_price")
    )
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            F.col("s_name").alias("supplier"),
            F.col("avg_price").alias("min_avg_price"),
        )
    )


Q2_SQL = """
WITH per_ps AS (
  SELECT p_partkey, l_suppkey,
         (CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          / count(*)) AS avg_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size < 10 AND p_type = 'STANDARD'
  GROUP BY p_partkey, l_suppkey)
SELECT p_partkey, s_name AS supplier, avg_price AS min_avg_price
FROM per_ps JOIN supplier ON l_suppkey = s_suppkey
WHERE avg_price = (SELECT min(i.avg_price) FROM per_ps i
                   WHERE i.p_partkey = per_ps.p_partkey)
"""

# --------------------------------------------------------------- Q13 shape


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of per-customer order counts, including zero —
    LEFT OUTER join + two-level aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN (SELECT * FROM orders
                               WHERE o_orderpriority <> '5-LOW') o
        ON c_custkey = o.o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
"""

# --------------------------------------------------------------- Q14 shape

Q14_FROM = (1999, 1, 1)
Q14_TO = (2000, 1, 1)


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: conditional-aggregate ratio — % of revenue from PROMO parts
    in one year. Single row; both sums exact-decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts(*Q14_FROM))
            & (F.col("l_shipdate") < _ts(*Q14_TO))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * _dec_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / _dec_sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount)
                   ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate < TIMESTAMP '2000-01-01'
"""

# --------------------------------------------------------------- Q15 shape

Q15_FROM = (1999, 1, 1)
Q15_TO = (1999, 4, 1)


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum quarterly revenue — aggregate view
    + scalar MAX subquery. The scalar max is a 1-row aggregate
    broadcast back onto the per-supplier relation (NOT an
    unpartitioned window, which would funnel every supplier row
    through one task at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = (
        li.filter(
            (F.col("l_shipdate") >= _ts(*Q15_FROM))
            & (F.col("l_shipdate") < _ts(*Q15_TO))
        )
        .groupBy("l_suppkey")
        .agg(_dec_sum(rev).alias("total_revenue"))
    )
    mx = per_supp.agg(F.max("total_revenue").alias("max_rev"))
    best = per_supp.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    AND l_shipdate < TIMESTAMP '1999-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

# --------------------------------------------------------------- Q16 shape


def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct-supplier counts per part attribute group, excluding
    a NOT-IN supplier set (negative balance ≈ 'customer complaints') —
    anti-join + count-distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    keep = part.filter(F.col("p_size").isin(1, 4, 9, 14, 19, 24))
    return (
        li.join(F.broadcast(keep), li.l_partkey == keep.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 4, 9, 14, 19, 24)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

# --------------------------------------------------------------- Q17 shape


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from orders of less than 20% of a part's average
    quantity (Brand#15, ECONOMY) — correlated AVG subquery, expressed
    as a per-part aggregate window so the fact scans once. The average
    is exact-decimal so the ``<`` threshold can't flip engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sel = part.filter(
        (F.col("p_brand") == "Brand#15") & (F.col("p_type") == "ECONOMY")
    )
    joined = li.join(F.broadcast(sel), li.l_partkey == sel.p_partkey)
    w = Window.partitionBy("p_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        joined.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (_dec_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem l JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#15' AND p_type = 'ECONOMY'
  AND l_quantity < 0.2 * (
    SELECT CAST(sum(CAST(i.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           / count(*)
    FROM lineitem i WHERE i.l_partkey = l.l_partkey)
"""

# --------------------------------------------------------------- Q19 shape


def q19_or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunctive multi-attribute predicates over the li⋈part
    join — exercises predicate normalization + pushdown of the shared
    conjuncts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(_dec_sum(rev).alias("revenue"))
    )


Q19_SQL = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

# --------------------------------------------------------------- Q21 shape


def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (EXISTS + NOT EXISTS self-joins): suppliers that were
    the *only* supplier on some multi-line order, counted per supplier.

    Spark-first: the two correlated self-joins collapse into one
    per-order aggregate (line count + distinct-supplier count) joined
    back — one shuffle instead of two self-joins of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.min("l_suppkey").alias("only_supp"),
    )
    sole = per_order.filter(
        (F.col("n_lines") >= 2) & (F.col("n_supps") == 1)
    )
    return (
        sole.join(F.broadcast(supp), sole.only_supp == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


Q21_SQL = """
WITH sole AS (
  SELECT l_orderkey, min(l_suppkey) AS only_supp
  FROM lineitem l1
  GROUP BY l_orderkey
  HAVING count(*) >= 2 AND count(DISTINCT l_suppkey) = 1)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM sole JOIN supplier ON only_supp = s_suppkey
GROUP BY s_suppkey, s_name
"""

# --------------------------------------------------------------- Q22 shape


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: customers with above-average balance and no orders, grouped
    by a name-derived bucket — scalar AVG subquery + anti-join. The
    global average is exact-decimal (sum/count), broadcast as a scalar
    via cross-join rather than collected to the driver."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_df = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (_dec_sum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    bucket = F.substring("c_name", -1, 1)
    return (
        cust.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(bucket.alias("name_bucket"))
        .agg(
            F.count("*").alias("numcust"),
            _dec_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT substr(c_name, -1, 1) AS name_bucket, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
                        AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY substr(c_name, -1, 1)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue_share": q14_promo_revenue_share,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count_by_part": q16_supplier_count_by_part,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_or_predicate_revenue": q19_or_predicate_revenue,
    "q21_sole_supplier_orders": q21_sole_supplier_orders,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLE_SQL: dict[str, str] = {
    "q2_min_cost_supplier": Q2_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q14_promo_revenue_share": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_count_by_part": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q19_or_predicate_revenue": Q19_SQL,
    "q21_sole_supplier_orders": Q21_SQL,
    "q22_idle_rich_customers": Q22_SQL,
}
