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


# ---------------------------------------------------------------- Q8 shape

Q8_FROM = (1998, 1, 1)
Q8_TO = (2000, 1, 1)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (market share): NATION_3 suppliers' share of PROMO-part
    revenue sold to ASIA-region customers, per order year — conditional
    aggregate over a 6-way join (the widest join graph in the suite).

    Scale notes: the only big-big joins are lineitem⋈orders (both fact
    tables, hash on orderkey) and orders⋈customer (hash on custkey);
    every dimension (filtered part, supplier+nation, nation+region) is
    broadcast, so the fact tables shuffle at most twice and all
    predicates push into the scans. Conditional share via
    sum(CASE)/sum — both sums exact-decimal so the ratio is
    engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp_nat = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    asia_nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    asia_cust = cust.join(
        F.broadcast(asia_nat), cust.c_nationkey == asia_nat.n_nationkey
    ).select("c_custkey")
    ord_sel = (
        orders.filter(
            (F.col("o_orderdate") >= _ts(*Q8_FROM))
            & (F.col("o_orderdate") < _ts(*Q8_TO))
        )
        .join(asia_cust, orders.o_custkey == asia_cust.c_custkey)
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .join(ord_sel, li.l_orderkey == ord_sel.o_orderkey)
        .select("o_year", "supp_nation", volume.alias("volume"))
    )
    return flat.groupBy("o_year").agg(
        (
            _dec_sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0.0)
                )
            )
            / _dec_sum(F.col("volume"))
        ).alias("mkt_share")
    )


Q8_SQL = """
WITH flat AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1998-01-01'
    AND o_orderdate < TIMESTAMP '2000-01-01')
SELECT o_year,
  CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
  / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM flat GROUP BY o_year
"""

# ---------------------------------------------------------------- Q9 shape


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): per supplier-nation per order-year
    profit over parts whose name matches a LIKE pattern — multi-join +
    LIKE filter + two-key aggregate. The testdata has no partsupp
    table, so supply cost is derived as 0.6·p_retailprice·l_quantity
    (same expression both engines; the shape — LIKE + 4-way join +
    profit expression — is what's under test).

    Scale notes: part (LIKE-filtered) and supplier⋈nation broadcast;
    the single big-big join is lineitem⋈orders on orderkey. The LIKE
    predicate prunes part before the broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    widget = part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nat = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(widget), li.l_partkey == widget.p_partkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(_dec_sum(profit).alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
       - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
  AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""

# --------------------------------------------------------------- Q11 shape


def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (HAVING vs scalar subquery): per-part shipped value,
    restricted to suppliers from nations 0-4, keeping parts whose value
    exceeds 0.1% of the total over the same restricted relation. The
    testdata has no partsupp, so "value" is the decimal-exact sum of
    l_extendedprice per part.

    Spark-first: the per-part aggregate is computed ONCE, the scalar
    total is a 1-row decimal-exact re-aggregate of that relation
    broadcast back via cross-join — not a second scan of the fact
    table and not an unpartitioned window. Both the per-part values
    and the total are exact decimals, so the threshold comparison
    cannot flip between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    near = supp.filter(F.col("s_nationkey") < 5).select("s_suppkey")
    pv = (
        li.join(F.broadcast(near), li.l_suppkey == near.s_suppkey, "leftsemi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(_dec_sum(F.col("l_extendedprice")).alias("part_value"))
    )
    total = pv.agg(
        (F.lit(0.001) * _dec_sum(F.col("part_value"))).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
    )


Q11_SQL = """
WITH pv AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS part_value
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
  GROUP BY l_partkey)
SELECT partkey, part_value FROM pv
WHERE part_value > (SELECT 0.001 * CAST(sum(CAST(part_value
                    AS DECIMAL(18,6))) AS DOUBLE) FROM pv)
"""

# --------------------------------------------------------------- Q20 shape

Q20_FROM = (1999, 1, 1)
Q20_TO = (2000, 1, 1)
Q20_MIN_QTY = 40.0


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (nested semi-joins): suppliers from nations 0-4 that
    shipped more than 40 units of some 'large%' part during 1999 —
    IN (… IN (…)) nesting three relations deep, with a HAVING inside
    the inner subquery.

    Spark-first: the innermost IN is a broadcast of the LIKE-filtered
    part keys; the grouped HAVING runs on the pre-filtered fact; both
    outer INs become left-semi joins (which dedup for free, so no
    DISTINCT pass). One fact shuffle total (the groupBy); the quantity
    sum is exact-decimal so the >40 cut is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    large = part.filter(F.col("p_name").like("large%")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= _ts(*Q20_FROM))
            & (F.col("l_shipdate") < _ts(*Q20_TO))
        )
        .join(F.broadcast(large), li.l_partkey == large.p_partkey, "leftsemi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(_dec_sum(F.col("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(Q20_MIN_QTY))
        .select("l_suppkey")
    )
    near = nation.filter(F.col("n_nationkey") < 5).select("n_nationkey")
    return (
        supp.join(F.broadcast(near), supp.s_nationkey == near.n_nationkey, "leftsemi")
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "leftsemi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
    AND l_shipdate >= TIMESTAMP '1999-01-01'
    AND l_shipdate < TIMESTAMP '2000-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 40.0)
AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 5)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q11_important_part_values": q11_important_part_values,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue_share": q14_promo_revenue_share,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count_by_part": q16_supplier_count_by_part,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_or_predicate_revenue": q19_or_predicate_revenue,
    "q20_heavy_shippers": q20_heavy_shippers,
    "q21_sole_supplier_orders": q21_sole_supplier_orders,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLE_SQL: dict[str, str] = {
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit_by_nation_year": Q9_SQL,
    "q11_important_part_values": Q11_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q14_promo_revenue_share": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_count_by_part": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q19_or_predicate_revenue": Q19_SQL,
    "q20_heavy_shippers": Q20_SQL,
    "q21_sole_supplier_orders": Q21_SQL,
    "q22_idle_rich_customers": Q22_SQL,
}
