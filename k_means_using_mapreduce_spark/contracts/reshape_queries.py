"""Reshape / conditional-aggregation contract queries with oracles:
PIVOT (long→wide), array explode (wide→long), a TPC-H Q5-shaped
multi-join, and Q12-shaped conditional aggregation.

Spark-first notes:
- `pivot` with an explicit value list compiles to ONE hash aggregate
  (no per-value scans); never call pivot without the list at scale —
  value discovery is an extra distinct scan.
- `posexplode` is a generator in whole-stage codegen; per-dimension
  stats over a 64-d float column shuffle only (dim, partial-agg)
  pairs, not raw vectors.
- The Q5-shape joins broadcast every dim table; only lineitem⋈orders
  shuffles (see tests/test_plans.py patterns).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: per-user event counts, one column per event type.

    Lowered to conditional aggregation rather than ``df.pivot()``:
    even with an explicit value list, Spark's pivot plans TWO shuffles
    (groupBy (user, type) count, then pivotfirst over user), while
    ``count(when(...))`` per value is one partial+final aggregate —
    half the shuffle volume, asserted in tests/test_plans.py. Absent
    combos are 0 by construction."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in EVENT_TYPES
        ]
    )


USER_EVENT_PIVOT_SQL = """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY user_id
"""


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long: per-dimension distribution stats of the embedding
    column (1-based dim). min/max are exact float32→double values;
    avg absorbs reduce order."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .select((F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.avg("v").alias("avg_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


EMBEDDING_DIM_STATS_SQL = """
SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
       CAST(unnest(embedding) AS DOUBLE) AS v
FROM embeddings
"""
EMBEDDING_DIM_STATS_SQL = f"""
SELECT dim, count(*) AS n, avg(v) AS avg_v, min(v) AS min_v, max(v) AS max_v
FROM ({EMBEDDING_DIM_STATS_SQL}) GROUP BY dim
"""


def asia_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape on the available columns: revenue per ASIA nation
    from 1996 orders. ALL non-lineitem sides broadcast — including the
    year-filtered orders slice (~1/7 of the table), which turns the
    li⋈orders shuffle into a broadcast hash join and leaves the final
    k-row groupBy as the plan's only exchange (round-8 pin; plan test
    asserts zero SortMergeJoin). The hint is an explicit BENCH-SF PIN
    with a ceiling: it bypasses AQE's fits-in-memory check, and the
    filtered slice grows linearly with SF (~1/7 of orders ≈ 21 MB at
    sf1 → ~2 GB at sf100), so beyond roughly sf50 per-executor
    memory the pin must come off and AQE decides — the 100 TB plan is
    the shuffle join this hint suppresses at bench scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev.cast("decimal(18,6)")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


ASIA_NATION_REVENUE_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def priority_shipping_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per return flag, line counts split by order
    urgency — conditional aggregation, one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(urgent, 1)).alias("high_line_count"),
            F.count(F.when(~urgent, 1)).alias("low_line_count"),
        )
    )


PRIORITY_SHIPPING_SPLIT_SQL = """
SELECT l_returnflag,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def lineitem_measure_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long, the inverse of pivot): melt the four numeric
    lineitem measures into (measure, value) rows, then profile each.
    Spark's ``unpivot`` plans as an Expand (row → 4 rows) feeding one
    partial+final aggregate — no shuffle of the unexploded width."""
    li = load_table(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    long = li.unpivot(
        ids=[], values=measures, variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.avg("value").alias("avg_value"),
    )


LINEITEM_UNPIVOT_SQL = """
SELECT measure, count(*) AS n, min(value) AS min_value,
       max(value) AS max_value, avg(value) AS avg_value
FROM (
    UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax
             FROM lineitem)
    ON l_quantity, l_extendedprice, l_discount, l_tax
    INTO NAME measure VALUE value
)
GROUP BY measure
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "user_event_pivot": user_event_pivot,
    "embedding_dim_stats": embedding_dim_stats,
    "asia_nation_revenue": asia_nation_revenue,
    "priority_shipping_split": priority_shipping_split,
    "lineitem_measure_unpivot": lineitem_measure_unpivot,
}

ORACLE_SQL: dict[str, str] = {
    "user_event_pivot": USER_EVENT_PIVOT_SQL,
    "embedding_dim_stats": EMBEDDING_DIM_STATS_SQL,
    "asia_nation_revenue": ASIA_NATION_REVENUE_SQL,
    "priority_shipping_split": PRIORITY_SHIPPING_SPLIT_SQL,
    "lineitem_measure_unpivot": LINEITEM_UNPIVOT_SQL,
}
