"""Window-frame contract queries with DuckDB oracles.

Analytic windows beyond plain ranking (which `top_orders_per_priority`
covers): running totals, lag deltas, and sliding frames. The reference
has none of these (SURVEY.md §2: "Window functions: absent").

Float policy: anything accumulated across a frame goes through
`decimal(18,6)` — windowed sums in both engines may use segment-tree
accumulation, so double addition order is NOT guaranteed left-to-right;
decimal addition is exact and order-free. Pure per-row differences of
doubles (lag deltas) reassociate nothing and stay exact.

Scale: each query is one shuffle on its partition key + an in-partition
sort — the same profile as sessionize (see SCALE.md).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative order spend in order-date order —
    the classic running total."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = (
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        cum.alias("cum_spend"),
    )


CUSTOMER_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS order_seq,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def user_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event value delta (lag) and next event type
    (lead). Unmatched edges coalesce to sentinels — contract outputs
    must not have nullable numeric columns (see memory/parity rules)."""
    ev = load_table(spark, sf_dir, "events")
    # order at µs resolution (ts div 1000) to mirror the oracle's
    # epoch_us exactly — ns-resolution ordering could pair different
    # rows when two events share a microsecond
    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("value") - F.lag("value").over(w), F.lit(0.0)).alias(
            "value_delta"
        ),
        F.coalesce(F.lead("event_type").over(w), F.lit("none")).alias(
            "next_event_type"
        ),
    )


USER_VALUE_DELTAS_SQL = """
SELECT event_id, user_id,
       coalesce(value - lag(value) OVER w, 0.0) AS value_delta,
       coalesce(lead(event_type) OVER w, 'none') AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


def sliding_spend_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 5-row frame (4 preceding + current) per customer:
    windowed count + decimal-exact windowed sum."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_in_window"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("window_spend"),
    )


SLIDING_SPEND_SQL = """
SELECT o_custkey, o_orderkey,
       count(*) OVER w AS n_in_window,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
           AS window_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""



def supplier_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family window functions per nation: ntile deciles,
    percent_rank, cume_dist, dense_rank over account balance — all
    deterministic because the order key (s_acctbal, s_suppkey) is
    unique. percent_rank/cume_dist are exact rational arithmetic
    ((rank-1)/(n-1), rank/n) so the doubles match the oracle
    bit-for-bit."""
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


SUPPLIER_BALANCE_RANKS_SQL = """
SELECT s_suppkey, s_nationkey,
       ntile(10) OVER w AS decile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       dense_rank() OVER w AS drank
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "customer_running_total": customer_running_total,
    "user_value_deltas": user_value_deltas,
    "sliding_spend_window": sliding_spend_window,
    "supplier_balance_ranks": supplier_balance_ranks,
}

ORACLE_SQL: dict[str, str] = {
    "customer_running_total": CUSTOMER_RUNNING_TOTAL_SQL,
    "user_value_deltas": USER_VALUE_DELTAS_SQL,
    "sliding_spend_window": SLIDING_SPEND_SQL,
    "supplier_balance_ranks": SUPPLIER_BALANCE_RANKS_SQL,
}
