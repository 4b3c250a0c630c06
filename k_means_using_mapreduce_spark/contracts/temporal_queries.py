"""Temporal contract queries with DuckDB oracles (events table).

Every output column here is integer-exact (bigint time arithmetic,
counts, max/min, bigint sums) except explicitly-noted pass-through
doubles, so the driver hash-compare has zero float-order exposure.

Resolution note: `events.ts` is TIMESTAMP(NANOS) parquet. Spark
surfaces full bigint nanoseconds via `load_table`, but DuckDB 1.0
truncates nanos parquet to its µs-resolution TIMESTAMP — so any
contract output derived from raw event times is defined at µs
resolution (`ts div 1000` in Spark ≡ `epoch_us(ts)` in DuckDB) to make
both engines compute identical integers. Hour-bucket outputs can stay
in ns because flooring to the hour erases the sub-µs digits anyway.
The operators themselves (operators/temporal.py) keep full ns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, session_stats, time_bucket
from ..sources.loaders import load_table

GAP_NS = 30 * 60 * 1_000_000_000
HOUR_NS = 3_600 * 1_000_000_000


GAP_US = GAP_NS // 1000


def user_sessions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) → per-session stats, at µs
    resolution (see module docstring)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000")
    )
    out = session_stats(ev, gap_ns=GAP_US)
    return out.withColumnRenamed("start_ns", "start_us").withColumnRenamed(
        "duration_ns", "duration_us"
    )


USER_SESSIONS_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sess AS (
    SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS session_seq
    FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events, min(ts_us) AS start_us,
       max(ts_us) - min(ts_us) AS duration_us,
       count(DISTINCT event_type) AS n_event_types
FROM sess GROUP BY user_id, session_seq
"""


def purchase_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's latest prior
    (or simultaneous) click; ties at equal (user, ts) resolve to the
    max click event_id via the window order (no pre-dedup shuffle —
    the whole query is ONE exchange; the oracle's explicit pre-dedup
    GROUP BY computes the identical result)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "click_event_id"],
        right_order="click_event_id",
    )
    # Unmatched purchases get -1 (not NULL): nullable numeric output
    # columns turn into float64 through the oracle's pandas bridge and
    # break the driver's integer canonicalization.
    return joined.select(
        "event_id",
        "user_id",
        F.col("value").alias("purchase_value"),
        F.coalesce("asof_click_event_id", F.lit(-1)).alias("click_event_id"),
        F.coalesce(F.col("ts") - F.col("asof_ts"), F.lit(-1)).alias("gap_us"),
    )


PURCHASE_CLICK_ASOF_SQL = """
WITH p AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_event_id
    FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
)
SELECT p.event_id, p.user_id, p.value AS purchase_value,
       coalesce(c.click_event_id, -1) AS click_event_id,
       coalesce(p.ts_us - c.ts_us, -1) AS gap_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
"""


#: forward-asof tolerance: 1 hour in microseconds
_FWD_TOL_US = 3_600_000_000


def purchase_next_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each purchase attributed to
    the user's EARLIEST following (or simultaneous) click within one
    hour — the next-event attribution shape (pandas
    ``merge_asof(direction='forward', tolerance=...)``). Same
    one-exchange union+window plan as the backward contract, mirrored;
    ties at equal (user, ts) resolve to the max click event_id."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "click_event_id"],
        right_order="click_event_id",
        direction="forward",
        tolerance=_FWD_TOL_US,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("value").alias("purchase_value"),
        F.coalesce("asof_click_event_id", F.lit(-1)).alias("click_event_id"),
        F.coalesce(F.col("asof_ts") - F.col("ts"), F.lit(-1)).alias("gap_us"),
    )


PURCHASE_NEXT_CLICK_ASOF_SQL = f"""
WITH p AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_event_id
    FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
), j AS (
    SELECT p.event_id, p.user_id, p.value, p.ts_us,
           c.click_event_id, c.ts_us AS c_ts_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us <= c.ts_us
)
SELECT event_id, user_id, value AS purchase_value,
       CASE WHEN c_ts_us IS NOT NULL AND c_ts_us - ts_us <= {_FWD_TOL_US}
            THEN click_event_id ELSE -1 END AS click_event_id,
       CASE WHEN c_ts_us IS NOT NULL AND c_ts_us - ts_us <= {_FWD_TOL_US}
            THEN c_ts_us - ts_us ELSE -1 END AS gap_us
FROM j
"""


def purchase_nearest_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each purchase attributed to the user's click
    with the smallest absolute time gap, backward winning ties (pandas
    ``merge_asof(direction='nearest')``). One exchange on the Spark
    side (dual-tagged union); the oracle composes DuckDB's backward and
    forward ASOF joins and picks the smaller gap with the same
    tie-break."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "click_event_id"],
        right_order="click_event_id",
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("value").alias("purchase_value"),
        F.coalesce("asof_click_event_id", F.lit(-1)).alias("click_event_id"),
        F.coalesce(
            F.abs(F.col("asof_ts") - F.col("ts")), F.lit(-1)
        ).alias("gap_us"),
    )


PURCHASE_NEAREST_CLICK_ASOF_SQL = """
WITH p AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_event_id
    FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
), b AS (
    SELECT p.event_id, p.user_id, p.value, p.ts_us,
           c.click_event_id AS b_id, c.ts_us AS b_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
), f AS (
    SELECT p.event_id, c.click_event_id AS f_id, c.ts_us AS f_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us <= c.ts_us
), j AS (
    SELECT b.*, f.f_id, f.f_ts,
           (b_ts IS NOT NULL AND
            (f_ts IS NULL OR ts_us - b_ts <= f_ts - ts_us)) AS use_b
    FROM b JOIN f ON b.event_id = f.event_id
)
SELECT event_id, user_id, value AS purchase_value,
       CASE WHEN use_b THEN b_id
            WHEN f_ts IS NOT NULL THEN f_id ELSE -1 END AS click_event_id,
       CASE WHEN use_b THEN ts_us - b_ts
            WHEN f_ts IS NOT NULL THEN f_ts - ts_us ELSE -1 END AS gap_us
FROM j
"""


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup per event type — the batch form of a
    hypertable continuous aggregate. Exact outputs only."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket_ns", time_bucket("ts", HOUR_NS))
        .groupBy("bucket_ns", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


HOURLY_ROLLUP_SQL = f"""
SELECT epoch_ns(ts) - (epoch_ns(ts) % {HOUR_NS}) AS bucket_ns,
       event_type, count(*) AS n,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the `props` string column — per-type stats
    of the integer field `$.k` (bigint sums: exact)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").alias("n"),
        F.countDistinct("k").alias("n_distinct_k"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


EVENTS_JSON_SQL = """
SELECT event_type, count(k) AS n, count(DISTINCT k) AS n_distinct_k,
       CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar breakdown via date-part functions (year/month/quarter/
    dayofweek) over the TIMESTAMP_NTZ order dates — the date-function
    family on the non-nanos tables. Revenue decimal-exact."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.countDistinct(F.dayofweek("o_orderdate")).alias("n_weekdays"),
        )
    )


MONTHLY_ORDER_STATS_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(DISTINCT CAST(dayofweek(o_orderdate) AS INTEGER) + 1) AS n_weekdays
FROM orders
GROUP BY 1, 2, 3
"""



RANGE_JOIN_FROM = "1999-03-01 00:00:00"
RANGE_JOIN_TO = "1999-04-01 00:00:00"
RANGE_JOIN_DAYS = 3


def shipments_in_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO equi-key: for each URGENT order placed in
    March 1999, count lineitems (of any order) shipped within
    [o_orderdate, o_orderdate + 3 days). Runs through
    operators.temporal.interval_bucket_join — interval-explode to day
    buckets, bucket equi-join, exact residual filter (the scalable
    rewrite of the cross-join-with-BETWEEN the oracle uses)."""
    from ..operators.temporal import interval_bucket_join

    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(RANGE_JOIN_FROM).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(RANGE_JOIN_TO).cast("timestamp_ntz"))
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_orderkey", "o_orderdate")
        .withColumn("_win_end", F.expr(f"o_orderdate + INTERVAL {RANGE_JOIN_DAYS} DAY"))
    )
    joined = interval_bucket_join(
        li, orders, point_ts="l_shipdate", start_ts="o_orderdate", end_ts="_win_end"
    )
    return joined.groupBy("o_orderkey").agg(F.count("*").alias("n_shipped"))


SHIPMENTS_IN_WINDOW_SQL = f"""
SELECT o_orderkey, count(*) AS n_shipped
FROM orders JOIN lineitem
  ON l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL {RANGE_JOIN_DAYS} DAY
WHERE o_orderdate >= TIMESTAMP '{RANGE_JOIN_FROM}'
  AND o_orderdate < TIMESTAMP '{RANGE_JOIN_TO}'
  AND o_orderpriority = '1-URGENT'
GROUP BY o_orderkey
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "user_sessions_events": user_sessions_events,
    "purchase_click_asof": purchase_click_asof,
    "purchase_next_click_asof": purchase_next_click_asof,
    "purchase_nearest_click_asof": purchase_nearest_click_asof,
    "hourly_event_rollup": hourly_event_rollup,
    "events_json_props": events_json_props,
    "monthly_order_stats": monthly_order_stats,
    "shipments_in_order_window": shipments_in_order_window,
}

ORACLE_SQL: dict[str, str] = {
    "user_sessions_events": USER_SESSIONS_SQL,
    "purchase_click_asof": PURCHASE_CLICK_ASOF_SQL,
    "purchase_next_click_asof": PURCHASE_NEXT_CLICK_ASOF_SQL,
    "purchase_nearest_click_asof": PURCHASE_NEAREST_CLICK_ASOF_SQL,
    "hourly_event_rollup": HOURLY_ROLLUP_SQL,
    "events_json_props": EVENTS_JSON_SQL,
    "monthly_order_stats": MONTHLY_ORDER_STATS_SQL,
    "shipments_in_order_window": SHIPMENTS_IN_WINDOW_SQL,
}


def rfm_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer grid: users per (r,f,m) score cell with average
    spend (operators/temporal.py::rfm_scores)."""
    from ..operators.temporal import rfm_scores
    from ..sources.loaders import ns_to_timestamp

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    rfm = rfm_scores(ev)
    return rfm.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("monetary").alias("avg_monetary"),
    )


RFM_SQL = """
WITH per AS (
  SELECT user_id AS u, max(epoch_us(ts)) AS last_us,
         CAST(count(*) AS BIGINT) AS frequency,
         coalesce(sum(CAST(value AS DOUBLE)), 0.0) AS monetary
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
mx AS (SELECT max(last_us) AS m FROM per),
scored AS (
  SELECT u, m - last_us AS recency_us, frequency, monetary,
    CAST(6 - ntile(5) OVER (ORDER BY m - last_us ASC, u) AS INTEGER)
      AS r_score,
    CAST(6 - ntile(5) OVER (ORDER BY frequency DESC, u) AS INTEGER)
      AS f_score,
    CAST(6 - ntile(5) OVER (ORDER BY monetary DESC, u) AS INTEGER)
      AS m_score
  FROM per CROSS JOIN mx
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       avg(monetary) AS avg_monetary
FROM scored GROUP BY 1, 2, 3
"""

QUERIES["rfm_segment_summary"] = rfm_segment_summary
ORACLE_SQL["rfm_segment_summary"] = RFM_SQL
