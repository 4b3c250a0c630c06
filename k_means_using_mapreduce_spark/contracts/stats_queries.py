"""Statistical-aggregate contract queries with oracles.

Spark's exact ``percentile`` (linear interpolation) matches DuckDB's
``quantile_cont`` bit-for-bit (verified empirically on the customer
table); stddev/corr differ only in summation order, absorbed by the
driver's ~1e-6 rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def segment_balance_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles — the ordered-statistics family the
    reference entirely lacks."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.25)").alias("p25_bal"),
        F.expr("percentile(c_acctbal, 0.5)").alias("median_bal"),
        F.expr("percentile(c_acctbal, 0.95)").alias("p95_bal"),
        F.count("*").alias("n"),
    )


SEGMENT_PERCENTILES_SQL = """
SELECT c_mktsegment,
       quantile_cont(c_acctbal, 0.25) AS p25_bal,
       quantile_cont(c_acctbal, 0.5) AS median_bal,
       quantile_cont(c_acctbal, 0.95) AS p95_bal,
       count(*) AS n
FROM customer GROUP BY c_mktsegment
"""


def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type dispersion/correlation statistics over the events
    stream table."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.stddev_samp("value").alias("sd_value"),
        F.corr(F.col("value"), F.col("user_id").cast("double")).alias("corr_value_user"),
    )


EVENT_TYPE_STATS_SQL = """
SELECT event_type,
       count(*) AS n,
       min(value) AS min_value,
       max(value) AS max_value,
       stddev_samp(value) AS sd_value,
       corr(value, CAST(user_id AS DOUBLE)) AS corr_value_user
FROM events GROUP BY event_type
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "segment_balance_percentiles": segment_balance_percentiles,
    "event_type_stats": event_type_stats,
}

ORACLE_SQL: dict[str, str] = {
    "segment_balance_percentiles": SEGMENT_PERCENTILES_SQL,
    "event_type_stats": EVENT_TYPE_STATS_SQL,
}


def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations between lineitem measures (one pass,
    three corr aggregates) — the feature-redundancy screen
    (extendedprice tracks quantity by construction; discount should
    track neither)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.corr("l_extendedprice", "l_quantity").alias("corr_price_qty"),
        F.corr("l_extendedprice", "l_discount").alias("corr_price_disc"),
        F.corr("l_quantity", "l_discount").alias("corr_qty_disc"),
        F.count("*").alias("n"),
    )


LINEITEM_CORRELATIONS_SQL = """
SELECT corr(l_extendedprice, l_quantity) AS corr_price_qty,
       corr(l_extendedprice, l_discount) AS corr_price_disc,
       corr(l_quantity, l_discount) AS corr_qty_disc,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
"""

QUERIES["lineitem_correlations"] = lineitem_correlations
ORACLE_SQL["lineitem_correlations"] = LINEITEM_CORRELATIONS_SQL
