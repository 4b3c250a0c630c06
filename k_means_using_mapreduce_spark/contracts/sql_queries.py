"""SQL-surface contract: the engine driven ENTIRELY through
``spark.sql`` over registered views (sources/catalog.py) — proving the
query surface users actually type, not just the DataFrame API. The
statement exercises CTEs, a join, multi-key aggregation and a ranked
window in one query; the oracle is the same ANSI text modulo dialect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import register_tables

# rank on round(revenue, 2): the two engines sum doubles in different
# orders (~1e-8 relative), and revenue gaps between (priority, month)
# groups are >> 0.01, so the rounded ordering is identical while the
# raw doubles are not byte-equal. yr/mon break exact ties.
_SQL = """
WITH rev AS (
  SELECT o.o_orderpriority AS priority,
         year(o.o_orderdate) AS yr,
         month(o.o_orderdate) AS mon,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT priority, yr, mon, revenue,
         row_number() OVER (PARTITION BY priority
                            ORDER BY round(revenue, 2) DESC, yr, mon) AS rk
  FROM rev
)
SELECT priority, CAST(yr AS INTEGER) AS yr, CAST(mon AS INTEGER) AS mon,
       revenue, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 3
"""


def sql_top_revenue_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(_SQL)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sql_top_revenue_months": sql_top_revenue_months,
}

ORACLE_SQL: dict[str, str] = {
    "sql_top_revenue_months": _SQL,
}
