"""Robust-stats + per-group-cap contract queries (operators/robust.py,
operators/sampling.py::cap_per_group)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.robust import MAD_SIGMA, mad_outlier_stats, winsorized_mean
from ..operators.sampling import cap_per_group
from ..sources.loaders import load_table

_CAP = 10
_K = 3.0


def source_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, "source", "doc_id", n=_CAP).select(
        "doc_id", "source"
    )


SOURCE_CAP_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= {_CAP}
"""


def price_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return mad_outlier_stats(li, "l_extendedprice", ["l_returnflag"], k=_K)


PRICE_MAD_SQL = f"""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS median
  FROM lineitem GROUP BY 1
), mad AS (
  SELECT l.l_returnflag,
         quantile_cont(abs(l.l_extendedprice - m.median), 0.5) AS mad
  FROM lineitem l JOIN med m USING (l_returnflag) GROUP BY 1
)
SELECT l.l_returnflag,
  CAST(count(*) AS BIGINT) AS n,
  any_value(m.median) AS median,
  any_value(d.mad) AS mad,
  CAST(sum(CASE WHEN abs(l.l_extendedprice - m.median)
                     > {_K * MAD_SIGMA} * d.mad
            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  CAST(sum(CASE WHEN abs(l.l_extendedprice - m.median)
                     > {_K * MAD_SIGMA} * d.mad
            THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS outlier_frac
FROM lineitem l JOIN med m USING (l_returnflag) JOIN mad d USING (l_returnflag)
GROUP BY l.l_returnflag
"""


def winsorized_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return winsorized_mean(li, "l_extendedprice", ["l_returnflag"])


WINSORIZED_SQL = """
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
  CAST(count(*) AS BIGINT) AS n,
  any_value(b.lo) AS lo,
  any_value(b.hi) AS hi,
  avg(greatest(least(l.l_extendedprice, b.hi), b.lo)) AS wmean
FROM lineitem l JOIN bounds b USING (l_returnflag)
GROUP BY l.l_returnflag
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_cap_documents": source_cap_documents,
    "price_outliers_mad": price_outliers_mad,
    "winsorized_price_by_flag": winsorized_price_by_flag,
}

ORACLE_SQL: dict[str, str] = {
    "source_cap_documents": SOURCE_CAP_SQL,
    "price_outliers_mad": PRICE_MAD_SQL,
    "winsorized_price_by_flag": WINSORIZED_SQL,
}
