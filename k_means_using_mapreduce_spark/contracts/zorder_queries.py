"""Z-order layout contract: the Morton key itself is pure arithmetic
(affine bucket + bit interleave), so the clustering law the layout
writer sorts by is value-checked against DuckDB bit ops — turning the
zorder family from tests-only into an oracle-backed row. The write
path (write_zordered) stays test-pinned (layouts aren't a query
result)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table

BITS = 8
_N = (1 << BITS) - 1  # 255
_COLS = ("l_extendedprice", "l_quantity")


def zorder_key_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key of (extendedprice, quantity) per lineitem row — the
    exact long every row would be range-sorted by in write_zordered
    (linear buckets, 8 bits/column)."""
    from ..operators.zorder import column_buckets, zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    stats = column_buckets(li, list(_COLS), bits_per_col=BITS, method="linear")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key(stats, bits_per_col=BITS).alias("zkey"),
    )


def _bucket_sql(col: str, j: int) -> str:
    return (
        f"CAST(least(greatest(floor((CAST({col} AS DOUBLE) - mn{j})"
        f" / (mx{j} - mn{j}) * {float(_N)}), 0), {_N}) AS BIGINT)"
    )


def _interleave_sql() -> str:
    terms = []
    for j in range(len(_COLS)):
        for i in range(BITS):
            terms.append(f"(((b{j} >> {i}) & 1) << {i * len(_COLS) + j})")
    return " | ".join(terms)


ZORDER_KEY_SQL = f"""
WITH s AS (
  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn0,
         max(CAST(l_extendedprice AS DOUBLE)) AS mx0,
         min(CAST(l_quantity AS DOUBLE)) AS mn1,
         max(CAST(l_quantity AS DOUBLE)) AS mx1
  FROM lineitem
), b AS (
  SELECT l_orderkey, l_linenumber,
         coalesce({_bucket_sql("l_extendedprice", 0)}, 0) AS b0,
         coalesce({_bucket_sql("l_quantity", 1)}, 0) AS b1
  FROM lineitem CROSS JOIN s
)
SELECT l_orderkey, l_linenumber, {_interleave_sql()} AS zkey FROM b
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "zorder_key_lineitem": zorder_key_lineitem,
}

ORACLE_SQL: dict[str, str] = {
    "zorder_key_lineitem": ZORDER_KEY_SQL,
}
