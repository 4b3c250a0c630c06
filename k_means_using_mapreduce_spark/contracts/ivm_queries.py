"""IVM contract (operators/ivm.py): maintain a per-priority revenue
rollup through a batch of inserts and deletes and pin that the
maintained view EQUALS a full recompute over the new state (the
oracle recomputes; the Spark path merges base + delta only).

Change-set construction (deterministic key arithmetic):
- base state: orders with ``o_orderkey % 10 != 0``;
- inserts: the held-out keys (``% 10 == 0``) not slated for delete;
- deletes: base keys with ``o_orderkey % 7 == 0``.
Final state ≡ all orders with ``o_orderkey % 7 != 0``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def ivm_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivm import maintain_aggregate

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,6)").alias("val"),
    )
    key = F.col("o_orderkey")
    base_rows = orders.where(key % 10 != 0)
    base_agg = base_rows.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_v")
    )
    inserts = orders.where((key % 10 == 0) & (key % 7 != 0)).select(
        "o_orderpriority", "val", F.lit("i").alias("op")
    )
    deletes = orders.where((key % 10 != 0) & (key % 7 == 0)).select(
        "o_orderpriority", "val", F.lit("d").alias("op")
    )
    maintained = maintain_aggregate(
        base_agg,
        inserts.unionAll(deletes),
        ["o_orderpriority"],
        "val",
    )
    return maintained.select(
        "o_orderpriority",
        "n",
        F.col("sum_v").cast("double").alias("sum_total"),
    )


IVM_SQL = """
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
FROM orders
WHERE o_orderkey % 7 <> 0
GROUP BY 1
"""

QUERIES = {"ivm_priority_revenue": ivm_priority_revenue}
ORACLE_SQL = {"ivm_priority_revenue": IVM_SQL}
