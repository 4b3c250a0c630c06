"""Token-budget allocation contract (operators/budget.py): greedy
water-filling of a fixed token budget across sources ranked by mean
document length (an exact-rational score — integer sum / integer
count — so the ranking is bit-identical across engines; a float mean
of doubles would be sum-order-dependent and could flip adjacent
ranks)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.budget import allocate_budget
from ..sources.loaders import load_table
from ._sql_text import sql_token_count

_BUDGET = 15000.0
_MAX_EPOCHS = 2.0


def source_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("tokens"),
        (
            F.sum(token_count("text")).cast("double") / F.count("*")
        ).alias("quality"),
    )
    return allocate_budget(
        stats, total_budget=_BUDGET, max_epochs=_MAX_EPOCHS
    )


SOURCE_BUDGET_SQL = f"""
WITH stats AS (
  SELECT source,
    CAST(sum({sql_token_count('text')}) AS BIGINT) AS tokens,
    CAST(sum({sql_token_count('text')}) AS DOUBLE) / count(*) AS score
  FROM documents GROUP BY 1
), cum AS (
  SELECT source,
    CAST(tokens AS DOUBLE) AS tokens,
    score,
    CAST(tokens AS DOUBLE) * {_MAX_EPOCHS!r} AS capacity,
    sum(CAST(tokens AS DOUBLE) * {_MAX_EPOCHS!r}) OVER (
      ORDER BY score DESC, source
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - CAST(tokens AS DOUBLE) * {_MAX_EPOCHS!r} AS cum_before
  FROM stats
)
SELECT source, tokens, score, capacity, cum_before,
  greatest(0.0, least(capacity, {_BUDGET!r} - cum_before)) AS alloc,
  CASE WHEN tokens > 0
       THEN greatest(0.0, least(capacity, {_BUDGET!r} - cum_before))
            / tokens
       ELSE 0.0 END AS epochs,
  greatest(0.0, least(capacity, {_BUDGET!r} - cum_before)) < capacity
    AS exhausted
FROM cum
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_budget_plan": source_budget_plan,
}

ORACLE_SQL: dict[str, str] = {
    "source_budget_plan": SOURCE_BUDGET_SQL,
}
