"""Association-rule contract (operators/assoc.py): co-visitation
support/confidence/lift over per-user item baskets, items extracted
from the events ``props`` JSON."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.assoc import association_rules
from ..sources.loaders import load_table

_MIN_PAIR = 5


def item_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    items = events.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )
    return association_rules(
        items, "user_id", "item", min_pair_count=_MIN_PAIR
    )


ITEM_RULES_SQL = f"""
WITH presence AS (
  SELECT DISTINCT user_id AS basket,
         CAST(props->>'$.k' AS BIGINT) AS item
  FROM events
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM presence a JOIN presence b USING (basket)
  WHERE a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {_MIN_PAIR}
), directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, n_ab FROM pairs
  UNION ALL
  SELECT item_b AS antecedent, item_a AS consequent, n_ab FROM pairs
), supports AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM presence GROUP BY 1
), totals AS (
  SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM presence
)
SELECT d.antecedent, d.consequent,
  sa.n_item AS n_ante, sc.n_item AS n_cons, d.n_ab, t.n_baskets,
  CAST(d.n_ab AS DOUBLE) / t.n_baskets AS support,
  CAST(d.n_ab AS DOUBLE) / sa.n_item AS confidence,
  CAST(d.n_ab AS DOUBLE) * t.n_baskets
    / (CAST(sa.n_item AS DOUBLE) * sc.n_item) AS lift
FROM directed d
JOIN supports sa ON d.antecedent = sa.item
JOIN supports sc ON d.consequent = sc.item
CROSS JOIN totals t
"""

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "item_rules_events": item_rules_events,
}

ORACLE_SQL: dict[str, str] = {
    "item_rules_events": ITEM_RULES_SQL,
}
