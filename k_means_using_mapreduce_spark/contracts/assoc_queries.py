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


_SEQ_MIN_SUPPORT = 0.3


def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent sequential patterns (length <= 3) of event types per
    user via MLlib PrefixSpan (operators/assoc.py::
    frequent_sequences) — the ORDERED counterpart of the item_rules
    contract; the oracle re-derives every pattern's exact sequence
    support with greedy-subsequence joins."""
    from ..operators.assoc import frequent_sequences

    ev = load_table(spark, sf_dir, "events")
    return frequent_sequences(
        ev,
        "user_id",
        "ts",
        "event_type",
        min_support=_SEQ_MIN_SUPPORT,
        max_pattern_length=3,
        tiebreak_col="event_id",
    )


SEQ_PATTERNS_SQL = f"""
WITH pos AS (
  SELECT user_id, event_type AS it,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS p
  FROM events
),
nn AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS ns FROM events),
l1 AS (
  SELECT it AS pattern, 1 AS length,
         CAST(count(DISTINCT user_id) AS BIGINT) AS c
  FROM pos GROUP BY 1
),
l2 AS (
  SELECT pattern, 2 AS length, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT DISTINCT a.user_id, a.it || '>' || b.it AS pattern
    FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.p > a.p
  ) GROUP BY 1
),
l3 AS (
  SELECT pattern, 3 AS length, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT DISTINCT a.user_id,
           a.it || '>' || b.it || '>' || d.it AS pattern
    FROM pos a
    JOIN pos b ON a.user_id = b.user_id AND b.p > a.p
    JOIN pos d ON b.user_id = d.user_id AND d.p > b.p
  ) GROUP BY 1
),
u AS (
  SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
)
SELECT pattern, CAST(length AS INTEGER) AS length, c AS n_sequences,
       c / CAST(ns AS DOUBLE) AS support
FROM u CROSS JOIN nn
WHERE c >= ceil({_SEQ_MIN_SUPPORT!r} * ns)
"""

QUERIES["user_event_sequences"] = user_event_sequences
ORACLE_SQL["user_event_sequences"] = SEQ_PATTERNS_SQL


_FPG_MIN_SUPPORT = 0.25


def user_event_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type itemsets per user basket up to size 3 via
    MLlib FPGrowth (operators/assoc.py::frequent_itemsets) — the
    beyond-pairs generalization of item_rules; the oracle enumerates
    the lattice levels with canonical-order joins over distinct
    (user, item) presence rows."""
    from ..operators.assoc import frequent_itemsets

    ev = load_table(spark, sf_dir, "events")
    return frequent_itemsets(
        ev, "user_id", "event_type", min_support=_FPG_MIN_SUPPORT, max_len=3
    )


ITEMSETS_SQL = f"""
WITH pres AS (
  SELECT DISTINCT user_id, event_type AS it FROM events
),
nn AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS ns FROM events),
l1 AS (
  SELECT it AS itemset, 1 AS length, CAST(count(*) AS BIGINT) AS c
  FROM pres GROUP BY 1
),
l2 AS (
  SELECT a.it || '&' || b.it AS itemset, 2 AS length,
         CAST(count(*) AS BIGINT) AS c
  FROM pres a JOIN pres b ON a.user_id = b.user_id AND a.it < b.it
  GROUP BY 1
),
l3 AS (
  SELECT a.it || '&' || b.it || '&' || d.it AS itemset, 3 AS length,
         CAST(count(*) AS BIGINT) AS c
  FROM pres a
  JOIN pres b ON a.user_id = b.user_id AND a.it < b.it
  JOIN pres d ON b.user_id = d.user_id AND b.it < d.it
  GROUP BY 1
),
u AS (
  SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3
)
SELECT itemset, CAST(length AS INTEGER) AS length, c AS n_baskets,
       c / CAST(ns AS DOUBLE) AS support
FROM u CROSS JOIN nn
WHERE c >= ceil({_FPG_MIN_SUPPORT!r} * ns)
"""

QUERIES["user_event_itemsets"] = user_event_itemsets
ORACLE_SQL["user_event_itemsets"] = ITEMSETS_SQL
