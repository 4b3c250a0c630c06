"""Attribution contracts (operators/attribution.py): five-model
multi-touch credit report over the events log — purchases are
conversions, views/clicks are touches, channels derive from the
``props`` JSON."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.attribution import DAY_NS
from ..sources.loaders import load_table

_LOOKBACK_NS = 7 * DAY_NS
_HALFLIFE_NS = DAY_NS


def attribution_report_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.attribution import (
        attribution_credits,
        attribution_report,
        touch_conversion_pairs,
    )

    ev = load_table(spark, sf_dir, "events")
    channel = F.concat(
        F.lit("ch"),
        (F.get_json_object("props", "$.k").cast("long") % 3).cast("string"),
    )
    pairs = touch_conversion_pairs(
        ev,
        "purchase",
        ["view", "click"],
        channel,
        lookback_ns=_LOOKBACK_NS,
    )
    return attribution_report(
        attribution_credits(pairs, halflife_ns=_HALFLIFE_NS)
    )


ATTRIBUTION_SQL = f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, epoch_ns(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_id AS touch_id, epoch_ns(ts) AS touch_ts,
         'ch' || CAST(CAST(props->>'$.k' AS BIGINT) % 3 AS VARCHAR)
           AS channel
  FROM events WHERE event_type IN ('view', 'click')
),
paired AS (
  SELECT c.conv_id, c.conv_ts, t.touch_id, t.touch_ts, t.channel,
         row_number() OVER (PARTITION BY c.conv_id
                            ORDER BY t.touch_ts, t.touch_id) AS rn,
         count(*) OVER (PARTITION BY c.conv_id) AS k,
         pow(2.0, -CAST(c.conv_ts - t.touch_ts AS DOUBLE)
                    / {float(_HALFLIFE_NS)}) AS w
  FROM conv c JOIN touch t ON c.user_id = t.user_id
   AND t.touch_ts < c.conv_ts
   AND t.touch_ts >= c.conv_ts - {_LOOKBACK_NS}
),
scored AS (
  SELECT channel, conv_id,
    CASE WHEN rn = k THEN 1.0 ELSE 0.0 END AS last_touch,
    CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END AS first_touch,
    1.0 / CAST(k AS DOUBLE) AS linear,
    w / sum(w) OVER (PARTITION BY conv_id) AS time_decay,
    CASE WHEN k = 1 THEN 1.0
         WHEN k = 2 THEN 0.5
         WHEN rn = 1 OR rn = k THEN 0.4
         ELSE 0.2 / (CAST(k AS DOUBLE) - 2.0) END AS position
  FROM paired
)
SELECT channel,
  CAST(count(DISTINCT conv_id) AS BIGINT) AS conversions,
  CAST(count(*) AS BIGINT) AS touches,
  sum(last_touch) AS last_touch,
  sum(first_touch) AS first_touch,
  sum(linear) AS linear,
  sum(time_decay) AS time_decay,
  sum(position) AS position
FROM scored
GROUP BY channel
"""


QUERIES = {"attribution_report_events": attribution_report_events}
ORACLE_SQL = {"attribution_report_events": ATTRIBUTION_SQL}
