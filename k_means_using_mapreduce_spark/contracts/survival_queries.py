"""Kaplan-Meier contract (operators/survival.py): user-lifetime churn
curve over the events log, censoring users still active within the
horizon of the corpus end."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import load_table

_HOUR_NS = 3_600_000_000_000
_HORIZON_NS = 3 * 24 * _HOUR_NS  # quiet for 3 days before corpus end = churn


def survival_curve_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import kaplan_meier, user_lifetimes

    ev = load_table(spark, sf_dir, "events")
    lifetimes = user_lifetimes(
        ev, horizon_ns=_HORIZON_NS, unit_ns=_HOUR_NS
    )
    return kaplan_meier(lifetimes, "duration", "event")


SURVIVAL_SQL = f"""
WITH per_user AS (
  SELECT user_id, min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b
  FROM events GROUP BY 1
),
gend AS (SELECT max(b) AS gmax FROM per_user),
lif AS (
  SELECT CAST(((b - a) - (b - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT) AS t,
         CASE WHEN b < gmax - {_HORIZON_NS} THEN 1 ELSE 0 END AS ev
  FROM per_user, gend
),
per_t AS (
  SELECT t, count(*) AS all_n, CAST(sum(ev) AS BIGINT) AS n_events
  FROM lif GROUP BY 1
),
risk AS (
  SELECT t, n_events,
    CAST(sum(all_n) OVER (ORDER BY t DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS n_risk
  FROM per_t
),
fac AS (
  SELECT t, n_events, n_risk,
    1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM risk
),
curve AS (
  SELECT t, n_risk, n_events,
    CASE WHEN min(f) OVER wa > 0
         THEN exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0.0 END) OVER wa)
         ELSE 0.0 END AS survival
  FROM fac
  WINDOW wa AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t, n_risk, n_events, survival FROM curve WHERE n_events > 0
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "survival_curve_users": survival_curve_users,
}

ORACLE_SQL: dict[str, str] = {
    "survival_curve_users": SURVIVAL_SQL,
}
