"""Subsequence-search contract (operators/tsmatch.py): top-k hourly
event-count windows matching a z-normalized burst pattern."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table

_HOUR_NS = 3_600_000_000_000
#: the query shape: quiet, quiet, burst, quiet, quiet
PATTERN = [0.0, 0.0, 1.0, 0.0, 0.0]
TOPK = 15
_L = len(PATTERN)


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        (F.col("ts") - F.col("ts") % _HOUR_NS).alias("hour_ns"),
    ).agg(F.count("*").cast("double").alias("v"))


def burst_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which 5-hour stretches of any event type look most like an
    isolated burst? Z-normalized euclidean subsequence search."""
    from ..operators.tsmatch import subsequence_topk

    return subsequence_topk(
        _series(spark, sf_dir),
        PATTERN,
        "event_type",
        "hour_ns",
        "v",
        k=TOPK,
    )


def _sql() -> str:
    from ..operators.tsmatch import znormalize_pattern

    zp = "[" + ", ".join(repr(p) for p in znormalize_pattern(PATTERN)) + "]"
    L = float(_L)
    zexpr = "(arr[i] - mean) / std"
    return f"""
WITH series AS (
  SELECT event_type AS k,
         epoch_ns(ts) - epoch_ns(ts) % {_HOUR_NS} AS b,
         CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
wins AS (
  SELECT k, b AS start,
         list(v) OVER (PARTITION BY k ORDER BY b
                       ROWS BETWEEN CURRENT ROW AND {_L - 1} FOLLOWING) AS arr
  FROM series
),
m AS (
  SELECT k, start, arr,
         list_reduce(arr, (a, x) -> a + x) / {L} AS mean
  FROM wins WHERE len(arr) = {_L}
),
sd AS (
  SELECT *,
         sqrt(list_reduce(list_transform(arr, x -> (x - mean) * (x - mean)),
                          (a, x) -> a + x) / {L}) AS std
  FROM m
),
scored AS (
  SELECT k AS event_type, start,
         round(sqrt(list_reduce(
           list_transform(range(1, {_L + 1}),
                          i -> ({zexpr} - {zp}[i]) * ({zexpr} - {zp}[i])),
           (a, x) -> a + x)), 8) AS dist
  FROM sd WHERE std > 0
)
SELECT event_type, start, dist,
       CAST(row_number() OVER (ORDER BY dist, event_type, start) AS BIGINT)
         AS rk
FROM scored
QUALIFY rk <= {TOPK}
"""


BURST_SQL = _sql()

QUERIES = {"burst_windows_events": burst_windows_events}
ORACLE_SQL = {"burst_windows_events": BURST_SQL}
