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


MOTIF_K = 10
MOTIF_MAX_BUCKET = 200
_MIN_SEP = _L * _HOUR_NS


def motif_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recurring 5-hour shapes across event types: top-10 closest
    z-normalized window pairs from sign-LSH buckets, trivial
    overlapping self-matches excluded."""
    from ..operators.tsmatch import motif_pairs

    return motif_pairs(
        _series(spark, sf_dir),
        "event_type",
        "hour_ns",
        "v",
        length=_L,
        k=MOTIF_K,
        min_separation=_MIN_SEP,
        max_bucket=MOTIF_MAX_BUCKET,
    )


def _motif_sql() -> str:
    L = float(_L)
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
zw AS (
  SELECT k, start,
         list_transform(range(1, {_L + 1}),
                        i -> (arr[i] - mean) / std) AS z,
         array_to_string(
           list_transform(range(1, {_L + 1}),
             i -> CASE WHEN (arr[i] - mean) / std > 0
                       THEN '1' ELSE '0' END), '') AS bucket
  FROM sd WHERE std > 0
),
ok AS (
  SELECT bucket FROM zw GROUP BY 1 HAVING count(*) <= {MOTIF_MAX_BUCKET}
),
zz AS (SELECT zw.* FROM zw JOIN ok USING (bucket)),
pairs AS (
  SELECT a.k AS key_a, a.start AS start_a,
         b.k AS key_b, b.start AS start_b,
         round(sqrt(list_reduce(
           list_transform(range(1, {_L + 1}),
                          i -> (a.z[i] - b.z[i]) * (a.z[i] - b.z[i])),
           (x, y) -> x + y)), 8) AS dist
  FROM zz a JOIN zz b USING (bucket)
  WHERE (a.k < b.k OR (a.k = b.k AND a.start < b.start))
    AND (a.k <> b.k OR b.start - a.start >= {_MIN_SEP})
)
SELECT key_a, start_a, key_b, start_b, dist,
       CAST(row_number() OVER (
         ORDER BY dist, key_a, start_a, key_b, start_b) AS BIGINT) AS rk
FROM pairs
QUALIFY rk <= {MOTIF_K}
"""


MOTIF_SQL = _motif_sql()

QUERIES["motif_windows_events"] = motif_windows_events
ORACLE_SQL["motif_windows_events"] = MOTIF_SQL
