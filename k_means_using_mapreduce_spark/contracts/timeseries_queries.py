"""Time-series contract queries (operators/timeseries.py): dense hourly
gap-fill with a trailing moving average, and a 3-step ordered funnel.

Time math follows temporal_queries' doctrine: integer epoch arithmetic
(`load_table` surfaces events.ts as bigint nanos; buckets go out as
epoch-µs bigints) so nothing here depends on a session timezone.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import funnel, resample_counts, retention_cohorts
from ..sources.loaders import load_table, ns_to_timestamp

_HOUR_US = 3_600_000_000
_STEPS = ("view", "click", "purchase")


def hourly_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    out = resample_counts(
        ev, ts_col="ts", key_col="event_type", unit="hour",
        value_col="value", moving_avg=3,
    )
    return out.select(
        "key",
        F.unix_micros("bucket").alias("bucket_us"),
        "n",
        "total",
        "ma_3",
    )


HOURLY_GAPFILL_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n, sum(value) AS total
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
)
SELECT g.key, g.bucket_us,
  CAST(coalesce(c.n, 0) AS BIGINT) AS n,
  coalesce(c.total, 0.0) AS total,
  avg(CAST(coalesce(c.n, 0) AS DOUBLE))
    OVER (PARTITION BY g.key ORDER BY g.bucket_us
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma_3
FROM grid g LEFT JOIN counts c USING (key, bucket_us)
"""


def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")  # bigint-ns ts: compare-only
    return funnel(ev, _STEPS)


FUNNEL_SQL = """
WITH w1 AS (
  SELECT user_id, ts, event_type,
    min(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id) AS t0
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND t0 IS NOT NULL
                      AND ts > t0 THEN ts END)
      OVER (PARTITION BY user_id) AS t1
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND t1 IS NOT NULL
                      AND ts > t1 THEN ts END)
      OVER (PARTITION BY user_id) AS t2
  FROM w2
), agg AS (
  SELECT
    CAST(count(DISTINCT CASE WHEN t0 IS NOT NULL THEN user_id END) AS BIGINT) AS n0,
    CAST(count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT) AS n1,
    CAST(count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT) AS n2
  FROM w3
)
SELECT * FROM (
  SELECT CAST(1 AS INTEGER) AS step_no, 'view' AS step, n0 AS n_users,
         CAST(1.0 AS DOUBLE) AS conversion FROM agg
  UNION ALL
  SELECT CAST(2 AS INTEGER), 'click', n1,
         CASE WHEN n0 > 0 THEN n1 / n0 END FROM agg
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'purchase', n2,
         CASE WHEN n1 > 0 THEN n2 / n1 END FROM agg
)
"""


def daily_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohorts (the events table spans ~a week — weekly cohorts
    would collapse to one)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    out = retention_cohorts(ev, unit="day")
    return out.select(
        (F.col("cohort")).alias("cohort_us"), "offset", "n_users", "retention"
    )


_DAY_US = 86_400_000_000

RETENTION_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) - epoch_us(ts) % {_DAY_US} AS b
  FROM events
), cohorted AS (
  SELECT user_id, b, min(b) OVER (PARTITION BY user_id) AS cohort
  FROM pairs
), counts AS (
  SELECT cohort, (b - cohort) // {_DAY_US} AS "offset",
         CAST(count(*) AS BIGINT) AS n_users
  FROM cohorted GROUP BY 1, 2
)
SELECT c.cohort AS cohort_us, c."offset", c.n_users,
       CAST(c.n_users AS DOUBLE) / b0.n_users AS retention
FROM counts c JOIN (SELECT cohort, n_users FROM counts WHERE "offset" = 0) b0
  USING (cohort)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "hourly_gapfill_events": hourly_gapfill_events,
    "funnel_conversion_events": funnel_conversion_events,
    "daily_retention_events": daily_retention_events,
}

ORACLE_SQL: dict[str, str] = {
    "hourly_gapfill_events": HOURLY_GAPFILL_SQL,
    "funnel_conversion_events": FUNNEL_SQL,
    "daily_retention_events": RETENTION_SQL,
}


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: each user's most recent event (ties on ts
    broken by event_id, making the order tuple unique)."""
    from ..operators.temporal import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", F.col("ts").alias("ts_ns"), "event_type", "value"
    )


LATEST_EVENT_SQL = """
SELECT user_id, event_id, ts_ns, event_type, value FROM (
  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

QUERIES["latest_event_per_user"] = latest_event_per_user
ORACLE_SQL["latest_event_per_user"] = LATEST_EVENT_SQL


_HALF_HOUR_NS = 1_800_000_000_000


def user_activity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user: each event spans [ts, ts+30min); merged
    islands ARE the 30-minute-gap sessions, expressed as interval
    algebra (bigint-ns, timezone-free)."""
    from ..operators.temporal import merge_intervals

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.lit(_HALF_HOUR_NS)).alias("end"),
    )
    return merge_intervals(ev, key_col="user_id", start_col="start", end_col="end")


INTERVALS_SQL = f"""
WITH iv AS (
  SELECT user_id, epoch_ns(ts) AS s, epoch_ns(ts) + {_HALF_HOUR_NS} AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS nw
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM flagged
)
SELECT user_id, island, min(s) AS start, max(e) AS "end",
       CAST(count(*) AS BIGINT) AS n_merged
FROM islands GROUP BY user_id, island
"""


def event_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h z-score anomalies over the gap-filled hourly series."""
    from ..operators.timeseries import anomaly_flags

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    series = resample_counts(ev, ts_col="ts", key_col="event_type", unit="hour")
    out = anomaly_flags(series, window=24, z=3.0)
    # NULL doubles would NaN-ify through the driver's pandas fetch on
    # the oracle side only — emit an is_scored flag + zero-coalesced
    # numerics instead (both engines identically)
    return out.select(
        "key",
        F.unix_micros("bucket").alias("bucket_us"),
        "n",
        (F.col("std_w").isNotNull() & (F.col("std_w") > 0.0))
        .cast("int")
        .alias("is_scored"),
        F.coalesce("mean_w", F.lit(0.0)).alias("mean_w"),
        F.coalesce("std_w", F.lit(0.0)).alias("std_w"),
        F.coalesce("zscore", F.lit(0.0)).alias("zscore"),
        F.col("is_anomaly").cast("int").alias("is_anomaly"),
    )


ANOMALY_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
series AS (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
stats AS (
  SELECT key, bucket_us, n,
    avg(CAST(n AS DOUBLE)) OVER w AS mean_w,
    stddev_samp(CAST(n AS DOUBLE)) OVER w AS std_w
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY bucket_us
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT key, bucket_us, n,
  CAST(std_w IS NOT NULL AND std_w > 0.0 AS INTEGER) AS is_scored,
  coalesce(mean_w, 0.0) AS mean_w,
  coalesce(std_w, 0.0) AS std_w,
  coalesce(CASE WHEN std_w IS NOT NULL AND std_w > 0.0
                THEN (CAST(n AS DOUBLE) - mean_w) / std_w END, 0.0) AS zscore,
  CAST(coalesce(abs(CASE WHEN std_w IS NOT NULL AND std_w > 0.0
                         THEN (CAST(n AS DOUBLE) - mean_w) / std_w END) > 3.0,
                FALSE) AS INTEGER) AS is_anomaly
FROM stats
"""

QUERIES["user_activity_intervals"] = user_activity_intervals
ORACLE_SQL["user_activity_intervals"] = INTERVALS_SQL
QUERIES["event_anomaly_flags"] = event_anomaly_flags
ORACLE_SQL["event_anomaly_flags"] = ANOMALY_SQL


def user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals of each user's event_type state machine
    ((user_id, ts) is unique in the testdata, so ts alone orders the
    log deterministically)."""
    from ..operators.temporal import scd2_history

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    out = scd2_history(
        ev, key_col="user_id", ts_col="ts", attr_cols=["event_type"],
        end_of_time=_EOT_NS,
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("valid_from_ns"),
        F.col("valid_to").alias("valid_to_ns"),
        F.col("is_current").cast("int").alias("is_current"),
    )


_EOT_NS = 4_102_444_800_000_000_000  # 2100-01-01: open-interval sentinel

SCD2_SQL = f"""
WITH ordered AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ns(ts)) AS prev
  FROM events
), collapsed AS (
  SELECT user_id, ts_ns, event_type FROM ordered
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, ts_ns AS valid_from_ns,
       coalesce(lead(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns),
                {_EOT_NS}) AS valid_to_ns,
       CAST(lead(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns) IS NULL
            AS INTEGER) AS is_current
FROM collapsed
"""

QUERIES["user_state_history"] = user_state_history
ORACLE_SQL["user_state_history"] = SCD2_SQL


_DEBOUNCE_NS = 600_000_000_000  # 10 minutes


def debounced_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-collapse per (user, event_type): repeats within 10 minutes
    of their predecessor collapse to the burst's first event."""
    from ..operators.temporal import debounce

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    out = debounce(
        ev, key_cols=["user_id", "event_type"], ts_col="ts", within=_DEBOUNCE_NS
    )
    return out.select(
        "user_id", "event_type", F.col("ts").alias("ts_ns"), "event_id"
    )


DEBOUNCE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id,
    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w >= {_DEBOUNCE_NS}
         THEN 1 ELSE 0 END AS ok
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY epoch_ns(ts))
), bursts AS (
  SELECT *, sum(ok) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts_ns ROWS UNBOUNDED PRECEDING) AS burst
  FROM flagged
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, burst
                               ORDER BY ts_ns) AS fib
  FROM bursts
)
SELECT user_id, event_type, ts_ns, event_id FROM ranked WHERE fib = 1
"""

QUERIES["debounced_user_events"] = debounced_user_events
ORACLE_SQL["debounced_user_events"] = DEBOUNCE_SQL


DECAY_ASOF_US = 1706745600000000  # 2024-02-01 00:00:00 UTC
DECAY_HALF_LIFE_US = 7 * 24 * 3600 * 1000000  # 7 days


def decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially decayed value features as of a fixed
    snapshot instant (half-life 7 days) — point-in-time correct:
    events after the snapshot are excluded (operators/timeseries.py::
    decayed_aggregate)."""
    from ..operators.timeseries import decayed_aggregate

    return decayed_aggregate(
        load_table(spark, sf_dir, "events"),
        ["user_id"],
        "value",
        "ts",
        half_life_us=DECAY_HALF_LIFE_US,
        asof_us=DECAY_ASOF_US,
    )


DECAYED_USER_VALUE_SQL = f"""
SELECT user_id,
       sum(value * pow(0.5,
           ({DECAY_ASOF_US} - epoch_us(ts)) / {float(DECAY_HALF_LIFE_US)}))
         AS decayed_sum,
       sum(pow(0.5,
           ({DECAY_ASOF_US} - epoch_us(ts)) / {float(DECAY_HALF_LIFE_US)}))
         AS decayed_n,
       sum(value * pow(0.5,
           ({DECAY_ASOF_US} - epoch_us(ts)) / {float(DECAY_HALF_LIFE_US)}))
         / sum(pow(0.5,
           ({DECAY_ASOF_US} - epoch_us(ts)) / {float(DECAY_HALF_LIFE_US)}))
         AS decayed_mean
FROM events
WHERE epoch_us(ts) <= {DECAY_ASOF_US}
GROUP BY 1
"""

QUERIES["decayed_user_value"] = decayed_user_value
ORACLE_SQL["decayed_user_value"] = DECAYED_USER_VALUE_SQL


CUSUM_SLACK = 0.25
CUSUM_THRESHOLD = 4.0
CUSUM_BASELINE = 168  # in-control reference: first week of hourly buckets


def _hourly_count_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    out = resample_counts(ev, ts_col="ts", key_col="event_type", unit="hour")
    return out.select("key", F.unix_micros("bucket").alias("bucket_us"), "n")


def cusum_shift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM level-shift statistic over the hourly event-count
    grid (operators/timeseries.py::cusum_statistics) — the prefix-min
    closed form of Page's recursion as pure window algebra, decimal-
    accumulated so both engines agree bit-for-bit."""
    from ..operators.timeseries import cusum_statistics

    return cusum_statistics(
        _hourly_count_series(spark, sf_dir),
        key_col="key",
        order_col="bucket_us",
        value_col="n",
        slack=CUSUM_SLACK,
        threshold=CUSUM_THRESHOLD,
        baseline_buckets=CUSUM_BASELINE,
    )


def changepoint_summary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key changepoint verdict: first CUSUM crossing, direction,
    flag counts, max statistic (sentinels, not NULLs)."""
    from ..operators.timeseries import changepoint_summary

    return changepoint_summary(
        _hourly_count_series(spark, sf_dir),
        key_col="key",
        order_col="bucket_us",
        value_col="n",
        slack=CUSUM_SLACK,
        threshold=CUSUM_THRESHOLD,
        baseline_buckets=CUSUM_BASELINE,
    )


_CUSUM_CORE = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
series AS (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
ranked AS (
  SELECT key, bucket_us, n,
    row_number() OVER (PARTITION BY key ORDER BY bucket_us) AS rn
  FROM series
),
mom AS (
  SELECT key, bucket_us, n,
    CAST(count(CASE WHEN rn <= {CUSUM_BASELINE} THEN n END) OVER wk
         AS DOUBLE) AS cnt,
    sum(CASE WHEN rn <= {CUSUM_BASELINE}
             THEN CAST(n AS DOUBLE) END) OVER wk AS s1,
    sum(CASE WHEN rn <= {CUSUM_BASELINE}
             THEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE) END) OVER wk AS s2
  FROM ranked WINDOW wk AS (PARTITION BY key)
),
zs AS (
  SELECT key, bucket_us, n,
    CASE WHEN cnt > 1
          AND greatest(0.0, (s2 - s1 * s1 / cnt) / (cnt - 1)) > 0
         THEN (CAST(n AS DOUBLE) - s1 / cnt)
              / sqrt(greatest(0.0, (s2 - s1 * s1 / cnt) / (cnt - 1)))
         ELSE 0.0 END AS zscore
  FROM mom
),
cums AS (
  SELECT *,
    sum(CAST(round(zscore, 6) AS DECIMAL(18,6))
        - CAST({CUSUM_SLACK!r} AS DECIMAL(18,6))) OVER wc AS c_pos,
    sum(-CAST(round(zscore, 6) AS DECIMAL(18,6))
        - CAST({CUSUM_SLACK!r} AS DECIMAL(18,6))) OVER wc AS c_neg
  FROM zs
  WINDOW wc AS (PARTITION BY key ORDER BY bucket_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
stat AS (
  SELECT key, bucket_us, n, zscore,
    c_pos - least(CAST(0 AS DECIMAL(18,6)), min(c_pos) OVER wc) AS s_pos,
    c_neg - least(CAST(0 AS DECIMAL(18,6)), min(c_neg) OVER wc) AS s_neg
  FROM cums
  WINDOW wc AS (PARTITION BY key ORDER BY bucket_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
flags AS (
  -- decimal→double via exact integer micro-units + IEEE division:
  -- direct DECIMAL→DOUBLE casts differ at 1 ulp between engines.
  SELECT key, bucket_us, n, zscore,
    CAST(CAST(s_pos * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0
      AS cusum_pos,
    CAST(CAST(s_neg * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0
      AS cusum_neg,
    CAST(s_pos > CAST({CUSUM_THRESHOLD!r} AS DECIMAL(18,6)) AS INTEGER)
      AS shift_up,
    CAST(s_neg > CAST({CUSUM_THRESHOLD!r} AS DECIMAL(18,6)) AS INTEGER)
      AS shift_down
  FROM stat
)
"""

CUSUM_SQL = _CUSUM_CORE + """
SELECT * FROM flags
"""

CHANGEPOINT_SUMMARY_SQL = _CUSUM_CORE + """
, agg AS (
  SELECT key,
    CAST(count(*) AS BIGINT) AS n_buckets,
    CAST(sum(shift_up) AS BIGINT) AS n_up_flags,
    CAST(sum(shift_down) AS BIGINT) AS n_down_flags,
    min(CASE WHEN shift_up = 1 THEN bucket_us END) AS fu,
    min(CASE WHEN shift_down = 1 THEN bucket_us END) AS fd,
    max(cusum_pos) AS max_cusum_pos,
    max(cusum_neg) AS max_cusum_neg
  FROM flags GROUP BY key
)
SELECT key, n_buckets, n_up_flags, n_down_flags,
  coalesce(least(fu, fd), CAST(-1 AS BIGINT)) AS first_shift,
  CASE WHEN fu IS NULL AND fd IS NULL THEN 'none'
       WHEN fd IS NULL OR (fu IS NOT NULL AND fu < fd) THEN 'up'
       WHEN fu IS NULL OR (fd < fu) THEN 'down'
       ELSE 'both' END AS direction,
  max_cusum_pos, max_cusum_neg
FROM agg
"""

QUERIES["cusum_shift_events"] = cusum_shift_events
ORACLE_SQL["cusum_shift_events"] = CUSUM_SQL
QUERIES["changepoint_summary_events"] = changepoint_summary_events
ORACLE_SQL["changepoint_summary_events"] = CHANGEPOINT_SUMMARY_SQL


def hourly_locf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly last-observation-carried-forward value series per event
    type (operators/timeseries.py::resample_locf) — the step-function
    resample where empty buckets mean 'unchanged', not zero."""
    from ..operators.timeseries import resample_locf

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return resample_locf(
        ev, ts_col="ts", key_col="event_type",
        value_col="value", id_col="event_id", unit="hour",
    )


LOCF_SQL = f"""
WITH obs0 AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         CAST(value AS DOUBLE) AS v,
         row_number() OVER (
           PARTITION BY event_type, epoch_us(ts) - epoch_us(ts) % {_HOUR_US}
           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
),
obs AS (SELECT key, bucket_us, v FROM obs0 WHERE rn = 1),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM obs),
keys AS (SELECT DISTINCT key FROM obs),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
filled AS (
  SELECT g.key, g.bucket_us,
    last_value(o.v IGNORE NULLS) OVER (
      PARTITION BY g.key ORDER BY g.bucket_us
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
    CASE WHEN o.v IS NULL THEN 1 ELSE 0 END AS is_carried
  FROM grid g LEFT JOIN obs o USING (key, bucket_us)
)
SELECT key, bucket_us, value, is_carried FROM filled WHERE value IS NOT NULL
"""

QUERIES["hourly_locf_events"] = hourly_locf_events
ORACLE_SQL["hourly_locf_events"] = LOCF_SQL


def forecast_backtest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (24 h season) backtest of the last 48 hourly
    buckets per event type: MAE/RMSE/sMAPE/MASE entirely as window +
    conditional-aggregation programs over the dense grid."""
    from ..operators.timeseries import forecast_backtest

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return forecast_backtest(
        ev, ts_col="ts", key_col="event_type", unit="hour",
        season=24, holdout=48,
    )


FORECAST_BACKTEST_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS DOUBLE) AS y
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
lagged AS (
  SELECT key, y,
         lag(y, 24) OVER w AS f,
         row_number() OVER w AS idx,
         count(*) OVER (PARTITION BY key) AS t_max
  FROM dense
  WINDOW w AS (PARTITION BY key ORDER BY bucket_us)
),
terms AS (
  SELECT key,
         idx > t_max - 48 AS is_eval,
         idx <= t_max - 48 AND f IS NOT NULL AS is_train,
         y - f AS err,
         abs(f) + abs(y) AS den
  FROM lagged
)
SELECT key,
  CAST(sum(CASE WHEN is_eval THEN 1 ELSE 0 END) AS BIGINT) AS h,
  avg(CASE WHEN is_eval THEN abs(err) END) AS mae,
  sqrt(avg(CASE WHEN is_eval THEN err * err END)) AS rmse,
  avg(CASE WHEN is_eval THEN
        (CASE WHEN den = 0 THEN 0.0 ELSE 2.0 * abs(err) / den END)
      END) AS smape,
  avg(CASE WHEN is_eval THEN abs(err) END)
    / nullif(avg(CASE WHEN is_train THEN abs(err) END), 0.0) AS mase
FROM terms
GROUP BY key
"""

QUERIES["forecast_backtest_events"] = forecast_backtest_events
ORACLE_SQL["forecast_backtest_events"] = FORECAST_BACKTEST_SQL


def trend_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall + Theil-Sen per event-type hourly series."""
    from ..operators.timeseries import trend_test

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return trend_test(ev, ts_col="ts", key_col="event_type", unit="hour")


TREND_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS DOUBLE) AS y
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
idx AS (
  SELECT key, y,
         row_number() OVER (PARTITION BY key ORDER BY bucket_us) AS idx
  FROM dense
),
pairs AS (
  SELECT a.key, sign(b.y - a.y) AS sgn,
         (b.y - a.y) / (b.idx - a.idx) AS slope
  FROM idx a JOIN idx b ON a.key = b.key AND b.idx > a.idx
),
pa AS (
  SELECT key, CAST(sum(sgn) AS BIGINT) AS s,
         quantile_cont(slope, 0.5) AS sen_slope
  FROM pairs GROUP BY 1
),
nk AS (SELECT key, CAST(count(*) AS BIGINT) AS n FROM idx GROUP BY 1),
tie AS (
  SELECT key, sum(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (
    SELECT key, y, CAST(count(*) AS DOUBLE) AS t FROM idx GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT key, n, s,
  (n * (n - 1.0) * (2.0 * n + 5) - tie_term) / 18.0 AS var_s,
  (CASE WHEN s > 0 THEN s - 1.0 WHEN s < 0 THEN s + 1.0 ELSE 0.0 END)
    / sqrt(nullif(
        (n * (n - 1.0) * (2.0 * n + 5) - tie_term) / 18.0, 0.0)) AS z,
  sen_slope
FROM nk JOIN tie USING (key) JOIN pa USING (key)
"""

QUERIES["trend_test_events"] = trend_test_events
ORACLE_SQL["trend_test_events"] = TREND_SQL


def seasonal_strength_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FPP trend/seasonal strength + peak hour per event type from the
    classical 2x24 moving-average decomposition."""
    from ..operators.timeseries import seasonal_strength

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return seasonal_strength(
        ev, ts_col="ts", key_col="event_type", unit="hour", season=24
    )


SEASONAL_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS DOUBLE) AS y
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
st AS (
  SELECT key, y,
         row_number() OVER w AS idx,
         sum(y) OVER wf AS wsum,
         count(*) OVER wf AS wn,
         lag(y, 12) OVER w AS plo,
         lead(y, 12) OVER w AS phi
  FROM dense
  WINDOW w AS (PARTITION BY key ORDER BY bucket_us),
         wf AS (PARTITION BY key ORDER BY bucket_us
                ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
det AS (
  SELECT key, y, CAST((idx - 1) % 24 AS INTEGER) AS pos,
         y - (CASE WHEN wn = 25
                   THEN (wsum - 0.5 * plo - 0.5 * phi) / 24.0 END) AS d
  FROM st
),
seas AS (
  SELECT key, pos, avg(d) AS s_raw
  FROM det WHERE d IS NOT NULL GROUP BY 1, 2
),
seasc AS (
  SELECT key, pos,
         s_raw - avg(s_raw) OVER (PARTITION BY key) AS s
  FROM seas
),
interior AS (
  SELECT det.key, det.y, det.d, seasc.s
  FROM det JOIN seasc ON det.key = seasc.key AND det.pos = seasc.pos
  WHERE det.d IS NOT NULL
),
stats AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n_interior,
         var_pop(d - s) AS vr, var_pop(d) AS vd, var_pop(y - s) AS vys
  FROM interior GROUP BY 1
),
peak AS (
  SELECT key, pos AS peak_pos FROM (
    SELECT key, pos,
           row_number() OVER (PARTITION BY key ORDER BY s DESC, pos) AS rn
    FROM seasc
  ) WHERE rn = 1
)
SELECT key, n_interior,
  CASE WHEN vys > 0
       THEN greatest(0.0, 1.0 - vr / vys) END AS trend_strength,
  CASE WHEN vd > 0
       THEN greatest(0.0, 1.0 - vr / vd) END AS seasonal_strength,
  peak_pos
FROM stats JOIN peak USING (key)
"""

QUERIES["seasonal_strength_events"] = seasonal_strength_events
ORACLE_SQL["seasonal_strength_events"] = SEASONAL_SQL


def lead_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongest lead-lag correlation (±6 h) between every pair of
    event-type hourly series."""
    from ..operators.timeseries import lead_lag_correlation

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return lead_lag_correlation(
        ev, ts_col="ts", key_col="event_type", unit="hour", max_lag=6
    )


LEAD_LAG_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
g AS (
  SELECT gr.key,
         row_number() OVER (PARTITION BY gr.key ORDER BY gr.bucket_us)
           AS idx,
         CAST(coalesce(c.n, 0) AS DOUBLE) AS y
  FROM grid gr LEFT JOIN counts c USING (key, bucket_us)
),
pairs AS (
  SELECT a.key AS key_a, b.key AS key_b, b.idx - a.idx AS lag,
         a.y AS ya, b.y AS yb
  FROM g a JOIN g b
    ON a.key < b.key AND b.idx BETWEEN a.idx - 6 AND a.idx + 6
),
agg AS (
  SELECT key_a, key_b, lag, count(*) AS n,
         sum(ya) AS sa, sum(yb) AS sb, sum(ya * yb) AS sab,
         sum(ya * ya) AS saa, sum(yb * yb) AS sbb
  FROM pairs GROUP BY 1, 2, 3
),
rtab AS (
  SELECT key_a, key_b, lag, n,
    (n * sab - sa * sb)
      / sqrt(nullif((n * saa - sa * sa) * (n * sbb - sb * sb), 0.0)) AS r
  FROM agg
),
best AS (
  SELECT key_a, key_b, lag AS best_lag, r AS best_r FROM (
    SELECT *, row_number() OVER (PARTITION BY key_a, key_b
                                 ORDER BY abs(r) DESC, lag) AS rn
    FROM rtab WHERE r IS NOT NULL
  ) WHERE rn = 1
),
zero AS (
  SELECT key_a, key_b, r AS r0, CAST(n AS BIGINT) AS n0
  FROM rtab WHERE lag = 0
)
SELECT key_a, key_b, best_lag, best_r, r0, n0
FROM best JOIN zero USING (key_a, key_b)
"""

QUERIES["lead_lag_events"] = lead_lag_events
ORACLE_SQL["lead_lag_events"] = LEAD_LAG_SQL


_WEEK_NS = 7 * 24 * 3_600 * 1_000_000_000


def growth_accounting_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting of event value per user: new /
    expansion / contraction / churned revenue decomposition."""
    from ..operators.timeseries import growth_accounting

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,6)")
    )
    out = growth_accounting(
        ev, ts_col="ts", user_col="user_id", value_col="value_dec",
        bucket_ns=_WEEK_NS,
    )
    money = ["total_rev", "new_rev", "expansion", "contraction",
             "churned_rev", "net_change"]
    return out.select(
        "bucket_ns", "active_users",
        *[F.col(c).cast("double").alias(c) for c in money],
    )


GROWTH_SQL = f"""
WITH per AS (
  SELECT user_id AS u,
         epoch_ns(ts) - epoch_ns(ts) % {_WEEK_NS} AS b,
         sum(CAST(value AS DECIMAL(18,6))) AS rev
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
shifted AS (SELECT u, b + {_WEEK_NS} AS b, rev AS prev_rev FROM per),
j AS (
  SELECT coalesce(c.u, s.u) AS u, coalesce(c.b, s.b) AS b,
         coalesce(c.rev, 0) AS c, coalesce(s.prev_rev, 0) AS p
  FROM per c FULL OUTER JOIN shifted s ON c.u = s.u AND c.b = s.b
),
hz AS (SELECT max(b) AS bmax FROM per),
g AS (
  SELECT b AS bucket_ns,
    CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS active_users,
    sum(c) AS total_rev,
    sum(CASE WHEN p = 0 AND c > 0 THEN c ELSE 0 END) AS new_rev,
    sum(CASE WHEN p > 0 AND c > p THEN c - p ELSE 0 END) AS expansion,
    sum(CASE WHEN p > 0 AND c > 0 AND c < p THEN p - c ELSE 0 END)
      AS contraction,
    sum(CASE WHEN p > 0 AND c = 0 THEN p ELSE 0 END) AS churned_rev
  FROM j, hz WHERE b <= bmax GROUP BY 1
)
SELECT bucket_ns, active_users,
  CAST(total_rev AS DOUBLE) AS total_rev,
  CAST(new_rev AS DOUBLE) AS new_rev,
  CAST(expansion AS DOUBLE) AS expansion,
  CAST(contraction AS DOUBLE) AS contraction,
  CAST(churned_rev AS DOUBLE) AS churned_rev,
  CAST(new_rev + expansion - contraction - churned_rev AS DOUBLE)
    AS net_change
FROM g
"""

QUERIES["growth_accounting_events"] = growth_accounting_events
ORACLE_SQL["growth_accounting_events"] = GROWTH_SQL


_WEEK_US = 604_800_000_000


def cohort_ltv_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-cohort cumulative value per member
    (operators/timeseries.py::cohort_ltv)."""
    from ..operators.timeseries import cohort_ltv

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return cohort_ltv(ev, unit="week")


COHORT_LTV_SQL = f"""
WITH rows0 AS (
  SELECT user_id AS u,
         epoch_us(ts) - epoch_us(ts) % {_WEEK_US} AS b,
         coalesce(CAST(value AS DOUBLE), 0.0) AS v
  FROM events WHERE user_id IS NOT NULL
),
first AS (SELECT u, min(b) AS cohort FROM rows0 GROUP BY 1),
sized AS (
  SELECT cohort, CAST(count(*) AS DOUBLE) AS n_users FROM first GROUP BY 1
),
aged AS (
  SELECT cohort, (b - cohort) // {_WEEK_US} AS age,
         sum(v) AS period_value
  FROM rows0 JOIN first USING (u)
  GROUP BY 1, 2
)
SELECT cohort, age, CAST(n_users AS BIGINT) AS n_users, period_value,
  sum(period_value) OVER (
    PARTITION BY cohort ORDER BY age
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) / n_users AS cum_value_per_user
FROM aged JOIN sized USING (cohort)
"""

QUERIES["cohort_ltv_events"] = cohort_ltv_events
ORACLE_SQL["cohort_ltv_events"] = COHORT_LTV_SQL


def revenue_bridge_1995_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge of lineitem revenue from ship-year 1995
    to 1996 per return flag (operators/timeseries.py::price_volume_mix)."""
    from ..operators.timeseries import price_volume_mix

    li = load_table(spark, sf_dir, "lineitem")
    return price_volume_mix(
        li.where(F.year("l_shipdate") == 1995),
        li.where(F.year("l_shipdate") == 1996),
        ["l_returnflag"],
        qty_col="l_quantity",
        revenue_col="l_extendedprice",
    )


PVM_SQL = """
WITH s0 AS (
  SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS q0,
         CAST(sum(l_extendedprice) AS DOUBLE) AS r0
  FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1
),
s1 AS (
  SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS q1,
         CAST(sum(l_extendedprice) AS DOUBLE) AS r1
  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1
),
j AS (SELECT * FROM s0 FULL OUTER JOIN s1 USING (l_returnflag)),
f AS (
  SELECT *,
    r0 IS NOT NULL AND r1 IS NOT NULL AND q0 IS NOT NULL
      AND q1 IS NOT NULL AND q0 <> 0 AND q1 <> 0 AS ok,
    r0 IS NOT NULL AND r1 IS NOT NULL AS both_present
  FROM j
)
SELECT l_returnflag, q0, q1, r0, r1,
  coalesce(r1, 0.0) - coalesce(r0, 0.0) AS d_revenue,
  CASE WHEN ok THEN (q1 - q0) * (r0 / q0) ELSE 0.0 END AS volume_effect,
  CASE WHEN ok THEN (r1 / q1 - r0 / q0) * q0 ELSE 0.0 END
    AS price_effect,
  CASE WHEN ok THEN (q1 - q0) * (r1 / q1 - r0 / q0)
       WHEN both_present AND NOT ok
       THEN coalesce(r1, 0.0) - coalesce(r0, 0.0)
       ELSE 0.0 END AS mix_effect,
  CASE WHEN r0 IS NULL AND r1 IS NOT NULL THEN r1 ELSE 0.0 END
    AS new_effect,
  CASE WHEN r0 IS NOT NULL AND r1 IS NULL THEN -r0 ELSE 0.0 END
    AS gone_effect
FROM f
"""

QUERIES["revenue_bridge_1995_1996"] = revenue_bridge_1995_1996
ORACLE_SQL["revenue_bridge_1995_1996"] = PVM_SQL


def funnel_latency_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/p90/max time-to-convert for the view->click->purchase
    funnel (operators/timeseries.py::funnel_latency)."""
    from ..operators.timeseries import funnel_latency

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return funnel_latency(ev, ["view", "click", "purchase"])


FUNNEL_LATENCY_SQL = """
WITH w1 AS (
  SELECT user_id, ts, event_type,
    min(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id) AS t0
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND t0 IS NOT NULL
                      AND ts > t0 THEN ts END)
      OVER (PARTITION BY user_id) AS t1
  FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND t1 IS NOT NULL
                      AND ts > t1 THEN ts END)
      OVER (PARTITION BY user_id) AS t2
  FROM w2
), per_user AS (
  SELECT user_id, min(t0) AS t0, min(t1) AS t1, min(t2) AS t2
  FROM w3 GROUP BY 1
), lat AS (
  SELECT CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE) AS l1,
         CAST(epoch_us(t2) - epoch_us(t1) AS DOUBLE) AS l2
  FROM per_user
), agg AS (
  SELECT CAST(count(l1) AS BIGINT) AS n1,
         quantile_cont(l1, 0.5) AS p501, quantile_cont(l1, 0.9) AS p901,
         max(l1) AS mx1,
         CAST(count(l2) AS BIGINT) AS n2,
         quantile_cont(l2, 0.5) AS p502, quantile_cont(l2, 0.9) AS p902,
         max(l2) AS mx2
  FROM lat
)
SELECT * FROM (
  SELECT CAST(2 AS INTEGER) AS step_no, 'click' AS step,
         n1 AS n_converted, coalesce(p501, -1.0) AS p50_us,
         coalesce(p901, -1.0) AS p90_us, coalesce(mx1, -1.0) AS max_us
  FROM agg
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'purchase', n2, coalesce(p502, -1.0),
         coalesce(p902, -1.0), coalesce(mx2, -1.0)
  FROM agg
)
"""

QUERIES["funnel_latency_events"] = funnel_latency_events
ORACLE_SQL["funnel_latency_events"] = FUNNEL_LATENCY_SQL


def hourly_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day load concentration per event type
    (operators/timeseries.py::time_of_day_profile)."""
    from ..operators.timeseries import time_of_day_profile

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return time_of_day_profile(ev)


HOURLY_PROFILE_SQL = """
WITH counts AS (
  SELECT event_type AS key,
         (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(count(*) AS DOUBLE) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT key, sum(c) AS n FROM counts GROUP BY 1),
shares AS (
  SELECT key, hour, n, c / n AS p,
         row_number() OVER (PARTITION BY key ORDER BY c / n DESC, hour)
           AS rk
  FROM counts JOIN tot USING (key)
)
SELECT key AS event_type,
  CAST(any_value(n) AS BIGINT) AS n_events,
  -sum(p * ln(p)) / ln(24.0) AS entropy,
  min(CASE WHEN rk = 1 THEN hour END) AS peak_hour,
  max(CASE WHEN rk = 1 THEN p END) AS peak_share
FROM shares GROUP BY 1
"""

QUERIES["hourly_profile_events"] = hourly_profile_events
ORACLE_SQL["hourly_profile_events"] = HOURLY_PROFILE_SQL


def hourly_acf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation (lags 1..6) of each event type's hourly count
    series (operators/timeseries.py::autocorrelation over the
    resample_counts dense grid)."""
    from ..operators.timeseries import autocorrelation, resample_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    grid = resample_counts(ev, unit="hour")
    return autocorrelation(grid, max_lag=6)


def _acf_sql(max_lag: int = 6) -> str:
    head = f"""counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
g2 AS MATERIALIZED (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS DOUBLE) AS x
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
)"""
    arms = []
    for k in range(1, max_lag + 1):
        arms.append(f"""SELECT key, {k} AS lag,
  CAST(count(*) AS BIGINT) AS n_pairs,
  (CAST(count(*) AS DOUBLE) * sum(x * y) - sum(x) * sum(y))
    / nullif(sqrt(
        (CAST(count(*) AS DOUBLE) * sum(x * x) - sum(x) * sum(x))
        * (CAST(count(*) AS DOUBLE) * sum(y * y) - sum(y) * sum(y))
      ), 0.0) AS acf
FROM (
  SELECT key, x,
         lag(x, {k}) OVER (PARTITION BY key ORDER BY bucket_us) AS y
  FROM g2
) t WHERE y IS NOT NULL GROUP BY key""")
    return "WITH " + head + "\n" + " UNION ALL ".join(arms)


QUERIES["hourly_acf_events"] = hourly_acf_events
ORACLE_SQL["hourly_acf_events"] = _acf_sql(6)


def hourly_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMOC level-shift localization on each event type's hourly
    series (operators/timeseries.py::changepoint_argmax)."""
    from ..operators.timeseries import changepoint_argmax, resample_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    grid = resample_counts(ev, unit="hour").select(
        "key", F.unix_micros("bucket").alias("bucket"), "n"
    )
    return changepoint_argmax(grid)


CHANGEPOINT_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
g2 AS MATERIALIZED (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS DOUBLE) AS x
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
rows0 AS (
  SELECT key, bucket_us AS at,
    CAST(row_number() OVER wo AS DOUBLE) AS k,
    sum(x) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS sk,
    sum(x) OVER wp AS sn,
    CAST(count(*) OVER wp AS DOUBLE) AS n,
    var_pop(x) OVER wp AS vp
  FROM g2
  WINDOW wo AS (PARTITION BY key ORDER BY bucket_us),
         wp AS (PARTITION BY key)
),
stats AS (
  SELECT *, abs(sk - k / n * sn) / sqrt(k * (n - k) / n) AS stat
  FROM rows0 WHERE k < n
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY key
                               ORDER BY stat DESC, k) AS rk
  FROM stats
)
SELECT key, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS cp_pos,
  at AS cp_at,
  stat / nullif(sqrt(vp), 0.0) AS stat_norm,
  (sn - sk) / (n - k) - sk / k AS shift
FROM best WHERE rk = 1
"""

QUERIES["hourly_changepoint_events"] = hourly_changepoint_events
ORACLE_SQL["hourly_changepoint_events"] = CHANGEPOINT_SQL


def interpolated_hourly_value_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean event value per (type, hour) with empty hours linearly
    interpolated — NULL-aware gap fill, not zero fill
    (operators/timeseries.py::interpolate_linear)."""
    from ..operators.timeseries import interpolate_linear, resample_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    grid = resample_counts(ev, unit="hour", value_col="value").select(
        "key",
        F.unix_micros("bucket").alias("bucket"),
        F.when(F.col("n") > 0, F.col("total") / F.col("n")).alias("v"),
    )
    out = interpolate_linear(grid)
    # summarize per key so the contract result stays small and stable
    return out.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.count("v").alias("n_observed"),
        F.avg("v_interp").alias("mean_interp"),
        F.min("v_interp").alias("min_interp"),
        F.max("v_interp").alias("max_interp"),
    )


INTERP_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n, sum(value) AS total
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
g2 AS MATERIALIZED (
  SELECT g.key, CAST(g.bucket_us AS DOUBLE) AS pos,
    CASE WHEN coalesce(c.n, 0) > 0
         THEN coalesce(c.total, 0.0) / coalesce(c.n, 0) END AS v
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
filled AS (
  SELECT key, v,
    last_value(v IGNORE NULLS) OVER wb AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
      OVER wb AS prev_p,
    first_value(v IGNORE NULLS) OVER wf AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
      OVER wf AS next_p,
    pos
  FROM g2
  WINDOW wb AS (PARTITION BY key ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY key ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
interp AS (
  SELECT key, v,
    CASE WHEN v IS NOT NULL THEN v
         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
         THEN prev_v + (next_v - prev_v) * (pos - prev_p)
              / nullif(next_p - prev_p, 0.0)
         WHEN prev_v IS NOT NULL THEN prev_v
         ELSE next_v END AS v_interp
  FROM filled
)
SELECT key, CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(count(v) AS BIGINT) AS n_observed,
  avg(v_interp) AS mean_interp,
  min(v_interp) AS min_interp,
  max(v_interp) AS max_interp
FROM interp GROUP BY 1
"""

QUERIES["interpolated_hourly_value_events"] = interpolated_hourly_value_events
ORACLE_SQL["interpolated_hourly_value_events"] = INTERP_SQL


def dominant_period_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detected seasonality per event type: the lag (2..24h) with the
    strongest positive autocorrelation — "is there a daily cycle"
    answered as an argmax over the ACF (composition of
    resample_counts + autocorrelation; a true daily cycle shows
    period 24)."""
    from pyspark.sql.window import Window

    from ..operators.timeseries import autocorrelation, resample_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    acf = autocorrelation(
        resample_counts(ev, unit="hour"), max_lag=24
    ).where(F.col("lag") >= 2)
    w = Window.partitionBy("key").orderBy(
        F.col("acf").desc(), F.col("lag")
    )
    return (
        acf.where(F.col("acf").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            F.col("key").alias("event_type"),
            F.col("lag").alias("period_hours"),
            F.col("acf").alias("peak_acf"),
        )
    )


def _dominant_period_sql() -> str:
    # reuse the ACF construction at max_lag=24, then one argmax
    inner = _acf_sql(24)
    return f"""
WITH acf_all AS ({inner}),
ranked AS (
  SELECT key, lag, acf,
         row_number() OVER (PARTITION BY key
                            ORDER BY acf DESC, lag) AS rk
  FROM acf_all WHERE lag >= 2 AND acf IS NOT NULL
)
SELECT key AS event_type, CAST(lag AS INTEGER) AS period_hours,
       acf AS peak_acf
FROM ranked WHERE rk = 1
"""


QUERIES["dominant_period_events"] = dominant_period_events
ORACLE_SQL["dominant_period_events"] = _dominant_period_sql()


_EWMA_ALPHA = 0.3
_EWMA_W = 12


def ewma_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-window EWMA smoothing of each event type's hourly count
    series (operators/timeseries.py::ewma_by_key), alpha 0.3 over the
    last 12 buckets; bucket emitted as epoch-us."""
    from ..operators.timeseries import ewma_by_key, resample_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    grid = resample_counts(ev, unit="hour")
    out = ewma_by_key(grid, alpha=_EWMA_ALPHA, window=_EWMA_W)
    return out.select(
        "key",
        F.unix_micros("bucket").alias("bucket_us"),
        F.col("x").cast("long").alias("n"),
        "ewma",
    )


def _ewma_sql() -> str:
    ws = [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_W)]
    num = " + ".join(
        [f"x * {ws[0]!r}"]
        + [
            f"coalesce(lag(x, {k}) OVER w * {ws[k]!r}, 0.0)"
            for k in range(1, _EWMA_W)
        ]
    )
    den = " + ".join(
        [f"CASE WHEN x IS NOT NULL THEN {ws[0]!r} ELSE 0.0 END"]
        + [
            f"CASE WHEN lag(x, {k}) OVER w IS NOT NULL THEN {ws[k]!r} ELSE 0.0 END"
            for k in range(1, _EWMA_W)
        ]
    )
    head = f"""counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS MATERIALIZED (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS DOUBLE) AS x
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
)"""
    return f"""
WITH {head}
SELECT key, CAST(bucket_us AS BIGINT) AS bucket_us,
       CAST(x AS BIGINT) AS n,
       ({num}) / nullif(({den}), 0.0) AS ewma
FROM dense
WINDOW w AS (PARTITION BY key ORDER BY bucket_us)
"""


QUERIES["ewma_hourly_events"] = ewma_hourly_events
ORACLE_SQL["ewma_hourly_events"] = _ewma_sql()


def ar2_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) Yule-Walker fit of each event type's hourly count series
    (operators/timeseries.py::ar2_yule_walker) — memory structure +
    stationarity verdict per series."""
    from ..operators.timeseries import ar2_yule_walker, resample_counts

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return ar2_yule_walker(resample_counts(ev, unit="hour"))


def _ar2_sql() -> str:
    return f"""
WITH acf AS ({_acf_sql(2)}),
piv AS (
  SELECT key,
         max(CASE WHEN lag = 1 THEN acf END) AS r1,
         max(CASE WHEN lag = 2 THEN acf END) AS r2
  FROM acf GROUP BY 1
)
SELECT key, r1, r2,
  r1 * (1.0 - r2) / nullif(1.0 - r1 * r1, 0.0) AS phi1,
  (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) AS phi2,
  1.0 - (r1 * (1.0 - r2) / nullif(1.0 - r1 * r1, 0.0)) * r1
      - ((r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0)) * r2
    AS innovation_ratio,
  ((r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0) > -1.0
   AND (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0)
       + r1 * (1.0 - r2) / nullif(1.0 - r1 * r1, 0.0) < 1.0
   AND (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0.0)
       - r1 * (1.0 - r2) / nullif(1.0 - r1 * r1, 0.0) < 1.0)
    AS stationary
FROM piv
"""


QUERIES["ar2_hourly_events"] = ar2_hourly_events
ORACLE_SQL["ar2_hourly_events"] = _ar2_sql()


def theil_sen_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust volume trend per event type over the hourly
    grid (operators/timeseries.py::theil_sen_trend): x = hour index
    from the series start, y = count; the outlier-immune counterpart
    of the OLS trend contracts."""
    from ..operators.timeseries import resample_counts, theil_sen_trend
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    grid = resample_counts(ev, unit="hour")
    w = Window.partitionBy("key")
    xy = grid.select(
        "key",
        (
            (F.unix_micros("bucket") - F.min(F.unix_micros("bucket")).over(w))
            / F.lit(float(_HOUR_US))
        ).alias("x"),
        F.col("n").cast("double").alias("y"),
    )
    return theil_sen_trend(xy)


def _theil_sen_sql() -> str:
    head = f"""counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
xy AS MATERIALIZED (
  SELECT g.key,
         (g.bucket_us - min(g.bucket_us) OVER (PARTITION BY g.key))
           / {float(_HOUR_US)!r} AS x,
         CAST(coalesce(c.n, 0) AS DOUBLE) AS y
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
pairs AS MATERIALIZED (
  SELECT a.key, (b.y - a.y) / (b.x - a.x) AS slope
  FROM xy a JOIN xy b ON a.key = b.key AND a.x < b.x
),
med_slope AS (
  SELECT key, CAST(count(slope) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS slope
  FROM pairs GROUP BY 1
),
resid AS (
  SELECT xy.key, xy.y - m.slope * xy.x AS r
  FROM xy JOIN med_slope m USING (key)
),
med_int AS (
  SELECT key, CAST(count(r) AS BIGINT) AS n_points,
         quantile_cont(r, 0.5) AS intercept
  FROM resid GROUP BY 1
)"""
    return f"""
WITH {head}
SELECT s.key, i.n_points, s.n_pairs, s.slope, i.intercept
FROM med_slope s JOIN med_int i USING (key)
"""


QUERIES["theil_sen_hourly_events"] = theil_sen_hourly_events
ORACLE_SQL["theil_sen_hourly_events"] = _theil_sen_sql()


def rolling_click_purchase_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-bucket trailing correlation between hourly click and purchase
    volumes (operators/timeseries.py::rolling_correlation) — the
    co-movement monitor; bucket emitted as epoch-us."""
    from ..operators.timeseries import resample_counts, rolling_correlation

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    grid = resample_counts(ev, unit="hour")
    clicks = grid.where(F.col("key") == "click")
    buys = grid.where(F.col("key") == "purchase")
    out = rolling_correlation(clicks, buys, window=24)
    return out.select(
        F.unix_micros("bucket").alias("bucket_us"),
        F.col("x").cast("long").alias("clicks"),
        F.col("y").cast("long").alias("purchases"),
        F.col("n_win").alias("n_win"),
        "corr",
    )


ROLLING_CORR_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS MATERIALIZED (
  SELECT g.key, g.bucket_us, CAST(coalesce(c.n, 0) AS DOUBLE) AS x
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
j AS (
  SELECT a.bucket_us, a.x AS x, b.x AS y
  FROM dense a JOIN dense b USING (bucket_us)
  WHERE a.key = 'click' AND b.key = 'purchase'
),
win AS (
  SELECT bucket_us, x, y,
    CAST(count(*) OVER w AS DOUBLE) AS n,
    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
    sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx,
    sum(y * y) OVER w AS syy
  FROM j
  WINDOW w AS (ORDER BY bucket_us ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT CAST(bucket_us AS BIGINT) AS bucket_us,
  CAST(x AS BIGINT) AS clicks, CAST(y AS BIGINT) AS purchases,
  CAST(n AS BIGINT) AS n_win,
  coalesce(CASE WHEN n >= 3.0 THEN
    (n * sxy - sx * sy)
      / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0)
  END, -2.0) AS corr
FROM win
"""

QUERIES["rolling_click_purchase_corr"] = rolling_click_purchase_corr
ORACLE_SQL["rolling_click_purchase_corr"] = ROLLING_CORR_SQL


_HOLT_ALPHA, _HOLT_BETA, _HOLT_H = 0.3, 0.1, 24


def holt_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of hourly volumes per event type
    (operators/timeseries.py::holt_linear): final level/trend state,
    one-step-ahead SSE, and the 24-hour forecast. The recurrence runs
    in a per-key Arrow kernel; the oracle replays it as a RECURSIVE
    CTE step-for-step — the sequential-state contract pattern."""
    from ..operators.timeseries import holt_linear

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return holt_linear(
        ev, alpha=_HOLT_ALPHA, beta=_HOLT_BETA, horizon=_HOLT_H
    )


def _holt_sql() -> str:
    a, b, h = _HOLT_ALPHA, _HOLT_BETA, float(_HOLT_H)
    return f"""
WITH RECURSIVE counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS (
  SELECT g.key, CAST(coalesce(c.n, 0) AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY g.key ORDER BY g.bucket_us) AS idx
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
hw AS (
  SELECT key, idx, y AS lvl, CAST(0.0 AS DOUBLE) AS trd,
         CAST(0.0 AS DOUBLE) AS sse
  FROM dense WHERE idx = 1
  UNION ALL
  SELECT d.key, d.idx,
    CAST({a!r} AS DOUBLE) * d.y
      + CAST({1.0 - a!r} AS DOUBLE) * (hw.lvl + hw.trd) AS lvl,
    CAST({b!r} AS DOUBLE)
      * ((CAST({a!r} AS DOUBLE) * d.y
          + CAST({1.0 - a!r} AS DOUBLE) * (hw.lvl + hw.trd)) - hw.lvl)
      + CAST({1.0 - b!r} AS DOUBLE) * hw.trd AS trd,
    hw.sse + (d.y - (hw.lvl + hw.trd)) * (d.y - (hw.lvl + hw.trd)) AS sse
  FROM hw JOIN dense d ON d.key = hw.key AND d.idx = hw.idx + 1
),
fin AS (
  SELECT key, idx, lvl, trd, sse,
         row_number() OVER (PARTITION BY key ORDER BY idx DESC) AS rk
  FROM hw
)
SELECT key, CAST(idx AS BIGINT) AS n, lvl AS level, trd AS trend, sse,
       lvl + CAST({h!r} AS DOUBLE) * trd AS forecast
FROM fin WHERE rk = 1
"""


QUERIES["holt_hourly_events"] = holt_hourly_events
ORACLE_SQL["holt_hourly_events"] = _holt_sql()


_HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M, _HW_H = 0.25, 0.05, 0.2, 24, 24


def holt_winters_hourly_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt-Winters additive seasonal smoothing of hourly volumes per
    event type (operators/timeseries.py::holt_winters, m=24): final
    level/trend, one-step-ahead SSE, seasonal amplitude, and the
    24-hour forecast. The per-key Arrow kernel's sequential recurrence
    is replayed by the oracle as a recursive CTE whose 24-slot
    seasonal state rides in a DuckDB LIST column — the list-state
    extension of the holt_hourly_events contract pattern."""
    from ..operators.timeseries import holt_winters

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return holt_winters(
        ev,
        period=_HW_M,
        alpha=_HW_ALPHA,
        beta=_HW_BETA,
        gamma=_HW_GAMMA,
        horizon=_HW_H,
    )


def _holt_winters_sql() -> str:
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    m, h = _HW_M, _HW_H
    # index of s_{T+h-m} in the oldest-first final seasonal ring,
    # 1-based for DuckDB list indexing
    fc_idx = (h - 1) % m + 1
    return f"""
WITH RECURSIVE counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS MATERIALIZED (
  SELECT g.key, CAST(coalesce(c.n, 0) AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY g.key ORDER BY g.bucket_us) AS idx
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
tlen AS (
  SELECT key, count(*) AS t FROM dense GROUP BY key
  HAVING count(*) >= {2 * m}
),
means AS (
  SELECT d.key,
         avg(d.y) FILTER (WHERE d.idx <= {m}) AS m1,
         avg(d.y) FILTER (WHERE d.idx > {m} AND d.idx <= {2 * m}) AS m2
  FROM dense d JOIN tlen USING (key) GROUP BY d.key
),
hw AS (
  SELECT d.key, CAST({m} AS BIGINT) AS idx,
         CAST(mn.m1 AS DOUBLE) AS lvl,
         CAST((mn.m2 - mn.m1) / {m} AS DOUBLE) AS trd,
         list(CAST(d.y - mn.m1 AS DOUBLE) ORDER BY d.idx) AS s,
         CAST(0.0 AS DOUBLE) AS sse
  FROM dense d JOIN means mn USING (key)
  WHERE d.idx <= {m}
  GROUP BY d.key, mn.m1, mn.m2
  UNION ALL
  SELECT hw.key, hw.idx + 1,
    CAST({a!r} AS DOUBLE) * (d.y - hw.s[1])
      + CAST({1.0 - a!r} AS DOUBLE) * (hw.lvl + hw.trd) AS lvl,
    CAST({b!r} AS DOUBLE)
      * ((CAST({a!r} AS DOUBLE) * (d.y - hw.s[1])
          + CAST({1.0 - a!r} AS DOUBLE) * (hw.lvl + hw.trd)) - hw.lvl)
      + CAST({1.0 - b!r} AS DOUBLE) * hw.trd AS trd,
    list_append(
      hw.s[2:{m}],
      CAST({g!r} AS DOUBLE) * (d.y - hw.lvl - hw.trd)
        + CAST({1.0 - g!r} AS DOUBLE) * hw.s[1]
    ) AS s,
    hw.sse + (d.y - (hw.lvl + hw.trd + hw.s[1]))
           * (d.y - (hw.lvl + hw.trd + hw.s[1])) AS sse
  FROM hw JOIN dense d ON d.key = hw.key AND d.idx = hw.idx + 1
),
fin AS (
  SELECT hw.key, hw.idx, hw.lvl, hw.trd, hw.s, hw.sse
  FROM hw JOIN tlen ON tlen.key = hw.key AND hw.idx = tlen.t
)
SELECT key, CAST(idx AS BIGINT) AS n, lvl AS level, trd AS trend, sse,
       list_max(s) - list_min(s) AS s_amp,
       lvl + CAST({float(h)!r} AS DOUBLE) * trd + s[{fc_idx}] AS forecast
FROM fin
"""


QUERIES["holt_winters_hourly_events"] = holt_winters_hourly_events
ORACLE_SQL["holt_winters_hourly_events"] = _holt_winters_sql()


def granger_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-lag Granger test: do last hour's clicks improve the
    purchase-count forecast beyond purchases' own lag?
    (operators/timeseries.py::granger_test.) Both models come from one
    sufficient-statistic aggregate over the lagged hourly grid; the
    oracle replays the identical simple-OLS and Cramer-3×3 closed
    forms term for term."""
    from ..operators.timeseries import granger_test

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return granger_test(ev, cause="click", effect="purchase")


GRANGER_SQL = f"""
WITH counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
grid AS (
  SELECT unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM bounds
),
j AS (
  SELECT g.bucket_us,
    CAST(coalesce(cy.n, 0) AS DOUBLE) AS y,
    CAST(coalesce(cx.n, 0) AS DOUBLE) AS x
  FROM grid g
  LEFT JOIN counts cy ON cy.key = 'purchase' AND cy.bucket_us = g.bucket_us
  LEFT JOIN counts cx ON cx.key = 'click' AND cx.bucket_us = g.bucket_us
),
lagged AS (
  SELECT y,
    lag(y) OVER (ORDER BY bucket_us) AS yl,
    lag(x) OVER (ORDER BY bucket_us) AS xl
  FROM j
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    sum(y) AS sy, sum(y * y) AS syy,
    sum(yl) AS s1, sum(yl * yl) AS s11,
    sum(xl) AS sx, sum(xl * xl) AS sxx,
    sum(yl * y) AS syl, sum(xl * y) AS sxy, sum(yl * xl) AS s1x
  FROM lagged WHERE yl IS NOT NULL AND xl IS NOT NULL
),
rmodel AS (
  SELECT *,
    (n * syl - s1 * sy) / (n * s11 - s1 * s1) AS a1
  FROM s
),
rfit AS (
  SELECT *, (sy - a1 * s1) / n AS a0 FROM rmodel
),
umodel AS (
  SELECT *,
    n * (s11 * sxx - s1x * s1x) - s1 * (s1 * sxx - s1x * sx)
      + sx * (s1 * s1x - s11 * sx) AS d,
    sy * (s11 * sxx - s1x * s1x) - s1 * (syl * sxx - s1x * sxy)
      + sx * (syl * s1x - s11 * sxy) AS d0,
    n * (syl * sxx - s1x * sxy) - sy * (s1 * sxx - s1x * sx)
      + sx * (s1 * sxy - syl * sx) AS d1,
    n * (s11 * sxy - syl * s1x) - s1 * (s1 * sxy - syl * sx)
      + sy * (s1 * s1x - s11 * sx) AS d2
  FROM rfit
),
fit AS (
  SELECT *, d0 / d AS b0, d1 / d AS b1, d2 / d AS b2 FROM umodel
),
sse AS (
  SELECT *,
    syy - 2.0 * (a0 * sy + a1 * syl)
      + (a0 * a0 * n + a1 * a1 * s11 + 2.0 * a0 * a1 * s1) AS sse_r,
    syy - 2.0 * (b0 * sy + b1 * syl + b2 * sxy)
      + (b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * sxx
         + 2.0 * b0 * b1 * s1 + 2.0 * b0 * b2 * sx
         + 2.0 * b1 * b2 * s1x) AS sse_u
  FROM fit
)
SELECT CAST(n AS BIGINT) AS n, b2 AS beta_cause, sse_r, sse_u,
  CASE WHEN sse_u > 0.0
       THEN (sse_r - sse_u) / (sse_u / (n - 3.0)) END AS f_stat
FROM sse
"""

QUERIES["granger_click_purchase"] = granger_click_purchase
ORACLE_SQL["granger_click_purchase"] = GRANGER_SQL


_KALMAN_Q, _KALMAN_R = 4.0, 16.0


def kalman_level_hourly_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kalman local-level filter of hourly volumes per event type
    (operators/timeseries.py::kalman_level): final filtered level,
    state variance, settled adaptive gain, and one-step innovation
    SSE. The scalar Kalman recursions run in a per-key Arrow kernel;
    the oracle replays them as a RECURSIVE CTE step-for-step — the
    sequential-state contract pattern (holt_hourly_events doctrine)."""
    from ..operators.timeseries import kalman_level

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return kalman_level(ev, q=_KALMAN_Q, r=_KALMAN_R)


def _kalman_sql() -> str:
    q, r = _KALMAN_Q, _KALMAN_R
    return f"""
WITH RECURSIVE counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
keys AS (SELECT DISTINCT event_type AS key FROM events),
grid AS (
  SELECT key, unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM keys, bounds
),
dense AS (
  SELECT g.key, CAST(coalesce(c.n, 0) AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY g.key ORDER BY g.bucket_us) AS idx
  FROM grid g LEFT JOIN counts c USING (key, bucket_us)
),
kf AS (
  SELECT key, idx, y AS lvl, CAST({r!r} AS DOUBLE) AS p,
         CAST(0.0 AS DOUBLE) AS k, CAST(0.0 AS DOUBLE) AS sse
  FROM dense WHERE idx = 1
  UNION ALL
  SELECT d.key, d.idx,
    kf.lvl + ((kf.p + CAST({q!r} AS DOUBLE))
              / ((kf.p + CAST({q!r} AS DOUBLE))
                 + CAST({r!r} AS DOUBLE))) * (d.y - kf.lvl) AS lvl,
    (1.0 - ((kf.p + CAST({q!r} AS DOUBLE))
            / ((kf.p + CAST({q!r} AS DOUBLE))
               + CAST({r!r} AS DOUBLE))))
      * (kf.p + CAST({q!r} AS DOUBLE)) AS p,
    ((kf.p + CAST({q!r} AS DOUBLE))
     / ((kf.p + CAST({q!r} AS DOUBLE)) + CAST({r!r} AS DOUBLE))) AS k,
    kf.sse + (d.y - kf.lvl) * (d.y - kf.lvl) AS sse
  FROM kf JOIN dense d ON d.key = kf.key AND d.idx = kf.idx + 1
),
fin AS (
  SELECT key, idx, lvl, p, k, sse,
         row_number() OVER (PARTITION BY key ORDER BY idx DESC) AS rk
  FROM kf
)
SELECT key, CAST(idx AS BIGINT) AS n, lvl AS level, p, k AS gain, sse
FROM fin WHERE rk = 1
"""


QUERIES["kalman_level_hourly_events"] = kalman_level_hourly_events
ORACLE_SQL["kalman_level_hourly_events"] = _kalman_sql()


def dtw_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance between the hourly click and purchase series
    (operators/timeseries.py::dtw_distance): total warped cost and
    per-step average. Integer-exact DP (squared integer costs, min/+),
    so the hash gate is drift-proof; the oracle marches the DP by
    anti-diagonals in a recursive CTE carrying the two trailing
    diagonals as list state."""
    from ..operators.timeseries import dtw_distance

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", ns_to_timestamp("ts")
    )
    return dtw_distance(ev, cause="click", effect="purchase")


_DTW_INF = 1 << 62

DTW_SQL = f"""
WITH RECURSIVE counts AS (
  SELECT event_type AS key,
         epoch_us(ts) - epoch_us(ts) % {_HOUR_US} AS bucket_us,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM counts),
grid AS (
  SELECT unnest(range(lo, hi + {_HOUR_US}, {_HOUR_US})) AS bucket_us
  FROM bounds
),
series AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS t,
         list(CAST(coalesce(ca.n, 0) AS BIGINT)
              ORDER BY g.bucket_us) AS av,
         list(CAST(coalesce(cb.n, 0) AS BIGINT)
              ORDER BY g.bucket_us) AS bv
  FROM grid g
  LEFT JOIN counts ca ON ca.key = 'click' AND ca.bucket_us = g.bucket_us
  LEFT JOIN counts cb ON cb.key = 'purchase' AND cb.bucket_us = g.bucket_us
),
vt AS (
  SELECT CAST(2 AS BIGINT) AS k,
    list_transform(range(1, t + 1),
                   i -> CAST(NULL AS BIGINT)) AS dp,
    list_transform(range(1, t + 1), i ->
      CASE WHEN i = 1
           THEN (av[1] - bv[1]) * (av[1] - bv[1]) END) AS dc
  FROM series
  UNION ALL
  SELECT vt.k + 1,
    vt.dc AS dp,
    list_transform(range(1, s.t + 1), i ->
      CASE WHEN vt.k + 1 - i BETWEEN 1 AND s.t THEN
        (s.av[i] - s.bv[vt.k + 1 - i])
          * (s.av[i] - s.bv[vt.k + 1 - i])
        + least(
            coalesce(CASE WHEN i > 1 THEN vt.dc[i - 1] END,
                     {_DTW_INF}),
            coalesce(vt.dc[i], {_DTW_INF}),
            coalesce(CASE WHEN i > 1 THEN vt.dp[i - 1] END,
                     {_DTW_INF}))
      END) AS dc
  FROM vt, series s
  WHERE vt.k < 2 * s.t
)
SELECT s.t, vt.dc[s.t] AS dtw,
       CAST(vt.dc[s.t] AS DOUBLE)
         / CAST(2 * s.t - 1 AS DOUBLE) AS avg_cost
FROM vt, series s
WHERE vt.k = 2 * s.t
"""


QUERIES["dtw_click_purchase"] = dtw_click_purchase
ORACLE_SQL["dtw_click_purchase"] = DTW_SQL
