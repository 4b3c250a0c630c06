"""Kaplan-Meier contract (operators/survival.py): user-lifetime churn
curve over the events log, censoring users still active within the
horizon of the corpus end."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


#: shorter churn horizon than the KM contract: 12 quiet hours — the
#: 3-day horizon censors EVERY user at sf0.01 (0 events = no test)
_LR_HORIZON_NS = 12 * _HOUR_NS


def logrank_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between even/odd user-id cohorts' churn curves
    (operators/survival.py::log_rank_test) — a null-true split, so
    the statistic doubles as a calibration check."""
    from pyspark.sql import functions as F

    from ..operators.survival import log_rank_test, user_lifetimes

    ev = load_table(spark, sf_dir, "events")
    lif = user_lifetimes(
        ev, horizon_ns=_LR_HORIZON_NS, unit_ns=_HOUR_NS
    ).withColumn("cohort", (F.col("user_id") % 2).cast("int"))
    return log_rank_test(
        lif, "cohort", "duration", "event", group_a=0, group_b=1
    )


LOGRANK_SQL = f"""
WITH per_user AS (
  SELECT user_id, min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b
  FROM events GROUP BY 1
),
gend AS (SELECT max(b) AS gmax FROM per_user),
lif AS (
  SELECT CAST(user_id % 2 AS INT) AS grp,
         CAST(((b - a) - (b - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT) AS t,
         CASE WHEN b < gmax - {_LR_HORIZON_NS} THEN 1 ELSE 0 END AS ev
  FROM per_user, gend
),
per_t AS (
  SELECT t,
         sum(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS d1,
         sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS d2,
         sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c2
  FROM lif GROUP BY 1
),
risky AS (
  SELECT t, d1, d2,
    CAST(sum(c1) OVER wd AS DOUBLE) AS n1,
    CAST(sum(c2) OVER wd AS DOUBLE) AS n2
  FROM per_t
  WINDOW wd AS (ORDER BY t DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ev_t AS (SELECT * FROM risky WHERE d1 + d2 > 0),
terms AS (
  SELECT
    sum(d1 - CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2)) AS o_minus_e,
    sum(coalesce(
      CAST(d1 + d2 AS DOUBLE) * (n1 / (n1 + n2)) * (1 - n1 / (n1 + n2))
        * ((n1 + n2) - CAST(d1 + d2 AS DOUBLE))
        / nullif((n1 + n2) - 1, 0.0),
      0.0)) AS var,
    CAST(sum(d1) AS BIGINT) AS events_a,
    CAST(sum(d2) AS BIGINT) AS events_b
  FROM ev_t
),
sizes AS (
  SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM lif
)
SELECT n_a, n_b, events_a, events_b, o_minus_e, var,
       o_minus_e * o_minus_e / nullif(var, 0.0) AS chi2,
       o_minus_e / sqrt(nullif(var, 0.0)) AS z
FROM sizes CROSS JOIN terms
"""

QUERIES["logrank_user_cohorts"] = logrank_user_cohorts
ORACLE_SQL["logrank_user_cohorts"] = LOGRANK_SQL


_COX_ITERS = 4


def cox_churn_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards churn model (operators/survival.py::
    cox_ph, Breslow ties): does activity volume (x = ln events per
    user, O(1) scale) change the churn hazard? Durations/censoring
    use the same 12-hour-quiet horizon as the log-rank contract; the
    oracle unrolls the identical Newton rounds as chained CTEs over
    the distinct-duration risk-set window."""
    from pyspark.sql import functions as F

    from ..operators.survival import cox_ph

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("_a"),
        F.max("ts").alias("_b"),
        F.count(F.lit(1)).cast("double").alias("_c"),
    )
    glob = spans.agg(F.max("_b").alias("_gmax"))
    span = F.col("_b") - F.col("_a")
    lif = spans.join(F.broadcast(glob)).select(
        ((span - span % _HOUR_NS) / _HOUR_NS).cast("long").alias("duration"),
        (F.col("_b") < F.col("_gmax") - F.lit(_LR_HORIZON_NS))
        .cast("int")
        .alias("event"),
        F.log("_c").alias("x"),
    )
    return cox_ph(lif, "duration", "event", "x", iters=_COX_ITERS)


def _cox_sql(iters: int = _COX_ITERS) -> str:
    parts = [
        f"""lif AS MATERIALIZED (
  SELECT CAST(((b - a) - (b - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT) AS t,
         CASE WHEN b < gmax - {_LR_HORIZON_NS} THEN 1 ELSE 0 END AS ev,
         ln(c) AS x
  FROM (
    SELECT user_id, min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b,
           CAST(count(*) AS DOUBLE) AS c
    FROM events GROUP BY 1
  ) pu, (SELECT max(b2) AS gmax FROM (
    SELECT max(epoch_ns(ts)) AS b2 FROM events GROUP BY user_id)) g
)""",
        "cx0 AS MATERIALIZED (SELECT 0.0 AS beta)",
    ]
    for r in range(1, iters + 1):
        parts.append(f"""cb{r} AS MATERIALIZED (
  SELECT l.t,
         sum(exp(c.beta * l.x)) AS b0,
         sum(exp(c.beta * l.x) * l.x) AS b1,
         sum(exp(c.beta * l.x) * l.x * l.x) AS b2,
         CAST(sum(l.ev) AS DOUBLE) AS d,
         sum(CASE WHEN l.ev = 1 THEN l.x ELSE 0.0 END) AS sx,
         any_value(c.beta) AS beta
  FROM lif l CROSS JOIN cx{r - 1} c
  GROUP BY l.t
)""")
        parts.append(f"""cr{r} AS MATERIALIZED (
  SELECT d, sx, beta,
    sum(b0) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS s0,
    sum(b1) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS s1,
    sum(b2) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS s2
  FROM cb{r}
)""")
        parts.append(f"""cx{r} AS MATERIALIZED (
  SELECT any_value(beta)
    + sum(sx - d * s1 / s0)
      / sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0))) AS beta
  FROM cr{r} WHERE d > 0
)""")
    parts.append(f"""cbf AS MATERIALIZED (
  SELECT l.t,
         sum(exp(c.beta * l.x)) AS b0,
         sum(exp(c.beta * l.x) * l.x) AS b1,
         sum(exp(c.beta * l.x) * l.x * l.x) AS b2,
         CAST(sum(l.ev) AS DOUBLE) AS d,
         sum(CASE WHEN l.ev = 1 THEN l.x ELSE 0.0 END) AS sx,
         any_value(c.beta) AS beta
  FROM lif l CROSS JOIN cx{iters} c
  GROUP BY l.t
)""")
    parts.append("""crf AS MATERIALIZED (
  SELECT d, sx, beta,
    sum(b0) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS s0,
    sum(b1) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS s1,
    sum(b2) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS s2
  FROM cbf
)""")
    parts.append("""csz AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ev) AS BIGINT) AS n_events
  FROM lif
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT csz.n AS n, csz.n_events AS n_events,
  any_value(beta) AS beta,
  exp(any_value(beta)) AS hazard_ratio,
  1.0 / sqrt(sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0)))) AS se,
  any_value(beta)
    * sqrt(sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0)))) AS z,
  sum(beta * sx - d * ln(s0)) AS log_lik
FROM crf CROSS JOIN csz
WHERE d > 0
GROUP BY csz.n, csz.n_events
"""
    )


QUERIES["cox_churn_users"] = cox_churn_users
ORACLE_SQL["cox_churn_users"] = _cox_sql()


def nelson_aalen_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative churn hazard over user lifetimes
    (operators/survival.py::nelson_aalen) — the additive twin of the
    KM contract, on the 12-hour horizon so events exist at sf0.01."""
    from ..operators.survival import nelson_aalen, user_lifetimes

    ev = load_table(spark, sf_dir, "events")
    lif = user_lifetimes(ev, horizon_ns=_LR_HORIZON_NS, unit_ns=_HOUR_NS)
    return nelson_aalen(lif, "duration", "event")


NELSON_AALEN_SQL = f"""
WITH per_user AS (
  SELECT user_id, min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b
  FROM events GROUP BY 1
),
gend AS (SELECT max(b) AS gmax FROM per_user),
lif AS (
  SELECT CAST(((b - a) - (b - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT) AS t,
         CASE WHEN b < gmax - {_LR_HORIZON_NS} THEN 1 ELSE 0 END AS ev
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
curve AS (
  SELECT t, n_risk, n_events,
    sum(CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
      OVER wa AS cum_hazard,
    sum(CAST(n_events AS DOUBLE)
        / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
      OVER wa AS var_cum_hazard
  FROM risk
  WINDOW wa AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t, n_risk, n_events, cum_hazard, var_cum_hazard
FROM curve WHERE n_events > 0
"""

QUERIES["nelson_aalen_users"] = nelson_aalen_users
ORACLE_SQL["nelson_aalen_users"] = NELSON_AALEN_SQL

_RMST_TAU = 48.0  # hours


def rmst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at tau = 48h over user lifetimes
    (operators/survival.py::restricted_mean_survival): the average
    churn-free hours in a user's first two days — the model-free
    retention effect size."""
    from ..operators.survival import restricted_mean_survival, user_lifetimes

    ev = load_table(spark, sf_dir, "events")
    lif = user_lifetimes(ev, horizon_ns=_LR_HORIZON_NS, unit_ns=_HOUR_NS)
    return restricted_mean_survival(lif, "duration", "event", tau=_RMST_TAU)


RMST_SQL = f"""
WITH per_user AS (
  SELECT user_id, min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b
  FROM events GROUP BY 1
),
gend AS (SELECT max(b) AS gmax FROM per_user),
lif AS (
  SELECT CAST(((b - a) - (b - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT) AS t,
         CASE WHEN b < gmax - {_LR_HORIZON_NS} THEN 1 ELSE 0 END AS ev
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
km AS (
  SELECT t, n_risk, n_events,
    CASE WHEN min(f) OVER wa > 0
         THEN exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0.0 END) OVER wa)
         ELSE 0.0 END AS survival
  FROM fac
  WINDOW wa AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
steps AS (
  SELECT CAST(t AS DOUBLE) AS t, survival,
    coalesce(lag(CAST(t AS DOUBLE)) OVER wt, 0.0) AS t_prev,
    coalesce(lag(survival) OVER wt, 1.0) AS s_prev
  FROM km WHERE n_events > 0 AND t <= {_RMST_TAU!r}
  WINDOW wt AS (ORDER BY t)
)
SELECT {_RMST_TAU!r} AS tau,
  coalesce(sum(s_prev * (t - t_prev)), 0.0)
    + coalesce(min(survival), 1.0) * ({_RMST_TAU!r} - coalesce(max(t), 0.0))
    AS rmst,
  coalesce(min(survival), 1.0) AS km_at_tau
FROM steps
"""

QUERIES["rmst_users"] = rmst_users
ORACLE_SQL["rmst_users"] = RMST_SQL


def km_bands_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn curve WITH Greenwood log(-log) 95% bands
    (operators/survival.py::kaplan_meier_ci) on the 12-hour horizon —
    the plot-ready interval estimate."""
    from ..operators.survival import kaplan_meier_ci, user_lifetimes

    ev = load_table(spark, sf_dir, "events")
    lif = user_lifetimes(ev, horizon_ns=_LR_HORIZON_NS, unit_ns=_HOUR_NS)
    return kaplan_meier_ci(lif, "duration", "event")


def _km_bands_sql() -> str:
    from ..operators.survival import Z_975

    return f"""
WITH per_user AS (
  SELECT user_id, min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b
  FROM events GROUP BY 1
),
gend AS (SELECT max(b) AS gmax FROM per_user),
lif AS (
  SELECT CAST(((b - a) - (b - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT) AS t,
         CASE WHEN b < gmax - {_LR_HORIZON_NS} THEN 1 ELSE 0 END AS ev
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
    1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f,
    CAST(n_events AS DOUBLE)
      / nullif(CAST(n_risk AS DOUBLE)
               * (CAST(n_risk AS DOUBLE) - CAST(n_events AS DOUBLE)), 0.0)
      AS gw
  FROM risk
),
curve AS (
  SELECT t, n_risk, n_events,
    CASE WHEN min(f) OVER wa > 0
         THEN exp(sum(CASE WHEN f > 0 THEN ln(f) ELSE 0.0 END) OVER wa)
         ELSE 0.0 END AS survival,
    coalesce(sum(gw) OVER wa, 0.0) AS varf
  FROM fac
  WINDOW wa AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t, n_risk, n_events, survival,
  CASE WHEN survival > 0 AND survival < 1
       THEN pow(survival,
                exp({Z_975!r} * sqrt(varf) / abs(ln(survival))))
       ELSE 0.0 END AS ci_lo,
  CASE WHEN survival > 0 AND survival < 1
       THEN pow(survival,
                exp(-{Z_975!r} * sqrt(varf) / abs(ln(survival))))
       WHEN survival >= 1 THEN 1.0 ELSE 0.0 END AS ci_hi
FROM curve WHERE n_events > 0
"""


QUERIES["km_bands_users"] = km_bands_users
ORACLE_SQL["km_bands_users"] = _km_bands_sql()


_WB_ITERS = 5


def weibull_churn_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric Weibull churn model over user lifetimes
    (operators/survival.py::weibull_fit): profile-likelihood Newton on
    the shape, closed-form scale — shape > 1 reads as churn risk
    rising with tenure. Same 12-hour-quiet censoring as the log-rank
    contract; the oracle unrolls the identical Newton rounds as
    chained CTEs with the k floor applied term for term."""
    from ..operators.survival import user_lifetimes, weibull_fit

    ev = load_table(spark, sf_dir, "events")
    lif = user_lifetimes(ev, horizon_ns=_LR_HORIZON_NS, unit_ns=_HOUR_NS)
    return weibull_fit(lif, iters=_WB_ITERS)


def _weibull_sql() -> str:
    parts = [
        f"""per_user AS (
  SELECT user_id, min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b
  FROM events GROUP BY 1
),
gend AS (SELECT max(b) AS gmax FROM per_user),
lif AS (
  SELECT CAST(((b - a) - (b - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT) AS t,
         CASE WHEN b < gmax - {_LR_HORIZON_NS} THEN 1 ELSE 0 END AS ev
  FROM per_user, gend
),
pos AS MATERIALIZED (
  SELECT CAST(t AS DOUBLE) AS t, CAST(ev AS DOUBLE) AS ev
  FROM lif WHERE t > 0
),
k0 AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(ev) AS d,
         sum(ev * ln(t)) AS sld, CAST(1.0 AS DOUBLE) AS k
  FROM pos
)"""
    ]
    for i in range(1, _WB_ITERS + 1):
        prev = f"k{i - 1}"
        parts.append(
            f"""w{i} AS MATERIALIZED (
  SELECT any_value(n) AS n, any_value(d) AS d, any_value(sld) AS sld,
         any_value(k) AS k,
         sum(pow(t, k)) AS sw, sum(pow(t, k) * ln(t)) AS swl,
         sum(pow(t, k) * ln(t) * ln(t)) AS swll
  FROM pos CROSS JOIN {prev}
),
k{i} AS (
  SELECT n, d, sld,
    greatest(
      k - (1.0 / k + sld / d - swl / sw)
        / (-1.0 / (k * k) - (swll * sw - swl * swl) / (sw * sw)),
      0.05) AS k
  FROM w{i}
)"""
        )
    last = f"k{_WB_ITERS}"
    parts.append(
        f"""fw AS (
  SELECT any_value(n) AS n, any_value(d) AS d, any_value(sld) AS sld,
         any_value(k) AS k, sum(pow(t, k)) AS sw
  FROM pos CROSS JOIN {last}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT n, CAST(d AS BIGINT) AS n_events, k AS shape,
  pow(sw / d, 1.0 / k) AS scale,
  d * ln(k) - d * k * ln(pow(sw / d, 1.0 / k)) + (k - 1.0) * sld - d
    AS log_lik
FROM fw
"""
    )


QUERIES["weibull_churn_users"] = weibull_churn_users
ORACLE_SQL["weibull_churn_users"] = _weibull_sql()


def competing_risks_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence of a user's first PURCHASE
    (cause 1) vs first ERROR (cause 2), whichever strikes first after
    the user's first event; users hitting neither are right-censored
    at their last event (operators/survival.py::aalen_johansen).
    Ties (same timestamp) go to cause 1 — a stated deterministic
    rule. The per-cause-KM shortcut would overstate both curves; the
    AJ estimator keeps CIF1 + CIF2 + S = 1 at every event time."""
    from ..operators.survival import aalen_johansen

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("a"),
        F.max("ts").alias("b"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias(
            "te"
        ),
    )
    event = (
        F.when(
            F.col("tp").isNotNull()
            & (F.col("te").isNull() | (F.col("tp") <= F.col("te"))),
            1,
        )
        .when(F.col("te").isNotNull(), 2)
        .otherwise(0)
    )
    tend = (
        F.when(event == 1, F.col("tp"))
        .when(event == 2, F.col("te"))
        .otherwise(F.col("b"))
    )
    lif = per_user.select(
        (
            ((tend - F.col("a")) - (tend - F.col("a")) % _HOUR_NS)
            / _HOUR_NS
        )
        .cast("long")
        .alias("duration"),
        event.alias("event"),
    )
    return aalen_johansen(lif, "duration", "event")


COMPETING_RISKS_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
           AS tp,
         min(CASE WHEN event_type = 'error' THEN epoch_ns(ts) END)
           AS te
  FROM events GROUP BY 1
),
lif AS (
  SELECT
    CAST(((tend - a) - (tend - a) % {_HOUR_NS}) / {_HOUR_NS} AS BIGINT)
      AS t,
    ev
  FROM (
    SELECT a, b, tp, te,
      CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
           WHEN te IS NOT NULL THEN 2 ELSE 0 END AS ev,
      CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN tp
           WHEN te IS NOT NULL THEN te ELSE b END AS tend
    FROM per_user
  )
),
per_t AS (
  SELECT t, count(*) AS all_n,
         CAST(sum(CASE WHEN ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN ev = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
  FROM lif GROUP BY 1
),
risk AS (
  SELECT t, d1, d2,
    CAST(sum(all_n) OVER (ORDER BY t DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS n_risk
  FROM per_t
),
factors AS (
  SELECT t, d1, d2, n_risk,
    1.0 - CAST(d1 + d2 AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM risk
),
lo AS (
  SELECT t, d1, d2, n_risk, f,
    CASE WHEN f > 0 THEN ln(f) ELSE 0.0 END AS lnf
  FROM factors
),
curve AS (
  SELECT t, d1, d2, n_risk,
    CASE WHEN min(f) OVER wp IS NULL THEN 1.0
         WHEN min(f) OVER wp > 0
         THEN exp(sum(lnf) OVER wp) ELSE 0.0 END AS s_minus,
    CASE WHEN min(f) OVER wa > 0
         THEN exp(sum(lnf) OVER wa) ELSE 0.0 END AS surv
  FROM lo
  WINDOW
    wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    wa AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cif AS (
  SELECT t, n_risk, d1, d2, surv,
    sum(s_minus * CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE))
      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cif1,
    sum(s_minus * CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE))
      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cif2
  FROM curve
)
SELECT t, n_risk, d1, d2, cif1, cif2, surv AS survival
FROM cif WHERE d1 + d2 > 0
"""

QUERIES["competing_risks_users"] = competing_risks_users
ORACLE_SQL["competing_risks_users"] = COMPETING_RISKS_SQL
