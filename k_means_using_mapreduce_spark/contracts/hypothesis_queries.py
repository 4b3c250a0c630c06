"""Hypothesis-test contracts (operators/hypothesis.py): two-sample
KS and Mann-Whitney on click-vs-purchase values, chi-squared
lang×source independence, and a hash-armed A/B proportion z-test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table, ns_to_us

AB_THRESHOLD = 30.0

_COUNTS_CTE = """
counts AS (
  SELECT v, CAST(sum(is_a) AS BIGINT) AS ca,
         CAST(sum(1 - is_a) AS BIGINT) AS cb
  FROM (
    SELECT value AS v, 1 AS is_a FROM events
    WHERE event_type = 'click' AND value IS NOT NULL
    UNION ALL
    SELECT value, 0 FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
  ) GROUP BY v
)
"""


def _split(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )


def ks_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are click values and purchase values drawn from the same
    distribution? Exact two-sample KS D over the pooled CDFs."""
    from ..operators.hypothesis import ks_two_sample

    a, b = _split(spark, sf_dir)
    return ks_two_sample(a, b, "value")


KS_SQL = f"""
WITH {_COUNTS_CTE.strip()},
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM counts
),
steps AS (
  SELECT sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b
  FROM counts
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT n_a, n_b, max(abs(cum_a / n_a - cum_b / n_b)) AS ks_d
FROM steps CROSS JOIN tot GROUP BY 1, 2
"""


def mannwhitney_click_vs_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney rank-sum (midrank ties, tie-corrected z) on the
    same two samples — the median-shift view of the KS question."""
    from ..operators.hypothesis import mann_whitney_u

    a, b = _split(spark, sf_dir)
    return mann_whitney_u(a, b, "value")


MW_SQL = f"""
WITH {_COUNTS_CTE.strip()},
ranked AS (
  SELECT ca, cb, ca + cb AS t,
         sum(ca + cb) OVER w - (ca + cb) AS before
  FROM counts
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
mid AS (
  SELECT ca, cb, t, before + (t + 1) / 2.0 AS midrank FROM ranked
),
agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
         sum(ca * midrank) AS r_a,
         sum(CAST(t AS DOUBLE) * t * t - t) AS tie3
  FROM mid
)
SELECT n_a, n_b,
       r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2 AS u_a,
       (r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2
          - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2)
       / sqrt(
           (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1)))
           * (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
               * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
               * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
               - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) / 12
              - tie3 / 12)
         ) AS z
FROM agg
"""


def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence of document language and
    source over the contingency table."""
    from ..operators.hypothesis import chi_squared_independence

    return chi_squared_independence(
        load_table(spark, sf_dir, "documents"), "lang", "source"
    )


CHI2_SQL = """
WITH obs AS (
  SELECT lang, source, count(*) AS o FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2
),
row_t AS (SELECT lang, sum(o) AS ra FROM obs GROUP BY 1),
col_t AS (SELECT source, sum(o) AS cb FROM obs GROUP BY 1),
n_t AS (
  SELECT CAST(sum(o) AS DOUBLE) AS n,
         count(DISTINCT lang) AS r, count(DISTINCT source) AS c
  FROM obs
)
SELECT sum((o - ra * cb / n) * (o - ra * cb / n) / (ra * cb / n)) AS chi2,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       CAST(n AS BIGINT) AS n
FROM obs JOIN row_t USING (lang) JOIN col_t USING (source) CROSS JOIN n_t
GROUP BY dof, n
"""


def ab_value_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-armed experiment readout: users split
    50/50 by md5(user_id), success = event value above 30; two-
    proportion z with per-arm Wilson 95% intervals."""
    from ..operators.hypothesis import ab_proportion_test
    from ..operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").withColumn(
        "arm",
        F.when(hash_bucket("user_id", 2) == 0, F.lit("a")).otherwise(
            F.lit("b")
        ),
    )
    return ab_proportion_test(
        ev,
        "arm",
        F.coalesce(F.col("value") > AB_THRESHOLD, F.lit(False)),
    )


_WILSON = (
    "(p{s} + 1.96 * 1.96 / (2 * n{s}d) {op} 1.96 * sqrt("
    "p{s} * (1 - p{s}) / n{s}d + 1.96 * 1.96 / (4 * n{s}d * n{s}d)))"
    " / (1 + 1.96 * 1.96 / n{s}d)"
)

AB_SQL = f"""
WITH armed AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   ::BIGINT % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
         coalesce(CAST(value AS DOUBLE) > {AB_THRESHOLD}, false) AS s
  FROM events
),
agg AS (
  SELECT CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 'a' THEN CAST(s AS INT) ELSE 0 END) AS BIGINT) AS x_a,
         CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN arm = 'b' THEN CAST(s AS INT) ELSE 0 END) AS BIGINT) AS x_b
  FROM armed
),
rates AS (
  SELECT n_a, x_a, n_b, x_b,
         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
         x_a / CAST(n_a AS DOUBLE) AS pa, x_b / CAST(n_b AS DOUBLE) AS pb,
         (x_a + x_b) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool
  FROM agg
)
SELECT n_a, x_a, pa AS rate_a,
       {_WILSON.format(s='a', op='-')} AS lo_a,
       {_WILSON.format(s='a', op='+')} AS hi_a,
       n_b, x_b, pb AS rate_b,
       {_WILSON.format(s='b', op='-')} AS lo_b,
       {_WILSON.format(s='b', op='+')} AS hi_b,
       (pa - pb) / sqrt(pool * (1 - pool) * (1 / nad + 1 / nbd)) AS z
FROM rates
"""


QUERIES = {
    "ks_click_vs_purchase": ks_click_vs_purchase,
    "mannwhitney_click_vs_purchase": mannwhitney_click_vs_purchase,
    "chi2_lang_source": chi2_lang_source,
    "ab_value_conversion": ab_value_conversion,
}

ORACLE_SQL = {
    "ks_click_vs_purchase": KS_SQL,
    "mannwhitney_click_vs_purchase": MW_SQL,
    "chi2_lang_source": CHI2_SQL,
    "ab_value_conversion": AB_SQL,
}


UCB_C = 2.0


def ucb_event_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 scores treating each event type as a bandit arm with
    success = value above 30 — which arm an allocator plays next."""
    from ..operators.hypothesis import ucb_scores

    return ucb_scores(
        load_table(spark, sf_dir, "events"),
        "event_type",
        F.coalesce(F.col("value") > AB_THRESHOLD, F.lit(False)),
        c=UCB_C,
    )


UCB_SQL = f"""
WITH per_arm AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(coalesce(CAST(value AS DOUBLE) > {AB_THRESHOLD},
                                false) AS INT)) AS BIGINT) AS x
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM per_arm)
SELECT event_type, n, x,
       x / CAST(n AS DOUBLE) AS rate,
       x / CAST(n AS DOUBLE) + sqrt({UCB_C} * ln(total) / n) AS ucb
FROM per_arm CROSS JOIN tot
"""

QUERIES["ucb_event_arms"] = ucb_event_arms
ORACLE_SQL["ucb_event_arms"] = UCB_SQL


BOOT_B = 200
BOOT_SEED = 0
BOOT_ALPHA = 0.05


def bootstrap_purchase_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean purchase value — the
    resampling CI that needs no data movement (weights are seeded
    md5 draws per (row, replicate))."""
    from ..operators.hypothesis import poisson_bootstrap_mean_ci

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    return poisson_bootstrap_mean_ci(
        ev,
        "value",
        "event_id",
        replicates=BOOT_B,
        alpha=BOOT_ALPHA,
        seed=BOOT_SEED,
    )


def _boot_sql() -> str:
    from ..operators.hypothesis import POISSON_MAX_K, _poisson1_cdf

    cum = _poisson1_cdf(POISSON_MAX_K)
    ladder = " ".join(
        f"WHEN u < {cum[k]!r} THEN {k}" for k in range(POISSON_MAX_K)
    )
    return f"""
WITH base AS (
  SELECT event_id AS id, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
),
rep AS (
  SELECT id, v, r FROM base
  CROSS JOIN (SELECT range AS r FROM range({BOOT_B}))
),
drawn AS (
  SELECT r, v,
    CAST((CASE {ladder} ELSE {POISSON_MAX_K} END) AS DOUBLE) AS w
  FROM (
    SELECT r, v,
      ((('0x' || substr(md5('{BOOT_SEED}:' || CAST(r AS VARCHAR) || ':'
                             || CAST(id AS VARCHAR)), 1, 15))::BIGINT
        + 0.5) / {float(1 << 60)}) AS u
    FROM rep
  )
),
means AS (
  SELECT r, sum(w * v) / nullif(sum(w), 0.0) AS m FROM drawn GROUP BY 1
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(v) AS mean FROM base
),
ci AS (
  SELECT quantile_cont(m, {BOOT_ALPHA / 2}) AS lo,
         quantile_cont(m, {1 - BOOT_ALPHA / 2}) AS hi
  FROM means
)
SELECT n, CAST({BOOT_B} AS BIGINT) AS replicates, mean, lo, hi
FROM stats CROSS JOIN ci
"""


BOOTSTRAP_SQL = _boot_sql()

QUERIES["bootstrap_purchase_mean"] = bootstrap_purchase_mean
ORACLE_SQL["bootstrap_purchase_mean"] = BOOTSTRAP_SQL


def did_value_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: md5-armed user cohorts ×
    first/second half of the corpus time range (pure integer midpoint
    test, no division), outcome = event value."""
    from ..operators.hypothesis import diff_in_diff
    from ..operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("ts").alias("_a"), F.max("ts").alias("_b")
    )
    staged = ev.crossJoin(F.broadcast(bounds)).select(
        hash_bucket("user_id", 2).alias("treat"),
        (F.col("ts") * 2 >= F.col("_a") + F.col("_b")).cast("int").alias(
            "post"
        ),
        "value",
    )
    return diff_in_diff(staged, "treat", "post", "value")


DID_SQL = """
WITH bounds AS (
  SELECT min(epoch_ns(ts)) AS a, max(epoch_ns(ts)) AS b FROM events
),
staged AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
           AS treat,
         CASE WHEN epoch_ns(ts) * 2 >= a + b THEN 1 ELSE 0 END AS post,
         CAST(value AS DOUBLE) AS v
  FROM events CROSS JOIN bounds
  WHERE value IS NOT NULL
),
g AS (
  SELECT
    CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_cp,
    sum(CASE WHEN treat = 0 AND post = 0 THEN v ELSE 0.0 END) AS s_cp,
    sum(CASE WHEN treat = 0 AND post = 0 THEN v * v ELSE 0.0 END) AS q_cp,
    CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n_co,
    sum(CASE WHEN treat = 0 AND post = 1 THEN v ELSE 0.0 END) AS s_co,
    sum(CASE WHEN treat = 0 AND post = 1 THEN v * v ELSE 0.0 END) AS q_co,
    CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_tp,
    sum(CASE WHEN treat = 1 AND post = 0 THEN v ELSE 0.0 END) AS s_tp,
    sum(CASE WHEN treat = 1 AND post = 0 THEN v * v ELSE 0.0 END) AS q_tp,
    CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n_to,
    sum(CASE WHEN treat = 1 AND post = 1 THEN v ELSE 0.0 END) AS s_to,
    sum(CASE WHEN treat = 1 AND post = 1 THEN v * v ELSE 0.0 END) AS q_to
  FROM staged
)
SELECT s_cp / n_cp AS ctrl_pre,
       s_co / n_co AS ctrl_post,
       s_tp / n_tp AS treat_pre,
       s_to / n_to AS treat_post,
       (s_to / n_to - s_tp / n_tp) - (s_co / n_co - s_cp / n_cp) AS did,
       sqrt(((q_to - s_to * s_to / n_to) / (n_to - 1)) / n_to
          + ((q_tp - s_tp * s_tp / n_tp) / (n_tp - 1)) / n_tp
          + ((q_co - s_co * s_co / n_co) / (n_co - 1)) / n_co
          + ((q_cp - s_cp * s_cp / n_cp) / (n_cp - 1)) / n_cp) AS se,
       ((s_to / n_to - s_tp / n_tp) - (s_co / n_co - s_cp / n_cp))
         / sqrt(((q_to - s_to * s_to / n_to) / (n_to - 1)) / n_to
              + ((q_tp - s_tp * s_tp / n_tp) / (n_tp - 1)) / n_tp
              + ((q_co - s_co * s_co / n_co) / (n_co - 1)) / n_co
              + ((q_cp - s_cp * s_cp / n_cp) / (n_cp - 1)) / n_cp) AS z
FROM g
"""

QUERIES["did_value_by_cohort"] = did_value_by_cohort
ORACLE_SQL["did_value_by_cohort"] = DID_SQL


def mean_shift_fdr_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) Hoeffding mean-shift screen on document
    length, BH-corrected at q=0.05 — the multiple-comparisons gate a
    per-segment quality monitor needs."""
    from ..operators.hypothesis import fdr_bh, hoeffding_mean_shift_p

    docs = load_table(spark, sf_dir, "documents")
    screened = hoeffding_mean_shift_p(
        docs, "n_chars", by=["source", "lang"]
    )
    return fdr_bh(
        screened, "p_bound", q=0.05, tie_cols=["source", "lang"]
    )


FDR_SQL = """
WITH rows_ AS (
  SELECT source, lang, CAST(n_chars AS DOUBLE) AS v
  FROM documents WHERE n_chars IS NOT NULL
),
gl AS (SELECT avg(v) AS gmean, max(v) - min(v) AS r FROM rows_),
per AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n, avg(v) AS mean_v
  FROM rows_ GROUP BY 1, 2
),
scr AS (
  SELECT source, lang, n, mean_v,
    least(1.0, 2.0 * exp(
      -2.0 * n * (abs(mean_v - gmean) * abs(mean_v - gmean))
        / nullif(r * r, 0.0))) AS p_bound
  FROM per CROSS JOIN gl
),
ranked AS (
  SELECT *,
    row_number() OVER (ORDER BY p_bound, source, lang) AS rank,
    CAST(count(*) OVER () AS DOUBLE) AS m
  FROM scr
),
adj AS (
  SELECT source, lang, n, mean_v, p_bound, rank,
    least(1.0, min(p_bound * m / rank)
      OVER (ORDER BY rank
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS p_adj
  FROM ranked
)
SELECT *, CASE WHEN p_adj <= 0.05 THEN 1 ELSE 0 END AS rejected
FROM adj
"""

QUERIES["mean_shift_fdr_documents"] = mean_shift_fdr_documents
ORACLE_SQL["mean_shift_fdr_documents"] = FDR_SQL


def anova_price_by_returnflag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-way ANOVA: does extendedprice differ across return flags?
    F + eta-squared from per-group sufficient statistics
    (operators/hypothesis.py::anova_oneway)."""
    from ..operators.hypothesis import anova_oneway

    return anova_oneway(
        load_table(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_returnflag",
    )


ANOVA_SQL = """
WITH g AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS ng,
         sum(CAST(l_extendedprice AS DOUBLE)) AS sg,
         sum(CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)) AS qg
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS k_groups,
  CAST(sum(ng) AS BIGINT) AS n,
  CAST(count(*) - 1 AS BIGINT) AS df_between,
  CAST(sum(ng) - count(*) AS BIGINT) AS df_within,
  ((sum(sg * sg / ng) - sum(sg) * sum(sg) / sum(ng))
     / nullif(CAST(count(*) - 1 AS DOUBLE), 0.0))
  / nullif((sum(qg) - sum(sg * sg / ng))
     / nullif(sum(ng) - CAST(count(*) AS DOUBLE), 0.0), 0.0) AS f_stat,
  (sum(sg * sg / ng) - sum(sg) * sum(sg) / sum(ng))
    / nullif(sum(qg) - sum(sg) * sum(sg) / sum(ng), 0.0) AS eta2
FROM g
"""

QUERIES["anova_price_by_returnflag"] = anova_price_by_returnflag
ORACLE_SQL["anova_price_by_returnflag"] = ANOVA_SQL


def user_events_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion of per-user event counts
    (operators/hypothesis.py::dispersion_test)."""
    from ..operators.hypothesis import dispersion_test

    return dispersion_test(load_table(spark, sf_dir, "events"), "user_id")


DISPERSION_SQL = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
  sum(c) / CAST(count(*) AS DOUBLE) AS mean,
  (sum(c * c) - sum(c) * sum(c) / CAST(count(*) AS DOUBLE))
    / nullif(CAST(count(*) AS DOUBLE) - 1.0, 0.0) AS variance,
  ((sum(c * c) - sum(c) * sum(c) / CAST(count(*) AS DOUBLE))
    / nullif(CAST(count(*) AS DOUBLE) - 1.0, 0.0))
    / nullif(sum(c) / CAST(count(*) AS DOUBLE), 0.0) AS dispersion,
  (CAST(count(*) AS DOUBLE) - 1.0)
    * ((sum(c * c) - sum(c) * sum(c) / CAST(count(*) AS DOUBLE))
       / nullif(CAST(count(*) AS DOUBLE) - 1.0, 0.0))
    / nullif(sum(c) / CAST(count(*) AS DOUBLE), 0.0) AS chi2
FROM c
"""

QUERIES["user_events_dispersion"] = user_events_dispersion
ORACLE_SQL["user_events_dispersion"] = DISPERSION_SQL


def interarrival_exponentiality_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Are per-user inter-arrival gaps memoryless? Lilliefors KS vs
    the fitted exponential (operators/hypothesis.py::
    exponentiality_test), the companion of user_events_dispersion."""
    from pyspark.sql.window import Window

    from ..operators.hypothesis import exponentiality_test

    ev = load_table(spark, sf_dir, "events")
    us = ns_to_us(F.col("ts").cast("long"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    gaps = ev.select(
        (us - F.lag(us).over(w)).cast("double").alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return exponentiality_test(gaps, "gap_us")


EXPONENTIALITY_SQL = """
WITH gaps AS (
  SELECT CAST(ts_us - lag(ts_us) OVER w AS DOUBLE) AS g
  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events) t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
blocks AS (
  SELECT g, CAST(count(*) AS DOUBLE) AS c
  FROM gaps WHERE g IS NOT NULL AND g > 0 GROUP BY 1
),
tot AS (
  SELECT sum(c) AS n, sum(g * c) / sum(c) AS m FROM blocks
),
stepped AS (
  SELECT g, n, m,
    sum(c) OVER cum / n AS fhi,
    (sum(c) OVER cum - c) / n AS flo
  FROM blocks CROSS JOIN tot
  WINDOW cum AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
)
SELECT CAST(any_value(n) AS BIGINT) AS n,
  any_value(m) AS mean_gap,
  max(greatest(abs(fhi - (1.0 - exp(-g / m))),
               abs((1.0 - exp(-g / m)) - flo))) AS ks_stat
FROM stepped
"""

QUERIES["interarrival_exponentiality_events"] = (
    interarrival_exponentiality_events
)
ORACLE_SQL["interarrival_exponentiality_events"] = EXPONENTIALITY_SQL


def negbin_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NB2 moment fit of per-user event counts, per event type — the
    overdispersion model selection step after user_events_dispersion
    (operators/hypothesis.py::negbin_fit)."""
    from ..operators.hypothesis import negbin_fit

    return negbin_fit(
        load_table(spark, sf_dir, "events"), "user_id", by=["event_type"]
    )


NEGBIN_SQL = """
WITH c AS (
  SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
s AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(c) AS sc, sum(c * c) AS scc
  FROM c GROUP BY 1
),
m AS (
  SELECT event_type, n, sc / n AS mean,
         (scc - sc * sc / n) / nullif(n - 1.0, 0.0) AS variance
  FROM s
),
r AS (
  SELECT *,
    mean * mean / nullif(CASE WHEN variance > mean
                              THEN variance - mean END, 0.0) AS nb_r
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n_keys, mean, variance,
  coalesce(nb_r, -1.0) AS nb_r,
  coalesce(nb_r / (nb_r + mean), -1.0) AS nb_p
FROM r
"""

QUERIES["negbin_user_activity"] = negbin_user_activity
ORACLE_SQL["negbin_user_activity"] = NEGBIN_SQL


def welch_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t + Cohen's d of click vs purchase event values — the
    parametric companion of ks_click_vs_purchase
    (operators/hypothesis.py::welch_t_test)."""
    from ..operators.hypothesis import welch_t_test

    return welch_t_test(
        load_table(spark, sf_dir, "events"),
        "value",
        "event_type",
        "click",
        "purchase",
    )


WELCH_SQL = """
WITH s AS (
  SELECT
    sum(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END) AS na,
    sum(CASE WHEN event_type = 'click' THEN CAST(value AS DOUBLE)
        ELSE 0.0 END) AS sa,
    sum(CASE WHEN event_type = 'click'
        THEN CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
        ELSE 0.0 END) AS qa,
    sum(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS nb,
    sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE)
        ELSE 0.0 END) AS sb,
    sum(CASE WHEN event_type = 'purchase'
        THEN CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
        ELSE 0.0 END) AS qb
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
m AS (
  SELECT *, sa / nullif(na, 0.0) AS ma, sb / nullif(nb, 0.0) AS mb,
    (qa - sa * sa / na) / nullif(na - 1.0, 0.0) AS va,
    (qb - sb * sb / nb) / nullif(nb - 1.0, 0.0) AS vb
  FROM s
),
f AS (SELECT *, va / na + vb / nb AS se2 FROM m)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  ma AS mean_a, mb AS mean_b, ma - mb AS mean_diff,
  (ma - mb) / nullif(sqrt(se2), 0.0) AS t_stat,
  se2 * se2 / nullif(
    va * va / (na * na * (na - 1.0)) + vb * vb / (nb * nb * (nb - 1.0)),
    0.0) AS df_welch,
  (ma - mb) / sqrt(nullif(
    ((na - 1) * va + (nb - 1) * vb) / nullif(na + nb - 2.0, 0.0),
    0.0)) AS cohens_d
FROM f
"""

QUERIES["welch_click_vs_purchase"] = welch_click_vs_purchase
ORACLE_SQL["welch_click_vs_purchase"] = WELCH_SQL


def purchase_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user-decile purchase rate with Wilson 95% intervals — can
    the cohorts actually be distinguished?
    (operators/hypothesis.py::wilson_proportions)."""
    from ..operators.hypothesis import wilson_proportions

    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket",
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 15
                    ),
                    16,
                    10,
                ).cast("long")
                % 100
            )
            / 10
        ).cast("int"),
    )
    return wilson_proportions(
        ev, F.col("event_type") == "purchase", ["user_bucket"]
    )


WILSON_SQL = """
WITH r AS (
  SELECT CAST(floor((('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                      1, 15))::BIGINT % 100) / 10) AS INTEGER)
           AS user_bucket,
         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
  FROM events
),
g AS (
  SELECT user_bucket, CAST(count(*) AS DOUBLE) AS n, sum(y) AS s
  FROM r GROUP BY 1
),
w AS (
  SELECT *, s / n AS p, 3.8414588206941254 AS z2,
    1.959963984540054 AS z
  FROM g
),
f AS (
  SELECT *,
    (p + z2 / (2.0 * n)) / (1.0 + z2 / n) AS center,
    z * sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / (1.0 + z2 / n)
      AS half
  FROM w
)
SELECT user_bucket, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT)
    AS successes,
  p AS p_hat, center - half AS ci_lo, center + half AS ci_hi
FROM f
"""

QUERIES["purchase_rate_wilson"] = purchase_rate_wilson
ORACLE_SQL["purchase_rate_wilson"] = WILSON_SQL


def pairwise_welch_event_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Post-hoc all-pairs Welch comparison of event values across the
    five event types (operators/hypothesis.py::pairwise_welch)."""
    from ..operators.hypothesis import pairwise_welch

    return pairwise_welch(
        load_table(spark, sf_dir, "events"), "value", "event_type"
    )


PAIRWISE_WELCH_SQL = """
WITH g AS (
  SELECT event_type AS grp, CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(value AS DOUBLE)) AS s,
         sum(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS q
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
pairs AS (
  SELECT a.grp AS group_a, b.grp AS group_b,
         a.n AS na, a.s AS sa, a.q AS qa,
         b.n AS nb, b.s AS sb, b.q AS qb
  FROM g a CROSS JOIN g b WHERE a.grp < b.grp
),
m AS (
  SELECT *, sa / na AS ma, sb / nb AS mb,
    (qa - sa * sa / na) / nullif(na - 1.0, 0.0) AS va,
    (qb - sb * sb / nb) / nullif(nb - 1.0, 0.0) AS vb
  FROM pairs
),
f AS (SELECT *, va / na + vb / nb AS se2 FROM m)
SELECT group_a, group_b, CAST(na AS BIGINT) AS n_a,
  CAST(nb AS BIGINT) AS n_b,
  ma - mb AS mean_diff,
  (ma - mb) / nullif(sqrt(se2), 0.0) AS t_stat,
  se2 * se2 / nullif(
    va * va / (na * na * (na - 1.0)) + vb * vb / (nb * nb * (nb - 1.0)),
    0.0) AS df_welch
FROM f
"""

QUERIES["pairwise_welch_event_values"] = pairwise_welch_event_values
ORACLE_SQL["pairwise_welch_event_values"] = PAIRWISE_WELCH_SQL


_CUPED_SPLIT_US = 15 * 86_400_000_000


def cuped_value_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED A/A on per-user value: late-period spend adjusted by
    early-period spend, hash-bucket 'treatment' (a true null effect —
    the z should hug 0 while the variance visibly shrinks;
    operators/hypothesis.py::cuped_adjusted_test)."""
    from ..operators.hypothesis import cuped_adjusted_test
    from ..operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    us = ns_to_us(F.col("ts").cast("long"))
    lo = ev.agg(F.min(us).alias("lo")).collect()[0]["lo"]
    cut = lo + _CUPED_SPLIT_US
    per = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(us >= cut, F.col("value").cast("double"))),
            F.lit(0.0),
        ).alias("y"),
        F.coalesce(
            F.sum(F.when(us < cut, F.col("value").cast("double"))),
            F.lit(0.0),
        ).alias("x"),
    )
    per = per.withColumn(
        "treated", hash_bucket("user_id", 100) < F.lit(50)
    )
    return cuped_adjusted_test(per, "y", "x", F.col("treated"))


CUPED_SQL = f"""
WITH mn AS (SELECT min(epoch_us(ts)) AS lo FROM events),
per AS MATERIALIZED (
  SELECT user_id,
    coalesce(sum(CASE WHEN epoch_us(ts) >= lo + {_CUPED_SPLIT_US}
                 THEN CAST(value AS DOUBLE) END), 0.0) AS y,
    coalesce(sum(CASE WHEN epoch_us(ts) < lo + {_CUPED_SPLIT_US}
                 THEN CAST(value AS DOUBLE) END), 0.0) AS x,
    ('0x' || substr(md5(CAST(any_value(user_id) AS VARCHAR)), 1, 15))
      ::BIGINT % 100 < 50 AS treated
  FROM events CROSS JOIN mn
  WHERE user_id IS NOT NULL
  GROUP BY user_id
),
s0 AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM per
),
th AS MATERIALIZED (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
         sx / n AS xbar
  FROM s0
),
sides AS MATERIALIZED (
  SELECT any_value(theta) AS theta,
    sum(CASE WHEN treated THEN 1.0 ELSE 0.0 END) AS nt,
    sum(CASE WHEN treated THEN y ELSE 0.0 END) AS st,
    sum(CASE WHEN treated THEN y * y ELSE 0.0 END) AS qt,
    sum(CASE WHEN NOT treated THEN 1.0 ELSE 0.0 END) AS nc,
    sum(CASE WHEN NOT treated THEN y ELSE 0.0 END) AS sc,
    sum(CASE WHEN NOT treated THEN y * y ELSE 0.0 END) AS qc,
    sum(CASE WHEN treated THEN y - theta * (x - xbar)
        ELSE 0.0 END) AS sta,
    sum(CASE WHEN treated
        THEN (y - theta * (x - xbar)) * (y - theta * (x - xbar))
        ELSE 0.0 END) AS qta,
    sum(CASE WHEN NOT treated THEN y - theta * (x - xbar)
        ELSE 0.0 END) AS sca,
    sum(CASE WHEN NOT treated
        THEN (y - theta * (x - xbar)) * (y - theta * (x - xbar))
        ELSE 0.0 END) AS qca
  FROM per CROSS JOIN th
),
calc AS (
  SELECT *,
    st / nt - sc / nc AS effect_raw,
    (qt - st * st / nt) / (nt - 1.0) / nt
      + (qc - sc * sc / nc) / (nc - 1.0) / nc AS se2_raw,
    sta / nt - sca / nc AS effect_cuped,
    (qta - sta * sta / nt) / (nt - 1.0) / nt
      + (qca - sca * sca / nc) / (nc - 1.0) / nc AS se2_adj
  FROM sides
)
SELECT CAST(nt AS BIGINT) AS n_t, CAST(nc AS BIGINT) AS n_c, theta,
  effect_raw, effect_raw / sqrt(se2_raw) AS z_raw,
  effect_cuped, effect_cuped / sqrt(se2_adj) AS z_cuped,
  1.0 - se2_adj / se2_raw AS var_reduction
FROM calc
"""

QUERIES["cuped_value_experiment"] = cuped_value_experiment
ORACLE_SQL["cuped_value_experiment"] = CUPED_SQL


def moods_median_value_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mood's median test of event values across event types
    (operators/hypothesis.py::moods_median_test)."""
    from ..operators.hypothesis import moods_median_test

    return moods_median_test(
        load_table(spark, sf_dir, "events"), "value", "event_type"
    )


MOODS_SQL = """
WITH r AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
med AS (SELECT quantile_cont(v, 0.5) AS m FROM r),
per AS (
  SELECT g, CAST(count(*) AS DOUBLE) AS ng,
    sum(CASE WHEN v > (SELECT m FROM med) THEN 1.0 ELSE 0.0 END) AS ag
  FROM r GROUP BY 1
),
tot AS (SELECT sum(ng) AS n, sum(ag) AS a FROM per)
SELECT CAST(count(*) AS BIGINT) AS k_groups,
  CAST(any_value(n) AS BIGINT) AS n,
  CAST(any_value(a) AS BIGINT) AS n_above,
  sum(
    (ag - ng * (a / n)) * (ag - ng * (a / n))
      / nullif(ng * (a / n), 0.0)
    + ((ng - ag) - ng * ((n - a) / n)) * ((ng - ag) - ng * ((n - a) / n))
      / nullif(ng * ((n - a) / n), 0.0)
  ) AS chi2,
  CAST(count(*) - 1 AS BIGINT) AS df
FROM per CROSS JOIN tot
"""

QUERIES["moods_median_value_by_type"] = moods_median_value_by_type
ORACLE_SQL["moods_median_value_by_type"] = MOODS_SQL


def levene_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity check: ANOVA on absolute
    deviations from each flag's median price — composition of
    group_median + anova_oneway (the robust Levene variant)."""
    from ..operators.hypothesis import anova_oneway
    from ..operators.robust import group_median

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_returnflag").isNotNull()
        )
        .select("l_returnflag", "l_extendedprice")
        # 3 passes by construction (median sketch, refine, ANOVA):
        # materialize the projected input once (round-7 sweep)
        .localCheckpoint(eager=True)
    )
    med = group_median(li, "l_extendedprice", ["l_returnflag"])
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "abs_dev",
        F.abs(F.col("l_extendedprice").cast("double") - F.col("median")),
    )
    return anova_oneway(dev, "abs_dev", "l_returnflag")


LEVENE_SQL = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)
    AS m
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
  GROUP BY 1
),
dev AS (
  SELECT l.l_returnflag,
         abs(CAST(l_extendedprice AS DOUBLE) - m.m) AS v
  FROM lineitem l JOIN med m USING (l_returnflag)
  WHERE l_extendedprice IS NOT NULL AND l.l_returnflag IS NOT NULL
),
g AS (
  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS ng,
         sum(v) AS sg, sum(v * v) AS qg
  FROM dev GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS k_groups,
  CAST(sum(ng) AS BIGINT) AS n,
  CAST(count(*) - 1 AS BIGINT) AS df_between,
  CAST(sum(ng) - count(*) AS BIGINT) AS df_within,
  ((sum(sg * sg / ng) - sum(sg) * sum(sg) / sum(ng))
     / nullif(CAST(count(*) - 1 AS DOUBLE), 0.0))
  / nullif((sum(qg) - sum(sg * sg / ng))
     / nullif(sum(ng) - CAST(count(*) AS DOUBLE), 0.0), 0.0) AS f_stat,
  (sum(sg * sg / ng) - sum(sg) * sum(sg) / sum(ng))
    / nullif(sum(qg) - sum(sg) * sum(sg) / sum(ng), 0.0) AS eta2
FROM g
"""

QUERIES["levene_price_by_flag"] = levene_price_by_flag
ORACLE_SQL["levene_price_by_flag"] = LEVENE_SQL


def kruskal_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test of event values across event types
    (operators/hypothesis.py::kruskal_wallis)."""
    from ..operators.hypothesis import kruskal_wallis

    return kruskal_wallis(
        load_table(spark, sf_dir, "events"), "value", "event_type"
    )


KRUSKAL_SQL = """
WITH cells AS (
  SELECT CAST(value AS DOUBLE) AS v, event_type AS g,
         CAST(count(*) AS DOUBLE) AS c
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
vals AS (SELECT v, sum(c) AS t FROM cells GROUP BY 1),
ranked AS (
  SELECT v, t,
    sum(t) OVER w - t + (t + 1.0) / 2.0 AS mid
  FROM vals
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
per_g AS (
  SELECT g, sum(c) AS ng, sum(c * mid) AS rg
  FROM cells JOIN ranked USING (v) GROUP BY 1
),
ties AS (SELECT sum(t) AS n, sum(t * t * t - t) AS ts FROM vals),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_groups, any_value(n) AS n,
    sum(rg * rg / ng) AS r2, any_value(ts) AS ts
  FROM per_g CROSS JOIN ties
)
SELECT k_groups, CAST(n AS BIGINT) AS n,
  (12.0 / (n * (n + 1.0)) * r2 - 3.0 * (n + 1.0))
    / nullif(1.0 - ts / nullif(n * n * n - n, 0.0), 0.0) AS h_stat,
  CAST(k_groups - 1 AS BIGINT) AS df,
  1.0 - ts / nullif(n * n * n - n, 0.0) AS tie_correction
FROM agg
"""

QUERIES["kruskal_value_by_type"] = kruskal_value_by_type
ORACLE_SQL["kruskal_value_by_type"] = KRUSKAL_SQL


def friedman_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman repeated-measures test: within each user, do the five
    event types rank consistently by mean value?
    (operators/hypothesis.py::friedman_test)."""
    from ..operators.hypothesis import friedman_test

    return friedman_test(
        load_table(spark, sf_dir, "events"), "user_id", "event_type", "value"
    )


FRIEDMAN_SQL = """
WITH cells AS (
  SELECT user_id AS b, event_type AS t, avg(CAST(value AS DOUBLE)) AS v
  FROM events
  WHERE value IS NOT NULL AND user_id IS NOT NULL
    AND ts IS NOT NULL
    AND event_type IS NOT NULL
  GROUP BY 1, 2
),
kk AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS k FROM cells),
complete AS (
  SELECT b FROM cells GROUP BY 1
  HAVING count(*) = (SELECT k FROM kk)
),
ranked AS (
  SELECT c.b, c.t,
    CAST(rank() OVER (PARTITION BY c.b ORDER BY c.v) AS DOUBLE)
      + (CAST(count(*) OVER (PARTITION BY c.b, c.v) AS DOUBLE) - 1.0)
        / 2.0 AS r
  FROM cells c JOIN complete USING (b)
),
per_t AS (SELECT t, sum(r) AS rj FROM ranked GROUP BY 1),
nb AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n FROM ranked),
ties AS (
  SELECT coalesce(sum(tsz * tsz * tsz - tsz), 0.0) AS tt
  FROM (
    SELECT CAST(count(*) AS DOUBLE) AS tsz
    FROM cells c JOIN complete USING (b)
    GROUP BY c.b, c.v
  )
)
SELECT CAST(n AS BIGINT) AS n_blocks,
  CAST(k AS BIGINT) AS k_treatments,
  (12.0 / (n * k * (k + 1.0)) * sum(rj * rj) - 3.0 * n * (k + 1.0))
    / nullif(1.0 - tt / (n * k * (k * k - 1.0)), 0.0) AS chi2_f,
  CAST(k - 1 AS BIGINT) AS df
FROM per_t CROSS JOIN nb CROSS JOIN kk CROSS JOIN ties
GROUP BY n, k, tt
"""

QUERIES["friedman_value_by_type"] = friedman_value_by_type
ORACLE_SQL["friedman_value_by_type"] = FRIEDMAN_SQL


def ab_power_value_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power planning for the hash-armed value experiment
    (operators/hypothesis.py::ab_power_mde): observed-size MDE at
    alpha=.05/power=.80 and the per-arm n a 5% relative lift needs."""
    from ..operators.hypothesis import ab_power_mde
    from ..operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").withColumn(
        "arm",
        F.when(hash_bucket("user_id", 2) == 0, F.lit("a")).otherwise(
            F.lit("b")
        ),
    )
    return ab_power_mde(ev, "arm", "value")


def _ab_power_sql() -> str:
    from ..operators.hypothesis import Z_ALPHA_05, Z_BETA_80

    zsum = repr(Z_ALPHA_05 + Z_BETA_80)
    arm = (
        "CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))"
        "::BIGINT % 2 = 0 THEN 'a' ELSE 'b' END"
    )
    return f"""
WITH b AS (
  SELECT {arm} AS arm, CAST(value AS DOUBLE) AS y
  FROM events WHERE value IS NOT NULL
), s AS (
  SELECT
    sum(CASE WHEN arm = 'a' THEN 1.0 ELSE 0.0 END) AS na,
    sum(CASE WHEN arm = 'a' THEN y ELSE 0.0 END) AS sa,
    sum(CASE WHEN arm = 'a' THEN y * y ELSE 0.0 END) AS qa,
    sum(CASE WHEN arm = 'b' THEN 1.0 ELSE 0.0 END) AS nb,
    sum(CASE WHEN arm = 'b' THEN y ELSE 0.0 END) AS sb,
    sum(CASE WHEN arm = 'b' THEN y * y ELSE 0.0 END) AS qb
  FROM b
), t AS (
  SELECT na, nb, sa, sb,
    sa / nullif(na, 0.0) AS ma, sb / nullif(nb, 0.0) AS mb,
    (qa - sa * sa / nullif(na, 0.0)) / nullif(na - 1.0, 0.0) AS va,
    (qb - sb * sb / nullif(nb, 0.0)) / nullif(nb - 1.0, 0.0) AS vb,
    (sa + sb) / nullif(na + nb, 0.0) AS pm,
    na >= 2.0 AND nb >= 2.0 AS ok
  FROM s
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  ma AS mean_a, mb AS mean_b,
  CASE WHEN ok THEN va END AS var_a,
  CASE WHEN ok THEN vb END AS var_b,
  CASE WHEN ok THEN {zsum} * sqrt(va / na + vb / nb) END AS mde_abs,
  CASE WHEN ok THEN {zsum} * sqrt(va / na + vb / nb) END
    / nullif(pm, 0.0) AS mde_rel,
  CAST(ceil(CASE WHEN ok AND 0.05 * pm != 0.0 THEN
    2.0 * {zsum} * {zsum}
      * (((na - 1.0) * va + (nb - 1.0) * vb) / nullif(na + nb - 2.0, 0.0))
      / ((0.05 * pm) * (0.05 * pm)) END) AS BIGINT) AS n_per_arm_target
FROM t
"""


QUERIES["ab_power_value_experiment"] = ab_power_value_experiment
ORACLE_SQL["ab_power_value_experiment"] = _ab_power_sql()


_GS_LOOKS = 5


def group_sequential_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential replay of the hash-armed value experiment at 5
    equally spaced event-time looks
    (operators/hypothesis.py::group_sequential): per-look unpooled z
    against both the Pocock and O'Brien-Fleming K=5 boundaries. The
    split is null-true (md5 arms), so the boundary machinery is
    value-checked without a planted effect; the oracle replays the
    identical conditional-sum and z arithmetic."""
    from ..operators.hypothesis import group_sequential
    from ..operators.sampling import hash_bucket

    # NULL user_id must not silently land in arm 'b' (hash_bucket(NULL)
    # is NULL and otherwise() would claim it), and NULL ts would rank
    # NULLS-FIRST here vs NULLS-LAST in DuckDB — filter both up front,
    # mirrored in the oracle's WHERE
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withColumn(
            "arm",
            F.when(hash_bucket("user_id", 2) == 0, F.lit("a")).otherwise(
                F.lit("b")
            ),
        )
    )
    return group_sequential(
        ev, arm_col="arm", value_col="value", looks=_GS_LOOKS
    )


def _group_sequential_sql() -> str:
    from ..operators.hypothesis import OBF_C_K5, POCOCK_C_K5

    looks = _GS_LOOKS
    sums = []
    for k in range(1, looks + 1):
        for tag, armv in (("a", 0), ("b", 1)):
            w = (
                f"CASE WHEN rn <= cut{k} AND arm = {armv} "
                f"THEN 1.0 ELSE 0.0 END"
            )
            sums.append(
                f"sum({w}) AS n{tag}{k},\n"
                f"    sum({w} * v) AS s{tag}{k},\n"
                f"    sum({w} * v * v) AS q{tag}{k}"
            )
    cuts = ",\n  ".join(
        f"(total * {k}) // {looks} AS cut{k}" for k in range(1, looks + 1)
    )
    rows = []
    for k in range(1, looks + 1):
        na, sa, qa = f"na{k}", f"sa{k}", f"qa{k}"
        nb, sb, qb = f"nb{k}", f"sb{k}", f"qb{k}"
        ma, mb = f"({sa} / {na})", f"({sb} / {nb})"
        va = f"(({qa} - {sa} * {sa} / {na}) / ({na} - 1.0))"
        vb = f"(({qb} - {sb} * {sb} / {nb}) / ({nb} - 1.0))"
        se2 = f"({va} / {na} + {vb} / {nb})"
        z = (
            f"CASE WHEN {na} > 1 AND {nb} > 1 AND {se2} > 0.0 "
            f"THEN ({ma} - {mb}) / sqrt({se2}) END"
        )
        b_o = f"{OBF_C_K5!r} * sqrt({float(looks)!r} / {float(k)!r})"
        rows.append(
            f"SELECT {k} AS look, cut{k} AS n,"
            f" CAST({na} AS BIGINT) AS n_a, CAST({nb} AS BIGINT) AS n_b,"
            f" {ma} AS mean_a, {mb} AS mean_b, {z} AS z,"
            f" {POCOCK_C_K5!r} AS boundary_pocock,"
            f" {b_o} AS boundary_obf,"
            # coalesce: an undefined z (zero variance / degenerate
            # look) must read FALSE like the engine's bool(z is not
            # None and ...), not NULL (ADVICE r6)
            f" coalesce(abs({z}) > {POCOCK_C_K5!r}, FALSE) AS cross_pocock,"
            f" coalesce(abs({z}) > {b_o}, FALSE) AS cross_obf"
            f" FROM agg CROSS JOIN cuts"
        )
    sums_block = ",\n    ".join(sums)
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH base AS MATERIALIZED (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % 2 AS arm,
         CAST(value AS DOUBLE) AS v,
         row_number() OVER (ORDER BY epoch_ns(ts), event_id) AS rn
  FROM events
  WHERE value IS NOT NULL AND user_id IS NOT NULL
    AND ts IS NOT NULL
),
tot AS (SELECT count(*) AS total FROM base),
cuts AS (SELECT {cuts} FROM tot),
agg AS MATERIALIZED (
  SELECT
    {sums_block}
  FROM base CROSS JOIN cuts
)
{union}
"""


QUERIES["group_sequential_events"] = group_sequential_events
ORACLE_SQL["group_sequential_events"] = _group_sequential_sql()


_JK_BUCKETS = 10


def jackknife_price_per_unit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife SE for the price-per-unit ratio
    Σ(l_extendedprice)/Σ(l_quantity)
    (operators/hypothesis.py::jackknife_ratio, 10 md5 groups keyed by
    line identity): the ratio-correct uncertainty the per-row variance
    formula gets wrong; the oracle replays the identical group sums
    and replicate arithmetic."""
    from ..operators.hypothesis import jackknife_ratio

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_lid", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    return jackknife_ratio(
        li,
        "l_extendedprice",
        "l_quantity",
        buckets=_JK_BUCKETS,
        key_col="_lid",
    )


JACKKNIFE_SQL = f"""
WITH jb AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS num,
         CAST(l_quantity AS DOUBLE) AS den,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
             || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
           % {_JK_BUCKETS} AS g
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
per AS MATERIALIZED (
  SELECT g, count(*) AS n, sum(num) AS sn, sum(den) AS sd
  FROM jb GROUP BY 1
),
tot AS (
  SELECT sum(n) AS tot_n, sum(sn) AS tn, sum(sd) AS td,
         count(*) AS gn
  FROM per
),
reps AS (
  SELECT (t.tn - p.sn) / (t.td - p.sd) AS r, t.tn, t.td, t.tot_n, t.gn
  FROM per p CROSS JOIN tot t
  WHERE (t.td - p.sd) <> 0.0
),
rb AS (
  SELECT any_value(tot_n) AS tot_n, CAST(count(*) AS BIGINT) AS gn,
         any_value(tn) / any_value(td) AS ratio,
         sum(r) / CAST(count(*) AS DOUBLE) AS rbar
  FROM reps
),
-- centered second pass: the replicate ratios differ only in their
-- deleted 10%, so the uncentered srr - sr^2/g form would cancel
-- catastrophically; Python centers, the oracle must too
dev AS (
  SELECT rb.tot_n, rb.gn, rb.ratio, rb.rbar,
         sum((reps.r - rb.rbar) * (reps.r - rb.rbar)) AS ssq
  FROM reps CROSS JOIN rb
  GROUP BY rb.tot_n, rb.gn, rb.ratio, rb.rbar
)
SELECT CAST(tot_n AS BIGINT) AS n, gn AS buckets, ratio,
  sqrt((CAST(gn AS DOUBLE) - 1.0) / CAST(gn AS DOUBLE) * ssq)
    AS se_jack,
  (CAST(gn AS DOUBLE) - 1.0) * (rbar - ratio) AS bias_jack
FROM dev
"""

QUERIES["jackknife_price_per_unit"] = jackknife_price_per_unit
ORACLE_SQL["jackknife_price_per_unit"] = JACKKNIFE_SQL
