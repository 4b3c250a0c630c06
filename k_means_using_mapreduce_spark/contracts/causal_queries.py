"""Causal contracts (operators/causal.py): effect of a deep discount
(≥5%) on ordered quantity, deconfounded by (returnflag, ship-month)
strata — naive vs Hájek-IPW vs direct standardization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table


def discount_quantity_ipw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.causal import ipw_ate

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.month("l_shipdate")
    )
    return ipw_ate(
        li,
        F.col("l_discount") >= 0.05,
        "l_quantity",
        strata=["l_returnflag", "ship_month"],
        trim=(0.02, 0.98),
    )


IPW_SQL = """
WITH rows_ AS (
  SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t,
         CAST(l_quantity AS DOUBLE) AS y,
         l_returnflag AS s1, month(l_shipdate) AS s2
  FROM lineitem WHERE l_quantity IS NOT NULL
),
per AS (
  SELECT s1, s2, count(*) AS n, CAST(sum(t) AS BIGINT) AS n1,
         sum(CASE WHEN t = 1 THEN y END) AS sy1,
         sum(CASE WHEN t = 0 THEN y END) AS sy0
  FROM rows_ GROUP BY 1, 2
),
w AS (
  SELECT n, n1,
    least(0.98, greatest(0.02, CAST(n1 AS DOUBLE) / n)) AS p,
    CAST(n AS DOUBLE) AS nd, CAST(n1 AS DOUBLE) AS n1d,
    coalesce(sy1, 0.0) AS y1, coalesce(sy0, 0.0) AS y0,
    (n1 > 0 AND n1 < n) AS bth, sy1, sy0
  FROM per
)
SELECT CAST(sum(n) AS BIGINT) AS n,
  CAST(sum(n1) AS BIGINT) AS n_treated,
  sum(y1) / nullif(sum(n1d), 0.0)
    - sum(y0) / nullif(sum(nd - n1d), 0.0) AS naive_diff,
  sum(y1 / p) / nullif(sum(n1d / p), 0.0)
    - sum(y0 / (1.0 - p)) / nullif(sum((nd - n1d) / (1.0 - p)), 0.0)
    AS ate_ipw,
  sum(CASE WHEN bth
        THEN nd * (sy1 / n1d - sy0 / (nd - n1d)) END)
    / nullif(sum(CASE WHEN bth THEN nd END), 0.0) AS ate_strat,
  CAST(sum(CASE WHEN bth THEN 1 ELSE 0 END) AS BIGINT)
    AS n_strata_used
FROM w
"""

QUERIES = {"discount_quantity_ipw": discount_quantity_ipw}
ORACLE_SQL = {"discount_quantity_ipw": IPW_SQL}


def cmh_discount_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMH stratified association: deep discount vs returned flag,
    conditioning on ship month (operators/causal.py::cmh_test)."""
    from ..operators.causal import cmh_test

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.month("l_shipdate")
    )
    return cmh_test(
        li,
        F.col("l_discount") >= 0.05,
        F.col("l_returnflag") == "R",
        strata=["ship_month"],
    )


CMH_SQL = """
WITH rows_ AS (
  SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS t,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         month(l_shipdate) AS s
  FROM lineitem
),
per AS (
  SELECT s,
    CAST(sum(t * y) AS DOUBLE) AS a,
    CAST(sum(t * (1 - y)) AS DOUBLE) AS b,
    CAST(sum((1 - t) * y) AS DOUBLE) AS c,
    CAST(sum((1 - t) * (1 - y)) AS DOUBLE) AS d
  FROM rows_ GROUP BY 1
),
terms AS (
  SELECT a + b + c + d AS n, a,
    (a + b) * (a + c) / (a + b + c + d) AS e_a,
    coalesce(
      (a + b) * (c + d) * (a + c) * (b + d)
        / ((a + b + c + d) * (a + b + c + d)
           * nullif(a + b + c + d - 1, 0.0)),
      0.0) AS var_a,
    a * d / (a + b + c + d) AS ad_n,
    b * c / (a + b + c + d) AS bc_n
  FROM per
)
SELECT CAST(sum(n) AS BIGINT) AS n,
  CAST(count(*) AS BIGINT) AS n_strata,
  sum(ad_n) / nullif(sum(bc_n), 0.0) AS or_mh,
  sum(a - e_a) * sum(a - e_a) / nullif(sum(var_a), 0.0) AS chi2
FROM terms
"""

QUERIES["cmh_discount_returns"] = cmh_discount_returns
ORACLE_SQL["cmh_discount_returns"] = CMH_SQL


def quantity_price_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Placebo sharp RDD: is there a price jump at quantity 25? (No
    true threshold exists in the generator, so the honest expectation
    is an effect near zero — the operator's parity vehicle;
    operators/causal.py::regression_discontinuity.)"""
    from ..operators.causal import regression_discontinuity

    return regression_discontinuity(
        load_table(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        cutoff=25.0,
        bandwidth=15.0,
    )


RDD_SQL = """
WITH r AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND CAST(l_quantity AS DOUBLE) >= 10.0
    AND CAST(l_quantity AS DOUBLE) <= 40.0
),
s AS (
  SELECT
    sum(CASE WHEN x < 25.0 THEN 1.0 ELSE 0.0 END) AS ln,
    sum(CASE WHEN x < 25.0 THEN x ELSE 0.0 END) AS lsx,
    sum(CASE WHEN x < 25.0 THEN y ELSE 0.0 END) AS lsy,
    sum(CASE WHEN x < 25.0 THEN x * y ELSE 0.0 END) AS lsxy,
    sum(CASE WHEN x < 25.0 THEN x * x ELSE 0.0 END) AS lsxx,
    sum(CASE WHEN NOT (x < 25.0) THEN 1.0 ELSE 0.0 END) AS rn,
    sum(CASE WHEN NOT (x < 25.0) THEN x ELSE 0.0 END) AS rsx,
    sum(CASE WHEN NOT (x < 25.0) THEN y ELSE 0.0 END) AS rsy,
    sum(CASE WHEN NOT (x < 25.0) THEN x * y ELSE 0.0 END) AS rsxy,
    sum(CASE WHEN NOT (x < 25.0) THEN x * x ELSE 0.0 END) AS rsxx
  FROM r
),
f AS (
  SELECT *,
    (ln * lsxy - lsx * lsy) / nullif(ln * lsxx - lsx * lsx, 0.0)
      AS slope_left,
    (rn * rsxy - rsx * rsy) / nullif(rn * rsxx - rsx * rsx, 0.0)
      AS slope_right
  FROM s
),
g AS (
  SELECT *,
    (lsy - slope_left * lsx) / nullif(ln, 0.0)
      + slope_left * 25.0 AS y_left_at_cutoff,
    (rsy - slope_right * rsx) / nullif(rn, 0.0)
      + slope_right * 25.0 AS y_right_at_cutoff
  FROM f
)
SELECT CAST(ln AS BIGINT) AS n_left, CAST(rn AS BIGINT) AS n_right,
  y_left_at_cutoff, y_right_at_cutoff,
  y_right_at_cutoff - y_left_at_cutoff AS rd_effect,
  slope_left, slope_right
FROM g
"""

QUERIES["quantity_price_rdd"] = quantity_price_rdd
ORACLE_SQL["quantity_price_rdd"] = RDD_SQL


def discount_effect_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IV/Wald estimate of quantity's effect on extended price using
    supplier-key parity as the (synthetic) instrument
    (operators/causal.py::iv_wald_2sls): one scan, closed-form 2SLS
    with weak-instrument diagnostics alongside the OLS contrast."""
    from ..operators.causal import iv_wald_2sls

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "z", (F.col("l_suppkey") % 2).cast("double")
    )
    return iv_wald_2sls(li, "l_extendedprice", "l_quantity", "z")


IV_WALD_SQL = """
WITH b AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS y,
         CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_suppkey % 2 AS DOUBLE) AS z
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(y) AS sy, sum(x) AS sx, sum(z) AS sz,
         sum(z * y) AS szy, sum(z * x) AS szx, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(z * z) AS szz, sum(y * y) AS syy
  FROM b
)
SELECT CAST(n AS BIGINT) AS n,
  (n * szy - sz * sy) / nullif(n * szx - sz * sx, 0.0) AS beta_iv,
  (sy - (n * szy - sz * sy) / nullif(n * szx - sz * sx, 0.0) * sx)
    / nullif(n, 0.0) AS alpha,
  (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS beta_ols,
  (n * szx - sz * sx)
    / nullif(sqrt((n * szz - sz * sz) * (n * sxx - sx * sx)), 0.0)
    AS first_stage_corr,
  (n * szy - sz * sy)
    / nullif(sqrt((n * szz - sz * sz) * (n * syy - sy * sy)), 0.0)
    AS reduced_form_corr
FROM s
"""

QUERIES["discount_effect_iv"] = discount_effect_iv
ORACLE_SQL["discount_effect_iv"] = IV_WALD_SQL


_BAL_COVS = ["value", "user_id"]


def experiment_balance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMD balance table of the hash-armed events experiment
    (operators/causal.py::covariate_balance) — a hash split SHOULD be
    balanced on every pre-treatment covariate; this is the check."""
    from ..operators.causal import covariate_balance
    from ..operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").withColumn(
        "arm",
        F.when(hash_bucket("user_id", 2) == 0, F.lit("a")).otherwise(
            F.lit("b")
        ),
    )
    return covariate_balance(ev, "arm", _BAL_COVS)


def _balance_sql() -> str:
    arm = (
        "CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))"
        "::BIGINT % 2 = 0 THEN 'a' ELSE 'b' END"
    )
    parts = []
    for c in _BAL_COVS:
        parts.append(f"""SELECT '{c}' AS covariate,
  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  sa / nullif(na, 0.0) AS mean_a, sb / nullif(nb, 0.0) AS mean_b,
  CASE WHEN na >= 2.0 AND nb >= 2.0 THEN
    (sa / nullif(na, 0.0) - sb / nullif(nb, 0.0))
      / nullif(sqrt((
          (qa - sa * sa / nullif(na, 0.0)) / nullif(na - 1.0, 0.0)
        + (qb - sb * sb / nullif(nb, 0.0)) / nullif(nb - 1.0, 0.0)
        ) / 2.0), 0.0)
  END AS smd,
  CASE WHEN (CASE WHEN na >= 2.0 AND nb >= 2.0 THEN
    (sa / nullif(na, 0.0) - sb / nullif(nb, 0.0))
      / nullif(sqrt((
          (qa - sa * sa / nullif(na, 0.0)) / nullif(na - 1.0, 0.0)
        + (qb - sb * sb / nullif(nb, 0.0)) / nullif(nb - 1.0, 0.0)
        ) / 2.0), 0.0)
  END) IS NOT NULL THEN abs(CASE WHEN na >= 2.0 AND nb >= 2.0 THEN
    (sa / nullif(na, 0.0) - sb / nullif(nb, 0.0))
      / nullif(sqrt((
          (qa - sa * sa / nullif(na, 0.0)) / nullif(na - 1.0, 0.0)
        + (qb - sb * sb / nullif(nb, 0.0)) / nullif(nb - 1.0, 0.0)
        ) / 2.0), 0.0)
  END) < 0.1 END AS balanced
FROM (
  SELECT
    sum(CASE WHEN arm = 'a' AND y IS NOT NULL THEN 1.0 ELSE 0.0 END) AS na,
    sum(CASE WHEN arm = 'a' AND y IS NOT NULL THEN y ELSE 0.0 END) AS sa,
    sum(CASE WHEN arm = 'a' AND y IS NOT NULL THEN y * y ELSE 0.0 END) AS qa,
    sum(CASE WHEN arm = 'b' AND y IS NOT NULL THEN 1.0 ELSE 0.0 END) AS nb,
    sum(CASE WHEN arm = 'b' AND y IS NOT NULL THEN y ELSE 0.0 END) AS sb,
    sum(CASE WHEN arm = 'b' AND y IS NOT NULL THEN y * y ELSE 0.0 END) AS qb
  FROM (SELECT {arm} AS arm, CAST({c} AS DOUBLE) AS y FROM events)
)""")
    return "\nUNION ALL\n".join(parts)


QUERIES["experiment_balance_events"] = experiment_balance_events
ORACLE_SQL["experiment_balance_events"] = _balance_sql()


def stratified_ate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quintile-stratified A/A readout on events
    (operators/causal.py::stratified_ate): hash-armed treatment, value
    outcome, user_id as the stratification score — per-stratum diffs
    plus the pooled estimate (stratum = -1)."""
    from ..operators.causal import stratified_ate
    from ..operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").withColumn(
        "arm", hash_bucket("event_id", 2)
    )
    return stratified_ate(
        ev, F.col("arm") == 0, "value", "user_id", strata=5
    )


def _stratified_ate_sql() -> str:
    cuts = ", ".join(
        f"quantile_cont(s, {i / 5}) AS c{i - 1}" for i in range(1, 5)
    )
    stratum = " + ".join(
        f"CASE WHEN s > c{i} THEN 1 ELSE 0 END" for i in range(4)
    )
    arm = (
        "CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))"
        "::BIGINT % 2 = 0 THEN 1 ELSE 0 END"
    )
    return f"""
WITH b AS (
  SELECT CAST(value AS DOUBLE) AS y, CAST(user_id AS DOUBLE) AS s,
         {arm} AS t
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
), cuts AS (SELECT {cuts} FROM b),
assigned AS (
  SELECT y, t, ({stratum}) AS stratum FROM b CROSS JOIN cuts
), per AS (
  SELECT stratum, CAST(count(*) AS DOUBLE) AS n,
    sum(CASE WHEN t = 1 THEN 1.0 ELSE 0.0 END) AS nt,
    sum(CASE WHEN t = 1 THEN y ELSE 0.0 END) AS st,
    sum(CASE WHEN t = 0 THEN y ELSE 0.0 END) AS sc_
  FROM assigned GROUP BY 1
), strat AS (
  SELECT CAST(stratum AS INTEGER) AS stratum,
    CAST(n AS BIGINT) AS n,
    CAST(nt AS BIGINT) AS n_treated,
    CAST(n - nt AS BIGINT) AS n_control,
    CASE WHEN nt > 0 AND n - nt > 0
         THEN st / nt - sc_ / (n - nt) END AS effect
  FROM per
), summary AS (
  SELECT -1 AS stratum, CAST(sum(n) AS BIGINT) AS n,
    CAST(-1 AS BIGINT) AS n_treated, CAST(-1 AS BIGINT) AS n_control,
    sum(n * (st / nt - sc_ / (n - nt))) / sum(n) AS effect
  FROM per WHERE nt > 0 AND n - nt > 0
)
SELECT * FROM strat UNION ALL SELECT * FROM summary
"""


QUERIES["stratified_ate_events"] = stratified_ate_events
ORACLE_SQL["stratified_ate_events"] = _stratified_ate_sql()


_SC_TREATED = "NATION_3"
_SC_DONORS = ("NATION_7", "NATION_12", "NATION_21")
_SC_CUTOFF = "1999-01"


def synthetic_control_nation_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Synthetic-control estimate of NATION_3's post-1999 monthly
    order revenue against a 3-donor synthetic twin
    (operators/causal.py::synthetic_control): donor weights from the
    pre-period OLS (shared-Cramer closed form), pre-fit RMSE, and the
    post-period average treated-minus-synthetic gap (ATT). On this
    synthetic data the true effect is ~0 — the contract value-checks
    the machinery, not a planted effect."""
    from ..operators.causal import synthetic_control

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    panel = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .select(
            F.col("n_name"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.col("o_totalprice"),
        )
    )
    return synthetic_control(
        panel,
        unit_col="n_name",
        time_col="month",
        value_col="o_totalprice",
        treated=_SC_TREATED,
        donors=_SC_DONORS,
        cutoff=F.lit(_SC_CUTOFF),
    )


def _synthetic_control_sql() -> str:
    t0 = _SC_TREATED
    d1, d2, d3 = _SC_DONORS
    cut = _SC_CUTOFF

    def series(name: str, alias: str) -> str:
        return (
            f"coalesce(sum(CASE WHEN n_name = '{name}' "
            f"THEN o_totalprice END), 0.0) AS {alias}"
        )

    return f"""
WITH panel AS MATERIALIZED (
  SELECT strftime(o_orderdate, '%Y-%m') AS t,
    {series(t0, "y")},
    {series(d1, "d1")},
    {series(d2, "d2")},
    {series(d3, "d3")}
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  WHERE n_name IN ('{t0}', '{d1}', '{d2}', '{d3}')
  GROUP BY 1
),
pre AS MATERIALIZED (
  SELECT
    sum(d1 * d1) AS s11, sum(d1 * d2) AS s12, sum(d1 * d3) AS s13,
    sum(d2 * d2) AS s22, sum(d2 * d3) AS s23, sum(d3 * d3) AS s33,
    sum(d1 * y) AS b1, sum(d2 * y) AS b2, sum(d3 * y) AS b3
  FROM panel WHERE t < '{cut}'
),
dets AS MATERIALIZED (
  SELECT pre.*,
    s11 * (s22 * s33 - s23 * s23)
      - s12 * (s12 * s33 - s23 * s13)
      + s13 * (s12 * s23 - s22 * s13) AS det
  FROM pre
),
wts AS MATERIALIZED (
  SELECT
    (b1 * (s22 * s33 - s23 * s23)
      - s12 * (b2 * s33 - s23 * b3)
      + s13 * (b2 * s23 - s22 * b3)) / det AS w1,
    (s11 * (b2 * s33 - s23 * b3)
      - b1 * (s12 * s33 - s23 * s13)
      + s13 * (s12 * b3 - b2 * s13)) / det AS w2,
    (s11 * (s22 * b3 - b2 * s23)
      - s12 * (s12 * b3 - b2 * s13)
      + b1 * (s12 * s23 - s22 * s13)) / det AS w3
  FROM dets
),
scored AS (
  SELECT t < '{cut}' AS pre_w,
         y - (w1 * d1 + w2 * d2 + w3 * d3) AS gap,
         w1, w2, w3
  FROM panel CROSS JOIN wts
)
SELECT
  CAST(sum(CASE WHEN pre_w THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
  CAST(sum(CASE WHEN NOT pre_w THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
  any_value(w1) AS w1, any_value(w2) AS w2, any_value(w3) AS w3,
  sqrt(sum(CASE WHEN pre_w THEN gap * gap END)
       / sum(CASE WHEN pre_w THEN 1.0 END)) AS pre_rmse,
  sum(CASE WHEN NOT pre_w THEN gap END)
    / sum(CASE WHEN NOT pre_w THEN 1.0 END) AS att
FROM scored
"""


QUERIES["synthetic_control_nation_revenue"] = synthetic_control_nation_revenue
ORACLE_SQL["synthetic_control_nation_revenue"] = _synthetic_control_sql()


def aipw_discount_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust (AIPW) effect of a deep discount (>= 5%) on
    ordered quantity with smooth nuisance models
    (operators/causal.py::aipw_ate): propensity from the shared
    logistic-Newton closed form on (tax, scaled price), per-arm
    outcome OLS from the shared Cramer closed form, combined by the
    augmented-IPW score. The model-based sibling of
    discount_quantity_ipw's stratum-saturated estimator."""
    from ..operators.causal import aipw_ate

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "price_scaled", F.col("l_extendedprice") / F.lit(100000.0)
    )
    return aipw_ate(
        li,
        treatment=(F.col("l_discount") >= 0.05),
        y_col="l_quantity",
        x_cols=["l_tax", "price_scaled"],
    )


def _aipw_sql(iters: int = 3) -> str:
    parts = [
        """ab AS MATERIALIZED (
  SELECT CASE WHEN l_discount >= 0.05 THEN 1.0 ELSE 0.0 END AS t,
         CAST(l_quantity AS DOUBLE) AS y,
         CAST(l_tax AS DOUBLE) AS x1,
         l_extendedprice / 100000.0 AS x2
  FROM lineitem
  WHERE l_tax IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_quantity IS NOT NULL AND l_discount IS NOT NULL
)""",
        "ac0 AS MATERIALIZED (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""at{i} AS MATERIALIZED (
  SELECT x1, x2, t,
         1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2))) AS p
  FROM ab CROSS JOIN ac{i - 1}
)""")
        parts.append(f"""as{i} AS MATERIALIZED (
  SELECT sum(t - p) AS g0,
         sum((t - p) * x1) AS g1,
         sum((t - p) * x2) AS g2,
         sum(p * (1.0 - p)) AS h00,
         sum(p * (1.0 - p) * x1) AS h01,
         sum(p * (1.0 - p) * x2) AS h02,
         sum(p * (1.0 - p) * x1 * x1) AS h11,
         sum(p * (1.0 - p) * x1 * x2) AS h12,
         sum(p * (1.0 - p) * x2 * x2) AS h22
  FROM at{i}
)""")
        parts.append(f"""ad{i} AS MATERIALIZED (
  SELECT as{i}.*, c.b0 AS pb0, c.b1 AS pb1, c.b2 AS pb2,
    h00 * (h11 * h22 - h12 * h12)
      - h01 * (h01 * h22 - h12 * h02)
      + h02 * (h01 * h12 - h11 * h02) AS det
  FROM as{i} CROSS JOIN ac{i - 1} c
)""")
        parts.append(f"""ac{i} AS MATERIALIZED (
  SELECT
    pb0 + ((h11 * h22 - h12 * h12) * g0
      + (h02 * h12 - h01 * h22) * g1
      + (h01 * h12 - h02 * h11) * g2) / det AS b0,
    pb1 + ((h02 * h12 - h01 * h22) * g0
      + (h00 * h22 - h02 * h02) * g1
      + (h01 * h02 - h00 * h12) * g2) / det AS b1,
    pb2 + ((h01 * h12 - h02 * h11) * g0
      + (h01 * h02 - h00 * h12) * g1
      + (h00 * h11 - h01 * h01) * g2) / det AS b2
  FROM ad{i}
)""")
    arm_sums = []
    for tag, cond in (("a", "t = 1.0"), ("b", "t = 0.0")):
        w = f"CASE WHEN {cond} THEN 1.0 ELSE 0.0 END"
        arm_sums.append(
            f"sum({w}) AS {tag}n,\n"
            f"    sum({w} * x1) AS {tag}s1,\n"
            f"    sum({w} * x2) AS {tag}s2,\n"
            f"    sum({w} * x1 * x1) AS {tag}s11,\n"
            f"    sum({w} * x1 * x2) AS {tag}s12,\n"
            f"    sum({w} * x2 * x2) AS {tag}s22,\n"
            f"    sum({w} * y) AS {tag}sy,\n"
            f"    sum({w} * x1 * y) AS {tag}s1y,\n"
            f"    sum({w} * x2 * y) AS {tag}s2y"
        )
    parts.append(
        "arms AS MATERIALIZED (\n  SELECT\n    "
        + ",\n    ".join(arm_sums)
        + "\n  FROM ab\n)"
    )

    def cramer(tag: str) -> str:
        n, s1, s2 = f"{tag}n", f"{tag}s1", f"{tag}s2"
        s11, s12, s22 = f"{tag}s11", f"{tag}s12", f"{tag}s22"
        sy, s1y, s2y = f"{tag}sy", f"{tag}s1y", f"{tag}s2y"
        det = (
            f"({n} * ({s11} * {s22} - {s12} * {s12})"
            f" - {s1} * ({s1} * {s22} - {s12} * {s2})"
            f" + {s2} * ({s1} * {s12} - {s11} * {s2}))"
        )
        c0 = (
            f"({sy} * ({s11} * {s22} - {s12} * {s12})"
            f" - {s1} * ({s1y} * {s22} - {s12} * {s2y})"
            f" + {s2} * ({s1y} * {s12} - {s11} * {s2y})) / {det}"
        )
        c1 = (
            f"({n} * ({s1y} * {s22} - {s12} * {s2y})"
            f" - {sy} * ({s1} * {s22} - {s12} * {s2})"
            f" + {s2} * ({s1} * {s2y} - {s1y} * {s2})) / {det}"
        )
        c2 = (
            f"({n} * ({s11} * {s2y} - {s1y} * {s12})"
            f" - {s1} * ({s1} * {s2y} - {s1y} * {s2})"
            f" + {sy} * ({s1} * {s12} - {s11} * {s2})) / {det}"
        )
        return (
            f"{c0} AS {tag}c0, {c1} AS {tag}c1, {c2} AS {tag}c2"
        )

    parts.append(
        f"fits AS MATERIALIZED (\n  SELECT {cramer('a')},\n"
        f"         {cramer('b')}\n  FROM arms\n)"
    )
    parts.append(f"""scored AS (
  SELECT t, y,
    least(greatest(
      1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2))), 0.01), 0.99) AS p,
    ac0_ + ac1_ * x1 + ac2_ * x2 AS m1,
    bc0_ + bc1_ * x1 + bc2_ * x2 AS m0
  FROM (SELECT ab.*, f.ac0 AS ac0_, f.ac1 AS ac1_, f.ac2 AS ac2_,
               f.bc0 AS bc0_, f.bc1 AS bc1_, f.bc2 AS bc2_,
               c.b0, c.b1, c.b2
        FROM ab CROSS JOIN fits f CROSS JOIN ac{iters} c)
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(count(*) AS BIGINT) AS n,
  CAST(sum(t) AS BIGINT) AS n_treated,
  avg(m1 - m0 + t * (y - m1) / p - (1.0 - t) * (y - m0) / (1.0 - p))
    AS ate_aipw,
  avg(m1 - m0) AS ate_reg,
  sum(t * y) / sum(t) - sum((1.0 - t) * y) / sum(1.0 - t)
    AS naive_diff
FROM scored
"""
    )


QUERIES["aipw_discount_quantity"] = aipw_discount_quantity
ORACLE_SQL["aipw_discount_quantity"] = _aipw_sql()
