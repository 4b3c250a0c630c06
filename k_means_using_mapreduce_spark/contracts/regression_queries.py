"""Regression contracts (operators/regression.py): per-group simple
OLS over lineitem, a fully-declarative 2-feature ridge fit, and a
fit-then-score residual diagnostic — all exactly reproducible as pure
SQL over the same normal-equation sums.

Reference scope note: the reference engine (master.py:27-150) is
K-Means only; regression is extension scope per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import load_table

_RIDGE_L2 = 1000.0


def ols_price_trend_by_returnflag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-return-flag OLS of extendedprice on quantity: one shuffle
    of six doubles per group, closed-form slope/intercept/R²."""
    from ..operators.regression import grouped_ols

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_ols(
        li, "l_quantity", "l_extendedprice", by=["l_returnflag"]
    )


OLS_SQL = """
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sxy,
         sum(l_quantity * l_quantity) AS sxx,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
)
SELECT l_returnflag, n,
  (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS slope,
  (sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) * sx) / n
    AS intercept,
  ((n * sxy - sx * sy) * (n * sxy - sx * sy))
    / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0) AS r2
FROM s
"""


def ridge_price_model_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Declarative ridge (λ=1000 on the slopes) of extendedprice on
    (quantity, discount): Cramer's rule as column expressions over the
    one-row Gram aggregate — coefficients, training RMSE and R² in a
    single Spark job with no driver math."""
    from ..operators.regression import ridge_coefficients_df

    li = load_table(spark, sf_dir, "lineitem")
    return ridge_coefficients_df(
        li, ["l_quantity", "l_discount"], "l_extendedprice", l2=_RIDGE_L2
    )


_SUMS_CTE = """
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(l_quantity) AS s1, sum(l_discount) AS s2,
         sum(l_quantity * l_quantity) AS x11,
         sum(l_quantity * l_discount) AS x12,
         sum(l_discount * l_discount) AS x22,
         sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sy1,
         sum(l_discount * l_extendedprice) AS sy2,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
),
a AS (
  SELECT n, s1, s2, x11, x12, x22, sy, sy1, sy2, syy,
         x11 + {l2} AS a11, x12 AS a12, x22 + {l2} AS a22
  FROM s
),
det AS (
  SELECT *,
    n * (a11 * a22 - a12 * a12)
      - s1 * (s1 * a22 - a12 * s2)
      + s2 * (s1 * a12 - a11 * s2) AS d
  FROM a
),
coef AS (
  SELECT *,
    (sy * (a11 * a22 - a12 * a12)
      - s1 * (sy1 * a22 - a12 * sy2)
      + s2 * (sy1 * a12 - a11 * sy2)) / nullif(d, 0.0) AS b0,
    (n * (sy1 * a22 - a12 * sy2)
      - sy * (s1 * a22 - a12 * s2)
      + s2 * (s1 * sy2 - sy1 * s2)) / nullif(d, 0.0) AS b1,
    (n * (a11 * sy2 - sy1 * a12)
      - s1 * (s1 * sy2 - sy1 * s2)
      + sy * (s1 * a12 - a11 * s2)) / nullif(d, 0.0) AS b2
  FROM det
)
"""

RIDGE_SQL = (
    "WITH "
    + _SUMS_CTE.format(l2=_RIDGE_L2)
    + """
SELECT n, b0, b1, b2,
  sqrt(greatest(
    syy - 2.0 * (b0 * sy + b1 * sy1 + b2 * sy2)
      + (b0 * b0 * n + b1 * b1 * x11 + b2 * b2 * x22
         + 2.0 * b0 * b1 * s1 + 2.0 * b0 * b2 * s2
         + 2.0 * b1 * b2 * x12),
    0.0) / n) AS rmse,
  1.0 - (syy - 2.0 * (b0 * sy + b1 * sy1 + b2 * sy2)
      + (b0 * b0 * n + b1 * b1 * x11 + b2 * b2 * x22
         + 2.0 * b0 * b1 * s1 + 2.0 * b0 * b2 * s2
         + 2.0 * b1 * b2 * x12))
    / nullif(syy - sy * sy / n, 0.0) AS r2
FROM coef
"""
)


def price_model_residuals_by_month(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fit the global OLS price model (λ=0), then score every row with
    the coefficients folded in as codegen literals and aggregate
    residual diagnostics per ship month — the fit→apply round trip."""
    from ..operators.regression import fit_ridge, residual_summary

    li = load_table(spark, sf_dir, "lineitem")
    coef, _ = fit_ridge(
        li, ["l_quantity", "l_discount"], "l_extendedprice", l2=0.0
    )
    scored = li.withColumn(
        "ship_month", F.month("l_shipdate").cast("int")
    )
    return residual_summary(
        scored,
        ["l_quantity", "l_discount"],
        "l_extendedprice",
        coef,
        by=["ship_month"],
    )


RESIDUALS_SQL = (
    "WITH "
    + _SUMS_CTE.format(l2=0.0)
    + """
SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
  CAST(count(*) AS BIGINT) AS n,
  sqrt(avg(r * r)) AS rmse,
  avg(abs(r)) AS mae,
  avg(r) AS bias
FROM (
  SELECT l_shipdate,
    l_extendedprice - (b0 + b1 * l_quantity + b2 * l_discount) AS r
  FROM lineitem CROSS JOIN coef
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
) t
GROUP BY 1
"""
)


def huber_price_model_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Huber-loss robust OLS of extendedprice on quantity (2 IRLS
    rounds, threshold frozen at 1.345·σ₀): each round is one scan with
    the previous coefficients folded in as codegen literals — the same
    flat-iteration shape as the K-Means driver loop."""
    from ..operators.regression import huber_ols

    li = load_table(spark, sf_dir, "lineitem")
    return huber_ols(li, "l_quantity", "l_extendedprice", iters=2)


HUBER_SQL = """
WITH s0 AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sxy,
         sum(l_quantity * l_quantity) AS sxx,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
c0 AS MATERIALIZED (
  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1
  FROM s0
),
d0 AS MATERIALIZED (
  SELECT *, (sy - b1 * sx) / n AS b0 FROM c0
),
d AS MATERIALIZED (
  SELECT *,
    1.345 * sqrt(greatest(
      syy + n * b0 * b0 + b1 * b1 * sxx + 2.0 * b0 * b1 * sx
        - 2.0 * b0 * sy - 2.0 * b1 * sxy, 0.0) / n) AS delta
  FROM d0
),
w1 AS MATERIALIZED (
  SELECT any_value(n) AS n, any_value(sx) AS sx, any_value(sy) AS sy,
         any_value(sxy) AS sxy, any_value(sxx) AS sxx,
         any_value(syy) AS syy, any_value(delta) AS delta,
         sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
         sum(w * x * y) AS swxy, sum(w * x * x) AS swxx
  FROM (
    SELECT d.*, l_quantity AS x, l_extendedprice AS y,
      CASE WHEN abs(l_extendedprice - (b0 + b1 * l_quantity)) = 0.0
           THEN 1.0
           ELSE least(1.0, delta
                / abs(l_extendedprice - (b0 + b1 * l_quantity))) END AS w
    FROM lineitem CROSS JOIN d
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  ) t
),
c1 AS MATERIALIZED (
  SELECT *,
    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
  FROM w1
),
d1 AS MATERIALIZED (
  SELECT *, (swy - b1 * swx) / sw AS b0 FROM c1
),
w2 AS MATERIALIZED (
  SELECT any_value(n) AS n, any_value(sx) AS sx, any_value(sy) AS sy,
         any_value(sxy) AS sxy, any_value(sxx) AS sxx,
         any_value(syy) AS syy, any_value(delta) AS delta,
         sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
         sum(w * x * y) AS swxy, sum(w * x * x) AS swxx
  FROM (
    SELECT d1.*, l_quantity AS x, l_extendedprice AS y,
      CASE WHEN abs(l_extendedprice - (b0 + b1 * l_quantity)) = 0.0
           THEN 1.0
           ELSE least(1.0, delta
                / abs(l_extendedprice - (b0 + b1 * l_quantity))) END AS w
    FROM lineitem CROSS JOIN d1
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  ) t
),
c2 AS MATERIALIZED (
  SELECT *,
    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
  FROM w2
),
d2 AS MATERIALIZED (
  SELECT *, (swy - b1 * swx) / sw AS b0 FROM c2
)
SELECT CAST(n AS BIGINT) AS n, b1 AS slope, b0 AS intercept, delta,
  sw AS w_sum,
  sqrt(greatest(
    syy + n * b0 * b0 + b1 * b1 * sxx + 2.0 * b0 * b1 * sx
      - 2.0 * b0 * sy - 2.0 * b1 * sxy, 0.0) / n) AS rmse
FROM d2
"""


QUERIES = {
    "ols_price_trend_by_returnflag": ols_price_trend_by_returnflag,
    "ridge_price_model_lineitem": ridge_price_model_lineitem,
    "price_model_residuals_by_month": price_model_residuals_by_month,
    "huber_price_model_lineitem": huber_price_model_lineitem,
}

ORACLE_SQL = {
    "huber_price_model_lineitem": HUBER_SQL,
    "ols_price_trend_by_returnflag": OLS_SQL,
    "ridge_price_model_lineitem": RIDGE_SQL,
    "price_model_residuals_by_month": RESIDUALS_SQL,
}
