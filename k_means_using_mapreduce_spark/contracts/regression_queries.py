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


def logistic_returnflag_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Logistic regression P(returnflag='R' | quantity, discount)
    trained by 3 Newton-IRLS rounds — each round one scan with the
    coefficients folded in as codegen literals."""
    from ..operators.regression import logistic_newton

    li = load_table(spark, sf_dir, "lineitem")
    li = li.withColumn(
        "is_r", F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
    )
    return logistic_newton(li, ["l_quantity", "l_discount"], "is_r")


def _logistic_sql(iters: int = 3) -> str:
    """Emit the Newton-round CTE chain; the adjugate/determinant text
    mirrors operators/regression.py::logistic_newton term for term so
    both engines run the identical IEEE expression tree."""
    parts = [
        """b AS MATERIALIZED (
  SELECT l_quantity AS x1, l_discount AS x2,
         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
)""",
        "c0 AS MATERIALIZED (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""t{i} AS MATERIALIZED (
  SELECT x1, x2, y,
         1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2))) AS p
  FROM b CROSS JOIN c{i - 1}
)""")
        parts.append(f"""s{i} AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(y - p) AS g0,
         sum((y - p) * x1) AS g1,
         sum((y - p) * x2) AS g2,
         sum(p * (1.0 - p)) AS h00,
         sum(p * (1.0 - p) * x1) AS h01,
         sum(p * (1.0 - p) * x2) AS h02,
         sum(p * (1.0 - p) * x1 * x1) AS h11,
         sum(p * (1.0 - p) * x1 * x2) AS h12,
         sum(p * (1.0 - p) * x2 * x2) AS h22
  FROM t{i}
)""")
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT s{i}.*, c.b0 AS pb0, c.b1 AS pb1, c.b2 AS pb2,
    h00 * (h11 * h22 - h12 * h12)
      - h01 * (h01 * h22 - h12 * h02)
      + h02 * (h01 * h12 - h11 * h02) AS det
  FROM s{i} CROSS JOIN c{i - 1} c
)""")
        parts.append(f"""c{i} AS MATERIALIZED (
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
  FROM d{i}
)""")
    parts.append(f"""scored AS (
  SELECT y, b0, b1, b2, b0 + b1 * x1 + b2 * x2 AS z
  FROM b CROSS JOIN c{iters}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(count(*) AS BIGINT) AS n,
  any_value(b0) AS b0, any_value(b1) AS b1, any_value(b2) AS b2,
  avg(greatest(z, 0.0) - y * z + ln(1.0 + exp(-abs(z)))) AS log_loss,
  avg(CASE WHEN (z >= 0) = (y >= 0.5) THEN 1.0 ELSE 0.0 END)
    AS accuracy,
  avg(y) AS pos_rate
FROM scored
"""
    )


LOGISTIC_SQL = _logistic_sql(iters=3)


QUERIES = {
    "ols_price_trend_by_returnflag": ols_price_trend_by_returnflag,
    "ridge_price_model_lineitem": ridge_price_model_lineitem,
    "price_model_residuals_by_month": price_model_residuals_by_month,
    "huber_price_model_lineitem": huber_price_model_lineitem,
    "logistic_returnflag_lineitem": logistic_returnflag_lineitem,
}

ORACLE_SQL = {
    "huber_price_model_lineitem": HUBER_SQL,
    "logistic_returnflag_lineitem": LOGISTIC_SQL,
    "ols_price_trend_by_returnflag": OLS_SQL,
    "ridge_price_model_lineitem": RIDGE_SQL,
    "price_model_residuals_by_month": RESIDUALS_SQL,
}


def ridge_lambda_sweep_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Validation-scored ridge λ sweep over six decades from ONE scan
    of conditional Gram sums — model selection with no per-λ job
    (operators/regression.py::ridge_lambda_sweep)."""
    from ..operators.regression import ridge_lambda_sweep

    li = load_table(spark, sf_dir, "lineitem")
    return ridge_lambda_sweep(
        li, ["l_quantity", "l_discount"], "l_extendedprice", "l_orderkey"
    )


def _sweep_sql() -> str:
    from ..operators.regression import SWEEP_LAMBDAS

    lam_list = ", ".join(repr(v) for v in SWEEP_LAMBDAS)

    def sums(tag: str, neg: str) -> str:
        exprs = {
            "n": "1.0", "s1": "x1", "s2": "x2",
            "x11": "x1 * x1", "x12": "x1 * x2", "x22": "x2 * x2",
            "sy": "y", "sy1": "x1 * y", "sy2": "x2 * y", "syy": "y * y",
        }
        return ",\n    ".join(
            f"sum(CASE WHEN {neg}is_val THEN {e} ELSE 0.0 END) AS {tag}_{k}"
            for k, e in exprs.items()
        )

    def sse(p: str) -> str:
        return (
            f"{p}_syy - 2.0 * (b0 * {p}_sy + b1 * {p}_sy1 + b2 * {p}_sy2)"
            f" + (b0 * b0 * {p}_n + b1 * b1 * {p}_x11 + b2 * b2 * {p}_x22"
            f" + 2.0 * b0 * b1 * {p}_s1 + 2.0 * b0 * b2 * {p}_s2"
            f" + 2.0 * b1 * b2 * {p}_x12)"
        )

    return f"""
WITH r AS MATERIALIZED (
  SELECT CAST(l_quantity AS DOUBLE) AS x1,
         CAST(l_discount AS DOUBLE) AS x2,
         CAST(l_extendedprice AS DOUBLE) AS y,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 20 AS is_val
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
),
s AS MATERIALIZED (
  SELECT
    {sums('t', 'NOT ')},
    {sums('v', '')}
  FROM r
),
ls AS (SELECT unnest([{lam_list}]) AS l2),
a AS (
  SELECT l2, s.*, t_x11 + l2 AS a11, t_x12 AS a12, t_x22 + l2 AS a22
  FROM ls CROSS JOIN s
),
d AS (
  SELECT *,
    t_n * (a11 * a22 - a12 * a12)
      - t_s1 * (t_s1 * a22 - a12 * t_s2)
      + t_s2 * (t_s1 * a12 - a11 * t_s2) AS det
  FROM a
),
c AS (
  SELECT *,
    (t_sy * (a11 * a22 - a12 * a12)
      - t_s1 * (t_sy1 * a22 - a12 * t_sy2)
      + t_s2 * (t_sy1 * a12 - a11 * t_sy2)) / det AS b0,
    (t_n * (t_sy1 * a22 - a12 * t_sy2)
      - t_sy * (t_s1 * a22 - a12 * t_s2)
      + t_s2 * (t_s1 * t_sy2 - t_sy1 * t_s2)) / det AS b1,
    (t_n * (a11 * t_sy2 - t_sy1 * a12)
      - t_s1 * (t_s1 * t_sy2 - t_sy1 * t_s2)
      + t_sy * (t_s1 * a12 - a11 * t_s2)) / det AS b2
  FROM d
)
SELECT l2, b0, b1, b2,
  sqrt(greatest({sse('t')}, 0.0) / t_n) AS train_rmse,
  sqrt(greatest({sse('v')}, 0.0) / v_n) AS val_rmse
FROM c
"""


SWEEP_SQL = _sweep_sql()

QUERIES["ridge_lambda_sweep_lineitem"] = ridge_lambda_sweep_lineitem
ORACLE_SQL["ridge_lambda_sweep_lineitem"] = SWEEP_SQL


def learning_curve_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten nested-slice OLS fits priced on a fixed validation split,
    all from one scan (operators/regression.py::ols_learning_curve)."""
    from ..operators.regression import ols_learning_curve

    li = load_table(spark, sf_dir, "lineitem")
    return ols_learning_curve(
        li, "l_quantity", "l_extendedprice", "l_orderkey"
    )


LEARNING_CURVE_SQL = """
WITH r AS MATERIALIZED (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
           % 100 < 20 AS is_val,
         CAST(floor((('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
           || '#lc'), 1, 15))::BIGINT % 100) / 10) AS INTEGER) AS dec
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_orderkey IS NOT NULL
),
td AS (
  SELECT dec, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM r WHERE NOT is_val GROUP BY 1
),
val AS (
  SELECT CAST(count(*) AS DOUBLE) AS vn,
         sum(x) AS vsx, sum(y) AS vsy, sum(x * y) AS vsxy,
         sum(x * x) AS vsxx, sum(y * y) AS vsyy
  FROM r WHERE is_val
),
cum AS (
  SELECT (dec + 1) * 10 AS pct,
         sum(n) OVER w AS n, sum(sx) OVER w AS sx, sum(sy) OVER w AS sy,
         sum(sxy) OVER w AS sxy, sum(sxx) OVER w AS sxx,
         sum(syy) OVER w AS syy
  FROM td
  WINDOW w AS (ORDER BY dec ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
coefs AS (
  SELECT *,
    (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS slope
  FROM cum
),
fit AS (
  SELECT *, (sy - slope * sx) / n AS intercept FROM coefs
)
SELECT pct, CAST(n AS BIGINT) AS n_train, slope, intercept,
  sqrt(greatest(
    syy + n * intercept * intercept + slope * slope * sxx
      + 2.0 * intercept * slope * sx - 2.0 * intercept * sy
      - 2.0 * slope * sxy, 0.0) / n) AS train_rmse,
  sqrt(greatest(
    vsyy + vn * intercept * intercept + slope * slope * vsxx
      + 2.0 * intercept * slope * vsx - 2.0 * intercept * vsy
      - 2.0 * slope * vsxy, 0.0) / nullif(vn, 0.0)) AS val_rmse
FROM fit CROSS JOIN val
"""

QUERIES["learning_curve_lineitem"] = learning_curve_lineitem
ORACLE_SQL["learning_curve_lineitem"] = LEARNING_CURVE_SQL


_LASSO_L1 = 1_000_000.0
_LASSO_ROUNDS = 10


def lasso_price_model_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lasso (l1=1e6) of extendedprice on (quantity, discount): the
    penalty zeroes the weak discount slope — feature selection visible
    as nnz=1 (operators/regression.py::lasso_cd). All 10 CD rounds are
    driver arithmetic over the one-scan Gram sums."""
    from ..operators.regression import lasso_cd

    li = load_table(spark, sf_dir, "lineitem")
    return lasso_cd(
        li,
        ["l_quantity", "l_discount"],
        "l_extendedprice",
        l1=_LASSO_L1,
        rounds=_LASSO_ROUNDS,
    )


def _soft_sql(z: str, g: str) -> str:
    return (
        f"CASE WHEN abs({z}) - {g} <= 0.0 THEN 0.0 "
        f"WHEN {z} > 0 THEN abs({z}) - {g} "
        f"ELSE -(abs({z}) - {g}) END"
    )


def _lasso_sql(l1: float, rounds: int) -> str:
    parts = [
        """s AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(l_quantity AS DOUBLE)) AS s1,
         sum(CAST(l_discount AS DOUBLE)) AS s2,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE))
           AS x11,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE))
           AS x12,
         sum(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE))
           AS x22,
         sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE))
           AS sy1,
         sum(CAST(l_discount AS DOUBLE) * CAST(l_extendedprice AS DOUBLE))
           AS sy2,
         sum(CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)) AS syy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
)""",
        "c0 AS (SELECT s.*, 0.0 AS b0, 0.0 AS b1, 0.0 AS b2 FROM s)",
    ]
    prev = "c0"
    g = repr(l1)
    for k in range(1, rounds + 1):
        parts.append(f"""a{k} AS (
  SELECT * REPLACE ((sy - b1 * s1 - b2 * s2) / n AS b0) FROM {prev}
)""")
        parts.append(f"""b{k} AS (
  SELECT * REPLACE (
    {_soft_sql('sy1 - b0 * s1 - b2 * x12', g)} / x11 AS b1
  ) FROM a{k}
)""")
        parts.append(f"""c{k} AS (
  SELECT * REPLACE (
    {_soft_sql('sy2 - b0 * s2 - b1 * x12', g)} / x22 AS b2
  ) FROM b{k}
)""")
        prev = f"c{k}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(n AS BIGINT) AS n, b0, b1, b2,
  sqrt(greatest(
    syy + n * b0 * b0 + b1 * b1 * x11 + b2 * b2 * x22
      + 2.0 * b0 * b1 * s1 + 2.0 * b0 * b2 * s2 + 2.0 * b1 * b2 * x12
      - 2.0 * b0 * sy - 2.0 * b1 * sy1 - 2.0 * b2 * sy2, 0.0) / n)
    AS rmse,
  CAST((b1 <> 0.0)::INTEGER + (b2 <> 0.0)::INTEGER AS BIGINT) AS nnz
FROM {prev}
"""
    )


LASSO_SQL = _lasso_sql(_LASSO_L1, _LASSO_ROUNDS)

QUERIES["lasso_price_model_lineitem"] = lasso_price_model_lineitem
ORACLE_SQL["lasso_price_model_lineitem"] = LASSO_SQL


def simpsons_discount_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Does the pooled discount->quantity trend survive stratifying by
    return flag? (operators/regression.py::simpsons_check)."""
    from ..operators.regression import simpsons_check

    return simpsons_check(
        load_table(spark, sf_dir, "lineitem"),
        "l_discount",
        "l_quantity",
        "l_returnflag",
    )


SIMPSONS_SQL = """
WITH per AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(l_discount AS DOUBLE)) AS sx,
         sum(CAST(l_quantity AS DOUBLE)) AS sy,
         sum(CAST(l_discount AS DOUBLE) * CAST(l_quantity AS DOUBLE))
           AS sxy,
         sum(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE))
           AS sxx
  FROM lineitem
  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
    AND l_returnflag IS NOT NULL
  GROUP BY 1
),
sl AS (
  SELECT *,
    (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS slope
  FROM per
),
agg AS MATERIALIZED (
  SELECT CAST(sum(n) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS n_strata,
    (sum(n) * sum(sxy) - sum(sx) * sum(sy))
      / nullif(sum(n) * sum(sxx) - sum(sx) * sum(sx), 0.0)
      AS pooled_slope,
    min(slope) AS min_stratum_slope,
    max(slope) AS max_stratum_slope,
    CAST(count(slope) AS BIGINT) AS defined
  FROM sl
),
opp AS (
  SELECT CAST(sum(CASE WHEN slope IS NOT NULL
                        AND sign(slope) <>
                            sign((SELECT pooled_slope FROM agg))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_opposing
  FROM sl
)
SELECT n, n_strata, pooled_slope, min_stratum_slope,
  max_stratum_slope, n_opposing,
  n_opposing = defined AND defined > 0 AS reversed
FROM agg CROSS JOIN opp
"""

QUERIES["simpsons_discount_quantity"] = simpsons_discount_quantity
ORACLE_SQL["simpsons_discount_quantity"] = SIMPSONS_SQL


def lmg_price_drivers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley/LMG split of the price model's R² between quantity and
    discount (operators/regression.py::lmg_importance)."""
    from ..operators.regression import lmg_importance

    return lmg_importance(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_discount"],
        "l_extendedprice",
    )


LMG_SQL = (
    "WITH "
    + _SUMS_CTE.format(l2=0.0)
    + """,
singles AS (
  SELECT *,
    (n * sy1 - s1 * sy) * (n * sy1 - s1 * sy)
      / nullif((n * x11 - s1 * s1) * (n * syy - sy * sy), 0.0) AS r2_1,
    (n * sy2 - s2 * sy) * (n * sy2 - s2 * sy)
      / nullif((n * x22 - s2 * s2) * (n * syy - sy * sy), 0.0) AS r2_2,
    1.0 - (syy - 2.0 * (b0 * sy + b1 * sy1 + b2 * sy2)
      + (b0 * b0 * n + b1 * b1 * x11 + b2 * b2 * x22
         + 2.0 * b0 * b1 * s1 + 2.0 * b0 * b2 * s2
         + 2.0 * b1 * b2 * x12))
      / nullif(syy - sy * sy / n, 0.0) AS r2_full
  FROM coef
)
SELECT CAST(n AS BIGINT) AS n, r2_1 AS r2_x1, r2_2 AS r2_x2, r2_full,
  (r2_1 + (r2_full - r2_2)) / 2.0 AS lmg_x1,
  (r2_2 + (r2_full - r2_1)) / 2.0 AS lmg_x2
FROM singles
"""
)

QUERIES["lmg_price_drivers"] = lmg_price_drivers
ORACLE_SQL["lmg_price_drivers"] = LMG_SQL


def price_model_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's-distance audit of the quantity->price OLS: who owns the
    fit? (operators/regression.py::influence_summary)."""
    from ..operators.regression import influence_summary

    return influence_summary(
        load_table(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


INFLUENCE_SQL = """
WITH s AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(l_quantity AS DOUBLE)) AS sx,
         sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
         sum(CAST(l_quantity AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)) AS sxy,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE))
           AS sxx,
         sum(CAST(l_extendedprice AS DOUBLE)
             * CAST(l_extendedprice AS DOUBLE)) AS syy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
c AS MATERIALIZED (
  SELECT *,
    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
  FROM s
),
c2 AS MATERIALIZED (
  SELECT *, (sy - slope * sx) / n AS intercept, sx / n AS xbar FROM c
),
c3 AS MATERIALIZED (
  SELECT *,
    sxx - n * xbar * xbar AS sxx_c,
    greatest(
      syy + n * intercept * intercept + slope * slope * sxx
        + 2.0 * intercept * slope * sx - 2.0 * intercept * sy
        - 2.0 * slope * sxy, 0.0) / (n - 2.0) AS s2
  FROM c2
),
scored AS (
  SELECT c3.*,
    CAST(l_extendedprice AS DOUBLE)
      - (intercept + slope * CAST(l_quantity AS DOUBLE)) AS r,
    1.0 / n + (CAST(l_quantity AS DOUBLE) - xbar)
      * (CAST(l_quantity AS DOUBLE) - xbar) / sxx_c AS h
  FROM lineitem CROSS JOIN c3
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
d AS (
  SELECT n, slope, intercept,
    r * r * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) AS cooks
  FROM scored
)
SELECT CAST(any_value(n) AS BIGINT) AS n,
  any_value(slope) AS slope, any_value(intercept) AS intercept,
  max(cooks) AS max_cooks,
  CAST(sum(CASE WHEN cooks > 4.0 / n THEN 1 ELSE 0 END)
       AS BIGINT) AS n_influential,
  sum(CASE WHEN cooks > 4.0 / n THEN 1.0 ELSE 0.0 END)
    / any_value(n) AS influential_rate
FROM d
"""

QUERIES["price_model_influence"] = price_model_influence
ORACLE_SQL["price_model_influence"] = INFLUENCE_SQL


def chow_break_1998(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the quantity->price line change at ship-year 1998?
    (operators/regression.py::chow_test — expected: no break, the
    generator has one price process)."""
    from ..operators.regression import chow_test

    li = load_table(spark, sf_dir, "lineitem")
    return chow_test(
        li, "l_quantity", "l_extendedprice", F.year("l_shipdate") >= 1998
    )


def _chow_seg_sql(tag: str, cond: str) -> str:
    cols = {
        "n": "1.0", "sx": "x", "sy": "y", "sxy": "x * y",
        "sxx": "x * x", "syy": "y * y",
    }
    return ",\n    ".join(
        f"sum(CASE WHEN {cond} THEN {e} ELSE 0.0 END) AS {tag}{k}"
        for k, e in cols.items()
    )


def _chow_fit_sql(tag: str) -> str:
    return f"""
    (({tag}n * {tag}sxy - {tag}sx * {tag}sy)
      / nullif({tag}n * {tag}sxx - {tag}sx * {tag}sx, 0.0))"""


CHOW_SQL = f"""
WITH r AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) AS y,
         year(l_shipdate) >= 1998 AS b
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
s AS MATERIALIZED (
  SELECT
    {_chow_seg_sql('a', 'NOT b')},
    {_chow_seg_sql('b', 'b')}
  FROM r
),
fits AS (
  SELECT *,
    {_chow_fit_sql('a')} AS sl1,
    {_chow_fit_sql('b')} AS sl2,
    ((an + bn) * (asxy + bsxy) - (asx + bsx) * (asy + bsy))
      / nullif((an + bn) * (asxx + bsxx) - (asx + bsx) * (asx + bsx),
               0.0) AS slp
  FROM s
),
ints AS (
  SELECT *,
    (asy - sl1 * asx) / nullif(an, 0.0) AS i1,
    (bsy - sl2 * bsx) / nullif(bn, 0.0) AS i2,
    ((asy + bsy) - slp * (asx + bsx)) / nullif(an + bn, 0.0) AS ip
  FROM fits
),
sses AS (
  SELECT *,
    asyy + an * i1 * i1 + sl1 * sl1 * asxx + 2.0 * i1 * sl1 * asx
      - 2.0 * i1 * asy - 2.0 * sl1 * asxy AS sse1,
    bsyy + bn * i2 * i2 + sl2 * sl2 * bsxx + 2.0 * i2 * sl2 * bsx
      - 2.0 * i2 * bsy - 2.0 * sl2 * bsxy AS sse2,
    (asyy + bsyy) + (an + bn) * ip * ip + slp * slp * (asxx + bsxx)
      + 2.0 * ip * slp * (asx + bsx) - 2.0 * ip * (asy + bsy)
      - 2.0 * slp * (asxy + bsxy) AS ssep
  FROM ints
)
SELECT CAST(an AS BIGINT) AS n1, CAST(bn AS BIGINT) AS n2,
  sl1 AS slope_1, sl2 AS slope_2,
  ((ssep - sse1 - sse2) / 2.0)
    / nullif((sse1 + sse2) / nullif(an + bn - 4.0, 0.0), 0.0)
    AS f_stat,
  CAST(2 AS BIGINT) AS df1,
  CAST(an + bn - 4.0 AS BIGINT) AS df2
FROM sses
"""

QUERIES["chow_break_1998"] = chow_break_1998
ORACLE_SQL["chow_break_1998"] = CHOW_SQL


def poisson_quantity_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson GLM of line-item quantity on discount and tax
    (operators/regression.py::poisson_newton), 4 Newton rounds
    warm-started at the null model b0 = ln(mean(y)); the oracle
    unrolls the identical rounds as chained CTEs with the same
    warm-start CTE."""
    from ..operators.regression import poisson_newton

    li = load_table(spark, sf_dir, "lineitem")
    return poisson_newton(li, ["l_discount", "l_tax"], "l_quantity")


def _poisson_sql(iters: int = 4) -> str:
    parts = [
        """pb AS MATERIALIZED (
  SELECT CAST(l_discount AS DOUBLE) AS x1, CAST(l_tax AS DOUBLE) AS x2,
         CAST(l_quantity AS DOUBLE) AS y
  FROM lineitem
  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
    AND l_quantity IS NOT NULL AND l_quantity >= 0
)""",
        "pc0 AS MATERIALIZED "
        "(SELECT ln(avg(y)) AS b0, 0.0 AS b1, 0.0 AS b2 FROM pb)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""pt{i} AS MATERIALIZED (
  SELECT x1, x2, y, exp(b0 + b1 * x1 + b2 * x2) AS mu
  FROM pb CROSS JOIN pc{i - 1}
)""")
        parts.append(f"""ps{i} AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(y - mu) AS g0,
         sum((y - mu) * x1) AS g1,
         sum((y - mu) * x2) AS g2,
         sum(mu) AS h00,
         sum(mu * x1) AS h01,
         sum(mu * x2) AS h02,
         sum(mu * x1 * x1) AS h11,
         sum(mu * x1 * x2) AS h12,
         sum(mu * x2 * x2) AS h22
  FROM pt{i}
)""")
        parts.append(f"""pd{i} AS MATERIALIZED (
  SELECT ps{i}.*, c.b0 AS prb0, c.b1 AS prb1, c.b2 AS prb2,
    h00 * (h11 * h22 - h12 * h12)
      - h01 * (h01 * h22 - h12 * h02)
      + h02 * (h01 * h12 - h11 * h02) AS det
  FROM ps{i} CROSS JOIN pc{i - 1} c
)""")
        parts.append(f"""pc{i} AS MATERIALIZED (
  SELECT
    prb0 + ((h11 * h22 - h12 * h12) * g0
      + (h02 * h12 - h01 * h22) * g1
      + (h01 * h12 - h02 * h11) * g2) / det AS b0,
    prb1 + ((h02 * h12 - h01 * h22) * g0
      + (h00 * h22 - h02 * h02) * g1
      + (h01 * h02 - h00 * h12) * g2) / det AS b1,
    prb2 + ((h01 * h12 - h02 * h11) * g0
      + (h01 * h02 - h00 * h12) * g1
      + (h00 * h11 - h01 * h01) * g2) / det AS b2
  FROM pd{i}
)""")
    parts.append(f"""pscored AS (
  SELECT y, b0, b1, b2, exp(b0 + b1 * x1 + b2 * x2) AS mu
  FROM pb CROSS JOIN pc{iters}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(count(*) AS BIGINT) AS n,
       any_value(b0) AS b0, any_value(b1) AS b1, any_value(b2) AS b2,
       2.0 * sum(CASE WHEN y > 0 THEN y * ln(y / mu) - (y - mu)
                      ELSE mu END) AS deviance,
       avg(mu) AS mean_mu
FROM pscored
"""
    )


QUERIES["poisson_quantity_lineitem"] = poisson_quantity_lineitem
ORACLE_SQL["poisson_quantity_lineitem"] = _poisson_sql()


def glm_poisson_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson GLM of quantity on THREE features (discount, tax,
    linenumber) — the p = 3 step beyond the 2-feature closed forms,
    via the engine-side fixed-iteration Newton
    (operators/regression.py::poisson_newton3). The 4×4 Cramer step
    and this oracle's SQL are emitted by the SAME expression-tree
    generator (cramer4_newton_terms), so engine and oracle agree term
    for term by construction. The MLlib GLR wrapper (glm_fit) remains
    the general-p operator API, pinned by tolerance parity tests
    against this fit (tests/test_regression.py::test_glm_fit_*) —
    its own stopping rule is not SQL-portable, which is why the hash
    gate lives HERE (the gamma_price_lineitem recipe)."""
    from ..operators.regression import poisson_newton3

    li = load_table(spark, sf_dir, "lineitem")
    return poisson_newton3(
        li, ["l_discount", "l_tax", "l_linenumber"], "l_quantity"
    )


def _glm_poisson3_sql(iters: int = 4) -> str:
    """Chained-CTE unroll of poisson_newton3: the Cramer-step SQL is
    generated by the operator's own cramer4_newton_terms with
    string-building scalar ops, so the oracle cannot drift from the
    engine's arithmetic."""
    from ..operators.regression import cramer4_newton_terms

    det_expr, deltas = cramer4_newton_terms(
        {
            (i, j): f"h{i}{j}"
            for i in range(4)
            for j in range(i, 4)
        },
        [f"g{j}" for j in range(4)],
        mul=lambda a, b: f"({a} * {b})",
        add=lambda a, b: f"({a} + {b})",
        sub=lambda a, b: f"({a} - {b})",
        neg=lambda a: f"(- {a})",
        div=lambda n, d: f"({n} / det)",
    )
    parts = [
        """qb AS MATERIALIZED (
  SELECT CAST(l_discount AS DOUBLE) AS x1, CAST(l_tax AS DOUBLE) AS x2,
         CAST(l_linenumber AS DOUBLE) AS x3,
         CAST(l_quantity AS DOUBLE) AS y
  FROM lineitem
  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
    AND l_linenumber IS NOT NULL
    AND l_quantity IS NOT NULL AND l_quantity >= 0
)""",
        "qc0 AS MATERIALIZED (SELECT ln(avg(y)) AS b0, 0.0 AS b1, "
        "0.0 AS b2, 0.0 AS b3 FROM qb)",
    ]
    hsums = []
    for i in range(4):
        for j in range(i, 4):
            xs = [t for t in (f"x{i}", f"x{j}") if t != "x0"]
            prod = " * ".join(["mu", *xs])
            hsums.append(f"sum({prod}) AS h{i}{j}")
    hsql = ",\n         ".join(hsums)
    for i in range(1, iters + 1):
        parts.append(f"""qt{i} AS MATERIALIZED (
  SELECT x1, x2, x3, y,
         exp(b0 + b1 * x1 + b2 * x2 + b3 * x3) AS mu
  FROM qb CROSS JOIN qc{i - 1}
)""")
        parts.append(f"""qs{i} AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(y - mu) AS g0,
         sum((y - mu) * x1) AS g1,
         sum((y - mu) * x2) AS g2,
         sum((y - mu) * x3) AS g3,
         {hsql}
  FROM qt{i}
)""")
        parts.append(f"""qd{i} AS MATERIALIZED (
  SELECT qs{i}.*, c.b0 AS prb0, c.b1 AS prb1,
         c.b2 AS prb2, c.b3 AS prb3,
    {det_expr} AS det
  FROM qs{i} CROSS JOIN qc{i - 1} c
)""")
        bexprs = ",\n    ".join(
            f"(prb{j} + {deltas[j]}) AS b{j}" for j in range(4)
        )
        parts.append(f"""qc{i} AS MATERIALIZED (
  SELECT
    {bexprs}
  FROM qd{i}
)""")
    parts.append(f"""qscored AS (
  SELECT y, b0, b1, b2, b3,
         exp(b0 + b1 * x1 + b2 * x2 + b3 * x3) AS mu
  FROM qb CROSS JOIN qc{iters}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(count(*) AS BIGINT) AS n,
       any_value(b0) AS b0, any_value(b1) AS b1,
       any_value(b2) AS b2, any_value(b3) AS b3,
       2.0 * sum(CASE WHEN y > 0 THEN y * ln(y / mu) - (y - mu)
                      ELSE mu END) AS deviance,
       avg(mu) AS mean_mu
FROM qscored
"""
    )


QUERIES["glm_poisson_lineitem"] = glm_poisson_lineitem
ORACLE_SQL["glm_poisson_lineitem"] = _glm_poisson3_sql()


_QR_EPS, _QR_ITERS = 1e-6, 3


def _quantile_model(tau: float):
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..operators.regression import quantile_ols

        li = load_table(spark, sf_dir, "lineitem")
        return quantile_ols(
            li,
            "l_quantity",
            "l_extendedprice",
            tau=tau,
            iters=_QR_ITERS,
            eps=_QR_EPS,
        )

    _q.__doc__ = (
        f"τ={tau} quantile (pinball-loss) price~quantity line via "
        "fixed-iteration IRLS (operators/regression.py::quantile_ols); "
        "the oracle unrolls the identical asymmetric-weight rounds."
    )
    return _q


def _quantile_sql(tau: float) -> str:
    t, e = float(tau), float(_QR_EPS)
    base_where = (
        "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL"
    )
    parts = [
        f"""s0 AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         sum(l_quantity * l_extendedprice) AS sxy,
         sum(l_quantity * l_quantity) AS sxx
  FROM lineitem {base_where}
),
c0 AS MATERIALIZED (
  SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1 FROM s0
),
d0 AS MATERIALIZED (
  SELECT *, (sy - b1 * sx) / n AS b0 FROM c0
)"""
    ]
    for k in range(1, _QR_ITERS + 1):
        prev = f"d{k - 1}"
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT any_value(n) AS n,
         sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
         sum(w * x * y) AS swxy, sum(w * x * x) AS swxx
  FROM (
    SELECT {prev}.n, l_quantity AS x, l_extendedprice AS y,
      (CASE WHEN l_extendedprice - (b0 + b1 * l_quantity) >= 0.0
            THEN {t!r} ELSE {1.0 - t!r} END)
        / greatest(abs(l_extendedprice - (b0 + b1 * l_quantity)), {e!r})
        AS w
    FROM lineitem CROSS JOIN {prev} {base_where}
  ) t
),
c{k} AS MATERIALIZED (
  SELECT *, (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
  FROM w{k}
),
d{k} AS MATERIALIZED (
  SELECT *, (swy - b1 * swx) / sw AS b0 FROM c{k}
)"""
        )
    last = f"d{_QR_ITERS}"
    parts.append(
        f"""fin AS (
  SELECT avg(
    CASE WHEN l_extendedprice - (b0 + b1 * l_quantity) >= 0.0
         THEN {t!r} * (l_extendedprice - (b0 + b1 * l_quantity))
         ELSE {t - 1.0!r} * (l_extendedprice - (b0 + b1 * l_quantity))
    END) AS pb
  FROM lineitem CROSS JOIN {last} {base_where}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(n AS BIGINT) AS n, {t!r} AS tau, b1 AS slope,
       b0 AS intercept, pb AS pinball_mean
FROM {last} CROSS JOIN fin
"""
    )


QUERIES["lad_price_model_lineitem"] = _quantile_model(0.5)
ORACLE_SQL["lad_price_model_lineitem"] = _quantile_sql(0.5)
QUERIES["p90_price_model_lineitem"] = _quantile_model(0.9)
ORACLE_SQL["p90_price_model_lineitem"] = _quantile_sql(0.9)


def gamma_price_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma GLM (log link) of extended price on discount and tax
    (operators/regression.py::gamma_irls), 4 IRLS rounds warm-started
    at the null model b0 = ln(mean(y)). For the Gamma/log pair the
    IRLS weights are identically 1, so X'X is constant and each round
    rescans only X'z; the oracle unrolls the identical rounds as
    chained CTEs sharing one materialized X'X."""
    from ..operators.regression import gamma_irls

    li = load_table(spark, sf_dir, "lineitem")
    return gamma_irls(li, ["l_discount", "l_tax"], "l_extendedprice")


def _gamma_sql(iters: int = 4) -> str:
    parts = [
        """gb AS MATERIALIZED (
  SELECT CAST(l_discount AS DOUBLE) AS x1, CAST(l_tax AS DOUBLE) AS x2,
         CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_extendedprice > 0
)""",
        """gh AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS h00,
         sum(x1) AS h01, sum(x2) AS h02,
         sum(x1 * x1) AS h11, sum(x1 * x2) AS h12,
         sum(x2 * x2) AS h22,
         ln(avg(y)) AS b0i
  FROM gb
)""",
        """ghd AS MATERIALIZED (
  SELECT gh.*,
    h00 * (h11 * h22 - h12 * h12)
      - h01 * (h01 * h22 - h12 * h02)
      + h02 * (h01 * h12 - h11 * h02) AS det
  FROM gh
)""",
        "gc0 AS MATERIALIZED "
        "(SELECT b0i AS b0, 0.0 AS b1, 0.0 AS b2 FROM ghd)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""gz{i} AS MATERIALIZED (
  SELECT x1, x2,
         (b0 + b1 * x1 + b2 * x2)
           + y * exp(-(b0 + b1 * x1 + b2 * x2)) - 1.0 AS z
  FROM gb CROSS JOIN gc{i - 1}
)""")
        parts.append(f"""gt{i} AS MATERIALIZED (
  SELECT sum(z) AS t0, sum(z * x1) AS t1, sum(z * x2) AS t2
  FROM gz{i}
)""")
        parts.append(f"""gc{i} AS MATERIALIZED (
  SELECT
    ((h11 * h22 - h12 * h12) * t0
      + (h02 * h12 - h01 * h22) * t1
      + (h01 * h12 - h02 * h11) * t2) / det AS b0,
    ((h02 * h12 - h01 * h22) * t0
      + (h00 * h22 - h02 * h02) * t1
      + (h01 * h02 - h00 * h12) * t2) / det AS b1,
    ((h01 * h12 - h02 * h11) * t0
      + (h01 * h02 - h00 * h12) * t1
      + (h00 * h11 - h01 * h01) * t2) / det AS b2
  FROM gt{i} CROSS JOIN ghd
)""")
    parts.append(f"""gscored AS (
  SELECT y, b0, b1, b2, exp(b0 + b1 * x1 + b2 * x2) AS mu
  FROM gb CROSS JOIN gc{iters}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT CAST(count(*) AS BIGINT) AS n,
       any_value(b0) AS b0, any_value(b1) AS b1, any_value(b2) AS b2,
       2.0 * sum(-ln(y / mu) + (y - mu) / mu) AS deviance,
       sum(((y - mu) / mu) * ((y - mu) / mu))
         / (CAST(count(*) AS DOUBLE) - 3.0) AS dispersion,
       avg(mu) AS mean_mu
FROM gscored
"""
    )


QUERIES["gamma_price_lineitem"] = gamma_price_lineitem
ORACLE_SQL["gamma_price_lineitem"] = _gamma_sql()
