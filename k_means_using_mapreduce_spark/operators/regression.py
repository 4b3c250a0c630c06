"""Distributed linear regression via normal-equation sums.

The model-fitting closure of the feature surface built elsewhere in
the engine (encode.py targets/WOE, quantize.py bins, pca.py bases):
after features are engineered, a training pipeline fits baselines —
per-segment trend lines, a global price model, residual diagnostics —
and those fits are exactly the aggregations this module provides.

Everything reduces to ONE map-side-combinable aggregation:

- ``grouped_ols``: per-group simple OLS needs only the five sums
  ``(n, Σx, Σy, Σxy, Σx², Σy²)`` — a single shuffle of six doubles
  per group, never the rows. Slope/intercept/R² are closed-form
  arithmetic on the aggregate row (whole-stage codegen).
- ``ridge_sums`` / ``fit_ridge``: multivariate ridge collects the
  Gram matrix ``X'X`` and moment vector ``X'y`` (intercept column
  included) as ``(p+1)(p+2)/2 + (p+1)`` sums in one pass — a
  1-row result regardless of input size — then solves the
  ``(p+1)×(p+1)`` system on the driver. For the p ≤ 3 systems the
  contracts pin, the solve is explicit Cramer's rule so the Spark
  path and the pure-SQL oracle share the exact formula; larger p
  falls back to ``numpy.linalg.solve`` (documented, same answer to
  machine precision).
- ``residual_summary``: scoring folds the fitted coefficients back
  in as LITERALS — the "model" is a codegen projection, no join, no
  broadcast, no UDF — and aggregates per-group residual diagnostics
  (RMSE / MAE / mean error / R²) in a second single-shuffle pass.

Training SSE is also available with NO second pass: with the ridge
sums in hand, ``SSE = Σy² − 2·bᵀX'y + bᵀ(X'X)b`` (used by
``fit_ridge``'s ``rmse``), so a fit costs exactly one scan.

At 100 TB: both passes are narrow scans + partial aggregation; the
shuffled state is O(groups × p²) doubles. Nothing here collects rows.

Reference scope note: the reference engine (master.py:27-150) is
K-Means only; regression is extension scope per the build brief.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F


def _d(c: str) -> Column:
    return F.col(c).cast("double")


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Per-group simple OLS of ``y_col`` on ``x_col``.

    Returns one row per group: ``(by..., n, slope, intercept, r2)``
    with the textbook moment formulas

    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)``,
    ``r2 = slope² · Sxx / Syy``.

    Degenerate groups (constant x) yield NULL slope/intercept; a
    constant-y group yields NULL r2 (0/0 guarded via nullif). Rows
    with NULL in either column are excluded from the group's fit.
    """
    rows = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x, y = _d(x_col), _d(y_col)
    agg = rows.groupBy(*[F.col(c) for c in by]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cxy = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cxy / F.nullif(vx, F.lit(0.0))
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cxy * cxy) / F.nullif(vx * vy, F.lit(0.0))
    return agg.select(
        *[F.col(c) for c in by],
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def ridge_sums(
    df: DataFrame, x_cols: Sequence[str], y_col: str
) -> DataFrame:
    """One-row DataFrame of every normal-equation sum for
    ``y ~ 1 + x_cols``: ``n``, ``s_i`` (Σxᵢ), ``s_i_j`` (Σxᵢxⱼ,
    i ≤ j), ``sy``, ``sy_i`` (Σxᵢy), ``syy``. Single
    map-side-combined aggregation; NULL-complete rows are dropped."""
    cond = F.col(y_col).isNotNull()
    for c in x_cols:
        cond = cond & F.col(c).isNotNull()
    rows = df.where(cond)
    y = _d(y_col)
    xs = [_d(c) for c in x_cols]
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(xi).alias(f"s_{i}"))
    for i, xi in enumerate(xs):
        for j in range(i, len(xs)):
            aggs.append(F.sum(xi * xs[j]).alias(f"s_{i}_{j}"))
    aggs.append(F.sum(y).alias("sy"))
    for i, xi in enumerate(xs):
        aggs.append(F.sum(xi * y).alias(f"sy_{i}"))
    aggs.append(F.sum(y * y).alias("syy"))
    return rows.agg(*aggs)


def _cramer3(a: list[list[float]], b: list[float]) -> list[float]:
    """Explicit Cramer's rule for a 3×3 system — shared formula with
    the SQL oracle so both paths agree to the last double bit."""

    def det3(m: list[list[float]]) -> float:
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    d = det3(a)
    out = []
    for k in range(3):
        mk = [row[:] for row in a]
        for r in range(3):
            mk[r][k] = b[r]
        out.append(det3(mk) / d)
    return out


def fit_ridge(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    l2: float = 0.0,
) -> tuple[list[float], dict[str, float]]:
    """Closed-form ridge ``y ~ 1 + x_cols`` with penalty ``l2`` on the
    slope coefficients (intercept unpenalized).

    Returns ``(coefficients, stats)`` where ``coefficients`` is
    ``[b0, b1, ..., bp]`` (b0 = intercept) and ``stats`` carries
    ``n``, ``rmse`` and ``r2`` computed FROM THE SAME SUMS — the
    whole fit is one scan:

    ``SSE = Σy² − 2·bᵀ(X'y) + bᵀ(X'X + λJ)b − λ·Σbᵢ²``  (J zero on
    the intercept), evaluated driver-side on the collected row.
    """
    p = len(x_cols)
    row = ridge_sums(df, x_cols, y_col).collect()[0].asDict()
    n = float(row["n"])
    # X'X with the intercept column prepended: index 0 = intercept.
    a = [[0.0] * (p + 1) for _ in range(p + 1)]
    a[0][0] = n
    for i in range(p):
        a[0][i + 1] = a[i + 1][0] = row[f"s_{i}"]
        for j in range(i, p):
            a[i + 1][j + 1] = a[j + 1][i + 1] = row[f"s_{i}_{j}"]
    for i in range(1, p + 1):
        a[i][i] += l2
    b = [row["sy"]] + [row[f"sy_{i}"] for i in range(p)]
    if p == 2:
        coef = _cramer3(a, b)
    else:  # pragma: no cover - exercised for p != 2 only
        import numpy as np

        coef = [float(v) for v in np.linalg.solve(np.array(a), np.array(b))]
    # SSE from the sums (A here already has +l2 on the diagonal; the
    # true X'X quadratic form subtracts it back out).
    quad = 0.0
    for i in range(p + 1):
        for j in range(p + 1):
            quad += coef[i] * a[i][j] * coef[j]
    quad -= l2 * sum(c * c for c in coef[1:])
    dot = sum(coef[i] * b[i] for i in range(p + 1))
    sse = row["syy"] - 2.0 * dot + quad
    sst = row["syy"] - row["sy"] * row["sy"] / n
    stats = {
        "n": n,
        "rmse": (sse / n) ** 0.5 if sse > 0 else 0.0,
        "r2": 1.0 - sse / sst if sst > 0 else float("nan"),
    }
    return coef, stats


def ridge_coefficients_df(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    l2: float = 0.0,
) -> DataFrame:
    """Fully-declarative ridge for exactly TWO features: Cramer's rule
    evaluated as column expressions over the one-row ``ridge_sums``
    aggregate — the entire fit (coefficients + training RMSE + R²) is
    a single Spark job with no driver math at all.

    Returns one row ``(n, b0, b1, b2, rmse, r2)`` where ``b0`` is the
    intercept. The intercept is unpenalized; ``l2`` is added to the
    two slope diagonal entries of X'X.
    """
    if len(x_cols) != 2:
        raise ValueError("ridge_coefficients_df supports exactly 2 features")
    sums = ridge_sums(df, x_cols, y_col)
    n = F.col("n").cast("double")
    s1, s2 = F.col("s_0"), F.col("s_1")
    s11 = F.col("s_0_0") + F.lit(l2)
    s12 = F.col("s_0_1")
    s22 = F.col("s_1_1") + F.lit(l2)
    sy, sy1, sy2 = F.col("sy"), F.col("sy_0"), F.col("sy_1")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    d0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (sy1 * s22 - s12 * sy2)
        + s2 * (sy1 * s12 - s11 * sy2)
    )
    d1 = (
        n * (sy1 * s22 - s12 * sy2)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * sy2 - sy1 * s2)
    )
    d2 = (
        n * (s11 * sy2 - sy1 * s12)
        - s1 * (s1 * sy2 - sy1 * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    b0 = d0 / F.nullif(det, F.lit(0.0))
    b1 = d1 / F.nullif(det, F.lit(0.0))
    b2 = d2 / F.nullif(det, F.lit(0.0))
    staged = sums.select(
        F.col("n"),
        b0.alias("b0"),
        b1.alias("b1"),
        b2.alias("b2"),
        F.col("s_0_0").alias("x11"),
        F.col("s_0_1").alias("x12"),
        F.col("s_1_1").alias("x22"),
        s1.alias("x1"),
        s2.alias("x2"),
        sy.alias("xy"),
        sy1.alias("xy1"),
        sy2.alias("xy2"),
        F.col("syy").alias("xyy"),
    )
    nn = F.col("n").cast("double")
    quad = (
        F.col("b0") * F.col("b0") * nn
        + F.col("b1") * F.col("b1") * F.col("x11")
        + F.col("b2") * F.col("b2") * F.col("x22")
        + 2.0 * F.col("b0") * F.col("b1") * F.col("x1")
        + 2.0 * F.col("b0") * F.col("b2") * F.col("x2")
        + 2.0 * F.col("b1") * F.col("b2") * F.col("x12")
    )
    dot = (
        F.col("b0") * F.col("xy")
        + F.col("b1") * F.col("xy1")
        + F.col("b2") * F.col("xy2")
    )
    sse = F.col("xyy") - 2.0 * dot + quad
    sst = F.col("xyy") - F.col("xy") * F.col("xy") / nn
    return staged.select(
        F.col("n"),
        F.col("b0"),
        F.col("b1"),
        F.col("b2"),
        F.sqrt(F.greatest(sse, F.lit(0.0)) / nn).alias("rmse"),
        (F.lit(1.0) - sse / F.nullif(sst, F.lit(0.0))).alias("r2"),
    )


def predict_expr(x_cols: Sequence[str], coef: Sequence[float]) -> Column:
    """The fitted model as a pure codegen expression: ``b0 + Σ bᵢxᵢ``
    with coefficients folded in as literals — no join, no UDF."""
    expr: Column = F.lit(float(coef[0]))
    for c, b in zip(x_cols, coef[1:]):
        expr = expr + F.lit(float(b)) * _d(c)
    return expr


def residual_summary(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    coef: Sequence[float],
    by: Sequence[str] = (),
) -> DataFrame:
    """Per-group residual diagnostics of a fitted linear model:
    ``(by..., n, rmse, mae, bias)`` where ``bias`` is the mean signed
    residual ``avg(y − ŷ)``. One scan, one shuffle of four doubles
    per group; the model itself is a literal projection
    (``predict_expr``)."""
    cond = F.col(y_col).isNotNull()
    for c in x_cols:
        cond = cond & F.col(c).isNotNull()
    resid = _d(y_col) - predict_expr(x_cols, coef)
    return (
        df.where(cond)
        .select(*[F.col(c) for c in by], resid.alias("_r"))
        .groupBy(*[F.col(c) for c in by])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sqrt(F.avg(F.col("_r") * F.col("_r"))).alias("rmse"),
            F.avg(F.abs(F.col("_r"))).alias("mae"),
            F.avg(F.col("_r")).alias("bias"),
        )
    )


def huber_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    delta_k: float = 1.345,
    iters: int = 2,
) -> DataFrame:
    """Huber-loss robust simple regression via IRLS.

    Round 0 is the closed-form OLS; the Huber threshold is then FROZEN
    at ``δ = delta_k · √(SSE₀/n)`` (a deterministic std-based scale —
    stated: classic IRLS re-estimates a MAD scale per round, this
    variant trades that for exact SQL reproducibility). Each of the
    ``iters`` reweighted rounds computes weighted normal-equation sums
    with ``w = min(1, δ/|r|)`` — the weight is a CODEGEN EXPRESSION
    over the previous round's coefficients folded in as literals, so
    every round is one scan + one 1-row collect, the same flat
    iteration shape as the K-Means loop (operators/kmeans.py:306).

    Returns a one-row DataFrame ``(n, slope, intercept, delta, w_sum,
    rmse)``: final coefficients, the frozen threshold, the total
    weight mass (n − w_sum measures how much outlier influence was
    clipped), and the UNWEIGHTED rmse of the final fit (computed from
    the round-0 sums and final coefficients — no extra pass).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    x, y = _d(x_col), _d(y_col)
    rows = df.where(x.isNotNull() & y.isNotNull())
    s0 = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    ).collect()[0]
    n = s0["n"]
    det = n * s0["sxx"] - s0["sx"] * s0["sx"]
    slope = (n * s0["sxy"] - s0["sx"] * s0["sy"]) / det
    intercept = (s0["sy"] - slope * s0["sx"]) / n

    def sse(b0: float, b1: float) -> float:
        return (
            s0["syy"]
            + n * b0 * b0
            + b1 * b1 * s0["sxx"]
            + 2.0 * b0 * b1 * s0["sx"]
            - 2.0 * b0 * s0["sy"]
            - 2.0 * b1 * s0["sxy"]
        )

    delta = delta_k * (max(sse(intercept, slope), 0.0) / n) ** 0.5
    w_sum = n
    for _ in range(iters):
        r = y - (F.lit(intercept) + F.lit(slope) * x)
        # ANSI mode raises DIVIDE_BY_ZERO even on doubles, so gate the
        # division: |r| <= delta (incl. exact-fit |r|=0) keeps w=1, and
        # the divide branch only evaluates when |r| > delta >= 0.
        w = F.when(F.abs(r) <= F.lit(delta), F.lit(1.0)).otherwise(
            F.lit(delta) / F.abs(r)
        )
        sw = rows.agg(
            F.sum(w).alias("sw"),
            F.sum(w * x).alias("swx"),
            F.sum(w * y).alias("swy"),
            F.sum(w * x * y).alias("swxy"),
            F.sum(w * x * x).alias("swxx"),
        ).collect()[0]
        wdet = sw["sw"] * sw["swxx"] - sw["swx"] * sw["swx"]
        slope = (sw["sw"] * sw["swxy"] - sw["swx"] * sw["swy"]) / wdet
        intercept = (sw["swy"] - slope * sw["swx"]) / sw["sw"]
        w_sum = sw["sw"]
    rmse = (max(sse(intercept, slope), 0.0) / n) ** 0.5
    spark = df.sparkSession
    return _k_row_df(spark, 
        [
            (
                int(n),
                float(slope),
                float(intercept),
                float(delta),
                float(w_sum),
                float(rmse),
            )
        ],
        "n long, slope double, intercept double, delta double, "
        "w_sum double, rmse double",
    )


def logistic_newton(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    *,
    iters: int = 3,
) -> DataFrame:
    """Binary logistic regression (2 features + intercept) trained by
    Newton-Raphson IRLS — the canonical quality-classifier fit (GPT-3
    WebText filter shape) expressed as flat Spark iteration.

    Each Newton round is ONE narrow scan: the current coefficients are
    folded in as codegen literals, the round aggregates the gradient
    ``X'(y − p)`` (3 sums) and the symmetric Hessian ``X'WX`` with
    ``w = p(1−p)`` (6 sums), and the driver applies the exact 3×3
    Cramer-adjugate step ``β += H⁻¹g`` on the collected 1-row result
    (same zero-driver-math doctrine as ``fit_ridge``: the formula is
    explicit so the pure-SQL oracle shares it term for term). A final
    scan scores the fit: log-loss uses the overflow-stable form
    ``max(z,0) − y·z + ln(1+exp(−|z|))`` so no ±inf appears at any z.

    Returns one row ``(n, b0, b1, b2, log_loss, accuracy, pos_rate)``.
    Starting point is β = 0 (p = ½ everywhere), so round 1 is exactly
    the weighted-least-squares step every IRLS derivation opens with.

    At 100 TB: ``iters + 1`` scans, each shuffling nine doubles total;
    nothing row-sized ever reaches the driver.
    """
    if len(x_cols) != 2:
        raise ValueError(
            f"logistic_newton is the explicit 2-feature closed form, "
            f"got {len(x_cols)} features (use MLlib for general p)"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    x1, x2, y = _d(x_cols[0]), _d(x_cols[1]), _d(y_col)
    rows = df.where(
        x1.isNotNull() & x2.isNotNull() & y.isNotNull()
    )
    b0 = b1 = b2 = 0.0
    for _ in range(iters):
        z = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (F.lit(1.0) - p)
        r = y - p
        s = rows.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(r).alias("g0"),
            F.sum(r * x1).alias("g1"),
            F.sum(r * x2).alias("g2"),
            F.sum(w).alias("h00"),
            F.sum(w * x1).alias("h01"),
            F.sum(w * x2).alias("h02"),
            F.sum(w * x1 * x1).alias("h11"),
            F.sum(w * x1 * x2).alias("h12"),
            F.sum(w * x2 * x2).alias("h22"),
        ).collect()[0]
        det = (
            s["h00"] * (s["h11"] * s["h22"] - s["h12"] * s["h12"])
            - s["h01"] * (s["h01"] * s["h22"] - s["h12"] * s["h02"])
            + s["h02"] * (s["h01"] * s["h12"] - s["h11"] * s["h02"])
        )
        if det == 0.0:
            raise ValueError(
                "singular Hessian: features are collinear or constant"
            )
        b0 = b0 + (
            (s["h11"] * s["h22"] - s["h12"] * s["h12"]) * s["g0"]
            + (s["h02"] * s["h12"] - s["h01"] * s["h22"]) * s["g1"]
            + (s["h01"] * s["h12"] - s["h02"] * s["h11"]) * s["g2"]
        ) / det
        b1 = b1 + (
            (s["h02"] * s["h12"] - s["h01"] * s["h22"]) * s["g0"]
            + (s["h00"] * s["h22"] - s["h02"] * s["h02"]) * s["g1"]
            + (s["h01"] * s["h02"] - s["h00"] * s["h12"]) * s["g2"]
        ) / det
        b2 = b2 + (
            (s["h01"] * s["h12"] - s["h02"] * s["h11"]) * s["g0"]
            + (s["h01"] * s["h02"] - s["h00"] * s["h12"]) * s["g1"]
            + (s["h00"] * s["h11"] - s["h01"] * s["h01"]) * s["g2"]
        ) / det
    z = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
    loss = (
        F.greatest(z, F.lit(0.0)) - y * z
        + F.log(F.lit(1.0) + F.exp(-F.abs(z)))
    )
    hit = (
        F.when((z >= 0) == (y >= F.lit(0.5)), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(b0).alias("b0"),
        F.lit(b1).alias("b1"),
        F.lit(b2).alias("b2"),
        F.avg(loss).alias("log_loss"),
        F.avg(hit).alias("accuracy"),
        F.avg(y).alias("pos_rate"),
    )


#: default λ grid for ridge_lambda_sweep (decades around the contracts'
#: _RIDGE_L2=1000 operating point)
SWEEP_LAMBDAS = (0.0, 1.0, 10.0, 100.0, 1000.0, 10000.0)


def ridge_lambda_sweep(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    split_key: str,
    *,
    lambdas: Sequence[float] = SWEEP_LAMBDAS,
    test_pct: int = 20,
) -> DataFrame:
    """Hyperparameter sweep from sufficient statistics: validation-
    scored ridge over a λ grid at the cost of ONE scan, total.

    The train/validation split is the deterministic md5-bucket split
    (sampling.py doctrine), and both splits' Gram/moment sums are
    computed in the same pass as conditional aggregates — 20 doubles
    out. Every λ is then pure arithmetic: coefficients from the train
    sums (the exact Cramer formulas of ``ridge_coefficients_df``,
    λ on slopes only), train RMSE from the train sums, and validation
    RMSE from the VALIDATION sums with the train coefficients via
    ``SSE = Σy² − 2bᵀX'y + bᵀ(X'X)b`` — model selection with no
    second data pass, no per-λ job, no cross-validation shuffle.

    Returns ``|lambdas|`` rows ``(l2, b0, b1, b2, train_rmse,
    val_rmse)`` ordered as given. 2 features exactly (the explicit
    closed form shared with the SQL oracle).
    """
    if len(x_cols) != 2:
        raise ValueError(
            f"ridge_lambda_sweep is the explicit 2-feature closed "
            f"form, got {len(x_cols)}"
        )
    if not lambdas:
        raise ValueError("lambdas must be non-empty")
    if not 0 < test_pct < 100:
        raise ValueError(f"test_pct must be in (0, 100), got {test_pct}")
    from .sampling import hash_bucket

    x1, x2, y = _d(x_cols[0]), _d(x_cols[1]), _d(y_col)
    rows = df.where(x1.isNotNull() & x2.isNotNull() & y.isNotNull())
    is_val = hash_bucket(split_key, 100) < F.lit(test_pct)

    def _sums(tag: str, cond):
        def c(expr, name):
            return F.sum(F.when(cond, expr).otherwise(F.lit(0.0))).alias(
                f"{tag}_{name}"
            )

        return [
            c(F.lit(1.0), "n"),
            c(x1, "s1"), c(x2, "s2"),
            c(x1 * x1, "x11"), c(x1 * x2, "x12"), c(x2 * x2, "x22"),
            c(y, "sy"), c(x1 * y, "sy1"), c(x2 * y, "sy2"),
            c(y * y, "syy"),
        ]

    s = rows.agg(*_sums("t", ~is_val), *_sums("v", is_val)).collect()[0]

    def sse(b0, b1, b2, p):
        return (
            s[f"{p}_syy"]
            - 2.0 * (b0 * s[f"{p}_sy"] + b1 * s[f"{p}_sy1"] + b2 * s[f"{p}_sy2"])
            + (
                b0 * b0 * s[f"{p}_n"]
                + b1 * b1 * s[f"{p}_x11"]
                + b2 * b2 * s[f"{p}_x22"]
                + 2.0 * b0 * b1 * s[f"{p}_s1"]
                + 2.0 * b0 * b2 * s[f"{p}_s2"]
                + 2.0 * b1 * b2 * s[f"{p}_x12"]
            )
        )

    n, s1, s2 = s["t_n"], s["t_s1"], s["t_s2"]
    x11, x12, x22 = s["t_x11"], s["t_x12"], s["t_x22"]
    sy, sy1, sy2 = s["t_sy"], s["t_sy1"], s["t_sy2"]
    out = []
    for lam in lambdas:
        a11, a12, a22 = x11 + lam, x12, x22 + lam
        det = (
            n * (a11 * a22 - a12 * a12)
            - s1 * (s1 * a22 - a12 * s2)
            + s2 * (s1 * a12 - a11 * s2)
        )
        if det == 0.0:
            raise ValueError(f"singular system at lambda={lam}")
        b0 = (
            sy * (a11 * a22 - a12 * a12)
            - s1 * (sy1 * a22 - a12 * sy2)
            + s2 * (sy1 * a12 - a11 * sy2)
        ) / det
        b1 = (
            n * (sy1 * a22 - a12 * sy2)
            - sy * (s1 * a22 - a12 * s2)
            + s2 * (s1 * sy2 - sy1 * s2)
        ) / det
        b2 = (
            n * (a11 * sy2 - sy1 * a12)
            - s1 * (s1 * sy2 - sy1 * s2)
            + sy * (s1 * a12 - a11 * s2)
        ) / det
        out.append(
            (
                float(lam),
                float(b0),
                float(b1),
                float(b2),
                float(max(sse(b0, b1, b2, "t"), 0.0) / n) ** 0.5,
                float(max(sse(b0, b1, b2, "v"), 0.0) / s["v_n"]) ** 0.5,
            )
        )
    return _k_row_df(df.sparkSession, 
        out,
        "l2 double, b0 double, b1 double, b2 double, "
        "train_rmse double, val_rmse double",
    )


def ols_learning_curve(
    df: DataFrame,
    x_col: str,
    y_col: str,
    split_key: str,
    *,
    test_pct: int = 20,
) -> DataFrame:
    """Learning curve without re-training: validation RMSE of simple
    OLS fitted on nested 10%..100% slices of the training split — all
    ten fits from ONE scan, fully declaratively (no driver math, no
    collect).

    Slice membership is a salted md5 bucket (``md5(key || '#lc')``),
    independent of the train/validation split hash, and nested by
    construction (bucket < f). The scan reduces the training rows to
    PER-DECILE OLS sums; a 10-row cumulative window turns those into
    per-fraction sums; slope/intercept are closed-form expressions;
    and the validation sums (same scan, conditional aggregate,
    broadcast back) price every fit via the SSE identity
    ``Σy² + n·b₀² + b₁²Σx² + 2b₀b₁Σx − 2b₀Σy − 2b₁Σxy``.

    The "is more data still helping" diagnostic every corpus builder
    runs — at the cost of one pass, whatever the corpus size. Deciles
    with no rows (tiny inputs) simply produce no row; downstream sees
    the fractions that exist.

    Returns up to 10 rows ``(pct, n_train, slope, intercept,
    train_rmse, val_rmse)`` with ``pct ∈ {10,...,100}``.
    """
    if not 0 < test_pct < 100:
        raise ValueError(f"test_pct must be in (0, 100), got {test_pct}")
    from pyspark.sql.window import Window

    from .dedup import md5_int60
    from .sampling import hash_bucket

    x, y = _d(x_col), _d(y_col)
    rows = df.where(
        x.isNotNull() & y.isNotNull() & F.col(split_key).isNotNull()
    )
    is_val = hash_bucket(split_key, 100) < F.lit(test_pct)
    dec = (
        (
            md5_int60(
                F.concat(F.col(split_key).cast("string"), F.lit("#lc"))
            )
            % 100
        )
        / 10
    ).cast("int")

    train_dec = (
        rows.where(~is_val)
        .groupBy(dec.alias("dec"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
    )
    val = rows.where(is_val).agg(
        F.count(F.lit(1)).cast("double").alias("vn"),
        F.sum(x).alias("vsx"),
        F.sum(y).alias("vsy"),
        F.sum(x * y).alias("vsxy"),
        F.sum(x * x).alias("vsxx"),
        F.sum(y * y).alias("vsyy"),
    )
    w = Window.orderBy("dec").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = train_dec.select(
        ((F.col("dec") + 1) * 10).alias("pct"),
        F.sum("n").over(w).alias("n"),
        F.sum("sx").over(w).alias("sx"),
        F.sum("sy").over(w).alias("sy"),
        F.sum("sxy").over(w).alias("sxy"),
        F.sum("sxx").over(w).alias("sxx"),
        F.sum("syy").over(w).alias("syy"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    scored = cum.withColumn("slope", slope).withColumn(
        "intercept",
        (F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"),
    )

    def _sse(syy, n, sx, sy, sxy, sxx):
        b0, b1 = F.col("intercept"), F.col("slope")
        return (
            F.col(syy)
            + F.col(n) * b0 * b0
            + b1 * b1 * F.col(sxx)
            + F.lit(2.0) * b0 * b1 * F.col(sx)
            - F.lit(2.0) * b0 * F.col(sy)
            - F.lit(2.0) * b1 * F.col(sxy)
        )

    return scored.crossJoin(F.broadcast(val)).select(
        "pct",
        F.col("n").cast("long").alias("n_train"),
        "slope",
        "intercept",
        F.sqrt(
            F.greatest(_sse("syy", "n", "sx", "sy", "sxy", "sxx"), F.lit(0.0))
            / F.col("n")
        ).alias("train_rmse"),
        F.sqrt(
            F.greatest(
                _sse("vsyy", "vn", "vsx", "vsy", "vsxy", "vsxx"), F.lit(0.0)
            )
            / F.nullif(F.col("vn"), F.lit(0.0))
        ).alias("val_rmse"),
    )


def lasso_cd(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    *,
    l1: float,
    rounds: int = 10,
) -> DataFrame:
    """L1-penalized (lasso) regression by cyclic coordinate descent —
    the sparsity-inducing member of the regularized family
    (``fit_ridge`` is L2; this one can zero a coefficient out
    entirely, which is the feature-selection story).

    The trick that makes it ONE data scan total: with 2 features, every
    residual inner product CD needs expands linearly in the current
    coefficients over the Gram/moment sums — so after the single
    Gram-collecting scan, all ``rounds`` cyclic updates are pure
    driver arithmetic (and the SQL oracle replays them as chained
    1-row CTEs). Loss convention ``½Σr² + l1·Σ|b|``: update
    ``b_j ← S(ρ_j, l1)/x_jj`` with
    ``ρ_j = sy_j − b0·s_j − b_k·x_jk`` and soft-threshold
    ``S(z, g) = sign(z)·max(|z| − g, 0)``; intercept (unpenalized)
    re-centers as the mean residual each cycle.

    Returns one row ``(n, b0, b1, b2, rmse, nnz)`` — ``nnz`` counts
    the surviving slopes, rmse from the same sums (no extra pass).
    """
    if len(x_cols) != 2:
        raise ValueError(
            f"lasso_cd is the explicit 2-feature closed form, got "
            f"{len(x_cols)}"
        )
    if l1 < 0:
        raise ValueError(f"l1 must be >= 0, got {l1}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    x1, x2, y = _d(x_cols[0]), _d(x_cols[1]), _d(y_col)
    rows = df.where(x1.isNotNull() & x2.isNotNull() & y.isNotNull())
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("x11"),
        F.sum(x1 * x2).alias("x12"),
        F.sum(x2 * x2).alias("x22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("sy1"),
        F.sum(x2 * y).alias("sy2"),
        F.sum(y * y).alias("syy"),
    ).collect()[0]
    n = s["n"]
    if s["x11"] == 0.0 or s["x22"] == 0.0:
        raise ValueError("a feature is identically zero")

    def soft(z: float, g: float) -> float:
        mag = abs(z) - g
        if mag <= 0.0:
            return 0.0
        return mag if z > 0 else -mag

    b0 = b1 = b2 = 0.0
    for _ in range(rounds):
        b0 = (s["sy"] - b1 * s["s1"] - b2 * s["s2"]) / n
        rho1 = s["sy1"] - b0 * s["s1"] - b2 * s["x12"]
        b1 = soft(rho1, l1) / s["x11"]
        rho2 = s["sy2"] - b0 * s["s2"] - b1 * s["x12"]
        b2 = soft(rho2, l1) / s["x22"]
    sse = (
        s["syy"]
        + n * b0 * b0
        + b1 * b1 * s["x11"]
        + b2 * b2 * s["x22"]
        + 2.0 * b0 * b1 * s["s1"]
        + 2.0 * b0 * b2 * s["s2"]
        + 2.0 * b1 * b2 * s["x12"]
        - 2.0 * b0 * s["sy"]
        - 2.0 * b1 * s["sy1"]
        - 2.0 * b2 * s["sy2"]
    )
    return _k_row_df(df.sparkSession, 
        [
            (
                int(n),
                float(b0),
                float(b1),
                float(b2),
                float(max(sse, 0.0) / n) ** 0.5,
                int((b1 != 0.0) + (b2 != 0.0)),
            )
        ],
        "n long, b0 double, b1 double, b2 double, rmse double, nnz long",
    )


def simpsons_check(
    df: DataFrame,
    x_col: str,
    y_col: str,
    stratum_col: str,
) -> DataFrame:
    """Simpson's-paradox screen: does the POOLED x→y trend disagree in
    sign with every (or any) within-stratum trend? The one-query guard
    against reading a confounded aggregate ("discounts raise revenue —
    except inside every single month").

    One scan computes pooled OLS sums AND per-stratum sums (the
    stratum aggregate reuses the same shuffle); slopes are the
    closed-form arithmetic of ``grouped_ols``. Strata with undefined
    slopes (constant x) are excluded from the min/max. ``reversed``
    flags the paradox proper: every defined stratum slope opposes the
    pooled sign.

    Returns one row ``(n, n_strata, pooled_slope, min_stratum_slope,
    max_stratum_slope, n_opposing, reversed)``.
    """
    x, y = _d(x_col), _d(y_col)
    rows = df.where(
        x.isNotNull() & y.isNotNull() & F.col(stratum_col).isNotNull()
    )
    per = rows.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    sl = per.select(
        "n", "sx", "sy", "sxy", "sxx", slope.alias("slope")
    )
    pooled_n = F.sum("n")
    pooled = (
        pooled_n * F.sum("sxy") - F.sum("sx") * F.sum("sy")
    ) / F.nullif(
        pooled_n * F.sum("sxx") - F.sum("sx") * F.sum("sx"), F.lit(0.0)
    )
    opposing = F.sum(
        F.when(
            F.col("slope").isNotNull()
            & (F.signum(F.col("slope")) != F.signum(pooled)),
            1,
        ).otherwise(0)
    )
    # NOTE: aggregates of aggregates are fine here — every input to
    # the outer agg is a column of the |strata|-row table
    agg = sl.agg(
        pooled_n.cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_strata"),
        pooled.alias("pooled_slope"),
        F.min("slope").alias("min_stratum_slope"),
        F.max("slope").alias("max_stratum_slope"),
        F.count(F.col("slope")).alias("_defined"),
    )
    per_sign = sl.crossJoin(
        F.broadcast(agg.select(F.col("pooled_slope").alias("_ps")))
    ).agg(
        F.sum(
            F.when(
                F.col("slope").isNotNull()
                & (F.signum(F.col("slope")) != F.signum(F.col("_ps"))),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_opposing")
    )
    return agg.crossJoin(F.broadcast(per_sign)).select(
        "n",
        "n_strata",
        "pooled_slope",
        "min_stratum_slope",
        "max_stratum_slope",
        "n_opposing",
        (
            (F.col("n_opposing") == F.col("_defined"))
            & (F.col("_defined") > 0)
        ).alias("reversed"),
    )


def lmg_importance(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
) -> DataFrame:
    """Exact Shapley (LMG) decomposition of the 2-feature OLS R²:
    each feature's importance is its R² contribution averaged over
    both orders of entry — the standard answer to "which predictor
    matters more" when the predictors are correlated and their
    marginal R²s overlap (Lindeman-Merenda-Gold; Grömping 2007).

    With p=2 the Shapley average is closed-form over THREE fits —
    x₁ alone, x₂ alone, both — and all three are arithmetic on the
    same one-scan Gram sums (simple-OLS R²s plus the 2-feature R² via
    the ridge-at-λ=0 Cramer solve). ``lmg_1 + lmg_2 = R²_full``
    exactly, which is the property marginal R²s lack.

    Returns one row ``(n, r2_x1, r2_x2, r2_full, lmg_x1, lmg_x2)``;
    degenerate fits yield NULLs via the shared nullif guards.
    """
    if len(x_cols) != 2:
        raise ValueError(
            f"lmg_importance is the explicit 2-feature closed form, "
            f"got {len(x_cols)}"
        )
    x1, x2, y = _d(x_cols[0]), _d(x_cols[1]), _d(y_col)
    rows = df.where(x1.isNotNull() & x2.isNotNull() & y.isNotNull())
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("x11"),
        F.sum(x1 * x2).alias("x12"),
        F.sum(x2 * x2).alias("x22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("sy1"),
        F.sum(x2 * y).alias("sy2"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    syy_c = n * F.col("syy") - F.col("sy") * F.col("sy")

    def r2_single(sx, sxx, sxy):
        num = n * F.col(sxy) - F.col(sx) * F.col("sy")
        den = (n * F.col(sxx) - F.col(sx) * F.col(sx)) * syy_c
        return num * num / F.nullif(den, F.lit(0.0))

    # full model via the lambda=0 Cramer solve (fit_ridge formulas)
    a11, a12, a22 = F.col("x11"), F.col("x12"), F.col("x22")
    det = (
        n * (a11 * a22 - a12 * a12)
        - F.col("s1") * (F.col("s1") * a22 - a12 * F.col("s2"))
        + F.col("s2") * (F.col("s1") * a12 - a11 * F.col("s2"))
    )
    b0 = (
        F.col("sy") * (a11 * a22 - a12 * a12)
        - F.col("s1") * (F.col("sy1") * a22 - a12 * F.col("sy2"))
        + F.col("s2") * (F.col("sy1") * a12 - a11 * F.col("sy2"))
    ) / F.nullif(det, F.lit(0.0))
    b1 = (
        n * (F.col("sy1") * a22 - a12 * F.col("sy2"))
        - F.col("sy") * (F.col("s1") * a22 - a12 * F.col("s2"))
        + F.col("s2") * (F.col("s1") * F.col("sy2") - F.col("sy1") * F.col("s2"))
    ) / F.nullif(det, F.lit(0.0))
    b2 = (
        n * (a11 * F.col("sy2") - F.col("sy1") * a12)
        - F.col("s1") * (F.col("s1") * F.col("sy2") - F.col("sy1") * F.col("s2"))
        + F.col("sy") * (F.col("s1") * a12 - a11 * F.col("s2"))
    ) / F.nullif(det, F.lit(0.0))
    sse_full = (
        F.col("syy")
        - 2.0 * (b0 * F.col("sy") + b1 * F.col("sy1") + b2 * F.col("sy2"))
        + (
            b0 * b0 * n
            + b1 * b1 * F.col("x11")
            + b2 * b2 * F.col("x22")
            + 2.0 * b0 * b1 * F.col("s1")
            + 2.0 * b0 * b2 * F.col("s2")
            + 2.0 * b1 * b2 * F.col("x12")
        )
    )
    r2_full = F.lit(1.0) - sse_full / F.nullif(
        F.col("syy") - F.col("sy") * F.col("sy") / n, F.lit(0.0)
    )
    r2_1 = r2_single("s1", "x11", "sy1")
    r2_2 = r2_single("s2", "x22", "sy2")
    lmg1 = (r2_1 + (r2_full - r2_2)) / F.lit(2.0)
    lmg2 = (r2_2 + (r2_full - r2_1)) / F.lit(2.0)
    return s.select(
        n.cast("long").alias("n"),
        r2_1.alias("r2_x1"),
        r2_2.alias("r2_x2"),
        r2_full.alias("r2_full"),
        lmg1.alias("lmg_x1"),
        lmg2.alias("lmg_x2"),
    )


def influence_summary(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    threshold_factor: float = 4.0,
) -> DataFrame:
    """Regression-influence screen for the simple OLS fit: Cook's
    distance per row — ``Dᵢ = rᵢ²·hᵢ / (p·s²·(1−hᵢ)²)`` with leverage
    ``hᵢ = 1/n + (xᵢ−x̄)²/Sxx`` and p=2 — summarized as the count of
    rows over the ``threshold_factor``/n rule plus the worst offender.
    The "which rows own my fit" audit: a slope can be an artifact of a
    handful of high-leverage points that RMSE never surfaces.

    Two scans (the huber/mahalanobis doctrine): fit sums once, then
    score with x̄/Sxx/s²/coefficients folded in as literals — Cook's D
    is a pure codegen expression, no join, no window.

    Returns one row ``(n, slope, intercept, max_cooks, n_influential,
    influential_rate)``. Degenerate fits (no x variance, n ≤ 2) raise.
    """
    if threshold_factor <= 0:
        raise ValueError(
            f"threshold_factor must be positive, got {threshold_factor}"
        )
    x, y = _d(x_col), _d(y_col)
    rows = df.where(x.isNotNull() & y.isNotNull())
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    ).collect()[0]
    n = s["n"]
    det = n * s["sxx"] - s["sx"] * s["sx"]
    if n <= 2 or det == 0.0:
        raise ValueError("need n > 2 rows with x variance")
    slope = (n * s["sxy"] - s["sx"] * s["sy"]) / det
    intercept = (s["sy"] - slope * s["sx"]) / n
    xbar = s["sx"] / n
    sxx_c = s["sxx"] - n * xbar * xbar
    sse = (
        s["syy"]
        + n * intercept * intercept
        + slope * slope * s["sxx"]
        + 2.0 * intercept * slope * s["sx"]
        - 2.0 * intercept * s["sy"]
        - 2.0 * slope * s["sxy"]
    )
    s2 = max(sse, 0.0) / (n - 2.0)
    if s2 == 0.0:
        # exact fit: no residuals, nothing is influential
        return _k_row_df(df.sparkSession, 
            [(int(n), float(slope), float(intercept), 0.0, 0, 0.0)],
            "n long, slope double, intercept double, max_cooks double, "
            "n_influential long, influential_rate double",
        )
    r = y - (F.lit(intercept) + F.lit(slope) * x)
    h = F.lit(1.0 / n) + (x - F.lit(xbar)) * (x - F.lit(xbar)) / F.lit(
        sxx_c
    )
    d = (
        r
        * r
        * h
        / (
            F.lit(2.0 * s2)
            * (F.lit(1.0) - h)
            * (F.lit(1.0) - h)
        )
    )
    thresh = threshold_factor / n
    return rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(slope).alias("slope"),
        F.lit(intercept).alias("intercept"),
        F.max(d).alias("max_cooks"),
        F.sum(F.when(d > F.lit(thresh), 1).otherwise(0))
        .cast("long")
        .alias("n_influential"),
        (
            F.sum(F.when(d > F.lit(thresh), 1.0).otherwise(0.0))
            / F.count(F.lit(1)).cast("double")
        ).alias("influential_rate"),
    )


def chow_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    split,
) -> DataFrame:
    """Chow structural-break test: did the x→y line CHANGE across a
    known split (a policy date, a deploy, a schema migration)?
    ``F = ((SSE_p − SSE_1 − SSE_2)/k) / ((SSE_1+SSE_2)/(n−2k))`` with
    k=2 parameters — the regression counterpart of
    :func:`~..timeseries.changepoint_argmax` (which finds WHERE a
    LEVEL moved; Chow asks whether a RELATIONSHIP moved at a given
    point). ``split`` is a boolean Column marking segment 2.

    One scan of segment-conditional OLS sums (pooled sums are their
    exact totals — no third fit); SSEs via the closed-form identity.
    Degenerate segments (n ≤ 2 or no x variance) yield NULL F.

    Returns one row ``(n1, n2, slope_1, slope_2, f_stat, df1, df2)``.
    """
    x, y = _d(x_col), _d(y_col)
    rows = df.where(x.isNotNull() & y.isNotNull())

    def seg(cond, tag):
        def c(expr, name):
            return F.sum(F.when(cond, expr).otherwise(F.lit(0.0))).alias(
                f"{tag}{name}"
            )

        return [
            c(F.lit(1.0), "n"), c(x, "sx"), c(y, "sy"),
            c(x * y, "sxy"), c(x * x, "sxx"), c(y * y, "syy"),
        ]

    s = rows.agg(*seg(~split, "a"), *seg(split, "b"))

    def fit(tag):
        n = F.col(f"{tag}n")
        det = n * F.col(f"{tag}sxx") - F.col(f"{tag}sx") * F.col(f"{tag}sx")
        slope = (
            n * F.col(f"{tag}sxy") - F.col(f"{tag}sx") * F.col(f"{tag}sy")
        ) / F.nullif(det, F.lit(0.0))
        intercept = (
            F.col(f"{tag}sy") - slope * F.col(f"{tag}sx")
        ) / F.nullif(n, F.lit(0.0))
        sse = (
            F.col(f"{tag}syy")
            + n * intercept * intercept
            + slope * slope * F.col(f"{tag}sxx")
            + F.lit(2.0) * intercept * slope * F.col(f"{tag}sx")
            - F.lit(2.0) * intercept * F.col(f"{tag}sy")
            - F.lit(2.0) * slope * F.col(f"{tag}sxy")
        )
        return slope, sse

    # pooled sums are exact totals of the two segments
    pn = F.col("an") + F.col("bn")
    psums = {
        k: F.col(f"a{k}") + F.col(f"b{k}")
        for k in ("sx", "sy", "sxy", "sxx", "syy")
    }
    pdet = pn * psums["sxx"] - psums["sx"] * psums["sx"]
    pslope = (pn * psums["sxy"] - psums["sx"] * psums["sy"]) / F.nullif(
        pdet, F.lit(0.0)
    )
    pint = (psums["sy"] - pslope * psums["sx"]) / F.nullif(pn, F.lit(0.0))
    psse = (
        psums["syy"]
        + pn * pint * pint
        + pslope * pslope * psums["sxx"]
        + F.lit(2.0) * pint * pslope * psums["sx"]
        - F.lit(2.0) * pint * psums["sy"]
        - F.lit(2.0) * pslope * psums["sxy"]
    )
    s1, sse1 = fit("a")
    s2, sse2 = fit("b")
    df2 = pn - F.lit(4.0)
    f_stat = ((psse - sse1 - sse2) / F.lit(2.0)) / F.nullif(
        (sse1 + sse2) / F.nullif(df2, F.lit(0.0)), F.lit(0.0)
    )
    return s.select(
        F.col("an").cast("long").alias("n1"),
        F.col("bn").cast("long").alias("n2"),
        s1.alias("slope_1"),
        s2.alias("slope_2"),
        f_stat.alias("f_stat"),
        F.lit(2).cast("long").alias("df1"),
        df2.cast("long").alias("df2"),
    )


def poisson_newton(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    *,
    iters: int = 4,
) -> DataFrame:
    """Poisson regression (log link, 2 features + intercept) by
    Newton-Raphson — the GLM for COUNT responses (events per user,
    tokens per document, items per order), completing the family
    around :func:`logistic_newton` / ``negbin_fit``.

    Identical layering to logistic_newton: each round folds the
    current β in as literals and aggregates gradient ``X'(y − μ)``
    and Hessian ``X'WX`` with ``w = μ = exp(β'x)`` (one narrow scan,
    nine doubles shuffled); the driver applies the exact 3×3
    Cramer-adjugate step, term-for-term mirrored by the pure-SQL
    oracle. Final scan reports the Poisson deviance
    ``2 Σ [y·ln(y/μ) − (y − μ)]`` (y = 0 terms contribute 2μ).

    Newton is warm-started at the null model ``b0 = ln(mean(y))``,
    b1 = b2 = 0 (one tiny pre-aggregate): starting at β = 0 on a log
    link diverges whenever mean(y) ≫ 1 — the first step jumps the
    intercept to ≈ mean(y) − 1 and each later round only walks it
    back by ~1, so a fixed iteration budget returns transient
    garbage with astronomically large μ. From the null model the
    step is O(1) and Newton converges quadratically in ≤4 rounds.
    Divergence (non-finite or exploding steps) raises instead of
    silently returning a non-fit.

    Returns one row ``(n, b0, b1, b2, deviance, mean_mu)``.
    """
    if len(x_cols) != 2:
        raise ValueError(
            f"poisson_newton is the explicit 2-feature closed form, "
            f"got {len(x_cols)} features (use MLlib GLR for general p)"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    x1, x2, y = _d(x_cols[0]), _d(x_cols[1]), _d(y_col)
    rows = df.where(
        x1.isNotNull() & x2.isNotNull() & y.isNotNull() & (y >= 0)
    )
    mean_y = rows.agg(F.avg(y).alias("m")).collect()[0]["m"]
    if mean_y is None or mean_y <= 0.0:
        raise ValueError(
            "poisson_newton needs at least one row with mean(y) > 0"
        )
    b0, b1, b2 = math.log(mean_y), 0.0, 0.0
    for _ in range(iters):
        z = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
        mu = F.exp(z)
        r = y - mu
        s = rows.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(r).alias("g0"),
            F.sum(r * x1).alias("g1"),
            F.sum(r * x2).alias("g2"),
            F.sum(mu).alias("h00"),
            F.sum(mu * x1).alias("h01"),
            F.sum(mu * x2).alias("h02"),
            F.sum(mu * x1 * x1).alias("h11"),
            F.sum(mu * x1 * x2).alias("h12"),
            F.sum(mu * x2 * x2).alias("h22"),
        ).collect()[0]
        det = (
            s["h00"] * (s["h11"] * s["h22"] - s["h12"] * s["h12"])
            - s["h01"] * (s["h01"] * s["h22"] - s["h12"] * s["h02"])
            + s["h02"] * (s["h01"] * s["h12"] - s["h11"] * s["h02"])
        )
        if det == 0.0:
            raise ValueError(
                "singular Hessian: features are collinear or constant"
            )
        b0 = b0 + (
            (s["h11"] * s["h22"] - s["h12"] * s["h12"]) * s["g0"]
            + (s["h02"] * s["h12"] - s["h01"] * s["h22"]) * s["g1"]
            + (s["h01"] * s["h12"] - s["h02"] * s["h11"]) * s["g2"]
        ) / det
        b1 = b1 + (
            (s["h02"] * s["h12"] - s["h01"] * s["h22"]) * s["g0"]
            + (s["h00"] * s["h22"] - s["h02"] * s["h02"]) * s["g1"]
            + (s["h01"] * s["h02"] - s["h00"] * s["h12"]) * s["g2"]
        ) / det
        b2 = b2 + (
            (s["h01"] * s["h12"] - s["h02"] * s["h11"]) * s["g0"]
            + (s["h01"] * s["h02"] - s["h00"] * s["h12"]) * s["g1"]
            + (s["h00"] * s["h11"] - s["h01"] * s["h01"]) * s["g2"]
        ) / det
        if not all(math.isfinite(b) for b in (b0, b1, b2)):
            raise ValueError(
                "poisson_newton diverged (non-finite coefficients); "
                "check for extreme covariate scales"
            )
    z = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
    mu = F.exp(z)
    dev_term = F.when(
        y > 0, y * F.log(y / mu) - (y - mu)
    ).otherwise(mu)
    return rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.lit(b0).alias("b0"),
        F.lit(b1).alias("b1"),
        F.lit(b2).alias("b2"),
        (F.lit(2.0) * F.sum(dev_term)).alias("deviance"),
        F.avg(mu).alias("mean_mu"),
    )


def glm_fit(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    *,
    family: str = "poisson",
    link: str | None = None,
    max_iter: int = 25,
    tol: float = 1e-6,
    reg_param: float = 0.0,
) -> DataFrame:
    """General-p GLM via MLlib's ``GeneralizedLinearRegression`` —
    the escape hatch :func:`poisson_newton` / :func:`logistic_newton`
    point at when the feature count exceeds their explicit 2-feature
    closed forms.

    MLlib's GLR is the same IRLS the closed forms unroll, executed by
    the JVM over an assembled feature vector, with p×p normal
    equations solved per round — the standard scale shape for p up to
    a few thousand features (each round is one scan aggregating
    O(p²) doubles). ``family`` ∈ poisson | binomial | gaussian |
    gamma | tweedie; the canonical link is used unless ``link`` is
    given.

    Returns one row
    ``(n, intercept, coefficients, deviance, null_deviance, aic)``
    with ``coefficients`` an ``array<double>`` in ``x_cols`` order.
    There is no DuckDB oracle for this operator: MLlib's IRLS
    stopping rule and internal solver ordering are not reproducible
    as portable SQL, so its contract-grade checks are the PARITY
    tests against the hash-gated 2-feature closed forms
    (tests/test_regression.py::test_glm_fit_*) — tolerance-based,
    which is exactly what a converged-optimum comparison supports.
    """
    if not x_cols:
        raise ValueError("glm_fit needs at least one feature column")
    if family not in (
        "poisson", "binomial", "gaussian", "gamma", "tweedie"
    ):
        raise ValueError(f"unsupported family {family!r}")
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    cols = [F.col(c).cast("double").alias(c) for c in x_cols]
    y = F.col(y_col).cast("double").alias("_glm_y")
    rows = df.select(*cols, y).na.drop()
    assembled = VectorAssembler(
        inputCols=list(x_cols), outputCol="_glm_features"
    ).transform(rows)
    glr = GeneralizedLinearRegression(
        family=family,
        labelCol="_glm_y",
        featuresCol="_glm_features",
        maxIter=max_iter,
        tol=tol,
        regParam=reg_param,
    )
    if link is not None:
        glr = glr.setLink(link)
    model = glr.fit(assembled)
    summ = model.summary
    spark = df.sparkSession
    return _k_row_df(spark, 
        [(
            int(summ.numInstances),
            float(model.intercept),
            [float(c) for c in model.coefficients],
            float(summ.deviance),
            float(summ.nullDeviance),
            float(summ.aic),
        )],
        "n long, intercept double, coefficients array<double>, "
        "deviance double, null_deviance double, aic double",
    )


def quantile_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    tau: float = 0.5,
    iters: int = 3,
    eps: float = 1e-6,
) -> DataFrame:
    """Quantile (pinball-loss) simple regression via fixed-iteration
    IRLS — the conditional-τ-quantile line, the distribution-aware
    sibling of :func:`huber_ols` (τ=0.5 is LAD/median regression,
    Schlossmacher 1973; general τ per Koenker & Bassett 1978).

    Minimizing ``Σ ρ_τ(r)`` with ``ρ_τ(r) = r·(τ − 1[r<0])`` is
    approximated by reweighted least squares with the asymmetric
    weights ``w = (τ if r ≥ 0 else 1−τ) / max(|r|, eps)`` — each of
    the ``iters`` rounds computes weighted normal-equation sums where
    the weight is a CODEGEN EXPRESSION over the previous round's
    coefficients folded in as literals: one scan + one 1-row collect
    per round, the flat iteration shape of :func:`huber_ols`. Round 0
    warm-starts at the closed-form OLS. ``eps`` (the |r| floor that
    keeps the near-zero-residual weight bounded) is a FROZEN literal
    so the SQL oracle replays identical math.

    Stated honestly: fixed-iteration IRLS approaches but does not
    exactly solve the LP that defines the sample quantile line; the
    contract pins the REPRODUCIBLE iterate, and the pinball mean lets
    callers compare fits across τ.

    Returns one row ``(n, tau, slope, intercept, pinball_mean)`` —
    the final coefficients and the mean pinball loss of the final fit
    (one extra scan).
    """
    if not 0.0 < tau < 1.0:
        raise ValueError(f"tau must be in (0, 1), got {tau}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if eps <= 0.0:
        raise ValueError(f"eps must be > 0, got {eps}")
    x, y = _d(x_col), _d(y_col)
    rows = df.where(x.isNotNull() & y.isNotNull())
    s0 = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    ).collect()[0]
    n = s0["n"]
    det = n * s0["sxx"] - s0["sx"] * s0["sx"]
    slope = (n * s0["sxy"] - s0["sx"] * s0["sy"]) / det
    intercept = (s0["sy"] - slope * s0["sx"]) / n
    t, e = float(tau), float(eps)
    for _ in range(iters):
        r = y - (F.lit(intercept) + F.lit(slope) * x)
        w = F.when(r >= 0, F.lit(t)).otherwise(F.lit(1.0 - t)) / F.greatest(
            F.abs(r), F.lit(e)
        )
        sw = rows.agg(
            F.sum(w).alias("sw"),
            F.sum(w * x).alias("swx"),
            F.sum(w * y).alias("swy"),
            F.sum(w * x * y).alias("swxy"),
            F.sum(w * x * x).alias("swxx"),
        ).collect()[0]
        wdet = sw["sw"] * sw["swxx"] - sw["swx"] * sw["swx"]
        slope = (sw["sw"] * sw["swxy"] - sw["swx"] * sw["swy"]) / wdet
        intercept = (sw["swy"] - slope * sw["swx"]) / sw["sw"]
    r_fin = y - (F.lit(intercept) + F.lit(slope) * x)
    pin = F.when(r_fin >= 0, F.lit(t) * r_fin).otherwise(
        F.lit(t - 1.0) * r_fin
    )
    pb = rows.agg(F.avg(pin).alias("pb")).collect()[0]["pb"]
    spark = df.sparkSession
    return _k_row_df(spark, 
        [(int(n), t, float(slope), float(intercept), float(pb))],
        "n long, tau double, slope double, intercept double, "
        "pinball_mean double",
    )


def gamma_irls(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    *,
    iters: int = 4,
) -> DataFrame:
    """Gamma regression (log link, 2 features + intercept) by IRLS —
    the GLM for POSITIVE right-skewed responses (prices, latencies,
    spend per order), completing the family around
    :func:`poisson_newton` (counts) and :func:`logistic_newton`
    (binary).

    The log link is special for the Gamma family: with variance
    function ``V(μ) = μ²`` and ``dμ/dη = μ``, the IRLS working weight
    ``w = (dμ/dη)²/V(μ)`` is identically 1, so the normal-equation
    matrix ``X'WX = X'X`` is CONSTANT across rounds. One scan
    aggregates X'X (six doubles) and the warm start once; each IRLS
    round then rescans only the 3-vector ``X'z`` with working response

        z = η + y·exp(−η) − 1

    and re-solves ``β = (X'X)⁻¹ X'z`` on the driver via the exact
    3×3 Cramer adjugate (the poisson_newton term shapes, mirrored by
    the SQL oracle term for term). Warm start is the null model
    ``b0 = ln(mean(y))`` so every round's magnitudes stay O(1) — the
    poisson lesson about canon-stable intermediates.

    Final scan reports the Gamma deviance
    ``2 Σ [−ln(y/μ) + (y − μ)/μ]`` and the Pearson dispersion estimate
    ``φ̂ = Σ((y−μ)/μ)² / (n − 3)``.

    Returns one row ``(n, b0, b1, b2, deviance, dispersion, mean_mu)``.
    """
    if len(x_cols) != 2:
        raise ValueError(
            f"gamma_irls is the explicit 2-feature closed form, "
            f"got {len(x_cols)} features (use MLlib GLR for general p)"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    x1, x2, y = _d(x_cols[0]), _d(x_cols[1]), _d(y_col)
    rows = df.where(
        x1.isNotNull() & x2.isNotNull() & y.isNotNull() & (y > 0)
    )
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(y).alias("ybar"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
    ).collect()[0]
    if s["n"] == 0.0 or s["ybar"] is None or s["ybar"] <= 0.0:
        raise ValueError("gamma_irls needs at least one row with y > 0")
    h00, h01, h02 = s["n"], s["sx1"], s["sx2"]
    h11, h12, h22 = s["s11"], s["s12"], s["s22"]
    det = (
        h00 * (h11 * h22 - h12 * h12)
        - h01 * (h01 * h22 - h12 * h02)
        + h02 * (h01 * h12 - h11 * h02)
    )
    if det == 0.0:
        raise ValueError(
            "singular normal equations: features are collinear or constant"
        )
    b0, b1, b2 = math.log(s["ybar"]), 0.0, 0.0
    for _ in range(iters):
        eta = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
        z = eta + y * F.exp(-eta) - F.lit(1.0)
        t = rows.agg(
            F.sum(z).alias("t0"),
            F.sum(z * x1).alias("t1"),
            F.sum(z * x2).alias("t2"),
        ).collect()[0]
        b0 = (
            (h11 * h22 - h12 * h12) * t["t0"]
            + (h02 * h12 - h01 * h22) * t["t1"]
            + (h01 * h12 - h02 * h11) * t["t2"]
        ) / det
        b1 = (
            (h02 * h12 - h01 * h22) * t["t0"]
            + (h00 * h22 - h02 * h02) * t["t1"]
            + (h01 * h02 - h00 * h12) * t["t2"]
        ) / det
        b2 = (
            (h01 * h12 - h02 * h11) * t["t0"]
            + (h01 * h02 - h00 * h12) * t["t1"]
            + (h00 * h11 - h01 * h01) * t["t2"]
        ) / det
        if not all(math.isfinite(b) for b in (b0, b1, b2)):
            raise ValueError(
                "gamma_irls diverged (non-finite coefficients); "
                "check for extreme covariate scales"
            )
    eta = F.lit(b0) + F.lit(b1) * x1 + F.lit(b2) * x2
    mu = F.exp(eta)
    pearson = (y - mu) / mu
    return rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.lit(b0).alias("b0"),
        F.lit(b1).alias("b1"),
        F.lit(b2).alias("b2"),
        (
            F.lit(2.0)
            * F.sum(-F.log(y / mu) + (y - mu) / mu)
        ).alias("deviance"),
        (
            F.sum(pearson * pearson)
            / (F.count(F.lit(1)).cast("double") - F.lit(3.0))
        ).alias("dispersion"),
        F.avg(mu).alias("mean_mu"),
    )


def cramer4_newton_terms(h, g, *, mul, add, sub, neg, div):
    """Symbolic/numeric Cramer step for a symmetric 4x4 Newton system.

    Computes ``(det, [d0, d1, d2, d3])`` where ``d_j`` is the j-th
    component of ``H⁻¹·g`` by cofactor expansion: the determinant is
    expanded along column 0 and each numerator ``det(H with column j
    replaced by g)`` along the replaced column, so ``g`` enters each
    numerator linearly.

    ``h`` is the symmetric Hessian as the 10 upper-triangle entries
    ``{(i, j): value}`` with ``i <= j``; ``g`` is the 4-gradient. The
    scalar algebra is passed in (``mul/add/sub/neg/div``) so the SAME
    expression tree serves two callers: :func:`poisson_newton3` binds
    float arithmetic, while the contract's DuckDB oracle binds
    string-builders — making the engine and the oracle identical
    term for term BY CONSTRUCTION instead of by hand-mirroring (the
    3x3 closed forms' approach, which does not scale to 4x4's 16
    cofactors). Both Python and SQL evaluate the fully-parenthesized
    tree in the same IEEE-754 order, so any residual disagreement is
    only the engines' sum-ordering noise, which the canon rounds away.
    """
    M = [[h[(min(i, j), max(i, j))] for j in range(4)] for i in range(4)]

    def det3(a, b, c, d, e, f, p, q, r):
        return add(
            sub(
                mul(a, sub(mul(e, r), mul(f, q))),
                mul(b, sub(mul(d, r), mul(f, p))),
            ),
            mul(c, sub(mul(d, q), mul(e, p))),
        )

    def minor(i, j):
        ent = [
            M[r][c]
            for r in range(4)
            if r != i
            for c in range(4)
            if c != j
        ]
        return det3(*ent)

    def expand(col_vals, j):
        acc = None
        for i in range(4):
            term = mul(col_vals[i], minor(i, j))
            if (i + j) % 2 == 1:
                term = neg(term)
            acc = term if acc is None else add(acc, term)
        return acc

    det = expand([M[i][0] for i in range(4)], 0)
    nums = [expand(g, j) for j in range(4)]
    return det, [div(n, det) for n in nums]


def poisson_newton3(
    df: DataFrame,
    x_cols: Sequence[str],
    y_col: str,
    *,
    iters: int = 4,
) -> DataFrame:
    """Poisson regression (log link, THREE features + intercept) by
    fixed-iteration Newton-Raphson — the engine-side, oracle-checkable
    twin of :func:`glm_fit`'s ``family="poisson"`` path at p = 3.

    Same layering as :func:`poisson_newton`, one dimension up: each
    round folds the current β in as literals and aggregates the
    gradient ``X'(y − μ)`` (4 doubles) and Hessian ``X'WX`` with
    ``w = μ = exp(β'x)`` (10 upper-triangle doubles) in ONE narrow
    scan; the driver applies the exact 4×4 Cramer step via
    :func:`cramer4_newton_terms`, whose expression tree the SQL
    oracle rebuilds with the SAME generator. Warm start is the null
    model ``b0 = ln(mean(y))`` so step magnitudes stay O(1)
    (poisson_newton's divergence lesson). Fixed ``iters`` rounds make
    the whole fit a deterministic arithmetic program — unlike MLlib
    GLR's tolerance-based stopping rule, which is why this operator
    (not the :func:`glm_fit` wrapper) carries the DuckDB hash gate.

    100 TB shape: per round one scan shuffling 14 doubles; no
    data-volume collect, no per-row Python. Returns one row
    ``(n, b0, b1, b2, b3, deviance, mean_mu)``.
    """
    if len(x_cols) != 3:
        raise ValueError(
            f"poisson_newton3 is the explicit 3-feature closed form, "
            f"got {len(x_cols)} features (use MLlib GLR for general p)"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    x1, x2, x3 = (_d(c) for c in x_cols)
    y = _d(y_col)
    rows = df.where(
        x1.isNotNull()
        & x2.isNotNull()
        & x3.isNotNull()
        & y.isNotNull()
        & (y >= 0)
    )
    mean_y = rows.agg(F.avg(y).alias("m")).collect()[0]["m"]
    if mean_y is None or mean_y <= 0.0:
        raise ValueError(
            "poisson_newton3 needs at least one row with mean(y) > 0"
        )
    b = [math.log(mean_y), 0.0, 0.0, 0.0]
    xs = [x1, x2, x3]
    for _ in range(iters):
        eta = F.lit(b[0]) + F.lit(b[1]) * x1 + F.lit(b[2]) * x2 + F.lit(
            b[3]
        ) * x3
        mu = F.exp(eta)
        r = y - mu
        xv = [F.lit(1.0), x1, x2, x3]
        aggs = [F.count(F.lit(1)).cast("double").alias("n")]
        aggs += [F.sum(r * xs[j - 1]).alias(f"g{j}") for j in range(1, 4)]
        aggs.insert(1, F.sum(r).alias("g0"))
        for i in range(4):
            for j in range(i, 4):
                aggs.append(F.sum(mu * xv[i] * xv[j]).alias(f"h{i}{j}"))
        s = rows.agg(*aggs).collect()[0]
        h = {
            (i, j): s[f"h{i}{j}"] for i in range(4) for j in range(i, 4)
        }
        g = [s[f"g{j}"] for j in range(4)]
        det, delta = cramer4_newton_terms(
            h,
            g,
            mul=lambda a, c: a * c,
            add=lambda a, c: a + c,
            sub=lambda a, c: a - c,
            neg=lambda a: -a,
            div=lambda a, c: a / c if c != 0.0 else math.nan,
        )
        if det == 0.0 or not math.isfinite(det):
            raise ValueError(
                "singular Hessian: features are collinear or constant"
            )
        b = [b[j] + delta[j] for j in range(4)]
        if not all(math.isfinite(v) for v in b):
            raise ValueError(
                "poisson_newton3 diverged (non-finite coefficients); "
                "check for extreme covariate scales"
            )
    eta = F.lit(b[0]) + F.lit(b[1]) * x1 + F.lit(b[2]) * x2 + F.lit(
        b[3]
    ) * x3
    mu = F.exp(eta)
    dev_term = F.when(y > 0, y * F.log(y / mu) - (y - mu)).otherwise(mu)
    return rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.lit(b[0]).alias("b0"),
        F.lit(b[1]).alias("b1"),
        F.lit(b[2]).alias("b2"),
        F.lit(b[3]).alias("b3"),
        (F.lit(2.0) * F.sum(dev_term)).alias("deviance"),
        F.avg(mu).alias("mean_mu"),
    )
