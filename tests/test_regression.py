"""operators/regression.py: exact-recovery and shrinkage checks for
the normal-equation OLS/ridge family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.regression import (
    fit_ridge,
    grouped_ols,
    predict_expr,
    residual_summary,
    ridge_coefficients_df,
)


def _xy(spark, rows):
    return spark.createDataFrame(
        [(g, float(x), float(y)) for g, x, y in rows],
        "g string, x double, y double",
    )


def test_grouped_ols_recovers_exact_lines(spark):
    # group a: y = 2x + 1 exactly; group b: y = -x + 5 exactly.
    rows = [("a", x, 2 * x + 1) for x in range(5)]
    rows += [("b", x, -x + 5) for x in range(4)]
    out = {
        r["g"]: r
        for r in grouped_ols(_xy(spark, rows), "x", "y", by=["g"]).collect()
    }
    assert out["a"]["slope"] == pytest.approx(2.0)
    assert out["a"]["intercept"] == pytest.approx(1.0)
    assert out["a"]["r2"] == pytest.approx(1.0)
    assert out["b"]["slope"] == pytest.approx(-1.0)
    assert out["b"]["n"] == 4


def test_grouped_ols_degenerate_x_is_null(spark):
    rows = [("c", 3, y) for y in (1, 2, 3)]  # constant x
    r = grouped_ols(_xy(spark, rows), "x", "y", by=["g"]).first()
    assert r["slope"] is None and r["intercept"] is None


def test_grouped_ols_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 3.0), (2.0, 5.0), (None, 9.0), (3.0, None)],
        "x double, y double",
    )
    r = grouped_ols(df, "x", "y").first()
    assert r["n"] == 2 and r["slope"] == pytest.approx(2.0)


def _plane(spark, noise=0.0):
    # y = 1 + 2*x1 - 3*x2 (+ optional deterministic perturbation)
    rows = []
    for i in range(40):
        x1, x2 = float(i % 7), float((i * 3) % 5)
        y = 1.0 + 2.0 * x1 - 3.0 * x2 + noise * ((-1) ** i)
        rows.append((x1, x2, y))
    return spark.createDataFrame(rows, "x1 double, x2 double, y double")


def test_fit_ridge_recovers_plane_and_rmse_zero(spark):
    coef, stats = fit_ridge(_plane(spark), ["x1", "x2"], "y", l2=0.0)
    assert coef == pytest.approx([1.0, 2.0, -3.0], abs=1e-8)
    assert stats["rmse"] == pytest.approx(0.0, abs=1e-6)
    assert stats["r2"] == pytest.approx(1.0, abs=1e-9)


def test_ridge_shrinks_toward_zero(spark):
    df = _plane(spark)
    c0, _ = fit_ridge(df, ["x1", "x2"], "y", l2=0.0)
    c9, _ = fit_ridge(df, ["x1", "x2"], "y", l2=1e6)
    assert abs(c9[1]) < abs(c0[1]) and abs(c9[2]) < abs(c0[2])


def test_declarative_ridge_matches_driver_path(spark):
    df = _plane(spark, noise=0.5)
    coef, stats = fit_ridge(df, ["x1", "x2"], "y", l2=7.0)
    row = ridge_coefficients_df(df, ["x1", "x2"], "y", l2=7.0).first()
    assert [row["b0"], row["b1"], row["b2"]] == pytest.approx(coef)
    assert row["rmse"] == pytest.approx(stats["rmse"])
    assert row["r2"] == pytest.approx(stats["r2"])
    assert row["n"] == 40


def test_declarative_ridge_rejects_wrong_arity(spark):
    with pytest.raises(ValueError):
        ridge_coefficients_df(_plane(spark), ["x1"], "y")


def test_three_feature_fallback_matches_numpy(spark):
    # p=3 exercises the numpy solve branch; exact plane again.
    rows = []
    for i in range(30):
        x1, x2, x3 = float(i % 5), float((i * 2) % 7), float(i % 3)
        rows.append((x1, x2, x3, 4.0 - x1 + 0.5 * x2 + 2.0 * x3))
    df = spark.createDataFrame(
        rows, "x1 double, x2 double, x3 double, y double"
    )
    coef, stats = fit_ridge(df, ["x1", "x2", "x3"], "y", l2=0.0)
    assert coef == pytest.approx([4.0, -1.0, 0.5, 2.0], abs=1e-8)
    assert stats["rmse"] == pytest.approx(0.0, abs=1e-6)


def test_residual_summary_perfect_fit_and_bias(spark):
    df = _plane(spark, noise=0.0).withColumn("g", F.lit("all"))
    r = residual_summary(
        df, ["x1", "x2"], "y", [1.0, 2.0, -3.0], by=["g"]
    ).first()
    assert r["rmse"] == pytest.approx(0.0, abs=1e-9)
    assert r["mae"] == pytest.approx(0.0, abs=1e-9)
    # Shift the intercept by +1: every residual becomes -1.
    r2 = residual_summary(
        df, ["x1", "x2"], "y", [2.0, 2.0, -3.0], by=["g"]
    ).first()
    assert r2["bias"] == pytest.approx(-1.0)
    assert r2["rmse"] == pytest.approx(1.0)


def test_predict_expr_is_literal_projection(spark):
    df = _plane(spark)
    plan = df.select(
        predict_expr(["x1", "x2"], [1.0, 2.0, -3.0]).alias("p")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow codegen projection


def test_huber_downweights_outlier(spark):
    from k_means_using_mapreduce_spark.operators.regression import huber_ols

    # y = 3x exactly, plus one gross outlier that drags plain OLS up.
    rows = [("a", x, 3.0 * x) for x in range(1, 21)]
    rows.append(("a", 10.0, 1000.0))
    df = _xy(spark, rows)
    ols = grouped_ols(df, "x", "y", by=["g"]).collect()[0]
    hub = huber_ols(df, "x", "y", iters=2).collect()[0]
    # Huber must sit strictly closer to the true slope than OLS.
    assert abs(hub["slope"] - 3.0) < abs(ols["slope"] - 3.0)
    # the outlier's weight was clipped: total mass < n
    assert hub["w_sum"] < hub["n"]
    assert hub["delta"] > 0.0


def test_huber_exact_fit_keeps_full_weight(spark):
    from k_means_using_mapreduce_spark.operators.regression import huber_ols

    # perfect line: delta = 0, every |r| = 0 -> w = 1 (the 0/0 guard),
    # coefficients identical to OLS.
    rows = [("a", x, 2.0 * x + 1.0) for x in range(6)]
    hub = huber_ols(_xy(spark, rows), "x", "y", iters=2).collect()[0]
    assert hub["slope"] == pytest.approx(2.0)
    assert hub["intercept"] == pytest.approx(1.0)
    assert hub["w_sum"] == pytest.approx(6.0)
    assert hub["rmse"] == pytest.approx(0.0, abs=1e-9)


def test_huber_rejects_bad_iters(spark):
    from k_means_using_mapreduce_spark.operators.regression import huber_ols

    with pytest.raises(ValueError):
        huber_ols(_xy(spark, [("a", 1, 1)]), "x", "y", iters=0)


def _hash_u(i: int) -> float:
    # deterministic uniform in (0,1) from md5, same doctrine as the
    # engine's hash-coin samplers — no rand() in tests either.
    import hashlib

    h = hashlib.md5(str(i).encode()).hexdigest()[:15]
    return (int(h, 16) + 1.0) / float(1 << 60)


def test_logistic_matches_numpy_irls(spark):
    import numpy as np

    from k_means_using_mapreduce_spark.operators.regression import (
        logistic_newton,
    )

    # synthetic logistic data with known coefficients, labels drawn by
    # deterministic md5 coins
    b_true = np.array([-1.0, 0.8, -0.5])
    rows = []
    for i in range(800):
        x1 = (i % 40) / 10.0
        x2 = ((i * 7) % 23) / 5.0
        p = 1.0 / (1.0 + np.exp(-(b_true[0] + b_true[1] * x1 + b_true[2] * x2)))
        rows.append((float(x1), float(x2), 1.0 if _hash_u(i) < p else 0.0))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = logistic_newton(df, ["x1", "x2"], "y", iters=3).collect()[0]

    # independent matrix-form IRLS (numpy linalg, not Cramer)
    X = np.array([[1.0, r[0], r[1]] for r in rows])
    yv = np.array([r[2] for r in rows])
    b = np.zeros(3)
    for _ in range(3):
        z = X @ b
        p = 1.0 / (1.0 + np.exp(-z))
        W = p * (1.0 - p)
        H = X.T @ (X * W[:, None])
        g = X.T @ (yv - p)
        b = b + np.linalg.solve(H, g)
    assert got["b0"] == pytest.approx(b[0], rel=1e-9)
    assert got["b1"] == pytest.approx(b[1], rel=1e-9)
    assert got["b2"] == pytest.approx(b[2], rel=1e-9)
    # after 3 Newton rounds the fit should be near the generator
    assert got["b1"] == pytest.approx(0.8, abs=0.3)
    assert got["accuracy"] > 0.6
    z = X @ b
    ll = np.mean(np.maximum(z, 0) - yv * z + np.log1p(np.exp(-np.abs(z))))
    assert got["log_loss"] == pytest.approx(ll, rel=1e-9)


def test_logistic_rejects_bad_args(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        logistic_newton,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 1.0)], "x1 double, x2 double, x3 double, y double"
    )
    with pytest.raises(ValueError):
        logistic_newton(df, ["x1", "x2", "x3"], "y")
    with pytest.raises(ValueError):
        logistic_newton(df, ["x1", "x2"], "y", iters=0)
    # constant feature -> singular Hessian
    const = spark.createDataFrame(
        [(1.0, 5.0, 1.0), (2.0, 5.0, 0.0), (3.0, 5.0, 1.0)],
        "x1 double, x2 double, y double",
    )
    with pytest.raises(ValueError, match="singular"):
        logistic_newton(const, ["x1", "x2"], "y", iters=1)


def test_lambda_sweep_shrinks_and_selects(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        ridge_lambda_sweep,
    )

    # y = 2 + 3*x1 - 1*x2 exactly, ids drive the split
    rows = [
        (i, float(i % 13), float((i * 5) % 7), 0.0)
        for i in range(400)
    ]
    rows = [(i, x1, x2, 2.0 + 3.0 * x1 - 1.0 * x2) for i, x1, x2, _ in rows]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    out = ridge_lambda_sweep(
        df, ["x1", "x2"], "y", "id", lambdas=[0.0, 10.0, 1000.0]
    ).collect()
    assert len(out) == 3
    by_l = {r["l2"]: r for r in out}
    # unpenalized fit recovers the exact plane with ~0 error both splits
    assert by_l[0.0]["b1"] == pytest.approx(3.0)
    assert by_l[0.0]["b2"] == pytest.approx(-1.0)
    assert by_l[0.0]["val_rmse"] == pytest.approx(0.0, abs=1e-6)
    # slopes shrink monotonically toward zero as lambda grows
    assert abs(by_l[10.0]["b1"]) < 3.0
    assert abs(by_l[1000.0]["b1"]) < abs(by_l[10.0]["b1"])
    # exact data: validation error grows with shrinkage
    assert by_l[1000.0]["val_rmse"] > by_l[0.0]["val_rmse"]


def test_lambda_sweep_rejects_bad_args(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        ridge_lambda_sweep,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 2.0, 3.0)], "id long, x1 double, x2 double, y double"
    )
    with pytest.raises(ValueError):
        ridge_lambda_sweep(df, ["x1"], "y", "id")
    with pytest.raises(ValueError):
        ridge_lambda_sweep(df, ["x1", "x2"], "y", "id", lambdas=[])
    with pytest.raises(ValueError):
        ridge_lambda_sweep(df, ["x1", "x2"], "y", "id", test_pct=100)


def test_learning_curve_nested_and_exact(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        ols_learning_curve,
    )

    rows = [(i, float(i % 17), 4.0 * (i % 17) + 3.0) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = ols_learning_curve(df, "x", "y", "id").orderBy("pct").collect()
    assert 1 <= len(out) <= 10
    # fractions nest: n_train strictly increases, pct = (dec+1)*10
    ns = [r["n_train"] for r in out]
    assert ns == sorted(ns) and ns[0] < ns[-1]
    assert all(r["pct"] % 10 == 0 for r in out)
    # exact line: every slice recovers it, zero error on both splits
    for r in out:
        assert r["slope"] == pytest.approx(4.0)
        assert r["intercept"] == pytest.approx(3.0)
        assert r["val_rmse"] == pytest.approx(0.0, abs=1e-6)


def test_learning_curve_rejects_bad_split(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        ols_learning_curve,
    )

    df = spark.createDataFrame([(1, 1.0, 2.0)], "id long, x double, y double")
    with pytest.raises(ValueError):
        ols_learning_curve(df, "x", "y", "id", test_pct=0)


def test_lasso_zeroes_weak_feature_and_matches_zero_penalty_ols(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        fit_ridge,
        lasso_cd,
    )

    # y = 2 + 5*x1 exactly; x2 pure noise-free irrelevant feature
    rows = [
        (float(i % 23), float((i * 3) % 7), 2.0 + 5.0 * (i % 23))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    # heavy penalty: x2 must drop, x1 survives shrunk-but-nonzero
    r = lasso_cd(df, ["x1", "x2"], "y", l1=1000.0, rounds=25).collect()[0]
    assert r["b2"] == 0.0
    assert r["nnz"] == 1
    assert r["b1"] > 3.0
    # zero penalty converges to OLS (CD on an exact linear system)
    r0 = lasso_cd(df, ["x1", "x2"], "y", l1=0.0, rounds=60).collect()[0]
    coef, _ = fit_ridge(df, ["x1", "x2"], "y", l2=0.0)
    # CD converges geometrically; 60 rounds leaves ~1e-6 residual on
    # these mildly-correlated features
    assert r0["b0"] == pytest.approx(coef[0], abs=1e-4)
    assert r0["b1"] == pytest.approx(coef[1], abs=1e-4)
    assert r0["b2"] == pytest.approx(coef[2], abs=1e-4)
    assert r0["rmse"] == pytest.approx(0.0, abs=1e-4)


def test_lasso_guards(spark):
    from k_means_using_mapreduce_spark.operators.regression import lasso_cd

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0)], "x1 double, x2 double, y double"
    )
    import pytest as _p

    with _p.raises(ValueError):
        lasso_cd(df, ["x1"], "y", l1=1.0)
    with _p.raises(ValueError):
        lasso_cd(df, ["x1", "x2"], "y", l1=-1.0)
    with _p.raises(ValueError):
        lasso_cd(df, ["x1", "x2"], "y", l1=1.0, rounds=0)
    zero = spark.createDataFrame(
        [(0.0, 1.0, 2.0), (0.0, 2.0, 3.0)], "x1 double, x2 double, y double"
    )
    with _p.raises(ValueError, match="identically zero"):
        lasso_cd(zero, ["x1", "x2"], "y", l1=1.0)


def test_simpsons_detects_classic_reversal(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        simpsons_check,
    )

    # within each stratum y DECREASES in x, but stratum B sits at both
    # higher x and higher y -> pooled slope positive: the paradox
    rows = [("A", float(x), 10.0 - x) for x in range(5)]
    rows += [("B", float(x) + 10.0, 30.0 - (x + 10.0)) for x in range(5)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = simpsons_check(df, "x", "y", "g").collect()[0]
    assert r["pooled_slope"] > 0
    assert r["max_stratum_slope"] < 0
    assert r["n_opposing"] == 2
    assert bool(r["reversed"]) is True


def test_simpsons_consistent_trend_not_flagged(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        simpsons_check,
    )

    rows = [(g, float(x), 2.0 * x) for g in "AB" for x in range(6)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = simpsons_check(df, "x", "y", "g").collect()[0]
    assert bool(r["reversed"]) is False
    assert r["n_opposing"] == 0
    assert r["pooled_slope"] == pytest.approx(2.0)


def test_lmg_sums_to_full_r2_and_orthogonal_case(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        lmg_importance,
    )

    # orthogonal balanced design: LMG == marginal R², shares add up
    rows = []
    for a in (-1.0, 1.0):
        for b in (-1.0, 1.0):
            for _ in range(5):
                rows.append((a, b, 3.0 * a + 1.0 * b))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = lmg_importance(df, ["x1", "x2"], "y").collect()[0]
    assert r["r2_full"] == pytest.approx(1.0)
    assert r["lmg_x1"] + r["lmg_x2"] == pytest.approx(r["r2_full"])
    assert r["lmg_x1"] == pytest.approx(r["r2_x1"])
    assert r["lmg_x1"] == pytest.approx(9.0 / 10.0)  # var split 9:1
    assert r["lmg_x2"] == pytest.approx(1.0 / 10.0)

    # correlated predictors: identity still holds exactly
    rows2 = [
        (float(i), float(i) + ((i * 7) % 5), 2.0 * i + ((i * 3) % 4))
        for i in range(60)
    ]
    df2 = spark.createDataFrame(rows2, "x1 double, x2 double, y double")
    r2 = lmg_importance(df2, ["x1", "x2"], "y").collect()[0]
    assert r2["lmg_x1"] + r2["lmg_x2"] == pytest.approx(r2["r2_full"])
    import pytest as _p

    with _p.raises(ValueError):
        lmg_importance(df2, ["x1"], "y")


def test_influence_flags_single_leverage_point(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        influence_summary,
    )

    # clean line plus one far-off high-leverage point
    rows = [(float(i), 2.0 * i + 0.001 * ((i * 7) % 3)) for i in range(50)]
    rows.append((200.0, 100.0))  # way off the line, extreme x
    df = spark.createDataFrame(rows, "x double, y double")
    r = influence_summary(df, "x", "y").collect()[0]
    assert r["n"] == 51
    assert r["n_influential"] >= 1
    assert r["max_cooks"] > 1.0  # the classic D>1 red flag
    assert r["influential_rate"] < 0.2


def test_influence_exact_fit_and_guards(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        influence_summary,
    )

    exact = spark.createDataFrame(
        [(float(i), 3.0 * i) for i in range(10)], "x double, y double"
    )
    r = influence_summary(exact, "x", "y").collect()[0]
    assert r["n_influential"] == 0 and r["max_cooks"] == 0.0
    assert r["slope"] == pytest.approx(3.0)
    import pytest as _p

    novar = spark.createDataFrame(
        [(1.0, 2.0), (1.0, 3.0), (1.0, 4.0)], "x double, y double"
    )
    with _p.raises(ValueError):
        influence_summary(novar, "x", "y")
    with _p.raises(ValueError):
        influence_summary(exact, "x", "y", threshold_factor=0.0)


def test_chow_detects_slope_break(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.regression import chow_test

    # segment 1: y = 2x; segment 2: y = 5x + 3 — a real break
    rows = [(0, float(x), 2.0 * x + 0.01 * (x % 3)) for x in range(60)]
    rows += [(1, float(x), 5.0 * x + 3.0 + 0.01 * (x % 3)) for x in range(60)]
    df = spark.createDataFrame(rows, "seg int, x double, y double")
    r = chow_test(df, "x", "y", F.col("seg") == 1).collect()[0]
    assert r["n1"] == 60 and r["n2"] == 60
    assert r["slope_1"] == pytest.approx(2.0, abs=0.01)
    assert r["slope_2"] == pytest.approx(5.0, abs=0.01)
    assert r["f_stat"] > 1000.0
    assert r["df1"] == 2 and r["df2"] == 116

    # same process in both halves: F near zero
    same = [(s, float(x), 2.0 * x + 0.01 * (x % 5)) for s in (0, 1)
            for x in range(50)]
    df2 = spark.createDataFrame(same, "seg int, x double, y double")
    r2 = chow_test(df2, "x", "y", F.col("seg") == 1).collect()[0]
    assert r2["f_stat"] < 1.0


def test_poisson_newton_recovers_planted_rates(spark):
    """Deterministic planted-rate counts: y ~= exp(0.5 + 2 x1 - 1 x2)
    evaluated exactly (no sampling noise) should be fit near-exactly."""
    import math

    from k_means_using_mapreduce_spark.operators.regression import (
        poisson_newton,
    )

    rows = []
    for i in range(200):
        x1 = (i % 10) / 10.0
        x2 = ((i * 7) % 13) / 13.0
        mu = math.exp(0.5 + 2.0 * x1 - 1.0 * x2)
        rows.append((x1, x2, mu))  # continuous "counts": exact mean response
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = poisson_newton(df, ["x1", "x2"], "y", iters=8).collect()[0]
    assert r["b0"] == pytest.approx(0.5, abs=1e-6)
    assert r["b1"] == pytest.approx(2.0, abs=1e-6)
    assert r["b2"] == pytest.approx(-1.0, abs=1e-6)
    assert r["deviance"] == pytest.approx(0.0, abs=1e-9)


def test_poisson_newton_converges_on_large_mean_counts(spark):
    """Regression for the round-5 divergence: mean(y) >> 1 used to blow
    the beta trajectory through mu ~ 1e9 under the old beta=0 start.
    The warm start (b0 = ln(mean y)) must yield an actual fit whose
    deviance beats the null model's, with O(1) coefficients."""
    import math

    from k_means_using_mapreduce_spark.operators.regression import (
        poisson_newton,
    )

    rows = []
    for i in range(300):
        x1 = (i % 10) / 10.0
        x2 = ((i * 7) % 13) / 13.0
        # counts around 25 with covariate-dependent rate, noise-free
        y = math.exp(math.log(25.0) + 0.4 * x1 - 0.3 * x2)
        rows.append((x1, x2, y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = poisson_newton(df, ["x1", "x2"], "y", iters=4).collect()[0]
    assert r["b0"] == pytest.approx(math.log(25.0), abs=1e-6)
    assert r["b1"] == pytest.approx(0.4, abs=1e-6)
    assert r["b2"] == pytest.approx(-0.3, abs=1e-6)
    # mean_mu is O(mean y), not transient garbage
    assert 20.0 < r["mean_mu"] < 35.0
    # deviance strictly beats the intercept-only (null) model
    ybar = sum(t[2] for t in rows) / len(rows)
    null_dev = 2.0 * sum(t[2] * math.log(t[2] / ybar) for t in rows)
    assert r["deviance"] < null_dev


def test_poisson_newton_validation(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        poisson_newton,
    )

    df = spark.createDataFrame([(1.0, 1.0, 2.0)], "x1 double, x2 double, y double")
    with pytest.raises(ValueError, match="2-feature"):
        poisson_newton(df, ["x1"], "y")
    const = spark.createDataFrame(
        [(1.0, 1.0, 2.0), (1.0, 1.0, 3.0)], "x1 double, x2 double, y double"
    )
    with pytest.raises(ValueError, match="singular"):
        poisson_newton(const, ["x1", "x2"], "y")


def test_glm_fit_poisson_parity_with_closed_form(spark, sf_oracle):
    """MLlib GLR (family=poisson) must land on the same optimum as the
    hash-gated 2-feature Newton closed form — tolerance-based: both
    solve the same convex MLE, but MLlib's IRLS stopping rule is not
    SQL-reproducible, hence no DuckDB oracle for glm_fit."""
    from k_means_using_mapreduce_spark.operators.regression import (
        glm_fit,
        poisson_newton,
    )
    from k_means_using_mapreduce_spark.sources.loaders import load_table

    li = load_table(spark, sf_oracle, "lineitem")
    nf = poisson_newton(li, ["l_discount", "l_tax"], "l_quantity").collect()[0]
    gf = glm_fit(
        li, ["l_discount", "l_tax"], "l_quantity", family="poisson"
    ).collect()[0]
    assert gf["n"] == nf["n"]
    assert gf["intercept"] == pytest.approx(nf["b0"], abs=1e-5)
    assert gf["coefficients"][0] == pytest.approx(nf["b1"], abs=1e-4)
    assert gf["coefficients"][1] == pytest.approx(nf["b2"], abs=1e-4)
    assert gf["deviance"] == pytest.approx(nf["deviance"], rel=1e-8)


def test_glm_fit_binomial_parity_with_closed_form(spark, sf_oracle):
    from k_means_using_mapreduce_spark.operators.regression import (
        glm_fit,
        logistic_newton,
    )
    from k_means_using_mapreduce_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_oracle, "lineitem").withColumn(
        "is_return", (F.col("l_returnflag") == "R").cast("int")
    )
    nf = logistic_newton(
        li, ["l_discount", "l_quantity"], "is_return", iters=8
    ).collect()[0]
    gf = glm_fit(
        li, ["l_discount", "l_quantity"], "is_return", family="binomial"
    ).collect()[0]
    assert gf["n"] == nf["n"]
    assert gf["intercept"] == pytest.approx(nf["b0"], abs=1e-5)
    assert gf["coefficients"][0] == pytest.approx(nf["b1"], abs=1e-4)
    assert gf["coefficients"][1] == pytest.approx(nf["b2"], abs=1e-5)


def test_glm_fit_general_p(spark, sf_oracle):
    """The point of the wrapper: p=3 features, which the closed forms
    refuse. Fit must be a real GLM (deviance beats null deviance)."""
    from k_means_using_mapreduce_spark.operators.regression import glm_fit
    from k_means_using_mapreduce_spark.sources.loaders import load_table

    li = load_table(spark, sf_oracle, "lineitem")
    r = glm_fit(
        li,
        ["l_discount", "l_tax", "l_linenumber"],
        "l_quantity",
        family="poisson",
    ).collect()[0]
    assert len(r["coefficients"]) == 3
    assert r["deviance"] < r["null_deviance"]
    assert r["n"] > 0

    with pytest.raises(ValueError, match="at least one feature"):
        glm_fit(li, [], "l_quantity")
    with pytest.raises(ValueError, match="unsupported family"):
        glm_fit(li, ["l_tax"], "l_quantity", family="beta")


def test_quantile_ols_lad_resists_outliers(spark):
    """y = 3x + symmetric small noise, plus huge one-sided outliers:
    the LAD (τ=0.5) line stays on the true slope while OLS is pulled
    away — the robustness property that motivates the pinball loss."""
    import random

    from k_means_using_mapreduce_spark.operators.regression import (
        grouped_ols,
        quantile_ols,
    )

    rng = random.Random(3)
    rows = [(float(i % 50), 3.0 * (i % 50) + rng.uniform(-1, 1))
            for i in range(400)]
    rows += [(float(i), 3.0 * i + 500.0) for i in range(0, 50, 5)]
    df = spark.createDataFrame(rows, "x double, y double")
    lad = quantile_ols(df, "x", "y", tau=0.5, iters=8).collect()[0]
    assert lad["slope"] == pytest.approx(3.0, abs=0.15)
    assert lad["tau"] == 0.5
    ols = grouped_ols(df, "x", "y").collect()[0]
    assert abs(ols["slope"] - 3.0) > abs(lad["slope"] - 3.0)


def test_quantile_ols_tau_orders_the_lines(spark):
    """Heteroskedastic spread: higher τ lines sit above lower τ lines
    at the data's center; validation raises on bad params."""
    import random

    from k_means_using_mapreduce_spark.operators.regression import (
        quantile_ols,
    )

    rng = random.Random(7)
    rows = [
        (x, 2.0 * x + rng.uniform(-1.0 - x / 10, 1.0 + x / 10))
        for i in range(600)
        for x in [float(i % 40)]
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    fits = {
        t: quantile_ols(df, "x", "y", tau=t, iters=6).collect()[0]
        for t in (0.1, 0.5, 0.9)
    }
    xbar = 19.5
    heights = {
        t: r["intercept"] + r["slope"] * xbar for t, r in fits.items()
    }
    assert heights[0.1] < heights[0.5] < heights[0.9]
    assert fits[0.5]["pinball_mean"] > 0.0

    with pytest.raises(ValueError, match="tau"):
        quantile_ols(df, "x", "y", tau=1.0)
    with pytest.raises(ValueError, match="iters"):
        quantile_ols(df, "x", "y", iters=0)
    with pytest.raises(ValueError, match="eps"):
        quantile_ols(df, "x", "y", eps=0.0)


def test_gamma_irls_recovers_planted_multiplicative_model(spark):
    """Noise-free multiplicative response y = exp(b'x): the log-link
    Gamma IRLS recovers the planted coefficients with ~zero deviance
    and ~zero Pearson dispersion (quadratic convergence: the working
    response is a first-order linearization, so a few rounds settle)."""
    import math

    from k_means_using_mapreduce_spark.operators.regression import gamma_irls

    rows = []
    for i in range(240):
        x1 = (i % 12) / 12.0
        x2 = ((i * 5) % 17) / 17.0
        y = math.exp(8.0 + 1.5 * x1 - 0.8 * x2)  # price-scale positives
        rows.append((x1, x2, y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = gamma_irls(df, ["x1", "x2"], "y", iters=6).collect()[0]
    assert r["b0"] == pytest.approx(8.0, abs=1e-6)
    assert r["b1"] == pytest.approx(1.5, abs=1e-6)
    assert r["b2"] == pytest.approx(-0.8, abs=1e-6)
    assert r["deviance"] == pytest.approx(0.0, abs=1e-6)
    assert r["dispersion"] == pytest.approx(0.0, abs=1e-9)
    assert r["n"] == 240


def test_gamma_irls_guards_and_deviance_beats_null(spark):
    """Validation raises on bad shapes; on heteroscedastic positive
    data the fitted deviance beats the intercept-only null model."""
    import math

    from k_means_using_mapreduce_spark.operators.regression import gamma_irls

    df1 = spark.createDataFrame(
        [(1.0, 1.0, 2.0)], "x1 double, x2 double, y double"
    )
    with pytest.raises(ValueError, match="2-feature"):
        gamma_irls(df1, ["x1"], "y")
    with pytest.raises(ValueError, match="iters"):
        gamma_irls(df1, ["x1", "x2"], "y", iters=0)
    # all y <= 0 rows are filtered => no usable rows
    df0 = spark.createDataFrame(
        [(1.0, 2.0, -3.0), (0.5, 0.1, 0.0)], "x1 double, x2 double, y double"
    )
    with pytest.raises(ValueError, match="y > 0"):
        gamma_irls(df0, ["x1", "x2"], "y")

    rows = []
    for i in range(300):
        x1 = (i % 10) / 10.0
        x2 = ((i * 7) % 13) / 13.0
        # multiplicative signal with a deterministic "noise" wobble
        y = math.exp(3.0 + 0.6 * x1 - 0.4 * x2) * (1.0 + 0.2 * ((i % 3) - 1))
        rows.append((x1, x2, y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = gamma_irls(df, ["x1", "x2"], "y", iters=4).collect()[0]
    ybar = sum(t[2] for t in rows) / len(rows)
    null_dev = 2.0 * sum(
        -math.log(t[2] / ybar) + (t[2] - ybar) / ybar for t in rows
    )
    assert r["deviance"] < null_dev
    assert r["dispersion"] > 0.0


def test_poisson_newton3_parity_with_glm_fit(spark, sf_oracle):
    """The p=3 engine-side Newton (the hash-gated contract behind
    glm_poisson_lineitem) must land on the same optimum as MLlib GLR —
    the round-8 repoint: the hash gate moved to poisson_newton3, and
    this parity test is what keeps the glm_fit wrapper honest."""
    from k_means_using_mapreduce_spark.operators.regression import (
        glm_fit,
        poisson_newton3,
    )
    from k_means_using_mapreduce_spark.sources.loaders import load_table

    li = load_table(spark, sf_oracle, "lineitem")
    feats = ["l_discount", "l_tax", "l_linenumber"]
    nf = poisson_newton3(li, feats, "l_quantity").collect()[0]
    gf = glm_fit(li, feats, "l_quantity", family="poisson").collect()[0]
    assert gf["n"] == nf["n"]
    assert gf["intercept"] == pytest.approx(nf["b0"], abs=1e-5)
    assert gf["coefficients"][0] == pytest.approx(nf["b1"], abs=1e-4)
    assert gf["coefficients"][1] == pytest.approx(nf["b2"], abs=1e-4)
    assert gf["coefficients"][2] == pytest.approx(nf["b3"], abs=1e-5)
    assert gf["deviance"] == pytest.approx(nf["deviance"], rel=1e-8)


def test_poisson_newton3_recovers_known_coefficients(spark):
    """Synthetic y ~ Poisson(exp(0.3 + 0.8·x1 − 0.5·x2 + 0.2·x3)) with
    numpy-seeded draws: the fixed-4-round Newton must recover the true
    coefficients to sampling accuracy (independent of MLlib)."""
    import numpy as np

    from k_means_using_mapreduce_spark.operators.regression import (
        poisson_newton3,
    )

    rng = np.random.default_rng(7)
    n = 4000
    x1 = rng.uniform(-1, 1, n)
    x2 = rng.uniform(-1, 1, n)
    x3 = rng.uniform(-1, 1, n)
    lam = np.exp(0.3 + 0.8 * x1 - 0.5 * x2 + 0.2 * x3)
    y = rng.poisson(lam).astype(float)
    df = spark.createDataFrame(
        [
            (float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(x1, x2, x3, y)
        ],
        "x1 double, x2 double, x3 double, y double",
    )
    r = poisson_newton3(df, ["x1", "x2", "x3"], "y").collect()[0]
    assert r["n"] == n
    assert r["b0"] == pytest.approx(0.3, abs=0.1)
    assert r["b1"] == pytest.approx(0.8, abs=0.1)
    assert r["b2"] == pytest.approx(-0.5, abs=0.1)
    assert r["b3"] == pytest.approx(0.2, abs=0.1)
    assert r["deviance"] > 0.0


def test_poisson_newton3_guards(spark):
    from k_means_using_mapreduce_spark.operators.regression import (
        poisson_newton3,
    )

    df = spark.createDataFrame(
        [(1.0, 1.0, 1.0, 2.0)], "x1 double, x2 double, x3 double, y double"
    )
    with pytest.raises(ValueError, match="3-feature"):
        poisson_newton3(df, ["x1", "x2"], "y")
    with pytest.raises(ValueError, match="iters"):
        poisson_newton3(df, ["x1", "x2", "x3"], "y", iters=0)
    const = spark.createDataFrame(
        [(1.0, 1.0, 1.0, 2.0), (1.0, 1.0, 1.0, 3.0)],
        "x1 double, x2 double, x3 double, y double",
    )
    with pytest.raises(ValueError, match="singular"):
        poisson_newton3(const, ["x1", "x2", "x3"], "y")


def test_cramer4_newton_terms_solves_known_system():
    """The shared expression-tree generator, bound to float algebra,
    must solve a hand-checkable symmetric 4×4 system exactly:
    H = diag(2, 4, 5, 10) (as upper triangle), g = (2, 8, 15, 40)
    → delta = (1, 2, 3, 4)."""
    from k_means_using_mapreduce_spark.operators.regression import (
        cramer4_newton_terms,
    )

    h = {(i, j): 0.0 for i in range(4) for j in range(i, 4)}
    h[(0, 0)], h[(1, 1)], h[(2, 2)], h[(3, 3)] = 2.0, 4.0, 5.0, 10.0
    det, delta = cramer4_newton_terms(
        h,
        [2.0, 8.0, 15.0, 40.0],
        mul=lambda a, b: a * b,
        add=lambda a, b: a + b,
        sub=lambda a, b: a - b,
        neg=lambda a: -a,
        div=lambda a, b: a / b,
    )
    assert det == pytest.approx(400.0)
    assert delta == pytest.approx([1.0, 2.0, 3.0, 4.0])
