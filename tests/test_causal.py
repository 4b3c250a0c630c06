"""operators/causal.py: a hand-built confounded design where the
naive difference is badly biased but both IPW and stratification
recover the true effect exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.causal import (
    ipw_ate,
    propensity_table,
)


def _confounded(spark):
    # Stratum A (base outcome 10): 8 treated, 2 control.
    # Stratum B (base outcome 0):  2 treated, 8 control.
    # True uniform effect +1. Naive diff = 9 - 2 = 7 (confounded).
    rows = []
    rows += [("A", 1, 11.0)] * 8 + [("A", 0, 10.0)] * 2
    rows += [("B", 1, 1.0)] * 2 + [("B", 0, 0.0)] * 8
    return spark.createDataFrame(rows, "s string, t int, y double")


def test_ipw_and_strat_deconfound_exactly(spark):
    r = ipw_ate(
        _confounded(spark), F.col("t") == 1, "y", strata=["s"]
    ).first()
    assert r["n"] == 20 and r["n_treated"] == 10
    assert r["naive_diff"] == pytest.approx(7.0)
    assert r["ate_ipw"] == pytest.approx(1.0)
    assert r["ate_strat"] == pytest.approx(1.0)
    assert r["n_strata_used"] == 2


def test_single_arm_stratum_excluded_from_strat(spark):
    df = _confounded(spark).unionAll(
        spark.createDataFrame([("C", 1, 100.0)] * 5, "s string, t int, y double")
    )
    r = ipw_ate(df, F.col("t") == 1, "y", strata=["s"]).first()
    # stratification skips the all-treated stratum C entirely...
    assert r["ate_strat"] == pytest.approx(1.0)
    assert r["n_strata_used"] == 2
    # ...while IPW clamps its propensity to 0.98 and keeps it (the
    # documented trade), so the estimate moves off 1.0.
    assert r["ate_ipw"] != pytest.approx(1.0)


def test_propensity_table_trimming(spark):
    pt = {
        r["s"]: r
        for r in propensity_table(
            _confounded(spark), F.col("t") == 1, ["s"], trim=(0.3, 0.7)
        ).collect()
    }
    assert pt["A"]["p_raw"] == pytest.approx(0.8)
    assert pt["A"]["p"] == pytest.approx(0.7)  # clamped
    assert pt["B"]["p"] == pytest.approx(0.3)
    assert pt["A"]["n"] == 10 and pt["A"]["n_treated"] == 8


def test_null_outcome_rows_dropped_and_trim_validated(spark):
    df = _confounded(spark).unionAll(
        spark.createDataFrame([("A", 1, None)], "s string, t int, y double")
    )
    r = ipw_ate(df, F.col("t") == 1, "y", strata=["s"]).first()
    assert r["n"] == 20  # NULL outcome row excluded
    with pytest.raises(ValueError):
        ipw_ate(df, F.col("t") == 1, "y", ["s"], trim=(0.5, 0.5))
    with pytest.raises(ValueError):
        propensity_table(df, F.col("t") == 1, ["s"], trim=(-0.1, 0.9))


def test_cmh_hand_table(spark):
    from k_means_using_mapreduce_spark.operators.causal import cmh_test

    # one stratum, textbook 2x2: a=10 b=5 c=4 d=11 (n=30)
    rows = (
        [("s1", 1, 1)] * 10 + [("s1", 1, 0)] * 5
        + [("s1", 0, 1)] * 4 + [("s1", 0, 0)] * 11
    )
    df = spark.createDataFrame(rows, "s string, t int, y int")
    r = cmh_test(df, F.col("t") == 1, F.col("y") == 1, ["s"]).first()
    assert r["n"] == 30 and r["n_strata"] == 1
    assert r["or_mh"] == pytest.approx((10 * 11) / (5 * 4))
    e_a = 15 * 14 / 30.0
    var_a = 15 * 15 * 14 * 16 / (30.0 * 30 * 29)
    assert r["chi2"] == pytest.approx((10 - e_a) ** 2 / var_a)


def test_cmh_no_association_when_conditioned(spark):
    from k_means_using_mapreduce_spark.operators.causal import cmh_test

    # within each stratum t and y independent -> per-stratum a == E[a],
    # chi2 exactly 0; marginally they would look associated.
    rows = []
    for s, p_t, p_y in (("A", 2, 2), ("B", 1, 1)):
        for t in (0, 1):
            for y in (0, 1):
                cnt = (p_t if t else 1) * (p_y if y else 1) * 4
                rows += [(s, t, y)] * cnt
    df = spark.createDataFrame(rows, "s string, t int, y int")
    r = cmh_test(df, F.col("t") == 1, F.col("y") == 1, ["s"]).first()
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert r["or_mh"] == pytest.approx(1.0)


def test_rdd_recovers_known_jump(spark):
    from k_means_using_mapreduce_spark.operators.causal import (
        regression_discontinuity,
    )

    # y = 2x below the cutoff, y = 2x + 50 at/above: sharp jump of 50
    rows = [(float(x) / 10.0, 2.0 * x / 10.0) for x in range(0, 500)]
    rows += [(float(x) / 10.0, 2.0 * x / 10.0 + 50.0) for x in range(500, 1000)]
    df = spark.createDataFrame(rows, "r double, y double")
    out = regression_discontinuity(
        df, "r", "y", cutoff=50.0, bandwidth=20.0
    ).collect()[0]
    assert out["rd_effect"] == pytest.approx(50.0, abs=1e-6)
    assert out["slope_left"] == pytest.approx(2.0)
    assert out["slope_right"] == pytest.approx(2.0)
    assert out["n_left"] == 200 and out["n_right"] == 201


def test_rdd_boundary_row_is_treated_and_guards(spark):
    from k_means_using_mapreduce_spark.operators.causal import (
        regression_discontinuity,
    )

    rows = [(48.0, 1.0), (49.0, 1.0), (50.0, 9.0), (51.0, 9.0)]
    df = spark.createDataFrame(rows, "r double, y double")
    out = regression_discontinuity(
        df, "r", "y", cutoff=50.0, bandwidth=5.0
    ).collect()[0]
    # r = 50 row counts on the right (sharp convention)
    assert out["n_left"] == 2 and out["n_right"] == 2
    assert out["rd_effect"] == pytest.approx(8.0)
    import pytest as _p

    with _p.raises(ValueError):
        regression_discontinuity(df, "r", "y", cutoff=50.0, bandwidth=0.0)


def test_iv_wald_recovers_effect_under_confounding(spark):
    """Planted structure: u confounds x and y; z shifts x only.
    OLS is biased by the confounder, IV recovers the true beta = 2."""
    rows = []
    for i in range(400):
        z = float(i % 2)
        u = float((i * 7) % 5)  # confounder
        x = 1.0 * z + u
        y = 2.0 * x + 3.0 * u  # true effect 2, confounded by u
        rows.append((y, x, z))
    df = spark.createDataFrame(rows, "y double, x double, z double")
    from k_means_using_mapreduce_spark.operators.causal import iv_wald_2sls

    r = iv_wald_2sls(df, "y", "x", "z").collect()[0]
    assert r["beta_iv"] == pytest.approx(2.0, abs=1e-9)
    assert r["beta_ols"] > 2.5  # visibly confounded
    assert abs(r["first_stage_corr"]) > 0.2


def test_iv_wald_degenerate_instrument_yields_nulls(spark):
    from k_means_using_mapreduce_spark.operators.causal import iv_wald_2sls

    df = spark.createDataFrame(
        [(1.0, 2.0, 1.0), (2.0, 3.0, 1.0)], "y double, x double, z double"
    )
    r = iv_wald_2sls(df, "y", "x", "z").collect()[0]
    assert r["beta_iv"] is None and r["first_stage_corr"] is None


def test_covariate_balance_detects_imbalance(spark):
    from k_means_using_mapreduce_spark.operators.causal import (
        covariate_balance,
    )

    # balanced covariate x (same distribution both arms), shifted y
    rows = []
    for i in range(100):
        rows.append(("a", float(i % 10), float(i % 7)))
        rows.append(("b", float(i % 10), float(i % 7) + 5.0))
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    got = {r["covariate"]: r for r in covariate_balance(df, "arm", ["x", "y"]).collect()}
    assert got["x"]["smd"] == pytest.approx(0.0, abs=1e-12)
    assert got["x"]["balanced"] is True
    assert abs(got["y"]["smd"]) > 1.0 and got["y"]["balanced"] is False

    # sparse column: pairwise NULL handling keeps the other rows
    rows2 = [("a", 1.0, None), ("a", 2.0, None), ("b", 1.5, None), ("b", 2.5, None)]
    df2 = spark.createDataFrame(rows2, "arm string, x double, z double")
    got2 = {r["covariate"]: r for r in covariate_balance(df2, "arm", ["x", "z"]).collect()}
    assert got2["x"]["smd"] is not None
    assert got2["z"]["n_a"] == 0 and got2["z"]["smd"] is None


def test_stratified_ate_removes_confounding(spark):
    import pyspark.sql.functions as F

    from k_means_using_mapreduce_spark.operators.causal import stratified_ate

    rows = []
    for i in range(500):
        s = (i % 10) / 10.0
        t = 1 if (i * 7) % 10 < s * 10 else 0  # score drives treatment
        y = 2.0 * t + 10.0 * s  # true effect 2, confounded by s
        rows.append((float(y), float(s), t))
    df = spark.createDataFrame(rows, "y double, s double, t int")
    out = {r["stratum"]: r for r in stratified_ate(df, F.col("t") == 1, "y", "s").collect()}
    assert out[-1]["effect"] == pytest.approx(2.0)
    # overlap violations surfaced, not imputed
    assert out[0]["effect"] is None and out[0]["n_treated"] == 0
    # summary excludes single-arm strata from its weight
    assert out[-1]["n"] == 200


def test_synthetic_control_recovers_planted_weights_and_effect(spark):
    """Treated unit built as an exact donor combination pre-cutoff,
    plus a constant +50 jump post-cutoff: weights recover exactly,
    pre-RMSE is ~0, and ATT reads the planted jump."""
    from k_means_using_mapreduce_spark.operators.causal import (
        synthetic_control,
    )
    from pyspark.sql import functions as F

    w_true = (0.5, 0.3, 0.2)
    rows = []
    for t in range(20):
        period = f"2024-{t + 1:02d}"  # lexicographic order is fine
        d = (100.0 + 7 * t, 80.0 + 3 * ((t * 5) % 11), 120.0 - 2 * t)
        y = sum(w * x for w, x in zip(w_true, d))
        if t >= 12:
            y += 50.0
        rows.append(("treated", period, y))
        for name, x in zip(("a", "b", "c"), d):
            rows.append((name, period, x))
    df = spark.createDataFrame(rows, "unit string, t string, v double")
    r = synthetic_control(
        df,
        unit_col="unit",
        time_col="t",
        value_col="v",
        treated="treated",
        donors=("a", "b", "c"),
        cutoff=F.lit("2024-13"),
    ).collect()[0]
    assert r["n_pre"] == 12 and r["n_post"] == 8
    assert r["w1"] == pytest.approx(0.5, abs=1e-9)
    assert r["w2"] == pytest.approx(0.3, abs=1e-9)
    assert r["w3"] == pytest.approx(0.2, abs=1e-9)
    assert r["pre_rmse"] == pytest.approx(0.0, abs=1e-9)
    assert r["att"] == pytest.approx(50.0, abs=1e-9)


def test_synthetic_control_guards(spark):
    from k_means_using_mapreduce_spark.operators.causal import (
        synthetic_control,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("t", "2024-01", 1.0), ("a", "2024-01", 1.0)],
        "unit string, t string, v double",
    )
    kw = dict(unit_col="unit", time_col="t", value_col="v", treated="t")
    with pytest.raises(ValueError, match="3-donor"):
        synthetic_control(df, donors=("a",), cutoff=F.lit("z"), **kw)
    with pytest.raises(ValueError, match="cannot be a donor"):
        synthetic_control(
            df, donors=("t", "a", "b"), cutoff=F.lit("z"), **kw
        )
    with pytest.raises(ValueError, match="pre-cutoff periods"):
        synthetic_control(
            df, donors=("a", "b", "c"), cutoff=F.lit("2024-09"), **kw
        )


def test_aipw_deconfounds_exact_linear_outcome(spark):
    """Outcome exactly linear per arm with a planted +5 effect, but
    treatment concentrated at high x1: the naive difference is badly
    confounded, while both the regression and AIPW estimates recover
    the true effect exactly (the augmentation term vanishes when the
    outcome model is right)."""
    from k_means_using_mapreduce_spark.operators.causal import aipw_ate
    from pyspark.sql import functions as F

    rows = []
    for i in range(400):
        x1 = (i % 20) / 10.0          # 0.0 .. 1.9
        x2 = ((i * 7) % 13) / 13.0
        # confounded assignment with overlap: mostly high-x1 treated,
        # but every x1 level has some of each arm
        t = 1 if (x1 > 1.0) != (i % 10 == 0) else 0
        y = 2.0 + 3.0 * x1 + 1.0 * x2 + 5.0 * t
        rows.append((float(x1), float(x2), float(t), y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, t double, y double")
    r = aipw_ate(
        df,
        treatment=F.col("t"),
        y_col="y",
        x_cols=["x1", "x2"],
    ).collect()[0]
    assert r["n"] == 400
    assert r["ate_reg"] == pytest.approx(5.0, abs=1e-8)
    assert r["ate_aipw"] == pytest.approx(5.0, abs=1e-8)
    # naive is confounded upward by the x1 imbalance (slope 3 > 0)
    assert r["naive_diff"] > 6.0


def test_aipw_guards(spark):
    from k_means_using_mapreduce_spark.operators.causal import aipw_ate
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1.0, 1.0, 1.0, 1.0)], "x1 double, x2 double, t double, y double"
    )
    with pytest.raises(ValueError, match="2-feature"):
        aipw_ate(df, treatment=F.col("t"), y_col="y", x_cols=["x1"])
    with pytest.raises(ValueError, match="clamp"):
        aipw_ate(
            df,
            treatment=F.col("t"),
            y_col="y",
            x_cols=["x1", "x2"],
            clamp=(0.5, 0.5),
        )
