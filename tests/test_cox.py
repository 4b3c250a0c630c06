"""operators/survival.py::cox_ph — Breslow Cox regression checks."""

from __future__ import annotations

import math

import pytest

from k_means_using_mapreduce_spark.operators.survival import cox_ph


def _hash_u(i: int) -> float:
    import hashlib

    h = hashlib.md5(str(i).encode()).hexdigest()[:15]
    return (int(h, 16) + 0.5) / float(1 << 60)


def _synth(n=400, beta=0.7, censor_frac=0.25):
    """Exponential hazards rate exp(beta*x): t = -ln(u)/exp(beta*x),
    deterministic md5 uniforms; every 4th subject censored at t/2."""
    rows = []
    for i in range(n):
        x = ((i * 7) % 11) / 5.0 - 1.0  # x in [-1, 1]
        u = _hash_u(i)
        t = -math.log(u) / math.exp(beta * x)
        if i % int(1 / censor_frac) == 0:
            rows.append((t / 2.0, 0, x))
        else:
            rows.append((t, 1, x))
    return rows


def _numpy_breslow(rows, iters):
    """Independent matrix-free Breslow Newton for parity."""
    import numpy as np

    t = np.array([r[0] for r in rows])
    e = np.array([r[1] for r in rows])
    x = np.array([r[2] for r in rows])
    beta = 0.0
    for _ in range(iters):
        w = np.exp(beta * x)
        u_sum = 0.0
        i_sum = 0.0
        for tt in np.unique(t[e == 1]):
            at_risk = t >= tt
            s0 = w[at_risk].sum()
            s1 = (w * x)[at_risk].sum()
            s2 = (w * x * x)[at_risk].sum()
            ev = (t == tt) & (e == 1)
            d = ev.sum()
            u_sum += x[ev].sum() - d * s1 / s0
            i_sum += d * (s2 / s0 - (s1 / s0) ** 2)
        beta += u_sum / i_sum
    return beta


def test_cox_recovers_planted_hazard_and_matches_numpy(spark):
    rows = _synth()
    df = spark.createDataFrame(rows, "duration double, event int, x double")
    r = cox_ph(df, "duration", "event", "x", iters=4).collect()[0]
    # planted effect recovered within sampling noise
    assert r["beta"] == pytest.approx(0.7, abs=0.2)
    assert r["hazard_ratio"] == pytest.approx(math.exp(r["beta"]))
    # z is strongly positive, se sane
    assert r["z"] > 3.0 and 0.0 < r["se"] < 1.0
    assert r["n"] == 400 and r["n_events"] == 300
    # exact parity with an independent Breslow Newton on the same data
    ref = _numpy_breslow(rows, 4)
    assert r["beta"] == pytest.approx(ref, rel=1e-9)


def test_cox_null_covariate_is_null_effect(spark):
    """x independent of hazard: beta ~ 0, |z| small (calibration)."""
    rows = []
    for i in range(300):
        u = _hash_u(i + 10_000)
        rows.append((-math.log(u), 1 if i % 5 else 0, float(i % 2)))
    df = spark.createDataFrame(rows, "duration double, event int, x double")
    r = cox_ph(df, "duration", "event", "x").collect()[0]
    assert abs(r["z"]) < 2.5
    assert r["hazard_ratio"] == pytest.approx(1.0, abs=0.35)


def test_cox_guards(spark):
    df0 = spark.createDataFrame(
        [(1.0, 0, 1.0), (2.0, 0, 2.0)], "duration double, event int, x double"
    )
    with pytest.raises(ValueError, match="at least one observed event"):
        cox_ph(df0, "duration", "event", "x")
    const = spark.createDataFrame(
        [(1.0, 1, 3.0), (2.0, 1, 3.0), (3.0, 0, 3.0)],
        "duration double, event int, x double",
    )
    with pytest.raises(ValueError, match="singular information"):
        cox_ph(const, "duration", "event", "x")
    with pytest.raises(ValueError, match="iters"):
        cox_ph(const, "duration", "event", "x", iters=0)


def test_nelson_aalen_hand_case(spark):
    from k_means_using_mapreduce_spark.operators.survival import nelson_aalen

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1)], "duration double, event int"
    )
    rows = {r["t"]: r for r in nelson_aalen(df, "duration", "event").collect()}
    assert rows[1.0]["cum_hazard"] == pytest.approx(1 / 3)
    assert rows[2.0]["cum_hazard"] == pytest.approx(1 / 3 + 1 / 2)
    assert rows[3.0]["cum_hazard"] == pytest.approx(1 / 3 + 1 / 2 + 1.0)
    assert rows[2.0]["var_cum_hazard"] == pytest.approx(1 / 9 + 1 / 4)
    # censored rows join risk sets but add no hazard step
    dfc = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "duration double, event int"
    )
    rc = {r["t"]: r for r in nelson_aalen(dfc, "duration", "event").collect()}
    assert set(rc) == {1.0, 3.0}
    assert rc[1.0]["cum_hazard"] == pytest.approx(1 / 3)
    assert rc[3.0]["cum_hazard"] == pytest.approx(1 / 3 + 1.0)


def test_rmst_step_integral(spark):
    from k_means_using_mapreduce_spark.operators.survival import (
        restricted_mean_survival,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1)], "duration double, event int"
    )
    r = restricted_mean_survival(df, "duration", "event", tau=4.0).collect()[0]
    # 1*1 + (2/3)*1 + (1/3)*1 + 0*1
    assert r["rmst"] == pytest.approx(2.0)
    assert r["km_at_tau"] == pytest.approx(0.0)
    # tau before any event: survival is flat 1.0
    r2 = restricted_mean_survival(df, "duration", "event", tau=0.5).collect()[0]
    assert r2["rmst"] == pytest.approx(0.5)
    assert r2["km_at_tau"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="tau"):
        restricted_mean_survival(df, "duration", "event", tau=0.0)


def test_km_greenwood_bands_hand_case(spark):
    """3 subjects, all events: S(1)=2/3 with Greenwood factor
    1/(3*2) = 1/6; log-log band stays inside (0,1) and brackets S.
    The S=0 terminal row emits (0,0) sentinels, not NULLs."""
    import math

    from k_means_using_mapreduce_spark.operators.survival import (
        Z_975,
        kaplan_meier_ci,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1)], "duration double, event int"
    )
    rows = {r["t"]: r for r in kaplan_meier_ci(df, "duration", "event").collect()}
    r1 = rows[1.0]
    assert r1["survival"] == pytest.approx(2 / 3)
    varf = 1.0 / (3 * 2)
    se_ll = math.sqrt(varf) / abs(math.log(2 / 3))
    assert r1["ci_lo"] == pytest.approx((2 / 3) ** math.exp(Z_975 * se_ll))
    assert r1["ci_hi"] == pytest.approx((2 / 3) ** math.exp(-Z_975 * se_ll))
    assert 0.0 < r1["ci_lo"] < r1["survival"] < r1["ci_hi"] < 1.0
    # terminal S = 0: sentinel band
    r3 = rows[3.0]
    assert r3["survival"] == 0.0 and r3["ci_lo"] == 0.0 and r3["ci_hi"] == 0.0


def test_weibull_fit_recovers_known_shape(spark):
    """Durations drawn by inverse-CDF from Weibull(k=2, lambda=50) on a
    deterministic uniform grid, no censoring: the profile Newton
    recovers shape/scale; adding right-censoring keeps estimates in
    range; guards raise."""
    import math

    from k_means_using_mapreduce_spark.operators.survival import (
        weibull_fit,
    )

    k_true, lam = 2.0, 50.0
    n = 400
    rows = [
        (int(round(lam * (-math.log(1.0 - (i + 0.5) / n)) ** (1.0 / k_true))), 1)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "duration long, event int")
    r = weibull_fit(df, iters=8).collect()[0]
    assert r["n_events"] == r["n"]
    assert r["shape"] == pytest.approx(k_true, rel=0.08)
    assert r["scale"] == pytest.approx(lam, rel=0.05)

    # censor everything past 60: estimates stay in a sane band
    cens = [(min(t, 60), 1 if t <= 60 else 0) for t, _ in rows]
    rc = weibull_fit(
        spark.createDataFrame(cens, "duration long, event int"), iters=8
    ).collect()[0]
    assert rc["n_events"] < rc["n"]
    assert 1.5 < rc["shape"] < 2.6
    assert 40.0 < rc["scale"] < 60.0

    with pytest.raises(ValueError, match="iters"):
        weibull_fit(df, iters=0)
    all_cens = spark.createDataFrame(
        [(5, 0), (7, 0)], "duration long, event int"
    )
    with pytest.raises(ValueError, match="uncensored"):
        weibull_fit(all_cens)
