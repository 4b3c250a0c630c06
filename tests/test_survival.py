"""operators/survival.py + l-diversity additions to cleaning.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.survival import (
    kaplan_meier,
    user_lifetimes,
)


def test_km_hand_computed_curve(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)], "duration long, event int"
    )
    rows = {r["t"]: r for r in kaplan_meier(df, "duration", "event").collect()}
    assert set(rows) == {1, 2, 3}  # censored-only times emit no step
    assert rows[1]["n_risk"] == 5 and rows[1]["n_events"] == 1
    assert rows[1]["survival"] == pytest.approx(0.8)
    assert rows[2]["n_risk"] == 4
    assert rows[2]["survival"] == pytest.approx(0.6)
    assert rows[3]["n_risk"] == 2
    assert rows[3]["survival"] == pytest.approx(0.3)


def test_km_censoring_changes_curve(spark):
    """The same durations all-observed give a lower curve than with
    censoring — the bias naive retention would introduce."""
    obs = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1), (3, 1), (4, 1)], "duration long, event int"
    )
    last = kaplan_meier(obs, "duration", "event").orderBy("t").collect()[-1]
    assert last["survival"] == pytest.approx(0.0)


def test_km_total_wipeout_hits_exact_zero(spark):
    df = spark.createDataFrame(
        [(5, 1), (5, 1)], "duration long, event int"
    )
    r = kaplan_meier(df, "duration", "event").collect()[0]
    assert r["n_risk"] == 2 and r["n_events"] == 2
    assert r["survival"] == 0.0


def test_user_lifetimes_censoring_rule(spark):
    hour = 3_600_000_000_000
    rows = [
        (1, 0), (1, 10 * hour),          # quiet long before end -> event
        (2, 0), (2, 100 * hour),         # last activity at corpus end -> censored
        (3, 90 * hour), (3, 99 * hour),  # within horizon of end -> censored
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    out = {
        r["user_id"]: r
        for r in user_lifetimes(
            ev, horizon_ns=5 * hour, unit_ns=hour
        ).collect()
    }
    assert out[1]["duration"] == 10 and out[1]["event"] == 1
    assert out[2]["duration"] == 100 and out[2]["event"] == 0
    assert out[3]["duration"] == 9 and out[3]["event"] == 0
    with pytest.raises(ValueError, match="unit_ns"):
        user_lifetimes(ev, horizon_ns=0, unit_ns=0)


def test_l_diversity_report_counts(spark):
    from k_means_using_mapreduce_spark.operators.cleaning import (
        group_diversity,
        l_diversity_report,
    )

    rows = (
        [("a", "s1")] * 3                     # group a: 1 distinct -> violates
        + [("b", "s1"), ("b", "s2"), ("b", "s3")]  # group b: 3 -> ok
        + [("c", "s1"), ("c", "s2")]          # group c: 2 -> violates
    )
    df = spark.createDataFrame(rows, "q string, s string")
    rep = l_diversity_report(df, ["q"], "s", l=3).collect()[0]
    assert rep["n_groups"] == 3
    assert rep["violating_groups"] == 2
    assert rep["violating_rows"] == 5
    assert rep["min_distinct"] == 1
    div = {r["q"]: r for r in group_diversity(df, ["q"], "s").collect()}
    assert div["a"]["entropy"] == pytest.approx(0.0)
    import math

    assert div["b"]["entropy"] == pytest.approx(math.log(3))


def test_aalen_johansen_identity_and_hand_curve(spark):
    """With no censoring CIF1 + CIF2 = 1 − S at every event time, the
    final CIFs split the full mass by cause, and a tiny hand-computed
    curve matches exactly. Per-cause KM would overstate: check the
    AJ cif1 stays below the naive 1 − KM1 treating cause 2 as events."""
    from k_means_using_mapreduce_spark.operators.survival import (
        aalen_johansen,
        kaplan_meier,
    )

    # (duration, event): cause1 at t=1,3; cause2 at t=2; censor at t=4
    rows = [(1, 1), (2, 2), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "duration int, event int")
    out = {r["t"]: r for r in aalen_johansen(df, "duration", "event").collect()}
    # t=1: n=4, S(0-)=1, cif1 = 1/4
    assert out[1]["cif1"] == pytest.approx(0.25)
    assert out[1]["cif2"] == 0.0
    # t=2: n=3, S(1) = 3/4, cif2 = (3/4)*(1/3) = 1/4
    assert out[2]["cif2"] == pytest.approx(0.25)
    # t=3: n=2, S(2) = 3/4 * 2/3 = 1/2, cif1 = 1/4 + (1/2)*(1/2) = 1/2
    assert out[3]["cif1"] == pytest.approx(0.5)
    # identity at every emitted t
    for r in out.values():
        assert r["cif1"] + r["cif2"] + r["survival"] == pytest.approx(1.0)

    # no-censoring mass split: 3 cause-1, 2 cause-2 of 5
    rows2 = [(1, 1), (2, 2), (3, 1), (4, 2), (5, 1)]
    df2 = spark.createDataFrame(rows2, "duration int, event int")
    last = (
        aalen_johansen(df2, "duration", "event")
        .orderBy("t")
        .collect()[-1]
    )
    assert last["cif1"] == pytest.approx(3 / 5)
    assert last["cif2"] == pytest.approx(2 / 5)
    assert last["survival"] == pytest.approx(0.0)
