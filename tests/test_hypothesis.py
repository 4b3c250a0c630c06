"""operators/hypothesis.py: hand-computed references for KS, Mann-
Whitney (with ties), chi-squared, and the A/B proportion z-test."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators.hypothesis import (
    ab_proportion_test,
    chi_squared_independence,
    ks_two_sample,
    mann_whitney_u,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "value double")


def test_ks_identical_zero_and_disjoint_one(spark):
    a = _vals(spark, [1, 2, 3, 4])
    r = ks_two_sample(a, a, "value").first()
    assert r["ks_d"] == pytest.approx(0.0)
    b = _vals(spark, [10, 11, 12])
    r2 = ks_two_sample(a, b, "value").first()
    assert r2["ks_d"] == pytest.approx(1.0)
    assert (r2["n_a"], r2["n_b"]) == (4, 3)


def test_ks_hand_example(spark):
    # a = {1,2}, b = {2,3}: steps at 1: |.5-0|=.5; at 2: |1-.5|=.5;
    # at 3: |1-1|=0  -> D = 0.5
    a, b = _vals(spark, [1, 2]), _vals(spark, [2, 3])
    assert ks_two_sample(a, b, "value").first()["ks_d"] == pytest.approx(0.5)


def test_mannwhitney_hand_example_with_ties(spark):
    # a = {1, 2}, b = {2, 3}; pooled ranks: 1->1, {2,2}->2.5, 3->4
    # R_a = 1 + 2.5 = 3.5; U_a = 3.5 - 2*3/2 = 0.5
    a, b = _vals(spark, [1, 2]), _vals(spark, [2, 3])
    r = mann_whitney_u(a, b, "value").first()
    assert r["u_a"] == pytest.approx(0.5)
    # var = (4/ (4*3)) * ((64-4)/12 - (8-2)/12) = (1/3) * 4.5 = 1.5
    want_z = (0.5 - 2 * 2 / 2) / math.sqrt(1.5)
    assert r["z"] == pytest.approx(want_z)


def test_mannwhitney_symmetry(spark):
    a, b = _vals(spark, [1, 5, 9, 13]), _vals(spark, [2, 6, 10])
    ra = mann_whitney_u(a, b, "value").first()
    rb = mann_whitney_u(b, a, "value").first()
    # U_a + U_b = n_a * n_b; z flips sign
    assert ra["u_a"] + rb["u_a"] == pytest.approx(12.0)
    assert ra["z"] == pytest.approx(-rb["z"])


def test_chi2_independent_is_zero(spark):
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_squared_independence(df, "a", "b").first()
    assert r["chi2"] == pytest.approx(0.0)
    assert r["dof"] == 1 and r["n"] == 40


def test_chi2_hand_2x2(spark):
    # contingency [[30,10],[10,30]]: chi2 = 80*(30*30-10*10)^2/(40*40*40*40)
    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 30
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_squared_independence(df, "a", "b").first()
    want = 80 * (30 * 30 - 10 * 10) ** 2 / (40 * 40 * 40 * 40)
    assert r["chi2"] == pytest.approx(want)


def test_ab_proportion_hand_numbers(spark):
    rows = [("a", i < 30) for i in range(100)] + [
        ("b", i < 20) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "arm string, s boolean")
    r = ab_proportion_test(df, "arm", F.col("s")).first()
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 30, 100, 20)
    assert r["rate_a"] == pytest.approx(0.3)
    pool = 0.25
    want_z = (0.3 - 0.2) / math.sqrt(pool * 0.75 * (2 / 100))
    assert r["z"] == pytest.approx(want_z)
    # Wilson interval brackets the rate and stays in [0, 1]
    assert 0 < r["lo_a"] < 0.3 < r["hi_a"] < 1
    assert r["lo_b"] < 0.2 < r["hi_b"]


def test_ucb_bonus_shrinks_with_plays(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import ucb_scores

    rows = [("few", True)] * 4 + [("many", True)] * 400
    df = spark.createDataFrame(rows, "arm string, s boolean")
    r = {x["arm"]: x for x in ucb_scores(df, "arm", F.col("s")).collect()}
    # equal rates (1.0), but the under-played arm gets the bigger bonus
    assert r["few"]["rate"] == r["many"]["rate"] == 1.0
    assert r["few"]["ucb"] > r["many"]["ucb"]
    n_total = 404
    assert r["few"]["ucb"] == pytest.approx(
        1.0 + math.sqrt(2.0 * math.log(n_total) / 4)
    )
    with pytest.raises(ValueError):
        ucb_scores(df, "arm", F.col("s"), c=0.0)


def test_poisson_bootstrap_ci(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        poisson_bootstrap_mean_ci,
    )

    rows = [(i, float(i % 10)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    r = poisson_bootstrap_mean_ci(df, "v", "id", replicates=100, seed=1).first()
    assert r["n"] == 500 and r["replicates"] == 100
    assert r["mean"] == pytest.approx(4.5)
    # CI brackets the mean and roughly matches the analytic width:
    # sd = 2.872 -> se ~ 0.128 -> 95% half-width ~ 0.25
    assert r["lo"] < 4.5 < r["hi"]
    assert 0.1 < (r["hi"] - r["lo"]) / 2 < 0.5
    # deterministic
    r2 = poisson_bootstrap_mean_ci(df, "v", "id", replicates=100, seed=1).first()
    assert (r["lo"], r["hi"]) == (r2["lo"], r2["hi"])
    with pytest.raises(ValueError):
        poisson_bootstrap_mean_ci(df, "v", "id", replicates=5)
    with pytest.raises(ValueError):
        poisson_bootstrap_mean_ci(df, "v", "id", alpha=1.5)


def test_anova_matches_hand_computation(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        anova_oneway,
    )

    # groups with clearly different means
    rows = (
        [("a", v) for v in (1.0, 2.0, 3.0)]
        + [("b", v) for v in (4.0, 5.0, 6.0)]
        + [("c", v) for v in (7.0, 8.0, 9.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", "g").collect()[0]
    # SSB = 3*((2-5)^2 + 0 + (8-5)^2) = 54; SSW = 6; F = (54/2)/(6/6)=27
    assert r["k_groups"] == 3 and r["n"] == 9
    assert (r["df_between"], r["df_within"]) == (2, 6)
    assert r["f_stat"] == pytest.approx(27.0)
    assert r["eta2"] == pytest.approx(54.0 / 60.0)


def test_anova_degenerate_is_null(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        anova_oneway,
    )

    # single group -> df_between 0 -> NULL F
    one = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    assert anova_oneway(one, "v", "g").collect()[0]["f_stat"] is None
    # zero within-variance (constant in each group) -> NULL F not error
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    assert anova_oneway(const, "v", "g").collect()[0]["f_stat"] is None


def test_dispersion_poisson_like_vs_clumped(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        dispersion_test,
    )

    # equal counts per key: variance 0 -> dispersion 0 (underdispersed)
    flat = spark.createDataFrame(
        [(k,) for k in range(10) for _ in range(5)], "k int"
    )
    r = dispersion_test(flat, "k").collect()[0]
    assert r["n_keys"] == 10
    assert r["mean"] == pytest.approx(5.0)
    assert r["dispersion"] == pytest.approx(0.0)

    # one key hoards events: dispersion >> 1
    clumped = spark.createDataFrame(
        [(0,)] * 91 + [(k,) for k in range(1, 10)], "k int"
    )
    r2 = dispersion_test(clumped, "k").collect()[0]
    assert r2["dispersion"] > 5.0
    assert r2["chi2"] == pytest.approx(9.0 * r2["dispersion"])


def test_mcnemar_hand_case_and_no_disagreement(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        mcnemar_test,
    )

    # b=6 (A right, B wrong), c=2, concordant 12
    rows = (
        [(1, 1)] * 10 + [(0, 0)] * 2 + [(1, 0)] * 6 + [(0, 1)] * 2
    )
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_test(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert (r["b_discordant"], r["c_discordant"]) == (6, 2)
    assert r["mcnemar_chi2"] == pytest.approx((abs(6 - 2) - 1) ** 2 / 8.0)
    assert r["acc_a"] == pytest.approx(16 / 20)

    # perfect agreement: statistic undefined -> NULL
    agree = spark.createDataFrame([(1, 1), (0, 0)], "a int, b int")
    assert (
        mcnemar_test(agree, F.col("a") == 1, F.col("b") == 1).collect()[0][
            "mcnemar_chi2"
        ]
        is None
    )


def test_exponentiality_exact_exponential_grid_vs_uniform(spark):
    import math

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        exponentiality_test,
    )

    # inverse-CDF exponential grid: gaps -ln(1 - u) hug the fitted CDF
    exp_rows = [
        (-math.log(1.0 - (i + 0.5) / 500.0),) for i in range(500)
    ]
    r = exponentiality_test(
        spark.createDataFrame(exp_rows, "g double"), "g"
    ).collect()[0]
    assert r["ks_stat"] < 0.05

    # constant gaps (perfectly regular arrivals) are maximally
    # non-exponential: KS far above the ~1.0/sqrt(n) noise floor
    const = spark.createDataFrame([(5.0,)] * 400, "g double")
    r2 = exponentiality_test(const, "g").collect()[0]
    assert r2["ks_stat"] > 0.3
    assert r2["mean_gap"] == pytest.approx(5.0)


def test_negbin_moment_fit_hand_case(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        negbin_fit,
    )

    # counts 1,1,5,5 per key: mean 3, var 16/3; r = 9/(16/3-3) = 27/7
    rows = [(1,)] + [(2,)] + [(3,)] * 5 + [(4,)] * 5
    df = spark.createDataFrame(rows, "k int")
    r = negbin_fit(df, "k").collect()[0]
    assert r["n_keys"] == 4
    assert r["mean"] == pytest.approx(3.0)
    assert r["variance"] == pytest.approx(16.0 / 3.0)
    assert r["nb_r"] == pytest.approx(27.0 / 7.0)
    assert r["nb_p"] == pytest.approx((27.0 / 7.0) / (27.0 / 7.0 + 3.0))


def test_negbin_underdispersed_is_null(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        negbin_fit,
    )

    # equal counts: var 0 < mean -> NB undefined, moments still shown
    df = spark.createDataFrame([(k,) for k in range(6) for _ in range(4)], "k int")
    r = negbin_fit(df, "k").collect()[0]
    assert r["variance"] == pytest.approx(0.0)
    assert r["nb_r"] == -1.0 and r["nb_p"] == -1.0


def test_welch_t_matches_scipy_formula(spark):
    import math

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        welch_t_test,
    )

    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0, 12.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_t_test(df, "v", "g", "a", "b").collect()[0]

    # reference computation
    import statistics as st

    ma, mb = st.mean(a), st.mean(b)
    va, vb = st.variance(a), st.variance(b)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    dfw = se2**2 / (
        va**2 / (len(a) ** 2 * (len(a) - 1))
        + vb**2 / (len(b) ** 2 * (len(b) - 1))
    )
    pooled = math.sqrt(
        ((len(a) - 1) * va + (len(b) - 1) * vb) / (len(a) + len(b) - 2)
    )
    assert r["t_stat"] == pytest.approx(t, rel=1e-12)
    assert r["df_welch"] == pytest.approx(dfw, rel=1e-12)
    assert r["cohens_d"] == pytest.approx((ma - mb) / pooled, rel=1e-12)
    assert (r["n_a"], r["n_b"]) == (5, 6)


def test_welch_degenerate_sides(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        welch_t_test,
    )

    # constant groups: zero variance -> NULL t (0/0 guarded)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "g string, v double",
    )
    r = welch_t_test(df, "v", "g", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["cohens_d"] is None
    assert r["mean_diff"] == pytest.approx(-1.0)


def test_wilson_interval_known_values(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        wilson_proportions,
    )

    # 15 successes of 20: classic textbook Wilson interval
    rows = [("g", 1)] * 15 + [("g", 0)] * 5
    df = spark.createDataFrame(rows, "g string, y int")
    r = wilson_proportions(df, F.col("y") == 1, ["g"]).collect()[0]
    assert r["n"] == 20 and r["successes"] == 15
    assert r["p_hat"] == pytest.approx(0.75)
    # Wilson 95% for 15/20: ~(0.531, 0.888)
    assert r["ci_lo"] == pytest.approx(0.531, abs=0.005)
    assert r["ci_hi"] == pytest.approx(0.888, abs=0.005)
    # interval stays inside [0,1] even at extremes
    ext = spark.createDataFrame([("g", 1)] * 3, "g string, y int")
    re = wilson_proportions(ext, F.col("y") == 1, ["g"]).collect()[0]
    assert 0.0 <= re["ci_lo"] < 1.0 and re["ci_hi"] <= 1.0
    import pytest as _p

    with _p.raises(ValueError):
        wilson_proportions(df, F.col("y") == 1, ["g"], z=0.0)


def test_pairwise_welch_matches_single_welch(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        pairwise_welch,
        welch_t_test,
    )

    rows = [("a", float(i)) for i in range(10)]
    rows += [("b", float(i) * 2) for i in range(8)]
    rows += [("c", float(i) + 5) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in pairwise_welch(df, "v", "g").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    single = welch_t_test(df, "v", "g", "a", "b").collect()[0]
    pair = out[("a", "b")]
    assert pair["t_stat"] == pytest.approx(single["t_stat"], rel=1e-12)
    assert pair["df_welch"] == pytest.approx(single["df_welch"], rel=1e-12)
    assert pair["mean_diff"] == pytest.approx(single["mean_diff"])


def test_cuped_reduces_variance_on_correlated_covariate(spark):
    from pyspark.sql import functions as F

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        cuped_adjusted_test,
    )

    # y strongly driven by the pre-period covariate; treatment is a
    # pure A/A split -> effect ~ 0, variance reduction ~ r^2 (large)
    rows = [
        (i, float(i % 50) + 0.1 * ((i * 7) % 11), float(i % 50))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, y double, x double")
    df = df.withColumn("treated", (F.col("id") % 2) == 0)
    r = cuped_adjusted_test(df, "y", "x", F.col("treated")).collect()[0]
    assert r["n_t"] == 200 and r["n_c"] == 200
    assert r["theta"] == pytest.approx(1.0, abs=0.05)
    assert r["var_reduction"] > 0.9
    # A/A: both effects are tiny; the CUPED one at least as precise
    assert abs(r["effect_cuped"]) < 0.5
    import pytest as _p

    const = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "y double, x double"
    ).withColumn("treated", F.lit(True))
    with _p.raises(ValueError, match="covariate"):
        cuped_adjusted_test(const, "y", "x", F.col("treated"))


def test_moods_median_shifted_vs_identical(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        moods_median_test,
    )

    # group b sits entirely above group a's range: huge chi2
    rows = [("a", float(i)) for i in range(40)]
    rows += [("b", float(i) + 100.0) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = moods_median_test(df, "v", "g").collect()[0]
    assert r["k_groups"] == 2 and r["df"] == 1
    assert r["chi2"] > 50.0

    # identical groups: chi2 ~ 0
    same = [(g, float(i % 10)) for g in "ab" for i in range(40)]
    df2 = spark.createDataFrame(same, "g string, v double")
    assert moods_median_test(df2, "v", "g").collect()[0][
        "chi2"
    ] == pytest.approx(0.0, abs=1e-9)


def test_kruskal_wallis_shifted_and_identical(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        kruskal_wallis,
    )

    # three clearly separated groups: H far beyond the chi2_2 tail
    rows = [("a", float(i)) for i in range(30)]
    rows += [("b", float(i) + 100.0) for i in range(30)]
    rows += [("c", float(i) + 200.0) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r["k_groups"] == 3 and r["df"] == 2 and r["n"] == 90
    assert r["h_stat"] > 50.0
    assert r["tie_correction"] == pytest.approx(1.0)  # no ties

    # identical distributions with heavy ties: H small, correction < 1
    same = [(g, float(i % 5)) for g in "abc" for i in range(30)]
    r2 = kruskal_wallis(
        spark.createDataFrame(same, "g string, v double"), "v", "g"
    ).collect()[0]
    assert r2["h_stat"] == pytest.approx(0.0, abs=1e-9)
    assert r2["tie_correction"] < 1.0


def test_friedman_consistent_vs_random_ranking(spark):
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        friedman_test,
    )

    # every block ranks treatments identically: maximal chi2 = n*k... 
    rows = [(b, t, float(ord(t))) for b in range(20) for t in "xyz"]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r["n_blocks"] == 20 and r["k_treatments"] == 3
    # perfect consistency: chi2_F = n(k-1) = 40
    assert r["chi2_f"] == pytest.approx(40.0)

    # incomplete blocks are dropped, not mis-ranked
    rows2 = rows + [(99, "x", 1.0)]  # block 99 lacks y, z
    r2 = friedman_test(
        spark.createDataFrame(rows2, "b int, t string, v double"),
        "b", "t", "v",
    ).collect()[0]
    assert r2["n_blocks"] == 20
    import pytest as _p

    one = spark.createDataFrame([(1, "x", 1.0)], "b int, t string, v double")
    with _p.raises(ValueError):
        friedman_test(one, "b", "t", "v")


def test_friedman_tie_correction_matches_reference(spark):
    """Tied-data Friedman must apply the standard correction divisor
    C = 1 − Σ(t³−t)/(nk(k²−1)) (scipy.stats.friedmanchisquare's
    formula, computed here in pure python as the reference)."""
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        friedman_test,
    )

    # blocks with deliberate within-block ties
    data = {
        1: {"x": 1.0, "y": 1.0, "z": 2.0},
        2: {"x": 3.0, "y": 1.0, "z": 1.0},
        3: {"x": 2.0, "y": 2.0, "z": 2.0},
        4: {"x": 1.0, "y": 2.0, "z": 3.0},
        5: {"x": 2.0, "y": 1.0, "z": 2.0},
    }
    k, n = 3, len(data)

    # reference implementation (midranks + tie correction)
    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mr = (i + j) / 2.0 + 1.0
            for t in range(i, j + 1):
                ranks[order[t]] = mr
            i = j + 1
        return ranks

    treatments = ["x", "y", "z"]
    rj = {t: 0.0 for t in treatments}
    tie_sum = 0.0
    for b, cells in data.items():
        vals = [cells[t] for t in treatments]
        for t, r in zip(treatments, midranks(vals)):
            rj[t] += r
        from collections import Counter

        for cnt in Counter(vals).values():
            tie_sum += cnt**3 - cnt
    chisq = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rj.values()) - 3.0 * n * (k + 1)
    c = 1.0 - tie_sum / (n * k * (k * k - 1))
    expected = chisq / c

    rows = [(b, t, v) for b, cells in data.items() for t, v in cells.items()]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r["chi2_f"] == pytest.approx(expected, rel=1e-12)

    # all blocks fully tied: C = 0 -> NULL statistic, not a crash
    flat = [(b, t, 1.0) for b in range(4) for t in "xyz"]
    r0 = friedman_test(
        spark.createDataFrame(flat, "b int, t string, v double"), "b", "t", "v"
    ).collect()[0]
    assert r0["chi2_f"] is None


def test_cuped_degenerate_arm_yields_nulls_not_crash(spark):
    """An empty or single-unit arm has no variance estimate: NULL
    statistics (module convention), never ZeroDivisionError."""
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        cuped_adjusted_test,
    )

    # control has a single unit; treatment has several
    rows = [(1, True, 5.0, 4.0), (2, True, 6.0, 5.0), (3, True, 7.0, 6.5),
            (4, False, 3.0, 2.0)]
    df = spark.createDataFrame(rows, "u long, arm boolean, y double, x double")
    r = cuped_adjusted_test(df, "y", "x", F.col("arm")).collect()[0]
    assert r["n_t"] == 3 and r["n_c"] == 1
    assert r["z_raw"] is None and r["z_cuped"] is None
    assert r["effect_raw"] is None and r["var_reduction"] is None


def test_ab_power_mde_closed_form(spark):
    """Hand-computable case: equal arms, known variance -> MDE matches
    the textbook formula; degenerate single-unit arm -> NULLs."""
    import math

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        Z_ALPHA_05,
        Z_BETA_80,
        ab_power_mde,
    )

    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (2, 3, 4, 5)
    ]
    df = spark.createDataFrame(rows, "arm string, y double")
    r = ab_power_mde(df, "arm", "y").collect()[0]
    va = vb = 5.0 / 3.0  # sample variance of {1,2,3,4}
    expected = (Z_ALPHA_05 + Z_BETA_80) * math.sqrt(va / 4 + vb / 4)
    assert r["mde_abs"] == pytest.approx(expected, rel=1e-12)
    assert r["n_a"] == 4 and r["n_b"] == 4
    pooled_mean = 3.0
    assert r["mde_rel"] == pytest.approx(expected / pooled_mean, rel=1e-12)
    delta = 0.05 * pooled_mean
    n_exp = math.ceil(2 * (Z_ALPHA_05 + Z_BETA_80) ** 2 * va / delta**2)
    assert r["n_per_arm_target"] == n_exp

    tiny = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "arm string, y double"
    )
    rt = ab_power_mde(tiny, "arm", "y").collect()[0]
    assert rt["mde_abs"] is None and rt["n_per_arm_target"] is None


def test_group_sequential_planted_effect_crosses_pocock_first(spark):
    """A large planted arm effect: Pocock (constant boundary) crosses
    at an earlier look than O'Brien-Fleming (steep early boundary) —
    the textbook contrast; boundaries carry the published K=5
    constants; a null split crosses nothing."""
    from k_means_using_mapreduce_spark.operators.hypothesis import (
        OBF_C_K5,
        POCOCK_C_K5,
        group_sequential,
    )

    rows = []
    for i in range(400):
        arm = "a" if i % 2 == 0 else "b"
        v = 10.0 + (3.0 if arm == "a" else 0.0) + 0.5 * ((i * 7) % 5)
        rows.append((i, 1_000_000 * i, arm, v))
    df = spark.createDataFrame(
        rows, "event_id long, ts long, arm string, value double"
    )
    out = {
        r["look"]: r
        for r in group_sequential(
            df, arm_col="arm", value_col="value", looks=5
        ).collect()
    }
    assert len(out) == 5
    assert out[5]["boundary_pocock"] == POCOCK_C_K5
    assert out[1]["boundary_obf"] == pytest.approx(
        OBF_C_K5 * (5 ** 0.5)
    )
    assert out[5]["boundary_obf"] == pytest.approx(OBF_C_K5)
    first_p = min(k for k, r in out.items() if r["cross_pocock"])
    first_o = min(k for k, r in out.items() if r["cross_obf"])
    assert first_p <= first_o  # Pocock is easier to cross early
    assert out[5]["cross_pocock"] and out[5]["cross_obf"]
    assert out[5]["mean_a"] - out[5]["mean_b"] == pytest.approx(3.0)

    # null split: no crossing anywhere
    null_rows = [
        (i, 1_000_000 * i, "a" if i % 2 else "b", 10.0 + 0.5 * (i % 7))
        for i in range(400)
    ]
    dfn = spark.createDataFrame(
        null_rows, "event_id long, ts long, arm string, value double"
    )
    outn = group_sequential(
        dfn, arm_col="arm", value_col="value", looks=5
    ).collect()
    assert not any(r["cross_pocock"] or r["cross_obf"] for r in outn)

    with pytest.raises(ValueError, match="looks"):
        group_sequential(df, arm_col="arm", value_col="value", looks=1)
    # the boundary constants are the published K=5 values: any other
    # look count must refuse, not silently mis-report (ADVICE r6)
    with pytest.raises(ValueError, match="looks=5"):
        group_sequential(df, arm_col="arm", value_col="value", looks=3)
    with pytest.raises(ValueError, match="looks=5"):
        group_sequential(df, arm_col="arm", value_col="value", looks=10)
    three = df.withColumn(
        "arm3",
        F.when(F.col("event_id") % 3 == 0, "c").otherwise(F.col("arm")),
    )
    with pytest.raises(ValueError, match="exactly 2 arms"):
        group_sequential(three, arm_col="arm3", value_col="value")


def test_jackknife_ratio_matches_closed_form_and_guards(spark):
    """Hand-computed delete-one replicates on a tiny keyed frame match
    exactly; a constant num/den ratio has SE 0 and bias 0; guards."""
    import hashlib
    import math as _m

    from k_means_using_mapreduce_spark.operators.hypothesis import (
        jackknife_ratio,
    )

    rows = [(i, float(2 * i + 1), float(i + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, num double, den double")
    r = jackknife_ratio(
        df, "num", "den", buckets=5, key_col="id"
    ).collect()[0]

    def bucket(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:15]
        return int(h, 16) % 5

    sums = {}
    for i, n, d in rows:
        g = bucket(i)
        sn, sd = sums.get(g, (0.0, 0.0))
        sums[g] = (sn + n, sd + d)
    tn = sum(v[0] for v in sums.values())
    td = sum(v[1] for v in sums.values())
    reps = [(tn - sn) / (td - sd) for g, (sn, sd) in sorted(sums.items())]
    rbar = sum(reps) / len(reps)
    se = _m.sqrt(
        (len(reps) - 1.0)
        / len(reps)
        * sum((x - rbar) ** 2 for x in reps)
    )
    assert r["ratio"] == pytest.approx(tn / td, rel=1e-12)
    assert r["se_jack"] == pytest.approx(se, rel=1e-9)
    assert r["buckets"] == len(reps) and r["n"] == 40

    const = spark.createDataFrame(
        [(i, 3.0 * (i + 1), float(i + 1)) for i in range(30)],
        "id long, num double, den double",
    )
    rc = jackknife_ratio(const, "num", "den", key_col="id").collect()[0]
    assert rc["ratio"] == pytest.approx(3.0)
    assert rc["se_jack"] == pytest.approx(0.0, abs=1e-12)
    assert rc["bias_jack"] == pytest.approx(0.0, abs=1e-12)

    with pytest.raises(ValueError, match="buckets"):
        jackknife_ratio(df, "num", "den", buckets=1)
