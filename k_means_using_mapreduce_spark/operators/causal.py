"""Observational causal-effect estimators on aggregates.

Completes the inference story started by ``hypothesis.diff_in_diff``
(which needs a pre/post panel): when all you have is a cross-section
with confounding, the standard playbook is (1) stratify on the
confounders, (2) estimate a propensity per stratum, (3) reweight.
Both estimators here are pure two-level aggregations — no model fit,
no iteration — and therefore exactly SQL-reproducible:

- ``propensity_table``: per-stratum treated share, trimmed away from
  {0, 1} (the positivity guard every IPW estimate needs);
- ``ipw_ate``: the Hájek (self-normalized) inverse-propensity ATE
  ``Σ(t·y/p)/Σ(t/p) − Σ((1−t)·y/(1−p))/Σ((1−t)/(1−p))`` next to the
  confounded naive difference and the direct stratification
  (outcome-standardization) estimate over both-arm strata.

Scale shape: one groupBy on the strata key (map-side combined), then
a 1-row reduce OVER THE STRATUM AGGREGATES — the sufficient
statistics (n, n₁, Σy per arm) make row-level weights unnecessary, so
no join and no per-row weight column ever materializes. At 100 TB the
cost is one scan + one small-key shuffle.

Trimming note: propensities are clamped to ``[lo, hi]`` BEFORE
weighting (Crump-style overlap enforcement); strata outside the
clamp still contribute, at bounded weight — the standard
bias-for-variance trade, stated rather than hidden.

Reference scope note: the reference engine (master.py:27-150) is
K-Means only; causal estimators are extension scope per the brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def propensity_table(
    df: DataFrame,
    treatment: Column,
    strata: Sequence[str],
    trim: tuple[float, float] = (0.02, 0.98),
) -> DataFrame:
    """Per-stratum propensity: ``(strata..., n, n_treated, p_raw,
    p)`` with ``p`` trimmed into ``[trim[0], trim[1]]``. ``treatment``
    is any boolean column expression."""
    lo, hi = trim
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"invalid trim bounds {trim}")
    t = F.when(treatment, 1).otherwise(0)
    agg = df.groupBy(*[F.col(c) for c in strata]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(t).cast("long").alias("n_treated"),
    )
    p_raw = F.col("n_treated").cast("double") / F.col("n").cast("double")
    return agg.select(
        *[F.col(c) for c in strata],
        "n",
        "n_treated",
        p_raw.alias("p_raw"),
        F.least(F.lit(hi), F.greatest(F.lit(lo), p_raw)).alias("p"),
    )


def ipw_ate(
    df: DataFrame,
    treatment: Column,
    outcome: str,
    strata: Sequence[str],
    trim: tuple[float, float] = (0.02, 0.98),
) -> DataFrame:
    """One-row causal readout:
    ``(n, n_treated, naive_diff, ate_ipw, ate_strat, n_strata_used)``.

    ``naive_diff`` is the confounded mean difference; ``ate_ipw`` the
    Hájek IPW estimate under the stratum propensities; ``ate_strat``
    the direct standardization ``Σ_s w_s (ȳ₁ₛ − ȳ₀ₛ)`` over strata
    with BOTH arms present (weights ∝ stratum size among those
    strata; ``n_strata_used`` counts them). Rows with NULL outcome
    are excluded throughout.
    """
    y = F.col(outcome).cast("double")
    rows = df.where(y.isNotNull())
    t = F.when(treatment, 1).otherwise(0)
    per = rows.groupBy(*[F.col(c) for c in strata]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(t).cast("long").alias("n1"),
        F.sum(F.when(treatment, y)).alias("sy1"),
        F.sum(F.when(~treatment, y)).alias("sy0"),
    )
    lo, hi = trim
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"invalid trim bounds {trim}")
    nd = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    n0d = nd - n1d
    p = F.least(F.lit(hi), F.greatest(F.lit(lo), n1d / nd))
    both = (F.col("n1") > 0) & (F.col("n1") < F.col("n"))
    per = per.select(
        "n",
        "n1",
        (F.coalesce(F.col("sy1"), F.lit(0.0)) / p).alias("w1y"),
        (n1d / p).alias("w1"),
        (F.coalesce(F.col("sy0"), F.lit(0.0)) / (1.0 - p)).alias("w0y"),
        (n0d / (1.0 - p)).alias("w0"),
        F.when(
            both,
            nd
            * (
                F.col("sy1") / F.nullif(n1d, F.lit(0.0))
                - F.col("sy0") / F.nullif(n0d, F.lit(0.0))
            ),
        ).alias("strat_term"),
        F.when(both, F.col("n")).otherwise(0).alias("n_used"),
        both.cast("int").alias("is_used"),
        F.coalesce(F.col("sy1"), F.lit(0.0)).alias("y1"),
        F.coalesce(F.col("sy0"), F.lit(0.0)).alias("y0"),
    )
    out = per.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("n1").cast("long").alias("n_treated"),
        (
            F.sum("y1") / F.nullif(F.sum(F.col("n1").cast("double")), F.lit(0.0))
            - F.sum("y0")
            / F.nullif(
                F.sum((F.col("n") - F.col("n1")).cast("double")), F.lit(0.0)
            )
        ).alias("naive_diff"),
        (
            F.sum("w1y") / F.nullif(F.sum("w1"), F.lit(0.0))
            - F.sum("w0y") / F.nullif(F.sum("w0"), F.lit(0.0))
        ).alias("ate_ipw"),
        (
            F.sum("strat_term")
            / F.nullif(F.sum(F.col("n_used").cast("double")), F.lit(0.0))
        ).alias("ate_strat"),
        F.sum("is_used").cast("long").alias("n_strata_used"),
    )
    return out


def cmh_test(
    df: DataFrame,
    treatment: Column,
    outcome: Column,
    strata: Sequence[str],
) -> DataFrame:
    """Cochran–Mantel–Haenszel stratified association test for two
    binary variables: is treatment associated with outcome AFTER
    conditioning on the strata?

    One row: ``(n, n_strata, or_mh, chi2)`` with the Mantel–Haenszel
    common odds ratio ``Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ)`` and the CMH
    statistic ``(Σaᵢ − ΣE[aᵢ])² / ΣVar(aᵢ)`` (no continuity
    correction — stated, so the SQL oracle is formula-identical).
    Single-row strata (var 0) contribute nothing to either sum, the
    standard degeneracy handling; ``or_mh`` is NULL when no stratum
    has discordant cells (zero denominator).

    The categorical sibling of ``ipw_ate``: same one-groupBy →
    stratum-sufficient-statistics → 1-row-reduce shape, so the same
    100 TB posture (one scan, one small-key shuffle).
    """
    t = F.when(treatment, 1).otherwise(0)
    y = F.when(outcome, 1).otherwise(0)
    per = df.groupBy(*[F.col(c) for c in strata]).agg(
        F.sum(t * y).cast("double").alias("a"),
        F.sum(t * (1 - y)).cast("double").alias("b"),
        F.sum((1 - t) * y).cast("double").alias("c"),
        F.sum((1 - t) * (1 - y)).cast("double").alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    n = a + b + c + d
    e_a = (a + b) * (a + c) / n
    var_a = (
        (a + b) * (c + d) * (a + c) * (b + d)
        / (n * n * F.nullif(n - 1, F.lit(0.0)))
    )
    terms = per.select(
        n.alias("n"),
        a.alias("a"),
        e_a.alias("e_a"),
        F.coalesce(var_a, F.lit(0.0)).alias("var_a"),
        (a * d / n).alias("ad_n"),
        (b * c / n).alias("bc_n"),
    )
    out = terms.agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        (
            F.sum("ad_n") / F.nullif(F.sum("bc_n"), F.lit(0.0))
        ).alias("or_mh"),
        (
            (F.sum(F.col("a") - F.col("e_a")))
            * (F.sum(F.col("a") - F.col("e_a")))
            / F.nullif(F.sum("var_a"), F.lit(0.0))
        ).alias("chi2"),
    )
    return out


def regression_discontinuity(
    df: DataFrame,
    running_col: str,
    outcome_col: str,
    *,
    cutoff: float,
    bandwidth: float,
) -> DataFrame:
    """Sharp regression-discontinuity estimate: fit a separate local
    line to the outcome on each side of ``cutoff`` (within
    ``bandwidth``) and report the jump between their values AT the
    cutoff — the quasi-experimental answer to "did crossing the
    threshold cause a change" when treatment is assigned by the
    running variable (Thistlethwaite & Campbell 1960).

    Both side-fits come from ONE scan of conditional OLS sums
    (left: ``cutoff − h ≤ r < cutoff``, right: ``cutoff ≤ r ≤
    cutoff + h`` — the boundary row belongs to the treated side, the
    sharp-design convention); slopes/intercepts are the closed-form
    arithmetic of ``grouped_ols``, evaluated at ``r = cutoff``.
    Uniform kernel (the transparent choice — triangular weighting is
    a one-line ``w`` column away and loses SQL-oracle bit-parity for
    no estimand change at these bandwidths).

    Returns one row ``(n_left, n_right, y_left_at_cutoff,
    y_right_at_cutoff, rd_effect, slope_left, slope_right)``; NULL
    estimates when a side is degenerate (no variance or < 2 rows).
    """
    if bandwidth <= 0:
        raise ValueError(f"bandwidth must be positive, got {bandwidth}")
    r = F.col(running_col).cast("double")
    y = F.col(outcome_col).cast("double")
    rows = df.where(
        r.isNotNull()
        & y.isNotNull()
        & (r >= cutoff - bandwidth)
        & (r <= cutoff + bandwidth)
    )
    left = r < cutoff

    def side(cond, tag: str):
        def c(expr, name):
            return F.sum(F.when(cond, expr).otherwise(F.lit(0.0))).alias(
                f"{tag}{name}"
            )

        return [
            c(F.lit(1.0), "n"), c(r, "sx"), c(y, "sy"),
            c(r * y, "sxy"), c(r * r, "sxx"),
        ]

    s = rows.agg(*side(left, "l"), *side(~left, "r"))

    def fit(tag: str):
        n = F.col(f"{tag}n")
        det = n * F.col(f"{tag}sxx") - F.col(f"{tag}sx") * F.col(f"{tag}sx")
        slope = (
            n * F.col(f"{tag}sxy") - F.col(f"{tag}sx") * F.col(f"{tag}sy")
        ) / F.nullif(det, F.lit(0.0))
        intercept = (F.col(f"{tag}sy") - slope * F.col(f"{tag}sx")) / F.nullif(
            n, F.lit(0.0)
        )
        return slope, intercept + slope * F.lit(cutoff)

    sl, yl = fit("l")
    sr, yr = fit("r")
    return s.select(
        F.col("ln").cast("long").alias("n_left"),
        F.col("rn").cast("long").alias("n_right"),
        yl.alias("y_left_at_cutoff"),
        yr.alias("y_right_at_cutoff"),
        (yr - yl).alias("rd_effect"),
        sl.alias("slope_left"),
        sr.alias("slope_right"),
    )


def iv_wald_2sls(
    df: DataFrame,
    y_col: str,
    x_col: str,
    z_col: str,
) -> DataFrame:
    """Instrumental-variable estimate of x's effect on y with a single
    instrument z — the just-identified 2SLS, which collapses to the
    Wald/ratio form ``β_IV = cov(z, y) / cov(z, x)`` (Angrist &
    Pischke 2009 §4.1). The causal tool when treatment is confounded
    but an exogenous shifter exists (price from a cost shock, usage
    from an encouragement experiment).

    ONE aggregation scan of seven sums; every reported quantity is a
    closed form over them, so the SQL oracle shares the arithmetic:

    - ``beta_iv`` and the intercept ``alpha = ȳ − β·x̄``;
    - ``beta_ols`` for contrast (the confounded estimate IV corrects);
    - ``first_stage_corr`` = corr(z, x) — the weak-instrument
      diagnostic (|corr| ≲ 0.1 on big n ≈ F ≲ 10: do not trust β_IV);
    - ``reduced_form_corr`` = corr(z, y).

    NULL in any column drops the row. Degenerate inputs (constant z or
    x, or cov(z, x) = 0) surface NULL estimates rather than raising:
    an all-null row IS the weak-instrument verdict.
    """
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    z = F.col(z_col).cast("double")
    rows = df.where(y.isNotNull() & x.isNotNull() & z.isNotNull())
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(y).alias("sy"),
        F.sum(x).alias("sx"),
        F.sum(z).alias("sz"),
        F.sum(z * y).alias("szy"),
        F.sum(z * x).alias("szx"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(z * z).alias("szz"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    cov_zy = n * F.col("szy") - F.col("sz") * F.col("sy")
    cov_zx = n * F.col("szx") - F.col("sz") * F.col("sx")
    cov_xy = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_z = n * F.col("szz") - F.col("sz") * F.col("sz")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    beta_iv = cov_zy / F.nullif(cov_zx, F.lit(0.0))
    return s.select(
        n.cast("long").alias("n"),
        beta_iv.alias("beta_iv"),
        (
            (F.col("sy") - beta_iv * F.col("sx")) / F.nullif(n, F.lit(0.0))
        ).alias("alpha"),
        (cov_xy / F.nullif(var_x, F.lit(0.0))).alias("beta_ols"),
        (
            cov_zx / F.nullif(F.sqrt(var_z * var_x), F.lit(0.0))
        ).alias("first_stage_corr"),
        (
            cov_zy / F.nullif(F.sqrt(var_z * var_y), F.lit(0.0))
        ).alias("reduced_form_corr"),
    )


def covariate_balance(
    df: DataFrame,
    arm_col: str,
    covariates: Sequence[str],
    *,
    arm_a: str = "a",
    arm_b: str = "b",
) -> DataFrame:
    """Standardized mean differences between two arms/splits, one row
    per covariate: ``smd = (mean_a − mean_b) / √((var_a + var_b)/2)``
    — the balance table every experiment readout and train/test split
    review opens with (|SMD| < 0.1 is the conventional "balanced"
    bar; a big SMD means the split leaks the covariate and estimates
    inherit its bias).

    ONE aggregation scan computes all covariates' per-arm moments as
    conditional sums (the covariate-matrix doctrine). Per-covariate
    NULLs drop that covariate's row contribution only (pairwise, not
    complete-rows — a balance table should not vanish because one
    column is sparse). Degenerate variance yields NULL smd. Output:
    ``(covariate, n_a, n_b, mean_a, mean_b, smd, balanced)``.
    """
    covariates = list(covariates)
    if not covariates:
        raise ValueError("need at least one covariate")
    arm = F.col(arm_col)
    rows = df.where(arm.isin([arm_a, arm_b]))
    aggs = []
    for c in covariates:
        y = F.col(c).cast("double")
        in_a = (arm == arm_a) & y.isNotNull()
        in_b = (arm == arm_b) & y.isNotNull()
        aggs += [
            F.sum(F.when(in_a, 1.0).otherwise(0.0)).alias(f"na_{c}"),
            F.sum(F.when(in_a, y).otherwise(0.0)).alias(f"sa_{c}"),
            F.sum(F.when(in_a, y * y).otherwise(0.0)).alias(f"qa_{c}"),
            F.sum(F.when(in_b, 1.0).otherwise(0.0)).alias(f"nb_{c}"),
            F.sum(F.when(in_b, y).otherwise(0.0)).alias(f"sb_{c}"),
            F.sum(F.when(in_b, y * y).otherwise(0.0)).alias(f"qb_{c}"),
        ]
    s = rows.agg(*aggs)
    structs = []
    for c in covariates:
        na, nb = F.col(f"na_{c}"), F.col(f"nb_{c}")
        ma = F.col(f"sa_{c}") / F.nullif(na, F.lit(0.0))
        mb = F.col(f"sb_{c}") / F.nullif(nb, F.lit(0.0))
        va = (
            F.col(f"qa_{c}") - F.col(f"sa_{c}") * F.col(f"sa_{c}") / F.nullif(na, F.lit(0.0))
        ) / F.nullif(na - F.lit(1.0), F.lit(0.0))
        vb = (
            F.col(f"qb_{c}") - F.col(f"sb_{c}") * F.col(f"sb_{c}") / F.nullif(nb, F.lit(0.0))
        ) / F.nullif(nb - F.lit(1.0), F.lit(0.0))
        ok = (na >= 2.0) & (nb >= 2.0)
        smd = F.when(
            ok,
            (ma - mb)
            / F.nullif(F.sqrt((va + vb) / F.lit(2.0)), F.lit(0.0)),
        )
        structs.append(
            F.struct(
                F.lit(c).alias("covariate"),
                na.cast("long").alias("n_a"),
                nb.cast("long").alias("n_b"),
                ma.alias("mean_a"),
                mb.alias("mean_b"),
                smd.alias("smd"),
                F.when(smd.isNotNull(), F.abs(smd) < 0.1).alias("balanced"),
            )
        )
    return s.select(F.explode(F.array(*structs)).alias("r")).select(
        "r.covariate", "r.n_a", "r.n_b", "r.mean_a", "r.mean_b", "r.smd", "r.balanced"
    )


def stratified_ate(
    df: DataFrame,
    treated: Column,
    y_col: str,
    score_col: str,
    *,
    strata: int = 5,
) -> DataFrame:
    """Stratified average treatment effect: bucket units into
    score-quantile strata (propensity or any confounder proxy), take
    the treated-minus-control mean difference WITHIN each stratum, and
    average the differences weighted by stratum size — the classic
    subclassification estimator (Rosenbaum & Rubin 1984; 5 strata
    remove ~90% of the bias a scalar confounder carries), the
    bias-robust companion to :func:`ipw_ate` (no weight blow-ups at
    extreme scores).

    The stratum cuts are exact score quantiles via the bounded-buffer
    bracket path; stratum membership is ``Σ (score > cut_i)`` — pure
    comparisons, no global sort. Strata missing an arm contribute
    NULL diffs and are EXCLUDED from the weighted average with their
    weight (the overlap violation is surfaced in the per-stratum
    rows, not silently imputed). Returns per-stratum rows plus the
    ``stratum = -1`` summary row carrying the pooled ATE over
    both-arm strata.
    """
    from .robust import exact_group_percentiles

    if strata < 2:
        raise ValueError(f"strata must be >= 2, got {strata}")
    y = F.col(y_col).cast("double")
    sc = F.col(score_col).cast("double")
    t = treated.cast("int")
    # 4 bounded passes by construction (bracket sketch, refine,
    # stratum aggregate, and the per/summary split): materialize the
    # 3-column projection once, collect the k-1 cut scalars and fold
    # them back as codegen literals (round-7 multi-pass sweep —
    # 2.44 s -> ~1.3 s at sf0.1; same arithmetic either way).
    rows = (
        df.where(y.isNotNull() & sc.isNotNull() & t.isNotNull())
        .select(y.alias("_y"), sc.alias("_s"), t.alias("_t"))
        .localCheckpoint(eager=True)
    )
    qs = [i / strata for i in range(1, strata)]
    cut_row = exact_group_percentiles(
        rows, "_s", [], [(f"_c{i}", p) for i, p in enumerate(qs)]
    ).collect()[0]
    stratum = F.lit(0)
    for i in range(len(qs)):
        cut = F.lit(cut_row[f"_c{i}"]).cast("double")
        stratum = stratum + (F.col("_s") > cut).cast("int")
    per = (
        rows.select("_y", "_t", stratum.alias("stratum"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.when(F.col("_t") == 1, 1.0).otherwise(0.0)).alias("nt"),
            F.sum(F.when(F.col("_t") == 1, F.col("_y")).otherwise(0.0)).alias("st"),
            F.sum(F.when(F.col("_t") == 0, F.col("_y")).otherwise(0.0)).alias("sc_"),
        )
        # per is <= strata rows consumed TWICE (per-stratum rows +
        # pooled summary); pin it so the stratum aggregate runs once
        .localCheckpoint(eager=True)
    )
    nc = F.col("n") - F.col("nt")
    diff = F.when(
        (F.col("nt") > 0) & (nc > 0),
        F.col("st") / F.col("nt") - F.col("sc_") / nc,
    )
    strat_rows = per.select(
        F.col("stratum").cast("int").alias("stratum"),
        F.col("n").cast("long").alias("n"),
        F.col("nt").cast("long").alias("n_treated"),
        nc.cast("long").alias("n_control"),
        diff.alias("effect"),
    )
    summary = (
        per.select("n", diff.alias("_d"))
        .where(F.col("_d").isNotNull())
        .agg(
            (F.sum(F.col("n") * F.col("_d")) / F.sum("n")).alias("effect"),
            F.sum("n").cast("long").alias("n"),
        )
        .select(
            F.lit(-1).alias("stratum"),
            "n",
            # -1 sentinels (not NULL): a nullable numeric contract
            # column NaN-flips through pandas in cross-engine checks
            F.lit(-1).cast("long").alias("n_treated"),
            F.lit(-1).cast("long").alias("n_control"),
            "effect",
        )
    )
    return strat_rows.unionByName(summary)


def synthetic_control(
    panel: DataFrame,
    *,
    unit_col: str,
    time_col: str,
    value_col: str,
    treated: str,
    donors: Sequence[str],
    cutoff: Column,
) -> DataFrame:
    """Synthetic-control effect estimate (Abadie et al.) for ONE
    treated unit against a 3-donor pool — the panel sibling of
    ``hypothesis.diff_in_diff``: instead of assuming parallel trends,
    BUILD the counterfactual as the donor combination that best
    tracks the treated unit pre-intervention,

        y_treated,t ≈ w₁·d₁,t + w₂·d₂,t + w₃·d₃,t   (pre-period OLS)

    then read the effect as the post-period gap to that synthetic
    twin. This is the regression-weights variant (weights solved by
    unconstrained least squares, no simplex constraint — Doudchenko
    & Imbens form): exactly closed-form, hence oracle-checkable via
    the shared 3×3 Cramer expansion (``regression._cramer3``).

    ``panel`` holds one row per (unit, period) with the outcome;
    ``cutoff`` is a Column boundary — periods strictly BEFORE it are
    the fit window, the rest score the effect.

    Returns one row ``(n_pre, n_post, w1, w2, w3, pre_rmse, att)``
    where ``att`` is the mean post-period (actual − synthetic) gap.

    Scale shape: one groupBy(period) builds the 4-series panel via
    conditional sums (map-side combined; unit filter pushed to the
    scan), one 9-double aggregate over the pre window feeds the
    driver's 3×3 solve, and one final scan scores both windows —
    three passes over a T-row panel, no joins wider than the panel
    build.
    """
    if len(donors) != 3:
        raise ValueError(
            f"synthetic_control is the explicit 3-donor closed form, "
            f"got {len(donors)} donors"
        )
    if treated in donors:
        raise ValueError(f"treated unit {treated!r} cannot be a donor")
    from .regression import _cramer3

    u, v = F.col(unit_col), F.col(value_col).cast("double")

    def series(name: str) -> Column:
        return F.coalesce(F.sum(F.when(u == name, v)), F.lit(0.0))

    keep = [treated, *donors]
    grid = (
        panel.where(u.isin(keep))
        .groupBy(F.col(time_col).alias("_t"))
        .agg(
            series(treated).alias("y"),
            series(donors[0]).alias("d1"),
            series(donors[1]).alias("d2"),
            series(donors[2]).alias("d3"),
        )
        .withColumn("_pre", F.col("_t") < cutoff)
    )
    y, d1, d2, d3 = F.col("y"), F.col("d1"), F.col("d2"), F.col("d3")
    s = grid.where("_pre").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d1 * d1).alias("s11"),
        F.sum(d1 * d2).alias("s12"),
        F.sum(d1 * d3).alias("s13"),
        F.sum(d2 * d2).alias("s22"),
        F.sum(d2 * d3).alias("s23"),
        F.sum(d3 * d3).alias("s33"),
        F.sum(d1 * y).alias("b1"),
        F.sum(d2 * y).alias("b2"),
        F.sum(d3 * y).alias("b3"),
    ).collect()[0]
    if s["n"] < 4.0:
        raise ValueError(
            f"need at least 4 pre-cutoff periods, got {int(s['n'])}"
        )
    w1, w2, w3 = _cramer3(
        [
            [s["s11"], s["s12"], s["s13"]],
            [s["s12"], s["s22"], s["s23"]],
            [s["s13"], s["s23"], s["s33"]],
        ],
        [s["b1"], s["b2"], s["b3"]],
    )
    synth = F.lit(w1) * d1 + F.lit(w2) * d2 + F.lit(w3) * d3
    gap = y - synth
    return grid.agg(
        F.sum(F.when(F.col("_pre"), 1).otherwise(0))
        .cast("long")
        .alias("n_pre"),
        F.sum(F.when(~F.col("_pre"), 1).otherwise(0))
        .cast("long")
        .alias("n_post"),
        F.lit(w1).alias("w1"),
        F.lit(w2).alias("w2"),
        F.lit(w3).alias("w3"),
        F.sqrt(
            F.sum(F.when(F.col("_pre"), gap * gap))
            / F.sum(F.when(F.col("_pre"), 1.0))
        ).alias("pre_rmse"),
        (
            F.sum(F.when(~F.col("_pre"), gap))
            / F.sum(F.when(~F.col("_pre"), 1.0))
        ).alias("att"),
    )


def aipw_ate(
    df: DataFrame,
    *,
    treatment: Column,
    y_col: str,
    x_cols: Sequence[str],
    iters: int = 3,
    clamp: "tuple[float, float]" = (0.01, 0.99),
) -> DataFrame:
    """Doubly-robust (AIPW) average-treatment-effect estimate with
    MODEL-BASED nuisances — the smooth-covariate upgrade of
    :func:`ipw_ate` (whose propensities and outcome means are
    stratum-saturated): propensity from the shared 2-feature
    logistic Newton closed form, per-arm outcome regressions from the
    3×3 OLS closed form, combined by the augmented IPW estimator

        ψᵢ = m̂₁(xᵢ) − m̂₀(xᵢ)
             + tᵢ·(yᵢ − m̂₁(xᵢ))/p̂(xᵢ)
             − (1−tᵢ)·(yᵢ − m̂₀(xᵢ))/(1−p̂(xᵢ))

    which is consistent if EITHER the propensity OR the outcome model
    is right (Robins-Rotnitzky-Zhao). Propensities are clamped to
    ``clamp`` before weighting (the same overlap guard ipw_ate
    documents). Reports the AIPW estimate next to the pure
    outcome-regression estimate and the naive difference, so the
    augmentation's contribution is visible.

    Returns one row ``(n, n_treated, ate_aipw, ate_reg, naive_diff)``.

    Scale shape: ``iters`` logistic scans (nine doubles each), ONE
    conditional-sum scan building BOTH arms' normal equations, two
    driver-side 3×3 Cramer solves, one scoring scan — no row-level
    weight column materializes and nothing row-sized reaches the
    driver.
    """
    if len(x_cols) != 2:
        raise ValueError(
            f"aipw_ate is the explicit 2-feature closed form, "
            f"got {len(x_cols)} features"
        )
    lo, hi = clamp
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"need 0 < lo < hi < 1, got clamp={clamp}")
    from .regression import _cramer3, logistic_newton

    x1, x2 = F.col(x_cols[0]).cast("double"), F.col(x_cols[1]).cast(
        "double"
    )
    y = F.col(y_col).cast("double")
    t = treatment.cast("double")
    rows = df.where(
        x1.isNotNull() & x2.isNotNull() & y.isNotNull() & t.isNotNull()
    ).select(
        t.alias("t"), y.alias("y"), x1.alias("x1"), x2.alias("x2")
    )
    rows = rows.localCheckpoint(eager=False)
    prop = logistic_newton(rows, ["x1", "x2"], "t", iters=iters).collect()[
        0
    ]
    pb0, pb1, pb2 = prop["b0"], prop["b1"], prop["b2"]

    def arm_sums(tag: str, cond: Column) -> list[Column]:
        w = F.when(cond, 1.0).otherwise(0.0)
        c1, c2, yy = F.col("x1"), F.col("x2"), F.col("y")
        return [
            F.sum(w).alias(f"{tag}n"),
            F.sum(w * c1).alias(f"{tag}s1"),
            F.sum(w * c2).alias(f"{tag}s2"),
            F.sum(w * c1 * c1).alias(f"{tag}s11"),
            F.sum(w * c1 * c2).alias(f"{tag}s12"),
            F.sum(w * c2 * c2).alias(f"{tag}s22"),
            F.sum(w * yy).alias(f"{tag}sy"),
            F.sum(w * c1 * yy).alias(f"{tag}s1y"),
            F.sum(w * c2 * yy).alias(f"{tag}s2y"),
        ]

    s = rows.agg(
        *arm_sums("a", F.col("t") == 1.0),
        *arm_sums("b", F.col("t") == 0.0),
    ).collect()[0]

    def solve(tag: str) -> list[float]:
        if s[f"{tag}n"] < 4.0:
            raise ValueError(
                "need at least 4 rows in each arm for the outcome fit"
            )
        return _cramer3(
            [
                [s[f"{tag}n"], s[f"{tag}s1"], s[f"{tag}s2"]],
                [s[f"{tag}s1"], s[f"{tag}s11"], s[f"{tag}s12"]],
                [s[f"{tag}s2"], s[f"{tag}s12"], s[f"{tag}s22"]],
            ],
            [s[f"{tag}sy"], s[f"{tag}s1y"], s[f"{tag}s2y"]],
        )

    a1 = solve("a")  # treated outcome model
    a0 = solve("b")  # control outcome model

    z = F.lit(pb0) + F.lit(pb1) * F.col("x1") + F.lit(pb2) * F.col("x2")
    p = F.least(
        F.greatest(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), F.lit(float(lo))
        ),
        F.lit(float(hi)),
    )
    m1 = F.lit(a1[0]) + F.lit(a1[1]) * F.col("x1") + F.lit(a1[2]) * F.col(
        "x2"
    )
    m0 = F.lit(a0[0]) + F.lit(a0[1]) * F.col("x1") + F.lit(a0[2]) * F.col(
        "x2"
    )
    tt = F.col("t")
    psi = (
        m1
        - m0
        + tt * (F.col("y") - m1) / p
        - (F.lit(1.0) - tt) * (F.col("y") - m0) / (F.lit(1.0) - p)
    )
    return rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(tt).cast("long").alias("n_treated"),
        F.avg(psi).alias("ate_aipw"),
        F.avg(m1 - m0).alias("ate_reg"),
        (
            F.sum(tt * F.col("y")) / F.sum(tt)
            - F.sum((F.lit(1.0) - tt) * F.col("y"))
            / F.sum(F.lit(1.0) - tt)
        ).alias("naive_diff"),
    )
