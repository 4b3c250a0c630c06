"""Survival analysis: the Kaplan-Meier estimator over right-censored
durations — retention/churn curves computed correctly.

Naive retention ("fraction of users still active after T") silently
treats users who joined recently as churned; Kaplan-Meier (1958) is
the standard fix — censored subjects leave the risk set without
counting as events, so the curve is unbiased under independent
censoring.

Estimator: with d_t events among n_t at risk at each distinct event
time t, ``S(t) = Π_{t' ≤ t} (1 − d_{t'}/n_{t'})``.

Spark shape: durations reduce to one row per DISTINCT duration (a
map-side-combinable count), so every window below runs over the
distinct-duration table — thousands of rows no matter how many
subjects — in ONE ordered pass: the risk set is a reverse cumulative
sum, and the product is ``exp(cumsum(ln))`` with an explicit
zero-factor guard (a time where everyone at risk dies sends the curve
to exactly 0; ln(0) is null in Spark and -inf in other engines, so
the guard keeps both the math and the oracle well-defined). The
window is globally ordered — a single-reducer pass over the
distinct-duration table, which is fine because that table is
tiny; at extreme cardinality pre-bucket durations first.

The reference has no temporal surface (SURVEY.md §2); this joins the
retention/funnel family (operators/timeseries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Survival curve from ``(duration, event)`` rows (event 1 =
    observed, 0 = right-censored). Output: one row per distinct
    OBSERVED-event duration — ``(t, n_risk, n_events, survival)``,
    ascending t."""
    per_t = (
        df.groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.count("*").alias("_all"),
            F.sum(F.col(event_col).cast("long")).alias("n_events"),
        )
    )
    w_desc = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    with_risk = per_t.withColumn("n_risk", F.sum("_all").over(w_desc))
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    factor = F.lit(1.0) - d / n
    curve = (
        with_risk.withColumn("_f", factor)
        .withColumn(
            "_lnf", F.when(F.col("_f") > 0, F.log("_f")).otherwise(F.lit(0.0))
        )
        .withColumn("_runmin", F.min("_f").over(w_asc))
        .withColumn(
            "survival",
            F.when(
                F.col("_runmin") > 0, F.exp(F.sum("_lnf").over(w_asc))
            ).otherwise(F.lit(0.0)),
        )
    )
    return (
        curve.where(F.col("n_events") > 0)
        .select("t", "n_risk", "n_events", "survival")
    )


def user_lifetimes(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon_ns: int,
    unit_ns: int,
) -> DataFrame:
    """Per-user (duration, event) pairs from an event log: duration =
    first-to-last activity span in ``unit_ns`` units (integer floor
    division — exact on int64 nanos), event = 1 (churn observed) iff
    the user's last activity precedes the corpus end by more than
    ``horizon_ns``, else censored-at-present 0. The global end arrives
    by broadcast, not collect."""
    if horizon_ns < 0:
        raise ValueError(f"horizon_ns must be >= 0, got {horizon_ns}")
    if unit_ns <= 0:
        raise ValueError(f"unit_ns must be > 0, got {unit_ns}")
    spans = events.groupBy(user_col).agg(
        F.min(ts_col).alias("_first"), F.max(ts_col).alias("_last")
    )
    glob = spans.agg(F.max("_last").alias("_gmax"))
    span = F.col("_last") - F.col("_first")
    return (
        spans.join(F.broadcast(glob))
        .select(
            user_col,
            ((span - span % unit_ns) / unit_ns).cast("long").alias("duration"),
            (F.col("_last") < F.col("_gmax") - F.lit(horizon_ns))
            .cast("int")
            .alias("event"),
        )
    )


def log_rank_test(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
    *,
    group_a,
    group_b,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966) — "are these two
    survival curves the same?", the inferential companion to
    :func:`kaplan_meier`: one row ``(n_a, n_b, events_a, events_b,
    o_minus_e, var, chi2, z)`` where at every distinct event time
    ``E_a = d · n_a/n`` and ``V = d (n_a/n)(1 − n_a/n)(n − d)/(n − 1)``
    over the at-risk sets, ``chi2 = (Σ(d_a − E_a))² / ΣV`` (1 dof).

    Same scale shape as the estimator: everything reduces to the
    distinct-duration table first (per-time event/at-risk counts per
    group via one aggregation + reverse cumulative windows), so the
    ordered pass sees time cardinality, not subjects. Single-time
    risk sets of 1 contribute zero variance (the n > 1 guard).
    """
    g = F.col(group_col)
    ev = F.col(event_col).cast("int")
    both = df.where(g.isin([group_a, group_b]))
    per_t = (
        both.groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.when(g == group_a, ev).otherwise(0)).alias("d1"),
            F.sum(F.when(g == group_b, ev).otherwise(0)).alias("d2"),
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("c2"),
        )
    )
    w = (
        Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risky = per_t.select(
        "t",
        "d1",
        "d2",
        F.sum("c1").over(w).cast("double").alias("n1"),
        F.sum("c2").over(w).cast("double").alias("n2"),
    ).where(F.col("d1") + F.col("d2") > 0)
    d = (F.col("d1") + F.col("d2")).cast("double")
    n = F.col("n1") + F.col("n2")
    e1 = d * F.col("n1") / n
    v = F.coalesce(
        d
        * (F.col("n1") / n)
        * (1 - F.col("n1") / n)
        * (n - d)
        / F.nullif(n - 1, F.lit(0.0)),
        F.lit(0.0),
    )
    terms = risky.agg(
        # coalesce: a zero-event input (everyone censored) yields a
        # well-defined 0-evidence row, not NULLs (which the DuckDB
        # pandas bridge would render NaN); chi2/z stay NULL there —
        # "no evidence" has no statistic
        F.coalesce(F.sum(F.col("d1") - e1), F.lit(0.0)).alias("o_minus_e"),
        F.coalesce(F.sum(v), F.lit(0.0)).alias("var"),
        F.coalesce(F.sum("d1"), F.lit(0)).cast("long").alias("events_a"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("long").alias("events_b"),
    )
    sizes = both.agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    return sizes.crossJoin(F.broadcast(terms)).select(
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        "o_minus_e",
        "var",
        (
            F.col("o_minus_e") * F.col("o_minus_e")
            / F.nullif(F.col("var"), F.lit(0.0))
        ).alias("chi2"),
        (F.col("o_minus_e") / F.sqrt(F.nullif(F.col("var"), F.lit(0.0)))).alias(
            "z"
        ),
    )


def cox_ph(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    x_col: str,
    *,
    iters: int = 4,
) -> DataFrame:
    """Cox proportional-hazards regression (single covariate, Breslow
    tie handling) by Newton-Raphson — the regression member of this
    module's survival family: Kaplan-Meier describes ONE curve,
    log-rank compares two, Cox quantifies how a covariate scales the
    hazard (``hazard_ratio = exp(beta)`` per unit of x).

    Flat-iteration doctrine (huber/logistic/poisson shape): each
    Newton round folds the current β in as a literal, reduces subjects
    to DISTINCT-duration blocks carrying ``(Σe^{βx}, Σxe^{βx},
    Σx²e^{βx})`` over everyone at that time plus the event-only
    ``(d, Σx)``, runs ONE descending cumulative window over the block
    table (the risk set ``t_j ≥ t`` — block rows, never subjects), and
    aggregates the Breslow score ``U = Σ_t [Σ_{events} x − d·S1/S0]``
    and information ``I = Σ_t d·[S2/S0 − (S1/S0)²]``; the driver
    applies ``β += U/I``. The final round also reports the partial
    log-likelihood ``Σ_t [β·Σ_{events} x − d·ln S0]`` and the Wald
    ``se = 1/√I``, ``z = β/se``.

    Censoring: rows with ``event = 0`` join every risk set they
    survive into but contribute no event terms — exactly KM's
    censoring semantics. Scale: per round, one groupBy to blocks +
    one ordered window over |distinct durations| rows + a 1-row
    aggregate. Keep x at O(1) scale (standardize or log-transform
    counts) — the canon-stability rule for every Newton family here.

    Returns one row ``(n, n_events, beta, hazard_ratio, se, z,
    log_lik)``. Raises on zero events or a degenerate (constant-x)
    information matrix.
    """
    import math

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    t = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    x = F.col(x_col).cast("double")
    base = df.where(t.isNotNull() & e.isNotNull() & x.isNotNull()).select(
        t.alias("_t"), e.alias("_e"), x.alias("_x")
    )
    # the blocks are re-derived per round with a new beta literal; the
    # subject relation is scanned iters times — materialize it once
    base = base.localCheckpoint()
    counts = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_e").cast("long").alias("n_events"),
    ).collect()[0]
    if counts["n_events"] < 1:
        raise ValueError("cox_ph needs at least one observed event")
    beta = 0.0
    stats = None
    for _ in range(iters):
        w = F.exp(F.lit(beta) * F.col("_x"))
        blocks = base.groupBy("_t").agg(
            F.sum(w).alias("b0"),
            F.sum(w * F.col("_x")).alias("b1"),
            F.sum(w * F.col("_x") * F.col("_x")).alias("b2"),
            F.sum(F.col("_e")).cast("double").alias("d"),
            F.sum(F.when(F.col("_e") == 1, F.col("_x")).otherwise(0.0)).alias(
                "sx"
            ),
        )
        win = Window.orderBy(F.desc("_t")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        risk = blocks.select(
            "d",
            "sx",
            F.sum("b0").over(win).alias("s0"),
            F.sum("b1").over(win).alias("s1"),
            F.sum("b2").over(win).alias("s2"),
        ).where(F.col("d") > 0)
        r1 = F.col("s1") / F.col("s0")
        stats = risk.agg(
            F.sum(F.col("sx") - F.col("d") * r1).alias("u"),
            F.sum(
                F.col("d") * (F.col("s2") / F.col("s0") - r1 * r1)
            ).alias("i"),
            F.sum(
                F.lit(beta) * F.col("sx") - F.col("d") * F.log("s0")
            ).alias("ll"),
        ).collect()[0]
        if stats["i"] is None or stats["i"] <= 0.0:
            raise ValueError(
                "singular information matrix: covariate is constant "
                "within every risk set"
            )
        beta = beta + stats["u"] / stats["i"]
        if not math.isfinite(beta):
            raise ValueError("cox_ph diverged (non-finite beta)")
    # score the CONVERGED beta: one more block pass for ll/se at the
    # reported coefficient (stats above belong to the pre-step beta)
    w = F.exp(F.lit(beta) * F.col("_x"))
    blocks = base.groupBy("_t").agg(
        F.sum(w).alias("b0"),
        F.sum(w * F.col("_x")).alias("b1"),
        F.sum(w * F.col("_x") * F.col("_x")).alias("b2"),
        F.sum(F.col("_e")).cast("double").alias("d"),
        F.sum(F.when(F.col("_e") == 1, F.col("_x")).otherwise(0.0)).alias(
            "sx"
        ),
    )
    win = Window.orderBy(F.desc("_t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = blocks.select(
        "d",
        "sx",
        F.sum("b0").over(win).alias("s0"),
        F.sum("b1").over(win).alias("s1"),
        F.sum("b2").over(win).alias("s2"),
    ).where(F.col("d") > 0)
    r1 = F.col("s1") / F.col("s0")
    return risk.agg(
        F.lit(int(counts["n"])).alias("n"),
        F.lit(int(counts["n_events"])).alias("n_events"),
        F.lit(beta).alias("beta"),
        F.exp(F.lit(beta)).alias("hazard_ratio"),
        (
            F.lit(1.0)
            / F.sqrt(
                F.sum(F.col("d") * (F.col("s2") / F.col("s0") - r1 * r1))
            )
        ).alias("se"),
        (
            F.lit(beta)
            * F.sqrt(
                F.sum(F.col("d") * (F.col("s2") / F.col("s0") - r1 * r1))
            )
        ).alias("z"),
        F.sum(
            F.lit(beta) * F.col("sx") - F.col("d") * F.log("s0")
        ).alias("log_lik"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator with its standard
    variance — the additive twin of Kaplan–Meier (Λ(t) = Σ_{t'≤t}
    d/n; KM ≈ exp(−Λ)). Preferred when hazards themselves are the
    object (competing risks, hazard-ratio eyeballing before
    :func:`cox_ph`) and better-behaved than KM at small risk sets.

    Variance: the Poisson-type ``Σ d/n²`` form. Same plan shape as
    :func:`kaplan_meier`: distinct-duration blocks, one descending
    cumulative window for the risk set, one ascending for the sums —
    block rows only, never subjects.

    Output: one row per distinct observed-event duration —
    ``(t, n_risk, n_events, cum_hazard, var_cum_hazard)``.
    """
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.count("*").alias("_all"),
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    with_risk = per_t.withColumn("n_risk", F.sum("_all").over(w_desc))
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    curve = with_risk.withColumn(
        "cum_hazard", F.sum(d / n).over(w_asc)
    ).withColumn("var_cum_hazard", F.sum(d / (n * n)).over(w_asc))
    return curve.where(F.col("n_events") > 0).select(
        "t", "n_risk", "n_events", "cum_hazard", "var_cum_hazard"
    )


def restricted_mean_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    tau: float,
) -> DataFrame:
    """Restricted mean survival time: ``RMST(τ) = ∫₀^τ S(t) dt`` — the
    model-free effect size survival papers report when hazards are
    non-proportional ("average event-free time over the first τ
    units"). The integral of the Kaplan–Meier STEP function is an
    exact sum: each inter-event interval contributes ``S(t_prev) ×
    (min(t, τ) − t_prev)``, plus the tail ``S(t_last) × (τ −
    t_last)`` — one ordered pass over the KM block rows, no
    approximation.

    Returns one row ``(tau, rmst, km_at_tau)``.
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    km = kaplan_meier(df, duration_col, event_col).where(
        F.col("t") <= F.lit(tau)
    )
    w = Window.orderBy("t")
    stepped = km.select(
        F.col("t").cast("double").alias("t"),
        "survival",
        F.lag("t", 1, 0.0).over(w).cast("double").alias("_t_prev"),
        F.lag("survival", 1, 1.0).over(w).alias("_s_prev"),
    )
    return stepped.agg(
        F.lit(float(tau)).alias("tau"),
        (
            F.coalesce(
                F.sum(F.col("_s_prev") * (F.col("t") - F.col("_t_prev"))),
                F.lit(0.0),
            )
            # tail: the last step's survival carries to tau (1.0 when
            # no event time precedes tau at all)
            + F.coalesce(F.min("survival"), F.lit(1.0))
            * (F.lit(float(tau)) - F.coalesce(F.max("t"), F.lit(0.0)))
        ).alias("rmst"),
        F.coalesce(F.min("survival"), F.lit(1.0)).alias("km_at_tau"),
    )


#: two-sided 95% normal quantile, shared literal with the SQL oracles
Z_975 = 1.959963984540054


def kaplan_meier_ci(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    *,
    z: float = Z_975,
) -> DataFrame:
    """Kaplan–Meier curve with Greenwood variance and the log(−log)
    confidence band — the interval every survival plot draws
    (Kalbfleisch & Prentice): plain Greenwood bands escape [0, 1] near
    the tails; the complementary-log-log transform keeps them inside
    by construction.

        varf(t)  = Σ_{t'≤t} d / (n(n−d))          (Greenwood factor)
        se_ll(t) = √varf / |ln S|
        ci       = S^{exp(±z·se_ll)}

    Rows where the band is undefined emit sentinel bounds instead of
    NULLs (the NaN-round-trip doctrine): S = 0 (curve hit zero) →
    (0, 0); a d = n block (varf term division by zero) contributes a
    NULL-guarded term. Same block-table plan shape as
    :func:`kaplan_meier`.

    Output: ``(t, n_risk, n_events, survival, ci_lo, ci_hi)``.
    """
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.count("*").alias("_all"),
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    with_risk = per_t.withColumn("n_risk", F.sum("_all").over(w_desc))
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    factor = F.lit(1.0) - d / n
    curve = (
        with_risk.withColumn("_f", factor)
        .withColumn(
            "_lnf", F.when(F.col("_f") > 0, F.log("_f")).otherwise(F.lit(0.0))
        )
        .withColumn(
            "_gw", d / F.nullif(n * (n - d), F.lit(0.0))
        )
        .withColumn("_runmin", F.min("_f").over(w_asc))
        .withColumn(
            "survival",
            F.when(
                F.col("_runmin") > 0, F.exp(F.sum("_lnf").over(w_asc))
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_varf", F.coalesce(F.sum("_gw").over(w_asc), F.lit(0.0))
        )
    )
    s = F.col("survival")
    lns = F.log(s)  # guarded below: only used when 0 < s < 1
    se_ll = F.sqrt(F.col("_varf")) / F.abs(lns)
    lo = F.pow(s, F.exp(F.lit(float(z)) * se_ll))
    hi = F.pow(s, F.exp(F.lit(-float(z)) * se_ll))
    band_ok = (s > 0) & (s < 1)
    return curve.where(F.col("n_events") > 0).select(
        "t",
        "n_risk",
        "n_events",
        "survival",
        F.when(band_ok, lo).otherwise(F.lit(0.0)).alias("ci_lo"),
        F.when(band_ok, hi)
        .otherwise(F.when(s >= 1, F.lit(1.0)).otherwise(F.lit(0.0)))
        .alias("ci_hi"),
    )


def weibull_fit(
    lifetimes: DataFrame,
    *,
    duration_col: str = "duration",
    event_col: str = "event",
    iters: int = 5,
) -> DataFrame:
    """Right-censored Weibull MLE via profile-likelihood Newton on the
    shape — the parametric member of the survival family (Kaplan-Meier
    / Nelson-Aalen are its nonparametric checks; reference scope is
    2-D K-Means only, this is engine surface).

    For Weibull(k, λ) with censoring, the scale profile is closed-form
    (``λ^k = Σtᵢ^k / d`` over ALL durations, d = observed events), so
    the fit reduces to Newton on the 1-D profile score

        g(k)  = 1/k + (Σ_ev ln t)/d − (Σ t^k ln t)/(Σ t^k)
        g'(k) = −1/k² − (Σ t^k ln²t · Σ t^k − (Σ t^k ln t)²)/(Σ t^k)²

    warm-started at k=1 (the exponential), with a 0.05 floor guarding
    an early overshoot. Each round is one scan whose three power sums
    fold the current k in as a literal — the flat driver-loop shape of
    huber/poisson (operators/regression.py) — and a final scan at the
    converged k yields λ and the log-likelihood
    ``d·ln k − d·k·ln λ + (k−1)·Σ_ev ln t − d`` (the ``Σ(t/λ)^k``
    term collapses to exactly d at the profiled λ). Zero durations are
    excluded (ln t undefined — single-event users contribute no
    lifetime information).

    Returns one row ``(n, n_events, shape, scale, log_lik)``.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    t = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("double")
    rows = lifetimes.where(t.isNotNull() & ev.isNotNull() & (t > 0))
    # the Newton loop scans this relation iters+2 times; lifetimes are
    # per-subject rows (cohort-bounded, tiny next to the event streams
    # they're derived from), so pin once instead of re-running the
    # caller's derivation per round (weibull_churn_users: 6.1 s → 3.0 s
    # at sf0.1, identical fit)
    rows = rows.localCheckpoint()
    lt = F.log(t)
    s0 = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ev).alias("d"),
        F.sum(ev * lt).alias("sld"),
    ).collect()[0]
    n, d, sld = int(s0["n"]), float(s0["d"] or 0.0), s0["sld"]
    if d < 1.0:
        raise ValueError(
            "need at least one observed (uncensored) event with t > 0"
        )
    k = 1.0
    for _ in range(iters):
        tk = F.pow(t, F.lit(k))
        s = rows.agg(
            F.sum(tk).alias("sw"),
            F.sum(tk * lt).alias("swl"),
            F.sum(tk * lt * lt).alias("swll"),
        ).collect()[0]
        g = 1.0 / k + sld / d - s["swl"] / s["sw"]
        gp = -1.0 / (k * k) - (
            s["swll"] * s["sw"] - s["swl"] * s["swl"]
        ) / (s["sw"] * s["sw"])
        k = max(k - g / gp, 0.05)
    sw_f = rows.agg(F.sum(F.pow(t, F.lit(k))).alias("sw")).collect()[0]["sw"]
    import math

    scale = (sw_f / d) ** (1.0 / k)
    log_lik = d * math.log(k) - d * k * math.log(scale) + (k - 1.0) * sld - d
    spark = lifetimes.sparkSession
    return _k_row_df(spark, 
        [(n, int(d), float(k), float(scale), float(log_lik))],
        "n long, n_events long, shape double, scale double, log_lik double",
    )


def aalen_johansen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Aalen–Johansen cumulative incidence for TWO competing risks —
    the competing-events member of the survival family
    (:func:`kaplan_meier` treats all events as one cause; here cause 1
    and cause 2 compete, and naively running KM per cause OVERSTATES
    both): from ``(duration, event)`` rows with event ∈ {0 censored,
    1 cause-1, 2 cause-2},

        CIF_k(t) = Σ_{s ≤ t} S(s⁻) · d_k(s) / n(s)

    where ``S(s⁻)`` is the all-cause Kaplan–Meier just BEFORE s. The
    identity ``CIF₁(t) + CIF₂(t) + S(t) = 1`` holds at every event
    time (no probability mass is double-counted — the property the
    per-cause-KM shortcut violates).

    Output: one row per distinct duration with ≥ 1 event of either
    cause — ``(t, n_risk, d1, d2, cif1, cif2, survival)``, ascending
    t.

    Scale shape: identical to kaplan_meier — one duration groupBy
    (the corpus reduces here), then ordered windows over the DISTINCT
    durations only; cumulative products ride as exp(Σ ln) with the
    same zero-survival guard. Both engines accumulate in ascending-t
    order, so the curve is float-portable.
    """
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.count("*").alias("_all"),
        F.sum((F.col(event_col) == 1).cast("long")).alias("d1"),
        F.sum((F.col(event_col) == 2).cast("long")).alias("d2"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    with_risk = per_t.withColumn("n_risk", F.sum("_all").over(w_desc))
    d = (F.col("d1") + F.col("d2")).cast("double")
    n = F.col("n_risk").cast("double")
    f = F.lit(1.0) - d / n
    curve = (
        with_risk.withColumn("_f", f)
        .withColumn(
            "_lnf",
            F.when(F.col("_f") > 0, F.log("_f")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_s_minus",
            # empty preceding window (first event time) => S(s-) = 1;
            # a when().otherwise() chain would swallow that NULL as 0
            F.when(F.min("_f").over(w_prev).isNull(), F.lit(1.0))
            .when(
                F.min("_f").over(w_prev) > 0,
                F.exp(F.sum("_lnf").over(w_prev)),
            )
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_surv",
            F.when(
                F.min("_f").over(w_asc) > 0,
                F.exp(F.sum("_lnf").over(w_asc)),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "cif1",
            F.sum(
                F.col("_s_minus") * F.col("d1").cast("double") / n
            ).over(w_asc),
        )
        .withColumn(
            "cif2",
            F.sum(
                F.col("_s_minus") * F.col("d2").cast("double") / n
            ).over(w_asc),
        )
    )
    return curve.where((F.col("d1") + F.col("d2")) > 0).select(
        "t",
        "n_risk",
        "d1",
        "d2",
        "cif1",
        "cif2",
        F.col("_surv").alias("survival"),
    )
