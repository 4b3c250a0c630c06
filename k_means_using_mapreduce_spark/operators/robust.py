"""Robust statistics: median/MAD outlier detection and winsorized means.

Quality filtering on real corpora uses robust statistics because crawl
data is heavy-tailed: a mean/stddev z-score moves with the outliers it
is trying to find, while median ± k·MAD does not. Same doctrine as the
quality scores in functions/text.py, applied to numeric columns.

Exactness: medians/quantiles are ``quantile_cont``-exact (linear
interpolation), numerically identical to DuckDB — the parity the stats
contracts pin for grouped percentiles (contracts/stats_queries.py).

Scale: the family's percentiles default to
:func:`exact_group_percentiles`'s BRACKET path — a streaming
``percentile_approx`` sketch brackets each target, then one bounded
in-bracket window yields the exact order statistics — so no plan ever
buffers and sorts a whole group in an aggregation buffer (the failure
mode of the exact ``percentile`` aggregate at a skewed 100 TB group).
``method="buffered"`` opts back into the single-pass exact aggregate
when group sizes are known-bounded. MAD remains multi-pass by
construction (median → deviations' median → threshold counts); each
pass shuffles only per-group aggregates, joined back by broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scale factor making MAD a consistent sigma estimator for normal data
MAD_SIGMA = 1.4826


def exact_group_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    percentiles: Sequence[tuple[str, float]],
    *,
    accuracy: int = 10000,
    method: str = "bracket",
) -> DataFrame:
    """EXACT per-group percentiles (``quantile_cont`` linear
    interpolation) with BOUNDED per-group buffers — the scale-default
    replacement for the ``percentile(...)`` aggregate, which buffers
    and sorts every group's full value set (a straggler/OOM at a
    skewed 100 TB group).

    Two passes:

    1. A streaming ``percentile_approx`` sketch brackets each target
       percentile p at ``p ± 4/accuracy`` (GK rank error is hard-
       bounded by n/accuracy, so the bracket provably contains the
       two order statistics the exact interpolation needs; for groups
       smaller than ~accuracy/3 the clamped bracket degenerates to
       min/max and the "window" is the whole — still ≤ accuracy-sized
       — group).
    2. One aggregate per group counts values strictly below the lower
       cut and sorts ONLY the in-bracket window (~8n/accuracy values),
       from which the exact order statistics are read by rank offset
       and interpolated with Spark's ``percentile`` formula
       (``lo·(⌈h⌉−h) + hi·(h−⌊h⌋)``, h = (n−1)p).

    The result is identical to the buffered exact aggregate for ANY
    input (dedicated property test), independent of which concrete
    cut values the sketch returns. ``method="buffered"`` opts back
    into the single-pass whole-group-buffer ``percentile`` aggregate
    (fine for bounded group counts/sizes, e.g. unit-scale tests).

    Output: ``(group..., n, <alias_1>, ..., <alias_m>)`` with ``n``
    the non-null value count used as the percentile base.
    """
    group_cols = list(group_cols)
    for alias, p in percentiles:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile {alias}={p} outside [0, 1]")
    if method == "buffered":
        return df.groupBy(*group_cols).agg(
            F.count(F.col(value_col)).cast("long").alias("n"),
            *[
                F.expr(f"percentile({value_col}, {p!r})").alias(alias)
                for alias, p in percentiles
            ],
        )
    if method != "bracket":
        raise ValueError(f"method must be 'bracket' or 'buffered', got {method!r}")

    v = F.col(value_col).cast("double")
    eps = 4.0 / accuracy
    lo_ps = [max(0.0, p - eps) for _, p in percentiles]
    hi_ps = [min(1.0, p + eps) for _, p in percentiles]
    # project to just the group/value columns BEFORE the helper join:
    # the cut columns ride alongside the caller's frame, and a caller
    # column named `n` (common — resample_counts grids) would make the
    # aggregate references below ambiguous (ADVICE r5). The count
    # stays under the reserved name _egp_n until the final select.
    df = df.select(*dict.fromkeys([*group_cols, value_col]))
    # ONE percentile_approx call for all lo+hi brackets: each call
    # maintains its own GK sketch per group, so two calls doubled the
    # per-row update cost (~0.35 s/600k rows each at sf0.1); a single
    # sketch evaluated at 2m points is identical and half the work.
    m = len(percentiles)
    cuts = df.groupBy(*group_cols).agg(
        F.count(v).cast("long").alias("_egp_n"),
        F.min(v).alias("_gmin"),
        F.max(v).alias("_gmax"),
        F.percentile_approx(
            v,
            F.array(*[F.lit(p) for p in [*lo_ps, *hi_ps]]),
            F.lit(accuracy),
        ).alias("_all_cuts"),
    )
    # Null-safe join back: groupBy treats NULL keys as a group, and a
    # plain equi-join would silently drop those rows here.
    cuts_r = cuts.select(
        *[F.col(c).alias(f"_k_{c}") for c in group_cols],
        "_egp_n",
        "_gmin",
        "_gmax",
        "_all_cuts",
    )
    cond = F.lit(True)
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_k_{c}"))
    joined = df.join(F.broadcast(cuts_r), cond).drop(
        *[f"_k_{c}" for c in group_cols]
    )
    # Groups below `accuracy` rows fall back to min/max cuts: the ±1
    # rank granularity of the sketch's returned VALUE can overshoot a
    # tiny group's target order statistic, and buffering such a group
    # whole is still bounded (≤ accuracy values). For n ≥ accuracy the
    # ±4/accuracy bracket provably contains both needed ranks.
    small = F.col("_egp_n") < F.lit(int(accuracy))
    refine_aggs = []
    for i, (alias, _p) in enumerate(percentiles):
        lo_c = F.when(small, F.col("_gmin")).otherwise(
            F.element_at(F.col("_all_cuts"), i + 1)
        )
        hi_c = F.when(small, F.col("_gmax")).otherwise(
            F.element_at(F.col("_all_cuts"), m + i + 1)
        )
        refine_aggs.append(
            F.sum(F.when(v < lo_c, 1).otherwise(0))
            .cast("long")
            .alias(f"_nb_{i}")
        )
        refine_aggs.append(
            F.sort_array(
                F.collect_list(F.when((v >= lo_c) & (v <= hi_c), v))
            ).alias(f"_ws_{i}")
        )
    refined = joined.groupBy(*group_cols).agg(
        F.first("_egp_n").alias("_egp_n"), *refine_aggs
    )
    out_cols = [*group_cols, F.col("_egp_n").alias("n")]
    for i, (alias, p) in enumerate(percentiles):
        n = F.col("_egp_n")
        pos = (n - F.lit(1)).cast("double") * F.lit(float(p))
        lower = F.floor(pos).cast("long")
        higher = F.ceil(pos).cast("long")
        nb = F.col(f"_nb_{i}")
        ws = F.col(f"_ws_{i}")
        at_lower = F.element_at(ws, (lower + 1 - nb).cast("int"))
        at_higher = F.element_at(ws, (higher + 1 - nb).cast("int"))
        q = F.when(n.isNull() | (n == 0), F.lit(None).cast("double")).otherwise(
            F.when(lower == higher, at_lower).otherwise(
                at_lower * (higher.cast("double") - pos)
                + at_higher * (pos - lower.cast("double"))
            )
        )
        out_cols.append(q.alias(alias))
    return refined.select(*out_cols)


def group_median(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    method: str = "bracket",
) -> DataFrame:
    """Exact per-group median of ``value_col`` as column ``median``
    (bounded-buffer two-pass by default, see
    :func:`exact_group_percentiles`)."""
    return exact_group_percentiles(
        df, value_col, group_cols, [("median", 0.5)], method=method
    ).drop("n")


def mad_outlier_stats(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    k: float = 3.0,
    method: str = "bracket",
) -> DataFrame:
    """Per-group robust outlier profile.

    Output: ``(group..., n, median, mad, n_outliers, outlier_frac)``
    where a row is an outlier when
    ``|x - median| > k · MAD_SIGMA · mad``. A group with mad == 0 (over
    half its values identical) reports outliers for ANY deviation — the
    conventional, if strict, degenerate-case behavior; pre-filter such
    groups if it is not what the pipeline wants."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    group_cols = list(group_cols)
    from ..sources.loaders import fan_out

    # five passes follow (median sketch+refine, MAD sketch+refine,
    # flag scan) — materialize the projected 2-column input ONCE and
    # spread it (the winsorized_price_by_flag pattern, guide §5; a
    # single-row-group scan would otherwise run every pass on 1 core)
    df = fan_out(df.select(*group_cols, value_col)).localCheckpoint(
        eager=True
    )
    med = group_median(df, value_col, group_cols, method=method)
    with_med = df.join(F.broadcast(med), group_cols)
    absdev = with_med.withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = exact_group_percentiles(
        absdev, "_absdev", group_cols, [("mad", 0.5)], method=method
    ).drop("n")
    stats = med.join(F.broadcast(mad), group_cols)
    flagged = df.join(F.broadcast(stats), group_cols).withColumn(
        "_is_out",
        F.abs(F.col(value_col) - F.col("median"))
        > F.lit(k * MAD_SIGMA) * F.col("mad"),
    )
    return flagged.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.first("median").alias("median"),
        F.first("mad").alias("mad"),
        F.sum(F.col("_is_out").cast("long")).cast("long").alias("n_outliers"),
        (F.sum(F.col("_is_out").cast("long")) / F.count("*")).alias(
            "outlier_frac"
        ),
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    lower: float = 0.05,
    upper: float = 0.95,
    method: str = "bracket",
) -> DataFrame:
    """Per-group mean after clamping values to the exact [lower, upper]
    quantiles — the robust location estimate that, unlike trimming,
    keeps n constant. Output: ``(group..., n, lo, hi, wmean)``."""
    if not 0 <= lower < upper <= 1:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    group_cols = list(group_cols)
    bounds = exact_group_percentiles(
        df,
        value_col,
        group_cols,
        [("lo", lower), ("hi", upper)],
        method=method,
    ).drop("n")
    if method == "bracket":
        # the bracket path is itself 2 passes; without a pin the
        # clamp+mean consumer re-executes both (round-7 sweep:
        # measured ~1.0 s of pure recompute at sf0.1)
        bounds = bounds.localCheckpoint(eager=True)
    return (
        df.join(F.broadcast(bounds), group_cols)
        .withColumn(
            "_clamped",
            F.greatest(F.least(F.col(value_col), F.col("hi")), F.col("lo")),
        )
        .groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.avg("_clamped").alias("wmean"),
        )
    )


def percentile_rank_filter(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    min_pct: float = 0.25,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep rows whose ``value_col`` sits at or above the ``min_pct``
    percent_rank WITHIN their group — "drop the worst quartile per
    language" without picking per-group absolute thresholds.

    percent_rank is (rank - 1) / (n - 1): ties share a rank, so equal
    values are kept or dropped together (deterministic across engines);
    a single-row group has percent_rank 0 and is always kept.
    ``rank_col`` optionally surfaces the rank in the output. One
    group-keyed window shuffle; for a pathologically hot single group,
    the two-pass alternative (exact percentile threshold broadcast +
    filter, see mad_outlier_stats' shape) trades a second aggregate
    for a parallel filter.
    """
    from pyspark.sql.window import Window

    if not 0 <= min_pct <= 1:
        raise ValueError(f"min_pct must be in [0, 1], got {min_pct}")
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    wc = Window.partitionBy(*group_cols)
    out = (
        df.withColumn("_pct", F.percent_rank().over(w))
        # the group-count window shares the rank window's exchange;
        # without the n==1 escape a singleton group (percent_rank 0)
        # would lose its only row to any min_pct > 0
        .withColumn("_gn", F.count("*").over(wc))
        .where((F.col("_pct") >= min_pct) | (F.col("_gn") == 1))
        .drop("_gn")
    )
    if rank_col is not None:
        return out.withColumnRenamed("_pct", rank_col)
    return out.drop("_pct")


def group_linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-group simple linear regression (least squares) from sufficient
    statistics: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept =
    (Σy − slope·Σx)/n, plus Pearson r² — trend detection over groups
    (is a source's quality drifting? is an event type's value rising?)
    without MLlib.

    ONE aggregation pass (map-side partial sums); no matrix math, no
    Python. A group whose x is constant (denominator 0) reports NULL
    slope/intercept/r2. Rows with a NULL in x or y are excluded.
    Output: ``(group..., n, slope, intercept, r2)``.
    """
    group_cols = list(group_cols)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        *group_cols,
        x.alias("_x"),
        y.alias("_y"),
    )
    agg = base.groupBy(*group_cols).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    den_x = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    den_y = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when(den_x != 0.0, num / den_x)
    intercept = F.when(
        den_x != 0.0, (F.col("_sy") - (num / den_x) * F.col("_sx")) / F.col("_n")
    )
    r2 = F.when(
        (den_x != 0.0) & (den_y != 0.0), (num * num) / (den_x * den_y)
    )
    return agg.select(
        *group_cols,
        F.col("_n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def benford_digit_distribution(
    df: DataFrame,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated/synthetic-data smell test for positive numeric
    columns spanning orders of magnitude (Benford 1938; auditors'
    digit-analysis standard).

    Digit extraction is STRING-EXACT, not log10: the value is scaled
    to an integer (``scale`` = 100 for 2-dp money) and the first
    character of its decimal rendering is the digit — integer-to-string
    is portable across engines, while ``floor(log10(v))`` flips at
    exact powers of ten by one ulp. Non-positive and null values are
    excluded (Benford applies to positive magnitudes).

    Output per digit 1-9: ``(digit, n, observed_p, expected_p,
    chi2_term)`` with ``expected_p = log10(1 + 1/d)`` and chi2_term =
    n·(obs−exp)²/exp — sum the terms for the χ² statistic (8 dof).
    One map-side-combinable aggregate; digits with no rows still
    appear (zero-filled) so the χ² is over all 9 cells.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    v = F.col(value_col).cast("double") * scale
    # round-to-nearest, NOT truncate: scaled money sits at integer ± ulp,
    # and engines disagree on double→int truncation vs rounding
    as_int = F.round(v, 0).cast("long")
    digit = F.substring(as_int.cast("string"), 1, 1).cast("int")
    counts = (
        df.where(F.col(value_col).isNotNull() & (as_int > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    filled = digits.join(counts, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    total = filled.agg(F.sum("n").alias("_t"))
    j = filled.join(F.broadcast(total))
    obs = F.col("n").cast("double") / F.col("_t").cast("double")
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    chi2 = (
        F.col("_t").cast("double")
        * (obs - exp_p)
        * (obs - exp_p)
        / exp_p
    )
    return j.select(
        "digit",
        "n",
        obs.alias("observed_p"),
        exp_p.alias("expected_p"),
        chi2.alias("chi2_term"),
    )


def concentration_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    by: Sequence[str] = (),
    *,
    top_k: int = 10,
) -> DataFrame:
    """Inequality / market-concentration diagnostics per group: Gini
    coefficient, Herfindahl-Hirschman index, and top-1 / top-``top_k``
    shares of the per-key value totals.

    The classic "how skewed is this corpus really" question — revenue
    concentration across customers, document mass across sources,
    traffic across domains — answered with the auditor's standard
    measures. Gini uses the exact rank formula over ascending totals
    ``G = 2·Σ(rank·v) / (n·Σv) − (n+1)/n``; ties share one value so
    any rank order within a tie block yields the same Σ(rank·v), and
    the (value, key) sort makes ranks reproducible anyway.

    Scale shape: pass 1 reduces rows to PER-KEY totals (one grouped
    shuffle, |keys| rows out); pass 2 ranks those totals inside each
    ``by`` partition — a window over entity AGGREGATES, never raw rows
    (with no ``by``, that is one global sort of |keys| rows; at 100 TB
    keys are customers/sources, orders of magnitude below row count).
    Negative or NULL totals are rejected/dropped: Gini and shares are
    defined for non-negative masses.

    Returns ``(by..., n_keys, total, gini, hhi, top1_share,
    top{top_k}_share)``.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pyspark.sql.window import Window

    bys = list(by)
    # sum in the column's NATIVE type (decimal money stays exact, so
    # per-key totals are bit-identical across engines and rank order
    # is deterministic), then move to double for the ratio math
    v = F.col(value_col)
    ent = (
        df.where(v.isNotNull())
        .groupBy(*bys, F.col(key_col).alias("_k"))
        .agg(F.sum(v).cast("double").alias("_v"))
        .where(F.col("_v") >= 0)
    )
    asc = Window.partitionBy(*bys).orderBy(F.col("_v").asc(), F.col("_k"))
    desc = Window.partitionBy(*bys).orderBy(
        F.col("_v").desc(), F.col("_k")
    )
    ranked = ent.select(
        *bys,
        F.col("_v"),
        F.row_number().over(asc).cast("double").alias("_r"),
        F.row_number().over(desc).alias("_rd"),
    )
    n = F.count(F.lit(1)).cast("double")
    # all-zero groups: nullif keeps ANSI mode from raising on /0 and
    # yields NULL diagnostics (concentration of zero mass is undefined)
    s = F.nullif(F.sum("_v"), F.lit(0.0))
    return (
        ranked.groupBy(*bys)
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("_v").alias("total"),
            (
                F.lit(2.0) * F.sum(F.col("_r") * F.col("_v")) / (n * s)
                - (n + F.lit(1.0)) / n
            ).alias("gini"),
            (F.sum(F.col("_v") * F.col("_v")) / (s * s)).alias("hhi"),
            (
                F.sum(F.when(F.col("_rd") <= 1, F.col("_v")).otherwise(0.0))
                / s
            ).alias("top1_share"),
            (
                F.sum(
                    F.when(F.col("_rd") <= top_k, F.col("_v")).otherwise(0.0)
                )
                / s
            ).alias(f"top{top_k}_share"),
        )
    )


def tail_index(
    df: DataFrame,
    value_col: str,
    *,
    tail_q: float = 0.95,
) -> DataFrame:
    """Hill estimator of the power-law tail index over the values
    above the exact ``tail_q`` quantile — "how heavy is this tail"
    quantified (Hill 1975), the companion diagnostic to
    :func:`concentration_stats` (a Pareto tail with α ≤ 2 is why
    mean-based capacity planning fails on crawl data).

    Threshold choice: ``xmin = percentile(value, tail_q)`` (exact,
    ``quantile_cont``-identical), tail = values STRICTLY above xmin —
    the classic estimator conditions on the (k+1)-th order statistic;
    using the exact quantile instead keeps the cutoff reproducible
    across engines and k data-driven. ``α̂ = 1 / mean(ln(x / xmin))``.

    Scale: one percentile aggregate + one filtered scan (threshold
    folded in via a 1-row broadcast) — the tail rows never shuffle.
    Non-positive xmin (tail crossing zero) yields NULL alpha: the
    estimator is defined for positive heavy tails only.

    Returns one row ``(n_tail, xmin, alpha)``.
    """
    if not 0.0 < tail_q < 1.0:
        raise ValueError(f"tail_q must be in (0, 1), got {tail_q}")
    v = F.col(value_col).cast("double")
    rows = df.where(v.isNotNull())
    cut = rows.agg(
        F.percentile(v, F.lit(tail_q)).cast("double").alias("xmin")
    )
    tail = rows.crossJoin(F.broadcast(cut)).where(
        (v > F.col("xmin")) & (F.col("xmin") > 0)
    )
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.first("xmin").alias("xmin"),
        (
            F.lit(1.0)
            / F.nullif(F.avg(F.log(v / F.col("xmin"))), F.lit(0.0))
        ).alias("alpha"),
    )


def mahalanobis_summary(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    threshold: float = 13.815510557964274,
) -> DataFrame:
    """Bivariate outlier screen by Mahalanobis distance: fit the mean
    vector and covariance in one scan of moment sums, fold the
    closed-form 2×2 inverse back as codegen literals, and summarize
    the squared distances in a second scan — the correlation-aware
    outlier test a per-column z-score cannot do (a point can be normal
    on both margins and wildly off the joint ellipse).

    ``threshold`` defaults to the χ²₂ 99.9% quantile (13.8155…): under
    normality ~0.1% of rows exceed it. Sample covariance uses the
    ``(Σxy − n·x̄·ȳ)/(n−1)`` form shared with the SQL oracle.

    Scale: two scans, ten doubles of state — the fit_ridge doctrine.
    Degenerate covariance (|Σ| = 0: constant or perfectly collinear
    features) raises — the metric is undefined.

    Returns one row ``(n, n_outliers, outlier_rate, max_d2, avg_d2)``.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    rows = df.where(x.isNotNull() & y.isNotNull())
    s = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    ).collect()[0]
    n = s["n"]
    if n < 3:
        raise ValueError(f"need at least 3 complete rows, got {int(n)}")
    mx = s["sx"] / n
    my = s["sy"] / n
    vxx = (s["sxx"] - n * mx * mx) / (n - 1.0)
    vxy = (s["sxy"] - n * mx * my) / (n - 1.0)
    vyy = (s["syy"] - n * my * my) / (n - 1.0)
    det = vxx * vyy - vxy * vxy
    if det == 0.0:
        raise ValueError(
            "singular covariance: features are constant or collinear"
        )
    ixx, ixy, iyy = vyy / det, -vxy / det, vxx / det
    dx = x - F.lit(mx)
    dy = y - F.lit(my)
    d2 = (
        F.lit(ixx) * dx * dx
        + F.lit(2.0) * F.lit(ixy) * dx * dy
        + F.lit(iyy) * dy * dy
    )
    return rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(d2 > F.lit(threshold), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        (
            F.sum(
                F.when(d2 > F.lit(threshold), 1.0).otherwise(0.0)
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("outlier_rate"),
        F.max(d2).alias("max_d2"),
        F.avg(d2).alias("avg_d2"),
    )


def weighted_percentile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: Sequence[float],
    by: Sequence[str] = (),
) -> DataFrame:
    """Exact weighted percentiles (lower weighted-CDF inverse): the
    smallest value whose cumulative weight reaches ``q·W`` — "the
    median PRICE weighted by quantity sold", which Spark's built-in
    ``percentile`` (row-weighted) cannot answer. The estimator is the
    standard inverse-CDF step function (no interpolation — that is
    what makes exact cross-engine parity possible on ties).

    One ``(by…, value)`` weight aggregate reduces the data to
    distinct-value blocks; a per-group cumulative window over THOSE
    blocks and one conditional min per q finish the job — the
    binary_rank_metrics block doctrine. Non-positive/NULL weights are
    excluded.

    Returns one row per group: ``(by…, total_weight, p_<q>…)``.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"each q must be in (0, 1], got {q}")
    from pyspark.sql.window import Window

    bys = list(by)
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    blocks = (
        df.where(v.isNotNull() & w.isNotNull() & (w > 0))
        .groupBy(*bys, v.alias("_v"))
        .agg(F.sum(w).alias("_w"))
    )
    cum = Window.partitionBy(*bys).orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*bys)
    stepped = blocks.select(
        *bys,
        "_v",
        F.sum("_w").over(cum).alias("_cw"),
        F.sum("_w").over(tot).alias("_tw"),
    )
    aggs = [F.first("_tw").alias("total_weight")]
    for q in qs:
        name = f"p_{str(q).replace('.', '_')}"
        aggs.append(
            F.min(
                F.when(
                    F.col("_cw") >= F.lit(q) * F.col("_tw"), F.col("_v")
                )
            ).alias(name)
        )
    return stepped.groupBy(*bys).agg(*aggs)


#: Euler–Mascheroni constant (Gumbel mean offset)
EULER_GAMMA = 0.5772156649015329


def gumbel_block_maxima(
    df: DataFrame,
    value_col: str,
    block_col: str,
    *,
    return_period: float = 1000.0,
) -> DataFrame:
    """Extreme-value fit on BLOCK MAXIMA: take the max per block
    (day, batch, shard), fit a Gumbel by method of moments
    (``β = σ√6/π``, ``μ = mean − γ·β`` — Fisher–Tippett's domain for
    light-tailed maxima), and report the ``return_period``-block
    return level ``μ − β·ln(−ln(1 − 1/T))`` — "the worst value we
    should expect once per 1000 days", the capacity question a plain
    max cannot answer (the observed max only reflects how long you
    watched).

    One block-keyed max + one moment aggregate (sample σ via the
    explicit-sums form shared with the oracle). Needs ≥ 2 blocks with
    variance; degenerate inputs yield NULL parameters.

    Returns one row ``(n_blocks, mean_max, sd_max, mu, beta,
    return_level)``.
    """
    import math

    if return_period <= 1.0:
        raise ValueError(
            f"return_period must be > 1, got {return_period}"
        )
    v = F.col(value_col).cast("double")
    blocks = (
        df.where(v.isNotNull() & F.col(block_col).isNotNull())
        .groupBy(block_col)
        .agg(F.max(v).alias("m"))
    )
    n = F.count(F.lit(1)).cast("double")
    mean = F.sum("m") / n
    var = (
        F.sum(F.col("m") * F.col("m")) - F.sum("m") * F.sum("m") / n
    ) / F.nullif(n - F.lit(1.0), F.lit(0.0))
    sd = F.sqrt(F.nullif(var, F.lit(0.0)) + F.lit(0.0))
    beta = sd * F.lit(math.sqrt(6.0) / math.pi)
    mu = mean - F.lit(EULER_GAMMA) * beta
    level = mu - beta * F.lit(
        math.log(-math.log(1.0 - 1.0 / return_period))
    )
    return blocks.agg(
        n.cast("long").alias("n_blocks"),
        mean.alias("mean_max"),
        sd.alias("sd_max"),
        mu.alias("mu"),
        beta.alias("beta"),
        level.alias("return_level"),
    )


def theil_index(
    df: DataFrame,
    key_col: str,
    value_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Theil T inequality index over per-key value totals:
    ``T = Σ (xᵢ/X)·ln(n·xᵢ/X)`` — 0 at perfect equality, ``ln n`` at
    total monopoly. The information-theoretic companion to
    :func:`concentration_stats`' Gini: Theil is ADDITIVELY
    DECOMPOSABLE across groups (between + within), which is why
    inequality-attribution pipelines prefer it.

    Same two-pass shape as concentration_stats (decimal-exact per-key
    totals, then arithmetic over the entity table — here not even a
    window, just one aggregate with the totals broadcast). Zero-value
    keys contribute 0 (the x·ln x limit), negative totals are
    rejected upstream by the ``>= 0`` filter.

    Returns ``(by…, n_keys, total, theil, theil_max)`` with
    ``theil_max = ln(n_keys)`` for normalization.
    """
    bys = list(by)
    ent = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*bys, F.col(key_col).alias("_k"))
        .agg(F.sum(F.col(value_col)).cast("double").alias("_v"))
        .where(F.col("_v") >= 0)
    )
    tot = ent.groupBy(*bys).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_v").alias("_t"),
    )
    joined = ent.join(F.broadcast(tot), bys) if bys else ent.crossJoin(
        F.broadcast(tot)
    )
    share = F.col("_v") / F.nullif(F.col("_t"), F.lit(0.0))
    term = F.when(
        F.col("_v") > 0, share * F.log(F.col("_n") * share)
    ).otherwise(F.lit(0.0))
    return joined.groupBy(*bys).agg(
        F.first("_n").cast("long").alias("n_keys"),
        F.first("_t").alias("total"),
        F.sum(term).alias("theil"),
        F.log(F.first("_n")).alias("theil_max"),
    )


def hbos_scores(
    df: DataFrame,
    cols: Sequence[str],
    id_col: str,
    *,
    bins: int = 16,
) -> DataFrame:
    """HBOS — Histogram-Based Outlier Score (Goldstein & Dengel 2012):
    per numeric column, an equal-width histogram between the column's
    min and max; a row's score is ``Σ_c log(max_count_c /
    count_c(bin(row)))`` — 0 for a row sitting in every column's modal
    bin, growing as it falls into rarer bins. The cheap, assumption-
    free anomaly pass (no covariance, no distance): the standard first
    screen before Mahalanobis/isolation methods.

    Three relational stages, all bounded: (1) one aggregate for per-
    column min/max (folded to literals via a broadcast row), (2) bin
    counts from ONE explode of (col, bin) pairs — C·bins rows total,
    broadcast back, (3) per-row explode joined to the counts,
    re-grouped by id. NULL values contribute 0 (no evidence either
    way, the HBOS convention for missing features). A constant column
    (min == max) puts every row in bin 0 and contributes 0 — surfaced
    by its degenerate histogram rather than an error.

    Output: ``(id, hbos)`` one row per input row.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("hbos_scores needs at least one column")
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")

    mm = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols],
    )
    with_mm = df.crossJoin(F.broadcast(mm))

    def bin_of(c: str):
        x = F.col(c).cast("double")
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        raw = F.floor((x - mn) / F.nullif(mx - mn, F.lit(0.0)) * F.lit(bins))
        return F.when(x.isNull(), F.lit(None)).otherwise(
            F.coalesce(F.least(raw, F.lit(bins - 1)), F.lit(0))
        ).cast("int")

    binned = with_mm.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"), bin_of(c).alias("bin")
                    )
                    for c in cols
                ]
            )
        ).alias("p"),
    ).select("id", "p.col", "p.bin")
    counts = (
        binned.where(F.col("bin").isNotNull())
        .groupBy("col", "bin")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    from pyspark.sql.window import Window

    counts = counts.withColumn(
        "mx", F.max("cnt").over(Window.partitionBy("col"))
    )
    scored = binned.join(F.broadcast(counts), ["col", "bin"], "left")
    return scored.groupBy("id").agg(
        F.sum(
            F.coalesce(F.log(F.col("mx") / F.col("cnt")), F.lit(0.0))
        ).alias("hbos")
    ).withColumnRenamed("id", id_col)


def eb_shrunk_means(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Empirical-Bayes (James-Stein style) shrinkage of per-group means
    toward the grand mean — the honest per-source/per-segment quality
    estimate when group sizes vary wildly: a 10-row source's raw mean
    is mostly noise, and ranking sources by raw means rewards small-n
    luck. Standard method-of-moments normal-normal EB.

    Two bounded aggregation passes: per-group (n, mean, within-group
    sum of squares), then the grand mean and the between-group moment.

    - within-variance σ² = pooled within-group variance;
    - between-variance τ² = max(0, weighted between-group moment −
      correction) (method of moments; clamped at 0 when groups look
      exchangeable);
    - ``shrunk = B·mean + (1−B)·grand`` with ``B = τ²/(τ² + σ²/n)`` —
      big groups keep their mean, small ones pull toward the grand.

    Groups with n = 1 get B from the same formula (their raw mean is
    the noisiest, so they shrink hardest). τ² = 0 collapses every
    group to the grand mean — the correct answer when between-group
    signal is absent. Returns ``(group..., n, mean_raw, shrink_b,
    mean_shrunk)``.
    """
    group_cols = list(group_cols)
    v = F.col(value_col).cast("double")
    per = (
        df.where(v.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(v).alias("s"),
            F.sum(v * v).alias("q"),
        )
        .withColumn("m", F.col("s") / F.col("n"))
        .withColumn("wss", F.col("q") - F.col("s") * F.col("s") / F.col("n"))
    )
    tot = per.agg(
        F.sum("n").alias("tn"),
        F.sum("s").alias("ts"),
        F.sum("wss").alias("twss"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    grand = F.col("ts") / F.col("tn")
    # pooled within-group variance (df = N - k); NULL when every group
    # is a singleton (no within information)
    sigma2 = F.col("twss") / F.nullif(
        F.col("tn") - F.col("k"), F.lit(0.0)
    )
    # method of moments for tau^2 from the n-weighted between moment:
    # E[ sum n_i (m_i - grand)^2 ] = (k-1) sigma^2 + tau^2 (N - sum n_i^2 / N)
    btw = j.agg(
        F.sum(
            F.col("n") * (F.col("m") - grand) * (F.col("m") - grand)
        ).alias("bss"),
        F.sum(F.col("n") * F.col("n")).alias("sn2"),
    )
    full = j.crossJoin(F.broadcast(btw))
    tau2 = F.greatest(
        (
            F.col("bss")
            - (F.col("k") - 1.0) * sigma2
        )
        / F.nullif(
            F.col("tn") - F.col("sn2") / F.col("tn"), F.lit(0.0)
        ),
        F.lit(0.0),
    )
    b = tau2 / F.nullif(tau2 + sigma2 / F.col("n"), F.lit(0.0))
    return full.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.col("m").alias("mean_raw"),
        b.alias("shrink_b"),
        (b * F.col("m") + (F.lit(1.0) - b) * grand).alias("mean_shrunk"),
    )


def ransac_line(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col,
    *,
    seeds: int = 8,
    eps: float = 1.0,
) -> DataFrame:
    """Deterministic RANSAC line fit — the sample-consensus member of
    the robust family (:func:`huber` reweights, Theil–Sen medians,
    RANSAC VOTES): draw ``seeds`` candidate 2-point models, count
    integer inlier consensus ``|y − (a₀ + b₀x)| ≤ eps`` for each, keep
    the winner (most inliers, ties to the lowest seed), and refit OLS
    on its inliers.

    Determinism doctrine: "random" minimal samples are the 2 smallest
    per-seed hashes, fanned out affinely from ONE ``md5(id)`` per row
    (``h_s = h1 + s·h2`` over its two independent halves — the
    bloomjoin Kirsch-Mitzenmacher idiom) (full (h, x, y)
    order — duplicate ids hash identically, so ties are broken by the
    point itself) — the engine's hash-coin
    idiom (sampling.py), so every engine draws the SAME points and the
    consensus votes are integers; nothing depends on rand() or
    partition order.

    Returns one row ``(n, best_seed, n_inliers, a0, b0, a, b,
    rmse_inliers)`` — candidate line (a₀, b₀), refit line (a, b).

    Scale shape: four scans, none wider than the input — (1) one
    aggregate takes the per-seed min hash-structs, (2) one takes the
    per-seed second-min, (3) one counts all ``seeds`` consensus votes
    as conditional sums, (4) one refits on the winner's inliers with
    the standard 5-sum closed form. No shuffle beyond 1-row
    aggregates, no row-level sample materialization.
    """
    if seeds < 1:
        raise ValueError(f"seeds must be >= 1, got {seeds}")
    if eps <= 0.0:
        raise ValueError(f"eps must be > 0, got {eps}")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    sid = F.col(id_col).cast("string") if isinstance(id_col, str) else (
        id_col.cast("string")
    )
    from ..sources.loaders import fan_out

    rows = df.where(x.isNotNull() & y.isNotNull()).select(
        sid.alias("_id"), x.alias("x"), y.alias("y")
    )
    # ONE md5 per row; per-seed draws fan out affinely from its two
    # independent 60/56-bit halves (the bloomjoin Kirsch-Mitzenmacher
    # doctrine): h_s = h1 + s·h2 stays < 2^61 for s ≤ 16, exact int64
    # in both engines — 16× cheaper than hashing per (seed, row).
    if seeds > 16:
        raise ValueError(f"seeds must be <= 16, got {seeds}")
    _md5 = F.md5(F.col("_id"))
    # four aggregate ACTIONS follow (min, second-min, votes, refit) —
    # each re-executes its whole plan, so hash once into a spread,
    # materialized (h1, h2, x, y) relation: the md5 is computed one
    # time total and every pass runs on all cores instead of the one
    # task a single-row-group scan yields (guide §2.5 + §5 caching of
    # a genuinely multi-action intermediate)
    rows = fan_out(
        rows.select(
            F.conv(F.substring(_md5, 1, 15), 16, 10)
            .cast("long")
            .alias("_h1"),
            F.conv(F.substring(_md5, 16, 14), 16, 10)
            .cast("long")
            .alias("_h2"),
            "x",
            "y",
        )
    ).localCheckpoint(eager=True)

    def h(s: int):
        return F.col("_h1") + F.lit(int(s)) * F.col("_h2")

    first = rows.agg(
        *[
            F.min(F.struct(h(s).alias("h"), "x", "y")).alias(f"m{s}")
            for s in range(seeds)
        ]
    ).collect()[0]
    # ties are real: duplicate ids hash identically, so the "second"
    # point is the next row in FULL (h, x, y) struct order — the same
    # total order both the min-struct and the oracle's ORDER BY use.
    def _gt(s: int):
        p1 = first[f"m{s}"]
        return F.struct(h(s).alias("h"), "x", "y") > F.struct(
            F.lit(p1["h"]).alias("h"),
            F.lit(p1["x"]).alias("x"),
            F.lit(p1["y"]).alias("y"),
        )

    second = rows.agg(
        *[
            F.min(
                F.when(_gt(s), F.struct(h(s).alias("h"), "x", "y"))
            ).alias(f"m{s}")
            for s in range(seeds)
        ]
    ).collect()[0]
    cands = {}
    for s in range(seeds):
        p1, p2 = first[f"m{s}"], second[f"m{s}"]
        if p1 is None or p2 is None or p2["x"] == p1["x"]:
            continue
        b0 = (p2["y"] - p1["y"]) / (p2["x"] - p1["x"])
        a0 = p1["y"] - b0 * p1["x"]
        cands[s] = (a0, b0)
    if not cands:
        raise ValueError(
            "no valid 2-point candidate (fewer than 2 rows, or every "
            "sampled pair was vertical)"
        )
    votes = rows.agg(
        *[
            F.sum(
                (
                    F.abs(
                        F.col("y")
                        - (F.lit(a0) + F.lit(b0) * F.col("x"))
                    )
                    <= F.lit(float(eps))
                ).cast("long")
            ).alias(f"k{s}")
            for s, (a0, b0) in cands.items()
        ]
    ).collect()[0]
    best_seed = min(cands, key=lambda s: (-votes[f"k{s}"], s))
    a0, b0 = cands[best_seed]
    inlier = (
        F.abs(F.col("y") - (F.lit(a0) + F.lit(b0) * F.col("x")))
        <= F.lit(float(eps))
    )
    w = F.when(inlier, 1.0).otherwise(0.0)
    sums = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(w).alias("k"),
        F.sum(w * F.col("x")).alias("sx"),
        F.sum(w * F.col("y")).alias("sy"),
        F.sum(w * F.col("x") * F.col("y")).alias("sxy"),
        F.sum(w * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(w * F.col("y") * F.col("y")).alias("syy"),
    )
    k = F.col("k")
    det = k * F.col("sxx") - F.col("sx") * F.col("sx")
    b = (k * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        det, F.lit(0.0)
    )
    a = (F.col("sy") - b * F.col("sx")) / k
    sse = (
        F.col("syy")
        + k * a * a
        + b * b * F.col("sxx")
        + F.lit(2.0) * a * b * F.col("sx")
        - F.lit(2.0) * a * F.col("sy")
        - F.lit(2.0) * b * F.col("sxy")
    )
    return sums.select(
        "n",
        F.lit(best_seed).alias("best_seed"),
        k.cast("long").alias("n_inliers"),
        F.lit(a0).alias("a0"),
        F.lit(b0).alias("b0"),
        a.alias("a"),
        b.alias("b"),
        F.sqrt(sse / k).alias("rmse_inliers"),
    )


#: Box-Cox candidate grid — the classic half-step ladder of Tukey
#: re-expressions (reciprocal, reciprocal-root, log, root, identity).
BOXCOX_LAMBDAS = (-1.0, -0.5, 0.0, 0.5, 1.0)


def boxcox_profile(
    df: DataFrame,
    value_col: str,
    *,
    lambdas: Sequence[float] = BOXCOX_LAMBDAS,
) -> DataFrame:
    """Box-Cox transform selection by profile log-likelihood over a
    FIXED λ ladder — the normalizing-transform member of the robust
    family (winsorize bounds, MAD rescales; Box-Cox RESHAPES): for
    each candidate λ the profile log-likelihood (Box & Cox 1964)

        ℓ(λ) = −(n/2)·ln σ̂²(z_λ) + (λ−1)·Σ ln y,
        z_λ = (yᵡ − 1)/λ   (λ ≠ 0),   z₀ = ln y

    is computed from sufficient sums in ONE scan (a conditional-sum
    column set per λ), positives only. The grid keeps the argmax a
    comparison of a handful of well-separated doubles instead of a
    fragile continuous optimum — the house threshold doctrine.

    Returns one row per λ: ``(lam, n, loglik, is_best)`` with the tie
    broken to the SMALLER λ (simpler re-expression), deterministic in
    both engines.
    """
    if len(lambdas) < 2:
        raise ValueError(f"need >= 2 candidate lambdas, got {lambdas}")
    if len(set(lambdas)) != len(lambdas):
        raise ValueError("candidate lambdas must be distinct")
    y = F.col(value_col).cast("double")
    rows = df.where(y.isNotNull() & (y > 0)).select(
        y.alias("_y"), F.log(y).alias("_ln")
    )
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_ln").alias("slny"),
    ]
    for i, lam in enumerate(lambdas):
        if lam == 0.0:
            z = F.col("_ln")
        else:
            z = (F.pow(F.col("_y"), F.lit(float(lam))) - F.lit(1.0)) / F.lit(
                float(lam)
            )
        aggs.append(F.sum(z).alias(f"s{i}"))
        aggs.append(F.sum(z * z).alias(f"q{i}"))
    s = rows.agg(*aggs)
    n = F.col("n")
    out_rows = []
    for i, lam in enumerate(lambdas):
        var = (F.col(f"q{i}") - F.col(f"s{i}") * F.col(f"s{i}") / n) / n
        ll = (
            -(n / F.lit(2.0)) * F.log(var)
            + (F.lit(float(lam)) - F.lit(1.0)) * F.col("slny")
        )
        out_rows.append(
            F.struct(
                F.lit(float(lam)).alias("lam"),
                n.cast("long").alias("n"),
                ll.alias("loglik"),
            )
        )
    exploded = s.select(
        F.explode(F.array(*out_rows)).alias("r")
    ).select("r.lam", "r.n", "r.loglik")
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("loglik").desc(), F.col("lam").asc())
    return exploded.withColumn(
        "is_best", F.row_number().over(w) == 1
    )
