"""Two-sample hypothesis tests as aggregation/window programs.

The inferential completion of the drift monitors in
operators/cleaning.py (profile_drift, psi_drift): PSI says "the
distributions differ by this much", these say "and that difference
is/isn't explainable by chance" — the decision layer of every A/B
readout, data-refresh gate, and quality-filter rollout.

Every test is exact, closed-form, and distributed:

- all CDF/rank machinery runs on the PER-DISTINCT-VALUE aggregate
  (one map-side-combined groupBy first), so the unpartitioned
  ordering window that follows sees |distinct values| rows, not
  |input| — the standard trick that keeps a "global sort" viable at
  100 TB for metrics with bounded value cardinality. For genuinely
  continuous unbounded metrics, quantile-bucket first
  (operators/quantize.py) and these tests apply unchanged to the
  binned values;
- no p-value lookup tables: the emitted statistics (D, U, z, χ²)
  are the deterministic part; translating to a p-value is a driver-
  side scipy call the caller owns (kept out so results stay exactly
  oracle-reproducible in pure SQL).

Reference scope note: the reference engine (master.py:27-150) has no
statistics surface; extension scope per the build brief.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _two_sample_counts(
    a: DataFrame, b: DataFrame, value_col: str
) -> DataFrame:
    """Per-distinct-value counts ``(v, ca, cb)`` of both samples —
    the reduced relation all rank/CDF tests run on. NULLs excluded
    (they have no order position)."""
    av = a.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("v"), F.lit(1).alias("_is_a")
    )
    bv = b.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("v"), F.lit(0).alias("_is_a")
    )
    return (
        av.unionAll(bv)
        .groupBy("v")
        .agg(
            F.sum("_is_a").cast("long").alias("ca"),
            F.sum(1 - F.col("_is_a")).cast("long").alias("cb"),
        )
    )


def ks_two_sample(a: DataFrame, b: DataFrame, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov: one row ``(n_a, n_b, ks_d)``
    with ``ks_d = max_v |F_a(v) - F_b(v)|`` over the pooled empirical
    CDFs (ties handled by evaluating at each distinct value's upper
    step, the standard discrete convention)."""
    counts = _two_sample_counts(a, b, value_col)
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    steps = counts.select(
        (F.sum("ca").over(w)).alias("cum_a"), (F.sum("cb").over(w)).alias("cum_b")
    )
    d = steps.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
        ).alias("_d"),
    )
    return d.groupBy("n_a", "n_b").agg(F.max("_d").alias("ks_d"))


def mann_whitney_u(a: DataFrame, b: DataFrame, value_col: str) -> DataFrame:
    """Mann–Whitney rank-sum: one row ``(n_a, n_b, u_a, z)`` with
    midrank tie handling and the tie-corrected normal approximation
    ``z = (U - n_a n_b / 2) / sqrt(var)``,
    ``var = n_a n_b / (N(N-1)) * ((N³ - N)/12 - Σ(t³ - t)/12)``."""
    counts = _two_sample_counts(a, b, value_col)
    t = F.col("ca") + F.col("cb")
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = counts.select(
        "ca",
        "cb",
        t.alias("t"),
        (F.sum(t).over(w) - t).alias("before"),
    ).select(
        "ca",
        "cb",
        "t",
        # midrank of every item with this value
        (F.col("before") + (F.col("t") + 1) / F.lit(2.0)).alias("midrank"),
    )
    agg = ranked.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca") * F.col("midrank")).alias("r_a"),
        # tie term in DOUBLE before cubing: a 2M-row tie group would
        # overflow int64 cubed
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie3"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("r_a") - na * (na + 1) / 2
    var = (na * nb / (n * (n - 1))) * (
        (n * n * n - n) / 12 - F.col("tie3") / 12
    )
    return agg.select(
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        ((u_a - na * nb / 2) / F.sqrt(var)).alias("z"),
    )


def chi_squared_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson χ² test of independence between two categoricals: one
    row ``(chi2, dof, n)`` from the contingency table — observed vs
    ``row_total × col_total / n`` expected. Pure three-aggregate
    program; the contingency table (|A|×|B| cells) is the only
    intermediate, so cost is the one groupBy of the pair projection."""
    obs = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count("*").alias("o"))
    )
    row_t = obs.groupBy(col_a).agg(F.sum("o").alias("ra"))
    col_t = obs.groupBy(col_b).agg(F.sum("o").alias("cb"))
    n_t = obs.agg(
        F.sum("o").cast("double").alias("n"),
        F.count_distinct(F.col(col_a)).alias("_r"),
        F.count_distinct(F.col(col_b)).alias("_c"),
    )
    cell = (
        obs.join(F.broadcast(row_t), col_a)
        .join(F.broadcast(col_t), col_b)
        .crossJoin(F.broadcast(n_t))
        .select(
            "n",
            "_r",
            "_c",
            (
                (F.col("o") - F.col("ra") * F.col("cb") / F.col("n"))
                * (F.col("o") - F.col("ra") * F.col("cb") / F.col("n"))
                / (F.col("ra") * F.col("cb") / F.col("n"))
            ).alias("term"),
        )
    )
    return cell.groupBy("n", "_r", "_c").agg(
        F.sum("term").alias("chi2")
    ).select(
        "chi2",
        ((F.col("_r") - 1) * (F.col("_c") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"),
    )


#: two-sided 95% normal critical value used by the Wilson interval
Z95 = 1.96


def _wilson(p: Column, n: Column, z: float) -> tuple[Column, Column]:
    z2 = F.lit(z * z)
    denom = 1 + z2 / n
    center = p + z2 / (2 * n)
    half = F.lit(z) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    return (center - half) / denom, (center + half) / denom


def ab_proportion_test(
    df: DataFrame,
    arm_col: str,
    success: Column,
    *,
    arm_a: str = "a",
    arm_b: str = "b",
) -> DataFrame:
    """Two-proportion z-test between arms ``arm_a`` / ``arm_b`` of an
    experiment: one row ``(n_a, x_a, rate_a, lo_a, hi_a, n_b, x_b,
    rate_b, lo_b, hi_b, z)`` — per-arm Wilson 95% intervals plus the
    pooled z statistic. ``success`` is any boolean Column (evaluated
    in the single aggregation scan). Assign arms deterministically
    with operators/sampling.py::hash_bucket on the experiment unit,
    never rand()."""
    s = success.cast("int")
    arm = F.col(arm_col)
    agg = df.where(arm.isin([arm_a, arm_b])).agg(
        F.sum(F.when(arm == arm_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(arm == arm_a, s).otherwise(0)).cast("long").alias("x_a"),
        F.sum(F.when(arm == arm_b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(arm == arm_b, s).otherwise(0)).cast("long").alias("x_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pa, pb = F.col("x_a") / na, F.col("x_b") / nb
    pool = (F.col("x_a") + F.col("x_b")) / (na + nb)
    z = (pa - pb) / F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    lo_a, hi_a = _wilson(pa, na, Z95)
    lo_b, hi_b = _wilson(pb, nb, Z95)
    return agg.select(
        "n_a",
        "x_a",
        pa.alias("rate_a"),
        lo_a.alias("lo_a"),
        hi_a.alias("hi_a"),
        "n_b",
        "x_b",
        pb.alias("rate_b"),
        lo_b.alias("lo_b"),
        hi_b.alias("hi_b"),
        z.alias("z"),
    )


def ucb_scores(
    df: DataFrame,
    arm_col: str,
    success: Column,
    *,
    c: float = 2.0,
) -> DataFrame:
    """UCB1 bandit allocation scores (Auer et al. 2002): per arm
    ``(arm, n, x, rate, ucb)`` with ``ucb = rate + sqrt(c · ln(N) /
    n)`` over total plays N — play the argmax arm next; the bonus
    shrinks as an arm accumulates evidence, giving the logarithmic-
    regret explore/exploit balance. Batch-deterministic companion to
    the streaming SPRT monitor (streaming/abtest.py).

    One grouped aggregate plus a 1-row broadcast of N."""
    if c <= 0:
        raise ValueError(f"c must be > 0, got {c}")
    per_arm = df.groupBy(arm_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(success.cast("int")).cast("long").alias("x"),
    )
    tot = per_arm.agg(F.sum("n").cast("double").alias("_total"))
    return per_arm.crossJoin(F.broadcast(tot)).select(
        arm_col,
        "n",
        "x",
        (F.col("x") / F.col("n")).alias("rate"),
        (
            F.col("x") / F.col("n")
            + F.sqrt(F.lit(float(c)) * F.log(F.col("_total")) / F.col("n"))
        ).alias("ucb"),
    )


def _poisson1_cdf(max_k: int) -> list[float]:
    """Cumulative Poisson(1) probabilities [P(X<=0), ..,
    P(X<=max_k-1)] — draws above max_k-1 clamp to max_k."""
    import math

    cum, term, acc = [], math.exp(-1.0), 0.0
    for k in range(max_k):
        if k > 0:
            term = term / k
        acc += term
        cum.append(acc)
    return cum


#: Poisson(1) inverse-CDF ladder depth: P(X > 8) < 1e-6, and the
#: SAME literal cumulative constants are embedded in the Spark
#: expression and the SQL oracle so draws are bit-identical.
POISSON_MAX_K = 8


def poisson_weight(u: Column) -> Column:
    """Poisson(1) draw from a uniform via the inverse-CDF ladder."""
    cum = _poisson1_cdf(POISSON_MAX_K)
    expr = F.lit(POISSON_MAX_K)
    for k in reversed(range(POISSON_MAX_K)):
        expr = F.when(u < F.lit(cum[k]), F.lit(k)).otherwise(expr)
    return expr


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    replicates: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
) -> DataFrame:
    """Percentile-bootstrap CI for the mean via the POISSON bootstrap
    (the resampling that distributes: per (row, replicate), weight ~
    Poisson(1) — indistinguishable from multinomial resampling for
    large n, and computable with zero data movement): one row
    ``(n, replicates, mean, lo, hi)``.

    The replicate fan-out is generated MAP-SIDE (explode of a
    ``sequence(0, B-1)`` literal) and partially aggregated before the
    shuffle, so the exchange carries B×partitions partial rows, never
    n×B. Weights come from the md5-uniform of (seed, replicate, id) —
    deterministic, retry-stable, oracle-reproducible.
    """
    if replicates < 10:
        raise ValueError(f"replicates must be >= 10, got {replicates}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from ..sources.loaders import fan_out

    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(value_col).cast("double").alias("_v")
    )
    # B md5 draws per row are generated MAP-SIDE in the scan stage; on a
    # single-row-group input that serializes n×B hashes onto one core —
    # spread the (id, v) rows first (guide §2.5), the fan-out exchange
    # carries 2 columns and is a no-op when the scan is already wide
    base = fan_out(base)
    rep = base.select(
        "_id",
        "_v",
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("_r"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(str(seed)),
                    F.col("_r").cast("string"),
                    F.col("_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    w = poisson_weight(u).cast("double")
    means = (
        rep.select("_r", (w * F.col("_v")).alias("_wv"), w.alias("_w"))
        .groupBy("_r")
        .agg(
            # nullif: an all-zero-weight replicate (P ≈ e^-n, real
            # only for tiny n) yields a NULL mean the percentile
            # skips, instead of an ANSI divide-by-zero error
            (F.sum("_wv") / F.nullif(F.sum("_w"), F.lit(0.0))).alias("_m")
        )
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("_v").alias("mean"),
    )
    ci = means.agg(
        F.percentile(F.col("_m"), F.lit(alpha / 2)).alias("lo"),
        F.percentile(F.col("_m"), F.lit(1 - alpha / 2)).alias("hi"),
    )
    return stats.crossJoin(F.broadcast(ci)).select(
        "n",
        F.lit(replicates).cast("long").alias("replicates"),
        "mean",
        "lo",
        "hi",
    )


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences estimator: one row with the four
    cell means, ``did = (treat_post − treat_pre) − (ctrl_post −
    ctrl_pre)``, its large-sample standard error (independent-cell
    variance sum) and z. ``treat_col`` / ``post_col`` are 0/1; NULL
    values are excluded. ONE aggregation pass builds all four cells
    via conditional sums — no per-cell scans."""
    t = F.col(treat_col).cast("int")
    p = F.col(post_col).cast("int")
    v = F.col(value_col).cast("double")
    base = df.where(
        v.isNotNull() & t.isNotNull() & p.isNotNull()
    )

    def cell(ti: int, pi: int, name: str) -> list[Column]:
        m = (t == ti) & (p == pi)
        return [
            F.sum(F.when(m, 1).otherwise(0)).cast("double").alias(f"n_{name}"),
            F.sum(F.when(m, v).otherwise(0.0)).alias(f"s_{name}"),
            F.sum(F.when(m, v * v).otherwise(0.0)).alias(f"q_{name}"),
        ]

    aggs = (
        cell(0, 0, "cp") + cell(0, 1, "co") + cell(1, 0, "tp") + cell(1, 1, "to")
    )
    g = base.agg(*aggs)

    def mean(name: str) -> Column:
        return F.col(f"s_{name}") / F.col(f"n_{name}")

    def var_of_mean(name: str) -> Column:
        n = F.col(f"n_{name}")
        s2 = (F.col(f"q_{name}") - F.col(f"s_{name}") * F.col(f"s_{name}") / n) / (
            n - 1
        )
        return s2 / n

    did = (mean("to") - mean("tp")) - (mean("co") - mean("cp"))
    se = F.sqrt(
        var_of_mean("to") + var_of_mean("tp") + var_of_mean("co")
        + var_of_mean("cp")
    )
    return g.select(
        mean("cp").alias("ctrl_pre"),
        mean("co").alias("ctrl_post"),
        mean("tp").alias("treat_pre"),
        mean("to").alias("treat_post"),
        did.alias("did"),
        se.alias("se"),
        (did / se).alias("z"),
    )


def fdr_bh(
    df: DataFrame,
    p_col: str,
    q: float = 0.05,
    *,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Benjamini–Hochberg FDR correction over a table of hypotheses.

    Input: one row per hypothesis with a p-value column (NULL p-values
    are dropped — they carry no evidence). Adds:

    - ``rank``: 1-based position in the p-ascending order
      (``tie_cols`` break ties deterministically);
    - ``p_adj``: the BH q-value ``min(1, min_{k≥i} p_(k)·m/k)`` via a
      reverse running minimum — monotone, tie-stable (equal p ⇒ equal
      ``p_adj`` regardless of tie order);
    - ``rejected``: ``p_adj ≤ q``, exactly the classic BH step-up
      rejection set.

    The ordering window runs over HYPOTHESES (already-aggregated
    groups), not raw rows — m is small by construction, so the single
    unpartitioned sort is a few thousand rows even when the underlying
    corpus is 100 TB. Pair with any per-group test in this module or a
    bound-based screen (e.g. Hoeffding) to control the false-discovery
    rate across many simultaneous group comparisons.
    """
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    rows = df.where(F.col(p_col).isNotNull())
    order = [F.col(p_col).asc()] + [F.col(c) for c in tie_cols]
    w_rank = Window.orderBy(*order)
    m = F.count(F.lit(1)).over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ranked = rows.select(
        "*",
        F.row_number().over(w_rank).alias("rank"),
        m.cast("double").alias("_m"),
    )
    w_tail = Window.orderBy(F.col("rank")).rowsBetween(
        0, Window.unboundedFollowing
    )
    padj = F.least(
        F.lit(1.0),
        F.min(
            F.col(p_col) * F.col("_m") / F.col("rank").cast("double")
        ).over(w_tail),
    )
    return ranked.select(
        *[c for c in ranked.columns if c != "_m"],
        padj.alias("p_adj"),
    ).withColumn("rejected", (F.col("p_adj") <= F.lit(q)).cast("int"))


def hoeffding_mean_shift_p(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
) -> DataFrame:
    """Distribution-free per-group mean-shift screen: for each group,
    the Hoeffding bound ``p ≤ min(1, 2·exp(−2·n·t²/R²))`` on observing
    the group mean ``t = |mean_g − mean_global|`` away from the global
    mean of a variable bounded in a range of width ``R``.

    A conservative BOUND, not an exact p-value (documented as such) —
    but fully deterministic, assumption-free, and exactly SQL-
    reproducible, which is what a data-quality gate wants. Output:
    ``(by..., n, mean_v, p_bound)``; feed straight into ``fdr_bh``.
    One aggregation per side + a 1-row broadcast join.
    """
    v = F.col(value_col).cast("double")
    rows = df.where(v.isNotNull())
    glob = rows.agg(
        F.avg(v).alias("_gmean"),
        (F.max(v) - F.min(v)).alias("_range"),
    )
    per = rows.groupBy(*[F.col(c) for c in by]).agg(
        F.count(F.lit(1)).alias("n"), F.avg(v).alias("mean_v")
    )
    t = F.abs(F.col("mean_v") - F.col("_gmean"))
    p = F.least(
        F.lit(1.0),
        2.0
        * F.exp(
            -2.0
            * F.col("n").cast("double")
            * t
            * t
            / F.nullif(F.col("_range") * F.col("_range"), F.lit(0.0))
        ),
    )
    return per.crossJoin(F.broadcast(glob)).select(
        *[F.col(c) for c in by],
        F.col("n"),
        F.col("mean_v"),
        p.alias("p_bound"),
    )


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """One-way ANOVA from per-group sufficient statistics: F statistic
    and effect size η² for "does this numeric differ across groups" —
    the k-group generalization of the two-sample tests above, reduced
    to one grouped aggregate of ``(n, Σx, Σx²)`` per group.

    ``SSB = Σ_g n_g(x̄_g − x̄)²``, ``SSW = Σ_g (Σx²_g − n_g·x̄_g²)``,
    ``F = (SSB/(k−1)) / (SSW/(n−k))``, ``η² = SSB/(SSB+SSW)``. The
    p-value needs the F CDF (no closed form in either engine); the
    statistic + degrees of freedom are returned so callers can look it
    up — same convention as the χ²/log-rank contracts.

    Scale: one map-side-combined groupBy (k rows of 3 doubles out),
    then arithmetic on the k-row table. Degenerate inputs (k < 2 or
    n ≤ k, or zero within-variance) yield NULL F, not an error.

    Returns one row ``(k_groups, n, df_between, df_within, f_stat,
    eta2)``.
    """
    v = F.col(value_col).cast("double")
    g = (
        df.where(v.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("double").alias("ng"),
            F.sum(v).alias("sg"),
            F.sum(v * v).alias("qg"),
        )
    )
    return g.agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.sum("ng").cast("long").alias("n"),
        (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("df_between"),
        (F.sum("ng") - F.count(F.lit(1))).cast("long").alias("df_within"),
        (
            (
                (
                    F.sum(F.col("sg") * F.col("sg") / F.col("ng"))
                    - F.sum("sg") * F.sum("sg") / F.sum("ng")
                )
                / F.nullif(
                    (F.count(F.lit(1)) - F.lit(1)).cast("double"), F.lit(0.0)
                )
            )
            / F.nullif(
                (
                    F.sum("qg")
                    - F.sum(F.col("sg") * F.col("sg") / F.col("ng"))
                )
                / F.nullif(
                    F.sum("ng") - F.count(F.lit(1)).cast("double"),
                    F.lit(0.0),
                ),
                F.lit(0.0),
            )
        ).alias("f_stat"),
        (
            (
                F.sum(F.col("sg") * F.col("sg") / F.col("ng"))
                - F.sum("sg") * F.sum("sg") / F.sum("ng")
            )
            / F.nullif(
                F.sum("qg") - F.sum("sg") * F.sum("sg") / F.sum("ng"),
                F.lit(0.0),
            )
        ).alias("eta2"),
    )


def dispersion_test(df: DataFrame, key_col: str) -> DataFrame:
    """Poisson overdispersion check on per-key event counts: the
    variance-to-mean dispersion index D and the chi-square statistic
    ``(n−1)·D`` (df = n−1). D ≈ 1 is Poisson-compatible; D ≫ 1 says
    the counts are clumped (bursty users, bot traffic, hot sources) —
    the modeling-assumption gate before any Poisson-based rate test.

    One grouped count + one aggregate of ``(n, Σc, Σc²)``; the sample
    variance uses the explicit-sums form ``(Σc² − (Σc)²/n)/(n−1)`` so
    the SQL oracle shares the expression. Keys with zero rows do not
    exist by construction (counts come from the data itself).

    Returns one row ``(n_keys, mean, variance, dispersion, chi2)``;
    NULLs when fewer than 2 keys.
    """
    c = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    n = F.count(F.lit(1)).cast("double")
    return c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        (F.sum("c") / n).alias("mean"),
        (
            (F.sum(F.col("c") * F.col("c")) - F.sum("c") * F.sum("c") / n)
            / F.nullif(n - F.lit(1.0), F.lit(0.0))
        ).alias("variance"),
        (
            (
                (F.sum(F.col("c") * F.col("c")) - F.sum("c") * F.sum("c") / n)
                / F.nullif(n - F.lit(1.0), F.lit(0.0))
            )
            / F.nullif(F.sum("c") / n, F.lit(0.0))
        ).alias("dispersion"),
        (
            (n - F.lit(1.0))
            * (
                (
                    F.sum(F.col("c") * F.col("c"))
                    - F.sum("c") * F.sum("c") / n
                )
                / F.nullif(n - F.lit(1.0), F.lit(0.0))
            )
            / F.nullif(F.sum("c") / n, F.lit(0.0))
        ).alias("chi2"),
    )


def mcnemar_test(
    df: DataFrame,
    correct_a,
    correct_b,
) -> DataFrame:
    """McNemar's paired test: do two classifiers scored on the SAME
    items disagree symmetrically? ``correct_a``/``correct_b`` are
    boolean Columns (is each classifier right on this row); only the
    discordant cells matter: ``b`` = A right & B wrong, ``c`` = A
    wrong & B right, statistic ``(|b−c|−1)²/(b+c)`` (continuity-
    corrected, df=1). The right test for "is the new quality filter
    actually better" — marginal accuracies ignore pairing and
    overstate certainty.

    One conditional aggregate over the corpus; NULL statistic when
    b + c = 0 (no disagreements — the test is undefined, not zero).

    Returns one row ``(n, acc_a, acc_b, b_discordant, c_discordant,
    mcnemar_chi2)``.
    """
    a = correct_a.cast("double")
    bb = correct_b.cast("double")
    n = F.count(F.lit(1)).cast("double")
    b_cell = F.sum(a * (F.lit(1.0) - bb))
    c_cell = F.sum((F.lit(1.0) - a) * bb)
    return df.agg(
        n.cast("long").alias("n"),
        (F.sum(a) / n).alias("acc_a"),
        (F.sum(bb) / n).alias("acc_b"),
        b_cell.cast("long").alias("b_discordant"),
        c_cell.cast("long").alias("c_discordant"),
        (
            (F.abs(b_cell - c_cell) - F.lit(1.0))
            * (F.abs(b_cell - c_cell) - F.lit(1.0))
            / F.nullif(b_cell + c_cell, F.lit(0.0))
        ).alias("mcnemar_chi2"),
    )


def exponentiality_test(
    df: DataFrame,
    gap_col: str,
) -> DataFrame:
    """Lilliefors-style KS statistic against the exponential family:
    are these waiting times memoryless? The rate is estimated from the
    data (``1/mean``), the statistic is the max gap between the
    empirical CDF (both one-sided limits — the correct discrete KS)
    and ``1 − exp(−x/mean)``. Pairs with :func:`dispersion_test`:
    dispersion asks "Poisson counts?", this asks "exponential gaps?".
    The null distribution is Lilliefors', not Kolmogorov's (the mean
    was estimated), so the statistic + n are returned and the caller
    looks up the critical value — the log-rank/ANOVA convention.

    One grouped pass over DISTINCT gap values (the
    binary_rank_metrics block doctrine), mean as a 1-row broadcast;
    non-positive/NULL gaps excluded (exponential support is x > 0).

    Returns one row ``(n, mean_gap, ks_stat)``.
    """
    from pyspark.sql.window import Window

    g = F.col(gap_col).cast("double")
    rows = df.where(g.isNotNull() & (g > 0))
    blocks = rows.groupBy(g.alias("_g")).agg(
        F.count(F.lit(1)).cast("double").alias("_c")
    )
    tot = blocks.agg(
        F.sum("_c").alias("_n"),
        (F.sum(F.col("_g") * F.col("_c")) / F.sum("_c")).alias("_m"),
    )
    cum = Window.orderBy("_g").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = blocks.crossJoin(F.broadcast(tot)).select(
        "_g",
        "_n",
        "_m",
        (F.sum("_c").over(cum) / F.col("_n")).alias("_fhi"),
        (
            (F.sum("_c").over(cum) - F.col("_c")) / F.col("_n")
        ).alias("_flo"),
    )
    fexp = F.lit(1.0) - F.exp(-F.col("_g") / F.col("_m"))
    return stepped.agg(
        F.first("_n").cast("long").alias("n"),
        F.first("_m").alias("mean_gap"),
        F.max(
            F.greatest(
                F.abs(F.col("_fhi") - fexp), F.abs(fexp - F.col("_flo"))
            )
        ).alias("ks_stat"),
    )


def negbin_fit(df: DataFrame, key_col: str, by=()) -> DataFrame:
    """Method-of-moments negative-binomial fit on per-key event
    counts — the model you reach for once :func:`dispersion_test`
    rejects Poisson: ``r = mean²/(var − mean)``, ``p = r/(r + mean)``
    (NB2 parameterization). Per ``by`` group when given.

    Same sufficient-statistics shape as dispersion_test (one grouped
    count + explicit-sums variance). Under-dispersed groups
    (var ≤ mean: NB undefined) report the −1.0 sentinel (a real r/p is
    always positive; NULL numerics break the oracle's pandas
    round-trip) with their moments still visible.

    Returns ``(by…, n_keys, mean, variance, nb_r, nb_p)``.
    """
    bys = list(by)
    c = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(*bys, F.col(key_col).alias("_k"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    n = F.count(F.lit(1)).cast("double")
    mean = F.sum("c") / n
    var = (
        F.sum(F.col("c") * F.col("c")) - F.sum("c") * F.sum("c") / n
    ) / F.nullif(n - F.lit(1.0), F.lit(0.0))
    r = mean * mean / F.nullif(
        F.when(var > mean, var - mean), F.lit(0.0)
    )
    return c.groupBy(*bys).agg(
        F.count(F.lit(1)).alias("n_keys"),
        mean.alias("mean"),
        var.alias("variance"),
        F.coalesce(r, F.lit(-1.0)).alias("nb_r"),
        F.coalesce(r / (r + mean), F.lit(-1.0)).alias("nb_p"),
    )


def welch_t_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance t-test plus Cohen's d — the parametric
    two-sample comparison the suite's rank tests (MW/KS) deliberately
    avoid assuming, returned WITH its effect size because a t-stat
    alone conflates magnitude with sample size. Welch–Satterthwaite
    df is returned for the caller's critical-value lookup (the
    ANOVA/log-rank convention — no t CDF in either engine).

    One conditional-sums scan (the ridge_lambda_sweep shape); sample
    variances in the explicit-sums form; Cohen's d uses the pooled-SD
    convention. Degenerate sides (n < 2 or zero variance on both)
    yield NULL statistics.

    Returns one row ``(n_a, n_b, mean_a, mean_b, mean_diff, t_stat,
    df_welch, cohens_d)``.
    """
    v = F.col(value_col).cast("double")
    g = F.col(group_col)
    rows = df.where(v.isNotNull() & g.isNotNull())

    def side(val, tag):
        cond = g == F.lit(val)
        return [
            F.sum(F.when(cond, F.lit(1.0)).otherwise(0.0)).alias(f"n{tag}"),
            F.sum(F.when(cond, v).otherwise(0.0)).alias(f"s{tag}"),
            F.sum(F.when(cond, v * v).otherwise(0.0)).alias(f"q{tag}"),
        ]

    s = rows.agg(*side(group_a, "a"), *side(group_b, "b"))
    na, nb = F.col("na"), F.col("nb")
    ma = F.col("sa") / F.nullif(na, F.lit(0.0))
    mb = F.col("sb") / F.nullif(nb, F.lit(0.0))
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / F.nullif(
        na - F.lit(1.0), F.lit(0.0)
    )
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / F.nullif(
        nb - F.lit(1.0), F.lit(0.0)
    )
    se2 = va / na + vb / nb
    t = (ma - mb) / F.nullif(F.sqrt(se2), F.lit(0.0))
    dfw = se2 * se2 / F.nullif(
        va * va / (na * na * (na - F.lit(1.0)))
        + vb * vb / (nb * nb * (nb - F.lit(1.0))),
        F.lit(0.0),
    )
    pooled = F.sqrt(
        F.nullif(
            ((na - 1) * va + (nb - 1) * vb)
            / F.nullif(na + nb - F.lit(2.0), F.lit(0.0)),
            F.lit(0.0),
        )
    )
    return s.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        (ma - mb).alias("mean_diff"),
        t.alias("t_stat"),
        dfw.alias("df_welch"),
        ((ma - mb) / pooled).alias("cohens_d"),
    )


def wilson_proportions(
    df: DataFrame,
    success,
    group_cols: "list[str]",
    *,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Per-group proportion with a Wilson score interval — the CI that
    stays inside [0,1] and behaves at small n / extreme rates, where
    the naive Wald interval collapses (Brown-Cai-DasGupta 2001).
    ``success`` is a boolean Column; ``z`` defaults to the two-sided
    95% normal quantile.

    One conditional-count aggregate per group; the interval is closed-
    form arithmetic: center ``(p̂ + z²/2n)/(1 + z²/n)``, half-width
    ``z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n)``. Empty groups cannot occur
    (groups come from the data); n=0 never divides.

    Returns ``(group…, n, successes, p_hat, ci_lo, ci_hi)``.
    """
    if z <= 0:
        raise ValueError(f"z must be positive, got {z}")
    s = F.sum(F.when(success, 1.0).otherwise(0.0))
    n = F.count(F.lit(1)).cast("double")
    p = s / n
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(z)
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + z2 / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return df.groupBy(*group_cols).agg(
        n.cast("long").alias("n"),
        s.cast("long").alias("successes"),
        p.alias("p_hat"),
        (center - half).alias("ci_lo"),
        (center + half).alias("ci_hi"),
    )


def pairwise_welch(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """All-pairs Welch comparisons — the post-hoc step after
    :func:`anova_oneway` says "the groups differ somewhere": every
    group pair's mean difference, Welch t and Welch-Satterthwaite df
    (feed the t-stats to :func:`fdr_bh` for multiplicity control —
    that is the intended composition).

    ONE grouped scan reduces the corpus to per-group ``(n, Σx, Σx²)``;
    the pair table is a self-join of that k-row aggregate (i < j by
    group order) — k²/2 rows of pure arithmetic, never a second data
    pass. Degenerate pairs (a side with n < 2 or both variances zero)
    yield NULL statistics.

    Returns ``(group_a, group_b, n_a, n_b, mean_diff, t_stat,
    df_welch)``.
    """
    v = F.col(value_col).cast("double")
    g = (
        df.where(v.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(v).alias("s"),
            F.sum(v * v).alias("q"),
        )
    )
    a = g.select(
        F.col("grp").alias("group_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("q").alias("qa"),
    )
    b = g.select(
        F.col("grp").alias("group_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("q").alias("qb"),
    )
    pairs = a.crossJoin(b).where(F.col("group_a") < F.col("group_b"))
    na, nb = F.col("na"), F.col("nb")
    ma = F.col("sa") / na
    mb = F.col("sb") / nb
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / F.nullif(
        na - F.lit(1.0), F.lit(0.0)
    )
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / F.nullif(
        nb - F.lit(1.0), F.lit(0.0)
    )
    se2 = va / na + vb / nb
    return pairs.select(
        "group_a",
        "group_b",
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        (ma - mb).alias("mean_diff"),
        ((ma - mb) / F.nullif(F.sqrt(se2), F.lit(0.0))).alias("t_stat"),
        (
            se2
            * se2
            / F.nullif(
                va * va / (na * na * (na - F.lit(1.0)))
                + vb * vb / (nb * nb * (nb - F.lit(1.0))),
                F.lit(0.0),
            )
        ).alias("df_welch"),
    )


def cuped_adjusted_test(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    treated,
) -> DataFrame:
    """CUPED variance reduction for an A/B metric (Deng et al., WSDM
    2013): regress the pre-experiment covariate out of the metric
    (``y' = y − θ(x − x̄)`` with ``θ = cov(x,y)/var(x)`` pooled), then
    run the treated-vs-control z-test on the adjusted metric — same
    unbiased effect estimate, variance shrunk by the covariate's r².
    The standard "use last month's spend to sharpen this month's
    experiment" trick, as two scans.

    Scan 1 pools θ and x̄ over ALL units (the Deng et al. pooled
    convention — θ from a single arm leaks treatment effect); scan 2
    computes per-arm adjusted sums and the Welch-style z. Reported
    side by side: the UNADJUSTED z, the adjusted z, and the variance
    reduction ratio, so the lift from CUPED is visible.

    Returns one row ``(n_t, n_c, theta, effect_raw, z_raw,
    effect_cuped, z_cuped, var_reduction)``.
    """
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    rows = df.where(y.isNotNull() & x.isNotNull())
    s0 = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    ).collect()[0]
    n = s0["n"]
    varx = n * s0["sxx"] - s0["sx"] * s0["sx"]
    if n < 3 or varx == 0.0:
        raise ValueError("covariate has no variance (or n < 3)")
    theta = (n * s0["sxy"] - s0["sx"] * s0["sy"]) / varx
    xbar = s0["sx"] / n
    adj = y - F.lit(theta) * (x - F.lit(xbar))

    def side(cond, tag, col):
        return [
            F.sum(F.when(cond, F.lit(1.0)).otherwise(0.0)).alias(f"n{tag}"),
            F.sum(F.when(cond, col).otherwise(0.0)).alias(f"s{tag}"),
            F.sum(F.when(cond, col * col).otherwise(0.0)).alias(f"q{tag}"),
        ]

    s = rows.agg(
        *side(treated, "t", y),
        *side(~treated, "c", y),
        *side(treated, "ta", adj),
        *side(~treated, "ca", adj),
    ).collect()[0]

    def z_of(nt, st, qt, nc, sc, qc):
        # degenerate arms (empty or a single unit) have no variance
        # estimate: surface NULL statistics like the sibling Welch
        # tests, never a ZeroDivisionError
        if nt < 2.0 or nc < 2.0:
            return None, None, None
        mt, mc = st / nt, sc / nc
        vt = (qt - st * st / nt) / (nt - 1.0)
        vc = (qc - sc * sc / nc) / (nc - 1.0)
        se2 = vt / nt + vc / nc
        return mt - mc, ((mt - mc) / se2**0.5 if se2 > 0 else None), se2

    eff_raw, z_raw, se2_raw = z_of(
        s["nt"], s["st"], s["qt"], s["nc"], s["sc"], s["qc"]
    )
    eff_adj, z_adj, se2_adj = z_of(
        s["nta"], s["sta"], s["qta"], s["nca"], s["sca"], s["qca"]
    )
    return _k_row_df(df.sparkSession, 
        [
            (
                int(s["nt"]),
                int(s["nc"]),
                float(theta),
                None if eff_raw is None else float(eff_raw),
                None if z_raw is None else float(z_raw),
                None if eff_adj is None else float(eff_adj),
                None if z_adj is None else float(z_adj),
                (
                    float(1.0 - se2_adj / se2_raw)
                    if se2_raw is not None and se2_raw > 0
                    else None
                ),
            )
        ],
        "n_t long, n_c long, theta double, effect_raw double, "
        "z_raw double, effect_cuped double, z_cuped double, "
        "var_reduction double",
    )


def moods_median_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Mood's median test: are the k groups' medians plausibly equal?
    Count above/at-or-below the GLOBAL median per group and chi-square
    the 2×k table — the bluntest but most outlier-proof of the k-group
    location tests (only signs of deviations matter; pairs with
    :func:`anova_oneway` the way MW pairs with Welch).

    One exact global median (``percentile`` ≡ ``quantile_cont``,
    1-row broadcast) + one conditional-count aggregate per group +
    chi-square arithmetic over the k-row table. df = k−1.

    Returns one row ``(k_groups, n, n_above, chi2, df)``; NULL chi2
    when a margin is empty (all values on one side).
    """
    v = F.col(value_col).cast("double")
    rows = df.where(v.isNotNull() & F.col(group_col).isNotNull())
    med = rows.agg(
        F.percentile(v, F.lit(0.5)).alias("_m")
    )
    g = (
        rows.crossJoin(F.broadcast(med))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("double").alias("ng"),
            F.sum(
                F.when(v > F.col("_m"), 1.0).otherwise(0.0)
            ).alias("ag"),
        )
    )
    tot = g.agg(F.sum("ng").alias("_n"), F.sum("ag").alias("_a"))
    g2 = g.crossJoin(F.broadcast(tot))
    # expected cells per group: ng*(A/N) above, ng*((N-A)/N) below
    e_above = F.col("ng") * (F.col("_a") / F.col("_n"))
    e_below = F.col("ng") * ((F.col("_n") - F.col("_a")) / F.col("_n"))
    chi2 = F.sum(
        (F.col("ag") - e_above)
        * (F.col("ag") - e_above)
        / F.nullif(e_above, F.lit(0.0))
        + ((F.col("ng") - F.col("ag")) - e_below)
        * ((F.col("ng") - F.col("ag")) - e_below)
        / F.nullif(e_below, F.lit(0.0))
    )
    return g2.agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.first("_n").cast("long").alias("n"),
        F.first("_a").cast("long").alias("n_above"),
        chi2.alias("chi2"),
        (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("df"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Kruskal–Wallis rank test: the distribution-free k-group
    location test completing the family (MW is its 2-group case,
    :func:`anova_oneway` its parametric cousin, Mood's its blunter
    sibling). Midrank ties, tie-corrected:
    ``H = [12/(N(N+1))·Σ R²_g/n_g − 3(N+1)] / (1 − Σ(t³−t)/(N³−N))``.

    The block doctrine end to end: one ``(value, group)`` count
    aggregate; per-value midranks from an ordered cumulative window
    over the DISTINCT-VALUE table; per-group rank sums as
    ``Σ cnt·midrank``; the tie term from the same value totals. No
    corpus sort, no per-row window. df = k−1.

    Returns one row ``(k_groups, n, h_stat, df, tie_correction)``;
    NULL H when every value is identical (tie correction hits 0).
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("double")
    rows = df.where(v.isNotNull() & F.col(group_col).isNotNull())
    cells = rows.groupBy(
        v.alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).cast("double").alias("_c"))
    vals = cells.groupBy("_v").agg(F.sum("_c").alias("_t"))
    cum = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vals.select(
        "_v",
        "_t",
        (
            F.sum("_t").over(cum)
            - F.col("_t")
            + (F.col("_t") + F.lit(1.0)) / F.lit(2.0)
        ).alias("_mid"),
    )
    per_g = (
        cells.join(ranked, "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("ng"),
            F.sum(F.col("_c") * F.col("_mid")).alias("rg"),
        )
    )
    ties = vals.agg(
        F.sum("_t").alias("n"),
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")).alias(
            "tsum"
        ),
    )
    agg = per_g.crossJoin(F.broadcast(ties)).agg(
        F.count(F.lit(1)).alias("k_groups"),
        F.first("n").alias("_n"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("_r2"),
        F.first("tsum").alias("_ts"),
    )
    n = F.col("_n")
    h_raw = (
        F.lit(12.0) / (n * (n + F.lit(1.0))) * F.col("_r2")
        - F.lit(3.0) * (n + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("_ts") / F.nullif(
        n * n * n - n, F.lit(0.0)
    )
    return agg.select(
        "k_groups",
        n.cast("long").alias("n"),
        (h_raw / F.nullif(corr, F.lit(0.0))).alias("h_stat"),
        (F.col("k_groups") - F.lit(1)).cast("long").alias("df"),
        corr.alias("tie_correction"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman's test for k related samples: rank the treatments
    WITHIN each block (user, day, machine — anything that makes
    observations comparable), then ask whether any treatment
    systematically ranks higher — the repeated-measures counterpart of
    :func:`kruskal_wallis` (which assumes independent groups).
    ``χ²_F = [12/(nk(k+1))·Σ R²_j − 3n(k+1)] / C``, midrank ties with
    the standard tie-correction divisor ``C = 1 − Σ(t³−t)/(nk(k²−1))``
    (matches scipy.stats.friedmanchisquare; NULL when C = 0, i.e.
    every block fully tied), df = k−1.

    Only COMPLETE blocks participate (a block missing a treatment
    cannot be ranked against the others — the textbook requirement,
    enforced not assumed). Per-block cell values are means when a
    (block, treatment) has several rows. The rank window partitions
    by block over ≤ k rows — bounded and parallel.

    Returns one row ``(n_blocks, k_treatments, chi2_f, df)``; NULL
    statistic when no block is complete.
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("double")
    rows = df.where(
        v.isNotNull()
        & F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
    )
    cells = rows.groupBy(
        F.col(block_col).alias("_b"), F.col(treatment_col).alias("_t")
    ).agg(F.avg(v).alias("_v"))
    k = cells.select("_t").distinct().count()
    if k < 2:
        raise ValueError(f"need at least 2 treatments, got {k}")
    complete = (
        cells.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_kt"))
        .where(F.col("_kt") == k)
        .select("_b")
    )
    kept = cells.join(complete, "_b")
    wr = Window.partitionBy("_b").orderBy("_v")
    wt = Window.partitionBy("_b", "_v")
    ranked = kept.select(
        "_b",
        "_t",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - F.lit(1.0))
            / F.lit(2.0)
        ).alias("_r"),
    )
    per_t = ranked.groupBy("_t").agg(F.sum("_r").alias("rj"))
    nb = ranked.select("_b").distinct().count()
    if nb == 0:
        return _k_row_df(df.sparkSession, 
            [(0, k, None, k - 1)],
            "n_blocks long, k_treatments long, chi2_f double, df long",
        )
    # Tie correction (the standard statistic, e.g. scipy's
    # friedmanchisquare): divide by C = 1 − Σ_blocks Σ_ties (t³−t) /
    # (n·k·(k²−1)), accumulated from the same tied-cell groups the
    # midranks came from. C == 0 (every block fully tied) yields NULL.
    t_sz = F.col("_tsz").cast("double")
    ties = (
        kept.groupBy("_b", "_v")
        .agg(F.count(F.lit(1)).alias("_tsz"))
        .agg(
            F.coalesce(
                F.sum(t_sz * t_sz * t_sz - t_sz), F.lit(0.0)
            ).alias("_T")
        )
    )
    agg = per_t.agg(F.sum(F.col("rj") * F.col("rj")).alias("_r2")).crossJoin(
        ties
    )
    kk = float(k)
    raw = F.lit(12.0 / (nb * kk * (kk + 1.0))) * F.col("_r2") - F.lit(
        3.0 * nb * (kk + 1.0)
    )
    c_corr = F.lit(1.0) - F.col("_T") / F.lit(nb * kk * (kk * kk - 1.0))
    return agg.select(
        F.lit(nb).cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k_treatments"),
        (raw / F.nullif(c_corr, F.lit(0.0))).alias("chi2_f"),
        F.lit(k - 1).cast("long").alias("df"),
    )


#: two-sided alpha=0.05 and power=0.80 normal quantiles — frozen to
#: full double precision so oracles share them as literals
Z_ALPHA_05 = 1.959963984540054
Z_BETA_80 = 0.8416212335729143


def ab_power_mde(
    df: DataFrame,
    arm_col: str,
    metric_col: str,
    *,
    arm_a: str = "a",
    arm_b: str = "b",
    target_rel_effect: float = 0.05,
) -> DataFrame:
    """Experiment power planning from the experiment's own data: the
    minimum detectable effect at the OBSERVED arm sizes and the sample
    size a target effect would need — the two numbers every "is this
    A/B even worth running" review asks for (two-sided α = 0.05,
    power = 0.80, normal approximation).

    One aggregation scan of per-arm sums:

    - ``mde_abs = (z_{α/2} + z_β) · √(s²_a/n_a + s²_b/n_b)`` and its
      ratio to the pooled mean (``mde_rel``);
    - ``n_per_arm_target`` = ``2·(z_{α/2}+z_β)²·s²_pooled / δ²`` with
      ``δ = target_rel_effect · pooled mean`` — the classic per-arm
      requirement for the stated relative lift.

    Degenerate inputs (an arm below 2 units, zero variance, zero
    pooled mean) surface NULL in the affected fields. Returns one row
    ``(n_a, n_b, mean_a, mean_b, var_a, var_b, mde_abs, mde_rel,
    n_per_arm_target)``.
    """
    if target_rel_effect <= 0:
        raise ValueError(
            f"target_rel_effect must be > 0, got {target_rel_effect}"
        )
    y = F.col(metric_col).cast("double")
    arm = F.col(arm_col)
    rows = df.where(y.isNotNull() & arm.isin([arm_a, arm_b]))
    s = rows.agg(
        F.sum(F.when(arm == arm_a, 1.0).otherwise(0.0)).alias("na"),
        F.sum(F.when(arm == arm_a, y).otherwise(0.0)).alias("sa"),
        F.sum(F.when(arm == arm_a, y * y).otherwise(0.0)).alias("qa"),
        F.sum(F.when(arm == arm_b, 1.0).otherwise(0.0)).alias("nb"),
        F.sum(F.when(arm == arm_b, y).otherwise(0.0)).alias("sb"),
        F.sum(F.when(arm == arm_b, y * y).otherwise(0.0)).alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    ma = F.col("sa") / F.nullif(na, F.lit(0.0))
    mb = F.col("sb") / F.nullif(nb, F.lit(0.0))
    va = (F.col("qa") - F.col("sa") * F.col("sa") / F.nullif(na, F.lit(0.0))) / F.nullif(
        na - F.lit(1.0), F.lit(0.0)
    )
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / F.nullif(nb, F.lit(0.0))) / F.nullif(
        nb - F.lit(1.0), F.lit(0.0)
    )
    guard = (na >= 2.0) & (nb >= 2.0)
    zsum = F.lit(Z_ALPHA_05 + Z_BETA_80)
    mde_abs = F.when(guard, zsum * F.sqrt(va / na + vb / nb))
    pooled_mean = (F.col("sa") + F.col("sb")) / F.nullif(
        na + nb, F.lit(0.0)
    )
    pooled_var = F.when(
        guard,
        (
            (na - 1.0) * va + (nb - 1.0) * vb
        )
        / F.nullif(na + nb - F.lit(2.0), F.lit(0.0)),
    )
    delta = F.lit(float(target_rel_effect)) * pooled_mean
    n_target = F.when(
        guard & (delta != 0.0),
        F.lit(2.0) * zsum * zsum * pooled_var / (delta * delta),
    )
    return s.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        F.when(guard, va).alias("var_a"),
        F.when(guard, vb).alias("var_b"),
        mde_abs.alias("mde_abs"),
        (mde_abs / F.nullif(pooled_mean, F.lit(0.0))).alias("mde_rel"),
        F.ceil(n_target).cast("long").alias("n_per_arm_target"),
    )


#: Two-sided group-sequential critical values at alpha = 0.05 for
#: K = 5 equally spaced looks (Pocock 1977 table; O'Brien-Fleming 1979
#: final-look constant — earlier OBF looks scale by sqrt(K/k)).
POCOCK_C_K5 = 2.413
OBF_C_K5 = 2.040


def group_sequential(
    events: DataFrame,
    *,
    arm_col: str,
    value_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    looks: int = 5,
) -> DataFrame:
    """Group-sequential experiment monitoring — the batch ledger
    behind :func:`streaming`'s SPRT: replay the experiment at
    ``looks`` equally spaced interim analyses (event-time order,
    deterministic id tie-break) and report at each look the
    two-sample z alongside BOTH classic stopping boundaries:

    * Pocock — constant critical value (easy to cross early, pays at
      the final look);
    * O'Brien-Fleming — ``c·√(K/k)``: nearly impossible to cross
      early, ≈ the fixed-sample test at the end.

    Constants are the published K = 5, α = 0.05 table values
    (POCOCK_C_K5, OBF_C_K5) — spending-function generalization needs
    Φ⁻¹ and is out of scope by design.

    Returns ``looks`` rows: ``(look, n, n_a, n_b, mean_a, mean_b, z,
    boundary_pocock, boundary_obf, cross_pocock, cross_obf)`` with
    the unpooled z ``(m_a − m_b)/√(s²_a/n_a + s²_b/n_b)``.

    Scale shape: one rank pass (event-time row_number — the only
    shuffle), then ONE aggregate computes every look's per-arm
    (n, Σv, Σv²) as conditional sums; the z/boundary arithmetic is a
    |looks|-row projection. Nothing iterates.
    """
    if looks != 5:
        # the boundary constants are the published K=5 table values;
        # silently applying them to another look count would report
        # statistically wrong boundaries/cross flags (ADVICE r6) —
        # mirror the other closed-form guards and refuse.
        raise ValueError(
            f"group_sequential supports exactly looks=5 (the published "
            f"Pocock/O'Brien-Fleming K=5 constants); got {looks}"
        )
    a = F.col(arm_col)
    v = F.col(value_col).cast("double")
    rows = events.where(v.isNotNull() & a.isNotNull()).select(
        a.alias("_arm"),
        v.alias("_v"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    w = Window.orderBy("_ts", "_id")
    ranked = rows.withColumn("_rn", F.row_number().over(w))
    total = ranked.count()
    if total < 2 * looks:
        raise ValueError(
            f"need at least {2 * looks} rows for {looks} looks, "
            f"got {total}"
        )
    arms = sorted(
        r["_arm"] for r in rows.select("_arm").distinct().collect()
    )
    if len(arms) != 2:
        raise ValueError(f"need exactly 2 arms, got {arms}")
    arm_a, arm_b = arms
    aggs = []
    cuts = []
    for k in range(1, looks + 1):
        cut = (total * k) // looks
        cuts.append(cut)
        inc = F.col("_rn") <= F.lit(cut)
        for tag, arm in (("a", arm_a), ("b", arm_b)):
            m = inc & (F.col("_arm") == arm)
            w1 = F.when(m, 1.0).otherwise(0.0)
            aggs.extend(
                [
                    F.sum(w1).alias(f"n{tag}{k}"),
                    F.sum(w1 * F.col("_v")).alias(f"s{tag}{k}"),
                    F.sum(w1 * F.col("_v") * F.col("_v")).alias(
                        f"q{tag}{k}"
                    ),
                ]
            )
    s = ranked.agg(*aggs).collect()[0]
    out = []
    kk = float(looks)
    for k in range(1, looks + 1):
        na, sa, qa = s[f"na{k}"], s[f"sa{k}"], s[f"qa{k}"]
        nb, sb, qb = s[f"nb{k}"], s[f"sb{k}"], s[f"qb{k}"]
        ma = sa / na if na > 0 else None
        mb = sb / nb if nb > 0 else None
        z = None
        if na > 1 and nb > 1:
            va = (qa - sa * sa / na) / (na - 1.0)
            vb = (qb - sb * sb / nb) / (nb - 1.0)
            se2 = va / na + vb / nb
            if se2 > 0.0:
                z = (ma - mb) / math.sqrt(se2)
        b_p = POCOCK_C_K5
        b_o = OBF_C_K5 * math.sqrt(kk / float(k))
        out.append(
            (
                k,
                cuts[k - 1],
                int(na),
                int(nb),
                ma,
                mb,
                z,
                b_p,
                b_o,
                bool(z is not None and abs(z) > b_p),
                bool(z is not None and abs(z) > b_o),
            )
        )
    return _k_row_df(events.sparkSession, 
        out,
        "look int, n long, n_a long, n_b long, mean_a double, "
        "mean_b double, z double, boundary_pocock double, "
        "boundary_obf double, cross_pocock boolean, "
        "cross_obf boolean",
    )


def jackknife_ratio(
    df: DataFrame,
    num_col: str,
    den_col: str,
    *,
    buckets: int = 10,
    key_col: str | None = None,
) -> DataFrame:
    """Delete-one-group jackknife for the RATIO estimator
    ``R = Σnum / Σden`` — the deterministic resampling sibling of the
    Poisson bootstrap (``bootstrap_mean``): ratios are the textbook
    case where naive per-row variance formulas are wrong (the
    denominator is random too), and the delete-one jackknife

        R₍g₎ = (Σnum − num_g) / (Σden − den_g),
        SE² = (G−1)/G · Σ_g (R₍g₎ − R̄₍·₎)²

    prices that correlation correctly (Quenouille/Tukey; the survey
    "random groups" form). Groups are ``md5(key) % buckets`` — the
    hash-coin doctrine, so replicas are engine-identical; ``key_col``
    defaults to the row's numerator+denominator rendering (stable,
    but pass a real id for production use).

    Returns one row ``(n, buckets, ratio, se_jack, bias_jack)`` where
    ``bias_jack = (G−1)·(R̄₍·₎ − R)`` is the standard jackknife bias
    estimate.

    Scale shape: ONE scan aggregates per-bucket (num, den) sums
    (buckets ≤ dozens — a map-side-combinable G-row reduce); the
    replicate arithmetic runs on those G pairs. Nothing row-sized
    moves.
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    num = F.col(num_col).cast("double")
    den = F.col(den_col).cast("double")
    rows = df.where(num.isNotNull() & den.isNotNull())
    if key_col is None:
        key = F.concat(
            num.cast("string"), F.lit(":"), den.cast("string")
        )
    else:
        key = F.col(key_col).cast("string")
    from .dedup import md5_int60

    g = (md5_int60(key) % buckets).alias("g")
    per = rows.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(num).alias("sn"),
        F.sum(den).alias("sd"),
    )
    # sorted by group id: the driver-side replicate sums then
    # accumulate in one fixed order regardless of partitioning
    rows_g = sorted(per.collect(), key=lambda r: r["g"])
    if len(rows_g) < 2:
        raise ValueError(
            "need at least 2 non-empty jackknife groups"
        )
    tot_n = sum(r["n"] for r in rows_g)
    tn = sum(r["sn"] for r in rows_g)
    td = sum(r["sd"] for r in rows_g)
    if td == 0.0:
        raise ValueError("denominator total is zero")
    ratio = tn / td
    reps = [
        (tn - r["sn"]) / (td - r["sd"])
        for r in rows_g
        if (td - r["sd"]) != 0.0
    ]
    gn = len(reps)
    rbar = sum(reps) / gn
    se2 = (gn - 1.0) / gn * sum((x - rbar) ** 2 for x in reps)
    bias = (gn - 1.0) * (rbar - ratio)
    return _k_row_df(df.sparkSession, 
        [
            (
                int(tot_n),
                int(gn),
                float(ratio),
                float(math.sqrt(se2)),
                float(bias),
            )
        ],
        "n long, buckets long, ratio double, se_jack double, "
        "bias_jack double",
    )
