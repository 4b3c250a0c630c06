"""Score calibration: quantile binning + isotonic (PAV) regression.

A quality/toxicity/duplicate classifier's raw score is rarely a
probability; sampling weights and threshold picks need calibrated
ones. The standard tool is isotonic regression, but PAV is an
inherently sequential pooling algorithm — so the engine splits it the
usual way (kmeans/pca/bpe doctrine): the DATA-sized pass reduces the
corpus to ``n_bins`` quantile-bin aggregates (one ntile window + one
combinable aggregate), PAV pools those bins on the driver (model-sized
— hundreds of floats), and application back over the corpus is a
literal-folded CASE ladder — narrow, zero-shuffle.

Binned PAV equals exact PAV whenever bin boundaries don't split
equal-score ties across bins — and ntile ordered by (score, id) makes
any such split deterministic; with hundreds of bins over millions of
rows the calibration difference is noise, which is the standard
practical trade (sklearn's isotonic on big data is routinely fed
binned pairs).

Determinism: ntile over a total order (score, then id) — retries and
repartitions bin identically; the same ordering is SQL, so the binned
layer is oracle-checked (contracts/calibration_queries.py).

Scale note: ntile's global order is a single-reducer window pass (the
sorted-neighborhood precedent, operators/entity.py). Fine into the
tens of millions of scored rows; beyond, compute bin EDGES with one
distributed ``percentile`` aggregate and assign bins by comparison —
approximate equal-count under ties, but no global sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    *,
    n_bins: int = 50,
) -> DataFrame:
    """Equal-count score bins with empirical positive rates:
    ``(bin, n, min_score, max_score, mean_score, pos_rate)``, bin
    ascending in score. ``label_col`` is 0/1 (cast to int)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    w = Window.orderBy(F.col(score_col), F.col(id_col))
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int").cast("double")
    return (
        df.select(s.alias("_s"), y.alias("_y"), F.col(id_col).alias("_id"))
        .withColumn("bin", F.ntile(n_bins).over(
            Window.orderBy(F.col("_s"), F.col("_id"))
        ))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("_s").alias("min_score"),
            F.max("_s").alias("max_score"),
            F.avg("_s").alias("mean_score"),
            F.avg("_y").alias("pos_rate"),
        )
    )


@dataclass
class IsotonicModel:
    #: ascending (upper_score_bound, calibrated_p) steps; the last bound
    #: is +inf
    steps: list[tuple[float, float]]


def isotonic_fit(binned: DataFrame) -> IsotonicModel:
    """Pool-Adjacent-Violators over the bin table (weighted by bin
    count): merges any bin whose positive rate dips below its
    predecessor until rates are non-decreasing in score. Driver cost
    O(n_bins)."""
    rows = sorted(
        binned.select("bin", "n", "max_score", "pos_rate").collect(),
        key=lambda r: r["bin"],
    )
    if not rows:
        raise ValueError("cannot fit isotonic model on an empty bin table")
    # blocks of (weight, weighted rate sum, upper score bound)
    blocks: list[list[float]] = []
    for r in rows:
        blocks.append([float(r["n"]), float(r["n"]) * float(r["pos_rate"]),
                       float(r["max_score"])])
        while len(blocks) >= 2 and (
            blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
        ):
            w2, s2, b2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
            blocks[-1][2] = b2
        # merged block keeps the LAST bound (score-ascending)
    steps = [(b[2], b[1] / b[0]) for b in blocks]
    steps[-1] = (float("inf"), steps[-1][1])
    return IsotonicModel(steps=steps)


def isotonic_apply(
    df: DataFrame,
    score_col: str,
    model: IsotonicModel,
    *,
    out_col: str = "calibrated_p",
) -> DataFrame:
    """Map raw scores to calibrated probabilities — a CASE ladder over
    the model's step bounds (model-sized literals, zero shuffle)."""
    s = F.col(score_col).cast("double")
    expr = F.lit(model.steps[-1][1])
    for bound, p in reversed(model.steps[:-1]):
        expr = F.when(s <= bound, F.lit(p)).otherwise(expr)
    # scores below the first bound take the first step's p (the when
    # chain above already does: first matching bound wins)
    return df.withColumn(out_col, expr)


def conformal_quantile(
    cal: DataFrame,
    pred_col: str,
    actual_col: str,
    *,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal residual quantile (Vovk et al.; Lei et al.
    2018): one row ``(n_cal, k, qhat)`` where ``qhat`` is the k-th
    smallest absolute residual on the calibration set, ``k =
    ceil((1-alpha)(n+1))`` — the finite-sample-valid order statistic
    (NOT an interpolated percentile), giving ``P(|y - ŷ| ≤ qhat) ≥
    1 - alpha`` on exchangeable data. ``k`` is clamped to n (alpha
    smaller than 1/(n+1) formally demands an infinite interval; the
    clamp is the standard practical cap, recorded via k = n).

    Fully distributed: the rank is a row_number over the residual
    PROJECTION (one column), no driver action; rows with NULL pred
    or actual are excluded (no residual exists).
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    r = (
        cal.where(
            F.col(pred_col).isNotNull() & F.col(actual_col).isNotNull()
        )
        .select(
            F.abs(
                F.col(actual_col).cast("double")
                - F.col(pred_col).cast("double")
            ).alias("_r")
        )
    )
    w = Window.orderBy("_r")
    ranked = r.select(
        "_r",
        F.row_number().over(w).alias("_rk"),
        F.count("*").over(Window.partitionBy()).alias("n_cal"),
    )
    k = F.least(
        F.ceil(F.lit(1.0 - alpha) * (F.col("n_cal") + 1)).cast("long"),
        F.col("n_cal").cast("long"),
    )
    return (
        ranked.where(F.col("_rk") == k)
        .select(
            F.col("n_cal").cast("long").alias("n_cal"),
            k.alias("k"),
            F.col("_r").alias("qhat"),
        )
    )


def conformal_coverage(
    test: DataFrame,
    quant: DataFrame,
    pred_col: str,
    actual_col: str,
) -> DataFrame:
    """Empirical coverage of the conformal band on a held-out set:
    one row ``(n_cal, k, qhat, n_test, covered, coverage)`` — the
    1-row ``quant`` relation broadcasts into the test scan."""
    joined = test.where(
        F.col(pred_col).isNotNull() & F.col(actual_col).isNotNull()
    ).crossJoin(F.broadcast(quant))
    hit = (
        F.abs(
            F.col(actual_col).cast("double") - F.col(pred_col).cast("double")
        )
        <= F.col("qhat")
    ).cast("int")
    return joined.groupBy("n_cal", "k", "qhat").agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(hit).cast("long").alias("covered"),
        (F.sum(hit) / F.count("*")).alias("coverage"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    grid: int = 101,
) -> DataFrame:
    """Cross-group score calibration by quantile mapping: replace each
    row's value with the GLOBAL quantile at that row's within-group
    percent rank — after which every group's score distribution is the
    same (the global one), so one threshold means one thing across
    sources. The fix for "source A's quality 0.6 is source B's 0.8"
    that a per-source z-score cannot deliver (z assumes gaussian;
    quantile mapping is distribution-free).

    The global quantile function is an exact ``grid``-point percentile
    array (one aggregate, broadcast as a single row) with linear
    interpolation between grid points — the same discretize-the-model
    trade as the isotonic binning above, deterministic and engine-
    portable. Within-group ranks are ``percent_rank()`` over a window
    PARTITIONED by group (parallel; ties share a rank, single-row
    groups get rank 0).

    Scale: one percentile aggregate + one partitioned window + a
    broadcast — nothing global-sorts raw rows.

    Returns the input rows (NULL values dropped) plus ``qnorm``.
    """
    if grid < 3:
        raise ValueError(f"grid must be >= 3, got {grid}")
    v = F.col(value_col).cast("double")
    rows = df.where(v.isNotNull() & F.col(group_col).isNotNull())
    fracs = [i / (grid - 1) for i in range(grid)]
    # DENSE grid: bracket-path windows would cover the whole column
    # (see encode.py::quantile_bucket_encode note) — buffered is right
    glob = rows.agg(
        F.percentile(v, F.array(*[F.lit(p) for p in fracs])).alias("_q")
    )
    w = Window.partitionBy(group_col).orderBy(v)
    x = F.percent_rank().over(w) * F.lit(float(grid - 1))
    out = (
        rows.withColumn("_x", x)
        .crossJoin(F.broadcast(glob))
        .withColumn(
            "_i",
            F.least(F.floor(F.col("_x")), F.lit(grid - 2)).cast("int"),
        )
        .withColumn(
            "_f", F.col("_x") - F.col("_i").cast("double")
        )
        .withColumn(
            "qnorm",
            F.element_at("_q", F.col("_i") + 1)
            + F.col("_f")
            * (
                F.element_at("_q", F.col("_i") + 2)
                - F.element_at("_q", F.col("_i") + 1)
            ),
        )
        .drop("_x", "_i", "_f", "_q")
    )
    return out


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    id_col: str | None = None,
    bins: int = 10,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over score
    bins: ``brier = reliability − resolution + uncertainty`` — the
    calibration diagnostic that separates "my probabilities are
    mis-calibrated" (reliability, want 0) from "my probabilities
    don't discriminate" (resolution, want large) against the
    irreducible base-rate noise (uncertainty).

    Bins are ntile over (score, id) — the module's determinism
    convention (see the isotonic scale note for the percentile-edge
    alternative at extreme scale); the decomposition identity holds
    EXACTLY for the binned forecast (each bin's mean score is the
    forecast), which is what makes the three terms reconcile and the
    SQL oracle bit-followable.

    Returns one row ``(n, base_rate, brier, reliability, resolution,
    uncertainty)``.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    order = [s]
    if id_col is not None:
        order.append(F.col(id_col))
    rows = df.where(s.isNotNull() & y.isNotNull())
    tiled = rows.select(
        s.alias("_s"),
        y.alias("_y"),
        F.ntile(bins).over(Window.orderBy(*order)).alias("_b"),
    )
    per = tiled.groupBy("_b").agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.avg("_s").alias("fb"),
        F.avg("_y").alias("ob"),
    )
    tot = per.agg(
        F.sum("nb").alias("n"),
        (F.sum(F.col("nb") * F.col("ob")) / F.sum("nb")).alias("obar"),
    )
    out = per.crossJoin(F.broadcast(tot)).agg(
        F.first("n").cast("long").alias("n"),
        F.first("obar").alias("base_rate"),
        F.sum(
            F.col("nb")
            * (F.col("fb") - F.col("ob"))
            * (F.col("fb") - F.col("ob"))
        ).alias("_rel_sum"),
        F.sum(
            F.col("nb")
            * (F.col("ob") - F.col("obar"))
            * (F.col("ob") - F.col("obar"))
        ).alias("_res_sum"),
        F.first("n").alias("_nd"),
    )
    rel = F.col("_rel_sum") / F.col("_nd")
    res = F.col("_res_sum") / F.col("_nd")
    unc = F.col("base_rate") * (F.lit(1.0) - F.col("base_rate"))
    return out.select(
        "n",
        "base_rate",
        (rel - res + unc).alias("brier"),
        rel.alias("reliability"),
        res.alias("resolution"),
        unc.alias("uncertainty"),
    )


def isotonic_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    increasing: bool = True,
) -> DataFrame:
    """EXACT weighted isotonic regression of ``mean(y)`` on ``x``,
    computed entirely IN-PLAN (no driver-side pooling) via the
    max-min representation of the PAVA solution:

        iso(i) = max_{j<=i} min_{k>=i} mean(y over blocks j..k)

    (Robertson, Wright & Dykstra 1988, Thm 1.4.4 — the weighted
    block means come from prefix sums, so the whole thing is three
    relational stages over the DISTINCT-x block relation:
    prefix sums → all (j<=k) pair means → per-j suffix-min window →
    per-i max.)

    Complements :func:`isotonic_fit` (driver PAV over quantile bins —
    the billions-of-rows path): this one is exact on the block level
    AND fully SQL-expressible, so the oracle hash-gates the isotonic
    SOLUTION itself. Cost is O(B²) pair rows for B distinct x values —
    use when x has bounded cardinality (quantized scores, integer
    features); bin first when it does not.

    ``increasing=False`` fits the antitonic (decreasing) solution by
    negating y around the same machinery. Output: one row per distinct
    x — ``(x, n, y_mean, y_iso)``, NULL-x and NULL-y rows excluded.
    """
    from pyspark.sql.window import Window

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    sign = 1.0 if increasing else -1.0
    blocks = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("x"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(y * F.lit(sign)).alias("sy"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    pref = blocks.select(
        "x",
        "n",
        "sy",
        F.sum("n").over(w).alias("cn"),
        F.sum("sy").over(w).alias("cs"),
    )
    lo = pref.select(
        F.col("x").alias("xj"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
        (F.col("cs") - F.col("sy")).alias("cs_before"),
    )
    hi = pref.select(
        F.col("x").alias("xk"), F.col("cn").alias("cn_k"), F.col("cs").alias("cs_k")
    )
    pair = lo.join(hi, F.col("xj") <= F.col("xk")).select(
        "xj",
        "xk",
        (
            (F.col("cs_k") - F.col("cs_before"))
            / (F.col("cn_k") - F.col("cn_before"))
        ).alias("m"),
    )
    # suffix min over k (per j): min_{k >= i} mean(j..k), materialized
    # at every i in [j, B]
    w_sfx = Window.partitionBy("xj").orderBy(F.desc("xk")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    minmean = pair.select(
        "xj", F.col("xk").alias("xi"), F.min("m").over(w_sfx).alias("mm")
    )
    iso = minmean.groupBy("xi").agg(F.max("mm").alias("y_iso_s"))
    base = blocks.select(
        "x", F.col("n").cast("long").alias("n"), (F.col("sy") / F.col("n")).alias("ym_s")
    )
    return base.join(iso, base["x"] == iso["xi"]).select(
        "x",
        "n",
        (F.col("ym_s") * F.lit(sign)).alias("y_mean"),
        (F.col("y_iso_s") * F.lit(sign)).alias("y_iso"),
    )
