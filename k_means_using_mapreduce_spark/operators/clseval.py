"""Classification evaluation: confusion matrix, per-class
precision/recall/F1, and corpus-level accuracy / Cohen's kappa /
Matthews correlation — the label-quality loop for pipeline classifiers
(lang-id vs gold language, quality filter vs human labels, weak
supervision vs adjudicated slices).

Scale shape: ONE ``groupBy(label, pred)`` over the corpus — map-side
combined, at most |C|² result rows for C classes — and every metric
thereafter is arithmetic on that tiny table (C-row joins, broadcast by
AQE). Nothing corpus-sized shuffles twice, nothing collects.

Conventions (documented because they differ across libraries):

* Undefined per-class precision/recall/F1 (zero predicted / zero
  support / both zero) report **0.0**, sklearn's ``zero_division=0`` —
  the raw ``tp / n_gold / n_pred`` counts sit beside them, so nothing
  is hidden. (The ranking module reports NULL instead; there the
  caller averages, here the averages are computed in-module over the
  right denominators.)
* Macro averages run over classes with **gold support only** — a class
  the model invents (predicted, never gold) does not dilute macro-F1.
* ``kappa`` / ``mcc`` are NULL only in the true degenerate cases
  (single-class gold AND matching marginals; all-one-cell matrices),
  guarded by ``nullif`` — Spark 4 ANSI mode raises on 0/0 otherwise.

Reference scope: the reference engine (master.py:27-150) evaluates
only K-Means SSE; this module is part of the LLM-data-pipeline
extension surface (classifier/label evaluation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Observed confusion cells: ``(label, pred, n)``. Zero cells are
    absent (the matrix is sparse by construction at high C)."""
    return df.groupBy(
        F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
    ).agg(F.count("*").alias("n"))


def _marginals(cm: DataFrame) -> DataFrame:
    """Per-class gold/pred marginals + diagonal from a confusion
    matrix: ``(class, n_gold, n_pred, tp)`` — C rows, outer-joined so
    classes seen only as gold or only as pred both appear."""
    gold = cm.groupBy(F.col("label").alias("class")).agg(
        F.sum("n").alias("n_gold")
    )
    pred = cm.groupBy(F.col("pred").alias("class")).agg(
        F.sum("n").alias("n_pred")
    )
    diag = cm.where(F.col("label") == F.col("pred")).select(
        F.col("label").alias("class"), F.col("n").alias("tp")
    )
    out = (
        gold.join(pred, "class", "full_outer")
        .join(diag, "class", "left")
        .select(
            "class",
            F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    return out


def class_metrics(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class table: ``(class, n_gold, n_pred, tp, precision,
    recall, f1)`` with sklearn ``zero_division=0`` semantics."""
    m = _marginals(confusion_matrix(df, label_col, pred_col))
    tp_d = F.col("tp").cast("double")
    prec = F.when(F.col("n_pred") > 0, tp_d / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, tp_d / F.col("n_gold")).otherwise(0.0)
    with_pr = m.select("*", prec.alias("precision"), rec.alias("recall"))
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2.0
        * F.col("precision")
        * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(0.0)
    return with_pr.select("*", f1.alias("f1"))


def classification_summary(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """One-row corpus summary: ``(n, accuracy, kappa, mcc,
    macro_precision, macro_recall, macro_f1, weighted_f1)``.

    * ``accuracy`` = micro-F1 for single-label classification.
    * ``kappa``: agreement over chance, ``p_e = Σ g_c·p_c / N²``.
    * ``mcc``: multiclass R_k statistic,
      ``(N·Σtp − Σ g_c·p_c) / sqrt((N²−Σp_c²)(N²−Σg_c²))``.
    * macro means are over classes with ``n_gold > 0``;
      ``weighted_f1`` weights per-class F1 by gold support.
    """
    per = class_metrics(df, label_col, pred_col)
    supported = F.col("n_gold") > 0
    mean_if = lambda c: F.avg(F.when(supported, F.col(c)))  # noqa: E731
    agg = per.agg(
        F.sum("n_gold").alias("_n"),
        F.sum("tp").alias("_tp"),
        F.sum(F.col("n_gold").cast("double") * F.col("n_pred")).alias("_gp"),
        F.sum(F.col("n_gold").cast("double") * F.col("n_gold")).alias("_gg"),
        F.sum(F.col("n_pred").cast("double") * F.col("n_pred")).alias("_pp"),
        mean_if("precision").alias("macro_precision"),
        mean_if("recall").alias("macro_recall"),
        mean_if("f1").alias("macro_f1"),
        (
            F.sum(F.col("n_gold").cast("double") * F.col("f1"))
            / F.sum(F.col("n_gold")).cast("double")
        ).alias("weighted_f1"),
    )
    n_d = F.col("_n").cast("double")
    po = F.col("_tp").cast("double") / n_d
    pe = F.col("_gp") / (n_d * n_d)
    kappa = (po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0))
    mcc_num = n_d * F.col("_tp").cast("double") - F.col("_gp")
    mcc_den = F.sqrt(
        (n_d * n_d - F.col("_pp")) * (n_d * n_d - F.col("_gg"))
    )
    mcc = mcc_num / F.nullif(mcc_den, F.lit(0.0))
    return agg.select(
        F.col("_n").alias("n"),
        po.alias("accuracy"),
        kappa.alias("kappa"),
        mcc.alias("mcc"),
        "macro_precision",
        "macro_recall",
        "macro_f1",
        "weighted_f1",
    )


def binary_rank_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Threshold-free binary-scorer evaluation: ROC-AUC (tie-corrected
    Mann-Whitney midrank form) and the KS statistic, in ONE grouped
    pass over DISTINCT SCORE VALUES — no per-row window, no threshold
    sweep.

    Per distinct score: ``(n, n_pos)``; ordered ascending, the tie
    block starting after ``cum_before`` rows has midrank
    ``cum_before + (n+1)/2``, so
    ``AUC = (Σ n_pos·midrank − P(P+1)/2) / (P·N)`` — exactly the
    Wilcoxon rank-sum estimator sklearn's ``roc_auc_score`` computes.
    KS is the max CDF gap ``|cum_pos/P − cum_neg/N|`` over the same
    ordered blocks.

    Scale shape: one ``groupBy(score)`` (map-side combined) reduces the
    corpus to |distinct scores| rows; the ordered cumulative window
    runs over THAT table. For continuous scores at extreme scale,
    quantize the score first (e.g. ``round(score, 6)``) — the operator
    is exact for whatever resolution it is given. NULL scores/labels
    are excluded; label must be 0/1 (checked).

    Returns one row ``(n_pos, n_neg, auc, ks)`` — AUC/KS NULL when a
    class is absent (undefined, not 0.5, so degeneracy is visible).
    """
    from pyspark.sql.window import Window

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    rows = df.where(s.isNotNull() & y.isNotNull())
    blocks = (
        rows.select(
            s.alias("_s"),
            F.when(y == 1.0, F.lit(1.0))
            .when(y == 0.0, F.lit(0.0))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("label must be 0/1, got "), y.cast("string")
                    )
                )
            )
            .alias("_y"),
        )
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("_y").alias("n_pos"),
        )
    )
    win = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = blocks.select(
        "n",
        "n_pos",
        (F.sum("n").over(win) - F.col("n")).alias("cum_before"),
        F.sum("n_pos").over(win).alias("cum_pos"),
        (F.sum(F.col("n") - F.col("n_pos")).over(win)).alias("cum_neg"),
    )
    tot = blocks.agg(
        F.sum("n_pos").alias("p"),
        F.sum(F.col("n") - F.col("n_pos")).alias("q"),
    )
    agg = cum.crossJoin(F.broadcast(tot)).agg(
        F.first("p").alias("p"),
        F.first("q").alias("q"),
        F.sum(
            F.col("n_pos")
            * (F.col("cum_before") + (F.col("n") + F.lit(1.0)) / F.lit(2.0))
        ).alias("pos_rank_sum"),
        F.max(
            F.abs(
                F.col("cum_pos") / F.nullif(F.col("p"), F.lit(0.0))
                - F.col("cum_neg") / F.nullif(F.col("q"), F.lit(0.0))
            )
        ).alias("ks"),
    )
    return agg.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("q").cast("long").alias("n_neg"),
        (
            (F.col("pos_rank_sum") - F.col("p") * (F.col("p") + 1) / 2)
            / F.nullif(F.col("p") * F.col("q"), F.lit(0.0))
        ).alias("auc"),
        F.when(
            (F.col("p") > 0) & (F.col("q") > 0), F.col("ks")
        ).alias("ks"),
    )


def decile_lift(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    id_col: str | None = None,
    bins: int = 10,
) -> DataFrame:
    """Gains/lift table: rank rows by score (best first), cut into
    ``bins`` equal-count tiles, and report each tile's response rate,
    lift over the base rate, and the cumulative capture of all
    positives — the campaign-targeting readout ("the top decile holds
    3.4× its share of converters") that an AUC cannot give a business
    user.

    Tiles are ``ntile`` over the total order (score desc, id) — the
    calibration module's determinism convention; pass ``id_col`` so
    equal scores split reproducibly (without it, ties fall in input
    order and only the per-tile COUNTS are guaranteed stable). The
    global sort is a single-reducer window pass (the documented ntile
    trade, fine to tens of millions of scored rows; see
    operators/calibration.py's scale note for the percentile-edge
    alternative).

    Returns ``bins`` rows ``(tile, n, n_pos, response_rate, lift,
    cum_capture)``; lift NULL when the corpus has no positives.
    """
    from pyspark.sql.window import Window

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    order = [s.desc()]
    if id_col is not None:
        order.append(F.col(id_col))
    rows = df.where(s.isNotNull() & y.isNotNull())
    tiled = rows.select(
        y.alias("_y"), F.ntile(bins).over(Window.orderBy(*order)).alias("tile")
    )
    per = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_y").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").alias("nn"), F.sum("n_pos").alias("pp")
    )
    w = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "tile",
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            (F.col("n_pos") / F.col("n")).alias("response_rate"),
            (
                (F.col("n_pos") / F.col("n"))
                / F.nullif(F.col("pp") / F.col("nn"), F.lit(0.0))
            ).alias("lift"),
            (
                F.sum("n_pos").over(w) / F.nullif(F.col("pp"), F.lit(0.0))
            ).alias("cum_capture"),
        )
    )


def clustering_agreement(
    df: DataFrame, label_a: str, label_b: str
) -> DataFrame:
    """Adjusted Rand Index + Normalized Mutual Information between two
    labelings of the same rows — "did changing K / seed / features
    actually change the partition", the stability check every
    clustering pipeline should run before trusting one fit.

    Pure contingency-table closed forms over ONE pair groupBy (cells
    ≤ |A|·|B|, tiny) plus its marginals:

    - ``ARI = (Σc(nᵢⱼ,2) − E) / (max_index − E)`` with
      ``E = Σc(aᵢ,2)·Σc(bⱼ,2)/c(n,2)`` (Hubert & Arabie 1985);
      1 = identical partitions, ~0 = random agreement, can go
      negative. The degenerate all-singletons/all-one-cluster case
      (max_index == E) yields NULL.
    - ``NMI = I(A;B) / √(H(A)·H(B))`` (natural logs, the sqrt
      normalization); NULL when either entropy is 0 (a constant
      labeling carries no information to normalize by).

    Rows with a NULL label on either side are excluded. Returns one
    row ``(n, k_a, k_b, ari, nmi)``.
    """
    a, b = F.col(label_a), F.col(label_b)
    rows = df.where(a.isNotNull() & b.isNotNull())
    cells = rows.groupBy(a.alias("_a"), b.alias("_b")).agg(
        F.count(F.lit(1)).cast("double").alias("nij")
    )

    def c2(x):
        return x * (x - F.lit(1.0)) / F.lit(2.0)

    am = cells.groupBy("_a").agg(F.sum("nij").alias("ai"))
    bm = cells.groupBy("_b").agg(F.sum("nij").alias("bj"))
    s = cells.agg(
        F.sum("nij").alias("n"),
        F.sum(c2(F.col("nij"))).alias("sum_cij"),
        F.count(F.lit(1)).alias("_cells"),
    )
    sa = am.agg(
        F.sum(c2(F.col("ai"))).alias("sum_ca"),
        F.count(F.lit(1)).alias("k_a"),
        F.sum(F.col("ai") * F.log("ai")).alias("slog_a"),
    )
    sb = bm.agg(
        F.sum(c2(F.col("bj"))).alias("sum_cb"),
        F.count(F.lit(1)).alias("k_b"),
        F.sum(F.col("bj") * F.log("bj")).alias("slog_b"),
    )
    # I(A;B) = Σ (nij/n)·ln(n·nij/(ai·bj)); assembled from sums so the
    # oracle shares the arithmetic: n·H terms via x·ln x sums
    mi_term = (
        cells.join(F.broadcast(am), "_a")
        .join(F.broadcast(bm), "_b")
        .agg(
            F.sum(
                F.col("nij")
                * F.log(F.col("nij") / (F.col("ai") * F.col("bj")))
            ).alias("smix")
        )
    )
    j = s.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb)).crossJoin(
        F.broadcast(mi_term)
    )
    n = F.col("n")
    e_index = F.col("sum_ca") * F.col("sum_cb") / c2(n)
    max_index = (F.col("sum_ca") + F.col("sum_cb")) / F.lit(2.0)
    ari = (F.col("sum_cij") - e_index) / F.nullif(
        max_index - e_index, F.lit(0.0)
    )
    # H(A) = ln n − (1/n)Σ ai·ln ai ; I = (1/n)·smix + ln n
    h_a = F.log(n) - F.col("slog_a") / n
    h_b = F.log(n) - F.col("slog_b") / n
    mi = F.col("smix") / n + F.log(n)
    nmi = mi / F.nullif(F.sqrt(h_a * h_b), F.lit(0.0))
    return j.select(
        n.cast("long").alias("n"),
        F.col("k_a").cast("long").alias("k_a"),
        F.col("k_b").cast("long").alias("k_b"),
        ari.alias("ari"),
        nmi.alias("nmi"),
    )
