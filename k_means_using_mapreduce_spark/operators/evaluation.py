"""Clustering evaluation: silhouette (MLlib) and the elbow sweep.

Beyond-reference additions (the reference never evaluates its
clustering — it only logs centroids): standard model-selection tools
over the same assign kernel.

Scale: silhouette uses MLlib's squared-euclidean formulation, which is
O(N·K) with one aggregation pass (not the O(N²) textbook definition);
``sse_by_k`` runs the fit loop per candidate k over a cached input —
at 100 TB you'd sweep on a `hash_sample` (operators/sampling.py) and
refit the chosen k on the full data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import Centroids, assign, kmeans_fit


def silhouette(
    df: DataFrame, centroids: Centroids, features_col: str = "features"
) -> float:
    """Mean silhouette coefficient (squared-euclidean, MLlib
    ClusteringEvaluator) of the nearest-centroid assignment under the
    given centroids. In [-1, 1]; higher = better-separated clusters."""
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.functions import array_to_vector

    assigned = assign(df, centroids, features_col).select(
        F.col("cid").cast("int").alias("prediction"),
        array_to_vector(F.col(features_col)).alias("features"),
    ).cache()
    n_clusters = assigned.select("prediction").distinct().count()
    if n_clusters < 2:
        assigned.unpersist()
        # MLlib throws a bare JVM AssertionError here; fail clearly
        raise ValueError(
            f"silhouette needs >= 2 non-empty clusters; the given "
            f"centroids produced {n_clusters} (every point is nearest "
            f"the same centroid)"
        )
    ev = ClusteringEvaluator(
        predictionCol="prediction",
        featuresCol="features",
        metricName="silhouette",
        distanceMeasure="squaredEuclidean",
    )
    try:
        return float(ev.evaluate(assigned))
    finally:
        assigned.unpersist()


def sse_by_k(
    df: DataFrame,
    ks: list[int],
    *,
    seed: int = 42,
    max_iter: int = 10,
    features_col: str = "features",
    init: str = "k-means++",
) -> list[tuple[int, float]]:
    """Elbow sweep: fit each candidate k, return [(k, sse)]. The input
    is cached once across the sweep."""
    work = df.select(features_col).cache()
    try:
        return [
            (
                k,
                kmeans_fit(
                    work, k, seed=seed, max_iter=max_iter,
                    features_col=features_col, init=init,
                ).sse,
            )
            for k in ks
        ]
    finally:
        work.unpersist()


def label_centroid_drift(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding centroid vs the global centroid: ``(label,
    n_vecs, centroid_l2, cos_to_global, dist_to_global)``.

    The embedding-space twin of the token-level drift monitor
    (operators/lm.py::source_divergence): a label/source/snapshot whose
    mean embedding swings away from the corpus mean (cosine dropping,
    distance growing) signals distribution shift — a new crawl behaving
    differently, a source gone off-topic, an encoder version change —
    before any downstream model sees it.

    Scale shape: one posexplode + (label, dim)-keyed average (the
    kmeans.update kernel shape, map-side combined, |labels|·d result
    rows); the global means and per-label counts are DERIVED from
    that tiny per-(label, dim) table — ``g = Σ_l m_l·n_l / Σ_l n_l``
    and ``n_vecs = cnt at dim 0`` — so the raw vectors really are
    scanned exactly once, then a d-row broadcast back onto it and a
    |labels|-row final aggregate. Nothing corpus-sized shuffles.
    Rows whose vector is NULL or empty contribute no dims and are
    excluded from ``n_vecs``.
    """
    vals = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    # localCheckpoint materializes the |labels|·d-row aggregate once —
    # Catalyst does not reuse the exchange across per's three
    # consumers (measured: 6 scans in the final adaptive plan without
    # it), and this table is KBs at any corpus size.
    per = (
        vals.groupBy("label", "pos")
        .agg(F.avg("v").alias("m"), F.count("v").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    glob = per.groupBy("pos").agg(
        (F.sum(F.col("m") * F.col("cnt")) / F.sum("cnt")).alias("g")
    )
    n = (
        per.where(F.col("pos") == 0)
        .select("label", F.col("cnt").alias("n_vecs"))
    )
    joined = per.join(F.broadcast(glob), "pos")
    return (
        joined.groupBy("label")
        .agg(
            F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("centroid_l2"),
            (
                F.sum(F.col("m") * F.col("g"))
                / (
                    F.sqrt(F.sum(F.col("m") * F.col("m")))
                    * F.sqrt(F.sum(F.col("g") * F.col("g")))
                )
            ).alias("cos_to_global"),
            F.sqrt(
                F.sum((F.col("m") - F.col("g")) * (F.col("m") - F.col("g")))
            ).alias("dist_to_global"),
        )
        .join(F.broadcast(n), "label")
        .select(
            "label", "n_vecs", "centroid_l2", "cos_to_global", "dist_to_global"
        )
    )


def best_split_stump(
    df: DataFrame,
    x_col: str,
    label: Column,
) -> DataFrame:
    """Best single-feature binary split (decision stump) by Gini gain:
    the threshold t maximizing
    ``gini(parent) − (n_L/n)·gini(x ≤ t) − (n_R/n)·gini(x > t)`` —
    the screening primitive behind "is this feature worth anything"
    and the root decision of every tree ensemble.

    One groupBy reduces to distinct-x blocks (value, n, positives);
    one ordered window builds prefix sums; every block boundary is a
    candidate threshold evaluated in closed form, and the argmax (ties
    → LOWEST threshold) comes from one more ordered pick. Splits with
    an empty side are excluded by construction (the last block cannot
    split). NULL x or label rows are dropped.

    The float-ranked argmax is partition-order STABLE by construction
    (unlike log-sum scores, see hbos_top's rounded rank key): every
    gain is one fixed expression tree over EXACT integer prefix
    sums — no aggregation reorder can perturb it by a ulp, so equal
    gains are exactly equal in any engine and the threshold tiebreak
    decides identically.

    Returns one row ``(n, pos_rate, gini_parent, threshold, n_left,
    n_right, pos_rate_left, pos_rate_right, gini_gain)``; NULL
    threshold/gain when fewer than 2 distinct x values exist.
    """
    from pyspark.sql.window import Window

    x = F.col(x_col).cast("double")
    y = label.cast("double")
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        x.alias("_x"), y.alias("_y")
    )
    blocks = base.groupBy("_x").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_y").alias("_p"),
    )
    w = Window.orderBy("_x").rowsBetween(Window.unboundedPreceding, 0)
    pref = blocks.select(
        "_x",
        F.sum("_n").over(w).alias("nl"),
        F.sum("_p").over(w).alias("pl"),
    )
    tot = blocks.agg(
        F.sum("_n").alias("n"),
        F.sum("_p").alias("p"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    j = pref.crossJoin(F.broadcast(tot)).where(F.col("nl") < F.col("n"))

    def gini(pos, n):
        pr = pos / n
        return F.lit(1.0) - pr * pr - (F.lit(1.0) - pr) * (F.lit(1.0) - pr)

    nl, pl = F.col("nl"), F.col("pl")
    nr = F.col("n") - nl
    pr_ = F.col("p") - pl
    gain = gini(F.col("p"), F.col("n")) - (
        nl / F.col("n") * gini(pl, nl) + nr / F.col("n") * gini(pr_, nr)
    )
    cand = j.select(
        F.col("_x").alias("threshold"),
        F.col("n"),
        F.col("p"),
        nl.alias("n_l"),
        nr.alias("n_r"),
        (pl / nl).alias("pr_l"),
        (pr_ / nr).alias("pr_r"),
        gain.alias("gain"),
    )
    best = cand.orderBy(F.desc("gain"), F.asc("threshold")).limit(1)
    empty_fallback = tot.select(
        F.col("n").cast("long").alias("n"),
        (F.col("p") / F.col("n")).alias("pos_rate"),
        (
            F.lit(1.0)
            - (F.col("p") / F.col("n")) * (F.col("p") / F.col("n"))
            - (1 - F.col("p") / F.col("n")) * (1 - F.col("p") / F.col("n"))
        ).alias("gini_parent"),
        F.lit(None).cast("double").alias("threshold"),
        F.lit(None).cast("long").alias("n_left"),
        F.lit(None).cast("long").alias("n_right"),
        F.lit(None).cast("double").alias("pos_rate_left"),
        F.lit(None).cast("double").alias("pos_rate_right"),
        F.lit(None).cast("double").alias("gini_gain"),
    ).where(F.col("n") > 0)
    found = best.select(
        F.col("n").cast("long").alias("n"),
        (F.col("p") / F.col("n")).alias("pos_rate"),
        (
            F.lit(1.0)
            - (F.col("p") / F.col("n")) * (F.col("p") / F.col("n"))
            - (1 - F.col("p") / F.col("n")) * (1 - F.col("p") / F.col("n"))
        ).alias("gini_parent"),
        F.col("threshold"),
        F.col("n_l").cast("long").alias("n_left"),
        F.col("n_r").cast("long").alias("n_right"),
        F.col("pr_l").alias("pos_rate_left"),
        F.col("pr_r").alias("pos_rate_right"),
        F.col("gain").alias("gini_gain"),
    )
    # found is empty exactly when there is < 2 distinct x: fall back
    return found.unionByName(
        empty_fallback.join(
            found.select(F.lit(1).alias("_has")), how="left_anti", on=F.lit(True)
        )
    )
