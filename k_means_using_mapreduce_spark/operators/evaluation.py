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
