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
