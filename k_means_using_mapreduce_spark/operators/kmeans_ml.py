"""MLlib fast path — the 100 TB-scale K-Means.

Thin wrapper over ``pyspark.ml.clustering.KMeans`` exposing the same
result shape as :mod:`.kmeans`'s DataFrame loop. MLlib's implementation
is the production path at scale: k-means|| parallel init (vs the
reference's driver-side ``random.sample``, master.py:34), JVM-native
distance kernels with norm-based pruning, and DataFrame-native I/O.

The hand-rolled loop in :mod:`.kmeans` exists because it is the faithful
re-expression of the reference's semantics (fixed init, by-id
convergence, keep-old-centroid) and is SQL-oracle-checkable stage by
stage; this wrapper is what a user should call on a real cluster.
Parity between the two (same SSE within tolerance on the same init) is
asserted in tests/test_kmeans.py.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import KMeansResult, sse as _sse


def kmeans_fit_ml(
    df: DataFrame,
    k: int,
    *,
    seed: int = 42,
    max_iter: int = 20,
    tol: float = 1e-4,
    features_col: str = "features",
    init_mode: str = "k-means||",
) -> KMeansResult:
    """Fit MLlib KMeans on an ``array<double>`` features column and
    return centroids in this engine's ``(cid, vector)`` form with
    1-based dense ids (matching reference master.py:59)."""
    work = df.select(
        array_to_vector(F.col(features_col).cast("array<double>")).alias("_fvec")
    )
    model = (
        KMeans(k=k, seed=seed, maxIter=max_iter, tol=tol, initMode=init_mode)
        .setFeaturesCol("_fvec")
        .fit(work)
    )
    centroids = [
        (i + 1, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())
    ]
    sizes = {i + 1: int(n) for i, n in enumerate(model.summary.clusterSizes)}
    total_sse = float(
        _sse(df.select(F.col(features_col).cast("array<double>").alias("features")),
             centroids).first()["sse"]
    )
    return KMeansResult(
        centroids=centroids,
        iterations=model.summary.numIter,
        converged=model.summary.numIter < max_iter,
        sse=total_sse,
        cluster_sizes=sizes,
    )
