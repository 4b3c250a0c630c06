"""Structured Streaming versions of the engine's operators.

The reference is batch-only (SURVEY.md §2: "Streaming: none"); this is
the idiomatic Spark extension: the *same* narrow assign expression runs
unchanged on a streaming DataFrame (stateless projection), and cluster
statistics become windowed aggregations with watermarked late-data
handling.

Scale notes: `streaming_assign` is stateless — no state store, scales
with input rate. The windowed stats keep one state row per
(window, cid); with K clusters and minute windows that is trivially
small, and the watermark bounds state growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.kmeans import Centroids, assign


def streaming_assign(
    stream: DataFrame, centroids: Centroids, features_col: str = "features"
) -> DataFrame:
    """Nearest-centroid assignment on a streaming DataFrame — identical
    expression to the batch operator (operators/kmeans.py); Spark runs
    it incrementally because it is a stateless projection."""
    return assign(stream, centroids, features_col, keep_dist=True)


def streaming_cluster_counts(
    stream: DataFrame, centroids: Centroids, features_col: str = "features"
) -> DataFrame:
    """Running cluster-size counts (complete-mode aggregation)."""
    return (
        streaming_assign(stream, centroids, features_col)
        .groupBy("cid")
        .agg(F.count("*").alias("n"), F.avg("sq_dist").alias("mse"))
    )


def windowed_cluster_stats(
    stream: DataFrame,
    centroids: Centroids,
    ts_col: str = "ts",
    features_col: str = "features",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-event-time-window cluster statistics with late-data handling:
    watermarked tumbling windows over the assigned stream. Output is
    append-able to any sink once the watermark passes the window end."""
    assigned = streaming_assign(stream, centroids, features_col)
    return (
        assigned.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("cid"))
        .agg(F.count("*").alias("n"), F.avg("sq_dist").alias("mse"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cid",
            "n",
            "mse",
        )
    )
