from .kmeans_stream import (
    streaming_assign,
    streaming_cluster_counts,
    windowed_cluster_stats,
)

__all__ = [
    "streaming_assign",
    "streaming_cluster_counts",
    "windowed_cluster_stats",
]
