from .kmeans import (
    KMeansResult,
    assign,
    kmeans_fit,
    one_step,
    sse,
    update,
)

__all__ = [
    "KMeansResult",
    "assign",
    "kmeans_fit",
    "one_step",
    "sse",
    "update",
]
