from .kmeans import (
    KMeansResult,
    assign,
    kmeans_fit,
    kmeans_fit_minibatch,
    one_step,
    sse,
    update,
)

__all__ = [
    "KMeansResult",
    "assign",
    "kmeans_fit",
    "kmeans_fit_minibatch",
    "one_step",
    "sse",
    "update",
]
