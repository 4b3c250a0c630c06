from .vectors import (
    argmin_centroid,
    cosine_similarity_expr,
    dot_expr,
    l2_norm_expr,
    sq_dist_expr,
    sq_dist_to_literal,
)

__all__ = [
    "argmin_centroid",
    "cosine_similarity_expr",
    "dot_expr",
    "l2_norm_expr",
    "sq_dist_expr",
    "sq_dist_to_literal",
]
