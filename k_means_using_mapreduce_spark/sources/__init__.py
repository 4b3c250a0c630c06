from .loaders import (
    TABLES,
    load_table,
    points_to_features,
    read_points_csv,
    read_points_files,
    validate_kmeans_input,
)
from .sinks import write_centroids_csv

__all__ = [
    "TABLES",
    "load_table",
    "points_to_features",
    "read_points_csv",
    "read_points_files",
    "validate_kmeans_input",
    "write_centroids_csv",
]
