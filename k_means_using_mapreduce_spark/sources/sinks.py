"""Output connectors.

Reference parity: O16 — the reducer writes one centroid per call with
mode ``'w'`` inside a loop (reducer.py:56-58), so the output file retains
only the *last* centroid (confirmed by the 1-line golden
Data/Reducers/reducer_1_output.txt). The rebuild implements the intended
semantics: all centroids persisted, atomically, via Spark's committer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_centroids_csv(centroids: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a ``(cid, features: array<double>)`` centroid relation as
    CSV ``cid,x1,x2,...`` — the corrected O16 sink."""
    dim = len(centroids.select("features").first()["features"])
    flat = centroids.select(
        "cid", *[F.col("features")[i].alias(f"c{i}") for i in range(dim)]
    ).orderBy("cid")
    flat.coalesce(1).write.mode(mode).option("header", "true").csv(path)


def write_assignments_parquet(
    assigned: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist an assignment relation partitioned by cluster id.

    The scale-aware replacement for the reference's per-reducer text
    partition files (mapper.py:68-71): ``partitionBy('cid')`` gives
    partition-pruned reads for per-cluster consumers (e.g. the IVF
    probe scan reads only the probed buckets)."""
    assigned.write.mode(mode).partitionBy("cid").parquet(path)
