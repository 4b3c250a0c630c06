"""Vector expression builders — the engine's scalar-function layer.

Reference parity: O9 — the reference's only scalar function is the 2-D
euclidean distance ``sqrt((x1-x2)^2 + (y1-y2)^2)`` (mapper.py:62). Here
it generalizes to n-D over ``array<double>`` columns using higher-order
built-ins (``zip_with`` + ``aggregate``), which stay JVM-side inside
whole-stage codegen — no Python UDF in the hot path.

All builders return Column expressions so Catalyst can constant-fold the
literal-centroid variants and keep the whole assign stage narrow (zero
shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def sq_dist_expr(a: Column, b: Column) -> Column:
    """Squared euclidean distance between two array<double> columns.

    zip_with pairs elements; aggregate folds the squared diffs. Matches
    the reference's distance (mapper.py:62) without the sqrt — arg-min
    over squared distance picks the same centroid and skips K sqrts/row.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_dist_to_literal(features: Column, centroid: Sequence[float]) -> Column:
    """Squared distance from an array column to a Python-side centroid.

    The centroid literal is folded into the plan — the Spark analogue of
    the reference broadcasting all centroids inside every MapRequest
    (O7, master.py:59,68), minus the per-RPC re-serialization.
    """
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return sq_dist_expr(features, lit)


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array<double>/array<float> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_expr(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero."""
    denom = l2_norm_expr(a) * l2_norm_expr(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def argmin_centroid(
    features: Column, centroids: Sequence[tuple[int, Sequence[float]]]
) -> tuple[Column, Column]:
    """(closest centroid id, its squared distance) for each row.

    Implements O8 — the reference's broadcast nested-loop assign
    (mapper.py:42-49, 58-66) — as a single narrow projection: build the
    K-element distance array, take ``array_min``, find its first position.
    First position == lowest centroid id on ties, matching the
    reference's strict ``<`` tie-break (mapper.py:63).

    ``centroids`` must be sorted by id ascending; ids may be arbitrary
    ints (the reference uses 1-based dense ids, master.py:59).

    No shuffle, no join: for K centroids this is K fused expressions in
    one whole-stage-codegen projection. At 100 TB this is the difference
    between a map-only stage and a cross-join + window shuffle.
    """
    ordered = sorted(centroids, key=lambda c: c[0])
    # One array of (dist, cid) structs; array_min's struct ordering is
    # (d asc, cid asc) — the arg-min AND the lowest-id tie-break in a
    # single pass over a single distance computation. (The alternative
    # array_min + array_position formulation re-evaluates the K-distance
    # array per output column — interpreted Projects do no CSE across
    # higher-order functions — and measured 6-12× slower at 640k×64-D.)
    structs = F.array(
        *[
            F.struct(
                sq_dist_to_literal(features, vec).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, vec in ordered
        ]
    )
    # Null/partial vectors make every distance null; dropping null-d
    # structs makes array_min return null → null cid, never an
    # arbitrary centroid.
    m = F.array_min(F.filter(structs, lambda s: s["d"].isNotNull()))
    return m["cid"], m["d"]
