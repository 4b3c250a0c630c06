"""Grid-bucketed DBSCAN: density clustering as equi-joins.

The density complement of K-Means (operators/kmeans.py): K-Means
carves space into K Voronoi cells and MUST label outliers; DBSCAN
(Ester et al. 1996) grows clusters from density cores and returns
noise explicitly — the right tool for "find the dense behavioral
modes and quarantine the rest" over feature pairs.

The naive algorithm needs an eps-range query per point (a quadratic
self-join at scale). The grid trick makes every range query an
EQUI-join: bucket points into eps-sized cells; any eps-neighbor of p
lies in p's cell or one of the 8 adjacent cells (2-D), so candidate
pairs come from a 9-way cell-offset equi-join — per-cell quadratic
only, the same bounded-blowup doctrine as LSH bands / entity blocks /
co-occurrence groups. Dense hub cells are the skew risk: cap or
pre-aggregate duplicates upstream if a cell exceeds memory.

Steps, all relational:
1. neighbor counts — offset-exploded self-join, filter d² ≤ eps²,
   count per point (a point neighbors itself: |N(p)| includes p).
2. classes — core (|N| ≥ min_pts), border (non-core with a core
   neighbor), noise (rest). This layer is closed-form and is the
   oracle-checked contract.
3. labels — connected components over core-core neighbor edges
   (operators/dedup_pipeline.py::connected_components — driver
   union-find small, large-star/small-star big); borders adopt the
   MINIMUM neighboring core's component (deterministic tie-break),
   noise gets -1.

Boundary caveat, documented: points at distance exactly eps are
neighbors (≤). Choose eps off your data's distance grid so
floating-point ulps cannot straddle the tie.

The reference implements only Lloyd's K-Means (SURVEY.md §2); DBSCAN
extends the rebuild's clustering family alongside mini-batch K-Means
and the MLlib bridges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _neighbor_pairs(
    df: DataFrame, x_col: str, y_col: str, id_col: str, *, eps: float
) -> DataFrame:
    """Candidate-pruned neighbor pairs ``(id, nid, d2)`` including the
    self-pair — one 9-offset equi-join on cell keys."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    pts = df.select(
        F.col(id_col).alias("id"),
        x.alias("x"),
        y.alias("y"),
        F.floor(x / eps).alias("cx"),
        F.floor(y / eps).alias("cy"),
    )
    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in _OFFSETS
            ]
        )
    ).alias("o")
    left = pts.select("id", "x", "y", "cx", "cy", off).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = pts.select(
        F.col("id").alias("nid"),
        F.col("x").alias("nx"),
        F.col("y").alias("ny"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dx = F.col("x") - F.col("nx")
    dy = F.col("y") - F.col("ny")
    d2 = dx * dx + dy * dy
    return (
        left.join(right, ["jx", "jy"])
        .withColumn("d2", d2)
        .where(F.col("d2") <= eps * eps)
        .select("id", "nid", "d2")
    )


def dbscan_classes(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    *,
    eps: float,
    min_pts: int,
    pairs_df: DataFrame | None = None,
) -> DataFrame:
    """Per-point DBSCAN role: ``(id, n_neighbors, cls)`` with cls in
    {'core', 'border', 'noise'}. ``id_col`` must be unique.

    ``pairs_df``: optionally a precomputed ``(id, nid)`` neighbor-pair
    relation (the :func:`_neighbor_pairs` output, same ``eps``) — lets
    :func:`dbscan` build the grid join ONCE and share it between the
    role pass and the labeling passes. The caller owns its
    materialization."""
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    pairs = (
        pairs_df
        if pairs_df is not None
        else _neighbor_pairs(df, x_col, y_col, id_col, eps=eps)
    )
    counts = pairs.groupBy("id").agg(F.count("*").alias("n_neighbors"))
    core = counts.where(F.col("n_neighbors") >= min_pts).select(
        F.col("id").alias("nid")
    )
    has_core_nb = (
        pairs.where(F.col("id") != F.col("nid"))
        .join(core, "nid", "left_semi")
        .select("id")
        .distinct()
        .withColumn("_hc", F.lit(1))
    )
    return (
        counts.join(has_core_nb, "id", "left")
        .select(
            "id",
            "n_neighbors",
            F.when(F.col("n_neighbors") >= min_pts, "core")
            .when(F.col("_hc").isNotNull(), "border")
            .otherwise("noise")
            .alias("cls"),
        )
    )


def dbscan(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    *,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """Full DBSCAN labels: ``(id, n_neighbors, cls, cluster)`` where
    cluster is the minimum core id of the point's component (-1 for
    noise). Borders reachable from several clusters adopt the MINIMUM
    neighboring core's cluster — a deterministic resolution of
    DBSCAN's classic order-dependent border tie."""
    from .dedup_pipeline import connected_components

    # build the 9-offset grid join ONCE and pin it: the role pass, the
    # core-core edge list, and the border adoption each consumed their
    # own copy before (the round-9 plan re-ran the offset explode +
    # join 4x — 54 exchanges); d2 is filter-only, so only (id, nid)
    # is materialized (guide §5 / §2.3)
    pairs = (
        _neighbor_pairs(df, x_col, y_col, id_col, eps=eps)
        .select("id", "nid")
        .localCheckpoint(eager=True)
    )
    # classes is consumed twice below (core set + final projection)
    classes = dbscan_classes(
        df, x_col, y_col, id_col, eps=eps, min_pts=min_pts, pairs_df=pairs
    ).localCheckpoint(eager=True)
    core_ids = classes.where(F.col("cls") == "core").select("id")
    core_edges = (
        pairs.where(F.col("id") < F.col("nid"))
        .join(core_ids, "id", "left_semi")
        .join(
            core_ids.select(F.col("id").alias("nid")), "nid", "left_semi"
        )
        .select(F.col("id").alias("id_a"), F.col("nid").alias("id_b"))
    )
    comp = connected_components(core_edges)  # (id, component)
    core_lbl = (
        core_ids.join(comp, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("cluster"),
        )
    )  # isolated cores (possible when min_pts == 1) form singletons
    border_lbl = (
        pairs.where(F.col("id") != F.col("nid"))
        .join(
            core_lbl.select(
                F.col("id").alias("nid"), F.col("cluster").alias("_c")
            ),
            "nid",
        )
        .groupBy("id")
        .agg(F.min("_c").alias("_bcluster"))
    )
    return (
        classes.join(core_lbl.select("id", "cluster"), "id", "left")
        .join(border_lbl, "id", "left")
        .select(
            "id",
            "n_neighbors",
            "cls",
            F.when(F.col("cls") == "core", F.col("cluster"))
            .when(F.col("cls") == "border", F.col("_bcluster"))
            .otherwise(F.lit(-1))
            .alias("cluster"),
        )
    )
