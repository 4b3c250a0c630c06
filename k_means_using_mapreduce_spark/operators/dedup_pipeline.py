"""End-to-end near-dedup pipeline: candidates → exact verify →
connected components → one representative per duplicate group.

The shape every large-scale training-data dedup runs:

1. **candidates** — MinHash-LSH banding (dedup.py), per-bucket
   quadratic only;
2. **verify** — exact n-gram Jaccard on candidate pairs (cheap: the
   candidate set is tiny relative to N²);
3. **group** — connected components over the verified-pair graph, so
   transitive duplicates (A≈B≈C with A~C below threshold) still
   collapse to one group;
4. **pick** — keep the lowest id per component (deterministic), drop
   the rest.

Connected components run driver-side (union-find) on small edge lists
and as alternating large-star/small-star contraction (Kiveris et al.
SoCC'14) above the threshold — O(log diameter) Spark rounds, so even
adversarial chains converge fast. Each round shuffles only id pairs —
never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from .dedup import jaccard_pairs, minhash_candidate_pairs


def _canon_edges(e: DataFrame) -> DataFrame:
    """Canonicalize an edge list to distinct ``(u > v)`` pairs, dropping
    self-loops. Both star operations preserve this invariant."""
    return (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14): every node connects its LARGER neighbors to
    the minimum of its neighborhood (incl. itself). Halves long chains."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    out = (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _canon_edges(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: every node connects its smaller-or-equal neighbors
    (and itself) to its minimum neighbor. Input must be canonical
    ``u > v``, so ``min(v) < u`` always."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        edges.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
    )
    return _canon_edges(out)


def connected_components(
    pairs: DataFrame, max_iter: int = 20, driver_threshold: int = 1_000_000
) -> DataFrame:
    """Union-find over an undirected edge list ``(id_a, id_b)``.
    Returns (id, component) where component is the minimum id reachable.
    The output id/component types mirror the input ``id_a`` type
    (long doc ids and string ids both work — ADVICE r2).

    Two regimes:

    - ``≤ driver_threshold`` edges (counted on the already-materialized
      edge list): collect the 16 B/row pairs and run path-compressed
      union-find on the driver — O(E α(E)) in one process, replacing
      iterative Spark jobs. Duplicate-pair graphs are tiny relative
      to the corpus (edges ≪ N after LSH+verify), so this is the common
      case even at 100 TB of documents; only edge *pairs* are ever
      collected, never rows.
    - larger graphs: alternating large-star/small-star rounds (Kiveris
      et al. SoCC'14) — converges in O(log diameter) rounds where plain
      min-label propagation needs O(diameter), so adversarial chains
      (a path graph from sequential doc ids) cost ~log₂(d) shuffles,
      not d. Each round shuffles only id pairs, never documents.
    """
    # localCheckpoint materializes AND truncates lineage — without it
    # every propagation round re-executes the upstream candidate/verify
    # plan (minhash + jaccard joins), turning an iterative loop into
    # O(rounds × full-pipeline) work (observed 8 min → ~40 s on the
    # test corpus).
    distinct_pairs = pairs.select("id_a", "id_b").distinct().localCheckpoint()
    id_type = distinct_pairs.schema["id_a"].dataType
    out_schema = StructType(
        [StructField("id", id_type), StructField("component", id_type)]
    )
    n_edges = distinct_pairs.count()
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for row in distinct_pairs.collect():
            a, b = row["id_a"], row["id_b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = [(x, find(x)) for x in parent]
        return _k_row_df(pairs.sparkSession, rows, out_schema)

    all_nodes = (
        distinct_pairs.select(F.col("id_a").alias("id"))
        .union(distinct_pairs.select(F.col("id_b").alias("id")))
        .distinct()
    ).localCheckpoint()
    edges = _canon_edges(
        distinct_pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    ).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        # order-independent signature: stable ⇒ the star-contraction
        # fixpoint is reached (stars only — every u points at its root)
        sig = edges.agg(
            F.count("*").alias("n"),
            # XOR fold: order-independent and overflow-free under ANSI
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).first()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # at the fixpoint every edge is (member, root); roots and isolated
    # (self-loop-only) nodes label themselves
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return (
        all_nodes.join(labels, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )


def near_dedup(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Full near-dedup: returns the *surviving* rows of ``df`` (lowest
    id per duplicate component plus all non-duplicated rows), with a
    ``dup_group_size`` column (1 for unique docs).

    ``shingles_df``: optionally a precomputed ``(id, sh)`` string
    shingle relation for ``df`` (same ``shingle_n``) — lets a larger
    pipeline (operators/pipeline.py) tokenize the corpus ONCE and share
    the relation across near-dedup and decontamination. The caller owns
    its materialization; when None, it is computed and localCheckpointed
    here."""
    # shingle once, share between candidate generation and verification
    # (the two stages otherwise re-tokenize every document); the
    # materialized relation is (id, shingle) — strings, pre-hash
    from .dedup import shingle_rows

    sh_all = (
        shingles_df
        if shingles_df is not None
        else shingle_rows(df, content_col, id_col, shingle_n).localCheckpoint()
    )
    candidates = minhash_candidate_pairs(
        df, content_col, id_col, num_hashes, bands, shingle_n, shingles_df=sh_all
    )
    # exact verification restricted to candidate pairs: jaccard on the
    # candidate-doc subset of the shared shingle relation
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = df.join(cand_ids, id_col, "left_semi")
    verified = jaccard_pairs(
        cand_docs,
        content_col,
        id_col,
        shingle_n,
        jaccard_threshold,
        shingles_df=sh_all.join(cand_ids, id_col, "left_semi"),
    )
    verified = verified.join(
        candidates, ["id_a", "id_b"], "left_semi"
    )  # only LSH-candidate pairs count (keeps the scale contract honest)

    # connected_components materializes its distinct pair list itself
    # (localCheckpoint) — no extra barrier needed here
    comps = connected_components(verified.select("id_a", "id_b"))
    groups = comps.groupBy("component").agg(
        F.min("id").alias("keep_id"), F.count("*").alias("dup_group_size")
    )
    member_to_keep = comps.join(groups, "component").select(
        F.col("id").alias(id_col), "keep_id", "dup_group_size"
    )
    survivors_in_groups = member_to_keep.filter(F.col(id_col) == F.col("keep_id"))
    dropped = member_to_keep.filter(F.col(id_col) != F.col("keep_id")).select(id_col)

    kept = df.join(dropped, id_col, "left_anti")
    return kept.join(
        survivors_in_groups.select(id_col, "dup_group_size"), id_col, "left"
    ).withColumn("dup_group_size", F.coalesce(F.col("dup_group_size"), F.lit(1)))


def pick_representatives(
    df: DataFrame,
    components: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str,
    higher_is_better: bool = True,
) -> DataFrame:
    """Choose each duplicate group's surviving document by QUALITY
    instead of the default min-id: given the near-dedup component
    labeling (``connected_components`` output: (id, component)), keep
    the member with the best ``score_col`` (ties → lowest id, so the
    choice is total and deterministic). Documents in no component
    (never matched anything) survive unchanged.

    Production near-dedup keeps the longest/cleanest copy, not an
    arbitrary one — boilerplate-stripped originals beat truncated
    mirrors. One window over the component key (components are tiny;
    the join back to df is by id).
    """
    from pyspark.sql.window import Window

    order = [
        F.col(score_col).desc() if higher_is_better else F.col(score_col).asc(),
        F.col(id_col).asc(),
    ]
    comp = components.withColumnRenamed("id", id_col)
    # rank ONLY the rows that belong to a component: a single window
    # over the left-joined corpus would funnel every unmatched document
    # (component = NULL — the vast majority) into one partition of the
    # window sort. Members are few (components relation), so the ranked
    # leg is small; the untouched majority passes through an anti-join.
    members = df.join(comp, id_col)
    w = Window.partitionBy("component").orderBy(*order)
    winners = (
        members.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk", "component")
    )
    untouched = df.join(comp.select(id_col), id_col, "left_anti")
    return untouched.unionByName(winners)
