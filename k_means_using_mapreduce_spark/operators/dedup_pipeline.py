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

Connected components run as iterative label propagation (alternating
small-parent joins) — O(diameter) Spark jobs. Duplicate-cluster
diameters are tiny in practice (pairs or small cliques), so the loop
converges in 2-3 iterations; ``max_iter`` bounds adversarial chains.
Each iteration shuffles only (id, label) pairs — 16 B rows — never
documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import jaccard_pairs, minhash_candidate_pairs


def connected_components(
    pairs: DataFrame, max_iter: int = 10, driver_threshold: int = 1_000_000
) -> DataFrame:
    """Union-find over an undirected edge list ``(id_a, id_b)``.
    Returns (id, component) where component is the minimum id reachable.

    Two regimes:

    - ``≤ driver_threshold`` edges (counted on the already-materialized
      edge list): collect the 16 B/row pairs and run path-compressed
      union-find on the driver — O(E α(E)) in one process, replacing
      O(diameter) Spark jobs. Duplicate-pair graphs are tiny relative
      to the corpus (edges ≪ N after LSH+verify), so this is the common
      case even at 100 TB of documents; only edge *pairs* are ever
      collected, never rows.
    - larger graphs: distributed label propagation (min-label joins),
      O(diameter) rounds, each shuffling only (id, label) pairs.
    """
    # localCheckpoint materializes AND truncates lineage — without it
    # every propagation round re-executes the upstream candidate/verify
    # plan (minhash + jaccard joins), turning an O(diameter) loop into
    # O(diameter × full-pipeline) work (observed 8 min → ~40 s on the
    # test corpus).
    distinct_pairs = pairs.select("id_a", "id_b").distinct().localCheckpoint()
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
        return pairs.sparkSession.createDataFrame(
            rows, "id long, component long"
        )

    edges = (
        distinct_pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(
            distinct_pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_iter):
        # each node adopts the min label among itself and neighbors;
        # the `changed` flag rides along so convergence detection needs
        # no second join against the previous labels
        neighbor_labels = (
            edges.join(
                labels.withColumnRenamed("id", "dst").withColumnRenamed("component", "n_comp"),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("n_comp").alias("min_neighbor"))
        )
        updated = (
            labels.join(neighbor_labels.withColumnRenamed("src", "id"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("min_neighbor"), F.col("component")),
                ).alias("new_component"),
                (
                    F.coalesce(F.col("min_neighbor"), F.col("component"))
                    < F.col("component")
                ).alias("changed"),
            )
        ).localCheckpoint()
        changed = updated.filter("changed").limit(1).count()
        labels = updated.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return labels


def near_dedup(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Full near-dedup: returns the *surviving* rows of ``df`` (lowest
    id per duplicate component plus all non-duplicated rows), with a
    ``dup_group_size`` column (1 for unique docs)."""
    # shingle once, share between candidate generation and verification
    # (the two stages otherwise re-tokenize every document); the
    # materialized relation is (id, shingle) — strings, pre-hash
    from .dedup import shingle_rows

    sh_all = shingle_rows(df, content_col, id_col, shingle_n).localCheckpoint()
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
