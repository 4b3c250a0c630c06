"""Cross-group set-overlap analysis: pairwise shingle containment /
Jaccard between document groups (sources, snapshots, train vs eval
mixtures) — the contamination matrix a data-mixing pipeline checks
before blending corpora.

``decontaminate`` (operators/cleaning.py) answers "which DOCUMENTS
overlap a benchmark"; this module answers the coarser mixing question
"how much of source A is already inside source B" for every pair at
once, from one shingle pass.

Scale shape: the corpus collapses to DISTINCT ``(group, shingle)``
rows first — 8 B md5-int60 shingle keys (operators/dedup.py:51), never
shingle strings — so the self-join that follows is keyed on the hash
and each shingle contributes at most |groups-containing-it|² pair
rows. With G groups (sources/splits: tens, not millions) the worst
case is |shingle types|·G² tiny rows, map-side combined down to the
G×G matrix. Group sizes join back via broadcast (G rows). Nothing
document-sized shuffles after the first distinct.

This is GROUP-pairwise, not document-pairwise: G is assumed small
(≲10³). For document-level near-dup use the banded LSH pipeline
(operators/dedup.py) — an unbanded self-join at document granularity
is exactly the quadratic blow-up this engine refuses to run.

Reference scope: extension surface; the reference engine
(master.py:27-150) has no text/set operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles
from .dedup import md5_int60


def group_shingle_sets(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct ``(grp, sh)`` rows: each group's shingle SET, with
    shingles as md5-int60 hashes. The distinct is the only
    corpus-sized shuffle in the module."""
    from ..sources.loaders import fan_out

    # fan_out first: tokenize/shingle/md5 is the dominant per-row CPU
    # and a single-row-group scan would run it on one core (guide §2.5)
    return (
        fan_out(df.select(F.col(group_col).alias("grp"), F.col(text_col)))
        .select(
            "grp",
            F.explode(shingles(F.col(text_col), n)).alias("_s"),
        )
        .select("grp", md5_int60(F.col("_s")).alias("sh"))
        .distinct()
    )


def pairwise_overlap(sets: DataFrame) -> DataFrame:
    """Upper-triangle overlap matrix from :func:`group_shingle_sets`
    output: ``(grp_a, grp_b, size_a, size_b, inter, jaccard,
    containment_a_in_b, containment_b_in_a)`` for every pair with at
    least one shared shingle (disjoint pairs are absent — the matrix
    is sparse by construction).

    containment_a_in_b = |A∩B| / |A|: the fraction of A's shingle
    vocabulary already present in B — the directional contamination
    signal (a small benchmark fully contained in a big crawl has
    containment 1.0 at negligible Jaccard).
    """
    # three consumers (both self-join sides + sizes) would each re-run
    # the corpus-sized shingle distinct — materialize the (grp, sh)
    # hash set once (guide §5: reuse that beats recompute; the set is
    # 16 B/row, orders smaller than the corpus)
    sets = sets.localCheckpoint(eager=True)
    a = sets.select(F.col("grp").alias("grp_a"), "sh")
    b = sets.select(F.col("grp").alias("grp_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sets.groupBy("grp").agg(F.count("*").alias("size"))
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("grp").alias("grp_a"),
                                     F.col("size").alias("size_a"))),
            "grp_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("grp").alias("grp_b"),
                                     F.col("size").alias("size_b"))),
            "grp_b",
        )
    )
    i_d = F.col("inter").cast("double")
    return out.select(
        "grp_a",
        "grp_b",
        "size_a",
        "size_b",
        "inter",
        (i_d / (F.col("size_a") + F.col("size_b") - F.col("inter"))
         ).alias("jaccard"),
        (i_d / F.col("size_a")).alias("containment_a_in_b"),
        (i_d / F.col("size_b")).alias("containment_b_in_a"),
    )


def overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Convenience composition: shingle sets → pairwise matrix."""
    return pairwise_overlap(group_shingle_sets(df, group_col, text_col, n))
