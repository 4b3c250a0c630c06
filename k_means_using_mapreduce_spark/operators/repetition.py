"""Repetition & novelty quality signals — Gopher-style filters.

Large-scale pipelines (Rae et al. 2021 "Gopher" §A1.1, Penedo et al.
2023 RefinedWeb) drop documents dominated by repeated n-grams; the
complementary corpus-level signal is novelty (how much of a document's
content appears nowhere else). The reference engine has no string ops
at all (SURVEY.md §2) — these extend the text-analysis family.

Both operators are RELATIONAL on purpose: per-row higher-order-function
formulations (count duplicates inside the token array per row) are
O(tokens × distinct) per document — fine at 128 tokens, quadratic death
on real web documents. The explode → groupBy shape is linear, gets
map-side partial aggregation for free, and shuffles (id, gram-hash)
pairs, never document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_of, tokens
from .dedup import md5_int60


def repetition_stats(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram repetition profile:

    - ``n_grams``        total n-gram occurrences
    - ``distinct_grams`` distinct n-grams
    - ``dup_gram_frac``  (total − distinct) / total — the Gopher
      "duplicate n-gram fraction" cut signal
    - ``top_gram_frac``  occurrences of the most frequent n-gram / total
      — the "top n-gram fraction" cut signal
    - ``top_gram``       that n-gram (ties → lexicographically first,
      deterministic on both engines)

    Documents with no tokens have no n-grams and are absent from the
    output (no repetition signal exists for them). All ratios are
    single divisions of exact integers — engine-stable.

    Plan shape: Generate (explode) → two hash aggregations keyed
    (id, gram) then (id). Both aggregations partial-combine map-side;
    nothing wider than one shuffle of (id, gram, count) rows.
    """
    from ..sources.loaders import fan_out

    grams = fan_out(
        df.select(F.col(id_col).alias(id_col), F.col(content_col))
    ).select(
        F.col(id_col).alias(id_col), tokens(content_col).alias("_toks")
    ).select(id_col, F.explode(shingles_of(F.col("_toks"), n)).alias("gram"))
    counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    return counts.groupBy(id_col).agg(
        F.sum("c").cast("int").alias("n_grams"),
        F.count("*").cast("int").alias("distinct_grams"),
        (
            (F.sum("c") - F.count("*")).cast("double") / F.sum("c")
        ).alias("dup_gram_frac"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_gram_frac"),
        F.min_by("gram", F.struct((-F.col("c")).alias("nc"), F.col("gram"))).alias(
            "top_gram"
        ),
    )


def heavy_hitter_grams(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 20,
    max_items_tracked: int = 100_000,
) -> DataFrame:
    """Corpus-wide approximate top-k n-grams — the boilerplate
    detector that feeds ``max_doc_freq``-style caps: the n-grams that
    dominate a crawl (navigation chrome, license headers) surface here
    without a full exact count.

    Uses Spark's ``approx_top_k`` sketch aggregate: one pass, mergeable
    per-partition sketches of ``max_items_tracked`` counters, no
    shuffle of the full (gram, count) space — the exact groupBy would
    shuffle every distinct n-gram in the corpus (at 100 TB that IS the
    job). Counts are exact for items whose frequency exceeds the
    sketch's tracking floor; test pinned against the exact top-k on
    data where all items are tracked.

    Output: ``(gram, approx_count, rank)``, rank 1 = most frequent,
    ties broken by gram for determinism.
    """
    from ..sources.loaders import fan_out

    grams = fan_out(df.select(F.col(content_col))).select(
        tokens(content_col).alias("_t")
    ).select(
        F.explode(shingles_of(F.col("_t"), n)).alias("gram")
    )
    sketch = grams.agg(
        F.expr(f"approx_top_k(gram, {int(k)}, {int(max_items_tracked)})").alias("tk")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("approx_count"), F.asc("gram"))
    return (
        sketch.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("gram"),
            F.col("e.count").alias("approx_count"),
        )
        .withColumn("rank", F.row_number().over(w))
    )


def shingle_novelty(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Corpus-level novelty: the fraction of each document's DISTINCT
    shingles that occur in no other document (``novel_frac``), plus the
    distinct-shingle count. The cross-document complement of
    :func:`repetition_stats` — low novelty + high corpus frequency is
    boilerplate; high novelty is unique content worth keeping.

    Scale shape: the corpus-wide shingle frequency is a COUNT window
    partitioned on the 60-bit md5 hash of the shingle (8 B shuffle
    keys, never shingle strings — same doctrine as operators/dedup.py);
    one shuffle on the hash replaces the aggregate-then-join-back form
    (measured ~30% faster at sf0.1, one less exchange). A shingle that
    appears in a huge fraction of documents makes its hash partition
    hot — that is boilerplate by definition, and the mitigation is the
    same ``max_doc_freq``-style cap as ``operators/dedup.py`` applies
    before its quadratic step. Every step is linear in corpus size.
    """
    from pyspark.sql import Window

    from ..sources.loaders import fan_out

    pairs = (
        fan_out(df.select(F.col(id_col).alias(id_col), F.col(content_col)))
        .select(F.col(id_col).alias(id_col), tokens(content_col).alias("_toks"))
        .select(
            id_col, F.explode(shingles_of(F.col("_toks"), shingle_n)).alias("sh")
        )
        .select(id_col, md5_int60(F.col("sh")).alias("h"))
        .distinct()
    )
    n_docs = F.count("*").over(Window.partitionBy("h"))
    return (
        pairs.withColumn("n_docs", n_docs)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("distinct_shingles"),
            (
                F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias("novel_frac"),
        )
    )
