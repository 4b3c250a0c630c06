"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003
— the MOSS algorithm).

Complements the MinHash/SimHash family in operators/dedup.py: MinHash
estimates whole-document resemblance; winnowing guarantees that any
shared contiguous run of at least ``window + k - 1`` tokens between two
documents produces at least one IDENTICAL selected fingerprint in both
(the paper's local-containment guarantee). That makes it the standard
tool for partial-overlap detection — plagiarism, quote lifting,
template reuse — where resemblance-style signatures dilute.

Relational formulation: k-gram hashes with positions via
``posexplode`` → per-document sliding-window MIN (window frame, no
self-join) → DISTINCT selected hashes. One shuffle on the document id;
the per-document sequential pass is irreducible (the window is defined
over token order), so documents are the parallelism unit — exactly
right at corpus scale where documents vastly outnumber cores. Selected
fingerprints are 60-bit ints (8 B), ~2/(window+1) of the k-gram count
per the paper's expected density, so the fingerprint relation is a
small fraction of the shingle relation that feeds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.loaders import fan_out as _fan_out

from ..functions.text import shingles_of, tokens
from .dedup import md5_int60


def winnow_fingerprints(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Distinct selected fingerprints per document: ``(id, fp)``.

    Each position i (1-based) among a document's n k-gram hashes opens
    a window [i, i+window-1]; the window's MIN hash is selected. Only
    full windows count (i ≤ n−window+1), except that a document with
    fewer than ``window`` k-grams contributes its single all-hash
    minimum so no non-empty document fingerprints to nothing.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    grams = (
        _fan_out(df.select(F.col(id_col).alias(id_col), F.col(content_col)))
        .select(F.col(id_col).alias(id_col), tokens(content_col).alias("_t"))
        .select(
            id_col,
            F.posexplode(shingles_of(F.col("_t"), k)).alias("i", "sh"),
        )
        .select(id_col, (F.col("i") + 1).alias("i"), md5_int60("sh").alias("h"))
    )
    frame = (
        Window.partitionBy(id_col).orderBy("i").rowsBetween(0, window - 1)
    )
    whole = Window.partitionBy(id_col)
    return (
        grams.withColumn("fp", F.min("h").over(frame))
        .withColumn("_n", F.count("*").over(whole))
        .where(F.col("i") <= F.greatest(F.lit(1), F.col("_n") - F.lit(window - 1)))
        .select(id_col, "fp")
        .distinct()
    )


def winnow_summary(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Per-document fingerprint profile in ONE pass over the gram
    relation: ``(id, n_grams, n_fingerprints, density)``.

    Shares the window computation with :func:`winnow_fingerprints`
    (total gram count rides along as the partition COUNT window) and
    aggregates ``count(DISTINCT fp)`` + ``max(n)`` per document —
    no second tokenization pass, no join back to the input. (The
    naive form — ``size(shingles_of(tokens(text)))`` joined to the
    fingerprint counts — re-evaluates the shingle HOF in both the
    pushed-down filter and the projection and re-scans the corpus:
    measured 7.7 s vs 1.6 s for this formulation at sf0.1.)
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    grams = (
        _fan_out(df.select(F.col(id_col).alias(id_col), F.col(content_col)))
        .select(F.col(id_col).alias(id_col), tokens(content_col).alias("_t"))
        .select(
            id_col,
            F.posexplode(shingles_of(F.col("_t"), k)).alias("i", "sh"),
        )
        .select(id_col, (F.col("i") + 1).alias("i"), md5_int60("sh").alias("h"))
    )
    frame = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, window - 1)
    whole = Window.partitionBy(id_col)
    return (
        grams.withColumn("fp", F.min("h").over(frame))
        .withColumn("_n", F.count("*").over(whole))
        .where(F.col("i") <= F.greatest(F.lit(1), F.col("_n") - F.lit(window - 1)))
        .groupBy(id_col)
        .agg(
            F.max("_n").cast("int").alias("n_grams"),
            F.count_distinct("fp").cast("int").alias("n_fingerprints"),
        )
        .withColumn(
            "density", F.col("n_fingerprints").cast("double") / F.col("n_grams")
        )
    )


def winnow_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` selected fingerprints:
    ``(id_a, id_b, n_shared)`` with id_a < id_b.

    Equi-join on the 8 B fingerprint key — per-fingerprint fan-out is
    bounded by how many documents share that exact local run, the same
    bucket-bounded-quadratic doctrine as the LSH band join. A
    boilerplate run shared by millions of documents concentrates in
    one fingerprint key; cap it upstream by dropping fingerprints with
    extreme document frequency (same ``max_doc_freq`` pattern as
    :func:`~.dedup.jaccard_pairs`) before this join if that regime
    appears.
    """
    fps = winnow_fingerprints(df, content_col, id_col, k=k, window=window)
    left = fps.select(F.col(id_col).alias("id_a"), "fp")
    right = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        left.join(right, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(min_shared))
    )
