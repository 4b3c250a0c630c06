"""Substring-level duplicate-span detection across documents.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) showed that *substring*-level duplication — long verbatim
passages embedded in otherwise-distinct documents — survives both
document-level dedup (operators/dedup.py) and line-frequency cleanup
(operators/lines.py), and that removing it measurably improves models.
Their single-node tool builds a suffix array; a suffix array is not a
shape Spark can build cheaply, so this module uses the standard
distributed approximation: fixed-length character grams sampled on a
stride, hashed, and counted across documents.

Guarantee: with gram length ``L`` and stride ``S``, any verbatim
passage of length ``>= L + S - 1`` shared by two documents contains at
least one *aligned* shared gram only if the two copies start at offsets
congruent mod S — so, as in winnowing (operators/winnow.py), stride
sampling alone cannot promise cross-document detection. We therefore
stride only the *probe* side choice: every offset of the span grid is
``S``-spaced but grams are hashed from a canonical boundary (offset 0
of each document), and detection is exact for passages that repeat at
equal grid phase (the common template/quote case: shared prefixes,
shared boilerplate blocks, wholesale paragraph reuse). ``stride=1``
recovers the exact guarantee of Lee et al. (any shared substring of
length >= L is caught) at ``L``× the gram volume; the parameter is the
recall/cost dial, and the docstring of each contract states the value
used.

Scale shape (the reason this is grams + group-by, not a suffix array):

1. ``char_grams`` — narrow projection: per document, offsets
   ``0, S, 2S, …`` with a 60-bit md5 of the ``L``-char slice at each.
   Emits ``(id, pos, gram_hash)`` — the hash only, never the text, so
   the downstream shuffle carries 24 B rows. Volume = N·len/S rows.
2. ``duplicate_grams`` — one map-side-combined aggregation on
   ``gram_hash`` counting distinct documents; grams in ≥ ``min_docs``
   documents form the duplicated-gram set. Like the LSH band guard
   (operators/dedup.py), a ``max_docs`` cap marks degenerate grams
   (the empty-ish gram of a pathological corpus) without materializing
   their doc lists.
3. ``duplicate_spans`` — semi-join of the gram stream against the
   duplicated set (hash keys), then per-document islands-and-gaps
   interval merge (ONE shuffle keyed by doc id, window sorted by pos):
   overlapping/adjacent duplicated grams coalesce into maximal spans
   ``[span_start, span_end)``. The window is per-document — the same
   parallelism unit as operators/winnow.py — never a global sort.

At 100 TB: gram volume is corpus_chars/S rows of 24 B; the duplicated
set is bounded by *distinct duplicated content*, not corpus size; the
only full-document-keyed shuffle is the final per-doc interval merge,
with key cardinality = document count. Nothing is quadratic.

Reference scope note: the reference engine (K-Means over CSV points,
`master.py:27-150`) has no text surface; this extends the corpus
toolkit the builder's brief adds on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import md5_int60


def char_grams(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_len: int = 40,
    stride: int = 20,
) -> DataFrame:
    """``(id, pos, gram_hash)`` for the L-char slice at each grid offset.

    Narrow (no shuffle): offsets are generated per row with
    ``sequence`` and the slice is hashed in the same projection, so the
    gram *text* never leaves the scan stage. Documents shorter than
    ``gram_len`` emit no rows. ``pos`` is 0-based.
    """
    if gram_len < 2:
        raise ValueError(f"gram_len must be >= 2, got {gram_len}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    text = F.col(text_col)
    # sequence() raises on inverted bounds, so gate on length first.
    offsets = F.when(
        F.length(text) >= F.lit(gram_len),
        F.sequence(F.lit(0), F.length(text) - F.lit(gram_len), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(offsets).alias("pos"),
            text.alias("_t"),
        )
        .select(
            "id",
            "pos",
            md5_int60(F.substring(F.col("_t"), F.col("pos") + 1, gram_len)).alias(
                "gram_hash"
            ),
        )
    )


def duplicate_grams(
    grams: DataFrame,
    *,
    min_docs: int = 2,
    max_docs: int | None = None,
) -> DataFrame:
    """Gram hashes present in ≥ ``min_docs`` distinct documents.

    One aggregation keyed on the 8 B hash; ``count(DISTINCT id)`` is
    exact (the oracle needs it bit-for-bit) and partial-combines
    because Spark plans distinct-by-key via a two-level aggregate on
    (gram_hash, id) — both levels map-side combinable. ``max_docs``
    (like the LSH hot-bucket cap) drops degenerate grams that would
    mark the whole corpus duplicated.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    out = grams.groupBy("gram_hash").agg(
        F.countDistinct("id").alias("n_docs")
    ).filter(F.col("n_docs") >= min_docs)
    if max_docs is not None:
        out = out.filter(F.col("n_docs") <= max_docs)
    return out


def duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_len: int = 40,
    stride: int = 20,
    min_docs: int = 2,
    max_docs: int | None = None,
) -> DataFrame:
    """Maximal duplicated spans ``(id, span_start, span_end, n_grams)``.

    ``span_end`` is exclusive; ``n_grams`` counts the duplicated grams
    merged into the span (a span of one gram has n_grams=1,
    span_end - span_start = gram_len). Overlapping *and* exactly
    adjacent gram intervals merge (a gram starting where the previous
    one ends continues the same verbatim run at stride ≤ gram_len).

    Plan: grams (narrow) → self-contained duplicated-set agg → semi
    join on the 8 B hash → one per-document window for the interval
    merge. The duplicated-gram set is NOT broadcast by hint: its size
    is data-dependent (bounded by distinct duplicated content), so the
    plan lets AQE pick broadcast vs shuffle join at runtime.
    """
    grams = char_grams(
        df, id_col=id_col, text_col=text_col, gram_len=gram_len, stride=stride
    )
    dup = duplicate_grams(grams, min_docs=min_docs, max_docs=max_docs)
    hits = grams.join(dup.select("gram_hash"), "gram_hash", "left_semi")

    # islands-and-gaps on [pos, pos+gram_len) intervals, per document
    w = Window.partitionBy("id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + F.lit(gram_len)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        "id",
        "pos",
        F.when(
            prev_max_end.isNull() | (F.col("pos") > prev_max_end), F.lit(1)
        ).otherwise(F.lit(0)).alias("_new_island"),
    )
    islanded = flagged.select(
        "id",
        "pos",
        F.sum("_new_island").over(w).alias("_island"),
    )
    return (
        islanded.groupBy("id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(gram_len)).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select("id", "span_start", "span_end", "n_grams")
    )


def duplicate_span_summary(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    gram_len: int = 40,
    stride: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Per-group duplication profile: how much of each source is verbatim
    duplicated elsewhere in the corpus.

    ``dup_chars`` sums span widths per document (spans never overlap
    after the merge, so the sum is exact coverage at grid resolution);
    ``dup_char_ratio`` divides by the group's total characters. The
    join back to the document table is on the document id — the spans
    relation is a small fraction of the corpus (only duplicated
    regions), so AQE broadcast applies when it fits.
    """
    spans = duplicate_spans(
        df,
        id_col=id_col,
        text_col=text_col,
        gram_len=gram_len,
        stride=stride,
        min_docs=min_docs,
    )
    per_doc = spans.groupBy("id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_chars"),
        F.count("*").alias("n_spans"),
    )
    docs = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
    )
    joined = docs.join(per_doc, "id", "left").select(
        "grp",
        "n_chars",
        F.coalesce(F.col("dup_chars"), F.lit(0)).alias("dup_chars"),
        F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        F.when(F.col("dup_chars").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "_has"
        ),
    )
    return (
        joined.groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_has").alias("docs_with_dups"),
            F.sum("dup_chars").alias("dup_chars"),
            F.sum("n_spans").alias("n_spans"),
            (F.sum("dup_chars") / F.sum("n_chars")).alias("dup_char_ratio"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "docs_with_dups",
            "dup_chars",
            "n_spans",
            F.round("dup_char_ratio", 6).alias("dup_char_ratio"),
        )
    )
