"""Exact substring-level deduplication: repeated token n-gram spans.

Document-level dedup (operators/dedup.py) removes whole near-identical
documents; this module removes the REPEATED PASSAGES inside otherwise
distinct documents — boilerplate headers, license blocks, templated
sentences — the variant shown to matter for LLM training corpora
("Deduplicating Training Data Makes Language Models Better", Lee et
al. 2022, which does it with a suffix array on one machine; at corpus
scale the suffix array doesn't shard, so the distributed re-expression
below uses fixed-length n-gram anchors instead, the standard
MapReduce-able relaxation).

Semantics: every corpus-wide occurrence of a duplicated token n-gram
is marked EXCEPT the globally first one (ordered by (doc id, start
position) — one copy of every passage survives, deterministically),
then per-document overlapping marks are merged into maximal token
index intervals. Removing the merged spans removes every repeated
passage of length >= n while keeping one canonical copy, without ever
materializing variable-length matches.

Scale shape (100 TB): one explode to (doc, start, gram-hash) — volume
= corpus token count; one hash-shuffle on the 60-bit gram key for the
duplicate ranking (map-side pre-aggregation is impossible for a
ranking, but the shuffled payload is 3 ints per token); one shuffle on
doc id for the interval merge, whose groupBy reuses the same
partitioning (no third shuffle — plan-pinned in tests). No windows
over the whole corpus, no self-joins, no driver state: every stage is
keyed and linear. Grams are compared by md5_int60 (60-bit) hashes, not
strings — the shuffle carries ints, with a ~2^-60 per-pair collision
rate documented in lieu of exact string verification (the same
trade every minhash stage in operators/dedup.py makes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import shingles_of, tokens
from .dedup import md5_int60


def ngram_occurrences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Positional token n-grams: one row ``(id, start, gh)`` per
    n-gram window, ``start`` = 0-based token index, ``gh`` =
    md5_int60 of the space-joined gram. Documents shorter than ``n``
    tokens contribute nothing (no whole-document fallback here —
    unlike minhash shingles, a positional span shorter than the
    window is not a substring-dedup candidate)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = tokens(text_col)
    from ..sources.loaders import fan_out

    return (
        fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(
            id_col,
            F.posexplode(shingles_of(F.col("_toks"), n)).alias(
                "start", "_gram"
            ),
        )
        .select(id_col, "start", md5_int60(F.col("_gram")).alias("gh"))
    )


def repeated_ngram_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Merged per-document token spans of corpus-duplicated n-grams:
    ``(id, span_start, span_end, span_tokens)`` with ``[span_start,
    span_end)`` 0-based token indexes and one globally-first
    occurrence of every gram left unmarked.

    Duplicate ranking is a single ``row_number`` per gram hash ordered
    by (id, start) — occurrence rank > 1 means "a copy that survives
    elsewhere"; a gram seen once only ever gets rank 1 and is never
    marked, so no separate count pass is needed. The interval merge is
    the classic running-max sweep: a span opens a new island iff its
    start clears every previous span's end."""
    occ = ngram_occurrences(df, id_col=id_col, text_col=text_col, n=n)
    dup_rank = Window.partitionBy("gh").orderBy(id_col, "start")
    spans = (
        occ.withColumn("_rk", F.row_number().over(dup_rank))
        .where(F.col("_rk") > 1)
        .select(
            id_col,
            F.col("start").alias("span_start"),
            (F.col("start") + n).alias("span_end"),
        )
    )
    by_doc = Window.partitionBy(id_col).orderBy("span_start")
    prev_max_end = F.max("span_end").over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    island = F.sum(
        F.when(
            prev_max_end.isNull() | (F.col("span_start") > prev_max_end),
            1,
        )
        .otherwise(0)
        .cast("long")
    ).over(by_doc.rowsBetween(Window.unboundedPreceding, 0))
    return (
        spans.withColumn("_isl", island)
        .groupBy(id_col, "_isl")
        .agg(
            F.min("span_start").cast("long").alias("span_start"),
            F.max("span_end").cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def repeated_ngram_doc_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document substring-dup burden: ``(id, token_count,
    n_spans, dup_tokens, dup_frac)`` over every document (docs with no
    repeated span report 0 / 0.0). The corpus-side left join keeps the
    spans relation the small side of nothing — it's a per-doc rollup
    joined back to a one-row-per-doc projection on the doc key."""
    spans = repeated_ngram_spans(
        df, id_col=id_col, text_col=text_col, n=n
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
    )
    base = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias(
            "token_count"
        )
    )
    return base.join(per_doc, id_col, "left").select(
        id_col,
        "token_count",
        F.coalesce(F.col("n_spans"), F.lit(0).cast("long")).alias(
            "n_spans"
        ),
        F.coalesce(F.col("dup_tokens"), F.lit(0).cast("long")).alias(
            "dup_tokens"
        ),
        F.when(F.col("token_count") > 0,
               F.coalesce(F.col("dup_tokens"), F.lit(0))
               / F.col("token_count"))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def strip_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """Apply span removal: drop every token whose 0-based index falls
    in one of the document's ``[span_start, span_end)`` intervals and
    re-join the survivors with single spaces (tokenization is
    whitespace-normalizing, so the round trip is lossy exactly like
    every other text-normalizing stage in the pipeline).

    The spans relation collapses to one array per doc before the join,
    so the join key is the doc id and the token filter is a pure
    expression — no explode of the document tokens."""
    packed = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    toks = tokens(text_col)
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    return (
        df.join(packed, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col("_spans").isNull(), F.array_join(toks, " "))
            .otherwise(F.array_join(kept, " ")),
        )
        .drop("_spans")
    )
