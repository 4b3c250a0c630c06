"""Line-level deduplication: drop lines that repeat across many documents.

The C4 / RefinedWeb-style cleanup: boilerplate (nav bars, cookie
banners, license headers) repeats VERBATIM across thousands of pages.
Whole-document dedup never catches it; line-level frequency counting
does. The reference engine has no analogue — this extends its corpus
surface (reference scope: K-Means over points, `master.py:27-150`)
with the cleanup step a training-data pipeline runs first.

Pipeline shape (scale notes inline):

1. ``segment_lines`` — one narrow projection, no shuffle. Real corpora
   split on ``\\n``; the synthetic test corpus is newline-free, so a
   token-window segmenter (every ``window`` tokens is a "line") is the
   fallback. Both produce ``(id, line_no, line)``.
2. ``frequent_lines`` — one map-side-combining aggregation keyed on
   the line text (post-combine, each partition ships each distinct
   line once; keying on a hash would ship hash AND text, since the
   output needs the text). Output is the heavy-hitter set (lines in
   ≥ min_docs docs) — tiny by construction (boilerplate is rare among
   distinct lines) and therefore broadcastable; the 60-bit line hash
   is attached after aggregation for pure-hash consumers.
3. ``drop_frequent_lines`` — broadcast anti-join of the exploded lines
   against the frequent set, then per-document ordered reassembly
   (one shuffle keyed by doc id, the same key cardinality as the
   input). At 100 TB: the frequent set stays ≪ memory (it is bounded
   by distinct-boilerplate count, not corpus size); nothing quadratic.

Determinism: the line hash is the first 15 hex chars of md5 (an exact
int64, no overflow), the same construction ``operators/dedup.py:61``
uses for document hashes, so the oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from .dedup import md5_int60 as _line_hash  # one engine-portable hash


def segment_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int | None = None,
) -> DataFrame:
    """Explode documents into ``(id, line_no, line)`` rows.

    ``window=None`` splits on newlines (the real-corpus path);
    ``window=k`` segments every k whitespace tokens (the fallback for
    single-line corpora — also how "line" dedup generalizes to
    fixed-span shingle-block dedup). line_no is 0-based and dense, so
    reassembly preserves original order. Narrow: no shuffle."""
    from ..sources.loaders import fan_out

    # line splitting + downstream per-line hashing is per-row CPU; a
    # single-row-group scan would run it on one core (guide §2.5)
    df = fan_out(df.select(F.col(id_col), F.col(text_col)))
    if window is not None:
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        toks = tokens(F.col(text_col))
        n_lines = F.ceil(F.size(toks) / F.lit(float(window))).cast("int")
        seg = F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
        )
        # size==0 -> sequence(0,-1) is empty -> doc contributes no rows
        exploded = df.select(
            F.col(id_col), F.posexplode(seg).alias("line_no", "line")
        )
    else:
        lines = F.split(F.col(text_col), r"\n")
        exploded = df.select(
            F.col(id_col), F.posexplode(lines).alias("line_no", "line")
        ).where(F.trim(F.col("line")) != "")
    return exploded


def frequent_lines(
    segments: DataFrame,
    *,
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Lines occurring in ``>= min_docs`` DISTINCT documents.

    Returns ``(line, line_h, n_docs)``. Grouping is on the line TEXT:
    the aggregation partial-combines map-side either way, and carrying
    the string alone through the shuffle is strictly narrower than
    hash + first(string) — so the 60-bit hash (used by pure-hash
    consumers) is computed AFTER aggregation, on the tiny survivor
    set, not per segment. Distinct-per-document counting means a line
    repeated inside ONE document is not cross-document boilerplate."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    return (
        segments.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line", _line_hash(F.col("line")).alias("line_h"), "n_docs")
    )


def drop_frequent_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int | None = None,
    min_docs: int = 2,
    keep_first: bool = False,
    share_segments: bool = True,
) -> DataFrame:
    """Remove cross-document boilerplate lines; reassemble documents.

    Returns one row per input document:
    ``(id, n_lines, kept_lines, dropped_lines, cleaned_text)``.
    ``keep_first=True`` keeps the single lowest-(id, line_no) occurrence
    of each frequent line corpus-wide (RefinedWeb's "keep one copy")
    instead of dropping all copies.

    Plan: segment (narrow) → frequent set (one hash-keyed shuffle) →
    broadcast join back → groupBy id with an ordered struct collect
    (one shuffle on the document key). cleaned_text is rebuilt with
    the window's joiner so the output is oracle-reproducible.

    The segment relation feeds BOTH the frequent-set aggregation and
    the mark join; left lazy, Catalyst evaluates the segmentation
    (tokenize + explode over every document) twice. ``share_segments``
    materializes it once via ``localCheckpoint`` — the same
    share-one-pass trade the near-dedup pipeline makes — which halves
    wall time (measured 3.3 s → 1.9 s at sf0.1). Set it False to keep
    the operator fully lazy (e.g. when composing into a plan that
    itself caches upstream)."""
    segs = segment_lines(df, id_col=id_col, text_col=text_col, window=window)
    if share_segments:
        segs = segs.localCheckpoint()
    # the frequent set is tiny, so the mark join broadcasts on the LINE
    # TEXT itself — the wide side never computes md5 (the hash exists to
    # narrow frequent_lines' aggregation shuffle, not the join)
    freq = frequent_lines(segs, id_col=id_col, min_docs=min_docs).select("line")
    freq_marked = freq.withColumn("_boiler", F.lit(True))
    hit = segs.join(F.broadcast(freq_marked), "line", "left").withColumn(
        "is_boiler", F.coalesce(F.col("_boiler"), F.lit(False))
    )
    if keep_first:
        first_rank = F.row_number().over(
            Window.partitionBy("line").orderBy(F.col(id_col), F.col("line_no"))
        )
        hit = hit.withColumn(
            "is_boiler", F.col("is_boiler") & (first_rank > 1)
        )
    joiner = " " if window is not None else "\n"
    kept_struct = F.when(
        ~F.col("is_boiler"), F.struct(F.col("line_no"), F.col("line"))
    )
    agg = (
        hit.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(~F.col("is_boiler"), 1).otherwise(0))
            .cast("int")
            .alias("kept_lines"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
            .cast("int")
            .alias("dropped_lines"),
            F.concat_ws(
                joiner,
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
            ).alias("cleaned_text"),
        )
        .withColumn("n_lines", F.col("n_lines").cast("int"))
    )
    # left join back so segment-less documents (empty text, all-blank
    # lines) still appear — the promised one-row-per-input-document —
    # instead of silently vanishing from the aggregate
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("kept_lines", F.lit(0)).alias("kept_lines"),
        F.coalesce("dropped_lines", F.lit(0)).alias("dropped_lines"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )
