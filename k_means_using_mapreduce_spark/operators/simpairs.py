"""Sparse all-pairs cosine similarity over (id, term, weight) rows.

The lexical twin of the dense-embedding near-dup family
(operators/dedup.py::embedding_near_dup_pairs works on vectors;
operators/semdedup.py clusters them): here documents are SPARSE
TF-IDF bags and similar pairs are found through an inverted-index
self-join — only documents sharing a term ever meet, so the work is
sum over terms of |posting|², not |docs|².

Two variants:

- :func:`cosine_pairs` — exact. The posting-list join IS the
  algorithm; the ``max_df`` cap drops stopword-grade terms whose
  postings would go quadratic (same hot-key cap as
  dedup.jaccard_pairs' ``max_doc_freq``).
- :func:`cosine_pairs_dimsum` — DIMSUM sampling (Zadeh & Goel,
  "Dimension Independent Similarity Computation", 2013) in its
  scalable per-ENTRY form: entry (term, i) survives with probability
  ``q_i = min(1, √gamma / norm_i)`` BEFORE the posting self-join, and
  a surviving pair's contribution is scaled by ``1/(q_i·q_j)`` — an
  unbiased estimator whose variance stays bounded for the high-norm
  pairs that dominate the join, and whose JOIN INPUT (not just its
  output) shrinks with gamma: a hot posting of length L pairs over
  ~(Σq)² sampled entries, never L². The coin is ``md5(term|id)`` —
  NOT rand() — so the estimate is retry/repartition-stable,
  reproducible, and DuckDB-oracle-checkable like every sampler in
  this engine (operators/sampling.py doctrine).
  ``√gamma >= max(norm_i)`` degrades to exactly :func:`cosine_pairs`.

Scale: shuffle keys are terms (strings ~10 B) and int64 doc ids;
normalized weights travel as doubles; documents themselves never
shuffle. At 100 TB the caps do the heavy lifting: ``max_df`` bounds
per-term fan-out, gamma bounds emitted pair contributions. The final
(i, j) aggregate is map-side combinable.

Degenerate case to know: a corpus whose vocabulary is tiny and dense
(every term in most documents — the synthetic testdata corpus is
exactly this) gives posting lists ~|docs| long, the join goes
quadratic, and ``max_df`` can't save it because every term is hot.
That regime belongs to minhash/simhash LSH (operators/dedup.py) or
the embedding path (semdedup.py); this operator targets realistic
Zipfian vocabularies where postings shrink fast and the cap trims
only the stopword head.

The reference has no similarity operators at all (SURVEY.md §2);
this is extension surface alongside dedup.py/similarity.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int60


def doc_term_weights(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, token, w) with ``w = tf · ln(N/df)`` — the same plain-idf
    weighting as index.tfidf_top_terms, N counted eagerly (one tiny
    job) so the weight is a literal, not a correlated subplan."""
    from ..functions.text import tokens

    n_docs = float(df.count())
    from ..sources.loaders import fan_out

    toks = fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col))).select(
        "id", F.explode(tokens(text_col)).alias("token")
    )
    tf = toks.groupBy("id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    return tf.join(dfreq, "token").select(
        "id",
        "token",
        (F.col("tf") * F.log(F.lit(n_docs) / F.col("df"))).alias("w"),
    )


def _normalized(weights: DataFrame, id_col: str, term_col: str, w_col: str):
    """(id, term, nw, nrm): row-normalized weights + the row L2 norm
    (kept for DIMSUM's sampling probability). Zero-norm rows drop —
    cosine is undefined for them."""
    norms = weights.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col(w_col) * F.col(w_col))).alias("nrm")
    )
    return (
        weights.join(norms, id_col)
        .where(F.col("nrm") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.col(term_col).alias("term"),
            (F.col(w_col) / F.col("nrm")).alias("nw"),
            "nrm",
        )
    )


def _capped(nw: DataFrame, max_df: int | None) -> DataFrame:
    if max_df is None:
        return nw
    if max_df < 2:
        raise ValueError(f"max_df must be >= 2 (or None), got {max_df}")
    # no broadcast hint: the surviving-term list is vocabulary-sized
    # (can be 100M+ terms at corpus scale) — let AQE pick the join
    # strategy; it will broadcast exactly when the list is small.
    posting = nw.groupBy("term").agg(F.count("*").alias("_pl"))
    return nw.join(posting.where(F.col("_pl") <= max_df), "term").drop("_pl")


def cosine_pairs(
    weights: DataFrame,
    *,
    id_col: str = "id",
    term_col: str = "token",
    w_col: str = "w",
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold: ``(id1, id2, cosine)``
    with id1 < id2. ``max_df`` drops terms whose posting list exceeds
    the cap BEFORE pairing (their pairs lose that term's mass — the
    standard recall-for-runtime trade, stopword terms carry ~no
    cosine signal anyway)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    nw = _capped(_normalized(weights, id_col, term_col, w_col), max_df)
    a = nw.select("term", F.col("id").alias("id1"), F.col("nw").alias("nw1"))
    b = nw.select("term", F.col("id").alias("id2"), F.col("nw").alias("nw2"))
    return (
        a.join(b, "term")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("nw1") * F.col("nw2")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def cosine_pairs_dimsum(
    weights: DataFrame,
    *,
    id_col: str = "id",
    term_col: str = "token",
    w_col: str = "w",
    threshold: float = 0.5,
    gamma: float = 100.0,
    max_df: int | None = None,
) -> DataFrame:
    """DIMSUM-sampled all-pairs cosine estimate >= threshold.

    Sampling is PER ENTRY, before the posting self-join (the Zadeh &
    Carlsson 2013 scalable form): entry (term, id) survives iff
    ``md5_uniform(term|id) < q`` with ``q = min(1, √gamma / nrm)``,
    and a surviving pair's contribution is scaled by ``1/(q1·q2)`` —
    unbiased (coins are independent across entries), with relative
    variance shrinking as gamma grows. Round-7 rewrite: the previous
    form flipped one coin per JOINED PAIR, which still materialized
    every hot-term posting² pair (and paid an md5 per pair) before
    discarding — >9 min at sf0.1 vs ~2 s entry-sampled, and exactly
    the quadratic DIMSUM exists to avoid. Entry coins keep the whole
    estimate deterministic: same inputs, same estimate, on any
    partitioning, any retry, and in the DuckDB oracle."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if gamma <= 0:
        raise ValueError(f"gamma must be > 0, got {gamma}")
    root = float(math.sqrt(gamma))
    nw = _capped(_normalized(weights, id_col, term_col, w_col), max_df)
    q = F.least(F.lit(1.0), F.lit(root) / F.col("nrm"))
    coin = (
        md5_int60(
            F.concat_ws("|", F.col("term"), F.col("id").cast("string"))
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    kept = nw.where(coin < q).select("term", "id", "nw", q.alias("q"))
    a = kept.select(
        "term",
        F.col("id").alias("id1"),
        F.col("nw").alias("nw1"),
        F.col("q").alias("q1"),
    )
    b = kept.select(
        "term",
        F.col("id").alias("id2"),
        F.col("nw").alias("nw2"),
        F.col("q").alias("q2"),
    )
    return (
        a.join(b, "term")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(
            F.sum(
                F.col("nw1") * F.col("nw2") / (F.col("q1") * F.col("q2"))
            ).alias("cosine_est")
        )
        .where(F.col("cosine_est") >= threshold)
    )
