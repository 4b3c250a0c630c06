"""Inverted index over the document corpus: posting lists, boolean
search, and exact TF-IDF term ranking.

The retrieval-side complement of the dedup/similarity family: the same
(doc, token) explode that powers shingle dedup (operators/dedup.py)
reshaped into token-keyed postings — the structure behind keyword
search, BM25-style scoring, and per-term corpus diagnostics.

Scale notes:
- ``build_postings`` is one narrow explode + one token-keyed groupBy.
  The shuffle rows are (token, doc_id) pairs — no document text moves.
  Stopword-like tokens produce huge groups; ``max_postings`` caps what
  is MATERIALIZED per token (the doc-frequency count stays exact), so
  the output row for 'the' is small even when its true posting list is
  a billion entries. At 100 TB the postings table would be written
  bucketed by token (sources/sinks.py::write_bucketed_table) so lookups
  prune to one bucket.
- ``search_all`` filters to the query terms BEFORE the per-document
  count — the shuffle carries only rows whose token is in the query
  (|terms| × df rows), the inverted-index access pattern expressed
  declaratively rather than via a driver-side postings fetch.
- ``tfidf_top_terms`` joins per-(doc, token) term frequencies against
  the per-token document frequencies; the df side is a tiny aggregate
  (|vocab| rows) and broadcasts. Ranking rounds the score to 6 decimals
  before comparing (then breaks ties by token) so the selection is
  reproducible across engines whose ``ln`` may differ in the last ulp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens


def _doc_tokens(
    df: DataFrame, id_col: str, text_col: str, *, distinct: bool
) -> DataFrame:
    from ..sources.loaders import fan_out

    out = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    return out.distinct() if distinct else out


def build_postings(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10,
) -> DataFrame:
    """Token → (exact document frequency, first ``max_postings`` doc ids).

    Output: ``(token, df, postings)`` with postings a comma-joined
    ascending id sample — a display/debug cap, not a correctness cap:
    ``df`` counts every document."""
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    pairs = _doc_tokens(df, id_col, text_col, distinct=True)
    # Two-phase min-n so no aggregation buffer ever holds a stopword's
    # full posting list: each (token, salt) sub-group keeps only its
    # n smallest ids, and the n smallest of the union of per-salt
    # minima is exactly the global n smallest — the worst-case buffer
    # shrinks by the salt fan-out and a hot token's collection work
    # spreads across salt tasks. The exact df count is a plain
    # partial-combining aggregate on the same pairs.
    salts = 32
    partial = (
        pairs.withColumn("_salt", F.pmod(F.hash(F.col(id_col)), F.lit(salts)))
        .groupBy("token", "_salt")
        .agg(
            F.slice(F.array_sort(F.collect_set(id_col)), 1, max_postings).alias(
                "_ids"
            ),
            F.count("*").cast("long").alias("_n"),
        )
    )
    return partial.groupBy("token").agg(
        F.sum("_n").alias("df"),
        F.concat_ws(
            ",",
            F.slice(F.array_sort(F.flatten(F.collect_list("_ids"))), 1, max_postings),
        ).alias("postings"),
    )


def search_all(
    df: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ALL of ``terms`` (boolean AND over the
    inverted index): filter the (doc, token) pairs to the query terms,
    then keep docs whose distinct matched-term count equals |terms|."""
    terms = [t.lower() for t in terms]
    if not terms:
        raise ValueError("search_all needs at least one term")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate terms in query: {terms}")
    pairs = _doc_tokens(df, id_col, text_col, distinct=True)
    return (
        pairs.where(F.col("token").isin(terms))
        .groupBy(id_col)
        .agg(F.count("*").alias("_hits"))
        .where(F.col("_hits") == len(terms))
        .select(id_col)
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 3,
) -> DataFrame:
    """Top ``top`` terms per document by TF-IDF (tf × ln(N/df)).

    Output: ``(id, token, tf, df, tfidf)``, ``top`` rows per document
    (fewer when the document has fewer distinct tokens). Plain idf with
    no smoothing — every indexed term has df ≥ 1 by construction, so
    ln(N/df) is well-defined; a term in every document scores 0."""
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    pairs = _doc_tokens(df, id_col, text_col, distinct=False)
    tf = pairs.groupBy(id_col, "token").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(F.broadcast(dfreq), "token").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("tfidf"), 6).desc(), F.col("token")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top)
        .select(id_col, "token", "tf", "df", F.round("tfidf", 6).alias("tfidf"))
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: Sequence[str],
    query_vec: Sequence[float],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
) -> DataFrame:
    """Keyword-constrained vector search (the RAG retrieval shape):
    documents containing ALL ``terms``, ranked by cosine similarity of
    their embedding to ``query_vec``; top ``k`` as ``(id, score)``.

    Plan: the boolean term filter runs FIRST and its (small) id set
    broadcasts into the embeddings scan, so the vector math — the
    expensive leg — touches only candidates. With a selective term this
    beats scoring the corpus then filtering by orders of magnitude; the
    planner can't make that trade for you when the filter and the
    ranking live in different systems, which is the point of doing both
    in one engine."""
    from ..functions.vectors import cosine_similarity_expr

    hits = search_all(docs, terms, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias(vec_id_col)
    )
    cand = embeddings.join(F.broadcast(hits), vec_id_col)
    score = cosine_similarity_expr(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(v)) for v in query_vec]),
    )
    return (
        cand.select(F.col(vec_id_col).alias(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_search(
    df: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked top-``k`` documents for a bag of query terms.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))
    with the Robertson-Sparck-Jones idf ``ln(1 + (N-df+0.5)/(df+0.5))``
    (the Lucene form — always positive, so a term in most documents
    dilutes rather than flips the ranking). Documents matching ANY term
    are scored (OR semantics); compose with :func:`search_all` for AND.

    Plan: per-(doc, term) tf for QUERY TERMS ONLY (the isin filter runs
    under the explode, so the aggregate sees |terms|·df rows); doc
    lengths ride along via a first() on the pre-computed per-row length;
    the |terms|-row df table and the 1-row corpus stats both broadcast.
    Ranking rounds to 6 decimals before comparing (token tie-break is
    irrelevant here — the unit is the document) so selection does not
    hinge on the last ulp of ln.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = [t.lower() for t in terms]
    if not terms:
        raise ValueError("bm25_search needs at least one term")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate terms in query: {terms}")

    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("token")
    )
    # corpus stats: N and avgdl over ALL docs (cheap 1-row aggregate on
    # the unexploded relation — token-less docs count toward both)
    stats = df.select(F.size(tokens(F.col(text_col))).alias("dl")).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.where(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    k0: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack-Clarke-Buettcher 2009) of
    already-computed top-k lists: ``rrf = Σ_lists 1/(k0 + rank)``,
    output ``(id, rrf_score, n_lists)`` — the standard score-free way
    to combine lexical (BM25) and vector rankings whose raw scores
    are not commensurable. ``k0=60`` is the paper's constant.

    Inputs are TOP-K LISTS (k rows each), not corpora: ranks come
    from a single-partition row_number over ``(score desc, id asc)``
    — ties deterministic — which is exactly right for k≤1000 rows
    and exactly wrong for anything corpus-sized. Fuse after
    retrieval, not instead of it. Each list is assumed to contain an
    id at most once (true of any top-k output); a repeated id inside
    ONE list would contribute once per occurrence.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    ranked = [
        df.select(
            F.col(id_col).alias("_id"), F.row_number().over(w).alias("_r")
        )
        for df in rankings
    ]
    u = ranked[0]
    for r in ranked[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy("_id")
        .agg(
            F.sum(F.lit(1.0) / (F.lit(k0) + F.col("_r"))).alias("rrf_score"),
            F.count("*").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("_id"))
        .limit(top)
        .select(F.col("_id").alias(id_col), "rrf_score", "n_lists")
    )


def textrank_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_len: int = 4,
    damping: float = 0.85,
    iterations: int = 3,
    top: int = 20,
) -> DataFrame:
    """Corpus keywords by TextRank (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph, window 2, restricted to tokens
    of length ≥ ``min_len`` (the cheap stopword guard). Output:
    ``(term, rank, rk)`` — the ``top`` highest-scoring terms.

    Graph-building is array-native (adjacent pairs via ``zip_with``
    of the filtered token list with its own tail — no posexplode, no
    per-token window), so the only shuffle before PageRank is the
    map-side-combined (src, dst) pair count; the graph itself is
    vocabulary-sized, ≪ corpus, and the fixed-iteration PageRank runs
    on that small relation (operators/graph.py::pagerank). Ranking
    rounds scores to 8 decimals before ordering (the
    ``tfidf_top_terms`` doctrine) so cross-engine float jitter cannot
    flip the top-k boundary.
    """
    from ..functions.text import tokens
    from .graph import pagerank

    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    toks = F.filter(
        tokens(F.col(text_col)), lambda t: F.length(t) >= min_len
    )
    sz = F.size(toks)
    pairs = F.when(
        sz >= 2,
        F.zip_with(
            F.slice(toks, 1, sz - 1),
            F.slice(toks, 2, sz - 1),
            lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
        ),
    ).otherwise(F.array().cast("array<struct<src:string,dst:string>>"))
    directed = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.src", "p.dst")
        .where(F.col("src") != F.col("dst"))
    )
    sym = directed.unionAll(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges = sym.groupBy("src", "dst").agg(F.count("*").alias("n"))
    pr = pagerank(
        edges, weight_col="n", damping=damping, max_iter=iterations, tol=0.0
    )
    w = Window.orderBy(F.round(F.col("rank"), 8).desc(), F.col("node"))
    return (
        pr.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= top)
        .select(
            F.col("node").alias("term"),
            F.round("rank", 8).alias("rank"),
            "rk",
        )
    )
