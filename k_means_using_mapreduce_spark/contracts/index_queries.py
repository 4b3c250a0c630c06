"""Inverted-index / retrieval contract queries (operators/index.py)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.index import bm25_search, build_postings, search_all, tfidf_top_terms
from ..sources.loaders import load_table
from ._sql_text import sql_tokens
from .similarity_queries import QUERY_VEC as _QUERY_VEC

_TERMS = ("dup", "vector", "stream")  # 'dup' is rare: the selective leg
_TOP = 3
_MAX_POSTINGS = 10

_PAIRS = (
    f"SELECT DISTINCT doc_id, unnest({sql_tokens('text')}) AS token "
    "FROM documents"
)


def token_postings_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return build_postings(docs, max_postings=_MAX_POSTINGS)


TOKEN_POSTINGS_SQL = f"""
WITH pairs AS ({_PAIRS})
SELECT token, CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_slice(list_sort(list(doc_id)), 1, {_MAX_POSTINGS}),
                       ',') AS postings
FROM pairs GROUP BY token
"""


def token_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return search_all(docs, _TERMS)


_TERMS_LIT = ", ".join(f"'{t}'" for t in _TERMS)

TOKEN_SEARCH_SQL = f"""
WITH pairs AS ({_PAIRS})
SELECT doc_id FROM pairs WHERE token IN ({_TERMS_LIT})
GROUP BY doc_id HAVING count(*) = {len(_TERMS)}
"""


def tfidf_top_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top=_TOP)


# round-before-rank mirrors operators/index.py::tfidf_top_terms: the
# selection must not hinge on the last ulp of ln()
TFIDF_SQL = f"""
WITH pairs AS (SELECT doc_id, unnest({sql_tokens('text')}) AS token
               FROM documents),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM pairs GROUP BY doc_id, token),
dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         tf.tf * ln(n.n_docs / dfreq.df) AS tfidf
  FROM tf JOIN dfreq USING (token), n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY round(tfidf, 6) DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tf, df, round(tfidf, 6) AS tfidf
FROM ranked WHERE rk <= {_TOP}
"""


def hybrid_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-shaped retrieval: keyword AND-filter (selective term prunes
    first), then cosine ranking over the surviving embeddings only
    (documents and embeddings share ids in the testdata)."""
    from ..operators.index import hybrid_search

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_search(docs, emb, _TERMS, _QUERY_VEC, k=10)





def _hybrid_sql() -> str:
    from .similarity_queries import _cos_sql, _vec_sql

    return f"""
WITH pairs AS ({_PAIRS}),
hits AS (
  SELECT doc_id FROM pairs WHERE token IN ({_TERMS_LIT})
  GROUP BY doc_id HAVING count(*) = {len(_TERMS)}
)
SELECT e.vec_id AS doc_id,
       {_cos_sql('e.embedding::DOUBLE[]', _vec_sql(_QUERY_VEC))} AS score
FROM embeddings e JOIN hits h ON e.vec_id = h.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


HYBRID_SQL = _hybrid_sql()


def bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_search(docs, _TERMS, k=10)


_K1, _B = 1.2, 0.75
_T = sql_tokens("text")

# arithmetic parenthesization mirrors operators/index.py::bm25_search
# operation-for-operation so the doubles agree bit-for-bit pre-rounding
BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, len({_T}) AS dl, unnest({_T}) AS token FROM documents
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         avg(CAST(len({_T}) AS DOUBLE)) AS avgdl
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf, any_value(dl) AS dl
  FROM toks WHERE token IN ({_TERMS_LIT}) GROUP BY 1, 2
), dfreq AS (
  SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * {_K1 + 1.0!r}
           / (tf.tf + {_K1!r} * ({1.0 - _B!r} + ({_B!r} * tf.dl) / s.avgdl))
           AS ts
  FROM tf JOIN dfreq d USING (token), stats s
)
SELECT doc_id, round(sum(ts), 6) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bm25_topk_documents": bm25_topk_documents,
    "hybrid_search_documents": hybrid_search_documents,
    "token_postings_documents": token_postings_documents,
    "token_search_documents": token_search_documents,
    "tfidf_top_terms_documents": tfidf_top_terms_documents,
}

ORACLE_SQL: dict[str, str] = {
    "bm25_topk_documents": BM25_SQL,
    "hybrid_search_documents": HYBRID_SQL,
    "token_postings_documents": TOKEN_POSTINGS_SQL,
    "token_search_documents": TOKEN_SEARCH_SQL,
    "tfidf_top_terms_documents": TFIDF_SQL,
}


def rrf_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 top-10 and the cosine ANN
    top-10 (documents and embeddings share ids) — the standard hybrid
    retrieval combiner when the two score scales aren't comparable."""
    from .similarity_queries import QUERY_VEC, TOPK
    from ..operators import similarity as S
    from ..operators.index import bm25_search, rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lexical = bm25_search(docs, _TERMS, k=10)
    vector = S.topk_for_query(emb, QUERY_VEC, k=TOPK, metric="cosine").select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    return rrf_fuse([lexical, vector], k0=60, top=10)


def _rrf_sql() -> str:
    from .similarity_queries import ANN_TOPK_SQL

    return f"""
WITH lex AS ({BM25_SQL.strip().rstrip(';')}),
ann AS ({ANN_TOPK_SQL}),
ranked AS (
  SELECT doc_id AS _id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS _r
  FROM lex
  UNION ALL
  SELECT vec_id AS _id,
         row_number() OVER (ORDER BY score DESC, vec_id ASC) AS _r
  FROM ann
)
SELECT _id AS doc_id, sum(1.0 / (60 + _r)) AS rrf_score,
       CAST(count(*) AS BIGINT) AS n_lists
FROM ranked GROUP BY 1
ORDER BY rrf_score DESC, doc_id ASC
LIMIT 10
"""


RRF_SQL = _rrf_sql()

QUERIES["rrf_search_documents"] = rrf_search_documents
ORACLE_SQL["rrf_search_documents"] = RRF_SQL


TEXTRANK_TOP = 20
_TR_MIN_LEN = 4
_TR_ITERS = 3
_TR_DAMPING = 0.85


def textrank_keywords_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TextRank keywords: PageRank over the window-2
    word co-occurrence graph of length>=4 tokens
    (operators/index.py::textrank_keywords)."""
    from ..operators.index import textrank_keywords

    return textrank_keywords(
        load_table(spark, sf_dir, "documents"),
        min_len=_TR_MIN_LEN,
        damping=_TR_DAMPING,
        iterations=_TR_ITERS,
        top=TEXTRANK_TOP,
    )


def _tr_iter_cte(k: int) -> str:
    """One unrolled damped PageRank iteration over the word graph
    (mirrors contracts/graph_queries.py::_iter_cte; the symmetric
    graph has no dangling nodes, but the dm term is kept for exact
    formula parity with the engine's pagerank)."""
    return f"""d{k} AS (
  SELECT coalesce(sum(rank), 0) AS dm FROM r{k - 1}
  WHERE node NOT IN (SELECT src FROM norm)
), c{k} AS (
  SELECT dst, sum(p * rank) AS c FROM norm JOIN r{k - 1} ON norm.src = r{k - 1}.node
  GROUP BY 1
), r{k} AS (
  SELECT node, (1 - {_TR_DAMPING}) / n + {_TR_DAMPING} * (coalesce(c, 0) + dm / n) AS rank
  FROM nodes CROSS JOIN nn CROSS JOIN d{k} LEFT JOIN c{k} ON node = dst
)"""


TEXTRANK_SQL = (
    f"""WITH ft AS (
  SELECT list_filter({sql_tokens('text')}, t -> len(t) >= {_TR_MIN_LEN}) AS toks
  FROM documents
), pairs AS (
  SELECT unnest(
    CASE WHEN len(toks) >= 2 THEN
      list_transform(range(1, len(toks)),
                     i -> struct_pack(src := toks[i], dst := toks[i + 1]))
    ELSE CAST([] AS STRUCT(src VARCHAR, dst VARCHAR)[]) END
  ) AS p
  FROM ft
), directed AS (
  SELECT p.src AS src, p.dst AS dst FROM pairs WHERE p.src <> p.dst
), edges AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT src, dst FROM directed
    UNION ALL SELECT dst, src FROM directed
  ) GROUP BY 1, 2
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
  )
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), outw AS (
  SELECT src, CAST(sum(n) AS DOUBLE) AS ow FROM edges GROUP BY 1
), norm AS (
  SELECT src, dst, n / ow AS p FROM edges JOIN outw USING (src)
), r0 AS (
  SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn
), """
    + ", ".join(_tr_iter_cte(k) for k in range(1, _TR_ITERS + 1))
    + f"""
SELECT term, rank, rk FROM (
  SELECT node AS term, round(rank, 8) AS rank,
         row_number() OVER (ORDER BY round(rank, 8) DESC, node) AS rk
  FROM r{_TR_ITERS}
) WHERE rk <= {TEXTRANK_TOP}
"""
)

QUERIES["textrank_keywords_documents"] = textrank_keywords_documents
ORACLE_SQL["textrank_keywords_documents"] = TEXTRANK_SQL
