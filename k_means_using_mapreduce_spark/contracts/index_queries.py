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
