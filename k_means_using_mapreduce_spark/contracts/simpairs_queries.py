"""Sparse all-pairs cosine contracts (operators/simpairs.py).

Both variants — exact and DIMSUM-sampled — are oracle-checked
value-for-value: the sampler's coin is md5 of the (term, id) ENTRY
(the paper's scalable per-entry form, round 7 — the earlier per-pair
coin still materialized every hot posting² pair before discarding),
so the "approximate" result is a deterministic function of the input
that DuckDB reproduces bit-for-bit. gamma=20 keeps sampling REAL at
sf0.01 (√gamma is below the largest norms, so some entries drop and
surviving contributions inflate by 1/(q1·q2)) while bounding the
variance inflation that lets spurious pairs cross the threshold.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._sql_text import sql_tokens
from ..sources.loaders import load_table

THRESHOLD = 0.9
GAMMA = 20.0
#: deterministic corpus slice for BOTH variants: the synthetic corpus
#: is the documented degenerate-dense-vocabulary regime
#: (operators/simpairs.py module docstring) where every doc pair
#: shares terms, so the PAIR OUTPUT is inherently ~|docs|² before the
#: threshold filter — 145 s at sf0.1 on the full corpus. The contract
#: pins value semantics on a proportional slice; realistic Zipfian
#: corpora (the operator's target) do not need one.
DOC_MOD = 7
ROOT_GAMMA = math.sqrt(GAMMA)

_NW_CTE = f"""
toks AS (
  SELECT doc_id AS id, unnest({sql_tokens("text")}) AS token
  FROM documents WHERE doc_id % {DOC_MOD} = 0
), tf AS (
  SELECT id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
  WHERE doc_id % {DOC_MOD} = 0
), w AS (
  SELECT id, token, tf * ln(n / df) AS w
  FROM tf JOIN dfreq USING (token) CROSS JOIN nn
), nrm AS (
  SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1
), nw AS (
  SELECT w.id, token, w / nrm AS nw, nrm
  FROM w JOIN nrm USING (id) WHERE nrm > 0
)
"""


def cosine_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF cosine near-dup pairs (>= 0.9) via the
    inverted-index self-join — work is per-term posting², never
    |docs|²."""
    from ..operators.simpairs import cosine_pairs, doc_term_weights

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % DOC_MOD == 0
    )
    w = doc_term_weights(docs)
    return cosine_pairs(w, term_col="token", w_col="w", threshold=THRESHOLD)


COSINE_PAIRS_SQL = (
    "WITH " + _NW_CTE.strip()
    + f"""
SELECT a.id AS id1, b.id AS id2, sum(a.nw * b.nw) AS cosine
FROM nw a JOIN nw b ON a.token = b.token AND a.id < b.id
GROUP BY 1, 2
HAVING sum(a.nw * b.nw) >= {THRESHOLD}"""
)


def cosine_pairs_dimsum_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMSUM-sampled cosine estimate (gamma=20, >= 0.9) — the
    deterministic per-entry md5 coin makes a SAMPLED similarity join
    exactly reproducible in the oracle, and the entry-level filter
    keeps the posting self-join sub-quadratic on hot terms."""
    from ..operators.simpairs import cosine_pairs_dimsum, doc_term_weights

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % DOC_MOD == 0
    )
    w = doc_term_weights(docs)
    return cosine_pairs_dimsum(
        w, term_col="token", w_col="w", threshold=THRESHOLD, gamma=GAMMA
    )


COSINE_DIMSUM_SQL = (
    "WITH " + _NW_CTE.strip()
    + f""",
kept AS (
  SELECT id, token, nw, least(1.0, {ROOT_GAMMA!r} / nrm) AS q
  FROM nw
  WHERE ('0x' || substr(md5(token || '|' || CAST(id AS VARCHAR)), 1, 15))::BIGINT
        / 1152921504606846976.0
        < least(1.0, {ROOT_GAMMA!r} / nrm)
)
SELECT a.id AS id1, b.id AS id2,
       sum(a.nw * b.nw / (a.q * b.q)) AS cosine_est
FROM kept a JOIN kept b ON a.token = b.token AND a.id < b.id
GROUP BY 1, 2
HAVING sum(a.nw * b.nw / (a.q * b.q)) >= {THRESHOLD}"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cosine_pairs_documents": cosine_pairs_documents,
    "cosine_pairs_dimsum_documents": cosine_pairs_dimsum_documents,
}

ORACLE_SQL: dict[str, str] = {
    "cosine_pairs_documents": COSINE_PAIRS_SQL,
    "cosine_pairs_dimsum_documents": COSINE_DIMSUM_SQL,
}
