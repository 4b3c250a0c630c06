"""Sparse all-pairs cosine contracts (operators/simpairs.py).

Both variants — exact and DIMSUM-sampled — are oracle-checked
value-for-value: the sampler's coin is md5 of (term, id1, id2), so
the "approximate" result is a deterministic function of the input
that DuckDB reproduces bit-for-bit. gamma=20 keeps sampling REAL at
sf0.01 (the largest norm products exceed it, so some pairs estimate
from a strict subset of their terms) while bounding the 1/p variance
inflation — smaller gammas let single inflated contributions from
low-norm pairs cross the threshold and the "near-dup" set balloons
(measured: 17k pairs at gamma=3 vs 187 at gamma=20 vs 22 exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ._sql_text import sql_tokens
from ..sources.loaders import load_table

THRESHOLD = 0.9
GAMMA = 20.0

_NW_CTE = f"""
toks AS (
  SELECT doc_id AS id, unnest({sql_tokens("text")}) AS token FROM documents
), tf AS (
  SELECT id, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
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

    w = doc_term_weights(load_table(spark, sf_dir, "documents"))
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
    """DIMSUM-sampled cosine estimate (gamma=3, >= 0.9) — the
    deterministic md5 coin makes a SAMPLED similarity join exactly
    reproducible in the oracle."""
    from ..operators.simpairs import cosine_pairs_dimsum, doc_term_weights

    w = doc_term_weights(load_table(spark, sf_dir, "documents"))
    return cosine_pairs_dimsum(
        w, term_col="token", w_col="w", threshold=THRESHOLD, gamma=GAMMA
    )


COSINE_DIMSUM_SQL = (
    "WITH " + _NW_CTE.strip()
    + f"""
SELECT id1, id2, sum(contrib) AS cosine_est
FROM (
  SELECT a.id AS id1, b.id AS id2,
         a.nw * b.nw / least(1.0, {GAMMA} / (a.nrm * b.nrm)) AS contrib
  FROM nw a JOIN nw b ON a.token = b.token AND a.id < b.id
  WHERE ('0x' || substr(md5(a.token || '|' || CAST(a.id AS VARCHAR)
                        || '|' || CAST(b.id AS VARCHAR)), 1, 15))::BIGINT
        / 1152921504606846976.0
        < least(1.0, {GAMMA} / (a.nrm * b.nrm))
)
GROUP BY 1, 2
HAVING sum(contrib) >= {THRESHOLD}"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cosine_pairs_documents": cosine_pairs_documents,
    "cosine_pairs_dimsum_documents": cosine_pairs_dimsum_documents,
}

ORACLE_SQL: dict[str, str] = {
    "cosine_pairs_documents": COSINE_PAIRS_SQL,
    "cosine_pairs_dimsum_documents": COSINE_DIMSUM_SQL,
}
