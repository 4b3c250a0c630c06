"""Product-quantization contract query with a full hash-match oracle.

The codebooks are FROZEN literals (``contract_constants.PQ_CODEBOOKS``,
trained once with the engine's own K-Means and rounded), the same trick
the kmeans_* contracts use with literal centroids: both engines then
run byte-identical math, so codes AND ADC scores hash-match unrounded.

Both sides share fold order everywhere:

- per-code squared distance: zip → (x-y)² → left fold from 0.0
  (Spark ``aggregate``; DuckDB ``list_reduce(list_transform(...))`` —
  ``(0+v1)+v2+...`` ≡ ``(v1+v2)+...`` exactly in IEEE754);
- argmin: first index of the minimum (Spark ``array_position(d,
  array_min(d))``; DuckDB ``list_position(d, list_min(d))``) — equal
  floats in, equal code out, ties resolved identically;
- ADC: the m×n_codes LUT is computed ONCE in Python
  (``operators/pq.py::adc_lut``) and embedded as the same literal in
  both plans; the score is m chained lookups summed left-to-right.

The Spark side here is the pure-expression encoder (fine at m=4,
n_codes=8); the production encoder for large codebooks is the numpy
``mapInPandas`` kernel (``operators/pq.py::encode_pq``), whose parity
with this expression path is pinned by ``tests/test_pq.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contract_constants import EMBEDDING_CENTROIDS, PQ_CODEBOOKS
from ..functions.vectors import sq_dist_expr
from ..operators.pq import adc_lut
from ..sources.loaders import load_table

QUERY_VEC = EMBEDDING_CENTROIDS[0][1]
_M = len(PQ_CODEBOOKS)
_DSUB = len(PQ_CODEBOOKS[0][0])
_LUT = adc_lut(PQ_CODEBOOKS, QUERY_VEC)


def pq_adc_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector's PQ codes plus its ADC approximate squared
    distance to the fixed query — encode + score, all JVM expressions."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    out = [F.col("vec_id")]
    code_cols = []
    for j, book in enumerate(PQ_CODEBOOKS):
        s = F.slice(v, j * _DSUB + 1, _DSUB)
        darr = F.array(*[sq_dist_expr(s, F.array(*[F.lit(float(x)) for x in c])) for c in book])
        code = (F.array_position(darr, F.array_min(darr)) - 1).cast("long")
        code_cols.append(code)
        out.append(code.alias(f"code_{j}"))
    adc = None
    for j, code in enumerate(code_cols):
        lut_lit = F.array(*[F.lit(x) for x in _LUT[j]])
        term = F.element_at(lut_lit, (code + 1).cast("int"))
        adc = term if adc is None else adc + term
    out.append(adc.alias("adc_sq_dist"))
    return emb.select(*out)


def _vec_sql(vec) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"


def _sq_dist_sql(col: str, vec) -> str:
    return (
        f"list_reduce(list_transform(list_zip({col}, {_vec_sql(vec)}), "
        f"z -> (z[1]-z[2])*(z[1]-z[2])), (a, b) -> a + b)"
    )


def _oracle_sql() -> str:
    d_exprs = []
    for j, book in enumerate(PQ_CODEBOOKS):
        sub = f"(embedding::DOUBLE[])[{j * _DSUB + 1}:{(j + 1) * _DSUB}]"
        dlist = "[" + ", ".join(_sq_dist_sql(sub, c) for c in book) + "]"
        d_exprs.append(f"{dlist} AS d_{j}")
    codes = ", ".join(
        f"CAST(list_position(d_{j}, list_min(d_{j})) - 1 AS BIGINT) AS code_{j}"
        for j in range(_M)
    )
    # LUT values are full-precision computed doubles (17-digit reprs);
    # DuckDB parses bare numeric literals through DECIMAL, double-
    # rounding some of them 1 ulp off Python/Spark. A string→DOUBLE
    # cast parses in one correctly-rounded step, so scores stay
    # bit-identical.
    def lut_sql(row) -> str:
        return "[" + ", ".join(f"'{x!r}'::DOUBLE" for x in row) + "]"

    adc = " + ".join(f"({lut_sql(_LUT[j])})[code_{j} + 1]" for j in range(_M))
    return (
        f"SELECT vec_id, {', '.join(f'code_{j}' for j in range(_M))}, "
        f"{adc} AS adc_sq_dist FROM ("
        f"SELECT vec_id, {codes} FROM ("
        f"SELECT vec_id, embedding, {', '.join(d_exprs)} FROM embeddings))"
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pq_adc_embeddings": pq_adc_embeddings,
}

ORACLE_SQL: dict[str, str] = {
    "pq_adc_embeddings": _oracle_sql(),
}


# --------------------------------------------------------------------------
# IVF-PQ probe + exact re-rank — the two-stage ANN composition, in-plan
# --------------------------------------------------------------------------

#: query between coarse cells 1 and 2 so nprobe=2 exercises a real
#: multi-cell probe (a centroid itself would make cell 2 redundant)
IVFPQ_QUERY = [
    (a + b) / 2.0
    for a, b in zip(EMBEDDING_CENTROIDS[0][1], EMBEDDING_CENTROIDS[1][1])
]
_IVFPQ_K, _IVFPQ_NPROBE, _IVFPQ_REFINE = 10, 2, 4


def ivfpq_rerank_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-free IVF-PQ two-stage ANN (operators/pq.py::
    ivfpq_topk_expr): coarse-prune to the 2 cells nearest the query,
    ADC-score PQ residual codes, shortlist 40 by (ADC, id), exact
    re-rank to the top 10 — the FAISS IVFPQ+refine pattern as one
    hash-gated Catalyst plan."""
    from ..operators.pq import ivfpq_topk_expr

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk_expr(
        emb,
        EMBEDDING_CENTROIDS,
        PQ_CODEBOOKS,
        IVFPQ_QUERY,
        k=_IVFPQ_K,
        nprobe=_IVFPQ_NPROBE,
        refine_factor=_IVFPQ_REFINE,
    )


def _ivfpq_oracle_sql() -> str:
    from ..operators.pq import adc_lut
    from ..operators.similarity import probe_buckets

    cents = sorted(
        (int(c), [float(v) for v in vec]) for c, vec in EMBEDDING_CENTROIDS
    )
    probes = probe_buckets(cents, IVFPQ_QUERY, _IVFPQ_NPROBE)
    cmap = dict(cents)
    r_cut = _IVFPQ_K * _IVFPQ_REFINE

    # coarse assign: union arm per centroid, rn=1 picks (sq_dist, cid)
    arms = " UNION ALL ".join(
        f"SELECT em.vec_id, {cid} AS cid, "
        f"{_sq_dist_sql('em.embedding::DOUBLE[]', vec)} AS dc FROM embeddings em"
        for cid, vec in cents
    )
    cent_case = "CASE cid " + " ".join(
        f"WHEN {b} THEN {_vec_sql(cmap[b])}" for b in probes
    ) + " END"

    code_exprs = []
    for j in range(_M):
        sub = f"r[{j * _DSUB + 1}:{(j + 1) * _DSUB}]"
        dlist = "[" + ", ".join(
            _sq_dist_sql(sub, c) for c in PQ_CODEBOOKS[j]
        ) + "]"
        code_exprs.append(
            f"CAST(list_position({dlist}, list_min({dlist})) - 1 AS BIGINT)"
            f" AS code_{j}"
        )

    def lut_sql(row) -> str:
        return "[" + ", ".join(f"'{x!r}'::DOUBLE" for x in row) + "]"

    adc_arms = []
    for b in probes:
        lut = adc_lut(PQ_CODEBOOKS, [q - c for q, c in zip(IVFPQ_QUERY, cmap[b])])
        s = " + ".join(
            f"({lut_sql(lut[j])})[code_{j} + 1]" for j in range(_M)
        )
        adc_arms.append(f"WHEN {b} THEN {s}")
    adc_case = "CASE cid " + " ".join(adc_arms) + " END"

    exact_sq = _sq_dist_sql("em3.embedding::DOUBLE[]", IVFPQ_QUERY)
    probe_list = ", ".join(str(b) for b in probes)
    return f"""
WITH ranked AS (
  SELECT vec_id, cid, row_number()
    OVER (PARTITION BY vec_id ORDER BY dc, cid) AS rn
  FROM ({arms}) d
),
pruned AS (
  SELECT t.vec_id, t.cid,
    list_transform(
      list_zip(em2.embedding::DOUBLE[], {cent_case}),
      z -> z[1] - z[2]
    ) AS r
  FROM ranked t JOIN embeddings em2 ON em2.vec_id = t.vec_id
  WHERE t.rn = 1 AND t.cid IN ({probe_list})
),
coded AS (
  SELECT vec_id, cid, {', '.join(code_exprs)} FROM pruned
),
scored AS (
  SELECT vec_id, {adc_case} AS adc_sq_dist FROM coded
),
short AS (
  SELECT vec_id, adc_sq_dist,
    row_number() OVER (ORDER BY adc_sq_dist, vec_id) AS rs
  FROM scored
),
exact AS (
  SELECT s.vec_id, s.adc_sq_dist, {exact_sq} AS sq_dist,
    row_number() OVER (ORDER BY {exact_sq}, s.vec_id) AS re
  FROM short s JOIN embeddings em3 ON em3.vec_id = s.vec_id
  WHERE s.rs <= {r_cut}
)
SELECT vec_id, adc_sq_dist, sq_dist FROM exact WHERE re <= {_IVFPQ_K}
"""


QUERIES["ivfpq_rerank_topk_embeddings"] = ivfpq_rerank_topk_embeddings
ORACLE_SQL["ivfpq_rerank_topk_embeddings"] = _ivfpq_oracle_sql()
