"""Product quantization (PQ) for embedding compression and ANN.

Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the compression layer behind FAISS IVF-PQ,
ScaNN and Milvus. A d-dim vector splits into ``m`` subvectors; each
subspace gets its own ``n_codes``-entry codebook (trained with THIS
engine's K-Means core — the reference's algorithm is the codebook
trainer), and a vector is stored as ``m`` small ints: a 64-dim float32
corpus at m=8 compresses 32×.

Query scoring is ADC (asymmetric distance computation): the query stays
full precision; its squared distance to every codeword of every
subspace is an ``m × n_codes`` table computed driver-side (tiny), and a
row's approximate distance is m table lookups — in Spark a
literal-folded ``zip_with`` + ``aggregate``, whole-stage-codegen'd,
no UDF in the scoring path.

Scale shape:

- **training**: m K-Means fits over a deterministic hash sample (the
  codebooks are statistics; a small sample of 100 TB is enough and the
  sample is retry/repartition-stable, operators/sampling.py). Each fit
  is the fused zero-shuffle kernel.
- **encoding**: ONE Arrow-batched ``mapInPandas`` pass; per batch, m
  argmin GEMMs of (batch × n_codes) — the same kernel shape as the
  fused Lloyd assign. Output is (id, ``codes array<int>``), m ints/row.
- **scoring**: narrow projection over the codes table (the LUT folds in
  as an array-of-arrays literal of m·n_codes doubles) →
  TakeOrderedAndProject. Corpus bytes read per query ∝ m, not d.
- **refine**: broadcast semi-join of the ~k·refine candidate ids
  against the full-precision vectors — the same recall-recovery stage
  as ``similarity.ivf_topk_refined``; full-precision bytes read ∝
  k·refine rows, not corpus size.

Compose with IVF by bucketing the codes table on the coarse cid
(``similarity.build_ivf_index`` layout) — partition pruning and PQ
compression multiply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: codebooks[j] = list of n_codes subvectors for subspace j; the code
#: for subspace j is an index into codebooks[j].
PQCodebooks = list[list[list[float]]]


def train_pq_codebooks(
    df: DataFrame,
    *,
    m: int = 8,
    n_codes: int = 256,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    sample_key: str | None = None,
    sample_keep: int = 100,
) -> PQCodebooks:
    """Train per-subspace codebooks with the engine's K-Means.

    The input dimension must divide evenly by ``m`` (PQ's standard
    contract). ``sample_key``/``sample_keep`` train on the
    deterministic ``sample_keep``% hash sample by that key column —
    at corpus scale the codebooks are distribution statistics and a
    sample is sufficient; determinism keeps retrains reproducible.

    Cost: m sequential fused fits on the cached slice projections —
    each fit collects only n_codes × (d/m) floats per iteration.
    """
    from .kmeans import kmeans_fit
    from .sampling import hash_sample

    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if n_codes < 2:
        raise ValueError(f"n_codes must be >= 2, got {n_codes}")
    first = df.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull()).first()
    if first is None:
        raise ValueError("Data not found or empty")
    d = len(first["v"])
    if d % m != 0:
        raise ValueError(f"vector dim {d} is not divisible by m={m} subspaces")
    dsub = d // m
    train = df
    if sample_key is not None and sample_keep < 100:
        train = hash_sample(df, sample_key, keep=sample_keep)
    vec = F.col(vec_col).cast("array<double>")
    train = train.select(vec.alias("v")).filter(
        F.col("v").isNotNull() & (F.size("v") == d)
    ).cache()
    try:
        books: PQCodebooks = []
        for j in range(m):
            sub = train.select(F.slice("v", j * dsub + 1, dsub).alias("features"))
            fit = kmeans_fit(
                sub, n_codes, seed=seed + j, max_iter=max_iter, engine="fused"
            )
            # code = position in cid-sorted order (cids are 1..n_codes)
            books.append(
                [vecs for _, vecs in sorted(fit.centroids, key=lambda t: t[0])]
            )
        return books
    finally:
        train.unpersist()


def _validate_books(codebooks: PQCodebooks) -> tuple[int, int, int]:
    """(m, n_codes, dsub), enforcing rectangular shape."""
    m = len(codebooks)
    if m == 0:
        raise ValueError("codebooks must be non-empty")
    n_codes = len(codebooks[0])
    dsub = len(codebooks[0][0])
    for j, book in enumerate(codebooks):
        if len(book) != n_codes or any(len(c) != dsub for c in book):
            raise ValueError(f"codebook {j} is not {n_codes}×{dsub} rectangular")
    return m, n_codes, dsub


def encode_pq(
    df: DataFrame,
    codebooks: PQCodebooks,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices.

    One Arrow-batched ``mapInPandas`` pass; per batch and subspace, an
    argmin over the (batch × n_codes) distance GEMM — the fused-Lloyd
    kernel shape, numpy throughout. Rows with NULL or wrong-dimension
    vectors are dropped (the dense GEMM cannot hold them; same policy
    as the fused K-Means kernel, kmeans.py::_min_d2_to).
    """
    import numpy as np

    m, n_codes, dsub = _validate_books(codebooks)
    d = m * dsub
    C = np.asarray(codebooks, dtype=np.float64)  # (m, n_codes, dsub)
    src = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        cn = (C * C).sum(axis=2)  # (m, n_codes)
        for pdf in batches:
            if not len(pdf):
                continue
            keep = [
                i
                for i, v in enumerate(pdf["_v"])
                if v is not None and len(v) == d and not any(x is None for x in v)
            ]
            if not keep:
                continue
            X = np.asarray([pdf["_v"].iloc[i] for i in keep], dtype=np.float64)
            ids = pdf["_id"].iloc[keep].to_numpy()
            codes = np.empty((len(keep), m), dtype=np.int64)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                # ||s||² is constant per row in an argmin — skip it
                dist = cn[j][None, :] - 2.0 * (S @ C[j].T)
                codes[:, j] = dist.argmin(axis=1)
            yield pd.DataFrame({"_id": ids, "codes": list(codes)})

    out = src.mapInPandas(gen, f"_id {src.schema['_id'].dataType.simpleString()}, codes array<int>")
    return out.withColumnRenamed("_id", id_col)


def adc_lut(codebooks: PQCodebooks, query: Sequence[float]) -> list[list[float]]:
    """The m × n_codes ADC table: squared distance from each query
    subvector to each codeword — driver-side, m·n_codes·dsub flops."""
    m, n_codes, dsub = _validate_books(codebooks)
    if len(query) != m * dsub:
        raise ValueError(
            f"query dim {len(query)} != codebook dim {m * dsub}"
        )
    lut = []
    for j in range(m):
        q = query[j * dsub : (j + 1) * dsub]
        lut.append(
            [
                float(sum((a - b) ** 2 for a, b in zip(c, q)))
                for c in codebooks[j]
            ]
        )
    return lut


def adc_score_expr(lut: list[list[float]], codes_col: str = "codes"):
    """Approximate squared distance as a pure JVM expression:
    ``zip_with(codes, LUT, (c, t) -> t[c]) |> aggregate(sum)``. The LUT
    is literal-folded; whole-stage codegen, no Python in the scan."""
    lut_lit = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in lut]
    )
    parts = F.zip_with(
        F.col(codes_col),
        lut_lit,
        lambda c, t: F.element_at(t, c + F.lit(1)),
    )
    return F.aggregate(parts, F.lit(0.0), lambda acc, x: acc + x)


def pq_topk(
    codes: DataFrame,
    codebooks: PQCodebooks,
    query: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC approximate squared distance (ascending; ties by id).

    Plan: scan of the m-int codes table → narrow literal-LUT projection
    → TakeOrderedAndProject. No shuffle beyond the k-row gather.
    """
    score = adc_score_expr(adc_lut(codebooks, query))
    return (
        codes.select(F.col(id_col).alias(id_col), score.alias("adc_sq_dist"))
        .orderBy(F.col("adc_sq_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_topk_refined(
    codes: DataFrame,
    vectors: DataFrame,
    codebooks: PQCodebooks,
    query: Sequence[float],
    k: int = 10,
    *,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ search: ADC for ``k × refine_factor`` candidates
    (m-byte reads), exact squared-distance re-rank of just those rows
    against the full-precision ``vectors`` (broadcast semi-join — the
    same recall-recovery stage as ``similarity.ivf_topk_refined``)."""
    from ..functions.vectors import sq_dist_to_literal

    if refine_factor < 1:
        raise ValueError(f"refine_factor must be >= 1, got {refine_factor}")
    cand = pq_topk(
        codes, codebooks, query, k=k * refine_factor, id_col=id_col
    ).select(id_col)
    exact = vectors.join(F.broadcast(cand), id_col)
    score = sq_dist_to_literal(F.col(vec_col).cast("array<double>"), list(query))
    return (
        exact.select(F.col(id_col).alias(id_col), score.alias("sq_dist"))
        .orderBy(F.col("sq_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_error_stats(
    df: DataFrame,
    codebooks: PQCodebooks,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row reconstruction-error summary (mean / max squared error,
    rows encoded): encode + decode in the same numpy pass, aggregate
    the per-row errors — the PQ twin of
    ``quantize.quantization_error_stats``."""
    import numpy as np

    m, n_codes, dsub = _validate_books(codebooks)
    d = m * dsub
    C = np.asarray(codebooks, dtype=np.float64)
    src = df.select(F.col(vec_col).cast("array<double>").alias("_v"))

    def gen(batches):
        import numpy as np
        import pandas as pd

        cn = (C * C).sum(axis=2)
        for pdf in batches:
            vs = [
                v
                for v in pdf["_v"]
                if v is not None and len(v) == d and not any(x is None for x in v)
            ]
            if not vs:
                continue
            X = np.asarray(vs, dtype=np.float64)
            err = np.zeros(len(X))
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                dist = (
                    (S * S).sum(axis=1)[:, None]
                    - 2.0 * (S @ C[j].T)
                    + cn[j][None, :]
                )
                err += np.maximum(dist.min(axis=1), 0.0)
            yield pd.DataFrame({"sq_err": err})

    errs = src.mapInPandas(gen, "sq_err double")
    return errs.agg(
        F.count("*").alias("n_rows"),
        F.avg("sq_err").alias("mean_sq_err"),
        F.max("sq_err").alias("max_sq_err"),
    )
