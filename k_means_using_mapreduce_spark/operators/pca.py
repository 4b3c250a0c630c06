"""Distributed PCA over embedding columns: exact covariance by
aggregation, eigensolve on the driver, projection as expression
algebra.

The scale split follows the engine's model-vs-data doctrine
(operators/kmeans.py, operators/coreset.py): the DATA-sized work is
one aggregation producing the D×D covariance — O(N·D²) flops but only
D(D+1)/2 output rows — and the MODEL-sized work (eigendecomposition of
a 64×64 matrix) runs in numpy on the driver, where it belongs.
Projection back over the corpus is a narrow per-row expression (dot
products against literal component vectors — constant-folded, zero
shuffle), so "reduce 100 TB of embeddings to k dims" is scan → project
→ write, no shuffle at all.

Covariance uses the moment identity ``cov(i,j) = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)
/(n−1)`` over pair rows built from two position-explodes joined on the
row id — every term is a plain SUM, so a SQL oracle reproduces the
matrix and the pipeline needs no ml.linalg interop. (One-pass moment
subtraction loses precision when |μ| ≫ σ; embeddings are centered
near 0, and the contract pins the values against the oracle computing
the SAME identity.)

Eigen sign is canonicalized (largest-|coordinate| positive) so
components are deterministic across LAPACK builds up to that
convention.

The reference has no linear algebra beyond the 2-D distance
(mapper.py:62); PCA is part of the embedding toolkit the rebuild adds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot_expr


def covariance_matrix(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Upper-triangle sample covariance: ``(i, j, cov)`` for i ≤ j
    (0-based dims). Rows with a NULL vector are dropped; ``id_col``
    keys the dim-pair join."""
    expl = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_rid"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    a = expl.select(
        "_rid", F.col("pos").alias("i"), F.col("val").cast("double").alias("x")
    )
    b = expl.select(
        "_rid", F.col("pos").alias("j"), F.col("val").cast("double").alias("y")
    )
    pairs = a.join(b, "_rid").where(F.col("i") <= F.col("j"))
    n = F.count("*").cast("double")
    sx, sy, sxy = F.sum("x"), F.sum("y"), F.sum(F.col("x") * F.col("y"))
    return (
        pairs.groupBy("i", "j")
        .agg(
            F.when(n > 1, (sxy - sx * sy / n) / (n - 1)).otherwise(
                F.lit(0.0)
            ).alias("cov")
        )
    )


@dataclass
class PCAModel:
    components: list[list[float]]  # k rows of D coords, variance-ordered
    explained_variance: list[float]
    explained_variance_ratio: list[float]
    mean: list[float]


def pca_fit(df: DataFrame, vec_col: str, id_col: str, k: int) -> PCAModel:
    """Fit top-``k`` principal components. Driver state: the D×D
    covariance and the D means — model-sized."""
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    mu_rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .collect()
    )
    if not mu_rows:
        raise ValueError("cannot fit PCA on an empty input")
    d = len(mu_rows)
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality {d}")
    mean = [r["m"] for r in sorted(mu_rows, key=lambda r: r["pos"])]
    cov = np.zeros((d, d))
    for r in covariance_matrix(df, vec_col, id_col).collect():
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, evs = [], []
    total = float(np.sum(np.clip(vals, 0.0, None))) or 1.0
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:  # sign canon
            v = -v
        comps.append([float(x) for x in v])
        evs.append(max(0.0, float(vals[idx])))
    return PCAModel(
        components=comps,
        explained_variance=evs,
        explained_variance_ratio=[e / total for e in evs],
        mean=mean,
    )


def pca_project(
    df: DataFrame, vec_col: str, model: PCAModel, *, out_col: str = "pca"
) -> DataFrame:
    """Append ``out_col`` = array of k scores ``(x − μ)·cᵢ`` — a pure
    projection expression, constant-folded components, zero shuffle."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(m) for m in model.mean]),
        lambda x, m: x - m,
    )
    scores = [
        dot_expr(centered, F.array(*[F.lit(v) for v in comp]))
        for comp in model.components
    ]
    return df.withColumn(out_col, F.array(*scores))


def mahalanobis_scores(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    *,
    out_col: str = "maha2",
    min_variance: float = 1e-9,
) -> DataFrame:
    """Squared Mahalanobis distance from the fitted distribution —
    multivariate outlier scoring without a matrix inverse: with a FULL
    eigenbasis (``pca_fit(..., k=D)``), ``maha² = Σᵢ scoreᵢ²/λᵢ``
    (the whitened squared norm), so the driver never inverts Σ and the
    per-row cost is the same k dot products as :func:`pca_project`.

    Components with variance below ``min_variance`` are SKIPPED (a
    degenerate direction has no scale to measure distance in — scoring
    it would divide by ~0 and flag everything); the effective degrees
    of freedom is the number of retained components, returned for chi²
    calibration as ``(out_col, out_col + '_dof')``.

    Pass a truncated model (k < D) for the standard "PCA-Mahalanobis"
    variant that scores only the retained subspace.
    """
    kept = [
        (comp, ev)
        for comp, ev in zip(model.components, model.explained_variance)
        if ev > min_variance
    ]
    if not kept:
        raise ValueError(
            "no component exceeds min_variance — nothing to score"
        )
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(m) for m in model.mean]),
        lambda x, m: x - m,
    )
    total = None
    for comp, ev in kept:
        s = dot_expr(centered, F.array(*[F.lit(v) for v in comp]))
        term = s * s / F.lit(float(ev))
        total = term if total is None else total + term
    return df.withColumn(out_col, total).withColumn(
        f"{out_col}_dof", F.lit(len(kept))
    )


def effective_dim(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Participation ratio of the embedding covariance —
    ``PR = tr(C)² / tr(C²)`` — the effective dimensionality WITHOUT an
    eigendecomposition (``tr(C²) = Σᵢⱼ C²ᵢⱼ``, so both traces are pure
    aggregates of the covariance table and the whole diagnostic is
    SQL-exact, unlike :func:`pca_fit`'s numpy eigensolve). PR ≈ d for
    isotropic embeddings; PR ≪ d flags anisotropy collapse — the
    "all my vectors point the same way" failure mode every embedding
    pipeline should screen for (Ethayarajh 2019).

    Reuses :func:`covariance_matrix` (one _rid-keyed pair join —
    O(d²) state, d² rows per vector in flight); off-diagonal entries
    count twice in tr(C²) via symmetry.

    Returns one row ``(n_vecs, d, trace_var, effective_dim)``.
    """
    cov = covariance_matrix(df, vec_col, id_col)
    n_vecs = df.where(F.col(vec_col).isNotNull()).count()
    diag = F.col("i") == F.col("j")
    agg = cov.agg(
        (F.max("j") + F.lit(1)).cast("int").alias("d"),
        F.sum(F.when(diag, F.col("cov")).otherwise(0.0)).alias(
            "trace_var"
        ),
        F.sum(
            F.when(diag, F.col("cov") * F.col("cov")).otherwise(
                F.lit(2.0) * F.col("cov") * F.col("cov")
            )
        ).alias("_tr2"),
    )
    return agg.select(
        F.lit(n_vecs).cast("long").alias("n_vecs"),
        "d",
        "trace_var",
        (
            F.col("trace_var") * F.col("trace_var")
            / F.nullif(F.col("_tr2"), F.lit(0.0))
        ).alias("effective_dim"),
    )
