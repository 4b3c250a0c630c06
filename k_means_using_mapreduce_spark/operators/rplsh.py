"""Random-hyperplane (sign) LSH over embedding columns.

The embedding-space twin of the text SimHash (operators/dedup.py):
each of ``bits`` hyperplanes contributes the sign of its dot product
with the vector (Charikar 2002 — P[bits agree] = 1 - θ/π), signs pack
into per-band integer bucket keys, and near-duplicate candidates are
pairs sharing a band bucket — per-bucket quadratic only, the same
banding scale story as MinHash-LSH.

Hyperplane components are md5-derived uniforms in [-1, 1], NOT
rand()/numpy RNG: the planes are a pure function of (seed, bit, dim),
so signatures are retry-stable, identical run-to-run, and — unlike
MLlib's BucketedRandomProjectionLSH — exactly reproducible in the
DuckDB oracle (the plane constants embed as literals on both sides).
Uniform components give the same sign-LSH guarantee as gaussians for
the collision-probability MONOTONICITY that banding needs (rotational
invariance is lost, but ranking by angle survives — pinned by a
property test).

Scale: signatures are a narrow codegen projection (bits × dim
multiply-adds per row, no shuffle); the band explode emits ``bands``
8-byte keys per vector; the candidate join shuffles (band, bucket)
ints, never vectors.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_hyperplanes(
    dim: int, bits: int, *, seed: int = 42
) -> list[list[float]]:
    """``bits`` hyperplanes of ``dim`` md5-derived uniform components
    in [-1, 1] — deterministic, engine-portable plane constants."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if bits < 1:
        raise ValueError(f"bits must be >= 1, got {bits}")
    planes = []
    for j in range(bits):
        row = []
        for d in range(dim):
            h = int(
                hashlib.md5(f"rp:{seed}:{j}:{d}".encode()).hexdigest()[:15], 16
            )
            row.append((h / float(1 << 60)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def rp_signature_bits(vec_col, planes: list[list[float]]):
    """List of 0/1 sign bits (one per plane) for an array<double>
    column — ``1`` iff the dot product is >= 0. Pure fold
    expressions; the plane literals fold into the plan."""
    from ..functions.vectors import dot_expr

    bits = []
    for row in planes:
        lit = F.array(*[F.lit(float(v)) for v in row])
        bits.append(
            (dot_expr(vec_col, lit) >= 0).cast("int")
        )
    return bits


def _sign_bits_rows(
    df: DataFrame, id_col: str, vec_col: str, planes: list[list[float]]
) -> DataFrame:
    """``(id, bits array<int>)`` — the sign bit per hyperplane, via an
    Arrow-batched kernel whose per-dimension SEQUENTIAL accumulation
    (``acc += X[:, d] * p[d]`` in ascending d, 0.0-seeded) reproduces
    ``dot_expr``'s left fold bit-for-bit while vectorizing across rows
    — the expression path evaluates bits x dim interpreted folds per
    row and dominated the LSH stage cost. Null or wrong-length vectors
    yield NULL bits (the fold's null semantics)."""
    dim = len(planes[0])

    def gen(batches):
        import numpy as np
        import pandas as pd

        P = [list(map(float, row)) for row in planes]

        for pdf in batches:
            vecs = list(pdf[vec_col])
            ok = np.array(
                [v is not None and len(v) == dim for v in vecs], dtype=bool
            )
            n_ok = int(ok.sum())
            out = [None] * len(vecs)
            if n_ok:
                X = np.asarray(
                    [v for v, o in zip(vecs, ok) if o], dtype=np.float64
                )
                sigs = np.empty((n_ok, len(P)), dtype=np.int32)
                for j, row in enumerate(P):
                    acc = np.zeros(n_ok, dtype=np.float64)
                    for d in range(dim):
                        acc = acc + X[:, d] * row[d]
                    sigs[:, j] = (acc >= 0.0).astype(np.int32)
                it = iter(sigs.tolist())
                for i, o in enumerate(ok):
                    if o:
                        out[i] = next(it)
            yield pd.DataFrame({"id": pdf[id_col], "bits": out})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(gen, f"id {id_type}, bits array<int>")


def rp_bands(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Banded sign-LSH keys: ``(id, band, bucket)`` with ``bits/bands``
    sign bits packed into each band's integer bucket. Two vectors
    land in the same (band, bucket) iff that band's bits all agree —
    probability ``(1 - θ/π)^(bits/bands)`` per band, the standard
    LSH S-curve. ``dim`` defaults to the first row's vector length
    (one tiny job)."""
    if bits % bands != 0:
        raise ValueError(f"bands ({bands}) must divide bits ({bits})")
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("input is empty and dim was not given")
        dim = first["d"]
    planes = random_hyperplanes(dim, bits, seed=seed)
    sig_rows = _sign_bits_rows(df, id_col, vec_col, planes)
    per_band = bits // bands
    rows = []
    for b in range(bands):
        bucket = F.lit(0)
        for i in range(per_band):
            bucket = bucket * 2 + F.element_at(
                F.col("bits"), b * per_band + i + 1
            )
        rows.append(
            F.struct(F.lit(b).alias("band"), bucket.cast("long").alias("bucket"))
        )
    return sig_rows.select(
        "id", F.explode(F.array(*rows)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def rp_candidate_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Distinct candidate pairs (id1 < id2) sharing at least one band
    bucket — feed to an exact verifier (similarity.topk /
    dedup.embedding_near_dup's cosine) like every LSH family here."""
    # materialize the band keys once: both self-join sides (and the
    # downstream distinct) otherwise re-evaluate the bits x dim sign
    # projections per branch — the semdedup lesson applied to LSH
    keys = rp_bands(
        df, id_col=id_col, vec_col=vec_col, bits=bits, bands=bands, seed=seed
    ).localCheckpoint()
    a = keys.select("band", "bucket", F.col("id").alias("id1"))
    b = keys.select("band", "bucket", F.col("id").alias("id2"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def rp_signatures(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 32,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Whole signature packed into one long: ``(id, sig)`` with bit j
    of ``sig`` = plane j's sign. ``bits <= 62`` (signed long). The
    compact form the Hamming verifier works on — 8 bytes per vector
    regardless of dimension."""
    if bits > 62:
        raise ValueError(f"bits must be <= 62 to fit a long, got {bits}")
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("input is empty and dim was not given")
        dim = first["d"]
    planes = random_hyperplanes(dim, bits, seed=seed)
    sig_rows = _sign_bits_rows(df, id_col, vec_col, planes)
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig * 2 + F.element_at(F.col("bits"), j + 1).cast("long")
    return sig_rows.select("id", sig.alias("sig"))


def rp_hamming_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 32,
    bands: int = 4,
    seed: int = 42,
    max_hamming: int = 8,
) -> DataFrame:
    """The full sign-LSH pipeline: banded candidates
    (:func:`rp_candidate_pairs`) verified by Hamming distance between
    packed signatures — ``(id1, id2, hamming)`` with ``hamming <=
    max_hamming``. The verify stage joins two 8-byte signature
    columns onto the candidate pairs and computes
    ``bit_count(sig1 XOR sig2)`` — codegen bit ops, no vectors ever
    re-read. ``hamming/bits ≈ θ/π``, so the threshold is an angle
    bound in disguise."""
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    cand = rp_candidate_pairs(
        df, id_col=id_col, vec_col=vec_col, bits=bits, bands=bands, seed=seed
    )
    sigs = rp_signatures(
        df, id_col=id_col, vec_col=vec_col, bits=bits, seed=seed
    ).localCheckpoint()
    s1 = sigs.select(F.col("id").alias("id1"), F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("id").alias("id2"), F.col("sig").alias("sig2"))
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.bit_count(
                F.col("sig1").bitwiseXOR(F.col("sig2"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
