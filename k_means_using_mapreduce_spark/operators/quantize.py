"""Embedding scalar quantization (int8-range codes per dimension).

4 bytes/dim float32 → 1 byte/dim code is the difference between an ANN
index that fits executor memory and one that doesn't: at 100 TB of
embeddings, quantized codes cut the IVF probe working set
(operators/similarity.py) 4×, at a reconstruction error bounded by
scale/2 per dimension. This module implements the classic min/max
scalar quantizer; the codes column is Spark-native (array<int> holding
0..255 — parquet RLE/bit-packing stores it in ~1 byte/dim on disk).

Plan shapes:
- ``dim_stats``: posexplode → groupBy(dim). Partial aggregation
  reduces map-side, so the shuffle carries partitions × D rows, not
  N × D.
- ``quantize_vectors``: the D-entry (min, scale) table is collected to
  the driver (D floats — trivially small) and folded into the plan as
  array LITERALS, so quantization itself is a narrow whole-stage-
  codegen projection: no join, no shuffle, no Python.

Determinism: codes use round-half-up on non-negative operands, which
DuckDB's round-half-away matches exactly — the contract value-hashes
per-dim stats AND reconstruction error against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F

LEVELS = 255  # codes span 0..255 inclusive


def dim_stats(df: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``(dim, dmin, dmax, scale)`` over the corpus.

    ``scale = (dmax - dmin) / 255``; a constant dimension gets
    scale = 0.0 and quantizes to code 0 everywhere."""
    exploded = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    return (
        exploded.groupBy("dim")
        .agg(F.min("v").alias("dmin"), F.max("v").alias("dmax"))
        .withColumn("scale", (F.col("dmax") - F.col("dmin")) / F.lit(float(LEVELS)))
    )


def _as_stats_rows(stats) -> list:
    """Normalize a dim_stats DataFrame OR an already-collected row list
    to sorted, validated rows (so multi-consumer callers collect the
    expensive aggregation exactly once)."""
    rows = stats if isinstance(stats, list) else stats.collect()
    rows = sorted(rows, key=lambda r: r["dim"])
    if not rows:
        raise ValueError("dim_stats is empty — no vectors to fit scales on")
    if [r["dim"] for r in rows] != list(range(len(rows))):
        raise ValueError("dim_stats must cover dims 0..D-1 exactly")
    return rows


def quantize_vectors(
    df: DataFrame,
    stats: DataFrame | list | None = None,
    *,
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """Append an integer-code column: ``round((v - dmin) / scale)``
    clamped to [0, 255], per dimension.

    ``stats`` defaults to :func:`dim_stats` of ``df`` itself; pass a
    precomputed stats frame — or its collected rows — to quantize a NEW
    batch with the corpus' scales (the only correct way to quantize
    queries at search time).
    """
    if stats is None:
        stats = dim_stats(df, vec_col=vec_col)
    rows = _as_stats_rows(stats)
    mins = F.array(*[F.lit(float(r["dmin"])) for r in rows])
    scales = F.array(*[F.lit(float(r["scale"])) for r in rows])

    def code(x, i):
        raw = F.when(
            F.element_at(scales, i + 1) == 0.0, F.lit(0.0)
        ).otherwise(
            F.round((x - F.element_at(mins, i + 1)) / F.element_at(scales, i + 1), 0)
        )
        return F.least(F.greatest(raw, F.lit(0.0)), F.lit(float(LEVELS))).cast("int")

    vec = F.col(vec_col).cast("array<double>")
    return df.withColumn(codes_col, F.transform(vec, code))


def dequantize(
    codes: F.Column | str, stats_rows: list, *, col_name: str = "approx"
) -> F.Column:
    """Reconstruct ``dmin + code * scale`` from a codes column and the
    collected dim_stats rows (driver-side literals, narrow projection).
    Rows are validated to cover dims 0..D-1 exactly — duplicated stats
    (e.g. an appended-to stats table) would otherwise misalign every
    dimension silently."""
    rows = _as_stats_rows(stats_rows)
    mins = F.array(*[F.lit(float(r["dmin"])) for r in rows])
    scales = F.array(*[F.lit(float(r["scale"])) for r in rows])
    c = F.col(codes) if isinstance(codes, str) else codes
    return F.transform(
        c,
        lambda x, i: F.element_at(mins, i + 1)
        + x.cast("double") * F.element_at(scales, i + 1),
    ).alias(col_name)


def quantization_error_stats(
    df: DataFrame, *, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension reconstruction-error profile:
    ``(dim, dmin, dmax, scale, avg_abs_err, max_abs_err)``.

    max_abs_err must stay ≤ scale/2 + float slack — the quantizer's
    contract, pinned in tests and checked against the oracle."""
    # collect the expensive aggregation ONCE; both consumers take rows
    rows = _as_stats_rows(dim_stats(df, vec_col=vec_col))
    quant = quantize_vectors(df, rows, vec_col=vec_col)
    recon = quant.select(
        F.col(vec_col).cast("array<double>").alias("_v"),
        dequantize("codes", rows, col_name="_a"),
    )
    err = recon.select(
        F.posexplode(
            F.zip_with("_v", "_a", lambda v, a: F.abs(v - a))
        ).alias("dim", "abs_err")
    )
    per_dim = err.groupBy("dim").agg(
        F.avg("abs_err").alias("avg_abs_err"),
        F.max("abs_err").alias("max_abs_err"),
    )
    stats_df = _k_row_df(df.sparkSession, 
        [(r["dim"], r["dmin"], r["dmax"], r["scale"]) for r in rows],
        "dim int, dmin double, dmax double, scale double",
    )
    return F.broadcast(stats_df).join(per_dim, "dim").select(
        "dim", "dmin", "dmax", "scale", "avg_abs_err", "max_abs_err"
    )
