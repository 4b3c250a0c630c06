"""Multimodal (image/audio/video) column plumbing.

North-star extension (BASELINE.json): treat media as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``. The container has no image/audio codecs, so the decode
kernels are STUBBED (deterministic fake features, clearly marked) — but
everything Spark-side is real and tested: schemas, batch iteration,
partition sizing, UDF signatures, and the downstream handoff into the
embedding/K-Means/similarity operators.

Design for 100 TB of media:
- media rows are big (MBs) — ``rows_per_batch`` keeps Arrow batches
  bounded instead of letting Spark's default batch size OOM the Python
  workers; repartition by size before heavy decode so each task holds
  a bounded byte budget.
- decode → feature-extract emits *small* rows (id + embedding + meta),
  so the expensive binary column is dropped as early as possible and
  never shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema for a multimodal asset table — binary payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB decode kernel. A real deployment would decode the image/
    audio (PIL/torchaudio/ffmpeg — not in this container) and run a
    feature extractor. This deterministic fake hashes byte windows so
    the full pipeline (schema, batching, downstream clustering) is
    exercised end-to-end with stable outputs.
    """
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    out = []
    n = len(payload)
    for i in range(dim):
        # mean of a strided byte slice, scaled to [0, 1)
        sl = payload[i::dim]
        out.append((sum(sl) / (255.0 * len(sl))) if sl else 0.0)
    return out


def extract_features(
    media: DataFrame, rows_per_batch: int = 64, dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``.

    The iterator-of-batches form processes bounded Arrow batches and
    drops the binary payload before returning — the output rows are
    ~100 B regardless of input media size.

    The decode kernel is a *nested* function so cloudpickle serializes
    it by value — Spark's Python workers need no import of this package
    (a module-level reference breaks any driver not launched from the
    repo root).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # local import: runs on executor workers

        def decode(payload, d=dim):
            # keep in sync with _fake_decode_features (module-level twin
            # used for driver-side golden checks)
            if payload is None or len(payload) == 0:
                return [0.0] * d
            out = []
            for i in range(d):
                sl = payload[i::d]
                out.append((sum(sl) / (255.0 * len(sl))) if sl else 0.0)
            return out

        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"],
                        "media_type": chunk["media_type"],
                        "n_bytes": chunk["payload"].map(
                            lambda p: 0 if p is None else len(p)
                        ).astype("int32"),
                        "feature": chunk["payload"].map(decode),
                    }
                )

    return media.mapInPandas(decode_batches, schema=FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — STUB. Real kernel requires an image
    codec; raises at *execution* time so the plan (schema, metadata
    update) is still buildable and testable."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires an image codec (PIL/opencv), not "
            "available in this container; Spark-side plumbing is real"
        )
        yield  # pragma: no cover

    out_schema = MEDIA_SCHEMA
    return media.mapInPandas(resize_batches, schema=out_schema)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — STUB (needs ffmpeg). Output contract: one
    row per sampled frame, payload = encoded frame."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "frame sampling requires ffmpeg, not available in this "
            "container; Spark-side plumbing is real"
        )
        yield  # pragma: no cover

    return media.mapInPandas(sample_batches, schema=MEDIA_SCHEMA)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes are
    a seeded function of asset_id (no RNG at execution time)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("asset_id"),
            F.when(F.col("id") % 3 == 0, "image")
            .when(F.col("id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("media_type"),
            F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512)
            .cast("binary")
            .alias("payload"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
        )
    )


#: Magic-byte prefixes for container sniffing — stdlib-only, no codecs.
MAGIC_PREFIXES: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),  # wav/avi/webp share the RIFF envelope
    (b"ID3", "mp3"),
    (b"\x1a\x45\xdf\xa3", "matroska"),  # mkv/webm
    (b"OggS", "ogg"),
]


def byte_stats(
    media: DataFrame,
    *,
    payload_col: str = "payload",
    rows_per_batch: int = 64,
) -> DataFrame:
    """REAL (non-stub) byte-level media kernels — the codec-free
    subset of media quality filtering, all computable from the raw
    payload with the stdlib:

    - ``n_bytes`` — payload size.
    - ``entropy_bits`` — Shannon entropy of the byte histogram in
      [0, 8]; well-encoded media sits near 8, text/filler far below.
    - ``zlib_ratio`` — ``len(zlib.compress(payload, 6)) / n_bytes``:
      a redundancy probe (already-compressed formats ≈ 1, corrupt or
      padded payloads compress away). The cheap "is this actually
      media or junk" gate crawls run before any expensive decode.
    - ``sniffed_format`` — magic-byte container guess (NULL when no
      prefix matches), the decode-router key.

    Arrow-batched ``mapInPandas`` with the same bounded
    ``rows_per_batch`` discipline as extract_features; emits small
    rows and drops the payload immediately. Deterministic (zlib level
    pinned), so results are retry-stable — but NOT SQL-expressible,
    so the contract is the driver's rows-only check plus the unit
    tests' closed-form payloads."""
    import math
    import zlib

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("entropy_bits", T.DoubleType(), True),
            T.StructField("zlib_ratio", T.DoubleType(), True),
            T.StructField("sniffed_format", T.StringType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[payload_col]
                if payload is None:
                    rows.append(
                        (r["asset_id"], r["media_type"], None, None, None, None)
                    )
                    continue
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    rows.append(
                        (r["asset_id"], r["media_type"], 0, 0.0, None, None)
                    )
                    continue
                counts: dict[int, int] = {}
                for byte in b:
                    counts[byte] = counts.get(byte, 0) + 1
                ent = -sum(
                    (c / n) * math.log2(c / n) for c in counts.values()
                )
                ratio = len(zlib.compress(b, 6)) / n
                fmt = next(
                    (name for magic, name in MAGIC_PREFIXES if b.startswith(magic)),
                    None,
                )
                rows.append(
                    (r["asset_id"], r["media_type"], n, ent, ratio, fmt)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "media_type",
                    "n_bytes",
                    "entropy_bits",
                    "zlib_ratio",
                    "sniffed_format",
                ],
            )

    bounded = media.select("asset_id", "media_type", payload_col)
    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(rows_per_batch)
    )
    return bounded.mapInPandas(kernel, out_schema)
