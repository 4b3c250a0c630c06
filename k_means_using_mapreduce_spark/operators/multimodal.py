"""Multimodal (image/audio/video) column plumbing.

North-star extension (BASELINE.json): treat media as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

What is REAL vs what needs a codec:

- :func:`resize_raw` (nearest/bilinear, pure numpy) and
  :func:`frame_sample_raw` (byte slicing) operate on RAW uncompressed
  pixel/frame buffers — fully working kernels, byte-level oracle
  contract (contracts/multimodal_queries.py::media_resize_nearest).
- :func:`byte_stats` (size/entropy/zlib/format-sniff) is real and
  codec-free.
- PNG (8-bit grayscale) decode is REAL — a pure-stdlib codec
  (operators/png.py, zlib + filter reversal) feeds
  :func:`extract_features` actual pixels end-to-end, oracle-checked
  by contracts/multimodal_queries.py::media_png_features.
- OTHER encoded containers (jpeg/mp4 …) need PIL/ffmpeg, absent from
  this container: for those :func:`extract_features` falls back to a
  clearly marked deterministic fake over the raw bytes, and
  raw-buffer kernels surface encoded or malformed payloads as
  NULL-payload rows instead of guessing.

Everything Spark-side is real and tested: schemas, batch iteration,
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

from ..sources.loaders import k_row_df as _k_row_df
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

    Decode is REAL for 8-bit grayscale PNG payloads, JPEG payloads —
    baseline AND progressive (round 9), grayscale AND 3-component
    YCbCr 4:4:4 / 4:2:0, reduced to the luma plane — and 16-bit PCM
    WAV payloads (stdlib codecs, operators/png.py +
    operators/jpeg.py): pixels/samples are decoded out of the actual
    container and the strided-window feature means run over real
    media data, end-to-end. Payloads in any other container (mp4,
    arithmetic-coded JPEG, exotic samplings, …) or malformed media
    fall through to the documented deterministic fake over the raw
    bytes, so the pipeline shape stays exercised either way.
    """

    from ..sources.loaders import fan_out

    media = fan_out(media)  # single-row-group scans decode on 1 core otherwise

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # local import: runs on executor workers

        from k_means_using_mapreduce_spark.operators.jpeg import (
            decode_jpeg_luma,
        )
        from k_means_using_mapreduce_spark.operators.png import (
            PNG_SIGNATURE,
            decode_png_gray,
            decode_wav_pcm16,
        )

        def decode(payload, d=dim):
            # keep in sync with _fake_decode_features (module-level twin
            # used for driver-side golden checks) for the opaque path
            if payload is None or len(payload) == 0:
                return [0.0] * d
            buf = bytes(payload)
            if buf[:8] == PNG_SIGNATURE:
                try:
                    _, _, buf = decode_png_gray(buf)
                except ValueError:
                    pass  # malformed image: treat as opaque bytes
            elif buf[:3] == b"\xff\xd8\xff":
                try:
                    # grayscale passes through; color (4:4:4 / 4:2:0
                    # YCbCr, round-8) decodes to its luma plane — the
                    # gray buffer a feature extractor wants
                    _, _, buf = decode_jpeg_luma(buf)
                except ValueError:
                    pass  # unsupported JPEG variant: opaque bytes
            elif buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
                try:
                    _, _, buf = decode_wav_pcm16(buf)
                except ValueError:
                    pass  # non-PCM/malformed audio: opaque bytes
            out = []
            for i in range(d):
                sl = buf[i::d]
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


def resize_raw(
    media: DataFrame,
    width: int,
    height: int,
    *,
    mode: str = "bilinear",
    channels: int = 1,
) -> DataFrame:
    """REAL image resize over RAW pixel buffers — pure numpy, no codec.

    Input contract: ``payload`` is an uncompressed ``height × width ×
    channels`` uint8 buffer (row-major) with the dimensions in the
    ``width``/``height`` metadata columns — the layout a decode stage
    emits. Encoded containers (png/jpeg/…) need a codec this container
    does not ship; such payloads (or any payload whose byte length
    disagrees with ``width·height·channels``) produce a NULL payload
    row with the ORIGINAL metadata, so malformed inputs are surfaced,
    never silently resized.

    Kernels (both half-pixel-center conventions, documented so the
    oracle can reproduce them):

    - ``mode="nearest"``: ``src = min(floor((dst + 0.5) · in/out),
      in − 1)`` per axis — output bytes are a pure SELECTION of input
      bytes, so results are byte-exact and SQL-checkable.
    - ``mode="bilinear"``: ``src = (dst + 0.5) · in/out − 0.5`` with
      edge clamping, float64 interpolation, then round-half-to-even
      (``np.rint``) back to uint8.

    Arrow-batched ``mapInPandas``; output metadata carries the new
    dimensions.
    """
    if width < 1 or height < 1:
        raise ValueError(f"target size must be >= 1x1, got {width}x{height}")
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if mode not in ("nearest", "bilinear"):
        raise ValueError(f"mode must be 'nearest' or 'bilinear', got {mode!r}")

    from ..sources.loaders import fan_out

    media = fan_out(media)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        def one(payload, w_in, h_in):
            if (
                payload is None
                or w_in is None
                or h_in is None
                or w_in < 1
                or h_in < 1
                or len(payload) != w_in * h_in * channels
            ):
                return None
            img = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(
                int(h_in), int(w_in), channels
            )
            if mode == "nearest":
                rows = np.minimum(
                    ((np.arange(height) + 0.5) * h_in / height).astype(np.int64),
                    h_in - 1,
                )
                cols = np.minimum(
                    ((np.arange(width) + 0.5) * w_in / width).astype(np.int64),
                    w_in - 1,
                )
                out = img[rows][:, cols]
            else:
                ry = (np.arange(height) + 0.5) * h_in / height - 0.5
                rx = (np.arange(width) + 0.5) * w_in / width - 0.5
                y0 = np.clip(np.floor(ry).astype(np.int64), 0, h_in - 1)
                x0 = np.clip(np.floor(rx).astype(np.int64), 0, w_in - 1)
                y1 = np.minimum(y0 + 1, h_in - 1)
                x1 = np.minimum(x0 + 1, w_in - 1)
                wy = np.clip(ry - y0, 0.0, 1.0)[:, None, None]
                wx = np.clip(rx - x0, 0.0, 1.0)[None, :, None]
                f = img.astype(np.float64)
                top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
                bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
                out = np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(
                    np.uint8
                )
            return out.tobytes()

        for pdf in batches:
            res = [
                one(p, w, h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": res,
                    "width": np.where(
                        [r is not None for r in res], width, pdf["width"]
                    ).astype("int32"),
                    "height": np.where(
                        [r is not None for r in res], height, pdf["height"]
                    ).astype("int32"),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.mapInPandas(resize_batches, schema=MEDIA_SCHEMA)


def frame_sample_raw(
    media: DataFrame,
    every_ms: int = 1000,
    *,
    channels: int = 1,
) -> DataFrame:
    """REAL video frame sampling over RAW concatenated frame buffers —
    pure byte slicing, no ffmpeg.

    Input contract: ``payload`` is ``n_frames`` back-to-back raw
    ``height × width × channels`` uint8 frames spanning
    ``duration_ms`` (the layout a demux/decode stage emits; containered
    codecs like mp4 stay out of scope without ffmpeg). One output row
    per sampled frame, ``frame_idx``/``ts_ms`` identifying it; frames
    are taken every ``ceil(every_ms / frame_period)`` frames starting
    at frame 0, so frame 0 is always kept and spacing never exceeds
    ``every_ms`` by more than one period. Rows whose byte length is
    not a whole number of frames are emitted once with NULL payload
    and ``frame_idx = -1`` (malformed input surfaced, not dropped).
    """
    if every_ms < 1:
        raise ValueError(f"every_ms must be >= 1, got {every_ms}")

    from ..sources.loaders import fan_out

    media = fan_out(media)

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.IntegerType(), True),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload, w, h, dur = (
                    r["payload"],
                    r["width"],
                    r["height"],
                    r["duration_ms"],
                )
                frame_sz = (
                    int(w) * int(h) * channels
                    if w is not None and h is not None
                    else 0
                )
                n = len(payload) if payload is not None else 0
                if frame_sz <= 0 or n == 0 or n % frame_sz != 0:
                    rows.append(
                        (r["asset_id"], r["media_type"], -1, None, None, w, h)
                    )
                    continue
                b = bytes(payload)
                n_frames = n // frame_sz
                period = (dur or 0) / n_frames if n_frames else 0.0
                step = (
                    max(1, math.ceil(every_ms / period)) if period > 0 else 1
                )
                for i in range(0, n_frames, step):
                    rows.append(
                        (
                            r["asset_id"],
                            r["media_type"],
                            i,
                            int(i * period) if period > 0 else None,
                            b[i * frame_sz : (i + 1) * frame_sz],
                            w,
                            h,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "media_type",
                    "frame_idx",
                    "ts_ms",
                    "payload",
                    "width",
                    "height",
                ],
            )

    return media.mapInPandas(sample_batches, schema=out_schema)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes are
    a seeded function of asset_id (no RNG at execution time). IMAGE
    rows carry REAL 8x8 grayscale PNGs and AUDIO rows REAL 16-bit PCM
    WAVs (operators/png.py codecs) and JPEG rows REAL baseline
    grayscale JPEGs (operators/jpeg.py), so all three extract_features
    decode paths are exercised end-to-end; video rows remain opaque
    seeded bytes (no stdlib video container exists)."""
    import hashlib

    from .jpeg import encode_jpeg_gray
    from .png import encode_png_gray, encode_wav_pcm16

    def _bytes(i: int, want: int) -> bytes:
        out = b""
        block = 0
        while len(out) < want:
            out += hashlib.sha256(
                f"{seed}:{i}:{block}".encode()
            ).digest()
            block += 1
        return out[:want]

    rows = []
    for i in range(n):
        kind = ("image", "image", "audio", "video")[i % 4]
        if kind == "image" and i % 4 == 0:
            payload = encode_png_gray(_bytes(i, 64), 8, 8)
            w = h = 8
        elif kind == "image":
            payload = encode_jpeg_gray(_bytes(i, 64), 8, 8)
            w = h = 8
        elif kind == "audio":
            payload = encode_wav_pcm16(_bytes(i, 64))
            w = h = 64
        else:
            payload = _bytes(i, 64)
            w = h = 64
        rows.append((i, kind, bytearray(payload), w, h, 1000))
    return _k_row_df(spark, 
        rows,
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
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

    from ..sources.loaders import fan_out

    bounded = fan_out(media.select("asset_id", "media_type", payload_col))
    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(rows_per_batch)
    )
    return bounded.mapInPandas(kernel, out_schema)
