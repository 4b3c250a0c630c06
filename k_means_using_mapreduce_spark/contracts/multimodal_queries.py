"""Multimodal contract queries — the binary-column plumbing, oracle-
checked.

PNG and WAV decode are REAL (pure-stdlib codecs, operators/png.py)
and hash-gated end-to-end by ``media_png_features`` /
``media_wav_features``; other containers' decode remains stubbed
(no PIL/ffmpeg in the container — see operators/multimodal.py). The Spark-side machinery a multimodal
pipeline needs is exercised against a DuckDB oracle here by deriving a
deterministic binary payload from the documents table: utf-8 bytes flow
through an Arrow-batched ``mapInPandas`` kernel (python ``hashlib``/
``len`` per payload) and must agree with DuckDB's ``md5``/
``octet_length`` on the same bytes — proving the binary column, batch
iteration, UDF schema, and metadata aggregation are all faithful.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loaders import fan_out, load_table


def media_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source asset stats over a binary payload column, computed by
    an Arrow-batched pandas kernel (the multimodal decode path with a
    hash standing in for the codec)."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        "source",
        F.encode("text", "utf-8").alias("payload"),
    )

    def gen(batches: "Iterator") -> "Iterator":
        import hashlib

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "source": pdf["source"],
                    "n_bytes": pdf["payload"].map(len),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    feats = fan_out(media).mapInPandas(
        gen, "asset_id long, source string, n_bytes int, digest string"
    )
    return feats.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.count_distinct("digest").alias("distinct_payloads"),
    )


MEDIA_BINARY_STATS_SQL = """
SELECT source, count(*) AS n_assets,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       count(DISTINCT md5(text)) AS distinct_payloads
FROM documents
GROUP BY source
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_binary_stats": media_binary_stats,
}

ORACLE_SQL: dict[str, str] = {
    "media_binary_stats": MEDIA_BINARY_STATS_SQL,
}


def media_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte-entropy profile through the REAL byte_stats
    kernel (operators/multimodal.py — entropy/zlib/sniffing, not the
    codec stubs): payloads are the documents' utf-8 bytes, and since
    the corpus is pure ASCII the oracle reproduces byte entropy from
    CHARACTER frequencies — an end-to-end value check of a
    mapInPandas kernel the oracle cannot express directly for true
    binary data. zlib_ratio/sniffed_format stay test-pinned (no SQL
    twin exists for zlib)."""
    from ..operators.multimodal import byte_stats

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.col("source").alias("media_type"),  # reuse the slot as the group
        F.encode("text", "utf-8").alias("payload"),
    )
    stats = byte_stats(media)
    return stats.groupBy(F.col("media_type").alias("source")).agg(
        F.count("*").alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("entropy_bits").alias("avg_entropy_bits"),
    )


MEDIA_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, source, unnest(string_split(text, '')) AS ch
  FROM documents
), freq AS (
  SELECT doc_id, source, ch, CAST(count(*) AS DOUBLE) AS c
  FROM chars GROUP BY 1, 2, 3
), tot AS (
  SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM freq GROUP BY 1
), ent AS (
  SELECT f.doc_id, f.source,
         -sum((c / n) * log2(c / n)) AS entropy_bits,
         any_value(n) AS n_bytes
  FROM freq f JOIN tot USING (doc_id)
  GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_assets,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       avg(entropy_bits) AS avg_entropy_bits
FROM ent GROUP BY source
"""

QUERIES["media_entropy_stats"] = media_entropy_stats
ORACLE_SQL["media_entropy_stats"] = MEDIA_ENTROPY_SQL


def _nearest_indices(in_sz: int, out_sz: int) -> list[int]:
    """Half-pixel-center nearest sources — the exact convention of
    operators/multimodal.py::resize_raw, reproduced driver-side so
    the oracle's byte positions come from the same formula, never
    hand transcription."""
    return [
        min(int((d + 0.5) * in_sz / out_sz), in_sz - 1) for d in range(out_sz)
    ]


#: resize contract geometry: md5 hex (32 ascii bytes) as a 4x8 gray
#: raw image, nearest-resized to 2x4.
_RZ_IN_W, _RZ_IN_H, _RZ_OUT_W, _RZ_OUT_H = 8, 4, 4, 2


def media_resize_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL raw-buffer image resize under the value-hash gate: each
    document's md5 hex (32 ascii bytes) is declared a 4x8 gray image,
    nearest-resized to 2x4 by the numpy kernel, and the resized BYTES
    are re-hashed — the oracle rebuilds the identical byte string by
    substr-selecting the hex chars at the convention's source offsets,
    so any drift in the resize convention or buffer layout flips the
    hash."""
    from ..operators.multimodal import MEDIA_SCHEMA, resize_raw

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.md5(F.encode("text", "utf-8")), "utf-8").alias("payload"),
        F.lit(_RZ_IN_W).alias("width"),
        F.lit(_RZ_IN_H).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    resized = resize_raw(media, _RZ_OUT_W, _RZ_OUT_H, mode="nearest")
    return resized.select(
        F.col("asset_id").alias("doc_id"),
        F.md5("payload").alias("resized_md5"),
        F.col("width").cast("int").alias("w"),
        F.col("height").cast("int").alias("h"),
    )


def _media_resize_sql() -> str:
    rows = _nearest_indices(_RZ_IN_H, _RZ_OUT_H)
    cols = _nearest_indices(_RZ_IN_W, _RZ_OUT_W)
    parts = [
        f"substr(h, {r * _RZ_IN_W + c + 1}, 1)" for r in rows for c in cols
    ]
    return f"""
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents)
SELECT doc_id, md5({' || '.join(parts)}) AS resized_md5,
       CAST({_RZ_OUT_W} AS INTEGER) AS w, CAST({_RZ_OUT_H} AS INTEGER) AS h
FROM hx
"""


QUERIES["media_resize_nearest"] = media_resize_nearest
ORACLE_SQL["media_resize_nearest"] = _media_resize_sql()


def media_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END real-codec contract (round-6: kills the last labeled
    fake): each document's md5 hex (32 ascii bytes) is declared a 4x8
    gray image and encoded as an actual PNG (operators/png.py, stdlib
    zlib) by one Arrow kernel; extract_features then sniffs the
    \\x89PNG magic, DECODES the container back to pixels, and emits
    the strided-window feature means. The oracle computes the same
    means directly from the hex chars' ascii codes — the hash matches
    only if encode → container → decode is byte-faithful."""
    from ..operators.multimodal import FEATURE_DIM, extract_features

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.md5(F.encode("text", "utf-8")).alias("hex"),
    )

    def encode(batches: "Iterator") -> "Iterator":
        import pandas as pd

        from ..operators.png import encode_png_gray

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "image",
                    "payload": pdf["hex"].map(
                        lambda h: encode_png_gray(h.encode("ascii"), 8, 4)
                    ),
                    "width": 8,
                    "height": 4,
                    "duration_ms": None,
                }
            )

    media = fan_out(src).mapInPandas(
        encode,
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    feats = extract_features(media, dim=FEATURE_DIM)
    return feats.select(
        F.col("asset_id").alias("doc_id"),
        F.posexplode("feature").alias("dim", "f"),
    ).select("doc_id", F.col("dim").cast("int").alias("dim"), "f")


MEDIA_PNG_FEATURES_SQL = """
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
dims AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS dim)
SELECT doc_id, dim,
  (ascii(substr(h, dim + 1, 1)) + ascii(substr(h, dim + 17, 1)))
    / (255.0 * 2) AS f
FROM hx CROSS JOIN dims
"""

QUERIES["media_png_features"] = media_png_features
ORACLE_SQL["media_png_features"] = MEDIA_PNG_FEATURES_SQL


def media_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END real AUDIO codec contract (the WAV sibling of
    media_png_features): each document's md5 hex (32 ascii bytes) is
    declared 16 little-endian PCM16 samples and wrapped in an actual
    WAV container (operators/png.py::encode_wav_pcm16, stdlib
    ``wave``); extract_features sniffs RIFF/WAVE, DECODES the frames
    back out, and emits the strided-window feature means. The oracle
    computes the same means from the hex chars directly — identical
    closed form to the PNG contract, so any header-offset or frame
    mis-decode flips the hash."""
    from ..operators.multimodal import FEATURE_DIM, extract_features

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.md5(F.encode("text", "utf-8")).alias("hex"),
    )

    def encode(batches: "Iterator") -> "Iterator":
        import pandas as pd

        from ..operators.png import encode_wav_pcm16

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "audio",
                    "payload": pdf["hex"].map(
                        lambda h: encode_wav_pcm16(h.encode("ascii"))
                    ),
                    "width": None,
                    "height": None,
                    "duration_ms": 4,
                }
            )

    media = fan_out(src).mapInPandas(
        encode,
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    feats = extract_features(media, dim=FEATURE_DIM)
    return feats.select(
        F.col("asset_id").alias("doc_id"),
        F.posexplode("feature").alias("dim", "f"),
    ).select("doc_id", F.col("dim").cast("int").alias("dim"), "f")


MEDIA_WAV_FEATURES_SQL = """
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
dims AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS dim)
SELECT doc_id, dim,
  (ascii(substr(h, dim + 1, 1)) + ascii(substr(h, dim + 17, 1)))
    / (255.0 * 2) AS f
FROM hx CROSS JOIN dims
"""

QUERIES["media_wav_features"] = media_wav_features
ORACLE_SQL["media_wav_features"] = MEDIA_WAV_FEATURES_SQL


def media_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END real JPEG codec contract (round-7: closes the
    dominant-real-format boundary): each document's md5 hex drives a
    BLOCK-CONSTANT 16x32 grayscale image (eight 8x8 blocks, block
    (bi,bj) = ascii(h[bi*2+bj])) encoded as an actual baseline JPEG
    (operators/jpeg.py); extract_features sniffs \\xff\\xd8\\xff,
    Huffman-decodes the entropy stream, dequantizes and IDCTs back to
    pixels, and emits strided-window means. Block-constant images have
    only DC energy, and the DC quantum is 1, so the round-trip is
    BIT-EXACT — the oracle predicts every decoded pixel from the hex
    chars' ascii codes. The hash matches only if marker parsing,
    canonical Huffman assignment, DC-diff coding, byte unstuffing and
    the IDCT are all faithful."""
    from ..operators.multimodal import FEATURE_DIM, extract_features

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.md5(F.encode("text", "utf-8")).alias("hex"),
    )

    def encode(batches: "Iterator") -> "Iterator":
        import pandas as pd

        from ..operators.jpeg import encode_jpeg_gray

        def mk(h: str) -> bytes:
            vals = [ord(ch) for ch in h[:8]]
            buf = b"".join(
                (bytes([vals[bi * 2]]) * 8 + bytes([vals[bi * 2 + 1]]) * 8)
                * 8
                for bi in range(4)
            )
            return encode_jpeg_gray(buf, 16, 32)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "image",
                    "payload": pdf["hex"].map(mk),
                    "width": 16,
                    "height": 32,
                    "duration_ms": None,
                }
            )

    media = fan_out(src).mapInPandas(
        encode,
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    feats = extract_features(media, dim=FEATURE_DIM)
    return feats.select(
        F.col("asset_id").alias("doc_id"),
        F.posexplode("feature").alias("dim", "f"),
    ).select("doc_id", F.col("dim").cast("int").alias("dim"), "f")


MEDIA_JPEG_FEATURES_SQL = """
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
dims AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS dim)
SELECT doc_id, dim,
  (ascii(substr(h, (dim // 8) + 1, 1)) + ascii(substr(h, (dim // 8) + 3, 1))
   + ascii(substr(h, (dim // 8) + 5, 1)) + ascii(substr(h, (dim // 8) + 7, 1)))
    / (255.0 * 4) AS f
FROM hx CROSS JOIN dims
"""

QUERIES["media_jpeg_features"] = media_jpeg_features
ORACLE_SQL["media_jpeg_features"] = MEDIA_JPEG_FEATURES_SQL


def media_jpeg_color_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """END-TO-END COLOR JPEG codec contract (round-8: 3-component
    YCbCr 4:2:0, the dominant real-corpus layout): each document's
    md5 hex drives a 16x32 RGB image of two MCU-aligned 16x16
    constant tiles — tile t is RGB (ascii(h[3t]), ascii(h[3t+1]),
    ascii(h[3t+2])). The kernel encodes an actual 4:2:0 baseline JPEG
    (operators/jpeg.py::encode_jpeg_color: JFIF RGB→YCbCr, 2x2 chroma
    box-downsample, MCU-interleaved Huffman) and decodes it back
    (chroma upsample + YCbCr→RGB), emitting per-tile channel means.

    Exactness lever: a tile constant over one full MCU is DC-only in
    every component — luma blocks are constant, and the 2x2 box
    average of a constant region is the value itself — so with DC
    quantum 1 the YCbCr round-trip is BIT-EXACT and the decoded RGB
    is exactly the double-rounded composition
    ycbcr_to_rgb(rgb_to_ycbcr(rgb)), which the oracle replays term
    for term as floor(x + 0.5) arithmetic. The hash matches only if
    color conversion, subsampling, interleaved entropy coding,
    per-component DC prediction, upsampling and reconstruction are
    all faithful."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        F.col("doc_id"),
        F.md5(F.encode("text", "utf-8")).alias("hex"),
    )

    def roundtrip(batches: "Iterator") -> "Iterator":
        import numpy as np
        import pandas as pd

        from ..operators.jpeg import decode_jpeg_color, encode_jpeg_color

        def tiles(h: str) -> list[tuple[float, float, float]]:
            rgb = bytearray()
            for t in range(2):
                px = bytes(ord(c) for c in h[3 * t : 3 * t + 3])
                rgb.extend(px * (16 * 16))
            enc = encode_jpeg_color(bytes(rgb), 16, 32, subsample="4:2:0")
            _, _, out = decode_jpeg_color(enc)
            # per-tile channel means (constant tiles -> mean == value);
            # exact: 256 uint8 sums fit int64, one float divide
            a = np.frombuffer(out, dtype=np.uint8).reshape(2, 256, 3)
            sums = a.astype(np.int64).sum(axis=1)
            return [tuple(sums[t] / 256.0) for t in range(2)]

        for pdf in batches:
            rows = {"doc_id": [], "tile": [], "r": [], "g": [], "b": []}
            for doc_id, h in zip(pdf["doc_id"], pdf["hex"]):
                for t, (rm, gm, bm) in enumerate(tiles(h)):
                    rows["doc_id"].append(doc_id)
                    rows["tile"].append(t)
                    rows["r"].append(rm)
                    rows["g"].append(gm)
                    rows["b"].append(bm)
            yield pd.DataFrame(rows)

    return fan_out(src).mapInPandas(
        roundtrip,
        "doc_id long, tile int, r double, g double, b double",
    )


def _jfif_roundtrip_sql(rs: str, gs: str, bs: str) -> str:
    """floor(x+0.5) double-rounded RGB→YCbCr→RGB, term-for-term the
    codec's _rgb_to_ycbcr/_ycbcr_to_rgb composition."""
    y = f"floor(0.299 * {rs} + 0.587 * {gs} + 0.114 * {bs} + 0.5)"
    cb = (
        f"floor(128.0 - 0.168736 * {rs} - 0.331264 * {gs} "
        f"+ 0.5 * {bs} + 0.5)"
    )
    cr = (
        f"floor(128.0 + 0.5 * {rs} - 0.418688 * {gs} "
        f"- 0.081312 * {bs} + 0.5)"
    )
    clamp = "least(255.0, greatest(0.0, floor({} + 0.5)))"
    return (
        clamp.format(f"({y}) + 1.402 * (({cr}) - 128)")
        + " AS r, "
        + clamp.format(
            f"({y}) - 0.344136 * (({cb}) - 128) "
            f"- 0.714136 * (({cr}) - 128)"
        )
        + " AS g, "
        + clamp.format(f"({y}) + 1.772 * (({cb}) - 128)")
        + " AS b"
    )


MEDIA_JPEG_COLOR_FEATURES_SQL = f"""
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
t AS (SELECT CAST(unnest(range(0, 2)) AS INTEGER) AS tile),
px AS (
  SELECT doc_id, tile,
         CAST(ascii(substr(h, 3 * tile + 1, 1)) AS DOUBLE) AS r0,
         CAST(ascii(substr(h, 3 * tile + 2, 1)) AS DOUBLE) AS g0,
         CAST(ascii(substr(h, 3 * tile + 3, 1)) AS DOUBLE) AS b0
  FROM hx CROSS JOIN t
)
SELECT doc_id, tile, {_jfif_roundtrip_sql("r0", "g0", "b0")}
FROM px
"""

QUERIES["media_jpeg_color_features"] = media_jpeg_color_features
ORACLE_SQL["media_jpeg_color_features"] = MEDIA_JPEG_COLOR_FEATURES_SQL


def media_jpeg_progressive_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """END-TO-END PROGRESSIVE JPEG codec contract (round-9, SOF2):
    the same md5-driven two-MCU-tile 16x32 RGB construction as
    ``media_jpeg_color_features``, but encoded as a PROGRESSIVE
    4:2:0 stream (operators/jpeg.py::encode_jpeg_progressive:
    interleaved DC scan + per-component split-band AC scans) and
    decoded through the multi-scan Annex-G.2 path. Progressive
    spectral selection carries coefficients IDENTICAL to baseline,
    so the decoded RGB equals the baseline contract's closed-form
    double-rounded composition — the SAME oracle SQL gates both;
    the hash matches only if scan segmentation, per-scan Huffman
    state, coefficient accumulation across scans, and the shared
    reconstruction tail are all faithful."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(
        F.col("doc_id"),
        F.md5(F.encode("text", "utf-8")).alias("hex"),
    )

    def roundtrip(batches: "Iterator") -> "Iterator":
        import numpy as np
        import pandas as pd

        from ..operators.jpeg import (
            decode_jpeg_color,
            encode_jpeg_progressive,
        )

        def tiles(h: str) -> list[tuple[float, float, float]]:
            rgb = bytearray()
            for t in range(2):
                px = bytes(ord(c) for c in h[3 * t : 3 * t + 3])
                rgb.extend(px * (16 * 16))
            enc = encode_jpeg_progressive(
                bytes(rgb), 16, 32, color=True, subsample="4:2:0",
                bands=((1, 5), (6, 63)),
            )
            _, _, out = decode_jpeg_color(enc)
            a = np.frombuffer(out, dtype=np.uint8).reshape(2, 256, 3)
            sums = a.astype(np.int64).sum(axis=1)
            return [tuple(sums[t] / 256.0) for t in range(2)]

        for pdf in batches:
            rows = {"doc_id": [], "tile": [], "r": [], "g": [], "b": []}
            for doc_id, h in zip(pdf["doc_id"], pdf["hex"]):
                for t, (rm, gm, bm) in enumerate(tiles(h)):
                    rows["doc_id"].append(doc_id)
                    rows["tile"].append(t)
                    rows["r"].append(rm)
                    rows["g"].append(gm)
                    rows["b"].append(bm)
            yield pd.DataFrame(rows)

    return fan_out(src).mapInPandas(
        roundtrip,
        "doc_id long, tile int, r double, g double, b double",
    )


QUERIES["media_jpeg_progressive_features"] = media_jpeg_progressive_features
ORACLE_SQL["media_jpeg_progressive_features"] = MEDIA_JPEG_COLOR_FEATURES_SQL
