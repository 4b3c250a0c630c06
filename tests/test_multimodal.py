"""Multimodal plumbing: real Spark-side schema/batching, stubbed codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_using_mapreduce_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(spark, n=50).cache()


def test_synth_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA or set(media.columns) == {
        "asset_id", "media_type", "payload", "width", "height", "duration_ms"
    }
    assert media.count() == 50


def test_extract_features_end_to_end(media):
    feats = M.extract_features(media, rows_per_batch=16)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # video payloads are 64 opaque bytes; image/audio rows are real
    # containers (PNG header + zlib stream / WAV 44-byte RIFF header)
    by_kind = {r["media_type"]: r["n_bytes"] for r in rows}
    assert by_kind["video"] == 64
    assert by_kind["image"] > 64 and by_kind["audio"] > 64


def test_extract_features_decodes_real_png(spark):
    """Image features must come from DECODED pixels, not the PNG
    container bytes: encode a known gradient, check the strided means
    against the closed form computed from the raw pixels."""
    from k_means_using_mapreduce_spark.operators.png import encode_png_gray

    pixels = bytes(range(64))  # 8x8 gradient
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_png_gray(pixels, 8, 8)), 8, 8, None)],
        M.MEDIA_SCHEMA,
    )
    row = M.extract_features(df).first()
    expected = [
        sum(pixels[i :: M.FEATURE_DIM])
        / (255.0 * len(pixels[i :: M.FEATURE_DIM]))
        for i in range(M.FEATURE_DIM)
    ]
    assert row["feature"] == pytest.approx(expected, abs=0.0)


def test_png_roundtrip_and_filters():
    """Codec unit checks: encode→decode identity, and the decoder
    reverses all five scanline filter types (hand-filtered stream)."""
    import struct
    import zlib
    from binascii import crc32

    from k_means_using_mapreduce_spark.operators import png as P

    pixels = bytes((i * 37 + 11) % 256 for i in range(12 * 5))
    data = P.encode_png_gray(pixels, 12, 5)
    w, h, out = P.decode_png_gray(data)
    assert (w, h, out) == (12, 5, pixels)

    # hand-build a 3x5 image whose rows use filters 1..4 and 0
    width, height = 3, 5
    ref = [bytes((r * 50 + c * 7) % 256 for c in range(width))
           for r in range(height)]
    filtered = bytearray()
    prev = bytes(width)
    for r, (ft, row) in enumerate(zip([0, 1, 2, 3, 4], ref)):
        filtered.append(ft)
        for x in range(width):
            left = row[x - 1] if x > 0 else 0
            up = prev[x]
            upleft = prev[x - 1] if x > 0 else 0
            if ft == 0:
                filtered.append(row[x])
            elif ft == 1:
                filtered.append((row[x] - left) & 0xFF)
            elif ft == 2:
                filtered.append((row[x] - up) & 0xFF)
            elif ft == 3:
                filtered.append((row[x] - (left + up) // 2) & 0xFF)
            else:
                filtered.append((row[x] - P._paeth(left, up, upleft)) & 0xFF)
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF))

    hand = (P.PNG_SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(filtered)))
            + chunk(b"IEND", b""))
    w2, h2, out2 = P.decode_png_gray(hand)
    assert (w2, h2) == (width, height)
    assert out2 == b"".join(ref)

    # unsupported profiles and corruption raise, never zero-fill
    with pytest.raises(ValueError, match="signature"):
        P.decode_png_gray(b"JUNK" + data)
    rgb_ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="8-bit gray"):
        P.decode_png_gray(P.PNG_SIGNATURE + rgb_ihdr)
    corrupt = bytearray(data)
    corrupt[40] ^= 0xFF
    with pytest.raises(ValueError):
        P.decode_png_gray(bytes(corrupt))


def test_extract_features_deterministic(media):
    a = sorted(map(str, M.extract_features(media).collect()))
    b = sorted(map(str, M.extract_features(media).collect()))
    assert a == b


def test_features_feed_kmeans(media, spark):
    from k_means_using_mapreduce_spark.operators.kmeans import kmeans_fit

    feats = M.extract_features(media).select(F.col("feature").alias("features"))
    res = kmeans_fit(feats, 3, seed=1, max_iter=10)
    assert len(res.centroids) == 3
    assert sum(res.cluster_sizes.values()) == 50


def test_null_payload_handled(spark):
    df = spark.createDataFrame(
        [(1, "image", None, None, None, None)], M.MEDIA_SCHEMA
    )
    row = M.extract_features(df).first()
    assert row["n_bytes"] == 0 and row["feature"] == [0.0] * M.FEATURE_DIM


def test_resize_raw_nearest_is_byte_selection(spark):
    """Nearest resize on a raw gray buffer selects exactly the bytes
    the half-pixel-center convention predicts."""
    import numpy as np

    img = bytes(range(16))  # 4x4 gray, pixel value == index
    df = spark.createDataFrame(
        [(1, "image", img, 4, 4, None)], M.MEDIA_SCHEMA
    )
    row = M.resize_raw(df, 2, 2, mode="nearest").first()
    # src = min(floor((d+0.5)*4/2), 3) = {1, 3} per axis
    assert list(row["payload"]) == [4 * 1 + 1, 4 * 1 + 3, 4 * 3 + 1, 4 * 3 + 3]
    assert row["width"] == 2 and row["height"] == 2

    # upscale keeps values (pure replication)
    up = M.resize_raw(df, 8, 8, mode="nearest").first()
    arr = np.frombuffer(bytes(up["payload"]), dtype=np.uint8)
    assert set(arr.tolist()) <= set(range(16)) and len(arr) == 64


def test_resize_raw_bilinear_closed_form(spark):
    """Bilinear 2x2 -> 1x1 is the plain mean of the four pixels;
    2x2 -> 4x4 edge pixels replicate the corners (edge clamp)."""
    img = bytes([0, 100, 200, 40])  # 2x2
    df = spark.createDataFrame(
        [(1, "image", img, 2, 2, None)], M.MEDIA_SCHEMA
    )
    one = M.resize_raw(df, 1, 1, mode="bilinear").first()
    assert list(one["payload"]) == [85]  # rint((0+100+200+40)/4)
    four = M.resize_raw(df, 4, 4, mode="bilinear").first()
    vals = list(four["payload"])
    assert vals[0] == 0 and vals[3] == 100 and vals[12] == 200 and vals[15] == 40


def test_resize_raw_malformed_payload_surfaced_not_resized(spark):
    df = spark.createDataFrame(
        [
            (1, "image", bytes(range(16)), 4, 4, None),
            (2, "image", b"short", 4, 4, None),  # wrong byte count
            (3, "image", None, 4, 4, None),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = {r["asset_id"]: r for r in M.resize_raw(df, 2, 2, mode="nearest").collect()}
    assert rows[1]["payload"] is not None and rows[1]["width"] == 2
    assert rows[2]["payload"] is None and rows[2]["width"] == 4  # original meta
    assert rows[3]["payload"] is None


def test_frame_sample_raw_slices_frames(spark):
    # 6 frames of 2x2 gray = 24 bytes over 3000 ms; every 1000 ms ->
    # period 500 ms, step 2 -> frames 0, 2, 4
    payload = bytes(range(24))
    df = spark.createDataFrame(
        [(7, "video", payload, 2, 2, 3000)], M.MEDIA_SCHEMA
    )
    rows = sorted(
        M.frame_sample_raw(df, every_ms=1000).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert [r["ts_ms"] for r in rows] == [0, 1000, 2000]
    assert list(rows[1]["payload"]) == list(range(8, 12))

    # malformed (25 bytes not divisible by frame size) -> one NULL row
    bad = spark.createDataFrame(
        [(8, "video", payload + b"x", 2, 2, 3000)], M.MEDIA_SCHEMA
    )
    r = M.frame_sample_raw(bad, every_ms=1000).collect()
    assert len(r) == 1 and r[0]["frame_idx"] == -1 and r[0]["payload"] is None


def test_byte_stats_closed_form(spark):
    """Known payloads: constant bytes -> entropy 0 + tiny zlib ratio;
    a PNG magic prefix sniffs as png; NULL/empty handled."""
    import math
    import zlib

    from k_means_using_mapreduce_spark.operators.multimodal import byte_stats

    const = b"a" * 4096
    png = b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 8
    rows = [
        (1, "image", bytearray(const)),
        (2, "image", bytearray(png)),
        (3, "audio", None),
        (4, "audio", bytearray(b"")),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r for r in byte_stats(df).collect()}
    assert got[1]["entropy_bits"] == pytest.approx(0.0, abs=1e-12)
    assert got[1]["zlib_ratio"] == pytest.approx(
        len(zlib.compress(const, 6)) / len(const)
    )
    assert got[1]["zlib_ratio"] < 0.05  # constant bytes compress away
    assert got[2]["sniffed_format"] == "png"
    # 256 equally-likely byte values in the body dominate -> near 8 bits
    assert got[2]["entropy_bits"] > 7.9
    assert got[3]["n_bytes"] is None and got[3]["sniffed_format"] is None
    assert got[4]["n_bytes"] == 0 and got[4]["entropy_bits"] == 0.0


def test_extract_features_decodes_real_wav(spark):
    """Audio features must come from DECODED PCM frames, not the WAV
    container bytes (the 44-byte RIFF header would shift every
    stride otherwise)."""
    from k_means_using_mapreduce_spark.operators.png import encode_wav_pcm16

    frames = bytes((i * 11) % 256 for i in range(64))
    df = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav_pcm16(frames)), None, None, 1000)],
        M.MEDIA_SCHEMA,
    )
    row = M.extract_features(df).first()
    expected = [
        sum(frames[i :: M.FEATURE_DIM])
        / (255.0 * len(frames[i :: M.FEATURE_DIM]))
        for i in range(M.FEATURE_DIM)
    ]
    assert row["feature"] == pytest.approx(expected, abs=0.0)


def test_wav_roundtrip_and_guards():
    from k_means_using_mapreduce_spark.operators import png as P

    frames = bytes(range(128))
    data = P.encode_wav_pcm16(frames, sample_rate=16000, channels=2)
    rate, ch, out = P.decode_wav_pcm16(data)
    assert (rate, ch, out) == (16000, 2, frames)
    with pytest.raises(ValueError, match="RIFF"):
        P.decode_wav_pcm16(b"JUNK" + data)
    with pytest.raises(ValueError, match="whole number"):
        P.encode_wav_pcm16(b"\x00\x01\x02")  # 3 bytes, not 16-bit frames
