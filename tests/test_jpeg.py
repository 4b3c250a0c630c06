"""Baseline grayscale JPEG codec (operators/jpeg.py) — round-7 item:
block-constant bit-exactness (the media_jpeg_features oracle lever),
near-lossless arbitrary round-trips, marker/variant guards, and the
extract_features sniff path."""

from __future__ import annotations

import random
import struct

import pytest

from k_means_using_mapreduce_spark.operators.jpeg import (
    AC_BITS,
    AC_VALS,
    ZIGZAG,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _block_constant(vals, bw, bh):
    """bw*8 x bh*8 image; block (bi,bj) constant vals[bi*bw+bj]."""
    return (
        b"".join(
            (
                b"".join(
                    bytes([vals[bi * bw + bj]]) * 8 for bj in range(bw)
                )
            )
            * 8
            for bi in range(bh)
        ),
        bw * 8,
        bh * 8,
    )


def test_block_constant_roundtrip_is_bit_exact():
    vals = [17, 255, 0, 128, 200, 64, 3, 99]
    px, w, h = _block_constant(vals, 2, 4)
    enc = encode_jpeg_gray(px, w, h)
    assert enc[:3] == b"\xff\xd8\xff"
    dw, dh, dec = decode_jpeg_gray(enc)
    assert (dw, dh) == (w, h)
    assert dec == px


def test_arbitrary_roundtrip_near_lossless():
    rng = random.Random(7)
    for w, h in [(5, 7), (8, 8), (13, 17), (24, 9), (1, 1), (9, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        dw, dh, dec = decode_jpeg_gray(encode_jpeg_gray(px, w, h))
        assert (dw, dh) == (w, h)
        assert max(abs(a - b) for a, b in zip(px, dec)) <= 3


def test_gradient_and_extremes_exercise_ac_and_dc_categories():
    # smooth ramp (small ACs), extremes (max DC diffs across blocks)
    w, h = 32, 16
    ramp = bytes(((r * w + c) * 255 // (w * h - 1)) for r in range(h) for c in range(w))
    _, _, dec = decode_jpeg_gray(encode_jpeg_gray(ramp, w, h))
    assert max(abs(a - b) for a, b in zip(ramp, dec)) <= 3
    checker = bytes(
        255 if ((r // 8) + (c // 8)) % 2 else 0
        for r in range(h)
        for c in range(w)
    )
    _, _, dec = decode_jpeg_gray(encode_jpeg_gray(checker, w, h))
    assert dec == checker  # block-constant again: exact


def test_encoder_guards():
    with pytest.raises(ValueError, match="dimensions"):
        encode_jpeg_gray(b"", 0, 1)
    with pytest.raises(ValueError, match="expected"):
        encode_jpeg_gray(b"\x00" * 3, 2, 2)
    with pytest.raises(ValueError, match="qtable"):
        encode_jpeg_gray(b"\x00" * 4, 2, 2, qtable=[0] * 64)


def test_decoder_rejects_unsupported_variants():
    px, w, h = _block_constant([10, 20], 2, 1)
    enc = bytearray(encode_jpeg_gray(px, w, h))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00" + bytes(enc))
    # flip SOF0 -> SOF2 (progressive)
    idx = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:idx]) + b"\xff\xc2" + bytes(enc[idx + 2 :])
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(prog)
    # a REAL color stream decodes via decode_jpeg but the gray-only
    # wrapper still refuses it (round-8: color is now supported, so
    # the old "claim 3 components in a 1-component body" patch is a
    # malformed header, not an unsupported-variant probe)
    from k_means_using_mapreduce_spark.operators.jpeg import (
        encode_jpeg_color,
    )

    color = encode_jpeg_color(bytes([10, 20, 30] * 64), 8, 8)
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_gray(color)
    # SOF claiming 3 components over a 1-component body is malformed
    bad = bytearray(enc)
    bad[idx + 9] = 3
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(bad))
    # truncate the entropy stream
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(enc[: idx + 20]))


def test_zigzag_and_tables_are_canonical():
    # first and last few entries of the T.81 zigzag
    assert ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert ZIGZAG[-4:] == [(5, 7), (6, 7), (7, 6), (7, 7)]
    assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
    assert sum(AC_BITS) == len(AC_VALS) == 162
    assert AC_VALS[0] == 0x01 and 0x00 in AC_VALS and 0xF0 in AC_VALS


def test_byte_stuffing_roundtrip():
    # a payload engineered to produce 0xFF bytes in the entropy stream
    rng = random.Random(0xFF)
    for _ in range(20):
        px = bytes(rng.randrange(256) for _ in range(16 * 16))
        enc = encode_jpeg_gray(px, 16, 16)
        _, _, dec = decode_jpeg_gray(enc)  # unstuffing must not desync
        assert max(abs(a - b) for a, b in zip(px, dec)) <= 3


def test_extract_features_sniffs_and_decodes_jpeg(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from k_means_using_mapreduce_spark.operators.multimodal import (
        extract_features,
    )

    vals = [40, 80, 120, 160]
    px, w, h = _block_constant(vals, 2, 2)
    enc = encode_jpeg_gray(px, w, h)
    df = spark.createDataFrame(
        [(1, "image", bytearray(enc), w, h, None)],
        "asset_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    feat = extract_features(df).collect()[0]["feature"]
    # stride-16 means over the DECODED pixels: column j's mean is the
    # average of the two vertically stacked blocks' constants
    for j in range(16):
        expect = (vals[j // 8] + vals[2 + j // 8]) / (2 * 255.0)
        assert feat[j] == pytest.approx(expect, abs=1e-12)


def test_decoder_reads_multi_table_dht_segments():
    # concatenate DC+AC tables into ONE DHT segment (other encoders do
    # this); our decoder must parse multi-table segments
    px, w, h = _block_constant([1, 250], 1, 2)
    enc = encode_jpeg_gray(px, w, h)
    # split into segments and re-join the two DHTs
    def segs(b):
        out, i = [], 2
        while i < len(b):
            if b[i] != 0xFF:
                break
            m = b[i + 1]
            if m == 0xDA:
                ln = struct.unpack(">H", b[i + 2 : i + 4])[0]
                out.append(("SOS", b[i : i + 2 + ln], b[i + 2 + ln :]))
                return out
            ln = struct.unpack(">H", b[i + 2 : i + 4])[0]
            out.append((m, b[i : i + 2 + ln], None))
            i += 2 + ln
        return out

    parts = segs(enc)
    dhts = [p for p in parts if p[0] == 0xC4]
    assert len(dhts) == 2
    merged_body = dhts[0][1][4:] + dhts[1][1][4:]
    merged = (
        b"\xff\xc4"
        + struct.pack(">H", len(merged_body) + 2)
        + merged_body
    )
    rebuilt = b"\xff\xd8"
    for p in parts:
        if p[0] == 0xC4:
            continue
        if p[0] == "SOS":
            rebuilt += merged + p[1] + p[2]
        else:
            rebuilt += p[1]
    dw, dh, dec = decode_jpeg_gray(rebuilt)
    assert (dw, dh) == (w, h) and dec == px


def _tile_rgb(tiles, tw, th, tile_px):
    """Build an RGB buffer of len(tiles[0]) columns × len(tiles) rows
    of tile_px×tile_px constant-RGB tiles."""
    w = len(tiles[0]) * tile_px
    buf = bytearray()
    for trow in tiles:
        for r in range(tile_px):
            for rgb in trow:
                buf.extend(bytes(rgb) * tile_px)
    return bytes(buf), w, len(tiles) * tile_px


def test_color_roundtrip_block_constant_exact_444():
    """8x8-constant RGB tiles, 4:4:4: every component block is
    DC-only → the YCbCr round-trip is bit-exact, so decoded RGB is
    exactly ycbcr_to_rgb(rgb_to_ycbcr(rgb))."""
    from k_means_using_mapreduce_spark.operators.jpeg import (
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
        decode_jpeg_color,
        encode_jpeg_color,
    )

    tiles = [[(200, 30, 60), (10, 250, 90)], [(0, 0, 255), (128, 128, 128)]]
    buf, w, h = _tile_rgb(tiles, 2, 2, 8)
    enc = encode_jpeg_color(buf, w, h, subsample="4:4:4")
    dw, dh, out = decode_jpeg_color(enc)
    assert (dw, dh) == (w, h)
    for ty, trow in enumerate(tiles):
        for tx, rgb in enumerate(trow):
            want = _ycbcr_to_rgb(*_rgb_to_ycbcr(*rgb))
            i = ((ty * 8) * w + tx * 8) * 3
            assert tuple(out[i : i + 3]) == want
            # every pixel of the tile identical
            for r in range(8):
                for c in range(8):
                    j = ((ty * 8 + r) * w + tx * 8 + c) * 3
                    assert out[j : j + 3] == out[i : i + 3]


def test_color_roundtrip_mcu_constant_exact_420():
    """16x16-constant tiles, 4:2:0: luma blocks constant AND the 2x2
    chroma box-average of a constant region is the value itself, so
    every data unit is DC-only → bit-exact round trip."""
    from k_means_using_mapreduce_spark.operators.jpeg import (
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
        decode_jpeg_color,
        encode_jpeg_color,
    )

    tiles = [[(55, 99, 200)], [(240, 12, 128)]]
    buf, w, h = _tile_rgb(tiles, 1, 2, 16)
    enc = encode_jpeg_color(buf, w, h, subsample="4:2:0")
    dw, dh, out = decode_jpeg_color(enc)
    assert (dw, dh) == (w, h)
    for ty, trow in enumerate(tiles):
        want = _ycbcr_to_rgb(*_rgb_to_ycbcr(*trow[0]))
        for r in range(16):
            for c in range(16):
                j = ((ty * 16 + r) * w + c) * 3
                assert tuple(out[j : j + 3]) == want, (ty, r, c)


def test_color_roundtrip_gradient_within_tolerance():
    """Arbitrary (non-constant) color content: 4:4:4 and 4:2:0 decode
    within a small tolerance of the ycbcr-exact reference (float
    DCT/IDCT + AC quantum 2 + chroma averaging)."""
    from k_means_using_mapreduce_spark.operators.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
    )

    w, h = 24, 16
    buf = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 10) % 256, (y * 13) % 256, (x * 3 + y * 5) % 256)
    )
    for sub, tol in (("4:4:4", 8), ("4:2:0", 60)):
        dw, dh, out = decode_jpeg_color(
            encode_jpeg_color(buf, w, h, subsample=sub)
        )
        assert (dw, dh) == (w, h)
        worst = max(abs(a - b) for a, b in zip(out, buf))
        assert worst <= tol, (sub, worst)


def test_decode_jpeg_luma_and_wrappers():
    from k_means_using_mapreduce_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_color,
        decode_jpeg_luma,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    gray = encode_jpeg_gray(bytes([77] * 64), 8, 8)
    w, h, n, px = decode_jpeg(gray)
    assert (w, h, n) == (8, 8, 1) and px == bytes([77] * 64)
    assert decode_jpeg_luma(gray) == (8, 8, bytes([77] * 64))
    with pytest.raises(ValueError, match="color"):
        decode_jpeg_color(gray)

    color = encode_jpeg_color(bytes([10, 20, 30] * 64), 8, 8)
    w, h, n, px = decode_jpeg(color)
    assert (w, h, n) == (8, 8, 3) and len(px) == 8 * 8 * 3
    lw, lh, luma = decode_jpeg_luma(color)
    assert (lw, lh) == (8, 8) and len(luma) == 64
    assert len(set(luma)) == 1  # constant image -> constant luma


def test_color_encoder_guards():
    from k_means_using_mapreduce_spark.operators.jpeg import (
        encode_jpeg_color,
    )

    with pytest.raises(ValueError, match="dimensions"):
        encode_jpeg_color(b"", 0, 1)
    with pytest.raises(ValueError, match="expected"):
        encode_jpeg_color(b"\x00" * 10, 2, 2)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_color(bytes(12), 2, 2, subsample="4:2:2")


def test_decoder_tolerates_fill_bytes_before_markers():
    """T.81 §B.1.1.2 allows 0xFF fill bytes before any marker — the
    round-7 ADVICE interop fix: such conforming files must decode,
    not fall back."""
    from k_means_using_mapreduce_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    px = bytes([40] * 64)
    enc = encode_jpeg_gray(px, 8, 8)
    # insert fill bytes before the SOF0 and DHT markers
    idx_sof = enc.find(b"\xff\xc0")
    idx_dht = enc.find(b"\xff\xc4")
    padded = (
        enc[:idx_sof]
        + b"\xff\xff"
        + enc[idx_sof:idx_dht]
        + b"\xff"
        + enc[idx_dht:]
    )
    assert decode_jpeg_gray(padded) == (8, 8, px)


def test_odd_dimension_color_roundtrip():
    """Non-multiple-of-MCU dims exercise edge replication and padded-
    plane cropping on both subsamplings."""
    from k_means_using_mapreduce_spark.operators.jpeg import (
        decode_jpeg_color,
        encode_jpeg_color,
    )

    w, h = 11, 9
    buf = bytes((i * 7) % 256 for i in range(w * h * 3))
    for sub in ("4:4:4", "4:2:0"):
        dw, dh, out = decode_jpeg_color(encode_jpeg_color(buf, w, h, subsample=sub))
        assert (dw, dh) == (w, h) and len(out) == w * h * 3


def test_restart_interval_roundtrips_gray_and_color():
    """DRI + RSTn markers (T.81 §E.2.4): DC predictors reset at every
    boundary and the decoder byte-aligns through the markers — the
    error-resilience layout libjpeg emits. Round trips must be
    identical to the no-restart encode at several interval sizes,
    including intervals that land mid-byte."""
    import random

    from k_means_using_mapreduce_spark.operators.jpeg import (
        decode_jpeg_color,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = random.Random(11)
    px = bytes(rng.randrange(256) for _ in range(32 * 24))
    base = decode_jpeg_gray(encode_jpeg_gray(px, 32, 24))
    for ri in (1, 2, 3, 5, 7, 11):
        enc = encode_jpeg_gray(px, 32, 24, restart_interval=ri)
        assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
        assert decode_jpeg_gray(enc) == base, ri

    rgb = bytes(rng.randrange(256) for _ in range(24 * 16 * 3))
    for sub in ("4:4:4", "4:2:0"):
        base_c = decode_jpeg_color(encode_jpeg_color(rgb, 24, 16, subsample=sub))
        for ri in (1, 2, 3):
            enc = encode_jpeg_color(
                rgb, 24, 16, subsample=sub, restart_interval=ri
            )
            assert decode_jpeg_color(enc) == base_c, (sub, ri)


def test_restart_marker_sequence_violation_raises():
    from k_means_using_mapreduce_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    px = bytes(range(64)) * 4
    enc = bytearray(encode_jpeg_gray(px, 16, 16, restart_interval=1))
    i = enc.find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD5  # break the cyclic sequence
    import pytest as _pytest

    with _pytest.raises(ValueError, match="restart"):
        decode_jpeg_gray(bytes(enc))


def test_numpy_and_scalar_paths_agree():
    """The vectorized plane conversions must be BIT-identical to the
    scalar fallback — same expressions, same floor(x+0.5) rounding —
    for encode bytes, decoded RGB, and the luma reduction, including
    odd dims (edge-replicated downsample)."""
    import random
    import sys

    from k_means_using_mapreduce_spark.operators import jpeg

    rng = random.Random(5)

    class _Blocked:
        def find_module(self, name, path=None):  # pragma: no cover
            return None

    def run_all(rgb, w, h):
        out = {}
        for sub in ("4:4:4", "4:2:0"):
            enc = jpeg.encode_jpeg_color(rgb, w, h, subsample=sub)
            out[(sub, "enc")] = enc
            out[(sub, "dec")] = jpeg.decode_jpeg_color(enc)
            out[(sub, "luma")] = jpeg.decode_jpeg_luma(enc)
        return out

    for w, h in ((16, 16), (11, 9), (8, 24)):
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        with_np = run_all(rgb, w, h)
        saved = {
            k: sys.modules.pop(k)
            for k in list(sys.modules)
            if k == "numpy" or k.startswith("numpy.")
        }
        sys.modules["numpy"] = None  # import numpy -> ImportError
        try:
            without_np = run_all(rgb, w, h)
        finally:
            del sys.modules["numpy"]
            sys.modules.update(saved)
        assert with_np == without_np, (w, h)
