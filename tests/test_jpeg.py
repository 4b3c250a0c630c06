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
    decode_jpeg,
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
    # flip SOF0 -> SOF2: the body is still a BASELINE scan (Ss=0,
    # Se=63), which is not a legal progressive scan header — caught
    # by the scan-band validation now that SOF2 itself is supported
    idx = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:idx]) + b"\xff\xc2" + bytes(enc[idx + 2 :])
    with pytest.raises(ValueError, match="bad DC scan band"):
        decode_jpeg_gray(prog)
    # SOF1 (extended sequential) stays unsupported
    seq = bytes(enc[:idx]) + b"\xff\xc1" + bytes(enc[idx + 2 :])
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg_gray(seq)
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


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_round_trip_matches_baseline_exactly():
    """Spectral-selection progressive carries the SAME quantized
    coefficients as baseline, so the decoded pixels must be
    bit-identical to the baseline round trip — gray and color, 4:4:4
    and 4:2:0, single and split bands, non-multiple-of-8 dims."""
    from k_means_using_mapreduce_spark.operators.jpeg import (
        encode_jpeg_color,
        encode_jpeg_progressive,
    )

    rng = random.Random(7)
    for w, h in ((8, 8), (16, 8), (13, 11), (17, 9)):
        px = bytes(rng.randrange(256) for _ in range(w * h))
        base = decode_jpeg(encode_jpeg_gray(px, w, h))
        for bands in (((1, 63),), ((1, 5), (6, 63)), ((1, 2), (3, 10), (11, 63))):
            assert (
                decode_jpeg(encode_jpeg_progressive(px, w, h, bands=bands))
                == base
            ), (w, h, bands)
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        for sub in ("4:4:4", "4:2:0"):
            base_c = decode_jpeg(encode_jpeg_color(rgb, w, h, subsample=sub))
            prog_c = decode_jpeg(
                encode_jpeg_progressive(
                    rgb, w, h, color=True, subsample=sub,
                    bands=((1, 9), (10, 63)),
                )
            )
            assert prog_c == base_c, (w, h, sub)


def test_progressive_encoder_guards():
    from k_means_using_mapreduce_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    with pytest.raises(ValueError, match="bands"):
        encode_jpeg_progressive(bytes(64), 8, 8, bands=((0, 63),))
    with pytest.raises(ValueError, match="bands"):
        encode_jpeg_progressive(bytes(64), 8, 8, bands=((1, 10), (5, 63)))
    with pytest.raises(ValueError, match="payload"):
        encode_jpeg_progressive(bytes(63), 8, 8)
    with pytest.raises(ValueError, match="chroma"):
        encode_jpeg_progressive(bytes(64), 8, 8, subsample="4:2:0")


def _prog_headers(q, width=8, height=8):
    from k_means_using_mapreduce_spark.operators import jpeg as J

    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    return (
        J.SOI
        + J._seg(0xDB, bytes([0]) + bytes(q))
        + J._seg(0xC2, sof)
        + J._seg(0xC4, bytes([0x00]) + bytes(J.DC_BITS) + bytes(J.DC_VALS))
        + J._seg(0xC4, bytes([0x10]) + bytes(J.AC_BITS) + bytes(J.AC_VALS))
    )


def _expected_pixels(zz, q):
    from k_means_using_mapreduce_spark.operators import jpeg as J

    coef = [[0.0] * 8 for _ in range(8)]
    for i, (r, c) in enumerate(J.ZIGZAG):
        coef[r][c] = float(zz[i] * q[i])
    block = J._idct(coef)
    return bytes(
        J._u8(block[r][c] + 128.0) for r in range(8) for c in range(8)
    )


def test_progressive_successive_approximation_crafted():
    """Hand-built SA scan script over one 8x8 block: DC first at Al=2
    plus two DC refinements, AC first at Al=1 plus an AC refinement
    with newly-significant coefficients, interleaved correction bits,
    and ZRL runs — the exact T.81 G.2 bit order. The decoder must
    reconstruct the intended coefficients bit-for-bit (expected
    pixels computed from the coefficient array directly)."""
    from k_means_using_mapreduce_spark.operators import jpeg as J

    q = [1] * 64
    # intended final zigzag coefficients
    zz = [0] * 64
    zz[0], zz[1], zz[2], zz[7], zz[20], zz[40] = -13, 5, -1, -6, 3, -1
    dc_codes = J._build_codes(J.DC_BITS, J.DC_VALS)
    ac_codes = J._build_codes(J.AC_BITS, J.AC_VALS)

    def dc_scan(al, ah, payload_bits):
        w = J._BitWriter()
        for code, length in payload_bits:
            w.write(code, length)
        w.flush()
        return (
            J._seg(0xDA, bytes([1, 1, 0x00, 0, 0, (ah << 4) | al]))
            + bytes(w.out)
        )

    # scan 1: DC first, Al=2 -> diff = -13 >> 2 = -4 (size 3)
    c, l = dc_codes[3]
    s1 = dc_scan(2, 0, [(c, l), (-4 + (1 << 3) - 1, 3)])
    # scans 2-3: DC refinement bits (-13 = ...10011): bit1=1, bit0=1
    s2 = dc_scan(1, 2, [(1, 1)])
    s3 = dc_scan(0, 1, [(1, 1)])

    # scan 4: AC first, Ss=1 Se=63, Al=1 -> high halves (toward zero):
    # k1:+2, k7:-3, k20:+1
    w = J._BitWriter()
    c, l = ac_codes[(0 << 4) | 2]
    w.write(c, l)
    w.write(2, 2)
    c, l = ac_codes[(5 << 4) | 2]
    w.write(c, l)
    w.write(-3 + 3, 2)
    c, l = ac_codes[(12 << 4) | 1]
    w.write(c, l)
    w.write(1, 1)
    c, l = ac_codes[0x00]
    w.write(c, l)
    w.flush()
    s4 = J._seg(0xDA, bytes([1, 1, 0x00, 1, 63, (0 << 4) | 1])) + bytes(w.out)

    # scan 5: AC refinement, Al=0 — G.2 bit order:
    #  sym(0,1) sign(0)  corr(k1)=1          -> k2 = -1, k1 -> 5
    #  ZRL               corr(k7)=0          -> skips k3..k18
    #  ZRL               corr(k20)=1         -> skips k21..k36, k20 -> 3
    #  sym(3,1) sign(0)                       -> k40 = -1
    #  EOB                                    -> no trailing corrections
    w = J._BitWriter()
    c, l = ac_codes[(0 << 4) | 1]
    w.write(c, l)
    w.write(0, 1)  # sign: negative
    w.write(1, 1)  # correction for k1
    c, l = ac_codes[0xF0]
    w.write(c, l)
    w.write(0, 1)  # correction for k7
    c, l = ac_codes[0xF0]
    w.write(c, l)
    w.write(1, 1)  # correction for k20
    c, l = ac_codes[(3 << 4) | 1]
    w.write(c, l)
    w.write(0, 1)  # sign: negative
    c, l = ac_codes[0x00]
    w.write(c, l)
    w.flush()
    s5 = J._seg(0xDA, bytes([1, 1, 0x00, 1, 63, (1 << 4) | 0])) + bytes(w.out)

    stream = _prog_headers(q) + s1 + s2 + s3 + s4 + s5 + J.EOI
    wdt, hgt, ncomp, pixels = decode_jpeg(stream)
    assert (wdt, hgt, ncomp) == (8, 8, 1)
    assert pixels == _expected_pixels(zz, q)


def test_progressive_eobrun_spans_blocks_and_restarts():
    """EOBRUN covering two blocks with one symbol, and a separate
    crafted stream with DRI=1 restarts inside BOTH progressive scan
    types (DC predictors and EOBRUN reset at every marker)."""
    from k_means_using_mapreduce_spark.operators import jpeg as J

    q = [1] * 64
    dc_codes = J._build_codes(J.DC_BITS, J.DC_VALS)
    # the Annex-K baseline AC table has no EOBRUN symbols (r>0, s=0);
    # progressive streams carry their own tables — craft a 2-symbol
    # one: 0x00 (EOB) at 1 bit, 0x10 (EOBRUN r=1) at 2 bits
    ac_bits = [1, 1] + [0] * 14
    ac_vals = [0x00, 0x10]
    ac_codes = J._build_codes(ac_bits, ac_vals)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    head = (
        J.SOI
        + J._seg(0xDB, bytes([0]) + bytes(q))
        + J._seg(0xC2, sof)
        + J._seg(0xC4, bytes([0x00]) + bytes(J.DC_BITS) + bytes(J.DC_VALS))
        + J._seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    )
    # DC scan: block0 dc=8 (diff 8), block1 dc=-8 (diff -16)
    w = J._BitWriter()
    c, l = dc_codes[4]
    w.write(c, l)
    w.write(8, 4)
    c, l = dc_codes[5]
    w.write(c, l)
    w.write(-16 + 31, 5)
    w.flush()
    dc = J._seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes(w.out)
    # AC scan: ONE symbol — EOBRUN r=1 + 1 extra bit (0) => 2 blocks
    w = J._BitWriter()
    c, l = ac_codes[0x10]
    w.write(c, l)
    w.write(0, 1)
    w.flush()
    ac = J._seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0])) + bytes(w.out)
    wdt, hgt, ncomp, pixels = decode_jpeg(head + dc + ac + J.EOI)
    assert (wdt, hgt, ncomp) == (16, 8, 1)
    # flat blocks: dc=8 -> 129, dc=-8 -> 127
    for y in range(8):
        row = pixels[y * 16 : (y + 1) * 16]
        assert row == bytes([129] * 8 + [127] * 8), (y, row)

    # restart variant: DRI=1, RST0 between the two blocks in BOTH
    # scans; DC predictor resets so block1's diff is -8 from 0
    head_dri = (
        J.SOI
        + J._seg(0xDB, bytes([0]) + bytes(q))
        + J._seg(0xDD, struct.pack(">H", 1))
        + J._seg(0xC2, sof)
        + J._seg(0xC4, bytes([0x00]) + bytes(J.DC_BITS) + bytes(J.DC_VALS))
        + J._seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    )
    w = J._BitWriter()
    c, l = dc_codes[4]
    w.write(c, l)
    w.write(8, 4)
    w.flush()
    part0 = bytes(w.out)
    w = J._BitWriter()
    c, l = dc_codes[4]
    w.write(c, l)
    w.write(-8 + 15, 4)
    w.flush()
    dc = (
        J._seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
        + part0
        + b"\xff\xd0"
        + bytes(w.out)
    )
    w = J._BitWriter()
    c, l = ac_codes[0x00]
    w.write(c, l)
    w.flush()
    eob = bytes(w.out)
    ac = (
        J._seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
        + eob
        + b"\xff\xd0"
        + eob
    )
    wdt, hgt, ncomp, pixels = decode_jpeg(head_dri + dc + ac + J.EOI)
    for y in range(8):
        row = pixels[y * 16 : (y + 1) * 16]
        assert row == bytes([129] * 8 + [127] * 8), (y, row)
