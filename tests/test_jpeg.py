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
    # claim 3 components (color)
    color = bytearray(enc)
    color[idx + 9] = 3
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_gray(bytes(color))
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
