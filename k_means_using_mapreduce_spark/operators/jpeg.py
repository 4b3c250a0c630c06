"""Pure-stdlib baseline JPEG codec for 8-bit grayscale images.

Round-7 verdict item: JPEG is the dominant real-corpus image format,
and the container ships no PIL — but baseline sequential JPEG's core
is self-contained arithmetic: an 8x8 DCT, scalar quantization, zigzag
run-length coding, and canonical Huffman tables, all expressible with
``math`` and byte twiddling. This closes the "non-PNG decode is a
labeled fake" boundary for the one encoded image format that matters
(operators/multimodal.py::extract_features sniffs ``\\xff\\xd8\\xff``
and decodes through here; anything this codec refuses still falls back
to the documented deterministic fake).

Scope (documented, enforced): baseline sequential DCT (SOF0) AND
progressive DCT (SOF2, decode: full Annex G.2 — spectral selection,
successive approximation, EOBRUN, restarts; encode: spectral-selection
scan scripts), 8-bit precision, grayscale or 3-component YCbCr
(4:4:4 / 4:2:0), restart intervals (DRI + RSTn), no
arithmetic/hierarchical coding, no other samplings. Non-conforming
payloads
raise ``ValueError`` and the caller falls back to opaque-byte
handling. The DECODER builds its Huffman/quant tables from the
stream's own DQT/DHT segments, so conforming grayscale baseline files
from other encoders decode too.

Determinism: the encoder is a pure function of (pixels, dims, qtable)
— fixed Annex-K Huffman tables, fixed marker order, sign-symmetric
round-half-away quantization — so encoded payloads are stable across
runs/retries, the property every hash-gated contract upstream relies
on. EXACTNESS property used by the ``media_jpeg_features`` contract:
a block-constant image (every 8x8 block one value) has only DC
energy; with the default DC quantum of 1 the round-trip is bit-exact,
so an oracle can predict decoded pixels in SQL. Arbitrary images
round-trip within ±3 grey levels (float DCT/IDCT + AC quantum 2 —
pinned by tests/test_jpeg.py).

Reference: ITU-T T.81 (JPEG) — §B.2 marker syntax, §F.1.2 entropy
coding, Annex K.3 typical Huffman tables. Scale note: like
operators/png.py, the codec is a per-row kernel inside Arrow-batched
``mapInPandas`` — pure CPU per payload, embarrassingly parallel.
"""

from __future__ import annotations

import math
import struct

SOI = b"\xff\xd8"
EOI = b"\xff\xd9"

#: Annex K.3.1 typical luminance DC table (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

#: Annex K.3.2 typical luminance AC table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert len(AC_VALS) == sum(AC_BITS)

#: default quant table in ZIGZAG order: DC quantum 1 (bit-exact DC,
#: the block-constant contract's exactness lever), AC quantum 2
#: (halves AC magnitudes so every size fits baseline's 10-bit cap)
DEFAULT_QTABLE = [1] + [2] * 63


def _zigzag_order() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1)
        if s % 2:  # odd diagonals walk top-right -> bottom-left
            rng = range(max(0, s - 7), min(s, 7) + 1)
        out.extend((r, s - r) for r in rng)
    return out


ZIGZAG = _zigzag_order()
assert len(ZIGZAG) == 64 and ZIGZAG[:4] == [(0, 0), (0, 1), (1, 0), (2, 0)]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)]
    for u in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _fdct(block: list[list[float]]) -> list[list[float]]:
    # constant-block fast path: only DC energy. Bit-identical to the
    # full transform post-quantization — the exact DC is 8·v (float
    # multiply of an integer, exact), and the full transform's AC
    # terms are < 1e-10 rounding residue that quantizes to 0 anyway.
    first = block[0][0]
    if all(v == first for row in block for v in row):
        out = [[0.0] * 8 for _ in range(8)]
        out[0][0] = 8.0 * first
        return out
    out = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[u][x]
                row = block[x]
                for y in range(8):
                    s += row[y] * cu * _COS[v][y]
            out[u][v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[list[float]]) -> list[list[float]]:
    # DC-only fast path (flat block): pixel = DC/8 exactly (power-of-2
    # divide), identical to the full transform's float result
    if all(
        coef[r][c] == 0.0 for r in range(8) for c in range(8)
        if (r, c) != (0, 0)
    ):
        v = coef[0][0] / 8.0
        return [[v] * 8 for _ in range(8)]
    out = [[0.0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[u][x]
                row = coef[u]
                for v in range(8):
                    s += _C[v] * row[v] * cu * _COS[v][y]
            out[x][y] = 0.25 * s
    return out


def _quantize(v: float, q: int) -> int:
    # sign-symmetric round-half-away (NOT python round: banker's
    # rounding is not SQL-predictable for the contract oracle)
    if v >= 0:
        return int(math.floor(v / q + 0.5))
    return -int(math.floor(-v / q + 0.5))


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 §C.2): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _mag_size(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # entropy-data byte stuffing (§B.1.1.5)
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _u8(v: float) -> int:
    """floor(v + 0.5) clamped to [0, 255] — the codec's single
    float→pixel rounding convention (SQL-replayable as
    ``floor(x + 0.5)``, unlike Python's banker's ``round``)."""
    iv = int(math.floor(v + 0.5))
    return 0 if iv < 0 else (255 if iv > 255 else iv)


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF/BT.601 full-range RGB→YCbCr, term order pinned for the
    SQL oracle (contracts replay these exact expressions)."""
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return _u8(y), _u8(cb), _u8(cr)


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF/BT.601 YCbCr→RGB, term order pinned for the SQL oracle."""
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return _u8(r), _u8(g), _u8(b)


def _encode_block(
    w: "_BitWriter",
    plane: bytes,
    pw: int,
    ph: int,
    x0: int,
    y0: int,
    q: list[int],
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """FDCT + quantize + Huffman-code one 8x8 data unit whose top-left
    sits at (x0, y0) of a ``pw``×``ph`` plane; blocks past the edge
    are padded by edge replication. Returns the new DC predictor."""
    block = []
    for r in range(8):
        sr = min(y0 + r, ph - 1)
        row = []
        for c in range(8):
            sc = min(x0 + c, pw - 1)
            row.append(float(plane[sr * pw + sc]) - 128.0)
        block.append(row)
    coef = _fdct(block)
    zz = [_quantize(coef[r][c], q[i]) for i, (r, c) in enumerate(ZIGZAG)]
    diff = zz[0] - prev_dc
    size = _mag_size(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        w.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            w.write(zc, zl)
            run -= 16
        size = _mag_size(v)
        if size > 10:
            raise ValueError(
                f"AC coefficient {v} exceeds baseline's 10-bit "
                "cap; use a larger AC quantum"
            )
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        bits = v if v > 0 else v + (1 << size) - 1
        w.write(bits, size)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        w.write(ec, el)
    return zz[0]


def encode_jpeg_gray(
    pixels: bytes,
    width: int,
    height: int,
    qtable: list[int] | None = None,
    *,
    restart_interval: int = 0,
) -> bytes:
    """Encode a raw row-major 8-bit grayscale buffer as a baseline
    sequential JPEG (single component, Annex-K Huffman tables).
    Blocks beyond the image edge are padded by edge replication.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that-many MCUs (T.81 §E.2.4) — the error-resilience layout
    most encoders produce."""
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(
            f"payload is {len(pixels)} bytes, expected {width * height}"
        )
    q = list(DEFAULT_QTABLE if qtable is None else qtable)
    if len(q) != 64 or any(not 1 <= x <= 65535 for x in q):
        raise ValueError("qtable must be 64 quanta in [1, 65535]")
    wide = any(x > 255 for x in q)
    dqt = bytes([16 if wide else 0]) + (
        b"".join(struct.pack(">H", x) for x in q)
        if wide
        else bytes(q)
    )
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    bh = (height + 7) // 8
    bw = (width + 7) // 8
    mcu_i = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.flush()
                w.out += bytes(
                    [0xFF, 0xD0 + (mcu_i // restart_interval - 1) % 8]
                )
                prev_dc = 0
            mcu_i += 1
            prev_dc = _encode_block(
                w, pixels, width, height, bx * 8, by * 8,
                q, dc_codes, ac_codes, prev_dc,
            )
    w.flush()
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        SOI
        + _seg(0xDB, dqt)
        + dri
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes(w.out)
        + EOI
    )


#: supported chroma subsampling → luma (H, V) sampling factors
SUBSAMPLE_FACTORS = {"4:4:4": (1, 1), "4:2:0": (2, 2)}


def _ycbcr_planes(
    rgb: bytes, width: int, height: int
) -> tuple[bytearray, bytearray, bytearray]:
    """Full-image RGB→YCbCr plane split. The per-pixel loops are the
    codec's hottest flat section (the DCT already has constant-block
    fast paths), so when numpy is available the conversion vectorizes
    — SAME expressions, SAME floor(x+0.5) rounding, elementwise IEEE
    doubles, so the output is bit-identical to the scalar fallback
    (pinned by tests/test_jpeg.py::test_numpy_and_scalar_paths_agree).
    """
    n = width * height
    try:
        import numpy as np
    except ImportError:
        yp = bytearray(n)
        cbf = bytearray(n)
        crf = bytearray(n)
        for i in range(n):
            yv, cbv, crv = _rgb_to_ycbcr(
                rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
            )
            yp[i] = yv
            cbf[i] = cbv
            crf[i] = crv
        return yp, cbf, crf
    a = np.frombuffer(bytes(rgb), dtype=np.uint8).astype(np.float64)
    r, g, b = a[0::3], a[1::3], a[2::3]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def u8(v):
        return bytearray(
            np.clip(np.floor(v + 0.5), 0.0, 255.0)
            .astype(np.uint8)
            .tobytes()
        )

    return u8(y), u8(cb), u8(cr)


def _box_downsample(
    plane: bytearray, width: int, height: int, cw: int, ch: int
) -> bytearray:
    """2×2 box average with edge replication for odd dims; numpy when
    available, bit-identical scalar fallback."""
    try:
        import numpy as np
    except ImportError:
        out = bytearray(cw * ch)
        for cy in range(ch):
            y0, y1 = 2 * cy, min(2 * cy + 1, height - 1)
            for cx in range(cw):
                x0, x1 = 2 * cx, min(2 * cx + 1, width - 1)
                s = (
                    plane[y0 * width + x0]
                    + plane[y0 * width + x1]
                    + plane[y1 * width + x0]
                    + plane[y1 * width + x1]
                )
                out[cy * cw + cx] = _u8(s / 4.0)
        return out
    p = np.frombuffer(bytes(plane), dtype=np.uint8).reshape(height, width)
    if height % 2 or width % 2:
        p = np.pad(
            p, ((0, height % 2), (0, width % 2)), mode="edge"
        )
    s = (
        p[0::2, 0::2].astype(np.int64)
        + p[0::2, 1::2]
        + p[1::2, 0::2]
        + p[1::2, 1::2]
    )
    return bytearray(
        np.clip(np.floor(s / 4.0 + 0.5), 0.0, 255.0)
        .astype(np.uint8)
        .tobytes()
    )


def encode_jpeg_color(
    rgb: bytes,
    width: int,
    height: int,
    *,
    subsample: str = "4:2:0",
    qtable: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode a raw row-major interleaved 8-bit RGB buffer as a
    baseline sequential three-component YCbCr JPEG (SOF0) — 4:4:4 or
    4:2:0, the two layouts that cover real photographic corpora.

    Pipeline: per-pixel JFIF RGB→YCbCr (:func:`_rgb_to_ycbcr`,
    floor(x+0.5) rounding); for 4:2:0 the chroma planes are box-
    downsampled 2×2 (average of the — edge-replicated — quad,
    floor(x+0.5)); MCU-interleaved entropy coding per T.81 §A.2.3
    (luma data units in raster order within the MCU, then Cb, then
    Cr), per-component DC predictors. One quant table and one
    DC/AC Huffman table pair serve all components (conforming —
    table ids are per-scan-component declarations), keeping the
    block-constant DC-exactness lever of the grayscale path for
    every component: a tile constant over one full MCU round-trips
    bit-exactly in YCbCr, which is what the
    ``media_jpeg_color_features`` contract pins.
    """
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"payload is {len(rgb)} bytes, expected {width * height * 3}"
        )
    if subsample not in SUBSAMPLE_FACTORS:
        raise ValueError(
            f"unsupported subsampling {subsample!r} "
            f"(supported: {sorted(SUBSAMPLE_FACTORS)})"
        )
    hy, vy = SUBSAMPLE_FACTORS[subsample]
    q = list(DEFAULT_QTABLE if qtable is None else qtable)
    if len(q) != 64 or any(not 1 <= x <= 65535 for x in q):
        raise ValueError("qtable must be 64 quanta in [1, 65535]")
    wide = any(x > 255 for x in q)
    dqt = bytes([16 if wide else 0]) + (
        b"".join(struct.pack(">H", x) for x in q) if wide else bytes(q)
    )

    yp, cbf, crf = _ycbcr_planes(rgb, width, height)
    if subsample == "4:2:0":
        cw, ch = (width + 1) // 2, (height + 1) // 2
        cbp = _box_downsample(cbf, width, height, cw, ch)
        crp = _box_downsample(crf, width, height, cw, ch)
    else:
        cw, ch = width, height
        cbp, crp = cbf, crf

    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, (hy << 4) | vy, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    mcus_x = (width + 8 * hy - 1) // (8 * hy)
    mcus_y = (height + 8 * vy - 1) // (8 * vy)
    dc = {"y": 0, "cb": 0, "cr": 0}
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.flush()
                w.out += bytes(
                    [0xFF, 0xD0 + (mcu_i // restart_interval - 1) % 8]
                )
                dc = {"y": 0, "cb": 0, "cr": 0}
            mcu_i += 1
            for by in range(vy):
                for bx in range(hy):
                    dc["y"] = _encode_block(
                        w, yp, width, height,
                        (mx * hy + bx) * 8, (my * vy + by) * 8,
                        q, dc_codes, ac_codes, dc["y"],
                    )
            dc["cb"] = _encode_block(
                w, cbp, cw, ch, mx * 8, my * 8,
                q, dc_codes, ac_codes, dc["cb"],
            )
            dc["cr"] = _encode_block(
                w, crp, cw, ch, mx * 8, my * 8,
                q, dc_codes, ac_codes, dc["cr"],
            )
    w.flush()
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        SOI
        + _seg(0xDB, dqt)
        + dri
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes(w.out)
        + EOI
    )


def _block_zz(
    plane: bytes, pw: int, ph: int, x0: int, y0: int, q: list[int]
) -> list[int]:
    """FDCT + quantize one edge-replicated 8x8 block into zigzag-order
    integer coefficients (the coefficient half of ``_encode_block``)."""
    block = []
    for r in range(8):
        sr = min(y0 + r, ph - 1)
        block.append(
            [
                float(plane[sr * pw + min(x0 + c, pw - 1)]) - 128.0
                for c in range(8)
            ]
        )
    coef = _fdct(block)
    return [_quantize(coef[r][c], q[i]) for i, (r, c) in enumerate(ZIGZAG)]


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    *,
    color: bool = False,
    subsample: str = "4:4:4",
    bands: "tuple[tuple[int, int], ...]" = ((1, 63),),
    qtable: list[int] | None = None,
) -> bytes:
    """Encode as a PROGRESSIVE (SOF2) JPEG with a spectral-selection
    scan script: one interleaved DC scan, then per component one AC
    scan per ``(Ss, Se)`` band — no successive approximation (the
    decoder supports it; crafted streams in tests/test_jpeg.py cover
    that path). Grayscale (``color=False``, ``pixels`` = w*h bytes) or
    YCbCr color (``color=True``, interleaved RGB, 4:4:4 or 4:2:0).
    Coefficients are identical to the baseline encoder's, so a
    progressive round trip decodes to exactly the baseline round
    trip's pixels. AC scans are non-interleaved per T.81 and cover
    the COMPONENT-padded block grid (ceil(comp dims / 8)); the DC
    scan walks the MCU-padded grid, with edge blocks padded by the
    same replication rule as the baseline path."""
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    nbytes = width * height * (3 if color else 1)
    if len(pixels) != nbytes:
        raise ValueError(
            f"payload is {len(pixels)} bytes, expected {nbytes}"
        )
    if subsample not in SUBSAMPLE_FACTORS:
        raise ValueError(
            f"unsupported subsampling {subsample!r} "
            f"(supported: {sorted(SUBSAMPLE_FACTORS)})"
        )
    if not color and subsample != "4:4:4":
        raise ValueError("grayscale has no chroma to subsample")
    last = 0
    for ss, se in bands:
        if not (1 <= ss <= se <= 63) or ss <= last:
            raise ValueError(
                f"bands must be ordered disjoint sub-ranges of "
                f"[1, 63], got {bands}"
            )
        last = se
    q = list(DEFAULT_QTABLE if qtable is None else qtable)
    if len(q) != 64 or any(not 1 <= x <= 65535 for x in q):
        raise ValueError("qtable must be 64 quanta in [1, 65535]")
    wide = any(x > 255 for x in q)
    dqt = bytes([16 if wide else 0]) + (
        b"".join(struct.pack(">H", x) for x in q) if wide else bytes(q)
    )
    hy, vy = SUBSAMPLE_FACTORS[subsample] if color else (1, 1)
    if color:
        yp, cbf, crf = _ycbcr_planes(pixels, width, height)
        if subsample == "4:2:0":
            cw, ch = (width + 1) // 2, (height + 1) // 2
            cbp = _box_downsample(cbf, width, height, cw, ch)
            crp = _box_downsample(crf, width, height, cw, ch)
        else:
            cw, ch = width, height
            cbp, crp = cbf, crf
        # (plane, plane_w, plane_h, H, V) per component
        comps = [
            (bytes(yp), width, height, hy, vy),
            (bytes(cbp), cw, ch, 1, 1),
            (bytes(crp), cw, ch, 1, 1),
        ]
        sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
            [1, (hy << 4) | vy, 0, 2, 0x11, 0, 3, 0x11, 0]
        )
    else:
        comps = [(pixels, width, height, 1, 1)]
        sof = struct.pack(">BHHB", 8, height, width, 1) + bytes(
            [1, 0x11, 0]
        )
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    # coefficient blocks over each component's MCU-padded STORAGE grid
    # (edge blocks clamp-replicate); AC scans index its ceil-based
    # component sub-grid
    comp_zz = []
    grids = []
    for plane, pw, ph, h, v in comps:
        bw, bh = mcus_x * h, mcus_y * v
        grids.append((bw, bh))
        comp_zz.append(
            [
                _block_zz(plane, pw, ph, bx * 8, by * 8, q)
                for by in range(bh)
                for bx in range(bw)
            ]
        )
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)

    out = bytearray(SOI)
    out += _seg(0xDB, dqt)
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))

    # scan 1: interleaved DC, all components, MCU walk
    ncomp = len(comps)
    hdr = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        hdr += bytes([cid, 0x00])
    hdr += bytes([0, 0, 0])  # Ss=0 Se=0 Ah<<4|Al=0
    w = _BitWriter()
    prev = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_, _, _, h, v) in enumerate(comps):
                bw, _bh = grids[ci]
                for by in range(v):
                    for bx in range(h):
                        bi = (my * v + by) * bw + (mx * h + bx)
                        diff = comp_zz[ci][bi][0] - prev[ci]
                        prev[ci] = comp_zz[ci][bi][0]
                        size = _mag_size(diff)
                        code, length = dc_codes[size]
                        w.write(code, length)
                        if size:
                            bits = (
                                diff
                                if diff > 0
                                else diff + (1 << size) - 1
                            )
                            w.write(bits, size)
    w.flush()
    out += _seg(0xDA, hdr) + bytes(w.out)

    # AC scans: per component, per band, non-interleaved over the
    # component-padded sub-grid
    for ci, (_, _, _, h, v) in enumerate(comps):
        cw_i = (width * h + hmax - 1) // hmax
        ch_i = (height * v + vmax - 1) // vmax
        cbw, cbh = (cw_i + 7) // 8, (ch_i + 7) // 8
        bw, _bh = grids[ci]
        for ss, se in bands:
            hdr = bytes([1, ci + 1, 0x00, ss, se, 0])
            w = _BitWriter()
            for byy in range(cbh):
                for bxx in range(cbw):
                    zz = comp_zz[ci][byy * bw + bxx]
                    run = 0
                    for k in range(ss, se + 1):
                        val = zz[k]
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            zc, zl = ac_codes[0xF0]
                            w.write(zc, zl)
                            run -= 16
                        size = _mag_size(val)
                        if size > 10:
                            raise ValueError(
                                f"AC coefficient {val} exceeds the "
                                "10-bit cap; use a larger AC quantum"
                            )
                        code, length = ac_codes[(run << 4) | size]
                        w.write(code, length)
                        bits = (
                            val if val > 0 else val + (1 << size) - 1
                        )
                        w.write(bits, size)
                        run = 0
                    if run:
                        ec, el = ac_codes[0x00]  # EOB (EOBRUN of 1)
                        w.write(ec, el)
            w.flush()
            out += _seg(0xDA, hdr) + bytes(w.out)
    out += EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"unexpected marker 0xff{nxt:02x} in entropy stream"
                )
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, idx: int) -> None:
        """Consume an RSTn marker at an MCU boundary (T.81 §E.2.4):
        discard the pad bits of the finished restart segment, verify
        the modulo-8 marker sequence, and byte-align after it."""
        self._acc = 0
        self._n = 0
        # skip at most one UNREAD pad byte (the encoder's final
        # 1-padded partial byte, possibly 0xFF + its stuffed 0x00):
        # present only when the last Huffman code ended exactly on the
        # previous byte boundary so the pad byte was never pulled in
        if self.pos + 1 < len(self.data):
            if self.data[self.pos] != 0xFF:
                self.pos += 1
            elif self.data[self.pos + 1] == 0x00:
                self.pos += 2
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # optional fill bytes before the marker
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (idx % 8)
        ):
            got = self.data[self.pos : self.pos + 2].hex()
            raise ValueError(
                f"expected restart marker RST{idx % 8}, got 0x{got}"
            )
        self.pos += 2


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(bits: int, size: int) -> int:
    # T.81 §F.2.2.1 EXTEND: restore sign from magnitude bits
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential or progressive JPEG to ``(width,
    height, ncomp, pixels)`` — grayscale bytes for single-component streams, or
    row-major interleaved RGB for three-component YCbCr streams with
    4:4:4 or 4:2:0 sampling (nearest-neighbor chroma upsampling,
    JFIF integer-exact YCbCr→RGB). Restart intervals (DRI + RSTn
    markers) and progressive (SOF2) streams — spectral selection,
    successive approximation, EOBRUN — are supported. Raises
    ``ValueError`` on any unsupported variant (arithmetic coding,
    12-bit precision, other sampling layouts, CMYK) or
    malformed/truncated
    stream — callers treat that as "not a decodable image" and fall
    back to opaque-byte handling."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed JPEG: {e}") from e


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Single-component decode (original round-7 surface): raises on
    color streams — use :func:`decode_jpeg` / :func:`decode_jpeg_luma`
    for those."""
    width, height, ncomp, pixels = decode_jpeg(data)
    if ncomp != 1:
        raise ValueError(
            f"unsupported component count {ncomp} (grayscale only)"
        )
    return width, height, pixels


def decode_jpeg_color(data: bytes) -> tuple[int, int, bytes]:
    """Three-component decode to interleaved RGB; raises on grayscale
    streams (callers wanting either shape use :func:`decode_jpeg`)."""
    width, height, ncomp, pixels = decode_jpeg(data)
    if ncomp != 3:
        raise ValueError(f"expected a color JPEG, got {ncomp} component")
    return width, height, pixels


def decode_jpeg_luma(data: bytes) -> tuple[int, int, bytes]:
    """Decode any supported JPEG to a single luma plane: grayscale
    streams pass through; color streams return the BT.601 luma
    recomputed from the reconstructed RGB (what a feature extractor
    wants as its gray buffer)."""
    width, height, ncomp, pixels = decode_jpeg(data)
    if ncomp == 1:
        return width, height, pixels
    try:
        import numpy as np

        a = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(
            np.float64
        )
        y = 0.299 * a[0::3] + 0.587 * a[1::3] + 0.114 * a[2::3]
        return (
            width,
            height,
            np.clip(np.floor(y + 0.5), 0.0, 255.0)
            .astype(np.uint8)
            .tobytes(),
        )
    except ImportError:
        pass
    luma = bytearray(width * height)
    for i in range(width * height):
        luma[i] = _u8(
            0.299 * pixels[3 * i]
            + 0.587 * pixels[3 * i + 1]
            + 0.114 * pixels[3 * i + 2]
        )
    return width, height, bytes(luma)


def _align_to_marker(data: bytes, pos: int) -> int:
    """Advance past a finished entropy segment's pad byte (possibly
    0xFF + stuffed 0x00) and any 0xFF fill bytes so ``pos`` points at
    the 0xFF of the next marker (T.81 §B.1.1.2)."""
    if pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
        elif data[pos + 1] == 0x00:
            pos += 2
    while (
        pos + 1 < len(data)
        and data[pos] == 0xFF
        and data[pos + 1] == 0xFF
    ):
        pos += 1
    return pos


#: zigzag position k -> linear 64-index (row*8+col), for coefficient
#: arrays stored in zigzag order we just use k directly; this map is
#: for the natural-order IDCT assembly
def _refine_nonzero(reader: "_BitReader", coef: list, z: int, p1: int) -> None:
    # T.81 §G.2: one correction bit per already-nonzero coefficient;
    # bit 1 moves the value one quantum away from zero unless this
    # scan's bit position is already set (two's-complement OR/ADD —
    # Python's arbitrary-precision negatives behave identically)
    if reader.bit() and (coef[z] & p1) == 0:
        coef[z] += p1 if coef[z] > 0 else -p1


def _decode_prog_dc(
    reader, coef, ci, prev_dc, dc_tab, ah, al
) -> None:
    if ah == 0:  # first DC scan: magnitude in the scaled-down domain
        size = _decode_huff(reader, dc_tab)
        prev_dc[ci] += _extend(reader.bits(size), size)
        coef[0] = prev_dc[ci] << al
    else:  # refinement: one bit per block
        if reader.bit():
            coef[0] |= 1 << al


def _decode_prog_ac_first(
    reader, coef, ss, se, al, ac_tab, eobrun: list
) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        sym = _decode_huff(reader, ac_tab)
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL inside the band
                continue
            eobrun[0] = (1 << run) - 1
            if run:
                eobrun[0] += reader.bits(run)
            return
        k += run
        if k > se:
            raise ValueError("AC run past band end")
        coef[k] = _extend(reader.bits(size), size) << al
        k += 1


def _decode_prog_ac_refine(
    reader, coef, ss, se, al, ac_tab, eobrun: list
) -> None:
    p1 = 1 << al
    if eobrun[0] > 0:
        eobrun[0] -= 1
        for k in range(ss, se + 1):
            if coef[k]:
                _refine_nonzero(reader, coef, k, p1)
        return
    k = ss
    while k <= se:
        sym = _decode_huff(reader, ac_tab)
        run, size = sym >> 4, sym & 0x0F
        newval = 0
        if size:
            if size != 1:
                raise ValueError(
                    f"bad AC refinement symbol {sym:#x} (size must be 1)"
                )
            newval = p1 if reader.bit() else -p1
        elif run != 15:
            eobrun[0] = 1 << run
            if run:
                eobrun[0] += reader.bits(run)
            break
        # advance over `run` zero-HISTORY positions (16 for ZRL),
        # emitting a correction bit at every nonzero one passed
        while k <= se:
            if coef[k]:
                _refine_nonzero(reader, coef, k, p1)
            else:
                if run == 0:
                    break
                run -= 1
            k += 1
        if k <= se and newval:
            coef[k] = newval
        k += 1
    if eobrun[0] > 0:
        while k <= se:
            if coef[k]:
                _refine_nonzero(reader, coef, k, p1)
            k += 1
        eobrun[0] -= 1


def _decode_prog_scan(
    data: bytes,
    pos: int,
    scan_comps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    comps,
    coefs,
    comp_grids,
    huff,
    restart_interval: int,
    hmax: int,
    vmax: int,
    mcus_x: int,
    mcus_y: int,
    width: int,
    height: int,
) -> int:
    """Decode ONE progressive scan (T.81 Annex G.2) into the
    per-component zigzag coefficient arrays; returns the stream
    position of the next marker. DC scans (Ss=0) may interleave
    several components; AC scans are single-component by spec. The
    non-interleaved block grid is the COMPONENT-padded one
    (ceil(comp dims / 8)), a strict sub-grid of the MCU-padded
    storage grid."""
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError(f"bad DC scan band Ss=0 Se={se}")
    if not is_dc and len(scan_comps) != 1:
        raise ValueError("AC progressive scans must be single-component")
    if se > 63 or ss > se:
        raise ValueError(f"bad spectral band [{ss}, {se}]")
    if ah not in range(14) or al not in range(14) or (ah and ah != al + 1):
        raise ValueError(f"bad successive approximation Ah={ah} Al={al}")
    tables = {}
    for ci, dci, aci in scan_comps:
        if is_dc and ah == 0:
            if (0, dci) not in huff:
                raise ValueError(f"missing DC Huffman table {dci}")
            tables[ci] = huff[(0, dci)]
        elif not is_dc:
            if (1, aci) not in huff:
                raise ValueError(f"missing AC Huffman table {aci}")
            tables[ci] = huff[(1, aci)]
        else:
            tables[ci] = None  # DC refinement reads raw bits only
    reader = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    eobrun = [0]
    mcu_i = 0
    if len(scan_comps) > 1:  # interleaved DC scan: MCU walk
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and mcu_i
                    and mcu_i % restart_interval == 0
                ):
                    reader.restart(mcu_i // restart_interval - 1)
                    prev_dc = [0] * len(comps)
                mcu_i += 1
                for ci, _dci, _aci in scan_comps:
                    _, h, v, _ = comps[ci]
                    bw, _ = comp_grids[ci]
                    for by in range(v):
                        for bx in range(h):
                            bi = (my * v + by) * bw + (mx * h + bx)
                            _decode_prog_dc(
                                reader, coefs[ci][bi], ci, prev_dc,
                                tables[ci], ah, al,
                            )
    else:  # non-interleaved: one block per "MCU"
        ci = scan_comps[0][0]
        _, h, v, _ = comps[ci]
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        cbw, cbh = (cw + 7) // 8, (ch + 7) // 8
        bw, _ = comp_grids[ci]
        for byy in range(cbh):
            for bxx in range(cbw):
                if (
                    restart_interval
                    and mcu_i
                    and mcu_i % restart_interval == 0
                ):
                    reader.restart(mcu_i // restart_interval - 1)
                    prev_dc = [0] * len(comps)
                    eobrun[0] = 0
                mcu_i += 1
                zz = coefs[ci][byy * bw + bxx]
                if is_dc:
                    _decode_prog_dc(
                        reader, zz, ci, prev_dc, tables[ci], ah, al
                    )
                elif ah == 0:
                    _decode_prog_ac_first(
                        reader, zz, ss, se, al, tables[ci], eobrun
                    )
                else:
                    _decode_prog_ac_refine(
                        reader, zz, ss, se, al, tables[ci], eobrun
                    )
    return _align_to_marker(data, reader.pos)


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != SOI:
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = -1
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    scan_tabs: dict[int, tuple[int, int]] = {}
    restart_interval = 0
    progressive = False
    #: per-component zigzag coefficient blocks, filled scan by scan
    coefs: list[list[list[int]]] = []
    comp_grids: list[tuple[int, int]] = []  # interleaved (bw, bh)
    prog_scans = 0
    hmax = vmax = mcus_x = mcus_y = 0
    pos = 2
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — some encoders pad; skip them (ADVICE r7 interop fix)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI — legal terminator after the last
            if not (progressive and prog_scans):
                raise ValueError("unexpected EOI before any scan")
            pos += 2  # progressive scan; baseline breaks at SOS
            break
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq not in (0, 1):
                    raise ValueError(f"bad DQT precision {pq}")
                n = 64 * (2 if pq else 1)
                raw = body[i : i + n]
                i += n
                qtables[tq] = (
                    [
                        struct.unpack(">H", raw[j : j + 2])[0]
                        for j in range(0, 128, 2)
                    ]
                    if pq
                    else list(raw)
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xff{marker:02x} "
                "(baseline sequential or progressive only)"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2 (progressive)
            progressive = marker == 0xC2
            prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported component count {ncomp} "
                    "(grayscale or YCbCr only)"
                )
            comps = [
                (
                    body[6 + 3 * i],
                    body[7 + 3 * i] >> 4,
                    body[7 + 3 * i] & 0x0F,
                    body[8 + 3 * i],
                )
                for i in range(ncomp)
            ]
            samp = [(h, v) for _, h, v, _ in comps]
            if ncomp == 1 and samp != [(1, 1)]:
                raise ValueError("unsupported sampling (1x1 only)")
            if ncomp == 3 and samp not in (
                [(1, 1), (1, 1), (1, 1)],  # 4:4:4
                [(2, 2), (1, 1), (1, 1)],  # 4:2:0
            ):
                raise ValueError(
                    f"unsupported sampling layout {samp} "
                    "(4:4:4 and 4:2:0 only)"
                )
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nsym = sum(bits)
                vals = list(body[i + 17 : i + 17 + nsym])
                i += 17 + nsym
                table: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if width < 0:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if not progressive:
                if ns != len(comps):
                    raise ValueError(
                        f"unsupported scan: {ns} components in scan, "
                        f"{len(comps)} in frame (interleaved only)"
                    )
                for i in range(ns):
                    sid = body[1 + 2 * i]
                    scan_tabs[sid] = (
                        body[2 + 2 * i] >> 4,
                        body[2 + 2 * i] & 0x0F,
                    )
                break
            # ---- progressive scan ------------------------------------
            if not coefs:
                hmax = max(h for _, h, _, _ in comps)
                vmax = max(v for _, _, v, _ in comps)
                mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
                for _, h, v, _ in comps:
                    bw, bh = mcus_x * h, mcus_y * v
                    comp_grids.append((bw, bh))
                    coefs.append([[0] * 64 for _ in range(bw * bh)])
            cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
            scan_comps = []
            for i in range(ns):
                sid = body[1 + 2 * i]
                if sid not in cid_to_ci:
                    raise ValueError(f"scan names unknown component {sid}")
                scan_comps.append(
                    (
                        cid_to_ci[sid],
                        body[2 + 2 * i] >> 4,
                        body[2 + 2 * i] & 0x0F,
                    )
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            pos = _decode_prog_scan(
                data, pos, scan_comps, ss, se, ah, al,
                comps, coefs, comp_grids, huff, restart_interval,
                hmax, vmax, mcus_x, mcus_y, width, height,
            )
            prog_scans += 1
            continue
        elif marker == 0xD8:
            raise ValueError("unexpected SOI inside header")
        # APPn/COM/others: skipped
    if progressive:
        if not prog_scans:
            raise ValueError("progressive JPEG with no scans")
    else:
        hmax = max(h for _, h, _, _ in comps)
        vmax = max(v for _, _, v, _ in comps)
        mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    planes: list[bytearray] = []
    plane_dims: list[tuple[int, int]] = []
    tabs: list[tuple[list[int], dict, dict]] = []
    for ci, (cid, h, v, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError(f"missing quant table {tq}")
        pw, ph = mcus_x * h * 8, mcus_y * v * 8
        planes.append(bytearray(pw * ph))
        plane_dims.append((pw, ph))
        if progressive:
            tabs.append((qtables[tq], {}, {}))
            continue
        if cid not in scan_tabs:
            raise ValueError(f"component {cid} missing from scan")
        dc_id, ac_id = scan_tabs[cid]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("missing Huffman tables")
        tabs.append((qtables[tq], huff[(0, dc_id)], huff[(1, ac_id)]))

    if progressive:
        # all scans consumed: dequantize + IDCT every block into its
        # component plane — identical math to the baseline path
        for ci, (cid, h, v, tq) in enumerate(comps):
            q = qtables[tq]
            bw, _ = comp_grids[ci]
            pw, _ = plane_dims[ci]
            plane = planes[ci]
            for bi, zz in enumerate(coefs[ci]):
                coef = [[0.0] * 8 for _ in range(8)]
                for i, (r, c) in enumerate(ZIGZAG):
                    coef[r][c] = float(zz[i] * q[i])
                block = _idct(coef)
                x0, y0 = (bi % bw) * 8, (bi // bw) * 8
                for r in range(8):
                    base = (y0 + r) * pw + x0
                    row = block[r]
                    for c in range(8):
                        plane[base + c] = _u8(row[c] + 128.0)
        return _planes_to_output(
            width, height, comps, planes, plane_dims, hmax, vmax
        )

    reader = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # RSTn boundary: byte-align, verify the cyclic marker,
                # reset every component's DC predictor (T.81 §E.2.4)
                reader.restart(mcu_i // restart_interval - 1)
                prev_dc = [0] * len(comps)
            mcu_i += 1
            for ci, (cid, h, v, tq) in enumerate(comps):
                q, dc_tab, ac_tab = tabs[ci]
                pw, _ = plane_dims[ci]
                for by in range(v):
                    for bx in range(h):
                        zz = [0] * 64
                        size = _decode_huff(reader, dc_tab)
                        prev_dc[ci] += _extend(reader.bits(size), size)
                        zz[0] = prev_dc[ci] * q[0]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(reader, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"bad AC symbol {sym:#x}"
                                    )
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(size), size) * q[k]
                            k += 1
                        coef = [[0.0] * 8 for _ in range(8)]
                        for i, (r, c) in enumerate(ZIGZAG):
                            coef[r][c] = float(zz[i])
                        block = _idct(coef)
                        x0 = (mx * h + bx) * 8
                        y0 = (my * v + by) * 8
                        plane = planes[ci]
                        for r in range(8):
                            base = (y0 + r) * pw + x0
                            row = block[r]
                            for c in range(8):
                                plane[base + c] = _u8(row[c] + 128.0)

    return _planes_to_output(
        width, height, comps, planes, plane_dims, hmax, vmax
    )


def _planes_to_output(
    width: int,
    height: int,
    comps,
    planes,
    plane_dims,
    hmax: int,
    vmax: int,
) -> tuple[int, int, int, bytes]:
    """Shared decode tail: crop the single-component plane, or
    upsample chroma + YCbCr->RGB (vectorized when numpy is present,
    bit-identical scalar fallback)."""
    if len(comps) == 1:
        pw, _ = plane_dims[0]
        src = planes[0]
        pixels = bytearray(width * height)
        for y in range(height):
            pixels[y * width : (y + 1) * width] = src[
                y * pw : y * pw + width
            ]
        return width, height, 1, bytes(pixels)

    ypw = plane_dims[0][0]
    cpw = plane_dims[1][0]
    yplane, cbplane, crplane = planes
    try:
        import numpy as np
    except ImportError:
        np = None
    if np is not None:
        # vectorized upsample + reconstruction — same expressions and
        # floor(x+0.5) rounding as _ycbcr_to_rgb, bit-identical
        yy = (
            np.frombuffer(bytes(yplane), dtype=np.uint8)
            .reshape(-1, ypw)[:height, :width]
            .astype(np.float64)
        )
        ridx = np.arange(height) * comps[1][2] // vmax
        cidx = np.arange(width) * comps[1][1] // hmax
        cbm = np.frombuffer(bytes(cbplane), dtype=np.uint8).reshape(
            -1, cpw
        )[np.ix_(ridx, cidx)].astype(np.float64)
        crm = np.frombuffer(bytes(crplane), dtype=np.uint8).reshape(
            -1, cpw
        )[np.ix_(ridx, cidx)].astype(np.float64)
        rv = yy + 1.402 * (crm - 128)
        gv = yy - 0.344136 * (cbm - 128) - 0.714136 * (crm - 128)
        bv = yy + 1.772 * (cbm - 128)
        out = np.stack(
            [
                np.clip(np.floor(c + 0.5), 0.0, 255.0)
                for c in (rv, gv, bv)
            ],
            axis=-1,
        ).astype(np.uint8)
        return width, height, 3, out.tobytes()
    rgb = bytearray(width * height * 3)
    for y in range(height):
        cy = y * comps[1][2] // vmax
        for x in range(width):
            cx = x * comps[1][1] // hmax
            rv, gv, bv = _ycbcr_to_rgb(
                yplane[y * ypw + x],
                cbplane[cy * cpw + cx],
                crplane[cy * cpw + cx],
            )
            i = (y * width + x) * 3
            rgb[i] = rv
            rgb[i + 1] = gv
            rgb[i + 2] = bv
    return width, height, 3, bytes(rgb)
