"""Pure-stdlib PNG codec for 8-bit grayscale images.

Closes the last labeled fake in the multimodal path
(operators/multimodal.py::extract_features): the container ships no
PIL/ffmpeg, but PNG's format core is just zlib (stdlib) plus five
byte-delta scanline filters, so one real codec path is feasible
without any dependency — a pipeline asset with an actual
``\\x89PNG`` payload now decodes to real pixels end-to-end.

Scope (documented, enforced): 8-bit grayscale (color type 0, bit
depth 8, no interlace). That is the canonical single-channel feature
input; RGB/palette/alpha payloads raise ``ValueError`` and the caller
falls back to its opaque-bytes handling. The DECODER handles all five
PNG filter types (None/Sub/Up/Average/Paeth — any conforming encoder
may emit them per scanline); the ENCODER emits filter 0 scanlines,
which every PNG reader accepts.

Reference: PNG spec (RFC 2083 / ISO 15948) §6 (chunks), §9 (filters).
Scale note: the codec is a per-row kernel invoked inside Arrow-batched
``mapInPandas`` — pure CPU over one payload at a time, embarrassingly
parallel, no Spark-side state.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Encode a raw row-major 8-bit grayscale buffer as a PNG.

    Deterministic (zlib level pinned at 6, filter 0 on every
    scanline), so encoded payloads are stable across runs/retries —
    the property every hash-gated contract upstream relies on.
    """
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(
            f"payload is {len(pixels)} bytes, expected {width * height}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale PNG to ``(width, height, pixels)``.

    Verifies the signature and each chunk CRC, inflates the IDAT
    stream, and reverses whichever of the five scanline filters the
    encoder chose per row. Raises ``ValueError`` on anything outside
    the supported profile (wrong color type/bit depth, interlace,
    truncation, CRC mismatch) — callers treat that as "not a
    decodable image", never as a silent zero result.
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = -1
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if crc != (crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or ctype != 0:
                raise ValueError(
                    f"unsupported PNG profile (depth={depth}, "
                    f"color_type={ctype}); this codec is 8-bit gray only"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported compression/filter/interlace")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width < 0 or not seen_end:
        raise ValueError("missing IHDR or IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError(
            f"inflated stream is {len(raw)} bytes, expected {stride * height}"
        )
    out = bytearray(width * height)
    prev_start = -1
    for r in range(height):
        ftype = raw[r * stride]
        line = raw[r * stride + 1 : (r + 1) * stride]
        base = r * width
        if ftype == 0:  # None
            out[base : base + width] = line
        elif ftype == 1:  # Sub
            for x in range(width):
                left = out[base + x - 1] if x > 0 else 0
                out[base + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                up = out[prev_start + x] if r > 0 else 0
                out[base + x] = (line[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(width):
                left = out[base + x - 1] if x > 0 else 0
                up = out[prev_start + x] if r > 0 else 0
                out[base + x] = (line[x] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                left = out[base + x - 1] if x > 0 else 0
                up = out[prev_start + x] if r > 0 else 0
                upleft = out[prev_start + x - 1] if (r > 0 and x > 0) else 0
                out[base + x] = (line[x] + _paeth(left, up, upleft)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        prev_start = base
    return width, height, bytes(out)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) — the audio sibling of the PNG path above. The stdlib
# `wave` module IS a real codec for PCM WAV, so audio payloads get the
# same end-to-end treatment: a genuine container in, decoded samples out.
# ---------------------------------------------------------------------------

WAV_PREFIX = b"RIFF"


def encode_wav_pcm16(
    frames: bytes, *, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Encode raw little-endian 16-bit PCM frames as a WAV container
    (stdlib ``wave``). Deterministic: the header is a pure function of
    (len, rate, channels)."""
    import io
    import wave

    if len(frames) % (2 * channels) != 0:
        raise ValueError(
            f"frames length {len(frames)} is not a whole number of "
            f"{channels}-channel 16-bit samples"
        )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PCM WAV container to ``(sample_rate, channels,
    frames)`` — raw little-endian 16-bit PCM bytes. Raises
    ``ValueError`` on non-PCM/compressed or malformed containers
    (callers fall back to opaque-bytes handling, like the PNG path)."""
    import io
    import wave

    if data[:4] != WAV_PREFIX or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"unsupported sample width {w.getsampwidth()}; "
                    "this codec is 16-bit PCM only"
                )
            return (
                w.getframerate(),
                w.getnchannels(),
                w.readframes(w.getnframes()),
            )
    except wave.Error as exc:
        raise ValueError(f"malformed WAV: {exc}") from exc
