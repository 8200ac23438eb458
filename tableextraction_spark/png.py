"""Minimal stdlib PNG codec — no external image library required.

The reference reads JPEG/PNG pages via PIL (``table_extraction/
preprocessing.py:49-62``, ``image_file_to_array``).  This container has no
PIL, but PNG needs only ``zlib`` + ``struct``, so real PNG page payloads are
first-class inputs here (routed by magic in :func:`media.decode_page`), not a
stub.  Supported: 8-bit depth, color types 0 (grayscale), 2 (RGB) and
6 (RGBA, alpha dropped), non-interlaced — i.e. everything a scanned/rendered
document page uses.  Unsupported variants (16-bit, palette, interlaced) raise
``ValueError`` naming the feature, which the pipeline captures per-row.

Decode implements all five PNG scanline filters (None/Sub/Up/Average/Paeth,
RFC 2083 §6).  Filter 0 and Up are fully vectorized; Sub/Average/Paeth need
the per-pixel recurrence but appear only in foreign PNGs (our encoder emits
filter 0), and even there the loop is per-row NumPy over small page widths.

Encode emits filter-0 scanlines (grayscale or RGB) — used by the fixture
generator so end-to-end tests exercise this real format, and by any sink
needing a portable page image.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
MAGIC = SIGNATURE[:4]  # b"\x89PNG" — the 4-byte routing prefix

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 H×W (gray) or H×W×3 (RGB) → PNG bytes (filter 0, one IDAT)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError(f"expected uint8 H×W[×3], got {img.dtype} {img.shape}")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError(f"expected 3 channels, got {img.shape[2]}")
    h, w = img.shape[:2]
    color_type = 0 if img.ndim == 2 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = img.reshape(h, -1)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        SIGNATURE
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


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (stride + 1)}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = data[y]
        if f == 0:  # None
            row = cur.copy()
        elif f == 2:  # Up — vectorized
            row = cur + prev  # uint8 wraps mod 256, per spec
        elif f == 1:  # Sub
            row = cur.copy()
            for i in range(ch, stride):
                row[i] = (int(row[i]) + int(row[i - ch])) & 0xFF
        elif f == 3:  # Average
            row = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(row[i - ch]) if i >= ch else 0
                row[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            row = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(row[i - ch]) if i >= ch else 0
                up_left = int(prev[i - ch]) if i >= ch else 0
                row[i] = (int(cur[i]) + _paeth(left, int(prev[i]), up_left)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = row
        prev = row
    return out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 H×W (gray) or H×W×3 (RGB; alpha dropped).

    RGB pages feed :func:`kernel.binarize.grayzation` downstream (channel
    mean — the reference's ``grayzation`` semantics, preprocessing.py:81-94).
    """
    buf = bytes(payload)
    if buf[:8] != SIGNATURE:
        raise ValueError(f"not a PNG: magic {buf[:8]!r}")
    pos = 8
    ihdr = None
    idat: list[bytes] = []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG color type {color_type} (gray/RGB/RGBA only)"
        )
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    img = _unfilter(raw, h, w, ch)
    if ch == 4:
        img = img[:, :, :3]  # drop alpha; document scans are opaque
    return img
