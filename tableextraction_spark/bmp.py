"""From-scratch BMP codec (Windows DIB, uncompressed) — no image library.

BMP is the simplest raster container a crawl encounters: BITMAPFILEHEADER +
BITMAPINFOHEADER + optional palette + bottom-up rows padded to 4 bytes
(public Windows GDI format).  Supported: 8-bit paletted (the scanner/
screenshot gray case), 24-bit BGR, and 32-bit BGRA (alpha ignored);
BI_RGB (uncompressed) only — RLE4/RLE8/bitfields raise ``ValueError``
naming the mode (captured per-row by the decode stage).  Top-down bitmaps
(negative height) are handled.  Output is uint8 H×W grayscale: gray
palettes map by index, color reduces via the shared ``media.rgb_to_gray``.

The encoder (8-bit gray palette) is the fixture writer, same pairing as
``encode_gif_gray``/``encode_wav``; BMP is lossless so round-trips are
exact.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"BM"
_FILEHDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_INFOHDR = struct.Struct("<IiiHHIIiiII")


def decode_bmp(payload: bytes) -> np.ndarray:
    buf = bytes(payload)
    if buf[:2] != MAGIC:
        raise ValueError(f"not a BMP: {buf[:2]!r}")
    if len(buf) < _FILEHDR.size + _INFOHDR.size:
        raise ValueError("BMP: truncated header")
    _m, _fsz, _r1, _r2, data_off = _FILEHDR.unpack_from(buf, 0)
    (hdr_sz, w, h, planes, bpp, comp, _isz, _xp, _yp, clr_used, _clr_imp) = (
        _INFOHDR.unpack_from(buf, _FILEHDR.size)
    )
    if hdr_sz < 40:
        raise ValueError(f"BMP: unsupported header size {hdr_sz} (need BITMAPINFOHEADER+)")
    if comp != 0:
        raise ValueError(f"BMP: unsupported compression {comp} (BI_RGB only; RLE/bitfields unsupported)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP: unsupported bit depth {bpp} (8/24/32)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"BMP: bad dimensions {w}×{h}")
    row_bytes = (w * bpp // 8 + 3) & ~3
    need = data_off + row_bytes * h
    if need > len(buf):
        raise ValueError("BMP: pixel data truncated")
    raw = np.frombuffer(buf, dtype=np.uint8, offset=data_off, count=row_bytes * h)
    rows = raw.reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_pal = clr_used or 256
        pal_off = _FILEHDR.size + hdr_sz
        pal = np.frombuffer(buf, dtype=np.uint8, offset=pal_off, count=n_pal * 4)
        if len(pal) < n_pal * 4:
            raise ValueError("BMP: truncated palette")
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]  # BGRA quads → RGB
        idx = rows[:, :w]
        from .media import palette_to_gray

        lut = palette_to_gray(pal)
        return np.ascontiguousarray(lut[np.minimum(idx, n_pal - 1)])
    step = bpp // 8
    px = rows[:, : w * step].reshape(h, w, step)
    rgb = px[:, :, :3][:, :, ::-1]  # BGR(A) → RGB
    from .media import rgb_to_gray

    return rgb_to_gray(rgb)


def encode_bmp_gray(img: np.ndarray) -> bytes:
    """uint8 H×W grayscale → 8-bit paletted BMP (lossless fixture writer)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 H×W grayscale, got {img.dtype} {img.shape}")
    h, w = img.shape
    row_bytes = (w + 3) & ~3
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    data_off = _FILEHDR.size + _INFOHDR.size + 256 * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = img[::-1]  # bottom-up
    out = _FILEHDR.pack(MAGIC, data_off + row_bytes * h, 0, 0, data_off)
    out += _INFOHDR.pack(40, w, h, 1, 8, 0, row_bytes * h, 2835, 2835, 256, 0)
    return out + pal.tobytes() + rows.tobytes()
