"""From-scratch ICO/CUR codec (Windows icon resource) — no image library.

Favicons are the web's stealth image format: a crawl that fetches
``/favicon.ico`` for every host accumulates millions of these, so the
inventory probe and the decode lane both route them.  The container is the
public Windows ICONDIR layout: a 6-byte directory header, 16-byte entries,
and per-entry payloads that are either an embedded PNG (modern encoders)
or a headerless DIB — BITMAPINFOHEADER whose ``biHeight`` is DOUBLED to
cover the XOR pixel rows plus a 1-bpp AND transparency mask, both
bottom-up and 4-byte row padded.

Supported DIB depths: 1/4/8-bit paletted, 24-bit BGR, 32-bit BGRA.
32-bit alpha composites over the white page background (all-zero alpha
planes — common in legacy encoders that rely on the AND mask alone —
are treated as opaque, the standard renderer convention); the AND mask
then forces masked pixels white.  PNG entries reuse ``png.decode_png``.
Malformed directories/entries raise named ``ValueError``s (captured
per-row by the decode stage), matching the refuse-loudly policy of the
sibling codecs.

The encoders are fixture writers (single-entry DIB or PNG flavor), the
same pairing as ``encode_bmp_gray``/``encode_png``; both flavors are
lossless so round-trips are exact.
"""

from __future__ import annotations

import struct

import numpy as np

_ICONDIR = struct.Struct("<HHH")        # reserved, type, count
_ENTRY = struct.Struct("<BBBBHHII")     # w, h, colors, res, planes, bpp, size, offset
_INFOHDR = struct.Struct("<IiiHHIIiiII")
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

ICO_MAGIC = b"\x00\x00\x01\x00"
CUR_MAGIC = b"\x00\x00\x02\x00"


def _entries(buf: bytes):
    if len(buf) < _ICONDIR.size:
        raise ValueError("ICO: truncated directory header")
    reserved, kind, count = _ICONDIR.unpack_from(buf, 0)
    if reserved != 0 or kind not in (1, 2):
        raise ValueError(f"not an ICO/CUR: reserved={reserved} type={kind}")
    if count == 0:
        raise ValueError("ICO: zero directory entries")
    need = _ICONDIR.size + count * _ENTRY.size
    if len(buf) < need:
        raise ValueError(f"ICO: directory truncated ({len(buf)} < {need})")
    out = []
    for i in range(count):
        w, h, _colors, _res, _planes, _bpp, size, offset = _ENTRY.unpack_from(
            buf, _ICONDIR.size + i * _ENTRY.size
        )
        out.append((w or 256, h or 256, size, offset))
    return kind, out


def is_ico_magic(head: bytes) -> bool:
    return bytes(head[:4]) in (ICO_MAGIC, CUR_MAGIC)


def ico_probe(payload: bytes) -> dict:
    """Header-only: directory walk, no pixel decode (the probe tier)."""
    buf = bytes(payload)
    kind, entries = _entries(buf)
    w, h, _sz, _off = max(entries, key=lambda e: e[0] * e[1])
    return {
        "format": "ico", "kind": "image", "width": w, "height": h,
        "n_frames": len(entries), "codec": "cur" if kind == 2 else "",
    }


def _decode_dib_entry(buf: bytes, offset: int, size: int) -> np.ndarray:
    end = offset + size
    if end > len(buf) or size < _INFOHDR.size:
        raise ValueError("ICO: entry payload out of range")
    (hdr_sz, w, h2, _planes, bpp, comp, _isz, _xp, _yp, clr_used,
     _clr_imp) = _INFOHDR.unpack_from(buf, offset)
    if hdr_sz < 40:
        raise ValueError(f"ICO: unsupported DIB header size {hdr_sz}")
    if comp != 0:
        raise ValueError(f"ICO: unsupported DIB compression {comp} (BI_RGB only)")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"ICO: unsupported bit depth {bpp}")
    h = h2 // 2  # biHeight covers XOR + AND planes
    if w <= 0 or h <= 0 or h2 != 2 * h:
        raise ValueError(f"ICO: bad DIB dimensions {w}x{h2}")
    n_pal = (clr_used or (1 << bpp)) if bpp <= 8 else 0
    pal_off = offset + hdr_sz
    xor_off = pal_off + n_pal * 4
    xor_rb = (w * bpp + 31) // 32 * 4
    and_off = xor_off + xor_rb * h
    and_rb = (w + 31) // 32 * 4
    if and_off + and_rb * h > end:
        raise ValueError("ICO: DIB pixel data truncated")
    xor = np.frombuffer(buf, np.uint8, offset=xor_off, count=xor_rb * h)
    xor = xor.reshape(h, xor_rb)[::-1]  # bottom-up
    alpha = None
    if bpp <= 8:
        pal = np.frombuffer(buf, np.uint8, offset=pal_off, count=n_pal * 4)
        if len(pal) < n_pal * 4:
            raise ValueError("ICO: truncated palette")
        pal = pal.reshape(-1, 4)[:, :3][:, ::-1]  # BGRA quads -> RGB
        if bpp == 8:
            idx = xor[:, :w]
        else:
            bits = np.unpackbits(xor, axis=1)
            if bpp == 1:
                idx = bits[:, :w]
            else:  # 4-bit: high nibble first
                nib = bits.reshape(h, -1, 4)
                idx = (nib * np.array([8, 4, 2, 1], np.uint8)).sum(
                    axis=2, dtype=np.uint8
                )[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError(
                f"ICO: palette index {int(idx.max())} >= palette size {n_pal}"
            )
        from .media import palette_to_gray

        gray = palette_to_gray(pal)[idx]
    else:
        step = bpp // 8
        px = xor[:, : w * step].reshape(h, w, step)
        rgb = px[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB
        from .media import rgb_to_gray

        gray = rgb_to_gray(rgb)
        if bpp == 32:
            alpha = px[:, :, 3]
            if not alpha.any():  # legacy all-zero alpha: AND mask rules
                alpha = None
    if alpha is not None:
        a = alpha.astype(np.float64) / 255.0
        gray = np.clip(
            np.rint(gray * a + 255.0 * (1.0 - a)), 0, 255
        ).astype(np.uint8)
    mask = np.frombuffer(buf, np.uint8, offset=and_off, count=and_rb * h)
    mask_bits = np.unpackbits(mask.reshape(h, and_rb)[::-1], axis=1)[:, :w]
    gray = gray.copy()
    gray[mask_bits == 1] = 255  # transparent -> white page background
    return gray


def decode_ico(payload: bytes) -> np.ndarray:
    """Largest entry -> uint8 H*W grayscale over a white background."""
    buf = bytes(payload)
    _kind, entries = _entries(buf)
    w, h, size, offset = max(entries, key=lambda e: e[0] * e[1])
    if offset + 8 <= len(buf) and buf[offset : offset + 8] == _PNG_MAGIC:
        from .png import decode_png

        # directory dims are advisory 8-bit fields; the PNG is the authority
        return decode_png(buf[offset : offset + size])
    return _decode_dib_entry(buf, offset, size)


def encode_ico_gray(img: np.ndarray) -> bytes:
    """uint8 H*W grayscale -> single-entry 8-bit DIB ICO (fixture writer)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 HxW grayscale, got {img.dtype} {img.shape}")
    h, w = img.shape
    if not (0 < w <= 256 and 0 < h <= 256):
        raise ValueError(f"ICO entries are at most 256x256, got {w}x{h}")
    xor_rb = (w + 3) & ~3
    and_rb = (w + 31) // 32 * 4
    pal = np.zeros((256, 4), np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    xor = np.zeros((h, xor_rb), np.uint8)
    xor[:, :w] = img[::-1]
    dib = (
        _INFOHDR.pack(40, w, 2 * h, 1, 8, 0, xor_rb * h + and_rb * h,
                      0, 0, 256, 0)
        + pal.tobytes()
        + xor.tobytes()
        + bytes(and_rb * h)  # all-opaque AND mask
    )
    hdr = _ICONDIR.pack(0, 1, 1) + _ENTRY.pack(
        w & 0xFF, h & 0xFF, 0, 0, 1, 8, len(dib),
        _ICONDIR.size + _ENTRY.size,
    )
    return hdr + dib


def encode_ico_png(img: np.ndarray) -> bytes:
    """uint8 H*W grayscale -> single-entry PNG-flavor ICO (fixture writer)."""
    from .png import encode_png

    if img.ndim != 2 or img.shape[0] > 256 or img.shape[1] > 256:
        raise ValueError("ICO entries are at most 256x256 grayscale")
    blob = encode_png(img)
    h, w = img.shape
    hdr = _ICONDIR.pack(0, 1, 1) + _ENTRY.pack(
        w & 0xFF, h & 0xFF, 0, 0, 1, 32, len(blob),
        _ICONDIR.size + _ENTRY.size,
    )
    return hdr + blob
