"""Full stdlib PNG codec — no external image library required.

The reference reads JPEG/PNG pages via PIL (``table_extraction/
preprocessing.py:49-62``, ``image_file_to_array``).  This container has no
PIL, but PNG needs only ``zlib`` + ``struct``, so real PNG page payloads are
first-class inputs here (routed by magic in :func:`media.decode_page`), not a
stub.  Supported: every legal (color type × bit depth) combination of the
PNG spec — gray 1/2/4/8/16, palette 1/2/4/8 (PLTE lookup), RGB 8/16,
gray+alpha 8/16 and RGBA 8/16 (alpha dropped; document scans are opaque)
— plus Adam7 interlacing.  16-bit samples keep the high byte (the spec's
own 16→8 reduction); sub-byte gray expands by the standard 255/(2^d−1)
factor.

Decode implements all five PNG scanline filters (None/Sub/Up/Average/Paeth,
RFC 2083 §6) over byte-oriented scanlines (bpp = byte distance per the
spec, so sub-byte depths filter on packed bytes).  Filter 0 and Up are
fully vectorized; Sub/Average/Paeth need the per-pixel recurrence but
appear only in foreign PNGs (our encoder emits filter 0), and even there
the loop is per-row NumPy over small page widths.

Encode emits filter-0 scanlines: 8-bit grayscale or RGB, optionally
Adam7-interlaced, plus palette / 16-bit / sub-byte-gray fixture encoders
so tests and the q48 gate exercise every decode lane with no foreign
files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
MAGIC = SIGNATURE[:4]  # b"\x89PNG" — the 4-byte routing prefix

# samples per pixel by color type (3 = palette index)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 pass geometry: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


# ----------------------------------------------------------------- encode

def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 H×W (gray) or H×W×3 (RGB) → PNG bytes (filter 0, one IDAT);
    ``interlace=True`` writes Adam7 passes."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError(f"expected uint8 H×W[×3], got {img.dtype} {img.shape}")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError(f"expected 3 channels, got {img.shape[2]}")
    h, w = img.shape[:2]
    color_type = 0 if img.ndim == 2 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    parts = []
    for sub in _pass_images(img, interlace):
        flat = sub.reshape(sub.shape[0], -1)
        parts.extend(b"\x00" + flat[y].tobytes() for y in range(sub.shape[0]))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + _chunk(b"IEND", b"")
    )


def _pass_images(img: np.ndarray, interlace: bool):
    if not interlace:
        yield img
        return
    h, w = img.shape[:2]
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            yield sub


def encode_png_palette(img: np.ndarray) -> bytes:
    """uint8 gray H×W → palette (color type 3) PNG whose PLTE is the
    identity gray ramp — lossless for the gray pipeline."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 H×W, got {img.dtype} {img.shape}")
    h, w = img.shape
    plte = bytes(v for v in range(256) for _ in range(3))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def encode_png16(img16: np.ndarray) -> bytes:
    """uint16 gray H×W → 16-bit grayscale PNG (big-endian samples)."""
    if img16.dtype != np.uint16 or img16.ndim != 2:
        raise ValueError(f"expected uint16 H×W, got {img16.dtype} {img16.shape}")
    h, w = img16.shape
    be = img16.astype(">u2")
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + be[y].tobytes() for y in range(h))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_gray_depth(img: np.ndarray, depth: int) -> bytes:
    """uint8 gray H×W → 1/2/4-bit grayscale PNG.  Sample values must be
    exact multiples of the expansion factor 255/(2^depth−1) (i.e. already
    quantized), so decode round-trips losslessly."""
    if depth not in (1, 2, 4):
        raise ValueError(f"depth must be 1/2/4, got {depth}")
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 H×W, got {img.dtype} {img.shape}")
    factor = 255 // ((1 << depth) - 1)
    if np.any(img % factor):
        raise ValueError(f"samples must be multiples of {factor} at depth {depth}")
    codes = (img // factor).astype(np.uint8)
    h, w = img.shape
    rows = []
    for y in range(h):
        bits = np.unpackbits(codes[y][:, None], axis=1, count=8)[:, 8 - depth :]
        packed = np.packbits(bits.reshape(-1))
        rows.append(b"\x00" + packed.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------- decode

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw, h: int, row_bytes: int, bpp: int) -> np.ndarray:
    """Filtered scanlines (h·(1+row_bytes) bytes) → (h, row_bytes) uint8.
    ``bpp`` is the filter byte distance (≥1 even for sub-byte depths)."""
    if len(raw) != h * (row_bytes + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (row_bytes + 1)}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, row_bytes + 1)
    filters = lines[:, 0]
    data = lines[:, 1:]
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = data[y]
        if f == 0:  # None
            row = cur.copy()
        elif f == 2:  # Up — vectorized
            row = cur + prev  # uint8 wraps mod 256, per spec
        elif f == 1:  # Sub
            row = cur.copy()
            for i in range(bpp, row_bytes):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif f == 3:  # Average
            row = np.zeros(row_bytes, dtype=np.uint8)
            for i in range(row_bytes):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            row = np.zeros(row_bytes, dtype=np.uint8)
            for i in range(row_bytes):
                left = int(row[i - bpp]) if i >= bpp else 0
                up_left = int(prev[i - bpp]) if i >= bpp else 0
                row[i] = (int(cur[i]) + _paeth(left, int(prev[i]), up_left)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = row
        prev = row
    return out


def _rows_to_samples(
    rows: np.ndarray, w: int, ch: int, depth: int
) -> np.ndarray:
    """(h, row_bytes) packed bytes → (h, w, ch) uint8 samples.  16-bit
    keeps the high byte; 1/2/4-bit unpack MSb-first and stay as CODES
    (gray expansion happens at the caller, palette indices must not
    expand)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        return rows[:, : w * ch * 2].reshape(h, w, ch, 2)[..., 0]
    bits = np.unpackbits(rows, axis=1)
    weights = 1 << np.arange(depth - 1, -1, -1)
    codes = (bits.reshape(h, -1, depth).astype(np.uint16) @ weights).astype(
        np.uint8
    )
    return codes[:, :w].reshape(h, w, 1)


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
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            if length % 3 or length > 768:
                raise ValueError(f"bad PLTE length {length}")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(
            f"illegal PNG depth {depth} for color type {color_type}"
        )
    if interlace > 1:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    if w == 0 or h == 0 or w * h > 500_000_000:
        raise ValueError(f"PNG dimensions {w}x{h} out of bounds")
    ch = _CHANNELS[color_type]
    bpp = max(1, (ch * depth) // 8)
    raw = zlib.decompress(b"".join(idat))
    img = np.zeros((h, w, ch), dtype=np.uint8)
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        row_bytes = (pw * ch * depth + 7) // 8
        need = ph * (row_bytes + 1)
        rows = _unfilter(raw[off : off + need], ph, row_bytes, bpp)
        off += need
        img[y0::dy, x0::dx] = _rows_to_samples(rows, pw, ch, depth)
    if off != len(raw):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != consumed {off}"
        )
    if color_type == 3:
        codes = img[:, :, 0]
        top = int(codes.max()) if codes.size else 0
        if top >= len(plte):
            # refuse loudly, matching the decoder's other hostile-input
            # checks — a clamped index decodes to silently wrong pixels
            raise ValueError(
                f"PNG palette index {top} out of range for "
                f"{len(plte)}-entry PLTE"
            )
        # grayscale palettes map by index EXACTLY — the same rule as the
        # GIF/BMP lanes (media.palette_to_gray): float luma of (i,i,i)
        # truncates to i-1
        if (plte[:, 0] == plte[:, 1]).all() and (plte[:, 1] == plte[:, 2]).all():
            return plte[:, 0][codes]
        return plte[codes]
    if color_type == 0 and depth < 8:
        img = img * (255 // ((1 << depth) - 1))  # expand codes to gray
    if ch == 4:
        return img[:, :, :3]  # drop alpha; document scans are opaque
    if ch == 2:
        return img[:, :, 0]  # gray + alpha → gray
    return img[:, :, 0] if ch == 1 else img
