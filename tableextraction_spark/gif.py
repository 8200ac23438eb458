"""From-scratch GIF codec (GIF87a/GIF89a, LZW) — no image library.

Completes the web-image set next to ``png.py`` and ``jpeg.py``: the wire
format is the public GIF89a specification (CompuServe, 1990) — logical
screen descriptor, global/local color tables, variable-width LZW with
CLEAR/END codes (max 12 bits), sub-block framing, and the 4-pass row
interlace.  Decode returns the FIRST image frame as uint8 grayscale
(palette → BT.601 luma via ``media.rgb_to_gray``) — the still-image
treatment; later animation frames are ignored by design.  The encoder is
a real LZW compressor (not the fixed-width trick) used by fixtures/tests;
GIF is lossless so round-trips are exact.

Hostile-input bounds: every length field is clamped to the buffer, the
sub-block walk strictly advances, LZW dictionary growth is capped at the
spec's 4096 entries, and output stops at width×height pixels — a lying
stream cannot balloon memory.  Malformed payloads raise ``ValueError``
(captured per-row by the decode stage, pipeline failure-isolation rule).

Reference parity note: the reference reads images via PIL
(``table_extraction/preprocessing.py:49-62``); this lane exists so a web
crawl's GIFs decode natively.
"""

from __future__ import annotations

import struct

import numpy as np

MAGICS = (b"GIF87a", b"GIF89a")
_U16 = struct.Struct("<H")


# ------------------------------------------------------------------ decode


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate sub-blocks (len byte + data, 0 terminates) from pos."""
    parts = []
    n = len(buf)
    while pos < n:
        ln = buf[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        parts.append(buf[pos : pos + ln])
        pos += ln
    raise ValueError("GIF: unterminated sub-block chain")


_WIN_CHUNK = 1 << 20  # window entries per materialized slice (same memory
# rationale as jpeg._BitReader: a full per-bit int list is ~36 B of heap per
# input BIT — >1 GB transient on a multi-MB GIF — so 16-bit LSB-first
# windows are precomputed vectorized and surfaced in bounded chunks)


def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor) → exactly ``npix`` palette indices."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"GIF: bad LZW min code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    # win[i] = 16 bits starting at bit i, LSB-first (GIF packing); a code of
    # width w at bit i is then win[i] & ((1<<w)-1) — one index, no bit loop
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    ).astype(np.uint32)
    nbits = len(bits)
    padded = np.concatenate([bits, np.zeros(16, dtype=np.uint32)])
    acc = np.zeros(nbits, dtype=np.uint32)
    for k in range(16):
        acc += padded[k : k + nbits] << np.uint32(k)
    cbase, cend = 0, min(nbits, _WIN_CHUNK)
    win = acc[:cend].tolist()
    bpos = 0
    out = bytearray()
    table: list[bytes] = []
    width = min_code + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    while len(out) < npix:
        if bpos + width > nbits:
            raise ValueError("GIF: LZW stream truncated")
        if bpos >= cend:
            cbase = bpos
            cend = min(nbits, cbase + _WIN_CHUNK)
            win = acc[cbase:cend].tolist()
        code = win[bpos - cbase] & ((1 << width) - 1)
        bpos += width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF: invalid LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < npix:
        raise ValueError(f"GIF: LZW yielded {len(out)} of {npix} pixels")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = np.empty(h, dtype=np.intp)
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    rows[order] = np.arange(h)
    return idx[rows]


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → uint8 H×W grayscale (first frame)."""
    buf = bytes(payload)
    if buf[:6] not in MAGICS:
        raise ValueError(f"not a GIF: {buf[:6]!r}")
    if len(buf) < 13:
        raise ValueError("GIF: truncated header")
    packed = buf[10]
    pos = 13
    gct = None
    if packed & 0x80:
        sz = 3 * (2 << (packed & 0x07))
        gct = np.frombuffer(buf[pos : pos + sz], dtype=np.uint8)
        if len(gct) < sz:
            raise ValueError("GIF: truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += sz
    n = len(buf)
    while pos < n:
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = _read_subblocks(buf, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("GIF: truncated image descriptor")
        iw = _U16.unpack_from(buf, pos + 4)[0]
        ih = _U16.unpack_from(buf, pos + 6)[0]
        ipacked = buf[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:  # local color table wins
            sz = 3 * (2 << (ipacked & 0x07))
            pal = np.frombuffer(buf[pos : pos + sz], dtype=np.uint8)
            if len(pal) < sz:
                raise ValueError("GIF: truncated local color table")
            pal = pal.reshape(-1, 3)
            pos += sz
        if pal is None:
            raise ValueError("GIF: image has no color table")
        if iw == 0 or ih == 0:
            raise ValueError("GIF: zero-sized image")
        min_code = buf[pos]
        pos += 1
        data, pos = _read_subblocks(buf, pos)
        idx = _lzw_decode(data, min_code, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:
            idx = _deinterlace(idx, ih)
        pal = pal[: max(1, len(pal))]
        if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
            # grayscale palette: map indices exactly (float luma of (i,i,i)
            # truncates to i-1 — 0.299+0.587+0.114 < 1.0 in binary)
            lut = pal[:, 0]
        else:
            from .media import rgb_to_gray

            lut = rgb_to_gray(pal.reshape(1, -1, 3)).reshape(-1)
        return lut[np.minimum(idx, len(pal) - 1)]
    raise ValueError("GIF: no image block before trailer")


# ------------------------------------------------------------------ encode


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """Real GIF LZW compressor (dict-based, CLEAR on 4096)."""
    clear = 1 << min_code
    end = clear + 1
    codes: list[tuple[int, int]] = [(clear, min_code + 1)]  # (code, width)
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    run = b""
    for v in indices.tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        run = bytes([v])
    if run:
        codes.append((table[run], width))
    codes.append((end, width))
    # pack LSB-first
    acc = 0
    nacc = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_gray(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 H×W grayscale → GIF89a with a 256-entry gray palette (lossless;
    fixture writer for the decode lane, like ``encode_wav``/``encode_avi_mjpeg``)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 H×W grayscale, got {img.dtype} {img.shape}")
    h, w = img.shape
    out = bytearray(b"GIF89a")
    out += _U16.pack(w) + _U16.pack(h)
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries
    gray = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += gray.tobytes()
    out += b"\x2c" + _U16.pack(0) + _U16.pack(0) + _U16.pack(w) + _U16.pack(h)
    out += bytes([0x40 if interlace else 0x00])
    rows = img
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = img[order]
    out += bytes([8])  # LZW min code size
    data = _lzw_encode(rows.reshape(-1), 8)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
