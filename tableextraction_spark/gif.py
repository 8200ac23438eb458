"""From-scratch GIF codec (GIF87a/GIF89a, LZW) — no image library.

Completes the web-image set next to ``png.py`` and ``jpeg.py``: the wire
format is the public GIF89a specification (CompuServe, 1990) — logical
screen descriptor, global/local color tables, variable-width LZW with
CLEAR/END codes (max 12 bits), sub-block framing, and the 4-pass row
interlace.  ``decode_gif`` returns the first frame composited onto the
logical screen (the still-image treatment); ``iter_gif_frames`` iterates
ALL frames as a video source — sub-rect offsets, GCE transparency, and
disposal methods 0-3 (see ``multimodal.iter_video_frames``).  Palettes
reduce via the shared ``media.palette_to_gray``.  The encoder is a real
LZW compressor (not the fixed-width trick) used by fixtures/tests, with a
multi-frame animation variant; GIF is lossless so round-trips are exact.

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


def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor: LSB-first, late width change) →
    exactly ``npix`` palette indices, via the shared (src, len)
    slice-dictionary core (``lzw.decode_slices`` — see its module
    docstring for the self-referential emission identity)."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"GIF: bad LZW min code size {min_code}")
    from .lzw import decode_slices

    out = decode_slices(
        data,
        npix,
        min_code,
        msb=False,
        early=0,
        eoi_raises=False,
        msg_truncated="GIF: LZW stream truncated",
        msg_invalid="GIF: invalid LZW code",
        msg_short="GIF: LZW yielded {pos} of {npix} pixels",
    )
    return np.frombuffer(out, dtype=np.uint8)


def _interlace_order(h: int) -> np.ndarray:
    """The spec's 4-pass row order — the ONE definition shared by the
    encoder (writes rows in pass order) and decoder (inverts it)."""
    return np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = np.empty(h, dtype=np.intp)
    rows[_interlace_order(h)] = np.arange(h)
    return idx[rows]


def _gray_lut(pal: np.ndarray) -> np.ndarray:
    """Palette → per-index gray values (shared `media.palette_to_gray`)."""
    from .media import palette_to_gray

    return palette_to_gray(pal)


def _parse_frames(buf: bytes, light: bool = False):
    """Walk the block stream; yield one dict per image block.  ``light``
    skips the LZW decode (structural pre-count).  The preceding graphic
    control extension's disposal/transparency ride along."""
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
    disposal, transparent = 0, None
    while pos < n:
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = buf[pos] if pos < n else 0
            pos += 1
            data, pos = _read_subblocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                disposal = (data[0] >> 2) & 0x7
                transparent = data[3] if data[0] & 0x1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("GIF: truncated image descriptor")
        left = _U16.unpack_from(buf, pos)[0]
        top = _U16.unpack_from(buf, pos + 2)[0]
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
        idx = None
        if not light:
            idx = _lzw_decode(data, min_code, iw * ih).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx, ih)
        yield {
            "left": left, "top": top, "idx": idx, "pal": pal,
            "disposal": disposal, "transparent": transparent,
        }
        disposal, transparent = 0, None  # a GCE governs ONE image


def iter_gif_frames(payload: bytes):
    """Animated GIF → lazily yield (frame_no, n_frames, uint8 H×W gray
    canvas snapshot) — GIF as a VIDEO source (the web's animation format).

    Frames composite onto the logical screen honoring the image rect
    (left/top, clipped to screen bounds on hostile values), the GCE
    transparent index, and disposal methods 0/1 (leave), 2 (restore to
    background) and 3 (restore to previous).  One canvas lives at a time.
    """
    buf = bytes(payload)
    if buf[:6] not in MAGICS:
        raise ValueError(f"not a GIF: {buf[:6]!r}")
    if len(buf) < 13:
        raise ValueError("GIF: truncated header")
    sw = _U16.unpack_from(buf, 6)[0]
    sh = _U16.unpack_from(buf, 8)[0]
    if sw == 0 or sh == 0:
        raise ValueError("GIF: zero-sized logical screen")
    n_frames = sum(1 for _ in _parse_frames(buf, light=True))
    if n_frames == 0:
        raise ValueError("GIF: no image block before trailer")
    # background gray: the LSD background index into the GCT, else white
    bg = 255
    packed = buf[10]
    if packed & 0x80:
        sz = 2 << (packed & 0x07)
        gct = np.frombuffer(buf[13 : 13 + sz * 3], dtype=np.uint8).reshape(-1, 3)
        bg = int(_gray_lut(gct)[min(buf[11], sz - 1)])
    canvas = np.full((sh, sw), bg, dtype=np.uint8)
    for i, fr in enumerate(_parse_frames(buf)):
        idx, pal = fr["idx"], fr["pal"]
        lut = _gray_lut(pal)
        gray = lut[np.minimum(idx, len(pal) - 1)]
        t, l = min(fr["top"], sh), min(fr["left"], sw)  # clip hostile rects
        eh, ew = min(idx.shape[0], sh - t), min(idx.shape[1], sw - l)
        region = canvas[t : t + eh, l : l + ew]
        prev = region.copy() if fr["disposal"] == 3 else None
        tidx = fr["transparent"]
        if tidx is not None:
            opaque = idx[:eh, :ew] != tidx
            region[opaque] = gray[:eh, :ew][opaque]
        else:
            region[:] = gray[:eh, :ew]
        yield i, n_frames, canvas.copy()
        if fr["disposal"] == 2:
            region[:] = bg
        elif fr["disposal"] == 3:
            region[:] = prev


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → uint8 H×W grayscale (first frame, composited onto the
    logical screen — still-image treatment)."""
    for _i, _n, frame in iter_gif_frames(payload):
        return frame
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


def encode_gif_animation(
    frames: list[np.ndarray],
    screen_hw: tuple[int, int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    transparent: int | None = None,
    disposal: int = 1,
    bg_index: int = 255,
) -> bytes:
    """uint8 gray frames (possibly sub-rects at per-frame (top, left)
    ``offsets``) → animated GIF89a with per-frame graphic control
    extensions (fixture writer for the GIF-as-video path)."""
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 2:
            raise ValueError(f"expected uint8 H×W frames, got {f.dtype} {f.shape}")
    offsets = offsets or [(0, 0)] * len(frames)
    sh, sw = screen_hw or frames[0].shape
    out = bytearray(b"GIF89a")
    out += _U16.pack(sw) + _U16.pack(sh)
    out += bytes([0xF7, bg_index, 0])  # GCT present, 256 gray entries
    out += np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()
    for f, (top, left) in zip(frames, offsets):
        gce_packed = (disposal & 0x7) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gce_packed, 0, 0, transparent or 0, 0])
        h, w = f.shape
        out += b"\x2c" + _U16.pack(left) + _U16.pack(top)
        out += _U16.pack(w) + _U16.pack(h) + b"\x00"
        out += bytes([8])
        data = _lzw_encode(f.reshape(-1), 8)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
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
        rows = img[_interlace_order(h)]
    out += bytes([8])  # LZW min code size
    data = _lzw_encode(rows.reshape(-1), 8)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
