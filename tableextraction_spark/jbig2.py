"""From-scratch JBIG2 decoder (ITU-T T.88 / ISO/IEC 14492) — the PDF
``JBIG2Decode`` filter, the second dominant encoding of real scanned-
document corpora after CCITT G4 (the reference's corpus is scanned steel
standards, ``data/1.pdf…7.pdf``, rasterized via Poppler in
``table_extraction/preprocessing.py``).  Implemented the same no-library
way as ``jpeg.py`` (T.81), ``ccitt.py`` (T.4/T.6) and ``flac.py``
(RFC 9639), from the published spec only:

- **MQ arithmetic coder** (T.88 Annex E, the same coder as JPEG 2000):
  decoder *and* encoder, so every decode path round-trips exactly in
  tests without any external encoder.
- **Generic region decoding** (§6.2): MMR mode routes to the existing
  ITU T.6 codec (``ccitt.decode_ccitt``); arithmetic mode implements all
  four GB templates with adaptive (AT) pixels and TPGDON typical-
  prediction, context layouts per the spec's figures (bit positions are
  fixed per template; AT pixels move only their *value source*).
- **Arithmetic integer decoding** (Annex A): IADH/IADW/IAEX/IAAI/IADT/
  IAFS/IADS/IAIT/IARI and the IAID symbol-ID procedure — plus their
  encoding inverses for fixture construction.
- **Symbol dictionary** (§6.5) and **text region** (§6.4) segments — the
  output shape of ``jbig2enc``-compressed scanner PDFs: each distinct
  glyph is decoded once, placements are cheap integer decodes.
- **Embedded-stream segment parser** (§7.2 headers, Annex D.3
  organization): page info, immediate generic/text regions, symbol
  dictionaries (including cross-references into a PDF
  ``/JBIG2Globals`` stream), end-of-{stripe,page,file}, extension skip.

Out of scope, refused loudly with named errors (captured per-row
upstream, never a hang): Huffman-coded variants (SDHUFF/SBHUFF —
arithmetic coding is what PDF producers emit), refinement/aggregate
coding, halftone regions, unknown-length segments, retained/shared
bitmap coding contexts.  Every region/dictionary size is bounds-checked
before allocation (attacker-controlled headers must not OOM an
executor — same hostile-input stance as ``ccitt._Reader``).

Output convention matches ``ccitt``: ``uint8`` H×W with **1 = black**.
PDF sample mapping (JBIG2 1-bits are black ink; DeviceGray sample 0 is
black) is the caller's concern — see ``pdfx._draw_image``.
"""

from __future__ import annotations

import math

import numpy as np

from .ccitt import decode_ccitt, encode_ccitt_g4

__all__ = [
    "decode_jbig2_embedded",
    "encode_jbig2_generic",
    "encode_jbig2_symbol_page",
    "encode_jbig2_text_page",
]

OOB = object()  # Annex A out-of-band return (end of a run / strip)

# hostile-input bounds: a segment header is attacker-controlled, so every
# allocation it implies is capped before it happens
_MAX_PIXELS = 1 << 28  # 256 Mpx per region/page (a 16k×16k scan)
_MAX_SYMBOLS = 1 << 20
_MAX_INSTANCES = 1 << 24

# ---------------------------------------------------------------- MQ coder
# T.88 Table E.1 — (Qe, NMPS, NLPS, SWITCH)

_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

# flat per-field views of Table E.1: the decoder's fast path (MPS, no
# renormalization — the overwhelmingly common event) needs only Qe, so
# loading one int beats unpacking the 4-tuple on every decision
_QE_Q = [r[0] for r in _QE]
_QE_NMPS = [r[1] for r in _QE]
_QE_NLPS = [r[2] for r in _QE]
_QE_SW = [r[3] for r in _QE]


class _MQDecoder:
    """T.88 E.3 software-conventions decoder.  Context state lives in the
    caller's ``_Ctx`` (index + MPS arrays) so one MQ stream can interleave
    many context sets (integer decoders + bitmap stats), as the segment
    decoding procedures require."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.c = (data[0] if data else 0xFF) << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        # past the end of the segment the spec feeds 1-bits forever
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self):
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx: "_Ctx", k: int) -> int:
        i = cx.idx[k]
        qe = _QE_Q[i]
        a = self.a - qe
        # self.c stays masked to 32 bits, so c>>16 is already ≤ 0xFFFF
        if (self.c >> 16) >= qe:
            self.c -= qe << 16
            if a & 0x8000:  # MPS, no renormalization — the hot path
                self.a = a
                return cx.mps[k]
            # MPS exchange path
            if a < qe:
                d = 1 - cx.mps[k]
                if _QE_SW[i]:
                    cx.mps[k] ^= 1
                cx.idx[k] = _QE_NLPS[i]
            else:
                d = cx.mps[k]
                cx.idx[k] = _QE_NMPS[i]
        else:
            # LPS exchange path
            if a < qe:
                d = cx.mps[k]
                cx.idx[k] = _QE_NMPS[i]
            else:
                d = 1 - cx.mps[k]
                if _QE_SW[i]:
                    cx.mps[k] ^= 1
                cx.idx[k] = _QE_NLPS[i]
            a = qe
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            a = (a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if a & 0x8000:
                break
        self.a = a
        return d


class _MQEncoder:
    """T.88 E.2 encoder — fixture construction only, so round-trip tests
    pin both directions of the coder against each other."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # sentinel models the byte before BPST; carries cannot propagate
        # past an emitted non-0xFF byte, so it provably stays 0
        self.out = bytearray([0])

    def encode(self, cx: "_Ctx", k: int, d: int):
        i = cx.idx[k]
        qe, nmps, nlps, switch = _QE[i]
        if d == cx.mps[k]:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx.idx[k] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx.mps[k] ^= 1
            cx.idx[k] = nlps
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def _byteout(self):
        out = self.out
        if out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            out[-1] += 1  # carry into the previous byte
            if out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def flush(self) -> bytes:
        # The RENORME loop defers BYTEOUT to the next shift (`if ct==0:
        # byteout` BEFORE shifting), so a fully-formed byte can still be
        # pending here — emit it first, else SETBITS corrupts it and the
        # final ~byte of symbols misdecodes (T.88's convention calls
        # BYTEOUT the instant CT hits 0, so its FLUSH never sees CT==0).
        if self.ct == 0:
            self._byteout()
        # SETBITS + two byteouts (T.88 E.2.9).  SETBITS must fill the low
        # bits with 1s (Figure E.11): untransmitted trailing bits are
        # reconstructed as 1s by the decoder's marker-feed, so a
        # zero-filled tail can overshoot the [C, C+A) interval top when
        # the margin is small and misdecode the final symbols.
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c > tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.out[-1] == 0xFF:
            self.out.pop()
        if self.out[0] != 0:
            raise AssertionError("MQ encoder: carry escaped the stream")
        return bytes(self.out[1:])


class _Ctx:
    """One adaptive-context set: probability-state index + MPS arrays."""

    __slots__ = ("idx", "mps")

    def __init__(self, size: int):
        self.idx = bytearray(size)
        self.mps = bytearray(size)


# ------------------------------------------------- Annex A integer coding

_INT_CLASSES = [(2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436)]


def _decode_int(mq: _MQDecoder, cx: _Ctx):
    """A.2 IAx integer decode → int, or OOB."""
    prev = 1

    def bit():
        nonlocal prev
        b = mq.decode(cx, prev)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    for nbits, offset in _INT_CLASSES:
        if nbits == 32 or not bit():
            v = 0
            for _ in range(nbits):
                v = (v << 1) | bit()
            v += offset
            if s and v == 0:
                return OOB
            return -v if s else v
    raise AssertionError("unreachable")


def _encode_int(mq: _MQEncoder, cx: _Ctx, value):
    """A.2 inverse — emit the class-selection prefix then the offset bits."""
    prev = 1

    def bit(b):
        nonlocal prev
        mq.encode(cx, prev, b)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)

    if value is OOB:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
    bit(s)
    for ci, (nbits, offset) in enumerate(_INT_CLASSES):
        nxt = _INT_CLASSES[ci + 1][1] if ci + 1 < len(_INT_CLASSES) else None
        if nxt is None or v < nxt:
            if nbits != 32:
                bit(0)
            for j in range(nbits - 1, -1, -1):
                bit((v - offset) >> j & 1)
            return
        bit(1)


def _decode_iaid(mq: _MQDecoder, cx: _Ctx, symcodelen: int) -> int:
    """A.3 symbol-ID decode: a SYMCODELEN-deep binary tree of contexts."""
    prev = 1
    for _ in range(symcodelen):
        prev = (prev << 1) | mq.decode(cx, prev)
    return prev - (1 << symcodelen)


def _encode_iaid(mq: _MQEncoder, cx: _Ctx, symcodelen: int, value: int):
    prev = 1
    for j in range(symcodelen - 1, -1, -1):
        b = (value >> j) & 1
        mq.encode(cx, prev, b)
        prev = (prev << 1) | b


# --------------------------------------------------- generic region (§6.2)
# Context bit layouts per the spec figures (fixed positions; the AT
# pixels relocate only their value source).  The nominal AT positions
# make each template's context three (or two) contiguous row windows.

_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}
_CTX_BITS = {0: 16, 1: 13, 2: 10, 3: 10}

# general-path gather lists: (dx, dy, shift) for the fixed pixels
_FIXED_PIXELS = {
    0: [(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
        (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8), (-2, -1, 9),
        (1, -2, 12), (0, -2, 13), (-1, -2, 14)],
    1: [(-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
        (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
        (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12)],
    2: [(-1, 0, 0), (-2, 0, 1),
        (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
        (1, -2, 7), (0, -2, 8), (-1, -2, 9)],
    3: [(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
        (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8), (-3, -1, 9)],
}
_AT_SHIFTS = {0: [4, 10, 11, 15], 1: [3], 2: [2], 3: [4]}


def _decode_generic(mq: _MQDecoder, gb: _Ctx, w: int, h: int, template: int,
                    at: list[tuple[int, int]], tpgdon: bool) -> np.ndarray:
    """§6.2.5 arithmetic generic-region decode → uint8 H×W, 1 = black."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"JBIG2: generic region {w}x{h} out of bounds")
    bm = np.zeros((h, w), dtype=np.uint8)
    nominal = at == _NOMINAL_AT[template]
    ltp = 0
    tp_ctx = _TPGDON_CTX[template]
    if nominal:
        return _decode_generic_nominal(mq, gb, bm, template, tpgdon)
    fixed = _FIXED_PIXELS[template]
    at_shift = _AT_SHIFTS[template]
    for y in range(h):
        if tpgdon:
            ltp ^= mq.decode(gb, tp_ctx)
            if ltp:
                if y > 0:
                    bm[y] = bm[y - 1]
                continue
        row = bm[y]
        for x in range(w):
            ctx = 0
            for dx, dy, shift in fixed:
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w:
                    ctx |= int(bm[yy, xx]) << shift
            for (ax, ay), shift in zip(at, at_shift):
                yy, xx = y + ay, x + ax
                if 0 <= yy < h and 0 <= xx < w:
                    ctx |= int(bm[yy, xx]) << shift
            row[x] = mq.decode(gb, ctx)
    return bm


def _decode_generic_nominal(mq: _MQDecoder, gb: _Ctx, bm: np.ndarray,
                            template: int, tpgdon: bool) -> np.ndarray:
    """Fast path for nominal AT pixels: the context is contiguous row
    windows maintained incrementally (one shift+mask per row per pixel),
    the layout every real producer (including jbig2enc) emits."""
    h, w = bm.shape
    pad = 4  # widest right reach is +3 (template 0/1 row y-1)
    zrow = [0] * (w + 2 * pad)
    dec, ltp = mq.decode, 0
    tp_ctx = _TPGDON_CTX[template]
    r1, r2 = zrow, zrow  # padded previous / previous-previous rows
    # python lists: ~3x faster per-element indexing than np in this loop
    for y in range(h):
        if tpgdon:
            ltp ^= dec(gb, tp_ctx)
            if ltp:
                r2, r1 = r1, (r1 if y > 0 else zrow)  # row copy
                bm[y] = bm[y - 1] if y > 0 else 0
                continue
        cur = list(zrow)
        if template == 0:
            # w2: (x-2..x+2,y-2) bits 15..11 | w1: (x-3..x+3,y-1) 10..4
            # | w0: (x-4..x-1,y) 3..0
            w2 = (r2[pad - 2] << 4) | (r2[pad - 1] << 3) | (r2[pad] << 2) \
                | (r2[pad + 1] << 1) | r2[pad + 2]
            w1 = (r1[pad - 3] << 6) | (r1[pad - 2] << 5) | (r1[pad - 1] << 4) \
                | (r1[pad] << 3) | (r1[pad + 1] << 2) | (r1[pad + 2] << 1) \
                | r1[pad + 3]
            w0 = 0
            for x in range(w):
                v = dec(gb, (w2 << 11) | (w1 << 4) | w0)
                cur[pad + x] = v
                p = pad + x + 1
                w2 = ((w2 << 1) | r2[p + 2]) & 0x1F
                w1 = ((w1 << 1) | r1[p + 3]) & 0x7F
                w0 = ((w0 << 1) | v) & 0xF
        elif template == 1:
            # w2: (x-1..x+2,y-2) 12..9 | w1: (x-2..x+3,y-1) 8..3
            # | w0: (x-3..x-1,y) 2..0
            w2 = (r2[pad - 1] << 3) | (r2[pad] << 2) | (r2[pad + 1] << 1) \
                | r2[pad + 2]
            w1 = (r1[pad - 2] << 5) | (r1[pad - 1] << 4) | (r1[pad] << 3) \
                | (r1[pad + 1] << 2) | (r1[pad + 2] << 1) | r1[pad + 3]
            w0 = 0
            for x in range(w):
                v = dec(gb, (w2 << 9) | (w1 << 3) | w0)
                cur[pad + x] = v
                p = pad + x + 1
                w2 = ((w2 << 1) | r2[p + 2]) & 0xF
                w1 = ((w1 << 1) | r1[p + 3]) & 0x3F
                w0 = ((w0 << 1) | v) & 0x7
        elif template == 2:
            # w2: (x-1..x+1,y-2) 9..7 | w1: (x-2..x+2,y-1) 6..2
            # | w0: (x-2..x-1,y) 1..0
            w2 = (r2[pad - 1] << 2) | (r2[pad] << 1) | r2[pad + 1]
            w1 = (r1[pad - 2] << 4) | (r1[pad - 1] << 3) | (r1[pad] << 2) \
                | (r1[pad + 1] << 1) | r1[pad + 2]
            w0 = 0
            for x in range(w):
                v = dec(gb, (w2 << 7) | (w1 << 2) | w0)
                cur[pad + x] = v
                p = pad + x + 1
                w2 = ((w2 << 1) | r2[p + 1]) & 0x7
                w1 = ((w1 << 1) | r1[p + 2]) & 0x1F
                w0 = ((w0 << 1) | v) & 0x3
        else:  # template 3, single reference row
            # w1: (x-3..x+2,y-1) 9..4 | w0: (x-4..x-1,y) 3..0
            w1 = (r1[pad - 3] << 5) | (r1[pad - 2] << 4) | (r1[pad - 1] << 3) \
                | (r1[pad] << 2) | (r1[pad + 1] << 1) | r1[pad + 2]
            w0 = 0
            for x in range(w):
                v = dec(gb, (w1 << 4) | w0)
                cur[pad + x] = v
                p = pad + x + 1
                w1 = ((w1 << 1) | r1[p + 2]) & 0x3F
                w0 = ((w0 << 1) | v) & 0xF
        r2, r1 = r1, cur
        bm[y] = cur[pad:pad + w]
    return bm


def _encode_generic(mq: _MQEncoder, gb: _Ctx, bm: np.ndarray, template: int,
                    tpgdon: bool, at: list[tuple[int, int]] | None = None):
    """Arithmetic generic-region encode (fixture side): same context
    model, encoding each pixel (and each row's SLTP when TPGDON) in
    decode order.  Non-nominal ``at`` exercises the decoder's general
    gather path."""
    h, w = bm.shape
    at = at or _NOMINAL_AT[template]
    fixed = _FIXED_PIXELS[template]
    at_shift = _AT_SHIFTS[template]
    ltp = 0
    tp_ctx = _TPGDON_CTX[template]
    bml = bm.tolist()
    for y in range(h):
        if tpgdon:
            same = y > 0 and bml[y] == bml[y - 1]
            sltp = int(same) ^ ltp
            mq.encode(gb, tp_ctx, sltp)
            ltp ^= sltp
            if ltp:
                continue
        for x in range(w):
            ctx = 0
            for dx, dy, shift in fixed:
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w:
                    ctx |= bml[yy][xx] << shift
            for (ax, ay), shift in zip(at, at_shift):
                yy, xx = y + ay, x + ax
                if 0 <= yy < h and 0 <= xx < w:
                    ctx |= bml[yy][xx] << shift
            mq.encode(gb, ctx, bml[y][x])


# ----------------------------------------------------- segment structures


class _ByteReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u8(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JBIG2: truncated segment data")
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        return (self.u8() << 8) | self.u8()

    def u32(self) -> int:
        return (self.u16() << 16) | self.u16()

    def s8(self) -> int:
        v = self.u8()
        return v - 256 if v >= 128 else v

    def rest(self) -> bytes:
        return self.data[self.pos:]


def _parse_segment_headers(data: bytes):
    """§7.2 — yield (type, page, referred_segment_numbers, payload)."""
    br = _ByteReader(data)
    n = len(data)
    while br.pos < n:
        number = br.u32()
        flags = br.u8()
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        rts = br.u8()
        count = rts >> 5
        if count == 7:
            br.pos -= 1
            count = br.u32() & 0x1FFFFFFF
            br.pos += (count + 8) // 8  # retain bits
        if count > 1 << 20:
            raise ValueError("JBIG2: implausible referred-segment count")
        refs = []
        for _ in range(count):
            if number <= 256:
                refs.append(br.u8())
            elif number <= 65536:
                refs.append(br.u16())
            else:
                refs.append(br.u32())
        page = br.u32() if page_assoc_4 else br.u8()
        length = br.u32()
        if length == 0xFFFFFFFF:
            raise NotImplementedError("JBIG2: unknown segment data length")
        if br.pos + length > n:
            raise ValueError("JBIG2: segment data overruns stream")
        payload = data[br.pos:br.pos + length]
        br.pos += length
        yield number, seg_type, page, refs, payload


def _region_info(br: _ByteReader):
    """§7.4.1 region segment information field."""
    w, h = br.u32(), br.u32()
    x, y = br.u32(), br.u32()
    combop = br.u8() & 0x07
    if w * h > _MAX_PIXELS:
        raise ValueError(f"JBIG2: region {w}x{h} out of bounds")
    return w, h, x, y, combop


def _combine(dst: np.ndarray, src: np.ndarray, x: int, y: int, op: int):
    """Composite ``src`` onto ``dst`` at (x, y) with a §8.2 operator,
    clipped to the destination."""
    h, w = src.shape
    y0, x0 = max(0, y), max(0, x)
    y1, x1 = min(dst.shape[0], y + h), min(dst.shape[1], x + w)
    if y1 <= y0 or x1 <= x0:
        return
    s = src[y0 - y:y1 - y, x0 - x:x1 - x]
    d = dst[y0:y1, x0:x1]
    if op == 0:
        d |= s
    elif op == 1:
        d &= s
    elif op == 2:
        d ^= s
    elif op == 3:
        d[:] = 1 - (d ^ s)
    elif op == 4:
        d[:] = s
    else:
        raise ValueError(f"JBIG2: reserved combination operator {op}")


# ----------------------------------------------- symbol dictionary (§6.5)


def _decode_symbol_dict(payload: bytes, input_syms: list[np.ndarray]):
    br = _ByteReader(payload)
    flags = br.u16()
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    ctx_used = (flags >> 8) & 1
    ctx_retained = (flags >> 9) & 1
    template = (flags >> 10) & 3
    if sdhuff:
        raise NotImplementedError("JBIG2: Huffman-coded symbol dictionary")
    if sdrefagg:
        raise NotImplementedError("JBIG2: refinement/aggregate symbol coding")
    if ctx_used or ctx_retained:
        raise NotImplementedError("JBIG2: shared bitmap coding contexts")
    n_at = 4 if template == 0 else 1
    at = [(br.s8(), br.s8()) for _ in range(n_at)]
    n_ex = br.u32()
    n_new = br.u32()
    if n_new > _MAX_SYMBOLS or n_ex > _MAX_SYMBOLS:
        raise ValueError("JBIG2: implausible symbol count")
    mq = _MQDecoder(br.rest())
    iadh, iadw, iaex, iaai = (_Ctx(512) for _ in range(4))
    gb = _Ctx(1 << _CTX_BITS[template])
    new_syms: list[np.ndarray] = []
    hcheight = 0
    height_classes = 0
    while len(new_syms) < n_new:
        height_classes += 1
        if height_classes > n_new + 4096:
            raise ValueError("JBIG2: symbol dictionary makes no progress")
        dh = _decode_int(mq, iadh)
        if dh is OOB:
            raise ValueError("JBIG2: OOB height-class delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 15:
            raise ValueError(f"JBIG2: bad height class {hcheight}")
        symwidth = 0
        while True:
            dw = _decode_int(mq, iadw)
            if dw is OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 15:
                raise ValueError(f"JBIG2: bad symbol width {symwidth}")
            if len(new_syms) >= n_new:
                raise ValueError("JBIG2: more symbols than declared")
            new_syms.append(
                _decode_generic(mq, gb, symwidth, hcheight, template, at,
                                tpgdon=False)
            )
    # §6.5.10 export flags over input ++ new symbols
    all_syms = input_syms + new_syms
    exported: list[np.ndarray] = []
    i, cur, runs = 0, 0, 0
    while i < len(all_syms):
        runs += 1
        if runs > 2 * len(all_syms) + 2:
            raise ValueError("JBIG2: export flags make no progress")
        run = _decode_int(mq, iaex)
        if run is OOB or run < 0:
            raise ValueError("JBIG2: bad export run length")
        if cur:
            exported.extend(all_syms[i:i + run])
        i += run
        cur ^= 1
    if len(exported) != n_ex:
        raise ValueError(
            f"JBIG2: exported {len(exported)} symbols, declared {n_ex}"
        )
    return exported


# ----------------------------------------------------- text region (§6.4)


def _decode_text_region(payload: bytes, syms: list[np.ndarray]):
    br = _ByteReader(payload)
    w, h, x, y, ext_op = _region_info(br)
    flags = br.u16()
    sbhuff = flags & 1
    refine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    combop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    if sbhuff:
        raise NotImplementedError("JBIG2: Huffman-coded text region")
    if refine:
        raise NotImplementedError("JBIG2: refinement-coded text region")
    strips = 1 << log_strips
    n_instances = br.u32()
    if n_instances > _MAX_INSTANCES:
        raise ValueError("JBIG2: implausible instance count")
    if not syms and n_instances:
        raise ValueError("JBIG2: text region with no symbols")
    symcodelen = max(0, math.ceil(math.log2(max(1, len(syms)))))
    mq = _MQDecoder(br.rest())
    iadt, iafs, iads, iait = (_Ctx(512) for _ in range(4))
    iaid = _Ctx(1 << (symcodelen + 1))
    bm = np.full((h, w), defpixel, dtype=np.uint8)
    stript = _decode_int(mq, iadt)
    if stript is OOB:
        raise ValueError("JBIG2: OOB initial strip T")
    stript *= -strips
    firsts = 0
    ninst = 0
    while ninst < n_instances:
        dt = _decode_int(mq, iadt)
        if dt is OOB:
            raise ValueError("JBIG2: OOB strip delta-T")
        stript += dt * strips
        first = True
        while True:
            if first:
                dfs = _decode_int(mq, iafs)
                if dfs is OOB:
                    raise ValueError("JBIG2: OOB first-symbol S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = _decode_int(mq, iads)
                if ids is OOB:
                    break  # end of strip
                curs += ids + dsoffset
            curt = 0 if strips == 1 else _decode_int(mq, iait)
            if curt is OOB:
                raise ValueError("JBIG2: OOB instance T")
            ti = stript + curt
            sym_id = _decode_iaid(mq, iaid, symcodelen)
            if sym_id >= len(syms):
                raise ValueError(f"JBIG2: symbol id {sym_id} out of range")
            sb = syms[sym_id]
            sh, sw = sb.shape
            if transposed:
                # strip axis is vertical: T is x, S is y
                sx = ti if refcorner in (0, 1) else ti - sw + 1  # *LEFT
                _combine(bm, sb, sx, curs, combop)
                curs += sh - 1
            else:
                sy = ti if refcorner in (1, 3) else ti - sh + 1  # TOP*
                _combine(bm, sb, curs, sy, combop)
                curs += sw - 1
            ninst += 1
            if ninst >= n_instances:
                break
    return bm, x, y, ext_op


# --------------------------------------------------- generic region (§7.4.6)


def _decode_generic_region(payload: bytes):
    br = _ByteReader(payload)
    w, h, x, y, ext_op = _region_info(br)
    flags = br.u8()
    mmr = flags & 1
    template = (flags >> 1) & 3
    tpgdon = (flags >> 3) & 1
    if (flags >> 4) & 1:
        raise NotImplementedError("JBIG2: EXTTEMPLATE generic region")
    if mmr:
        bm = decode_ccitt(br.rest(), columns=w, rows=h, k=-1)
        if bm.shape != (h, w):
            out = np.zeros((h, w), dtype=np.uint8)
            out[:bm.shape[0], :bm.shape[1]] = bm[:h, :w]
            bm = out
    else:
        n_at = 4 if template == 0 else 1
        at = [(br.s8(), br.s8()) for _ in range(n_at)]
        mq = _MQDecoder(br.rest())
        gb = _Ctx(1 << _CTX_BITS[template])
        bm = _decode_generic(mq, gb, w, h, template, at, bool(tpgdon))
    return bm, x, y, ext_op


# ------------------------------------------------------ embedded decoding

_REFUSED_TYPES = {
    16: "pattern dictionary",
    20: "intermediate halftone region",
    22: "immediate halftone region",
    23: "immediate lossless halftone region",
    40: "intermediate refinement region",
    42: "immediate refinement region",
    43: "immediate lossless refinement region",
    53: "coded tables (Huffman)",
    4: "intermediate text region",
    36: "intermediate generic region",
}


def decode_jbig2_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream (T.88 Annex D.3 organization:
    bare segment sequence, no file header) → uint8 page bitmap, 1 = black.

    ``globals_data`` is the optional ``/JBIG2Globals`` stream whose
    segments (typically symbol dictionaries shared across pages) are
    processed first and referable from the page's segments."""
    sym_dicts: dict[int, list[np.ndarray]] = {}
    page: np.ndarray | None = None
    page_default_op = 0
    override_allowed = True
    for src in (globals_data, data):
        if not src:
            continue
        for number, seg_type, _pg, refs, payload in _parse_segment_headers(src):
            if seg_type == 48:  # page information
                br = _ByteReader(payload)
                pw, ph = br.u32(), br.u32()
                br.u32(), br.u32()  # resolution
                pflags = br.u8()
                if ph == 0xFFFFFFFF:
                    ph = 0  # unknown height: grow as regions land
                if pw * max(1, ph) > _MAX_PIXELS:
                    raise ValueError(f"JBIG2: page {pw}x{ph} out of bounds")
                page = np.full((ph, pw), (pflags >> 2) & 1, dtype=np.uint8)
                # §8.2: regions composite with their own operator only when
                # the override bit allows; else the page default applies
                page_default_op = (pflags >> 3) & 3
                override_allowed = bool(pflags & 0x40)
            elif seg_type == 0:  # symbol dictionary
                inputs: list[np.ndarray] = []
                for rseg in refs:
                    if rseg in sym_dicts:
                        inputs.extend(sym_dicts[rseg])
                sym_dicts[number] = _decode_symbol_dict(payload, inputs)
            elif seg_type in (6, 7):  # immediate (lossless) text region
                syms: list[np.ndarray] = []
                for rseg in refs:
                    if rseg in sym_dicts:
                        syms.extend(sym_dicts[rseg])
                bm, rx, ry, op = _decode_text_region(payload, syms)
                if not override_allowed:
                    op = page_default_op
                page = _grow_and_combine(page, bm, rx, ry, op)
            elif seg_type in (38, 39):  # immediate (lossless) generic region
                bm, rx, ry, op = _decode_generic_region(payload)
                if not override_allowed:
                    op = page_default_op
                page = _grow_and_combine(page, bm, rx, ry, op)
            elif seg_type in (49, 50, 51, 52, 62):
                continue  # end-of-page/stripe/file, profiles, extension
            elif seg_type in _REFUSED_TYPES:
                raise NotImplementedError(
                    f"JBIG2: {_REFUSED_TYPES[seg_type]} segment"
                )
            else:
                raise ValueError(f"JBIG2: unknown segment type {seg_type}")
    if page is None:
        raise ValueError("JBIG2: no page information segment")
    return page


def _grow_and_combine(page, bm, rx, ry, op):
    if page is None:
        raise ValueError("JBIG2: region segment before page information")
    need_h = ry + bm.shape[0]
    if need_h > page.shape[0]:
        if need_h * page.shape[1] > _MAX_PIXELS:
            raise ValueError("JBIG2: striped page grows out of bounds")
        grown = np.zeros((need_h, page.shape[1]), dtype=np.uint8)
        grown[:page.shape[0]] = page
        page = grown
    _combine(page, bm, rx, ry, op)
    return page


# ------------------------------------------------------- fixture builders


def _segment_header(number: int, seg_type: int, refs: list[int],
                    page: int, length: int) -> bytes:
    out = bytearray()
    out += number.to_bytes(4, "big")
    out.append(seg_type & 0x3F)
    if len(refs) > 4:
        raise ValueError("fixture writer: >4 referred segments unsupported")
    out.append(len(refs) << 5)
    for rseg in refs:
        if number > 256:
            raise ValueError("fixture writer: keep segment numbers <= 256")
        out.append(rseg)
    out.append(page & 0xFF)
    out += length.to_bytes(4, "big")
    return bytes(out)


def _page_info_segment(number: int, w: int, h: int) -> bytes:
    body = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + b"\x00" * 8 + b"\x00" + b"\x00\x00")
    return _segment_header(number, 48, [], 1, len(body)) + body


def encode_jbig2_generic(bm: np.ndarray, *, mmr: bool = False,
                         template: int = 0, tpgdon: bool = False,
                         at: list[tuple[int, int]] | None = None,
                         seg_base: int = 1) -> bytes:
    """Embedded JBIG2 stream: page info + one immediate generic region
    covering the page.  ``mmr`` uses T.6 coding (via ``ccitt``);
    otherwise MQ-coded with the given template and nominal (or given)
    AT pixels."""
    h, w = bm.shape
    bm = (np.asarray(bm) != 0).astype(np.uint8)
    region_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                   + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                   + bytes([0]))  # external op OR
    if mmr:
        body = region_info + bytes([1]) + encode_ccitt_g4(bm)
    else:
        at = at or _NOMINAL_AT[template]
        flags = (template << 1) | (0x08 if tpgdon else 0)
        at_bytes = b"".join(bytes([ax & 0xFF, ay & 0xFF]) for ax, ay in at)
        mq = _MQEncoder()
        gb = _Ctx(1 << _CTX_BITS[template])
        _encode_generic(mq, gb, bm, template, tpgdon, at)
        body = region_info + bytes([flags]) + at_bytes + mq.flush()
    out = _page_info_segment(seg_base, w, h)
    out += _segment_header(seg_base + 1, 38, [], 1, len(body)) + body
    out += _segment_header(seg_base + 2, 49, [], 1, 0)  # end of page
    return out


def encode_jbig2_text_page(
    symbols: list[np.ndarray],
    placements: list[tuple[int, int, int]],
    page_w: int,
    page_h: int,
    *,
    split_globals: bool = False,
    template: int = 0,
    refcorner: int = 1,
    transposed: bool = False,
    combop: int = 0,
    dsoffset: int = 0,
    seg_base: int = 1,
) -> tuple[bytes, bytes]:
    """Embedded stream with a symbol dictionary + one immediate text
    region placing ``(sym_id, x, y)`` instances, ``(x, y)`` being each
    instance's top-left (strips=1; the jbig2enc default is
    REFCORNER=TOPLEFT non-transposed OR — other corners, TRANSPOSED
    order, SBCOMBOP and SBDSOFFSET exist to pin the decoder's
    coordinate/compositing paths).  Returns ``(page_stream,
    globals_stream)``; the dictionary goes to the globals stream when
    ``split_globals`` (the PDF ``/JBIG2Globals`` arrangement), else
    inline."""
    if not -16 <= dsoffset <= 15:
        raise ValueError("SBDSOFFSET is a signed 5-bit field")
    symbols = [(np.asarray(s) != 0).astype(np.uint8) for s in symbols]
    # --- symbol dictionary: height classes must be decoded in
    # nondecreasing height order; export all, in input order
    order = sorted(range(len(symbols)), key=lambda i: symbols[i].shape[0])
    mq = _MQEncoder()
    iadh, iadw, iaex, iaai = (_Ctx(512) for _ in range(4))
    gb = _Ctx(1 << _CTX_BITS[template])
    hcheight = 0
    i = 0
    while i < len(order):
        hgt = symbols[order[i]].shape[0]
        _encode_int(mq, iadh, hgt - hcheight)
        hcheight = hgt
        symwidth = 0
        while i < len(order) and symbols[order[i]].shape[0] == hcheight:
            sw = symbols[order[i]].shape[1]
            _encode_int(mq, iadw, sw - symwidth)
            symwidth = sw
            _encode_generic(mq, gb, symbols[order[i]], template, tpgdon=False)
            i += 1
        _encode_int(mq, iadw, OOB)
    _encode_int(mq, iaex, 0)  # first run: 0 non-exported
    _encode_int(mq, iaex, len(symbols))  # then export all
    n_at = 4 if template == 0 else 1
    at = b"".join(bytes([ax & 0xFF, ay & 0xFF])
                  for ax, ay in _NOMINAL_AT[template][:n_at])
    dict_body = ((template << 10).to_bytes(2, "big") + at
                 + len(symbols).to_bytes(4, "big")
                 + len(symbols).to_bytes(4, "big") + mq.flush())
    # symbol IDs refer to the dictionary's decode (height-class) order
    id_of = {orig: pos for pos, orig in enumerate(order)}
    # --- text region
    symcodelen = max(0, math.ceil(math.log2(max(1, len(symbols)))))
    mq = _MQEncoder()
    iadt, iafs, iads, iait = (_Ctx(512) for _ in range(4))
    iaid = _Ctx(1 << (symcodelen + 1))
    # group placements into strips (strips=1 → one strip per T value),
    # S ordered within a strip.  Map each instance's top-left (x, y) to
    # the (S, T) the decoder will map back: non-transposed T is y
    # (TOP corners) or the bottom row (BOTTOM corners), S advances along
    # x; transposed swaps the axes.
    by_t: dict[int, list[tuple[int, int]]] = {}
    for sym_id, x, y in placements:
        sh, sw = symbols[sym_id].shape
        if transposed:
            t_val = x if refcorner in (0, 1) else x + sw - 1  # *LEFT
            s_val = y
        else:
            t_val = y if refcorner in (1, 3) else y + sh - 1  # TOP*
            s_val = x
        by_t.setdefault(t_val, []).append((s_val, sym_id))
    _encode_int(mq, iadt, 0)  # STRIPT starts at 0
    stript = 0
    firsts = 0
    for t in sorted(by_t):
        _encode_int(mq, iadt, t - stript)
        stript = t
        row = sorted(by_t[t])
        curs = 0
        for j, (s, sym_id) in enumerate(row):
            if j == 0:
                _encode_int(mq, iafs, s - firsts)
                firsts = s
                curs = s
            else:
                _encode_int(mq, iads, s - curs - dsoffset)
                curs = s
            _encode_iaid(mq, iaid, symcodelen, id_of[sym_id])
            sh, sw = symbols[sym_id].shape
            curs += (sh if transposed else sw) - 1
        _encode_int(mq, iads, OOB)
    region_info = (page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
                   + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                   + bytes([0]))
    tr_flags = ((refcorner & 3) << 4) | ((1 if transposed else 0) << 6) \
        | ((combop & 3) << 7) | ((dsoffset & 0x1F) << 10)
    text_body = (region_info + tr_flags.to_bytes(2, "big")
                 + len(placements).to_bytes(4, "big") + mq.flush())
    # seg_base lets several pages' dictionaries share ONE globals stream
    # (each page's text region referencing its own dictionary number) —
    # the multi-page fax-archive arrangement /JBIG2Globals exists for
    page_seg = _page_info_segment(seg_base, page_w, page_h)
    dict_seg = _segment_header(seg_base + 1, 0, [],
                               1 if not split_globals else 0,
                               len(dict_body)) + dict_body
    text_seg = _segment_header(seg_base + 2, 6, [seg_base + 1], 1,
                               len(text_body)) + text_body
    eop = _segment_header(seg_base + 3, 49, [], 1, 0)
    if split_globals:
        return page_seg + text_seg + eop, dict_seg
    return page_seg + dict_seg + text_seg + eop, b""


# --------------------------------------------- symbol-mode page encoder


def _connected_components(bm: np.ndarray):
    """8-connected components of a 1-bit page via run-adjacency union-find
    (runs, not pixels, are the work unit — the same run-length view the
    kernel's table detector uses) → list of ``(x, y, glyph)`` with the
    component's bounding-box top-left and cropped bitmap."""
    h, w = bm.shape
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    runs_by_row: list[list[tuple[int, int, int]]] = []  # (x0, x1, label)
    prev: list[tuple[int, int, int]] = []
    padded = np.zeros(w + 2, dtype=np.int8)
    for y in range(h):
        padded[1:-1] = bm[y]
        d = np.diff(padded)
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        cur: list[tuple[int, int, int]] = []
        pi = 0
        for x0, x1 in zip(starts.tolist(), ends.tolist()):
            label = len(parent)
            parent.append(label)
            # 8-connectivity: runs are [x0, x1) with x1 EXCLUSIVE, so a
            # previous-row run [p0, p1) touches this one (diagonals
            # included) iff p1 >= x0 and p0 <= x1
            while pi < len(prev) and prev[pi][1] < x0:
                pi += 1
            pj = pi
            while pj < len(prev) and prev[pj][0] <= x1:
                union(prev[pj][2], label)
                pj += 1
            cur.append((x0, x1, label))
        runs_by_row.append(cur)
        prev = cur
    # gather per-root bounding boxes, then crop glyphs
    boxes: dict[int, list[int]] = {}  # root -> [x0, y0, x1, y1]
    for y, runs in enumerate(runs_by_row):
        for x0, x1, label in runs:
            r = find(label)
            b = boxes.get(r)
            if b is None:
                boxes[r] = [x0, y, x1, y + 1]
            else:
                if x0 < b[0]:
                    b[0] = x0
                if x1 > b[2]:
                    b[2] = x1
                b[3] = y + 1
    out = []
    for r, (x0, y0, x1, y1) in boxes.items():
        glyph = np.zeros((y1 - y0, x1 - x0), dtype=np.uint8)
        out.append((x0, y0, glyph, r))
    idx = {r: g for (_x, _y, g, r) in out}
    for y, runs in enumerate(runs_by_row):
        for x0, x1, label in runs:
            r = find(label)
            bx0, by0 = boxes[r][0], boxes[r][1]
            idx[r][y - by0, x0 - bx0 : x1 - bx0] = 1
    # deterministic raster order (top-left of bbox)
    out.sort(key=lambda t: (t[1], t[0]))
    return [(x, y, g) for (x, y, g, _r) in out]


def encode_jbig2_symbol_page(bm: np.ndarray, *, split_globals: bool = False,
                             seg_base: int = 1) -> tuple[bytes, bytes]:
    """LOSSLESS symbol-mode encoding of a 1-bit page — the ``jbig2enc``
    scanner-output shape: every 8-connected ink component becomes a
    symbol (byte-identical components share one dictionary entry), placed
    by a text region.  Components are disjoint ink, so OR-compositing
    reconstructs the page exactly; a page with no ink falls back to one
    generic region.  Returns ``(page_stream, globals_stream)`` like
    :func:`encode_jbig2_text_page`."""
    bm = (np.asarray(bm) != 0).astype(np.uint8)
    comps = _connected_components(bm)
    if not comps:
        # blank page: one generic region, at THIS page's segment numbers
        # so a multi-page shared-globals stream never sees a collision
        return encode_jbig2_generic(bm, seg_base=seg_base), b""
    symbols: list[np.ndarray] = []
    sym_of: dict[bytes, int] = {}
    placements: list[tuple[int, int, int]] = []
    for x, y, glyph in comps:
        key = glyph.shape[0].to_bytes(4, "big") + glyph.tobytes()
        sid = sym_of.get(key)
        if sid is None:
            sid = len(symbols)
            sym_of[key] = sid
            symbols.append(glyph)
        placements.append((sid, x, y))
    h, w = bm.shape
    return encode_jbig2_text_page(symbols, placements, w, h,
                                  split_globals=split_globals,
                                  seg_base=seg_base)
