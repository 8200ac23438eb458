"""Minimal from-scratch baseline JPEG codec — no external image library.

The reference reads JPEG pages via PIL (``table_extraction/
preprocessing.py:49-62``).  No stdlib JPEG codec exists, so this module
implements baseline DCT JPEG (ITU-T T.81) directly in NumPy + stdlib:

- decode: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI marker parse, Huffman
  entropy decode (16-bit canonical code table), dequantize, de-zigzag,
  8×8 IDCT as two matrix multiplies, level shift; grayscale, YCbCr, and
  Adobe 4-component CMYK/YCCK (APP14 transform 0/2, inverted-ink stored
  convention — the shape PDFs embed) with
  4:4:4 or 4:2:0 chroma subsampling (nearest-neighbor upsample) → gray or
  RGB uint8 (BT.601 full-range, the JFIF convention).
- encode: grayscale baseline with the spec's example luminance quantization
  and Huffman tables (Annex K) — used by fixtures/tests so the real-format
  path is exercised end-to-end without any library.

Supported = what scanned/rendered document pages and web images are:
baseline sequential (SOF0) and progressive (SOF2, T.81 Annex G.1.2 —
DC first/refine scans, AC spectral-selection bands with EOB-run coding,
successive-approximation correction bits), 8-bit.  Arithmetic-coded/
lossless/12-bit raise ``ValueError`` naming the feature (captured per-row
by the decode stage).  Progressive decode accumulates a dense coefficient
array across scans, then reuses the batched dequant/IDCT finalizer — the
entropy passes are the slow path (multiple sequential scans by design);
baseline stays the fast lane.

Performance note: entropy decode is table-driven — a 16-bit-lookahead LUT
makes each Huffman symbol one list index (the sliding bit-window is
precomputed vectorized), coefficients accumulate sparsely, and dequantize/
de-zigzag/IDCT/scatter run batched per component (~0.12 s gray / ~0.28 s
4:2:0 color per 1100×850 page ≈ 4×/13× the r2 per-symbol loop; per-format
table in BASELINE.md).  IMG1/PNG remain the fast lane; a production
deployment would still slot libjpeg-turbo behind the same
``media.decode_page`` seam for another ~50×.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"\xff\xd8"  # SOI

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)

# ITU-T T.81 Annex K.1 example luminance quantization table (quality ~50)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Annex K.3: example DC/AC luminance Huffman tables (BITS, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8×8 DCT-II basis matrix: IDCT = C.T @ coeffs @ C
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _build_huffman(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {(length, code): symbol} canonical table."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


_LUT_CACHE: dict[tuple, tuple] = {}


def _build_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """(BITS, HUFFVAL) → 16-bit-lookahead tables (sym[65536], len[65536]).

    One symbol decode = one list index instead of up to 16 per-bit reads:
    every 16-bit window starting with code c of length L maps to c's symbol.
    Unassigned windows keep length 0 → 'invalid Huffman code'.  Cached by
    table content — most corpora reuse the Annex-K tables across images.
    """
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.int32)
    for (length, code), s in _build_huffman(bits, vals).items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    out = (sym.tolist(), ln.tolist())  # plain-int lists: ~3× faster indexing
    _LUT_CACHE[key] = out
    return out


def _encode_huffman_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {symbol: (code, length)} for the encoder."""
    return {v: (c, l) for (l, c), v in _build_huffman(bits, vals).items()}


_WIN_CHUNK = 1 << 20  # window entries materialized at a time (see below)


def _win_slice_msb(data: bytes, cbase: int, cend: int) -> list[int]:
    """win[i-cbase] = the 16-bit MSB-first window starting at bit i
    (zero-padded past the end), for i in [cbase, cend) — computed from
    ONLY the covering byte range, so peak heap is bounded by the chunk,
    not the stream."""
    b0 = cbase >> 3
    b1 = min(len(data), ((cend + 16) >> 3) + 1)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8, offset=b0, count=b1 - b0)
    ).astype(np.uint32)
    lo = cbase - b0 * 8
    n = cend - cbase
    padded = np.concatenate([bits[lo:], np.zeros(16, dtype=np.uint32)])
    acc = np.zeros(n, dtype=np.uint32)
    for k in range(16):
        acc += padded[k : k + n] << np.uint32(15 - k)
    return acc.tolist()


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.

    The 16-bit window starting at bit i — one Huffman symbol or magnitude
    field is a single list index, which is what turned the per-symbol loop
    from ~10 µs to ~0.5 µs (the 10-20× decode speedup in BASELINE.md's
    per-format table).  Windows are computed vectorized in bounded
    ``_WIN_CHUNK`` slices FROM THE RAW BYTES of that slice only (a full
    per-bit int list is ~36 B of heap per input BIT, and even a retained
    uint32 window array is 32 B per input byte — both blow up multi-MB
    scans); access is sequential so each slice is built exactly once, and
    inputs smaller than one chunk never refill at all.
    """

    __slots__ = ("data", "nbits", "pos", "_chunk", "_base")

    def __init__(self, data: bytes):
        # unstuff: 0xFF 0x00 → 0xFF; markers (0xFF Dx) handled by caller
        clean = bytes(data).replace(b"\xff\x00", b"\xff")
        self.data = clean
        self.nbits = len(clean) * 8
        self.pos = 0
        self._base = 0
        self._chunk = _win_slice_msb(clean, 0, min(self.nbits, _WIN_CHUNK))

    def _refill(self, pos: int) -> int:
        base = pos - (pos % _WIN_CHUNK)
        self._base = base
        self._chunk = _win_slice_msb(
            self.data, base, min(self.nbits, base + _WIN_CHUNK)
        )
        return pos - base

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.pos
        end = pos + n
        if end > self.nbits:
            raise ValueError("JPEG entropy data truncated")
        self.pos = end
        off = pos - self._base
        chunk = self._chunk
        if off < 0 or off >= len(chunk):
            off = self._refill(pos)
            chunk = self._chunk
        return chunk[off] >> (16 - n)

    def decode_symbol(self, table) -> int:
        sym, ln = table
        pos = self.pos
        if pos >= self.nbits:
            raise ValueError("JPEG entropy data truncated")
        off = pos - self._base
        chunk = self._chunk
        if off < 0 or off >= len(chunk):
            off = self._refill(pos)
            chunk = self._chunk
        w = chunk[off]
        length = ln[w]
        if length == 0 or pos + length > self.nbits:
            raise ValueError(
                "invalid JPEG Huffman code"
                if length == 0
                else "JPEG entropy data truncated"
            )
        self.pos = pos + length
        return sym[w]


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND (F.2.2.1): t-bit magnitude v → signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coeffs: np.ndarray) -> np.ndarray:
    return _C.T @ coeffs @ _C


def _grid(frame):
    comps = frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _comp_block_grid(frame, comp):
    """Non-interleaved data-unit grid (T.81 A.2.2): ceil over the
    component's OWN sampled dimensions, not the padded MCU grid."""
    hmax, vmax, _, _ = _grid(frame)
    cw = -(-frame["w"] * comp["hs"] // hmax)
    ch = -(-frame["h"] * comp["vs"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _find_scan_end(buf, pos):
    """Offset of the first real marker after entropy data (skips stuffed
    0xFF00 and RSTn)."""
    end = pos
    n = len(buf)
    while end < n - 1:
        if buf[end] == 0xFF and buf[end + 1] != 0x00 and not (
            0xD0 <= buf[end + 1] <= 0xD7
        ):
            break
        end += 1
    return end


def _color_assemble(frame, planes, hmax, vmax):
    """Per-component pixel planes (full block grids) → final uint8 image:
    clip, chroma upsample (nearest), crop, gray/BT.601 conversion."""
    h, w = frame["h"], frame["w"]
    out_planes = []
    for ci, comp in enumerate(frame["comps"]):
        p = np.clip(planes[ci], 0, 255)
        ry, rx = vmax // comp["vs"], hmax // comp["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.rint(out_planes[0]).astype(np.uint8)
    if len(out_planes) == 4:
        # Adobe 4-component JPEG (the shape PDFs embed).  Samples store
        # the INVERTED-ink convention Adobe writers use, so the net
        # conversion is RGB_ch = stored_ch · stored_K / 255 — equal to
        # (1-c)(1-k)·255 in true inks.  APP14 transform 2 (YCCK) routes
        # the first three planes through the YCbCr inverse first.
        if frame.get("adobe") == 2:  # YCCK
            y, cb, cr = out_planes[:3]
            stored = [
                y + 1.402 * (cr - 128),
                y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                y + 1.772 * (cb - 128),
            ]
        else:  # CMYK (transform 0 / no marker: assume the Adobe shape —
            # no other producer of 4-component JPEGs exists in practice)
            stored = out_planes[:3]
        k = np.clip(out_planes[3], 0, 255)
        rgb = np.stack(
            [np.clip(ch, 0, 255) * k / 255.0 for ch in stored], axis=2
        )
        return np.rint(np.clip(rgb, 0, 255)).astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=2)
    return np.rint(np.clip(rgb, 0, 255)).astype(np.uint8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG bytes → uint8 H×W (gray) or H×W×3 (RGB)."""
    buf = bytes(payload)
    if buf[:2] != MAGIC:
        raise ValueError(f"not a JPEG: magic {buf[:2]!r}")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    coef = None  # progressive: per-comp dense (bY, bX, 64) zigzag coeff arrays
    restart_interval = 0
    adobe_transform = None  # APP14: 0 CMYK, 1 YCbCr, 2 YCCK
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if coef is not None:
                return _finalize_progressive(frame, coef, qt)
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                qt[tq] = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p).astype(np.int32)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                (huff_ac if tc else huff_dc)[th] = _build_lut(bits, vals)
                p += 17 + nvals
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "adobe": adobe_transform}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported, "
                f"got SOF marker 0x{marker:02X} (extended/lossless/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]  # 0 CMYK, 1 YCbCr, 2 YCCK
            if frame is not None:
                frame["adobe"] = adobe_transform
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = {}
            order = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = {"dc": tables >> 4, "ac": tables & 0xF}
                order.append(cs)
            data_start = pos + seg_len
            if not progressive:
                return _decode_scan(
                    buf, data_start, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if ss == 0 and se != 0:
                raise ValueError(
                    "invalid progressive scan: DC scan must have Se=0 "
                    "(baseline entropy data under an SOF2 marker?)"
                )
            if ss > 0 and ns != 1:
                raise ValueError(
                    "invalid progressive scan: AC scans are single-component"
                )
            if se > 63 or (ss > se):
                raise ValueError("invalid progressive spectral range")
            if coef is None:
                _, _, mcus_x, mcus_y = _grid(frame)
                coef = [
                    np.zeros(
                        (mcus_y * c["vs"], mcus_x * c["hs"], 64), dtype=np.int32
                    )
                    for c in frame["comps"]
                ]
            pos = _decode_prog_scan(
                buf, data_start, frame, order, scan, ss, se,
                ahal >> 4, ahal & 0xF, huff_dc, huff_ac, restart_interval, coef,
            )
            continue
        pos += seg_len
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(buf, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    # split entropy stream at RST/EOI markers (0xFF followed by non-zero)
    planes = [
        np.zeros((mcus_y * c["vs"] * 8, mcus_x * c["hs"] * 8), dtype=np.float64)
        for c in comps
    ]
    segments = _split_restarts(buf[pos:_find_scan_end(buf, pos)])
    pred = [0] * len(comps)
    mcu_index = 0
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    # entropy decode stays sequential (bitstream dependency) but accumulates
    # SPARSE (flat-index, value) pairs per component — document pages are
    # mostly EOB-after-DC blocks, so the per-block Python work is a handful
    # of appends; dequantize/de-zigzag/IDCT then run BATCHED per component
    # (one (n,8,8) matmul pair), and the pixel scatter is a reshape/transpose
    # instead of n fancy assignments.  Measured in BASELINE.md's per-format
    # table: ~4× (gray) / ~13× (4:2:0 color) over the r2 per-symbol decoder.
    comp_idx: list[list[int]] = [[] for _ in comps]  # blockbase*64 + zigzag k
    comp_val: list[list[int]] = [[] for _ in comps]
    bases = [0] * len(comps)
    # hoist per-component lookups out of the MCU loop
    tabs = [
        (*huff_dc[scan[c["id"]]["dc"]], *huff_ac[scan[c["id"]]["ac"]])
        for c in comps
    ]
    nblk = [c["vs"] * c["hs"] for c in comps]
    # inlined reader state (method dispatch on 100k+ symbols is measurable);
    # the window list slides in _WIN_CHUNK slices (see _BitReader) — win
    # covers acc[cbase:cend], accesses subtract cbase.  One MCU consumes at
    # most blocks × 64 coeffs × 32 bits; T.81 §A.2.3 caps Σ Hi·Vi at 10
    # blocks per MCU, so size the refill margin from THIS frame's actual
    # block count (not a fixed 6-block guess) and refilling at MCU
    # granularity keeps every inner access in-chunk.
    rdata, nbits, bpos = reader.data, reader.nbits, reader.pos
    cbase, cend = 0, min(nbits, _WIN_CHUNK)
    win = reader._chunk
    # (no cap: Hi,Vi ≤ 4 ⇒ ≤64 blocks ⇒ ≤131k bits, well under _WIN_CHUNK;
    # sizing from the frame can only over-provision, never index past win)
    _MCU_MARGIN = 64 * 32 * sum(nblk)
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader = _BitReader(next(seg_iter))
                rdata, nbits, bpos = reader.data, reader.nbits, 0
                cbase, cend = 0, min(nbits, _WIN_CHUNK)
                win = reader._chunk
                pred = [0] * len(comps)
            if bpos + _MCU_MARGIN > cend and cend < nbits:
                cbase = bpos
                cend = min(nbits, cbase + _WIN_CHUNK)
                win = _win_slice_msb(rdata, cbase, cend)
            for ci in range(len(comps)):
                dcsym, dcln, acsym, acln = tabs[ci]
                idxs, vals = comp_idx[ci], comp_val[ci]
                p = pred[ci]
                base = bases[ci]
                for _b in range(nblk[ci]):
                    # DC: one LUT probe + magnitude bits (EXTEND inlined)
                    if bpos >= nbits:
                        raise ValueError("JPEG entropy data truncated")
                    w0 = win[bpos - cbase]
                    ln = dcln[w0]
                    if ln == 0:
                        raise ValueError("invalid JPEG Huffman code")
                    bpos += ln
                    t = dcsym[w0]
                    if t:
                        if bpos + t > nbits:
                            raise ValueError("JPEG entropy data truncated")
                        v = win[bpos - cbase] >> (16 - t)
                        bpos += t
                        p += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                    idxs.append(base)
                    vals.append(p)
                    k = 1
                    while k < 64:
                        if bpos >= nbits:
                            raise ValueError("JPEG entropy data truncated")
                        w0 = win[bpos - cbase]
                        ln = acln[w0]
                        if ln == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        bpos += ln
                        rs = acsym[w0]
                        s = rs & 0xF
                        if s == 0:
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        if bpos + s > nbits:
                            raise ValueError("JPEG entropy data truncated")
                        v = win[bpos - cbase] >> (16 - s)
                        bpos += s
                        idxs.append(base + k)
                        vals.append(
                            v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                        )
                        k += 1
                    base += 64
                pred[ci] = p
                bases[ci] = base
            mcu_index += 1
        if bpos > nbits:
            raise ValueError("JPEG entropy data truncated")
    for ci, comp in enumerate(comps):
        n = bases[ci] // 64
        if n == 0:
            continue
        q = qt[comp["tq"]]
        vs, hs = comp["vs"], comp["hs"]
        zz = np.zeros(n * 64, dtype=np.int64)
        zz[np.asarray(comp_idx[ci], dtype=np.intp)] = comp_val[ci]
        dq = np.zeros((n, 64), dtype=np.float64)
        dq[:, ZIGZAG] = zz.reshape(n, 64) * q  # dequant + de-zigzag, batched
        px = _C.T @ dq.reshape(n, 8, 8) @ _C + 128.0  # batched IDCT
        # blocks arrive in (my, mx, by, bx) order → permute to raster
        planes[ci] = (
            px.reshape(mcus_y, mcus_x, vs, hs, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * vs * 8, mcus_x * hs * 8)
        )
    return _color_assemble(frame, planes, hmax, vmax)


# ------------------------------------------------- progressive (SOF2) decode
#
# T.81 Annex G.1.2, implemented from the spec: each SOS carries a spectral
# band [Ss, Se] at successive-approximation precision (Ah → Al).  DC scans
# may interleave all components (MCU order); AC scans are single-component
# in the component's own data-unit raster (A.2.2).  Coefficients accumulate
# in dense per-component zigzag arrays; the batched dequant/IDCT finalizer
# is shared with the baseline path.


def _ac_first_block(reader, blk, ss, se, al, ac_tab, eobrun):
    """First AC scan for one block (G.1.2.2): EOB-run + run/size coding.
    Returns the remaining EOB-run (this block included when one starts)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:
                eb = (1 << r) - 1
                if r:
                    eb += reader.read_bits(r)
                return eb
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("JPEG progressive AC index overflow")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
    return 0


def _ac_refine_block(reader, blk, ss, se, al, ac_tab, eobrun):
    """AC successive-approximation refinement for one block (G.1.2.3):
    newly-nonzero coefficients arrive as ±1<<Al; every already-nonzero
    coefficient crossed (including the EOB-run tail) consumes one
    correction bit.  Every stored value is a multiple of 1<<Al, so the
    'already corrected this pass' test is bit Al of the magnitude."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG refinement magnitude")
                val = p1 if reader.read_bits(1) else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bits(1) and not (abs(v) & p1):
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("JPEG progressive AC index overflow")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and reader.read_bits(1) and not (abs(v) & p1):
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(buf, pos, frame, order, scan, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval, coef):
    """Decode ONE progressive scan into ``coef``; returns the offset just
    past its entropy data.  Restart markers reset DC predictors and the
    EOB run, exactly as in the baseline path."""
    comps = frame["comps"]
    _, _, mcus_x, mcus_y = _grid(frame)
    end = _find_scan_end(buf, pos)
    seg_iter = iter(_split_restarts(buf[pos:end]))
    reader = _BitReader(next(seg_iter))
    cidx = {c["id"]: i for i, c in enumerate(comps)}

    if ss == 0 and len(order) > 1:
        # interleaved DC scan over MCUs
        pred = dict.fromkeys(order, 0)
        units = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and units and units % restart_interval == 0:
                    reader = _BitReader(next(seg_iter))
                    pred = dict.fromkeys(order, 0)
                for cs in order:
                    ci = cidx[cs]
                    c = comps[ci]
                    plane = coef[ci]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            r_, c_ = my * c["vs"] + by, mx * c["hs"] + bx
                            if ah == 0:
                                t = reader.decode_symbol(
                                    huff_dc[scan[cs]["dc"]]
                                )
                                pred[cs] += _extend(reader.read_bits(t), t)
                                plane[r_, c_, 0] = pred[cs] << al
                            elif reader.read_bits(1):
                                plane[r_, c_, 0] |= 1 << al
                units += 1
        return end

    # single-component scan (DC or AC) over the component's own grid
    cs = order[0]
    ci = cidx[cs]
    comp = comps[ci]
    plane = coef[ci]
    bh, bw = _comp_block_grid(frame, comp)
    pred0 = 0
    eobrun = 0
    units = 0
    for r_ in range(bh):
        for c_ in range(bw):
            if restart_interval and units and units % restart_interval == 0:
                reader = _BitReader(next(seg_iter))
                pred0 = 0
                eobrun = 0
            if ss == 0:
                if ah == 0:
                    t = reader.decode_symbol(huff_dc[scan[cs]["dc"]])
                    pred0 += _extend(reader.read_bits(t), t)
                    plane[r_, c_, 0] = pred0 << al
                elif reader.read_bits(1):
                    plane[r_, c_, 0] |= 1 << al
            else:
                blk = plane[r_, c_]
                ac_tab = huff_ac[scan[cs]["ac"]]
                if ah == 0:
                    eobrun = _ac_first_block(reader, blk, ss, se, al, ac_tab, eobrun)
                else:
                    eobrun = _ac_refine_block(reader, blk, ss, se, al, ac_tab, eobrun)
            units += 1
    return end


def _finalize_progressive(frame, coef, qt):
    """Accumulated zigzag coefficients → image (batched dequant + IDCT,
    same math as the baseline finalizer, raster block order)."""
    hmax, vmax, _, _ = _grid(frame)
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        q = qt[comp["tq"]]
        arr = coef[ci]
        b_y, b_x, _ = arr.shape
        n = b_y * b_x
        dq = np.zeros((n, 64), dtype=np.float64)
        dq[:, ZIGZAG] = arr.reshape(n, 64).astype(np.float64) * q
        px = _C.T @ dq.reshape(n, 8, 8) @ _C + 128.0
        planes.append(
            px.reshape(b_y, b_x, 8, 8).transpose(0, 2, 1, 3).reshape(b_y * 8, b_x * 8)
        )
    return _color_assemble(frame, planes, hmax, vmax)


def _split_restarts(data: bytes) -> list[bytes]:
    """Entropy data → segments between RSTn markers (stuffed FF00 kept)."""
    segs = []
    start = 0
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            segs.append(data[start:i])
            start = i + 2
            i += 2
        else:
            i += 1
    segs.append(data[start:])
    return segs


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _encode_block(bw, block, q, dc_codes, ac_codes, pred: int) -> int:
    """DCT→quantize→entropy-encode one 8×8 level-shifted block; returns the
    new DC predictor."""
    coeffs = _C @ block @ _C.T
    zz = np.rint(coeffs.reshape(-1)[ZIGZAG] / q).astype(np.int32)
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t = abs(diff).bit_length()
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        mag = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(mag, t)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if zz.any() else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        mag = v if v > 0 else v + (1 << s) - 1
        bw.write(mag, s)
        run = 0
    return pred


def _pad_to(img: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate pad a 2-D float array to multiples of ``mult``."""
    h, w = img.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _tables_segments(q: np.ndarray) -> bytes:
    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))  # zigzag order
    dht = _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    dht += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    return dqt + dht


def encode_jpeg_gray(img: np.ndarray, quality_div: int = 1) -> bytes:
    """uint8 H×W grayscale → baseline JPEG (Annex K tables, 4:4:4).

    ``quality_div`` divides the quantization table (clamped ≥1):
    1 ≈ quality 50; 8 ≈ near-lossless — what a document scanner uses, and
    what fixture pages need so 1-px glyph features survive the round trip.
    """
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 H×W gray, got {img.dtype} {img.shape}")
    h, w = img.shape
    # zigzag order: matches coeff order and DQT body
    q = np.maximum(1, QUANT_LUMA[ZIGZAG] // quality_div)
    dc_codes = _encode_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    padded = _pad_to(img.astype(np.float64), 8)
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            pred = _encode_block(bw, block, q, dc_codes, ac_codes, pred)
    bw.flush()
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return MAGIC + _tables_segments(q) + sof + sos + bytes(bw.out) + b"\xff\xd9"


def encode_jpeg_cmyk(
    planes: "np.ndarray", quality_div: int = 8, yccck: bool = False
) -> bytes:
    """uint8 H×W×4 stored-convention planes (C'M'Y'K', the Adobe-inverted
    samples) → 4-component baseline JPEG with the Adobe APP14 marker —
    the shape PDFs embed.  ``yccck=True`` writes transform 2 (the first
    three planes route through the forward YCbCr transform).  4:4:4, one
    shared Annex-K table; interleaved MCU = one block per component."""
    if planes.dtype != np.uint8 or planes.ndim != 3 or planes.shape[2] != 4:
        raise ValueError(
            f"expected uint8 H×W×4 planes, got {planes.dtype} {planes.shape}"
        )
    h, w = planes.shape[:2]
    comps = [planes[:, :, c].astype(np.float64) for c in range(4)]
    if yccck:
        r, g, b = comps[:3]
        comps[0] = 0.299 * r + 0.587 * g + 0.114 * b
        comps[1] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        comps[2] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    q = np.maximum(1, QUANT_LUMA[ZIGZAG] // quality_div)
    dc_codes = _encode_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    padded = [_pad_to(c, 8) for c in comps]
    bw = _BitWriter()
    preds = [0, 0, 0, 0]
    for by in range(0, padded[0].shape[0], 8):
        for bx in range(0, padded[0].shape[1], 8):
            for ci in range(4):
                block = padded[ci][by : by + 8, bx : bx + 8] - 128.0
                preds[ci] = _encode_block(bw, block, q, dc_codes, ac_codes, preds[ci])
    bw.flush()
    app14 = _seg(
        0xEE,
        b"Adobe" + struct.pack(">HHH", 100, 0, 0) + bytes([2 if yccck else 0]),
    )
    sof = _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([4])
        + b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3, 4)),
    )
    sos = _seg(
        0xDA,
        bytes([4]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3, 4))
        + bytes([0, 63, 0]),
    )
    return MAGIC + app14 + _tables_segments(q) + sof + sos + bytes(bw.out) + b"\xff\xd9"


def _rgb_planes_420(img: np.ndarray):
    """RGB uint8 → (padded Y, 2×2-averaged Cb, Cr) float planes for 4:2:0.
    Shared by the baseline and progressive encoders so both produce the
    same quantized coefficients."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    # pad Y to 16 (MCU = 2×2 luma blocks), then 2×2-average the chroma
    yp = _pad_to(y, 16)
    cbp = _pad_to(cb, 16)
    crp = _pad_to(cr, 16)
    cb2 = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
    cr2 = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    return yp, cb2, cr2


def encode_jpeg_rgb(img: np.ndarray, quality_div: int = 1) -> bytes:
    """uint8 H×W×3 RGB → baseline JPEG, YCbCr **4:2:0** (the common scan
    subsampling) — exercises the decoder's interleaved-MCU + chroma-upsample
    path.  One shared Annex-K table for all components (legal; table id 0).
    """
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected uint8 H×W×3 RGB, got {img.dtype} {img.shape}")
    h, w = img.shape[:2]
    yp, cb2, cr2 = _rgb_planes_420(img)
    q = np.maximum(1, QUANT_LUMA[ZIGZAG] // quality_div)
    dc_codes = _encode_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(0, yp.shape[0], 16):
        for mx in range(0, yp.shape[1], 16):
            for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):  # 4 Y blocks
                block = yp[my + by : my + by + 8, mx + bx : mx + bx + 8] - 128.0
                preds[0] = _encode_block(bw, block, q, dc_codes, ac_codes, preds[0])
            cy, cx = my // 2, mx // 2
            for ci, plane in ((1, cb2), (2, cr2)):
                block = plane[cy : cy + 8, cx : cx + 8] - 128.0
                preds[ci] = _encode_block(bw, block, q, dc_codes, ac_codes, preds[ci])
    bw.flush()
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return MAGIC + _tables_segments(q) + sof + sos + bytes(bw.out) + b"\xff\xd9"


# ------------------------------------------------- progressive encoder
#
# Fixture/test counterpart of the SOF2 decoder.  Scan script exercises every
# progressive decode path: interleaved DC first (Al=1), DC refinement, one
# full AC band first pass (Al=1, EOB-run coded), AC refinement (correction
# bits).  Quantized coefficients are byte-identical to the baseline
# encoder's (shared quantization + padding), so progressive decode must
# reproduce the baseline decode EXACTLY — the round-trip equality test.
# EOB runs are flushed per block (EOBRUN=1) — legal, marginally larger
# output, much simpler than cross-block run buffering.


def _quant_coeff_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Padded float plane (multiple-of-8 dims) → (bY, bX, 64) quantized
    ZIGZAG-order coefficient blocks (batched DCT, baseline-identical)."""
    hp, wp = plane.shape
    b_y, b_x = hp // 8, wp // 8
    blocks = (plane - 128.0).reshape(b_y, 8, b_x, 8).transpose(0, 2, 1, 3)
    coeffs = _C @ blocks @ _C.T
    return np.rint(coeffs.reshape(b_y, b_x, 64)[:, :, ZIGZAG] / q).astype(np.int32)


def _emit_dc_first(bw, comps_zz, al, dc_codes):
    """Interleaved DC first scan (point transform = arithmetic >> Al),
    MCU order (my, mx, component, by, bx) — must mirror the decoder."""
    preds = [0] * len(comps_zz)
    arr0, vs0, hs0 = comps_zz[0]
    mcus_y, mcus_x = arr0.shape[0] // vs0, arr0.shape[1] // hs0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for i, (arr, vs, hs) in enumerate(comps_zz):
                for by in range(vs):
                    for bx in range(hs):
                        v = int(arr[my * vs + by, mx * hs + bx, 0]) >> al
                        diff = v - preds[i]
                        preds[i] = v
                        t = abs(diff).bit_length()
                        code, ln = dc_codes[t]
                        bw.write(code, ln)
                        if t:
                            mag = diff if diff > 0 else diff + (1 << t) - 1
                            bw.write(mag, t)


def _emit_dc_refine(bw, comps_zz, al):
    """DC refinement: one raw bit per block (bit Al of the DC value)."""
    arr0, vs0, hs0 = comps_zz[0]
    mcus_y, mcus_x = arr0.shape[0] // vs0, arr0.shape[1] // hs0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for arr, vs, hs in comps_zz:
                for by in range(vs):
                    for bx in range(hs):
                        bw.write((int(arr[my * vs + by, mx * hs + bx, 0]) >> al) & 1, 1)


def _emit_ac_first(bw, arr, bh, bwid, ss, se, al, ac_codes):
    """First AC scan over the component's data-unit grid: run/size coding
    with magnitude truncation toward zero (G.1.2.2); EOB per block."""
    for r_ in range(bh):
        for c_ in range(bwid):
            blk = arr[r_, c_]
            vals = []
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al
                vals.append(t if v >= 0 else -t)
            last = -1
            for i, v in enumerate(vals):
                if v:
                    last = i
            run = 0
            for i in range(last + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                mag = v if v > 0 else v + (1 << s) - 1
                bw.write(mag, s)
                run = 0
            if last < se - ss:
                code, ln = ac_codes[0x00]  # EOB (run of 1)
                bw.write(code, ln)


def _emit_ac_refine(bw, arr, bh, bwid, ss, se, al, ac_codes):
    """AC refinement scan (G.1.2.3): newly-nonzero coefficients emit
    (run<<4)|1 + sign; already-nonzero ones buffer a correction bit that is
    flushed after the next symbol (ZRL emission happens on ARRIVAL at any
    nonzero while the pending zero run exceeds 15 and we are not yet past
    the last newly-nonzero coefficient — ordering the decoder relies on)."""
    for r_ in range(bh):
        for c_ in range(bwid):
            blk = arr[r_, c_]
            ts = []
            for k in range(ss, se + 1):
                v = int(blk[k])
                ts.append((abs(v) >> al, v > 0))
            eobpos = -1
            for i, (t, _pos) in enumerate(ts):
                if t == 1:
                    eobpos = i
            run = 0
            br: list[int] = []
            for i, (t, positive) in enumerate(ts):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and i <= eobpos:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    for b in br:
                        bw.write(b, 1)
                    br = []
                    run -= 16
                if t > 1:
                    br.append(t & 1)
                    continue
                code, ln = ac_codes[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if positive else 0, 1)
                for b in br:
                    bw.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                code, ln = ac_codes[0x00]  # EOB (run of 1) + trailing corrections
                bw.write(code, ln)
                for b in br:
                    bw.write(b, 1)


def _prog_scan_bytes(emit, sos_body: bytes) -> bytes:
    bwr = _BitWriter()
    emit(bwr)
    bwr.flush()
    return _seg(0xDA, sos_body) + bytes(bwr.out)


def encode_jpeg_gray_progressive(img: np.ndarray, quality_div: int = 1) -> bytes:
    """uint8 H×W grayscale → progressive JPEG (SOF2), 4-scan script:
    DC(Al=1) → DC refine → AC 1-63(Al=1) → AC refine."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 H×W gray, got {img.dtype} {img.shape}")
    h, w = img.shape
    q = np.maximum(1, QUANT_LUMA[ZIGZAG] // quality_div)
    dc_codes = _encode_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    zz = _quant_coeff_blocks(_pad_to(img.astype(np.float64), 8), q)
    bh, bwid = zz.shape[:2]
    sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out = bytearray(MAGIC + _tables_segments(q) + sof)
    out += _prog_scan_bytes(
        lambda b: _emit_dc_first(b, [(zz, 1, 1)], 1, dc_codes),
        bytes([1, 1, 0x00, 0, 0, 0x01]),
    )
    out += _prog_scan_bytes(
        lambda b: _emit_dc_refine(b, [(zz, 1, 1)], 0),
        bytes([1, 1, 0x00, 0, 0, 0x10]),
    )
    out += _prog_scan_bytes(
        lambda b: _emit_ac_first(b, zz, bh, bwid, 1, 63, 1, ac_codes),
        bytes([1, 1, 0x00, 1, 63, 0x01]),
    )
    out += _prog_scan_bytes(
        lambda b: _emit_ac_refine(b, zz, bh, bwid, 1, 63, 0, ac_codes),
        bytes([1, 1, 0x00, 1, 63, 0x10]),
    )
    return bytes(out) + b"\xff\xd9"


def encode_jpeg_rgb_progressive(img: np.ndarray, quality_div: int = 1) -> bytes:
    """uint8 H×W×3 RGB → progressive JPEG, YCbCr 4:2:0: interleaved DC
    first/refine over all three components, then per-component AC
    first/refine — exercises the decoder's interleaved-DC and
    non-interleaved component-grid paths together."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected uint8 H×W×3 RGB, got {img.dtype} {img.shape}")
    h, w = img.shape[:2]
    yp, cb2, cr2 = _rgb_planes_420(img)
    q = np.maximum(1, QUANT_LUMA[ZIGZAG] // quality_div)
    dc_codes = _encode_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    zzs = [
        (_quant_coeff_blocks(yp, q), 2, 2),
        (_quant_coeff_blocks(cb2, q), 1, 1),
        (_quant_coeff_blocks(cr2, q), 1, 1),
    ]
    comps = [
        {"id": 1, "hs": 2, "vs": 2, "tq": 0},
        {"id": 2, "hs": 1, "vs": 1, "tq": 0},
        {"id": 3, "hs": 1, "vs": 1, "tq": 0},
    ]
    frame = {"h": h, "w": w, "comps": comps}
    sof = _seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out = bytearray(MAGIC + _tables_segments(q) + sof)
    out += _prog_scan_bytes(
        lambda b: _emit_dc_first(b, zzs, 1, dc_codes),
        bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]),
    )
    out += _prog_scan_bytes(
        lambda b: _emit_dc_refine(b, zzs, 0),
        bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]),
    )
    for (zz, _vs, _hs), comp in zip(zzs, comps):
        bh, bwid = _comp_block_grid(frame, comp)
        cid = comp["id"]
        out += _prog_scan_bytes(
            lambda b, z=zz, r=bh, c=bwid: _emit_ac_first(b, z, r, c, 1, 63, 1, ac_codes),
            bytes([1, cid, 0x00, 1, 63, 0x01]),
        )
        out += _prog_scan_bytes(
            lambda b, z=zz, r=bh, c=bwid: _emit_ac_refine(b, z, r, c, 1, 63, 0, ac_codes),
            bytes([1, cid, 0x00, 1, 63, 0x10]),
        )
    return bytes(out) + b"\xff\xd9"
