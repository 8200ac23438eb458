"""From-scratch CCITT Group 3 / Group 4 fax codec (ITU-T T.4 / T.6).

Scanned-document PDFs — the reference's actual corpus is scanned steel
standards (``data/1.pdf…7.pdf``, rasterized via Poppler in
``table_extraction/preprocessing.py``) — overwhelmingly store their page
images as 1-bit CCITT G4.  This module implements the public ITU
specifications the same no-library way as ``jpeg.py`` (T.81) and
``flac.py`` (RFC 9639):

- **Decoder** ``decode_ccitt``: T.6 pure-2D (PDF ``K < 0``, "G4"/MMR),
  T.4 pure-1D MH (``K = 0``) and mixed 1D/2D (``K > 0``) with per-row
  EOL + tag bits, ``EncodedByteAlign`` row alignment, EOL/fill-bit
  tolerance, EOFB/RTC termination, and hard hostile-input bounds (every
  run clamps to the row; an invalid prefix raises a named error captured
  per-row upstream, never a hang).
- **Encoders** ``encode_ccitt_g4`` / ``encode_ccitt_g3_1d``: standards-
  shaped fixture writers (vertical/pass/horizontal mode selection per
  T.6 §4.2.1.3) so every decode path round-trips exactly in tests.

Bit I/O reuses the 16-bit-lookahead window scheme from ``jpeg.py``
(``_win_slice_msb``): the longest T.4 code is 13 bits, so one list index
resolves a full code via a 65536-entry LUT — the same trick that took the
JPEG entropy loop from ~10 µs to ~0.5 µs per symbol.

Output convention: a ``uint8`` H×W array with **1 = black** (the CCITT
"ink" color).  PDF sample mapping (``BlackIs1``) is the caller's concern
(see ``pdfx._draw_image``): by spec default, decoded 0-bits are black.
"""

from __future__ import annotations

import numpy as np

from .jpeg import _win_slice_msb

__all__ = ["decode_ccitt", "encode_ccitt_g4", "encode_ccitt_g3_1d"]

# ---------------------------------------------------------------- tables
# ITU-T T.4 §2.2.2.2 (white then black, terminating + makeup) and the
# shared extended makeup codes; transcribed from the published tables and
# pinned in tests against the spec's canonical examples (all-white 1728
# row, the V/H/P mode words).

_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup 1792-2560, shared by both colors (T.4 table 3)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"

# T.6 §4.2.1.3 vertical/pass/horizontal mode words
_MODE_CODES = [
    ("1", "V0"), ("011", "VR1"), ("010", "VL1"), ("001", "H"),
    ("0001", "P"), ("000011", "VR2"), ("000010", "VL2"),
    ("0000011", "VR3"), ("0000010", "VL3"),
]
_MODE_BITS = {m: c for c, m in _MODE_CODES}


def _build_run_lut(codes: dict[int, str]) -> list[int]:
    """65536-entry LUT over the 16-bit MSB-first lookahead window →
    ``(run << 5) | nbits`` (0 = invalid prefix).  Max run 2560 < 2^12,
    max nbits 13 < 2^5."""
    lut = [0] * 65536
    for run, bits in {**codes, **_EXT_MAKEUP}.items():
        n = len(bits)
        v = int(bits, 2) << (16 - n)
        lut[v : v + (1 << (16 - n))] = [(run << 5) | n] * (1 << (16 - n))
    return lut


_WHITE_LUT = _build_run_lut(_WHITE_CODES)
_BLACK_LUT = _build_run_lut(_BLACK_CODES)

_MODE_LUT: list[tuple[str, int] | None] = [None] * 65536
for _c, _m in _MODE_CODES:
    _n = len(_c)
    _v = int(_c, 2) << (16 - _n)
    _MODE_LUT[_v : _v + (1 << (16 - _n))] = [(_m, _n)] * (1 << (16 - _n))


_WIN_CHUNK = 1 << 20  # window entries materialized at a time


class _Reader:
    """MSB-first bit reader with the jpeg-style 16-bit window list,
    materialized in bounded ``_WIN_CHUNK`` slices exactly like
    ``jpeg._BitReader``: a window entry is ~36 B of heap per input BIT, so
    a whole-stream list over an attacker-sized /CCITTFaxDecode stream
    (/Length is attacker-controlled) would be a multi-GB allocation before
    any validation — the executor-OOM class the per-row error capture
    cannot catch.  Peak heap here is ~36 MB regardless of stream size."""

    _MARGIN = 128  # bits any single access sequence may read past pos

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = len(data) * 8
        self.pos = 0
        self._cbase = 0
        self._cend = min(self.nbits, _WIN_CHUNK)
        self._chunk = _win_slice_msb(data, 0, self._cend)

    def _w(self, pos: int) -> int:
        """16-bit window at ``pos``, sliding the chunk forward as needed
        (positions only ever advance)."""
        if pos >= self.nbits:
            return 0
        if pos < self._cbase or pos + 16 > self._cend and self._cend < self.nbits:
            self._cbase = pos
            self._cend = min(self.nbits, pos + _WIN_CHUNK)
            self._chunk = _win_slice_msb(self.data, pos, self._cend)
        return self._chunk[pos - self._cbase]

    def peek16(self) -> int:
        return self._w(self.pos)

    def read_run(self, black: bool) -> int:
        """One complete MH run length (makeup* + terminating)."""
        lut = _BLACK_LUT if black else _WHITE_LUT
        total = 0
        while True:
            if self.pos >= self.nbits:
                raise ValueError("CCITT: truncated run code")
            e = lut[self._w(self.pos)]
            if e == 0:
                raise ValueError(
                    f"CCITT: invalid {'black' if black else 'white'} code at "
                    f"bit {self.pos}"
                )
            run, n = e >> 5, e & 31
            self.pos += n
            total += run
            if run < 64:  # terminating code ends the run
                return total
            # makeup codes must chain into a terminating code

    def try_eol(self) -> bool:
        """Consume fill zeros + one EOL if present at the cursor."""
        p = self.pos
        # fill bits are zeros; EOL is 11 zeros + 1.  Scan a bounded window
        # of zeros (T.4 allows fill before EOL) then demand the EOL tail.
        zeros = 0
        while p + zeros < self.nbits and not (self._w(p + zeros) & 0x8000):
            zeros += 1
            if zeros > 64 + 11:  # bounded: more fill than any writer emits
                return False
        if zeros >= 11 and p + zeros < self.nbits:
            self.pos = p + zeros + 1  # consume fill+EOL including the 1
            return True
        return False

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _row_from_transitions(trans: list[int], columns: int) -> np.ndarray:
    row = np.zeros(columns, dtype=np.uint8)
    for i in range(0, len(trans) - 1, 2):
        row[trans[i] : trans[i + 1]] = 1
    if len(trans) % 2 == 1:
        row[trans[-1] :] = 1
    return row


def _decode_row_1d(rd: _Reader, columns: int) -> list[int]:
    """One MH-coded row → changing-element positions (white start)."""
    trans: list[int] = []
    a0, black = 0, False
    while a0 < columns:
        run = rd.read_run(black)
        a0 = min(columns, a0 + run)
        trans.append(a0)
        black = not black
    # positions where color changes; the trailing == columns marker is
    # not a change inside the row
    return [t for t in trans if t < columns]


def _decode_row_2d(rd: _Reader, ref: list[int], columns: int) -> list[int]:
    """One T.6 2D-coded row against reference transitions → transitions."""
    cur: list[int] = []
    a0 = -1
    black = False
    nref = len(ref)
    q = 0  # monotone pointer: first ref index with ref[q] > a0 (a0 only
    # ever advances, so q never rescans — O(runs) per row, not O(runs²))
    while a0 < columns:
        e = _MODE_LUT[rd.peek16()]
        if e is None:
            raise ValueError(f"CCITT: invalid 2D mode code at bit {rd.pos}")
        mode, n = e
        rd.pos += n
        # b1: first ref transition > a0 with opposite color to a0's color.
        # ref transitions alternate white→black (even idx), black→white
        # (odd): for a white a0 run, b1 is even-indexed; black → odd.
        while q < nref and ref[q] <= a0:
            q += 1
        j = q if (q & 1) == black else q + 1
        b1 = ref[j] if j < nref else columns
        b2 = ref[j + 1] if j + 1 < nref else columns
        if mode == "P":
            a0 = b2  # color unchanged, run extends past b2
        elif mode == "H":
            s = a0 if a0 >= 0 else 0
            r1 = rd.read_run(black)
            r2 = rd.read_run(not black)
            a1 = min(columns, s + r1)
            a2 = min(columns, a1 + r2)
            cur.extend((a1, a2))
            a0 = a2
        else:  # vertical
            d = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                 "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = max(0, min(columns, b1 + d))
            cur.append(a1)
            a0 = a1
            black = not black
    return [t for t in cur if t < columns]


def decode_ccitt(
    data: bytes,
    columns: int,
    rows: int = 0,
    k: int = -1,
    byte_align: bool = False,
) -> np.ndarray:
    """CCITT-encoded bytes → uint8 H×W bitmap, 1 = black.

    ``k``/``columns``/``rows``/``byte_align`` mirror the PDF
    ``CCITTFaxDecode`` DecodeParms (``K``, ``Columns``, ``Rows``,
    ``EncodedByteAlign``).  ``rows == 0`` decodes until EOFB/RTC or data
    exhaustion."""
    if columns <= 0:
        raise ValueError("CCITT: Columns must be positive")
    rd = _Reader(data)
    out: list[np.ndarray] = []
    ref: list[int] = []  # imaginary all-white reference line
    has_eol: bool | None = None  # K=0: decided on the first row (below)
    while rows == 0 or len(out) < rows:
        if byte_align and k < 0:
            rd.byte_align()  # G4: each coded row starts byte-aligned
        if k < 0:
            if rd.pos >= rd.nbits:
                break
            w16 = rd.peek16()
            if (w16 >> 4) == 1:
                break  # EOL = first half of EOFB — pure-2D data is done
            if w16 == 0 and rd.nbits - rd.pos < 16:
                break  # trailing byte-pad zeros
            trans = _decode_row_2d(rd, ref, columns)
        elif k == 0:
            # EOL usage is decided ONCE, on the first row: a K=0 stream
            # either prefixes every row with EOL or none (writers are
            # consistent), and at stream start there are no pad bits, so
            # ≥11 zeros can only be an EOL (the longest white-code zero
            # prefix is 7).  Deciding per-row instead is ambiguous under
            # EncodedByteAlign: pad zeros + a long white makeup code's
            # leading zeros can reach 11 and masquerade as an EOL
            # (found in review — silently corrupted aligned K=0 streams).
            if has_eol is None:
                has_eol = rd.try_eol()
            elif has_eol:
                rd.try_eol()
            if byte_align:
                # aligned layout: each row's CODES start on a byte
                # boundary (fill precedes the EOL, so consuming it lands
                # aligned; without EOLs this eats the ≤7 pad zeros)
                rd.byte_align()
            if rd.pos >= rd.nbits:
                break
            if has_eol and rd.try_eol():  # consecutive EOLs = RTC
                break
            if rd.nbits - rd.pos < 8 and rd.peek16() == 0:
                break  # trailing byte-pad zeros
            trans = _decode_row_1d(rd, columns)
        else:
            # mixed: every row starts fill+EOL then a 1-bit tag (1=1D, 0=2D)
            if not rd.try_eol():
                if rd.pos >= rd.nbits or (
                    rd.nbits - rd.pos < 8 and rd.peek16() == 0
                ):
                    break
                raise ValueError(f"CCITT: expected EOL at bit {rd.pos} (K>0)")
            if rd.try_eol():  # EOL EOL = RTC (a 2D row can't open with 11
                break  # zeros: the longest mode code is 7 bits)
            if byte_align:
                rd.byte_align()
            if rd.pos >= rd.nbits:
                break
            tag = (rd.peek16() >> 15) & 1
            rd.pos += 1
            trans = (
                _decode_row_1d(rd, columns)
                if tag
                else _decode_row_2d(rd, ref, columns)
            )
        out.append(_row_from_transitions(trans, columns))
        ref = trans
        if rows == 0 and len(out) > 1 << 20:
            raise ValueError("CCITT: unbounded row count without Rows parm")
    if rows and len(out) < rows:
        raise ValueError(f"CCITT: truncated image ({len(out)}/{rows} rows)")
    if not out:
        return np.zeros((0, columns), dtype=np.uint8)
    return np.stack(out)


# ---------------------------------------------------------------- encoders


class _Writer:
    def __init__(self):
        self.bits: list[str] = []
        self.n = 0

    def put(self, s: str) -> None:
        self.bits.append(s)
        self.n += len(s)

    def put_run(self, run: int, black: bool) -> None:
        codes = _BLACK_CODES if black else _WHITE_CODES
        while run >= 2624:  # largest extended makeup is 2560
            self.put(_EXT_MAKEUP[2560])
            run -= 2560
        if run >= 64:
            mk = (run // 64) * 64
            if mk > 1728:
                self.put(_EXT_MAKEUP[mk])
            else:
                self.put(codes[mk])
            run -= mk
        self.put(codes[run])

    def byte_align(self) -> None:
        if self.n % 8:
            self.put("0" * (8 - self.n % 8))

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _transitions(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(np.concatenate([[0], row.astype(np.int8)])))
    return d.tolist()


def encode_ccitt_g4(bitmap: np.ndarray, with_eofb: bool = True) -> bytes:
    """uint8/bool H×W bitmap (1 = black) → T.6 (G4/MMR) bytes."""
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    h, w = bm.shape
    wr = _Writer()
    ref: list[int] = []
    for y in range(h):
        cur = _transitions(bm[y])
        a0, black, i = -1, False, 0
        nref, q = len(ref), 0  # monotone b1 pointer (see _decode_row_2d)
        while a0 < w:
            a1 = cur[i] if i < len(cur) else w
            while q < nref and ref[q] <= a0:
                q += 1
            j = q if (q & 1) == black else q + 1
            b1 = ref[j] if j < nref else w
            b2 = ref[j + 1] if j + 1 < nref else w
            if b2 < a1:
                wr.put(_MODE_BITS["P"])
                a0 = b2
            elif abs(a1 - b1) <= 3:
                wr.put(_MODE_BITS[
                    {0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                     -1: "VL1", -2: "VL2", -3: "VL3"}[a1 - b1]
                ])
                a0 = a1
                black = not black
                i += 1
            else:
                a2 = cur[i + 1] if i + 1 < len(cur) else w
                s = a0 if a0 >= 0 else 0
                wr.put(_MODE_BITS["H"])
                wr.put_run(a1 - s, black)
                wr.put_run(a2 - a1, not black)
                a0 = a2
                i += 2
        ref = cur
    if with_eofb:
        wr.put(_EOL + _EOL)
    return wr.tobytes()


def encode_ccitt_g3_1d(
    bitmap: np.ndarray, with_eol: bool = False, byte_align: bool = False
) -> bytes:
    """uint8/bool H×W bitmap (1 = black) → T.4 pure-1D MH bytes (PDF K=0)."""
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    h, w = bm.shape
    wr = _Writer()
    for y in range(h):
        if with_eol:
            if byte_align:
                # T.4/TIFF aligned layout: FILL precedes the EOL so the
                # EOL's terminating 1 lands on a byte boundary and the
                # row's codes start aligned
                pad = -(wr.n + len(_EOL)) % 8
                if pad:
                    wr.put("0" * pad)
            wr.put(_EOL)
        elif byte_align:
            wr.byte_align()
        trans = _transitions(bm[y]) + [w]
        prev, black = 0, False
        for t in trans:
            wr.put_run(t - prev, black)
            prev, black = t, not black
        # (trans ends with the sentinel w, so prev == w here: rows always
        # terminate exactly — no trailing-run branch needed)
    return wr.tobytes()
