"""From-scratch PDF subset: parser, content-stream rasterizer, and writer.

The reference's PRIMARY input format is PDF, rasterized with Poppler
(``table_extraction/preprocessing.py:10-46``, ``pdf2image.convert_from_bytes``
at dpi 50/500).  This container ships neither Poppler nor pypdfium2, so until
now a ``%PDF`` payload degraded to a per-row error.  This module removes that
excuse for a well-defined subset, the same no-library standard as ``png.py``
(stdlib zlib) and the WAV path (stdlib ``wave``): everything here is stdlib
``zlib``/``re``/``struct`` + NumPy, implemented from the public PDF 1.7 spec
(ISO 32000-1).

Implemented:

- **File structure**: classic cross-reference tables with ``/Prev`` chains,
  cross-reference *streams* (PDF 1.5, ``/Type/XRef`` with ``/W``/``/Index``
  and PNG-predictor columns), compressed object streams (``/Type/ObjStm``),
  and a full-scan ``N G obj`` reconstruction fallback for files with broken
  or missing xref (the common real-world salvage path).
- **Objects**: the complete object syntax — dicts, arrays, names with
  ``#xx`` escapes, literal strings with octal/escape handling, hex strings,
  indirect references, streams with indirect ``/Length``.
- **Filters**: ``FlateDecode`` and ``LZWDecode`` (both with PNG
  predictors 10-15 and TIFF predictor 2; LZW honors ``EarlyChange``),
  ``RunLengthDecode``, ``ASCII85Decode``,
  ``ASCIIHexDecode``; ``DCTDecode`` image data routes to the from-scratch
  baseline/progressive JPEG codec (``jpeg.py``); ``CCITTFaxDecode`` (G4
  ``K<0``, G3 ``K>=0``, ``BlackIs1``/``EncodedByteAlign``) routes to the
  from-scratch ITU T.4/T.6 codec (``ccitt.py``) — the dominant encoding of
  real scanned-document corpora; ``JBIG2Decode`` (generic + symbol/text
  segments, ``/JBIG2Globals``) routes to the from-scratch ITU T.88 codec
  (``jbig2.py``) — the second.  Anything else raises a
  ``NotImplementedError`` naming the filter (captured per-row upstream).
- **Rendering**: page tree walk with attribute inheritance, content-stream
  interpretation — graphics state stack (``q/Q/cm/w/g/G/rg/RG/k/K``), path
  construction (``m/l/c/v/y/h/re``, béziers flattened), even-odd scanline
  fill, thick-segment stroking, Form XObjects, Image XObjects (gray/RGB,
  1/8-bit, ``/ImageMask`` stencils), and the full text machinery
  (``BT/ET/Tf/Td/TD/Tm/T*/TL/Tc/Tw/Tj/TJ/'/"``) for **Type 3 fonts**, whose
  glyphs are themselves content streams executed under the font matrix.
- **Writer**: :func:`build_page_pdf` emits vector pages (rect fills + Type 3
  bitmap text) with a classic xref — used by the fixture generator so the
  full ``%PDF → rasterize → detect → OCR → spans`` path runs end-to-end and
  is pinned by span equality against the same golden plan.
- **Text layer**: :func:`extract_text` walks the same interpreter without
  painting and returns per-page ``(x, y, text)`` runs — the born-digital
  fast path that skips raster OCR when a text layer exists.

Named seams (deliberate, raise with the feature name so the decode stage
captures a per-row error, never a task failure): embedded-outline fonts
(Type1/TrueType/CFF glyph rasterization needs a font renderer — slot
pypdfium2 via ``sources/pdf_adapter.py``), non-axis-aligned image placement,
shading patterns.  Standard-security-handler ENCRYPTION (RC4/AES, the
permissions-only empty-user-password shape scan archives ship) decrypts
transparently via ``pdfcrypto.py``; a real user password is a named
per-row refusal.

Nonzero winding fill is approximated by even-odd (documented; the writer
never emits self-overlapping paths, and axis-aligned document geometry is
unaffected).  Clipping paths (``W``) are tracked as a bounding-box
intersection only.
"""

from __future__ import annotations

import re as _re
import zlib

import numpy as np

__all__ = [
    "parse_pdf",
    "pdf_page_count",
    "rasterize_pdf_page",
    "rasterize_pdf_pages",
    "extract_text",
    "build_page_pdf",
    "build_pdf",
]


# ------------------------------------------------------------ object model


class Name(str):
    """A PDF name (``/Foo``) — distinct from a byte string."""

    __slots__ = ()


class Ref(tuple):
    __slots__ = ()

    def __new__(cls, num: int, gen: int):
        return super().__new__(cls, (num, gen))

    @property
    def num(self):
        return self[0]


class Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


from collections import OrderedDict
from math import ceil as _ceil, floor as _floor

# cross-document glyph geometry cache (see _Raster._paint_glyph): bounded
# LRU keyed on (md5 of the glyph program bytes, ctm linear part, paint
# state) — safe across documents because resource-referencing programs
# (any Do op) are never stored
_GLYPH_OPS_CACHE: OrderedDict = OrderedDict()
_GLYPH_OPS_MAX = 8192


def _is_ws(b: int) -> bool:
    return b in _WS


def _is_regular(b: int) -> bool:
    return b not in _WS and b not in _DELIM


class _Parser:
    """Recursive-descent parser over the raw file buffer (ISO 32000-1 §7.3)."""

    def __init__(self, buf: bytes, doc: "_Document | None" = None):
        self.buf = buf
        self.pos = 0
        self.doc = doc  # for resolving indirect /Length

    # -- low level ---------------------------------------------------------
    def skip_ws(self):
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            b = buf[self.pos]
            if b in _WS:
                self.pos += 1
            elif b == 0x25:  # % comment to EOL
                while self.pos < n and buf[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def _keyword(self) -> str:
        start = self.pos
        buf, n = self.buf, len(self.buf)
        while self.pos < n and _is_regular(buf[self.pos]):
            self.pos += 1
        return buf[start : self.pos].decode("latin-1")

    # -- objects -----------------------------------------------------------
    def parse(self):
        self.skip_ws()
        buf = self.buf
        if self.pos >= len(buf):
            raise ValueError("PDF parse: unexpected EOF")
        b = buf[self.pos]
        if b == 0x2F:  # /
            return self._name()
        if b == 0x28:  # (
            return self._lit_string()
        if b == 0x3C:  # < or <<
            if buf[self.pos : self.pos + 2] == b"<<":
                return self._dict_or_stream()
            return self._hex_string()
        if b == 0x5B:  # [
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if buf[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse())
        if b in b"+-.0123456789":
            return self._number_or_ref()
        kw = self._keyword()
        if kw == "true":
            return True
        if kw == "false":
            return False
        if kw == "null":
            return None
        raise ValueError(f"PDF parse: unexpected token {kw!r} at {self.pos}")

    def _name(self) -> Name:
        self.pos += 1  # /
        buf, n = self.buf, len(self.buf)
        out = []
        while self.pos < n and _is_regular(buf[self.pos]):
            c = buf[self.pos]
            if c == 0x23 and self.pos + 2 < n:  # #xx
                out.append(int(buf[self.pos + 1 : self.pos + 3], 16))
                self.pos += 3
            else:
                out.append(c)
                self.pos += 1
        return Name(bytes(out).decode("latin-1"))

    def _lit_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        self.pos += 1
        depth, out = 1, bytearray()
        while self.pos < n:
            c = buf[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                e = buf[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                elif e in b"01234567":
                    oct_digits = [e]
                    while len(oct_digits) < 3 and buf[self.pos] in b"01234567":
                        oct_digits.append(buf[self.pos])
                        self.pos += 1
                    out.append(int(bytes(oct_digits), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and buf[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise ValueError("PDF parse: unterminated string")

    def _hex_string(self) -> bytes:
        self.pos += 1
        end = self.buf.index(b">", self.pos)
        hx = b"".join(self.buf[self.pos : end].split())
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("latin-1"))

    def _number_or_ref(self):
        start = self.pos
        buf, n = self.buf, len(self.buf)
        while self.pos < n and buf[self.pos] in b"+-.0123456789":
            self.pos += 1
        tok = buf[start : self.pos]
        if b"." in tok:
            return float(tok)
        val = int(tok)
        # lookahead for "G R" (indirect reference)
        save = self.pos
        self.skip_ws()
        start2 = self.pos
        while self.pos < n and buf[self.pos] in b"0123456789":
            self.pos += 1
        gen_tok = buf[start2 : self.pos]
        if gen_tok:
            self.skip_ws()
            if self.pos < n and buf[self.pos] == 0x52 and (
                self.pos + 1 >= n or not _is_regular(buf[self.pos + 1])
            ):
                self.pos += 1
                return Ref(val, int(gen_tok))
        self.pos = save
        return val

    def _dict_or_stream(self):
        buf = self.buf
        self.pos += 2
        d = {}
        while True:
            self.skip_ws()
            if buf[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            key = self.parse()
            d[str(key)] = self.parse()
        save = self.pos
        self.skip_ws()
        if buf[self.pos : self.pos + 6] == b"stream":
            self.pos += 6
            if buf[self.pos : self.pos + 2] == b"\r\n":
                self.pos += 2
            elif buf[self.pos : self.pos + 1] in (b"\n", b"\r"):
                self.pos += 1
            length = d.get("Length")
            if isinstance(length, Ref) and self.doc is not None:
                length = self.doc.resolve(length)
            if isinstance(length, int) and 0 <= length <= len(buf) - self.pos:
                raw = buf[self.pos : self.pos + length]
                end = self.pos + length
                # tolerate off-by-EOL Length: verify endstream follows
                tail = buf[end : end + 20].lstrip(b"\r\n \t")
                if not tail.startswith(b"endstream"):
                    end = buf.index(b"endstream", self.pos)
                    raw = buf[self.pos : end].rstrip(b"\r\n")
            else:  # salvage: scan for endstream
                end = buf.index(b"endstream", self.pos)
                raw = buf[self.pos : end].rstrip(b"\r\n")
            self.pos = buf.index(b"endstream", end) + 9
            return Stream(d, raw)
        self.pos = save
        return d


# ------------------------------------------------------------ filters


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    rowlen = (columns * colors * bpc + 7) // 8
    arr = np.frombuffer(data, dtype=np.uint8)
    nrows = len(arr) // (rowlen + 1)
    arr = arr[: nrows * (rowlen + 1)].reshape(nrows, rowlen + 1)
    ftypes, rows = arr[:, 0], arr[:, 1:].astype(np.int32)
    bpp = max(1, colors * bpc // 8)
    out = np.zeros_like(rows)
    prev = np.zeros(rowlen, dtype=np.int32)
    for i in range(nrows):
        r, ft = rows[i].copy(), int(ftypes[i])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for x in range(bpp, rowlen):
                r[x] = (r[x] + r[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            r = (r + prev) & 0xFF
        elif ft == 3:  # Average
            for x in range(rowlen):
                left = r[x - bpp] if x >= bpp else 0
                r[x] = (r[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(rowlen):
                a = r[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = out[i - 1][x - bpp] if (x >= bpp and i > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[x] = (r[x] + pred) & 0xFF
        else:
            raise ValueError(f"PDF PNG predictor: bad filter type {ft}")
        out[i] = r
        prev = r
    return out.astype(np.uint8).tobytes()


def _tiff_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """Predictor 2 (TIFF horizontal differencing) — each sample is stored
    as a delta from the sample one pixel to its left, per component."""
    if bpc != 8:
        raise NotImplementedError(f"PDF TIFF predictor with BPC {bpc}")
    rowlen = columns * colors
    arr = np.frombuffer(data, dtype=np.uint8)
    nrows = len(arr) // rowlen
    head = arr[: nrows * rowlen].reshape(nrows, rowlen, order="C")
    out = head.reshape(nrows, columns, colors).astype(np.uint8)
    np.cumsum(out, axis=1, dtype=np.uint8, out=out)
    return out.tobytes() + arr[nrows * rowlen :].tobytes()


def _lzw_decode_pdf(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (ISO 32000-1 §7.4.4): MSB-first 9→12-bit codes, Clear=256,
    EOD=257; ``EarlyChange`` 1 (default) bumps the code width one entry
    early (the TIFF timing), 0 bumps exactly at table-full (the GIF
    timing).  Decodes until EOD or data end."""
    from .jpeg import _WIN_CHUNK, _win_slice_msb

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, b""
    nbits = len(data) * 8
    cbase, cend = 0, min(nbits, _WIN_CHUNK)
    win = _win_slice_msb(data, 0, cend)
    bpos = 0
    while bpos + width <= nbits:
        if bpos >= cend:
            cbase = bpos
            cend = min(nbits, cbase + _WIN_CHUNK)
            win = _win_slice_msb(data, cbase, cend)
        code = win[bpos - cbase] >> (16 - width)
        bpos += width
        if code == 257:  # EOD
            break
        if code == 256:  # Clear
            table = table[:258]
            width, prev = 9, b""
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"PDF LZW: code {code} out of table")
        out += entry
        if prev:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) - (2 if early else 1) and width < 12:
            width += 1
    return bytes(out)


def _runlength_decode_pdf(data: bytes) -> bytes:
    """RunLengthDecode (ISO 32000-1 §7.4.5): PackBits runs with length
    byte 128 as EOD (PackBits treats 128 as a no-op)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h == 128:  # EOD
            return bytes(out)
        if h < 128:
            if i + h + 1 > n:
                raise ValueError("PDF RunLength: literal run past data end")
            out += data[i : i + h + 1]
            i += h + 1
        else:
            if i >= n:
                raise ValueError("PDF RunLength: repeat run past data end")
            out += data[i : i + 1] * (257 - h)
            i += 1
    raise ValueError("PDF RunLength: missing EOD")


def _ascii85_decode_pdf(data: bytes) -> bytes:
    """ASCII85Decode (ISO 32000-1 §7.4.3): base-85 groups, ``z`` for an
    all-zero group, ``~>`` EOD, whitespace ignored."""
    body = data.split(b"~>", 1)[0]
    if body.startswith(b"<~"):  # Adobe framing variant
        body = body[2:]
    body = bytes(c for c in body if c not in b" \t\r\n\f\0")
    out = bytearray()
    group: list[int] = []
    for c in body:
        if c == 0x7A:  # 'z'
            if group:
                raise ValueError("PDF ASCII85: 'z' inside a group")
            out += b"\0\0\0\0"
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError(f"PDF ASCII85: byte {c:#x} out of range")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for d in group:
                v = v * 85 + d
            if v > 0xFFFFFFFF:
                raise ValueError("PDF ASCII85: group overflows 32 bits")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("PDF ASCII85: lone trailing digit")
        k = len(group)
        v = 0
        for d in group + [84] * (5 - k):
            v = v * 85 + d
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


_IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "JBIG2Decode"}


def _stream_data(st: Stream, resolve, keep_image_codecs: bool = False):
    """Decoded stream bytes.  Returns ``(data, remaining_image_filter|None,
    its_decode_parms|None)`` when ``keep_image_codecs`` — image codecs are
    handled at the draw site (CCITT needs its DecodeParms there)."""
    filters = resolve(st.dict.get("Filter"))
    parms = resolve(st.dict.get("DecodeParms"))
    if filters is None:
        filters = []
    elif isinstance(filters, Name):
        filters = [filters]
        parms = [parms]
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    def _unpredict(data, p):
        p = resolve(p) or {}
        pred = resolve(p.get("Predictor", 1)) or 1
        cols = resolve(p.get("Columns", 1)) or 1
        colors = resolve(p.get("Colors", 1)) or 1
        bpc = resolve(p.get("BitsPerComponent", 8)) or 8
        if pred >= 10:
            return _png_unpredict(data, cols, colors, bpc)
        if pred == 2:
            return _tiff_unpredict(data, cols, colors, bpc)
        if pred != 1:
            raise ValueError(f"PDF: bad predictor {pred}")
        return data

    data = st.raw
    for f, p in zip(filters, parms):
        f = str(f)
        if f in ("FlateDecode", "Fl"):
            data = _unpredict(zlib.decompress(data), p)
        elif f in ("LZWDecode", "LZW"):
            early = resolve((resolve(p) or {}).get("EarlyChange", 1))
            data = _unpredict(_lzw_decode_pdf(data, 1 if early else 0), p)
        elif f in ("RunLengthDecode", "RL"):
            data = _runlength_decode_pdf(data)
        elif f in ("ASCII85Decode", "A85"):
            data = _ascii85_decode_pdf(data)
        elif f in ("ASCIIHexDecode", "AHx"):
            hx = b"".join(data.split()).rstrip(b">")
            data = bytes.fromhex(hx.decode("latin-1"))
        elif f in _IMAGE_FILTERS:
            if keep_image_codecs:
                return data, f, resolve(p)
            raise NotImplementedError(f"PDF stream filter {f} outside image context")
        else:
            raise NotImplementedError(f"PDF stream filter {f}")
    return (data, None, None) if keep_image_codecs else data


# ------------------------------------------------------------ document


class _Document:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.xref: dict[int, tuple] = {}  # num -> ("o", offset) | ("c", stm, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._decrypt = None
        self._encrypt_num = None
        self._load_xref()
        self._setup_encryption()

    def _setup_encryption(self):
        """Standard security handler (pdfcrypto): derive the file key with
        the EMPTY user password — the permissions-only encryption scan
        archives ship.  Streams decrypt transparently in :meth:`get`; the
        /Encrypt dict's own strings and cross-reference streams are exempt
        per spec (the xref loader never routes through ``get``).  A real
        user password raises a named ValueError."""
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is None:
            return
        if isinstance(enc_ref, Ref):
            self._encrypt_num = enc_ref.num
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise ValueError("PDF /Encrypt is not a dictionary")
        ids = self.resolve(self.trailer.get("ID", []))
        id0 = bytes(ids[0]) if isinstance(ids, list) and ids else b""
        # resolve indirect members the handler reads
        enc = {k: self.resolve(v) for k, v in enc.items()}
        if "CF" in enc and isinstance(enc["CF"], dict):
            enc["CF"] = {
                k: self.resolve(v) for k, v in enc["CF"].items()
            }
        from .pdfcrypto import make_decryptor

        self._decrypt = make_decryptor(enc, id0)

    # -- xref --------------------------------------------------------------
    def _load_xref(self):
        buf = self.buf
        try:
            tail = buf[-2048:]
            m = None
            for m in _re.finditer(rb"startxref\s+(\d+)", tail):
                pass
            if m is None:
                raise ValueError("no startxref")
            # worklist, depth-first: a hybrid-reference trailer yields BOTH
            # /XRefStm and /Prev — the xref stream must be processed before
            # the Prev chain (ISO 32000-1 §7.5.8.4), else objects living only
            # in object streams never get indexed
            offsets = [int(m.group(1))]
            seen = set()
            while offsets:
                offset = offsets.pop(0)
                if offset in seen or not (0 <= offset < len(buf)):
                    continue
                seen.add(offset)
                offsets = self._load_xref_section(offset) + offsets
        except Exception:
            self.xref = {}
        if not self.xref or "Root" not in self.trailer:
            self._reconstruct()

    def _load_xref_section(self, offset: int) -> list[int]:
        """Load one xref section; return follow-up offsets in processing
        order (a hybrid trailer's /XRefStm before its /Prev)."""
        buf = self.buf
        p = _Parser(buf, self)
        p.pos = offset
        p.skip_ws()
        if buf[p.pos : p.pos + 4] == b"xref":
            p.pos += 4
            while True:
                p.skip_ws()
                if buf[p.pos : p.pos + 7] == b"trailer":
                    p.pos += 7
                    trailer = p.parse()
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
                    follows = []
                    xs = trailer.get("XRefStm")
                    if isinstance(xs, int):
                        follows.append(xs)  # hidden-object entries first
                    prev = trailer.get("Prev")
                    if isinstance(prev, int):
                        follows.append(prev)
                    return follows
                m = _re.match(rb"(\d+)\s+(\d+)", buf[p.pos : p.pos + 40])
                if not m:
                    return []
                start, count = int(m.group(1)), int(m.group(2))
                p.pos += m.end()
                p.skip_ws()
                for i in range(count):
                    # spec entries are exactly 20 bytes (2-byte EOL), but
                    # real writers emit 19-byte entries with a lone \r or \n
                    # — advance by what was actually matched
                    m2 = _re.match(
                        rb"(\d{10}) (\d{5}) ([nf])(?: \r| \n|\r\n|[\r\n ])?",
                        buf[p.pos : p.pos + 20],
                    )
                    if not m2:
                        return []
                    if m2.group(3) == b"n":
                        self.xref.setdefault(start + i, ("o", int(m2.group(1))))
                    p.pos += m2.end()
        # xref stream
        p.pos = offset
        p.skip_ws()
        m = _re.match(rb"\d+\s+\d+\s+obj", buf[p.pos :])
        if not m:
            raise ValueError("bad xref offset")
        p.pos += m.end()
        st = p.parse()
        if not isinstance(st, Stream):
            raise ValueError("xref stream expected")
        d = st.dict
        data = _stream_data(st, self.resolve)
        w = [int(self.resolve(x)) for x in self.resolve(d["W"])]
        size = int(self.resolve(d["Size"]))
        index = self.resolve(d.get("Index", [0, size]))
        rowlen = sum(w)
        rows = [data[i : i + rowlen] for i in range(0, len(data) - rowlen + 1, rowlen)]
        ri = 0

        def field(row, j):
            s = sum(w[:j])
            chunk = row[s : s + w[j]]
            return int.from_bytes(chunk, "big") if chunk else (1 if j == 0 else 0)

        for k in range(0, len(index), 2):
            start, count = int(index[k]), int(index[k + 1])
            for i in range(count):
                if ri >= len(rows):
                    break
                row = rows[ri]
                ri += 1
                t = field(row, 0)
                if t == 1:
                    self.xref.setdefault(start + i, ("o", field(row, 1)))
                elif t == 2:
                    self.xref.setdefault(start + i, ("c", field(row, 1), field(row, 2)))
        for k, v in d.items():
            if k not in ("W", "Index", "Filter", "Length", "DecodeParms", "Type"):
                self.trailer.setdefault(k, v)
        prev = d.get("Prev")
        return [int(prev)] if isinstance(prev, int) else []

    def _reconstruct(self):
        """Full-scan salvage: index every ``N G obj`` and find a /Root."""
        for m in _re.finditer(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b", self.buf):
            self.xref[int(m.group(1))] = ("o", m.start())
        # merge any literal trailer dicts (newest last → let them win so
        # /Encrypt and the real /Root survive a broken startxref)
        for m in _re.finditer(rb"trailer\b", self.buf):
            try:
                p = _Parser(self.buf, self)
                p.pos = m.end()
                t = p.parse()
                if isinstance(t, dict):
                    self.trailer.update(t)
            except Exception:
                continue
        if "Root" not in self.trailer:
            m = None
            for m in _re.finditer(rb"/Root\s+(\d+)\s+(\d+)\s+R", self.buf):
                pass
            if m:
                self.trailer["Root"] = Ref(int(m.group(1)), int(m.group(2)))
            else:  # last resort: find the /Type/Catalog object
                for num, ent in self.xref.items():
                    try:
                        obj = self.get(num)
                    except Exception:
                        continue
                    d = obj.dict if isinstance(obj, Stream) else obj
                    if isinstance(d, dict) and str(d.get("Type")) == "Catalog":
                        self.trailer["Root"] = Ref(num, 0)
                        break
        if "Root" not in self.trailer:
            raise ValueError("PDF: no /Root catalog found")

    # -- object access -----------------------------------------------------
    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            raise ValueError(f"PDF: missing object {num}")
        if ent[0] == "o":
            p = _Parser(self.buf, self)
            p.pos = ent[1]
            p.skip_ws()
            m = _re.match(rb"(\d+)\s+(\d+)\s+obj", self.buf[p.pos : p.pos + 40])
            if not m:
                raise ValueError(f"PDF: bad object header for {num}")
            gen = int(m.group(2))
            p.pos += m.end()
            obj = p.parse()
            if (
                self._decrypt is not None
                and isinstance(obj, Stream)
                and num != self._encrypt_num
            ):
                obj = Stream(obj.dict, self._decrypt(num, gen, obj.raw))
        else:
            _, stm_num, idx = ent
            obj = self._from_objstm(stm_num, idx)
        self._cache[num] = obj
        return obj

    def _from_objstm(self, stm_num: int, idx: int):
        if stm_num not in self._objstm_cache:
            st = self.get(stm_num)
            if not isinstance(st, Stream):
                raise ValueError("PDF: ObjStm is not a stream")
            data = _stream_data(st, self.resolve)
            n = int(self.resolve(st.dict["N"]))
            first = int(self.resolve(st.dict["First"]))
            hp = _Parser(data, self)
            pairs = []
            for _ in range(n):
                onum = hp.parse()
                ooff = hp.parse()
                pairs.append((int(onum), int(ooff)))
            objs = []
            for onum, ooff in pairs:
                op = _Parser(data, self)
                op.pos = first + ooff
                objs.append(op.parse())
            self._objstm_cache[stm_num] = objs
        return self._objstm_cache[stm_num][idx]

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, Ref):
            obj = self.get(obj.num)
            seen += 1
            if seen > 32:
                raise ValueError("PDF: reference cycle")
        return obj

    # -- pages -------------------------------------------------------------
    _INHERIT = ("Resources", "MediaBox", "Rotate")

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []

        def walk(node_ref, inherited):
            node = self.resolve(node_ref)
            inh = dict(inherited)
            for k in self._INHERIT:
                if k in node:
                    inh[k] = node[k]
            t = str(node.get("Type", ""))
            if t == "Pages" or "Kids" in node:
                for kid in self.resolve(node["Kids"]):
                    walk(kid, inh)
            else:
                page = dict(node)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append(page)

        walk(root["Pages"], {})
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        if isinstance(c, list):
            return b"\n".join(_stream_data(self.resolve(s), self.resolve) for s in c)
        return _stream_data(c, self.resolve)


def parse_pdf(payload: bytes) -> _Document:
    buf = bytes(payload)
    if not buf.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError(f"not a PDF: header {buf[:8]!r}")
    return _Document(buf)


def pdf_page_count(payload: bytes) -> int:
    return len(parse_pdf(payload).pages())


# ------------------------------------------------------------ matrices

# matrices are (a, b, c, d, e, f): [x' y'] = [x y 1]·[[a b][c d][e f]]
_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _apply(m, x, y):
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


# ------------------------------------------------------------ rasterizer


class _GState:
    __slots__ = ("ctm", "fill", "stroke", "lw", "clip")

    def __init__(self, ctm, fill=0.0, stroke=0.0, lw=1.0, clip=None):
        self.ctm = ctm
        self.fill = fill
        self.stroke = stroke
        self.lw = lw
        self.clip = clip  # device-space (x0, y0, x1, y1) or None

    def copy(self):
        return _GState(self.ctm, self.fill, self.stroke, self.lw, self.clip)


_STD_GLYPH_NAMES = {
    "space": " ", "period": ".", "comma": ",", "hyphen": "-", "minus": "-",
    "percent": "%", "parenleft": "(", "parenright": ")", "slash": "/",
    "colon": ":",
}
for _c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _STD_GLYPH_NAMES[_c] = _c
for _d in "0123456789":
    _STD_GLYPH_NAMES[
        ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine"][int(_d)]
    ] = _d


def _glyph_name_to_char(name: str) -> str:
    if name.startswith("uni") and len(name) == 7:
        try:
            return chr(int(name[3:], 16))
        except ValueError:
            pass
    return _STD_GLYPH_NAMES.get(name, "�")


class _Font:
    """Resolved font resource.  Only Type 3 glyphs can be *painted*; other
    subtypes still support text extraction + advances via /Widths."""

    def __init__(self, doc: _Document, d: dict):
        r = doc.resolve
        self.subtype = str(r(d.get("Subtype", "")))
        self.matrix = tuple(float(r(x)) for x in r(d.get("FontMatrix", [0.001, 0, 0, 0.001, 0, 0])))
        self.first_char = int(r(d.get("FirstChar", 0)) or 0)
        widths = r(d.get("Widths"))
        self.widths = [float(r(w)) for w in widths] if widths else None
        self.char_procs = r(d.get("CharProcs")) or {}
        self.resources = r(d.get("Resources")) or {}
        enc = r(d.get("Encoding"))
        self.code_to_name: dict[int, str] = {}
        if isinstance(enc, dict):
            diffs = r(enc.get("Differences")) or []
            code = 0
            for item in diffs:
                item = r(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    self.code_to_name[code] = str(item)
                    code += 1

    def advance(self, code: int, size: float, tc: float, tw: float) -> float:
        w = 0.0
        if self.widths and 0 <= code - self.first_char < len(self.widths):
            w = self.widths[code - self.first_char]
        if self.subtype == "Type3":
            gw = w * self.matrix[0]  # glyph space → text space via FontMatrix
        else:
            gw = w / 1000.0
        adv = gw * size + tc
        if code == 32:
            adv += tw
        return adv


class _Raster:
    """Content-stream interpreter.  ``paint=False`` collects text runs only."""

    MAX_NEST = 12

    def __init__(self, doc: _Document, width: int, height: int, base_ctm,
                 paint: bool = True):
        self.doc = doc
        self.canvas = np.full((height, width), 255, dtype=np.uint8) if paint else None
        self.w, self.h = width, height
        self.paint = paint
        self.text_runs: list[tuple[float, float, str]] = []
        self.base_ctm = base_ctm
        self._font_cache: dict[int, _Font] = {}
        self._glyph_cache: dict[tuple, list] = {}
        # recording mode: fills/images append (op, …) here instead of
        # touching the canvas — used by the glyph cache to capture a glyph
        # program's device geometry once, then replay it translated
        self.record: list | None = None

    # -- painting primitives ----------------------------------------------
    def _gray_val(self, g: float) -> int:
        return int(round(max(0.0, min(1.0, g)) * 255))

    def _fill_polys(self, subpaths, gray, clip):
        """Even-odd scanline fill, sampling at pixel centers."""
        if self.record is not None:
            pts = [sp for sp in subpaths if len(sp) >= 3]
            if pts:
                self.record.append(("poly", pts, gray, clip))
            return
        if not self.paint:
            return
        pts_all = [sp for sp in subpaths if len(sp) >= 3]
        if not pts_all:
            return
        val = self._gray_val(gray)
        ys = [p[1] for sp in pts_all for p in sp]
        xs = [p[0] for sp in pts_all for p in sp]
        y_lo = max(0, int(np.floor(min(ys))))
        y_hi = min(self.h, int(np.ceil(max(ys))))
        x_lo_all = max(0, int(np.floor(min(xs))))
        x_hi_all = min(self.w, int(np.ceil(max(xs))))
        if clip is not None:
            cx0, cy0, cx1, cy1 = clip
            y_lo = max(y_lo, int(np.floor(cy0)))
            y_hi = min(y_hi, int(np.ceil(cy1)))
            x_lo_all = max(x_lo_all, int(np.floor(cx0)))
            x_hi_all = min(x_hi_all, int(np.ceil(cx1)))
        if y_lo >= y_hi or x_lo_all >= x_hi_all:
            return
        # fast path: a single axis-aligned rectangle (the overwhelmingly
        # common case for document geometry) — pure slicing, no scanline
        if len(pts_all) == 1 and len(pts_all[0]) in (4, 5):
            sp = pts_all[0][:4]
            xs4 = sorted(p[0] for p in sp)
            ys4 = sorted(p[1] for p in sp)
            if (
                abs(xs4[0] - xs4[1]) < 1e-9 and abs(xs4[2] - xs4[3]) < 1e-9
                and abs(ys4[0] - ys4[1]) < 1e-9 and abs(ys4[2] - ys4[3]) < 1e-9
            ):
                r0 = max(y_lo, int(np.ceil(ys4[0] - 0.5)))
                r1 = min(y_hi, int(np.ceil(ys4[2] - 0.5)))
                c0 = max(x_lo_all, int(np.ceil(xs4[0] - 0.5)))
                c1 = min(x_hi_all, int(np.ceil(xs4[2] - 0.5)))
                if r1 > r0 and c1 > c0:
                    self.canvas[r0:r1, c0:c1] = val
                return
        for row in range(y_lo, y_hi):
            yc = row + 0.5
            xs_cross = []
            for sp in pts_all:
                n = len(sp)
                for i in range(n):
                    x1, y1 = sp[i]
                    x2, y2 = sp[(i + 1) % n]
                    if (y1 <= yc < y2) or (y2 <= yc < y1):
                        xs_cross.append(x1 + (yc - y1) * (x2 - x1) / (y2 - y1))
            if not xs_cross:
                continue
            xs_cross.sort()
            for i in range(0, len(xs_cross) - 1, 2):
                c0 = max(x_lo_all, int(np.ceil(xs_cross[i] - 0.5)))
                c1 = min(x_hi_all, int(np.ceil(xs_cross[i + 1] - 0.5)))
                if c1 > c0:
                    self.canvas[row, c0:c1] = val

    def _stroke(self, subpaths, gray, lw_dev, clip):
        if not self.paint:
            return
        half = max(0.5, lw_dev / 2.0)
        for sp in subpaths:
            for i in range(len(sp) - 1):
                (x1, y1), (x2, y2) = sp[i], sp[i + 1]
                # squared-cap thick segment as a filled quad
                dx, dy = x2 - x1, y2 - y1
                ln = (dx * dx + dy * dy) ** 0.5
                if ln < 1e-9:
                    continue
                nx, ny = -dy / ln * half, dx / ln * half
                quad = [
                    (x1 + nx, y1 + ny), (x2 + nx, y2 + ny),
                    (x2 - nx, y2 - ny), (x1 - nx, y1 - ny),
                ]
                self._fill_polys([quad], gray, clip)

    # -- fonts -------------------------------------------------------------
    def _font(self, resources: dict, name: str) -> _Font:
        fonts = self.doc.resolve(resources.get("Font")) or {}
        ref = fonts.get(name)
        key = ref.num if isinstance(ref, Ref) else id(ref)
        if key not in self._font_cache:
            d = self.doc.resolve(ref)
            if d is None:
                raise ValueError(f"PDF: font {name!r} missing from /Resources")
            self._font_cache[key] = _Font(self.doc, d)
        return self._font_cache[key]

    # -- glyph geometry cache ------------------------------------------------
    GLYPH_CACHE = True  # class-level disable knob for the equality tests

    @staticmethod
    def _compile_fill(op):
        """Recorded op → replay form.  A clip-free single axis-aligned
        quad (the dominant glyph geometry) compiles to a ("rect", x0, y0,
        x1, y1, val) slice op; everything else replays through
        _fill_polys/_draw_image unchanged.  The qualification test is the
        same one _fill_polys' fast path applies."""
        if op[0] != "poly":
            return op
        _, subpaths, gray, clip = op
        if clip is not None or len(subpaths) != 1 or len(subpaths[0]) not in (4, 5):
            return op
        sp = subpaths[0][:4]
        xs4 = sorted(p[0] for p in sp)
        ys4 = sorted(p[1] for p in sp)
        if (
            abs(xs4[0] - xs4[1]) < 1e-9 and abs(xs4[2] - xs4[3]) < 1e-9
            and abs(ys4[0] - ys4[1]) < 1e-9 and abs(ys4[2] - ys4[3]) < 1e-9
        ):
            val = int(round(max(0.0, min(1.0, gray)) * 255))
            return ("rect", xs4[0], ys4[0], xs4[2], ys4[2], val)
        return op

    def _paint_glyph(self, font: "_Font", gname, proc, trm, resources, gs,
                     depth: int):
        """Rasterize one Type 3 glyph occurrence via a geometry cache.

        Text dominates document pages and the same few dozen glyphs repeat
        hundreds of times per page — re-interpreting the glyph's content
        program per occurrence made show_text ~87% of page wall (profiled).
        The program now runs ONCE per (font, glyph, ctm linear part,
        fill/stroke/lw) in recording mode — translation pinned to (0,0),
        fills/images captured as device geometry instead of pixels — and
        each occurrence replays the recorded fills translated by its (e,f).

        Pixel-exact vs the direct path: a replayed fill receives point
        coordinates computed as ``(a·x + c·y) + e`` — the same
        left-to-right summation ``_apply`` produces inline — so every
        scanline crossing and ``ceil(x−0.5)`` pixel decision is made on
        bit-identical floats (pinned by the cache-on/off equality test).
        Cache misses cost one parse of the glyph program with zero canvas
        work; hits skip the interpreter entirely.
        """
        r = self.doc.resolve
        ctm = _mat_mul(font.matrix, trm)
        res = font.resources or resources
        a, b, c, d, e, f = ctm
        if not self.GLYPH_CACHE or self.record is not None:
            # recording rasters take the direct path: a nested Type 3 glyph
            # (text inside a glyph program) must append its fills to the
            # outer recording as primitive polys, not replay compiled rect
            # ops onto the throwaway recording canvas
            g2 = gs.copy()
            g2.ctm = ctm
            self.run(_stream_data(proc, r), res, g2, depth + 1)
            return
        key = (
            id(font), gname, id(res),
            round(a, 9), round(b, 9), round(c, 9), round(d, 9),
            round(gs.fill, 6), round(gs.stroke, 6), round(gs.lw, 6),
        )
        ops = self._glyph_cache.get(key)
        if ops is None:
            data = _stream_data(proc, r)
            # cross-page level: the same font subset repeats across every
            # page (here: every page-payload), so key the recorded geometry
            # on the program BYTES, not object identity.  Programs that
            # reference /Resources are excluded: run() consults the
            # resource dict in exactly two ops — Do (XObjects) and Tf
            # (nested font selection) — and byte-identical programs can
            # resolve either name differently under another document's
            # resources.
            shareable = b"Do" not in data and b"Tf" not in data
            mkey = None
            if shareable:
                import hashlib

                mkey = (hashlib.md5(data).digest(), *key[3:])
                ops = _GLYPH_OPS_CACHE.get(mkey)
                if ops is not None:
                    _GLYPH_OPS_CACHE.move_to_end(mkey)
            if ops is None:
                rec = _Raster(self.doc, 1, 1, None, paint=True)
                rec.record = []
                g2 = gs.copy()
                g2.clip = None  # the outer clip is re-applied at replay time
                g2.ctm = (a, b, c, d, 0.0, 0.0)
                rec.run(data, res, g2, depth + 1)
                ops = [self._compile_fill(op) for op in rec.record]
                if mkey is not None:
                    _GLYPH_OPS_CACHE[mkey] = ops
                    if len(_GLYPH_OPS_CACHE) > _GLYPH_OPS_MAX:
                        _GLYPH_OPS_CACHE.popitem(last=False)
            self._glyph_cache[key] = ops
        h, w = self.h, self.w
        for op in ops:
            if op[0] == "rect":
                # pre-qualified axis-aligned fill: replicate _fill_polys'
                # fast path arithmetic on the translated coords (ceil(x−0.5)
                # pixel rule on the SAME float sums), pure slicing
                _, x0, y0, x1, y1, val = op
                r0 = max(0, _ceil(y0 + f - 0.5))
                r1 = min(h, _ceil(y1 + f - 0.5))
                c0 = max(0, _ceil(x0 + e - 0.5))
                c1 = min(w, _ceil(x1 + e - 0.5))
                if gs.clip is not None:
                    cx0, cy0, cx1, cy1 = gs.clip
                    r0 = max(r0, _floor(cy0))
                    r1 = min(r1, _ceil(cy1))
                    c0 = max(c0, _floor(cx0))
                    c1 = min(c1, _ceil(cx1))
                if r1 > r0 and c1 > c0:
                    self.canvas[r0:r1, c0:c1] = val
            elif op[0] == "poly":
                _, subpaths, gray, clip = op
                tsp = [[(x + e, y + f) for x, y in sp] for sp in subpaths]
                if clip is not None:
                    clip = (clip[0] + e, clip[1] + f, clip[2] + e, clip[3] + f)
                    if gs.clip is not None:
                        clip = (
                            max(clip[0], gs.clip[0]), max(clip[1], gs.clip[1]),
                            min(clip[2], gs.clip[2]), min(clip[3], gs.clip[3]),
                        )
                else:
                    clip = gs.clip
                self._fill_polys(tsp, gray, clip)
            else:  # image
                _, st, rel_ctm, fill = op
                g2 = gs.copy()
                g2.fill = fill
                g2.ctm = (rel_ctm[0], rel_ctm[1], rel_ctm[2], rel_ctm[3],
                          rel_ctm[4] + e, rel_ctm[5] + f)
                self._draw_image(st, g2)

    # -- images ------------------------------------------------------------
    def _draw_image(self, st: Stream, gs: _GState):
        if self.record is not None:
            self.record.append(("image", st, gs.ctm, gs.fill))
            return
        r = self.doc.resolve
        d = st.dict
        a, b, c, dd, e, f = gs.ctm
        if abs(b) > 1e-9 or abs(c) > 1e-9:
            raise NotImplementedError("PDF image with rotated/skewed placement")
        iw = int(r(d.get("Width")))
        ih = int(r(d.get("Height")))
        bpc = int(r(d.get("BitsPerComponent", 8)) or 8)
        mask = bool(r(d.get("ImageMask", False)))
        data, img_filter, img_parms = _stream_data(st, r, keep_image_codecs=True)
        if img_filter in ("DCTDecode", "DCT"):
            from .jpeg import decode_jpeg

            from .media import rgb_to_gray

            arr = rgb_to_gray(decode_jpeg(data))
        elif img_filter == "CCITTFaxDecode":
            from .ccitt import decode_ccitt

            p = img_parms or {}
            black = decode_ccitt(
                data,
                columns=int(r(p.get("Columns", 1728)) or 1728),
                rows=int(r(p.get("Rows", 0)) or ih),
                k=int(r(p.get("K", 0)) or 0),
                byte_align=bool(r(p.get("EncodedByteAlign", False))),
            )
            # CCITT 1 = black.  Decoded SAMPLE convention (ISO 32000-1
            # table 11): BlackIs1 false (default) → 0 bits are black.
            black_is_1 = bool(r(p.get("BlackIs1", False)))
            bits = black if black_is_1 else 1 - black
            if bits.shape[0] > ih:
                bits = bits[:ih]
            if bits.shape[1] > iw:
                bits = bits[:, :iw]
            if mask:
                arr = bits
            else:
                # 1-bit DeviceGray: sample 0 = black unless /Decode [1 0]
                dec = r(d.get("Decode"))
                if dec is not None and float(r(dec[0])) == 1:
                    bits = 1 - bits
                arr = (bits * 255).astype(np.uint8)
        elif img_filter == "JBIG2Decode":
            from .jbig2 import decode_jbig2_embedded

            p = img_parms or {}
            glb = r(p.get("JBIG2Globals"))
            glob_data = b""
            if glb is not None:
                if not isinstance(glb, Stream):
                    raise ValueError("PDF: /JBIG2Globals is not a stream")
                glob_data = _stream_data(glb, r)
            black = decode_jbig2_embedded(data, glob_data)  # 1 = black ink
            # JBIG2 1-bits are black (ISO 32000-1 §7.4.7); as 1-bit
            # DeviceGray samples, 0 = black — same mapping as CCITT
            # BlackIs1=true.  Crop/pad the page bitmap to /Width x /Height
            # (a striped page may decode taller; pad is white = sample 1).
            bits = 1 - black
            if bits.shape[0] > ih:
                bits = bits[:ih]
            if bits.shape[1] > iw:
                bits = bits[:, :iw]
            if bits.shape != (ih, iw):
                padded = np.ones((ih, iw), dtype=bits.dtype)
                padded[: bits.shape[0], : bits.shape[1]] = bits
                bits = padded
            if mask:
                arr = bits
            else:
                dec = r(d.get("Decode"))
                if dec is not None and float(r(dec[0])) == 1:
                    bits = 1 - bits
                arr = (bits * 255).astype(np.uint8)
        elif img_filter == "JPXDecode":
            from .jp2 import decode_jp2_gray8

            if mask:  # ImageMask requires 1 bpc; JPX is excluded (§8.9.6.2)
                raise ValueError("PDF: /ImageMask with JPXDecode")
            arr = decode_jp2_gray8(data)
        elif img_filter is not None:
            raise NotImplementedError(f"PDF image filter {img_filter}")
        else:
            cs = r(d.get("ColorSpace"))
            cs_name = str(cs) if cs is not None else "DeviceGray"
            if bpc == 1:
                bits = np.unpackbits(
                    np.frombuffer(data, dtype=np.uint8).reshape(ih, -1), axis=1
                )[:, :iw]
                arr = (bits * 255).astype(np.uint8) if not mask else bits
            elif bpc == 8:
                flat = np.frombuffer(data, dtype=np.uint8)
                if cs_name == "DeviceRGB":
                    from .media import rgb_to_gray

                    arr = rgb_to_gray(flat[: iw * ih * 3].reshape(ih, iw, 3))
                elif cs_name in ("DeviceGray", "CalGray"):
                    arr = flat[: iw * ih].reshape(ih, iw)
                else:
                    raise NotImplementedError(f"PDF image colorspace {cs_name}")
            else:
                raise NotImplementedError(f"PDF image BitsPerComponent {bpc}")
        # unit square → device rect
        x0, y0 = _apply(gs.ctm, 0, 0)
        x1, y1 = _apply(gs.ctm, 1, 1)
        dx0, dx1 = sorted((x0, x1))
        dy0, dy1 = sorted((y0, y1))
        c0, c1 = max(0, int(round(dx0))), min(self.w, int(round(dx1)))
        r0, r1 = max(0, int(round(dy0))), min(self.h, int(round(dy1)))
        if c1 <= c0 or r1 <= r0 or not self.paint:
            return
        # nearest-neighbor resample; image row 0 is the TOP of the unit square
        rows = np.clip(
            ((np.arange(r0, r1) + 0.5 - dy0) / max(1e-9, dy1 - dy0) * ih).astype(int),
            0, ih - 1,
        )
        cols = np.clip(
            ((np.arange(c0, c1) + 0.5 - dx0) / max(1e-9, dx1 - dx0) * iw).astype(int),
            0, iw - 1,
        )
        if dd > 0:  # positive d flips image vertically in device space
            rows = rows[::-1]
        sub = arr[np.ix_(rows, cols)]
        if mask:
            # ISO 32000-1 §8.9.6.2: default /Decode for an image mask is
            # [0 1] (sample 0 paints); an EXPLICIT [0 1] must behave the
            # same — only [1 0] inverts.  Truthiness of the array is wrong.
            dec = r(d.get("Decode"))
            inverted = bool(dec) and float(r(dec[0])) == 1
            ink = sub == (1 if inverted else 0)
            self.canvas[r0:r1, c0:c1][ink] = self._gray_val(gs.fill)
        else:
            self.canvas[r0:r1, c0:c1] = sub

    # -- interpreter -------------------------------------------------------
    def run(self, content: bytes, resources: dict, gs: _GState, depth: int = 0):
        if depth > self.MAX_NEST:
            raise ValueError("PDF: content nesting too deep")
        r = self.doc.resolve
        resources = r(resources) or {}
        p = _Parser(content, self.doc)
        stack: list = []
        gstack: list[_GState] = []
        path: list[list] = []
        cur: list = []
        start_pt = None
        pending_clip = False
        # text state
        tm = tlm = _ID
        font: _Font | None = None
        fsize = 1.0
        tc = tw = 0.0
        tl = 0.0
        in_text = False

        def flush_path():
            nonlocal path, cur, start_pt, pending_clip
            path, cur, start_pt = [], [], None

        def close_cur():
            nonlocal cur
            if cur:
                path.append(cur)
                cur = []

        def do_clip():
            nonlocal pending_clip
            if pending_clip:
                pts = [pt for sp in path + ([cur] if cur else []) for pt in sp]
                if pts:
                    xs = [q[0] for q in pts]
                    ys = [q[1] for q in pts]
                    box = (min(xs), min(ys), max(xs), max(ys))
                    if gs.clip is None:
                        gs.clip = box
                    else:
                        gs.clip = (
                            max(gs.clip[0], box[0]), max(gs.clip[1], box[1]),
                            min(gs.clip[2], box[2]), min(gs.clip[3], box[3]),
                        )
                pending_clip = False

        def show_text(sb: bytes):
            nonlocal tm
            if font is None:
                raise ValueError("PDF: Tj before Tf")
            run_origin = _apply(_mat_mul(tm, gs.ctm), 0, 0)
            chars = []
            for code in sb:
                gname = font.code_to_name.get(code)
                ch = _glyph_name_to_char(gname) if gname else chr(code)
                chars.append(ch if ch != "�" else "?")
                if self.paint and code != 32:
                    if font.subtype != "Type3":
                        raise NotImplementedError(
                            f"PDF {font.subtype or 'embedded-outline'} font "
                            "rasterization needs a renderer library "
                            "(pypdfium2) — only Type 3 glyph programs render "
                            "natively"
                        )
                    proc = None
                    if gname is not None:
                        proc = r(font.char_procs.get(gname))
                    if proc is not None:
                        trm = _mat_mul(
                            (fsize, 0.0, 0.0, fsize, 0.0, 0.0),
                            _mat_mul(tm, gs.ctm),
                        )
                        self._paint_glyph(
                            font, gname, proc, trm, resources, gs, depth
                        )
                adv = font.advance(code, fsize, tc, tw)
                tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)
            if chars:
                self.text_runs.append((run_origin[0], run_origin[1], "".join(chars)))

        while True:
            p.skip_ws()
            if p.pos >= len(p.buf):
                break
            b = p.buf[p.pos]
            if b == 0x2F or b == 0x28 or b == 0x3C or b == 0x5B or b in b"+-.0123456789":
                stack.append(p.parse())
                continue
            op = p._keyword()
            if not op:
                p.pos += 1
                continue
            try:
                if op == "q":
                    gstack.append(gs.copy())
                elif op == "Q":
                    if gstack:
                        gs = gstack.pop()
                elif op == "cm":
                    m = tuple(float(x) for x in stack[-6:])
                    gs.ctm = _mat_mul(m, gs.ctm)
                elif op == "w":
                    gs.lw = float(stack[-1])
                elif op in ("g", "G"):
                    v = float(stack[-1])
                    (setattr(gs, "fill", v) if op == "g" else setattr(gs, "stroke", v))
                elif op in ("rg", "RG"):
                    rr, gg, bb = (float(x) for x in stack[-3:])
                    v = 0.299 * rr + 0.587 * gg + 0.114 * bb
                    (setattr(gs, "fill", v) if op == "rg" else setattr(gs, "stroke", v))
                elif op in ("k", "K"):
                    cc, mm, yy, kk = (float(x) for x in stack[-4:])
                    v = (1 - min(1, cc + kk))  # crude luma
                    (setattr(gs, "fill", v) if op == "k" else setattr(gs, "stroke", v))
                elif op in ("cs", "CS", "sc", "SC", "scn", "SCN", "gs", "ri", "i", "j",
                            "J", "M", "d"):
                    pass  # color-space/ext-state details beyond gray: ignored
                elif op == "m":
                    close_cur()
                    x, y = float(stack[-2]), float(stack[-1])
                    start_pt = _apply(gs.ctm, x, y)
                    cur = [start_pt]
                elif op == "l":
                    x, y = float(stack[-2]), float(stack[-1])
                    cur.append(_apply(gs.ctm, x, y))
                elif op in ("c", "v", "y"):
                    if not cur:
                        raise ValueError("PDF: curve without current point")
                    x0d, y0d = cur[-1]
                    if op == "c":
                        pts = [float(v) for v in stack[-6:]]
                        p1 = _apply(gs.ctm, pts[0], pts[1])
                        p2 = _apply(gs.ctm, pts[2], pts[3])
                        p3 = _apply(gs.ctm, pts[4], pts[5])
                    elif op == "v":
                        pts = [float(v) for v in stack[-4:]]
                        p1 = (x0d, y0d)
                        p2 = _apply(gs.ctm, pts[0], pts[1])
                        p3 = _apply(gs.ctm, pts[2], pts[3])
                    else:
                        pts = [float(v) for v in stack[-4:]]
                        p1 = _apply(gs.ctm, pts[0], pts[1])
                        p3 = _apply(gs.ctm, pts[2], pts[3])
                        p2 = p3
                    for t in np.linspace(0.0, 1.0, 17)[1:]:
                        mt = 1 - t
                        bx = (mt**3) * x0d + 3 * mt * mt * t * p1[0] + 3 * mt * t * t * p2[0] + (t**3) * p3[0]
                        by = (mt**3) * y0d + 3 * mt * mt * t * p1[1] + 3 * mt * t * t * p2[1] + (t**3) * p3[1]
                        cur.append((bx, by))
                elif op == "h":
                    if cur and start_pt:
                        cur.append(start_pt)
                elif op == "re":
                    close_cur()
                    x, y, rw, rh = (float(v) for v in stack[-4:])
                    quad = [
                        _apply(gs.ctm, x, y), _apply(gs.ctm, x + rw, y),
                        _apply(gs.ctm, x + rw, y + rh), _apply(gs.ctm, x, y + rh),
                    ]
                    path.append(quad)
                elif op in ("f", "F", "f*", "b", "b*", "B", "B*"):
                    close_cur()
                    do_clip()
                    self._fill_polys(path, gs.fill, gs.clip)
                    if op in ("b", "b*", "B", "B*"):
                        sc = abs(gs.ctm[0]) or 1.0
                        self._stroke(path, gs.stroke, gs.lw * sc, gs.clip)
                    flush_path()
                elif op in ("S", "s"):
                    if op == "s" and cur and start_pt:
                        cur.append(start_pt)
                    close_cur()
                    do_clip()
                    sc = abs(gs.ctm[0]) or 1.0
                    self._stroke(path, gs.stroke, gs.lw * sc, gs.clip)
                    flush_path()
                elif op == "n":
                    close_cur()
                    do_clip()
                    flush_path()
                elif op in ("W", "W*"):
                    pending_clip = True
                elif op == "BT":
                    in_text = True
                    tm = tlm = _ID
                elif op == "ET":
                    in_text = False
                elif op == "Tf":
                    fsize = float(stack[-1])
                    font = self._font(resources, str(stack[-2]))
                elif op == "Td":
                    tlm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), tlm)
                    tm = tlm
                elif op == "TD":
                    tl = -float(stack[-1])
                    tlm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), tlm)
                    tm = tlm
                elif op == "Tm":
                    tm = tlm = tuple(float(x) for x in stack[-6:])
                elif op == "T*":
                    tlm = _mat_mul((1, 0, 0, 1, 0, -tl), tlm)
                    tm = tlm
                elif op == "TL":
                    tl = float(stack[-1])
                elif op == "Tc":
                    tc = float(stack[-1])
                elif op == "Tw":
                    tw = float(stack[-1])
                elif op in ("Tz", "Ts", "Tr"):
                    pass  # h-scale/rise/render-mode: not needed for subset
                elif op == "Tj":
                    show_text(stack[-1])
                elif op == "'":
                    tlm = _mat_mul((1, 0, 0, 1, 0, -tl), tlm)
                    tm = tlm
                    show_text(stack[-1])
                elif op == '"':
                    tw = float(stack[-3])
                    tc = float(stack[-2])
                    tlm = _mat_mul((1, 0, 0, 1, 0, -tl), tlm)
                    tm = tlm
                    show_text(stack[-1])
                elif op == "TJ":
                    for item in stack[-1]:
                        if isinstance(item, bytes):
                            show_text(item)
                        else:
                            tm = _mat_mul(
                                (1, 0, 0, 1, -float(item) / 1000.0 * fsize, 0), tm
                            )
                elif op == "Do":
                    name = str(stack[-1])
                    xobjs = r(resources.get("XObject")) or {}
                    xo = r(xobjs.get(name))
                    if xo is None:
                        raise ValueError(f"PDF: XObject {name!r} missing")
                    sub = str(r(xo.dict.get("Subtype", "")))
                    if sub == "Image":
                        self._draw_image(xo, gs)
                    elif sub == "Form":
                        g2 = gs.copy()
                        mtx = r(xo.dict.get("Matrix"))
                        if mtx:
                            g2.ctm = _mat_mul(
                                tuple(float(r(v)) for v in mtx), g2.ctm
                            )
                        self.run(
                            _stream_data(xo, r),
                            r(xo.dict.get("Resources")) or resources,
                            g2,
                            depth + 1,
                        )
                    else:
                        raise NotImplementedError(f"PDF XObject subtype {sub}")
                elif op in ("d0", "d1"):
                    pass  # Type3 glyph metrics: widths come from /Widths
                elif op == "BI":
                    raise NotImplementedError("PDF inline image (BI/ID/EI)")
                elif op in ("BMC", "BDC", "EMC", "MP", "DP", "BX", "EX", "sh"):
                    if op == "sh":
                        raise NotImplementedError("PDF shading pattern (sh)")
                    # marked content: no geometry
                else:
                    raise ValueError(f"PDF: unknown content operator {op!r}")
            finally:
                if op not in ("q", "Q"):
                    stack.clear()
        _ = in_text  # (text object state is self-contained)


def _page_raster_setup(doc: _Document, page: dict, dpi: float):
    r = doc.resolve
    mb = [float(r(v)) for v in r(page.get("MediaBox", [0, 0, 612, 792]))]
    x0, y0, x1, y1 = mb
    s = dpi / 72.0
    w = max(1, int(round((x1 - x0) * s)))
    h = max(1, int(round((y1 - y0) * s)))
    # user space → device: scale, y-flip, origin at MediaBox corner
    base = (s, 0.0, 0.0, -s, -x0 * s, y1 * s)
    return w, h, base


def rasterize_pdf_pages(payload: bytes, dpi: float = 72.0) -> list[np.ndarray]:
    """All pages → uint8 grayscale arrays at ``dpi`` (72 = 1 pt per px).

    Mirrors the reference's ``preprocessing.bytes_file_to_array`` contract
    (``preprocessing.py:10-28``): bytes in, one array per page out — but
    needs no Poppler for the vector/Type3/image subset.
    """
    doc = parse_pdf(payload)
    out = []
    for page in doc.pages():
        w, h, base = _page_raster_setup(doc, page, dpi)
        ras = _Raster(doc, w, h, base)
        gs = _GState(base)
        ras.run(doc.page_content(page), doc.resolve(page.get("Resources")) or {}, gs)
        out.append(ras.canvas)
    return out


def iter_pdf_pages(payload: bytes, dpi: float = 72.0):
    """Lazily yield (page_index, n_pages, uint8 gray page) — one parsed
    document, one rasterized page live at a time (a 500-page scan never
    materializes all canvases, unlike :func:`rasterize_pdf_pages`)."""
    doc = parse_pdf(payload)
    pages = doc.pages()
    for i, page in enumerate(pages):
        w, h, base = _page_raster_setup(doc, page, dpi)
        ras = _Raster(doc, w, h, base)
        gs = _GState(base)
        ras.run(doc.page_content(page), doc.resolve(page.get("Resources")) or {}, gs)
        yield i, len(pages), ras.canvas


def rasterize_pdf_page(payload: bytes, page_index: int = 0, dpi: float = 72.0) -> np.ndarray:
    doc = parse_pdf(payload)
    pages = doc.pages()
    if not (0 <= page_index < len(pages)):
        raise ValueError(f"page_index {page_index} out of range ({len(pages)} pages)")
    page = pages[page_index]
    w, h, base = _page_raster_setup(doc, page, dpi)
    ras = _Raster(doc, w, h, base)
    gs = _GState(base)
    ras.run(doc.page_content(page), doc.resolve(page.get("Resources")) or {}, gs)
    return ras.canvas


def extract_text(payload: bytes) -> list[list[tuple[float, float, str]]]:
    """Per-page ``(device_x, device_y, text)`` show-text runs, no painting.

    The born-digital fast path: when a PDF has a text layer, spans can come
    straight from here instead of the raster → OCR lane."""
    doc = parse_pdf(payload)
    out = []
    for page in doc.pages():
        w, h, base = _page_raster_setup(doc, page, 72.0)
        ras = _Raster(doc, w, h, base, paint=False)
        gs = _GState(base)
        ras.run(doc.page_content(page), doc.resolve(page.get("Resources")) or {}, gs)
        out.append(ras.text_runs)
    return out


# ------------------------------------------------------------ writer


def _esc_string(bs: bytes) -> bytes:
    out = bytearray(b"(")
    for c in bs:
        if c in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([c])
        elif 32 <= c < 127:
            out.append(c)
        else:
            out += ("\\%03o" % c).encode()
    out += b")"
    return bytes(out)


def _ser_obj(o, remap: dict[int, int]) -> bytes:
    """Serialize one (non-stream) PDF object for the encrypt_pdf rewriter.
    ``str`` serializes as a Name (fixture-internal convention), ``bytes``
    as a literal string; Refs renumber through ``remap`` (a dangling ref
    becomes null)."""
    if isinstance(o, Ref):
        new = remap.get(o.num)
        return b"null" if new is None else b"%d 0 R" % new
    if isinstance(o, bool):
        return b"true" if o else b"false"
    if o is None:
        return b"null"
    if isinstance(o, int):
        return b"%d" % o
    if isinstance(o, float):
        return repr(o).encode()
    if isinstance(o, str):  # Name (includes the Name subclass)
        return b"/" + o.encode()
    if isinstance(o, bytes):
        return _esc_string(o)
    if isinstance(o, list):
        return b"[ " + b" ".join(_ser_obj(x, remap) for x in o) + b" ]"
    if isinstance(o, dict):
        inner = b" ".join(
            b"/%s %s" % (k.encode(), _ser_obj(v, remap)) for k, v in o.items()
        )
        return b"<< " + inner + b" >>"
    raise ValueError(f"cannot serialize {type(o).__name__}")


def encrypt_pdf(payload: bytes, method: str = "aes-128") -> bytes:
    """Rewrite an (unencrypted) fixture PDF as a standard-security-handler
    encrypted document with an EMPTY user password — the permissions-only
    shape scan archives ship.  ``method``: 'rc4-40' | 'rc4-128' |
    'aes-128' | 'aes-256'.  Object streams are flattened (their members
    re-emit as top-level objects); stream bytes encrypt as stored
    (post-filter), per spec."""
    from .pdfcrypto import make_encryptor

    doc = parse_pdf(bytes(payload))
    if doc._decrypt is not None:
        raise ValueError("encrypt_pdf input is already encrypted")
    id0 = b"\x8bfixture-doc-id\x8b"[:16].ljust(16, b"\x00")
    enc_d, encf = make_encryptor(method, id0=id0)
    live = []
    for num in sorted(doc.xref):
        try:
            obj = doc.get(num)
        except ValueError:
            continue
        if isinstance(obj, Stream):
            t = str(obj.dict.get("Type", ""))
            if t in ("ObjStm", "XRef"):
                continue  # flattened / rebuilt below
        live.append((num, obj))
    remap = {num: i + 1 for i, (num, _o) in enumerate(live)}
    enc_num = len(live) + 1
    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for num, obj in live:
        offsets.append(len(out))
        if isinstance(obj, Stream):
            data = encf(remap[num], 0, obj.raw)
            d = dict(obj.dict)
            d["Length"] = len(data)
            body = (
                _ser_obj(d, remap) + b"\nstream\n" + data + b"\nendstream"
            )
        else:
            body = _ser_obj(obj, remap)
        out += b"%d 0 obj\n" % remap[num] + body + b"\nendobj\n"
    offsets.append(len(out))
    out += b"%d 0 obj\n" % enc_num + _ser_obj(enc_d, remap) + b"\nendobj\n"
    root = doc.trailer.get("Root")
    if not isinstance(root, Ref) or root.num not in remap:
        raise ValueError("fixture PDF has no serializable /Root")
    xref_pos = len(out)
    n = enc_num + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    trailer = (
        b"trailer\n<< /Size %d /Root %d 0 R /Encrypt %d 0 R "
        b"/ID [ %s %s ] >>\nstartxref\n%d\n%%%%EOF\n"
        % (
            n, remap[root.num], enc_num,
            _esc_string(id0), _esc_string(id0), xref_pos,
        )
    )
    out += trailer
    return bytes(out)


class _Builder:
    """Minimal incremental PDF writer with a classic xref table."""

    def __init__(self):
        self.objs: list[bytes] = []  # 1-based object bodies

    def add(self, body: bytes) -> int:
        self.objs.append(body)
        return len(self.objs)

    def add_stream(self, d: dict[str, bytes], data: bytes, compress: bool = True) -> int:
        if compress:
            data = zlib.compress(data, 6)
            d = dict(d)
            d["Filter"] = b"/FlateDecode"
        d["Length"] = str(len(data)).encode()
        head = b"<< " + b" ".join(b"/%s %s" % (k.encode(), v) for k, v in d.items()) + b" >>"
        return self.add(head + b"\nstream\n" + data + b"\nendstream")

    def finish(self, root_num: int) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(self.objs, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
        xref_pos = len(out)
        n = len(self.objs) + 1
        out += b"xref\n0 %d\n" % n
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n, root_num, xref_pos)
        )
        return bytes(out)


def _runs(bits_row: np.ndarray) -> list[tuple[int, int]]:
    """[start, length) runs of True in a 1-D bool array."""
    idx = np.flatnonzero(np.diff(np.concatenate(([0], bits_row.view(np.int8), [0]))))
    return [(int(idx[i]), int(idx[i + 1] - idx[i])) for i in range(0, len(idx), 2)]


def _type3_font_obj(builder: _Builder, chars: set[str]) -> tuple[int, dict[str, int]]:
    """Build a Type 3 font whose CharProcs draw the fixture 5×7 glyph
    bitmaps (``font.GLYPHS``) as unit-pixel rect runs.  FontMatrix is
    identity so one glyph unit = one page unit (= one pixel at 72 dpi).
    Returns (font object number, char → byte-code map)."""
    from .font import ADVANCE, GLYPH_H, GLYPHS

    chars = sorted(c for c in chars if c != " ")
    if len(chars) > 222:
        raise ValueError("Type3 encoding overflow: >222 distinct characters")
    code_of = {" ": 32}
    proc_refs = {}
    names = {}
    for i, ch in enumerate(chars):
        code_of[ch] = 33 + i
        names[ch] = "uni%04X" % ord(ch)
    # space: empty glyph
    sp_ref = builder.add_stream({}, b"%d 0 d0" % ADVANCE, compress=False)
    proc_refs[" "] = sp_ref
    for ch in chars:
        g = GLYPHS[ch]
        ops = [b"%d 0 d0" % ADVANCE]
        for gy in range(GLYPH_H):
            y_up = GLYPH_H - 1 - gy
            for x0, ln in _runs(g[gy]):
                ops.append(b"%d %d %d 1 re f" % (x0, y_up, ln))
        proc_refs[ch] = builder.add_stream({}, b"\n".join(ops), compress=False)
    cp = b"<< " + b" ".join(
        b"/%s %d 0 R" % ((b"space" if ch == " " else names[ch].encode()), ref)
        for ch, ref in proc_refs.items()
    ) + b" >>"
    diffs = [b"32 /space"]
    if chars:
        diffs.append(b"33 " + b" ".join(b"/" + names[c].encode() for c in chars))
    widths = b" ".join(b"%d" % ADVANCE for _ in range(32, 33 + len(chars)))
    font = (
        b"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 6 7] "
        b"/FontMatrix [1 0 0 1 0 0] /CharProcs " + cp +
        b" /Encoding << /Type /Encoding /Differences [" + b" ".join(diffs) + b"] >>"
        b" /FirstChar 32 /LastChar %d /Widths [" % (32 + len(chars)) + widths + b"] >>"
    )
    return builder.add(font), code_of


def _page_content_ops(rects, texts, page_h: int, code_of) -> bytes:
    """Canvas-coordinate primitives → content stream (y-flip to PDF space).

    ``rects``: (x, y, w, h) ink boxes in canvas coords (row y down).
    ``texts``: (x, y, s) top-left text anchors, fixture-font glyphs."""
    from .font import GLYPH_H

    ops = [b"0 g"]
    for (x, y, w, h) in rects:
        # canvas rows [y, y+h) → PDF rect with origin at bottom-left
        ops.append(b"%d %d %d %d re f" % (x, page_h - y - h, w, h))
    for (x, y, s) in texts:
        if not s:
            continue
        enc = bytes(code_of[c] for c in s)
        ops.append(
            b"BT /F1 1 Tf 1 0 0 1 %d %d Tm %s Tj ET"
            % (x, page_h - y - GLYPH_H, _esc_string(enc))
        )
    return b"\n".join(ops)


def build_pdf(pages: list[dict], page_w: int, page_h: int) -> bytes:
    """Vector PDF from per-page primitive dicts ``{"rects": [...],
    "texts": [...]}`` in canvas (pixel) coordinates.  At 72 dpi the
    rasterization reproduces the canvas bit-exactly (integer geometry,
    identity-scale Type 3 glyphs) — pinned by tests against
    ``fixtures.generate.render_page``."""
    b = _Builder()
    chars: set[str] = set()
    for pg in pages:
        for (_, _, s) in pg["texts"]:
            chars.update(s)
    font_num, code_of = _type3_font_obj(b, chars)
    kid_nums = []
    content_nums = []
    for pg in pages:
        content_nums.append(
            b.add_stream({}, _page_content_ops(pg["rects"], pg["texts"], page_h, code_of))
        )
    pages_num_placeholder = None
    for cn in content_nums:
        kid_nums.append(
            b.add(
                b"<< /Type /Page /Parent PAGES 0 R /MediaBox [0 0 %d %d] "
                b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
                % (page_w, page_h, font_num, cn)
            )
        )
    pages_num = b.add(
        b"<< /Type /Pages /Kids [" + b" ".join(b"%d 0 R" % k for k in kid_nums) +
        b"] /Count %d >>" % len(kid_nums)
    )
    # patch the /Parent placeholder now that the Pages number is known
    for k in kid_nums:
        b.objs[k - 1] = b.objs[k - 1].replace(b"PAGES 0 R", b"%d 0 R" % pages_num)
    root = b.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)
    _ = pages_num_placeholder
    return b.finish(root)


def build_page_pdf(rects, texts, page_w: int, page_h: int) -> bytes:
    """Single-page convenience wrapper over :func:`build_pdf`."""
    return build_pdf([{"rects": rects, "texts": texts}], page_w, page_h)


def build_scanned_pdf(imgs: list[np.ndarray], codec: str = "ccitt") -> bytes:
    """uint8 H×W gray pages → the SCANNED-document PDF shape: each page's
    content is a single full-page 1-bit image XObject — how real
    scanner/archive pipelines (and the reference's steel-standard corpus
    ``data/1.pdf…7.pdf``, which are multi-page scans) store pages.
    ``codec`` picks the archive encoding: ``"ccitt"`` (G4, the dominant
    one), ``"jbig2"`` (arithmetic generic region with TPGDON),
    ``"jbig2sym"`` (symbol/text mode with EVERY page's dictionary in ONE
    shared ``/JBIG2Globals`` stream — the multi-page arrangement that
    stream exists for), or ``"jpx"`` (8-bit gray reversible-5/3 JPEG
    2000 via ``/JPXDecode`` — the one non-1-bit slot).  For the 1-bit
    codecs, ink = pixels ≤ the kernel's binarization threshold; jpx is
    lossless on the raw gray page — either way, for the binary {0,255}
    fixture pages the rasterized result is pixel-exact to the raster
    codecs and span equality is preserved end-to-end."""
    from .kernel.binarize import THRESHOLD

    b = _Builder()
    if codec != "jpx":  # the 1-bit codecs encode the ink mask
        page_bits = [np.asarray(img) <= THRESHOLD for img in imgs]
    glob_num = None
    page_payloads: list[tuple[bytes, dict]] = []
    if codec == "ccitt":
        from .ccitt import encode_ccitt_g4

        for img, bits in zip(imgs, page_bits):
            ih, iw = img.shape
            page_payloads.append((
                encode_ccitt_g4(bits),
                {
                    "Filter": b"/CCITTFaxDecode",
                    "DecodeParms": b"<< /K -1 /Columns %d /Rows %d >>"
                    % (iw, ih),
                },
            ))
    elif codec == "jbig2":
        from .jbig2 import encode_jbig2_generic

        for bits in page_bits:
            page_payloads.append((
                encode_jbig2_generic(bits.astype(np.uint8), template=0,
                                     tpgdon=True),
                {"Filter": b"/JBIG2Decode"},
            ))
    elif codec == "jbig2sym":
        # the jbig2enc scanner shape: all pages' symbol dictionaries in a
        # shared /JBIG2Globals stream, each page's text region in its own
        # image stream referencing its dictionary by segment number
        from .jbig2 import encode_jbig2_symbol_page

        globs = []
        for k, bits in enumerate(page_bits):
            data, glob = encode_jbig2_symbol_page(
                bits.astype(np.uint8), split_globals=True,
                seg_base=1 + 10 * k,
            )
            globs.append(glob)
            page_payloads.append((data, {"Filter": b"/JBIG2Decode"}))
        glob_num = b.add_stream({}, b"".join(globs), compress=False)
        for _data, sd in page_payloads:
            sd["DecodeParms"] = b"<< /JBIG2Globals %d 0 R >>" % glob_num
    elif codec == "jpx":
        # the JPEG 2000 scanner shape: an 8-bit gray reversible-5/3 JPX
        # codestream per page (lossless, so the downstream binarization
        # reproduces the ink mask pixel-exactly).  Per ISO 32000-1 §7.4.9
        # the codestream's own depth/colorspace take precedence, but the
        # dict still carries the honest BitsPerComponent 8.
        from .jp2 import encode_jp2_gray

        for img in imgs:
            page_payloads.append((
                encode_jp2_gray(np.asarray(img, dtype=np.uint8), levels=5),
                {"Filter": b"/JPXDecode", "BitsPerComponent": b"8"},
            ))
    else:
        raise ValueError(f"build_scanned_pdf: unknown codec {codec!r}")
    kid_nums = []
    for img, (data, stream_dict) in zip(imgs, page_payloads):
        ih, iw = img.shape
        im_num = b.add_stream(
            {
                "Subtype": b"/Image",
                "Width": b"%d" % iw,
                "Height": b"%d" % ih,
                "BitsPerComponent": b"1",
                "ColorSpace": b"/DeviceGray",
                **stream_dict,
            },
            data,
            compress=False,
        )
        content_num = b.add_stream(
            {}, b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (iw, ih)
        )
        kid_nums.append(b.add(
            b"<< /Type /Page /Parent PAGES 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /XObject << /Im0 %d 0 R >> >> /Contents %d 0 R >>"
            % (iw, ih, im_num, content_num)
        ))
    pages_num = b.add(
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % k for k in kid_nums)
        + b"] /Count %d >>" % len(kid_nums)
    )
    for k in kid_nums:
        b.objs[k - 1] = b.objs[k - 1].replace(
            b"PAGES 0 R", b"%d 0 R" % pages_num
        )
    root = b.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)
    return b.finish(root)


def build_scanned_page_pdf(img: np.ndarray, codec: str = "ccitt") -> bytes:
    """Single-page convenience wrapper over :func:`build_scanned_pdf`."""
    return build_scanned_pdf([img], codec=codec)
