"""From-scratch WARC reader/writer — the container web crawls actually ship
(ISO 28500 / WARC 1.1; Common Crawl layout).  No warcio or other library:
stdlib ``zlib`` + bytes parsing, same no-library standard as png/jpeg/pdfx.

Format (published spec):
- A WARC file is a concatenation of records::

      WARC/1.1\\r\\n
      Header-Name: value\\r\\n ...
      \\r\\n
      <Content-Length bytes of content block>
      \\r\\n\\r\\n

- ``WARC-Type: response`` records carry a full HTTP response (status line,
  headers, body) as their content block; ``WARC-Target-URI`` is the URL.
- Common Crawl compresses each record as its OWN gzip member and
  concatenates the members (``.warc.gz``) — so a reader that walks member
  boundaries gets record-level random access, which is exactly what makes
  the format splittable at 100 TB: a task can own a byte range and start at
  the first member boundary past its range start.
- The IIPC warc-zstd layout (``.warc.zst``) concatenates standard zstd
  frames the same way; frame boundaries are computed from RFC 8878
  headers alone (no decompression), so the byte-range ownership rule is
  identical.  Decompression uses pyarrow's bundled zstd; dictionaried
  archives refuse loudly per frame.

Scale shape: WARC files are the INPUT layout; ``warc_to_docs`` runs one
Arrow-batched ``mapInPandas`` over (path, payload) rows — per-file work,
per-record error capture (a malformed record yields an error row, never a
task failure), zero shuffles.  Downstream the rows join the normal html /
media pipeline.

Hostile-input bounds: every length field is clamped to the enclosing
buffer, offsets strictly advance, and the tolerant walks resync after a
corrupt gzip member (next member magic) or malformed record (next WARC
version line) so one bad record costs one error row, never the rest of the
file — same discipline as avi.py.
"""

from __future__ import annotations

import zlib

_MAX_HEADER = 64 * 1024        # a WARC/HTTP header block beyond 64 KiB is hostile
_MAX_MEMBERS = 1_000_000       # gzip members per file (backstop, not a limit)


# --- gzip member walk (Common Crawl layout: one record per member) ---

_INFLATE_CHUNK = 1 << 18  # 256 KB compressed bytes fed per decompress call


def _inflate_member(mv, pos: int) -> tuple[bytes, int]:
    """One gzip member starting at ``pos`` of a bytes/memoryview →
    (decoded bytes, end offset).  Feeds the decompressor BOUNDED chunks:
    ``d.decompress(buf[pos:])`` + ``unused_data`` copies the whole file
    tail per member — O(n²) memcpy over a 100k-member crawl file — while
    chunked feeding is O(member).  Raises ValueError on corrupt/truncated
    data (callers capture per unit)."""
    if bytes(mv[pos : pos + 2]) != b"\x1f\x8b":
        raise ValueError(f"not a gzip member at offset {pos}")
    d = zlib.decompressobj(wbits=31)
    out = []
    p = pos
    n = len(mv)
    try:
        while p < n:
            chunk = mv[p : p + _INFLATE_CHUNK]
            out.append(d.decompress(chunk))
            if d.eof:
                consumed = len(chunk) - len(d.unused_data)
                end = p + consumed
                if end <= pos:
                    raise ValueError("gzip member walk did not advance")
                return b"".join(out), end
            p += len(chunk)
    except zlib.error as e:
        raise ValueError(f"corrupt gzip member at offset {pos}: {e}")
    raise ValueError(f"truncated gzip member at offset {pos}")


def gunzip_members(buf: bytes) -> list[tuple[int, int, bytes]]:
    """All gzip members of ``buf`` → [(offset, compressed_len, data)].

    ``unused_data``-free chunked inflation per member (see
    ``_inflate_member``); no magic-byte scanning (a deflate stream can
    contain 1f 8b legitimately).  Raises ValueError on a corrupt/truncated
    member — callers capture per row.
    """
    out = []
    pos = 0
    mv = memoryview(buf)
    n = len(buf)
    while pos < n:
        data, end = _inflate_member(mv, pos)
        out.append((pos, end - pos, data))
        if len(out) >= _MAX_MEMBERS:
            raise ValueError(
                f"gzip member count exceeds the {_MAX_MEMBERS} backstop"
            )
        pos = end
    return out


# --- zstd frame walk (IIPC warc-zstd layout: records in zstd frames) ---
#
# The warc-zstd spec (iipc/warc-specifications) concatenates standard zstd
# frames (RFC 8878), each holding one or more complete WARC records, with
# an optional skippable frame carrying a compression dictionary.  Frame
# BOUNDARIES are computable from the frame header + block headers alone —
# no decompression — so byte-range tasks get the same ownership rule as
# the .warc.gz member walk.  Decompression itself uses pyarrow's bundled
# zstd (streaming, no size hint needed); dictionary-compressed archives
# refuse loudly (pyarrow's codec API has no dictionary parameter).

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"  # 0xFD2FB528 LE
_ZSTD_SKIP_LO, _ZSTD_SKIP_HI = 0x184D2A50, 0x184D2A5F
_ZSTD_DICT_MAGIC = 0x184D2A5D  # warc-zstd: the dictionary skippable frame


def _zstd_frame_end(mv, pos: int) -> int:
    """End offset of the zstd frame at ``pos`` by walking its header and
    block headers (RFC 8878 §3.1.1) — no decompression.  Skippable frames
    resolve from their length field.  Raises ValueError on truncation,
    reserved bits, or a dictionary requirement (named — deploy a real
    zstd binding for dictionaried archives)."""
    n = len(mv)
    if pos + 4 > n:
        raise ValueError(f"truncated zstd magic at offset {pos}")
    magic = int.from_bytes(mv[pos : pos + 4], "little")
    if _ZSTD_SKIP_LO <= magic <= _ZSTD_SKIP_HI:
        if pos + 8 > n:
            raise ValueError(f"truncated zstd skippable frame at {pos}")
        size = int.from_bytes(mv[pos + 4 : pos + 8], "little")
        end = pos + 8 + size
        if end > n:
            raise ValueError(f"zstd skippable frame overruns buffer at {pos}")
        return end
    if bytes(mv[pos : pos + 4]) != _ZSTD_MAGIC:
        raise ValueError(f"not a zstd frame at offset {pos}")
    p = pos + 4
    if p >= n:
        raise ValueError(f"truncated zstd frame header at {pos}")
    desc = mv[p]
    p += 1
    fcs_flag = desc >> 6
    single = (desc >> 5) & 1
    if (desc >> 3) & 1:
        raise ValueError(f"zstd reserved descriptor bit set at {pos}")
    checksum = (desc >> 2) & 1
    did_flag = desc & 3
    if did_flag:
        raise ValueError(
            "zstd frame requires a compression dictionary — warc-zstd "
            "dictionaried archives need a real zstd binding (pyarrow's "
            "codec has no dictionary API); re-pack without a dictionary "
            "or deploy python-zstandard"
        )
    if not single:
        p += 1  # window descriptor
    p += (1 if single else 0, 2, 4, 8)[fcs_flag]
    while True:
        if p + 3 > n:
            raise ValueError(f"truncated zstd block header in frame at {pos}")
        bh = mv[p] | (mv[p + 1] << 8) | (mv[p + 2] << 16)
        p += 3
        btype = (bh >> 1) & 3
        if btype == 3:
            raise ValueError(f"zstd reserved block type in frame at {pos}")
        p += 1 if btype == 1 else bh >> 3  # RLE blocks store ONE byte
        if p > n:
            raise ValueError(f"zstd block overruns buffer in frame at {pos}")
        if bh & 1:  # last block
            break
    if checksum:
        p += 4
        if p > n:
            raise ValueError(f"truncated zstd checksum in frame at {pos}")
    return p


def _zstd_member(mv, pos: int) -> tuple[bytes, int]:
    """One zstd frame starting at ``pos`` → (decoded bytes, end offset);
    skippable frames decode to b'' (callers treat empty units as no-ops).
    The (data-frame) decompress is pyarrow streaming — size-hint-free."""
    end = _zstd_frame_end(mv, pos)
    magic = int.from_bytes(mv[pos : pos + 4], "little")
    if _ZSTD_SKIP_LO <= magic <= _ZSTD_SKIP_HI:
        if magic == _ZSTD_DICT_MAGIC:
            raise ValueError(
                "warc-zstd dictionary frame present — the whole archive is "
                "dictionary-compressed; deploy python-zstandard to read it"
            )
        return b"", end  # other skippable frames carry no records
    import pyarrow as pa

    try:
        data = pa.input_stream(
            pa.BufferReader(bytes(mv[pos:end])), compression="zstd"
        ).read()
    except OSError as e:  # ArrowIOError: corrupt frame body
        raise ValueError(f"corrupt zstd frame at offset {pos}: {e}") from e
    return bytes(data), end


def _iter_zstd_units_tolerant(buf: bytes):
    """Yield (frame bytes | None, error | None) per zstd frame, resyncing
    at the next frame magic after a corrupt frame — one bad frame costs
    one error unit, not the rest of the crawl file."""
    pos = 0
    n = len(buf)
    mv = memoryview(buf)
    while pos < n:
        try:
            data, end = _zstd_member(mv, pos)
        except ValueError as e:
            yield None, f"ValueError: {e}"
            nxt = buf.find(_ZSTD_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        if data:
            yield data, None
        pos = end


def _is_zstd_head(head: bytes) -> bool:
    if len(head) < 4:
        return False
    if head[:4] == _ZSTD_MAGIC:
        return True
    magic = int.from_bytes(head[:4], "little")
    return _ZSTD_SKIP_LO <= magic <= _ZSTD_SKIP_HI


# --- WARC record parsing (uncompressed bytes) ---

def _parse_header_block(buf: bytes, pos: int) -> tuple[dict[str, str], int]:
    """Headers starting at ``pos`` until blank line → (headers, body_offset).
    Tolerates bare-LF line endings (real crawls contain them)."""
    # whichever blank line comes FIRST terminates the block: an LF-style
    # header block can be followed by a CRLF-style body that contains the
    # other terminator later (e.g. bare-LF WARC headers over an HTTP block)
    crlf = buf.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
    lf = buf.find(b"\n\n", pos, pos + _MAX_HEADER)
    if crlf >= 0 and (lf < 0 or crlf <= lf):
        end, sep = crlf, 4
    elif lf >= 0:
        end, sep = lf, 2
    else:
        raise ValueError("unterminated header block")
    headers: dict[str, str] = {}
    for line in buf[pos:end].replace(b"\r\n", b"\n").split(b"\n"):
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers, end + sep


def _parse_one_record(buf: bytes, pos: int) -> tuple[dict, int]:
    """One record starting at ``pos`` (past any padding) → (record, next
    offset).  Content-Length is clamped to the buffer; raises ValueError on
    malformed framing."""
    if not buf.startswith(b"WARC/", pos):
        raise ValueError(f"expected WARC version line at offset {pos}")
    line_end = buf.find(b"\n", pos)
    if line_end < 0:
        raise ValueError("truncated version line")
    headers, body_off = _parse_header_block(buf, line_end + 1)
    try:
        clen = int(headers.get("content-length", "0"))
    except ValueError:
        raise ValueError("bad Content-Length")
    clen = max(0, min(clen, len(buf) - body_off))  # clamp: never read past EOF
    nxt = body_off + clen
    if nxt <= pos:
        raise ValueError("record walk did not advance")
    return {"headers": headers, "content": buf[body_off:nxt]}, nxt


def _skip_padding(buf: bytes, pos: int) -> int:
    # inter-record padding (spec: two CRLFs; be liberal)
    n = len(buf)
    while pos < n and buf[pos] in (0x0D, 0x0A):
        pos += 1
    return pos


def parse_warc_records(buf: bytes) -> list[dict]:
    """Records of an UNCOMPRESSED WARC buffer (strict: any malformed record
    raises).  Each record dict: ``{"headers": {lowercased: value},
    "content": bytes}``.  The tolerant per-record walk used by
    ``iter_warc_docs`` is ``_iter_records_tolerant``."""
    records = []
    pos = _skip_padding(buf, 0)
    while pos < len(buf):
        rec, pos = _parse_one_record(buf, pos)
        records.append(rec)
        pos = _skip_padding(buf, pos)
    return records


def _iter_records_tolerant(buf: bytes):
    """Yield (record | None, error | None) with damage contained to ONE
    record: a malformed record yields an error unit, then the walk resyncs
    at the next ``WARC/`` version line — the remaining records survive."""
    pos = _skip_padding(buf, 0)
    while pos < len(buf):
        try:
            rec, pos = _parse_one_record(buf, pos)
        except ValueError as e:
            yield None, f"ValueError: {e}"
            nxt = buf.find(b"\nWARC/", pos + 1)
            if nxt < 0:
                return
            pos = nxt + 1
            continue
        yield rec, None
        pos = _skip_padding(buf, pos)


def _iter_members_tolerant(buf: bytes):
    """Yield (member bytes | None, error | None) per gzip member, resyncing
    at the next gzip-deflate magic after a corrupt/truncated member so one
    bad member costs one error unit, not the rest of the file."""
    pos = 0
    n = len(buf)
    mv = memoryview(buf)
    while pos < n:
        try:
            data, end = _inflate_member(mv, pos)
        except ValueError as e:
            yield None, f"ValueError: {e}"
            nxt = buf.find(b"\x1f\x8b\x08", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield data, None
        pos = end


# --- HTTP response payload extraction ---

def _dechunk(body: bytes) -> bytes:
    """Decode Transfer-Encoding: chunked.  Sizes are hex, clamped to the
    buffer; a malformed size line aborts (ValueError) rather than loops."""
    out = []
    pos = 0
    n = len(body)
    while pos < n:
        le = body.find(b"\r\n", pos)
        if le < 0:
            raise ValueError("truncated chunk size line")
        size_s = body[pos:le].split(b";", 1)[0].strip()
        size = int(size_s, 16)  # ValueError on garbage → per-row capture
        if size == 0:
            break
        start = le + 2
        if start + size > n:
            raise ValueError("chunk overruns buffer")
        out.append(body[start : start + size])
        pos = start + size + 2  # skip trailing CRLF
    return b"".join(out)


def parse_http_response(body: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP response bytes → (status, headers, decoded payload).

    Handles Transfer-Encoding: chunked and Content-Encoding:
    gzip/deflate (zlib; auto wbits), br (pyarrow's bundled brotli), and
    zstd (RFC 8878 — some CDNs serve it).  Raises ValueError on
    malformed input.
    """
    if not body.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response")
    line_end = body.find(b"\n", 0, _MAX_HEADER)
    if line_end < 0:
        raise ValueError("truncated status line")
    parts = body[:line_end].strip().split(None, 2)
    if len(parts) < 2:
        raise ValueError("bad status line")
    status = int(parts[1])
    headers, payload_off = _parse_header_block(body, line_end + 1)
    payload = body[payload_off:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip"):
        payload = zlib.decompress(payload, wbits=31)
    elif enc == "deflate":
        try:
            payload = zlib.decompress(payload)
        except zlib.error:  # raw-deflate servers exist; spec-tolerated
            payload = zlib.decompress(payload, wbits=-15)
    elif enc in ("br", "zstd"):
        import pyarrow as pa

        codec = "brotli" if enc == "br" else "zstd"
        try:
            payload = pa.input_stream(
                pa.BufferReader(payload), compression=codec
            ).read()
        except OSError as e:
            raise ValueError(f"corrupt {enc} body: {e}") from e
        payload = bytes(payload)
    elif enc and enc not in ("identity",):
        raise ValueError(f"unsupported Content-Encoding {enc!r}")
    return status, headers, payload


def _charset_of(content_type: str) -> str:
    for part in content_type.split(";")[1:]:
        k, _, v = part.strip().partition("=")
        if k.strip().lower() == "charset" and v:
            return v.strip().strip("\"'")
    return "utf-8"


def iter_warc_docs(buf: bytes):
    """One WARC file's bytes (gzip members or plain) → doc row tuples
    ``(url, record_id, warc_date, http_status, content_type, payload,
    error)``.  Only ``WARC-Type: response`` records emit rows.

    Magic-routed container: per-record gzip members (.warc.gz, the
    Common Crawl layout), concatenated zstd frames (.warc.zst, the IIPC
    warc-zstd layout — dictionaried archives refuse loudly per frame),
    or plain concatenated records.

    Damage is contained to ONE record: a corrupt gzip member or zstd
    frame resyncs at the next magic, a malformed record resyncs at the
    next WARC version line, a bad HTTP block errors that row — in every
    case the remaining records of the file still yield (a 50k-record
    crawl file must not lose 50k docs to one truncated record).
    """
    if buf[:2] == b"\x1f\x8b":
        units = _iter_members_tolerant(buf)
    elif _is_zstd_head(buf[:4]):
        units = _iter_zstd_units_tolerant(buf)
    else:
        units = iter([(buf, None)])
    yield from _docs_from_units(units)


def _docs_from_units(units):
    """(decoded unit bytes | None, error | None) stream → doc row tuples
    (shared by the whole-file and byte-range walks)."""
    for raw, unit_err in units:
        if unit_err is not None:
            yield ("", "", "", None, None, None, None, unit_err)
            continue
        for rec, rec_err in _iter_records_tolerant(raw):
            if rec_err is not None:
                yield ("", "", "", None, None, None, None, rec_err)
                continue
            h = rec["headers"]
            if h.get("warc-type", "").lower() != "response":
                continue
            url = h.get("warc-target-uri", "")
            rid = h.get("warc-record-id", "")
            date = h.get("warc-date", "")
            try:
                status, hh, payload = parse_http_response(rec["content"])
            except (ValueError, zlib.error) as e:
                yield (
                    url, rid, date, None, None, None, None,
                    f"{type(e).__name__}: {e}",
                )
                continue
            full_ct = hh.get("content-type", "")
            ctype = full_ct.split(";")[0].strip().lower()
            # html payloads decode per their charset parameter here —
            # per-row charsets can't decode JVM-side (F.decode needs a
            # constant) and html extraction is the only str consumer;
            # other text/* rows keep just the binary payload.  Bogus
            # charset labels (utf8mb4 and friends are ubiquitous in real
            # crawls) fall back to utf-8/replace — a decodable-with-mojibake
            # doc beats a lost one
            text = None
            if ctype == "text/html":
                try:
                    text = html_text(payload, full_ct)
                except LookupError:
                    text = payload.decode("utf-8", errors="replace")
            yield (url, rid, date, status, ctype, payload, text, None)


DOCS_SCHEMA = (
    "warc_path string, url string, record_id string, warc_date string, "
    "http_status int, content_type string, payload binary, text string, "
    "error string"
)


def warc_to_docs(spark, files_df):
    """(path, content) rows of WARC files → one row per response record.

    ``files_df`` columns: ``path string, content binary`` (e.g. from
    ``spark.read.format("binaryFile")`` or any listing).  One Arrow-batched
    ``mapInPandas`` — per-file iteration, per-record error capture, zero
    shuffles; downstream filters (content_type = 'text/html') push into the
    same narrow plan.
    """

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    for r in iter_warc_docs(bytes(content)):
                        rows.append((path, *r))
                except (ValueError, zlib.error) as e:
                    rows.append(
                        (path, None, None, None, None, None, None, None,
                         f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_path", "url", "record_id", "warc_date",
                    "http_status", "content_type", "payload", "text",
                    "error",
                ],
            )

    return files_df.select("path", "content").mapInPandas(gen, DOCS_SCHEMA)


# --- byte-range splits WITHIN a .warc.gz file (crawl-scale parallelism) ---
#
# Real crawl files are ~1 GB; one-task-per-file caps parallelism at the
# file count and makes a single hot file a straggler.  Because Common
# Crawl gzips each record as its OWN member, a task can own a byte range
# [start, end) of the file and process exactly the members that START in
# its range (the member crossing `end` belongs to the left task; the right
# task scans forward from `end` to the first member boundary — the same
# ownership rule Hadoop input splits use).  Candidate boundaries are the
# 1f 8b 08 magic; a false positive inside compressed data fails to inflate
# and is skipped, never mis-parsed.

_SPLIT_READ_MARGIN = 4 << 20  # eager over-read past `end` (covers the
# trailing member for crawl-typical ≤1 MB records without re-reading)
_SPLIT_MEMBER_MARGIN = 32 << 20  # hard cap: a member overrunning `end` by
# more than this errors loudly (re-read path below)


def list_warc_splits(
    paths: list[str], split_bytes: int = 64 << 20
) -> list[tuple[str, int, int]]:
    """[(path, start, end)] byte-range splits over .warc.gz files
    (driver-side, size metadata only)."""
    import os

    out = []
    for p in paths:
        size = os.path.getsize(p)
        n = max(1, -(-size // split_bytes))
        for i in range(n):
            out.append((p, i * size // n, (i + 1) * size // n))
    return out


def iter_warc_docs_range(path: str, start: int, end: int):
    """Doc rows of the gzip members STARTING in ``[start, end)`` of a
    .warc.gz (gzip members) or .warc.zst (zstd frames) file.  Reads
    ``[start, end + margin)`` — the margin covers the last owned member's
    overrun past ``end`` (a member larger than the margin errors loudly
    rather than silently truncating).  Plain (non-member-compressed) WARC
    files are not splittable: the split containing offset 0 processes the
    whole file; others yield nothing."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(4)  # container magic decides the sync pattern
        if head[:2] == b"\x1f\x8b":
            sync, inflate = b"\x1f\x8b\x08", _inflate_member
        elif _is_zstd_head(head):
            sync, inflate = _ZSTD_MAGIC, _zstd_member
        else:
            # plain WARC: not splittable — split 0 owns the whole file
            if start == 0:
                f.seek(0)
                yield from iter_warc_docs(f.read())
            return
        f.seek(start)
        # eager read = range + small margin (2× amplification worst case);
        # the rare member longer than the margin re-reads below under the
        # hard cap instead of inflating every split's read by 32 MB
        buf = f.read(min(size, end + _SPLIT_READ_MARGIN) - start)
    mv = memoryview(buf)
    window = end - start  # member starts are owned while local pos < window
    pos = 0
    synced = start == 0  # split 0 starts ON a boundary by format definition
    # magic scans pass `window + len(sync) - 1` as the end bound: find()
    # bounds the END of the match, so a member starting at local offset
    # window-1 .. window-(len-1) (still OWNED: its start is < end) would
    # otherwise be found by NO split and its record silently lost
    # (found in review); ownership is enforced by `nxt < window` below.
    scan_end = window + len(sync) - 1
    while pos < window:
        if not synced:
            nxt = buf.find(sync, pos, scan_end)
            if nxt < 0 or nxt >= window:
                return
            pos = nxt
        try:
            try:
                data, mend = inflate(mv, pos)
            except ValueError as e:
                # re-read under the hard cap ONLY for a buffer-end
                # truncation/overrun (the trailing owned member overran
                # the eager margin; zstd frames report this as either a
                # truncated header or a block overrunning the buffer) —
                # zlib corruption and false-positive magics fail
                # identically on a bigger buffer, so re-reading them is
                # pure wasted I/O
                msg = str(e)
                boundary = "truncated" in msg or "overruns buffer" in msg
                if not boundary or start + len(buf) >= size:
                    raise
                with open(path, "rb") as f:
                    f.seek(start + pos)
                    big = f.read(min(size - start - pos, _SPLIT_MEMBER_MARGIN))
                data, bend = inflate(memoryview(big), 0)
                mend = pos + bend
        except ValueError as e:
            if synced:
                # a real mid-split corruption: error unit, resync forward
                yield ("", "", "", None, None, None, None,
                       f"ValueError: {e}")
            # false-positive magic before first sync: skip silently — the
            # bytes belong to the left split's trailing member
            nxt = buf.find(sync, pos + 1, scan_end)
            if nxt < 0 or nxt >= window:
                return
            pos = nxt
            continue
        synced = True
        yield from _docs_from_units(iter([(data, None)]))
        pos = mend


_DOCS_ARROW_TYPES = [
    ("warc_path", "string"), ("url", "string"), ("record_id", "string"),
    ("warc_date", "string"), ("http_status", "int32"),
    ("content_type", "string"), ("payload", "binary"), ("text", "string"),
    ("error", "string"),
]


def warc_scan_docs(
    spark,
    paths: list[str],
    split_bytes: int = 64 << 20,
    columns: list[str] | None = None,
):
    """Byte-range-parallel crawl scan: ``paths`` → the same rows as
    ``warc_to_docs`` but with tasks owning ranges WITHIN each file, so
    parallelism scales with total bytes, not file count.

    Splits are enumerated driver-side (size metadata only), coalesced to
    ~4·parallelism tasks (per-split tasks are ~100 ms of work — 1:1 tasks
    measured 1.5× slower at local[16] from per-task protocol overhead),
    and pinned against AQE coalescing exactly like the media scan's
    row-group splits.  Rows leave each task as one Arrow batch per split
    (``mapInArrow`` — no pandas object round-trip on payload bytes).

    ``columns`` projects INSIDE the task: a ``.select()`` after the stage
    cannot reach into the generator, so an inventory-shaped job (url,
    status, content_type) would otherwise ship every payload byte into
    the JVM just to drop it — measured ~2.4× the wall of the projected
    scan.  Omit it (or include 'payload'/'text') when downstream actually
    consumes the bytes."""
    splits = list_warc_splits(paths, split_bytes)
    par = spark.sparkContext.defaultParallelism
    n_slices = max(1, min(len(splits), 4 * par))
    rdd = spark.sparkContext.parallelize(splits, n_slices)
    sdf = spark.createDataFrame(rdd, "path string, start long, end long")

    import pyarrow as pa

    fields = [
        (n, t) for n, t in _DOCS_ARROW_TYPES
        if columns is None or n in columns
    ]
    arrow_schema = pa.schema([(n, getattr(pa, t)()) for n, t in fields])
    idx = [i for i, (n, _t) in enumerate(_DOCS_ARROW_TYPES)
           if columns is None or n in columns]
    out_schema = ", ".join(
        f"{n} {'int' if t == 'int32' else t}" for n, t in fields
    )

    def gen(batches):
        for b in batches:
            for path, s, e in zip(
                b.column("path").to_pylist(),
                b.column("start").to_pylist(),
                b.column("end").to_pylist(),
            ):
                try:
                    rows = [(path, *r)
                            for r in iter_warc_docs_range(path, int(s), int(e))]
                except (OSError, ValueError, zlib.error) as exc:
                    rows = [(path, None, None, None, None, None, None,
                             None, f"{type(exc).__name__}: {exc}")]
                if not rows:
                    continue
                cols = list(zip(*rows))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(cols[i], type=f.type)
                     for i, f in zip(idx, arrow_schema)],
                    schema=arrow_schema,
                )

    return sdf.mapInArrow(gen, out_schema)


def warc_html_docs(spark, files_df):
    """Crawl files → pipeline-ready docs frame: one doc per HTTP-200
    ``text/html`` response, its markup as a single ``kind='html'`` span
    with ``doc_id = URL``.  Compose with ``pipeline.extract_spans(...,
    html=True)`` for the full crawl-file → main-content-spans path; the
    boilerplate strip, table recovery, and outlink harvest then run
    exactly as they do over the parquet corpus."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = warc_to_docs(spark, files_df)
    html = docs.where(
        (F.col("http_status") == 200) & (F.col("content_type") == "text/html")
    )
    # crawls capture the same URL repeatedly (revisits, retries); doc_id
    # must be unique, so keep the LATEST capture per URL (WARC-Date, then
    # record id as the deterministic tiebreak) — one shuffle keyed on url
    w = Window.partitionBy("url").orderBy(
        F.col("warc_date").desc(), F.col("record_id").desc()
    )
    html = (
        html.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    span = F.struct(
        F.lit("html").alias("kind"),
        F.col("text").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return html.select(F.col("url").alias("doc_id"), F.array(span).alias("spans"))


def html_text(payload: bytes, content_type: str) -> str:
    """Decode an html payload per its charset parameter (errors replaced)."""
    return payload.decode(_charset_of(content_type), errors="replace")


# --- fixture writer (tests + gate corpus; standards-shaped output) ---

# --- CDX index (the archive world's standard crawl index) ---

def cdx_urlkey(url):
    """SURT-canonicalized url key as a pure Catalyst expression (pywb
    canonicalization subset, zero UDFs): lowercase, fragment stripped,
    scheme stripped, host reversed comma-joined, default ports (80/443)
    dropped and others appended after the host, empty path → '/', query
    parameters sorted.  ``http://www.Example.COM:80/Path?b=2&a=1`` →
    ``com,example)/path?a=1&b=2``.  IP hosts pass through UNREVERSED
    (pywb parity): dotted-quad IPv4 keeps its dots, bracketed IPv6
    literals keep their brackets, with the port rule applied after the
    closing bracket.  The q56 gate pins this against an INDEPENDENT
    DuckDB SQL implementation of the same rules, value-hash compared."""
    from pyspark.sql import functions as F

    u = F.regexp_replace(F.lower(url), "#.*$", "")
    u = F.regexp_replace(u, "^https?://", "")
    hostport = F.regexp_extract(u, "^([^/?]*)", 1)
    pathq = F.regexp_replace(u, "^[^/?]*", "")
    hostport = F.regexp_replace(hostport, "^[^@]*@", "")  # strip userinfo
    host = F.regexp_replace(hostport, ":\\d+$", "")
    port = F.regexp_extract(hostport, ":(\\d+)$", 1)
    host = F.regexp_replace(host, "^www\\d*\\.", "")
    is_ip = host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$") | host.startswith("[")
    rev = F.when(is_ip, host).otherwise(
        F.array_join(F.reverse(F.split(host, "\\.")), ",")
    )
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev,
        F.when(port.isin("", "80", "443"), "").otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        path,
        F.when(query == "", "").otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def warc_cdx_index(docs):
    """``warc_to_docs`` rows → CDX-shaped index rows (urlkey, 14-digit
    timestamp, url, mime, status, sha1-hex digest, payload length) — the
    first derived dataset every web archive builds.  Pure Catalyst
    column work (scan → project, zero shuffles, zero Python); sort/dedup
    policy is the caller's.  Digest is hex SHA-1 (classic CDX uses
    base32, which Spark lacks natively — documented deviation; the
    digest's job, dedup joins, only needs determinism)."""
    from pyspark.sql import functions as F

    return docs.where(F.col("error").isNull() & (F.col("url") != "")).select(
        cdx_urlkey(F.col("url")).alias("urlkey"),
        F.regexp_replace("warc_date", "[^0-9]", "").alias("timestamp14"),
        "url",
        F.col("content_type").alias("mime"),
        F.col("http_status").alias("status"),
        F.sha1("payload").alias("digest_sha1"),
        F.length("payload").alias("length"),
    )


def encode_http_response(
    payload: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
    gzip_body: bool = False,
    encoding: str | None = None,
) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "X"
    )
    body = payload
    headers = [f"Content-Type: {content_type}"]
    if gzip_body and encoding is None:
        encoding = "gzip"
    if encoding == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        body = co.compress(body) + co.flush()
        headers.append("Content-Encoding: gzip")
    elif encoding in ("br", "zstd"):
        import pyarrow as pa

        codec = "brotli" if encoding == "br" else "zstd"
        body = bytes(pa.Codec(codec).compress(body))
        headers.append(f"Content-Encoding: {encoding}")
    elif encoding is not None:
        raise ValueError(f"unsupported fixture encoding {encoding!r}")
    if chunked:
        headers.append("Transfer-Encoding: chunked")
        out, pos = [], 0
        while pos < len(body):
            chunk = body[pos : pos + 977]  # odd size: exercises split points
            out.append(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
            pos += len(chunk)
        out.append(b"0\r\n\r\n")
        body = b"".join(out)
    else:
        headers.append(f"Content-Length: {len(body)}")
    head = f"HTTP/1.1 {status} {reason}\r\n" + "\r\n".join(headers)
    return head.encode() + b"\r\n\r\n" + body


def encode_warc_record(
    warc_type: str,
    content: bytes,
    url: str = "",
    record_id: str = "",
    date: str = "2024-01-01T00:00:00Z",
) -> bytes:
    h = [
        "WARC/1.1",
        f"WARC-Type: {warc_type}",
        f"WARC-Date: {date}",
        f"WARC-Record-ID: <urn:uuid:{record_id or 'fixture'}>",
        f"Content-Length: {len(content)}",
    ]
    if url:
        h.insert(2, f"WARC-Target-URI: {url}")
    if warc_type == "response":
        h.append("Content-Type: application/http; msgtype=response")
    return "\r\n".join(h).encode() + b"\r\n\r\n" + content + b"\r\n\r\n"


def encode_warc(
    records: list[bytes],
    per_record_gzip: bool = True,
    compression: str = "gzip",
) -> bytes:
    """Records → one .warc(.gz|.zst) byte string.  ``compression="gzip"``
    writes the Common Crawl layout (one gzip member per record);
    ``"zstd"`` writes the IIPC warc-zstd layout (one zstd frame per
    record, pyarrow codec); ``per_record_gzip=False`` writes plain
    concatenated records."""
    if not per_record_gzip:
        return b"".join(records)
    if compression == "zstd":
        import pyarrow as pa

        codec = pa.Codec("zstd")
        return b"".join(bytes(codec.compress(rec)) for rec in records)
    if compression != "gzip":
        raise ValueError(f"unsupported WARC compression {compression!r}")
    out = []
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        out.append(co.compress(rec) + co.flush())
    return b"".join(out)
