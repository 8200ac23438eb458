"""Matroska / WebM container with MJPEG frames — the last video container
family in the corpus inventory.

Same no-library standard as MP4 (``mp4.py``) and AVI (``avi.py``): EBML
(RFC 8794) + Matroska (RFC 9559, the public IETF spec; WebM is its
constrained profile) is a vint-ID/vint-size element walk.  Video frames
live in ``Segment → Cluster → SimpleBlock`` (or ``BlockGroup → Block``)
elements; a block carries a track-number vint, a 16-bit relative
timestamp, a flags byte, and then one or more frames per its lacing mode
(none / Xiph / fixed / EBML — all four implemented).  ``V_MJPEG`` frames
are ordinary JFIF payloads, so the existing from-scratch JPEG codec
decodes them — no ffmpeg/pyav needed.  This narrows
``multimodal.iter_video_frames``'s seam to genuinely library-bound
CODECS (VP8/VP9/AV1/H.264 — named per-row errors), not container
families: every mainstream video container's *structure* is now
readable natively.

Hostile/truncated input is bounded exactly like the box/chunk walks:
every element size is clamped to the buffer, every walk strictly
advances (a zero-advance element refuses to loop; the walks are
fixed-shape nested loops, no recursion), unknown-size masters resolve
to the next sibling per RFC 8794 (the streaming-muxer shape) and refuse
to nest, and lace sizes are validated against the bytes actually
present.

Reference parity note: the reference (DikovAlexandr/TableExtraction)
handles images only; video is an engine-side corpus capability, not a
port.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from .probe import _read_vint

# Matroska element IDs (RFC 9559)
_SEGMENT = 0x18538067
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CLUSTER = 0x1F43B675
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

# library-bound codec seams, named in errors so per-row error strings say
# exactly which deploy-time decoder the corpus needs
_KNOWN_CODECS = {
    "V_VP8": "VP8", "V_VP9": "VP9", "V_AV1": "AV1",
    "V_MPEG4/ISO/AVC": "H.264", "V_MPEGH/ISO/HEVC": "HEVC",
    "V_THEORA": "Theora", "V_MPEG4/ISO/ASP": "MPEG-4 Visual",
}

# every Segment-level element ID (RFC 9559): an unknown-size Cluster — the
# form live/streaming muxers emit — ends where the next one of these starts
_SEGMENT_LEVEL = {
    _CLUSTER, _TRACKS, 0x1549A966, 0x114D9B74, 0x1C53BB6B, 0x1043A770,
    0x1941A469, 0x1254C367,
}


def _element(buf: bytes, pos: int, end: int):
    """One EBML element at ``pos`` → (id, body_start, body_end, unknown).
    Unknown-size elements (all value bits set) run to the parent's end by
    default; Segment-child walks refine a Cluster's end via
    ``_segment_children``."""
    eid, p2 = _read_vint(buf, pos, keep_marker=True)
    size, body = _read_vint(buf, p2, keep_marker=False)
    nlen = body - p2
    unknown = size == (1 << (7 * nlen)) - 1
    stop = end if unknown else min(end, body + size)
    if stop <= pos:
        raise ValueError("MKV: element makes no progress")
    return eid, body, stop, unknown


def _uint(buf: bytes, a: int, b: int) -> int:
    return int.from_bytes(buf[a:b], "big")


def _segment_children(buf: bytes, seg_start: int, seg_end: int):
    """Yield (id, body, stop) for each Segment-level element, resolving
    unknown-size masters (per RFC 8794 they end at the first byte that
    starts a sibling — detected by peeking the next element ID)."""
    pos = seg_start
    while pos < seg_end:
        eid, body, stop, unknown = _element(buf, pos, seg_end)
        if unknown and eid != _SEGMENT:
            scan = body
            while scan < seg_end:
                try:
                    peid, p2 = _read_vint(buf, scan, keep_marker=True)
                    psize, pbody = _read_vint(buf, p2, keep_marker=False)
                except ValueError:
                    scan = seg_end
                    break
                if peid in _SEGMENT_LEVEL:
                    break
                pnlen = pbody - p2
                if psize == (1 << (7 * pnlen)) - 1:
                    raise ValueError(
                        "MKV: nested unknown-size element inside an "
                        "unknown-size master"
                    )
                nxt = min(seg_end, pbody + psize)
                if nxt <= scan:
                    raise ValueError("MKV: element makes no progress")
                scan = nxt
            stop = scan
        yield eid, body, stop
        pos = stop


def _video_track(buf: bytes, seg_start: int, seg_end: int) -> tuple[int, str]:
    """→ (track_number, codec_id) of the first video track."""
    for eid, body, stop in _segment_children(buf, seg_start, seg_end):
        if eid == _TRACKS:
            tpos = body
            while tpos < stop:
                teid, tbody, tstop, _u = _element(buf, tpos, stop)
                if teid == _TRACK_ENTRY:
                    num, ttype, codec = 0, 0, ""
                    epos = tbody
                    while epos < tstop:
                        feid, fbody, fstop, _u2 = _element(buf, epos, tstop)
                        if feid == _TRACK_NUMBER:
                            num = _uint(buf, fbody, fstop)
                        elif feid == _TRACK_TYPE:
                            ttype = _uint(buf, fbody, fstop)
                        elif feid == _CODEC_ID:
                            codec = buf[fbody:fstop].decode("ascii", "replace")
                        epos = fstop
                    if ttype == 1:  # video
                        return num, codec
                tpos = tstop
    raise ValueError("MKV: no video track entry")


def _block_frames(buf: bytes, body: int, stop: int, track: int):
    """§10 block structure → byte ranges of the frames it carries, applying
    the lacing mode.  Returns [] for other tracks' blocks."""
    tnum, pos = _read_vint(buf, body, keep_marker=False)
    if tnum != track:
        return []
    pos += 2  # 16-bit relative timestamp
    if pos >= stop:
        raise ValueError("MKV: truncated block header")
    flags = buf[pos]
    pos += 1
    lacing = (flags >> 1) & 3
    if lacing == 0:  # no lacing: one frame to the block end
        return [(pos, stop)]
    if pos >= stop:
        raise ValueError("MKV: truncated lace header")
    n_frames = buf[pos] + 1
    pos += 1
    sizes: list[int] = []
    if lacing == 2:  # fixed-size lacing
        total = stop - pos
        if n_frames == 0 or total % n_frames:
            raise ValueError("MKV: fixed lacing does not divide evenly")
        sizes = [total // n_frames] * n_frames
    elif lacing == 1:  # Xiph: sizes as 255-sums, last frame implicit
        for _ in range(n_frames - 1):
            sz = 0
            while True:
                if pos >= stop:
                    raise ValueError("MKV: truncated Xiph lace sizes")
                sz += buf[pos]
                last = buf[pos] < 255
                pos += 1
                if last:
                    break
            sizes.append(sz)
        sizes.append(stop - pos - sum(sizes))
    else:  # EBML lacing: first size is a vint, rest are signed-vint deltas
        # sizes are stored for the first n-1 frames only: a single-frame
        # laced block has NO size vint (RFC 9559 §10.4)
        if n_frames == 1:
            sizes = [stop - pos]
        else:
            sz, pos = _read_vint(buf, pos, keep_marker=False)
            sizes.append(sz)
            for _ in range(n_frames - 2):
                delta, npos = _read_vint(buf, pos, keep_marker=False)
                nlen = npos - pos
                delta -= (1 << (7 * nlen - 1)) - 1  # signed range mapping
                pos = npos
                sz += delta
                sizes.append(sz)
            sizes.append(stop - pos - sum(sizes))
    out = []
    for sz in sizes:
        if sz < 0 or pos + sz > stop:
            raise ValueError("MKV: lace size overruns block")
        out.append((pos, pos + sz))
        pos += sz
    return out


def _frame_ranges(buf: bytes) -> tuple[list[tuple[int, int]], str]:
    """Structure walk → (video-frame byte ranges in stream order, codec)."""
    if buf[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("MKV: not an EBML stream")
    # top level: EBML header then Segment (unknown Segment size = to EOF)
    pos, end = 0, len(buf)
    seg = None
    while pos < end:
        eid, body, stop, _u = _element(buf, pos, end)
        if eid == _SEGMENT:
            seg = (body, stop)
            break
        pos = stop
    if seg is None:
        raise ValueError("MKV: no Segment element")
    track, codec = _video_track(buf, *seg)
    ranges: list[tuple[int, int]] = []
    for eid, body, stop in _segment_children(buf, *seg):
        if eid != _CLUSTER:
            continue
        cpos = body
        while cpos < stop:
            ceid, cbody, cstop, cunk = _element(buf, cpos, stop)
            if cunk:
                raise ValueError("MKV: unknown-size element inside Cluster")
            if ceid == _SIMPLE_BLOCK:
                ranges.extend(_block_frames(buf, cbody, cstop, track))
            elif ceid == _BLOCK_GROUP:
                gpos = cbody
                while gpos < cstop:
                    geid, gbody, gstop, gunk = _element(buf, gpos, cstop)
                    if gunk:
                        raise ValueError(
                            "MKV: unknown-size element inside BlockGroup"
                        )
                    if geid == _BLOCK:
                        ranges.extend(_block_frames(buf, gbody, gstop, track))
                    gpos = gstop
            cpos = cstop
    return ranges, codec


def iter_mkv_mjpeg_frames(payload: bytes) -> Iterator[tuple[int, int, np.ndarray]]:
    """Lazily yield (frame_no, n_frames, gray_frame) from a Matroska/WebM
    stream whose video track is ``V_MJPEG``.  One decoded frame lives at a
    time — the structure walk resolves all frame byte ranges up front
    (cheap: headers only), decode happens per yield.  Non-MJPEG codecs
    raise the named deploy-time seam."""
    buf = bytes(payload)
    ranges, codec = _frame_ranges(buf)
    if codec != "V_MJPEG":
        name = _KNOWN_CODECS.get(codec, codec or "unknown")
        raise NotImplementedError(
            f"MKV/WebM video codec {name} requires pyav/ffmpeg, not present "
            f"in this container; the deploy-time adapter decodes inside the "
            f"same mapInPandas batch — container structure was fully parsed"
        )
    if not ranges:
        raise ValueError("MKV: video track has no frames")
    from .jpeg import decode_jpeg
    from .media import rgb_to_gray

    n = len(ranges)
    for i, (a, b) in enumerate(ranges):
        frame = decode_jpeg(buf[a:b])
        if frame.ndim == 3:
            frame = rgb_to_gray(frame)
        yield i, n, frame


# ------------------------------------------------------- fixture encoder


def _vint_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _vint_size(n: int) -> bytes:
    # 4-byte size vint: marker 0x10 in the top byte, 28 value bits
    if n >= 1 << 28:
        raise ValueError("MKV writer: element too large")
    return (n | 0x10000000).to_bytes(4, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv_mjpeg(payloads: list[bytes], w: int, h: int, *,
                     webm: bool = False, codec_id: str = "V_MJPEG",
                     lacing: str = "none", fps: int = 10,
                     streaming: bool = False) -> bytes:
    """Minimal spec-shaped Matroska writer for fixtures: EBML header,
    Segment{Info, Tracks{video TrackEntry}, one Cluster per frame (or one
    laced block for ``lacing`` in xiph/fixed/ebml)}.  ``payloads`` are the
    pre-encoded frame bitstreams (JFIF JPEGs for ``V_MJPEG``) — the same
    contract as ``encode_avi_mjpeg``/``encode_mp4_mjpeg``.  ``webm=True``
    writes the WebM DocType (used with a non-MJPEG ``codec_id`` to pin the
    named codec seam); ``streaming=True`` writes unknown-size Segment and
    Cluster elements — the live-muxer shape whose sibling-terminated ends
    the reader must resolve."""
    doctype = b"webm" if webm else b"matroska"
    ebml_header = _el(0x1A45DFA3, b"".join([
        _el_uint(0x4286, 1),            # EBMLVersion
        _el_uint(0x42F7, 1),            # EBMLReadVersion
        _el_uint(0x42F2, 4),            # EBMLMaxIDLength
        _el_uint(0x42F3, 8),            # EBMLMaxSizeLength
        _el(0x4282, doctype),           # DocType
        _el_uint(0x4287, 4),            # DocTypeVersion
        _el_uint(0x4285, 2),            # DocTypeReadVersion
    ]))
    # TimestampScale 1 ms/tick; Duration in ticks as an 8-byte float
    dur_ms = len(payloads) * 1000.0 / fps
    info = _el(0x1549A966, _el_uint(0x2AD7B1, 1_000_000)
               + _el(0x4489, struct.pack(">d", dur_ms)))
    track = _el(_TRACKS, _el(_TRACK_ENTRY, b"".join([
        _el_uint(_TRACK_NUMBER, 1),
        _el_uint(0x73C5, 1),            # TrackUID
        _el_uint(_TRACK_TYPE, 1),       # video
        _el(_CODEC_ID, codec_id.encode("ascii")),
        _el(0xE0, _el_uint(0xB0, w) + _el_uint(0xBA, h)),  # Video dims
    ])))
    payloads = [bytes(p) for p in payloads]

    def _cluster(body: bytes) -> bytes:
        if streaming:  # unknown-size: 1-byte all-ones size vint
            return _vint_id(_CLUSTER) + b"\xff" + body
        return _el(_CLUSTER, body)

    clusters = b""
    if lacing == "none":
        for i, data in enumerate(payloads):
            block = b"\x81" + struct.pack(">h", 0) + b"\x00" + data
            clusters += _cluster(_el_uint(0xE7, i) + _el(_SIMPLE_BLOCK, block))
    else:
        flags, lace_hdr = {
            "xiph": (0x02, b""), "fixed": (0x04, b""), "ebml": (0x06, b""),
        }[lacing]
        n = len(payloads)
        if lacing == "fixed" and len({len(p) for p in payloads}) > 1:
            raise ValueError("MKV writer: fixed lacing needs equal sizes")
        lace_hdr = bytes([n - 1])
        if lacing == "xiph":
            for p in payloads[:-1]:
                sz = len(p)
                lace_hdr += b"\xff" * (sz // 255) + bytes([sz % 255])
        elif lacing == "ebml" and n > 1:
            # sizes for the first n-1 frames only; a 1-frame laced block
            # carries no size vint (RFC 9559 §10.4)
            first = len(payloads[0])
            lace_hdr += _vint_size(first)
            prev = first
            for p in payloads[1:-1]:
                delta = len(p) - prev
                prev = len(p)
                # 4-byte signed vint: bias by 2^27 - 1
                lace_hdr += ((delta + ((1 << 27) - 1)) | 0x10000000).to_bytes(4, "big")
        block = (b"\x81" + struct.pack(">h", 0) + bytes([flags])
                 + lace_hdr + b"".join(payloads))
        clusters = _cluster(_el_uint(0xE7, 0) + _el(_SIMPLE_BLOCK, block))
    if streaming:
        return ebml_header + _vint_id(_SEGMENT) + b"\xff" + info + track + clusters
    return ebml_header + _el(_SEGMENT, info + track + clusters)
