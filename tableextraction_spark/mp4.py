"""MP4 / ISO-BMFF container with MJPEG samples — the web-video container.

Same no-library standard as PNG/JPEG/WAV/AVI/PDF: ISO/IEC 14496-12 (the
ISO base media file format — a public spec) is a plain size+type box walk,
and the sample tables inside ``moov → trak → mdia → minf → stbl`` map each
video sample to an absolute byte range in the file.  MJPEG samples
(``stsd`` entry fourcc ``jpeg``) are ordinary JFIF payloads, so the
existing from-scratch JPEG codec (``jpeg.py``) decodes them — no
ffmpeg/pyav needed.  This narrows ``multimodal.iter_video_frames``'s stub
seam to genuinely library-bound CODECS (H.264/HEVC/VP9/AV1) rather than a
whole container family: an MP4's structure is now always readable, and
only a non-MJPEG bitstream raises the named deploy-time seam.

Sample resolution (the part AVI doesn't have): samples live in chunks;
``stsc`` maps chunk index → samples-per-chunk via first-chunk runs,
``stco``/``co64`` gives each chunk's absolute offset, and ``stsz`` gives
per-sample sizes, so sample k's offset = chunk_offset + sum of the sizes
of the samples before it in the same chunk.  This module expands that
mapping lazily — one decoded frame lives at a time, same contract as
``avi.iter_avi_mjpeg_frames``.

Hostile/truncated input is bounded exactly like ``avi.py``: every box size
is clamped to the buffer, the walk strictly advances (size < 8 refuses to
loop), table counts are validated against the bytes actually present, and
fragmented files (``moof``) raise a named ValueError rather than silently
yielding zero frames.

Reference parity note: the reference (DikovAlexandr/TableExtraction)
handles images only; video is an engine-side corpus capability, not a
port.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

_U16B = struct.Struct(">H")
_U32B = struct.Struct(">I")
_U64B = struct.Struct(">Q")

# stsd fourccs this module decodes itself (MJPEG sample entries; 'mjpa' is
# the QuickTime motion-JPEG-A flavor whose samples are still plain JFIF)
_MJPEG_ENTRIES = (b"jpeg", b"mjpa")

# the library-bound codec seams, named in errors so per-row error strings
# tell the operator exactly which deploy-time decoder the corpus needs
_KNOWN_CODECS = {
    b"avc1": "H.264", b"avc3": "H.264", b"hvc1": "HEVC", b"hev1": "HEVC",
    b"vp09": "VP9", b"av01": "AV1", b"mp4v": "MPEG-4 Visual",
}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end);
    sizes are clamped to the buffer so hostile lengths cannot overrun and
    the offset strictly advances so a zero/garbage size cannot loop."""
    pos = start
    while pos + 8 <= end:
        (size,) = _U32B.unpack_from(buf, pos)
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if pos + 16 > end:
                return
            (size,) = _U64B.unpack_from(buf, pos + 8)
            body = pos + 16
        elif size == 0:  # "to end of file"
            size = end - pos
        stop = min(end, pos + max(size, body - pos))
        yield btype, body, stop
        if size < 8:
            return  # refuse to loop on garbage sizes
        pos += size


def _find(buf: bytes, start: int, end: int, btype: bytes) -> tuple[int, int] | None:
    for t, body, stop in _boxes(buf, start, end):
        if t == btype:
            return body, stop
    return None


def _full_box(buf: bytes, body: int, stop: int) -> tuple[int, int]:
    """FullBox: skip version(1)+flags(3); returns (version, payload_start)."""
    if body + 4 > stop:
        raise ValueError("MP4: truncated full box")
    return buf[body], body + 4


def _read_table(buf: bytes, body: int, stop: int, fields: int) -> list[tuple]:
    """FullBox whose payload is u32 entry_count then entry_count rows of
    ``fields`` u32s each; count validated against the bytes present."""
    _, pos = _full_box(buf, body, stop)
    if pos + 4 > stop:
        raise ValueError("MP4: truncated table box")
    (n,) = _U32B.unpack_from(buf, pos)
    pos += 4
    if pos + n * fields * 4 > stop:
        raise ValueError(f"MP4: table declares {n} entries beyond the box")
    out = []
    for _ in range(n):
        out.append(struct.unpack_from(f">{fields}I", buf, pos))
        pos += fields * 4
    return out


# ------------------------------------------------------------------ decode


def _video_stbl(buf: bytes, moov: tuple[int, int]) -> tuple[int, int]:
    """First 'vide'-handler track's sample table box range."""
    for t, body, stop in _boxes(buf, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(buf, body, stop, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(buf, mdia[0], mdia[1], b"hdlr")
        # handler_type is bytes 8:12 of the hdlr payload (after ver/flags
        # and the 4-byte pre_defined)
        if hdlr is None or buf[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(buf, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find(buf, minf[0], minf[1], b"stbl")
        if stbl is not None:
            return stbl
    raise ValueError("MP4 has no video track with a sample table")


def _stsd_entry(buf: bytes, stbl: tuple[int, int]) -> tuple[bytes, int, int]:
    """First stsd SampleEntry → (fourcc, body_start, body_end)."""
    stsd = _find(buf, stbl[0], stbl[1], b"stsd")
    if stsd is None:
        raise ValueError("MP4 stbl has no stsd")
    _, pos = _full_box(buf, stsd[0], stsd[1])
    if pos + 4 > stsd[1]:
        raise ValueError("MP4: truncated stsd")
    # first SampleEntry starts at pos+4 (pos holds the u32 entry_count):
    # u32 size, u32 format fourcc, then the entry body
    if pos + 12 > stsd[1]:
        raise ValueError("MP4: stsd has no sample entry")
    (size,) = _U32B.unpack_from(buf, pos + 4)
    end = min(pos + 4 + size, stsd[1]) if size >= 8 else stsd[1]
    return buf[pos + 8 : pos + 12], pos + 12, end


def _stsd_fourcc(buf: bytes, stbl: tuple[int, int]) -> bytes:
    return _stsd_entry(buf, stbl)[0]


def _sample_ranges(buf: bytes, stbl: tuple[int, int]) -> list[tuple[int, int]]:
    """stsz × stsc × stco/co64 → [(abs_offset, size)] per sample, in
    decode order.  Pure index arithmetic; no payload bytes touched."""
    stsz = _find(buf, stbl[0], stbl[1], b"stsz")
    if stsz is None:
        raise ValueError("MP4 stbl has no stsz")
    _, pos = _full_box(buf, stsz[0], stsz[1])
    if pos + 8 > stsz[1]:
        raise ValueError("MP4: truncated stsz")
    (fixed,) = _U32B.unpack_from(buf, pos)
    (n_samples,) = _U32B.unpack_from(buf, pos + 4)
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if pos + 8 + 4 * n_samples > stsz[1]:
            raise ValueError("MP4: stsz declares sizes beyond the box")
        sizes = list(struct.unpack_from(f">{n_samples}I", buf, pos + 8))

    stsc = _read_table(buf, *_require(buf, stbl, b"stsc"), 3)
    co_box = _find(buf, stbl[0], stbl[1], b"stco")
    if co_box is not None:
        offsets = [r[0] for r in _read_table(buf, *co_box, 1)]
    else:
        co64 = _find(buf, stbl[0], stbl[1], b"co64")
        if co64 is None:
            raise ValueError("MP4 stbl has neither stco nor co64")
        _, pos = _full_box(buf, co64[0], co64[1])
        (n,) = _U32B.unpack_from(buf, pos)
        if pos + 4 + 8 * n > co64[1]:
            raise ValueError("MP4: co64 declares offsets beyond the box")
        offsets = list(struct.unpack_from(f">{n}Q", buf, pos + 4))

    # expand stsc's first-chunk runs: entry (first_chunk, spc, _) applies
    # from first_chunk (1-based) until the next entry's first_chunk
    ranges: list[tuple[int, int]] = []
    si = 0
    for ei, (first, spc, _sdi) in enumerate(stsc):
        last = stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else len(offsets)
        if first < 1 or spc < 1:
            raise ValueError("MP4: malformed stsc entry")
        for ci in range(first - 1, min(last, len(offsets))):
            off = offsets[ci]
            for _ in range(spc):
                if si >= n_samples:
                    break
                ranges.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si < n_samples:
        raise ValueError(
            f"MP4: sample tables resolve only {si} of {n_samples} samples"
        )
    return ranges


def _require(buf: bytes, stbl: tuple[int, int], btype: bytes) -> tuple[int, int]:
    box = _find(buf, stbl[0], stbl[1], btype)
    if box is None:
        raise ValueError(f"MP4 stbl has no {btype.decode('ascii', 'replace')}")
    return box


def iter_mp4_mjpeg_frames(payload: bytes) -> Iterator[tuple[int, int, np.ndarray]]:
    """MP4 bytes → lazily yield (frame_no, n_frames, uint8 H×W gray frame).

    One decoded frame lives at a time (same contract as
    ``avi.iter_avi_mjpeg_frames``).  n_frames is the stsz sample count of
    the first video track; non-MJPEG codecs raise a ValueError naming the
    codec so the per-row error string says which deploy-time decoder the
    corpus needs.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError(f"not an MP4: no ftyp at offset 4 ({buf[4:8]!r})")
    if _find(buf, 0, len(buf), b"moof") is not None:
        raise ValueError(
            "fragmented MP4 (moof) not supported — progressive files only"
        )
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box")
    stbl = _video_stbl(buf, moov)
    fourcc, e_start, e_end = _stsd_entry(buf, stbl)
    if fourcc in (b"avc1", b"avc3"):
        yield from _iter_avc_frames(buf, stbl, fourcc, e_start, e_end)
        return
    if fourcc not in _MJPEG_ENTRIES:
        name = _KNOWN_CODECS.get(fourcc, fourcc.decode("ascii", "replace"))
        raise ValueError(
            f"MP4 video codec {name!r} needs ffmpeg/pyav at deploy time — "
            f"only MJPEG ('jpeg' entries) and I_PCM-coded H.264 ('avc1') "
            f"decode natively"
        )
    ranges = _sample_ranges(buf, stbl)
    n = len(ranges)
    if n == 0:
        raise ValueError("MP4 video track has zero samples")
    from .jpeg import decode_jpeg
    from .media import rgb_to_gray

    for i, (off, size) in enumerate(ranges):
        blob = buf[off : off + size]
        if len(blob) < size or blob[:2] != b"\xff\xd8":
            raise ValueError(
                f"sample {i}: offset table points outside mdat or at "
                f"non-JPEG bytes (magic {blob[:2]!r})"
            )
        yield i, n, rgb_to_gray(decode_jpeg(blob))


def _iter_avc_frames(
    buf: bytes, stbl: tuple[int, int], fourcc: bytes, e_start: int,
    e_end: int
) -> Iterator[tuple[int, int, np.ndarray]]:
    """avc1/avc3 track: avcC config → per-sample H.264 decode (h264.py —
    I_PCM payloads decode; CAVLC/CABAC raise their named seams).  avc1
    carries SPS/PPS in the avcC record; avc3 may carry them in-band
    inside each sync sample, which decode_avcc_sample consumes."""
    from .h264 import (
        decode_avcc_sample,
        parse_avcc,
        parse_pps,
        parse_sps,
        strip_emulation_prevention,
    )

    # VisualSampleEntry: 78 fixed bytes, then child boxes (avcC, ...)
    avcc = _find(buf, e_start + 78, e_end, b"avcC")
    if avcc is None:
        raise ValueError("MP4 avc1 sample entry has no avcC box")
    sps_nals, pps_nals, length_size = parse_avcc(buf[avcc[0] : avcc[1]])
    if fourcc == b"avc1" and (not sps_nals or not pps_nals):
        raise ValueError(
            "H264: avc1 avcC carries no SPS/PPS (out-of-band parameter "
            "sets are mandatory for avc1; in-band is the avc3 shape)"
        )
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    for nal in sps_nals:
        s = parse_sps(strip_emulation_prevention(nal[1:]))
        sps_by_id[s["sps_id"]] = s
    for nal in pps_nals:
        p = parse_pps(strip_emulation_prevention(nal[1:]))
        pps_by_id[p["pps_id"]] = p
    ranges = _sample_ranges(buf, stbl)
    n = len(ranges)
    if n == 0:
        raise ValueError("MP4 video track has zero samples")
    for i, (off, size) in enumerate(ranges):
        blob = buf[off : off + size]
        if len(blob) < size:
            raise ValueError(f"sample {i}: offset table points outside mdat")
        yield i, n, decode_avcc_sample(blob, sps_by_id, pps_by_id,
                                       length_size)


# ------------------------------------------------------------------ encode


def _box(btype: bytes, body: bytes) -> bytes:
    return _U32B.pack(8 + len(body)) + btype + body


def _fbox(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, _U32B.pack((version << 24) | flags) + body)


def _visual_entry_fields(width: int, height: int) -> bytes:
    """The 78 fixed VisualSampleEntry bytes shared by every video fourcc."""
    return (
        b"\x00" * 6 + _U16B.pack(1)          # reserved, data_ref_index
        + b"\x00" * 16                        # pre_defined/reserved
        + _U16B.pack(width) + _U16B.pack(height)
        + _U32B.pack(0x00480000) * 2          # 72 dpi h/v resolution
        + _U32B.pack(0) + _U16B.pack(1)       # reserved, frame_count
        + b"\x00" * 32                        # compressorname
        + _U16B.pack(24) + _U16B.pack(0xFFFF)  # depth, pre_defined(-1)
    )


def encode_mp4_h264(frames: list, fps: int = 10) -> bytes:
    """Gray frames → a standards-shaped MP4 with an ``avc1`` track: the
    h264.py fixture encoder's I_PCM IDR slices as length-prefixed samples,
    SPS/PPS carried in the avcC configuration record.  Pairs with
    ``_iter_avc_frames`` the way ``encode_mp4_mjpeg`` pairs with the
    MJPEG lane."""
    from .h264 import (
        _build_idr_slice,
        _build_pps,
        _build_sps,
        _nal,
        build_avcc,
        validate_uniform_frames,
    )

    height, width, mono = validate_uniform_frames(frames)
    w_mbs = -(-width // 16)
    h_mbs = -(-height // 16)
    sps_nal = _nal(3, 7, _build_sps(width, height, mono))
    pps_nal = _nal(3, 8, _build_pps())
    samples = []
    for f in frames:
        nal = _nal(3, 5, _build_idr_slice(f, w_mbs, h_mbs, mono))
        samples.append(_U32B.pack(len(nal)) + nal)
    entry = _box(
        b"avc1",
        _visual_entry_fields(width, height)
        + _box(b"avcC", build_avcc(sps_nal, pps_nal)),
    )
    return _encode_mp4_video(samples, entry, width, height, fps)


def encode_mp4_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Encoded-JPEG frames → a standards-shaped progressive MP4 (ftyp,
    mdat, moov with full stsd/stts/stsc/stsz/stco sample tables).  Fixture
    writer for the video lane — pairs with ``jpeg.encode_jpeg_gray`` /
    ``encode_jpeg_rgb`` exactly as ``encode_avi_mjpeg`` does.
    """
    entry = _box(b"jpeg", _visual_entry_fields(width, height))
    return _encode_mp4_video(jpeg_frames, entry, width, height, fps)


def _encode_mp4_video(
    samples: list[bytes], entry_box: bytes, width: int, height: int,
    fps: int = 10
) -> bytes:
    """Shared MP4 muxer: samples + a ready SampleEntry box → ftyp/mdat/moov.

    Samples are grouped ≤3 per chunk so readers must actually expand the
    stsc first-chunk-run mapping (a single all-samples chunk would let a
    broken expansion pass fixtures).
    """
    n = len(samples)
    timescale = max(1, fps)
    ftyp = _box(b"ftyp", b"isom" + _U32B.pack(0x200) + b"isom" + b"mp41")

    # mdat follows ftyp; chunk offsets are absolute file offsets
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    data_start = len(ftyp) + 8

    spc = 3  # samples per chunk (last chunk may be short)
    chunk_offsets, pos = [], data_start
    for ci in range(0, n, spc):
        chunk_offsets.append(pos)
        pos += sum(len(f) for f in samples[ci : ci + spc])

    stsd = _fbox(b"stsd", 0, 0, _U32B.pack(1) + entry_box)
    stts = _fbox(b"stts", 0, 0, _U32B.pack(1) + _U32B.pack(n) + _U32B.pack(1))
    last_run = n - spc * ((n - 1) // spc) if n else spc
    stsc_rows = [(1, spc, 1)]
    if n and last_run != spc:
        stsc_rows.append((len(chunk_offsets), last_run, 1))
    stsc = _fbox(
        b"stsc", 0, 0,
        _U32B.pack(len(stsc_rows))
        + b"".join(struct.pack(">3I", *r) for r in stsc_rows),
    )
    stsz = _fbox(
        b"stsz", 0, 0,
        _U32B.pack(0) + _U32B.pack(n)
        + b"".join(_U32B.pack(len(f)) for f in samples),
    )
    stco = _fbox(
        b"stco", 0, 0,
        _U32B.pack(len(chunk_offsets))
        + b"".join(_U32B.pack(o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _fbox(
        b"dref", 0, 0, _U32B.pack(1) + _fbox(b"url ", 0, 1, b"")
    )
    minf = _box(
        b"minf",
        _fbox(b"vmhd", 0, 1, b"\x00" * 8) + _box(b"dinf", dref) + stbl,
    )
    hdlr = _fbox(
        b"hdlr", 0, 0,
        _U32B.pack(0) + b"vide" + b"\x00" * 12 + b"video\x00",
    )
    mdhd = _fbox(
        b"mdhd", 0, 0,
        _U32B.pack(0) * 2 + _U32B.pack(timescale) + _U32B.pack(n)
        + _U16B.pack(0x55C4) + _U16B.pack(0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    matrix = (
        _U32B.pack(0x00010000) + _U32B.pack(0) * 3
        + _U32B.pack(0x00010000) + _U32B.pack(0) * 3
        + _U32B.pack(0x40000000)
    )
    tkhd = _fbox(
        b"tkhd", 0, 7,  # enabled | in-movie | in-preview
        _U32B.pack(0) * 2 + _U32B.pack(1) + _U32B.pack(0) + _U32B.pack(n)
        + _U32B.pack(0) * 2 + _U16B.pack(0) * 4 + matrix
        + _U32B.pack(width << 16) + _U32B.pack(height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _fbox(
        b"mvhd", 0, 0,
        _U32B.pack(0) * 2 + _U32B.pack(timescale) + _U32B.pack(n)
        + _U32B.pack(0x00010000) + _U16B.pack(0x0100) + _U16B.pack(0)
        + _U32B.pack(0) * 2 + matrix + _U32B.pack(0) * 6 + _U32B.pack(2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
