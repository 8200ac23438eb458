"""AVI (RIFF) container with MJPEG frames — the real-video lane.

Same no-library standard as PNG/JPEG/WAV/PDF: AVI-1.0 is a plain RIFF
chunk walk (Microsoft "AVI RIFF File Reference", public spec) and MJPEG
frames are ordinary JFIF payloads, so the existing from-scratch JPEG
codec (``jpeg.py``) decodes them — no ffmpeg/pyav needed.  This narrows
``multimodal.iter_video_frames``'s stub seam to genuinely-library-bound
codecs (MP4/H.264, MKV/VP9, WebM).

Scope: 'vids' streams whose frame chunks (``##dc``/``##db``) carry JPEG
bytes (fccHandler MJPG — the standard motion-JPEG-in-AVI layout).  Other
codecs raise ``ValueError`` naming the fourcc, which the mapInPandas
stages capture per-row (pipeline failure-isolation rule, SURVEY §3).
Hostile/truncated containers are bounded: every chunk size is clamped to
the buffer, the frame walk never loops (offset strictly advances), and a
declared-vs-actual frame-count mismatch is tolerated (actual wins).

Reference parity note: the reference (DikovAlexandr/TableExtraction)
handles images only; video is an engine-side corpus capability, not a
port.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

_U32 = struct.Struct("<I")

# MainAVIHeader: µs/frame, maxbytes/s, padding, flags, totalframes,
# initialframes, streams, sugbufsize, width, height, reserved[4]
_AVIH = struct.Struct("<14I")
# AVIStreamHeader: fccType, fccHandler, flags, prio+lang, initialframes,
# scale, rate, start, length, sugbufsize, quality, samplesize, rcFrame
_STRH = struct.Struct("<4s4sIIIIIIIIII4H")
# BITMAPINFOHEADER
_BMIH = struct.Struct("<IiiHH4sIiiII")

AVIF_HASINDEX = 0x10


def _luma(img: np.ndarray) -> np.ndarray:
    """H×W passes through; H×W×3 RGB reduces to BT.601 luma (the pipeline's
    page arrays are grayscale) — the shared float conversion in media.py
    (an earlier integer version here wrapped at uint8: 150·g overflows)."""
    from .media import rgb_to_gray

    return rgb_to_gray(img)


# ------------------------------------------------------------------ decode


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each chunk in [start, end);
    sizes are clamped to the buffer so hostile lengths cannot overrun, and
    the offset strictly advances so a zero/garbage size cannot loop."""
    pos = start
    while pos + 8 <= end:
        fcc = buf[pos : pos + 4]
        (size,) = _U32.unpack_from(buf, pos + 4)
        body = pos + 8
        stop = min(body + size, end)
        yield fcc, body, stop
        pos = body + size + (size & 1)  # chunks are word-aligned
        if pos <= body:  # overflow/garbage: refuse to loop
            break


def _is_frame_chunk(fcc: bytes) -> bool:
    """``##dc`` (compressed) / ``##db`` (uncompressed DIB slot — MJPEG
    writers use both) for any stream number.  Stream numbers are two
    ASCII *hex* digits (OpenDML §'Stream name'): stream 10 writes
    ``0Adc``, so digit-only matching would silently skip streams ≥ 10."""
    return (
        fcc[2:4] in (b"dc", b"db")
        and all(c in b"0123456789ABCDEFabcdef" for c in fcc[:2])
    )


def iter_avi_mjpeg_frames(payload: bytes) -> Iterator[tuple[int, int, np.ndarray]]:
    """AVI bytes → lazily yield (frame_no, n_frames, uint8 H×W gray frame).

    One decoded frame lives at a time (same contract as
    ``multimodal.iter_video_frames``).  n_frames is the ACTUAL number of
    frame chunks in ``movi`` (counted by a header-only walk, no decode);
    a lying ``avih.dwTotalFrames`` is ignored.
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError(f"not an AVI: {buf[:4]!r}/{buf[8:12]!r}")
    (riff_size,) = _U32.unpack_from(buf, 4)
    end = min(8 + riff_size, len(buf))

    movi: tuple[int, int] | None = None
    for fcc, body, stop in _chunks(buf, 12, end):
        if fcc == b"LIST" and buf[body : body + 4] == b"movi":
            movi = (body + 4, stop)
            break
    if movi is None:
        raise ValueError("AVI has no movi list")

    # frame chunks sit directly in movi OR grouped inside 'rec ' LISTs (the
    # spec's interleave grouping for streaming/CD layout) — descend one level
    frames: list[tuple[int, int]] = []
    for fcc, body, stop in _chunks(buf, movi[0], movi[1]):
        if fcc == b"LIST" and buf[body : body + 4] == b"rec ":
            frames.extend(
                (b2, s2)
                for fcc2, b2, s2 in _chunks(buf, body + 4, stop)
                if _is_frame_chunk(fcc2)
            )
        elif _is_frame_chunk(fcc):
            frames.append((body, stop))
    n = len(frames)
    if n == 0:
        # an all-audio or unrecognized-layout AVI must surface as a per-row
        # error, not silently vanish from the frame-sample output
        raise ValueError("AVI movi list contains no video frame chunks")
    from .jpeg import decode_jpeg

    for i, (body, stop) in enumerate(frames):
        blob = buf[body:stop]
        if blob[:2] != b"\xff\xd8":
            raise ValueError(
                f"frame {i}: not MJPEG (magic {blob[:2]!r}) — other AVI "
                f"codecs need ffmpeg/pyav at deploy time"
            )
        yield i, n, _luma(decode_jpeg(blob))


# ------------------------------------------------------------------ encode


def _chunk(fcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fcc + _U32.pack(len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Encoded-JPEG frames → a standards-shaped AVI-1.0 file (RIFF header,
    ``hdrl`` with avih/strh/strf, ``movi`` with ``00dc`` chunks, ``idx1``
    index).  Fixture writer for the video lane — pairs with
    ``jpeg.encode_jpeg_gray``/``encode_jpeg_rgb`` exactly as ``encode_wav``
    pairs with the WAV decoder."""
    n = len(jpeg_frames)
    maxbuf = max((len(f) for f in jpeg_frames), default=0)

    avih = _AVIH.pack(
        1_000_000 // max(1, fps), maxbuf * fps, 0, AVIF_HASINDEX,
        n, 0, 1, maxbuf, width, height, 0, 0, 0, 0,
    )
    strh = _STRH.pack(
        b"vids", b"MJPG", 0, 0, 0, 1, max(1, fps), 0, n, maxbuf,
        0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = _BMIH.pack(40, width, height, 1, 24, b"MJPG",
                      width * height * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx = []
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx.append(b"00dc" + _U32.pack(0x10) + _U32.pack(len(movi_body)) + _U32.pack(len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", b"".join(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _U32.pack(len(body)) + body
