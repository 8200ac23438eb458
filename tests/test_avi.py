"""AVI/MJPEG video lane: the RIFF container walk round-trips with the
from-scratch JPEG codec, hostile containers are bounded (no hang, no
overrun), non-MJPEG codecs raise named errors, and the multimodal
frame-sampling stage consumes real AVI payloads with per-row isolation."""

import numpy as np
import pytest

from tableextraction_spark import multimodal as mm
from tableextraction_spark.avi import (
    _U32,
    encode_avi_mjpeg,
    iter_avi_mjpeg_frames,
)
from tableextraction_spark.jpeg import encode_jpeg_gray, encode_jpeg_rgb


def _gradient(h, w, shift=0):
    """Smooth content — JPEG error stays small, unlike random noise."""
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 2 + y + shift * 16) % 256).astype(np.uint8)


def _mjpeg(n=4, h=48, w=64):
    frames = [_gradient(h, w, s) for s in range(n)]
    blobs = [encode_jpeg_gray(f) for f in frames]
    return frames, encode_avi_mjpeg(blobs, w, h, fps=5)


def test_roundtrip_gray():
    frames, payload = _mjpeg()
    out = list(iter_avi_mjpeg_frames(payload))
    assert [i for i, _n, _f in out] == [0, 1, 2, 3]
    assert all(n == 4 for _i, n, _f in out)
    for orig, (_i, _n, dec) in zip(frames, out):
        assert dec.shape == orig.shape
        assert np.abs(dec.astype(int) - orig.astype(int)).mean() < 5


def test_rgb_frames_reduce_to_luma():
    h, w = 32, 40
    rgb = np.dstack([_gradient(h, w, s) for s in range(3)])
    payload = encode_avi_mjpeg([encode_jpeg_rgb(rgb)], w, h)
    [(_, n, dec)] = list(iter_avi_mjpeg_frames(payload))
    assert n == 1 and dec.shape == (h, w) and dec.dtype == np.uint8
    px = rgb.astype(np.float64)
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert np.abs(dec.astype(float) - luma).mean() < 8


def test_uniform_rgb_luma_has_no_integer_wraparound():
    # regression: an integer 77/150/29 luma computed in uint8 wrapped
    # (uniform RGB 200 decoded to ~61); the shared float path must not
    h, w = 16, 16
    rgb = np.full((h, w, 3), 200, dtype=np.uint8)
    payload = encode_avi_mjpeg([encode_jpeg_rgb(rgb)], w, h)
    [(_, _n, dec)] = list(iter_avi_mjpeg_frames(payload))
    assert abs(float(dec.mean()) - 200.0) < 6


def test_rec_list_interleave_grouping():
    # spec-valid layout: frame chunks grouped inside 'rec ' LISTs
    from tableextraction_spark.avi import _chunk, _list

    frames = [_gradient(16, 16, s) for s in range(3)]
    recs = b""
    for f in frames:
        recs += _list(b"rec ", _chunk(b"00dc", encode_jpeg_gray(f)))
    body = b"AVI " + b"LIST" + _U32.pack(4 + len(recs)) + b"movi" + recs
    payload = b"RIFF" + _U32.pack(len(body)) + body
    out = list(iter_avi_mjpeg_frames(payload))
    assert len(out) == 3 and all(n == 3 for _i, n, _f in out)


def test_no_video_chunks_is_error_not_silence():
    # an all-audio AVI ('01wb' chunks only) must error per-row, not vanish
    raw = b"01wb" + _U32.pack(8) + b"\x00" * 8
    body = b"AVI " + b"LIST" + _U32.pack(4 + len(raw)) + b"movi" + raw
    payload = b"RIFF" + _U32.pack(len(body)) + body
    with pytest.raises(ValueError, match="no video frame chunks"):
        list(iter_avi_mjpeg_frames(payload))


def test_actual_frame_count_beats_lying_header():
    # corrupt avih.dwTotalFrames (offset: RIFF(12) + LIST hdr(12) + avih hdr(8)
    # + 4 u32 fields) — the iterator counts movi chunks, ignoring the header
    _frames, payload = _mjpeg(n=3)
    buf = bytearray(payload)
    buf[12 + 12 + 8 + 16 : 12 + 12 + 8 + 20] = _U32.pack(999)
    out = list(iter_avi_mjpeg_frames(bytes(buf)))
    assert len(out) == 3 and all(n == 3 for _i, n, _f in out)


def test_odd_length_frames_stay_word_aligned():
    # force an odd-sized JPEG blob: append one byte after EOI (decoders must
    # ignore trailing garbage; the chunk walk must pad to word boundaries)
    f = _gradient(16, 16)
    blob = encode_jpeg_gray(f)
    if len(blob) % 2 == 0:
        blob += b"\x00"
    payload = encode_avi_mjpeg([blob, encode_jpeg_gray(f)], 16, 16)
    out = list(iter_avi_mjpeg_frames(payload))
    assert len(out) == 2


def test_not_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        list(iter_avi_mjpeg_frames(b"RIFF\x08\x00\x00\x00WAVE"))
    with pytest.raises(ValueError, match="not an AVI"):
        list(iter_avi_mjpeg_frames(b"\x00" * 32))


def test_no_movi_raises():
    body = b"AVI " + b"JUNK" + _U32.pack(4) + b"\x00" * 4
    with pytest.raises(ValueError, match="no movi"):
        list(iter_avi_mjpeg_frames(b"RIFF" + _U32.pack(len(body)) + body))


def test_non_mjpeg_codec_is_named_error():
    raw = b"00dc" + _U32.pack(8) + b"\x00" * 8  # not JPEG magic
    body = b"AVI " + b"LIST" + _U32.pack(4 + len(raw)) + b"movi" + raw
    payload = b"RIFF" + _U32.pack(len(body)) + body
    with pytest.raises(ValueError, match="not MJPEG"):
        list(iter_avi_mjpeg_frames(payload))


def test_hostile_chunk_sizes_never_hang_or_overrun():
    # declared chunk size far beyond the buffer: clamped, walk terminates
    raw = b"00dc" + _U32.pack(0xFFFFFFF0) + encode_jpeg_gray(_gradient(8, 8))
    body = b"AVI " + b"LIST" + _U32.pack(4 + len(raw)) + b"movi" + raw
    payload = b"RIFF" + _U32.pack(0xFFFFFFF0) + body
    out = list(iter_avi_mjpeg_frames(payload))
    assert len(out) == 1  # clamped to buffer end, decoded, done


def test_truncated_mid_frame_is_value_error_not_hang():
    _frames, payload = _mjpeg(n=2)
    with pytest.raises(ValueError):
        list(iter_avi_mjpeg_frames(payload[: len(payload) // 2]))


# --- multimodal routing ---

def test_decode_video_routes_avi():
    frames, payload = _mjpeg(n=3)
    out = mm.decode_video(payload)
    assert len(out) == 3
    assert np.abs(out[0].astype(int) - frames[0].astype(int)).mean() < 5


def test_wave_riff_in_video_path_is_value_error():
    pcm = np.zeros(64, dtype=np.int16)
    with pytest.raises(ValueError, match="not AVI"):
        mm.decode_video(mm.encode_wav(pcm, 8000))


def test_mp4_and_mkv_route_to_native_lanes():
    # MP4 structure now parses natively (mp4.py): a headerless ftyp stub is
    # a malformed container (ValueError), not a library seam any more
    with pytest.raises(ValueError, match="moov"):
        mm.decode_video(b"\x00\x00\x00\x18ftypisom")
    # MKV/WebM structure parses natively too (mkv.py): a trackless EBML
    # stub is a malformed container, not a library seam — only non-MJPEG
    # CODECS remain library-bound (pinned in test_mkv.py)
    with pytest.raises(ValueError):
        mm.decode_video(b"\x1a\x45\xdf\xa3" + b"\x00" * 16)


def test_sample_frames_over_real_avi(spark):
    """End-to-end: mixed AVI + VID1 + corrupt rows through the Spark stage —
    real-container frames sample correctly, corruption isolates per-row."""
    _frames, avi = _mjpeg(n=6, h=24, w=32)
    vid1 = mm.encode_video([_gradient(24, 32, s) for s in range(4)])
    df = spark.createDataFrame(
        [("avi", bytearray(avi)), ("vid1", bytearray(vid1)),
         ("bad", bytearray(b"RIFFxxxxAVI garbage"))],
        "media_ref string, content binary",
    )
    got = mm.sample_frames(df, every_n=2).collect()
    by_ref = {}
    for r in got:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert [r.frame_no for r in sorted(by_ref["avi"], key=lambda r: r.frame_no)] == [0, 2, 4]
    assert all(r.n_frames == 6 and r.error is None for r in by_ref["avi"])
    assert [r.frame_no for r in sorted(by_ref["vid1"], key=lambda r: r.frame_no)] == [0, 2]
    [bad] = by_ref["bad"]
    assert bad.error and bad.content is None


def test_hex_stream_ids_are_frame_chunks():
    """AVI stream numbers are two ASCII *hex* chars (OpenDML): stream 10
    writes '0Adc'.  Digit-only matching silently dropped streams >= 10
    (ADVICE r3)."""
    from tableextraction_spark.avi import _is_frame_chunk

    assert _is_frame_chunk(b"0Adc") and _is_frame_chunk(b"1fdb")
    assert not _is_frame_chunk(b"zQdc") and not _is_frame_chunk(b"00dd")
    # end-to-end: relabel the encoder's stream 00 to 0A everywhere
    frames, payload = _mjpeg(n=2)
    patched = payload.replace(b"00dc", b"0Adc")
    out = list(iter_avi_mjpeg_frames(patched))
    assert [i for i, _n, _f in out] == [0, 1]
    for orig, (_i, _n, dec) in zip(frames, out):
        assert np.abs(dec.astype(int) - orig.astype(int)).mean() < 5
