"""MP4/ISO-BMFF video lane: the box walk + sample-table resolution
round-trips with the from-scratch JPEG codec, stsc first-chunk runs expand
correctly, hostile containers are bounded (no hang, no overrun), non-MJPEG
codecs and fragmented files raise named errors, and the multimodal router
sends ftyp payloads here."""

import struct

import numpy as np
import pytest

from tableextraction_spark import multimodal as mm
from tableextraction_spark.jpeg import encode_jpeg_gray, encode_jpeg_rgb
from tableextraction_spark.mp4 import (
    _box,
    _fbox,
    _sample_ranges,
    _U32B,
    encode_mp4_mjpeg,
    iter_mp4_mjpeg_frames,
)


def _gradient(h, w, shift=0):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 2 + y + shift * 16) % 256).astype(np.uint8)


def _mjpeg(n=4, h=48, w=64):
    frames = [_gradient(h, w, s) for s in range(n)]
    blobs = [encode_jpeg_gray(f) for f in frames]
    return frames, encode_mp4_mjpeg(blobs, w, h, fps=5)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 7])
def test_roundtrip_gray(n):
    # n=4/7 leave a short last chunk → the stsc two-run mapping is real
    frames, payload = _mjpeg(n=n)
    out = list(iter_mp4_mjpeg_frames(payload))
    assert [i for i, _n, _f in out] == list(range(n))
    assert all(nn == n for _i, nn, _f in out)
    for orig, (_i, _n, dec) in zip(frames, out):
        assert dec.shape == orig.shape
        assert np.abs(dec.astype(int) - orig.astype(int)).mean() < 5


def test_rgb_frames_reduce_to_luma():
    h, w = 32, 40
    rgb = np.dstack([_gradient(h, w, s) for s in range(3)])
    payload = encode_mp4_mjpeg([encode_jpeg_rgb(rgb)], w, h)
    [(_, n, dec)] = list(iter_mp4_mjpeg_frames(payload))
    assert n == 1 and dec.shape == (h, w) and dec.dtype == np.uint8
    px = rgb.astype(np.float64)
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert np.abs(dec.astype(float) - luma).mean() < 8


def test_router_sends_ftyp_to_mp4_lane():
    frames, payload = _mjpeg(n=3)
    out = list(mm.iter_video_frames(payload))
    assert len(out) == 3 and out[0][2].shape == frames[0].shape


def test_co64_offsets_resolve():
    # a minimal stbl with 64-bit chunk offsets, resolved directly
    sizes = [10, 20, 30]
    stsd = _fbox(b"stsd", 0, 0, _U32B.pack(1) + _box(b"jpeg", b"\x00" * 70))
    stsc = _fbox(b"stsc", 0, 0, _U32B.pack(1) + struct.pack(">3I", 1, 2, 1))
    stsz = _fbox(
        b"stsz", 0, 0,
        _U32B.pack(0) + _U32B.pack(3) + b"".join(_U32B.pack(s) for s in sizes),
    )
    co64 = _fbox(
        b"co64", 0, 0,
        _U32B.pack(2) + struct.pack(">Q", 1000) + struct.pack(">Q", 5000),
    )
    stbl = _box(b"stbl", stsd + stsc + stsz + co64)
    ranges = _sample_ranges(stbl, (8, len(stbl)))
    assert ranges == [(1000, 10), (1010, 20), (5000, 30)]


def test_fixed_sample_size_stsz():
    stsc = _fbox(b"stsc", 0, 0, _U32B.pack(1) + struct.pack(">3I", 1, 3, 1))
    stsz = _fbox(b"stsz", 0, 0, _U32B.pack(7) + _U32B.pack(3))
    stco = _fbox(b"stco", 0, 0, _U32B.pack(1) + _U32B.pack(100))
    stbl = _box(b"stbl", stsc + stsz + stco)
    assert _sample_ranges(stbl, (8, len(stbl))) == [
        (100, 7), (107, 7), (114, 7)
    ]


def test_fragmented_mp4_raises_named_error():
    _, payload = _mjpeg(n=1)
    with pytest.raises(ValueError, match="fragmented"):
        list(iter_mp4_mjpeg_frames(payload + _box(b"moof", b"")))


def test_unsupported_codec_raises_named_error():
    _, payload = _mjpeg(n=1)
    # rewrite the stsd sample-entry fourcc in place: MJPEG → HEVC
    # (layout: size 'stsd' verflags count entry_size fourcc → fourcc at +16)
    i = payload.index(b"stsd") + 16
    assert payload[i : i + 4] == b"jpeg"
    mutated = payload[:i] + b"hvc1" + payload[i + 4 :]
    with pytest.raises(ValueError, match="HEVC"):
        list(iter_mp4_mjpeg_frames(mutated))


def test_avc1_without_avcc_raises_named_error():
    # avc1 decodes natively now — but only with its avcC config record.
    # A bare fourcc swap produces an entry with no avcC child box.
    _, payload = _mjpeg(n=1)
    i = payload.index(b"stsd") + 16
    mutated = payload[:i] + b"avc1" + payload[i + 4 :]
    with pytest.raises(ValueError, match="avcC"):
        list(iter_mp4_mjpeg_frames(mutated))


def test_not_an_mp4():
    with pytest.raises(ValueError, match="ftyp"):
        list(iter_mp4_mjpeg_frames(b"\x00" * 32))


def test_no_moov():
    head = _box(b"ftyp", b"isom" + _U32B.pack(0) + b"isom")
    with pytest.raises(ValueError, match="moov"):
        list(iter_mp4_mjpeg_frames(head + _box(b"mdat", b"x" * 8)))


def test_truncated_table_raises_not_hangs():
    _, payload = _mjpeg(n=4)
    # chop mid-moov: some table's declared count now exceeds its bytes
    with pytest.raises(ValueError):
        list(iter_mp4_mjpeg_frames(payload[: len(payload) - 30]))


def test_garbage_box_size_cannot_loop():
    # a box declaring size 3 (< 8) must terminate the walk (its clamped
    # empty body has no video track), not spin
    head = _box(b"ftyp", b"isom" + _U32B.pack(0) + b"isom")
    evil = head + _U32B.pack(3) + b"moov" + b"\x00" * 64
    with pytest.raises(ValueError, match="video track"):
        list(iter_mp4_mjpeg_frames(evil))


def test_offset_past_mdat_is_named_per_sample():
    _, payload = _mjpeg(n=1)
    # corrupt the single stco offset to point past EOF
    i = payload.index(b"stco")
    mutated = bytearray(payload)
    struct.pack_into(">I", mutated, i + 4 + 4 + 4, len(payload) + 100)
    with pytest.raises(ValueError, match="sample 0"):
        list(iter_mp4_mjpeg_frames(bytes(mutated)))


def test_probe_reports_mp4_frame_count():
    from tableextraction_spark.probe import probe_bytes

    _, payload = _mjpeg(n=5, h=24, w=32)
    p = probe_bytes(payload)
    assert p["format"] == "mp4" and p["kind"] == "video"
    assert p["n_frames"] == 5
    assert (p["width"], p["height"]) == (32, 24)
    assert abs(p["duration_s"] - 1.0) < 1e-9  # 5 frames @ 5 fps
