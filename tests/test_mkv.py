"""Matroska/WebM reader (RFC 8794/9559): MJPEG frame extraction across
all four lacing modes, unknown-size (streaming-muxer) clusters,
multimodal routing, named codec seams, probe integration (frame count +
duration), hostile-input bounds."""

import numpy as np
import pytest

from tableextraction_spark.jpeg import decode_jpeg, encode_jpeg_gray
from tableextraction_spark.mkv import encode_mkv_mjpeg, iter_mkv_mjpeg_frames

H, W = 32, 48


def _frames(n=4, h=H, w=W):
    out = []
    for i in range(n):
        f = np.full((h, w), 240, np.uint8)
        f[4 + i : 10 + i, 6 : w - 8] = 30
        out.append(f)
    return out


def _jpgs(frames):
    return [encode_jpeg_gray(f, quality_div=8) for f in frames]


def _expected(frames):
    return [decode_jpeg(j) for j in _jpgs(frames)]


@pytest.mark.parametrize("lacing", ["none", "xiph", "fixed", "ebml"])
def test_mjpeg_frames_all_lacing_modes(lacing):
    frames = _frames()
    if lacing == "fixed":  # fixed lacing requires equal sizes
        frames = [frames[0]] * 4
    blob = encode_mkv_mjpeg(_jpgs(frames), W, H, lacing=lacing)
    got = list(iter_mkv_mjpeg_frames(blob))
    assert [i for i, _, _ in got] == list(range(4))
    assert all(n == 4 for _, n, _ in got)
    for (_, _, f), e in zip(got, _expected(frames)):
        assert np.array_equal(f, e)


@pytest.mark.parametrize("lacing", ["xiph", "ebml"])
def test_single_frame_laced_block(lacing):
    """Review regression: a 1-frame laced block stores NO size entries
    (sizes cover the first n-1 frames) — the reader must not consume the
    JPEG's leading 0xFF as a lace size vint."""
    frames = _frames(1)
    blob = encode_mkv_mjpeg(_jpgs(frames), W, H, lacing=lacing)
    got = list(iter_mkv_mjpeg_frames(blob))
    assert len(got) == 1
    assert np.array_equal(got[0][2], _expected(frames)[0])


def test_unknown_size_clusters_streaming_shape():
    """Review regression: unknown-size Clusters (the live/streaming muxer
    form) end at the next sibling, not the Segment end — every cluster's
    frames must be found, not just the first's."""
    frames = _frames(3)
    blob = encode_mkv_mjpeg(_jpgs(frames), W, H, streaming=True)
    got = list(iter_mkv_mjpeg_frames(blob))
    assert len(got) == 3
    for (_, _, f), e in zip(got, _expected(frames)):
        assert np.array_equal(f, e)
    from tableextraction_spark.probe import probe_bytes

    assert probe_bytes(blob)["n_frames"] == 3


def test_multimodal_routing_on_ebml_magic():
    from tableextraction_spark.multimodal import decode_video

    frames = _frames(3)
    out = decode_video(encode_mkv_mjpeg(_jpgs(frames), W, H))
    assert len(out) == 3
    assert np.array_equal(out[1], _expected(frames)[1])


def test_non_mjpeg_codec_raises_named_seam():
    from tableextraction_spark.multimodal import decode_video

    blob = encode_mkv_mjpeg([b"\x00" * 16], 8, 8, webm=True, codec_id="V_VP9")
    with pytest.raises(NotImplementedError, match="VP9"):
        decode_video(blob)
    blob = encode_mkv_mjpeg([b"\x00" * 16], 8, 8, codec_id="V_MPEG4/ISO/AVC")
    with pytest.raises(NotImplementedError, match="H.264"):
        decode_video(blob)


def test_truncated_and_garbage_raise_not_hang():
    blob = encode_mkv_mjpeg(_jpgs(_frames()), W, H)
    for cut in (3, 10, 60, len(blob) // 2):
        with pytest.raises(ValueError):
            list(iter_mkv_mjpeg_frames(blob[:cut]))
    with pytest.raises(ValueError):
        list(iter_mkv_mjpeg_frames(b"\x1aE\xdf\xa3" + b"\x00" * 32))


def test_no_video_track_raises():
    # audio-only: TrackType 2
    blob = bytearray(encode_mkv_mjpeg(_jpgs(_frames(1)), W, H))
    # flip the TrackType value byte (1 → 2); the writer emits id 0x83 +
    # 4-byte size vint (0x10000001) + the value byte
    i = blob.index(b"\x83\x10\x00\x00\x01\x01")
    blob[i + 5] = 2
    with pytest.raises(ValueError, match="no video track"):
        list(iter_mkv_mjpeg_frames(bytes(blob)))


def test_probe_mkv_reports_frames_dims_duration():
    from tableextraction_spark.probe import probe_bytes

    frames = _frames(5, h=40, w=56)
    out = probe_bytes(encode_mkv_mjpeg(_jpgs(frames), 56, 40, fps=10))
    assert out["format"] == "mkv"
    assert out["kind"] == "video"
    assert out["width"] == 56 and out["height"] == 40
    assert out["n_frames"] == 5
    assert out["duration_s"] == pytest.approx(0.5)
    assert out["codec"] == "V_MJPEG"


def test_probe_webm_doctype():
    from tableextraction_spark.probe import probe_bytes

    blob = encode_mkv_mjpeg([b"\x00" * 16], 8, 8, webm=True, codec_id="V_VP9")
    out = probe_bytes(blob)
    assert out["format"] == "webm"
    assert out["codec"] == "V_VP9"
    assert out["n_frames"] == 1  # structure walk counts even seam codecs
