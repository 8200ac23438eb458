"""Multimodal mapInPandas plumbing: codecs round-trip, resize/frame-sample/
audio-feature stages produce correct schemas and values, real-format decode
is a clear NotImplementedError stub, and failures are per-row isolated."""

import numpy as np
import pytest

from tableextraction_spark import multimodal as mm


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


# --- codec units (no Spark) ---

def test_audio_codec_roundtrip():
    pcm = (np.sin(np.linspace(0, 100, 16000)) * 20000).astype(np.int16)
    out, rate = mm.decode_audio(mm.encode_audio(pcm, 8000))
    assert rate == 8000 and np.array_equal(out, pcm)


def test_video_codec_roundtrip():
    frames = [_img(12, 10, s) for s in range(5)]
    out = mm.decode_video(mm.encode_video(frames))
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


@pytest.mark.parametrize(
    "fn,payload",
    [
        (mm.decode_audio, b"ID3\x04" + b"\0" * 64),  # MP3 (ID3 tag) magic
        (mm.decode_video, b"\x00\x00\x00\x18ftyp"),  # real MP4 box
    ],
)
def test_real_formats_are_stubbed(fn, payload):
    with pytest.raises(NotImplementedError, match="requires"):
        fn(payload)


# --- real WAV (RIFF/WAVE via stdlib wave — no longer a stub) ---

def test_wav_roundtrip_mono16():
    pcm = (np.sin(np.linspace(0, 100, 16000)) * 20000).astype(np.int16)
    out, rate = mm.decode_audio(mm.encode_wav(pcm, 8000))
    assert rate == 8000 and np.array_equal(out, pcm)


def test_wav_stereo_downmixes_to_channel_mean():
    left = np.array([1000, 2000, -3000, 0], dtype=np.int16)
    right = np.array([3000, 0, -1000, 0], dtype=np.int16)
    interleaved = np.empty(8, dtype=np.int16)
    interleaved[0::2], interleaved[1::2] = left, right
    out, rate = mm.decode_audio(mm.encode_wav(interleaved, 44100, n_channels=2))
    assert rate == 44100
    assert np.array_equal(out, ((left.astype(np.int32) + right) // 2).astype(np.int16))


def test_wav_8bit_rescales_to_int16():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128, 255, 0, 128]))  # 8-bit WAV is unsigned
    out, rate = mm.decode_audio(buf.getvalue())
    assert rate == 8000
    assert list(out) == [0, 127 << 8, -128 << 8, 0]


def test_wav_garbage_riff_is_value_error():
    with pytest.raises(ValueError, match="WAV"):
        mm.decode_audio(b"RIFF" + b"\0" * 64)


def test_wav_unsupported_width_is_value_error():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)  # 24-bit: out of the PCM 8/16 contract
        w.setframerate(8000)
        w.writeframes(b"\x00" * 12)
    with pytest.raises(ValueError, match="sample width"):
        mm.decode_audio(buf.getvalue())


def test_audio_features_over_real_wav_end_to_end(spark):
    """The Spark audio-feature stage over REAL WAV payloads: values match the
    AUD1 path exactly for identical PCM; garbage RIFF is a per-row error."""
    pcm = np.full(8000, 16384, dtype=np.int16)  # DC: rms 0.5, zcr 0, 1 s
    df = _media_df(
        spark,
        [
            ("wav", mm.encode_wav(pcm, 8000)),
            ("aud1", mm.encode_audio(pcm, 8000)),
            ("badriff", b"RIFF" + b"\0" * 16),
        ],
    )
    rows = {r.media_ref: r for r in mm.audio_features(df).collect()}
    for ref in ("wav", "aud1"):
        r = rows[ref]
        assert r.error is None and r.sample_rate == 8000
        assert r.duration_s == pytest.approx(1.0)
        assert r.rms == pytest.approx(0.5) and r.zero_crossing_rate == 0.0
    assert rows["badriff"].error.startswith("ValueError")


# --- Spark stages ---

def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_ref string, content binary")


def test_resize_images(spark):
    img = _img(40, 60)
    df = _media_df(spark, [("m1", mm.encode_image(img))])
    out = mm.resize_images(df, 30, 20).collect()
    assert [(r.media_ref, r.width, r.height) for r in out] == [("m1", 30, 20)]
    resized = mm.decode_image(bytes(out[0].content))
    assert resized.shape == (20, 30)
    # nearest-neighbor: corner pixels survive exactly
    assert resized[0, 0] == img[0, 0]


def test_sample_frames_explodes_1_to_n(spark):
    frames = [np.full((4, 4), i, dtype=np.uint8) for i in range(10)]
    df = _media_df(
        spark,
        [("v1", mm.encode_video(frames)), ("v2", mm.encode_video(frames[:3]))],
    )
    out = mm.sample_frames(df, every_n=3).collect()
    got = sorted((r.media_ref, r.frame_no) for r in out)
    assert got == [("v1", 0), ("v1", 3), ("v1", 6), ("v1", 9), ("v2", 0)]
    by_key = {(r.media_ref, r.frame_no): r for r in out}
    f3 = mm.decode_image(bytes(by_key[("v1", 3)].content))
    assert f3[0, 0] == 3 and by_key[("v1", 3)].n_frames == 10


def test_audio_features_and_error_isolation(spark):
    pcm = np.full(8000, 16384, dtype=np.int16)  # DC: rms 0.5, zcr 0, 1 s
    df = _media_df(
        spark,
        [("a1", mm.encode_audio(pcm, 8000)), ("bad", b"ID3\x04" + b"\0" * 16)],
    )
    rows = {r.media_ref: r for r in mm.audio_features(df).collect()}
    ok = rows["a1"]
    assert ok.error is None
    assert ok.sample_rate == 8000 and ok.duration_s == pytest.approx(1.0)
    assert ok.rms == pytest.approx(0.5) and ok.zero_crossing_rate == 0.0
    # the undecodable row is captured, not a task failure
    assert rows["bad"].error.startswith("NotImplementedError")


def test_audio_zero_sample_rate_is_row_error(spark):
    # corrupt header (rate=0) must become a per-row error, not a crash
    payload = mm._AUD_HEADER.pack(mm.AUD_MAGIC, 0) + b"\x00\x00" * 8
    df = _media_df(spark, [("z", payload)])
    row = mm.audio_features(df).collect()[0]
    assert row.error.startswith("ValueError")


def test_resize_images_error_isolation(spark):
    # one good image + one real-JPEG payload: the bad row is captured,
    # the good row still resizes (no task failure)
    df = _media_df(
        spark,
        [("ok", mm.encode_image(_img(8, 8))), ("jpg", b"\xff\xd8\xff\xe0" + b"\0" * 32)],
    )
    rows = {r.media_ref: r for r in mm.resize_images(df, 4, 4).collect()}
    assert rows["ok"].error is None and rows["ok"].content is not None
    assert rows["jpg"].error is not None and rows["jpg"].content is None


def test_sample_frames_error_isolation(spark):
    frames = [np.full((2, 2), 7, dtype=np.uint8)]
    df = _media_df(
        spark,
        [("v", mm.encode_video(frames)), ("mp4", b"\x00\x00\x00\x18ftyp" + b"\0" * 16)],
    )
    rows = mm.sample_frames(df, every_n=1).collect()
    by_ref = {r.media_ref: r for r in rows}
    assert by_ref["v"].error is None and by_ref["v"].frame_no == 0
    # a headerless ftyp stub now parses natively far enough to be called
    # malformed (mp4.py), still isolated per-row
    assert by_ref["mp4"].error.startswith("ValueError")
    assert "moov" in by_ref["mp4"].error
    assert by_ref["mp4"].frame_no == -1 and by_ref["mp4"].content is None


def test_sample_frames_flushes_in_bounded_chunks(spark):
    # 150 sampled frames crosses the 64-row flush boundary twice
    frames = [np.full((2, 2), i % 251, dtype=np.uint8) for i in range(150)]
    df = _media_df(spark, [("big", mm.encode_video(frames))])
    out = mm.sample_frames(df, every_n=1).collect()
    assert len(out) == 150
    assert sorted(r.frame_no for r in out) == list(range(150))
    assert all(r.n_frames == 150 for r in out)


def test_resize_images_routes_real_formats(spark):
    """resize over a mixed IMG1/PNG/JPEG/GIF batch: every real format
    decodes via the magic-routed decode_page path; garbage isolates."""
    import numpy as np
    from tableextraction_spark.gif import encode_gif_gray
    from tableextraction_spark.jpeg import encode_jpeg_gray
    from tableextraction_spark.png import encode_png

    img = _img(40, 30, seed=5)
    rows = [
        ("img1", bytearray(mm.encode_image(img))),
        ("png", bytearray(encode_png(img))),
        ("jpeg", bytearray(encode_jpeg_gray(img))),
        ("gif", bytearray(encode_gif_gray(img))),
        ("junk", bytearray(b"\x00\x01\x02\x03garbage")),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r.media_ref: r for r in mm.resize_images(df, 10, 8).collect()}
    for ref in ("img1", "png", "jpeg", "gif"):
        r = got[ref]
        assert r.error is None and (r.width, r.height) == (10, 8)
        out = mm.decode_image(bytes(r.content))
        assert out.shape == (8, 10)
    assert got["junk"].error and got["junk"].content is None


def test_ogg_vorbis_routes_through_decode_audio():
    """OggS magic routes to the from-scratch Vorbis decoder; sample count
    is granule-exact so duration features are exact."""
    from tableextraction_spark.vorbis import encode_vorbis_ogg, expected_synthesis

    pcm = ((np.arange(3000) * 37) % 4096 - 2048).astype(np.int16)
    out, rate = mm.decode_audio(encode_vorbis_ogg(pcm, 8000))
    assert rate == 8000 and len(out) == 3000
    exp = np.clip(
        np.rint(expected_synthesis(pcm)[0] * 32768.0), -32768, 32767
    ).astype(np.int16)
    assert np.array_equal(out, exp)
