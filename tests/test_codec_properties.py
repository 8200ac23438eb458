"""Hypothesis property tests for the lossless from-scratch codecs: ANY
image round-trips GIF and BMP exactly; ANY int16 PCM round-trips FLAC
exactly in both subframe modes; the probe never raises on arbitrary bytes.
Fixed-seed tests pin known cases — these sweep the input space."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tableextraction_spark.bmp import decode_bmp, encode_bmp_gray
from tableextraction_spark.flac import decode_flac, encode_flac
from tableextraction_spark.gif import decode_gif, encode_gif_gray
from tableextraction_spark.probe import probe_bytes


@st.composite
def gray_images(draw):
    h = draw(st.integers(min_value=1, max_value=40))
    w = draw(st.integers(min_value=1, max_value=40))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


@st.composite
def pcm_signals(draw):
    n = draw(st.integers(min_value=1, max_value=4000))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.default_rng(seed).integers(-32768, 32768, n, dtype=np.int16)


@settings(max_examples=40, deadline=None)
@given(gray_images(), st.booleans())
def test_gif_roundtrip_any_image(img, interlace):
    assert np.array_equal(decode_gif(encode_gif_gray(img, interlace=interlace)), img)


@settings(max_examples=40, deadline=None)
@given(gray_images())
def test_bmp_roundtrip_any_image(img):
    assert np.array_equal(decode_bmp(encode_bmp_gray(img)), img)


@settings(max_examples=25, deadline=None)
@given(pcm_signals(), st.sampled_from(["verbatim", "fixed"]),
       st.integers(min_value=16, max_value=1024))
def test_flac_roundtrip_any_pcm(pcm, mode, block):
    out, rate = decode_flac(encode_flac(pcm, 8000, block_size=block, subframe=mode))
    assert rate == 8000 and np.array_equal(out, pcm)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_probe_never_raises_on_arbitrary_bytes(blob):
    d = probe_bytes(blob)
    assert isinstance(d["format"], str)  # classified, not crashed


@st.composite
def bilevel_images(draw):
    h = draw(st.integers(min_value=1, max_value=36))
    w = draw(st.integers(min_value=1, max_value=36))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    density = draw(st.sampled_from([0.05, 0.3, 0.5, 0.95]))
    rng = np.random.default_rng(seed)
    return (rng.random((h, w)) < density).astype(np.uint8)


@settings(max_examples=30, deadline=None)
@given(bilevel_images(), st.integers(min_value=0, max_value=3),
       st.booleans(), st.booleans())
def test_jbig2_generic_roundtrip_any_bitmap(bm, template, tpgdon, mmr):
    from tableextraction_spark.jbig2 import (
        decode_jbig2_embedded,
        encode_jbig2_generic,
    )

    if mmr:
        stream = encode_jbig2_generic(bm, mmr=True)
    else:
        stream = encode_jbig2_generic(bm, template=template, tpgdon=tpgdon)
    assert np.array_equal(decode_jbig2_embedded(stream), bm)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_jbig2_arbitrary_bytes_raise_named_errors_not_hang(blob):
    from tableextraction_spark.jbig2 import decode_jbig2_embedded

    try:
        decode_jbig2_embedded(blob)
    except (ValueError, NotImplementedError):
        pass  # named per-row error classes; anything else fails the test


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=6),
       st.sampled_from(["none", "xiph", "ebml"]), st.booleans(),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_mkv_roundtrip_any_clip(n, lacing, streaming, seed):
    from tableextraction_spark.jpeg import decode_jpeg, encode_jpeg_gray
    from tableextraction_spark.mkv import encode_mkv_mjpeg, iter_mkv_mjpeg_frames

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (16, 24), dtype=np.uint8) for _ in range(n)]
    jpgs = [encode_jpeg_gray(f, quality_div=8) for f in frames]
    got = list(iter_mkv_mjpeg_frames(
        encode_mkv_mjpeg(jpgs, 24, 16, lacing=lacing, streaming=streaming)
    ))
    assert len(got) == n
    for (_, total, f), j in zip(got, jpgs):
        assert total == n
        assert np.array_equal(f, decode_jpeg(j))
