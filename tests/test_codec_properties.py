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
