"""From-scratch baseline JPEG codec: encode→decode round-trip quality,
marker/feature guards, decode_page routing, and pipeline span equality over
JPEG page payloads (lossy-aware: the glyph decoder must still read the text)."""

import numpy as np
import pytest

from tableextraction_spark.jpeg import decode_jpeg, encode_jpeg_gray
from tableextraction_spark.media import decode_page


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_flat_block_roundtrip_exact():
    # a uniform image is DC-only: quantization loses nothing
    img = np.full((16, 16), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img))
    assert out.shape == (16, 16)
    assert int(np.abs(out.astype(int) - 200).max()) <= 1


def test_document_like_page_high_fidelity():
    # black grid lines + text-ish ink on white — the actual workload; lossy
    # but must stay near-exact for binarization (threshold 200) to survive
    img = np.full((64, 96), 255, dtype=np.uint8)
    img[10:12, 5:90] = 0
    img[40:42, 5:90] = 0
    img[10:42, 5:7] = 0
    img[10:42, 88:90] = 0
    out = decode_jpeg(encode_jpeg_gray(img))
    assert out.shape == img.shape
    # ink stays ink, paper stays paper after the fixed-200 threshold
    assert ((out <= 200) == (img <= 200)).mean() > 0.97


def test_noise_roundtrip_bounded_error():
    img = _img(24, 40, seed=3)
    out = decode_jpeg(encode_jpeg_gray(img))
    # Annex-K quality (~50): noise is the worst case; error bounded, not exact
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 30


def test_non_multiple_of_8_dimensions():
    img = _img(13, 21, seed=5)
    out = decode_jpeg(encode_jpeg_gray(img))
    assert out.shape == (13, 21)


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_progressive_rejected_by_name():
    # swap SOF0 marker for SOF2 (progressive) in a valid stream
    buf = bytearray(encode_jpeg_gray(np.full((8, 8), 128, dtype=np.uint8)))
    idx = bytes(buf).find(b"\xff\xc0")
    buf[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(buf))


def test_decode_page_routes_jpeg():
    img = np.full((24, 24), 255, dtype=np.uint8)
    img[8:10, 2:22] = 0
    out = decode_page(encode_jpeg_gray(img))
    assert out.shape == (24, 24)
    assert ((out <= 200) == (img <= 200)).mean() > 0.95


def test_extract_spans_equality_over_jpeg_corpus(spark):
    """Full pipeline over REAL (lossy) JPEG page payloads still matches the
    golden spans — grid lines and 5×7 glyphs survive Annex-K quantization."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, DOCS_SCHEMA, extract_spans

    docs, blobs, expected = gen_corpus(4, codec="jpeg")
    assert all(bytes(b["content"][:2]) == b"\xff\xd8" for b in blobs)
    docs_df = spark.createDataFrame(docs, DOCS_SCHEMA).repartition(4)
    blobs_df = spark.createDataFrame(blobs, BLOBS_SCHEMA).repartition(4)
    out = {r.doc_id: r for r in extract_spans(spark, docs_df, blobs_df).collect()}
    for e in expected:
        got = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in sorted(out[e["doc_id"]].spans, key=lambda s: s.offset)
        ]
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in e["spans"]]
        assert got == exp, f"span mismatch in {e['doc_id']}"


def test_rgb_420_roundtrip():
    """Color 4:2:0 exercises the interleaved-MCU decode + chroma upsample."""
    from tableextraction_spark.jpeg import encode_jpeg_rgb

    img = np.zeros((20, 28, 3), dtype=np.uint8)
    img[:, :, 0] = 200  # reddish flat field with a dark band
    img[:, :, 1] = 80
    img[:, :, 2] = 60
    img[8:12, :, :] = 30
    out = decode_jpeg(encode_jpeg_rgb(img, quality_div=8))
    assert out.shape == (20, 28, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # luma near-exact; chroma limited by 2x2 subsampling at band edges
    assert err.mean() < 8 and np.median(err) <= 3


def test_rgb_420_noise_bounded():
    from tableextraction_spark.jpeg import encode_jpeg_rgb

    img = _img(17, 19, seed=9)[..., None].repeat(3, axis=2)  # gray-as-RGB
    out = decode_jpeg(encode_jpeg_rgb(img, quality_div=4))
    assert out.shape == (17, 19, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 20
