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


def test_baseline_stream_marked_progressive_rejected():
    # swap SOF0 for SOF2 in a BASELINE stream: its full-band SOS header is
    # illegal for progressive (DC scan with Se=63) — a named error, not a
    # silent mis-decode
    buf = bytearray(encode_jpeg_gray(np.full((8, 8), 128, dtype=np.uint8)))
    idx = bytes(buf).find(b"\xff\xc0")
    buf[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(buf))


def test_lossless_sof_rejected_by_name():
    buf = bytearray(encode_jpeg_gray(np.full((8, 8), 128, dtype=np.uint8)))
    idx = bytes(buf).find(b"\xff\xc0")
    buf[idx + 1] = 0xC3  # SOF3 lossless
    with pytest.raises(ValueError, match="lossless|arithmetic|extended"):
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


# --- progressive (SOF2) ---


def test_progressive_gray_equals_baseline_exactly():
    """The progressive scan script transmits the SAME quantized coefficients
    as the baseline encoder (DC floor-shift + refine bit, AC magnitude
    truncation + correction bit reconstruct exactly), so decode must be
    byte-identical to the baseline decode — any coefficient mishandling in
    DC/AC first/refine passes breaks equality."""
    from tableextraction_spark.jpeg import encode_jpeg_gray_progressive

    for seed, shape in [(0, (64, 64)), (1, (100, 120)), (2, (17, 33)), (3, (8, 8))]:
        img = _img(*shape, seed=seed)
        base = decode_jpeg(encode_jpeg_gray(img, 4))
        prog = decode_jpeg(encode_jpeg_gray_progressive(img, 4))
        assert np.array_equal(base, prog), (seed, shape)


def test_progressive_color_420_equals_baseline_exactly():
    from tableextraction_spark.jpeg import (
        encode_jpeg_rgb,
        encode_jpeg_rgb_progressive,
    )

    rng = np.random.default_rng(7)
    for shape in [(64, 64, 3), (90, 110, 3)]:
        img = (rng.random(shape) * 255).astype(np.uint8)
        base = decode_jpeg(encode_jpeg_rgb(img, 4))
        prog = decode_jpeg(encode_jpeg_rgb_progressive(img, 4))
        assert np.array_equal(base, prog), shape


def test_progressive_smooth_page_eob_runs():
    """A mostly-flat document-like page is EOB-run dominated — exercises
    the EOB-run bookkeeping in AC first and refinement scans."""
    from tableextraction_spark.jpeg import encode_jpeg_gray_progressive

    img = np.full((96, 128), 230, dtype=np.uint8)
    img[20:22, 10:100] = 20   # rule line
    img[40:80, 30:32] = 20    # vertical line
    base = decode_jpeg(encode_jpeg_gray(img, 8))
    prog = decode_jpeg(encode_jpeg_gray_progressive(img, 8))
    assert np.array_equal(base, prog)


def test_progressive_all_flat():
    from tableextraction_spark.jpeg import encode_jpeg_gray_progressive

    img = np.full((32, 32), 128, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_gray_progressive(img, 1)),
        decode_jpeg(encode_jpeg_gray(img, 1)),
    )


def test_progressive_truncated_raises():
    from tableextraction_spark.jpeg import encode_jpeg_gray_progressive

    buf = encode_jpeg_gray_progressive(_img(32, 32), 4)
    with pytest.raises(ValueError):
        decode_jpeg(buf[: len(buf) // 2])


def test_decode_page_routes_progressive_jpeg():
    from tableextraction_spark.jpeg import encode_jpeg_gray_progressive

    img = _img(40, 56, seed=9)
    arr = decode_page(encode_jpeg_gray_progressive(img, 4))
    assert arr.shape[:2] == (40, 56)


def test_extract_spans_equality_over_progressive_corpus(spark):
    """Full pipeline over multi-scan progressive JPEG payloads matches the
    golden spans — the SOF2 path is production, not a demo."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, DOCS_SCHEMA, extract_spans

    docs, blobs, expected = gen_corpus(4, codec="jpeg_prog")
    assert all(bytes(b["content"][:2]) == b"\xff\xd8" for b in blobs)
    # really progressive: SOF2 marker present, SOF0 absent
    for b in blobs[:2]:
        raw = bytes(b["content"])
        assert b"\xff\xc2" in raw and b"\xff\xc0" not in raw
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


def test_cmyk_adobe_jpeg_decodes():
    """4-component Adobe JPEG (the shape PDFs embed): stored planes obey
    the inverted-ink convention, so RGB_ch = stored_ch·stored_K/255; both
    APP14 transforms (0 = CMYK, 2 = YCCK) decode within quantization
    error of the closed-form expectation."""
    from tableextraction_spark.jpeg import encode_jpeg_cmyk

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    planes = np.stack(
        [
            (xx * 3 + 40) % 200 + 20,
            (yy * 2 + 60) % 180 + 30,
            (xx + yy) % 160 + 40,
            np.full((h, w), 230),
        ],
        axis=2,
    ).astype(np.uint8)
    want = np.clip(planes[:, :, :3].astype(np.float64) * (230 / 255.0), 0, 255)
    for yccck in (False, True):
        out = decode_jpeg(encode_jpeg_cmyk(planes, yccck=yccck))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(np.float64) - want).max() < 3.0, yccck


def test_cmyk_k_plane_scales_luma():
    """stored_K = 0 (full ink) must decode to black regardless of CMY."""
    from tableextraction_spark.jpeg import encode_jpeg_cmyk

    planes = np.full((24, 24, 4), 200, dtype=np.uint8)
    planes[:, :, 3] = 0
    out = decode_jpeg(encode_jpeg_cmyk(planes))
    assert out.max() <= 2  # quantization wiggle around 0


def test_five_component_jpeg_refused():
    from tableextraction_spark.jpeg import encode_jpeg_cmyk

    buf = bytearray(encode_jpeg_cmyk(np.full((8, 8, 4), 128, np.uint8)))
    i = buf.find(b"\xff\xc0")
    # SOF nc byte: segment starts at i+2 (2-byte length), nc at +5 past
    # precision/height/width
    nc_off = i + 4 + 5
    assert buf[nc_off] == 4
    buf[nc_off] = 5
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))
