"""Stdlib PNG codec: round-trips, all five scanline filters, unsupported
variants, decode_page routing, and PNG-payload end-to-end span equality."""

import struct
import zlib

import numpy as np
import pytest

from tableextraction_spark import png
from tableextraction_spark.media import decode_page
from tableextraction_spark.png import decode_png, encode_png


def _img(h, w, seed=0, channels=None):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels is None else (h, w, channels)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


def test_gray_roundtrip():
    img = _img(23, 31)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_rgb_roundtrip():
    img = _img(17, 13, channels=3)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_multiple_idat_chunks():
    """Decoders must concatenate IDAT chunks (encoders may split freely)."""
    img = _img(9, 9, seed=3)
    buf = encode_png(img)
    # split the single IDAT into two chunks by re-chunking the zlib stream
    sig, rest = buf[:8], buf[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack_from(">I", rest, pos)
        tag = rest[pos + 4 : pos + 8]
        data = rest[pos + 8 : pos + 8 + ln]
        chunks.append((tag, data))
        pos += 12 + ln
    out = [sig]
    for tag, data in chunks:
        if tag == b"IDAT":
            mid = len(data) // 2
            out.append(png._chunk(b"IDAT", data[:mid]))
            out.append(png._chunk(b"IDAT", data[mid:]))
        else:
            out.append(png._chunk(tag, data))
    assert np.array_equal(decode_png(b"".join(out)), img)


def _filter_row(f, cur, prev, ch):
    """Forward PNG filter (RFC 2083 §6) — the inverse of the decoder."""
    n = len(cur)
    out = np.zeros(n, dtype=np.uint8)
    for i in range(n):
        a = int(cur[i - ch]) if i >= ch else 0
        b = int(prev[i])
        c = int(prev[i - ch]) if i >= ch else 0
        x = int(cur[i])
        if f == 0:
            out[i] = x
        elif f == 1:
            out[i] = (x - a) & 0xFF
        elif f == 2:
            out[i] = (x - b) & 0xFF
        elif f == 3:
            out[i] = (x - ((a + b) >> 1)) & 0xFF
        elif f == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (x - pred) & 0xFF
    return out


@pytest.mark.parametrize("channels", [None, 3])
def test_all_five_filters_decode(channels):
    """Hand-build a PNG whose rows cycle filters 0..4; decode must invert."""
    img = _img(10, 7, seed=42, channels=channels)
    h, w = img.shape[:2]
    ch = 1 if channels is None else channels
    flat = img.reshape(h, -1)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        f = y % 5
        raw.append(f)
        raw.extend(_filter_row(f, flat[y], prev, ch).tobytes())
        prev = flat[y]
    color_type = 0 if ch == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    buf = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png._chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(buf), img)


def test_rgba_alpha_dropped():
    img = _img(6, 5, seed=1, channels=4)
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    buf = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(buf), img[:, :, :3])


@pytest.mark.parametrize(
    "depth,color_type,interlace,match",
    [
        (16, 3, 0, "illegal PNG depth"),  # 16-bit palette is not legal
        (4, 2, 0, "illegal PNG depth"),  # sub-byte RGB is not legal
        (8, 5, 0, "color type"),
        (8, 0, 2, "interlace method"),
        (8, 3, 0, "missing PLTE"),  # palette without a PLTE chunk
    ],
)
def test_illegal_variants_named(depth, color_type, interlace, match):
    ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color_type, 0, 0, interlace)
    buf = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match=match):
        decode_png(buf)


def test_full_variant_roundtrips():
    """Every decode lane the spec allows, via the fixture encoders:
    Adam7 (gray + RGB + degenerate sizes), identity-palette, 16-bit
    high-byte reduction, and 1/2/4-bit quantized gray."""
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    rgb = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(png.encode_png(g, interlace=True)), g)
    assert np.array_equal(decode_png(png.encode_png(rgb, interlace=True)), rgb)
    for hw in ((1, 1), (2, 3), (7, 7), (8, 9), (5, 1)):
        t = rng.integers(0, 256, hw, dtype=np.uint8)
        assert np.array_equal(decode_png(png.encode_png(t, interlace=True)), t)
    # grayscale palette maps by index exactly → gray output (the
    # media.palette_to_gray rule shared with GIF/BMP)
    assert np.array_equal(decode_png(png.encode_png_palette(g)), g)
    # a COLOR palette still returns RGB
    h, w = 5, 6
    plte = bytes(
        v for i in range(256) for v in ((i, (i * 7) % 256, (i * 13) % 256))
    )
    idx = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    buf = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"PLTE", plte)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )
    rgb = decode_png(buf)
    assert rgb.shape == (h, w, 3)
    assert np.array_equal(rgb[:, :, 1].reshape(-1), (np.arange(h * w) * 7) % 256)
    g16 = rng.integers(0, 65536, (19, 21)).astype(np.uint16)
    assert np.array_equal(
        decode_png(png.encode_png16(g16)), (g16 >> 8).astype(np.uint8)
    )
    for d in (1, 2, 4):
        f = 255 // ((1 << d) - 1)
        q = (rng.integers(0, 1 << d, (11, 13)) * f).astype(np.uint8)
        assert np.array_equal(decode_png(png.encode_png_gray_depth(q, d)), q)


def test_interlaced_truncated_pass_is_error():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    # rebuild with one byte of decompressed pixel data missing
    import zlib as _z

    full = png.encode_png(g, interlace=True)
    # corrupt: truncate the decompressed stream by re-compressing less
    pos = full.find(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", full, pos)
    idat = full[pos + 8 : pos + 8 + ln]
    short = _z.compress(_z.decompress(idat)[:-1])
    rebuilt = (
        full[:pos] + png._chunk(b"IDAT", short) + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length"):
        decode_png(rebuilt)


def test_palette_index_out_of_range_refuses():
    """Corrupt palette PNG (index ≥ len(PLTE)) must raise a named error,
    not clamp to the last entry and decode silently wrong pixels."""
    h, w = 2, 3
    plte = bytes(v for i in range(4) for v in (i, i, i))  # 4 entries
    idx = np.array([[0, 1, 2], [3, 200, 1]], dtype=np.uint8)  # 200 > 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    buf = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"PLTE", plte)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index 200"):
        decode_png(buf)


def test_not_a_png():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNGbogus....")


def test_decode_page_routes_png():
    img = _img(20, 30, seed=7)
    assert np.array_equal(decode_page(encode_png(img)), img)
    # RGB PNGs come back H×W×3; kernel grayzation consumes that directly
    rgb = _img(8, 8, seed=8, channels=3)
    assert decode_page(encode_png(rgb)).shape == (8, 8, 3)


def test_extract_spans_equality_over_png_corpus(spark):
    """The full pipeline over REAL PNG page payloads matches the golden
    spans — format routing changes nothing downstream."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, DOCS_SCHEMA, extract_spans

    docs, blobs, expected = gen_corpus(6, codec="png")
    assert all(bytes(b["content"][:4]) == b"\x89PNG" for b in blobs)
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


def test_extract_spans_equality_over_mixed_format_corpus(spark):
    """One corpus, three real payload formats interleaved — per-row magic
    routing must hold under a single mapInArrow pass."""
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, DOCS_SCHEMA, extract_spans

    from tableextraction_spark.fixtures.generate import gen_doc

    codecs = ["img1", "png", "jpeg", "jpeg_prog", "pdf", "gif", "bmp"]
    docs, blobs, expected = [], [], []
    for i, codec in enumerate(codecs * 2):  # 14 docs, formats interleaved
        d, b, e = gen_doc(i, codec=codec)
        docs.append(d)
        blobs.extend(b)
        expected.append(e)
    magics = {bytes(b["content"][:2]) for b in blobs}
    assert len(magics) == 6  # IMG1, PNG, JPEG, %PDF, GIF, BM all present
    # and the JPEG population mixes baseline (SOF0) with progressive (SOF2)
    sofs = {m for b in blobs for m in (b"\xff\xc0", b"\xff\xc2")
            if bytes(b["content"][:2]) == b"\xff\xd8" and m in bytes(b["content"])}
    assert sofs == {b"\xff\xc0", b"\xff\xc2"}
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
