"""From-scratch PDF subset (pdfx.py): writer → parser → rasterizer.

The reference's primary input is PDF rasterized via Poppler
(``table_extraction/preprocessing.py:10-46``).  These tests pin the
no-library path: vector fixture PDFs (rect fills + Type 3 bitmap glyphs)
rasterize BIT-IDENTICALLY to the stamped canvas, the full Spark pipeline
extracts golden spans from ``%PDF`` payloads, and out-of-subset features
degrade to named per-row errors.
"""

import numpy as np
import pytest

from tableextraction_spark import pdfx
from tableextraction_spark.media import decode_page


def _prims_rect_only():
    return (
        [(10, 20, 30, 2), (10, 60, 30, 2), (10, 20, 2, 42), (38, 20, 2, 42)],
        [],
    )


def test_rect_roundtrip_exact():
    rects, texts = _prims_rect_only()
    pdf = pdfx.build_page_pdf(rects, texts, 100, 90)
    arr = pdfx.rasterize_pdf_page(pdf)
    assert arr.shape == (90, 100)
    expected = np.full((90, 100), 255, dtype=np.uint8)
    for (x, y, w, h) in rects:
        expected[y : y + h, x : x + w] = 0
    assert np.array_equal(arr, expected)


def test_text_glyphs_match_bitmap_font_exactly():
    from tableextraction_spark.font import render_text

    s = "Hello Abc-123 (x/y): 45.6%"
    pdf = pdfx.build_page_pdf([], [(7, 11, s)], 220, 40)
    arr = pdfx.rasterize_pdf_page(pdf)
    expected = np.full((40, 220), 255, dtype=np.uint8)
    render_text(expected, 7, 11, s)
    assert np.array_equal(arr, expected)


def test_cyrillic_text_roundtrip():
    from tableextraction_spark.font import render_text

    s = "абвГДЕ"
    pdf = pdfx.build_page_pdf([], [(3, 3, s)], 60, 20)
    arr = pdfx.rasterize_pdf_page(pdf)
    expected = np.full((20, 60), 255, dtype=np.uint8)
    render_text(expected, 3, 3, s)
    assert np.array_equal(arr, expected)


def test_fixture_page_pdf_equals_rendered_canvas():
    """The load-bearing equality: for every fixture page, rasterizing the
    vector PDF reproduces ``render_page``'s canvas bit-for-bit — so the
    whole detect/OCR kernel behaves identically on the PDF lane."""
    from tableextraction_spark.fixtures.generate import (
        PAGE_H,
        PAGE_W,
        _rng,
        page_primitives,
        plan_doc,
        stamp_primitives,
    )

    for doc_num in (0, 1, 2, 3, 7):
        plan = plan_doc(doc_num)
        rng_a, rng_b = _rng(doc_num * 2 + 1), _rng(doc_num * 2 + 1)
        for page in plan["pages"]:
            prims = page_primitives(page, rng_a)
            canvas = stamp_primitives(page_primitives(page, rng_b))
            pdf = pdfx.build_page_pdf(prims["rects"], prims["texts"], PAGE_W, PAGE_H)
            arr = pdfx.rasterize_pdf_page(pdf)
            assert np.array_equal(arr, canvas), f"doc {doc_num} page mismatch"


def test_multi_page_and_page_count():
    pages = [
        {"rects": [(0, 0, 10, 10)], "texts": []},
        {"rects": [], "texts": [(2, 2, "pg2")]},
        {"rects": [(5, 5, 2, 2)], "texts": []},
    ]
    pdf = pdfx.build_pdf(pages, 30, 20)
    assert pdfx.pdf_page_count(pdf) == 3
    arrs = pdfx.rasterize_pdf_pages(pdf)
    assert len(arrs) == 3
    assert (arrs[0][:10, :10] == 0).all()
    assert (arrs[2][5:7, 5:7] == 0).all()
    with pytest.raises(ValueError, match="page_index"):
        pdfx.rasterize_pdf_page(pdf, page_index=3)


def test_extract_text_layer():
    pdf = pdfx.build_pdf(
        [{"rects": [], "texts": [(10, 5, "first run"), (10, 20, "second")]}],
        200,
        40,
    )
    runs = pdfx.extract_text(pdf)
    assert len(runs) == 1
    texts = sorted((round(y), round(x), s) for x, y, s in runs[0])
    # device y of a run origin is the glyph BASELINE row (top + GLYPH_H)
    assert texts == [(12, 10, "first run"), (27, 10, "second")]


def test_reconstruction_fallback_on_broken_xref():
    pdf = bytearray(pdfx.build_page_pdf([(1, 1, 3, 3)], [], 10, 10))
    # corrupt the startxref offset → parser must fall back to full scan
    i = pdf.rindex(b"startxref")
    j = pdf.index(b"\n", i + 10)
    pdf[i:j] = b"startxref\n999999999"
    arr = pdfx.rasterize_pdf_page(bytes(pdf))
    assert (arr[1:4, 1:4] == 0).all()


def _hand_pdf(*objs: bytes) -> bytes:
    """Assemble numbered objects into a trailer-only PDF (reconstruction
    path: no xref, /Root found by scan)."""
    out = b"%PDF-1.4\n"
    for i, body in enumerate(objs, start=1):
        out += b"%d 0 obj " % i + body + b" endobj\n"
    return out + b"trailer << /Root 1 0 R >>\n%%EOF\n"


def _stream_obj(d: bytes, data: bytes) -> bytes:
    return (
        d[:-2].rstrip() + b" /Length %d >> stream\n" % len(data)
        + data + b"\nendstream"
    )


def test_dct_image_xobject_roundtrip():
    """A scanned-page-style PDF: the page IS one DCTDecode image — decoded
    by the from-scratch JPEG codec, placed by the interpreter."""
    from tableextraction_spark.jpeg import encode_jpeg_gray

    img = np.full((64, 48), 230, dtype=np.uint8)
    img[10:12, 4:44] = 20
    img[30:50, 20:22] = 20
    jpg = encode_jpeg_gray(img, quality_div=8)
    pdf = _hand_pdf(
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 48 64] "
        b"/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        _stream_obj(b"<< >>", b"q 48 0 0 64 0 0 cm /Im0 Do Q"),
        _stream_obj(
            b"<< /Subtype /Image /Width 48 /Height 64 /BitsPerComponent 8 "
            b"/ColorSpace /DeviceGray /Filter /DCTDecode >>",
            jpg,
        ),
    )
    arr = pdfx.rasterize_pdf_page(pdf)
    assert arr.shape == (64, 48)
    # near-lossless JPEG: dark features land where the source had them
    assert arr[10:12, 4:44].mean() < 100
    assert arr[30:50, 20:22].mean() < 100
    assert arr[0:5, 0:5].mean() > 200


def _truetype_pdf() -> bytes:
    return _hand_pdf(
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 50] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        _stream_obj(b"<< >>", b"BT /F1 12 Tf 10 10 Td (hi) Tj ET"),
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica >>",
    )


def test_embedded_outline_font_named_error():
    pdf = _truetype_pdf()
    with pytest.raises(NotImplementedError, match="TrueType"):
        pdfx.rasterize_pdf_page(pdf)
    # ...but the text layer is still extractable without painting
    runs = pdfx.extract_text(pdf)
    assert runs[0][0][2] == "hi"


def test_encrypted_pdf_missing_dict_named_error():
    # /Encrypt pointing at a missing object: a named error, not a crash
    # (full standard-handler decryption is covered in test_pdfcrypto.py)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [] /Count 0 >> endobj\n"
        b"trailer << /Root 1 0 R /Encrypt 9 0 R >>\n"
        b"%%EOF\n"
    )
    with pytest.raises(ValueError, match="missing object 9"):
        pdfx.parse_pdf(pdf)


def test_decode_page_routes_pdf():
    from tableextraction_spark.fixtures.generate import (
        PAGE_H,
        PAGE_W,
        _rng,
        page_primitives,
        plan_doc,
        stamp_primitives,
    )

    plan = plan_doc(1)
    prims = page_primitives(plan["pages"][0], _rng(3))
    pdf = pdfx.build_page_pdf(prims["rects"], prims["texts"], PAGE_W, PAGE_H)
    arr = decode_page(pdf)
    assert arr.shape == (PAGE_H, PAGE_W)
    assert np.array_equal(arr, stamp_primitives(page_primitives(plan["pages"][0], _rng(3))))


def test_extract_spans_equality_over_pdf_corpus(spark):
    """The reference's primary format end-to-end: vector %PDF payloads →
    from-scratch rasterize → detect → OCR → golden spans, no renderer lib."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, DOCS_SCHEMA, extract_spans

    docs, blobs, expected = gen_corpus(4, codec="pdf")
    assert all(bytes(b["content"][:5]) == b"%PDF-" for b in blobs)
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


# --- review-pass regressions: ImageMask /Decode, xref tolerance, hybrid ---

def _mask_pdf(decode: bytes | None) -> bytes:
    """8×8 stencil mask page: top 4 rows ink (sample 0), bottom 4 clear."""
    data = b"\x00" * 4 + b"\xff" * 4  # 1 bpc, 1 byte/row
    d = (
        b"<< /Subtype /Image /Width 8 /Height 8 /BitsPerComponent 1 "
        b"/ImageMask true "
    )
    if decode is not None:
        d += b"/Decode " + decode + b" "
    d += b">>"
    return _hand_pdf(
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 8 8] "
        b"/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        _stream_obj(b"<< >>", b"q 8 0 0 8 0 0 cm /Im0 Do Q"),
        _stream_obj(d, data),
    )


def test_imagemask_explicit_default_decode_is_identity():
    """ISO 32000-1 §8.9.6.2: an EXPLICIT /Decode [0 1] must render exactly
    like the default (regression: truthiness of the array inverted it)."""
    base = pdfx.rasterize_pdf_page(_mask_pdf(None))
    explicit = pdfx.rasterize_pdf_page(_mask_pdf(b"[0 1]"))
    assert np.array_equal(base, explicit)
    # and the mask actually painted something somewhere
    assert (base == 0).any() and (base == 255).any()


def test_imagemask_decode_10_inverts():
    base = pdfx.rasterize_pdf_page(_mask_pdf(None))
    inv = pdfx.rasterize_pdf_page(_mask_pdf(b"[1 0]"))
    assert not np.array_equal(base, inv)
    # ink and background swap: painted pixel counts are complementary
    assert (base == 0).sum() + (inv == 0).sum() == base.size


def _classic_xref_pdf(eol: bytes) -> tuple[bytes, dict[int, int]]:
    """Minimal classic-xref PDF whose entries end with ``eol`` (b' \\n' =
    spec 20-byte form, b'\\n' = the real-world 19-byte shortcut)."""
    buf = b"%PDF-1.4\n"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 10 10] "
        b"/Contents 4 0 R >>",
        _stream_obj(b"<< >>", b"0 g 2 2 5 5 re f"),
    ]
    offs = {}
    for i, body in enumerate(objs, start=1):
        offs[i] = len(buf)
        buf += b"%d 0 obj " % i + body + b" endobj\n"
    xref_off = len(buf)
    buf += b"xref\n0 5\n" + b"0000000000 65535 f" + eol
    for i in range(1, 5):
        buf += b"%010d 00000 n" % offs[i] + eol
    buf += (
        b"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % xref_off
    )
    return buf, offs


@pytest.mark.parametrize("eol", [b" \n", b"\n", b" \r", b"\r\n"])
def test_classic_xref_entry_eol_tolerance(eol, monkeypatch):
    """20-byte spec entries AND the 19-byte lone-EOL form real writers emit
    must parse via the xref itself — reconstruction must not be needed."""
    buf, offs = _classic_xref_pdf(eol)

    def _no_reconstruct(self):
        raise AssertionError("xref should have parsed without reconstruction")

    monkeypatch.setattr(pdfx._Document, "_reconstruct", _no_reconstruct)
    doc = pdfx.parse_pdf(buf)
    for i, off in offs.items():
        assert doc.xref[i] == ("o", off)
    arr = pdfx.rasterize_pdf_page(buf)
    assert (arr == 0).any()  # the rect fill landed


def test_hybrid_xrefstm_objects_resolve(monkeypatch):
    """Hybrid-reference layout (ISO 32000-1 §7.5.8.4): the trailer carries
    BOTH /Prev and /XRefStm; an object living only in an ObjStm indexed only
    by the xref stream must still resolve (regression: /Prev won and the
    XRefStm branch was unreachable)."""
    buf = b"%PDF-1.4\n"
    offs = {}

    def add(i, body):
        offs[i] = len(buf)
        return buf + b"%d 0 obj " % i + body + b" endobj\n"

    buf = add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    buf = add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    buf = add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 10 10] "
        b"/Resources 5 0 R /Contents 4 0 R >>",
    )
    buf = add(4, _stream_obj(b"<< >>", b"0 g 2 2 5 5 re f"))
    # object 5 (the Resources dict) lives ONLY inside ObjStm 6
    objstm_data = b"5 0 << >>"
    buf = add(
        6,
        _stream_obj(b"<< /Type /ObjStm /N 1 /First 4 >>", objstm_data),
    )
    # object 7: the xref stream indexing object 5 as (type 2, stm 6, idx 0)
    xrefstm_off = len(buf)
    buf = add(
        7,
        _stream_obj(
            b"<< /Type /XRef /Size 8 /W [1 2 1] /Index [5 1] >>",
            b"\x02\x00\x06\x00",
        ),
    )
    # a PREVIOUS classic section (the /Prev target): just the free entry
    prev_off = len(buf)
    buf += b"xref\n0 1\n0000000000 65535 f \ntrailer << /Size 1 >>\n"
    # the newest classic section: objects 1-4 and 6-7, trailer with BOTH keys
    xref_off = len(buf)
    buf += b"xref\n0 5\n" + b"0000000000 65535 f \n"
    for i in range(1, 5):
        buf += b"%010d 00000 n \n" % offs[i]
    buf += b"6 2\n"
    for i in (6, 7):
        buf += b"%010d 00000 n \n" % offs[i]
    buf += (
        b"trailer << /Size 8 /Root 1 0 R /Prev %d /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF" % (prev_off, xrefstm_off, xref_off)
    )

    def _no_reconstruct(self):
        raise AssertionError("hybrid xref should parse without reconstruction")

    monkeypatch.setattr(pdfx._Document, "_reconstruct", _no_reconstruct)
    doc = pdfx.parse_pdf(buf)
    assert doc.xref[5] == ("c", 6, 0)  # indexed via the XRefStm
    assert doc.resolve(pdfx.Ref(5, 0)) == {}
    arr = pdfx.rasterize_pdf_page(buf)
    assert (arr == 0).any()


def test_glyph_cache_is_pixel_exact_and_reused():
    """The Type 3 glyph geometry cache (record once per glyph, replay
    translated) must reproduce the direct interpreter's canvas bit-for-bit
    — the replay computes the same left-to-right float sums — and must
    actually populate the cross-page ops cache."""
    import numpy as np

    from tableextraction_spark import pdfx
    from tableextraction_spark.fixtures import gen_corpus

    _docs, blobs, _exp = gen_corpus(6, codec="pdf")
    pdfx._GLYPH_OPS_CACHE.clear()
    for b in blobs:
        p = bytes(b["content"])
        on = pdfx.rasterize_pdf_page(p)
        pdfx._Raster.GLYPH_CACHE = False
        try:
            off = pdfx.rasterize_pdf_page(p)
        finally:
            pdfx._Raster.GLYPH_CACHE = True
        assert np.array_equal(on, off), int(np.sum(on != off))
    assert len(pdfx._GLYPH_OPS_CACHE) > 0
    assert len(pdfx._GLYPH_OPS_CACHE) <= pdfx._GLYPH_OPS_MAX


# -------------------------------------------------- classic stream filters


def _rect_pdf_with_filter(fname: bytes, encoded: bytes, parms: bytes = b""):
    """Minimal one-page PDF whose content stream carries ``fname``."""
    b = pdfx._Builder()
    d = {"Filter": b"/" + fname}
    if parms:
        d["DecodeParms"] = parms
    content_num = b.add_stream(d, encoded, compress=False)
    page_num = b.add(
        b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 30 20] "
        b"/Contents %d 0 R >>" % content_num
    )
    pages_num = b.add(b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>" % page_num)
    assert pages_num == 3
    root = b.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)
    return b.finish(root)


_RECT_CONTENT = b"q 0 g 5 5 10 8 re f Q"


def _assert_rect_rendered(pdf: bytes):
    arr = pdfx.rasterize_pdf_page(pdf)
    assert (arr[20 - 13 : 20 - 5, 5:15] == 0).all()
    assert arr[0, 0] == 255


def test_lzw_decode_content_stream():
    """LZWDecode (ISO 32000-1 §7.4.4) with the default EarlyChange=1 —
    encoder cross-checked against the TIFF lane's LZW writer."""
    from tableextraction_spark.tiff import _lzw_encode

    _assert_rect_rendered(
        _rect_pdf_with_filter(b"LZWDecode", _lzw_encode(_RECT_CONTENT))
    )
    # filter-function level: long repetitive + random-ish payloads
    for payload in (b"abc" * 4000, bytes(range(256)) * 40):
        assert pdfx._lzw_decode_pdf(_lzw_encode(payload)) == payload


def test_lzw_early_change_zero():
    """EarlyChange=0 shifts the width bump one entry later; a stream
    encoded with the late timing must NOT decode under the default."""

    def lzw_encode_late(data: bytes) -> bytes:
        out = bytearray()
        acc = nbits = 0

        def emit(code, width):
            nonlocal acc, nbits
            acc = (acc << width) | code
            nbits += width
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8

        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        emit(256, width)
        w = b""
        for byte in data:
            wk = w + bytes([byte])
            if wk in table:
                w = wk
                continue
            emit(table[w], width)
            table[wk] = nxt
            nxt += 1
            if nxt == (1 << width) and width < 12:  # LATE timing
                width += 1
            w = bytes([byte])
        if w:
            emit(table[w], width)
        emit(257, width)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    payload = bytes((i * 7 + i // 3) % 256 for i in range(9000))
    enc = lzw_encode_late(payload)
    assert pdfx._lzw_decode_pdf(enc, early=0) == payload
    try:
        wrong = pdfx._lzw_decode_pdf(enc, early=1)
    except ValueError:
        wrong = None
    assert wrong != payload


def test_runlength_decode():
    enc = b"\x02abc" + b"\xfeZ" + b"\x00q" + b"\x80"  # 'abc' + 'ZZZ' + 'q'
    assert pdfx._runlength_decode_pdf(enc) == b"abcZZZq"
    _assert_rect_rendered(
        _rect_pdf_with_filter(
            b"RunLengthDecode",
            bytes([len(_RECT_CONTENT) - 1]) + _RECT_CONTENT + b"\x80",
        )
    )
    with pytest.raises(ValueError, match="EOD"):
        pdfx._runlength_decode_pdf(b"\x02abc")
    with pytest.raises(ValueError, match="past data end"):
        pdfx._runlength_decode_pdf(b"\x7fabc")


def test_ascii85_decode_against_stdlib():
    import base64

    for payload in (b"", b"a", b"sure.", bytes(range(256)) * 3, b"\0" * 37):
        enc = base64.a85encode(payload) + b"~>"
        assert pdfx._ascii85_decode_pdf(enc) == payload
        # Adobe framing + embedded whitespace
        enc2 = base64.a85encode(payload, adobe=True, wrapcol=20)
        assert pdfx._ascii85_decode_pdf(enc2) == payload
    # 'z' shortcut comes out of stdlib only via z-folding; test explicitly
    assert pdfx._ascii85_decode_pdf(b"z~>") == b"\0\0\0\0"
    with pytest.raises(ValueError, match="out of range"):
        pdfx._ascii85_decode_pdf(b"\xff\xff\xff\xff\xff~>")
    _assert_rect_rendered(
        _rect_pdf_with_filter(
            b"ASCII85Decode", base64.a85encode(_RECT_CONTENT) + b"~>"
        )
    )


def test_tiff_predictor_2():
    """Predictor 2 (TIFF horizontal differencing) under Flate."""
    import zlib as _z

    rows = np.arange(60, dtype=np.uint8).reshape(4, 15) * 3
    diff = rows.astype(np.int16).copy()
    diff[:, 1:] -= rows[:, :-1].astype(np.int16)
    raw = (diff % 256).astype(np.uint8).tobytes()
    got = pdfx._tiff_unpredict(raw, columns=15, colors=1, bpc=8)
    assert got == rows.tobytes()
    # 3-component variant: per-component differencing
    rgb = np.arange(90, dtype=np.uint8).reshape(2, 15, 3)
    d3 = rgb.astype(np.int16).copy()
    d3[:, 1:, :] -= rgb[:, :-1, :].astype(np.int16)
    got3 = pdfx._tiff_unpredict(
        (d3 % 256).astype(np.uint8).tobytes(), columns=15, colors=3, bpc=8
    )
    assert got3 == rgb.tobytes()
    # through _stream_data: Flate + Predictor 2
    st = pdfx.Stream(
        {
            pdfx.Name("Filter"): pdfx.Name("FlateDecode"),
            pdfx.Name("DecodeParms"): {
                pdfx.Name("Predictor"): 2,
                pdfx.Name("Columns"): 15,
                pdfx.Name("Colors"): 1,
            },
        },
        _z.compress(raw),
    )
    assert pdfx._stream_data(st, lambda x: x) == rows.tobytes()
