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


def test_encrypted_pdf_named_error():
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [] /Count 0 >> endobj\n"
        b"trailer << /Root 1 0 R /Encrypt 9 0 R >>\n"
        b"%%EOF\n"
    )
    with pytest.raises(NotImplementedError, match="ncrypt"):
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
