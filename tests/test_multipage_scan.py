"""Multi-page document ingestion: real crawls deliver whole documents
(a 10-page fax TIFF, a multi-page PDF), not pre-split pages.  The decode
stage expands such payloads 1→N via ``media.iter_pages`` with a
payload-global ``obj_no`` so downstream (media_ref, obj_no) ordering
holds; single-page payloads keep their caller page_no (zero behavior
change); a corrupt later page error-rows without losing earlier pages."""

import numpy as np
import pyarrow as pa
import pytest

from tableextraction_spark import pdfx
from tableextraction_spark.fixtures.generate import (
    gen_doc,
    page_primitives,
    plan_doc,
    PAGE_H,
    PAGE_W,
)
from tableextraction_spark.media import decode_image, iter_pages
from tableextraction_spark.operators.decode_detect import (
    TABLES_SCHEMA,
    process_content_rows,
)
from tableextraction_spark.tiff import encode_tiff_multipage


def _stage(rows):
    """(doc_id, media_ref, page_no, content) tuples → stage output rows."""
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows]),
            pa.array([r[1] for r in rows]),
            pa.array([r[2] for r in rows], type=pa.int32()),
            pa.array([r[3] for r in rows], type=pa.binary()),
        ],
        names=["doc_id", "media_ref", "page_no", "content"],
    )
    out = process_content_rows(batch)
    return [] if out is None else out.to_pylist()


def _skew_doc_pages():
    _doc, blobs, _exp = gen_doc(5, codec="img1")  # 10-page skew doc
    blobs = sorted(blobs, key=lambda b: b["page_no"])
    return [decode_image(b["content"]) for b in blobs], blobs


def test_multipage_tiff_equals_per_page_blobs():
    pages, blobs = _skew_doc_pages()
    combined = _stage(
        [("d", "m-all", 0, encode_tiff_multipage(pages, "g4"))]
    )
    separate = _stage(
        [("d", b["media_ref"], b["page_no"], bytes(b["content"])) for b in blobs]
    )
    # same pages decoded, same objects in the same order, same payloads
    got_pages = [r["page_no"] for r in combined if r["obj_no"] == -1]
    assert got_pages == list(range(10))
    got_objs = [
        (r["kind"], r["n_items"], r["payload"])
        for r in combined
        if r["obj_no"] >= 0
    ]
    want_objs = [
        (r["kind"], r["n_items"], r["payload"])
        for r in separate
        if r["obj_no"] >= 0
    ]
    assert got_objs == want_objs and len(got_objs) > 0
    # obj_no is payload-global and strictly increasing → the assemble
    # stage's (media_ref, obj_no) sort preserves page order
    nos = [r["obj_no"] for r in combined if r["obj_no"] >= 0]
    assert nos == list(range(len(nos)))
    assert all(r["error"] is None for r in combined)


def test_multipage_pdf_equals_per_page_blobs():
    plan = plan_doc(7)
    rng = np.random.default_rng(123)
    prims = [page_primitives(p, rng) for p in plan["pages"][:2]] or None
    if prims is None or len(prims) < 2:
        pytest.skip("plan has <2 pages")
    pdf = pdfx.build_pdf(
        [{"rects": p["rects"], "texts": p["texts"]} for p in prims],
        PAGE_W, PAGE_H,
    )
    singles = [
        pdfx.build_page_pdf(p["rects"], p["texts"], PAGE_W, PAGE_H)
        for p in prims
    ]
    combined = _stage([("d", "m", 0, pdf)])
    separate = _stage(
        [("d", "m", i, s) for i, s in enumerate(singles)]
    )
    assert [r["page_no"] for r in combined if r["obj_no"] == -1] == [0, 1]
    got = [(r["kind"], r["payload"]) for r in combined if r["obj_no"] >= 0]
    want = [(r["kind"], r["payload"]) for r in separate if r["obj_no"] >= 0]
    assert got == want


def test_single_page_payload_keeps_caller_page_no():
    pages, blobs = _skew_doc_pages()
    out = _stage([("d", "m", 7, bytes(blobs[3]["content"]))])
    assert [r["page_no"] for r in out if r["obj_no"] == -1] == [7]


def test_corrupt_later_page_keeps_earlier_pages():
    pages, _ = _skew_doc_pages()
    import struct

    blob = bytearray(encode_tiff_multipage(pages[:3], "g4"))
    # corrupt the LAST page: point its strip offset past EOF so its decode
    # raises mid-iteration (after pages 0 and 1 already came out)
    from tableextraction_spark.tiff import _read_ifds

    # find the third IFD's StripOffsets entry position by re-walking the
    # chain the way the reader does, then stomp the inline value
    en_off = 8
    for _skip in range(2):
        n = struct.unpack_from("<H", blob, en_off)[0]
        en_off = struct.unpack_from("<I", blob, en_off + 2 + 12 * n)[0]
    n = struct.unpack_from("<H", blob, en_off)[0]
    for e in range(n):
        at = en_off + 2 + 12 * e
        if struct.unpack_from("<H", blob, at)[0] == 273:
            struct.pack_into("<I", blob, at + 8, len(blob) + 1000)
    assert _read_ifds(bytes(blob))[1][2][273][0] == len(blob) + 1000
    out = _stage([("d", "m", 0, bytes(blob))])
    markers = [r for r in out if r["obj_no"] == -1 and r["error"] is None]
    errors = [r for r in out if r["error"] is not None]
    assert [m["page_no"] for m in markers] == [0, 1]  # first two pages stand
    assert len(errors) == 1 and "beyond EOF" in errors[0]["error"]


def test_iter_pages_multipage_lazy_and_exact():
    pages, _ = _skew_doc_pages()
    mp = encode_tiff_multipage(pages, "g4")
    out = list(iter_pages(mp))
    assert len(out) == 10 and all(n == 10 for _i, n, _p in out)
    for (i, _n, got), want in zip(out, pages):
        assert (got == want).all()


def test_zero_page_payload_leaves_an_error_trace():
    # review finding: an empty-/Kids PDF used to contribute ZERO rows —
    # vanishing from page counters and error metrics
    pdf = pdfx.build_pdf([], PAGE_W, PAGE_H)
    out = _stage([("d", "m", 0, pdf)])
    assert len(out) == 1
    assert out[0]["error"] == "ValueError: payload decoded to zero pages"


def test_error_row_names_the_failing_page():
    # review finding: the error row reused the caller's page_no, colliding
    # with page 0's success marker of the same media_ref
    pages, _ = _skew_doc_pages()
    import struct

    blob = bytearray(encode_tiff_multipage(pages[:3], "g4"))
    en_off = 8
    for _skip in range(2):
        n = struct.unpack_from("<H", blob, en_off)[0]
        en_off = struct.unpack_from("<I", blob, en_off + 2 + 12 * n)[0]
    n = struct.unpack_from("<H", blob, en_off)[0]
    for e in range(n):
        at = en_off + 2 + 12 * e
        if struct.unpack_from("<H", blob, at)[0] == 273:
            struct.pack_into("<I", blob, at + 8, len(blob) + 1000)
    out = _stage([("d", "m", 0, bytes(blob))])
    errors = [r for r in out if r["error"] is not None]
    assert len(errors) == 1 and errors[0]["page_no"] == 2
    keys = [(r["page_no"], r["obj_no"], r["error"] is None) for r in out
            if r["obj_no"] == -1]
    assert len(keys) == len(set(keys))  # no success/error key collision


@pytest.mark.parametrize("codec", ["ccitt", "jbig2", "jbig2sym", "jpx"])
def test_multipage_scanned_pdf_equals_per_page_blobs(codec):
    """Multi-page SCANNED PDFs — the reference-corpus shape (data/*.pdf
    are multi-page fax scans): one document blob whose pages are 1-bit
    archive-codec image XObjects (jbig2sym: all dictionaries shared in
    ONE /JBIG2Globals stream; jpx: 8-bit reversible JPEG 2000) produces
    byte-identical object rows to its per-page split."""
    pages, _blobs = _skew_doc_pages()
    pages = pages[:3]
    combined = _stage(
        [("d", "m-all", 0, pdfx.build_scanned_pdf(pages, codec=codec))]
    )
    separate = _stage(
        [("d", "m", i, pdfx.build_scanned_page_pdf(p, codec=codec))
         for i, p in enumerate(pages)]
    )
    assert [r["page_no"] for r in combined if r["obj_no"] == -1] == [0, 1, 2]
    got = [(r["kind"], r["n_items"], r["payload"])
           for r in combined if r["obj_no"] >= 0]
    want = [(r["kind"], r["n_items"], r["payload"])
            for r in separate if r["obj_no"] >= 0]
    assert got == want and len(got) > 0
    assert all(r["error"] is None for r in combined)
