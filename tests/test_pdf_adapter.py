"""PDF adapter: import-guarded rasterizer contract.

Without pypdfium2/pdf2image (this container), the %PDF route must degrade to
a clearly-named NotImplementedError and the decode stage must capture it as
a per-row error — never a task failure.  With a renderer installed, the
skip-guarded test exercises the real rasterize path and the factor-rescale
(dual-DPI) math.
"""

import numpy as np
import pytest

from tableextraction_spark.media import decode_page, downscale
from tableextraction_spark.sources import pdf_adapter

HAVE_RENDERER = pdf_adapter.pdf_renderer_available()

# a syntactically minimal one-page PDF (blank page, no fonts) — enough for
# any real renderer to rasterize; in this container it only exercises the
# error-capture path
MINIMAL_PDF = b"""%PDF-1.4
1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 72 72] >> endobj
trailer << /Root 1 0 R >>
%%EOF
"""


def test_probe_is_consistent():
    # the probe is a cached singleton: repeated calls agree
    assert pdf_adapter.pdf_renderer_available() == HAVE_RENDERER


@pytest.mark.skipif(HAVE_RENDERER, reason="renderer installed: pdfx fallback inactive")
def test_decode_page_pdf_falls_back_to_pdfx():
    """Without a renderer lib, %PDF routes to the from-scratch pdfx subset:
    a minimal blank page rasterizes to an all-white canvas (it used to be a
    named error — the r3 no-library standard applied to PDF)."""
    page = decode_page(MINIMAL_PDF)
    assert page.shape == (72, 72)
    assert (page == 255).all()


@pytest.mark.skipif(HAVE_RENDERER, reason="renderer installed: stub inactive")
def test_rasterize_names_missing_libs():
    with pytest.raises(NotImplementedError, match="pypdfium2"):
        pdf_adapter.rasterize_pdf(MINIMAL_PDF)


def test_pdf_payload_is_per_row_error_not_task_failure(spark):
    """A %PDF blob in the corpus yields an error row; sibling rows still
    extract (the pipeline's failure-isolation rule, reference
    extractor.py:27-66)."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, detect_tables

    _, blobs, _ = gen_corpus(2)
    blobs.append(
        {
            "media_ref": "m-pdfdoc-p000",
            "doc_id": "pdfdoc",
            "page_no": 0,
            "content": MINIMAL_PDF,
        }
    )
    out = detect_tables(spark.createDataFrame(blobs, BLOBS_SCHEMA)).collect()
    pdf_rows = [r for r in out if r.doc_id == "pdfdoc"]
    ok_rows = [r for r in out if r.doc_id != "pdfdoc"]
    assert ok_rows and all(r.error is None for r in ok_rows)
    assert len(pdf_rows) == 1
    # blank page decodes (renderer lib or pdfx subset): no tables, no error
    assert pdf_rows[0].error is None


def test_out_of_subset_pdf_is_per_row_error(spark):
    """A PDF the from-scratch subset can't paint (embedded TrueType text)
    yields a NAMED per-row error; sibling rows still extract."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, detect_tables

    from tests.test_pdfx import _truetype_pdf

    ttf_pdf = _truetype_pdf()
    _, blobs, _ = gen_corpus(2)
    blobs.append(
        {"media_ref": "m-ttf-p000", "doc_id": "ttfdoc", "page_no": 0,
         "content": ttf_pdf}
    )
    out = detect_tables(spark.createDataFrame(blobs, BLOBS_SCHEMA)).collect()
    bad = [r for r in out if r.doc_id == "ttfdoc"]
    good = [r for r in out if r.doc_id != "ttfdoc"]
    assert good and all(r.error is None for r in good)
    if not HAVE_RENDERER:
        assert len(bad) == 1 and bad[0].error is not None
        assert "TrueType" in bad[0].error


@pytest.mark.skipif(not HAVE_RENDERER, reason="no PDF renderer in container")
def test_rasterize_real_pdf_and_dual_dpi_factor():
    """Deploy-time contract: render once at OCR DPI, block-downscale by the
    dual-DPI factor; bbox rescale parity is factor-exact (detection.py:98,119)."""
    page = pdf_adapter.rasterize_pdf(MINIMAL_PDF, dpi=pdf_adapter.OCR_DPI)
    assert page.dtype == np.uint8 and page.ndim in (2, 3)
    assert page.shape[0] >= 72 * pdf_adapter.OCR_DPI // 72 - 2
    factor = pdf_adapter.OCR_DPI // pdf_adapter.DETECT_DPI
    gray = page if page.ndim == 2 else page.mean(axis=2).astype(np.uint8)
    low = downscale(gray, factor)
    assert low.shape[0] == gray.shape[0] // factor
