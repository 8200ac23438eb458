"""Import-guarded PDF rasterizer adapter (reference ``preprocessing.py:10-46``).

The reference renders PDFs with Poppler via ``pdf2image`` at two DPIs
(``extractor.py:24-33``); this engine renders ONCE at high DPI and block-min
downscales for detection (``media.downscale``), preserving the reference's
``factor`` bbox-rescale semantics.  Neither pypdfium2 nor pdf2image ships in
this container, so the adapter probes for them lazily and the ``%PDF`` route
in :func:`media.decode_page` degrades to a clearly-named
``NotImplementedError`` — which the decode stage captures as a per-row
``error`` column, never a task failure (contract-tested either way).

Renderer preference: pypdfium2 (in-process, no subprocess per page) over
pdf2image (Poppler subprocess per call — the reference's choice and its
biggest fixed cost).  Both probes are per-executor module-state singletons:
resolved once per Python worker, never per row (SURVEY §4.1 anti-pattern —
the reference re-inits models/readers per call).

Page-per-row contract: production media tables store ONE page per blob row
(``media_ref`` addresses the page), so :func:`rasterize_pdf` renders a single
page (default: the row's whole payload is that page's PDF).  For whole-doc
payloads, :func:`pdf_to_pages` mirrors ``bytes_file_to_array`` and the
ingest job explodes it to per-page rows BEFORE the decode stage — pages are
the unit of parallelism (SURVEY §4.3).
"""

from __future__ import annotations

import numpy as np

DETECT_DPI = 50   # extractor.py:24 low_dpi
OCR_DPI = 500     # extractor.py:25 high_dpi

_UNSET = object()
_RENDERER: object = _UNSET  # probed once per process; None = no lib found


def _resolve_renderer():
    """Probe available PDF renderers once per process (executor singleton)."""
    global _RENDERER
    if _RENDERER is not _UNSET:
        return _RENDERER
    _RENDERER = None
    for name in ("pypdfium2", "pdf2image"):
        try:
            _RENDERER = (name, __import__(name))
            break
        except ImportError:
            continue
    return _RENDERER


def pdf_renderer_available() -> bool:
    return _resolve_renderer() is not None


def pdf_to_pages(payload: bytes, dpi: int = OCR_DPI) -> list[np.ndarray]:
    """PDF bytes → one uint8 gray/RGB array per page at ``dpi``.

    Mirrors ``preprocessing.bytes_file_to_array`` (pdf2image → ``np.array``
    per PIL page).  Raises ``NotImplementedError`` when no renderer library
    is installed — callers inside the decode stage surface that as a per-row
    error.
    """
    r = _resolve_renderer()
    if r is None:
        raise NotImplementedError(
            "PDF rasterization requires pypdfium2 or pdf2image "
            "(pip install pypdfium2); neither is present in this container"
        )
    name, mod = r
    if name == "pypdfium2":
        pdf = mod.PdfDocument(payload)
        try:
            scale = dpi / 72.0  # pdfium renders in points (1/72 in)
            return [
                np.asarray(page.render(scale=scale).to_pil().convert("L"))
                for page in pdf
            ]
        finally:
            pdf.close()
    # pdf2image: Poppler subprocess, the reference's renderer
    images = mod.convert_from_bytes(payload, dpi=dpi)
    return [np.asarray(im.convert("L")) for im in images]


def rasterize_pdf(payload: bytes, page_index: int = 0, dpi: int = OCR_DPI) -> np.ndarray:
    """One page of a PDF payload → uint8 array (``decode_page``'s %PDF route).

    Per the page-per-row contract the default payload IS one page's PDF;
    ``page_index`` selects within multi-page payloads during ingest.
    """
    pages = pdf_to_pages(payload, dpi=dpi)
    if not pages:
        raise ValueError("PDF payload rendered zero pages")
    if page_index >= len(pages):
        raise ValueError(
            f"page_index {page_index} out of range ({len(pages)} pages)"
        )
    return pages[page_index]
