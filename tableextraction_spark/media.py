"""Raw grayscale page-image codec (the engine's media payload format).

The reference rasterizes PDFs with Poppler into RGB numpy arrays
(`table_extraction/preprocessing.py:10-62`).  This container has no Poppler /
cv2 / PIL, so the engine defines its own trivially-decodable deterministic
format: ``IMG1`` = magic + little-endian uint32 width/height + H*W uint8
grayscale pixels (255 = white background, 0 = black ink).

:func:`decode_page` routes on the payload magic:

- ``IMG1``  → the deterministic codec below
- ``\\x89PNG`` → the stdlib-zlib PNG decoder (``png.py``) — real PNG pages
  are first-class, mirroring ``preprocessing.image_file_to_array``
- ``%PDF``  → the import-guarded rasterizer adapter
  (``sources/pdf_adapter.py``: pypdfium2 or pdf2image when installed);
  without either library it raises ``NotImplementedError``, which the decode
  stage captures as a per-row error — never a task failure
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"IMG1"
_HEADER = struct.Struct("<4sII")  # magic, width, height


def rgb_to_gray(arr: np.ndarray) -> np.ndarray:
    """H×W passes through; H×W×3 uint8 RGB reduces to BT.601 luma — the ONE
    shared conversion (avi/pdfx lanes), float math so no integer wraparound."""
    if arr.ndim == 2:
        return arr
    px = arr.astype(np.float64)
    return (
        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    ).astype(np.uint8)


def palette_to_gray(pal: np.ndarray) -> np.ndarray:
    """(N, 3) RGB palette → per-index gray LUT — the ONE shared reduction
    (gif/bmp lanes).  Grayscale palettes map by index EXACTLY (float luma
    of (i,i,i) truncates to i-1: 0.299+0.587+0.114 < 1.0 in binary);
    color palettes reduce via :func:`rgb_to_gray`."""
    if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
        return np.ascontiguousarray(pal[:, 0])
    return rgb_to_gray(pal.reshape(1, -1, 3)).reshape(-1)


def encode_image(img: np.ndarray) -> bytes:
    """uint8 H×W grayscale → IMG1 bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 H×W grayscale, got {img.dtype} {img.shape}")
    h, w = img.shape
    return _HEADER.pack(MAGIC, w, h) + img.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """IMG1 bytes → uint8 H×W grayscale (zero-copy view of the payload)."""
    magic, w, h = _HEADER.unpack_from(payload, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    arr = np.frombuffer(payload, dtype=np.uint8, offset=_HEADER.size, count=w * h)
    return arr.reshape(h, w)


def decode_page(payload: bytes) -> np.ndarray:
    """Decode one page payload to a grayscale array, routing on format magic.

    Mirrors ``preprocessing.bytes_file_to_array`` (reference
    ``table_extraction/preprocessing.py:10-28``): raw bytes in, uint8 page
    array out.  ``%PDF`` payloads rasterize via a deployed renderer library
    when present, else natively through the from-scratch subset in
    ``pdfx.py`` — the geometry / OCR pipeline after this point is
    format-agnostic.
    """
    head = bytes(payload[:4])
    if head == MAGIC:
        return decode_image(payload)
    if head == b"\x89PNG":
        from .png import decode_png

        return decode_png(payload)  # real PNG pages: stdlib zlib decoder
    if head[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)  # real JPEG pages: from-scratch baseline codec
    if head[:3] == b"GIF":
        from .gif import decode_gif

        return decode_gif(payload)  # real GIF pages: from-scratch LZW codec
    if head[:2] == b"BM":
        from .bmp import decode_bmp

        return decode_bmp(payload)  # real BMP pages: uncompressed DIB
    if head in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        from .ico import decode_ico

        # real ICO/CUR favicons: largest entry, DIB or embedded PNG
        return decode_ico(payload)
    from .tiff import is_tiff_magic

    if is_tiff_magic(head):
        from .tiff import decode_tiff

        # real TIFF pages (scanner/fax archives): from-scratch TIFF 6.0 /
        # BigTIFF reader reusing the CCITT/JPEG/zlib codecs; page 0 — the
        # scan unit is one page per blob, same as the PDF lane
        return decode_tiff(payload)
    head8 = bytes(payload[:8])  # Arrow memoryviews are signed-format:
    # slices never == bytes literals, so compare materialized bytes
    if (head == b"\x00\x00\x00\x0c" and head8[4:8] == b"jP  ") \
            or (head[:2] == b"\xff\x4f" and head8[2:4] == b"\xff\x51"):
        from .jp2 import decode_jp2_gray8

        # real JPEG 2000 pages (JP2 box file or raw codestream):
        # from-scratch ITU T.800 codec sharing the JBIG2 lane's MQ coder
        return decode_jp2_gray8(payload)
    if head == b"%PDF":
        from .sources.pdf_adapter import rasterize_pdf, pdf_renderer_available

        if pdf_renderer_available():
            return rasterize_pdf(payload)
        # no renderer library: the from-scratch PDF subset (pdfx.py —
        # vector paths, Type 3 glyph programs, Flate/DCT image XObjects)
        # rasterizes natively at 72 dpi (1 pt = 1 px, matching the
        # pixel-dimensioned MediaBox of vector document pages).  Features
        # outside the subset (embedded-outline fonts, exotic codecs) raise
        # named errors that the decode stage captures per-row.
        from .pdfx import rasterize_pdf_page

        return rasterize_pdf_page(payload)
    raise ValueError(f"unknown media payload magic {head!r}")


def iter_pages(payload: bytes):
    """Lazily yield (page_index, n_pages, gray page) — the multi-page-aware
    face of :func:`decode_page`.

    Real crawls deliver whole DOCUMENTS (a 40-page fax TIFF, a 300-page
    scanned PDF), not pre-split pages; this is the decode stage's 1→N
    expansion point.  Multi-page containers (TIFF IFD chains, multi-page
    PDFs) expand with one decoded page live at a time; every single-page
    format yields exactly once via ``decode_page`` (zero behavior change).
    Parallelism note: the unit of distribution stays the input row, so a
    whale document serializes within its task — size ingestion batches by
    page count, not document count, when corpora have deep documents.
    """
    head = bytes(payload[:4])
    from .tiff import is_tiff_magic

    if is_tiff_magic(head):
        from .tiff import iter_tiff_pages

        yield from iter_tiff_pages(payload)
        return
    if head == b"%PDF":
        from .sources.pdf_adapter import pdf_renderer_available, pdf_to_pages

        if pdf_renderer_available():
            # the renderer is the authority on page count AND pixels (the
            # from-scratch parser must not pre-gate documents the library
            # handles); pdf_to_pages renders once — O(pages), though the
            # library materializes the whole document (its own contract)
            pages = pdf_to_pages(payload)
            for i, page in enumerate(pages):
                yield i, len(pages), page
            return
        from .pdfx import iter_pdf_pages

        yield from iter_pdf_pages(payload)
        return
    yield 0, 1, decode_page(payload)


def downscale(img: np.ndarray, factor: int) -> np.ndarray:
    """Block-min downscale: the detection-resolution view of a page.

    The reference renders every page twice (dpi 50 detect / dpi 500 OCR,
    ``extractor.py:24-33``).  We render once at high resolution and reduce by
    ``factor`` with a block **minimum**, which preserves thin dark grid lines
    (a plain stride would drop them); bboxes found at low resolution are
    scaled back up by ``factor`` exactly like the reference's
    ``resize_tables_cells`` (``detection.py:607-628``).
    """
    h, w = img.shape
    hc, wc = h - h % factor, w - w % factor
    v = img[:hc, :wc].reshape(hc // factor, factor, wc // factor, factor)
    return v.min(axis=(1, 3))
