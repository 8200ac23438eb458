"""Deterministic synthetic corpus generator: interleaved text+media documents
with rendered table pages and independently-computed golden output spans.

Replaces the reference's sample-PDF fixtures (``/root/reference/data/*.pdf``,
golden YAML in ``README.md:70-227``) with machine-checkable equivalents
(SURVEY.md §5, FIXTURES.md): the generator draws every grid line and glyph
itself, so ground-truth cells/text are known exactly, and the expected output
spans are built **directly from the plan** — independent of the kernel's
detection/assembly code paths.

Everything is a pure function of (SEED, doc_num): safe to call inside Spark
tasks for distributed corpus materialization.

Input schema (BASELINE.json input_hint):
    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>
Media side table: (media_ref, doc_id, page_no, content:binary) — IMG1 pages.
"""

from __future__ import annotations

import json

import numpy as np

from ..font import render_text, text_width
from ..media import encode_image

SEED = 4242
PAGE_W, PAGE_H = 800, 700
PAD = 12          # text padding inside a cell (px)
ROW_H = 36        # grid row height (px)
LINE_T = 2        # grid line thickness (px)
MIN_COL_W = 46    # must exceed detect min run length (0.04·PAGE_W = 32)
SKEW_EVERY = 23   # doc_num % SKEW_EVERY == 5 → long multi-page doc (skew tail)
SKEW_PAGES = 10

EN_WORDS = (
    "steel grade width depth value total name code type size mass load temp "
    "bolt beam pipe rod wire mesh sheet plate alloy zinc iron core test spec "
    "unit item rate mark form heat cast melt bend fold cut mill"
).split()
RU_WORDS = (
    "сталь марка размер массив проба сплав лист труба прокат шов стык котел "
    "болт вал гайка щит слой"
).split()
VOCAB = EN_WORDS + RU_WORDS
HEADER_WORDS = (
    "Grade Width Depth Value Total Name Code Type Size Mass Load Temp "
    "Марка Размер Проба Сплав"
).split()


def _rng(doc_num: int) -> np.random.Generator:
    return np.random.default_rng([SEED, int(doc_num)])


def _word(rng, words=VOCAB) -> str:
    return words[int(rng.integers(0, len(words)))]


# ---------------------------------------------------------------- plan


def _plan_table(rng) -> dict:
    n_cols = int(rng.integers(2, 5))
    n_recs = int(rng.integers(2, 6))
    grouped = bool(n_cols >= 3 and rng.random() < 0.4)
    group = None
    if grouped:
        gsize = int(rng.integers(2, min(3, n_cols - 1) + 1))
        gstart = int(rng.integers(0, n_cols - gsize + 1))
        group = (gstart, gsize, _word(rng, HEADER_WORDS))
    headers = [_word(rng, HEADER_WORDS) for _ in range(n_cols)]
    records = []
    for _ in range(n_recs):
        row = []
        for _ in range(n_cols):
            if rng.random() < 0.15:  # hyphen-wrapped word → exercises cleanup
                a, b = _word(rng), _word(rng)
                row.append({"raw": f"{a} - {b}", "clean": a + b})
            else:
                w = _word(rng)
                row.append({"raw": w, "clean": w})
        records.append(row)
    return {"n_cols": n_cols, "headers": headers, "group": group, "records": records}


def _plan_plot(rng) -> dict:
    """Scatter-plot page plan: axes + k point clusters with exact geometry
    (cluster point centers are plan-determined, so the golden payload is
    computable without running the kernel)."""
    x0 = int(rng.integers(60, 140))
    y0 = int(rng.integers(50, 90))
    w = int(rng.integers(330, 480))
    h = int(rng.integers(200, 280))
    k = int(rng.integers(2, 5))
    cell_w, cell_h = (w - 60) // 3, (h - 60) // 2
    anchors = [(r, c) for r in range(2) for c in range(3)]
    chosen = sorted(int(i) for i in rng.permutation(6)[:k])
    clusters = []
    for ci in chosen:
        ar, ac = anchors[ci]
        ax = x0 + 30 + ac * cell_w + int(rng.integers(0, 12))
        ay = y0 + 30 + ar * cell_h + int(rng.integers(0, 12))
        rows_n = int(rng.integers(2, 4))
        cols_n = int(rng.integers(3, 5))
        pts = []
        # spacing 6 ± 1 jitter → marker blobs (3×3) keep ≥1 blank row/col
        # between them (4-connectivity can't merge) while staying within
        # the DBSCAN chaining radius (worst corner gap √(8²+2²)=8.25 < eps=10)
        for i in range(rows_n):
            for j in range(cols_n):
                jx, jy = int(rng.integers(-1, 2)), int(rng.integers(-1, 2))
                pts.append((ax + j * 6 + jx, ay + i * 6 + jy))
        clusters.append(pts)
    return {"x0": x0, "y0": y0, "w": w, "h": h, "clusters": clusters}


def plan_doc(doc_num: int) -> dict:
    rng = _rng(doc_num)
    n_pages = SKEW_PAGES if doc_num % SKEW_EVERY == 5 else int(rng.integers(1, 4))
    pages = []
    for _ in range(n_pages):
        r = rng.random()
        if r < 0.12:
            n_tables, n_plots = 0, 0
        elif r < 0.60:
            n_tables, n_plots = 1, 0
        elif r < 0.78:
            n_tables, n_plots = 2, 0
        else:
            n_tables, n_plots = 0, 1
        pages.append(
            {
                "tables": [_plan_table(rng) for _ in range(n_tables)],
                "plots": [_plan_plot(rng) for _ in range(n_plots)],
                "text_spans": [
                    " ".join(_word(rng) for _ in range(int(rng.integers(3, 9))))
                    for _ in range(int(rng.integers(1, 3)))
                ],
            }
        )
    return {"doc_id": f"doc-{doc_num:06d}", "pages": pages}


# ---------------------------------------------------------------- geometry


def _table_geometry(tp: dict, rng) -> dict:
    """Column boundaries + row boundaries + per-cell ground truth."""
    n_cols, group = tp["n_cols"], tp["group"]
    col_w = []
    for c in range(n_cols):
        texts = [tp["headers"][c]] + [r[c]["raw"] for r in tp["records"]]
        col_w.append(max(MIN_COL_W, max(text_width(t) for t in texts) + 2 * PAD + 4))
    if group:
        gs, gn, gtext = group
        need = text_width(gtext) + 2 * PAD + 4
        have = sum(col_w[gs : gs + gn])
        if have < need:
            col_w[gs] += need - have
    n_header_rows = 2 if group else 1
    return {
        "col_w": col_w,
        "n_header_rows": n_header_rows,
        "n_rows": n_header_rows + len(tp["records"]),
        "width": sum(col_w),
    }


def _emit_cells(tp: dict, geo: dict, x0: int, y0: int) -> list[dict]:
    """Ground-truth cells (x1,y1,x2,y2,text,is_header) for one table."""
    xs = np.concatenate([[x0], x0 + np.cumsum(geo["col_w"])]).astype(int)
    hr = geo["n_header_rows"]
    ys = [y0 + i * ROW_H for i in range(geo["n_rows"] + 1)]
    cells = []
    group = tp["group"]
    if group:
        gs, gn, gtext = group
        for c in range(tp["n_cols"]):
            if gs <= c < gs + gn:
                continue  # covered below
            cells.append(  # vertically-merged single column header
                dict(x1=xs[c], y1=ys[0], x2=xs[c + 1], y2=ys[2],
                     text=tp["headers"][c], header=True)
            )
        cells.append(
            dict(x1=xs[gs], y1=ys[0], x2=xs[gs + gn], y2=ys[1], text=gtext, header=True)
        )
        for c in range(gs, gs + gn):
            cells.append(
                dict(x1=xs[c], y1=ys[1], x2=xs[c + 1], y2=ys[2],
                     text=tp["headers"][c], header=True)
            )
    else:
        for c in range(tp["n_cols"]):
            cells.append(
                dict(x1=xs[c], y1=ys[0], x2=xs[c + 1], y2=ys[1],
                     text=tp["headers"][c], header=True)
            )
    for r, row in enumerate(tp["records"]):
        for c in range(tp["n_cols"]):
            cells.append(
                dict(x1=xs[c], y1=ys[hr + r], x2=xs[c + 1], y2=ys[hr + r + 1],
                     text=row[c]["raw"], header=False)
            )
    return cells


def _draw_cells(canvas: np.ndarray, cells: list[dict]) -> None:
    t = LINE_T
    for cl in cells:
        x1, y1, x2, y2 = cl["x1"], cl["y1"], cl["x2"], cl["y2"]
        canvas[y1 : y1 + t, x1 : x2 + t] = 0
        canvas[y2 : y2 + t, x1 : x2 + t] = 0
        canvas[y1 : y2 + t, x1 : x1 + t] = 0
        canvas[y1 : y2 + t, x2 : x2 + t] = 0
        if cl["text"]:
            render_text(canvas, x1 + PAD, y1 + PAD, cl["text"])


def _draw_plot(canvas: np.ndarray, pp: dict) -> None:
    x0, y0, w, h = pp["x0"], pp["y0"], pp["w"], pp["h"]
    canvas[y0 : y0 + h + 2, x0 : x0 + 2] = 0          # y axis
    canvas[y0 + h : y0 + h + 2, x0 : x0 + w + 2] = 0  # x axis
    for pts in pp["clusters"]:
        for cx, cy in pts:
            canvas[cy - 1 : cy + 2, cx - 1 : cx + 2] = 0  # 3×3 marker


def page_primitives(page_plan: dict, rng) -> dict:
    """Page plan → drawing primitives + ground truth.

    Returns ``{"rects": [(x, y, w, h)], "texts": [(x, y, s)],
    "truth": [cells]}`` in canvas coordinates (ink boxes / glyph anchors).
    Consumes the SAME rng stream as the stamped path (one ``integers`` draw
    per table), so the vector-PDF writer (``pdfx.build_page_pdf``) and the
    raster codecs produce geometrically identical pages — pinned by
    ``tests/test_pdfx.py`` bit-equality."""
    rects: list[tuple] = []
    texts: list[tuple] = []
    truth = []
    t = LINE_T
    y = 50
    for tp in page_plan["tables"]:
        geo = _table_geometry(tp, rng)
        x0 = 40 + int(rng.integers(0, max(1, PAGE_W - geo["width"] - 80)))
        cells = _emit_cells(tp, geo, x0, y)
        truth.append(cells)
        for cl in cells:
            x1, y1, x2, y2 = cl["x1"], cl["y1"], cl["x2"], cl["y2"]
            rects.append((x1, y1, x2 + t - x1, t))
            rects.append((x1, y2, x2 + t - x1, t))
            rects.append((x1, y1, t, y2 + t - y1))
            rects.append((x2, y1, t, y2 + t - y1))
            if cl["text"]:
                texts.append((x1 + PAD, y1 + PAD, cl["text"]))
        y += geo["n_rows"] * ROW_H + 50
    for pp in page_plan.get("plots", []):
        rects.append((pp["x0"], pp["y0"], 2, pp["h"] + 2))
        rects.append((pp["x0"], pp["y0"] + pp["h"], pp["w"] + 2, 2))
        for pts in pp["clusters"]:
            for cx, cy in pts:
                rects.append((cx - 1, cy - 1, 3, 3))
    return {"rects": rects, "texts": texts, "truth": truth}


def stamp_primitives(prims: dict) -> np.ndarray:
    """Primitives → uint8 canvas (ink=0 on 255), clipping at page bounds."""
    canvas = np.full((PAGE_H, PAGE_W), 255, dtype=np.uint8)
    for (x, y, w, h) in prims["rects"]:
        canvas[max(0, y) : y + h, max(0, x) : x + w] = 0
    for (x, y, s) in prims["texts"]:
        render_text(canvas, x, y, s)
    return canvas


def render_page(page_plan: dict, rng) -> tuple[np.ndarray, list[list[dict]]]:
    """Page plan → (uint8 canvas, per-table ground-truth cell lists)."""
    prims = page_primitives(page_plan, rng)
    return stamp_primitives(prims), prims["truth"]


# ---------------------------------------------------------------- oracle


def expected_table_json(tp: dict) -> str:
    """Golden serialized structure, built from the plan alone (independent of
    the kernel's row-grouping / change-point / tree code)."""
    group = tp["group"]
    headers, columns = [], []
    for c in range(tp["n_cols"]):
        if group and group[0] <= c < group[0] + group[1]:
            continue_flag = True
        else:
            continue_flag = False
        if not continue_flag:
            headers.append({"text": tp["headers"][c], "children": []})
            columns.append((c, tp["headers"][c]))
    if group:
        gs, gn, gtext = group
        node = {
            "text": gtext,
            "children": [{"text": tp["headers"][c], "children": []} for c in range(gs, gs + gn)],
        }
        # insert at the correct x position among top-level singles
        insert_at = sum(1 for c, _ in columns if c < gs)
        headers.insert(insert_at, node)
        for off, c in enumerate(range(gs, gs + gn)):
            columns.insert(insert_at + off, (c, f"{gtext}/{tp['headers'][c]}"))
    columns.sort(key=lambda t: t[0])
    col_paths = [p for _, p in columns]
    records = [[cell["clean"] for cell in row] for row in tp["records"]]
    return json.dumps(
        {"columns": col_paths, "headers": headers, "records": records},
        ensure_ascii=False,
        separators=(",", ":"),
    )


def expected_plot_json(pp: dict) -> str:
    """Golden plot payload from the plan (mirror of kernel/plots.py output:
    clusters sorted by (y, x), centroids = rounded mean of marker centers)."""
    clusters = []
    for pts in pp["clusters"]:
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        clusters.append(
            {
                "n": len(pts),
                "x": int(round(float(np.mean(xs)))),
                "y": int(round(float(np.mean(ys)))),
            }
        )
    clusters.sort(key=lambda c: (c["y"], c["x"]))
    return json.dumps({"clusters": clusters}, separators=(",", ":"))


# ---------------------------------------------------------------- corpus


_MIXED_CODECS = (
    "img1", "png", "jpeg", "gif", "bmp", "pdf", "pdfscan", "tiff", "jp2",
)


def gen_doc(doc_num: int, with_blobs: bool = True, codec: str = "img1"):
    """doc_num → (doc_row, blob_rows, expected_row).

    doc_row/expected_row: {doc_id, spans:[{kind,text,media_ref,offset}]}
    blob_rows: [{media_ref, doc_id, page_no, content}]

    ``codec`` picks the blob payload format: the deterministic ``img1``
    container (default), real ``png`` (stdlib encoder, ``png.py``), real
    near-lossless ``jpeg`` (from-scratch baseline codec, ``jpeg.py``),
    ``jpeg_prog`` (SOF2 progressive, multi-scan), lossless ``gif``
    (from-scratch LZW, ``gif.py``), vector ``pdf``, or ``pdfscan`` (a PDF
    whose page is ONE full-page 1-bit CCITT G4 image — the real scanned-
    document shape; lossless here because fixture pages are binary), or
    ``tiff`` (a 1-bit G4 TIFF page — the fax-archive shape), or ``jp2``
    (a reversible-5/3 JPEG 2000 page, from-scratch T.800) — same
    expected spans, so end-to-end tests pin format routing.  ``mixed``
    rotates the format per document across all nine (the web-crawl shape:
    one corpus, every payload format interleaved).
    """
    if codec == "mixed":
        codec = _MIXED_CODECS[doc_num % len(_MIXED_CODECS)]
    if codec == "img1":
        encode = encode_image
    elif codec == "png":
        from ..png import encode_png as encode
    elif codec == "jpeg":
        from ..jpeg import encode_jpeg_gray

        # near-lossless quant (scanner-grade): 1-px glyph ink must survive
        encode = lambda img: encode_jpeg_gray(img, quality_div=8)  # noqa: E731
    elif codec == "jpeg_prog":
        from ..jpeg import encode_jpeg_gray_progressive

        encode = lambda img: encode_jpeg_gray_progressive(  # noqa: E731
            img, quality_div=8
        )
    elif codec == "gif":
        from ..gif import encode_gif_gray as encode  # lossless LZW
    elif codec == "bmp":
        from ..bmp import encode_bmp_gray as encode  # lossless DIB
    elif codec == "pdf":
        encode = None  # vector path: primitives → PDF, no canvas stamp
    elif codec == "pdfscan":
        from ..pdfx import build_scanned_page_pdf

        # rotate the archive codecs real scanners emit — CCITT G4
        # (dominant), JBIG2 arithmetic generic region, JBIG2 symbol/text
        # mode with a /JBIG2Globals dictionary (the jbig2enc shape), and
        # a JPX (JPEG 2000, reversible 5/3) page — all pixel-exact for
        # the binary fixture pages, so the golden gate (q55) covers every
        # ITU/ISO archive codec end-to-end.  Every third doc additionally
        # ENCRYPTS the PDF (standard security handler, empty user
        # password — the permissions-only shape scan archives ship),
        # rotating RC4-128 / AES-128 / AES-256, so q55 also gates
        # pdfcrypto's transparent stream decryption
        arch = {0: "ccitt", 1: "ccitt", 2: "jbig2",
                3: "jbig2sym", 4: "jpx"}[doc_num % 5]
        crypt = {0: None, 1: "rc4-128", 2: None, 3: "aes-128",
                 4: None, 5: "aes-256"}[doc_num % 6]

        def encode(img, _arch=arch, _crypt=crypt):
            from ..pdfx import encrypt_pdf

            pdf = build_scanned_page_pdf(img, codec=_arch)
            return encrypt_pdf(pdf, _crypt) if _crypt else pdf
    elif codec == "jp2":
        from ..jp2 import encode_jp2_gray

        # real JPEG 2000 pages (reversible 5/3 — lossless): the from-
        # scratch T.800 codec joins the crawl rotation.  5 decomposition
        # levels is the kakadu/openjpeg default — and for document pages
        # (mostly-constant background) it is also the cheap shape: the
        # dense DC band shrinks 16× vs levels=2 and the detail bands
        # stay sparse, so tier-1 codes ~25% fewer decisions
        encode = lambda img: encode_jp2_gray(img, levels=5)  # noqa: E731
    elif codec == "tiff":
        from ..tiff import encode_tiff_gray

        # the fax-archive shape: a 1-bit G4 TIFF page (lossless for the
        # binary {0,255} fixture pages, same reasoning as pdfscan)
        encode = lambda img: encode_tiff_gray(img, "g4")  # noqa: E731
    else:
        raise ValueError(f"unknown blob codec {codec!r}")
    plan = plan_doc(doc_num)
    rng = _rng(doc_num * 2 + 1)  # render jitter stream, separate from plan
    doc_id = plan["doc_id"]
    in_spans, out_spans, blobs = [], [], []

    def _push(spans, kind, text, media_ref):
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    for page_no, page in enumerate(plan["pages"]):
        media_ref = f"m-{doc_id}-p{page_no:03d}"
        for t in page["text_spans"]:
            _push(in_spans, "text", t, "")
            _push(out_spans, "text", t, "")
        _push(in_spans, "media", "", media_ref)
        _push(out_spans, "media", "", media_ref)
        for tp in page["tables"]:
            _push(out_spans, "table", expected_table_json(tp), media_ref)
        for pp in page.get("plots", []):
            _push(out_spans, "plot", expected_plot_json(pp), media_ref)
        if with_blobs:
            prims = page_primitives(page, rng)
            if codec == "pdf":
                from ..pdfx import build_page_pdf

                content = build_page_pdf(
                    prims["rects"], prims["texts"], PAGE_W, PAGE_H
                )
            else:
                content = encode(stamp_primitives(prims))
            blobs.append(
                {
                    "media_ref": media_ref,
                    "doc_id": doc_id,
                    "page_no": page_no,
                    "content": content,
                }
            )
        else:
            # still consume the jitter stream so blobs are reproducible
            for tp in page["tables"]:
                geo = _table_geometry(tp, rng)
                rng.integers(0, max(1, PAGE_W - geo["width"] - 80))
    return (
        {"doc_id": doc_id, "spans": in_spans},
        blobs,
        {"doc_id": doc_id, "spans": out_spans},
    )


def gen_corpus(n_docs: int, start: int = 0, codec: str = "img1"):
    """[start, start+n_docs) → (doc_rows, blob_rows, expected_rows)."""
    docs, blobs, expected = [], [], []
    for i in range(start, start + n_docs):
        d, b, e = gen_doc(i, codec=codec)
        docs.append(d)
        blobs.extend(b)
        expected.append(e)
    return docs, blobs, expected
