"""Fused decode → detect → OCR → per-table assembly as one mapInArrow stage.

Covers reference stages A–F at the per-table level
(``table_extraction/extractor.py:24-68``): page decode
(``preprocessing.py:10-62``), gray/binarize (``:81-112``), line detection +
node/cell geometry (``detection.py:221-604``), template OCR
(``recognition.py:167-238`` role), and per-table structure build
(``builder.py:11-426`` + ``export.py:21-74``) — all inside one Arrow batch
UDF so page pixels cross the JVM↔Python boundary exactly once and **never
shuffle**: the stage maps straight over the media-blob scan, emitting only
small JSON rows.

Per-row failure isolation (reference wraps each stage in try/except returning
False, ``extractor.py:27-66``): a failing page emits an ``error`` row instead
of aborting the task.  Each successfully decoded page emits a page-marker row
(``table_no = -1``) so page/table/cell counters survive into the lineage
metrics even for table-less pages.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

TABLES_SCHEMA = (
    "doc_id string, media_ref string, page_no int, table_no int, "
    "n_cells int, payload string, error string"
)

_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("page_no", pa.int32()),
        ("table_no", pa.int32()),
        ("n_cells", pa.int32()),
        ("payload", pa.string()),
        ("error", pa.string()),
    ]
)


def decode_detect_ocr(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow fn over (doc_id, media_ref, page_no, content) blob rows."""
    # imports inside the UDF body: executed once per worker interpreter
    from ..kernel import assemble_table, process_page
    from ..media import decode_page

    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        page_nos = batch.column("page_no").to_pylist()
        contents = batch.column("content")
        rows: list[tuple] = []
        for i in range(batch.num_rows):
            did, ref, pno = doc_ids[i], refs[i], int(page_nos[i])
            try:
                page = decode_page(contents[i].as_py())
                tables = process_page(page)
            except Exception as exc:  # per-row failure isolation
                rows.append((did, ref, pno, -1, 0, None, f"{type(exc).__name__}: {exc}"))
                continue
            rows.append((did, ref, pno, -1, 0, None, None))  # page marker
            for tno, (_bbox, cells, texts) in enumerate(tables):
                payload = assemble_table(cells, texts)
                rows.append((did, ref, pno, tno, len(cells), payload, None))
        if rows:
            cols = list(zip(*rows))
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, _ARROW_SCHEMA)],
                schema=_ARROW_SCHEMA,
            )
