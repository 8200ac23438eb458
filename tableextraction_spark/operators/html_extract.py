"""HTML main-content extraction as a batched Spark stage.

Input spans of kind ``html`` carry raw markup in ``text``; this stage parses
and boilerplate-strips them (htmlx.py) inside one ``mapInPandas`` — Arrow
batches in, Arrow batches out, never per-row Python at the DataFrame layer —
emitting one row per extracted span keyed by (doc_id, src_offset) so the
assembly can splice them back *in place of* the raw html span.

Scale properties:

* the stage maps directly over the docs scan (narrow: explode → filter →
  mapInPandas); markup bytes never shuffle — only the extracted KB-sized
  span rows reach the assembly's groupBy(doc_id);
* a multi-MB html payload is one Arrow row; pandas batches bound memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py);
* per-row failure isolation mirrors the raster decode stage
  (`operators/decode_detect.py`): a malformed payload yields an ``error``
  row (obj_no = -1) instead of failing the task; assembly drops it, the
  lineage metrics can count it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HTML_OBJS_SCHEMA = (
    "doc_id string, src_offset int, obj_no int, kind string, text string, "
    "media_ref string, error string"
)

_COLS = ["doc_id", "src_offset", "obj_no", "kind", "text", "media_ref", "error"]


def _parse_batches(batches):
    from ..htmlx import extract_main_spans

    for pdf in batches:
        rows = []
        for doc_id, off, markup in zip(pdf["doc_id"], pdf["src_offset"], pdf["html"]):
            try:
                spans = extract_main_spans(markup or "")
            except Exception as exc:  # noqa: BLE001 — per-row isolation
                rows.append((doc_id, int(off), -1, "error", "", "", repr(exc)[:500]))
                continue
            for i, s in enumerate(spans):
                rows.append(
                    (doc_id, int(off), i, s["kind"], s["text"], s["media_ref"], None)
                )
        yield pd.DataFrame(rows, columns=_COLS)


def extract_html_objects(docs: DataFrame) -> DataFrame:
    """docs (doc_id, spans) → one row per main-content span extracted from
    each kind='html' input span: (doc_id, src_offset, obj_no, kind, text,
    media_ref, error)."""
    htmls = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "html")
        .select(
            "doc_id",
            F.col("s.offset").alias("src_offset"),
            F.col("s.text").alias("html"),
        )
    )
    return htmls.mapInPandas(_parse_batches, HTML_OBJS_SCHEMA).withColumn(
        "partition_id", F.spark_partition_id()
    )
