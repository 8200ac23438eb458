"""Per-table YAML/JSON export — the reference's user-facing output format.

Compatibility shim for ``table_extraction/export.py:77-122`` (``save``): one
file per detected table named ``{doc}_table_{num}.{yaml|json}``, YAML as a
stream of per-record documents (``yaml.dump(record)`` appended per record,
``export.py:95-105``), each record a list of single-key ``{header: value}``
mappings with child headers nested as lists — the exact shape of the
README.md:70-89 golden sample.

Two deliberate deviations, both documented:

- the reference's JSON branch re-dumps the WHOLE structure once per record
  (``export.py:117-120`` — a quadratic-output bug flagged in SURVEY §7); we
  write the record list once.
- records come from the engine's table-span payload (columns/headers/
  records JSON) instead of the in-memory ``fill_structure`` dicts; leaf
  values are consumed in reading order exactly like ``fill_structure``'s
  document-order fill (``builder.py:365-387``) minus its destructive pop.

This is a driver-side debugging/compat utility for small result sets — the
100 TB sink remains the spans table (``pipeline.run_to_parquet``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _fill(node: dict, values) -> dict:
    """Header-tree node + leaf-value iterator → {header: value-or-children}."""
    if node.get("children"):
        return {node["text"]: [_fill(c, values) for c in node["children"]]}
    return {node["text"]: next(values, "")}


def record_rows(payload: dict) -> list[list[dict]]:
    """Table payload JSON → per-record list of {header: value} mappings."""
    out = []
    for rec in payload.get("records", []):
        values = iter(rec)
        out.append([_fill(h, values) for h in payload.get("headers", [])])
    return out


def save_tables(doc_id: str, payloads: list[str], out_dir: str,
                format: str = "yaml") -> list[str]:
    """Write one file per table payload; returns the paths written."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for num, raw in enumerate(payloads):
        payload = json.loads(raw)
        records = record_rows(payload)
        path = os.path.join(out_dir, f"{doc_id}_table_{num}.{format}")
        if format == "yaml":
            import yaml  # baked into this environment; import-gated anyway

            with open(path, "w", encoding="utf-8") as f:
                for record in records:
                    # per-record dump-append mirrors export.py:100-105
                    yaml.dump(record, f, default_flow_style=False,
                              allow_unicode=True)
        elif format == "json":
            with open(path, "w", encoding="utf-8") as f:
                json.dump(records, f, ensure_ascii=False, indent=4)
        else:
            raise ValueError(f"unknown export format {format!r}")
        written.append(path)
    return written


def export_tables(spans_df: DataFrame, out_dir: str, format: str = "yaml") -> int:
    """(doc_id, spans) rows → per-table files; returns tables written.

    Driver-side collect: use only on filtered/small outputs (the reference
    writes local files per document too — ``export.py:95-96``).
    """
    rows = (
        spans_df.selectExpr(
            "doc_id",
            "filter(spans, s -> s.kind = 'table') AS tspans",
        )
        .selectExpr("doc_id", "transform(tspans, s -> s.text) AS payloads")
        .where("size(payloads) > 0")
        .collect()
    )
    n = 0
    for r in rows:
        n += len(save_tables(r.doc_id, list(r.payloads), out_dir, format))
    return n
