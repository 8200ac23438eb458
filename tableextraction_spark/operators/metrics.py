"""Per-partition lineage + counters (FIXTURES.md §5 schema).

The reference only has commented-out ``logging`` calls
(``table_extraction/detection.py:13-17``); the north rule requires real
per-partition lineage: pages decoded, tables detected, cells OCR'd, errors —
derived from the decode stage's output rows (page markers carry obj_no=-1)
grouped by the *decode stage's* partition id, captured via
``spark_partition_id()`` **before** any shuffle.

Counter semantics: ``pages_decoded`` / ``tables_detected`` / ``cells_ocrd`` /
``errors`` are additive across partitions (global total = sum).
``docs_processed`` is a per-partition distinct count — a document whose pages
land in several partitions is counted in each, so the global sum is an upper
bound, not a distinct count (use the spans output for exact doc counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_metrics(tables: DataFrame, run_id: str, stage: str = "decode_detect_ocr") -> DataFrame:
    """Per-table/page rows (incl. partition_id col) → one row per partition."""
    return (
        tables.groupBy("partition_id")
        .agg(
            F.countDistinct("doc_id").alias("docs_processed"),
            F.countDistinct("media_ref").alias("pages_decoded"),
            F.sum((F.col("kind") == "table").cast("long")).alias("tables_detected"),
            F.sum((F.col("kind") == "plot").cast("long")).alias("plots_detected"),
            F.sum(
                F.when(F.col("kind") == "table", F.col("n_items")).otherwise(0)
            ).cast("long").alias("cells_ocrd"),
            F.sum(F.col("error").isNotNull().cast("long")).alias("errors"),
            F.sum("wall_ms").cast("long").alias("wall_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "docs_processed",
            "pages_decoded",
            "tables_detected",
            "plots_detected",
            "cells_ocrd",
            "errors",
            "wall_ms",
            F.current_timestamp().alias("committed_at"),
        )
    )


def html_stage_metrics(rewritten: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage for the HTML main-content stage, in the SAME
    metrics schema as the decode stage so both append to one table.  Input
    is the ``rewrite_html_spans`` frame (REWRITE_SCHEMA: per-doc counter
    columns + partition_id): html source spans parsed → ``pages_decoded``,
    recovered table spans → ``tables_detected``, extracted text/media spans
    → ``cells_ocrd`` (the generic "items produced" slot), parse failures →
    ``errors``.  The map-side partial aggregate makes this one tiny-row
    shuffle; the doc content itself never re-flows."""
    return (
        rewritten.where(
            (F.col("html_parsed") > 0) | (F.col("html_errors") > 0)
        )
        .groupBy("partition_id")
        .agg(
            F.countDistinct("doc_id").alias("docs_processed"),
            F.sum("html_parsed").cast("long").alias("pages_decoded"),
            F.sum("html_tables").cast("long").alias("tables_detected"),
            F.lit(0).cast("long").alias("plots_detected"),
            F.sum("html_others").cast("long").alias("cells_ocrd"),
            F.sum("html_errors").cast("long").alias("errors"),
            F.lit(0).cast("long").alias("wall_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit("html_extract").alias("stage"),
            "partition_id",
            "docs_processed",
            "pages_decoded",
            "tables_detected",
            "plots_detected",
            "cells_ocrd",
            "errors",
            "wall_ms",
            F.current_timestamp().alias("committed_at"),
        )
    )
