"""Structured-Streaming incremental extraction.

The reference is strictly batch (SURVEY §2.9), but every stage of this
engine is a deterministic per-page/per-document map, so the same DAG runs
incrementally: new blob files landing in the ingest directory are picked up
by a parquet file stream and processed once per normal run/restart
(checkpointed file offsets), with the identical decode/assembly operators
via ``foreachBatch``.  Delivery precision: ``foreachBatch`` parquet appends
alone would be at-least-once under a crash between the append and the
offset commit (one micro-batch can replay), so each batch write anti-joins
the committed output — replays become no-ops and delivery is effectively
exactly-once (``stateful_assembly`` uses the same device; an Iceberg sink
makes the append itself transactional at deployment).

Ingest-unit contract: a document's pages must land in the same micro-batch
(the usual case — the ingest unit is a file of whole documents).  Pages
split across batches would produce two partial span rows for one doc; for
such sources use :mod:`.stateful_assembly` (``run_stateful``), which holds
partial documents in ``applyInPandasWithState`` state until their declared
page count is complete and emits exactly one row per document.

``trigger(availableNow=True)`` drains everything pending and stops, which is
both the test mode and the production catch-up mode; drop it for a
continuously running tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import assemble_spans_sql
from ..pipeline import BLOBS_SCHEMA, detect_tables


def run_incremental(
    spark: SparkSession,
    blobs_dir: str,
    docs: DataFrame,
    out_path: str,
    checkpoint: str,
    classify: bool = False,
    html: bool = False,
) -> None:
    """Drain new blob files → append (doc_id, spans) rows exactly once.

    Note on the ingest-unit contract above: a doc whose pages straddle
    micro-batches would assemble PARTIAL spans per batch here; the sink's
    doc_id dedup then keeps only the first partial — visibly wrong data is
    avoided but so is completeness.  Such sources must use
    :mod:`.stateful_assembly`, which holds partials in state.

    ``html=True`` routes each batch-doc's markup spans through the DOM
    main-content extractor, exactly like the batch pipeline.

    Streaming semantic for html-extracted ``media`` spans: they never GATE
    emission — a doc whose ONLY media refs come from markup is emitted by
    the batch-side no-media write below (dangling <img> refs are the normal
    web case; waiting on blob rows that may never arrive would drop the doc
    forever, and the stream side cannot know which refs will materialize).
    Attachment, however, is opportunistic: ``assemble_spans_sql`` attaches
    detected tables to ANY kind='media' span whose ``media_ref`` matches, so
    an extracted <img> whose src names a blob arriving in the SAME
    micro-batch as the doc's native pages DOES get its tables — but an <img>
    blob arriving later (or for a doc with no native pages) is missed, since
    the doc was already emitted/deduped.  For deterministic attachment of
    blob-backed <img> refs use the BATCH pipeline, or
    ``run_stateful(attach_html_media=True)`` when every ref is guaranteed to
    arrive.
    """
    from pyspark.sql import functions as F

    from ..operators import TABLES_SCHEMA
    from .sink import IdempotentSink

    sink = IdempotentSink(spark, out_path)

    # documents with NO media spans produce no blob rows, so they can never
    # appear in any micro-batch — emit NEW ones batch-side each run (the
    # same device as stateful_assembly; without it a markup-only or
    # text-only doc is silently dropped forever)
    # null-safe: a NULL spans array sizes to -1/NULL, never 0 — such docs
    # must still be emitted (batch outputs them with NULL spans)
    no_media = docs.where(
        F.col("spans").isNull()
        | F.expr("size(filter(spans, s -> s.kind = 'media')) = 0")
    )
    if sink.committed is not None:
        no_media = no_media.join(sink.committed, "doc_id", "left_anti")
    if html:
        from ..operators.html_extract import rewrite_html_spans

        no_media = rewrite_html_spans(no_media).select("doc_id", "spans")
    sink.append_new_docs(
        assemble_spans_sql(no_media, spark.createDataFrame([], TABLES_SCHEMA))
    )

    stream = (
        spark.readStream.schema(BLOBS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(blobs_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        tables = detect_tables(batch_df, classify=classify)
        batch_docs = docs.join(
            batch_df.select("doc_id").distinct(), "doc_id", "left_semi"
        )
        if html:
            from ..operators.html_extract import rewrite_html_spans

            batch_docs = rewrite_html_spans(batch_docs).select("doc_id", "spans")
        sink.append_new_docs(assemble_spans_sql(batch_docs, tables))

    try:
        (
            stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        sink.close()
