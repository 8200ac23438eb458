"""Shared idempotent parquet sink for the streaming paths.

The committed-output doc_id set is read ONCE per run — only the previous
run's final micro-batch can replay, so a run-start snapshot plus the ids
appended WITHIN the run (tracked batch-by-batch) is the complete dedup set.
Per-batch appends anti-join that set, so a crash-replayed batch, a re-run,
or a duplicate blob file re-completing a doc later in the same run all
become no-ops without re-scanning the growing output directory per batch.

Error discipline: only the signatures of "no committed output yet" —
missing path, missing catalog table, or a directory holding nothing but
crash debris (`_temporary` → 'Unable to infer schema') — are treated as
first-run; any other read failure (corrupt footer, permissions, missing
filesystem jar) aborts the run rather than silently disabling dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MISSING_OUTPUT_TAGS = (
    "PATH_NOT_FOUND",
    "Path does not exist",
    "TABLE_OR_VIEW_NOT_FOUND",
    # dir exists but holds only crash debris (_temporary): no data files
    "Unable to infer schema",
    "UNABLE_TO_INFER_SCHEMA",
)


def is_missing_output_error(exc: Exception) -> bool:
    """True iff the error means 'nothing committed yet' (first run)."""
    msg = str(exc)
    return any(tag in msg for tag in _MISSING_OUTPUT_TAGS)


class IdempotentSink:
    """Append-only parquet sink deduplicating on doc_id across runs AND
    within the current run.

    Within-run ids are collected to the driver per batch (bounded: a
    micro-batch completes at most its own documents; the cumulative set is
    the run's output keys — the same driver-side bound as the batch resume
    prune, RESUME_PRUNE_MAX ≈ 30 MB per million ids).
    """

    def __init__(self, spark: SparkSession, out_path: str):
        self.spark = spark
        self.out_path = out_path
        try:
            committed = spark.read.parquet(out_path).select("doc_id")
        except Exception as exc:
            if not is_missing_output_error(exc):
                raise
            committed = None
        self.committed = committed.cache() if committed is not None else None
        self.run_ids: set[str] = set()

    def append_new_docs(self, df: DataFrame) -> None:
        if self.committed is not None:
            df = df.join(self.committed, "doc_id", "left_anti")
        df = df.dropDuplicates(["doc_id"])
        if self.run_ids:
            # ids emitted earlier THIS run: broadcast anti-join against a
            # driver-built frame (JVM-side; never a per-row Python UDF)
            from pyspark.sql import functions as F

            ids_df = self.spark.createDataFrame(
                [(i,) for i in self.run_ids], "doc_id string"
            )
            df = df.join(F.broadcast(ids_df), "doc_id", "left_anti")
        rows = df.cache()
        try:
            rows.write.mode("append").parquet(self.out_path)
            self.run_ids.update(r.doc_id for r in rows.select("doc_id").collect())
        finally:
            rows.unpersist()

    def close(self) -> None:
        if self.committed is not None:
            self.committed.unpersist()


def read_committed_ids(spark: SparkSession, out_path: str) -> DataFrame | None:
    """(doc_id) frame of the committed output, or None before first write."""
    try:
        return spark.read.parquet(out_path).select("doc_id")
    except Exception as exc:
        if is_missing_output_error(exc):
            return None
        raise
