"""Shared idempotent parquet sink for the streaming paths.

The committed-output doc_id set is read ONCE per run — only the previous
run's final micro-batch can replay, so a run-start snapshot plus the ids
appended WITHIN the run is the complete dedup set.  Per-batch appends
anti-join that set, so a crash-replayed batch, a re-run, or a duplicate
blob file re-completing a doc later in the same run all become no-ops
without re-scanning the growing output directory per batch.

Within-run dedup is EXECUTOR-SIDE (r4 verdict item 4): earlier rounds
pulled every batch's doc_ids to the driver (first into a set, then into a
Bloom filter with exact suspect verification).  Both kept a driver
roundtrip that grew with batch size.  Now each written batch's distinct
doc_ids are ``localCheckpoint``-ed as a small Spark frame; the next batch
is anti-joined against the union of those frames.  The join is shaped so
the run-id side is NEVER shuffled: duplicate candidates are found with a
map-side semi join (run ids ⋉ broadcast(batch ids) — the broadcast side is
batch-bounded), and only the resulting duplicate set (≤ batch size) is
broadcast back for the left-anti.  Driver memory is O(#batches) frame
references; the id data itself lives on the executors.

Error discipline: only the signatures of "no committed output yet" —
missing path, missing catalog table, or a directory holding nothing but
crash debris (`_temporary` → 'Unable to infer schema') — are treated as
first-run; any other read failure (corrupt footer, permissions, missing
filesystem jar) aborts the run rather than silently disabling dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    Cross-run: one snapshot anti-join (read once, cached).  Within-run:
    executor-side anti-join against the run's localCheckpointed id frames
    (module docstring).  NULL doc_ids always pass straight through — SQL
    null never equals null, so anti-joins keep them, matching the original
    driver-set behavior."""

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
        # per-batch localCheckpointed (doc_id) frames written THIS run;
        # driver holds only the references, the data lives on executors
        self._run_id_frames: list[DataFrame] = []

    def _within_run_dups(self, batch_ids: DataFrame) -> DataFrame | None:
        """(doc_id) frame of batch ids already written this run, or None.

        Shaped so the (potentially large) run-id side never shuffles: a
        map-side semi join with the batch-bounded side broadcast."""
        if not self._run_id_frames:
            return None
        seen = self._run_id_frames[0]
        for f in self._run_id_frames[1:]:
            seen = seen.unionByName(f)
        return seen.join(F.broadcast(batch_ids), "doc_id").distinct()

    def append_new_docs(self, df: DataFrame) -> None:
        if self.committed is not None:
            df = df.join(self.committed, "doc_id", "left_anti")
        rows = df.dropDuplicates(["doc_id"])
        dup = self._within_run_dups(rows.select("doc_id").distinct())
        if dup is not None:
            rows = rows.join(F.broadcast(dup), "doc_id", "left_anti")
        rows = rows.cache()
        try:
            if rows.isEmpty():
                return
            rows.write.mode("append").parquet(self.out_path)
            ids = (
                rows.select("doc_id")
                .where(F.col("doc_id").isNotNull())
                .distinct()
                # eager: materialize from the cached `rows` NOW, so the id
                # snapshot can never diverge from what the write saw
                .localCheckpoint(eager=True)
            )
            self._run_id_frames.append(ids)
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
