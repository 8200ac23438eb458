"""Checkpoint/resume: process only documents absent from the committed output.

SURVEY §2.9/§4.3 — the idempotent anti-join resume.  The committed ``doc_id``
projection prunes to a single column at the scan; Catalyst/AQE picks
broadcast-hash when the committed set is small (early resume) and falls back
to sort-merge with skew splitting when it isn't (late resume at 10^12 docs) —
we deliberately do NOT force a broadcast hint here.  Re-running a
partially-committed job converges without reprocessing
(tested in test_pipeline_spark.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def filter_unprocessed(docs: DataFrame, committed: DataFrame | None) -> DataFrame:
    """docs LEFT ANTI JOIN committed ON doc_id (no-op when committed is None)."""
    if committed is None:
        return docs
    return docs.join(committed.select("doc_id").distinct(), "doc_id", "left_anti")
