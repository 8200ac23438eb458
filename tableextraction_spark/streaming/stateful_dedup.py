"""Custom stateful streaming operator: cross-batch first-occurrence dedup.

At-least-once ingest can re-deliver a document's blob files; the batch
pipeline is idempotent via the resume anti-join, and this is the streaming
counterpart: a per-key (doc_id) state bit via ``applyInPandasWithState``
drops re-deliveries across micro-batches, so downstream sinks see each
document exactly once even when the source doesn't guarantee it.

Applied to the small post-extraction span rows — never to pixel rows (state
shuffles its input by key; dedup the KB-sized output, not the MB-sized
input).  The reference has no streaming at all (SURVEY §2.9); this is the
engine-side capability the north rule's resumable-ingest story needs.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.assemble import SPANS_SCHEMA

_STATE_SCHEMA = "seen boolean"


def _first_occurrence(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    if state.exists:
        return  # re-delivery — emit nothing
    emitted = False
    for pdf in pdfs:
        if len(pdf) and not emitted:
            yield pdf.head(1)
            emitted = True
    if emitted:
        state.update((True,))


def dedup_spans_stream(spans_stream: DataFrame) -> DataFrame:
    """Streaming (doc_id, spans) rows → first occurrence per doc_id only."""
    return spans_stream.groupBy("doc_id").applyInPandasWithState(
        _first_occurrence,
        outputStructType=SPANS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
