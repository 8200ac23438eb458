"""applyInPandasWithState cross-batch dedup: a doc re-delivered in a later
micro-batch must not be emitted twice."""

import json
import time

from tableextraction_spark.streaming.stateful_dedup import dedup_spans_stream


def _span_rows(doc_ids):
    return [
        {
            "doc_id": d,
            "spans": [
                {"kind": "text", "text": f"body-{d}", "media_ref": "", "offset": 0}
            ],
        }
        for d in doc_ids
    ]


def test_cross_batch_first_occurrence(spark, tmp_path):
    from tableextraction_spark.operators.assemble import SPANS_SCHEMA

    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")

    def write_wave(doc_ids, name):
        spark.createDataFrame(_span_rows(doc_ids), SPANS_SCHEMA).coalesce(
            1
        ).write.mode("append").json(f"{src}/{name}")

    # wave 1: docs a,b — wave 2 re-delivers b plus new c
    write_wave(["a", "b"], "w1")

    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/*")
    )
    out = dedup_spans_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    write_wave(["b", "c"], "w2")
    q.processAllAvailable()
    rows = spark.sql("SELECT doc_id FROM deduped").collect()
    q.stop()

    got = sorted(r.doc_id for r in rows)
    assert got == ["a", "b", "c"]  # b exactly once despite re-delivery
