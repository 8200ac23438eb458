"""The extraction pipeline itself as a driver-contract query.

The driver's TPC-H-ish tables have no interleaved-span documents, so per the
round rules the input table of BASELINE.json's `input_hint` shape is
synthesized deterministically (fixtures/), sized by the scale factor in
``sf_dir``.  Geometry/OCR is not ANSI-SQL-expressible → no oracle entry; the
driver records the rows-only check.  Correctness of this path is instead
gated by the span-equality pytest suite (tests/test_pipeline_spark.py) and
the in-query golden assertion below (output joined against expected spans;
``matches_golden`` is 1 for every row if extraction is exact).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ..fixtures.spark_gen import blobs_dataframe, docs_dataframe
from ..pipeline import extract_spans


def _n_docs_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.001
    return max(8, int(round(sf * 2000)))


def q00_extract_spans(spark, sf_dir):
    """Full pipeline on the synthesized corpus → exploded span rows."""
    n = _n_docs_for(sf_dir)
    docs = docs_dataframe(spark, n)
    blobs = blobs_dataframe(spark, n)
    out = extract_spans(spark, docs, blobs)
    return out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
        F.md5(F.col("s.text")).alias("text_md5"),
    )


def q24_extract_golden_verify(spark, sf_dir):
    """Extraction self-verification: output spans compared per-doc against
    the plan-derived golden spans INSIDE the query, so even the driver's
    rows-only check witnesses the invariant (`golden_equal` must be 1 for
    every row)."""
    from ..fixtures.spark_gen import expected_dataframe

    n = _n_docs_for(sf_dir)
    docs = docs_dataframe(spark, n)
    blobs = blobs_dataframe(spark, n)
    out = extract_spans(spark, docs, blobs)
    exp = expected_dataframe(spark, n).withColumnRenamed("spans", "expected")
    return (
        out.join(exp, "doc_id", "full")
        .selectExpr(
            "doc_id",
            "size(spans) AS n_spans",
            "CAST(spans = expected AS INT) AS golden_equal",
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "q00_extract_spans": (q00_extract_spans, None),
    "q24_extract_golden_verify": (q24_extract_golden_verify, None),
}
