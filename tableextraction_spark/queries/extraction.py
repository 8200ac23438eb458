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


QUERIES = {
    "q00_extract_spans": (q00_extract_spans, None),
}
