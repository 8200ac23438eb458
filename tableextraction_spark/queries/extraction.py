"""The extraction pipeline itself as a driver-contract query.

The driver's TPC-H-ish tables have no interleaved-span documents, so per the
round rules the input table of BASELINE.json's `input_hint` shape is
synthesized deterministically (fixtures/), sized by the scale factor in
``sf_dir``.  Geometry/OCR is not ANSI-SQL-expressible, so the verification
queries are stated **empty-on-success**: q24 emits only documents whose
output spans differ from the plan-derived golden spans, q30 only (doc, kind)
rows whose span counts differ — with the oracle being the same (empty)
relation.  Extraction being exact ⇒ rows/schema/hash all match in the
driver's hard gate; any regression emits rows ⇒ red.  q00 itself (the
exploded span feed) stays a rows-only check, doubly pinned by the
span-equality pytest suite (tests/test_pipeline_spark.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..fixtures.spark_gen import blobs_dataframe, docs_dataframe
from ..pipeline import extract_spans
from .common import sf_of


def _n_docs_for(sf_dir: str) -> int:
    sf = sf_of(sf_dir)
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
    """Extraction golden verify, stated **empty-on-success** so the driver's
    full rows+schema+hash gate applies to the flagship path: the query emits
    one row per document whose extracted spans differ from the plan-derived
    golden spans (span-sequence equality on (kind, text, media_ref, order) —
    the north rule's invariant), and the oracle is the same empty relation.
    A silent extraction regression now flips this row red in
    CORRECTNESS_r{N}.json instead of still showing N rows (VERDICT r1 §wrong 1).
    """
    from ..fixtures.spark_gen import expected_dataframe

    n = _n_docs_for(sf_dir)
    docs = docs_dataframe(spark, n)
    blobs = blobs_dataframe(spark, n)
    out = extract_spans(spark, docs, blobs)
    exp = expected_dataframe(spark, n).withColumnRenamed("spans", "expected")
    return (
        out.join(exp, "doc_id", "full")
        # null-safe inequality: a doc missing from either side is a mismatch
        .where(~F.col("spans").eqNullSafe(F.col("expected")))
        .selectExpr(
            "doc_id",
            "size(spans) AS n_spans",
            "size(expected) AS n_expected",
        )
    )


Q24_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS INT) AS n_spans,
       CAST(NULL AS INT) AS n_expected
WHERE 1 = 0
"""


def q30_extract_count_invariant(spark, sf_dir):
    """q00's count invariant as an oracle-checkable empty-on-success query:
    per-(doc, span-kind) counts of the extraction output must equal the
    fixture plan's counts.  Weaker than q24's full golden equality but
    exercises the exploded q00 shape the driver smoke-checks."""
    from ..fixtures.spark_gen import expected_dataframe

    n = _n_docs_for(sf_dir)
    docs = docs_dataframe(spark, n)
    blobs = blobs_dataframe(spark, n)
    got = (
        extract_spans(spark, docs, blobs)
        .select("doc_id", F.explode("spans").alias("s"))
        .groupBy("doc_id", F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n_out"))
    )
    exp = (
        expected_dataframe(spark, n)
        .select("doc_id", F.explode("spans").alias("s"))
        .groupBy("doc_id", F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n_expected"))
    )
    return (
        got.join(exp, ["doc_id", "kind"], "full")
        .where(~F.col("n_out").eqNullSafe(F.col("n_expected")))
        .select("doc_id", "kind", "n_out", "n_expected")
    )


Q30_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS VARCHAR) AS kind,
       CAST(NULL AS BIGINT) AS n_out, CAST(NULL AS BIGINT) AS n_expected
WHERE 1 = 0
"""


def q46_pdf_extract_golden_verify(spark, sf_dir):
    """q24's golden verify over VECTOR-PDF page payloads: every blob is a
    ``%PDF`` built by the from-scratch writer (``pdfx.build_page_pdf`` —
    Type 3 bitmap glyphs + rect fills), rasterized by the from-scratch
    parser/interpreter (``pdfx.rasterize_pdf_page``), then detected/OCR'd by
    the same kernel.  Empty-on-success: rows = documents whose spans differ
    from the plan goldens.  This pins the reference's PRIMARY input format
    (``preprocessing.py:10-46``) in the driver's hard correctness gate — no
    renderer library involved."""
    from ..fixtures.spark_gen import expected_dataframe

    n = max(8, _n_docs_for(sf_dir) // 2)  # pure-python rasterize: bound wall
    docs = docs_dataframe(spark, n)
    blobs = blobs_dataframe(spark, n, codec="pdf")
    out = extract_spans(spark, docs, blobs)
    exp = expected_dataframe(spark, n).withColumnRenamed("spans", "expected")
    return (
        out.join(exp, "doc_id", "full")
        .where(~F.col("spans").eqNullSafe(F.col("expected")))
        .selectExpr(
            "doc_id",
            "size(spans) AS n_spans",
            "size(expected) AS n_expected",
        )
    )


def q55_scanned_pdf_golden_verify(spark, sf_dir):
    """q46's golden verify over SCANNED-PDF payloads: every blob is a PDF
    whose page is one full-page 1-bit archive-codec image
    (``pdfx.build_scanned_page_pdf``), rotating the encodings real
    scanners emit — **CCITT G4** (``ccitt.py``, ITU T.6 from scratch, the
    dominant one, and the shape of the reference's own ``data/1.pdf…7.pdf``
    steel scans), **JBIG2 generic** (``jbig2.py``, ITU T.88 from scratch:
    MQ-coded region with TPGDON), **JBIG2 symbol/text mode** with the
    dictionary in a ``/JBIG2Globals`` stream (the ``jbig2enc`` scanner
    shape), and **JPX** (``jp2.py``, ITU T.800 from scratch: reversible
    5/3 JPEG 2000 via the PDF ``/JPXDecode`` filter).  Fixture pages are
    binary and every codec here is lossless on them, so every round-trip
    is pixel-exact and the extracted spans must equal the plan goldens
    exactly.  Empty-on-success."""
    from ..fixtures.spark_gen import expected_dataframe

    n = max(8, _n_docs_for(sf_dir) // 2)
    docs = docs_dataframe(spark, n)
    blobs = blobs_dataframe(spark, n, codec="pdfscan")
    out = extract_spans(spark, docs, blobs)
    exp = expected_dataframe(spark, n).withColumnRenamed("spans", "expected")
    return (
        out.join(exp, "doc_id", "full")
        .where(~F.col("spans").eqNullSafe(F.col("expected")))
        .selectExpr(
            "doc_id",
            "size(spans) AS n_spans",
            "size(expected) AS n_expected",
        )
    )


QUERIES = {
    "q00_extract_spans": (q00_extract_spans, None),
    "q24_extract_golden_verify": (q24_extract_golden_verify, Q24_SQL),
    "q30_extract_count_invariant": (q30_extract_count_invariant, Q30_SQL),
    "q46_pdf_extract_golden_verify": (q46_pdf_extract_golden_verify, Q24_SQL),
    "q55_scanned_pdf_golden_verify": (q55_scanned_pdf_golden_verify, Q24_SQL),
}
