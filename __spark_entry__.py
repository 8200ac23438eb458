"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full extraction pipeline (synthetic
interleaved text+media corpus → detected tables → ordered spans).
``queries()`` / ``oracle_sql()`` — 58 entries: operator coverage from
SURVEY.md §2 plus the training-data/curation ops (exact + MinHash-LSH +
SimHash + embedding dedup, ANN with measured recall, quality / langid /
token stats / winnowing, near-dup clustering incl. the fixpoint production
path, stratified sampling, verbatim + fuzzy benchmark decontamination,
Gopher-style repetition signals, CCNet-style cross-corpus chunk dedup,
PII masking) and
the HTML main-content path (DOM boilerplate strip), each with a DuckDB
oracle where ANSI-SQL-expressible; the geometry flagship is gated by
empty-on-success oracle queries (q24/q30, and q46 for the from-scratch PDF
lane), the HTML path by q37-q39/q41/q42/q44 (golden verify, count
invariant, boilerplate no-leak, object-row table harvest, outlink harvest
+ normalization), the multimodal lane (AVI/MJPEG frame sampling + WAV
audio features) by q47, the magic-routed resize stage across every
lossless raster codec (IMG1/PNG/GIF/BMP/LZW-TIFF) by q48, and the header-only
crawl-inventory stage (probe_media over all eight native formats) by q49.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tableextraction_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction pipeline at smoke scale → exploded span rows."""
    from tableextraction_spark.queries.extraction import q00_extract_spans

    return q00_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
