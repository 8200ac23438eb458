"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full extraction pipeline (synthetic
interleaved text+media corpus → detected tables → ordered spans).
``queries()`` / ``oracle_sql()`` — operator coverage from SURVEY.md §2 plus
the training-data ops (dedup / MinHash / SimHash / quality / langid / ANN),
each with a DuckDB oracle where ANSI-SQL-expressible.
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
