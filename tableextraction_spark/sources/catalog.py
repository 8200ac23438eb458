"""Table references: Iceberg catalog tables or parquet paths, one API.

The north rule's corpus is an Iceberg table; this sandbox has no Iceberg
runtime jars (no network, no --packages), so the engine routes on the
reference form and degrades explicitly:

- ``db.table`` / ``catalog.db.table`` (no path separator) → Spark catalog
  API: ``spark.table`` / ``DataFrameWriterV2.append`` — exactly the calls
  that hit Iceberg when ``spark.sql.catalog.*`` is configured with the
  Iceberg runtime on the classpath.  Snapshot isolation, hidden
  partitioning, and commit-time atomicity then come from Iceberg itself;
  the engine's resume anti-join consumes whatever the catalog's committed
  snapshot shows.
- anything with a ``/`` (or ``file:``/``s3:`` scheme) → parquet path:
  ``spark.read.parquet`` / ``DataFrameWriter.parquet`` append.  The
  fixture/bench path, and byte-identical in behavior to the catalog form
  minus transactional commit.

``iceberg_available`` is a classpath probe so deployments fail loud at
startup, not mid-job (mirrors media.decode_page's explicit PDF stub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_path(ref: str) -> bool:
    return "/" in ref or ref.endswith(".parquet") or ":" in ref


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Load a table by catalog name (Iceberg et al.) or parquet path."""
    if is_path(ref):
        return spark.read.parquet(ref)
    return spark.table(ref)


def write_table(df: DataFrame, ref: str) -> None:
    """Append rows to a catalog table (transactional under Iceberg) or a
    parquet path (the fixture fallback)."""
    if is_path(ref):
        df.write.mode("append").parquet(ref)
    else:
        df.writeTo(ref).append()
