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
- ``iceberg+file:/path`` (or a plain path already holding a
  ``metadata/v*.metadata.json`` layout) → the NATIVE Iceberg v2 path:
  this repo's from-scratch writer commits each append as one atomic
  snapshot (sources/iceberg_native.append_snapshot) and reads resolve
  the current committed snapshot — transactional resume without the JVM
  runtime.  This is how the spans/metrics sinks honor the north rule's
  "resumes from the last committed snapshot" on a bare filesystem.
- anything else with a ``/`` (or ``file:``/``s3:`` scheme) → parquet
  path: ``spark.read.parquet`` / ``DataFrameWriter.parquet`` append.
  The fixture/bench path, and byte-identical in behavior to the catalog
  form minus transactional commit.

``iceberg_available`` is a classpath probe so deployments fail loud at
startup, not mid-job (mirrors media.decode_page's explicit PDF stub).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Syntax alone cannot separate "my-catalog.db.tbl" (catalog) from
# "results-v2.d" (a local dir): both are dotted-hyphenated.  Routing rule:
# 1. `.parquet` suffix → always a path.
# 2. When a session is available and the first dotted part names a
#    CONFIGURED catalog (spark.sql.catalog.<name> set — which any working
#    catalog ref requires), → catalog.  This is how hyphenated or deeply
#    nested refs route correctly, and only when they can actually work.
# 3. Otherwise only plain 2-3 part \w identifiers (db.table /
#    catalog.db.table) are catalog refs; everything else — bare names,
#    hyphenated dotted names, 4+ parts without a configured catalog — is a
#    filesystem path.
_CATALOG_REF = re.compile(r"^\w+(\.\w+){1,2}$")


def is_path(ref: str, spark: SparkSession | None = None) -> bool:
    if ref.endswith(".parquet"):
        return True
    if spark is not None and "." in ref:
        first = ref.split(".", 1)[0]
        try:
            if spark.conf.get(f"spark.sql.catalog.{first}", None):
                return False
        except Exception:
            pass
    return not _CATALOG_REF.match(ref)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


#: Explicit scheme for NATIVE Iceberg tables — committed and resolved by
#: this repo's from-scratch v2 reader/writer (sources/iceberg_native.py),
#: no JVM Iceberg runtime needed.  ``iceberg+file:/path/to/table``.
NATIVE_ICEBERG_SCHEME = "iceberg+file:"


def _native_dir(ref: str) -> str:
    return ref[len(NATIVE_ICEBERG_SCHEME):]


def _is_native_iceberg(ref: str) -> bool:
    """The explicit scheme, or a plain path that already holds a native
    table layout — so resume reads route to the snapshot view without
    the caller repeating the scheme.  Layout detection is the ONE shared
    predicate (iceberg_native.is_native_table_dir)."""
    if ref.startswith(NATIVE_ICEBERG_SCHEME):
        return True
    from .iceberg_native import is_native_table_dir

    return is_native_table_dir(ref)


def read_native_iceberg(spark: SparkSession, table_dir: str) -> DataFrame:
    """Current committed snapshot of a native table as a DataFrame: the
    live data-file list from the metadata walk → one parquet scan.
    Snapshots with row-level deletes refuse loudly (read_table_files) —
    the append-only sinks never write them."""
    from .iceberg_native import (
        is_native_table_dir,
        read_table_files,
        spark_ddl_for,
        table_schema,
    )

    if not is_native_table_dir(table_dir):
        # covers both a missing dir AND crash debris (metadata/ created
        # but no version ever committed) — either way nothing is
        # committed, which the resume path treats as first-run
        raise ValueError(f"PATH_NOT_FOUND: no committed native Iceberg "
                         f"table at {table_dir}")
    files = read_table_files(table_dir)
    if files:
        fields = table_schema(table_dir)
        reader = spark.read
        if fields:
            # project through the TABLE schema, not one file's: appends
            # that added columns null-fill older files instead of the
            # column silently vanishing behind mergeSchema=false
            reader = reader.schema(spark_ddl_for(fields))
        return reader.parquet(*[f["path"] for f in files])
    # empty table: reconstruct the recorded schema so downstream joins
    # (e.g. the resume anti-join) see the right columns
    fields = table_schema(table_dir) or []
    if not fields:
        raise ValueError(
            f"native Iceberg table at {table_dir} is empty and records no "
            "schema — cannot build a typed empty DataFrame"
        )
    from .iceberg_native import spark_ddl_for

    return spark.createDataFrame([], spark_ddl_for(fields))


def write_native_iceberg(df: DataFrame, table_dir: str) -> int:
    """Append ``df`` to a native table as ONE transactional snapshot:
    Spark writes parquet into a fresh per-commit directory under data/,
    per-file stats are harvested from the parquet footers, and the
    snapshot commit (append_snapshot) makes the files visible atomically.
    A crash before the commit leaves only unreferenced files — readers
    still see the previous snapshot.  Returns the snapshot id."""
    import os
    import shutil
    import uuid

    import pyarrow.parquet as pq

    from .iceberg_native import (
        CommitConflictError,
        append_snapshot,
        iceberg_fields_for,
        table_schema,
    )

    stage = os.path.join(table_dir, "data", f"commit-{uuid.uuid4().hex}")
    df.write.parquet(stage)
    try:
        files = []
        for name in sorted(os.listdir(stage)):
            if not name.endswith(".parquet"):
                continue
            p = os.path.join(stage, name)
            files.append(
                (p, pq.ParquetFile(p).metadata.num_rows, os.path.getsize(p))
            )
        # optimistic concurrency: on a version conflict, re-read the
        # table state and re-commit the SAME staged files (Iceberg's
        # HadoopTableOperations retry contract)
        for attempt in range(3):
            existing = None
            try:
                existing = table_schema(table_dir)
            except FileNotFoundError:
                pass  # first commit
            fields = iceberg_fields_for(df.schema, existing)
            try:
                return append_snapshot(table_dir, files, fields)
            except CommitConflictError:
                if attempt == 2:
                    raise
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)  # no orphaned data files
        raise


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Load a table by catalog name (Iceberg et al.), native-Iceberg
    table dir (``iceberg+file:`` or auto-detected layout), or parquet
    path."""
    if ref.startswith(NATIVE_ICEBERG_SCHEME):
        return read_native_iceberg(spark, _native_dir(ref))
    if is_path(ref, spark):
        if _is_native_iceberg(ref):
            return read_native_iceberg(spark, ref)
        return spark.read.parquet(ref)
    return spark.table(ref)


def write_table(df: DataFrame, ref: str) -> None:
    """Append rows to a catalog table (transactional under Iceberg) or a
    parquet path (the fixture fallback).

    Parquet paths auto-create; catalog tables don't — so a missing catalog
    table falls back to ``createOrReplace`` semantics via ``create()``, making
    the FIRST run of a job against a fresh table name succeed instead of
    dying at the final write after hours of extraction compute.
    """
    if ref.startswith(NATIVE_ICEBERG_SCHEME):
        write_native_iceberg(df, _native_dir(ref))
        return
    if is_path(ref, df.sparkSession):
        if _is_native_iceberg(ref):
            write_native_iceberg(df, ref)
            return
        df.write.mode("append").parquet(ref)
        return
    try:
        df.writeTo(ref).append()
    except Exception as exc:
        msg = str(exc)
        if "TABLE_OR_VIEW_NOT_FOUND" in msg or "not found" in msg.lower():
            df.writeTo(ref).create()
        elif "v1 table" in msg:
            # the session catalog (no Iceberg runtime) exposes v1 tables,
            # which DataFrameWriterV2 refuses to append to — fall back to
            # the v1 writer with identical append semantics.  Under an
            # Iceberg catalog the writeTo path above is the one taken and
            # the append is a transactional snapshot commit.
            df.write.mode("append").saveAsTable(ref)
        else:
            raise
