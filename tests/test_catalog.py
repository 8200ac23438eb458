"""sources/catalog: Iceberg-or-parquet table routing."""

from tableextraction_spark.sources import (
    iceberg_available,
    is_path,
    read_table,
    write_table,
)


def test_is_path_routing():
    assert is_path("/data/blobs.parquet")
    assert is_path("s3://bucket/corpus")
    assert is_path("rel/dir")
    # bare names (e.g. `--out results`) are relative dirs, NOT catalog refs —
    # only dotted identifiers route to the catalog API (ADVICE round 1)
    assert is_path("results")
    assert is_path("docs.parquet")
    assert not is_path("warehouse.docs")
    assert not is_path("iceberg_cat.db.documents")


def test_iceberg_probe_is_honest(spark):
    # this container ships no Iceberg runtime — the probe must say so
    # (on a deployment with the runtime jar it flips to True and the same
    # read_table/write_table calls hit the Iceberg catalog)
    assert iceberg_available(spark) is False


def test_read_table_catalog_name_uses_spark_table(spark):
    # dotted identifier → catalog API (global temp views live in the
    # `global_temp` database, giving a real two-part catalog name)
    spark.range(5).createOrReplaceGlobalTempView("cat_probe")
    assert read_table(spark, "global_temp.cat_probe").count() == 5


def test_read_write_table_parquet_path(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    write_table(spark.range(3), p)
    assert read_table(spark, p).count() == 3
    write_table(spark.range(2), p)  # append semantics
    assert read_table(spark, p).count() == 5
