"""Native Iceberg v2 APPEND path (sources/iceberg_native.append_snapshot +
catalog routing): cumulative snapshot commits, atomic visibility (a crash
before the commit leaves only unreferenced files), time travel, field-id
stability across appends, and the resume loop through run_to_parquet —
all without a JVM Iceberg runtime, per the catalog module contract.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tableextraction_spark.sources.catalog import (
    NATIVE_ICEBERG_SCHEME,
    read_native_iceberg,
    read_table,
    write_native_iceberg,
    write_table,
)
from tableextraction_spark.sources.iceberg_native import (
    append_snapshot,
    iceberg_fields_for,
    read_table_files,
    read_table_snapshot,
    snapshot_ids,
    table_schema,
)


def _pq(path, ids):
    pq.write_table(pa.table({"id": ids, "v": [i * 10 for i in ids]}), path)
    return path, len(ids), os.path.getsize(path)


FIELDS = [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "long"},
]


# ------------------------------------------------ metadata layer (no Spark)

def test_append_snapshot_is_cumulative_with_time_travel(tmp_path):
    t = str(tmp_path / "tbl")
    os.makedirs(os.path.join(t, "data"))
    f1 = _pq(os.path.join(t, "data", "a.parquet"), [1, 2, 3])
    s1 = append_snapshot(t, [f1], FIELDS)
    f2 = _pq(os.path.join(t, "data", "b.parquet"), [4, 5])
    s2 = append_snapshot(t, [f2], FIELDS)
    assert (s1, s2) == (1, 2)
    assert snapshot_ids(t) == [1, 2]
    # current snapshot sees BOTH files (the manifest carry-forward)
    files = read_table_files(t)
    assert sorted(os.path.basename(f["path"]) for f in files) == [
        "a.parquet", "b.parquet"
    ]
    assert sum(f["record_count"] for f in files) == 5
    # time travel: snapshot 1 sees only the first commit
    old = read_table_snapshot(t, snapshot_id=1)["data_files"]
    assert [os.path.basename(f["path"]) for f in old] == ["a.parquet"]


def test_append_over_fixture_written_table(tmp_path):
    """append_snapshot composes with the fixture author write_table —
    the carried-forward manifests are reused untouched."""
    from tableextraction_spark.sources.iceberg_native import write_table as wt

    t = str(tmp_path / "tbl")
    os.makedirs(os.path.join(t, "data"))
    f1 = _pq(os.path.join(t, "data", "a.parquet"), [1, 2])
    wt(t, [f1[:3]], snapshot_id=1, schema_fields=FIELDS)
    f2 = _pq(os.path.join(t, "data", "b.parquet"), [3])
    append_snapshot(t, [f2])
    files = read_table_files(t)
    assert sorted(os.path.basename(f["path"]) for f in files) == [
        "a.parquet", "b.parquet"
    ]
    assert table_schema(t) == FIELDS  # schema carried when not passed


def test_uncommitted_files_stay_invisible(tmp_path):
    t = str(tmp_path / "tbl")
    os.makedirs(os.path.join(t, "data"))
    f1 = _pq(os.path.join(t, "data", "a.parquet"), [1])
    append_snapshot(t, [f1], FIELDS)
    # a crash mid-append: data written, NO commit
    _pq(os.path.join(t, "data", "orphan.parquet"), [9, 9, 9])
    files = read_table_files(t)
    assert [os.path.basename(f["path"]) for f in files] == ["a.parquet"]
    # and the hint file is never torn: only whole-file renames happen
    assert open(os.path.join(t, "metadata", "version-hint.text")).read() == "1"


def test_field_ids_stable_and_new_columns_get_fresh_ids():
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    fields = iceberg_fields_for(schema, FIELDS)
    assert [(f["id"], f["name"]) for f in fields] == [(1, "id"), (2, "v")]
    wider = T.StructType(
        schema.fields + [T.StructField("extra", T.StringType())]
    )
    fields2 = iceberg_fields_for(wider, FIELDS)
    assert [(f["id"], f["name"]) for f in fields2] == [
        (1, "id"), (2, "v"), (3, "extra")
    ]
    assert fields2[2]["type"] == "string"


def test_nested_spans_shape_gets_recursive_stable_ids():
    """array<struct<…>> — the spans table's own shape — maps to Iceberg
    list/struct JSON with unique ids, and a second conversion against the
    first keeps EVERY nested id stable."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "spans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("kind", T.StringType()),
                            T.StructField("offset", T.IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )
    from tableextraction_spark.sources.iceberg_native import (
        _all_ids,
        spark_ddl_for,
    )

    f1 = iceberg_fields_for(schema, None)
    ids = _all_ids(f1)
    assert len(ids) == len(set(ids)) == 5  # doc_id, spans, element, 2 subs
    f2 = iceberg_fields_for(schema, f1)
    assert f2 == f1  # every id, nested included, is stable
    assert spark_ddl_for(f1) == (
        "doc_id string, spans array<struct<kind: string, offset: int>>"
    )


def test_unmappable_type_refuses_loudly():
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("a", T.CalendarIntervalType())])
    with pytest.raises(NotImplementedError, match="no Iceberg mapping"):
        iceberg_fields_for(schema, None)


# --------------------------------------------------- Spark catalog routing

def test_spark_write_read_roundtrip_and_autodetect(spark, tmp_path):
    t = str(tmp_path / "tbl")
    ref = NATIVE_ICEBERG_SCHEME + t
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    write_table(df, ref)
    write_table(spark.range(5, 8).selectExpr("id", "id * 2 AS v"), ref)
    got = read_table(spark, ref)
    assert got.count() == 8
    assert {r.id for r in got.collect()} == set(range(8))
    # a PLAIN path to the same dir auto-detects the native layout —
    # the resume read needs no scheme
    assert read_table(spark, t).count() == 8
    assert snapshot_ids(t) == [1, 2]
    # and appends through the plain path commit snapshots too
    write_table(spark.range(8, 9).selectExpr("id", "id * 2 AS v"), t)
    assert read_table(spark, t).count() == 9
    assert snapshot_ids(t) == [1, 2, 3]


def test_spark_empty_table_read_has_schema(spark, tmp_path):
    t = str(tmp_path / "tbl")
    append_snapshot(t, [], FIELDS)  # empty commit, schema recorded
    got = read_native_iceberg(spark, t)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "v"]


def test_spark_missing_table_raises_path_not_found(spark, tmp_path):
    with pytest.raises(Exception, match="PATH_NOT_FOUND"):
        read_native_iceberg(spark, str(tmp_path / "nope"))


def test_timestamp_column_roundtrips(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    df = spark.range(2).select(
        "id", F.current_timestamp().alias("committed_at")
    )
    write_native_iceberg(df, t)
    fields = {f["name"]: f["type"] for f in table_schema(t)}
    assert fields["committed_at"] == "timestamptz"
    got = read_native_iceberg(spark, t)
    assert got.count() == 2 and "committed_at" in got.columns


# --------------------------------------------- end-to-end job resume loop

def test_run_to_parquet_native_iceberg_resume(spark, tmp_path):
    """The north-rule loop: spans + metrics land in NATIVE Iceberg tables
    as snapshot commits; a rerun resumes from the committed snapshot and
    is a no-op on rows."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.fixtures.spark_gen import (
        BLOBS_SCHEMA,
        DOCS_SCHEMA,
    )
    from tableextraction_spark.pipeline import run_to_parquet

    docs_rows, blobs_rows, _exp = gen_corpus(6)
    docs = spark.createDataFrame(docs_rows, DOCS_SCHEMA).repartition(2)
    blobs = spark.createDataFrame(blobs_rows, BLOBS_SCHEMA).repartition(2)
    out = NATIVE_ICEBERG_SCHEME + str(tmp_path / "spans")
    metrics = NATIVE_ICEBERG_SCHEME + str(tmp_path / "metrics")
    run_to_parquet(spark, docs, blobs, out, metrics_path=metrics)
    first = read_table(spark, out)
    n1 = first.count()
    assert n1 > 0
    m1 = read_table(spark, metrics)
    assert m1.count() > 0 and "pages_decoded" in m1.columns
    # rerun: resume anti-join sees the committed snapshot → no new rows
    run_to_parquet(spark, docs, blobs, out, metrics_path=metrics)
    assert read_table(spark, out).count() == n1
    # every run committed snapshots transactionally
    assert len(snapshot_ids(str(tmp_path / "spans"))) >= 1


# ------------------------------------------- review-pass regression pins

def test_schema_projected_read_null_fills_added_column(spark, tmp_path):
    """An append that adds a column must not make reads file-order
    dependent: the scan projects through the TABLE schema, so older
    files null-fill (mergeSchema=false would silently drop it)."""
    t = str(tmp_path / "tbl")
    write_table(spark.range(2).selectExpr("id", "id AS v"),
                NATIVE_ICEBERG_SCHEME + t)
    write_table(
        spark.range(2, 4).selectExpr("id", "id AS v", "'x' AS extra"),
        NATIVE_ICEBERG_SCHEME + t,
    )
    got = read_table(spark, t)
    assert set(got.columns) == {"id", "v", "extra"}
    rows = {r.id: r.extra for r in got.collect()}
    assert rows[0] is None and rows[3] == "x"


def test_append_carries_columns_absent_from_df():
    """A narrower df must not drop recorded columns from the schema."""
    import pyspark.sql.types as T

    narrow = T.StructType([T.StructField("id", T.LongType())])
    fields = iceberg_fields_for(narrow, FIELDS)
    assert {f["name"] for f in fields} == {"id", "v"}
    assert next(f for f in fields if f["name"] == "v")["id"] == 2


def test_type_change_refuses_loudly():
    import pyspark.sql.types as T

    changed = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    with pytest.raises(NotImplementedError, match="type"):
        iceberg_fields_for(changed, FIELDS)


def test_commit_conflict_raises_not_clobbers(tmp_path):
    from tableextraction_spark.sources.iceberg_native import (
        CommitConflictError,
        _commit_metadata,
    )

    meta_dir = str(tmp_path / "metadata")
    os.makedirs(meta_dir)
    _commit_metadata(meta_dir, 1, {"winner": True})
    with pytest.raises(CommitConflictError, match="concurrently"):
        _commit_metadata(meta_dir, 1, {"loser": True})
    import json

    with open(os.path.join(meta_dir, "v1.metadata.json")) as f:
        assert json.load(f) == {"winner": True}  # never overwritten


def test_write_retries_after_commit_conflict(spark, tmp_path, monkeypatch):
    """The sink re-reads table state and re-commits the SAME staged files
    when another writer wins the version race."""
    from tableextraction_spark.sources import iceberg_native as ice

    t = str(tmp_path / "tbl")
    real = ice._commit_metadata
    calls = {"n": 0}

    def flaky(meta_dir, version, meta):
        calls["n"] += 1
        if calls["n"] == 1:
            # a concurrent writer wins this version with an EMPTY append
            # (its own commit, referencing only its own — zero — files)
            from tableextraction_spark.sources.avro import write_container

            ml = os.path.join(meta_dir, "snap-winner.avro")
            with open(ml, "wb") as f:
                f.write(write_container(ice._MANIFEST_FILE_SCHEMA, []))
            winner = {
                "format-version": 2, "table-uuid": "winner",
                "location": meta["location"], "last-sequence-number": 1,
                "current-snapshot-id": 1,
                "snapshots": [
                    {"snapshot-id": 1, "sequence-number": 1,
                     "timestamp-ms": 0, "manifest-list": ml,
                     "summary": {"operation": "append"}}
                ],
                "schemas": [], "current-schema-id": 0,
                "partition-specs": [{"spec-id": 0, "fields": []}],
                "default-spec-id": 0,
            }
            real(meta_dir, version, winner)
            raise ice.CommitConflictError("simulated race")
        return real(meta_dir, version, meta)

    monkeypatch.setattr(ice, "_commit_metadata", flaky)
    write_native_iceberg(spark.range(3).selectExpr("id", "id AS v"), t)
    assert calls["n"] >= 2
    got = read_native_iceberg(spark, t)
    assert got.count() == 3  # the staged rows exactly once, no dupes
    assert snapshot_ids(t) == [1, 2]  # winner's snapshot + the retried one


def test_crash_debris_metadata_dir_is_first_run(spark, tmp_path):
    """metadata/ created but nothing committed (crash inside the first
    append) must classify as first-run, not a permanent abort."""
    t = str(tmp_path / "tbl")
    os.makedirs(os.path.join(t, "metadata"))
    with pytest.raises(ValueError, match="PATH_NOT_FOUND"):
        read_native_iceberg(spark, t)
    from tableextraction_spark.streaming.sink import is_missing_output_error

    try:
        read_native_iceberg(spark, t)
    except ValueError as exc:
        assert is_missing_output_error(exc)


def test_v1_table_append_refuses(tmp_path):
    import json

    t = str(tmp_path / "tbl")
    meta_dir = os.path.join(t, "metadata")
    os.makedirs(meta_dir)
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump({"format-version": 1, "snapshots": []}, f)
    with pytest.raises(NotImplementedError, match="format-version"):
        append_snapshot(t, [], FIELDS)


def test_foreign_manifest_fields_refuse(tmp_path):
    """A manifest list written by a richer (real) writer carries fields
    our carry-forward rewrite would drop — the append must refuse, not
    silently strip them."""
    import json

    from tableextraction_spark.sources.avro import write_container
    from tableextraction_spark.sources.iceberg_native import (
        _MANIFEST_FILE_SCHEMA,
    )

    t = str(tmp_path / "tbl")
    meta_dir = os.path.join(t, "metadata")
    os.makedirs(meta_dir)
    foreign_schema = json.loads(json.dumps(_MANIFEST_FILE_SCHEMA))
    foreign_schema["fields"].append(
        {"name": "partitions_summary", "type": "string"}
    )
    entry = {
        f["name"]: 0 for f in _MANIFEST_FILE_SCHEMA["fields"]
    }
    entry.update(
        manifest_path="/x.avro", partitions_summary="stats-we-would-drop"
    )
    ml = os.path.join(meta_dir, "snap-1-1-x.avro")
    with open(ml, "wb") as f:
        f.write(write_container(foreign_schema, [entry]))
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(
            {
                "format-version": 2,
                "last-sequence-number": 1,
                "current-snapshot-id": 1,
                "snapshots": [
                    {"snapshot-id": 1, "manifest-list": ml},
                ],
            },
            f,
        )
    with pytest.raises(NotImplementedError, match="foreign-writer"):
        append_snapshot(t, [], FIELDS)


# ----------------------------------------------- maintenance: expire + gc

def test_expire_then_gc_reclaims_only_dead_files(spark, tmp_path):
    """The two-step maintenance shape: expire old snapshots, then GC —
    files referenced by ANY remaining snapshot survive; files only the
    expired snapshots referenced (and crash-orphaned stages) are
    reclaimed; recent files are protected by the grace window."""
    from tableextraction_spark.sources.iceberg_native import (
        expire_snapshots,
        gc_orphans,
    )

    t = str(tmp_path / "tbl")
    for lo, hi in [(0, 3), (3, 5), (5, 9)]:
        write_table(
            spark.range(lo, hi).selectExpr("id", "id AS v"),
            NATIVE_ICEBERG_SCHEME + t,
        )
    # a crash-orphaned stage dir, old enough to clear the grace window
    orphan_dir = os.path.join(t, "data", "commit-deadbeef")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-0.parquet")
    _pq(orphan, [99])
    # grace window first: a RECENT orphan (just written) must survive
    res0 = gc_orphans(t, grace_seconds=3600)
    assert orphan not in res0["deleted"]
    assert os.path.exists(orphan)

    expired = expire_snapshots(t, keep_last=1)
    assert expired == [1, 2]
    from tableextraction_spark.sources.iceberg_native import snapshot_ids

    assert snapshot_ids(t) == [3]
    # age everything so the grace window is not a factor, then GC
    for dirpath, _d, names in os.walk(t):
        for n in names:
            os.utime(os.path.join(dirpath, n), (1, 1))
    res = gc_orphans(t, grace_seconds=60)
    assert orphan in res["deleted"]
    assert not os.path.exists(orphan_dir)  # empty stage dir removed
    # the LIVE view still reads every row (snapshot 3 is cumulative:
    # its manifest list carries all three appends' manifests forward)
    got = read_table(spark, t)
    assert got.count() == 9 and {r.id for r in got.collect()} == set(range(9))
    # metadata history is never GC'd
    assert os.path.exists(os.path.join(t, "metadata", "v1.metadata.json"))


def test_expire_refuses_to_drop_current_snapshot(tmp_path):
    from tableextraction_spark.sources.iceberg_native import (
        expire_snapshots,
    )
    import json

    t = str(tmp_path / "tbl")
    append_snapshot(t, [], FIELDS)
    append_snapshot(t, [], FIELDS)
    # point current at the OLDER snapshot by hand
    meta_path = os.path.join(t, "metadata", "v2.metadata.json")
    meta = json.load(open(meta_path))
    meta["current-snapshot-id"] = 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="CURRENT"):
        expire_snapshots(t, keep_last=1)


def test_expire_noop_when_nothing_to_drop(tmp_path):
    from tableextraction_spark.sources.iceberg_native import (
        expire_snapshots,
        snapshot_ids,
    )

    t = str(tmp_path / "tbl")
    append_snapshot(t, [], FIELDS)
    assert expire_snapshots(t, keep_last=5) == []
    assert snapshot_ids(t) == [1]


def test_gc_protects_newer_version_behind_stale_hint(spark, tmp_path):
    """Data-loss regression (r5 review): a crash between the metadata
    link and the hint update leaves version-hint.text stale — GC must
    compute references from ALL metadata versions, never the hint."""
    from tableextraction_spark.sources.iceberg_native import gc_orphans

    t = str(tmp_path / "tbl")
    write_table(spark.range(3).selectExpr("id", "id AS v"),
                NATIVE_ICEBERG_SCHEME + t)
    write_table(spark.range(3, 5).selectExpr("id", "id AS v"),
                NATIVE_ICEBERG_SCHEME + t)
    # simulate the crash: hint points at version 1 again
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    for dirpath, _d, names in os.walk(t):
        for n in names:
            os.utime(os.path.join(dirpath, n), (1, 1))
    res = gc_orphans(t, grace_seconds=60)
    # snapshot 2's data/manifests survive; only Spark markers are dead
    assert all(p.endswith(("_SUCCESS", ".crc")) for p in res["deleted"])
    # restore the hint and confirm both snapshots read intact
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as f:
        f.write("2")
    assert read_table(spark, t).count() == 5


def test_maintenance_refuses_foreign_writer_tables(tmp_path):
    """Tables carrying refs/statistics/history-log metadata (real-writer
    features this path does not preserve) refuse maintenance loudly."""
    import json

    from tableextraction_spark.sources.iceberg_native import (
        expire_snapshots,
        gc_orphans,
    )

    t = str(tmp_path / "tbl")
    append_snapshot(t, [], FIELDS)
    mp = os.path.join(t, "metadata", "v1.metadata.json")
    meta = json.load(open(mp))
    meta["refs"] = {"main": {"snapshot-id": 1, "type": "branch"}}
    with open(mp, "w") as f:
        json.dump(meta, f)
    with pytest.raises(NotImplementedError, match="refs"):
        expire_snapshots(t, keep_last=1)
    with pytest.raises(NotImplementedError, match="refs"):
        gc_orphans(t, grace_seconds=0)
