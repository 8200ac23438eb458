"""From-scratch Avro codec + jar-less Iceberg snapshot reader: round-trips,
spec-shape checks, time travel, hostile input, and the end-to-end media
scan over an Iceberg table directory."""

import json

import pytest

from tableextraction_spark.sources.avro import (
    read_container,
    write_container,
)
from tableextraction_spark.sources.iceberg_native import (
    read_table_files,
    snapshot_ids,
    write_table,
)

SCHEMA = {
    "type": "record",
    "name": "thing",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "d", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "maybe", "type": ["null", "long"], "default": None},
        {"name": "tags", "type": {"type": "map", "values": "string"}},
        {"name": "ids", "type": {"type": "array", "items": "long"}},
        {
            "name": "sub",
            "type": {
                "type": "record",
                "name": "sub_r",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}
RECS = [
    {
        "i": -1, "l": 1 << 40, "s": "héllo", "b": b"\x00\xff", "d": 0.25,
        "ok": True, "maybe": None, "tags": {"k": "v"}, "ids": [1, -2, 3],
        "sub": {"x": 7},
    },
    {
        "i": 2**31 - 1, "l": -(1 << 40), "s": "", "b": b"", "d": -1.5,
        "ok": False, "maybe": 42, "tags": {}, "ids": [], "sub": {"x": -7},
    },
]


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_avro_roundtrip_and_determinism(codec):
    buf = write_container(SCHEMA, RECS, codec=codec)
    meta, out = read_container(buf)
    assert out == RECS
    assert json.loads(meta["avro.schema"]) == SCHEMA
    assert buf == write_container(SCHEMA, RECS, codec=codec)  # byte-stable


def test_avro_zigzag_edges():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 2**62, -(2**62), 63, -64]
    buf = write_container(schema, [{"v": v} for v in vals])
    _, out = read_container(buf)
    assert [r["v"] for r in out] == vals


def test_avro_zero_size_item_count_bomb_raises():
    """A block count of 2^40 over zero-byte items (array of null) must
    raise, not allocate a terabyte of Nones."""
    import json as _json

    from tableextraction_spark.sources.avro import (
        MAGIC,
        _write_datum,
        _write_long,
        _Types,
    )

    schema = {"type": "record", "name": "bomb",
              "fields": [{"name": "a",
                          "type": {"type": "array", "items": "null"}}]}
    meta = {"avro.schema": _json.dumps(schema).encode(),
            "avro.codec": b"null"}
    hdr = MAGIC + _write_datum({"type": "map", "values": "bytes"}, meta,
                               _Types()) + b"S" * 16
    datum = _write_long(1 << 40)  # array block: 2^40 nulls (0 bytes each)
    block = datum
    buf = hdr + _write_long(1) + _write_long(len(block)) + block + b"S" * 16
    with pytest.raises(ValueError):
        read_container(buf)


def test_avro_hostile_inputs():
    buf = write_container(SCHEMA, RECS)
    with pytest.raises(ValueError):
        read_container(buf[:40])  # truncated header
    with pytest.raises(ValueError):
        read_container(b"NotAvro!" + buf)
    # flipped sync marker
    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError):
        read_container(bytes(bad))


def _write_parts(tmp_path, spark, n_files=6, rows_per=4):
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = []
    for i in range(n_files):
        p = str(tmp_path / f"data-{i}.parquet")
        t = pa.table({"doc_id": [f"d{i}-{j}" for j in range(rows_per)],
                      "n": list(range(rows_per))})
        pq.write_table(t, p)
        import os

        files.append((p, rows_per, os.path.getsize(p)))
    return files


def test_iceberg_write_read_roundtrip(tmp_path, spark):
    files = _write_parts(tmp_path, spark)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files, snapshot_id=1, files_per_manifest=2)
    listed = read_table_files(tdir)
    assert {f["path"] for f in listed} == {p for p, _r, _s in files}
    assert all(f["record_count"] == 4 for f in listed)
    # multiple manifests were actually exercised
    assert len({f["manifest"] for f in listed}) == 3


def test_iceberg_time_travel(tmp_path, spark):
    files = _write_parts(tmp_path, spark)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files[:2], snapshot_id=1)
    write_table(tdir, files, snapshot_id=2)
    assert snapshot_ids(tdir) == [1, 2]
    assert len(read_table_files(tdir)) == 6  # current = snapshot 2
    assert len(read_table_files(tdir, snapshot_id=1)) == 2
    with pytest.raises(ValueError):
        read_table_files(tdir, snapshot_id=99)


def test_position_deletes_read_and_files_api_refuses(tmp_path, spark):
    """Merge-on-read: position deletes are returned by read_table_snapshot;
    the bare file-list API refuses (it cannot apply them)."""
    from tableextraction_spark.sources.iceberg_native import (
        read_table_snapshot,
    )

    files = _write_parts(tmp_path, spark, n_files=2)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files, snapshot_id=1,
                position_deletes={files[0][0]: [1, 3]})
    snap = read_table_snapshot(tdir)
    assert len(snap["data_files"]) == 2
    import os

    key = os.path.abspath(files[0][0])
    assert snap["position_deletes"] == {key: [1, 3]}
    with pytest.raises(NotImplementedError):
        read_table_files(tdir)


def test_equality_deletes_refused_loudly(tmp_path, spark):
    from tableextraction_spark.sources.iceberg_native import (
        read_table_snapshot,
    )

    files = _write_parts(tmp_path, spark, n_files=1)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files, snapshot_id=1,
                position_deletes={files[0][0]: [0]}, equality_deletes=True)
    with pytest.raises(NotImplementedError):
        read_table_snapshot(tdir)


def test_media_scan_applies_position_deletes(spark, tmp_path):
    """End-to-end merge-on-read: the extraction scan over an Iceberg table
    with position deletes yields exactly the live rows — deleted pages are
    never decoded, all others are untouched."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA
    from tableextraction_spark.sources.media_parquet import (
        detect_tables_python_scan,
    )

    _docs, blobs, _exp = gen_corpus(8)
    pdf = spark.createDataFrame(blobs, BLOBS_SCHEMA).toPandas()
    pdf = pdf.sort_values(["doc_id", "page_no"]).reset_index(drop=True)
    part = str(tmp_path / "data.parquet")
    # several row groups so deletes cross row-group boundaries
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), part,
                   row_group_size=5)
    dead_pos = [0, 4, 5, len(pdf) - 1]  # first/last of groups + file edges
    dead_refs = set(pdf.iloc[dead_pos]["media_ref"])
    tdir = str(tmp_path / "tbl")
    write_table(tdir, [(part, len(pdf), os.path.getsize(part))],
                snapshot_id=1, position_deletes={part: dead_pos})
    got = {r.media_ref for r in
           detect_tables_python_scan(spark, tdir).collect()}
    assert got == set(pdf["media_ref"]) - dead_refs


def test_media_scan_reads_iceberg_table(spark, tmp_path):
    """End-to-end: the extraction scan over an Iceberg TABLE DIRECTORY
    yields exactly the rows a plain parquet scan of the same files does —
    including after an append snapshot (resume-style listing grows)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA
    from tableextraction_spark.sources.media_parquet import (
        detect_tables_python_scan,
    )

    _docs, blobs, _exp = gen_corpus(12)
    pdf = spark.createDataFrame(blobs, BLOBS_SCHEMA).toPandas()
    half = len(pdf) // 2
    plain_dir = str(tmp_path / "parts")
    os.makedirs(plain_dir)
    parts = []
    for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        p = f"{plain_dir}/blobs-{i}.parquet"
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), p)
        parts.append((p, len(chunk), os.path.getsize(p)))

    tdir = str(tmp_path / "ice_tbl")
    write_table(tdir, parts[:1], snapshot_id=1)
    rows1 = {(r.media_ref, r.obj_no)
             for r in detect_tables_python_scan(spark, tdir).collect()}
    write_table(tdir, parts, snapshot_id=2)
    rows2 = {(r.media_ref, r.obj_no)
             for r in detect_tables_python_scan(spark, tdir).collect()}
    plain = {(r.media_ref, r.obj_no)
             for r in detect_tables_python_scan(spark, plain_dir).collect()}
    assert rows1 < rows2  # snapshot 1 is a strict subset
    assert rows2 == plain  # current snapshot ≡ the plain scan of all parts


def test_dangling_delete_targets_are_ignored_per_spec(spark, tmp_path):
    """Deletes referencing a file not in the scan are IGNORED (Iceberg
    spec): dangling delete files routinely survive compaction, so they are
    normal table state — the scan must proceed over the live files."""
    from tableextraction_spark.sources.media_parquet import list_row_groups

    files = _write_parts(tmp_path, spark, n_files=1)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files, snapshot_id=1,
                position_deletes={str(tmp_path / "ghost.parquet"): [0]})
    splits = list_row_groups(tdir)
    assert splits and all(d == () for _p, _rg, _n, _b, d, _c in splits)


# --- field-id schema resolution (r3 verdict ask #4) ---

def _blob_parts_with_field_ids(tmp_path, n_docs, rename_content=False,
                               tag="fid"):
    """Fixture blob parquet carrying Iceberg field ids 1-4.  With
    ``rename_content`` the PHYSICAL column is named 'blob' (the historical
    name) while keeping field id 4 — the rename-evolution shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus

    _docs, blobs, _exp = gen_corpus(n_docs)
    cname = "blob" if rename_content else "content"
    schema = pa.schema([
        pa.field("doc_id", pa.string(), metadata={b"PARQUET:field.id": b"1"}),
        pa.field("media_ref", pa.string(),
                 metadata={b"PARQUET:field.id": b"2"}),
        pa.field("page_no", pa.int64(), metadata={b"PARQUET:field.id": b"3"}),
        pa.field(cname, pa.binary(), metadata={b"PARQUET:field.id": b"4"}),
    ])
    t = pa.table({
        "doc_id": [b["doc_id"] for b in blobs],
        "media_ref": [b["media_ref"] for b in blobs],
        "page_no": [b["page_no"] for b in blobs],
        cname: [b["content"] for b in blobs],
    }, schema=schema)
    p = str(tmp_path / f"{tag}.parquet")
    pq.write_table(t, p, row_group_size=6)
    import os
    return p, len(blobs), os.path.getsize(p)


ICEBERG_BLOB_SCHEMA = [
    {"id": 1, "name": "doc_id", "type": "string", "required": True},
    {"id": 2, "name": "media_ref", "type": "string", "required": True},
    {"id": 3, "name": "page_no", "type": "long", "required": True},
    {"id": 4, "name": "content", "type": "binary", "required": True},
]


def test_resolve_columns_by_field_id_and_name_fallback(tmp_path, spark):
    import pyarrow.parquet as pq

    from tableextraction_spark.sources.iceberg_native import resolve_columns

    p, _n, _s = _blob_parts_with_field_ids(tmp_path, 2, rename_content=True)
    phys = pq.ParquetFile(p).schema_arrow
    got = resolve_columns(
        phys, ["doc_id", "content", "lang"],
        ICEBERG_BLOB_SCHEMA + [{"id": 5, "name": "lang", "type": "string"}],
    )
    assert got == {"doc_id": "doc_id", "content": "blob", "lang": None}
    # no table schema → pure name matching
    got = resolve_columns(phys, ["doc_id", "content"], None)
    assert got == {"doc_id": "doc_id", "content": None}


def test_scan_resolves_renamed_column_between_snapshots(tmp_path, spark):
    """Snapshot 1's data file stores the payload under the HISTORICAL
    physical name 'blob' (field id 4); the current schema calls it
    'content'.  The scan must resolve by id and produce results identical
    to a plain-parquet scan of the same pages under the current name."""
    from tableextraction_spark.sources.media_parquet import (
        detect_tables_python_scan,
    )

    old = _blob_parts_with_field_ids(tmp_path, 3, rename_content=True,
                                     tag="old")
    new = _blob_parts_with_field_ids(tmp_path, 2, rename_content=False,
                                     tag="new")
    tdir = str(tmp_path / "tbl")
    write_table(tdir, [old], snapshot_id=1,
                schema_fields=ICEBERG_BLOB_SCHEMA)
    # schema evolves: a column is ADDED (id 5) after snapshot 1's file —
    # resolution must null-fill it for old files without erroring
    write_table(tdir, [old, new], snapshot_id=2,
                schema_fields=ICEBERG_BLOB_SCHEMA
                + [{"id": 5, "name": "lang", "type": "string"}])
    got = sorted(
        (r.media_ref, r.obj_no)
        for r in detect_tables_python_scan(spark, tdir).collect()
    )
    # reference: same pages via plain parquet scans with current names
    plain_dir = str(tmp_path / "plain")
    import os
    import pyarrow.parquet as pq
    import pyarrow as pa
    os.makedirs(plain_dir)
    for i, (p, _n, _s) in enumerate((old, new)):
        t = pq.read_table(p)
        t = t.rename_columns(
            ["doc_id", "media_ref", "page_no", "content"]
        )
        pq.write_table(t, f"{plain_dir}/p{i}.parquet")
    want = sorted(
        (r.media_ref, r.obj_no)
        for r in detect_tables_python_scan(spark, plain_dir).collect()
    )
    assert got == want and len(got) > 0
