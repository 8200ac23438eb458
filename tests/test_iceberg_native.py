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


def test_equality_deletes_listed_with_sequence_numbers(tmp_path, spark):
    """Equality-delete files surface with their field ids and sequence
    numbers; data files keep EXPLICIT sequence numbers when re-listed
    (the spec's inheritance rule: entry's explicit beats manifest's)."""
    import os

    from tableextraction_spark.sources.iceberg_native import (
        read_table_snapshot,
    )

    files = _write_parts(tmp_path, spark, n_files=2)
    tdir = str(tmp_path / "tbl")
    schema = [{"id": 1, "name": "n", "type": "long", "required": True}]
    write_table(tdir, files[:1], snapshot_id=1, schema_fields=schema)
    # snapshot 2 re-lists file 0 with its ORIGINAL sequence 1, adds file 1,
    # and deletes n=2 via an equality delete (seq 2 → applies to file 0 only)
    write_table(
        tdir,
        [(files[0][0], files[0][1], files[0][2], {}, 1), files[1]],
        snapshot_id=2,
        equality_deletes=[{"ids": [1], "rows": [{"n": 2}]}],
        schema_fields=schema,
    )
    snap = read_table_snapshot(tdir)
    seqs = {
        os.path.abspath(f["path"]): f["sequence_number"]
        for f in snap["data_files"]
    }
    assert seqs[os.path.abspath(files[0][0])] == 1
    assert seqs[os.path.abspath(files[1][0])] == 2
    (d,) = snap["equality_deletes"]
    assert d["equality_ids"] == [1] and d["sequence_number"] == 2
    with pytest.raises(NotImplementedError):
        read_table_files(tdir)  # bare file list cannot apply deletes


def test_equality_delete_without_ids_refused(tmp_path, spark):
    """A content=2 entry with no equality_ids cannot be applied — loud
    error, never phantom rows."""
    import json as _json
    import os

    from tableextraction_spark.sources.iceberg_native import (
        read_table_snapshot,
    )

    files = _write_parts(tmp_path, spark, n_files=1)
    tdir = str(tmp_path / "tbl")
    schema = [{"id": 1, "name": "n", "type": "long", "required": True}]
    write_table(tdir, files, snapshot_id=1,
                equality_deletes=[{"ids": [1], "rows": [{"n": 0}]}],
                schema_fields=schema)
    # corrupt the manifest: strip equality_ids from the delete entry
    meta_dir = os.path.join(tdir, "metadata")
    mpath = os.path.join(meta_dir, "snap1-eqdel-m0.avro")
    with open(mpath, "rb") as f:
        meta, entries = read_container(f.read())
    entries[0]["data_file"]["equality_ids"] = None
    with open(mpath, "wb") as f:
        f.write(write_container(_json.loads(meta["avro.schema"]), entries))
    with pytest.raises(ValueError, match="equality_ids"):
        read_table_snapshot(tdir)


def test_murmur3_spec_vectors():
    """Pin the bucket-transform hash to the Iceberg spec's Appendix B test
    vectors (published reference values)."""
    from tableextraction_spark.sources.iceberg_native import (
        _bucket_hash,
        murmur3_32,
    )

    def signed(h):
        return h - (1 << 32) if h >= (1 << 31) else h

    # spec: int/long 34 hash as 8-byte little-endian → 2017239379
    assert signed(_bucket_hash(34)) == 2017239379
    # spec: string "iceberg" hashes UTF-8 bytes → 1210000089
    assert signed(_bucket_hash("iceberg")) == 1210000089
    # murmur3_x86_32 published check value: hash of b"" (seed 0) is 0
    assert murmur3_32(b"") == 0


def test_partition_transforms():
    from tableextraction_spark.sources.iceberg_native import apply_transform

    assert apply_transform("identity", "abc") == "abc"
    assert apply_transform("truncate[10]", 37) == 30
    assert apply_transform("truncate[10]", -1) == -10  # floor semantics
    assert apply_transform("truncate[3]", "iceberg") == "ice"
    assert apply_transform("void", 5) is None
    assert apply_transform("bucket[16]", 34) == 2017239379 % 16
    assert apply_transform("identity", None) is None
    with pytest.raises(NotImplementedError):
        apply_transform("year", 17167)  # date transforms not evaluated
    with pytest.raises(NotImplementedError):
        apply_transform("bucket[4]", 1.5)  # unsupported source type


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
    assert splits and all(d == () for _p, _rg, _n, _b, d, _c, _e in splits)


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


def test_scan_promotes_int_page_no_and_ignores_dropped_column(
    tmp_path, spark
):
    """Schema evolution beyond rename/add (r4 verdict ask 6): a data file
    whose page_no is physically int32 while the current schema says long
    (promotion) and which carries a physical column (field id 6) the
    current schema has DROPPED.  The scan must promote the one, never read
    the other, and match a plain scan with canonical types."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.sources.media_parquet import (
        detect_tables_python_scan,
    )

    _docs, blobs, _exp = gen_corpus(3)
    schema = pa.schema([
        pa.field("doc_id", pa.string(), metadata={b"PARQUET:field.id": b"1"}),
        pa.field("media_ref", pa.string(),
                 metadata={b"PARQUET:field.id": b"2"}),
        pa.field("page_no", pa.int32(), metadata={b"PARQUET:field.id": b"3"}),
        pa.field("content", pa.binary(),
                 metadata={b"PARQUET:field.id": b"4"}),
        pa.field("fetch_meta", pa.string(),
                 metadata={b"PARQUET:field.id": b"6"}),
    ])
    t = pa.table({
        "doc_id": [b["doc_id"] for b in blobs],
        "media_ref": [b["media_ref"] for b in blobs],
        "page_no": pa.array([b["page_no"] for b in blobs], type=pa.int32()),
        "content": [b["content"] for b in blobs],
        "fetch_meta": ["crawler-v2"] * len(blobs),
    }, schema=schema)
    p = str(tmp_path / "promoted.parquet")
    pq.write_table(t, p, row_group_size=4)
    tdir = str(tmp_path / "tbl")
    # current schema: page_no long (the PROMOTED type), no field id 6
    write_table(tdir, [(p, len(blobs), os.path.getsize(p))], snapshot_id=1,
                schema_fields=ICEBERG_BLOB_SCHEMA)
    got = detect_tables_python_scan(spark, tdir)
    rows = sorted((r.media_ref, r.page_no, r.obj_no) for r in got.collect())
    assert got.schema["page_no"].dataType.simpleString() == "int"
    # reference: same pages through a canonical-typed plain parquet
    plain = str(tmp_path / "plain")
    os.makedirs(plain)
    pq.write_table(
        t.drop_columns(["fetch_meta"]).set_column(
            2, "page_no",
            pa.array([b["page_no"] for b in blobs], type=pa.int64()),
        ),
        f"{plain}/p0.parquet",
    )
    want = sorted(
        (r.media_ref, r.page_no, r.obj_no)
        for r in detect_tables_python_scan(spark, plain).collect()
    )
    assert rows == want and len(rows) > 0


def _media_schema_fields():
    return [
        {"id": 1, "name": "doc_id", "type": "string", "required": True},
        {"id": 2, "name": "media_ref", "type": "string", "required": True},
        {"id": 3, "name": "page_no", "type": "long", "required": True},
        {"id": 4, "name": "content", "type": "binary", "required": True},
    ]


def test_media_scan_applies_equality_deletes_with_sequence_rule(
    spark, tmp_path
):
    """End-to-end CDC shape: an equality delete on doc_id removes that
    doc's rows from STRICTLY OLDER data files, while rows of the same doc
    added in the SAME commit as the delete survive (spec sequence rule)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA
    from tableextraction_spark.sources.media_parquet import (
        detect_tables_python_scan,
    )

    _docs, blobs, _exp = gen_corpus(6)
    pdf = spark.createDataFrame(blobs, BLOBS_SCHEMA).toPandas()
    pdf = pdf.sort_values(["doc_id", "page_no"]).reset_index(drop=True)
    dead = sorted(pdf["doc_id"].unique())[1]
    part_a = str(tmp_path / "a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), part_a,
                   row_group_size=5)
    # part B: the dead doc re-ingested in the delete's own commit
    b = pdf[pdf["doc_id"] == dead].copy()
    b["media_ref"] = b["media_ref"] + "_b2"
    part_b = str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(b, preserve_index=False), part_b)

    tdir = str(tmp_path / "tbl")
    fields = _media_schema_fields()
    write_table(tdir, [(part_a, len(pdf), os.path.getsize(part_a))],
                snapshot_id=1, schema_fields=fields)
    write_table(
        tdir,
        [
            (part_a, len(pdf), os.path.getsize(part_a), {}, 1),  # existing
            (part_b, len(b), os.path.getsize(part_b)),           # seq 2
        ],
        snapshot_id=2,
        equality_deletes=[{"ids": [1], "rows": [{"doc_id": dead}]}],
        schema_fields=fields,
    )
    got = {r.media_ref for r in
           detect_tables_python_scan(spark, tdir).collect()}
    dead_refs_a = set(pdf[pdf["doc_id"] == dead]["media_ref"])
    want = (set(pdf["media_ref"]) - dead_refs_a) | set(b["media_ref"])
    assert got == want


def test_equality_delete_on_unreadable_column_refused(spark, tmp_path):
    """An equality delete over a column the scan cannot read (e.g. an id
    outside the scan schema) must fail loudly, never return phantom rows."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA
    from tableextraction_spark.sources.media_parquet import list_row_groups

    _docs, blobs, _exp = gen_corpus(2)
    pdf = spark.createDataFrame(blobs, BLOBS_SCHEMA).toPandas()
    part = str(tmp_path / "a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), part)
    tdir = str(tmp_path / "tbl")
    fields = _media_schema_fields() + [
        {"id": 9, "name": "lang", "type": "string", "required": False}
    ]
    write_table(tdir, [(part, len(pdf), os.path.getsize(part), {}, 1)],
                snapshot_id=2,
                equality_deletes=[{"ids": [9], "rows": [{"lang": "xx"}]}],
                schema_fields=fields)
    with pytest.raises(NotImplementedError, match="equality delete"):
        list_row_groups(tdir)


def test_partition_pruning_skips_files(spark, tmp_path):
    """Resume-prune partition pruning: with a spec over doc_id, data files
    whose partition value excludes every kept id are never listed — for
    identity and bucket[N] transforms; an unevaluable transform skips
    pruning (over-scan, never mis-prune)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA
    from tableextraction_spark.sources.iceberg_native import apply_transform
    from tableextraction_spark.sources.media_parquet import list_row_groups

    _docs, blobs, _exp = gen_corpus(3)
    pdf = spark.createDataFrame(blobs, BLOBS_SCHEMA).toPandas()
    docs = sorted(pdf["doc_id"].unique())
    parts = []
    for i, d in enumerate(docs):
        chunk = pdf[pdf["doc_id"] == d]
        p = str(tmp_path / f"p{i}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), p)
        parts.append((p, len(chunk), os.path.getsize(p), d))
    fields = _media_schema_fields()

    def mk(tdir, transform, field_name):
        write_table(
            str(tdir),
            [(p, n, s, {field_name: apply_transform(transform, d)})
             for p, n, s, d in parts],
            snapshot_id=1, schema_fields=fields,
            partition_spec=[{"name": field_name, "transform": transform,
                             "source-id": 1, "field-id": 1000}],
        )

    t_id = tmp_path / "tbl_identity"
    mk(t_id, "identity", "doc_id")
    pruned = list_row_groups(str(t_id), keep_doc_ids={docs[1]})
    assert {os.path.basename(p) for p, *_ in pruned} == {
        os.path.basename(parts[1][0])
    }

    # transform-level file pruning, isolated from the row-group stats prune
    from tableextraction_spark.sources.media_parquet import _partition_pruned

    spec_b = [{"name": "doc_id_bucket", "transform": "bucket[8]",
               "source-id": 1, "field-id": 1000}]
    dfs = [
        {"path": p,
         "partition": {"doc_id_bucket": apply_transform("bucket[8]", d)}}
        for p, _n, _s, d in parts
    ]
    keep_bucket = apply_transform("bucket[8]", docs[0])
    expect = [
        f for f, (_p, _n, _s, d) in zip(dfs, parts)
        if apply_transform("bucket[8]", d) == keep_bucket
    ]
    assert _partition_pruned(dfs, spec_b, fields, {docs[0]}) == expect

    # unevaluable transform: _partition_pruned must keep every file (the
    # row-group stats prune downstream may still narrow — that's separate)
    from tableextraction_spark.sources.media_parquet import _partition_pruned

    dfs = [{"path": p, "partition": {"doc_id_day": 123}} for p, *_ in parts]
    spec = [{"name": "doc_id_day", "transform": "day",
             "source-id": 1, "field-id": 1000}]
    assert _partition_pruned(dfs, spec, fields, {docs[0]}) == dfs
    # and a None partition value never prunes, even with identity
    dfs_none = [{"path": p, "partition": {"doc_id": None}} for p, *_ in parts]
    spec_id = [{"name": "doc_id", "transform": "identity",
                "source-id": 1, "field-id": 1000}]
    assert _partition_pruned(dfs_none, spec_id, fields, {docs[0]}) == dfs_none


def test_incremental_scan_between_snapshots(tmp_path, spark):
    """Incremental = files added in (from, to]; deletes at `to` split into
    new-file deletes (applied) vs stale (surfaced, not dropped)."""
    from tableextraction_spark.sources.iceberg_native import (
        read_table_incremental,
    )

    files = _write_parts(tmp_path, spark)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files[:2], snapshot_id=1)
    write_table(tdir, files[:4], snapshot_id=2)
    write_table(tdir, files, snapshot_id=3)
    inc = read_table_incremental(tdir, 1, 2)
    assert {f["path"] for f in inc["data_files"]} == {p for p, _r, _s in files[2:4]}
    inc13 = read_table_incremental(tdir, 1, 3)
    assert {f["path"] for f in inc13["data_files"]} == {p for p, _r, _s in files[2:]}
    # default `to` = current snapshot
    assert read_table_incremental(tdir, 3)["data_files"] == []
    # union property: from-files + incremental == to-files
    base = {f["path"] for f in read_table_files(tdir, snapshot_id=1)}
    assert base | {f["path"] for f in inc13["data_files"]} == {
        f["path"] for f in read_table_files(tdir, snapshot_id=3)
    }


def test_incremental_scan_delete_partitioning(tmp_path, spark):
    """A position delete landing on an OLD file surfaces as stale_deletes;
    one landing on a NEW file rides along for the scan to apply."""
    from tableextraction_spark.sources.iceberg_native import (
        read_table_incremental,
    )

    files = _write_parts(tmp_path, spark)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files[:2], snapshot_id=1)
    write_table(
        tdir, files[:4], snapshot_id=2,
        position_deletes={files[0][0]: [1], files[3][0]: [0, 2]},
    )
    inc = read_table_incremental(tdir, 1, 2)
    assert set(inc["position_deletes"]) == {files[3][0]}
    assert inc["position_deletes"][files[3][0]] == [0, 2]
    assert set(inc["stale_deletes"]) == {files[0][0]}


def test_incremental_scan_splits_equality_deletes(tmp_path, spark):
    """Equality deletes are value-keyed: one committed after `from` both
    applies to the added files (stays in equality_deletes) AND may hit
    rows consumed before `from` — it must surface in
    stale_equality_deletes.  One already present at `from` must not."""
    from tableextraction_spark.sources.iceberg_native import (
        read_table_incremental,
    )

    files = _write_parts(tmp_path, spark)
    tdir = str(tmp_path / "tbl")
    fields = [{"id": 1, "name": "doc_id", "type": "string",
               "required": True}]
    write_table(tdir, files[:2], snapshot_id=1, schema_fields=fields)
    write_table(
        tdir, files[:2], snapshot_id=2, schema_fields=fields,
        equality_deletes=[{"ids": [1], "rows": [{"doc_id": "old-key"}]}],
    )
    write_table(
        tdir, files[:4], snapshot_id=3, schema_fields=fields,
        equality_deletes=[{"ids": [1], "rows": [{"doc_id": "new-key"}]}],
    )
    inc = read_table_incremental(tdir, 2, 3)
    # `to`'s equality-delete set still rides along for the added files
    assert [d["path"] for d in inc["equality_deletes"]] == \
        [d["path"] for d in inc["stale_equality_deletes"]]
    # the delete committed after `from` is flagged for reconciliation
    stale = inc["stale_equality_deletes"]
    assert len(stale) == 1 and stale[0]["path"].endswith(
        "snap3-eqdel-0.parquet")
    # from == to: nothing added, nothing stale
    inc22 = read_table_incremental(tdir, 2, 2)
    assert inc22["data_files"] == [] and inc22["stale_equality_deletes"] == []


def test_incremental_scan_refuses_compaction(tmp_path, spark):
    from tableextraction_spark.sources.iceberg_native import (
        read_table_incremental,
    )

    files = _write_parts(tmp_path, spark)
    tdir = str(tmp_path / "tbl")
    write_table(tdir, files[:3], snapshot_id=1)
    write_table(tdir, files[2:], snapshot_id=2)  # files 0-1 vanished
    with pytest.raises(ValueError, match="compaction"):
        read_table_incremental(tdir, 1, 2)
    with pytest.raises(ValueError, match="newer than"):
        read_table_incremental(tdir, 2, 1)
    with pytest.raises(ValueError, match="unknown snapshot"):
        read_table_incremental(tdir, 7, None)
