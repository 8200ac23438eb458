"""Python-native Iceberg v1/v2 SNAPSHOT reader — list a table's live data
files without the Iceberg runtime jars.

The north rule's corpus is an Iceberg table; this container has no Iceberg
runtime (sources/catalog.py routes catalog refs to Spark's catalog API and
documents the jar requirement).  What a jar-less environment CAN still do —
because the Iceberg table format is an open spec (iceberg.apache.org/spec)
of JSON metadata + Avro manifests over data files — is resolve a snapshot
to its parquet file list:

    table/metadata/v<N>.metadata.json   ← current snapshot id, snapshot log
    snap-<id>-…​.avro (manifest list)    ← one row per manifest file
    <uuid>-m0.avro (manifest)           ← one row per data file (status,
                                          path, record_count, …)

``read_table_files`` walks exactly that chain with the from-scratch Avro
codec (sources/avro.py) and returns the live data files, enabling the
python-native media scan (``detect_tables_python_scan``) and the resume
prune to run directly against an Iceberg table directory — time travel
included (pass ``snapshot_id``).  Writes still require the real runtime
(atomic commits need the catalog); this reader is the INGEST side only,
which is what the 100 TB extraction job needs.

Fixture writer ``write_table`` authors a spec-shaped table layout over
existing parquet files (v2 metadata JSON, deflate-coded Avro manifest list
+ manifests with the published field ids) so the reader round-trips against
the same structure real writers produce.
"""

from __future__ import annotations

import json
import os
import re

from .avro import read_container, write_container

_STATUS_DELETED = 2


def _local(path: str) -> str:
    """Iceberg metadata stores absolute URIs; strip a file: scheme for
    local access (other schemes are returned as-is for the caller's
    filesystem layer)."""
    if path.startswith("file://"):
        return path[7:]
    if path.startswith("file:"):
        return path[5:]
    return path


def _latest_metadata(table_dir: str) -> str:
    """Path of the current metadata JSON: version-hint.text when present
    (HadoopCatalog layout), else the highest v<N>.metadata.json."""
    meta_dir = os.path.join(table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        cand = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            return cand
    best, best_v = None, -1
    for name in os.listdir(meta_dir):
        m = re.match(r"v(\d+)\.metadata\.json$", name)
        if m and int(m.group(1)) > best_v:
            best, best_v = os.path.join(meta_dir, name), int(m.group(1))
    if best is None:
        raise FileNotFoundError(f"no v*.metadata.json under {meta_dir}")
    return best


def read_table_snapshot(
    table_dir: str, snapshot_id: int | None = None
) -> dict:
    """Live file sets of an Iceberg table directory at a snapshot.

    → ``{"data_files": [{"path", "record_count", "file_size_in_bytes",
    "manifest"}], "position_deletes": {data_path: sorted positions}}`` for
    the CURRENT snapshot by default or ``snapshot_id`` for time travel.

    Deleted entries (status=2) are dropped.  v2 POSITION delete files
    (content=1) are read — parquet of (file_path, pos), the merge-on-read
    shape compacting writers emit — and returned as per-data-file sorted
    row positions for the scan to mask.  EQUALITY deletes (content=2)
    are rejected loudly: applying them needs value comparison against
    the table schema, and silently ignoring any delete would return
    phantom rows.
    """
    with open(_latest_metadata(table_dir)) as f:
        meta = json.load(f)
    snap_id = snapshot_id or meta.get("current-snapshot-id")
    if not snap_id or snap_id == -1:
        return {"data_files": [], "position_deletes": {}}
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snap_id not in snaps:
        raise ValueError(f"snapshot {snap_id} not in table metadata")
    manifest_list = _local(snaps[snap_id]["manifest-list"])
    with open(manifest_list, "rb") as f:
        _, manifests = read_container(f.read())
    data, delete_paths = [], []
    for m in manifests:
        is_delete = m.get("content", 0) == 1
        with open(_local(m["manifest_path"]), "rb") as f:
            _, entries = read_container(f.read())
        for e in entries:
            if e.get("status") == _STATUS_DELETED:
                continue
            df = e["data_file"]
            content = df.get("content", 1 if is_delete else 0)
            fmt = str(df.get("file_format", "")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(f"Iceberg file format {fmt}")
            if content == 0:
                data.append(
                    {
                        "path": _local(df["file_path"]),
                        "record_count": df.get("record_count"),
                        "file_size_in_bytes": df.get("file_size_in_bytes"),
                        "manifest": m["manifest_path"],
                    }
                )
            elif content == 1:
                delete_paths.append(_local(df["file_path"]))
            else:
                raise NotImplementedError(
                    "Iceberg EQUALITY deletes require the Iceberg runtime "
                    "(value-level filtering) — refusing phantom rows"
                )
    deletes: dict[str, list[int]] = {}
    if delete_paths:
        import pyarrow.parquet as pq

        for dp in delete_paths:
            t = pq.read_table(dp, columns=["file_path", "pos"])
            for fp, pos in zip(
                t.column("file_path").to_pylist(), t.column("pos").to_pylist()
            ):
                deletes.setdefault(_local(fp), []).append(int(pos))
        for fp in deletes:
            deletes[fp] = sorted(set(deletes[fp]))
    return {"data_files": data, "position_deletes": deletes}


def table_schema(table_dir: str) -> list[dict] | None:
    """CURRENT Iceberg schema fields ``[{"id", "name", "type", ...}]`` from
    the metadata JSON, or None when the table records no schema (minimal
    fixtures).  Field ids — not names — are a column's identity in Iceberg:
    a rename keeps the id, so readers must resolve parquet columns by the
    ``PARQUET:field.id`` metadata real writers stamp, falling back to names
    only for files without ids (see ``resolve_columns``)."""
    with open(_latest_metadata(table_dir)) as f:
        meta = json.load(f)
    schemas = meta.get("schemas") or []
    if not schemas:
        return None
    cur = meta.get("current-schema-id", 0)
    for s in schemas:
        if s.get("schema-id", 0) == cur:
            return s.get("fields") or None
    raise ValueError(f"current-schema-id {cur} not in table schemas")


def resolve_columns(
    physical_schema, wanted: list[str], schema_fields: list[dict] | None
) -> dict[str, str | None]:
    """Map CURRENT-schema column names → the physical column names of one
    parquet file: current name → field id (table schema) → the file column
    carrying that ``PARQUET:field.id`` → its physical name.

    Falls back to name matching when the table has no schema or the file
    has no field ids (pre-Iceberg imports).  ``None`` = the column does not
    exist in this (older) file — the caller null-fills, per the spec's
    add-column semantics."""
    phys_by_id: dict[int, str] = {}
    phys_names = set()
    for fld in physical_schema:
        phys_names.add(fld.name)
        fid = (fld.metadata or {}).get(b"PARQUET:field.id")
        if fid is not None:
            try:
                phys_by_id[int(fid)] = fld.name
            except ValueError:
                pass
    ids_by_name = (
        {f["name"]: f["id"] for f in schema_fields} if schema_fields else {}
    )
    out: dict[str, str | None] = {}
    for name in wanted:
        fid = ids_by_name.get(name)
        if fid is not None and phys_by_id:
            out[name] = phys_by_id.get(fid)  # None = added after this file
        else:
            out[name] = name if name in phys_names else None
    return out


def read_table_files(
    table_dir: str, snapshot_id: int | None = None
) -> list[dict]:
    """Live data files only (see :func:`read_table_snapshot`).  Raises when
    the snapshot carries row-level deletes — a caller that only lists files
    cannot apply them, and ignoring them would return phantom rows; use
    ``read_table_snapshot`` (as the media scan does) to get the delete
    positions alongside."""
    snap = read_table_snapshot(table_dir, snapshot_id)
    if snap["position_deletes"]:
        raise NotImplementedError(
            "snapshot carries position deletes — use read_table_snapshot "
            "and apply them; a bare file list would contain phantom rows"
        )
    return snap["data_files"]


def snapshot_ids(table_dir: str) -> list[int]:
    """All snapshot ids recorded in the current metadata (oldest first)."""
    with open(_latest_metadata(table_dir)) as f:
        meta = json.load(f)
    return [s["snapshot-id"] for s in meta.get("snapshots", [])]


# --- fixture writer (spec-shaped minimal table) ---

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None,
         "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None,
         "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                ],
            },
        },
    ],
}


def write_table(
    table_dir: str,
    data_files: list[tuple[str, int, int]],
    snapshot_id: int = 1,
    files_per_manifest: int = 4,
    position_deletes: dict[str, list[int]] | None = None,
    equality_deletes: bool = False,
    schema_fields: list[dict] | None = None,
) -> None:
    """Author a minimal spec-shaped Iceberg v2 table over existing parquet
    files: ``data_files`` = [(path, record_count, file_size)], split across
    ⌈n/files_per_manifest⌉ manifests so the reader's manifest walk is
    exercised, plus metadata JSON + version hint.  Append-only: calling
    again with a higher ``snapshot_id`` adds a snapshot (old ones remain
    readable — time travel).

    ``position_deletes`` = {data_file_path: [row positions]} additionally
    writes a position-delete parquet (file_path, pos) referenced from a
    content=1 manifest — the merge-on-read shape.  ``equality_deletes``
    stamps that manifest's entry content=2 instead (for the loud-refusal
    test).  ``schema_fields`` records the snapshot's CURRENT schema
    (``[{"id", "name", "type", "required"}]``) so readers resolve columns
    by field id; later calls may pass an evolved schema (rename keeps the
    id, adds append new ids)."""
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    manifests = []
    groups = [
        data_files[i : i + files_per_manifest]
        for i in range(0, len(data_files), files_per_manifest)
    ]
    for gi, group in enumerate(groups):
        entries = [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.abspath(p),
                    "file_format": "PARQUET",
                    "record_count": int(rc),
                    "file_size_in_bytes": int(sz),
                },
            }
            for p, rc, sz in group
        ]
        mpath = os.path.join(meta_dir, f"snap{snapshot_id}-m{gi}.avro")
        buf = write_container(_MANIFEST_ENTRY_SCHEMA, entries)
        with open(mpath, "wb") as f:
            f.write(buf)
        manifests.append(
            {
                "manifest_path": os.path.abspath(mpath),
                "manifest_length": len(buf),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": snapshot_id,
                "min_sequence_number": snapshot_id,
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(group),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(int(rc) for _p, rc, _s in group),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    if position_deletes:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fps, poss = [], []
        for p, positions in sorted(position_deletes.items()):
            for pos in positions:
                fps.append(os.path.abspath(p))
                poss.append(int(pos))
        del_path = os.path.join(meta_dir, f"snap{snapshot_id}-deletes.parquet")
        pq.write_table(
            pa.table({"file_path": fps, "pos": poss}), del_path
        )
        entry = {
            "status": 1,
            "snapshot_id": snapshot_id,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": 2 if equality_deletes else 1,
                "file_path": os.path.abspath(del_path),
                "file_format": "PARQUET",
                "record_count": len(poss),
                "file_size_in_bytes": os.path.getsize(del_path),
            },
        }
        mpath = os.path.join(meta_dir, f"snap{snapshot_id}-del-m0.avro")
        buf = write_container(_MANIFEST_ENTRY_SCHEMA, [entry])
        with open(mpath, "wb") as f:
            f.write(buf)
        manifests.append(
            {
                "manifest_path": os.path.abspath(mpath),
                "manifest_length": len(buf),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": snapshot_id,
                "min_sequence_number": snapshot_id,
                "added_snapshot_id": snapshot_id,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": len(poss),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    ml_path = os.path.join(meta_dir, f"snap-{snapshot_id}-1-fixture.avro")
    with open(ml_path, "wb") as f:
        f.write(write_container(_MANIFEST_FILE_SCHEMA, manifests))

    # metadata JSON: append to the previous version's snapshot list
    prev_snaps: list = []
    version = 1
    try:
        prev = _latest_metadata(table_dir)
        with open(prev) as f:
            prev_meta = json.load(f)
        prev_snaps = prev_meta.get("snapshots", [])
        version = int(re.search(r"v(\d+)\.metadata", prev).group(1)) + 1
    except (FileNotFoundError, ValueError):
        pass
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": os.path.abspath(table_dir),
        "last-sequence-number": snapshot_id,
        "current-snapshot-id": snapshot_id,
        "snapshots": prev_snaps
        + [
            {
                "snapshot-id": snapshot_id,
                "sequence-number": snapshot_id,
                "timestamp-ms": 0,
                "manifest-list": os.path.abspath(ml_path),
                "summary": {"operation": "append"},
            }
        ],
        "schemas": (
            [{"type": "struct", "schema-id": 0, "fields": schema_fields}]
            if schema_fields else []
        ),
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))
