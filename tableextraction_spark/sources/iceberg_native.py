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
import time

from .avro import read_container, write_container

_STATUS_DELETED = 2


# --- partition transforms (Iceberg spec "Partition Transforms" + Appendix B) ---

def murmur3_32(data: bytes) -> int:
    """32-bit Murmur3 (x86, seed 0) — the hash the Iceberg spec mandates for
    bucket transforms (Appendix B), implemented from the published algorithm.
    Returns the UNSIGNED 32-bit value; bucket() masks to the spec's
    non-negative int."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = 0
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if tail:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _bucket_hash(v) -> int:
    """Spec hash input: int/long as 8-byte little-endian two's complement,
    string as UTF-8 bytes (Appendix B test vectors pinned in tests)."""
    if isinstance(v, bool) or not isinstance(v, (int, str, bytes)):
        raise NotImplementedError(f"bucket transform over {type(v).__name__}")
    if isinstance(v, int):
        data = (v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    elif isinstance(v, str):
        data = v.encode("utf-8")
    else:
        data = v
    return murmur3_32(data)


def apply_transform(transform: str, v):
    """Value of ``transform`` applied to ``v``, or raises NotImplementedError
    for transforms this reader cannot evaluate (callers treat that as
    "cannot prune" — over-scanning is always correct, mis-pruning never is).
    ``None`` source values map to ``None`` for every transform (spec)."""
    if v is None:
        return None
    if transform == "identity":
        return v
    m = re.fullmatch(r"bucket\[(\d+)\]", transform)
    if m:
        n = int(m.group(1))
        return (_bucket_hash(v) & 0x7FFFFFFF) % n
    m = re.fullmatch(r"truncate\[(\d+)\]", transform)
    if m:
        w = int(m.group(1))
        if isinstance(v, int) and not isinstance(v, bool):
            return v - (((v % w) + w) % w)
        if isinstance(v, str):
            return v[:w]
        raise NotImplementedError(
            f"truncate transform over {type(v).__name__}"
        )
    if transform == "void":
        return None
    raise NotImplementedError(f"Iceberg partition transform {transform!r}")


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
    "manifest", "sequence_number", "partition"}],
    "position_deletes": {data_path: sorted positions},
    "equality_deletes": [{"path", "equality_ids", "sequence_number"}],
    "partition_spec": [spec field dicts]}`` for the CURRENT snapshot by
    default or ``snapshot_id`` for time travel.

    Deleted entries (status=2) are dropped.  v2 POSITION delete files
    (content=1) are read — parquet of (file_path, pos), the merge-on-read
    shape compacting writers emit — and returned as per-data-file sorted
    row positions for the scan to mask.  EQUALITY deletes (content=2) are
    returned as file references with their equality field ids and sequence
    numbers; per the spec they apply to data files whose sequence number is
    STRICTLY LOWER than the delete's (rows added in the same or a later
    commit are not affected), and matching uses null-safe equality on the
    id-resolved columns — the scan applies them
    (sources/media_parquet.py).  Sequence numbers are the entry's when
    explicit, else inherited from the manifest (spec inheritance rule).
    """
    with open(_latest_metadata(table_dir)) as f:
        meta = json.load(f)
    snap_id = snapshot_id or meta.get("current-snapshot-id")
    spec_id = meta.get("default-spec-id", 0)
    spec_fields: list[dict] = []
    for spec in meta.get("partition-specs", []):
        if spec.get("spec-id", 0) == spec_id:
            spec_fields = spec.get("fields", [])
    if not snap_id or snap_id == -1:
        return {
            "data_files": [],
            "position_deletes": {},
            "equality_deletes": [],
            "partition_spec": spec_fields,
        }
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snap_id not in snaps:
        raise ValueError(f"snapshot {snap_id} not in table metadata")
    manifest_list = _local(snaps[snap_id]["manifest-list"])
    with open(manifest_list, "rb") as f:
        _, manifests = read_container(f.read())
    data, delete_paths, eq_deletes = [], [], []
    for m in manifests:
        is_delete = m.get("content", 0) == 1
        with open(_local(m["manifest_path"]), "rb") as f:
            _, entries = read_container(f.read())
        for e in entries:
            if e.get("status") == _STATUS_DELETED:
                continue
            seq = e.get("sequence_number")
            if seq is None:
                seq = m.get("sequence_number", 0)
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
                        "sequence_number": seq,
                        "partition": df.get("partition") or {},
                    }
                )
            elif content == 1:
                delete_paths.append(_local(df["file_path"]))
            else:
                ids = df.get("equality_ids")
                if not ids:
                    raise ValueError(
                        "Iceberg equality-delete file without equality_ids "
                        "— cannot apply, refusing phantom rows"
                    )
                eq_deletes.append(
                    {
                        "path": _local(df["file_path"]),
                        "equality_ids": [int(i) for i in ids],
                        "sequence_number": seq,
                    }
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
    return {
        "data_files": data,
        "position_deletes": deletes,
        "equality_deletes": eq_deletes,
        "partition_spec": spec_fields,
    }


def table_schema(table_dir: str) -> list[dict] | None:
    """CURRENT Iceberg schema fields ``[{"id", "name", "type", ...}]`` from
    the metadata JSON, or None when the table records no schema (minimal
    fixtures).  Field ids — not names — are a column's identity in Iceberg:
    a rename keeps the id, so readers must resolve parquet columns by the
    ``PARQUET:field.id`` metadata real writers stamp, falling back to names
    only for files without ids (see ``resolve_columns``)."""
    with open(_latest_metadata(table_dir)) as f:
        meta = json.load(f)
    if not meta.get("schemas"):
        return None
    fields = _current_schema(meta)
    if fields is None:
        raise ValueError(
            f"current-schema-id {meta.get('current-schema-id', 0)} not in "
            "table schemas"
        )
    return fields


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
    positions/values alongside."""
    snap = read_table_snapshot(table_dir, snapshot_id)
    if snap["position_deletes"] or snap["equality_deletes"]:
        raise NotImplementedError(
            "snapshot carries row-level deletes — use read_table_snapshot "
            "and apply them; a bare file list would contain phantom rows"
        )
    return snap["data_files"]


def snapshot_ids(table_dir: str) -> list[int]:
    """All snapshot ids recorded in the current metadata (oldest first)."""
    with open(_latest_metadata(table_dir)) as f:
        meta = json.load(f)
    return [s["snapshot-id"] for s in meta.get("snapshots", [])]


def read_table_incremental(
    table_dir: str, from_snapshot_id: int, to_snapshot_id: int | None = None
) -> dict:
    """Incremental scan: the data files live at ``to`` (default: current)
    but NOT live at ``from`` — the resume-from-checkpoint shape a 100 TB
    pipeline re-runs nightly (process only what arrived since the last
    committed snapshot, instead of rescanning the table).

    Exact for append+delete workloads.  If any file live at ``from``
    disappeared by ``to`` (a compaction/rewrite — its rows may resurface
    inside the 'new' files), refuses loudly rather than double-counting;
    the fallback is a full scan of ``to``.  ``to``'s row-level deletes are
    returned filtered to the new files; deletes landing on rows already
    consumed at ``from`` are the consumer's reconciliation problem, stated
    here rather than silently dropped, split by kind:

    * ``stale_deletes`` — POSITION deletes targeting pre-``from`` data
      files (keyed by data-file path, like ``position_deletes``).
    * ``stale_equality_deletes`` — EQUALITY delete files committed after
      ``from``.  An equality delete names row VALUES, not a file, so the
      same delete file both applies to the added files (it stays in
      ``equality_deletes``; the per-file sequence-number rule decides) and
      may ALSO hit rows in files consumed before ``from`` — the consumer
      must re-apply these keys to previously consumed data.  Equality
      deletes already present at ``from`` cannot apply to the added files
      (their sequence numbers are older) and were already reconciled.

    Return shape matches :func:`read_table_snapshot` plus the two stale
    fields.
    """
    ids = snapshot_ids(table_dir)
    if to_snapshot_id is None:
        to_snapshot_id = ids[-1] if ids else None
    if from_snapshot_id not in ids or to_snapshot_id not in ids:
        raise ValueError(
            f"unknown snapshot range {from_snapshot_id}..{to_snapshot_id} "
            f"(table has {ids})"
        )
    if ids.index(from_snapshot_id) > ids.index(to_snapshot_id):
        raise ValueError(
            f"from-snapshot {from_snapshot_id} is newer than to-snapshot "
            f"{to_snapshot_id}"
        )
    old = read_table_snapshot(table_dir, from_snapshot_id)
    new = read_table_snapshot(table_dir, to_snapshot_id)
    old_paths = {f["path"] for f in old["data_files"]}
    new_paths = {f["path"] for f in new["data_files"]}
    vanished = old_paths - new_paths
    if vanished:
        raise ValueError(
            f"{len(vanished)} data file(s) live at snapshot "
            f"{from_snapshot_id} are gone at {to_snapshot_id} (compaction/"
            f"rewrite) — an incremental diff would double-count rewritten "
            f"rows; run a full scan of snapshot {to_snapshot_id} instead"
        )
    added = [f for f in new["data_files"] if f["path"] not in old_paths]
    added_set = {f["path"] for f in added}
    old_eq_paths = {d["path"] for d in old["equality_deletes"]}
    return {
        "data_files": added,
        "position_deletes": {
            p: v for p, v in new["position_deletes"].items() if p in added_set
        },
        "equality_deletes": new["equality_deletes"],
        "partition_spec": new["partition_spec"],
        "stale_deletes": {
            p: v
            for p, v in new["position_deletes"].items()
            if p not in added_set
        },
        # equality deletes committed after `from`: value-keyed, so they may
        # target rows in files consumed before `from` — surfaced for the
        # consumer to re-apply (see docstring); also still present in
        # equality_deletes for the added files
        "stale_equality_deletes": [
            d for d in new["equality_deletes"]
            if d["path"] not in old_eq_paths
        ],
    }


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

def _manifest_entry_schema(
    partition_fields: list[tuple[str, str]] | None = None,
) -> dict:
    """Manifest-entry Avro schema with the published field ids.  The
    ``partition`` struct (field-id 102) is table-specific, so the schema is
    built per table from ``partition_fields`` = [(name, avro_type)];
    ``equality_ids`` (field-id 135) rides along for delete manifests."""
    data_fields = [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
    ]
    if partition_fields:
        data_fields.append(
            {
                "name": "partition",
                "field-id": 102,
                "type": {
                    "type": "record",
                    "name": "r102",
                    "fields": [
                        {"name": n, "type": ["null", t], "default": None}
                        for n, t in partition_fields
                    ],
                },
            }
        )
    data_fields += [
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "equality_ids",
         "type": ["null", {"type": "array", "items": "int"}],
         "default": None, "field-id": 135},
    ]
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None,
             "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "field-id": 2,
             "type": {"type": "record", "name": "r2", "fields": data_fields}},
        ],
    }


def write_table(
    table_dir: str,
    data_files: list[tuple],
    snapshot_id: int = 1,
    files_per_manifest: int = 4,
    position_deletes: dict[str, list[int]] | None = None,
    equality_deletes: list[dict] | None = None,
    schema_fields: list[dict] | None = None,
    partition_spec: list[dict] | None = None,
) -> None:
    """Author a minimal spec-shaped Iceberg v2 table over existing parquet
    files: ``data_files`` = [(path, record_count, file_size)] or
    [(path, record_count, file_size, partition_values_dict)], split across
    ⌈n/files_per_manifest⌉ manifests so the reader's manifest walk is
    exercised, plus metadata JSON + version hint.  Append-only: calling
    again with a higher ``snapshot_id`` adds a snapshot (old ones remain
    readable — time travel).

    ``position_deletes`` = {data_file_path: [row positions]} additionally
    writes a position-delete parquet (file_path, pos) referenced from a
    content=1 manifest — the merge-on-read shape.  ``equality_deletes`` =
    [{"ids": [field ids], "rows": [{column_name: value}]}] writes one
    equality-delete parquet per spec (columns stamped with their
    ``PARQUET:field.id``) referenced from a content=2 manifest entry
    carrying ``equality_ids`` — the CDC merge-on-read shape; per the spec
    it applies only to data files of STRICTLY LOWER sequence number, so
    deletes written at snapshot N affect snapshots < N.
    ``schema_fields`` records the snapshot's CURRENT schema
    (``[{"id", "name", "type", "required"}]``) so readers resolve columns
    by field id; later calls may pass an evolved schema (rename keeps the
    id, adds append new ids).  ``partition_spec`` records spec-0 fields
    (``[{"name", "transform", "source-id", "field-id"}]``) and each data
    file's partition values travel in its manifest entry (field-id 102) —
    what the scan's partition pruning reads."""
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    # per-file tuples may carry a partition dict (4th) and an explicit data
    # sequence number (5th — how a re-listed EXISTING file keeps its
    # original sequence so later equality deletes still apply to it; None
    # inherits the manifest's, i.e. this snapshot's)
    norm_files = [
        (
            df[0], df[1], df[2],
            df[3] if len(df) > 3 else {},
            df[4] if len(df) > 4 else None,
        )
        for df in data_files
    ]
    part_avro_fields: list[tuple[str, str]] = []
    if partition_spec:
        seen_vals: dict[str, object] = {}
        for _p, _rc, _sz, pv, _seq in norm_files:
            for k, v in pv.items():
                if k not in seen_vals or seen_vals[k] is None:
                    seen_vals[k] = v
        for f in partition_spec:
            v = seen_vals.get(f["name"])
            part_avro_fields.append(
                (f["name"], "string" if isinstance(v, str) else "long")
            )
    entry_schema = _manifest_entry_schema(part_avro_fields or None)
    manifests = []
    groups = [
        norm_files[i : i + files_per_manifest]
        for i in range(0, len(norm_files), files_per_manifest)
    ]
    for gi, group in enumerate(groups):
        entries = [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.abspath(p),
                    "file_format": "PARQUET",
                    **({"partition": pv} if part_avro_fields else {}),
                    "record_count": int(rc),
                    "file_size_in_bytes": int(sz),
                    "equality_ids": None,
                },
            }
            for p, rc, sz, pv, seq in group
        ]
        mpath = os.path.join(meta_dir, f"snap{snapshot_id}-m{gi}.avro")
        buf = write_container(entry_schema, entries)
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
                "added_rows_count": sum(int(rc) for _p, rc, *_ in group),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    def _delete_manifest(del_path: str, n_rows: int, tag: str,
                         content: int, equality_ids: list[int] | None):
        entry = {
            "status": 1,
            "snapshot_id": snapshot_id,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": content,
                "file_path": os.path.abspath(del_path),
                "file_format": "PARQUET",
                **({"partition": {}} if part_avro_fields else {}),
                "record_count": n_rows,
                "file_size_in_bytes": os.path.getsize(del_path),
                "equality_ids": equality_ids,
            },
        }
        mpath = os.path.join(meta_dir, f"snap{snapshot_id}-{tag}.avro")
        buf = write_container(entry_schema, [entry])
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
                "added_rows_count": n_rows,
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
        _delete_manifest(del_path, len(poss), "del-m0", 1, None)
    if equality_deletes:
        import pyarrow as pa
        import pyarrow.parquet as pq

        ids_by_name = (
            {f["name"]: f["id"] for f in schema_fields} if schema_fields else {}
        )
        for di, spec in enumerate(equality_deletes):
            ids = [int(i) for i in spec["ids"]]
            rows = spec["rows"]
            cols = list(rows[0].keys()) if rows else []
            fields = []
            for c in cols:
                fid = ids_by_name.get(c)
                v = next((r[c] for r in rows if r.get(c) is not None), "")
                typ = pa.string() if isinstance(v, str) else pa.int64()
                md = (
                    {b"PARQUET:field.id": str(fid).encode()}
                    if fid is not None else None
                )
                fields.append(pa.field(c, typ, metadata=md))
            t = pa.table(
                {c: [r.get(c) for r in rows] for c in cols},
                schema=pa.schema(fields),
            )
            del_path = os.path.join(
                meta_dir, f"snap{snapshot_id}-eqdel-{di}.parquet"
            )
            pq.write_table(t, del_path)
            _delete_manifest(del_path, len(rows), f"eqdel-m{di}", 2, ids)
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
        "partition-specs": [{"spec-id": 0, "fields": partition_spec or []}],
        "default-spec-id": 0,
    }
    _commit_metadata(meta_dir, version, meta)


class CommitConflictError(Exception):
    """Another writer committed this table version first — re-read the
    table state and retry the commit (optimistic concurrency, the same
    contract as Iceberg's HadoopTableOperations)."""


def _write_durable(path: str, data: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())  # data hits disk before any rename journals
    os.replace(tmp, path)


def _commit_metadata(meta_dir: str, version: int, meta: dict) -> None:
    """Make a new table version visible atomically AND exclusively: the
    metadata JSON is fsynced at a temp name then hard-linked to its final
    name — ``os.link`` fails with EEXIST when a concurrent writer already
    committed this version (raised as :class:`CommitConflictError`, never
    a silent clobber), unlike a replace.  The version hint is advisory
    (``_latest_metadata`` falls back to the highest version), so it uses
    a plain durable replace.  A crash at any point leaves either the old
    version or a fully-written new one — never a torn file."""
    mpath = os.path.join(meta_dir, f"v{version}.metadata.json")
    tmp = f"{mpath}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, mpath)  # exclusive create: loser gets EEXIST
    except FileExistsError:
        raise CommitConflictError(
            f"version {version} of {meta_dir} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)
    dfd = os.open(meta_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)  # the link itself
    finally:
        os.close(dfd)
    _write_durable(os.path.join(meta_dir, "version-hint.text"), str(version))


def is_native_table_dir(path: str) -> bool:
    """True when ``path`` holds a readable native-table layout — at least
    one ``metadata/v*.metadata.json``.  The ONE layout predicate shared
    by catalog routing, the python media scan, and the job entry."""
    import glob

    return bool(glob.glob(os.path.join(path, "metadata", "v*.metadata.json")))


#: Spark simpleString → Iceberg primitive type (append_snapshot schemas).
_SPARK_TO_ICEBERG = {
    "bigint": "long", "int": "int", "smallint": "int", "tinyint": "int",
    "string": "string", "double": "double", "float": "float",
    "boolean": "boolean", "binary": "binary", "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp", "date": "date",
}


def _all_ids(type_or_fields) -> list[int]:
    """Every field/element/key/value id in an Iceberg schema fragment —
    the uniqueness domain new ids must clear."""
    out: list[int] = []
    if isinstance(type_or_fields, list):
        for f in type_or_fields:
            out.append(f["id"])
            out.extend(_all_ids(f.get("type")))
    elif isinstance(type_or_fields, dict):
        t = type_or_fields.get("type")
        if t == "struct":
            out.extend(_all_ids(type_or_fields.get("fields", [])))
        elif t == "list":
            out.append(type_or_fields["element-id"])
            out.extend(_all_ids(type_or_fields.get("element")))
        elif t == "map":
            out.append(type_or_fields["key-id"])
            out.append(type_or_fields["value-id"])
            out.extend(_all_ids(type_or_fields.get("key")))
            out.extend(_all_ids(type_or_fields.get("value")))
    return out


def iceberg_fields_for(spark_schema, existing: list[dict] | None) -> list[dict]:
    """Spark StructType → Iceberg schema fields with STABLE field ids:
    names already in ``existing`` keep their id (a field's identity in
    Iceberg), new names get fresh ids above the current maximum —
    recursively, so nested struct fields and list elements (the spans
    table's ``array<struct<…>>`` shape) keep their ids across appends
    per the spec's schema-evolution rules."""
    import pyspark.sql.types as T

    next_id = [max(_all_ids(existing or []), default=0) + 1]

    def alloc() -> int:
        fid = next_id[0]
        next_id[0] += 1
        return fid

    def conv(dt, prev):
        """Spark DataType + matching previous Iceberg type (or None) →
        Iceberg type JSON, reusing previous nested ids by name/slot."""
        if isinstance(dt, T.StructType):
            prev_fields = (
                {f["name"]: f for f in prev.get("fields", [])}
                if isinstance(prev, dict) and prev.get("type") == "struct"
                else {}
            )
            fields = []
            for sub in dt.fields:
                pf = prev_fields.get(sub.name)
                fields.append(
                    {
                        "id": pf["id"] if pf else alloc(),
                        "name": sub.name,
                        "required": False,
                        "type": conv(sub.dataType, pf and pf.get("type")),
                    }
                )
            return {"type": "struct", "fields": fields}
        if isinstance(dt, T.ArrayType):
            is_prev = isinstance(prev, dict) and prev.get("type") == "list"
            return {
                "type": "list",
                "element-id": prev["element-id"] if is_prev else alloc(),
                "element": conv(
                    dt.elementType, prev.get("element") if is_prev else None
                ),
                "element-required": False,
            }
        if isinstance(dt, T.MapType):
            is_prev = isinstance(prev, dict) and prev.get("type") == "map"
            return {
                "type": "map",
                "key-id": prev["key-id"] if is_prev else alloc(),
                "key": conv(dt.keyType, prev.get("key") if is_prev else None),
                "value-id": prev["value-id"] if is_prev else alloc(),
                "value": conv(
                    dt.valueType, prev.get("value") if is_prev else None
                ),
                "value-required": False,
            }
        simple = dt.simpleString()
        typ = _SPARK_TO_ICEBERG.get(simple)
        if typ is None and simple.startswith("decimal("):
            typ = simple  # decimal(p, s) spells the same in both
        if typ is None:
            raise NotImplementedError(
                f"iceberg-native append: Spark type {simple!r} has no "
                "Iceberg mapping"
            )
        return typ

    by_name = {f["name"]: f for f in existing} if existing else {}
    df_names = {f.name for f in spark_schema.fields}
    # columns the table already records but this df lacks are CARRIED —
    # an append must never silently drop a column from the table schema
    # (old files still hold it; schema-projected reads null-fill new ones)
    out = [dict(f) for f in (existing or []) if f["name"] not in df_names]
    for field in spark_schema.fields:
        prev = by_name.get(field.name)
        typ = conv(field.dataType, prev and prev.get("type"))
        if prev is not None and typ != prev.get("type"):
            raise NotImplementedError(
                f"iceberg-native append: column {field.name!r} changes "
                f"type {prev.get('type')!r} → {typ!r} — type evolution is "
                "not supported by the native append path (reads of older "
                "files would silently corrupt); use the JVM runtime"
            )
        out.append(
            {
                "id": prev["id"] if prev else alloc(),
                "name": field.name,
                "required": False,
                "type": typ,
            }
        )
    return out


def spark_ddl_for(fields: list[dict]) -> str:
    """Iceberg schema fields → a Spark DDL string (empty-table reads)."""

    def one(t) -> str:
        if isinstance(t, dict):
            kind = t.get("type")
            if kind == "struct":
                inner = ", ".join(
                    f"{f['name']}: {one(f['type'])}" for f in t["fields"]
                )
                return f"struct<{inner}>"
            if kind == "list":
                return f"array<{one(t['element'])}>"
            if kind == "map":
                return f"map<{one(t['key'])}, {one(t['value'])}>"
            raise ValueError(f"unknown Iceberg type {t!r}")
        return _ICEBERG_TO_SPARK_DDL.get(t, t)

    return ", ".join(f"{f['name']} {one(f['type'])}" for f in fields)


_ICEBERG_TO_SPARK_DDL = {
    "long": "bigint", "int": "int", "string": "string", "double": "double",
    "float": "float", "boolean": "boolean", "binary": "binary",
    "timestamptz": "timestamp", "timestamp": "timestamp_ntz",
    "date": "date",
}


def append_snapshot(
    table_dir: str,
    data_files: list[tuple],
    schema_fields: list[dict] | None = None,
) -> int:
    """Commit one APPEND snapshot to a (possibly fresh) native table.

    Unlike :func:`write_table` (the fixture author, whose snapshot lists
    only the manifests it builds), this is the production append shape:
    the new manifest-list carries the PREVIOUS snapshot's manifests
    forward untouched plus one new manifest for ``data_files``
    ``[(path, record_count, file_size_in_bytes)]`` — so the committed
    snapshot is cumulative, earlier snapshots stay readable (time
    travel), and the commit point is the atomic metadata/hint rename
    (:func:`_commit_metadata`).  A crash before the commit leaves only
    unreferenced data files — invisible to readers, per Iceberg
    semantics.  Returns the new snapshot id."""
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    prev_meta: dict = {}
    prev_manifests: list[dict] = []
    version = 1
    try:
        prev_path = _latest_metadata(table_dir)
        with open(prev_path) as f:
            prev_meta = json.load(f)
        if prev_meta.get("format-version") != 2:
            raise NotImplementedError(
                f"iceberg-native append: table at {table_dir} is format-"
                f"version {prev_meta.get('format-version')!r} — only v2 "
                "tables append natively (a v1 manifest list lacks the "
                "sequence/content fields the rewrite would fabricate)"
            )
        version = int(re.search(r"v(\d+)\.metadata", prev_path).group(1)) + 1
        cur = prev_meta.get("current-snapshot-id")
        snaps = {s["snapshot-id"]: s for s in prev_meta.get("snapshots", [])}
        if cur in snaps:
            with open(_local(snaps[cur]["manifest-list"]), "rb") as f:
                _, prev_manifests = read_container(f.read())
        # the carry-forward RE-SERIALIZES these entries with OUR manifest-
        # list schema: refuse when a foreign writer's entry holds fields
        # that rewrite would silently drop (partition summaries etc.)
        ours = {f["name"] for f in _MANIFEST_FILE_SCHEMA["fields"]}
        for m in prev_manifests:
            extra = {
                k for k, v in m.items() if k not in ours and v not in (None, [])
            }
            if extra:
                raise NotImplementedError(
                    "iceberg-native append: existing manifest-list entries "
                    f"carry foreign-writer fields {sorted(extra)} that the "
                    "carry-forward rewrite would drop — append this table "
                    "with the JVM Iceberg runtime"
                )
    except FileNotFoundError:
        pass  # fresh table: first commit creates it
    snapshot_id = (
        max(
            [int(prev_meta.get("last-sequence-number", 0))]
            + [int(s["snapshot-id"]) for s in prev_meta.get("snapshots", [])]
        )
        + 1
    )
    if schema_fields is None:
        schema_fields = (_current_schema(prev_meta) if prev_meta else None) or []
    entry_schema = _manifest_entry_schema(None)
    manifests = list(prev_manifests)
    if data_files:
        entries = [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited from the manifest
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.abspath(p),
                    "file_format": "PARQUET",
                    "record_count": int(rc),
                    "file_size_in_bytes": int(sz),
                    "equality_ids": None,
                },
            }
            for p, rc, sz in data_files
        ]
        buf = write_container(entry_schema, entries)
        mpath = os.path.join(meta_dir, f"snap{snapshot_id}-append-m0.avro")
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
                "added_files_count": len(data_files),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(int(rc) for _p, rc, _sz in data_files),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    ml_path = os.path.join(meta_dir, f"snap-{snapshot_id}-1-append.avro")
    with open(ml_path, "wb") as f:
        f.write(write_container(_MANIFEST_FILE_SCHEMA, manifests))
    meta = {
        "format-version": 2,
        "table-uuid": prev_meta.get(
            "table-uuid", "00000000-0000-0000-0000-000000000000"
        ),
        "location": os.path.abspath(table_dir),
        "last-sequence-number": snapshot_id,
        "current-snapshot-id": snapshot_id,
        "snapshots": prev_meta.get("snapshots", [])
        + [
            {
                "snapshot-id": snapshot_id,
                "sequence-number": snapshot_id,
                "timestamp-ms": int(time.time() * 1000),
                "manifest-list": os.path.abspath(ml_path),
                "summary": {"operation": "append"},
            }
        ],
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": schema_fields}
        ],
        "current-schema-id": 0,
        "partition-specs": prev_meta.get(
            "partition-specs", [{"spec-id": 0, "fields": []}]
        ),
        "default-spec-id": prev_meta.get("default-spec-id", 0),
    }
    _commit_metadata(meta_dir, version, meta)
    return snapshot_id


def _current_schema(meta: dict) -> list[dict] | None:
    cur = meta.get("current-schema-id", 0)
    for s in meta.get("schemas") or []:
        if s.get("schema-id", 0) == cur:
            return s.get("fields") or None
    return None


# ------------------------------------------------- table maintenance (r5)


_FOREIGN_META_KEYS = (
    # metadata fields a real (JVM) writer emits that our maintenance
    # does not understand: branch/tag refs, Puffin statistics, history
    # logs that must stay consistent with the snapshot list
    "refs", "statistics", "partition-statistics", "snapshot-log",
    "metadata-log",
)


def _refuse_foreign_maintenance(meta: dict, op: str) -> None:
    for key in _FOREIGN_META_KEYS:
        if meta.get(key):
            raise NotImplementedError(
                f"iceberg-native {op}: table metadata carries {key!r} — a "
                "real-writer feature this maintenance path does not "
                "preserve; use the JVM Iceberg runtime's maintenance "
                "actions on this table"
            )


def _all_metadata_paths(table_dir: str) -> list[str]:
    meta_dir = os.path.join(table_dir, "metadata")
    out = []
    for name in os.listdir(meta_dir):
        if re.match(r"v(\d+)\.metadata\.json$", name):
            out.append(os.path.join(meta_dir, name))
    if not out:
        raise FileNotFoundError(f"no v*.metadata.json under {meta_dir}")
    return sorted(out)


def _referenced_files(table_dir: str) -> set[str]:
    """Every file path reachable from ANY metadata version on disk — not
    just the hint's: a crash between the metadata link and the hint
    update leaves the hint stale, and a GC trusting it would delete the
    newest committed snapshot's files.  Manifest lists and manifests are
    each decoded once (cumulative appends reference the same manifest
    from every later snapshot)."""
    refs: set[str] = set()
    seen_ml: set[str] = set()
    for mpath in _all_metadata_paths(table_dir):
        with open(mpath) as f:
            meta = json.load(f)
        for snap in meta.get("snapshots", []):
            ml = os.path.abspath(_local(snap["manifest-list"]))
            refs.add(ml)
            if ml in seen_ml:
                continue
            seen_ml.add(ml)
            with open(ml, "rb") as f:
                _, manifests = read_container(f.read())
            for m in manifests:
                mp = os.path.abspath(_local(m["manifest_path"]))
                if mp in refs:
                    continue
                refs.add(mp)
                with open(mp, "rb") as f:
                    _, entries = read_container(f.read())
                for e in entries:
                    refs.add(
                        os.path.abspath(_local(e["data_file"]["file_path"]))
                    )
    return refs


def expire_snapshots(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots from the table
    metadata (the current snapshot is always kept), committed as a new
    metadata version through the same exclusive atomic path as appends.
    Returns the expired snapshot ids.  The files those snapshots alone
    referenced become orphans for :func:`gc_orphans` — the two-step
    expire-then-gc shape of Iceberg's own maintenance actions."""
    if keep_last < 1:
        raise ValueError("expire_snapshots: keep_last must be >= 1")
    prev_path = _latest_metadata(table_dir)
    with open(prev_path) as f:
        meta = json.load(f)
    _refuse_foreign_maintenance(meta, "expire_snapshots")
    snaps = meta.get("snapshots", [])
    if len(snaps) <= keep_last:
        return []
    # commit order is the SEQUENCE number (monotonic per spec), not the
    # snapshot id (random 64-bit for real writers)
    snaps_sorted = sorted(
        snaps,
        key=lambda s: (s.get("sequence-number", 0), s["snapshot-id"]),
    )
    keep = snaps_sorted[-keep_last:]
    cur = meta.get("current-snapshot-id")
    if cur is not None and cur not in {s["snapshot-id"] for s in keep}:
        raise ValueError(
            "expire_snapshots: keep_last window excludes the CURRENT "
            f"snapshot {cur} — refusing to expire the live view"
        )
    expired = [s["snapshot-id"] for s in snaps_sorted[:-keep_last]]
    version = int(re.search(r"v(\d+)\.metadata", prev_path).group(1)) + 1
    meta = {**meta, "snapshots": keep}
    _commit_metadata(os.path.join(table_dir, "metadata"), version, meta)
    return expired


def gc_orphans(table_dir: str, grace_seconds: float = 86400.0) -> dict:
    """Delete files under ``data/`` and ``metadata/`` that no snapshot in
    the CURRENT metadata references and that are older than
    ``grace_seconds`` (the grace window protects a concurrent writer's
    staged-but-not-yet-committed files — Iceberg's remove_orphan_files
    contract).  Metadata JSONs and the version hint are never touched
    (older versions stay for forensics; expire them by hand if needed).
    Returns ``{"deleted": [...], "kept_recent": n, "referenced": n}``."""
    with open(_latest_metadata(table_dir)) as f:
        _refuse_foreign_maintenance(json.load(f), "gc_orphans")
    refs = _referenced_files(table_dir)
    cutoff = time.time() - grace_seconds
    deleted: list[str] = []
    emptied: set[str] = set()  # dirs whose last contents WE deleted
    kept_recent = 0
    roots = [os.path.join(table_dir, "data"), os.path.join(table_dir, "metadata")]
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, _dirs, names in os.walk(root):
            for name in names:
                p = os.path.abspath(os.path.join(dirpath, name))
                if p in refs:
                    continue
                if name.endswith(".metadata.json") or name == "version-hint.text":
                    continue  # table history, never GC'd here
                # Spark _SUCCESS/.crc markers are unreferenced by design
                # and fall through to the normal age-gated delete
                try:
                    if os.path.getmtime(p) > cutoff:
                        kept_recent += 1
                        continue
                    os.unlink(p)
                    deleted.append(p)
                    emptied.add(os.path.dirname(p))
                except FileNotFoundError:
                    continue  # concurrent GC
    # drop now-empty per-commit staging dirs.  A dir is removable when
    # WE emptied it this pass (its contents were provably old + dead —
    # unlink bumps the parent mtime, so the mtime test alone would spare
    # it) or when it was already empty AND old (a concurrent writer's
    # freshly-created stage dir survives the grace window); os.walk's
    # dirs lists were snapshotted before children were removed, so a
    # nested chain drains across successive invocations
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for dirpath, dirs, names in os.walk(data_root, topdown=False):
            if dirpath != data_root and not dirs and not names:
                try:
                    if (
                        dirpath not in emptied
                        and os.path.getmtime(dirpath) > cutoff
                    ):
                        continue
                    os.rmdir(dirpath)
                except OSError:
                    pass
    return {
        "deleted": sorted(deleted),
        "kept_recent": kept_recent,
        "referenced": len(refs),
    }
