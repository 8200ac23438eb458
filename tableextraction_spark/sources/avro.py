"""From-scratch Avro object-container codec — the metadata format Apache
Iceberg manifests ship as.  No avro-python3/fastavro: stdlib ``json`` +
``zlib`` + bytes parsing, same no-library standard as png/flac/warc.

Public spec: the Apache Avro 1.11 specification ("Object Container Files"
and "Binary Encoding").  Files are self-describing — the writer's schema is
embedded in the header — so the generic datum reader here is driven by that
embedded schema and needs no schema registry: it reads ANY writer's file,
including real Iceberg manifests.

Decoder coverage: null/boolean/int/long (zigzag varint), float/double,
bytes/string, fixed, enum, array, map, union, record, and recursive named
types; codecs null + deflate.  Logical types are returned as their
underlying primitive (Iceberg readers treat timestamps as longs anyway).

Hostile-input bounds: every length is clamped-checked against the buffer,
varints are capped at 10 bytes, block/array counts must advance the
cursor — corrupt input raises ValueError, never spins (same discipline as
warc/avi).
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"
_MAX_VARINT = 10
_MAX_BLOCK_ITEMS = 1 << 24   # per array/map block; manifests are ≪ this
_MAX_DEPTH = 100             # schema recursion (self-referential named types)


# --- binary primitives ---

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    for i in range(_MAX_VARINT):
        if pos >= len(buf):
            raise ValueError("Avro: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
    raise ValueError("Avro: varint too long")


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    n, pos = _read_varint(buf, pos)
    return (n >> 1) ^ -(n & 1), pos  # zigzag


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _write_long(v: int) -> bytes:
    return _write_varint((v << 1) ^ (v >> 63))  # zigzag (python ints: v>>63
    # is 0 for v>=0 and -1 for v<0, exactly the spec's arithmetic)


def _take(buf: bytes, pos: int, n: int) -> tuple[bytes, int]:
    if n < 0 or pos + n > len(buf):
        raise ValueError("Avro: length overruns buffer")
    return buf[pos : pos + n], pos + n


# --- generic datum reader (schema-driven) ---

class _Types:
    """Named-type registry for one schema tree (records/enums/fixed can be
    referenced by name after definition)."""

    def __init__(self):
        self.by_name: dict[str, dict] = {}

    def register(self, schema: dict):
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            self.by_name[full] = schema
            self.by_name[name] = schema


def _read_datum(schema, buf: bytes, pos: int, types: _Types, depth: int = 0):
    if depth > _MAX_DEPTH:
        raise ValueError("Avro: schema recursion too deep")
    if isinstance(schema, str):
        t = schema
        if t in types.by_name:
            return _read_datum(types.by_name[t], buf, pos, types, depth + 1)
    elif isinstance(schema, list):  # union
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError(f"Avro: union index {idx} out of range")
        return _read_datum(schema[idx], buf, pos, types, depth + 1)
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed"):
            types.register(schema)

    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError("Avro: truncated boolean")
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        raw, pos = _take(buf, pos, 4)
        return struct.unpack("<f", raw)[0], pos
    if t == "double":
        raw, pos = _take(buf, pos, 8)
        return struct.unpack("<d", raw)[0], pos
    if t in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        raw, pos = _take(buf, pos, n)
        return (raw.decode("utf-8") if t == "string" else raw), pos
    if t == "fixed":
        return _take(buf, pos, int(schema["size"]))
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError("Avro: enum index out of range")
        return symbols[idx], pos
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte size prefix
                n = -n
                _, pos = _read_long(buf, pos)
            if not 0 < n <= _MAX_BLOCK_ITEMS:
                raise ValueError(f"Avro: hostile array block count {n}")
            start = pos
            for _ in range(n):
                v, pos = _read_datum(schema["items"], buf, pos, types, depth + 1)
                out.append(v)
            if pos == start and n > 1:
                raise ValueError("Avro: array block did not advance")
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            if not 0 < n <= _MAX_BLOCK_ITEMS:
                raise ValueError(f"Avro: hostile map block count {n}")
            for _ in range(n):
                k, pos = _read_datum("string", buf, pos, types, depth + 1)
                v, pos = _read_datum(schema["values"], buf, pos, types, depth + 1)
                out[k] = v
    if t == "record":
        rec = {}
        for field in schema["fields"]:
            rec[field["name"]], pos = _read_datum(
                field["type"], buf, pos, types, depth + 1
            )
        return rec, pos
    # nested {"type": <complex>} wrapper, e.g. {"type": {"type": "array", …}}
    if isinstance(t, (dict, list)):
        return _read_datum(t, buf, pos, types, depth + 1)
    raise ValueError(f"Avro: unsupported type {t!r}")


def read_container(buf: bytes) -> tuple[dict, list]:
    """Avro object-container bytes → (metadata dict, list of datum dicts).
    Schema comes from the embedded ``avro.schema``; codecs null/deflate."""
    if buf[:4] != MAGIC:
        raise ValueError("Avro: bad magic")
    pos = 4
    meta, pos = _read_datum(
        {"type": "map", "values": "bytes"}, buf, pos, _Types()
    )
    sync, pos = _take(buf, pos, 16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"Avro: unsupported codec {codec}")
    out = []
    while pos < len(buf):
        count, pos = _read_long(buf, pos)
        if not 0 <= count <= _MAX_BLOCK_ITEMS:
            raise ValueError(f"Avro: hostile block record count {count}")
        size, pos = _read_long(buf, pos)
        block, pos = _take(buf, pos, size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bpos = 0
        types = _Types()
        for _ in range(count):
            datum, bpos = _read_datum(schema, block, bpos, types)
            out.append(datum)
        marker, pos = _take(buf, pos, 16)
        if marker != sync:
            raise ValueError("Avro: sync marker mismatch")
    return {k: v for k, v in meta.items()}, out


# --- generic datum writer (fixture/manifest authoring) ---

def _write_datum(schema, value, types: _Types) -> bytes:
    if isinstance(schema, str):
        t = schema
        if t in types.by_name:
            return _write_datum(types.by_name[t], value, types)
    elif isinstance(schema, list):  # union: first branch whose type matches
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _write_long(i)
            if value is not None and bt != "null":
                return _write_long(i) + _write_datum(branch, value, types)
        raise ValueError("Avro: no union branch for value")
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed"):
            types.register(schema)

    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _write_long(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "bytes":
        return _write_long(len(value)) + bytes(value)
    if t == "string":
        raw = value.encode("utf-8")
        return _write_long(len(raw)) + raw
    if t == "fixed":
        if len(value) != int(schema["size"]):
            raise ValueError("Avro: fixed size mismatch")
        return bytes(value)
    if t == "enum":
        return _write_long(schema["symbols"].index(value))
    if t == "array":
        out = b""
        if value:
            out += _write_long(len(value))
            for v in value:
                out += _write_datum(schema["items"], v, types)
        return out + _write_long(0)
    if t == "map":
        out = b""
        if value:
            out += _write_long(len(value))
            for k, v in value.items():
                out += _write_datum("string", k, types)
                out += _write_datum(schema["values"], v, types)
        return out + _write_long(0)
    if t == "record":
        out = b""
        for field in schema["fields"]:
            if field["name"] in value:
                fv = value[field["name"]]
            elif "default" in field:
                fv = field["default"]
            else:
                raise ValueError(f"Avro: missing field {field['name']}")
            out += _write_datum(field["type"], fv, types)
        return out
    if isinstance(t, (dict, list)):
        return _write_datum(t, value, types)
    raise ValueError(f"Avro: unsupported type {t!r}")


def write_container(schema: dict, records: list, codec: str = "deflate") -> bytes:
    """Records → Avro object-container bytes (deterministic: fixed sync
    marker derived from the schema, so fixture files are byte-stable)."""
    import hashlib

    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode()).digest()
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    out = bytearray(MAGIC)
    out += _write_datum(
        {"type": "map", "values": "bytes"}, meta, _Types()
    )
    out += sync
    if records:
        types = _Types()
        block = b"".join(_write_datum(schema, r, types) for r in records)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            block = co.compress(block) + co.flush()
        elif codec != "null":
            raise ValueError(f"Avro: unsupported codec {codec}")
        out += _write_long(len(records))
        out += _write_long(len(block))
        out += block
        out += sync
    return bytes(out)
