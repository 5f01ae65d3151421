"""Apache AVRO object-container codec — from scratch, stdlib-only.

Iceberg's table metadata layer is Avro (manifest lists and manifest
files are Avro object-container files per the PUBLIC Iceberg spec),
and this container ships no Avro library (no spark-avro JAR, no
fastavro) — so, exactly like the RoaringBitmapArray and PDF Flate
codecs before it (sources/roaring.py, etl/pdf.py), the format is
implemented from its public specification (Apache Avro 1.11 spec,
"Object Container Files" + "Binary Encoding"):

- container: magic ``Obj\\x01``, file-metadata map (``avro.schema``
  JSON, ``avro.codec``), 16-byte sync marker; then blocks of
  ``(row count varint, byte size varint, payload, sync)``; codecs
  ``null`` and ``deflate`` (raw zlib, no header, per spec).
- binary encoding: zigzag varints for int/long, little-endian IEEE
  float/double, length-prefixed bytes/strings, index-prefixed unions,
  records as field concatenation, arrays/maps as blocks terminated by
  a zero count (negative block counts carry a byte size to skip —
  produced by some writers, handled here), enums as int indexes,
  fixed as raw bytes.

The ENCODER exists for the same reason tests/test_roaring.py hand-
writes bitmap bytes: no library can synthesize fixtures here, so
round-trip fidelity is pinned by encoding what the decoder reads —
plus known-answer byte vectors for the primitives in
tests/test_avro.py. Both sides are schema-driven (the writer schema
embedded in the container is what the decoder follows), which is all
Iceberg needs: readers always decode manifests with the file's own
embedded schema.

Scale note: Avro here is METADATA-plane only (manifest lists and
manifests are KB-to-MB); data files are parquet and always scan
through Spark. Decoding runs driver-side like Delta log replay.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# --- binary primitives -------------------------------------------------------


def _read_varint(buf: io.BytesIO) -> int:
    """Unsigned base-128 varint."""
    shift = 0
    out = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated Avro varint")
        v = b[0]
        out |= (v & 0x7F) << shift
        if not v & 0x80:
            return out
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint too long")


def _read_long(buf: io.BytesIO) -> int:
    n = _read_varint(buf)
    return (n >> 1) ^ -(n & 1)  # zigzag


def _write_long(out: bytearray, v: int) -> None:
    n = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    n &= (1 << 70) - 1  # python ints: bound the loop
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError("negative Avro bytes length")
    data = buf.read(n)
    if len(data) != n:
        raise ValueError("truncated Avro bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out += data


# --- schema-driven decode ----------------------------------------------------


def _decode(schema, buf: io.BytesIO, names: dict):
    """Decode ONE value of ``schema`` (parsed JSON: str, list = union,
    or dict) from ``buf``. ``names`` resolves named-type references
    (record/enum/fixed seen earlier in the schema)."""
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _decode(names[t], buf, names)
        if t == "null":
            return None
        if t == "boolean":
            b = buf.read(1)
            if not b:
                raise ValueError("truncated Avro boolean")
            return b[0] != 0
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unknown Avro type {t!r}")
    if isinstance(schema, list):  # union: zigzag index prefix
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"Avro union index {idx} out of range")
        return _decode(schema[idx], buf, names)
    t = schema["type"]
    if t in ("record", "error"):
        if schema.get("name"):
            names[schema["name"]] = schema
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(f["type"], buf, names)
        return out
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)  # size in bytes (skippable; we decode)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
    if t == "enum":
        if schema.get("name"):
            names[schema["name"]] = schema
        idx = _read_long(buf)
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError(f"Avro enum index {idx} out of range")
        return symbols[idx]
    if t == "fixed":
        if schema.get("name"):
            names[schema["name"]] = schema
        data = buf.read(schema["size"])
        if len(data) != schema["size"]:
            raise ValueError("truncated Avro fixed")
        return data
    if isinstance(t, (dict, list)):
        return _decode(t, buf, names)  # {"type": {...}} nesting
    return _decode(t, buf, names)  # {"type": "long", ...} annotations


def _preregister(schema, names: dict) -> None:
    """Walk a schema registering named types, so forward references in
    sibling fields resolve."""
    if isinstance(schema, list):
        for s in schema:
            _preregister(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "error") and schema.get("name"):
        names[schema["name"]] = schema
        for f in schema.get("fields", ()):
            _preregister(f.get("type"), names)
    elif t in ("enum", "fixed") and schema.get("name"):
        names[schema["name"]] = schema
    elif t == "array":
        _preregister(schema.get("items"), names)
    elif t == "map":
        _preregister(schema.get("values"), names)
    elif isinstance(t, (dict, list)):
        _preregister(t, names)


# --- schema-driven encode (fixture synthesis + tests) ------------------------


def _encode(schema, value, out: bytearray, names: dict) -> None:
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _encode(names[t], value, out, names)
        if t == "null":
            if value is not None:
                raise ValueError("null schema with non-null value")
            return
        if t == "boolean":
            out.append(1 if value else 0)
            return
        if t in ("int", "long"):
            _write_long(out, int(value))
            return
        if t == "float":
            out += struct.pack("<f", float(value))
            return
        if t == "double":
            out += struct.pack("<d", float(value))
            return
        if t == "bytes":
            _write_bytes(out, bytes(value))
            return
        if t == "string":
            _write_bytes(out, value.encode("utf-8"))
            return
        raise ValueError(f"unknown Avro type {t!r}")
    if isinstance(schema, list):
        # union: pick the first branch that accepts the value's kind
        for i, branch in enumerate(schema):
            if _accepts(branch, value, names):
                _write_long(out, i)
                _encode(branch, value, out, names)
                return
        raise ValueError(f"no union branch accepts {value!r}")
    t = schema["type"]
    if t in ("record", "error"):
        if schema.get("name"):
            names[schema["name"]] = schema
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                _encode(f["type"], f["default"], out, names)
            else:
                _encode(f["type"], value[f["name"]], out, names)
        return
    if t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, names)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(value))
        return
    if t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += bytes(value)
        return
    return _encode(t, value, out, names)


def _accepts(schema, value, names: dict) -> bool:
    t = schema if isinstance(schema, str) else schema.get("type")
    if t in names and isinstance(names[t], dict):
        t = names[t].get("type", t)
    if value is None:
        return t == "null"
    if t == "null":
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("record", "error", "map"):
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "enum":
        return isinstance(value, str)
    return False


# --- container files ---------------------------------------------------------


def read_avro_file(data: bytes) -> tuple[dict | list | str, list]:
    """Decode an Avro object-container file: returns (writer schema
    JSON, [records]). Codecs: null, deflate (raw zlib per spec). The
    sync marker is verified per block (a torn/corrupt container fails
    loudly rather than yielding partial rows)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object-container file (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("truncated Avro header (sync marker)")
    names: dict = {}
    _preregister(schema, names)
    records: list = []
    while True:
        head = buf.read(1)
        if not head:
            return schema, records
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise ValueError("truncated Avro block")
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        block = io.BytesIO(payload)
        for _ in range(n):
            records.append(_decode(schema, block, names))
        if buf.read(16) != sync:
            raise ValueError("Avro block sync mismatch (torn container)")


def write_avro_file(
    schema: dict | list | str, records: list, codec: str = "deflate"
) -> bytes:
    """Encode records as an Avro object-container file (one block).
    The synthesis half for tests and Iceberg fixture construction —
    what the spec-only decoder round-trips against."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    names: dict = {}
    _preregister(schema, names)
    body = bytearray()
    for r in records:
        _encode(schema, r, body, names)
    payload = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        payload = comp.compress(payload) + comp.flush()
    import hashlib

    sync = hashlib.md5(json.dumps(schema, sort_keys=True).encode()).digest()
    out = bytearray()
    out += MAGIC
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _encode({"type": "map", "values": "bytes"}, meta, out, {})
    out += sync
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out += payload
    out += sync
    return bytes(out)
