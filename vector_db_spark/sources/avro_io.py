"""Minimal pure-Python Apache Avro Object Container File codec.

Implements the PUBLIC Avro 1.x specification
(https://avro.apache.org/docs/current/specification/) from scratch —
the container ships no avro/fastavro package, and Iceberg's metadata
tier (manifest lists + manifests) is Avro, so the Iceberg reader
(sources/iceberg.py) needs exactly this: a schema-driven binary
decoder for the object container format, plus a small writer for
fixtures/round-trips.

Scope (complete for the metadata-file use case, documented):
- container format: magic ``Obj\\x01``, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, data
  blocks of ``(count, size, payload, sync)``;
- codecs ``null`` and ``deflate`` (raw zlib, the two the spec
  requires/recommends);
- full core type system: null/boolean/int/long/float/double/bytes/
  string, record, enum, array, map, union, fixed, named-type
  references and recursive schemas; logical types decode as their
  underlying type (Iceberg's readers do their own logical mapping);
- negative block counts (size-prefixed blocks) per the spec.

This is a metadata-tier codec: files are kilobytes-to-megabytes of
driver-side manifest rows, never the data path — data files stay
parquet and are scanned by Spark.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ------------------------------------------------------------------ decode


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self._b = buf
        self._pos = 0

    def read(self, n: int) -> bytes:
        if self._pos + n > len(self._b):
            raise EOFError("truncated Avro data")
        out = self._b[self._pos : self._pos + n]
        self._pos += n
        return out

    def at_end(self) -> bool:
        return self._pos >= len(self._b)

    def long(self) -> int:
        # zigzag varint
        shift, acc = 0, 0
        while True:
            (byte,) = self.read(1)
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _resolve(schema, names: dict):
    """Follow a named-type reference; register named types on the way."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _register(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if name:
        ns = schema.get("namespace")
        names[name] = schema
        if ns:
            names[f"{ns}.{name}"] = schema


def _decode(schema, r: _Reader, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: long index picks the branch
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _decode(schema[idx], r, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _register(schema, names)
            return {
                f["name"]: _decode(f["type"], r, names)
                for f in schema["fields"]
            }
        if t == "enum":
            _register(schema, names)
            return schema["symbols"][r.long()]
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:  # size-prefixed block
                    r.long()
                    n = -n
                for _ in range(n):
                    out.append(_decode(schema["items"], r, names))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    r.long()
                    n = -n
                for _ in range(n):
                    k = r.string()  # key MUST be read before the value
                    out[k] = _decode(schema["values"], r, names)
            return out
        if t == "fixed":
            _register(schema, names)
            return r.read(schema["size"])
        # {"type": "long", "logicalType": ...} etc. — underlying type
        return _decode(t, r, names)
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) != b"\x00"
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.bytes_()
    if schema == "string":
        return r.string()
    raise NotImplementedError(f"Avro type {schema!r}")


def read_avro(path: str) -> tuple[dict | list | str, list]:
    """Read an Avro object container file → (writer schema, records)."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    if r.read(4) != _MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.string()  # key MUST be read before the value
            meta[k] = r.bytes_()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} (null/deflate implemented)")
    sync = r.read(16)
    records: list = []
    names: dict = {}
    while not r.at_end():
        count = r.long()
        size = r.long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(schema, br, names))
        if r.read(16) != sync:
            raise ValueError(f"Avro sync marker mismatch in {path}")
    return schema, records


# ------------------------------------------------------------------ encode


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema, value, out: io.BytesIO, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value, names):
                out.write(_zigzag(i))
                _encode(branch, value, out, names)
                return
        raise ValueError(f"no union branch of {schema} matches {value!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _register(schema, names)
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    _encode(f["type"], f["default"], out, names)
                else:
                    _encode(f["type"], value[f["name"]], out, names)
            return
        if t == "enum":
            _register(schema, names)
            out.write(_zigzag(schema["symbols"].index(value)))
            return
        if t == "array":
            if value:
                out.write(_zigzag(len(value)))
                for v in value:
                    _encode(schema["items"], v, out, names)
            out.write(_zigzag(0))
            return
        if t == "map":
            if value:
                out.write(_zigzag(len(value)))
                for k, v in value.items():
                    _encode("string", k, out, names)
                    _encode(schema["values"], v, out, names)
            out.write(_zigzag(0))
            return
        if t == "fixed":
            _register(schema, names)
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            out.write(value)
            return
        _encode(t, value, out, names)
        return
    if schema == "null":
        if value is not None:
            raise ValueError("non-null value for null type")
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        out.write(_zigzag(int(value)))
        return
    if schema == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if schema == "bytes":
        out.write(_zigzag(len(value)))
        out.write(bytes(value))
        return
    if schema == "string":
        enc = value.encode("utf-8")
        out.write(_zigzag(len(enc)))
        out.write(enc)
        return
    raise NotImplementedError(f"Avro type {schema!r}")


def _matches(branch, value, names: dict) -> bool:
    branch = _resolve(branch, names)
    if isinstance(branch, dict):
        t = branch["type"]
        if t in ("record", "map"):
            return isinstance(value, dict)
        if t == "array":
            return isinstance(value, (list, tuple))
        if t == "enum":
            return isinstance(value, str)
        if t == "fixed":
            return isinstance(value, (bytes, bytearray))
        branch = t
    if branch == "null":
        return value is None
    if branch == "boolean":
        return isinstance(value, bool)
    if branch in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if branch in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if branch == "bytes":
        return isinstance(value, (bytes, bytearray))
    if branch == "string":
        return isinstance(value, str)
    return False


def write_avro(
    path: str,
    schema: dict | list | str,
    records: list,
    codec: str = "null",
    sync: bytes | None = None,
) -> None:
    """Write records as a single-block Avro object container file.
    Metadata-tier writer (fixtures / the Iceberg table writer): one
    block is plenty for manifest-sized data; the deterministic default
    sync marker keeps fixture bytes stable across runs."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r}")
    sync = sync if sync is not None else bytes(range(16))
    body = io.BytesIO()
    names: dict = {}
    for rec in records:
        _encode(schema, rec, body, names)
    payload = body.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = c.compress(payload) + c.flush()
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        _encode("string", k, out, {})
        out.write(_zigzag(len(v)))
        out.write(v)
    out.write(_zigzag(0))
    out.write(sync)
    if records:
        out.write(_zigzag(len(records)))
        out.write(_zigzag(len(payload)))
        out.write(payload)
        out.write(sync)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
