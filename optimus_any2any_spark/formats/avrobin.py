"""Minimal Apache Avro object-container-file codec (stdlib only).

Iceberg's table metadata layer is Avro: manifest lists and manifests
are Avro object container files (Iceberg spec §Manifests). No Python
Avro library exists in this environment, so this implements the subset
of the Avro 1.11 specification those files use — binary encoding
(zigzag varints, length-prefixed strings/bytes, block-encoded arrays
and maps, unions, records, enums, fixed) and the object container
framing (magic ``Obj\\x01``, file-metadata map carrying
``avro.schema``/``avro.codec``, 16-byte sync markers, ``null`` and
``deflate`` codecs via zlib). Logical types are ignored (values pass
through as their underlying primitive), which is exactly what a
metadata reader wants.

The implementation is written from the public Avro specification
(avro.apache.org/docs/1.11.1/specification) — not ported from any
Avro library — and is cross-checked in tests against the JVM Avro
library that ships inside pyspark's jars (org.apache.avro 1.12, via
py4j): files written here are read back by ``DataFileReader`` and
compared record-by-record.

Scale note: Avro appears ONLY at metadata scale (manifest files, ~KBs
to low MBs); data files are parquet and read by Spark. Driver-side
decode of manifests mirrors where every Iceberg client starts; a
corpus-scale *data* path through this codec would be wrong and is not
offered.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# schema handling: parsed-JSON schemas with named-type resolution

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class _Names:
    """Registry of named types (record/enum/fixed) for re-references."""

    def __init__(self):
        self.types: dict[str, dict] = {}

    def define(self, schema: dict):
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            self.types[full] = schema
            self.types[name] = schema

    def resolve(self, ref: str) -> dict | str:
        if ref in _PRIMITIVES:
            return ref
        if ref in self.types:
            return self.types[ref]
        short = ref.rsplit(".", 1)[-1]
        if short in self.types:
            return self.types[short]
        raise ValueError(f"avro: unresolved named type {ref!r}")


# ---------------------------------------------------------------------------
# binary decode

class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise EOFError("avro: truncated input")
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.b[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_value(self, schema, names: _Names):
        if isinstance(schema, str):
            if schema in _PRIMITIVES:
                return self._read_primitive(schema)
            return self.read_value(names.resolve(schema), names)
        if isinstance(schema, list):  # union: long index then value
            idx = self.read_long()
            return self.read_value(schema[idx], names)
        t = schema["type"]
        if t in _PRIMITIVES:
            return self._read_primitive(t)
        if t == "record":
            names.define(schema)
            return {
                f["name"]: self.read_value(f["type"], names)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = self.read_long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.read_long()  # block byte-size: skippable hint
                for _ in range(n):
                    out.append(self.read_value(schema["items"], names))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.read_long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.read_long()
                for _ in range(n):
                    k = self._read_primitive("string")
                    out[k] = self.read_value(schema["values"], names)
            return out
        if t == "enum":
            names.define(schema)
            return schema["symbols"][self.read_long()]
        if t == "fixed":
            names.define(schema)
            return self.read(schema["size"])
        if isinstance(t, (dict, list)):  # nested inline type
            return self.read_value(t, names)
        return self.read_value(names.resolve(t), names)

    def _read_primitive(self, t: str):
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) != b"\x00"
        if t in ("int", "long"):
            return self.read_long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t in ("bytes", "string"):
            n = self.read_long()
            raw = self.read(n)
            return raw.decode() if t == "string" else raw
        raise ValueError(f"avro: unknown primitive {t}")


# ---------------------------------------------------------------------------
# binary encode

class _Writer:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes):
        self.out.write(b)

    def write_long(self, v: int):
        v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1) | 1
        while True:
            byte = v & 0x7F
            v >>= 7
            if v:
                self.out.write(bytes([byte | 0x80]))
            else:
                self.out.write(bytes([byte]))
                break

    def write_value(self, schema, value, names: _Names):
        if isinstance(schema, str):
            if schema in _PRIMITIVES:
                return self._write_primitive(schema, value)
            return self.write_value(names.resolve(schema), value, names)
        if isinstance(schema, list):  # union: pick first matching branch
            for i, branch in enumerate(schema):
                if self._matches(branch, value, names):
                    self.write_long(i)
                    return self.write_value(branch, value, names)
            raise ValueError(f"avro: no union branch for {value!r}")
        t = schema["type"]
        if t in _PRIMITIVES:
            return self._write_primitive(t, value)
        if t == "record":
            names.define(schema)
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    self.write_value(f["type"], f["default"], names)
                else:
                    self.write_value(f["type"], value[f["name"]], names)
            return
        if t == "array":
            if value:
                self.write_long(len(value))
                for item in value:
                    self.write_value(schema["items"], item, names)
            self.write_long(0)
            return
        if t == "map":
            if value:
                self.write_long(len(value))
                for k, v in value.items():
                    self._write_primitive("string", k)
                    self.write_value(schema["values"], v, names)
            self.write_long(0)
            return
        if t == "enum":
            names.define(schema)
            self.write_long(schema["symbols"].index(value))
            return
        if t == "fixed":
            names.define(schema)
            if len(value) != schema["size"]:
                raise ValueError("avro: fixed size mismatch")
            self.write(value)
            return
        if isinstance(t, (dict, list)):
            return self.write_value(t, value, names)
        return self.write_value(names.resolve(t), value, names)

    def _matches(self, schema, value, names: _Names) -> bool:
        s = schema if isinstance(schema, str) else schema.get("type")
        if s == "null":
            return value is None
        if value is None:
            return False
        if s == "boolean":
            return isinstance(value, bool)
        if s in ("int", "long"):
            return isinstance(value, int) and not isinstance(value, bool)
        if s in ("float", "double"):
            return isinstance(value, (int, float)) and not isinstance(
                value, bool
            )
        if s == "string":
            return isinstance(value, str)
        if s in ("bytes", "fixed"):
            return isinstance(value, bytes)
        if s == "record":
            return isinstance(value, dict)
        if s == "map":
            return isinstance(value, dict)
        if s == "array":
            return isinstance(value, list)
        if s == "enum":
            return isinstance(value, str)
        if isinstance(schema, str):  # named reference
            return self._matches(names.resolve(schema), value, names)
        return False

    def _write_primitive(self, t: str, value):
        if t == "null":
            return
        if t == "boolean":
            return self.write(b"\x01" if value else b"\x00")
        if t in ("int", "long"):
            return self.write_long(value)
        if t == "float":
            return self.write(struct.pack("<f", value))
        if t == "double":
            return self.write(struct.pack("<d", float(value)))
        if t == "string":
            raw = value.encode()
            self.write_long(len(raw))
            return self.write(raw)
        if t == "bytes":
            self.write_long(len(value))
            return self.write(value)
        raise ValueError(f"avro: unknown primitive {t}")


# ---------------------------------------------------------------------------
# object container files

def read_container(path: str) -> tuple[dict, list]:
    """Read an Avro object container file → (schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"avro: bad magic in {path}")
    meta_names = _Names()
    meta = r.read_value(
        {"type": "map", "values": "bytes"}, meta_names
    )
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r}")
    records = []
    names = _Names()
    while r.pos < len(r.b):
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        br = _Reader(block)
        for _ in range(count):
            records.append(br.read_value(schema, names))
        if r.read(16) != sync:
            raise ValueError(f"avro: sync marker mismatch in {path}")
    return schema, records


def write_container(
    path: str, schema: dict, records: list, codec: str = "deflate"
) -> None:
    """Write records as a single-block Avro object container file."""
    names = _Names()
    body = _Writer()
    for rec in records:
        body.write_value(schema, rec, names)
    block = body.out.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro: codec {codec!r}")
    sync = hashlib_sync(path)
    w = _Writer()
    w.write(MAGIC)
    w.write_value(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        },
        _Names(),
    )
    w.write(sync)
    w.write_long(len(records))
    w.write_long(len(block))
    w.write(block)
    w.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(w.out.getvalue())
    os.replace(tmp, path)


def hashlib_sync(seed: str) -> bytes:
    """Deterministic 16-byte sync marker (content-addressed, so a
    rewrite of the same path is byte-stable — useful for fixtures)."""
    import hashlib

    return hashlib.md5(seed.encode()).digest()
