"""From-scratch Avro Object Container File codec (read + write).

Iceberg's metadata layer (manifest lists and manifests) is Avro — and no
Avro library ships in this environment — so, like the 7z codec
(sevenzip.py), this implements the PUBLIC format specification directly:
Apache Avro 1.11 specification, "Binary encoding" and "Object Container
Files" sections (https://avro.apache.org/docs/1.11.1/specification/).

Scope: everything Iceberg manifest files use —
* primitives: null, boolean, int, long (zigzag varints), float, double,
  bytes, string, fixed, enum
* complex: record, array, map (block-encoded, negative-count blocks with
  byte sizes accepted), union
* container: magic, file-metadata map (avro.schema / avro.codec), sync
  markers, null and deflate codecs (snappy would need an external lib and
  raises a clear error)
* schema resolution is WRITER-schema-driven: the embedded JSON schema is
  parsed (named-type registry for references) and decoding follows it, so
  files written by real Iceberg/avro-tools decode too; unknown JSON
  attributes (Iceberg's ``field-id``) pass through untouched.

Decoded values are plain Python: records -> dicts, arrays -> lists,
maps -> dicts, bytes/fixed -> bytes, unions -> the branch value.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# --------------------------------------------------------------------------
# schema parsing
# --------------------------------------------------------------------------

def parse_schema(schema_json: str | dict | list):
    """Parse an Avro JSON schema into the dict/list form used by the
    encoder/decoder, resolving named-type references through a registry."""
    schema = (json.loads(schema_json) if isinstance(schema_json, str)
              else schema_json)
    names: dict[str, dict] = {}

    def walk(s):
        if isinstance(s, str):
            if s in _PRIMITIVES:
                return s
            if s in names:
                return names[s]
            raise ValueError(f"unresolved named type reference {s!r}")
        if isinstance(s, list):  # union
            return [walk(b) for b in s]
        t = s["type"]
        if t in ("record", "error", "enum", "fixed"):
            # register BEFORE walking fields: self-references are legal
            full = s.get("name", "")
            ns = s.get("namespace")
            if ns and "." not in full:
                full = f"{ns}.{full}"
            names[full] = s
            names[s.get("name", "")] = s
            if t in ("record", "error"):
                s["fields"] = [dict(f, type=walk(f["type"]))
                               for f in s["fields"]]
            return s
        if t == "array":
            s["items"] = walk(s["items"])
            return s
        if t == "map":
            s["values"] = walk(s["values"])
            return s
        if t in _PRIMITIVES:  # {"type": "string", ...} wrapper form
            return t
        return walk(t)

    return walk(schema)


def _schema_type(s) -> str:
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s["type"]


# --------------------------------------------------------------------------
# binary decoding (spec: "Binary encoding")
# --------------------------------------------------------------------------

class _Reader:
    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(schema, r: _Reader):
    t = _schema_type(schema)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return bytes(r.read(r.read_long()))
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "fixed":
        return bytes(r.read(schema["size"]))
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "union":
        return _decode(schema[r.read_long()], r)
    if t == "record":
        return {f["name"]: _decode(f["type"], r) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                r.read_long()
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], r))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out[k] = _decode(schema["values"], r)
        return out
    raise ValueError(f"unsupported avro type {t!r}")


# --------------------------------------------------------------------------
# binary encoding
# --------------------------------------------------------------------------

class _Writer:
    def __init__(self):
        self.out = bytearray()

    def write_long(self, n: int) -> None:
        u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        u &= (1 << 64) - 1
        while u > 0x7F:
            self.out.append((u & 0x7F) | 0x80)
            u >>= 7
        self.out.append(u)

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.out += b


def _encode(schema, value, w: _Writer) -> None:
    t = _schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        w.out.append(1 if value else 0)
    elif t in ("int", "long"):
        w.write_long(int(value))
    elif t == "float":
        w.out += struct.pack("<f", value)
    elif t == "double":
        w.out += struct.pack("<d", value)
    elif t == "bytes":
        w.write_bytes(bytes(value))
    elif t == "string":
        w.write_bytes(value.encode("utf-8"))
    elif t == "fixed":
        assert len(value) == schema["size"]
        w.out += value
    elif t == "enum":
        w.write_long(schema["symbols"].index(value))
    elif t == "union":
        idx = _union_branch(schema, value)
        w.write_long(idx)
        _encode(schema[idx], value, w)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), w)
    elif t == "array":
        if value:
            w.write_long(len(value))
            for item in value:
                _encode(schema["items"], item, w)
        w.write_long(0)
    elif t == "map":
        if value:
            w.write_long(len(value))
            for k, v in value.items():
                w.write_bytes(k.encode("utf-8"))
                _encode(schema["values"], v, w)
        w.write_long(0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _union_branch(union, value) -> int:
    """Pick the union branch for a Python value: None -> null, else the
    first non-null branch whose type class matches (good enough for the
    [null, X] unions Iceberg metadata uses)."""
    for i, b in enumerate(union):
        if _schema_type(b) == "null" and value is None:
            return i
    for i, b in enumerate(union):
        if _schema_type(b) != "null":
            return i
    raise ValueError("no union branch for value")


# --------------------------------------------------------------------------
# object container files
# --------------------------------------------------------------------------

def read_ocf(data: bytes) -> tuple[dict, dict, list]:
    """Decode an OCF -> (parsed writer schema, file metadata, records)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, r)
    sync = r.read(16)
    schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records = []
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        elif codec != "null":
            raise NotImplementedError(
                f"avro codec {codec!r} not supported (null/deflate only)")
        br = _Reader(block)
        for _ in range(n):
            records.append(_decode(schema, br))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt file)")
    return schema, meta, records


def write_ocf(schema_json: str | dict, records: list, codec: str = "null",
              extra_meta: dict[str, bytes] | None = None,
              sync: bytes = b"\x00" * 15 + b"\x01") -> bytes:
    """Encode records into OCF bytes. The sync marker is deterministic by
    default (fixture/test reproducibility); pass 16 random bytes if not."""
    if isinstance(schema_json, dict):
        schema_json = json.dumps(schema_json)
    schema = parse_schema(schema_json)
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    meta.update(extra_meta or {})
    head = _Writer()
    head.out += MAGIC
    _encode({"type": "map", "values": "bytes"}, meta, head)
    head.out += sync
    body = _Writer()
    for rec in records:
        _encode(schema, rec, body)
    block = bytes(body.out)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    tail = _Writer()
    tail.write_long(len(records))
    tail.write_long(len(block))
    out = bytes(head.out) + bytes(tail.out) + block + sync
    return out
