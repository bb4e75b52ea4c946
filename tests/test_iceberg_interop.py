"""Interop proof for the from-scratch Iceberg v1 metadata layer
(round-3 verdict ask): no Iceberg runtime or Avro library exists in this
environment, so both directions are closed with an INDEPENDENT minimal
Avro OCF codec implemented here in the test, straight from the Avro 1.11
spec (varint/zigzag, header metadata map, sync-marked blocks) — sharing
no code with sources/avro_ocf.py:

* READ interop  — a 'foreign' table is hand-built the way another writer
  would lay it down (real-Iceberg-style file names, deflate-compressed
  manifests, extra optional data_file fields, a different sync marker);
  read_iceberg must resolve and scan it correctly.
* WRITE interop — a table committed by write_iceberg is verified with
  the independent decoder against the spec's layout expectations:
  version hint, metadata json required fields, manifest-list entries
  (lengths matching the real files), manifest entries whose field-ids
  and record counts match the parquet data on disk.
"""

import json
import struct
import uuid
import zlib
from pathlib import Path

import pyspark.sql.functions as F
import pytest


def _local(p):
    """FsPath stringifies local paths as file:/... URIs; plain pathlib
    wants the bare path."""
    return Path(p[5:] if str(p).startswith("file:") else p)

# --------------------------------------------------------------------------
# independent minimal Avro OCF codec (test-local, spec-derived)
# --------------------------------------------------------------------------


class _R:
    def __init__(self, b):
        self.b, self.i = b, 0

    def read(self, n):
        out = self.b[self.i:self.i + n]
        assert len(out) == n, "truncated"
        self.i += n
        return out

    def vlong(self):
        shift = res = 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            res |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (res >> 1) ^ -(res & 1)  # zigzag


def _vlong(n):
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec(r, schema):
    if isinstance(schema, list):  # union
        return _dec(r, schema[r.vlong()])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _dec(r, f["type"]) for f in schema["fields"]}
        if t == "map":
            out = {}
            while True:
                n = r.vlong()
                if n == 0:
                    return out
                if n < 0:
                    r.vlong()
                    n = -n
                for _ in range(n):
                    k = r.read(r.vlong()).decode()
                    out[k] = _dec(r, schema["values"])
        if t == "array":
            out = []
            while True:
                n = r.vlong()
                if n == 0:
                    return out
                if n < 0:
                    r.vlong()
                    n = -n
                out.extend(_dec(r, schema["items"]) for _ in range(n))
        if t == "fixed":
            return r.read(schema["size"])
        if t == "enum":
            return schema["symbols"][r.vlong()]
        return _dec(r, t)  # {"type": "string"} style wrapper
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) == b"\x01"
    if schema in ("int", "long"):
        return r.vlong()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.read(r.vlong())
    if schema == "string":
        return r.read(r.vlong()).decode()
    raise AssertionError(f"schema {schema!r}")


def _enc(schema, v):
    if isinstance(schema, list):
        for i, s in enumerate(schema):
            if (v is None) == (s == "null"):
                return _vlong(i) + _enc(s, v)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return b"".join(_enc(f["type"], v[f["name"]])
                            for f in schema["fields"])
        if t == "map":
            out = b""
            if v:
                out += _vlong(len(v))
                for k, mv in v.items():
                    out += _enc("string", k) + _enc(schema["values"], mv)
            return out + _vlong(0)
        raise AssertionError(f"enc {t}")
    if schema == "null":
        return b""
    if schema in ("int", "long"):
        return _vlong(v)
    if schema == "string":
        b = v.encode()
        return _vlong(len(b)) + b
    if schema == "bytes":
        return _vlong(len(v)) + v
    raise AssertionError(f"enc {schema!r}")


def read_ocf_indep(blob):
    r = _R(blob)
    assert r.read(4) == b"Obj\x01", "bad magic"
    meta = {}
    while True:
        n = r.vlong()
        if n == 0:
            break
        if n < 0:
            r.vlong()
            n = -n
        for _ in range(n):
            k = r.read(r.vlong()).decode()
            meta[k] = r.read(r.vlong())
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    records = []
    while r.i < len(blob):
        cnt = r.vlong()
        payload = r.read(r.vlong())
        if codec == b"deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != b"null":
            raise AssertionError(f"codec {codec!r}")
        rr = _R(payload)
        for _ in range(cnt):
            records.append(_dec(rr, schema))
        assert r.read(16) == sync, "sync mismatch"
    return meta, records


def write_ocf_indep(schema, records, codec=b"deflate",
                    sync=b"interop-sync-mk!"):
    body = b"".join(_enc(schema, rec) for rec in records)
    if codec == b"deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = co.compress(body) + co.flush()
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec}
    return (b"Obj\x01" + _enc({"type": "map", "values": "bytes"}, meta)
            + sync + _vlong(len(records)) + _vlong(len(body)) + body + sync)


# --------------------------------------------------------------------------
# the foreign table fixture (what another v1 writer would lay down)
# --------------------------------------------------------------------------

# real writers include optional data_file stats columns our reader must
# skip gracefully (schema-driven decode) — column_sizes exercises the
# null-union map shape
_FOREIGN_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None,
         "field-id": 1},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
                {"name": "block_size_in_bytes", "type": "long",
                 "field-id": 105},
                {"name": "column_sizes", "field-id": 108,
                 "default": None, "type": ["null", {
                     "type": "map", "values": "long"}]},
            ]}},
    ]}

_FOREIGN_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 503},
    ]}


class TestReadForeignTable:
    def test_read_iceberg_resolves_foreign_layout(self, spark, tmp_path):
        from geocode_spark.sources import iceberg as ib
        from geocode_spark.sources.loaders import read_pages

        table = tmp_path / "foreign_tbl"
        meta_dir = table / "metadata"
        data_dir = table / "data"
        meta_dir.mkdir(parents=True)
        data_dir.mkdir()

        df = spark.range(25).select(
            F.concat(F.lit("https://x/"), F.col("id")).alias("url"),
            F.lit("2024-01-01T00:00:00").cast("timestamp").alias("warc_ts"),
            F.col("id").cast("string").cast("binary").alias("html"),
            F.concat(F.lit("text "), F.col("id")).alias("text"),
            F.lit("en").alias("lang"))
        df.coalesce(1).write.mode("overwrite").parquet(str(data_dir / "p0"))
        pq = sorted((data_dir / "p0").glob("*.parquet"))[0]

        snap_id = 4738193840017075723  # realistic random 63-bit id
        commit_uuid = "7c9a2f0e-1d44-4b7e-a111-deadbeef0001"
        manifest_name = f"{commit_uuid}-m0.avro"
        manifest = write_ocf_indep(_FOREIGN_ENTRY_SCHEMA, [{
            "status": 1, "snapshot_id": snap_id,
            "data_file": {
                "file_path": str(pq), "file_format": "PARQUET",
                "partition": {}, "record_count": 25,
                "file_size_in_bytes": pq.stat().st_size,
                "block_size_in_bytes": 67108864,
                "column_sizes": {"1": 100, "2": 200},
            }}])
        (meta_dir / manifest_name).write_bytes(manifest)

        mlist_name = f"snap-{snap_id}-1-{commit_uuid}.avro"
        (meta_dir / mlist_name).write_bytes(write_ocf_indep(
            _FOREIGN_LIST_SCHEMA, [{
                "manifest_path": str(meta_dir / manifest_name),
                "manifest_length": len(manifest),
                "partition_spec_id": 0,
                "added_snapshot_id": snap_id,
            }]))

        md = {
            "format-version": 1,
            "table-uuid": str(uuid.uuid4()),
            "location": str(table),
            "last-updated-ms": 1700000000000,
            "last-column-id": 5,
            "schema": {"type": "struct", "schema-id": 0, "fields": []},
            "partition-spec": [],
            "default-spec-id": 0,
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": snap_id,
            "snapshots": [{
                "snapshot-id": snap_id,
                "timestamp-ms": 1700000000000,
                "manifest-list": str(meta_dir / mlist_name),
                "summary": {"operation": "append"},
            }],
        }
        (meta_dir / "v1.metadata.json").write_text(json.dumps(md))
        (meta_dir / "version-hint.text").write_text("1")

        assert ib.is_iceberg_table(spark, str(table))
        assert ib.current_snapshot_id(spark, str(table)) == snap_id
        out = ib.read_iceberg(spark, str(table))
        assert out.count() == 25
        assert set(out.columns) == {"url", "warc_ts", "html", "text", "lang"}
        # the S11 entry point resolves it too (no runtime installed ->
        # metadata-layer path), including the snapshot pin
        assert read_pages(spark, str(table),
                          snapshot_id=snap_id).count() == 25
        with pytest.raises(Exception, match="not found"):
            ib.read_iceberg(spark, str(table), snapshot_id=123)


class TestWrittenTableIndependentlyVerified:
    def test_layout_matches_spec_expectations(self, spark, tmp_path):
        import pyarrow.parquet as paq

        from geocode_spark.sources import iceberg as ib

        table = tmp_path / "ours"
        df1 = spark.range(30).select(F.col("id"),
                                     (F.col("id") * 2).alias("v"))
        df2 = spark.range(12).select(F.col("id"),
                                     (F.col("id") * 3).alias("v"))
        s1 = ib.write_iceberg(spark, df1, str(table))
        s2 = ib.write_iceberg(spark, df2, str(table), mode="append")

        meta_dir = Path(table) / "metadata"
        version = int((meta_dir / "version-hint.text").read_text())
        md = json.loads(
            (meta_dir / f"v{version}.metadata.json").read_text())
        for req in ("format-version", "table-uuid", "location",
                    "last-updated-ms", "last-column-id", "schema",
                    "partition-spec", "current-snapshot-id", "snapshots"):
            assert req in md, f"metadata missing required field {req}"
        assert md["format-version"] == 1
        snap = next(s for s in md["snapshots"]
                    if s["snapshot-id"] == md["current-snapshot-id"])
        assert snap["snapshot-id"] == s2 and s1 != s2

        mlist_path = _local(snap["manifest-list"])
        lmeta, lists = read_ocf_indep(mlist_path.read_bytes())
        assert len(lists) == 2  # append carried the s1 manifest forward
        total = 0
        for mf in lists:
            mpath = _local(mf["manifest_path"])
            blob = mpath.read_bytes()
            # spec: manifest_length must be the real file length
            assert mf["manifest_length"] == len(blob)
            mmeta, entries = read_ocf_indep(blob)
            # spec: manifests carry the iceberg schema + spec in metadata,
            # and every avro field carries its field-id
            emb = json.loads(mmeta["avro.schema"])
            ids = [f.get("field-id") for f in emb["fields"]]
            assert ids == [0, 1, 2]
            assert "schema" in mmeta and "partition-spec-id" in mmeta
            for e in entries:
                assert e["status"] in (0, 1, 2)
                dfile = e["data_file"]
                p = _local(dfile["file_path"])
                assert p.exists()
                assert dfile["file_size_in_bytes"] == p.stat().st_size
                assert (paq.ParquetFile(p).metadata.num_rows
                        == dfile["record_count"])
                total += dfile["record_count"]
        assert total == 42  # both snapshots' files live under append
        # time travel through OUR reader agrees with the independent walk
        assert ib.read_iceberg(spark, str(table), s1).count() == 30
        assert ib.read_iceberg(spark, str(table)).count() == 42
