"""Iceberg v2 snapshot export — the second interoperable format.

Moonlink commits REAL Iceberg metadata on every sync
(``/root/reference/src/moonlink/src/storage/iceberg/
iceberg_table_syncer.rs:563-595``: manifests, manifest list, snapshot
JSON, version hint). This module exports any committed snapshot as an
Iceberg v2 table alongside the Delta export (``export.py``):

- data files come from the same materialization seam as the Delta
  export (``export._materialize``: clean fragments HARDLINK in
  O(metadata), DV'd / span / pre-ALTER fragments rewrite their live
  rows fragment-parallel);
- ``metadata/v1.metadata.json`` + ``metadata/version-hint.text``
  (file-catalog layout, the reference's ``file_catalog.rs`` analog);
- manifest + manifest list are hand-encoded Avro Object Container
  Files (the ``avro``/``fastavro`` wheels are not in this environment)
  written from the PUBLIC specs alone: Avro 1.11 OCF framing (magic,
  metadata map, sync-marker-delimited blocks, zigzag-varint longs) and
  the Iceberg v2 table spec's manifest / manifest-list schemas with
  their reserved field ids (500-517 for manifest_file, 100-104/134 for
  data_file) so an id-based Iceberg reader projects them correctly.

Scale: one manifest per ``_MANIFEST_SHARD`` data files (the spec's
many-manifests layout) keeps both the write and any reader's planning
parallel at 10^12-image file counts; everything rides Ray tasks via
``_materialize``; the driver holds O(files) names only for the
manifests it writes (sharded, bounded per write).

Verification: ``tests/test_iceberg.py`` decodes the Avro with an
INDEPENDENT schema-driven decoder (written against the Avro spec, not
this encoder), replans the table from the metadata tree alone, and
DuckDB-reads the planned file list to match the merge oracle.
"""

from __future__ import annotations

import io
import json
import os
import time
import uuid

from .fs import for_root

_MANIFEST_SHARD = 10_000   # data files per manifest avro


# ----------------------------------------------------------- Avro binary

def _zigzag(n: int) -> bytes:
    """Avro long: zigzag then little-endian base-128 varint."""
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_encode(value, schema, buf: io.BytesIO) -> None:
    """Encode ``value`` per the (parsed-JSON) Avro ``schema``. Supports
    the subset Iceberg metadata needs: record, [null, T] unions,
    int/long/string/bytes/boolean, array, map<string>."""
    if isinstance(schema, list):                       # union
        if value is None:
            buf.write(_zigzag(schema.index("null")))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        buf.write(_zigzag(idx))
        _avro_encode(value, schema[idx], buf)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        for f in schema["fields"]:
            _avro_encode(value.get(f["name"]), f["type"], buf)
    elif t in ("long", "int"):
        buf.write(_zigzag(int(value)))
    elif t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t == "string":
        raw = value.encode("utf-8")
        buf.write(_zigzag(len(raw)) + raw)
    elif t == "bytes":
        buf.write(_zigzag(len(value)) + bytes(value))
    elif t == "array":
        if value:
            buf.write(_zigzag(len(value)))
            for v in value:
                _avro_encode(v, schema["items"], buf)
        buf.write(_zigzag(0))
    elif t == "map":
        if value:
            buf.write(_zigzag(len(value)))
            for k, v in value.items():
                raw = k.encode("utf-8")
                buf.write(_zigzag(len(raw)) + raw)
                _avro_encode(v, schema["values"], buf)
        buf.write(_zigzag(0))
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def write_avro_ocf(schema: dict, records: list[dict],
                   metadata: dict[str, str]) -> bytes:
    """One Avro Object Container File (spec 1.11 framing): magic,
    file-metadata map (avro.schema + caller keys), 16-byte sync marker,
    then one block of ``records``."""
    sync = uuid.uuid5(uuid.NAMESPACE_OID,
                      json.dumps(metadata, sort_keys=True)).bytes
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null",
            **metadata}
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    buf.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb, vb = k.encode(), v.encode()
        buf.write(_zigzag(len(kb)) + kb + _zigzag(len(vb)) + vb)
    buf.write(_zigzag(0))
    buf.write(sync)
    block = io.BytesIO()
    for r in records:
        _avro_encode(r, schema, block)
    data = block.getvalue()
    buf.write(_zigzag(len(records)) + _zigzag(len(data)) + data + sync)
    return buf.getvalue()


# ------------------------------------------------- Iceberg v2 schemas

def _f(fid: int, name: str, ftype, required=True):
    d = {"name": name, "type": ftype if required else ["null", ftype],
         "field-id": fid}
    if not required:
        d["default"] = None
    return d


_PARTITION_RECORD = {"type": "record", "name": "r102", "fields": []}

DATA_FILE_SCHEMA = {
    "type": "record", "name": "r2", "fields": [
        _f(134, "content", "int"),
        _f(100, "file_path", "string"),
        _f(101, "file_format", "string"),
        _f(102, "partition", _PARTITION_RECORD),
        _f(103, "record_count", "long"),
        _f(104, "file_size_in_bytes", "long"),
    ]}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        _f(0, "status", "int"),
        _f(1, "snapshot_id", "long", required=False),
        _f(3, "sequence_number", "long", required=False),
        _f(4, "file_sequence_number", "long", required=False),
        _f(2, "data_file", DATA_FILE_SCHEMA),
    ]}

# delete-manifest entries: puffin deletion vectors recorded as position
# deletes referencing their data file, with the spec's reserved DV
# field ids (referenced_data_file=143, content_offset=144,
# content_size_in_bytes=145) — the layout moonlink persists per DV'd
# fragment (one blob per puffin, iceberg_table_syncer.rs:93-172)
DELETE_FILE_SCHEMA = {
    "type": "record", "name": "r2", "fields": [
        _f(134, "content", "int"),
        _f(100, "file_path", "string"),
        _f(101, "file_format", "string"),
        _f(102, "partition", _PARTITION_RECORD),
        _f(103, "record_count", "long"),
        _f(104, "file_size_in_bytes", "long"),
        _f(143, "referenced_data_file", "string", required=False),
        _f(144, "content_offset", "long", required=False),
        _f(145, "content_size_in_bytes", "long", required=False),
    ]}

DELETE_MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        _f(0, "status", "int"),
        _f(1, "snapshot_id", "long", required=False),
        _f(3, "sequence_number", "long", required=False),
        _f(4, "file_sequence_number", "long", required=False),
        _f(2, "data_file", DELETE_FILE_SCHEMA),
    ]}

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        _f(500, "manifest_path", "string"),
        _f(501, "manifest_length", "long"),
        _f(502, "partition_spec_id", "int"),
        _f(517, "content", "int"),
        _f(515, "sequence_number", "long"),
        _f(516, "min_sequence_number", "long"),
        _f(503, "added_snapshot_id", "long"),
        _f(504, "added_files_count", "int"),
        _f(505, "existing_files_count", "int"),
        _f(506, "deleted_files_count", "int"),
        _f(512, "added_rows_count", "long"),
        _f(513, "existing_rows_count", "long"),
        _f(514, "deleted_rows_count", "long"),
    ]}


def _iceberg_type(name: str):
    """Engine type vocabulary (schema.py) -> Iceberg type JSON."""
    flat = {"string": "string", "binary": "binary", "bool": "boolean",
            "int8": "int", "int16": "int", "int32": "int",
            "int64": "long", "float32": "float", "float64": "double",
            "timestamp[us]": "timestamp", "date32": "date",
            "time64[us]": "time"}
    if name in flat:
        return flat[name]
    if name.startswith("decimal128(") and name.endswith(")"):
        body = name[len("decimal128("):-1]
        parts = [int(p) for p in body.split(",")] + [0]
        return f"decimal({parts[0]}, {parts[1]})"
    if name.startswith("list<") and name.endswith(">"):
        return {"type": "list", "element": _iceberg_type(name[5:-1]),
                "element-required": False}
    if name.startswith("struct<") and name.endswith(">"):
        from .schema import _split_top
        fields = []
        for part in _split_top(name[7:-1], ","):
            nm, _, tn = part.partition(":")
            fields.append({"name": nm, "required": False,
                           "type": _iceberg_type(tn)})
        return {"type": "struct", "fields": fields}
    raise ValueError(f"no Iceberg mapping for engine type {name!r}")


def _assign_nested_ids(t, alloc) -> object:
    """Iceberg requires a unique field-id on every NESTED element/field
    too (spec 'Schemas and Data Types'); allocate them depth-first so
    the assignment is deterministic for a given schema."""
    if not isinstance(t, dict):
        return t
    if t.get("type") == "list":
        out = {**t, "element-id": alloc()}
        out["element"] = _assign_nested_ids(out["element"], alloc)
        return out
    if t.get("type") == "struct":
        fields = []
        for f in t["fields"]:
            fid = alloc()
            fields.append({**f, "id": fid,
                           "type": _assign_nested_ids(f["type"], alloc)})
        return {**t, "fields": fields}
    return t


def _iceberg_schema(schema_list: list) -> dict:
    fields = []
    counter = [len(schema_list)]

    def alloc() -> int:
        counter[0] += 1
        return counter[0]

    out = {"type": "struct", "schema-id": 0, "fields": fields}
    for i, (name, tname) in enumerate(schema_list):
        t = _assign_nested_ids(_iceberg_type(tname), alloc)
        fields.append({"id": i + 1, "name": name, "required": False,
                       "type": t})
    out["last-column-id"] = counter[0]
    return out


# ------------------------------------------------------------- export

def _snapshot_id(root_full: str, version: int) -> int:
    return int(uuid.uuid5(
        uuid.NAMESPACE_URL,
        f"moonlink_ray:iceberg:{root_full}:v{version}").int % (1 << 62))


def _adds_to_info(adds: list[dict]) -> list[dict]:
    """_materialize add actions -> {rel, rows, size} rows."""
    import urllib.parse
    return [{"rel": urllib.parse.unquote(a["path"]),
             "rows": json.loads(a["stats"])["numRecords"],
             "size": a["size"]} for a in adds]


def _dv_puffin_rel(frag, data_rel: str) -> str:
    """Content-keyed puffin name: a fragment's DV blob re-keys when its
    DV sidecar changes, so incremental sync carries unchanged DVs over
    by name with zero IO (same story as _export_rel for payloads)."""
    import hashlib
    tag = hashlib.md5(json.dumps(
        [frag.dv["path"], frag.dv["count"], data_rel]).encode()
    ).hexdigest()[:10]
    return f"metadata/dv-{frag.fragment_id}-{tag}.puffin"


def _write_dv_puffins(root: str, destfs, dv_pairs: list) -> list[dict]:
    """Serialize each dv-preserved fragment's deletion vector as a
    one-blob puffin file (skipping content-keyed names already present
    from an earlier sync) and return the delete-manifest bookkeeping.
    Bytes moved are O(bitmap) per DV'd fragment — never payload."""
    from .fragments import read_dv
    from .puffin import write_dv_puffin

    rootfs = for_root(root)
    infos = []
    for frag, data_rel in dv_pairs:
        rel = _dv_puffin_rel(frag, data_rel)
        if destfs.exists(rel):
            from .puffin import read_puffin
            blob_meta = read_puffin(destfs.read_bytes(rel))[0][1]
            infos.append({"puffin_rel": rel, "size": destfs.size(rel),
                          "data_rel": data_rel,
                          "content_offset": blob_meta["offset"],
                          "content_size_in_bytes": blob_meta["length"],
                          "cardinality": int(
                              blob_meta["properties"]["cardinality"])})
            continue
        positions = read_dv(root, frag.dv).astype("uint64")
        data, info = write_dv_puffin(
            positions, referenced_data_file=destfs.full(data_rel),
            max_rows=frag.rows)
        destfs.write_bytes_atomic(rel, data)
        infos.append({"puffin_rel": rel, "size": len(data),
                      "data_rel": data_rel, **info})
    return infos


def _write_snapshot_tree(destfs, schema_list: list, files_info: list[dict],
                         snapshot_id: int, seq: int,
                         parent_id: int | None = None,
                         dv_infos: list[dict] = ()):
    """Write the sharded manifests + manifest list for one snapshot's
    FULL file set; returns (manifest-list rel name, manifest count,
    total rows). Every entry is written status=ADDED under this
    snapshot — a valid minimal-writer layout (planning reads status !=
    DELETED; lineage-precise existing/added split is an optimization
    for incremental readers, not a correctness requirement)."""
    files_info = sorted(files_info, key=lambda x: x["rel"])
    manifest_files = []
    total_rows = 0
    for shard0 in range(0, len(files_info), _MANIFEST_SHARD):
        shard = files_info[shard0:shard0 + _MANIFEST_SHARD]
        rows = sum(x["rows"] for x in shard)
        total_rows += rows
        entries = [{
            "status": 1, "snapshot_id": snapshot_id,
            "sequence_number": None, "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": destfs.full(x["rel"]),
                "file_format": "PARQUET",
                "partition": {},
                "record_count": x["rows"],
                "file_size_in_bytes": x["size"]}} for x in shard]
        name = (f"metadata/manifest-{snapshot_id}-"
                f"{shard0 // _MANIFEST_SHARD}.avro")
        blob = write_avro_ocf(
            MANIFEST_ENTRY_SCHEMA, entries,
            {"schema": json.dumps(_iceberg_schema(schema_list)),
             "schema-id": "0", "partition-spec": "[]",
             "partition-spec-id": "0", "format-version": "2",
             "content": "data"})
        destfs.write_bytes_atomic(name, blob)
        manifest_files.append({
            "manifest_path": destfs.full(name),
            "manifest_length": len(blob),
            "partition_spec_id": 0, "content": 0,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0, "deleted_files_count": 0,
            "added_rows_count": rows,
            "existing_rows_count": 0, "deleted_rows_count": 0})
    if dv_infos:
        entries = [{
            "status": 1, "snapshot_id": snapshot_id,
            "sequence_number": None, "file_sequence_number": None,
            "data_file": {
                "content": 1,          # position deletes (puffin DV)
                "file_path": destfs.full(d["puffin_rel"]),
                "file_format": "PUFFIN",
                "partition": {},
                "record_count": d["cardinality"],
                "file_size_in_bytes": d["size"],
                "referenced_data_file": destfs.full(d["data_rel"]),
                "content_offset": d["content_offset"],
                "content_size_in_bytes": d["content_size_in_bytes"],
            }} for d in sorted(dv_infos, key=lambda x: x["puffin_rel"])]
        name = f"metadata/manifest-{snapshot_id}-deletes.avro"
        blob = write_avro_ocf(
            DELETE_MANIFEST_ENTRY_SCHEMA, entries,
            {"schema": json.dumps(_iceberg_schema(schema_list)),
             "schema-id": "0", "partition-spec": "[]",
             "partition-spec-id": "0", "format-version": "2",
             "content": "deletes"})
        destfs.write_bytes_atomic(name, blob)
        manifest_files.append({
            "manifest_path": destfs.full(name),
            "manifest_length": len(blob),
            "partition_spec_id": 0, "content": 1,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0, "deleted_files_count": 0,
            "added_rows_count": sum(d["cardinality"] for d in dv_infos),
            "existing_rows_count": 0, "deleted_rows_count": 0})
    mlist_name = f"metadata/snap-{snapshot_id}-{seq}.avro"
    destfs.write_bytes_atomic(mlist_name, write_avro_ocf(
        MANIFEST_FILE_SCHEMA, manifest_files,
        {"snapshot-id": str(snapshot_id), "format-version": "2",
         "sequence-number": str(seq),
         "parent-snapshot-id": str(parent_id) if parent_id else "null"}))
    return mlist_name, len(manifest_files), total_rows


def export_iceberg(root: str, dest: str, version: int | None = None, *,
                   at_lsn: int | None = None,
                   dv_mode: str = "puffin") -> dict:
    """Export one committed snapshot as an Iceberg v2 table at ``dest``
    (file-catalog layout: ``metadata/v1.metadata.json`` +
    ``version-hint.text``). Data files are shared with the Delta
    export's materialization (hardlink clean / rewrite dirty).

    ``dv_mode="puffin"`` (default, the reference's behavior —
    iceberg_table_syncer.rs:93-172 + deletion_vector.rs:87-160): a
    fragment dirty ONLY by its deletion vector is hardlinked as-is and
    its DV serialized as a puffin deletion-vector blob referenced from
    a delete manifest — a heavily-deleted snapshot exports in
    O(metadata + bitmap) bytes instead of rewriting live payload.
    ``dv_mode="rewrite"`` restores the round-4 materialize-away
    behavior (every reader sees plain parquet, no delete support
    needed)."""
    from .export import _materialize, _resolve_version
    from .schema import schema_to_list, table_schema

    snap = _resolve_version(root, version, at_lsn)
    schema_list = schema_to_list(table_schema(snap))
    rootfs, destfs = for_root(root), for_root(dest)
    if destfs.exists("metadata") and any(
            n.endswith(".metadata.json") for n in destfs.listdir("metadata")):
        raise ValueError(f"{dest!r} already holds Iceberg metadata; "
                         "export targets a fresh directory")
    destfs.makedirs("metadata")

    now_ms = int(time.time() * 1000)
    adds, n_hard, dv_pairs = _materialize(
        root, dest, snap.fragments, schema_list, now_ms,
        dv_puffin=(dv_mode == "puffin"))
    dv_infos = _write_dv_puffins(root, destfs, dv_pairs)
    snapshot_id = _snapshot_id(rootfs.full(), snap.version)
    seq = 1
    files_info = _adds_to_info(adds)
    mlist_name, n_manifests, total_rows = _write_snapshot_tree(
        destfs, schema_list, files_info, snapshot_id, seq,
        dv_infos=dv_infos)

    # ---- table metadata + version hint
    schema_json = _iceberg_schema(schema_list)
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(
            uuid.NAMESPACE_URL, f"moonlink_ray:{rootfs.full()}")),
        "location": destfs.full(),
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": schema_json.pop("last-column-id"),
        "current-schema-id": 0,
        "schemas": [schema_json],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet",
                       "moonlink-ray.source-root": rootfs.full(),
                       "moonlink-ray.source-version": str(snap.version),
                       "moonlink-ray.source-max-lsn": str(snap.max_lsn)},
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id,
                          "type": "branch"}},
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "summary": {"operation": "append",
                        "added-data-files": str(len(adds)),
                        "added-records": str(total_rows)},
            "manifest-list": destfs.full(mlist_name),
            "schema-id": 0}],
        "snapshot-log": [{"timestamp-ms": now_ms,
                          "snapshot-id": snapshot_id}],
        "metadata-log": [],
    }
    destfs.write_text_atomic("metadata/v1.metadata.json",
                             json.dumps(meta, indent=1))
    destfs.write_text_atomic("metadata/version-hint.text", "1")
    return {"dest": destfs.full(), "iceberg_version": 1,
            "source_version": snap.version,
            "snapshot_id": snapshot_id,
            "files": len(adds), "hardlinked": n_hard,
            "rewritten": len(adds) - n_hard,
            "dv_puffins": len(dv_infos),
            "manifests": n_manifests, "rows": total_rows}


def sync_iceberg(root: str, dest: str, version: int | None = None) -> dict:
    """Bring an existing Iceberg export up to date with a newer table
    snapshot — the per-commit sync moonlink performs
    (``iceberg_table_syncer.rs:505-595``): materialize new/changed data
    files, drop removed ones from the new snapshot's manifests, append
    one snapshot to the metadata tree.

    Incremental by construction, same argument as ``sync_delta``: a
    fragment's exported file name is a pure function of its live-row
    content (``export._export_rel``), so unchanged fragments carry over
    by name with ZERO data IO (their record counts ride the previous
    manifests); only metadata (manifests + metadata.json) is rewritten,
    O(files) not O(bytes). The new metadata file is published with a
    conditional put, so racing syncs cannot both claim v{N+1}; old
    snapshots stay time-travelable (their files are never deleted
    here)."""
    import urllib.parse

    from .export import (_export_rel, _is_clean, _materialize,
                         _resolve_version)
    from .schema import schema_to_list, table_schema

    snap = _resolve_version(root, version, None)
    schema_list = schema_to_list(table_schema(snap))
    rootfs, destfs = for_root(root), for_root(dest)
    if not destfs.exists("metadata/version-hint.text"):
        raise FileNotFoundError(f"no Iceberg metadata at {dest!r}; "
                                "export_iceberg creates the initial table")
    v = int(destfs.read_text("metadata/version-hint.text").strip())
    meta = json.loads(destfs.read_text(f"metadata/v{v}.metadata.json"))
    base = destfs.full()

    # live DATA file info from the current snapshot's manifests; delete
    # manifests (content=1, puffin DVs) are regenerated wholesale each
    # sync from the source snapshot's DV state, so they are skipped here
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    live: dict[str, dict] = {}
    old_dv_rels: set[str] = set()
    for m in read_avro_ocf(destfs.read_bytes(
            os.path.relpath(cur["manifest-list"], base))):
        if m.get("content") == 1:
            for e in read_avro_ocf(destfs.read_bytes(
                    os.path.relpath(m["manifest_path"], base))):
                if e["status"] != 2:
                    old_dv_rels.add(os.path.relpath(
                        e["data_file"]["file_path"], base))
            continue
        for e in read_avro_ocf(destfs.read_bytes(
                os.path.relpath(m["manifest_path"], base))):
            if e["status"] != 2:
                df = e["data_file"]
                rel = os.path.relpath(df["file_path"], base)
                live[rel] = {"rel": rel, "rows": df["record_count"],
                             "size": df["file_size_in_bytes"]}

    now_ms = int(time.time() * 1000)
    adds, n_hard, dv_pairs = _materialize(
        root, dest, list(snap.fragments), schema_list, now_ms,
        skip_rels=frozenset(live), dv_puffin=True)
    dv_infos = _write_dv_puffins(root, destfs, dv_pairs)
    dv_rels = {rel for _, rel in dv_pairs}

    dv_frag_ids = {f.fragment_id for f, _ in dv_pairs}
    expected_rels = set(dv_rels)      # dv-preserved files keep clean names
    for f in snap.fragments:
        if f.live_rows == 0 or f.fragment_id in dv_frag_ids:
            continue
        expected_rels.add(_export_rel(f, schema_list,
                                      _is_clean(rootfs, f, schema_list)))
    removed = sorted(set(live) - expected_rels)
    schema_json = _iceberg_schema(schema_list)
    schema_json_lc = schema_json.pop("last-column-id")
    cur_schema = meta["schemas"][meta["current-schema-id"]]
    schema_changed = schema_json["fields"] != cur_schema["fields"]
    dv_changed = old_dv_rels != {d["puffin_rel"] for d in dv_infos}
    if not adds and not removed and not schema_changed and not dv_changed:
        return {"dest": base, "iceberg_version": v, "noop": True,
                "source_version": snap.version, "files": len(live),
                "added": 0, "removed": 0}

    files_info = [x for rel, x in live.items() if rel in expected_rels] \
        + _adds_to_info(adds)
    snapshot_id = _snapshot_id(rootfs.full(), snap.version)
    seq = meta["last-sequence-number"] + 1
    mlist_name, n_manifests, total_rows = _write_snapshot_tree(
        destfs, schema_list, files_info, snapshot_id, seq,
        parent_id=meta["current-snapshot-id"], dv_infos=dv_infos)

    if schema_changed:
        sid = len(meta["schemas"])
        meta["schemas"].append({**schema_json, "schema-id": sid})
        meta["current-schema-id"] = sid
        meta["last-column-id"] = max(meta["last-column-id"],
                                     schema_json_lc)
    meta["snapshots"].append({
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": cur["snapshot-id"],
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "summary": {"operation": "overwrite",
                    "added-data-files": str(len(adds)),
                    "removed-data-files": str(len(removed)),
                    "added-records": str(sum(x["rows"] for x in
                                             _adds_to_info(adds)))},
        "manifest-list": destfs.full(mlist_name),
        "schema-id": meta["current-schema-id"]})
    meta["current-snapshot-id"] = snapshot_id
    meta["refs"]["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms
    meta["snapshot-log"].append({"timestamp-ms": now_ms,
                                 "snapshot-id": snapshot_id})
    meta["metadata-log"].append({
        "timestamp-ms": now_ms,
        "metadata-file": destfs.full(f"metadata/v{v}.metadata.json")})
    meta["properties"]["moonlink-ray.source-version"] = str(snap.version)
    meta["properties"]["moonlink-ray.source-max-lsn"] = str(snap.max_lsn)
    if not destfs.create_exclusive(f"metadata/v{v + 1}.metadata.json",
                                   json.dumps(meta, indent=1)):
        raise RuntimeError(f"concurrent sync already published Iceberg "
                           f"metadata v{v + 1}")
    destfs.write_text_atomic("metadata/version-hint.text", str(v + 1))
    return {"dest": base, "iceberg_version": v + 1, "noop": False,
            "source_version": snap.version, "snapshot_id": snapshot_id,
            "files": len(files_info), "added": len(adds),
            "removed": len(removed), "hardlinked": n_hard,
            "dv_puffins": len(dv_infos),
            "manifests": n_manifests, "rows": total_rows}


def iceberg_scan_plan(dest: str) -> list[dict]:
    """Plan the current snapshot from the metadata tree alone (hint ->
    metadata.json -> manifest list -> manifests) using this module's
    own decoders — the engine-side consumer (the pytest verification
    uses independent decoders instead). Returns one row per data file:
    ``{"path", "rows", "dv": None | {"puffin", "offset", "length",
    "cardinality"}}`` — delete manifests (content=1) attach their
    puffin deletion-vector refs to the data file they reference, the
    ``RowSelection`` handoff moonlink's DataFusion provider performs
    (table_provider.rs:99-140)."""
    destfs = for_root(dest)
    v = destfs.read_text("metadata/version-hint.text").strip()
    meta = json.loads(destfs.read_text(f"metadata/v{v}.metadata.json"))
    cur = meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur)
    base = destfs.full()

    def rel_of(p: str) -> str:
        return os.path.relpath(p, base)

    plan: dict[str, dict] = {}
    dvs: list[dict] = []
    for m in read_avro_ocf(destfs.read_bytes(rel_of(snap["manifest-list"]))):
        is_delete = m.get("content") == 1
        for e in read_avro_ocf(destfs.read_bytes(
                rel_of(m["manifest_path"]))):
            if e["status"] == 2:        # 2 = DELETED
                continue
            df = e["data_file"]
            if is_delete:
                dvs.append(df)
            else:
                plan[df["file_path"]] = {"path": df["file_path"],
                                         "rows": df["record_count"],
                                         "dv": None}
    for df in dvs:
        target = plan.get(df["referenced_data_file"])
        if target is not None:
            target["dv"] = {"puffin": df["file_path"],
                            "offset": df["content_offset"],
                            "length": df["content_size_in_bytes"],
                            "cardinality": df["record_count"]}
    return [plan[k] for k in sorted(plan)]


def iceberg_active_files(dest: str) -> list[str]:
    """Current snapshot's data-file paths (no DV info — callers that
    must honor deletion vectors use ``iceberg_scan_plan`` /
    ``read_iceberg_table``)."""
    return [p["path"] for p in iceberg_scan_plan(dest)]


def read_iceberg_table(dest: str, columns: list[str] | None = None):
    """Read the current snapshot back as a Ray Dataset, applying puffin
    deletion vectors as row masks inside the per-file read tasks — the
    positions never route through the driver (each task decodes its own
    blob)."""
    import ray.data as rd

    plan = iceberg_scan_plan(dest)
    items = [{"path": p["path"],
              "puffin": p["dv"]["puffin"] if p["dv"] else ""}
             for p in plan]

    def read_one(batch: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .puffin import read_dv_puffin
        tables = []
        for row in batch.to_pylist():
            t = pq.read_table(row["path"], columns=columns)
            if row["puffin"]:
                with open(row["puffin"], "rb") as f:
                    positions = read_dv_puffin(f.read())[row["path"]]
                mask = np.ones(t.num_rows, dtype=bool)
                mask[positions.astype(np.int64)] = False
                t = t.filter(pa.array(mask))
            tables.append(t)
        return pa.concat_tables(tables)

    import pyarrow as pa  # noqa: F811 — local alias for the closure
    return rd.from_items(items, override_num_blocks=max(1, len(items))) \
        .map_batches(read_one, batch_format="pyarrow")


def _snapshot_reachable(destfs, base: str, snap: dict) -> set[str]:
    """Relative paths reachable from one snapshot: its manifest list,
    manifests, data files and puffin DV files."""
    out = set()
    mlist = os.path.relpath(snap["manifest-list"], base)
    out.add(mlist)
    for m in read_avro_ocf(destfs.read_bytes(mlist)):
        mrel = os.path.relpath(m["manifest_path"], base)
        out.add(mrel)
        for e in read_avro_ocf(destfs.read_bytes(mrel)):
            if e["status"] != 2:
                out.add(os.path.relpath(e["data_file"]["file_path"], base))
    return out


def vacuum_iceberg(dest: str, *, keep_last: int = 2,
                   orphan_grace_s: float = 600.0) -> dict:
    """Expire old snapshots AND physically delete files nothing
    retained references — Iceberg's ``expire_snapshots`` +
    ``remove_orphan_files`` in one pass, the export-side counterpart of
    the table's own ``expire`` (and of ``export.vacuum_delta``). With
    DV puffins in play this matters doubly: every sync that changes a
    fragment's deletion vector rotates its content-keyed puffin, so a
    long-lived synced export accumulates stale puffin blobs as well as
    stale data files.

    Semantics: the newest ``keep_last`` snapshots stay time-travelable.
    A new metadata version is published (conditional put, same
    single-committer rule as sync) listing only the retained snapshots;
    then any ``part-*.parquet`` / ``metadata/dv-*.puffin`` /
    ``manifest-*`` / ``snap-*`` file unreachable from EVERY retained
    snapshot is deleted, as are metadata.json versions older than the
    previous one. Never-referenced orphans (debris of a killed export)
    get ``orphan_grace_s`` before deletion — a concurrent sync may have
    just written data files whose metadata commit has not landed.

    Cross-format safety: the dest may also hold a Delta export sharing
    the same data files (the documented shared-dest layout); any path a
    Delta log version still references is kept regardless."""
    destfs = for_root(dest)
    base = destfs.full()
    v = int(destfs.read_text("metadata/version-hint.text").strip())
    meta = json.loads(destfs.read_text(f"metadata/v{v}.metadata.json"))
    snaps = meta["snapshots"]
    retained = snaps[-max(1, keep_last):]
    expired = [s for s in snaps if s not in retained]

    keep: set[str] = set()
    referenced: set[str] = set()   # reachable from ANY snapshot
    for s in snaps:
        paths = _snapshot_reachable(destfs, base, s)
        referenced |= paths
        if s in retained:
            keep |= paths

    # files a co-located Delta export still references are off-limits
    from .export import delta_referenced_paths
    keep |= delta_referenced_paths(destfs)

    if expired:
        meta = dict(meta)
        meta["snapshots"] = retained
        meta["snapshot-log"] = [
            e for e in meta.get("snapshot-log", [])
            if e["snapshot-id"] in {s["snapshot-id"] for s in retained}]
        meta["metadata-log"] = []
        if not destfs.create_exclusive(f"metadata/v{v + 1}.metadata.json",
                                       json.dumps(meta, indent=1)):
            raise RuntimeError(
                f"concurrent writer already published v{v + 1}")
        destfs.write_text_atomic("metadata/version-hint.text", str(v + 1))
        v += 1

    now = time.time()
    deleted = skipped_young = 0
    candidates: list[str] = []
    for n in destfs.listdir(""):
        if n.startswith("part-") and n.endswith(".parquet"):
            candidates.append(n)
    for n in destfs.listdir("metadata"):
        rel = f"metadata/{n}"
        if n.startswith(("dv-", "manifest-", "snap-")):
            candidates.append(rel)
        elif n.endswith(".metadata.json") and expired:
            # old metadata versions are only safe to drop when a fresh
            # version with a CLEARED metadata-log was just published
            # (otherwise the current log still references them); keep
            # the current + previous version (readers may hold the hint
            # from just before the swap)
            try:
                mv = int(n[1:].split(".")[0])
            except ValueError:
                continue
            if mv < v - 1:
                candidates.append(rel)
    for rel in candidates:
        if rel in keep:
            continue
        if rel.endswith(".metadata.json"):
            deleted += bool(destfs.delete(rel))
            continue
        if rel not in referenced and orphan_grace_s > 0:
            # arrival_time, NOT mtime: hardlink-adopted files keep the
            # source's old mtime (see export.vacuum_delta)
            mt = destfs.arrival_time(rel)
            if mt is not None and now - mt < orphan_grace_s:
                skipped_young += 1
                continue
        deleted += bool(destfs.retire(rel))  # GC path: recycle pages
    return {"dest": base, "iceberg_version": v,
            "expired_snapshots": len(expired),
            "retained_snapshots": len(retained),
            "deleted": deleted, "skipped_young_orphans": skipped_young,
            "kept_files": len(keep)}


# ----------------------------------------------------- decoder (reader)

def _avro_decode(schema, buf: io.BytesIO):
    if isinstance(schema, list):
        idx = _read_long(buf)
        s = schema[idx]
        return None if s == "null" else _avro_decode(s, buf)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        return {f["name"]: _avro_decode(f["type"], buf)
                for f in schema["fields"]}
    if t in ("long", "int"):
        return _read_long(buf)
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            out.extend(_avro_decode(schema["items"], buf)
                       for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = buf.read(_read_long(buf)).decode()
                out[k] = _avro_decode(schema["values"], buf)
    raise ValueError(f"unsupported avro type {t!r}")


def _read_long(buf: io.BytesIO) -> int:
    shift = acc = 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def read_avro_ocf(blob: bytes) -> list[dict]:
    """Decode one OCF produced by :func:`write_avro_ocf` (or any
    null-codec OCF within the supported type subset)."""
    buf = io.BytesIO(blob)
    if buf.read(4) != b"Obj\x01":
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = buf.read(_read_long(buf)).decode()
            meta[k] = buf.read(_read_long(buf))
    if meta.get("avro.codec", b"null") != b"null":
        raise ValueError("only null codec supported")
    schema = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    out = []
    while True:
        head = buf.read(1)
        if not head:
            return out
        buf.seek(-1, 1)
        n = _read_long(buf)
        _read_long(buf)  # block byte size
        for _ in range(n):
            out.append(_avro_decode(schema, buf))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
