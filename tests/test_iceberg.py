"""Iceberg v2 export (iceberg.py) — the analog of moonlink committing
real Iceberg metadata per sync (/root/reference/src/moonlink/src/
storage/iceberg/iceberg_table_syncer.rs:563-595).

The Avro manifests are verified with an INDEPENDENT decoder written in
this file directly from the Avro 1.11 spec (varint/zigzag, OCF
framing) — not the encoder's own reader — then the planned file list
is read back with DuckDB alone and compared to the engine scan."""

import io
import json
import os

import duckdb
import pytest

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.iceberg import (export_iceberg, iceberg_active_files,
                                  read_avro_ocf, write_avro_ocf)
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow


# ---------------------------------------------------------------------
# independent spec-derived Avro reader (deliberately NOT importing the
# module's decoder): zigzag varints, OCF header map, sync-delimited
# blocks, schema-driven value decode.

def _ind_varlong(b: io.BytesIO) -> int:
    shift = out = 0
    while True:
        byte = b.read(1)
        assert byte, "truncated varint"
        out |= (byte[0] & 0x7F) << shift
        shift += 7
        if not byte[0] & 0x80:
            break
    return (out >> 1) ^ -(out & 1)          # zigzag


def _ind_value(schema, b: io.BytesIO):
    if isinstance(schema, list):            # union: long index + value
        branch = schema[_ind_varlong(b)]
        return None if branch == "null" else _ind_value(branch, b)
    kind = schema["type"] if isinstance(schema, dict) else schema
    if kind == "record":
        return {f["name"]: _ind_value(f["type"], b)
                for f in schema["fields"]}
    if kind in ("int", "long"):
        return _ind_varlong(b)
    if kind == "string":
        return b.read(_ind_varlong(b)).decode("utf-8")
    if kind == "bytes":
        return b.read(_ind_varlong(b))
    if kind == "boolean":
        return b.read(1) != b"\x00"
    raise AssertionError(f"unexpected type in iceberg metadata: {kind}")


def independent_read_ocf(blob: bytes):
    """Returns (file metadata dict, records)."""
    b = io.BytesIO(blob)
    assert b.read(4) == b"Obj\x01", "bad OCF magic"
    meta = {}
    while (n := _ind_varlong(b)) != 0:
        if n < 0:                            # negative block: size follows
            _ind_varlong(b)
            n = -n
        for _ in range(n):
            k = b.read(_ind_varlong(b)).decode()
            meta[k] = b.read(_ind_varlong(b))
    sync = b.read(16)
    assert meta["avro.codec"] == b"null"
    schema = json.loads(meta["avro.schema"])
    records = []
    while b.tell() < len(blob):
        cnt = _ind_varlong(b)
        _ind_varlong(b)                      # serialized byte size
        for _ in range(cnt):
            records.append(_ind_value(schema, b))
        assert b.read(16) == sync, "sync marker mismatch"
    return meta, records


def _export_fixture(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 200, rows_per_fragment=32)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=200, n_ops=60)   # DVs + adopted spans
    merge(root, cdc)
    dest = str(tmp_path / "ice")
    rep = export_iceberg(root, dest)
    return root, dest, rep


@pytest.mark.usefixtures("ray_session")
def test_iceberg_metadata_tree_and_duckdb_read_back(tmp_path):
    root, dest, rep = _export_fixture(tmp_path)

    # --- metadata json (file-catalog layout)
    hint = open(os.path.join(dest, "metadata/version-hint.text")).read()
    meta = json.load(open(os.path.join(
        dest, f"metadata/v{hint.strip()}.metadata.json")))
    assert meta["format-version"] == 2
    snap_ids = {s["snapshot-id"] for s in meta["snapshots"]}
    assert meta["current-snapshot-id"] in snap_ids
    assert meta["refs"]["main"]["snapshot-id"] == meta["current-snapshot-id"]
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])

    # --- manifest list via the INDEPENDENT decoder
    mlist_blob = open(cur["manifest-list"], "rb").read()
    mmeta, manifests = independent_read_ocf(mlist_blob)
    assert mmeta["format-version"] == b"2"
    assert len(manifests) == rep["manifests"] >= 1
    for m in manifests:
        assert m["added_snapshot_id"] == meta["current-snapshot-id"]
        assert m["content"] == 0
        assert m["manifest_length"] == os.path.getsize(m["manifest_path"])

    # --- manifests -> data files (independent decoder again)
    files, planned_rows = [], 0
    for m in manifests:
        fmeta, entries = independent_read_ocf(
            open(m["manifest_path"], "rb").read())
        assert fmeta["format-version"] == b"2"
        assert json.loads(fmeta["schema"])["type"] == "struct"
        assert len(entries) == m["added_files_count"]
        for e in entries:
            assert e["status"] == 1
            df = e["data_file"]
            assert df["file_format"] == "PARQUET"
            assert df["file_size_in_bytes"] == os.path.getsize(
                df["file_path"])
            planned_rows += df["record_count"]
            files.append(df["file_path"])
    assert planned_rows == rep["rows"]

    # --- DuckDB alone reads the planned files; matches the engine scan
    want = scan_arrow(root, columns=["image_id", "caption", "phash"])
    con = duckdb.connect()
    got = con.execute(
        "SELECT image_id, caption, phash FROM read_parquet(?) "
        "ORDER BY image_id", [files]).fetch_arrow_table()
    import pyarrow.compute as pc
    want = want.take(pc.sort_indices(want["image_id"]))
    assert got.equals(want.select(["image_id", "caption", "phash"])
                      .cast(got.schema))

    # --- the engine-side planner agrees with the independent plan
    assert iceberg_active_files(dest) == sorted(files)


def test_avro_ocf_round_trip_edge_values():
    """Codec-level fuzz of the hand-written OCF writer: zigzag edges,
    unions, nested records, empty record, arrays and maps."""
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "record", "name": "s",
                               "fields": []}},
        {"name": "d", "type": {"type": "array", "items": "int"}},
        {"name": "e", "type": {"type": "map", "values": "long"}},
        {"name": "f", "type": "boolean"},
    ]}
    rows = [
        {"a": 0, "b": None, "c": {}, "d": [], "e": {}, "f": False},
        {"a": -1, "b": "x", "c": {}, "d": [1, -2, 3], "e": {"k": -5},
         "f": True},
        {"a": (1 << 61), "b": "üñí", "c": {}, "d": [2**31 - 1, -2**31],
         "e": {"a": 0, "b": 1}, "f": True},
        {"a": -(1 << 61), "b": "", "c": {}, "d": [0], "e": {}, "f": False},
    ]
    blob = write_avro_ocf(schema, rows, {"k": "v"})
    # module decoder
    assert read_avro_ocf(blob) == rows
    # independent decoder (arrays/maps not exercised by iceberg files,
    # so cover the scalar/union/record subset here)
    meta, got = independent_read_ocf(write_avro_ocf(
        {"type": "record", "name": "t", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]}]},
        [{"a": -(1 << 61), "b": None}, {"a": 7, "b": "z"}], {"m": "1"}))
    assert got == [{"a": -(1 << 61), "b": None}, {"a": 7, "b": "z"}]
    assert meta["m"] == b"1"


@pytest.mark.usefixtures("ray_session")
def test_iceberg_schema_mapping_decimal_list(tmp_path):
    """decimal128 / list columns map to Iceberg type JSON with element
    ids; time64 maps to time (no Delta-style gap)."""
    from moonlink_ray.iceberg import _iceberg_schema
    s = _iceberg_schema([["image_id", "string"],
                         ["price", "decimal128(9,2)"],
                         ["embed", "list<float32>"],
                         ["t", "time64[us]"]])
    by_name = {f["name"]: f for f in s["fields"]}
    assert by_name["price"]["type"] == "decimal(9, 2)"
    assert by_name["embed"]["type"]["type"] == "list"
    assert by_name["embed"]["type"]["element"] == "float"
    assert "element-id" in by_name["embed"]["type"]
    assert by_name["t"]["type"] == "time"


@pytest.mark.usefixtures("ray_session")
def test_iceberg_export_refuses_overwrite(tmp_path):
    root, dest, _ = _export_fixture(tmp_path)
    with pytest.raises(ValueError, match="already holds"):
        export_iceberg(root, dest)


@pytest.mark.usefixtures("ray_session")
def test_sync_iceberg_incremental(tmp_path):
    """A second MERGE syncs into the existing Iceberg export: unchanged
    data files carry over by name (zero data IO), removed ones leave
    the new snapshot's manifests, the new metadata version plans to the
    new table state, and a repeat sync is a no-op."""
    root, dest, rep0 = _export_fixture(tmp_path)
    from moonlink_ray.iceberg import sync_iceberg

    # second CDC wave against the same table
    cdc2 = str(tmp_path / "cdc2.parquet")
    write_cdc_parquet(cdc2, n_base=200, n_ops=40, start_lsn=5000, seed=9)
    merge(root, cdc2)
    rep = sync_iceberg(root, dest)
    assert rep["iceberg_version"] == 2 and not rep["noop"]
    assert rep["added"] >= 1

    # planned files match the engine scan exactly (DuckDB only). The
    # second CDC wave re-appends ids the first wave created (append
    # does not enforce key uniqueness — producer's job), so image_id
    # alone is not a total order; sort by (image_id, caption) on both
    # sides or the duplicate ids' tie order flakes between DuckDB's
    # and Arrow's sort.
    files = iceberg_active_files(dest)
    want = scan_arrow(root, columns=["image_id", "caption"])
    con = duckdb.connect()
    got = con.execute(
        "SELECT image_id, caption FROM read_parquet(?) "
        "ORDER BY image_id, caption", [files]).fetch_arrow_table()
    import pyarrow.compute as pc
    want = want.take(pc.sort_indices(
        want, sort_keys=[("image_id", "ascending"),
                         ("caption", "ascending")]))
    assert got.equals(want.select(["image_id", "caption"])
                      .cast(got.schema))

    # the previous snapshot stays time-travelable: its manifest list
    # still resolves and its files still exist
    meta = json.load(open(os.path.join(
        dest, "metadata/v2.metadata.json")))
    assert len(meta["snapshots"]) == 2
    old = meta["snapshots"][0]
    _, old_manifests = independent_read_ocf(
        open(old["manifest-list"], "rb").read())
    for m in old_manifests:
        _, entries = independent_read_ocf(open(m["manifest_path"],
                                               "rb").read())
        for e in entries:
            assert os.path.exists(e["data_file"]["file_path"])

    # idempotence: nothing changed -> noop, no new metadata version
    rep2 = sync_iceberg(root, dest)
    assert rep2["noop"] and rep2["iceberg_version"] == 2
