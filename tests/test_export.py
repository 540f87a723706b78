"""Delta Lake snapshot export: a third-party engine (DuckDB) reads the
exported table through the Delta log alone and sees exactly the
snapshot's live rows. Interop analog of moonlink committing REAL
Iceberg metadata any engine can read (/root/reference/src/moonlink/src/
storage/iceberg/iceberg_table_syncer.rs:563-595)."""

import json
import os

import duckdb
import pytest

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.export import (DELTA_LOG_DIR, delta_active_files,
                                 export_delta, export_lance)
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow


def _duckdb_read(dest, order="image_id"):
    paths = delta_active_files(dest)
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet(?) ORDER BY {order}",
        [paths]).fetch_arrow_table()


def _log_actions(dest):
    p = os.path.join(dest, DELTA_LOG_DIR, f"{0:020d}.json")
    return [json.loads(ln) for ln in open(p) if ln.strip()]


@pytest.mark.usefixtures("ray_session")
def test_delta_export_round_trip(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 150, rows_per_fragment=32)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=150, n_ops=90)
    merge(root, cdc)  # DVs on touched base fragments + adopted spans
    snap = load(root)

    dest = str(tmp_path / "delta")
    out = export_delta(root, dest)
    assert out["rows"] == snap.total_rows
    # this CDC touches every base fragment (DVs) and adopts span
    # fragments, so everything goes through the live-row rewrite
    assert out["rewritten"] > 0
    assert out["files"] == out["hardlinked"] + out["rewritten"]

    # log structure per the public spec
    acts = _log_actions(dest)
    assert acts[1]["protocol"] == {"minReaderVersion": 1,
                                   "minWriterVersion": 2}
    md = acts[2]["metaData"]
    sch = json.loads(md["schemaString"])
    assert [f["name"] for f in sch["fields"]] == \
        ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert md["partitionColumns"] == []
    adds = [a["add"] for a in acts if "add" in a]
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) \
        == snap.total_rows
    for a in adds:
        fp = os.path.join(dest, a["path"])
        assert os.path.getsize(fp) == a["size"]

    # DuckDB consumes the export via the log-replay contract only
    got = _duckdb_read(dest)
    want = scan_arrow(root, sort_by="image_id")
    assert got.num_rows == want.num_rows
    for col in want.column_names:
        assert got[col].to_pylist() == want[col].to_pylist(), col


@pytest.mark.usefixtures("ray_session")
def test_delta_export_zero_copy_when_clean(tmp_path):
    """A snapshot whose fragments carry no DVs/spans/schema drift (the
    post-OPTIMIZE steady state) exports in O(metadata): every data file
    is a hardlink of its source fragment, no payload is moved."""
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 96, rows_per_fragment=32)
    dest = str(tmp_path / "delta")
    out = export_delta(root, dest)
    assert out["rewritten"] == 0 and out["hardlinked"] == out["files"] > 0
    adds = [a["add"] for a in _log_actions(dest) if "add" in a]
    assert all(os.stat(os.path.join(dest, a["path"])).st_nlink > 1
               for a in adds)
    got = _duckdb_read(dest)
    want = scan_arrow(root, sort_by="image_id")
    assert got["image_id"].to_pylist() == want["image_id"].to_pylist()
    assert got["phash"].to_pylist() == want["phash"].to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_delta_export_snapshot_isolation(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 96, rows_per_fragment=32)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=96, n_ops=40)
    merge(root, cdc)
    v = load(root).version
    cdc2 = str(tmp_path / "cdc2.parquet")
    write_cdc_parquet(cdc2, n_base=96, n_ops=30, start_lsn=10_000)
    merge(root, cdc2)  # later commit must not leak into the v export

    dest = str(tmp_path / "delta_v")
    export_delta(root, dest, version=v)
    got = _duckdb_read(dest)
    want = scan_arrow(root, version=v, sort_by="image_id")
    assert got["image_id"].to_pylist() == want["image_id"].to_pylist()
    assert got["caption"].to_pylist() == want["caption"].to_pylist()

    # a Delta log is immutable history: re-export into it is refused
    with pytest.raises(ValueError, match="already holds"):
        export_delta(root, dest)


@pytest.mark.usefixtures("ray_session")
def test_delta_export_after_alter(tmp_path):
    """Pre-ALTER fragments lack the added column, so they cannot be
    hardlinked — the export rewrites them conformed (null-filled) and
    the Delta schema carries the added column."""
    from moonlink_ray.schema import alter_table
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 64, rows_per_fragment=32)
    alter_table(root, add=[("quality", "float64")])

    dest = str(tmp_path / "delta")
    out = export_delta(root, dest)
    assert out["hardlinked"] == 0 and out["rewritten"] > 0
    got = _duckdb_read(dest)
    assert "quality" in got.column_names
    assert got["quality"].null_count == got.num_rows
    md = _log_actions(dest)[2]["metaData"]
    fields = {f["name"]: f["type"]
              for f in json.loads(md["schemaString"])["fields"]}
    assert fields["quality"] == "double"


@pytest.mark.usefixtures("ray_session")
def test_sync_delta_incremental(tmp_path):
    """Continuous mirror: after new commits, sync_delta appends ONE new
    log version that carries unchanged files over by name (no IO),
    materializes only changed/new fragments, and removes stale ones —
    moonlink's per-commit Iceberg sync as a batch call."""
    from moonlink_ray.export import sync_delta
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 150, rows_per_fragment=32)
    dest = str(tmp_path / "delta")
    first = export_delta(root, dest)
    assert first["hardlinked"] == first["files"]

    # a no-op sync publishes nothing
    assert sync_delta(root, dest)["noop"] is True
    assert len(os.listdir(os.path.join(dest, DELTA_LOG_DIR))) == 1

    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=150, n_ops=60)
    merge(root, cdc)
    before = {p: os.stat(p).st_mtime_ns for p in delta_active_files(dest)}
    out = sync_delta(root, dest)
    assert out["noop"] is False and out["delta_version"] == 1
    assert out["added"] > 0 and out["removed"] > 0

    # carried-over files were not rewritten
    for p in delta_active_files(dest):
        if p in before:
            assert os.stat(p).st_mtime_ns == before[p]

    got = _duckdb_read(dest)
    want = scan_arrow(root, sort_by="image_id")
    assert got.num_rows == want.num_rows
    for col in want.column_names:
        assert got[col].to_pylist() == want[col].to_pylist(), col

    # idempotent: syncing the same snapshot again is a no-op
    assert sync_delta(root, dest)["noop"] is True

    # schema evolution flows through: ALTER then sync rewrites to the
    # new schema and re-publishes metaData
    from moonlink_ray.schema import alter_table
    alter_table(root, add=[("quality", "float64")])
    out2 = sync_delta(root, dest)
    assert out2["noop"] is False and out2["delta_version"] == 2
    got2 = _duckdb_read(dest)
    assert "quality" in got2.column_names
    assert got2.num_rows == want.num_rows


@pytest.mark.usefixtures("ray_session")
def test_export_restart_after_kill(tmp_path):
    """A killed export (data files written, log dir created, but NO log
    version committed) restarts by simply re-running export_delta: the
    materialize steps are idempotent and the log publish is the only
    commit point."""
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 96, rows_per_fragment=32)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=96, n_ops=30)
    merge(root, cdc)
    dest = str(tmp_path / "delta")
    # simulate the kill right before the log publish: all data files
    # are on disk (every write is atomic — hardlink or tmp+rename, so
    # no torn finals exist), the log dir exists, no log version does
    export_delta(root, dest)
    os.remove(os.path.join(dest, DELTA_LOG_DIR, f"{0:020d}.json"))
    out = export_delta(root, dest)
    assert out["files"] > 0
    got = _duckdb_read(dest)
    want = scan_arrow(root, sort_by="image_id")
    assert got.num_rows == want.num_rows
    assert got["image_id"].to_pylist() == want["image_id"].to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_vacuum_delta_retention(tmp_path):
    """Export-side GC: files dropped by a sync stay on disk while any
    retained log version references them (time travel), and are
    physically deleted once retention passes them by."""
    from moonlink_ray.export import sync_delta, vacuum_delta
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 96, rows_per_fragment=32)
    dest = str(tmp_path / "delta")
    export_delta(root, dest)
    v0_files = set(delta_active_files(dest))
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=96, n_ops=40)
    merge(root, cdc)
    out = sync_delta(root, dest)
    assert out["removed"] > 0
    dropped = v0_files - set(delta_active_files(dest))
    assert dropped and all(os.path.exists(p) for p in dropped)

    # keep_last=2 retains v0 -> nothing is deletable yet
    assert vacuum_delta(dest, keep_last=2)["deleted"] == 0
    assert all(os.path.exists(p) for p in dropped)
    # keep_last=1 retains only v1 -> v0-only files go away
    got_before = _duckdb_read(dest)
    rep = vacuum_delta(dest, keep_last=1)
    assert rep["deleted"] == len(dropped)
    assert not any(os.path.exists(p) for p in dropped)
    # the current version still reads identically after the vacuum
    assert _duckdb_read(dest).equals(got_before)
    # orphan debris (never referenced by any log version): a YOUNG
    # orphan is protected by the grace window (it may be a concurrent
    # sync's not-yet-committed data file) ...
    orphan = os.path.join(dest, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x")
    rep = vacuum_delta(dest, keep_last=1)
    assert rep["deleted"] == 0 and rep["skipped_young_orphans"] == 1
    assert os.path.exists(orphan)
    # ... and is swept once older than the grace
    assert vacuum_delta(dest, keep_last=1,
                        orphan_grace_s=0.0)["deleted"] == 1
    assert not os.path.exists(orphan)


@pytest.mark.usefixtures("ray_session")
def test_export_adopt_fanout(tmp_path, monkeypatch):
    """Above the threshold, clean-fragment adoption fans out through a
    Ray pass instead of a driver loop — same result, hardlinks
    included."""
    import moonlink_ray.export as ex
    monkeypatch.setattr(ex, "_RAY_ADOPT_THRESHOLD", 2)
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 96, rows_per_fragment=32)
    dest = str(tmp_path / "delta")
    out = export_delta(root, dest)
    assert out["hardlinked"] == out["files"] == 3
    adds = [a["add"] for a in _log_actions(dest) if "add" in a]
    assert all(os.stat(os.path.join(dest, a["path"])).st_nlink > 1
               for a in adds)
    got = _duckdb_read(dest)
    assert got.num_rows == 96


@pytest.mark.usefixtures("ray_session")
def test_export_to_mock_object_store(tmp_path):
    """Export dest routed through the pluggable fs seam: a mock://
    object-store destination gets the byte-copy adopt path (no
    hardlinks on object stores), the log via atomic text write, and is
    read back through delta_active_files + the dest fs only. (The mock
    store is per-process, so this covers the driver-side clean-export
    path; rewrites run in Ray workers and need a shared store.)"""
    from moonlink_ray.export import DELTA_LOG_DIR as LOG
    from moonlink_ray.fs import for_root
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 96, rows_per_fragment=32)
    dest = "mock://exports/delta1"
    out = export_delta(root, dest)
    assert out["hardlinked"] == out["files"] > 0
    destfs = for_root(dest)
    assert any(n.endswith(".json") for n in destfs.listdir(LOG))
    paths = delta_active_files(dest)
    total = 0
    for p in paths:
        rel = p.split("delta1/", 1)[1]
        total += destfs.read_parquet(rel).num_rows
    assert total == 96


def test_lance_export_gated(tmp_path):
    with pytest.raises(NotImplementedError, match="lance"):
        export_lance(str(tmp_path / "t"), str(tmp_path / "l"))


@pytest.mark.usefixtures("ray_session")
def test_sync_detects_type_only_schema_drift(tmp_path):
    """ALTER drop + re-add of a column NAME with a different type leaves
    fragment column names identical while the physical parquet type
    diverges from the published schemaString. The clean check compares
    full (name, type) pairs, so such fragments must be REWRITTEN (cast
    to the declared type), never hardlinked as clean."""
    from moonlink_ray.export import sync_delta
    from moonlink_ray.pipelines.compact import CompactionConfig, compact
    from moonlink_ray.schema import alter_table

    root = str(tmp_path / "t")
    bootstrap_images_table(root, 64, rows_per_fragment=16)
    alter_table(root, add=[("score", "int32")])
    # force-rewrite so fragments physically CONTAIN score:int32
    compact(root, mode="full",
            cfg=CompactionConfig(output_target_bytes=1 << 20))
    dest = str(tmp_path / "delta")
    out = export_delta(root, dest)
    assert out["hardlinked"] == out["files"] > 0  # clean at this point

    # type-only drift: same name, same position, wider type
    alter_table(root, drop=["score"])
    alter_table(root, add=[("score", "int64")])
    rep = sync_delta(root, dest)
    # every fragment stores int32 under a declared long -> all rewritten
    assert rep["added"] > 0 and rep["hardlinked"] == 0
    got = _duckdb_read(dest)
    import pyarrow as pa
    assert got.schema.field("score").type == pa.int64()
    last_log = sorted(p for p in os.listdir(os.path.join(dest, DELTA_LOG_DIR))
                      if p.endswith(".json"))[-1]
    acts = [json.loads(ln) for ln in
            open(os.path.join(dest, DELTA_LOG_DIR, last_log)) if ln.strip()]
    sch = json.loads([a for a in acts if "metaData" in a]
                     [-1]["metaData"]["schemaString"])
    assert [f for f in sch["fields"] if f["name"] == "score"][0]["type"] \
        == "long"


@pytest.mark.usefixtures("ray_session")
def test_vacuum_delta_keeps_iceberg_referenced_files(tmp_path):
    """Shared-dest layout: a dest holding BOTH exports — vacuum_delta
    must not delete data files the Iceberg metadata still references
    even when no retained Delta log version lists them."""
    from moonlink_ray.bootstrap import bootstrap_images_table
    from moonlink_ray.export import export_delta, vacuum_delta
    from moonlink_ray.iceberg import export_iceberg, iceberg_active_files

    root = str(tmp_path / "t")
    bootstrap_images_table(root, 80, rows_per_fragment=20)
    dest = str(tmp_path / "out")
    export_delta(root, dest)
    export_iceberg(root, dest)   # shares the same data files

    import json
    import os
    # forge a Delta log state where version 1 removes every file, so a
    # keep_last=1 vacuum would consider them all dead
    log_dir = os.path.join(dest, "_delta_log")
    adds = [json.loads(l) for l in open(os.path.join(
        log_dir, "00000000000000000000.json")) if '"add"' in l]
    removes = [json.dumps({"remove": {"path": a["add"]["path"],
                                      "deletionTimestamp": 1,
                                      "dataChange": True}})
               for a in adds]
    with open(os.path.join(log_dir, "00000000000000000001.json"),
              "w") as f:
        f.write("\n".join(removes) + "\n")

    rep = vacuum_delta(dest, keep_last=1, orphan_grace_s=0)
    # nothing deleted: every file is still referenced by the Iceberg
    # metadata tree sharing this dest
    for p in iceberg_active_files(dest):
        assert os.path.exists(p)
    assert rep["deleted"] == 0
