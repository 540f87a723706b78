"""Reader handoff (scan_manifest): an external engine — DuckDB here —
reads a snapshot from the plain-data file list + DV anti-join alone,
matching scan_arrow exactly. Analog of moonlink's scan_table_begin
metadata handoff (/root/reference/src/moonlink_table_metadata/src/
table_metadata.rs:9-23)."""

import duckdb
import pytest

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow, scan_manifest


def _duckdb_read(handoff, cols=("image_id", "caption", "phash")):
    """Consume the handoff with DuckDB only: per fragment, restrict to
    its ``row_span`` (adopted-file fragments share one physical file)
    and anti-join the span-relative row position against the DV
    sidecar."""
    con = duckdb.connect()
    sel = ", ".join(cols)
    parts = []
    for f in handoff["fragments"]:
        span = f.get("row_span")
        lo = span[0] if span else 0
        q = (f"SELECT {sel} FROM read_parquet('{f['path']}', "
             f"file_row_number=true) WHERE 1=1")
        if span:
            q += (f" AND file_row_number >= {span[0]}"
                  f" AND file_row_number < {span[1]}")
        if f["dv_path"]:
            q += (f" AND file_row_number - {lo} NOT IN "
                  f"(SELECT pos FROM read_parquet('{f['dv_path']}'))")
        parts.append(q)
    sql = " UNION ALL ".join(parts) + " ORDER BY image_id"
    return con.execute(sql).fetch_arrow_table()


@pytest.mark.usefixtures("ray_session")
def test_duckdb_reads_snapshot_via_handoff(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 150, rows_per_fragment=32)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=150, n_ops=90)
    merge(root, cdc)  # creates DVs + new fragments

    handoff = scan_manifest(root)
    snap = load(root)
    assert handoff["version"] == snap.version
    assert handoff["max_lsn"] == snap.max_lsn
    assert any(f["dv_count"] > 0 for f in handoff["fragments"])
    assert [c for c, _ in handoff["schema"]][:2] == ["image_id", "bytes"]

    got = _duckdb_read(handoff)
    want = scan_arrow(root, sort_by="image_id",
                      columns=["image_id", "caption", "phash"])
    assert got.num_rows == want.num_rows
    assert got["image_id"].to_pylist() == want["image_id"].to_pylist()
    assert got["caption"].to_pylist() == want["caption"].to_pylist()
    assert got["phash"].to_pylist() == want["phash"].to_pylist()

    # snapshot isolation: the handoff of version V stays valid verbatim
    # after a later commit
    v = handoff["version"]
    cdc2 = str(tmp_path / "cdc2.parquet")
    write_cdc_parquet(cdc2, n_base=150, n_ops=40, start_lsn=10_000)
    merge(root, cdc2)
    again = _duckdb_read(scan_manifest(root, version=v))
    assert again.equals(got)

    # at_lsn resolution mirrors scan --at-lsn
    h2 = scan_manifest(root, at_lsn=snap.max_lsn)
    assert h2["version"] >= v and h2["max_lsn"] <= snap.max_lsn


@pytest.mark.usefixtures("ray_session")
def test_duckdb_reads_multispan_adopted_file(tmp_path):
    """A CDC file whose row groups split into SEVERAL adoption spans:
    the handoff's row_span + span-relative DV contract must hold for an
    external reader on every span, not just span 0."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    bootstrap_images_table(root, 120, rows_per_fragment=32)
    cdc = str(tmp_path / "cdc.parquet")
    # tiny row groups + a tiny span target force multiple spans per file
    write_cdc_parquet(cdc, n_base=120, n_ops=200)
    t = pq.read_table(cdc)
    pq.write_table(t, cdc, row_group_size=16)

    from moonlink_ray.pipelines import merge as merge_mod
    spans = merge_mod._cdc_spans([cdc], target_bytes=1)
    assert len(spans) > 3  # one span per row group at target 1

    orig = merge_mod._cdc_spans
    merge_mod._cdc_spans = lambda paths, target_bytes=1: orig(paths, 1)
    try:
        merge(root, cdc)
    finally:
        merge_mod._cdc_spans = orig

    handoff = scan_manifest(root)
    multi = [f for f in handoff["fragments"]
             if f["row_span"] and f["row_span"][0] > 0]
    assert multi, "expected adopted fragments beyond file row 0"
    got = _duckdb_read(handoff)
    want = scan_arrow(root, sort_by="image_id",
                      columns=["image_id", "caption", "phash"])
    assert got["image_id"].to_pylist() == want["image_id"].to_pylist()
    assert got["caption"].to_pylist() == want["caption"].to_pylist()
