"""FullRow identity mode (REPLICA IDENTITY FULL analog,
/root/reference/src/moonlink/src/row/moonlink_row.rs:343-349 and the
positional-zip delete matching, mooncake_table/snapshot.rs:818-824):
duplicates allowed, identity = whole row, a delete kills exactly one
instance. Verified against a brute-force multiset oracle."""

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import append_dataset
from moonlink_ray.manifest import init_table, load
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow
from moonlink_ray.table_config import set_table_config

COMPARE = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")


def _row_key(r) -> tuple:
    return tuple(r[c] for c in COMPARE)


def _fullrow_table(tmp_path, n=20, dup_of=(0, 1, 1)):
    """Base table with duplicate full rows: indices in dup_of are
    appended a second (or third) time, byte-identical."""
    root = str(tmp_path / "t")
    init_table(root)
    set_table_config(root, {"identity.mode": "fullrow"})
    base = synth.build_rows(range(n))
    dups = synth.build_rows(list(dup_of))
    append_dataset(root, pa.concat_tables([base, dups]), max_lsn=0)
    return root, pa.concat_tables([base, dups])


def _cdc(tmp_path, rows):
    """rows: (op, source_row: dict|int, lsn). int = synth index."""
    cols = {name: [] for name in synth.CDC_SCHEMA.names}
    for op, src, lsn in rows:
        r = (synth.build_rows([src]).to_pylist()[0]
             if isinstance(src, int) else src)
        for c in COMPARE:
            cols[c].append(r[c])
        cols["_op"].append(op)
        cols["_lsn"].append(lsn)
        cols["_seq"].append(0)
    path = str(tmp_path / "cdc_fullrow.parquet")
    pq.write_table(pa.table(cols, schema=synth.CDC_SCHEMA), path)
    return path


@pytest.mark.usefixtures("ray_session")
def test_fullrow_delete_kills_exactly_one_instance(tmp_path):
    root, base = _fullrow_table(tmp_path)  # img 0 x2, img 1 x3
    want = Counter(_row_key(r) for r in base.to_pylist())

    row0 = synth.build_rows([0]).to_pylist()[0]
    row1 = synth.build_rows([1]).to_pylist()[0]
    fresh = synth.build_rows([500]).to_pylist()[0]
    missing = synth.build_rows([900]).to_pylist()[0]
    cdc = _cdc(tmp_path, [
        ("delete", row0, 101),    # kills ONE of the two img-0 copies
        ("delete", row1, 102),    # kills ONE of the three img-1 copies
        ("insert", fresh, 103),
        ("insert", fresh, 104),   # identical row stacks: 2 copies
        ("delete", missing, 105),  # absent row: no-op
    ])
    merge(root, cdc)

    want[_row_key(row0)] -= 1
    want[_row_key(row1)] -= 1
    want[_row_key(fresh)] += 2
    want = Counter({k: v for k, v in want.items() if v > 0})

    got = Counter(_row_key(r) for r in scan_arrow(root).to_pylist())
    assert got == want
    # the hidden _rowhash column never surfaces in scans
    assert "_rowhash" not in scan_arrow(root).column_names
    m = load(root).job["metrics"]
    assert m["fullrow_fallthrough"] == 3  # two hits + one miss attempted


@pytest.mark.usefixtures("ray_session")
def test_fullrow_in_batch_insert_then_delete(tmp_path):
    root, base = _fullrow_table(tmp_path, dup_of=())
    want = Counter(_row_key(r) for r in base.to_pylist())
    fresh = synth.build_rows([700]).to_pylist()[0]
    cdc = _cdc(tmp_path, [
        ("insert", fresh, 201),
        ("insert", fresh, 202),
        ("delete", fresh, 203),   # consumes the EARLIEST pending copy
    ])
    merge(root, cdc)
    want[_row_key(fresh)] += 1
    got = Counter(_row_key(r) for r in scan_arrow(root).to_pylist())
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_fullrow_replay_is_idempotent(tmp_path):
    root, _ = _fullrow_table(tmp_path)
    row1 = synth.build_rows([1]).to_pylist()[0]
    cdc = _cdc(tmp_path, [("delete", row1, 301)])
    snap1 = merge(root, cdc)
    before = Counter(_row_key(r) for r in scan_arrow(root).to_pylist())
    snap2 = merge(root, cdc)  # stale LSN -> no-op
    assert snap2.version == snap1.version
    after = Counter(_row_key(r) for r in scan_arrow(root).to_pylist())
    assert before == after

@pytest.mark.usefixtures("ray_session")
def test_fullrow_dv_writes_fan_out_identically(tmp_path, monkeypatch):
    """With the Ray fan-out threshold forced to 1, FullRow fall-through
    DV sidecars are written by tasks instead of the driver loop — the
    committed table must be identical (same multiset, cumulative DVs
    unioned with pre-existing ones)."""
    from moonlink_ray.pipelines import merge as merge_mod
    monkeypatch.setattr(merge_mod, "_RAY_DV_THRESHOLD", 1)

    root, base = _fullrow_table(tmp_path, n=20, dup_of=(0, 1, 1))
    want = Counter(_row_key(r) for r in base.to_pylist())
    # first merge puts a DV on img-0's fragment; second unions into it
    row0 = synth.build_rows([0]).to_pylist()[0]
    row1 = synth.build_rows([1]).to_pylist()[0]
    merge(root, _cdc(tmp_path, [("delete", row0, 101)]))
    merge(root, _cdc(tmp_path, [("delete", row0, 201),
                                ("delete", row1, 202)]))
    want[_row_key(row0)] -= 2
    want[_row_key(row1)] -= 1
    want = Counter({k: v for k, v in want.items() if v > 0})
    got = Counter(_row_key(r) for r in scan_arrow(root).to_pylist())
    assert got == want
    assert load(root).job["metrics"]["dv_fragments"] >= 1
