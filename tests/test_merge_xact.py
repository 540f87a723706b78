"""Streaming-transaction abort semantics in MERGE (the batch analog of
moonlink's per-xact buffering with abort: /root/reference/src/moonlink/
src/storage/mooncake_table/transaction_stream.rs:17-41 and the
StreamAbort WAL event, storage/wal.rs:78-100): a CDC row with
_op="abort" discards EVERY op of its _xid in the batch — inserts never
appear, deletes never kill base rows."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import bootstrap_images_table
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow


def _cdc_with_xids(tmp_path, rows):
    """rows: (op, image_id_index_or_id, lsn, xid). Content from synth."""
    cols = {name: [] for name in synth.CDC_SCHEMA.names}
    xids = []
    for op, iid, lsn, xid in rows:
        iid = synth.image_id(iid) if isinstance(iid, int) else iid
        content = (synth.build_rows([hash(iid) % 100], content_offset=50)
                   .to_pylist()[0] if op in ("insert", "upsert") else None)
        cols["image_id"].append(iid)
        cols["_op"].append(op)
        cols["_lsn"].append(lsn)
        cols["_seq"].append(0)
        for c in ("bytes", "w", "h", "fmt", "caption", "phash"):
            cols[c].append(content[c] if content else None)
        xids.append(xid)
    t = pa.table(cols, schema=synth.CDC_SCHEMA)
    t = t.append_column("_xid", pa.array(xids, pa.int64()))
    path = str(tmp_path / "cdc_xact.parquet")
    pq.write_table(t, path)
    return path


@pytest.mark.usefixtures("ray_session")
def test_aborted_xact_ops_are_discarded(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 50, rows_per_fragment=16)
    base = scan_arrow(root, columns=["image_id"])
    base_ids = set(base["image_id"].to_pylist())

    # xact 7 (aborted): an insert of a fresh id AND a delete of a base
    # row; xact 8 (committed): an insert + a delete
    rows = [
        ("insert", 900, 101, 7),
        ("delete", 0, 102, 7),
        ("abort", 901, 103, 7),       # marker: xid 7 never committed
        ("insert", 910, 104, 8),
        ("delete", 1, 105, 8),
    ]
    snap = merge(root, _cdc_with_xids(tmp_path, rows))

    got = set(scan_arrow(root, columns=["image_id"])["image_id"].to_pylist())
    # aborted insert absent, aborted delete did NOT kill img 0
    assert synth.image_id(900) not in got
    assert synth.image_id(0) in got
    # committed xact applied
    assert synth.image_id(910) in got
    assert synth.image_id(1) not in got
    assert got - {synth.image_id(910)} == base_ids - {synth.image_id(1)}
    # the abort marker itself is a control row, never data
    assert snap.total_rows == len(base_ids)  # -1 delete +1 insert


@pytest.mark.usefixtures("ray_session")
def test_abort_marker_after_replay_is_idempotent(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 30, rows_per_fragment=16)
    rows = [("insert", 800, 201, 3), ("abort", 801, 202, 3),
            ("upsert", 2, 203, 4)]
    p = _cdc_with_xids(tmp_path, rows)
    snap1 = merge(root, p)
    snap2 = merge(root, p)   # replay: all LSNs stale -> no-op
    assert snap2.version == snap1.version
    got = set(scan_arrow(root, columns=["image_id"])["image_id"].to_pylist())
    assert synth.image_id(800) not in got and synth.image_id(2) in got