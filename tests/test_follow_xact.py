"""StreamFlush semantics in FOLLOW: one streaming transaction spans
multiple CDC files (its flushes), becomes visible atomically at its
commit marker's LSN, and is discarded wholesale on abort — the batch
analog of moonlink's per-xact buffering with flush
(/root/reference/src/moonlink/src/storage/mooncake_table/
transaction_stream.rs:17-41, StreamFlush/StreamCommit/StreamAbort WAL
events storage/wal.rs:78-100; interleavings mirror
table_handler/tests.rs shapes)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import bootstrap_images_table
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.follow import poll_once
from moonlink_ray.pipelines.xact import pending_xacts
from moonlink_ray.sources.scan import scan_arrow


def _cdc_file(path, rows):
    """rows: (op, image_id_index_or_id, lsn, xid_or_None)."""
    cols = {name: [] for name in synth.CDC_SCHEMA.names}
    xids = []
    for op, iid, lsn, xid in rows:
        iid = synth.image_id(iid) if isinstance(iid, int) else iid
        content = (synth.build_rows([hash(iid) % 100], content_offset=50)
                   .to_pylist()[0] if op in ("insert", "upsert") else None)
        cols["image_id"].append(iid)
        cols["_op"].append(op)
        cols["_lsn"].append(lsn)
        cols["_seq"].append(len(xids))
        for c in ("bytes", "w", "h", "fmt", "caption", "phash"):
            cols[c].append(content[c] if content else None)
        xids.append(xid)
    t = pa.table(cols, schema=synth.CDC_SCHEMA)
    t = t.append_column("_xid", pa.array(xids, pa.int64()))
    pq.write_table(t, path)
    return path


def _ids(root):
    return set(scan_arrow(root, columns=["image_id"])["image_id"]
               .to_pylist())


@pytest.mark.usefixtures("ray_session")
class TestStreamFlush:
    def test_flushed_xact_invisible_until_commit(self, tmp_path):
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 50, rows_per_fragment=16)
        cdc = str(tmp_path / "in")
        os.makedirs(cdc)

        # flush 1: xid 7 inserts a fresh id and deletes a base row;
        # one plain (no-xid) insert rides the same file
        _cdc_file(os.path.join(cdc, "f-0001.parquet"), [
            ("insert", 900, 101, 7),
            ("delete", 0, 102, 7),
            ("insert", 950, 103, None),
        ])
        snap, n = poll_once(root, cdc)
        assert n == 1
        got = _ids(root)
        assert synth.image_id(950) in got          # plain op applied
        assert synth.image_id(900) not in got      # xact withheld
        assert synth.image_id(0) in got            # xact delete withheld
        assert set(pending_xacts(root)) == {7}
        assert snap.max_lsn == 103

        # flush 2 + commit marker at LSN 120
        _cdc_file(os.path.join(cdc, "f-0002.parquet"), [
            ("insert", 901, 104, 7),
            ("commit", 902, 120, 7),
        ])
        snap, n = poll_once(root, cdc)
        got = _ids(root)
        assert synth.image_id(900) in got
        assert synth.image_id(901) in got
        assert synth.image_id(0) not in got
        assert pending_xacts(root) == {}
        assert snap.max_lsn == 120                 # commit LSN, not op LSN

    def test_abort_spans_files(self, tmp_path):
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 30, rows_per_fragment=16)
        before = _ids(root)
        cdc = str(tmp_path / "in")
        os.makedirs(cdc)
        _cdc_file(os.path.join(cdc, "f-0001.parquet"), [
            ("insert", 910, 201, 9),
            ("delete", 1, 202, 9),
        ])
        poll_once(root, cdc)
        assert set(pending_xacts(root)) == {9}
        _cdc_file(os.path.join(cdc, "f-0002.parquet"), [
            ("abort", 911, 210, 9),
        ])
        snap, _ = poll_once(root, cdc)
        assert _ids(root) == before                # nothing ever applied
        assert pending_xacts(root) == {}

    def test_commit_lsn_orders_against_interleaved_ops(self, tmp_path):
        """A flushed delete at op-LSN 100 committed at LSN 120 applies
        AFTER a plain upsert at 110 that arrived between the flush and
        the commit — visibility is at commit LSN (the reference's
        snapshot rule: the xact's ops carry its commit point)."""
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 10, rows_per_fragment=8)
        victim = synth.image_id(3)
        cdc = str(tmp_path / "in")
        os.makedirs(cdc)
        _cdc_file(os.path.join(cdc, "f-0001.parquet"),
                  [("delete", 3, 100, 5)])
        poll_once(root, cdc)
        assert victim in _ids(root)
        _cdc_file(os.path.join(cdc, "f-0002.parquet"),
                  [("upsert", 3, 110, None)])
        poll_once(root, cdc)
        assert victim in _ids(root)
        _cdc_file(os.path.join(cdc, "f-0003.parquet"),
                  [("commit", 0, 120, 5)])
        poll_once(root, cdc)
        assert victim not in _ids(root)            # delete won at 120
        # and a later plain insert revives it
        _cdc_file(os.path.join(cdc, "f-0004.parquet"),
                  [("insert", 3, 130, None)])
        poll_once(root, cdc)
        assert victim in _ids(root)

    def test_crash_replay_is_idempotent(self, tmp_path):
        """Losing the cursor after a poll (crash between merge commit
        and cursor write) re-resolves to a no-op: staged rows are not
        duplicated and the replayed commit is floor-LSN-discarded."""
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 20, rows_per_fragment=8)
        cdc = str(tmp_path / "in")
        os.makedirs(cdc)
        _cdc_file(os.path.join(cdc, "f-0001.parquet"), [
            ("insert", 920, 301, 11),
            ("insert", 921, 302, None),
        ])
        poll_once(root, cdc)
        staged_once = pending_xacts(root)
        cursor = os.path.join(root, "follow.cursor.json")
        os.remove(cursor)                          # crash: cursor lost
        poll_once(root, cdc)                       # replay same file
        # staged exactly once, not twice: replay cleared its own files
        assert pending_xacts(root) == staged_once
        _cdc_file(os.path.join(cdc, "f-0002.parquet"),
                  [("commit", 0, 320, 11)])
        poll_once(root, cdc)
        os.remove(cursor)
        snap_before = load(root)
        poll_once(root, cdc)                       # replay commit batch
        got = _ids(root)
        assert synth.image_id(920) in got and synth.image_id(921) in got
        # replay merged nothing new: same row multiset
        t = scan_arrow(root, columns=["image_id"])
        assert t.num_rows == 22
        assert load(root).max_lsn == snap_before.max_lsn
