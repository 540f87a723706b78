"""MERGE INTO semantics vs a brute-force oracle.

Mirrors the reference's CDC-ordering scenarios
(/root/reference/src/moonlink/src/table_handler/tests.rs; FIXTURES.md F3).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import write_cdc_parquet
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow

COMPARE = ["image_id", "caption", "phash", "w", "h", "fmt", "bytes"]


def oracle_apply(base: pa.Table, cdc: pa.Table) -> dict:
    """Brute-force reducer: apply ops one-by-one in (lsn, seq,
    delete-before-insert) order to a dict keyed by image_id."""
    state = {}
    for row in base.to_pylist():
        state[row["image_id"]] = row
    rank = {"delete": 0, "insert": 1, "upsert": 1}
    rows = sorted(cdc.to_pylist(),
                  key=lambda r: (r["_lsn"], r["_seq"], rank[r["_op"]]))
    for r in rows:
        if r["_op"] == "delete":
            state.pop(r["image_id"], None)
        else:
            state[r["image_id"]] = {k: r[k] for k in COMPARE}
    return state


def assert_scan_matches(root, state):
    got = scan_arrow(root, sort_by="image_id")
    assert got.num_rows == len(state)
    for row in got.to_pylist():
        want = state[row["image_id"]]
        for c in COMPARE:
            assert row[c] == want[c], (row["image_id"], c)


def cdc_file(tmp_path, name, rows):
    """Build a CDC parquet from a list of (op, image_id, lsn, seq, content_i|None)."""
    cols = {n: [] for n in synth.CDC_SCHEMA.names}
    for op, iid, lsn, seq, ci in rows:
        content = synth.build_rows([ci]).to_pylist()[0] if ci is not None else None
        cols["image_id"].append(iid)
        cols["_op"].append(op)
        cols["_lsn"].append(lsn)
        cols["_seq"].append(seq)
        for c in ("bytes", "w", "h", "fmt", "caption", "phash"):
            cols[c].append(content[c] if content else None)
    t = pa.table(cols, schema=synth.CDC_SCHEMA)
    path = str(tmp_path / name)
    pq.write_table(t, path)
    return path, t


@pytest.mark.usefixtures("ray_session")
class TestMerge:
    def test_generated_cdc_vs_oracle(self, tmp_table, tmp_path):
        base = scan_arrow(tmp_table)
        cdc_path = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc_path, n_base=200, n_ops=150)
        cdc = pq.read_table(cdc_path)
        snap = merge(tmp_table, cdc_path, num_buckets=7)
        assert snap.version == 2
        assert_scan_matches(tmp_table, oracle_apply(base, cdc))

    def test_idempotent_replay(self, tmp_table, tmp_path):
        cdc_path = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc_path, n_base=200, n_ops=50)
        s1 = merge(tmp_table, cdc_path)
        before = scan_arrow(tmp_table, sort_by="image_id")
        s2 = merge(tmp_table, cdc_path)  # duplicate replay -> no-op
        assert s2.version == s1.version
        assert scan_arrow(tmp_table, sort_by="image_id").equals(before)

    def test_delete_flushed_row(self, tmp_table, tmp_path):
        base = scan_arrow(tmp_table)
        path, cdc = cdc_file(tmp_path, "c.parquet",
                             [("delete", "img-000000000003", 10, 0, None)])
        merge(tmp_table, path)
        assert_scan_matches(tmp_table, oracle_apply(base, cdc))

    def test_insert_then_delete_same_batch(self, tmp_table, tmp_path):
        base = scan_arrow(tmp_table)
        path, cdc = cdc_file(tmp_path, "c.parquet", [
            ("insert", "img-000000009000", 10, 0, 9000),
            ("delete", "img-000000009000", 11, 0, None),
        ])
        merge(tmp_table, path)
        state = oracle_apply(base, cdc)
        assert "img-000000009000" not in state
        assert_scan_matches(tmp_table, state)

    def test_update_as_delete_insert_one_lsn(self, tmp_table, tmp_path):
        base = scan_arrow(tmp_table)
        path, cdc = cdc_file(tmp_path, "c.parquet", [
            ("delete", "img-000000000005", 10, 0, None),
            ("insert", "img-000000000005", 10, 1, 7777),
        ])
        merge(tmp_table, path)
        state = oracle_apply(base, cdc)
        assert state["img-000000000005"]["caption"] == synth.gen_caption(7777)
        assert_scan_matches(tmp_table, state)

    def test_visibility_delete_before_later_insert(self, tmp_table, tmp_path):
        # delete at LSN 10 of a key only inserted at LSN 12 must NOT kill it
        base = scan_arrow(tmp_table)
        path, cdc = cdc_file(tmp_path, "c.parquet", [
            ("delete", "img-000000009001", 10, 0, None),
            ("insert", "img-000000009001", 12, 0, 9001),
        ])
        merge(tmp_table, path)
        state = oracle_apply(base, cdc)
        assert "img-000000009001" in state
        assert_scan_matches(tmp_table, state)

    def test_delete_if_exists_noop_on_miss(self, tmp_table, tmp_path):
        base = scan_arrow(tmp_table)
        path, cdc = cdc_file(tmp_path, "c.parquet",
                             [("delete", "img-999999999999", 10, 0, None)])
        s = merge(tmp_table, path)
        assert s.version == 2
        assert_scan_matches(tmp_table, oracle_apply(base, cdc))

    def test_identical_content_different_ids(self, tmp_table, tmp_path):
        base = scan_arrow(tmp_table)
        path, cdc = cdc_file(tmp_path, "c.parquet", [
            ("insert", "img-000000009100", 10, 0, 5555),
            ("insert", "img-000000009101", 11, 0, 5555),  # same content
            ("delete", "img-000000009100", 12, 0, None),
        ])
        merge(tmp_table, path)
        state = oracle_apply(base, cdc)
        assert "img-000000009101" in state and "img-000000009100" not in state
        assert_scan_matches(tmp_table, state)

    def test_out_of_order_rows_in_order_lsn(self, tmp_table, tmp_path):
        # physical row order in the CDC file is shuffled; LSN order must win
        base = scan_arrow(tmp_table)
        path, cdc = cdc_file(tmp_path, "c.parquet", [
            ("upsert", "img-000000000007", 13, 0, 301),
            ("upsert", "img-000000000007", 11, 0, 300),
            ("delete", "img-000000000008", 12, 0, None),
            ("upsert", "img-000000000008", 11, 0, 302),
        ])
        merge(tmp_table, path)
        state = oracle_apply(base, cdc)
        assert state["img-000000000007"]["caption"] == synth.gen_caption(301)
        assert "img-000000000008" not in state
        assert_scan_matches(tmp_table, state)

    def test_sequential_batches(self, tmp_table, tmp_path):
        base = scan_arrow(tmp_table)
        p1, c1 = cdc_file(tmp_path, "c1.parquet", [
            ("upsert", "img-000000000001", 10, 0, 400),
            ("insert", "img-000000009200", 11, 0, 401),
        ])
        p2, c2 = cdc_file(tmp_path, "c2.parquet", [
            ("delete", "img-000000009200", 20, 0, None),
            ("upsert", "img-000000000001", 21, 0, 402),
        ])
        merge(tmp_table, p1)
        merge(tmp_table, p2)
        state = oracle_apply(base, c1)
        state = oracle_apply(
            pa.table({k: [v[k] for v in state.values()] for k in COMPARE}), c2)
        assert_scan_matches(tmp_table, state)
        snap = load(tmp_table)
        assert snap.version == 3 and snap.max_lsn == 21
