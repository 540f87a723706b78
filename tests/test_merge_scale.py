"""Scale-shape guarantees of MERGE: vectorized fold == brute-force
reducer, tombstone key set lives in range-sharded files (never on the
driver), and composite-key identity (IdentityProp::Keys analog,
/root/reference/src/moonlink/src/row/moonlink_row.rs:336-342)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import (append_dataset, bootstrap_images_table,
                                    write_cdc_parquet)
from moonlink_ray.manifest import init_table, load, read_lineage
from moonlink_ray.pipelines.merge import (_fold_bucket, _tombstone_pass,
                                          merge)
from moonlink_ray.sources.scan import scan_arrow
from moonlink_ray.table_config import set_table_config

_OPS = ("insert", "upsert", "delete")


def _ref_fold(group: pa.Table, key_columns=("image_id",)):
    """Brute-force per-key FIFO queue reducer (the pre-vectorization
    implementation, kept as the oracle)."""
    from moonlink_ray.stages.keys import canonical_keys
    rank_of = {"delete": 0, "insert": 1, "upsert": 1}
    lsn = group["_lsn"].to_numpy(zero_copy_only=False)
    seq = group["_seq"].to_numpy(zero_copy_only=False)
    ops = group["_op"].to_numpy(zero_copy_only=False)
    keys = canonical_keys(group, list(key_columns))
    rank = np.array([rank_of[o] for o in ops], dtype=np.int8)
    order = np.lexsort((rank, seq, lsn))
    pending: dict = {}
    for idx in order:
        op, k = ops[idx], keys[idx]
        lst = pending.get(k)
        if op == "insert":
            pending.setdefault(k, []).append(idx)
        elif op == "upsert":
            if lst:
                lst.pop(0)
            pending.setdefault(k, []).append(idx)
        else:
            if lst:
                lst.pop(0)
    surv = sorted(i for lst in pending.values() for i in lst)
    return np.asarray(surv, dtype=np.int64)


def test_fold_vectorized_matches_reference_loop():
    """Randomized interleavings (stacked inserts, missed deletes,
    same-LSN ties) — the vectorized reflected-walk fold must equal the
    sequential queue simulation exactly."""
    rng = np.random.default_rng(42)
    for trial in range(800):
        n = int(rng.integers(1, 50))
        nk = int(rng.integers(1, 7))
        g = pa.table({
            "image_id": pa.array([f"k{int(rng.integers(nk))}"
                                  for _ in range(n)]),
            "_op": pa.array([_OPS[int(rng.integers(3))] for _ in range(n)]),
            "_lsn": pa.array(rng.integers(0, 10, n).astype(np.int64)),
            "_seq": pa.array(rng.integers(0, 4, n).astype(np.int64)),
        })
        got, _ = _fold_bucket(g)
        want = _ref_fold(g)
        assert np.array_equal(got, want), (trial, g.to_pydict())


def test_fold_edge_cases():
    def fold(rows):
        g = pa.table({
            "image_id": pa.array([r[0] for r in rows]),
            "_op": pa.array([r[1] for r in rows]),
            "_lsn": pa.array([r[2] for r in rows], pa.int64()),
            "_seq": pa.array([r[3] for r in rows], pa.int64()),
        })
        got, _ = _fold_bucket(g)
        return list(got)

    # upsert on empty queue: pop misses, add survives
    assert fold([("a", "upsert", 1, 0)]) == [0]
    # delete-before-insert at equal (lsn, seq): delete misses
    assert fold([("a", "insert", 1, 0), ("a", "delete", 1, 0)]) == [0]
    # stacked inserts, one delete kills the EARLIEST
    assert fold([("a", "insert", 1, 0), ("a", "insert", 2, 0),
                 ("a", "delete", 3, 0)]) == [1]
    # miss then later delete consumes the first surviving add
    assert fold([("a", "upsert", 1, 0), ("a", "insert", 2, 0),
                 ("a", "delete", 3, 0)]) == [1]


@pytest.mark.usefixtures("ray_session")
def test_tombstone_shards_hold_exact_key_set(tmp_table, tmp_path):
    """The sharded tombstone pass partitions the exact upsert/delete key
    set into range shards on the table's filesystem; the driver record
    is O(shards) (files + ranges + counters), never the keys themselves."""
    snap = load(tmp_table)
    cdc_path = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc_path, n_base=200, n_ops=150)
    rec = _tombstone_pass(tmp_table, "tombrun", snap, [cdc_path],
                          ("image_id",), snap.max_lsn, {})

    cdc = pq.read_table(cdc_path, columns=["image_id", "_op", "_lsn"])
    fresh = cdc.filter(pa.compute.greater(cdc["_lsn"], snap.max_lsn))
    want = np.unique(fresh.filter(
        pa.compute.not_equal(fresh["_op"], "insert"))["image_id"]
        .to_numpy(zero_copy_only=False))

    # driver record holds no keys — only file refs, ranges, counters
    assert set(rec) == {"kind", "files", "ranges", "n_fresh", "max_lsn",
                        "tombstones"}
    assert rec["n_fresh"] == fresh.num_rows
    assert rec["max_lsn"] == int(pa.compute.max(fresh["_lsn"]).as_py())

    # reading every recorded (file, row-group) back yields EXACTLY the
    # tombstone key set, and each shard's keys fall in its range
    got = []
    for s, refs in rec["files"].items():
        lo, hi = rec["ranges"][s]
        for f, rg in refs:
            pf = pq.ParquetFile(
                os.path.join(tmp_table, "tmp", "merge-tombrun", "tomb", f))
            ks = pf.read_row_group(rg, columns=["key"])["key"] \
                .to_numpy(zero_copy_only=False)
            assert lo <= min(ks) and max(ks) <= hi
            got.append(ks)
    got = np.unique(np.concatenate(got))
    assert np.array_equal(got, want)
    # resume path: a second call with the lineage record is a no-op
    rec2 = _tombstone_pass(tmp_table, "tombrun", snap, [cdc_path],
                           ("image_id",), snap.max_lsn, {"tombstones": rec})
    assert rec2 is rec


def _two_fmt_table(n: int) -> pa.Table:
    """n image_ids x 2 fmt variants each — composite identity rows."""
    base = synth.build_rows(range(n))
    alt = base.set_column(
        base.column_names.index("fmt"),
        "fmt", pa.array(["alt"] * n, pa.string()))
    return pa.concat_tables([base, alt])


@pytest.mark.usefixtures("ray_session")
def test_composite_key_merge_vs_oracle(tmp_path):
    """MERGE keyed on (image_id, fmt): ops touch exactly the addressed
    variant, the other variant of the same image_id survives."""
    root = str(tmp_path / "tbl")
    init_table(root)
    set_table_config(root, {"identity.key_columns":
                            '["image_id", "fmt"]'})
    n = 60
    base = _two_fmt_table(n)
    append_dataset(root, base, max_lsn=0)

    rows = []  # (op, image_id, fmt, lsn)
    rng = np.random.default_rng(7)
    base_keys = {(r["image_id"], r["fmt"]) for r in base.to_pylist()}
    inserted = set()
    for j in range(80):
        i = int(rng.integers(n + 10))   # some fresh ids too
        fmt = ["png", "jpeg", "alt"][int(rng.integers(3))]
        op = _OPS[int(rng.integers(3))]
        key = (synth.image_id(i), fmt)
        if op == "insert" and (key in base_keys or key in inserted):
            op = "upsert"   # insert of a live key would append a
            # duplicate (REST-insert semantics) — out of scope here
        if op != "delete":
            inserted.add(key)
        rows.append((op, key[0], fmt, 100 + j))

    cols = {name: [] for name in synth.CDC_SCHEMA.names}
    for k, (op, iid, fmt, lsn) in enumerate(rows):
        content = synth.build_rows([k]).to_pylist()[0]
        cols["image_id"].append(iid)
        cols["fmt"].append(fmt)
        cols["_op"].append(op)
        cols["_lsn"].append(lsn)
        cols["_seq"].append(0)
        for c in ("bytes", "w", "h", "caption", "phash"):
            cols[c].append(content[c] if op != "delete" else None)
    cdc = pa.table(cols, schema=synth.CDC_SCHEMA)
    cdc_path = str(tmp_path / "cdc.parquet")
    pq.write_table(cdc, cdc_path)

    merge(root, cdc_path)

    # brute-force oracle keyed on (image_id, fmt)
    state = {}
    for r in base.to_pylist():
        state[(r["image_id"], r["fmt"])] = r
    for k, (op, iid, fmt, lsn) in enumerate(rows):
        key = (iid, fmt)
        if op == "delete":
            state.pop(key, None)
        else:
            content = synth.build_rows([k]).to_pylist()[0]
            content["image_id"], content["fmt"] = iid, fmt
            state[key] = content

    got = scan_arrow(root)
    assert got.num_rows == len(state)
    for r in got.to_pylist():
        want = state[(r["image_id"], r["fmt"])]
        for c in ("bytes", "caption", "phash", "w", "h"):
            assert r[c] == want[c], (r["image_id"], r["fmt"], c)

    # config round-trips: merge read key_columns from the table config
    assert load(root).job["key_columns"] == ["image_id", "fmt"]