"""Seeded randomized op-sequence test with invariants checked after every
commit (mirrors /root/reference/src/moonlink/src/table_handler/
chaos_test.rs:1-77: seeded generator, LSN monotonicity, deletes only of
committed rows, replayable by seed — seed printed on failure)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import bootstrap_images_table
from moonlink_ray.manifest import list_versions, load
from moonlink_ray.pipelines.cluster import cluster
from moonlink_ray.pipelines.compact import CompactionConfig, compact
from moonlink_ray.pipelines.expire import expire
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow

SEED = 1234
N_BASE = 150
STEPS = 12
CFG = CompactionConfig(min_victims=2, output_target_bytes=1024 * 1024)


def _rand_cdc(rng, live_ids, fresh_counter, lsn, n_ops):
    rows = {n: [] for n in synth.CDC_SCHEMA.names}
    content_base = 50_000 + lsn
    for j in range(n_ops):
        r = rng.random()
        if r < 0.5 and live_ids:
            op, iid = "upsert", live_ids[int(rng.integers(0, len(live_ids)))]
        elif r < 0.75:
            op, iid = "insert", synth.image_id(fresh_counter[0])
            fresh_counter[0] += 1
        elif live_ids:
            op, iid = "delete", live_ids[int(rng.integers(0, len(live_ids)))]
        else:
            op, iid = "insert", synth.image_id(fresh_counter[0])
            fresh_counter[0] += 1
        content = synth.build_rows([content_base + j]).to_pylist()[0] \
            if op != "delete" else None
        rows["image_id"].append(iid)
        rows["_op"].append(op)
        rows["_lsn"].append(lsn + j)
        rows["_seq"].append(0)
        for c in ("bytes", "w", "h", "fmt", "caption", "phash"):
            rows[c].append(content[c] if content else None)
    return pa.table(rows, schema=synth.CDC_SCHEMA), lsn + n_ops


def _oracle_apply(state, cdc):
    for row in sorted(cdc.to_pylist(), key=lambda r: (r["_lsn"], r["_seq"])):
        if row["_op"] == "delete":
            state.pop(row["image_id"], None)
        else:
            state[row["image_id"]] = row["caption"]
    return state


@pytest.mark.usefixtures("ray_session")
def test_chaos_sequence(tmp_path):
    rng = np.random.default_rng(SEED)
    root = str(tmp_path / "t")
    bootstrap_images_table(root, N_BASE, rows_per_fragment=32)
    state = {r["image_id"]: r["caption"]
             for r in scan_arrow(root).to_pylist()}
    fresh = [N_BASE]
    lsn = 100
    last_max_lsn = load(root).max_lsn
    old_cdc = None

    for step in range(STEPS):
        action = rng.choice(["merge", "merge", "compact", "cluster",
                             "expire", "replay"])
        ctx = f"seed={SEED} step={step} action={action}"
        if action == "merge":
            live = sorted(state)
            cdc, lsn = _rand_cdc(rng, live, fresh, lsn,
                                 int(rng.integers(5, 40)))
            path = str(tmp_path / f"cdc-{step}.parquet")
            pq.write_table(cdc, path)
            old_cdc = path
            merge(root, path)
            state = _oracle_apply(state, cdc)
        elif action == "compact":
            compact(root, mode="force", cfg=CFG)
        elif action == "cluster":
            cluster(root)
        elif action == "expire":
            expire(root, keep_last=3)
        elif action == "replay" and old_cdc:
            v_before = load(root).version
            merge(root, old_cdc)  # duplicate replay must be a no-op
            assert load(root).version == v_before, ctx

        snap = load(root)
        assert snap.max_lsn >= last_max_lsn, ctx  # LSN monotone
        last_max_lsn = snap.max_lsn
        assert snap.total_rows == len(state), ctx  # row accounting
        got = scan_arrow(root)
        assert got.num_rows == len(state), ctx
        caps = dict(zip(got["image_id"].to_pylist(),
                        got["caption"].to_pylist()))
        assert caps == state, ctx
        # fragment/stat consistency: stats bound the actual ids
        for f in snap.fragments:
            if f.rows and f.stats.get("image_id"):
                lo, hi = f.stats["image_id"]
                assert lo <= hi, ctx
