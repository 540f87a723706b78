"""Per-fragment key-hash filters: FullRow fall-through deletes dispatch
reads ONLY to fragments whose filter admits a fall-through hash — the
batch analog of moonlink's persisted bucket hash index probe
(/root/reference/src/moonlink/src/storage/index/
persisted_bucket_hash_map.rs:25-310, search at :276-310)."""

import numpy as np
import pyarrow as pa
import pytest

from moonlink_ray import keyfilter as kf
from moonlink_ray import synth
from moonlink_ray.bootstrap import append_dataset
from moonlink_ray.manifest import init_table, load, read_lineage
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow
from moonlink_ray.table_config import set_table_config


class TestFilterKernel:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(7)
        for n in (1, 5, 100, 5000):
            h = rng.integers(np.iinfo(np.int64).min,
                             np.iinfo(np.int64).max, n, dtype=np.int64)
            f = kf.build(h)
            assert kf.might_contain(f, h).all()

    def test_fpr_reasonable(self):
        rng = np.random.default_rng(11)
        member = rng.integers(0, 1 << 62, 2000, dtype=np.int64)
        other = rng.integers(-(1 << 62), 0, 20000, dtype=np.int64)
        f = kf.build(member)
        fpr = kf.might_contain(f, other).mean()
        assert fpr < 0.05, fpr

    def test_empty_and_roundtrip(self):
        assert kf.build(np.empty(0, dtype=np.int64)) is None
        import json
        f = kf.build(np.array([1, 2, 3], dtype=np.int64))
        f2 = json.loads(json.dumps(f))  # manifest round-trip
        assert kf.might_contain(f2, np.array([1, 2, 3])).all()

    def test_bit_cap(self):
        h = np.arange(1_000_000, dtype=np.int64)
        f = kf.build(h)
        assert f["bits"] <= (1 << 16)
        assert kf.might_contain(f, h).all()  # degraded FPR, never FN


@pytest.mark.usefixtures("ray_session")
def test_fullrow_fallthrough_probes_only_matching_fragments(tmp_path):
    """A fall-through delete must open only the fragment(s) whose
    filter admits its row hash: the probe lineage record lists exactly
    the dispatched fragments, and _FullrowCandidates reads nothing
    else."""
    root = str(tmp_path / "t")
    init_table(root)
    set_table_config(root, {"identity.mode": "fullrow"})
    # 8 fragments of 16 rows each, disjoint row sets
    for part in range(8):
        append_dataset(root, synth.build_rows(
            range(part * 16, (part + 1) * 16)), max_lsn=0)
    snap = load(root)
    frags = [f for f in snap.fragments if f.rows > 0]
    assert len(frags) == 8
    assert all(f.keyfilter is not None for f in frags)

    # delete one specific base row (full-row op, no matching CDC insert
    # -> falls through to the base table)
    import pyarrow.parquet as pq
    victim = synth.build_rows([35]).to_pylist()[0]   # lives in fragment 2
    cols = {name: [] for name in synth.CDC_SCHEMA.names}
    for c in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"):
        cols[c].append(victim[c])
    cols["_op"].append("delete")
    cols["_lsn"].append(101)
    cols["_seq"].append(0)
    cdc = str(tmp_path / "cdc.parquet")
    pq.write_table(pa.table(cols, schema=synth.CDC_SCHEMA), cdc)

    run_id = "probetest"
    out = merge(root, cdc, run_id=run_id)

    # correctness: exactly that one row is gone
    got = scan_arrow(root)
    assert got.num_rows == 8 * 16 - 1
    assert victim["image_id"] not in got["image_id"].to_pylist() or \
        sum(i == victim["image_id"]
            for i in got["image_id"].to_pylist()) == 0

    # instrumentation: only filter-admitted fragments were dispatched
    rec = read_lineage(root, run_id)["fullrow-probe"]
    from moonlink_ray.stages.keys import row_hash
    vh = row_hash(synth.build_rows([35]))[0]
    must_probe = {f.fragment_id for f in frags
                  if kf.might_contain(f.keyfilter,
                                      np.array([vh], np.int64))[0]}
    assert set(rec["probed"]) == must_probe
    assert rec["pruned"] == 8 - len(must_probe)
    # the true holder is always admitted (no false negatives) and the
    # filter pruned the clear majority of the table
    holder = [f.fragment_id for f in frags
              if f.stats.get("image_id")
              and f.stats["image_id"][0] <= victim["image_id"]
              <= f.stats["image_id"][1]]
    assert set(holder) <= must_probe
    assert rec["pruned"] >= 5
    m = out.job["metrics"]
    assert m["fullrow_probed"] == len(must_probe)
    assert m["fullrow_pruned"] == rec["pruned"]


@pytest.mark.usefixtures("ray_session")
def test_fullrow_prefilter_fragments_still_probed(tmp_path):
    """Fragments from manifests written before the filter existed
    (keyfilter=None) are probed unconditionally — conservative, never
    wrong."""
    root = str(tmp_path / "t")
    init_table(root)
    set_table_config(root, {"identity.mode": "fullrow"})
    append_dataset(root, synth.build_rows(range(16)), max_lsn=0)
    # simulate a pre-upgrade manifest: strip the filters in place
    import json as _json
    from moonlink_ray.fs import for_root
    fs = for_root(root)
    snap = load(root)
    raw = _json.loads(fs.read_text(f"snapshots/v{snap.version}.json"))
    for f in raw["fragments"]:
        f["keyfilter"] = None
    fs.write_text_atomic(f"snapshots/v{snap.version}.json",
                         _json.dumps(raw))

    import pyarrow.parquet as pq
    victim = synth.build_rows([3]).to_pylist()[0]
    cols = {name: [] for name in synth.CDC_SCHEMA.names}
    for c in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"):
        cols[c].append(victim[c])
    cols["_op"].append("delete")
    cols["_lsn"].append(11)
    cols["_seq"].append(0)
    cdc = str(tmp_path / "cdc.parquet")
    pq.write_table(pa.table(cols, schema=synth.CDC_SCHEMA), cdc)
    merge(root, cdc, run_id="prefilter")
    assert scan_arrow(root).num_rows == 15
    rec = read_lineage(root, "prefilter")["fullrow-probe"]
    assert rec["pruned"] == 0 and len(rec["probed"]) == 1
