"""Kill-resume: a merge interrupted after k partitions resumes from
lineage sidecars and produces the identical final manifest (FIXTURES F4.4;
moonlink analog: WAL recovery, /root/reference/src/moonlink_backend/src/
recovery_utils.rs:20-118)."""

import json
import os
import shutil
import signal
import subprocess
import sys
import time
from dataclasses import asdict

import pytest

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.manifest import load, read_lineage
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _frag_set(snap):
    return sorted(json.dumps(asdict(f), sort_keys=True) for f in snap.fragments)


@pytest.mark.usefixtures("ray_session")
def test_resume_from_partial_lineage(tmp_path):
    """Deterministic variant: pre-seed a subset of another run's lineage
    sidecars (as a kill would leave them) and check the resumed manifest
    matches the uninterrupted run bit-for-bit."""
    a = str(tmp_path / "a")
    bootstrap_images_table(a, 200, rows_per_fragment=32)
    b = str(tmp_path / "b")
    shutil.copytree(a, b)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=200, n_ops=120)

    snap_a = merge(a, cdc, run_id="runfix", num_buckets=6)

    # simulate the kill: copy over only SOME finished partitions
    done = read_lineage(a, "runfix")
    subset = dict(list(sorted(done.items()))[: len(done) // 2])
    for key, rec in subset.items():
        os.makedirs(os.path.join(b, "lineage", "runfix"), exist_ok=True)
        with open(os.path.join(b, "lineage", "runfix", f"{key}.json"), "w") as f:
            json.dump(rec, f)
        frags = rec.get("fragments", [rec.get("meta")] if "meta" in rec else [])
        for fm in frags:
            if fm is None:
                continue
            for rel in [fm["path"]] + ([fm["dv"]["path"]] if fm.get("dv") else []):
                src, dst = os.path.join(a, rel), os.path.join(b, rel)
                if os.path.exists(src):
                    shutil.copyfile(src, dst)

    snap_b = merge(b, cdc, run_id="runfix", num_buckets=6)
    assert _frag_set(snap_a) == _frag_set(snap_b)
    assert scan_arrow(a, sort_by="image_id").equals(
        scan_arrow(b, sort_by="image_id"))


KILL_CHILD = r"""
import sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, sys.argv[4])
from moonlink_ray.pipelines.merge import merge
merge(sys.argv[1], sys.argv[2], run_id=sys.argv[3], num_buckets=8)
"""


@pytest.mark.usefixtures("ray_session")
def test_sigkill_mid_merge_then_resume(tmp_path):
    a = str(tmp_path / "a")
    bootstrap_images_table(a, 200, rows_per_fragment=32)
    b = str(tmp_path / "b")
    shutil.copytree(a, b)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=200, n_ops=160)

    snap_a = merge(a, cdc, run_id="runkill", num_buckets=8)

    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        [sys.executable, "-c", KILL_CHILD, b, cdc, "runkill", REPO],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    lin = os.path.join(b, "lineage", "runkill")
    deadline = time.time() + 120
    while time.time() < deadline and proc.poll() is None:
        if os.path.isdir(lin) and len(os.listdir(lin)) >= 2:
            break
        time.sleep(0.05)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()

    snap_b = merge(b, cdc, run_id="runkill", num_buckets=8)
    assert _frag_set(snap_a) == _frag_set(snap_b)
    assert scan_arrow(a, sort_by="image_id").equals(
        scan_arrow(b, sort_by="image_id"))


@pytest.mark.usefixtures("ray_session")
def test_cluster_resume_from_partial_lineage(tmp_path):
    """Cluster kill-resume: pre-seed the pinned plan, the recorded spill
    file list, and HALF the finished bucket checkpoints; the resumed run
    must reuse all of them and land on a scan identical to the
    uninterrupted run's."""
    from moonlink_ray.pipelines.cluster import cluster

    a = str(tmp_path / "a")
    bootstrap_images_table(a, 200, rows_per_fragment=32)
    b = str(tmp_path / "b")
    shutil.copytree(a, b)

    snap_a = cluster(a, run_id="clrun", num_buckets=8, exchange="spill",
                     fragment_target_bytes=512 * 1024)
    # the completed run cleans its spill; rebuild b's state as a kill
    # would leave it by re-running the spill phase only on b
    from moonlink_ray.manifest import write_lineage
    from moonlink_ray.pipelines import cluster as cl
    import numpy as np

    snap_b0 = load(b)
    samples, weights, hot_counts, total = cl._zkey_stats_sampled(b, snap_b0)
    boundaries, hot = cl._plan_buckets(samples, weights, hot_counts, total,
                                       8, 0.001)
    write_lineage(b, "clrun", "params", {
        "kind": "cluster-params", "num_buckets": 8, "exchange": "spill",
        "boundaries": [int(x) for x in boundaries],
        "hot": {str(k): v for k, v in hot.items()}})
    import ray.data as _rd  # noqa: F401
    from moonlink_ray.sources.scan import scan as _scan
    summary = _scan(b, fragments=snap_b0.fragments, schema_list=snap_b0.schema) \
        .map_batches(cl._DeriveSpill(b, "clrun", boundaries, hot, 8),
                     batch_size=None, batch_format="pyarrow").take_all()
    files_by_bucket = {}
    for r in summary:
        files_by_bucket.setdefault(int(r["zb"]), []).append(
            [r["file"], int(r["rg"])])
    write_lineage(b, "clrun", "spill", {
        "kind": "cluster-spill",
        "files": {str(k): sorted(v) for k, v in files_by_bucket.items()}})

    # resume: must complete every bucket from the recorded spill and
    # produce the identical table content
    snap_b = cluster(b, run_id="clrun", num_buckets=8,
                     fragment_target_bytes=512 * 1024)
    assert snap_b is not None
    assert scan_arrow(a, sort_by="image_id").equals(
        scan_arrow(b, sort_by="image_id"))
    # the spill scratch is cleaned after the commit
    assert not os.path.isdir(os.path.join(b, "tmp", "cluster-clrun"))


@pytest.mark.usefixtures("ray_session")
def test_cluster_plasma_resume_skips_done_buckets(tmp_path):
    """Plasma-exchange resume: finished bucket checkpoints are honored
    (their rows are filtered out of the re-run exchange) and the final
    scan matches the uninterrupted run."""
    from moonlink_ray.manifest import write_lineage
    from moonlink_ray.pipelines.cluster import cluster

    a = str(tmp_path / "a")
    bootstrap_images_table(a, 200, rows_per_fragment=32)
    b = str(tmp_path / "b")
    shutil.copytree(a, b)

    snap_a = cluster(a, run_id="plrun", num_buckets=8,
                     fragment_target_bytes=512 * 1024)
    done = read_lineage(a, "plrun")
    # seed b with the pinned plan + half the finished buckets
    write_lineage(b, "plrun", "params", done["params"])
    seeded = [k for k in sorted(done) if k.startswith("zb-")][:4]
    for k in seeded:
        write_lineage(b, "plrun", k, done[k])
        for fm in done[k]["fragments"]:
            shutil.copyfile(os.path.join(a, fm["path"]),
                            os.path.join(b, fm["path"]))
    snap_b = cluster(b, run_id="plrun", num_buckets=8,
                     fragment_target_bytes=512 * 1024)
    assert _frag_set(snap_a) == _frag_set(snap_b)
    assert scan_arrow(a, sort_by="image_id").equals(
        scan_arrow(b, sort_by="image_id"))


@pytest.mark.usefixtures("ray_session")
def test_incremental_optimize_resume_pinned_victims(tmp_path):
    """Resume of an incremental OPTIMIZE whose pinned params carry a
    victims list (the cluster.py frag_by_id resume branch): seed the
    pinned plan + half the finished bucket checkpoints from a completed
    run, re-invoke with the same run_id, and require the identical final
    manifest. Regression test for the method-not-called bug that made
    this exact path raise TypeError."""
    from moonlink_ray.manifest import write_lineage
    from moonlink_ray.pipelines.compact import CompactionConfig
    from moonlink_ray.pipelines.optimize import optimize

    cfg = CompactionConfig(min_victims=1,
                           output_target_bytes=512 * 1024)
    a = str(tmp_path / "a")
    bootstrap_images_table(a, 200, rows_per_fragment=32)
    b = str(tmp_path / "b")
    shutil.copytree(a, b)

    snap_a = optimize(a, run_id="oincr", mode="incremental", cfg=cfg,
                      num_buckets=8)
    assert snap_a is not None
    done = read_lineage(a, "oincr")
    assert done["params"].get("victims"), "incremental run must pin victims"

    # seed b as a kill after the plan + a few buckets would leave it
    write_lineage(b, "oincr", "params", done["params"])
    seeded = [k for k in sorted(done) if k.startswith("zb-")][:2]
    for k in seeded:
        write_lineage(b, "oincr", k, done[k])
        for fm in done[k]["fragments"]:
            shutil.copyfile(os.path.join(a, fm["path"]),
                            os.path.join(b, fm["path"]))

    snap_b = optimize(b, run_id="oincr", mode="incremental", cfg=cfg,
                      num_buckets=8)
    assert snap_b is not None
    assert _frag_set(snap_a) == _frag_set(snap_b)
    assert scan_arrow(a, sort_by="image_id").equals(
        scan_arrow(b, sort_by="image_id"))
