"""Isolate the fused-OPTIMIZE bucket phase: same recorded spill, two
widths, fresh process each. Reports wall, per-bucket wall quantiles,
and guest-wide CPU jiffies consumed (from /proc/stat) so per-task
dilation (CPU inflation) separates from starvation (low utilization).

Usage:
  python bucketprobe.py prep        # fresh copy + plan + spill, prints root
  taskset -c 0-7 python bucketprobe.py run <root> 8
  python bucketprobe.py run <root> 32
(run resets bucket lineage/fragments afterwards so it can repeat)
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

RUN_ID = "bucketprobe"


def fault_weather(mb: int = 64) -> float:
    """First-touch rate of fresh anon pages (GB/s) — the host fault
    path has its own weather, independent of the zlib CPU index."""
    import numpy as np
    t0 = time.perf_counter()
    a = np.empty(mb << 20, dtype=np.uint8)
    a[::4096] = 1
    dt = time.perf_counter() - t0
    del a
    return round(mb / 1024 / dt, 3)


def cpu_jiffies():
    """Guest-wide (user+nice, system+irq+softirq, steal) jiffies."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    u, n, s, _idle, _iow, irq, sirq, steal = (int(x) for x in parts[1:9])
    return (u + n, s + irq + sirq, steal)


def prep():
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    from moonlink_ray.queries import ensure_images_fixture, _fresh_copy
    from moonlink_ray.manifest import load, write_lineage
    from moonlink_ray.pipelines import cluster as cl
    from moonlink_ray.sources.scan import scan

    fix = ensure_images_fixture("/root/testdata/sf0.1")
    root = _fresh_copy(fix, "bucketprobe")
    snap = load(root)
    samples, weights, hot_counts, total = cl._zkey_stats_sampled(root, snap)
    NB = 128
    boundaries, hot = cl._plan_buckets(samples, weights, hot_counts, total,
                                       NB, 0.001)
    write_lineage(root, RUN_ID, "params", {
        "kind": "cluster-params", "num_buckets": NB, "curve": "zorder",
        "exchange": "spill", "victims": None,
        "boundaries": [int(b) for b in boundaries],
        "hot": {str(k): v for k, v in hot.items()}})
    ds = scan(root, fragments=snap.fragments, schema_list=snap.schema,
              meta_batch_size=4)
    summary = ds.map_batches(
        cl._DeriveSpill(root, RUN_ID, boundaries, hot, NB),
        batch_size=None, batch_format="pyarrow").take_all()
    files = {}
    for r in summary:
        files.setdefault(int(r["zb"]), []).append([r["file"], int(r["rg"])])
    write_lineage(root, RUN_ID, "spill", {
        "kind": "cluster-spill",
        "files": {str(k): sorted(v) for k, v in files.items()}})
    print(json.dumps({"root": root, "buckets": len(files)}))
    ray.shutdown()


def run(root: str, ncpu: int, bundle_override=None):
    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    from moonlink_ray.manifest import load, read_lineage
    from moonlink_ray.pipelines import cluster as cl
    from moonlink_ray.schema import table_schema

    snap = load(root)
    done = read_lineage(root, RUN_ID)
    files_by_bucket = {int(k): v for k, v in done["spill"]["files"].items()}
    todo = sorted(files_by_bucket)
    out_schema = table_schema(snap)
    sources = sorted(f.fragment_id for f in snap.fragments)
    files_ref = ray.put(files_by_bucket)
    bundle = bundle_override or max(1, min(4, len(todo) // max(1, 2 * ncpu)))
    items = rd.from_items([{"zb": b} for b in todo],
                          override_num_blocks=max(1, len(todo) // bundle))
    fw0 = fault_weather()
    j0, t0 = cpu_jiffies(), time.perf_counter()
    rows = items.map_batches(
        cl._BucketSort(root, RUN_ID, files_ref, 32 * 1024 * 1024,
                       snap.max_lsn, out_schema.names, sources,
                       snap.schema, reencode_psnr=40.0),
        batch_size=bundle, batch_format="pyarrow").take_all()
    wall = time.perf_counter() - t0
    j1 = cpu_jiffies()
    usr, sys_, steal = (a - b for a, b in zip(j1, j0))
    # per-bucket walls from the lineage checkpoints
    walls = []
    lin = read_lineage(root, RUN_ID)
    for k, rec in lin.items():
        if k.startswith("zb-"):
            walls.append(rec["wall_sec"])
    walls.sort()
    q = lambda p: walls[int(p * (len(walls) - 1))] if walls else 0
    print(json.dumps({
        "ncpu": ncpu, "bundle": bundle, "wall": round(wall, 1),
        "fault_gbs": [fw0, fault_weather()],
        "tokens": os.environ.get("MLRAY_WRITE_TOKENS", "8"),
        "user_sec": round(usr / 100, 1), "sys_sec": round(sys_ / 100, 1),
        "steal_sec": round(steal / 100, 1),
        "util_cores": round((usr + sys_) / 100 / wall, 1),
        "buckets": len(walls), "frags_written": len(rows),
        "bucket_wall_sum": round(sum(walls), 1),
        "bucket_wall_p50": q(0.5), "bucket_wall_p90": q(0.9),
        "bucket_wall_max": q(1.0),
    }))
    # reset for the next leg: drop bucket lineage + written fragments
    for k in list(lin):
        if k.startswith("zb-"):
            os.unlink(os.path.join(root, "lineage", RUN_ID, f"{k}.json"))
    for p in glob.glob(os.path.join(root, "fragments",
                                    f"frag-{RUN_ID}-*.parquet")):
        os.unlink(p)
    ray.shutdown()


if __name__ == "__main__":
    if sys.argv[1] == "prep":
        prep()
    else:
        run(sys.argv[2], int(sys.argv[3]),
            int(sys.argv[4]) if len(sys.argv) > 4 else None)
