"""Measure the page pool's effect: fresh-file vs recycled-file write
throughput on the data device, single-writer and N-way concurrent.

Each trial writes the same parquet table; "fresh" unlinks the target
first (every byte first-touch faults a new tmpfs page), "recycled"
writes through pagepool.PooledSink over a retired file of the same size
(pages already faulted). The delta is the first-touch fault cost the
pool removes from the timed window — the mechanism behind the round-3
scaling mitigation (see BENCH/BASELINE.md).

Usage: python tools/probes/poolprobe.py [mb_per_file] [n_procs]
"""

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from moonlink_ray import pagepool


def make_table(mb: int) -> pa.Table:
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, size=mb << 20, dtype=np.uint8)
    return pa.table({"b": pa.array([payload.tobytes()], pa.binary())})


def one_proc(mode: str, mb: int, reps: int, root: str) -> float:
    t = make_table(mb)
    # seed the pool for recycled mode (untimed)
    if mode == "recycled":
        for _ in range(2):
            p = os.path.join(root, f"seed-{uuid.uuid4().hex}")
            pq.write_table(t, p, compression="NONE")
            pagepool.retire(p)
    t0 = time.perf_counter()
    for i in range(reps):
        p = os.path.join(root, f"{mode}-{os.getpid()}-{i}")
        if mode == "recycled":
            sink = pagepool.PooledSink(p, size_hint=int(t.nbytes))
            pq.write_table(t, sink, compression="NONE")
            sink.commit()
            pagepool.retire(p)  # next rep recycles this one
        else:
            pq.write_table(t, p, compression="NONE")
            os.unlink(p)  # fresh pages every rep
    return mb * reps / 1024 / (time.perf_counter() - t0)


def fanout(mode: str, mb: int, reps: int, nproc: int, root: str) -> float:
    from multiprocessing import Pool

    with Pool(nproc) as pool:
        rates = pool.starmap(one_proc, [(mode, mb, reps, root)] * nproc)
    return sum(rates)


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nproc = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    root = os.environ.get("MLRAY_DATA_ROOT",
                          "/dev/shm/mlray" if os.access("/dev/shm", os.W_OK)
                          else "/tmp/mlray")
    os.makedirs(root, exist_ok=True)
    out = {"mb_per_file": mb, "nproc": nproc}
    for mode in ("fresh", "recycled"):
        out[f"{mode}_1p_gbs"] = round(one_proc(mode, mb, 4, root), 3)
    for mode in ("fresh", "recycled"):
        out[f"{mode}_{nproc}p_gbs"] = round(fanout(mode, mb, 4, nproc, root), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
