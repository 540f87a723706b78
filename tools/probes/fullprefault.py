"""One-time full-guest tmpfs prefault (round-3 measurement hygiene).

The sandbox VM faults guest memory frames from the host lazily: the
first-ever touch of a frame runs at 20-560 MB/s (hour-dependent,
width-independent — serialized host-side), while recycled frames run at
memory speed. BENCH/BASELINE.md round 2 traced the bucket-phase width
collapse to the 15-25 GB of NEW tmpfs data a suite run allocates.
Touching (and freeing) most of the guest's free memory ONCE makes every
later allocation hit recycled frames — the same state a long-lived
cluster node is in after boot.

Usage: python fullprefault.py [target_gb] [budget_s]
Writes progress lines to stdout; run under nohup.
"""
import os
import sys
import time
from multiprocessing import Process


def worker(wid: int, target_gb: float, budget_s: float, root: str) -> None:
    buf = b"\xab" * (256 << 20)
    t0 = time.time()
    written = 0
    i = 0
    while written < target_gb * (1 << 30) and time.time() - t0 < budget_s:
        p = os.path.join(root, f".fullprefault-{wid}-{i}")
        i += 1
        with open(p, "wb") as f:
            for _ in range(4):  # 1 GiB per file
                f.write(buf)
                if time.time() - t0 > budget_s:
                    break
        written += os.path.getsize(p)
        os.unlink(p)
        if wid == 0:
            el = time.time() - t0
            print(f"[prefault] w0 {written / (1 << 30):.0f} GiB in {el:.0f}s "
                  f"({written / (1 << 20) / max(el, 1e-9):.0f} MB/s)",
                  flush=True)


def main() -> None:
    target_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 80.0
    budget_s = float(sys.argv[2]) if len(sys.argv) > 2 else 5400.0
    root = "/dev/shm/mlray"
    os.makedirs(root, exist_ok=True)
    nproc = 4
    t0 = time.time()
    procs = [Process(target=worker, args=(w, target_gb / nproc, budget_s, root))
             for w in range(nproc)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    print(f"[prefault] done target={target_gb} GiB wall={time.time() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
