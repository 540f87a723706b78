"""Parallel tmpfs write probe with user/sys/steal split: N processes
each write (and delete) fresh 1 GiB files for ~15 s. Distinguishes
guest-kernel contention (sys balloons with N) from host fault
serialization (throughput flat with N, modest sys) and healthy page
cache (throughput scales).

Usage: python wrprobe2.py [nproc]
"""
import os
import subprocess
import sys
import time


def stat():
    with open("/proc/stat") as f:
        p = f.readline().split()
    u, n, s, idle, iow, irq, sirq, steal = (int(x) for x in p[1:9])
    return {"user": u + n, "sys": s + irq + sirq, "steal": steal}


def run(nproc: int, secs: float = 15.0):
    script = (
        "import os, sys, time\n"
        "buf = b'\\xab' * (64 << 20)\n"
        "t0 = time.time(); written = 0; i = 0\n"
        f"while time.time() - t0 < {secs}:\n"
        "    p = f'/dev/shm/mlray/.wr{os.getpid()}-{i}'\n"
        "    i += 1\n"
        "    with open(p, 'wb') as f:\n"
        "        for _ in range(16):\n"
        "            f.write(buf)\n"
        f"            if time.time() - t0 > {secs}: break\n"
        "    written += os.path.getsize(p)\n"
        "    os.unlink(p)\n"
        "print(written)\n")
    a = stat()
    t0 = time.time()
    ps = [subprocess.Popen([sys.executable, "-c", script],
                           stdout=subprocess.PIPE) for _ in range(nproc)]
    total = sum(int(p.communicate()[0]) for p in ps)
    dt = time.time() - t0
    b = stat()
    d = {k: round((b[k] - a[k]) / 100 / dt, 1) for k in a}
    print(f"nproc={nproc}: {total / (1 << 30) / dt:.2f} GB/s aggregate, "
          f"user={d['user']} sys={d['sys']} steal={d['steal']} cores")


if __name__ == "__main__":
    os.makedirs("/dev/shm/mlray", exist_ok=True)
    for n in ([int(sys.argv[1])] if len(sys.argv) > 1 else [1, 8, 32]):
        run(n)
