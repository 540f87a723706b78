import sys, time, os
from multiprocessing import Pool
def wr(i):
    buf = b"\xab" * (64 << 20)
    t0 = time.time(); n = 0
    while time.time() - t0 < 4:
        with open(f"/dev/shm/wrp{i}", "wb") as f:
            for _ in range(4): f.write(buf)
        os.unlink(f"/dev/shm/wrp{i}")
        n += 256 << 20
    return n
if __name__ == "__main__":
    k = int(sys.argv[1])
    with Pool(k) as p:
        res = p.map(wr, range(k))
    print(k, "writers:", round(sum(res)/4/2**30, 2), "GB/s aggregate tmpfs write")
