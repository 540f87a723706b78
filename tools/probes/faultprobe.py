import sys, time, numpy as np
from multiprocessing import Pool
def fault(_):
    t0 = time.time(); n = 0
    while time.time() - t0 < 4:
        a = np.ones(256 << 20, dtype=np.uint8)  # 256MB alloc+touch
        n += a.nbytes
        del a
    return n
if __name__ == "__main__":
    k = int(sys.argv[1])
    with Pool(k) as p:
        res = p.map(fault, range(k))
    print(k, "procs:", round(sum(res)/4/2**30, 2), "GB/s aggregate fault+touch")
