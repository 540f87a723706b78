import sys, time, zlib, os
from multiprocessing import Pool
def burn(_):
    data = os.urandom(1 << 20)
    t0 = time.time(); c = 0
    while time.time() - t0 < 3:
        zlib.compress(data, 6); c += 1
    return c
if __name__ == "__main__":
    n = int(sys.argv[1])
    with Pool(2 * n) as p:
        res = p.map(burn, range(2 * n))
    print(n, "cores ->", sum(res) / 3, "per sec")
