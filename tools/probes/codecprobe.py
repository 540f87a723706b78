import sys, time, glob
sys.path.insert(0, "/root/repo")
from multiprocessing import Pool
FILES = sorted(glob.glob("/dev/shm/mlray/sf0.1/table/fragments/*.parquet"))
def work(i):
    import pyarrow.parquet as pq
    from moonlink_ray.pipelines.compact import reencode_table
    t = pq.read_table(FILES[i % len(FILES)])
    t = t.slice(0, 40)
    reencode_table(t, 40.0)
    return t.num_rows
if __name__ == "__main__":
    k = int(sys.argv[1])
    with Pool(k) as p:
        p.map(work, range(k))  # warm imports
        t0 = time.perf_counter()
        n = sum(p.map(work, range(64)))
        dt = time.perf_counter() - t0
    print(k, "procs:", round(dt,2), "s for", n, "images =", round(n/dt,1), "img/s")
