import sys, time, glob
sys.path.insert(0, "/root/repo")
k = int(sys.argv[1])
import ray
ray.init(address="local", num_cpus=k, include_dashboard=False, logging_level="ERROR")
FILES = sorted(glob.glob("/dev/shm/mlray/sf0.1/table/fragments/*.parquet"))

@ray.remote
def work(i):
    import pyarrow.parquet as pq
    from moonlink_ray.pipelines.compact import reencode_table
    t = pq.read_table(FILES[i % len(FILES)])
    t = t.slice(0, 40)
    reencode_table(t, 40.0)
    return t.num_rows

ray.get([work.remote(i) for i in range(k)])  # warm workers
t0 = time.perf_counter()
n = sum(ray.get([work.remote(i) for i in range(64)]))
dt = time.perf_counter() - t0
print(k, "ray tasks:", round(dt,2), "s for", n, "images =", round(n/dt,1), "img/s")
ray.shutdown()
