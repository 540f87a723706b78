import sys, time, glob
sys.path.insert(0, "/root/repo")
k = int(sys.argv[1])
import ray
import ray.data as rd
ray.init(address="local", num_cpus=k, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
FILES = sorted(glob.glob("/dev/shm/mlray/sf0.1/table/fragments/*.parquet"))

def work(batch):
    import pyarrow.parquet as pq
    from moonlink_ray.pipelines.compact import reencode_table
    i = int(batch["i"][0].as_py())
    t = pq.read_table(FILES[i % len(FILES)]).slice(0, 250)
    out = reencode_table(t, 40.0)
    import os
    p = f"/dev/shm/mlray/probe-w{os.getpid()}-{i}.parquet"
    pq.write_table(out, p, compression="NONE", use_dictionary=False)
    os.unlink(p)
    import pyarrow as pa
    return pa.table({"n": [t.num_rows]})

ds = rd.from_items([{"i": i} for i in range(k)], override_num_blocks=k)
ds.map_batches(work, batch_size=1, batch_format="pyarrow").take_all()  # warm
t0 = time.perf_counter()
ds = rd.from_items([{"i": i} for i in range(64)], override_num_blocks=64)
rows = ds.map_batches(work, batch_size=1, batch_format="pyarrow").take_all()
n = sum(r["n"] for r in rows)
dt = time.perf_counter() - t0
print(k, "ray.data:", round(dt,2), "s for", n, "images =", round(n/dt,1), "img/s")
ray.shutdown()
