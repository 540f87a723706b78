import sys, time
k = int(sys.argv[1])
import ray, ray.data as rd
ray.init(address="local", num_cpus=k, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
def ident(b): return b
for rep in range(4):
    t0 = time.perf_counter()
    rd.from_items([{"i": i} for i in range(12)], override_num_blocks=12) \
      .map_batches(ident, batch_size=1).take_all()
    print(k, "rep", rep, round(time.perf_counter()-t0, 2), flush=True)
ray.shutdown()
