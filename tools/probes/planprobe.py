import sys, time
sys.path.insert(0, "/root/repo")
ncpu = int(sys.argv[1])
import ray
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from moonlink_ray.queries import ensure_images_fixture
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.cluster import _zkey_stats_sampled
fix = ensure_images_fixture("/root/testdata/sf0.1")
snap = load(fix["root"])
for rep in range(3):
    t0 = time.perf_counter()
    _zkey_stats_sampled(fix["root"], snap)
    print(ncpu, "rep", rep, round(time.perf_counter()-t0, 2), flush=True)
ray.shutdown()
