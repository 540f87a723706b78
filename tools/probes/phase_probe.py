import sys, time, json, shutil
sys.path.insert(0, "/root/repo")
ncpu = int(sys.argv[1])
import ray
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from moonlink_ray.queries import ensure_images_fixture, _fresh_copy, _COMPACT_CFG
from moonlink_ray.pipelines.optimize import optimize
from moonlink_ray.manifest import load
fix = ensure_images_fixture("/root/testdata/sf0.1")
root = _fresh_copy(fix, f"phase{ncpu}")
t0 = time.perf_counter()
optimize(root, cfg=_COMPACT_CFG)
m = load(root).job["metrics"]
print(json.dumps({"ncpu": ncpu, "wall": round(time.perf_counter()-t0,1),
                  "plan": m["plan_sec"], "spill": m["spill_sec"],
                  "bucket_sort": m["bucket_sort_sec"]}))
shutil.rmtree(root, ignore_errors=True)
ray.shutdown()
