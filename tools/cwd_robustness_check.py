"""Run every queries() entry from a NON-repo cwd: catches worker-side
by-name package imports that only work when the driver cwd is the repo
(the bug class fixed in textpipe._bloom_from_ref).  Usage:

    cd /tmp && python /root/repo/tools/cwd_robustness_check.py
"""
import ray
import time
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import sys
sys.path.insert(0, "/root/repo")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as e
SF = "/root/testdata/sf0.001"
qs = e.queries()
failed = []
for i, (name, fn) in enumerate(qs.items()):
    t0 = time.perf_counter()
    try:
        res = fn(SF)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        n = len(res)
    except Exception as ex:
        failed.append((name, repr(ex)[:200]))
        print(f"FAIL {name}: {repr(ex)[:200]}", flush=True)
        continue
    print(f"ok {i+1:3d}/{len(qs)} {name} rows={n} {time.perf_counter()-t0:.2f}s", flush=True)
print("FAILED:", len(failed))
ray.shutdown()
