"""One headline run at a given CPU count with per-phase metrics.
Usage: python tools/scaling_probe.py <num_cpus> [repeat]"""

from __future__ import annotations

import json
import shutil
import sys
import time

ncpu = int(sys.argv[1])
repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 8

import ray

ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
import logging

from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)

import pyarrow.parquet as pq

pq.read_table("/root/testdata/sf0.1/documents.parquet")  # warm page cache

from jena_ray.pipelines.kg import run_kg

out = f"/tmp/scaling_probe_{ncpu}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
m = run_kg("/root/testdata/sf0.1", out, num_shards=4, concurrency=ncpu,
           build_indexes=True, resume=False, repeat=repeat)
total = time.perf_counter() - t0
wave = max(s["sec"] for s in m["shards"].values())
print(json.dumps({"ncpu": ncpu, "repeat": repeat, "total": round(total, 1),
                  "wave": round(wave, 1), "index": round(m["index_sec"], 1)}))
ray.shutdown()
