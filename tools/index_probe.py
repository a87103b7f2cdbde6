"""Profile materialize_indexes phases on an existing triples parquet.
Usage: PYTHONPATH=/root/repo python tools/index_probe.py <out_dir> <ncpu>"""

import json
import sys
import time

out_dir, ncpu = sys.argv[1], int(sys.argv[2])

import ray

ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
import logging

from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)

import os

import ray.data as rd

from jena_ray.stages.dedup import dedup_exact
from jena_ray.stages.materialize import (
    _build_bucketed_ids,
    _build_terms_table,
    materialize_indexes,
)

triples_path = os.path.join(out_dir, "triples")
t = {}

t0 = time.perf_counter()
schema = rd.read_parquet(triples_path).schema().names
t["schema_probe"] = time.perf_counter() - t0
print("schema:", schema)

t0 = time.perf_counter()
with_ids = rd.read_parquet(
    triples_path, columns=["subj", "pred", "obj", "s_id", "p_id", "o_id"]
)
_build_terms_table(with_ids, "/tmp/probe_terms", 32, 500_000)
t["terms"] = time.perf_counter() - t0

t0 = time.perf_counter()
ids = rd.read_parquet(triples_path, columns=["s_id", "p_id", "o_id"])
ids = dedup_exact(ids, cols=("s_id", "p_id", "o_id"))
_build_bucketed_ids(ids, "spo", "/tmp/probe_spo", 32, 500_000)
t["spo_dedup_build"] = time.perf_counter() - t0

t0 = time.perf_counter()
sds = rd.read_parquet("/tmp/probe_spo", columns=["s_id", "p_id", "o_id"])
_build_bucketed_ids(sds, "pos", "/tmp/probe_pos", 32, 500_000)
t["pos_build"] = time.perf_counter() - t0

print(json.dumps({k: round(v, 1) for k, v in t.items()}))
ray.shutdown()
