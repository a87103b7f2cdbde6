"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "kg_construct_sec", "value": N, "unit": "sec",
   "queries": {...per-pipeline seconds...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "triples_per_sec": ...}

--scaling: runs the headline in fresh processes at num_cpus=8 and 32 on the
same input and reports throughput at both plus scaling efficiency
(sandbox stand-in for N-node vs 4N-node clusters — BASELINE.md); appends the
result to BENCH/BASELINE.md.

This is the only script (besides tests/CLI) that owns a Ray session.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# deterministic work amplification for scaling runs (distinct doc_id ranges
# per copy — see jena_ray.testgen.load_pages(repeat=...))
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "1"))


def run_benchmarks() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # warm the OS page cache (measure compute + shuffle, not first disk read)
    import pyarrow.parquet as pq

    n_docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"]).num_rows
    pq.read_table(f"{SF_DIR}/lineitem.parquet")
    pq.read_table(f"{SF_DIR}/orders.parquet")

    import __ray_entry__ as E
    from jena_ray.pipelines.kg import run_kg

    timings: dict[str, float] = {}

    # headline: flagship KG construction end-to-end (pages → indexes)
    out_dir = f"/tmp/bench_kg_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    metrics = run_kg(
        SF_DIR,
        out_dir,
        num_shards=4,
        concurrency=NUM_CPUS,
        build_indexes=True,
        resume=False,
        repeat=REPEAT,
    )
    kg_sec = time.perf_counter() - t0
    timings["kg_construct"] = round(kg_sec, 3)
    triples_out = sum(s["triples_out"] for s in metrics["shards"].values())

    # secondary pipelines (operator coverage at bench scale)
    qs = E.queries()
    for name in (
        "q1_pricing_summary",
        "lineitem_order_join",
        "revenue_by_nation",
        "kg_predicate_counts",
        "token_counts",
        "exact_dedup_docs",
        "minhash_candidate_pairs",
        "ann_topk",
        "events_tumbling_window",
    ):
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume to force execution
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "kg_construct_sec",
        "value": timings["kg_construct"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs * REPEAT,
        "repeat": REPEAT,
        "docs_per_sec": round(n_docs * REPEAT / kg_sec, 2),
        "triples_out": triples_out,
        "triples_per_sec": round(triples_out / kg_sec, 2),
    }


def run_scaling() -> dict:
    """Same headline at num_cpus=8 vs 32 in fresh processes (median of
    `GRAFT_SCALING_TRIALS` trials, default 3); efficiency=(T8/T32)/4."""
    import statistics

    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))

    repeat = os.environ.get("GRAFT_BENCH_REPEAT", "8")

    def one(ncpu: int) -> list[float]:
        out = []
        for _ in range(trials):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_REPEAT=repeat)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            out.append(json.loads(r.stdout.strip().splitlines()[-1])["value"])
        return out

    lo_cpus, hi_cpus = 8, 32
    t_lo = statistics.median(one(lo_cpus))
    t_hi = statistics.median(one(hi_cpus))
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    result = {
        "sec_8": t_lo,
        "sec_32": t_hi,
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "trials": trials,
        "sf": SF_DIR,
        "repeat": int(repeat),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run (sf={SF_DIR}, trials={trials}, repeat={repeat})\n\n"
            f"| num_cpus | headline sec | |\n|---|---|---|\n"
            f"| 8 | {t_lo:.2f} | |\n| 32 | {t_hi:.2f} | |\n\n"
            f"speedup {t_lo / t_hi:.2f}x over 4x CPUs → scaling efficiency "
            f"**{eff:.3f}**\n"
        )
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
