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

    # headline: flagship KG construction end-to-end (pages → indexes).
    # Full runs build into the shared per-tier index cache so the stats
    # queries below reuse the freshly-built indexes (build once, query
    # many — kg_predicate_counts measures the stats pipeline, not a
    # redundant rebuild); scaling children keep per-level scratch dirs.
    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        out_dir = f"/tmp/bench_kg_{NUM_CPUS}"
    else:
        out_dir = os.path.join(
            "/tmp/jena_ray_idx", os.path.basename(os.path.normpath(SF_DIR))
        )
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
    timings["kg_index"] = round(metrics.get("index_sec", 0.0), 3)
    timings["kg_wave"] = round(kg_sec - metrics.get("index_sec", 0.0), 3)
    triples_out = sum(s["triples_out"] for s in metrics["shards"].values())

    # secondary pipelines (operator coverage at bench scale); skipped in
    # scaling children (GRAFT_HEADLINE_ONLY), which only time the headline
    names = () if os.environ.get("GRAFT_HEADLINE_ONLY") else (
        "q1_pricing_summary",
        "lineitem_order_join",
        "revenue_by_nation",
        "kg_predicate_counts",
        "token_counts",
        "exact_dedup_docs",
        "verified_near_dups",
        "ann_topk",
        "events_tumbling_window",
        # query layer over the just-built index cache (BGP joins + SHACL +
        # round-3 SPARQL breadth: subquery, alternation + arithmetic IF)
        "sparql_star_docs",
        "sparql_subquery_max",
        "sparql_arith_if",
        "shacl_report",
    )
    qs = E.queries()
    for name in names:
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


def _hw_throughput(nproc: int, seconds: float = 6.0) -> float:
    """Aggregate pure-CPU throughput (single-thread matmuls/sec summed over
    `nproc` processes) — the machine's actual capacity at that parallelism.
    This sandbox runs both 'cluster sizes' on ONE box whose 32 vCPUs are
    SMT siblings of ~16 physical cores: the measured 8→32-process ceiling
    is ~2.5-3.3x, NOT 4x, and it drifts minutes apart (shared host). The
    probe runs in the same minute as each trial so the job's speedup can be
    compared against what the hardware actually offered."""
    import multiprocessing as mp

    def work(q):
        os.environ["OMP_NUM_THREADS"] = "1"
        import numpy as np

        a = np.random.RandomState(0).normal(size=(256, 256)).astype(np.float32)
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            a @ a
            n += 1
        q.put(n)

    q = mp.Queue()
    ps = [mp.Process(target=work, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def run_scaling() -> dict:
    """Headline at num_cpus=N vs 4N in fresh processes, trials INTERLEAVED
    (lo, hi, lo, hi, ...) so shared-host drift hits both levels equally;
    medians reported. Efficiency is reported twice:

    - raw:       (T_lo/T_hi) / 4          — the north-rule formula
    - vs_hw:     (T_lo/T_hi) / hw_speedup — normalized to the measured
                  pure-CPU capacity ratio of the SAME machine in the same
                  minutes (SMT + host throttling cap the denominator; a
                  4x-core VIRTUAL allocation on one box is not 4x compute)
    """
    import statistics

    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
    repeat = os.environ.get("GRAFT_BENCH_REPEAT", "24")
    lo_cpus, hi_cpus = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    )

    def one(ncpu: int) -> float:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REPEAT=repeat,
            GRAFT_HEADLINE_ONLY="1",
        )
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(r.stdout.strip().splitlines()[-1])["value"]

    lo_secs, hi_secs, hw_ratios = [], [], []
    for _ in range(trials):
        hw_lo = _hw_throughput(lo_cpus)
        lo_secs.append(one(lo_cpus))
        hw_hi = _hw_throughput(hi_cpus)
        hi_secs.append(one(hi_cpus))
        hw_ratios.append(hw_hi / hw_lo)

    t_lo = statistics.median(lo_secs)
    t_hi = statistics.median(hi_secs)
    hw_speedup = statistics.median(hw_ratios)
    speedup = t_lo / t_hi
    eff_raw = speedup / (hi_cpus / lo_cpus)
    eff_hw = speedup / hw_speedup
    result = {
        f"sec_{lo_cpus}": round(t_lo, 2),
        f"sec_{hi_cpus}": round(t_hi, 2),
        "all_lo": [round(x, 1) for x in lo_secs],
        "all_hi": [round(x, 1) for x in hi_secs],
        "speedup": round(speedup, 3),
        "hw_speedup": round(hw_speedup, 3),
        "scaling_efficiency": round(eff_raw, 3),
        "scaling_efficiency_vs_hw": round(eff_hw, 3),
        "trials": trials,
        "sf": SF_DIR,
        "repeat": int(repeat),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run (sf={SF_DIR}, trials={trials}, repeat={repeat},"
            f" interleaved)\n\n"
            f"| num_cpus | headline sec (median) | all trials |\n|---|---|---|\n"
            f"| {lo_cpus} | {t_lo:.2f} | {result['all_lo']} |\n"
            f"| {hi_cpus} | {t_hi:.2f} | {result['all_hi']} |\n\n"
            f"speedup {speedup:.2f}x over {hi_cpus // lo_cpus}x CPUs → raw scaling "
            f"efficiency **{eff_raw:.3f}**; measured pure-CPU hardware ceiling "
            f"{hw_speedup:.2f}x (SMT/shared-host) → efficiency vs hardware "
            f"**{eff_hw:.3f}**\n"
        )
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
