"""CPU-budgeted hash joins.

Ray Data's ``Dataset.join`` (hash-shuffle, ray 2.49) spawns one aggregator
actor per partition and, absent an override, sizes each at
``min(1, cluster_cpus/2/num_partitions)`` CPUs — i.e. EVERY join operator
reserves 50% of the cluster for its whole execution. Two joins in one DAG
(the shape of every near-dup verify and of BGP join chains) therefore
reserve 100% of the cluster and starve the task-based stages (reads,
map_batches, sorts) — the same actor-reservation deadlock class as the
round-1 ``_stage_pools`` bug, reproduced at HEAD on a 4-CPU cluster
(embedding_near_dups hangs >180 s; with this cap it completes).

``safe_join`` passes ``aggregator_ray_remote_args`` so each join's
aggregator pool reserves at most ``cpu_fraction`` of the cluster
(default 1/8th): four concurrent joins still leave half the cluster for
task stages. The reservation is a scheduling floor, not a work limit —
aggregators can still burst above it when CPUs are idle.
"""

from __future__ import annotations

import os


def aggregator_remote_args(num_partitions: int, cpu_fraction: float = 0.125) -> dict:
    """Remote args capping a hash-shuffle aggregator pool's total CPU
    reservation at ``cpu_fraction`` of the cluster."""
    import ray

    if ray.is_initialized():
        total = ray.cluster_resources().get("CPU", 0) or (os.cpu_count() or 8)
    else:  # plan-time fallback; execution always has a cluster
        total = os.cpu_count() or 8
    per_agg = max(0.05, min(1.0, (total * cpu_fraction) / num_partitions))
    # NOTE: the override REPLACES Ray's defaults, so re-state SPREAD (keeps
    # aggregators off a single node on real clusters). Memory reservation is
    # deliberately omitted: the object store backpressures instead, and the
    # default estimate over-reserves on small clusters.
    return {"num_cpus": per_agg, "scheduling_strategy": "SPREAD"}


def safe_join(
    left,
    right,
    *,
    join_type: str = "inner",
    num_partitions: int,
    on: tuple,
    right_on: tuple | None = None,
    right_suffix: str | None = None,
    cpu_fraction: float = 0.125,
):
    """``Dataset.join`` with a bounded aggregator CPU reservation."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
        right_suffix=right_suffix,
        aggregator_ray_remote_args=aggregator_remote_args(num_partitions, cpu_fraction),
    )
