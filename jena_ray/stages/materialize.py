"""TDB-style sort-partitioned graph materialization: SPO / POS / OSP.

The reference's bulk-load index phase builds three B+Tree permutations of the
triple table (index orders are fixed constants — jena-tdb sys/Names.java:24-28;
tdbloader2 does it with per-permutation unix ``sort -u``,
apache-jena/bin/tdbloader2index:270,363). Our analog: the deduped triple
table is written once (phase 1), then each permutation is a Ray Data
range-shuffle ``sort`` over that parquet followed by a partitioned
``write_parquet`` (phase 2) — re-reading the compact phase-1 output instead of
re-running the construction pipeline, exactly tdbloader2's phase split.
"""

from __future__ import annotations

import os

INDEX_ORDERS: dict[str, list[str]] = {
    "spo": ["subj", "pred", "obj"],
    "pos": ["pred", "obj", "subj"],
    "osp": ["obj", "subj", "pred"],
}


def materialize_indexes(
    out_dir: str,
    *,
    orders: tuple[str, ...] = ("spo", "pos", "osp"),
    triples_path: str | None = None,
    min_rows_per_file: int = 500_000,
):
    """Build sorted, globally-deduped index layouts from the phase-1 triples.

    Phase split mirrors TDB's bulk loader exactly (BulkLoader phases,
    jena-tdb/.../bulkloader/LoaderNodeTupleTable.java:91-126): the primary
    SPO index is built first from the phase-1 triple table with a **global**
    dedup (phase-1 shards deduped independently, so cross-shard duplicates
    still exist — this is tdbloader2's `sort -u`); the secondary orders are
    then rebuilt from the SPO output, which is already distinct
    (BuilderSecondaryIndexes copyIndex-from-SPO,
    bulkloader/LoaderNodeTupleTable.java:180).

    Rows are globally range-sorted on each permutation so a reader can
    partition-prune on the leading column (B+Tree prefix-scan analog).
    """
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact

    import shutil

    triples_path = triples_path or os.path.join(out_dir, "triples")
    stats = {}
    primary, *secondary = orders
    ds = rd.read_parquet(triples_path, columns=["subj", "pred", "obj"])
    ds = dedup_exact(ds, cols=("subj", "pred", "obj"))
    primary_path = os.path.join(out_dir, primary)
    # idempotent rebuild: write_parquet appends part files, so clear first
    shutil.rmtree(primary_path, ignore_errors=True)
    ds.sort(INDEX_ORDERS[primary]).write_parquet(
        primary_path, min_rows_per_file=min_rows_per_file
    )
    stats[primary] = primary_path
    for order in secondary:
        keys = INDEX_ORDERS[order]
        ds = rd.read_parquet(primary_path, columns=["subj", "pred", "obj"])
        path = os.path.join(out_dir, order)
        shutil.rmtree(path, ignore_errors=True)
        ds.sort(keys).write_parquet(path, min_rows_per_file=min_rows_per_file)
        stats[order] = path
    return stats


def pattern_scan(out_dir: str, s: str | None = None, p: str | None = None, o: str | None = None):
    """Triple-pattern match against the materialized layout: pick the index
    whose leading columns are bound (TDB's index choice — jena-tdb
    solver/SolverLib.java:55, StageMatchTuple) and filter at the parquet read
    (predicate pushdown replaces the B+Tree prefix scan)."""
    import pyarrow.compute as pc
    import ray.data as rd

    bound = {"subj": s, "pred": p, "obj": o}
    if s is not None:
        order = "spo"
    elif p is not None:
        order = "pos"
    elif o is not None:
        order = "osp"
    else:
        order = "spo"
    expr = None
    for col, val in bound.items():
        if val is None:
            continue
        e = pc.field(col) == val
        expr = e if expr is None else (expr & e)
    path = os.path.join(out_dir, order)
    if expr is None:
        return rd.read_parquet(path)
    return rd.read_parquet(path, filter=expr)
