"""Quad store: GSPO / GPOS / GOSP id-index materialization + pattern scans.

The reference's TDB dataset storage keeps named-graph quads as four-slot
NodeId tuples in graph-leading B+Tree permutations (index names
jena-tdb/.../sys/Names.java:24-28 — primary GSPO with GPOS/GOSP secondaries)
next to the triple indexes for the default graph. This module reproduces
that Ray-Data-first, following the triple layout of stages/materialize.py:

- term ids are the same stateless 128-bit fixed_size_binary(16) content
  hashes as the triple store (stages/materialize.py ID_TYPE; graph label
  included — a graph name is just another term in the NodeTable);
- ``terms/`` holds distinct (id, term) over all four positions;
- each permutation is hash-partitioned on its bucket key and sorted within
  the bucket:

      gspo/bucket=<h(g,s)%B>      sorted (g_id, s_id, p_id, o_id)
      gpos/bucket=<h(g,p,o)%B>    sorted (g_id, p_id, o_id, s_id)
      gosp/bucket=<h(g,o)%B>      sorted (g_id, o_id, s_id, p_id)
      spog/bucket=<h(s)%B>        sorted (s_id, p_id, o_id, g_id)
      posg/bucket=<h(p,o)%B>      sorted (p_id, o_id, s_id, g_id)
      ospg/bucket=<h(o)%B>        sorted (o_id, s_id, p_id, g_id)

  The graph-trailing trio (Names.java POSG/OSPG/SPOG) serves
  graph-UNBOUND patterns (GRAPH ?g, union-graph scans) index-pruned.

  Bucket keys pair the graph id with the permutation's salt columns —
  graph counts are typically small (one graph per source document at crawl
  scale, but a handful in curated datasets), so bucketing on g alone would
  put whole graphs on single workers.

Unlike the round-1 triple builder (three sequential shuffle rounds), all
permutations build in ONE tagged shuffle: every deduped id-quad is emitted
once per order with an (okey, bucket) tag, a single groupby co-locates each
(order, bucket) cell, and the per-cell sort writes hive-partitioned
``okey=<order>/bucket=<b>`` which the driver renames to ``<order>/``.
Duplicate rows carry identical bucket keys in every permutation, so the
global dedup ("sort -u") happens inside the per-cell pass — no separate
dedup shuffle.
"""

from __future__ import annotations

import json
import os

QUAD_ID_ORDERS: dict[str, list[str]] = {
    # graph-leading (GRAPH term bound) — TDB primary + secondaries
    "gspo": ["g_id", "s_id", "p_id", "o_id"],
    "gpos": ["g_id", "p_id", "o_id", "s_id"],
    "gosp": ["g_id", "o_id", "s_id", "p_id"],
    # graph-TRAILING (GRAPH var / union-graph scans with s/p/o bound) —
    # the reference keeps all six (Names.java:24-28 POSG/OSPG/SPOG);
    # round-4 lacked these, so a `GRAPH ?g { ?s :p ?o }` scan swept every
    # graph partition. Bucket keys mirror the triple-side convention
    # (materialize.ID_BUCKET_KEYS).
    "spog": ["s_id", "p_id", "o_id", "g_id"],
    "posg": ["p_id", "o_id", "s_id", "g_id"],
    "ospg": ["o_id", "s_id", "p_id", "g_id"],
}
QUAD_BUCKET_KEYS: dict[str, list[str]] = {
    "gspo": ["g_id", "s_id"],
    "gpos": ["g_id", "p_id", "o_id"],
    "gosp": ["g_id", "o_id"],
    "spog": ["s_id"],
    "posg": ["p_id", "o_id"],
    "ospg": ["o_id"],
}
QUAD_ALL_ORDERS: tuple[str, ...] = tuple(QUAD_ID_ORDERS)


def pick_quad_order(bound_positions: set[str]) -> str:
    """Index choice for a quad pattern given its bound positions (subset
    of {graph, subj, pred, obj}) — SolverLib's choice over the six TDB
    permutations: graph-leading when the graph term is bound, else the
    graph-trailing permutation led by the first bound position."""
    if "graph" in bound_positions:
        if "subj" in bound_positions:
            return "gspo"
        if "pred" in bound_positions:
            return "gpos"
        if "obj" in bound_positions:
            return "gosp"
        return "gspo"
    if "subj" in bound_positions:
        return "spog"
    if "pred" in bound_positions:
        return "posg"
    if "obj" in bound_positions:
        return "ospg"
    return "gspo"
_QUAD_ID_COLS = ["g_id", "s_id", "p_id", "o_id"]
_TERM_FOR_QID = {"g_id": "graph", "s_id": "subj", "p_id": "pred", "o_id": "obj"}


def _add_quad_ids(batch):
    import pyarrow as pa

    from jena_ray.stages.materialize import term_id_array

    batch = batch.select(["graph", "subj", "pred", "obj"])
    for idc, col in _TERM_FOR_QID.items():
        batch = batch.append_column(idc, pa.array(term_id_array(batch.column(col))))
    return batch


def materialize_rdf_dataset(
    out_dir: str,
    triples,
    quads,
    *,
    min_rows_per_file: int = 500_000,
    num_buckets: int = 32,
):
    """Materialize a full RDF DATASET — default graph + named graphs — in
    ONE store: SPO/POS/OSP triple permutations for the default graph,
    GSPO/GPOS/GOSP for the named quads, and a single merged ``terms/``
    NodeTable over every position of both (ids are stateless content
    hashes, so the two stores share one id space — mirroring TDB's
    DatasetGraphTDB where default-graph triples and named-graph quads sit
    in sibling tuple tables over one NodeTable, jena-tdb
    store/DatasetGraphTDB.java). ``triples`` has subj/pred/obj columns;
    ``quads`` graph/subj/pred/obj."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc

    from jena_ray.stages.materialize import (
        _add_ids,
        _build_bucketed_ids,
        _build_terms_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    tri_ids = triples.map_batches(_add_ids, batch_format="pyarrow")
    quad_ids = quads.map_batches(_add_quad_ids, batch_format="pyarrow")

    # merged NodeTable: explode every position of both stores to (id, term)
    def explode3(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            pa.table({"id": t.column(idc),
                      "term": pc.cast(t.column(c), pa.string())})
            for c, idc in (("subj", "s_id"), ("pred", "p_id"), ("obj", "o_id"))
        )

    def explode4(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            pa.table({"id": t.column(idc),
                      "term": pc.cast(t.column(c), pa.string())})
            for idc, c in _TERM_FOR_QID.items()
        )

    merged = tri_ids.map_batches(explode3, batch_format="pyarrow").union(
        quad_ids.map_batches(explode4, batch_format="pyarrow")
    )
    terms_path = os.path.join(out_dir, "terms")
    shutil.rmtree(terms_path, ignore_errors=True)
    _build_terms_table(merged, terms_path, num_buckets, min_rows_per_file,
                       exploded=True)

    # triple permutations (default graph); an empty default graph writes
    # no index dirs — the pattern scan treats a missing index as empty.
    # Remove ALL old permutation dirs up front: the build loop breaks
    # early on an empty primary, and a stale secondary from a previous
    # materialization must not survive (CLEAR DEFAULT rebuild)
    for order in ("spo", "pos", "osp"):
        shutil.rmtree(os.path.join(out_dir, order), ignore_errors=True)
    for i, order in enumerate(("spo", "pos", "osp")):
        path = os.path.join(out_dir, order)
        if i == 0:
            src = tri_ids.map_batches(
                lambda t: t.select(["s_id", "p_id", "o_id"]),
                batch_format="pyarrow",
            )
        else:
            import ray.data as rd

            if not os.path.isdir(os.path.join(out_dir, "spo")):
                break
            src = rd.read_parquet(
                os.path.join(out_dir, "spo"), columns=["s_id", "p_id", "o_id"]
            )
        _build_bucketed_ids(src, order, path, num_buckets,
                            min_rows_per_file, dedup=(i == 0))

    # quad permutations (named graphs) — skip_terms: merged table above
    materialize_quad_indexes(
        out_dir, quads, min_rows_per_file=min_rows_per_file,
        num_buckets=num_buckets, skip_terms=True,
    )
    with open(os.path.join(out_dir, "_layout.json"), "w") as f:
        json.dump(
            {"layout": "bucketed-ids", "num_buckets": num_buckets,
             "quads": True, "triples": True}, f
        )


def materialize_quad_indexes(
    out_dir: str,
    quads,
    *,
    orders: tuple[str, ...] = QUAD_ALL_ORDERS,
    min_rows_per_file: int = 500_000,
    num_buckets: int = 32,
    skip_terms: bool = False,
):
    """Build terms/ + quad index layouts from a (graph, subj, pred, obj)
    Dataset. Two executions total: the string shuffle for the NodeTable and
    one tagged id shuffle for every permutation (dedup fused)."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc

    from jena_ray.stages.dedup import add_bucket, dedup_batch

    os.makedirs(out_dir, exist_ok=True)
    with_ids = quads.map_batches(_add_quad_ids, batch_format="pyarrow")

    # ---- NodeTable: distinct (id, term) over all four positions ----
    def explode_terms(t: pa.Table) -> pa.Table:
        cols = [
            pa.table({"id": t.column(idc), "term": pc.cast(t.column(c), pa.string())})
            for idc, c in _TERM_FOR_QID.items()
        ]
        merged = dedup_batch(pa.concat_tables(cols), ["id"])
        return add_bucket(merged, ["id"], num_buckets).rename_columns(
            ["id", "term", "bucket"]
        )

    def terms_bucket(g: pa.Table) -> pa.Table:
        g = dedup_batch(g, ["id"])
        return g.take(pc.sort_indices(g, sort_keys=[("id", "ascending")]))

    if not skip_terms:
        terms_path = os.path.join(out_dir, "terms")
        shutil.rmtree(terms_path, ignore_errors=True)
        (
            with_ids.map_batches(explode_terms, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(terms_bucket, batch_format="pyarrow")
            .write_parquet(
                terms_path, partition_cols=["bucket"], min_rows_per_file=min_rows_per_file
            )
        )

    # ---- all permutations in one tagged shuffle ----
    def fan_out(t: pa.Table) -> pa.Table:
        ids = dedup_batch(t.select(_QUAD_ID_COLS), _QUAD_ID_COLS)
        parts = []
        for order in orders:
            tagged = add_bucket(ids, QUAD_BUCKET_KEYS[order], num_buckets)
            tagged = tagged.rename_columns(_QUAD_ID_COLS + ["bucket"])
            tagged = tagged.append_column(
                "okey", pa.array([order] * tagged.num_rows, type=pa.string())
            )
            parts.append(tagged)
        return pa.concat_tables(parts)

    def sort_cell(g: pa.Table) -> pa.Table:
        okey = g.column("okey")[0].as_py()
        g = dedup_batch(g, _QUAD_ID_COLS)  # global `sort -u` within the cell
        keys = [(k, "ascending") for k in QUAD_ID_ORDERS[okey]]
        return g.take(pc.sort_indices(g, sort_keys=keys))

    idx_tmp = os.path.join(out_dir, "_idx_build")
    shutil.rmtree(idx_tmp, ignore_errors=True)
    (
        with_ids.map_batches(fan_out, batch_format="pyarrow")
        .groupby(["okey", "bucket"])
        .map_groups(sort_cell, batch_format="pyarrow")
        .write_parquet(
            idx_tmp, partition_cols=["okey", "bucket"], min_rows_per_file=min_rows_per_file
        )
    )
    for order in orders:
        dst = os.path.join(out_dir, order)
        shutil.rmtree(dst, ignore_errors=True)
        src = os.path.join(idx_tmp, f"okey={order}")
        if os.path.isdir(src):  # empty quad input writes no cells
            os.rename(src, dst)
    shutil.rmtree(idx_tmp, ignore_errors=True)

    with open(os.path.join(out_dir, "_layout.json"), "w") as f:
        json.dump(
            {"layout": "bucketed-ids", "num_buckets": num_buckets, "quads": True}, f
        )
    return {o: os.path.join(out_dir, o) for o in orders}


def quad_pattern_scan(
    out_dir: str,
    g: str | None = None,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    *,
    resolve_terms: bool = True,
):
    """Quad-pattern match: pick the permutation whose leading columns are
    bound (SolverLib index choice over the G* indexes), prune to the hash
    bucket when its key is fully bound, push id filters to the read."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.stages.materialize import (
        ID_TYPE,
        _term_bucket_ids,
        read_layout,
        term_id,
    )

    info = read_layout(out_dir)
    bound_terms = {"graph": g, "subj": s, "pred": p, "obj": o}
    order = pick_quad_order({c for c, v in bound_terms.items() if v is not None})
    if order != "gspo" and not os.path.isdir(os.path.join(out_dir, order)):
        # store built before the graph-trailing permutations existed (or
        # with a reduced `orders` tuple): full gspo sweep, not empty
        order = "gspo"

    bound_ids = {
        idc: (term_id(bound_terms[c]) if bound_terms[c] is not None else None)
        for idc, c in _TERM_FOR_QID.items()
    }
    path = os.path.join(out_dir, order)
    bkeys = QUAD_BUCKET_KEYS[order]
    if all(bound_ids[c] is not None for c in bkeys):
        b = _term_bucket_ids([bound_ids[c] for c in bkeys], info["num_buckets"])
        path = os.path.join(path, f"bucket={b}")
        if not os.path.isdir(path):
            empty = pa.table(
                {c: pa.array([], type=pa.string()) for c in ("graph", "subj", "pred", "obj")}
            )
            return rd.from_arrow(empty)
    if not os.path.isdir(path):
        # a dataset whose named graphs were all removed (CLEAR NAMED/ALL)
        # has no quad index dirs — an empty store, not an error
        empty = pa.table(
            {c: pa.array([], type=pa.string())
             for c in ("graph", "subj", "pred", "obj")}
        )
        return rd.from_arrow(empty)
    expr = None
    for idc, val in bound_ids.items():
        if val is None:
            continue
        # typed scalar REQUIRED: fsb16 == untyped-bytes segfaults the
        # pyarrow scanner in pushed-down parquet filters
        e = pc.field(idc) == pa.scalar(val, ID_TYPE)
        expr = e if expr is None else (expr & e)
    ds = rd.read_parquet(
        path, columns=_QUAD_ID_COLS, **({"filter": expr} if expr is not None else {})
    )
    if not resolve_terms:
        return ds

    # distributed id→term resolution: the bucket-aligned map-side join
    # against this store's terms/ NodeTable (materialize.resolve_id_columns
    # — the quad store shares the triple layout contract), replacing the
    # former driver-side iter_batches + lookup_terms materialization
    from jena_ray.stages.materialize import resolve_id_columns

    out = resolve_id_columns(ds, out_dir, dict(_TERM_FOR_QID))

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(["graph", "subj", "pred", "obj"])

    return out.map_batches(reorder, batch_format="pyarrow")
