"""TDB-style triple index materialization: SPO / POS / OSP over term ids.

The reference stores triples as fixed-width NodeId tuples in three B+Tree
permutations, with a NodeTable dictionary mapping ids ⇄ terms (jena-tdb
store/nodetable/NodeTableNative.java:39,76; index orders sys/Names.java:24-28;
tdbloader2 builds them with per-permutation unix ``sort -u``,
apache-jena/bin/tdbloader2index:270,363). This module reproduces that design
Ray-Data-first:

- **term ids** are stateless 128-bit content hashes of the canonical term
  string, stored as ONE fixed_size_binary(16) column (the same trick TDB
  uses for term hashes — NodeLib.hash,
  jena-tdb/.../lib/NodeLib.java:122-149 — no mutable dictionary service;
  widened from round 2's 64 bits, whose birthday bound fires at 10^9-10^10
  distinct terms). All index shuffles move 3x16 bytes per row instead of
  3 term strings (~4x fewer bytes through the object store).
- **terms table** (the NodeTable analog): distinct (id, term) rows, written
  hash-bucketed to ``terms/bucket=<id%B>/`` — built once with the only
  string shuffle in the phase.
- **index layouts**: ``spo/ pos/ osp/`` hold id-triples hash-partitioned on
  the index's bucket key and sorted within each bucket:

      spo/bucket=<s_id%B>        sorted (s_id, p_id, o_id)
      pos/bucket=<h(p,o)%B>      sorted (p_id, o_id, s_id)
      osp/bucket=<o_id%B>        sorted (o_id, s_id, p_id)

  The POS bucket key is (p_id, o_id), NOT p_id alone — predicates are the
  canonical hub keys, so pairing with the object is the skew salting the
  north rule requires; p-only scans fall back to row-group pruning on the
  sorted p_id column.

One int-keyed shuffle + a vectorized Arrow sort per bucket — measured 3x
faster than Ray's global range sort at 23M rows even with strings, and far
cheaper on id rows. ``layout="global"`` keeps tdbloader2's total string
order for consumers that need cross-file order (legacy path, string rows).

A ``_layout.json`` sidecar records layout + bucket count for readers.

Collision note: 128-bit ids push the birthday bound past 10^18 distinct
terms (50% at ~2^64) — comfortably beyond the 10^12-document north star.
The NodeTable build still verifies (id, term) uniqueness per bucket and
fails loudly rather than conflating terms.
"""

from __future__ import annotations

import json
import os

ID_ORDERS: dict[str, list[str]] = {
    "spo": ["s_id", "p_id", "o_id"],
    "pos": ["p_id", "o_id", "s_id"],
    "osp": ["o_id", "s_id", "p_id"],
}
ID_BUCKET_KEYS: dict[str, list[str]] = {
    "spo": ["s_id"],
    "pos": ["p_id", "o_id"],
    "osp": ["o_id"],
}
INDEX_ORDERS: dict[str, list[str]] = {
    "spo": ["subj", "pred", "obj"],
    "pos": ["pred", "obj", "subj"],
    "osp": ["obj", "subj", "pred"],
}
_TERM_FOR_ID = {"s_id": "subj", "p_id": "pred", "o_id": "obj"}


def _layout_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_layout.json")


def _write_layout(out_dir: str, layout: str, num_buckets: int) -> None:
    with open(_layout_path(out_dir), "w") as f:
        json.dump({"layout": layout, "num_buckets": num_buckets}, f)


def read_layout(out_dir: str) -> dict:
    try:
        with open(_layout_path(out_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"layout": "global", "num_buckets": 0}


import pyarrow as _pa

# ONE fixed_size_binary(16) column per id slot: 128-bit ids with the same
# single-column ergonomics (joins, buckets, sorts, parquet filters) as the
# round-2 int64 ids
ID_TYPE = _pa.binary(16)
NULL_ID = b"\x00" * 16


def term_id_array(arr):
    """Stateless 128-bit term id (fixed_size_binary(16) of two independent
    64-bit content-hash lanes — NodeLib.hash analog, widened for the
    10^12-term space). Vectorized, one pass over the value buffer."""
    import numpy as np
    import pyarrow as pa

    from jena_ray.functions.hashing import hash128_string_array

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lo, hi = hash128_string_array(arr)
    packed = np.empty(len(lo) * 2, dtype="<u8")
    packed[0::2] = lo
    packed[1::2] = hi
    return pa.Array.from_buffers(
        ID_TYPE, len(lo), [None, pa.py_buffer(packed.tobytes())]
    )


def term_id(term: str) -> bytes:
    import pyarrow as pa

    return term_id_array(pa.array([term]))[0].as_py()


def _add_ids(batch):
    import pyarrow as pa

    batch = batch.select(["subj", "pred", "obj"])
    for col, idc in (("subj", "s_id"), ("pred", "p_id"), ("obj", "o_id")):
        batch = batch.append_column(idc, pa.array(term_id_array(batch.column(col))))
    return batch


def _build_bucketed_ids(
    ds,
    order: str,
    path: str,
    num_buckets: int,
    min_rows_per_file: int,
    *,
    dedup: bool = False,
):
    """id-triple Dataset → bucketed, in-bucket-sorted index layout.

    ``dedup=True`` fuses the GLOBAL exact dedup (tdbloader2 ``sort -u``)
    into this build's single shuffle: identical triples hash to the same
    bucket (the bucket key is a subset of the triple), so a block-local
    combiner before the shuffle plus one per-bucket dedup after it is
    globally exact — one all-to-all instead of dedup_exact's + this one's.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from jena_ray.stages.dedup import add_bucket, dedup_batch

    keys = ID_ORDERS[order]
    bkeys = ID_BUCKET_KEYS[order]

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.select(["s_id", "p_id", "o_id"])
        if dedup:
            t = dedup_batch(t, keys)  # combiner: collapse repeats pre-shuffle
        return add_bucket(t, bkeys, num_buckets).rename_columns(
            ["s_id", "p_id", "o_id", "bucket"]
        )

    def sort_within(g: pa.Table) -> pa.Table:
        if dedup:
            g = dedup_batch(g, keys)
        idx = pc.sort_indices(g, sort_keys=[(k, "ascending") for k in keys])
        return g.take(idx)

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sort_within, batch_format="pyarrow")
    )
    out.write_parquet(
        path, partition_cols=["bucket"], min_rows_per_file=min_rows_per_file
    )


def _build_terms_table(ds, path: str, num_buckets: int, min_rows_per_file: int,
                       *, exploded: bool = False):
    """NodeTable analog: distinct (id, term), bucketed by id — the single
    string shuffle of the materialize phase. ``exploded=True`` takes a
    pre-exploded (id, term) stream (mixed triple+quad dataset stores union
    their position columns upstream)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jena_ray.stages.dedup import add_bucket, dedup_batch

    def explode_terms(t: pa.Table) -> pa.Table:
        if exploded:
            merged = t.select(["id", "term"])
        else:
            cols = []
            for col, idc in (("subj", "s_id"), ("pred", "p_id"), ("obj", "o_id")):
                cols.append(
                    pa.table({"id": t.column(idc), "term": pc.cast(t.column(col), pa.string())})
                )
            merged = pa.concat_tables(cols)
        # block-local combiner keyed on (id, term), NOT id alone, so a
        # 64-bit hash collision survives to per_bucket and fails loudly
        local = dedup_batch(merged, ["id", "term"])
        return add_bucket(local, ["id"], num_buckets).rename_columns(
            ["id", "term", "bucket"]
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = dedup_batch(g, ["id", "term"])
        n_ids = pc.count_distinct(g.column("id")).as_py()
        if n_ids != g.num_rows:
            # two distinct terms hashed to one 128-bit id: the dictionary
            # would silently conflate them — refuse loudly (at 2^-128 per
            # pair this indicates corrupt input or a broken hash kernel,
            # not id-space exhaustion)
            import pandas as pd

            df = g.to_pandas()
            dup = df[df.duplicated("id", keep=False)].sort_values("id").head(4)
            raise RuntimeError(
                f"term-id collision in NodeTable build (128-bit ids): "
                f"{dup.to_dict('records')}"
            )
        idx = pc.sort_indices(g, sort_keys=[("id", "ascending")])
        return g.take(idx)

    out = (
        ds.map_batches(explode_terms, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    out.write_parquet(
        path, partition_cols=["bucket"], min_rows_per_file=min_rows_per_file
    )


def materialize_indexes(
    out_dir: str,
    *,
    orders: tuple[str, ...] = ("spo", "pos", "osp"),
    triples_path: str | None = None,
    min_rows_per_file: int = 500_000,
    assume_deduped: bool = False,
    layout: str = "bucketed-ids",
    num_buckets: int = 32,
):
    """Build the index layouts from the phase-1 triple parquet.

    Phase split mirrors TDB's bulk loader (LoaderNodeTupleTable.java:91-126):
    phase A computes ids + the terms table + the deduped id-triple table
    ("data" phase: node table + primary); phase B rebuilds each permutation
    from the id table ("index" phase) — SEQUENTIALLY, because concurrent
    all-to-all shuffles interfere (measured 2x slower than back-to-back).
    Global dedup (tdbloader2 ``sort -u``) happens on id rows; skipped via
    `assume_deduped` when phase 1 was a single globally-deduped wave.
    """
    import shutil

    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact

    triples_path = triples_path or os.path.join(out_dir, "triples")
    stats: dict[str, str] = {}

    if layout == "global":
        # legacy string-row path (total order, tdbloader2-style)
        ds = rd.read_parquet(triples_path, columns=["subj", "pred", "obj"])
        if not assume_deduped:
            ds = dedup_exact(ds, cols=("subj", "pred", "obj"))
        primary, *secondary = orders
        primary_path = os.path.join(out_dir, primary)
        shutil.rmtree(primary_path, ignore_errors=True)
        ds.sort(INDEX_ORDERS[primary]).write_parquet(
            primary_path, min_rows_per_file=min_rows_per_file
        )
        stats[primary] = primary_path
        for order in secondary:
            sds = rd.read_parquet(primary_path, columns=["subj", "pred", "obj"])
            path = os.path.join(out_dir, order)
            shutil.rmtree(path, ignore_errors=True)
            sds.sort(INDEX_ORDERS[order]).write_parquet(
                path, min_rows_per_file=min_rows_per_file
            )
            stats[order] = path
        _write_layout(out_dir, layout, 0)
        return stats

    # If the wave already stamped id columns (kg.run_kg does — one hash pass
    # for the whole build), every phase below is a column-pruned read; the
    # legacy path recomputes ids for triple parquet from other producers.
    pre_stamped = {"s_id", "p_id", "o_id"} <= set(
        rd.read_parquet(triples_path).schema().names
    )

    # ---- phase A (NodeTable): terms table — the only string shuffle ----
    if pre_stamped:
        with_ids = rd.read_parquet(
            triples_path,
            columns=["subj", "pred", "obj", "s_id", "p_id", "o_id"],
        )
    else:
        with_ids = rd.read_parquet(
            triples_path, columns=["subj", "pred", "obj"]
        ).map_batches(_add_ids, batch_format="pyarrow")

    terms_path = os.path.join(out_dir, "terms")
    shutil.rmtree(terms_path, ignore_errors=True)
    _build_terms_table(with_ids, terms_path, num_buckets, min_rows_per_file)
    stats["terms"] = terms_path

    # ---- phase B: one bucketed shuffle per permutation, SEQUENTIALLY.
    # The global id-dedup (`sort -u`) fuses into the PRIMARY build's
    # shuffle; secondaries re-read the deduped primary (smaller input, hot
    # in the page cache). A/B-measured against a fused single-shuffle
    # variant that tagged every row ×3 with (tag, bucket) and ran one
    # combined groupby: the fused exchange was ~1.8× SLOWER at 23.5M rows
    # (3× rows through one shuffle beats 3 smaller shuffles' fixed costs
    # only on paper — the combined sort/partition write dominated), so the
    # sequential layout stays. Concurrent full-resource shuffles interfere
    # ~2× (round-2 measurement), hence sequential, not parallel.
    if pre_stamped:
        ids = rd.read_parquet(triples_path, columns=["s_id", "p_id", "o_id"])
    else:
        ids = rd.read_parquet(
            triples_path, columns=["subj", "pred", "obj"]
        ).map_batches(
            lambda t: _add_ids(t).select(["s_id", "p_id", "o_id"]),
            batch_format="pyarrow",
        )
    primary, *secondary = orders
    primary_path = os.path.join(out_dir, primary)
    shutil.rmtree(primary_path, ignore_errors=True)
    _build_bucketed_ids(
        ids, primary, primary_path, num_buckets, min_rows_per_file,
        dedup=not assume_deduped,
    )
    stats[primary] = primary_path
    # JENA_RAY_OVERLAP_INDEX_BUILDS=1 runs the secondary permutation
    # builds CONCURRENTLY (one thread per permutation, the
    # BuilderSecondaryIndexesParallel strategy —
    # jena-tdb bulkloader/BuilderSecondaryIndexesParallel.java:26-57).
    # Default off: on this single node two full-resource shuffles
    # interfere ~2x (round-2 A/B); on a real multi-node cluster the
    # shuffles spread across machines and overlap pays — flip the env
    # var there (BASELINE.md "index-phase overlap" note).
    overlap = os.environ.get("JENA_RAY_OVERLAP_INDEX_BUILDS", "0") == "1"
    if os.path.isdir(primary_path):
        def _one(order: str) -> None:
            sds = rd.read_parquet(
                primary_path, columns=["s_id", "p_id", "o_id"]
            )
            path = os.path.join(out_dir, order)
            shutil.rmtree(path, ignore_errors=True)
            _build_bucketed_ids(
                sds, order, path, num_buckets, min_rows_per_file,
                dedup=False,
            )
            stats[order] = path

        if overlap and len(secondary) > 1:
            import threading

            ts = [threading.Thread(target=_one, args=(o,))
                  for o in secondary]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        else:
            for order in secondary:
                _one(order)
    _write_layout(out_dir, layout, num_buckets)
    return stats


def stale_id_layout(out_dir: str, index: str, id_col: str) -> bool:
    """True when a cached index under ``out_dir`` stores ``id_col`` with a
    type other than the current ID_TYPE (e.g. int64 parquet written before
    the 128-bit migration). Cheap: reads one footer schema."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = _glob.glob(os.path.join(out_dir, index, "**", "*.parquet"),
                       recursive=True)
    if not files:
        return False
    try:
        schema = pq.read_schema(files[0])
    except Exception:
        return True  # unreadable cache: rebuild
    f = schema.field(id_col) if id_col in schema.names else None
    return f is None or f.type != ID_TYPE


def _term_bucket_ids(ids: list, num_buckets: int) -> int:
    """Bucket id for bound leading id(s) — same hash path as add_bucket."""
    import pyarrow as pa

    from jena_ray.stages.dedup import _key_hash

    t = pa.table(
        {f"c{i}": pa.array([v], type=ID_TYPE) for i, v in enumerate(ids)}
    )
    h = _key_hash(t, [f"c{i}" for i in range(len(ids))])
    return int(h[0]) % num_buckets


def lookup_terms(out_dir: str, ids: list[bytes]) -> dict[bytes, str]:
    """Resolve term ids → canonical term strings from the bucketed terms
    table (NodeTable lookup). Driver-side per-bucket filtered parquet reads —
    fine for small result sets; the scale path is a bucket-aligned map-side
    join (both sides share the id%B layout)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    info = read_layout(out_dir)
    nb = info["num_buckets"]
    from jena_ray.state import deltas as _deltas

    _dst = _deltas.load_state(out_dir)
    by_bucket: dict[int, list[int]] = {}
    for i in set(ids):
        by_bucket.setdefault(_id_bucket(i, nb), []).append(i)
    out: dict[int, str] = {}
    for b, wanted in by_bucket.items():
        path = os.path.join(out_dir, "terms", f"bucket={b}")
        if not os.path.isdir(path):
            continue
        t = pq.read_table(path, columns=["id", "term"])
        mask = pc.is_in(t.column("id"), value_set=pa.array(wanted, type=ID_TYPE))
        sel = t.filter(mask)
        out.update(zip(sel.column("id").to_pylist(), sel.column("term").to_pylist()))
    if _dst is not None and _dst.terms.num_rows:
        want = set(ids)
        for i, term in zip(_dst.terms.column("id").to_pylist(),
                           _dst.terms.column("term").to_pylist()):
            if i in want:
                out[i] = term
    return out


def _id_bucket(i: bytes, num_buckets: int) -> int:
    return _term_bucket_ids([i], num_buckets)


def pattern_scan(
    out_dir: str,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    *,
    resolve_terms: bool = True,
):
    """Triple-pattern match against the materialized layout: pick the index
    whose leading columns are bound (TDB's index choice — jena-tdb
    solver/SolverLib.java:55, StageMatchTuple), prune to the matching hash
    bucket when the bucket key is fully bound, push the id filter to the
    parquet read (B+Tree prefix-scan analog), then resolve ids → terms.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    info = read_layout(out_dir)
    bound_terms = {"subj": s, "pred": p, "obj": o}
    if s is not None:
        order = "spo"
    elif p is not None:
        order = "pos"
    elif o is not None:
        order = "osp"
    else:
        order = "spo"
    path = os.path.join(out_dir, order)

    if info["layout"] == "global":
        expr = None
        for col, val in bound_terms.items():
            if val is None:
                continue
            e = pc.field(col) == val
            expr = e if expr is None else (expr & e)
        if expr is None:
            return rd.read_parquet(path, columns=["subj", "pred", "obj"])
        return rd.read_parquet(path, columns=["subj", "pred", "obj"], filter=expr)

    bound_ids = {
        idc: (term_id(bound_terms[t]) if bound_terms[t] is not None else None)
        for idc, t in _TERM_FOR_ID.items()
    }
    bkeys = ID_BUCKET_KEYS[order]
    if all(bound_ids[c] is not None for c in bkeys):
        b = _term_bucket_ids([bound_ids[c] for c in bkeys], info["num_buckets"])
        path = os.path.join(path, f"bucket={b}")
        if not os.path.isdir(path):
            import pyarrow as pa

            empty = pa.table(
                {c: pa.array([], type=pa.string()) for c in ("subj", "pred", "obj")}
            )
            return rd.from_arrow(empty)
    expr = None
    for idc, val in bound_ids.items():
        if val is None:
            continue
        # typed scalar REQUIRED: fsb16 == untyped-bytes (variable binary)
        # segfaults pyarrow's scanner in pushed-down parquet filters
        import pyarrow as pa

        e = pc.field(idc) == pa.scalar(val, ID_TYPE)
        expr = e if expr is None else (expr & e)
    cols = ["s_id", "p_id", "o_id"]
    ds = (
        rd.read_parquet(path, columns=cols, filter=expr)
        if expr is not None
        else rd.read_parquet(path, columns=cols)
    )
    if not resolve_terms:
        return ds

    # resolve ids → terms with the bucket-aligned map-side join (streams;
    # never materializes the match set on the driver)
    return resolve_id_columns(
        ds, out_dir, {"s_id": "subj", "p_id": "pred", "o_id": "obj"}
    )


def resolve_id_columns(ds, out_dir: str, col_map: dict[str, str]):
    """Resolve id columns → canonical term strings with the BUCKET-ALIGNED
    map-side join: one bucketed shuffle per id column (rows move by the
    same id-hash the terms table was written with), then each bucket group
    joins IN MEMORY against its aligned ``terms/bucket=k`` parquet file via
    a vectorized ``index_in``/``take``. The NodeTable itself never moves —
    the distributed id→term path (replaces NodeTable B+Tree point lookups,
    jena-tdb store/nodetable/NodeTableNative.java) for results too large to
    broadcast or fetch driver-side. Each group's memory = its binding rows
    + one |terms|/num_buckets file; size num_buckets accordingly.

    ``col_map`` maps id column → output term column; columns resolve in
    dict order, each dropped and re-appended, so ``{"s_id": "subj",
    "p_id": "pred", "o_id": "obj"}`` yields (subj, pred, obj)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from jena_ray.stages.dedup import add_bucket

    info = read_layout(out_dir)
    nb = info["num_buckets"]
    terms_root = os.path.join(out_dir, "terms")

    # incremental-update overlay (state/deltas): terms introduced by
    # pending INSERT DATA deltas are absent from the bucket files — ship
    # the (request-sized) delta terms table in the closure and append it
    # before the index_in lookup
    from jena_ray.state import deltas as _deltas

    _dst = _deltas.load_state(out_dir)
    _dterms = (_dst.terms if _dst is not None and _dst.terms.num_rows
               else None)

    for idc, name in col_map.items():

        def bucketize(t, _c=idc):
            # nulls (unmatched OPTIONAL bindings) are safe: _key_hash's
            # fixed_size_binary lane path always emits a validity lane, so
            # bucket assignment is identical with or without nulls in the
            # batch, and null rows land in one bucket where they resolve
            # to null terms
            return add_bucket(t, [_c], nb)

        def resolve(g, _c=idc, _n=name):
            import pyarrow as pa

            b = g.column("_bucket")[0].as_py()
            bpath = os.path.join(terms_root, f"bucket={b}")
            if not os.path.isdir(bpath):
                # hash-partitioned writes skip empty buckets; a bucket with
                # no terms can still receive all-null id rows (unmatched
                # OPTIONAL bindings) — they resolve to null terms (via the
                # delta-terms lookup, which is empty without deltas)
                tt0 = (_dterms if _dterms is not None
                       else pa.table({"id": pa.array([], type=ID_TYPE),
                                      "term": pa.array([], type=pa.string())}))
                idx0 = pc.index_in(g.column(_c), value_set=tt0.column("id"))
                out = g.drop_columns(["_bucket", _c])
                return out.append_column(
                    _n, pc.take(tt0.column("term"), idx0)
                )
            tt = pq.read_table(bpath, columns=["id", "term"])
            if _dterms is not None:
                tt = pa.concat_tables([tt, _dterms])
            idx = pc.index_in(g.column(_c), value_set=tt.column("id"))
            out = g.drop_columns(["_bucket", _c])
            return out.append_column(_n, pc.take(tt.column("term"), idx))

        ds = ds.map_batches(bucketize, batch_format="pyarrow")
        # coalesce to nb blocks first: the groupby has at most nb distinct
        # groups, so extra input blocks only spawn EMPTY reduce tasks (a
        # 16-group shuffle over 192 tiny blocks ran 176 no-op tasks — pure
        # fixed overhead on query-sized data; at corpus scale the reduce
        # already concentrates rows into nb groups, so nb blocks is the
        # memory shape either way)
        ds = ds.repartition(nb)
        ds = ds.groupby("_bucket").map_groups(resolve, batch_format="pyarrow")
    return ds


def read_index_terms(out_dir: str, order: str = "spo"):
    """Full index as term-string triples via the bucket-aligned map-side
    join (resolve_id_columns) — no broadcast, no driver materialization."""
    import ray.data as rd

    info = read_layout(out_dir)
    if info["layout"] == "global":
        return rd.read_parquet(os.path.join(out_dir, order), columns=["subj", "pred", "obj"])
    ds = rd.read_parquet(os.path.join(out_dir, order), columns=["s_id", "p_id", "o_id"])
    return resolve_id_columns(
        ds, out_dir, {"s_id": "subj", "p_id": "pred", "o_id": "obj"}
    )
