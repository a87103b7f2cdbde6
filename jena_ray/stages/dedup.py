"""Exact deduplication and pre-aggregated counting (the wide shuffles).

Graph semantics are set semantics — ``Graph.add`` is idempotent
(jena-core graph/Graph.java; SURVEY.md §2.7) — so the triple table must be
globally exact-deduped. At 10^12-document scale the triple stream is massively
duplicated on hub entities (a handful of distinct relation triples repeated
across billions of pages), which makes a naive ``groupby(s,p,o)`` the skew
bottleneck.

Strategy (two-phase, combiner-first):

1. **Local dedup** inside ``map_batches`` — each block drops its own
   duplicates with a vectorized Arrow group-by. For hub-heavy predicates this
   collapses each block to at most |distinct| rows, so the all-to-all shuffle
   that follows moves ~|distinct| × num_blocks rows instead of the full
   stream. This is the salting/combiner step: hot keys are spread across
   blocks, and each block contributes one representative.
2. **Global dedup** — hash-shuffle ``groupby`` on the key columns, keep the
   first row per group.

The same pattern (partial per-block aggregation → small global groupby)
backs ``pre_aggregated_count``, replacing the reference's map-side combine in
elephas count jobs (NodeCountReducer, jena-elephas .../count/*.java).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa


def _int_cols(batch: pa.Table, cols: Sequence[str]):
    """The key columns as null-free int64/uint64 numpy LANES, or None when
    any column is neither integer nor fixed_size_binary(16) or has nulls
    (string path applies then). A fixed_size_binary(16) id column (128-bit
    term ids) contributes two uint64 lanes — zero-copy views of the value
    buffer."""
    import numpy as np

    import pyarrow.compute as pc

    out = []
    for c in cols:
        a = batch.column(c)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if pa.types.is_integer(a.type):
            if a.null_count:
                return None
            out.append(a.to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
        elif (pa.types.is_fixed_size_binary(a.type)
              and a.type.byte_width == 16):
            # id columns can be nullable (OPTIONAL outputs) and can't take
            # the string fallback (arbitrary bytes aren't UTF-8): ALWAYS
            # emit a validity lane (so the key hash is identical whether or
            # not a given batch happens to contain nulls) and fill nulls
            # with zero bytes — null stays a distinct key from any real id
            out.append(
                pc.is_valid(a).to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            if a.null_count:
                a = pc.fill_null(a, b"\x00" * 16)
            raw = np.frombuffer(a.buffers()[1], dtype="<u8")
            w = raw[a.offset * 2 : (a.offset + len(a)) * 2]
            out.append(np.ascontiguousarray(w[0::2]).view(np.int64))
            out.append(np.ascontiguousarray(w[1::2]).view(np.int64))
        else:
            return None
    return out


def _string_key_cols(batch: pa.Table, cols: Sequence[str]) -> list:
    """String arrays for the concatenated-key fallback. fixed_size_binary
    id columns are NOT UTF-8-castable: decompose each into a validity
    column plus two EXACT int64 lanes (cast to string), preserving exact
    key identity (null ids equal each other, distinct from every real
    id)."""
    import numpy as np
    import pyarrow.compute as pc

    out = []
    for c in cols:
        a = batch.column(c)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if (pa.types.is_fixed_size_binary(a.type)
                and a.type.byte_width == 16):
            out.append(pc.cast(pc.is_valid(a), pa.string()))
            if a.null_count:
                a = pc.fill_null(a, b"\x00" * 16)
            raw = np.frombuffer(a.buffers()[1], dtype="<u8")
            w = raw[a.offset * 2 : (a.offset + len(a)) * 2]
            out.append(pc.cast(
                pa.array(np.ascontiguousarray(w[0::2]).view(np.int64)),
                pa.string(),
            ))
            out.append(pc.cast(
                pa.array(np.ascontiguousarray(w[1::2]).view(np.int64)),
                pa.string(),
            ))
        else:
            out.append(pc.cast(a, pa.string()))
    return out


def dedup_batch(batch: pa.Table, cols: Sequence[str]) -> pa.Table:
    """Vectorized within-block dedup: keep the first row per key.

    One hash group-by over the raw key columns with a min(row-index)
    aggregate picks each key's first occurrence; the take preserves the
    original row order. O(n) hashing — A/B-measured 21× faster than the
    previous np.unique structured-void sort on 3×fsb16 id triples (0.50 s
    vs 10.7 s at 2 M rows) and 9× on int64 lanes, with identical output,
    including null-key rows (each null keeps its own group, equal nulls
    collapse — Arrow group-by null semantics match the old validity-lane
    encoding). Non-groupable key types (nested lists etc.) fall back to the
    dictionary-encoded concatenated string key."""
    if batch.num_rows == 0:
        return batch
    import numpy as np
    import pyarrow.compute as pc

    try:
        key = batch.select(list(cols)).append_column(
            "__dedup_ri", pa.array(np.arange(batch.num_rows, dtype=np.int64))
        )
        g = key.group_by(list(cols), use_threads=False).aggregate(
            [("__dedup_ri", "min")]
        )
        first_idx = g.column("__dedup_ri_min").to_numpy()
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
        # null_handling="replace": a NULL key column must stay a DISTINCT
        # key value per row-key, not poison the whole joined key to null
        joined = pc.binary_join_element_wise(
            *_string_key_cols(batch, cols),
            "\x1f",
            null_handling="replace",
            null_replacement="\x00\x00"
        )
        d = pc.dictionary_encode(joined)
        codes = d.combine_chunks().indices if isinstance(d, pa.ChunkedArray) else d.indices
        codes_np = codes.to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(codes_np, return_index=True)
    if len(first_idx) == batch.num_rows:
        return batch
    return batch.take(pa.array(np.sort(first_idx)))


def _key_hash(batch: pa.Table, cols: Sequence[str]):
    """Deterministic vectorized 64-bit hash of the concatenated key columns.

    Explicit numpy-uint64 arithmetic (jena_ray.functions.hashing) — NOT a
    library hash whose key could drift across versions: on a heterogeneous
    cluster a pandas/polars version skew would silently split equal keys
    across buckets. Collisions only affect bucket balance, never results
    (each bucket is exactly deduped/grouped downstream).

    All-integer keys chain splitmix64 over the raw values (~100× faster
    than the cast-to-string path, measured 116 s → 1.2 s on 5.7M id
    triples — the id-index shuffles were spending more time stringifying
    int64s than sorting).

    HAZARD: a single null in an INT column flips the whole batch to the
    string path, which hashes DIFFERENT bucket values than the int path —
    callers bucketing on int keys must fill nulls first. fixed_size_binary
    id columns are immune: their lane decomposition always includes a
    validity lane, so the hash is identical with or without nulls."""
    import numpy as np
    import pyarrow.compute as pc

    from jena_ray.functions.hashing import hash_string_array, splitmix64

    ints = _int_cols(batch, cols)
    if ints is not None:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for v in ints:
            h = splitmix64(h ^ splitmix64(v.view(np.uint64)))
        return h
    joined = pc.binary_join_element_wise(
        *_string_key_cols(batch, cols),
        "\x1f",
        null_handling="replace",
        null_replacement="\x00\x00",
    )
    return hash_string_array(joined)


def add_bucket(batch: pa.Table, cols: Sequence[str], num_buckets: int) -> pa.Table:
    import numpy as np

    # modulo in uint64 space: mixing uint64 with a python int can promote to
    # float64 (precision loss) depending on scalar/array paths
    h = _key_hash(batch, cols) % np.uint64(num_buckets)
    return batch.append_column("_bucket", pa.array(h.astype("int64")))


def dedup_exact(
    ds,
    cols: Sequence[str] = ("subj", "pred", "obj"),
    keep_cols: Sequence[str] | None = None,
    num_buckets: int = 64,
    coalesce: bool = False,
):
    """Global exact dedup of a Dataset on `cols`.

    Two-phase: (1) per-block vectorized dedup — the combiner that collapses
    hub-key repetition before anything moves (hot keys appear once per block
    after this, so the shuffle is skew-free by construction); (2) hash-bucket
    shuffle — rows move to `num_buckets` groups by key hash, and each bucket
    is deduped with ONE vectorized call (not one Python call per distinct
    key, which is why this is groupby('_bucket') and not groupby(cols)).

    Mirrors OpDistinct/DistinctDataBag semantics (jena-arq
    sparql/engine/iterator/QueryIterDistinct.java:46-83) with spill-to-disk
    replaced by Ray's object-store shuffle.

    Scale rule: each bucket must fit one worker's heap — size num_buckets ≈
    (distinct rows × row bytes) / 1 GiB at crawl scale.

    ``coalesce=True`` repartitions to num_buckets blocks before the
    groupby: the shuffle has at most num_buckets groups, so extra input
    blocks only spawn empty reduce tasks. Used by the query layer, where
    inputs are binding-sized and fixed task overhead dominates; the
    flagship wave keeps its measured default.
    """
    cols = list(cols)
    sel = cols + [c for c in (keep_cols or []) if c not in cols]

    def local(t: pa.Table) -> pa.Table:
        return add_bucket(dedup_batch(t.select(sel), cols), cols, num_buckets)

    def per_bucket(g: pa.Table) -> pa.Table:
        return dedup_batch(g, cols).drop_columns(["_bucket"])

    pre = ds.map_batches(local, batch_format="pyarrow")
    if coalesce:
        pre = pre.repartition(num_buckets)
    return pre.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def bucketed_group_apply(
    ds,
    key_cols: Sequence[str],
    fn,
    *,
    num_buckets: int = 64,
    batch_format: str = "pandas",
    coalesce: bool = False,
):
    """Co-locate rows by key hash, then apply `fn` once per BUCKET (not per
    key). `fn` receives all rows of a bucket (every key fully present) and
    must handle its multiple keys vectorized (e.g. a pandas groupby inside).

    This is the engine's generic partitioned-wide-op primitive: one Python
    call per bucket instead of one per distinct key, which is what makes
    high-cardinality groupbys viable (same trick as dedup_exact).
    ``coalesce`` as in dedup_exact (query-sized inputs).
    """
    key_cols = list(key_cols)

    def bucketize(t: pa.Table) -> pa.Table:
        return add_bucket(t, key_cols, num_buckets)

    def apply(g):
        out = fn(g.drop(columns=["_bucket"]) if hasattr(g, "drop") else g.drop_columns(["_bucket"]))
        return out

    pre = ds.map_batches(bucketize, batch_format="pyarrow")
    if coalesce:
        pre = pre.repartition(num_buckets)
    return pre.groupby("_bucket").map_groups(apply, batch_format=batch_format)


def with_empty_schema(ds, schema: pa.Schema):
    """Drop degenerate 0-column empty blocks so downstream ``Dataset.join``
    sees a stable schema.

    ``groupby(...).map_groups`` / sort emit a column-less empty block for an
    empty partition; Ray's hash-shuffle join then builds that partition's
    side as a 0-column table and pyarrow rejects the key ("No match ... for
    key field reference"). ``map_batches`` can't repair it — empty blocks
    bypass the UDF — so this rebuilds the dataset from the non-empty block
    refs (metadata only; no block bytes cross the driver). Executes the
    upstream pipeline at call time; use on bounded post-shuffle datasets
    (candidate pairs, group maps), not on the corpus stream."""
    import ray.data as rd

    # normalize non-empty blocks to Arrow (pandas-format map_groups output
    # would otherwise mix block types in from_arrow_refs); empty blocks
    # bypass the UDF and are dropped below via metadata
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)


def pre_aggregated_count(ds, key_cols: Sequence[str], alias: str = "count"):
    """count() per key with map-side partial aggregation.

    Emits one (key, partial_count) row per key per block inside map_batches,
    then sums partials with a small groupby — the elephas mapper+combiner+
    reducer chain (TripleNodeCountMapper → NodeCountReducer) in two Ray Data
    stages.
    """
    key_cols = list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key_cols, use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(key_cols + ["_partial"])

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(key_cols).aggregate(Sum("_partial", alias_name=alias))
    return out
