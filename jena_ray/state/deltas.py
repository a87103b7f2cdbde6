"""Incremental-update delta overlay — TDB2's journal-then-merge idea
(jena-db/.../tdb2: updates land in a journal and merge into the base at
compaction) over the immutable parquet layout.

A ground ``INSERT DATA`` / ``DELETE DATA`` no longer rebuilds the store:
it appends to a NORMALIZED two-file overlay under ``out_dir/delta/``

    delta/inserts.parquet     (subj, pred, obj, s_id, p_id, o_id)
    delta/deletes.parquet     (subj, pred, obj, s_id, p_id, o_id)
    delta/terms.parquet       (id, term)   new terms of the inserts
    delta/_state.json         {"ops": n}   bump = cache invalidation

with the invariants (maintained at write time):

    inserts ∩ base   = ∅        (rows already in the base only cancel a
                                 pending delete)
    deletes ⊆ base              (deleting a never-present row is a no-op)
    inserts ∩ deletes = ∅

so the merged view is simply ``(base ∖ deletes) ∪ inserts`` with no
op-ordering and no duplicate solutions (the store is a SET —
Graph.add/delete idempotence). Readers overlay at two choke points:
``bgp._scan_pattern`` (id-space pattern scans) and
``materialize.resolve_id_columns`` / ``lookup_terms`` (NodeTable).

Scale contract: DATA blocks are part of the update request TEXT, so the
overlay is request-sized, held as in-memory Arrow tables and shipped in
task closures. Past ``COMPACT_ROWS`` total overlay rows the next update
triggers compaction (fold into base + full index rebuild — the previous
behavior); every non-ground-DATA update compacts first, so the WHERE /
template machinery and sidecars always read a delta-free store.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

#: overlay size that triggers compaction on the next update
COMPACT_ROWS = 100_000

_TRIPLE_COLS = ("subj", "pred", "obj")
_ID_COLS = ("s_id", "p_id", "o_id")

# per-process cache: out_dir -> (state_token, DeltaState)
_CACHE: dict[str, tuple] = {}


def _delta_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "delta")


def _state_path(out_dir: str) -> str:
    return os.path.join(_delta_dir(out_dir), "_state.json")


class DeltaState:
    """In-memory view of the overlay: small Arrow tables (request-sized
    by contract; see module docstring)."""

    def __init__(self, inserts: pa.Table, deletes: pa.Table,
                 terms: pa.Table):
        self.inserts = inserts      # subj/pred/obj + s_id/p_id/o_id
        self.deletes = deletes      # same schema (terms kept for compaction)
        self.terms = terms          # id/term

    @property
    def empty(self) -> bool:
        return self.inserts.num_rows == 0 and self.deletes.num_rows == 0

    def delete_keys(self) -> pa.Array:
        """48-byte concatenated (s,p,o) id keys of the delete set."""
        return _triple_keys(self.deletes)


def _triple_keys(tb: pa.Table) -> pa.Array:
    import pyarrow.compute as pc

    cols = [tb.column(c) for c in _ID_COLS]
    cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in cols]
    return pc.binary_join_element_wise(
        *[c.cast(pa.binary()) for c in cols],
        pa.scalar(b"", type=pa.binary()),
    )


def _empty_inserts() -> pa.Table:
    from jena_ray.stages.materialize import ID_TYPE

    return pa.table({
        "subj": pa.array([], type=pa.string()),
        "pred": pa.array([], type=pa.string()),
        "obj": pa.array([], type=pa.string()),
        "s_id": pa.array([], type=ID_TYPE),
        "p_id": pa.array([], type=ID_TYPE),
        "o_id": pa.array([], type=ID_TYPE),
    })


def _empty_deletes() -> pa.Table:
    return _empty_inserts()


def _empty_terms() -> pa.Table:
    from jena_ray.stages.materialize import ID_TYPE

    return pa.table({
        "id": pa.array([], type=ID_TYPE),
        "term": pa.array([], type=pa.string()),
    })


def load_state(out_dir: str) -> DeltaState | None:
    """The current overlay, or None when the store has no deltas. Cached
    per process, invalidated by the _state.json op counter."""
    sp = _state_path(out_dir)
    try:
        with open(sp) as f:
            token = f.read()
    except FileNotFoundError:
        _CACHE.pop(out_dir, None)
        return None
    hit = _CACHE.get(out_dir)
    if hit is not None and hit[0] == token:
        return hit[1]
    import pyarrow.parquet as pq

    d = _delta_dir(out_dir)

    def read(name: str, fallback):
        p = os.path.join(d, name)
        return pq.read_table(p) if os.path.isfile(p) else fallback

    st = DeltaState(
        read("inserts.parquet", _empty_inserts()),
        read("deletes.parquet", _empty_deletes()),
        read("terms.parquet", _empty_terms()),
    )
    _CACHE[out_dir] = (token, st)
    return st


def _write_state(out_dir: str, st: DeltaState) -> None:
    import pyarrow.parquet as pq

    d = _delta_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    pq.write_table(st.inserts, os.path.join(d, "inserts.parquet"))
    pq.write_table(st.deletes, os.path.join(d, "deletes.parquet"))
    pq.write_table(st.terms, os.path.join(d, "terms.parquet"))
    try:
        with open(_state_path(out_dir)) as f:
            ops = json.load(f).get("ops", 0)
    except FileNotFoundError:
        ops = 0
    tmp = _state_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"ops": ops + 1}, f)
    os.replace(tmp, _state_path(out_dir))  # atomic commit point
    _CACHE.pop(out_dir, None)


def clear(out_dir: str) -> None:
    import shutil

    shutil.rmtree(_delta_dir(out_dir), ignore_errors=True)
    _CACHE.pop(out_dir, None)


def overlay_rows(out_dir: str) -> int:
    st = load_state(out_dir)
    if st is None:
        return 0
    return st.inserts.num_rows + st.deletes.num_rows


def _with_ids(triples: list[tuple]) -> pa.Table:
    """Ground (s, p, o) term rows -> table with both term and id columns,
    set-deduped."""
    from jena_ray.stages.materialize import term_id_array

    t = pa.table({
        "subj": pa.array([x[0] for x in triples], type=pa.string()),
        "pred": pa.array([x[1] for x in triples], type=pa.string()),
        "obj": pa.array([x[2] for x in triples], type=pa.string()),
    })
    from jena_ray.stages.dedup import dedup_batch

    t = dedup_batch(t, list(_TRIPLE_COLS))
    for c, idc in zip(_TRIPLE_COLS, _ID_COLS):
        t = t.append_column(idc, term_id_array(t.column(c)))
    return t


def _base_membership(out_dir: str, rows: pa.Table,
                     num_partitions: int) -> pa.Array:
    """Boolean mask: which of ``rows`` (id columns) exist in the BASE
    index (delta-unaware probe). One bucket-pruned distributed scan per
    distinct subject bucket via an is_in subject filter."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.pipelines.bgp import read_layout
    from jena_ray.stages.materialize import ID_ORDERS

    if rows.num_rows == 0:
        return pa.array([], type=pa.bool_())
    info = read_layout(out_dir)
    spo = os.path.join(out_dir, "spo")
    if not os.path.isdir(spo):
        return pa.array([False] * rows.num_rows)
    want_sids = pc.unique(rows.column("s_id").combine_chunks()
                          if isinstance(rows.column("s_id"), pa.ChunkedArray)
                          else rows.column("s_id"))
    ds = rd.read_parquet(spo, columns=list(_ID_COLS))

    def probe(tb: pa.Table, _w=want_sids) -> pa.Table:
        return tb.filter(pc.is_in(tb.column("s_id"), value_set=_w))

    hits = [b for b in ds.map_batches(probe, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not hits:
        return pa.array([False] * rows.num_rows)
    base_keys = _triple_keys(pa.concat_tables(hits))
    return pc.is_in(_triple_keys(rows), value_set=base_keys)


def apply_data_op(out_dir: str, triples: list[tuple], *, insert: bool,
                  num_partitions: int) -> dict:
    """Apply one ground triple INSERT DATA / DELETE DATA as a delta —
    O(delta) files touched (the three overlay files + the op counter);
    the base layout is untouched. Returns the update result dict."""
    import pyarrow.compute as pc

    from jena_ray.stages.dedup import dedup_batch

    st = load_state(out_dir) or DeltaState(
        _empty_inserts(), _empty_deletes(), _empty_terms()
    )
    rows = _with_ids(triples)
    keys = _triple_keys(rows)
    ins_keys = _triple_keys(st.inserts)
    del_keys = _triple_keys(st.deletes)
    in_base = _base_membership(out_dir, rows, num_partitions)

    if insert:
        # rows already deleted: cancel the delete; rows not in base (and
        # not already pending): add to inserts
        st = DeltaState(
            pa.concat_tables([
                st.inserts,
                rows.filter(pc.and_(
                    pc.invert(in_base),
                    pc.invert(pc.is_in(keys, value_set=ins_keys)),
                )),
            ]),
            st.deletes.filter(
                pc.invert(pc.is_in(del_keys, value_set=keys))
            ),
            st.terms,
        )
        # terms delta: ids the base NodeTable may not know. Cheap SUPERSET
        # (all insert terms): resolve-time overlay dedups against the
        # bucket file, so a term already in the base is harmless.
        tcols = []
        for c, idc in zip(_TRIPLE_COLS, _ID_COLS):
            tcols.append(pa.table({
                "id": st.inserts.column(idc),
                "term": st.inserts.column(c),
            }))
        terms = dedup_batch(pa.concat_tables(tcols), ["id", "term"])
        st = DeltaState(st.inserts, st.deletes, terms)
    else:
        # rows in base: mark deleted; rows pending insert: drop them
        new_dels = rows.filter(pc.and_(
            in_base,
            pc.invert(pc.is_in(keys, value_set=del_keys)),
        ))
        st = DeltaState(
            st.inserts.filter(
                pc.invert(pc.is_in(ins_keys, value_set=keys))
            ),
            pa.concat_tables([st.deletes, new_dels]),
            st.terms,
        )
    before = base_count(out_dir)
    _write_state(out_dir, st)
    return {"triples_before": before, "triples_after": base_count(out_dir)}


def base_count(out_dir: str) -> int:
    """Merged triple SET size: |spo index| - |deletes| + |inserts| (the
    index is the deduped set; the overlay invariants make the arithmetic
    exact)."""
    import ray.data as rd

    spo = os.path.join(out_dir, "spo")
    base = rd.read_parquet(spo).count() if os.path.isdir(spo) else 0
    st = load_state(out_dir)
    if st is None:
        return base
    return base - st.deletes.num_rows + st.inserts.num_rows
