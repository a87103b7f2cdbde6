"""SPARQL Update over a materialized index — batch semantics.

The reference executes updates through UpdateEngineMain / UpdateAction
(jena-arq modify/UpdateEngineMain.java, update/UpdateAction.java) against a
mutable store. This engine's store is the immutable TDB-style parquet
layout, so an update is a BATCH rebuild (the tdbloader reload path):

1. compute the insert / delete triple Datasets — ground ``DATA`` blocks
   directly, ``modify`` templates instantiated per WHERE solution via
   bgp_construct (TemplateLib.subst);
2. new graph = (current ∖ deletes) ∪ inserts as SETS of canonical term
   strings (Graph.add/delete idempotence);
3. rewrite the phase-1 ``triples/`` table atomically (write-new → swap)
   and re-materialize the NodeTable + SPO/POS/OSP indexes.

One operation per request; WHERE clauses read the pre-update store (the
store is immutable during the rebuild, which also makes a killed update
resumable: the old layout stays valid until the swap).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

from jena_ray.sparql import Parser, SparqlSyntaxError, UpdateOp


def _ground_dataset(triples: list[tuple]):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([t[0] for t in triples], type=pa.string()),
                "pred": pa.array([t[1] for t in triples], type=pa.string()),
                "obj": pa.array([t[2] for t in triples], type=pa.string()),
            }
        )
    )


def _template_dataset(out_dir: str, op: UpdateOp, template: list[tuple],
                      num_partitions: int):
    from jena_ray.pipelines.bgp import bgp_construct

    g = op.where
    if g.optionals or g.minuses or g.union or g.values or g.paths or g.graph:
        raise SparqlSyntaxError(
            "update WHERE must be a plain BGP (+ FILTER) in this engine"
        )
    ground = [t for t in template if not any(s.startswith("?") for s in t)]
    templ = [t for t in template if any(s.startswith("?") for s in t)]
    wvars = sorted({t[1:] for p in g.patterns for t in p
                    if isinstance(t, str) and t.startswith("?")})
    if not wvars:
        # fully-ground WHERE: the template must be ground too; it applies
        # once iff every ground conjunct holds (independent probes — the
        # ground-ASK path), instead of running a zero-variable BGP
        from jena_ray.sparql import ground_pattern_holds

        if templ:
            raise SparqlSyntaxError(
                f"template variables not bound by the ground WHERE: {templ}"
            )
        if g.filters:
            raise SparqlSyntaxError("ground WHERE cannot carry FILTERs")
        holds = all(
            ground_pattern_holds(out_dir, p, num_partitions=num_partitions)
            for p in g.patterns
        )
        return _ground_dataset(ground) if (holds and ground) else None
    parts = []
    if templ:
        parts.append(
            bgp_construct(out_dir, g.patterns, templ,
                          num_partitions=num_partitions,
                          filters=g.filters or None, stats=False)
        )
    if ground:
        # ground template triples apply once if the WHERE matches at all
        from jena_ray.pipelines.bgp import bgp_execute

        one = bgp_execute(out_dir, g.patterns, wvars[:1],
                          num_partitions=num_partitions,
                          filters=g.filters or None,
                          stats=False).limit(1)
        if len(one.take(1)) > 0:
            parts.append(_ground_dataset(ground))
    if not parts:
        return None
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def _set_minus(cur, dele, num_partitions: int):
    """Set difference on (subj, pred, obj) via the bucketed-groupby shuffle
    (one hash shuffle, vectorized pandas anti-merge per bucket). Used
    instead of the join-based relational.except_all because the delete side
    comes out of a map_groups pipeline, whose empty hash partitions emit
    zero-column blocks that Dataset.join rejects (ray 2.49) while groupby
    shuffles tolerate them."""
    from jena_ray.stages.dedup import bucketed_group_apply

    cols = ["subj", "pred", "obj"]

    def mark(v: int):
        def f(tb: pa.Table) -> pa.Table:
            return tb.append_column(
                "_del", pa.array([v] * tb.num_rows, type=pa.int8())
            )

        return f

    u = cur.map_batches(mark(0), batch_format="pyarrow").union(
        dele.map_batches(mark(1), batch_format="pyarrow")
    )

    def per_bucket(df):
        bad = df.loc[df["_del"] == 1, cols].drop_duplicates()
        keep = df.loc[df["_del"] == 0, cols].merge(
            bad, on=cols, how="left", indicator=True
        )
        return keep.loc[keep["_merge"] == "left_only", cols]

    return bucketed_group_apply(
        u, cols, per_bucket, num_buckets=num_partitions, coalesce=True
    )


def sparql_update(out_dir: str, update: str | UpdateOp, *,
                  num_partitions: int = 16):
    """Parse + apply one SPARQL Update request to the index at ``out_dir``.

    Returns ``{"triples_before": n, "triples_after": m}``.
    """
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.stages.materialize import materialize_indexes, read_layout

    op = Parser(update).parse_update() if isinstance(update, str) else update

    if op.kind == "insert_data":
        inserts, deletes = _ground_dataset(op.insert), None
    elif op.kind == "delete_data":
        inserts, deletes = None, _ground_dataset(op.delete)
    else:
        deletes = (
            _template_dataset(out_dir, op, op.delete, num_partitions)
            if op.delete else None
        )
        inserts = (
            _template_dataset(out_dir, op, op.insert, num_partitions)
            if op.insert else None
        )

    triples_dir = os.path.join(out_dir, "triples")
    cur = rd.read_parquet(triples_dir)

    def three_cols(tb: pa.Table) -> pa.Table:
        return tb.select(["subj", "pred", "obj"])

    cur = cur.map_batches(three_cols, batch_format="pyarrow")
    n_before = cur.count()

    new = cur
    if deletes is not None:
        dl = deletes.map_batches(three_cols, batch_format="pyarrow")
        new = _set_minus(new, dl, num_partitions)
    if inserts is not None:
        ins = inserts.map_batches(three_cols, batch_format="pyarrow")
        new = new.union(ins)
    new = dedup_exact(new, cols=("subj", "pred", "obj"))

    # atomic-ish swap: the old layout stays valid until the rename
    tmp_dir = os.path.join(out_dir, "triples_new")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    new.write_parquet(tmp_dir)
    old_dir = os.path.join(out_dir, "triples_old")
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(triples_dir, old_dir)
    os.rename(tmp_dir, triples_dir)
    shutil.rmtree(old_dir, ignore_errors=True)

    info = read_layout(out_dir)
    materialize_indexes(
        out_dir, num_buckets=info["num_buckets"], assume_deduped=True,
        min_rows_per_file=info.get("min_rows_per_file", 500_000),
    )
    n_after = rd.read_parquet(triples_dir).count()
    return {"triples_before": n_before, "triples_after": n_after}
