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


def _quad_modify(out_dir: str, op: UpdateOp, *, num_partitions: int):
    """DELETE/INSERT WHERE with graph-scoped templates or WHERE patterns
    (WITH <g> lowering / GRAPH blocks — UpdateModify over a dataset):
    instantiate each template per WHERE solution as QUADS via
    bgp_construct (default-graph rows tagged <urn:x-arq:DefaultGraph>),
    then rebuild both store tables."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.pipelines.bgp import _scan_pattern, bgp_construct
    from jena_ray.stages.materialize import read_layout, resolve_id_columns
    from jena_ray.stages.quads import quad_pattern_scan

    info = read_layout(out_dir)
    if not info.get("quads"):
        raise SparqlSyntaxError(
            "graph-scoped updates need an RDF-dataset store "
            "(materialize_rdf_dataset layout)"
        )
    g = op.where
    if g is None or g.optionals or g.minuses or g.union or g.values or \
            g.paths or g.binds or g.exists or g.subqueries:
        raise SparqlSyntaxError(
            "update WHERE must be a plain (quad) BGP + FILTER"
        )

    DG = "<urn:x-arq:DefaultGraph>"

    def inst(template):
        if template is None:
            return None
        # force the quad path so the output always carries a graph column
        tq = [t if len(t) == 4 else (DG, *t) for t in template]
        return bgp_construct(
            out_dir, g.patterns, tq, num_partitions=num_partitions,
            filters=g.filters or None, stats=False,
        )

    def split(qds_all):
        # bgp_construct collapses an all-default-graph template back to
        # 3 columns — treat a missing graph column as "all default"
        def tri_b(t: pa.Table) -> pa.Table:
            if "graph" not in t.column_names:
                return t.select(["subj", "pred", "obj"])
            return t.filter(pc.equal(t.column("graph"), DG)).select(
                ["subj", "pred", "obj"])

        def named_b(t: pa.Table) -> pa.Table:
            if "graph" not in t.column_names:
                return pa.table({c: pa.array([], type=pa.string())
                                 for c in ("graph", "subj", "pred", "obj")})
            return t.filter(pc.invert(pc.equal(t.column("graph"), DG)))

        return (qds_all.map_batches(tri_b, batch_format="pyarrow"),
                qds_all.map_batches(named_b, batch_format="pyarrow"))

    ids = _scan_pattern(out_dir, ("?s", "?p", "?o"), info)
    cur_tri = resolve_id_columns(
        ids, out_dir, {"s": "subj", "p": "pred", "o": "obj"}
    ).map_batches(lambda t: t.select(["subj", "pred", "obj"]),
                  batch_format="pyarrow")
    cur_quads = quad_pattern_scan(out_dir)

    new_tri, new_quads = cur_tri, cur_quads
    dele = inst(op.delete)
    if dele is not None:
        # materialize the instantiated deletes BEFORE the rebuild path
        # consumes the store they scan
        d_tri, d_named = split(dele)
        new_tri = _set_minus(new_tri, d_tri, num_partitions)
        new_quads = _set_minus(new_quads, d_named, num_partitions,
                               cols=["graph", "subj", "pred", "obj"])
    ins = inst(op.insert)
    if ins is not None:
        i_tri, i_named = split(ins)
        new_tri = new_tri.union(i_tri)
        new_quads = new_quads.union(i_named)
    return _rebuild_dataset(out_dir, info, new_tri, new_quads)


def _load_document(out_dir: str, op: UpdateOp, *, num_partitions: int):
    """LOAD <doc> [INTO GRAPH <g>] (update/UpdateLoad.java): parse the
    document (format by extension, like RDFLanguages.filenameToLang) and
    insert its triples into the default graph or the named graph."""
    doc = op.graph_src[1:-1]
    path = doc[len("file://"):] if doc.startswith("file://") else doc
    if not os.path.isfile(path):
        if op.silent:
            return {"changed": False}
        raise SparqlSyntaxError(f"LOAD: no such document: {doc}")
    low = path.lower()
    try:
        text = open(path, encoding="utf-8").read()
        if low.endswith((".ttl", ".n3")):
            from jena_ray.turtle import parse_turtle

            rows = parse_turtle(text, base=doc)
        elif low.endswith(".nt"):
            from jena_ray.term import parse_ntriples

            rows = parse_ntriples(text, base=doc)
        else:
            raise SparqlSyntaxError(
                f"LOAD: unsupported document format: {doc} "
                "(.nt / .ttl / .n3)"
            )
    except SparqlSyntaxError:
        raise
    except Exception as e:
        if op.silent:
            return {"changed": False}
        raise SparqlSyntaxError(f"LOAD: cannot parse {doc}: {e}") from e
    rows = [r for r in rows if r is not None]
    if op.graph_dst is None:
        ground = UpdateOp("insert_data", insert=rows)
    else:
        ground = UpdateOp("insert_data",
                          insert=[(op.graph_dst, *t) for t in rows])
    return _apply_update_op(out_dir, ground, num_partitions=num_partitions)


def _set_minus(cur, dele, num_partitions: int,
               cols: list[str] | None = None):
    """Set difference on term-string columns via the bucketed-groupby
    shuffle (one hash shuffle, vectorized pandas anti-merge per bucket).
    Used instead of the join-based relational.except_all because the
    delete side comes out of a map_groups pipeline, whose empty hash
    partitions emit zero-column blocks that Dataset.join rejects
    (ray 2.49) while groupby shuffles tolerate them."""
    from jena_ray.stages.dedup import bucketed_group_apply

    cols = cols or ["subj", "pred", "obj"]

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


def _quads_dataset(quads: list[tuple]):
    import ray.data as rd

    cols = ("graph", "subj", "pred", "obj")
    return rd.from_arrow(
        pa.table({c: pa.array([q[i] for q in quads], type=pa.string())
                  for i, c in enumerate(cols)})
    )


def _dataset_update(out_dir: str, op: UpdateOp, *, num_partitions: int):
    """Graph management + GRAPH-qualified DATA over an RDF-dataset store
    (UpdateClear/Drop/Create/Add/Copy/Move + quad INSERT/DELETE DATA —
    jena-arq update/UpdateEngineWorker.java): batch semantics, like the
    triple path — snapshot the default graph + named quads in term space,
    apply the op, rebuild the whole store (materialize_rdf_dataset) and
    swap. TDB storage semantics: named graphs exist implicitly, so CREATE
    is a no-op and CLEAR/DROP of an absent graph succeeds (DatasetGraphTDB
    — the SILENT flag never matters here)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.pipelines.bgp import _scan_pattern
    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.stages.materialize import read_layout, resolve_id_columns
    from jena_ray.stages.quads import materialize_rdf_dataset, quad_pattern_scan

    info = read_layout(out_dir)
    if not info.get("quads"):
        raise SparqlSyntaxError(
            "graph-qualified updates need an RDF-dataset store "
            "(materialize_rdf_dataset layout)"
        )

    # term-space snapshots (the store is immutable until the swap)
    ids = _scan_pattern(out_dir, ("?s", "?p", "?o"), info)
    tri = resolve_id_columns(
        ids, out_dir, {"s": "subj", "p": "pred", "o": "obj"}
    ).map_batches(lambda t: t.select(["subj", "pred", "obj"]),
                  batch_format="pyarrow")
    qds = quad_pattern_scan(out_dir)

    def sel(ds, g):
        return ds.map_batches(
            lambda t, _g=g: t.filter(pc.equal(t.column("graph"), _g)),
            batch_format="pyarrow",
        )

    def drop_graph_col(ds):
        return ds.map_batches(
            lambda t: t.select(["subj", "pred", "obj"]),
            batch_format="pyarrow",
        )

    def with_graph(ds, g):
        return ds.map_batches(
            lambda t, _g=g: pa.table({
                "graph": pa.array([_g] * t.num_rows, type=pa.string()),
                "subj": t.column("subj"), "pred": t.column("pred"),
                "obj": t.column("obj"),
            }),
            batch_format="pyarrow",
        )

    def not_graph(ds, g):
        return ds.map_batches(
            lambda t, _g=g: t.filter(
                pc.invert(pc.equal(t.column("graph"), _g))
            ),
            batch_format="pyarrow",
        )

    empty_tri = rd.from_arrow(pa.table(
        {c: pa.array([], type=pa.string()) for c in ("subj", "pred", "obj")}
    ))
    empty_quads = rd.from_arrow(pa.table(
        {c: pa.array([], type=pa.string())
         for c in ("graph", "subj", "pred", "obj")}
    ))

    k, src, dst = op.kind, op.graph_src, op.graph_dst
    new_tri, new_quads = tri, qds
    if k == "create":
        # graphs exist implicitly (TDB): validate only
        return {"changed": False}
    if k in ("clear", "drop"):
        # CLEAR empties; DROP removes — identical on implicit-graph storage
        if src == "default":
            new_tri = empty_tri
        elif src == "named":
            new_quads = empty_quads
        elif src == "all":
            new_tri, new_quads = empty_tri, empty_quads
        else:
            new_quads = not_graph(qds, src)
    elif k in ("add", "copy", "move"):
        if src == dst:
            return {"changed": False}
        content = drop_graph_col(sel(qds, src)) if src != "default" else tri
        if k in ("copy", "move") and dst != "default":
            # destination is REPLACED by the source content (ADD keeps it)
            new_quads = not_graph(qds, dst)
        if dst == "default":
            new_tri = (content if k in ("copy", "move")
                       else tri.union(content))
        else:
            new_quads = new_quads.union(with_graph(content, dst))
        if k == "move":
            if src == "default":
                new_tri = empty_tri
            else:
                new_quads = not_graph(new_quads, src)
    elif k in ("insert_data", "delete_data"):
        rows = op.insert if k == "insert_data" else op.delete
        tri_rows = [t for t in rows if len(t) == 3]
        quad_rows = [t for t in rows if len(t) == 4]
        if k == "insert_data":
            if tri_rows:
                new_tri = tri.union(_ground_dataset(tri_rows))
            if quad_rows:
                new_quads = qds.union(_quads_dataset(quad_rows))
        else:
            if tri_rows:
                new_tri = _set_minus(tri, _ground_dataset(tri_rows),
                                     num_partitions)
            if quad_rows:
                key = {(g, s, p, o) for g, s, p, o in quad_rows}

                def drop_quads(t: pa.Table, _k=key) -> pa.Table:
                    import pandas as pd

                    df = t.to_pandas()
                    mask = [
                        (g, s, p, o) not in _k
                        for g, s, p, o in zip(df["graph"], df["subj"],
                                              df["pred"], df["obj"])
                    ]
                    return t.filter(pa.array(mask, type=pa.bool_()))

                new_quads = qds.map_batches(drop_quads,
                                            batch_format="pyarrow")
    else:
        raise SparqlSyntaxError(
            f"unsupported update kind on a dataset store: {k}"
        )

    return _rebuild_dataset(out_dir, info, new_tri, new_quads)


def _rebuild_dataset(out_dir: str, info: dict, new_tri, new_quads):
    """Common tail of every dataset-store update: dedup both tables,
    snapshot to parquet (the inputs lazily read the dirs the rebuild
    deletes), re-materialize the whole store, swap."""
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.stages.quads import materialize_rdf_dataset

    new_tri = dedup_exact(new_tri, cols=("subj", "pred", "obj"))
    new_quads = dedup_exact(new_quads,
                            cols=("graph", "subj", "pred", "obj"))
    # snapshot to parquet BEFORE the rebuild deletes the dirs both
    # snapshots lazily read from
    snap = os.path.join(out_dir, "_update_snapshot")
    shutil.rmtree(snap, ignore_errors=True)
    new_tri.write_parquet(os.path.join(snap, "tri"))
    new_quads.write_parquet(os.path.join(snap, "quads"))

    def read_or_empty(path: str, cols: tuple[str, ...]):
        has = os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )
        if not has:
            return rd.from_arrow(pa.table(
                {c: pa.array([], type=pa.string()) for c in cols}
            ))
        return rd.read_parquet(path)

    materialize_rdf_dataset(
        out_dir,
        read_or_empty(os.path.join(snap, "tri"), ("subj", "pred", "obj")),
        read_or_empty(os.path.join(snap, "quads"),
                      ("graph", "subj", "pred", "obj")),
        num_buckets=info["num_buckets"],
        min_rows_per_file=info.get("min_rows_per_file", 500_000),
    )
    shutil.rmtree(snap, ignore_errors=True)
    return {"changed": True}


def sparql_update(out_dir: str, update: "str | UpdateOp | list[UpdateOp]",
                  *, num_partitions: int = 16):
    """Parse + apply a SPARQL Update request to the index at ``out_dir``.

    A request is a ';'-separated sequence of operations, applied in order
    (UpdateRequest semantics — each operation's WHERE reads the store as
    left by the previous one). Returns the LAST operation's result dict:
    ``{"triples_before": n, "triples_after": m}`` for triple-store data
    updates, ``{"changed": bool}`` for graph-management / quad updates —
    or ``{"changed": False}`` for an empty request.
    """
    if isinstance(update, str):
        ops = Parser(update).parse_update_request()
    elif isinstance(update, UpdateOp):
        ops = [update]
    else:
        ops = list(update)
    if not ops:
        return {"changed": False}
    out = None
    for one in ops:
        out = _apply_update_op(out_dir, one, num_partitions=num_partitions)
    return out


def compact_deltas(out_dir: str, *, num_partitions: int = 16) -> None:
    """Fold the delta overlay into the base layout: triples/ becomes
    (base ∖ deletes) ∪ inserts, the NodeTable + SPO/POS/OSP indexes
    rebuild, and the overlay clears — TDB2's journal merge. No-op
    without deltas."""
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.stages.materialize import materialize_indexes, read_layout
    from jena_ray.state import deltas

    st = deltas.load_state(out_dir)
    if st is None:
        return
    if st.empty:
        deltas.clear(out_dir)
        return
    is_dataset = os.path.isdir(os.path.join(out_dir, "gspo"))
    triples_dir = os.path.join(out_dir, "triples")

    def three_cols(tb: pa.Table) -> pa.Table:
        return tb.select(["subj", "pred", "obj"])

    if is_dataset or not os.path.isdir(triples_dir):
        # dataset stores keep no phase-1 triples table: snapshot the
        # default graph from the (delta-unaware) SPO index
        from jena_ray.pipelines.bgp import _scan_pattern, read_layout as _rl
        from jena_ray.stages.materialize import resolve_id_columns

        ids = _scan_pattern(out_dir, ("?s", "?p", "?o"), _rl(out_dir))
        cur = resolve_id_columns(
            ids, out_dir, {"s": "subj", "p": "pred", "o": "obj"}
        )
    else:
        cur = rd.read_parquet(triples_dir)
    new = cur.map_batches(three_cols, batch_format="pyarrow")
    if st.deletes.num_rows:
        new = _set_minus(
            new, rd.from_arrow(st.deletes.select(["subj", "pred", "obj"])),
            num_partitions,
        )
    if st.inserts.num_rows:
        new = new.union(
            rd.from_arrow(st.inserts.select(["subj", "pred", "obj"]))
        )
    new = dedup_exact(new, cols=("subj", "pred", "obj"))
    info = read_layout(out_dir)
    if is_dataset:
        # RDF-dataset store: the NodeTable is shared with the quad
        # indexes — rebuild the whole dataset so quad terms survive
        from jena_ray.stages.quads import quad_pattern_scan

        _rebuild_dataset(out_dir, info, new, quad_pattern_scan(out_dir))
        deltas.clear(out_dir)
        return
    tmp_dir = os.path.join(out_dir, "triples_new")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    new.write_parquet(tmp_dir)
    old_dir = os.path.join(out_dir, "triples_old")
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(triples_dir, old_dir)
    os.rename(tmp_dir, triples_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    materialize_indexes(
        out_dir, num_buckets=info["num_buckets"], assume_deduped=True,
        min_rows_per_file=info.get("min_rows_per_file", 500_000),
    )
    deltas.clear(out_dir)


def _apply_update_op(out_dir: str, op: UpdateOp, *, num_partitions: int):
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.stages.materialize import materialize_indexes, read_layout
    from jena_ray.state import deltas

    # ground triple DATA ops land as delta-overlay appends — O(delta)
    # files touched, no index rebuild (TDB2 journal-then-merge). A triple
    # store only (quad DATA keeps the dataset-rebuild path below).
    if (op.kind in ("insert_data", "delete_data")
            and os.path.isdir(os.path.join(out_dir, "spo"))
            and not any(len(t) == 4
                        for t in (op.insert or op.delete or []))):
        data = op.insert if op.kind == "insert_data" else op.delete
        if (deltas.overlay_rows(out_dir) + len(data or [])
                > deltas.COMPACT_ROWS):
            compact_deltas(out_dir, num_partitions=num_partitions)
        return deltas.apply_data_op(
            out_dir, data or [], insert=(op.kind == "insert_data"),
            num_partitions=num_partitions,
        )
    # every other operation folds pending deltas first, so WHERE clauses,
    # templates, graph management and sidecar builds read a delta-free
    # store (and the rebuild below starts from the merged truth)
    if deltas.overlay_rows(out_dir):
        compact_deltas(out_dir, num_partitions=num_partitions)

    if op.kind == "load":
        return _load_document(out_dir, op, num_partitions=num_partitions)

    if op.where is not None:
        from jena_ray.sparql import reject_services

        reject_services(op.where)
    if getattr(op, "using", None):
        # USING g1 [USING g2 ...]: the WHERE evaluates against a dataset
        # whose DEFAULT graph is the merge of the named store graphs
        # (UpdateModify.getUsing; templates are unaffected). Lowered by
        # rewriting every WHERE triple pattern to a quad pattern with its
        # own fresh graph variable constrained to the USING set — the
        # merge is a set union, and the modify path's template dedup
        # absorbs the duplicate solutions a triple present in two graphs
        # produces. USING NAMED (re-scoping GRAPH blocks) is not
        # executable here and fails loudly.
        defaults = [iri for kind, iri in op.using if kind == "default"]
        named = [iri for kind, iri in op.using if kind == "named"]
        g = op.where
        if named or g is None:
            raise SparqlSyntaxError(
                "USING NAMED is not supported by this engine's executor"
            )
        if any(len(p) == 4 for p in g.patterns) or g.graph_enum:
            raise SparqlSyntaxError(
                "GRAPH blocks inside a USING WHERE need USING NAMED "
                "(unsupported)"
            )
        new_pats, extra_f = [], []
        for i, p in enumerate(g.patterns):
            gv = f"?__ug{i}"
            new_pats.append((gv, *p))
            if len(defaults) == 1:
                extra_f.append(("=", gv, defaults[0]))
            else:
                extra_f.append(("or", *[("=", gv, d) for d in defaults]))
        g.patterns = new_pats
        g.filters = list(g.filters) + extra_f
        op.using = None

    if op.kind in ("clear", "drop", "create", "add", "copy", "move") or (
        op.kind in ("insert_data", "delete_data")
        and any(len(t) == 4 for t in (op.insert or op.delete or []))
    ):
        return _dataset_update(out_dir, op, num_partitions=num_partitions)

    if op.kind == "modify" and (
        any(len(t) == 4 for t in (op.delete or []) + (op.insert or []))
        or any(len(p) == 4 for p in (op.where.patterns if op.where else []))
    ):
        return _quad_modify(out_dir, op, num_partitions=num_partitions)

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
