"""Basic-graph-pattern execution over the id indexes — the SPARQL-subset
query layer.

The reference's core capability: OpBGP → index scans + joins
(jena-arq sparql/engine/main/OpExecutor.java:62 executes each algebra op,
the TDB solver matches patterns index-by-index — jena-tdb
solver/SolverLib.java:55,209-215 with StageMatchTuple feeding bindings
forward). Ray-Data-first mapping:

- each triple pattern becomes a **pattern scan**: the index whose leading
  columns are bound serves a filtered parquet read (bucket-pruned when the
  bucket key is fully bound) producing a Dataset of VARIABLE BINDINGS in
  id space — int64 columns named by variable;
- patterns join left-to-right on shared variables with hash-partitioned
  ``Dataset.join`` — 8-byte id keys, never term strings (the join order
  heuristic is most-bound-first; a StatsMatcher-style cardinality planner
  slots in here);
- selected variables resolve ids → terms at the END, one hash join per
  variable against the bucketed ``terms/`` NodeTable — the distributed
  replacement for the driver-side lookup in materialize.read_index_terms.

Variables are spelled ``?name``; any other string is a concrete term in
canonical N-Triples form.
"""

from __future__ import annotations

import os

import pyarrow as pa

from jena_ray.stages.joins import safe_join
from jena_ray.stages.materialize import (
    ID_BUCKET_KEYS,
    ID_ORDERS,
    _TERM_FOR_ID,
    _term_bucket_ids,
    read_layout,
    term_id,
)

Pattern = tuple[str, str, str]


def is_var(t: str) -> bool:
    return t.startswith("?")


def _reorder_fixed(patterns: list[Pattern], _stats) -> list[Pattern]:
    """Most-bound-first join order (ReorderFixed.java semantics: static
    selectivity, no stats), preferring patterns connected to already-bound
    variables to avoid cartesian joins."""

    def n_bound(p: Pattern) -> int:
        return sum(0 if is_var(t) else 1 for t in p)

    remaining = sorted(patterns, key=n_bound, reverse=True)
    plan: list[Pattern] = []
    seen_vars: set[str] = set()
    while remaining:
        pick = None
        for cand in remaining:
            cvars = {t[1:] for t in cand if is_var(t)}
            if not plan or (cvars & seen_vars):
                pick = cand
                break
        if pick is None:  # disconnected pattern (cartesian) — take as-is
            pick = remaining[0]
        remaining.remove(pick)
        plan.append(pick)
        seen_vars |= {t[1:] for t in pick if is_var(t)}
    return plan


def _reorder_stats(patterns: list[Pattern], stats) -> list[Pattern]:
    from jena_ray.pipelines.tdbstats import reorder_patterns

    return reorder_patterns(patterns, stats)


# ReorderTransformation injection point (the reference swaps reorder
# strategies via setup — ReorderLib.java / ReorderTransformation; forks
# register e.g. ReorderWeighted). register_reorder("mine", fn) then pick
# per-call or replace a default.
REORDER_STRATEGIES: dict = {"fixed": _reorder_fixed, "stats": _reorder_stats}


def register_reorder(name: str, fn) -> None:
    REORDER_STRATEGIES[name] = fn


def _scan_pattern(out_dir: str, pattern: Pattern, info: dict):
    """One triple pattern → Dataset of bindings (var columns, id space)."""
    import pyarrow.compute as pc
    import ray.data as rd

    s, p, o = pattern
    terms = {"subj": s, "pred": p, "obj": o}
    bound = {k: v for k, v in terms.items() if not is_var(v)}
    if "subj" in bound:
        order = "spo"
    elif "pred" in bound:
        order = "pos"
    elif "obj" in bound:
        order = "osp"
    else:
        order = "spo"
    path = os.path.join(out_dir, order)

    bound_ids = {
        idc: (term_id(terms[t]) if t in ("subj", "pred", "obj") and not is_var(terms[t]) else None)
        for idc, t in _TERM_FOR_ID.items()
    }
    bkeys = ID_BUCKET_KEYS[order]
    if all(bound_ids[c] is not None for c in bkeys):
        b = _term_bucket_ids([bound_ids[c] for c in bkeys], info["num_buckets"])
        bpath = os.path.join(path, f"bucket={b}")
        if os.path.isdir(bpath):
            path = bpath
        else:
            return rd.from_arrow(
                pa.table({terms[t][1:]: pa.array([], type=pa.int64())
                          for idc, t in _TERM_FOR_ID.items() if is_var(terms[t])})
            )
    expr = None
    for idc, val in bound_ids.items():
        if val is None:
            continue
        e = pc.field(idc) == val
        expr = e if expr is None else (expr & e)
    ds = rd.read_parquet(
        path, columns=["s_id", "p_id", "o_id"],
        **({"filter": expr} if expr is not None else {}),
    )

    # project to variable columns (id space); drop bound columns.
    # same-var-twice patterns (?x p ?x) keep only rows where both match.
    var_cols = {}  # var name (no '?') → id column
    dupes = []
    for idc, t in _TERM_FOR_ID.items():
        term = terms[t]
        if is_var(term):
            name = term[1:]
            if name in var_cols:
                dupes.append((var_cols[name], idc))
            else:
                var_cols[name] = idc

    def project(tb: pa.Table) -> pa.Table:
        for a, b_ in dupes:
            tb = tb.filter(pc.equal(tb.column(a), tb.column(b_)))
        return pa.table({name: tb.column(idc) for name, idc in var_cols.items()})

    return ds.map_batches(project, batch_format="pyarrow")


def _execute_bgp_ids(
    out_dir: str,
    patterns: list[Pattern],
    info: dict,
    *,
    num_partitions: int = 16,
    stats: dict | None | bool = None,
):
    """Execute a BGP in id space → (bindings Dataset of int64 var columns,
    bound var set). The inner-join chain shared by bgp_execute and
    bgp_optional (OpBGP inside OpJoin/OpLeftJoin — OpExecutor.java:62)."""
    from jena_ray.pipelines.tdbstats import load_stats

    if stats is None:
        stats = load_stats(out_dir)
    if stats:  # pass stats=False to force the fixed-order fallback
        plan = REORDER_STRATEGIES["stats"](list(patterns), stats)
    else:
        plan = REORDER_STRATEGIES["fixed"](list(patterns), None)

    res = None
    res_vars: set[str] = set()
    for pat in plan:
        ds = _scan_pattern(out_dir, pat, info)
        pvars = {t[1:] for t in pat if is_var(t)}
        if res is None:
            res, res_vars = ds, pvars
            continue
        shared = sorted(res_vars & pvars)
        if not shared:
            raise ValueError(f"cartesian product pattern not supported: {pat}")
        # suffix the right side's shared columns out of the way, then drop
        res = safe_join(
            res,
            ds,
            num_partitions=num_partitions,
            on=tuple(shared),
            right_on=tuple(shared),
            right_suffix="__r",
        )
        drop = [f"{v}__r" for v in shared]

        def tidy(tb: pa.Table, _drop=tuple(drop)) -> pa.Table:
            keep = [c for c in tb.schema.names if c not in _drop]
            return tb.select(keep)

        res = res.map_batches(tidy, batch_format="pyarrow")
        res_vars |= pvars
    return res, res_vars


def _project_resolve(res, res_vars, select, out_dir, *, distinct):
    """Common tail: project to `select`, optional distinct, resolve ids →
    terms with the bucket-aligned map-side join (resolve_id_columns: the
    NodeTable never moves; also sidesteps a ray 2.49 edge where
    groupby().map_groups() emits zero-column blocks for empty hash
    partitions, which a downstream Dataset.join rejects)."""
    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.stages.materialize import resolve_id_columns

    missing = [v for v in select if v not in res_vars]
    if missing:
        raise ValueError(f"selected vars not bound by any pattern: {missing}")

    def proj(tb: pa.Table) -> pa.Table:
        return tb.select(select)

    res = res.map_batches(proj, batch_format="pyarrow")
    if distinct:
        res = dedup_exact(res, cols=tuple(select))
    return resolve_id_columns(res, out_dir, {v: v for v in select})


def bgp_execute(
    out_dir: str,
    patterns: list[Pattern],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
):
    """Execute a BGP; returns a Dataset whose columns are the selected
    variable names holding canonical term STRINGS (resolved via the terms
    NodeTable), distinct and unsorted (callers sort).

    Join order: cardinality-greedy when a stats side-car exists for the
    index (tdbstats.reorder_patterns — the TDB StatsMatcher/
    ReorderTransformationSubstitution path), else most-bound-first
    (ReorderFixed, the reference's fallback when no stats.opt is present).
    """
    info = read_layout(out_dir)
    res, res_vars = _execute_bgp_ids(
        out_dir, patterns, info, num_partitions=num_partitions, stats=stats
    )
    return _project_resolve(res, res_vars, select, out_dir, distinct=distinct)


def bgp_optional(
    out_dir: str,
    patterns: list[Pattern],
    optional: list[Pattern],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
):
    """OPTIONAL — OpLeftJoin over two BGPs (QueryIterHashLeftJoin_Left
    semantics, engine/join/): the required BGP's bindings survive whether or
    not the optional BGP matches; optional-only variables are null where it
    does not. Both sides run as id-space BGPs; the left-outer join is
    hash-partitioned on the shared variables (8-byte keys); null ids resolve
    to null terms (index_in propagates nulls)."""
    info = read_layout(out_dir)
    req, req_vars = _execute_bgp_ids(
        out_dir, patterns, info, num_partitions=num_partitions, stats=stats
    )
    opt, opt_vars = _execute_bgp_ids(
        out_dir, optional, info, num_partitions=num_partitions, stats=stats
    )
    shared = sorted(req_vars & opt_vars)
    if not shared:
        raise ValueError("OPTIONAL must share at least one variable")
    res = safe_join(
        req,
        opt,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=tuple(shared),
        right_on=tuple(shared),
        right_suffix="__r",
    )
    drop = [f"{v}__r" for v in shared]

    def tidy(tb: pa.Table, _drop=tuple(drop)) -> pa.Table:
        return tb.select([c for c in tb.schema.names if c not in _drop])

    res = res.map_batches(tidy, batch_format="pyarrow")
    return _project_resolve(
        res, req_vars | opt_vars, select, out_dir, distinct=distinct
    )


def kg_index_dir(sf_dir: str, *, num_shards: int = 4) -> str:
    """Materialized KG index for a tier, built once under /tmp and reused
    (lineage manifests + _layout.json make the build idempotent: a completed
    build is detected and skipped, a partial one resumes)."""
    base = os.path.join(
        "/tmp/jena_ray_idx", os.path.basename(os.path.normpath(sf_dir))
    )
    from jena_ray.state import manifest as M

    built = os.path.exists(os.path.join(base, "_layout.json")) and all(
        M.is_complete(base, str(k)) for k in range(num_shards)
    )
    if not built:
        from jena_ray.pipelines.kg import run_kg

        run_kg(sf_dir, base, num_shards=num_shards, build_indexes=True, resume=True)
    if not os.path.exists(os.path.join(base, "stats.json")):
        from jena_ray.pipelines.tdbstats import collect_stats

        collect_stats(base)  # tdbstats pass: one-time, id-space aggregates
    return base
