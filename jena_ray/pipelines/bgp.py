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
  id space — fixed_size_binary(16) columns named by variable;
- patterns join left-to-right on shared variables with the hash-bucketed
  groupby join (``binding_join`` — one shuffle, vectorized per-bucket
  ``pa.Table.join``) — 16-byte id keys, never term strings (the join order
  heuristic is most-bound-first; a StatsMatcher-style cardinality planner
  slots in here);
- selected variables resolve ids → terms at the END, one hash join per
  variable against the bucketed ``terms/`` NodeTable — the distributed
  replacement for the driver-side lookup in materialize.read_index_terms.

Algebra breadth on top of plain BGPs (each maps to the reference's
algebra op and executes as a composition of the same id-space primitives):

- ``filters=`` on every execute — **OpFilter** (sparql/algebra/op/OpFilter
  + expr/E_*.java): sameTerm/bound tests run in id space; value tests
  (numeric compare, regex, lang) resolve ONLY the filtered variables via
  the bucket-aligned map-side join and evaluate vectorized;
- ``bgp_union`` — **OpUnion** (null-padded id-space concat, one resolve);
- ``bgp_minus`` — **OpMinus** (hash anti-join on the shared variables);
- ``bgp_optional`` — **OpLeftJoin**;
- property-function patterns — a concrete predicate registered in
  ``BGP_PROPERTY_FUNCTIONS`` executes as a binding GENERATOR instead of an
  index scan (PropertyFunctionRegistry + jena-text TextQueryPF:
  text:query dispatches to the inverted-index side-car);
- ``quad_bgp_execute`` — the same join chain over 4-slot patterns against
  the GSPO/GPOS/GOSP quad store (SolverLib.solve for named graphs).

Variables are spelled ``?name``; any other string is a concrete term in
canonical N-Triples form.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

from jena_ray.stages.materialize import (
    ID_TYPE,
    ID_BUCKET_KEYS,
    ID_ORDERS,
    _TERM_FOR_ID,
    _term_bucket_ids,
    read_layout,
    term_id,
)

Pattern = tuple[str, ...]  # 3 slots (s, p, o) or 4 (g, s, p, o)


def is_var(t) -> bool:
    # predicate slots may hold ("alt", ...) / ("negset", ...) path tuples
    return isinstance(t, str) and t.startswith("?")


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


def _pick_triple_order(bound: dict) -> str:
    if "subj" in bound:
        return "spo"
    if "pred" in bound:
        return "pos"
    if "obj" in bound:
        return "osp"
    return "spo"


def _pick_quad_order(bound: dict) -> str:
    # SolverLib's index choice over all six TDB quad permutations:
    # graph-leading when the graph term is bound, graph-trailing
    # (POSG/OSPG/SPOG — round-5) for graph-unbound scans.
    from jena_ray.stages.quads import pick_quad_order

    return pick_quad_order(set(bound))


def _scan_pattern(out_dir: str, pattern: Pattern, info: dict):
    """One pattern → Dataset of bindings (var columns, id space).

    3-slot patterns scan the SPO/POS/OSP triple indexes; 4-slot patterns
    scan the GSPO/GPOS/GOSP quad indexes (stages/quads.py) — same layout
    contract (hash-bucketed on the leading key, id filters pushed to the
    parquet read, bucket-pruned when the bucket key is fully bound)."""
    import pyarrow.compute as pc
    import ray.data as rd

    if len(pattern) == 3 and isinstance(pattern[1], tuple):
        # P_Alt (sparql/path/P_Alt.java:23) / P_NegPropSet
        # (P_NegPropSet.java:27) over plain IRIs: ONE open-predicate scan
        # with a vectorized predicate-id membership mask per block — the
        # predicate set is tiny and ships with the task closure. A single
        # read stage, deliberately NOT a Dataset.union of per-predicate
        # scans: union adds an operator per branch and long streaming
        # sessions have hung on those chains (round-2 path_closure lesson).
        # Branch matches are disjoint by construction (each triple carries
        # exactly one predicate), so the mask preserves bag semantics
        # exactly.
        s, pred, o = pattern
        if pred[0] not in ("alt", "negset"):
            raise ValueError(f"unknown path predicate form: {pred}")
        ids = pa.array([term_id(i) for i in pred[1:]], type=ID_TYPE)
        invert = pred[0] == "negset"
        pvar = "?__setp"
        ds = _scan_pattern(out_dir, (s, pvar, o), info)
        keep = [v[1:] for v in (s, o) if is_var(v)]

        def pred_mask(tb: pa.Table, _ids=ids, _keep=tuple(keep),
                      _inv=invert):
            m = pc.is_in(tb.column(pvar[1:]), value_set=_ids)
            if _inv:
                m = pc.invert(m)
            return tb.filter(m).select(list(_keep))

        return ds.map_batches(pred_mask, batch_format="pyarrow")

    if len(pattern) == 4:
        from jena_ray.stages.quads import QUAD_BUCKET_KEYS, _TERM_FOR_QID

        g, s, p, o = pattern
        terms = {"graph": g, "subj": s, "pred": p, "obj": o}
        term_for_id = _TERM_FOR_QID
        bucket_keys = QUAD_BUCKET_KEYS
        bound = {k: v for k, v in terms.items() if not is_var(v)}
        order = _pick_quad_order(bound)
        if order != "gspo" and not os.path.isdir(os.path.join(out_dir, order)):
            # store built before the graph-trailing permutations: full
            # gspo sweep, not an empty result
            order = "gspo"
        id_cols = ["g_id", "s_id", "p_id", "o_id"]
    else:
        s, p, o = pattern
        terms = {"subj": s, "pred": p, "obj": o}
        term_for_id = _TERM_FOR_ID
        bucket_keys = ID_BUCKET_KEYS
        bound = {k: v for k, v in terms.items() if not is_var(v)}
        order = _pick_triple_order(bound)
        id_cols = ["s_id", "p_id", "o_id"]
    path = os.path.join(out_dir, order)

    def empty_bindings():
        return rd.from_arrow(
            pa.table({terms[t][1:]: pa.array([], type=ID_TYPE)
                      for idc, t in term_for_id.items() if is_var(terms[t])})
        )

    if not os.path.isdir(path):
        # store without this index family at all — an RDF-dataset store
        # may legitimately have an empty default graph (quads only) or no
        # named graphs (triples only); the scan is simply empty
        return empty_bindings()

    bound_ids = {
        idc: (None if is_var(terms[t]) else term_id(terms[t]))
        for idc, t in term_for_id.items()
    }
    bkeys = bucket_keys[order]
    if all(bound_ids[c] is not None for c in bkeys):
        b = _term_bucket_ids([bound_ids[c] for c in bkeys], info["num_buckets"])
        bpath = os.path.join(path, f"bucket={b}")
        if os.path.isdir(bpath):
            path = bpath
        else:
            # base bucket absent — but a delta INSERT may still match
            # (state/deltas overlay below); scan an empty base instead
            # of returning early
            path = None
    expr = None
    for idc, val in bound_ids.items():
        if val is None:
            continue
        # the scalar MUST be typed fixed_size_binary(16): an untyped Python
        # bytes literal becomes a variable-length binary scalar, and
        # pyarrow's dataset scanner SEGFAULTS evaluating fsb16 == binary
        # in a pushed-down parquet filter (observed pyarrow 19/ray 2.49)
        e = pc.field(idc) == pa.scalar(val, ID_TYPE)
        expr = e if expr is None else (expr & e)
    if path is None:
        ds = rd.from_arrow(pa.table(
            {c: pa.array([], type=ID_TYPE) for c in id_cols}
        ))
    else:
        ds = rd.read_parquet(
            path, columns=id_cols,
            **({"filter": expr} if expr is not None else {}),
        )

    if len(pattern) == 3:
        # incremental-update overlay (state/deltas): base ∖ deletes ∪
        # matching inserts. The overlay is request-sized (ground DATA
        # blocks), so the delete keys ship in the task closure and the
        # inserts filter driver-side.
        from jena_ray.state import deltas as _deltas

        _st = _deltas.load_state(out_dir)
        if _st is not None and not _st.empty:
            if _st.deletes.num_rows:
                _dk = _st.delete_keys()

                def drop_deleted(tb: pa.Table, _k=_dk) -> pa.Table:
                    keys = _deltas._triple_keys(tb)
                    return tb.filter(
                        pc.invert(pc.is_in(keys, value_set=_k))
                    )

                ds = ds.map_batches(drop_deleted, batch_format="pyarrow")
            if _st.inserts.num_rows:
                ins = _st.inserts
                for idc, val in bound_ids.items():
                    if val is not None:
                        ins = ins.filter(pc.equal(
                            ins.column(idc), pa.scalar(val, ID_TYPE)
                        ))
                if ins.num_rows:
                    ds = ds.union(rd.from_arrow(ins.select(id_cols)))

    # project to variable columns (id space); drop bound columns.
    # same-var-twice patterns (?x p ?x) keep only rows where both match.
    var_cols = {}  # var name (no '?') → id column
    dupes = []
    for idc, t in term_for_id.items():
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


# ---------------------------------------------------------------------------
# property functions inside BGPs (PropertyFunctionRegistry dispatch from the
# engine — jena-arq pfunction/PropertyFunctionRegistry.java wired into
# OpExecutor via transformProperty; jena-text registers text:query there,
# TextQueryPF.java). A registered predicate IRI turns its pattern into a
# binding GENERATOR: fn(out_dir, pattern, info, context) → Dataset of
# id columns named by the pattern's variables.
# ---------------------------------------------------------------------------

TEXT_QUERY_IRI = "http://jena.apache.org/text#query"


def _text_query_pf(out_dir: str, pattern: Pattern, info: dict, context: dict):
    """text:query — ``(?d <text#query> "term term ...")`` binds ?d to every
    document whose text matches ANY term (Lucene OR semantics), served from
    the inverted-index side-car (stages/textindex.text_match). The side-car
    must be keyed by TERM ID (build it over term_id(doc IRI)) so the
    bindings join the other patterns in id space with no extra resolve."""
    from jena_ray.stages.textindex import text_match
    from jena_ray.term import split_literal

    s, _, o = pattern
    if not is_var(s) or is_var(o) or not o.startswith('"'):
        raise ValueError(f"text:query needs (?var, text:query, \"terms\"): {pattern}")
    index_dir = context.get("text_index") if context else None
    if not index_dir:
        raise ValueError("text:query needs pf_context={'text_index': <dir>}")
    terms = split_literal(o)[0].split()
    return text_match(index_dir, terms, id_col=s[1:])


BGP_PROPERTY_FUNCTIONS: dict = {TEXT_QUERY_IRI: _text_query_pf}


def register_bgp_property_fn(iri: str, fn) -> None:
    BGP_PROPERTY_FUNCTIONS[iri] = fn


def _is_pf_pattern(p: Pattern) -> bool:
    pred = p[-2]
    return (
        len(p) == 3
        and isinstance(pred, str)
        and not is_var(pred)
        and pred.startswith("<")
        and pred[1:-1] in BGP_PROPERTY_FUNCTIONS
    )


# ---------------------------------------------------------------------------
# FILTER (OpFilter + the E_* expression kernels, vectorized)
#
# A filter is a tuple ("op", "?var"[, operand]):
#   id space   — ("=" | "!=", "?v", <concrete term> | "?w")  sameTerm on
#                canonical terms (ids are injective over canonical forms, so
#                id equality IS value equality — E_SameTerm / E_Equals);
#                ("bound" | "!bound", "?v") null-ness of the id column.
#   value space — ("<" | "<=" | ">" | ">=", "?v", number) numeric compare of
#                the literal value (E_GreaterThan…, xsd numeric promotion via
#                float64); ("regex" | "strstarts" | "strends" | "contains",
#                "?v", str) on the SPARQL str() of the term (E_Regex,
#                E_StrStartsWith…); ("lang", "?v", "tag") exact lang match.
# Value filters resolve ONLY their variables (a COPY of the id column goes
# through the bucket-aligned map-side terms join) and evaluate as pyarrow
# kernels; a null/invalid operand evaluates to false (SPARQL error → row
# dropped), matching FILTER semantics over OPTIONAL nulls.
# ---------------------------------------------------------------------------

_ID_FILTER_OPS = {"=", "!=", "bound", "!bound"}
_NUM_FILTER_OPS = {"<", "<=", ">", ">=", "=", "!="}
_STR_FILTER_OPS = {"regex", "strstarts", "strends", "contains", "lang",
                   "langmatches", "notlangmatches", "regexvar"}

# canonical-NT lexical extraction: IRI <...>, literal "..." (suffix ignored)
_RE_IRI = r"^<(?P<v>.*)>$"
_RE_LEX = r'^"(?P<v>(?:[^"\\]|\\.)*)"'


_TYPE_FILTER_OPS = {"isiri", "isblank", "isliteral", "isnumeric", "istriple"}


def _is_id_filter(f: tuple) -> bool:
    op = f[0]
    if op in ("or", "and", "not"):
        return False  # compound expressions evaluate in value space
    if op in ("bound", "!bound"):
        return True
    if op in ("=", "!=") and isinstance(f[2], str):
        return True  # var-var or var-term: sameTerm in id space
    return False


def _bind_expr_vars(e) -> set[str]:
    """Variables of a BIND-expression AST (('var', name) nodes, plus '?v'
    strings inside embedded FILTER condition subtrees of IF(...))."""
    out: set[str] = set()

    def walk(x):
        if isinstance(x, tuple):
            if len(x) == 2 and x[0] == "var" and isinstance(x[1], str):
                out.add(x[1])
                return
            for a in x[1:]:
                walk(a)
        elif isinstance(x, list):
            for a in x:
                walk(a)
        elif isinstance(x, str) and x.startswith("?"):
            out.add(x[1:])

    walk(e)
    return out


def _filter_vars(f: tuple) -> set[str]:
    if f and f[0] == "fexpr":
        return _bind_expr_vars(f[1])
    if f and f[0] == "cmpexpr":
        return _bind_expr_vars(f[2]) | _bind_expr_vars(f[3])
    out: set[str] = set()
    for a in f[1:]:
        if isinstance(a, tuple):
            out |= _filter_vars(a)
        elif isinstance(a, str) and a.startswith("?"):
            out.add(a[1:])
    return out


def _validate_filter(f: tuple) -> None:
    op = f[0]
    if op in ("or", "and", "not"):
        for sub in f[1:]:
            _validate_filter(sub)
        return
    if op in ("bound", "!bound") or op in _TYPE_FILTER_OPS:
        return
    if op == "nottype" and f[1] in _TYPE_FILTER_OPS:
        return
    if op in ("ebv", "notebv"):
        if not (isinstance(f[1], str) and f[1].startswith("?")):
            raise ValueError(f"malformed EBV filter: {f}")
        return
    if op == "constb":
        return
    if op == "dtof":
        # ("dtof", "="|"!=", target_iri, ('var'|'cast'|'arith', ...))
        if (f[1] not in ("=", "!=") or not isinstance(f[2], str)
                or not isinstance(f[3], tuple)
                or f[3][0] not in ("var", "cast", "arith")):
            raise ValueError(f"malformed dtof filter: {f}")
        return
    if op == "termeq":
        # ("termeq", "="|"!=", var-or-term, var-or-term) — value equality
        if (f[1] not in ("=", "!=")
                or not all(isinstance(x, str) for x in f[2:4])
                or not any(x.startswith("?") for x in f[2:4])):
            raise ValueError(f"malformed termeq filter: {f}")
        return
    if op in ("=", "!=") and isinstance(f[2], str):
        return  # sameTerm leaf
    if op == "dtcmp":
        # ("dtcmp", cmp, "?v", iso_lexical, kind) — temporal value compare
        # with XSD tz-indeterminacy semantics
        if (f[1] not in ("<", "<=", ">", ">=", "=", "!=")
                or not isinstance(f[3], str)
                or f[4] not in ("date", "dateTime")):
            raise ValueError(f"malformed dtcmp filter: {f}")
        return
    if op == "cmp":
        # ("cmp", cmp, exprA, exprB) — arithmetic value comparison; the
        # expression ASTs are validated at evaluation time
        if f[1] not in ("<", "<=", ">", ">=", "=", "!="):
            raise ValueError(f"malformed cmp filter: {f}")
        return
    if op == "fexpr":
        # ("fexpr", bind-expr) — EBV of a function-call/cast expression
        if not isinstance(f[1], tuple):
            raise ValueError(f"malformed fexpr filter: {f}")
        return
    if op == "cmpexpr":
        # ("cmpexpr", cmp, bind-expr, bind-expr) — value comparison of
        # two general expression columns
        if (f[1] not in ("<", "<=", ">", ">=", "=", "!=")
                or not isinstance(f[2], tuple)
                or not isinstance(f[3], tuple)):
            raise ValueError(f"malformed cmpexpr filter: {f}")
        return
    if op == "scmp":
        # ("scmp", cmp, "?v", lexical) — simple-string codepoint ordering
        if (f[1] not in ("<", "<=", ">", ">=", "=", "!=")
                or not isinstance(f[3], str)):
            raise ValueError(f"malformed scmp filter: {f}")
        return
    if op == "streq":
        # ("streq", "="|"!=", "?v", rhs) — E_Str equality on the effective
        # string value; rhs is a folded python string or a second "?var"
        if f[1] not in ("=", "!=") or not isinstance(f[3], str):
            raise ValueError(f"malformed streq filter: {f}")
        return
    if op not in (_NUM_FILTER_OPS | _STR_FILTER_OPS):
        raise ValueError(f"unknown filter op: {f[0]}")
    if op in _NUM_FILTER_OPS and not isinstance(f[2], (int, float)):
        # ordering comparisons on arbitrary term strings are unsupported
        # (numeric / dateTime constants are lowered to value filters by the
        # parser); fail at PLAN time, not inside a Ray task
        raise ValueError(f"non-numeric ordering comparison unsupported: {f}")


def _str_value(col):
    """Vectorized SPARQL str(): IRIs drop <>, literals take the lexical form
    (common escapes unescaped vectorized; the rare backslash-heavy row falls
    back to the exact per-row unescape), bnodes keep their label."""
    import pyarrow.compute as pc

    s = pc.cast(col, pa.string())
    iri = pc.struct_field(pc.extract_regex(s, _RE_IRI), "v")
    lex = pc.struct_field(pc.extract_regex(s, _RE_LEX), "v")
    has_esc = pc.any(pc.fill_null(pc.match_substring(lex, "\\"), False)).as_py()
    if has_esc:
        from jena_ray.term import split_literal

        lex = pa.array(
            [
                split_literal(v)[0] if v is not None and v.startswith('"') else None
                for v in s.to_pylist()
            ],
            type=pa.string(),
        )
    return pc.coalesce(iri, lex, s)


_NUM_DT = (
    "integer|decimal|double|float|int|long|short|byte|nonPositiveInteger|"
    "negativeInteger|nonNegativeInteger|positiveInteger|unsignedLong|"
    "unsignedInt|unsignedShort|unsignedByte"
)
_RE_NUM_LIT = (
    r'^"(?P<v>[^"]*)"\^\^<http://www\.w3\.org/2001/XMLSchema#(?:' + _NUM_DT + r")>$"
)


def _num_value(col):
    """Numeric VALUE of numeric-datatype literals only (XSD numeric tower);
    plain/string literals, IRIs and bnodes → null — SPARQL numeric
    comparison on them is a type error, which drops the row (E_Equals /
    NodeValue promotion semantics, not a lexical cast). Columns that are
    already numeric (aggregate aliases joined from a subquery) pass
    through as float64."""
    import pyarrow.compute as pc

    typ = col.type
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pc.cast(col, pa.float64())
    lex = pc.struct_field(
        pc.extract_regex(pc.cast(col, pa.string()), _RE_NUM_LIT), "v"
    )
    num = pc.struct_field(
        pc.extract_regex(lex, r"^(?P<v>[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)$"),
        "v",
    )
    return pc.cast(num, pa.float64())


def _lit_value(col):
    """Lexical form of LITERALS only — null for IRIs/bnodes. The E_Regex /
    E_StrStartsWith family raises a type error on non-literals (filtering
    the row) unless the query applies STR() first."""
    import pyarrow.compute as pc

    s = pc.cast(col, pa.string())
    lex = pc.struct_field(pc.extract_regex(s, _RE_LEX), "v")
    has_esc = pc.any(pc.fill_null(pc.match_substring(lex, "\\"), False)).as_py()
    if has_esc:
        from jena_ray.term import split_literal

        lex = pa.array(
            [
                split_literal(v)[0] if v is not None and v.startswith('"') else None
                for v in s.to_pylist()
            ],
            type=pa.string(),
        )
    return lex


def _lang_value(col):
    import pyarrow.compute as pc

    tag = pc.extract_regex(
        pc.cast(col, pa.string()), r'^".*"@(?P<v>[A-Za-z0-9\-]+)$'
    )
    return pc.fill_null(pc.struct_field(tag, "v"), "")


_XSD = "http://www.w3.org/2001/XMLSchema#"

# plain literal (optionally lang-tagged) or xsd:string — the "stringish"
# category for EBV and cast sources
_RE_STRINGISH = (
    r'^"(?P<v>(?:[^"\\]|\\.)*)"'
    r"(?:@[A-Za-z0-9\-]+|\^\^<http://www\.w3\.org/2001/XMLSchema#string>)?$"
)
_RE_BOOL_LIT = (
    r'^"(?P<v>[^"]*)"\^\^<http://www\.w3\.org/2001/XMLSchema#boolean>$'
)
# any xsd:* typed literal → local datatype name
_RE_XSD_DT = (
    r'^".*"\^\^<http://www\.w3\.org/2001/XMLSchema#(?P<v>[A-Za-z]+)>$'
)
# full datatype IRI of any typed literal
_RE_ANY_DT = r'^".*"\^\^<(?P<v>[^>]*)>$'

# target-datatype lexical spaces for casts from string sources
_CAST_LEX_RE = {
    "integer": r"^[+-]?\d+$",
    "decimal": r"^[+-]?(?:\d+\.?\d*|\.\d+)$",
    "float": r"^(?:[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?|[+-]?INF|NaN)$",
    "double": r"^(?:[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?|[+-]?INF|NaN)$",
    "dateTime": (
        r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:\d{2})?$"
    ),
}


def _ebv_masks(col):
    """Effective boolean value (SPARQL 17.2.2 / the reference's
    XSDFuncOp.booleanEffectiveValue): stringish → non-empty; xsd:boolean →
    lexical "true"/"1" (ill-formed → false); numeric datatype → value != 0
    and not NaN (ill-formed lexical → false); anything else (IRI, bnode,
    other datatypes, unbound) is a type error.  Returns ``(truth,
    defined)`` bool arrays — callers combine them so errors drop rows on
    both the plain and the negated form."""
    import pyarrow.compute as pc

    s = pc.cast(col, pa.string())
    nul = pa.scalar(None, pa.bool_())
    stringish = pc.struct_field(pc.extract_regex(s, _RE_STRINGISH), "v")
    boolean = pc.struct_field(pc.extract_regex(s, _RE_BOOL_LIT), "v")
    numlex = pc.struct_field(pc.extract_regex(s, _RE_NUM_LIT), "v")
    numval = _num_value(s)
    num_truth = pc.and_(
        pc.fill_null(pc.not_equal(numval, 0.0), False),
        pc.invert(pc.fill_null(pc.is_nan(numval), False)),
    )
    truth = pc.coalesce(
        pc.if_else(pc.is_valid(stringish), pc.not_equal(stringish, ""), nul),
        pc.if_else(
            pc.is_valid(boolean),
            pc.is_in(boolean, value_set=pa.array(["true", "1"])),
            nul,
        ),
        pc.if_else(pc.is_valid(numlex), num_truth, nul),
    )
    defined = pc.is_valid(truth)
    return pc.fill_null(truth, False), defined


def _castable_mask(target: str, col):
    """Rows whose term casts to the XSD ``target`` (local name) per the
    XPath 17.5 casting table the reference applies in
    sparql/expr/nodevalue/XSDFuncOp.java cast dispatch: numeric↔numeric
    and boolean↔numeric always cast; string sources cast iff the lexical
    form is in the target's lexical space; xsd:string accepts any IRI or
    literal; xsd:dateTime accepts dateTime/date typed sources."""
    import pyarrow.compute as pc

    s = pc.cast(col, pa.string())
    is_iri = pc.and_(
        pc.fill_null(pc.starts_with(s, "<"), False),
        pc.invert(pc.fill_null(pc.starts_with(s, "<<"), False)),
    )
    is_lit = pc.fill_null(pc.starts_with(s, '"'), False)
    if target == "string":
        return pc.or_(is_iri, is_lit)
    stringish = pc.struct_field(pc.extract_regex(s, _RE_STRINGISH), "v")
    dtname = pc.struct_field(pc.extract_regex(s, _RE_XSD_DT), "v")
    bool_dt = pc.fill_null(pc.equal(dtname, "boolean"), False)
    numeric_ok = pc.is_valid(_num_value(s))
    if target == "boolean":
        from_str = pc.fill_null(
            pc.is_in(stringish, value_set=pa.array(["true", "false", "1", "0"])),
            False,
        )
        return pc.or_(pc.or_(bool_dt, numeric_ok), from_str)
    if target == "dateTime":
        dt_src = pc.fill_null(
            pc.is_in(
                dtname, value_set=pa.array(["dateTime", "dateTimeStamp", "date"])
            ),
            False,
        )
        from_str = pc.fill_null(
            pc.match_substring_regex(stringish, _CAST_LEX_RE["dateTime"]), False
        )
        return pc.or_(dt_src, from_str)
    # numeric targets: integer / decimal / float / double
    from_str = pc.fill_null(
        pc.match_substring_regex(stringish, _CAST_LEX_RE[target]), False
    )
    return pc.or_(pc.or_(numeric_ok, bool_dt), from_str)


def _num_rank(col):
    """XSD numeric promotion rank of each term (int8; null = not a valid
    numeric operand): every integer-derived type substitutes up to
    xsd:integer (rank 0), then decimal 1 < float 2 < double 3 — the
    operand classification of the reference's XSDFuncOp.classifyNumeric."""
    import pyarrow.compute as pc

    s = pc.cast(col, pa.string())
    dtname = pc.struct_field(pc.extract_regex(s, _RE_XSD_DT), "v")
    valid = pc.is_valid(_num_value(s))
    rank = pc.case_when(
        pc.make_struct(
            pc.fill_null(pc.equal(dtname, "double"), False),
            pc.fill_null(pc.equal(dtname, "float"), False),
            pc.fill_null(pc.equal(dtname, "decimal"), False),
        ),
        pa.scalar(3, pa.int8()),
        pa.scalar(2, pa.int8()),
        pa.scalar(1, pa.int8()),
        pa.scalar(0, pa.int8()),  # remaining valid numerics: integer family
    )
    return pc.if_else(valid, rank, pa.scalar(None, pa.int8()))


def _expr_datatype(tb: pa.Table, inner: tuple, col_for):
    """Datatype IRI (string array; null = type error) of a dtof operand:
    ('var', ?v) → the term's datatype (simple literal → xsd:string, the
    SPARQL DATATYPE() rule); ('cast', local, ?v) → the target where the
    cast succeeds; ('arith', expr) → the promoted result type of the
    arithmetic expression (max operand rank; integer division bumps to
    decimal — op:numeric-divide)."""
    import pyarrow.compute as pc

    kind = inner[0]
    nul = pa.scalar(None, pa.string())
    if kind == "var":
        s = pc.cast(tb.column(col_for(inner[1][1:])), pa.string())
        typed = pc.struct_field(pc.extract_regex(s, _RE_ANY_DT), "v")
        simple = pc.fill_null(
            pc.match_substring_regex(s, r'^"(?:[^"\\]|\\.)*"$'), False
        )
        # RDF 1.1: DATATYPE of a language-tagged literal is rdf:langString
        # (E_Datatype → NodeFunctions.datatype)
        tagged = pc.fill_null(
            pc.match_substring_regex(
                s, r'^"(?:[^"\\]|\\.)*"@[A-Za-z][A-Za-z0-9\-]*$'
            ),
            False,
        )
        rdf_ls = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
        return pc.coalesce(
            typed,
            pc.if_else(
                tagged,
                pa.scalar(rdf_ls),
                pc.if_else(simple, pa.scalar(_XSD + "string"), nul),
            ),
        )
    if kind == "cast":
        target = inner[1]
        ok = _castable_mask(target.rsplit("#", 1)[-1], tb.column(col_for(inner[2][1:])))
        return pc.if_else(ok, pa.scalar(target), nul)
    # ('arith', expr): promotion lattice over the expression's operands
    expr = inner[1]
    rank = None
    has_div = False

    def walk(e):
        nonlocal rank, has_div
        if isinstance(e, (int, float)):
            r = pa.array(
                [0 if float(e).is_integer() else 1] * tb.num_rows, pa.int8()
            )
        elif isinstance(e, str) and e.startswith("?"):
            r = _num_rank(tb.column(col_for(e[1:])))
        else:
            if e[0] == "/":
                has_div = True
            for sub in e[1:]:
                walk(sub)
            return
        rank = r if rank is None else pc.max_element_wise(
            rank, r, skip_nulls=False
        )

    walk(expr)
    if rank is None:
        return pa.nulls(tb.num_rows, pa.string())
    if has_div:
        # integer ÷ integer yields xsd:decimal (op:numeric-divide)
        rank = pc.max_element_wise(
            rank, pa.array([1] * tb.num_rows, pa.int8()), skip_nulls=False
        )
    names = pa.array(
        [_XSD + "integer", _XSD + "decimal", _XSD + "float", _XSD + "double"]
    )
    taken = pc.take(names, pc.cast(rank, pa.int64()))
    return taken


_RE_LANG_LIT = r'^"(?P<v>(?:[^"\\]|\\.)*)"@(?P<tag>[A-Za-z0-9\-]+)$'
_RE_PLAIN_LIT = (
    r'^"(?P<v>(?:[^"\\]|\\.)*)"'
    r"(?:\^\^<http://www\.w3\.org/2001/XMLSchema#string>)?$"
)


def _term_eq_mask(tb: pa.Table, op: str, a: str, b: str, col_for,
                  keep_null: bool = False):
    """Var-var '='/'!=' by VALUE (RDFterm-equal — the reference's E_Equals
    → NodeValue.sameAs), three-valued; the approved open-world and
    expr-equals DAWG results pin the table:

    TRUE  — same term; numeric×numeric equal values; simple/xsd:string ×
            same with equal lexicals; lang×lang equal tag (case-insens.)
            and lexical; temporal same-kind equal instants.
    FALSE — an IRI/bnode/quoted-triple on either side (not same term);
            a lang-tagged literal against any other literal; determinate
            value inequality inside one of the spaces above; date vs
            dateTime (disjoint value spaces, like the dtcmp rule).
    ERROR — any remaining literal pair: an unknown datatype, an
            ill-formed lexical for a known datatype, or two different
            known value spaces (string vs number). Error rows drop on
            BOTH '=' and '!='."""
    import pyarrow.compute as pc

    def operand(x):
        if x.startswith("?"):
            return pc.cast(tb.column(col_for(x[1:])), pa.string())
        return pa.array([x] * tb.num_rows, type=pa.string())

    A, B = operand(a), operand(b)

    def cats(s):
        lit = pc.fill_null(pc.starts_with(s, '"'), False)
        termlike = pc.and_(pc.is_valid(s), pc.invert(lit))
        lang = pc.extract_regex(s, _RE_LANG_LIT)
        plain = pc.struct_field(pc.extract_regex(s, _RE_PLAIN_LIT), "v")
        return {
            "termlike": termlike,
            "lang_lex": pc.struct_field(lang, "v"),
            "lang_tag": pc.utf8_lower(
                pc.fill_null(pc.struct_field(lang, "tag"), "")
            ),
            "plain": plain,
            "num": _num_value(s),
            # boolean VALUE: valid lexicals only ("true"/"1" vs "false"/"0")
            "bool": pc.if_else(
                pc.fill_null(
                    pc.is_in(
                        pc.struct_field(pc.extract_regex(s, _RE_BOOL_LIT), "v"),
                        value_set=pa.array(["true", "false", "1", "0"]),
                    ),
                    False,
                ),
                pc.is_in(
                    pc.struct_field(pc.extract_regex(s, _RE_BOOL_LIT), "v"),
                    value_set=pa.array(["true", "1"]),
                ),
                pa.scalar(None, pa.bool_()),
            ),
            "dt": _dt_value(s, "dateTime"),
            "date": _dt_value(s, "date"),
        }

    ca, cb = cats(A), cats(B)

    def both(key):
        return pc.and_(
            pc.is_valid(ca[key]), pc.is_valid(cb[key])
        )

    def veq(key):
        return pc.fill_null(pc.equal(ca[key], cb[key]), False)

    nul = pa.scalar(None, pa.bool_())
    F = pa.scalar(False, pa.bool_())
    T = pa.scalar(True, pa.bool_())
    is_lang_a = pc.is_valid(ca["lang_lex"])
    is_lang_b = pc.is_valid(cb["lang_lex"])

    # innermost → outermost: later wrapping = higher precedence
    res = nul
    res = pc.if_else(
        pc.or_(both("dt"), both("date")),
        pc.if_else(
            both("dt"), veq("dt"),
            pc.if_else(both("date"), veq("date"), F),
        ),
        res,
    )
    # one temporal side, other temporal of the OTHER kind → disjoint: F
    res = pc.if_else(
        pc.and_(
            pc.or_(pc.is_valid(ca["dt"]), pc.is_valid(ca["date"])),
            pc.or_(pc.is_valid(cb["dt"]), pc.is_valid(cb["date"])),
        ),
        pc.if_else(pc.or_(both("dt"), both("date")), res, F),
        res,
    )
    res = pc.if_else(both("bool"), veq("bool"), res)
    res = pc.if_else(both("num"), veq("num"), res)
    res = pc.if_else(both("plain"), veq("plain"), res)
    # both sides in KNOWN but DISJOINT value spaces (string vs number vs
    # boolean vs temporal) → determinately not equal, not a type error —
    # NodeValue.sameAs's known-vspace dispatch (ARQ ExprDatatypes
    # "FILTER - '!= true'" pins this: "Other"/1/0 all pass ?v != true,
    # only the :unknown-typed literal is an error). Invalid lexicals for
    # a known datatype stay unknown → error.
    def known(c, is_lang):
        k = pc.is_valid(c["plain"])
        for key in ("num", "bool", "dt", "date"):
            k = pc.or_(k, pc.is_valid(c[key]))
        return pc.or_(k, is_lang)

    res = pc.if_else(
        pc.and_(known(ca, is_lang_a), known(cb, is_lang_b)),
        pc.fill_null(res, False),
        res,
    )
    res = pc.if_else(
        pc.or_(is_lang_a, is_lang_b),
        pc.if_else(
            pc.and_(is_lang_a, is_lang_b),
            pc.and_(veq("lang_lex"), veq("lang_tag")),
            F,  # lang vs any other literal: determinately not equal
        ),
        res,
    )
    res = pc.if_else(pc.or_(ca["termlike"], cb["termlike"]), F, res)
    res = pc.if_else(pc.equal(A, B), T, res)  # null A/B stays null
    if keep_null:
        # three-valued result for E_LogicalNot: error stays null (the
        # caller negates null-preservingly — !error is still an error)
        return pc.invert(res) if op == "!=" else res
    if op == "!=":
        res = pc.and_(pc.is_valid(res), pc.invert(pc.fill_null(res, True)))
    return pc.fill_null(res, False)


def _dtof_mask(tb: pa.Table, f: tuple, col_for):
    """("dtof", "="|"!=", target_iri, inner) — FILTER(datatype(expr) = iri).
    A type error in the operand (non-literal, unpromotable arithmetic,
    failing cast) drops the row on both '=' and '!='."""
    import pyarrow.compute as pc

    _, op, target, inner = f
    dt = _expr_datatype(tb, inner, col_for)
    mask = pc.fill_null(pc.equal(dt, target), False)
    if op == "!=":
        mask = pc.and_(pc.is_valid(dt), pc.invert(mask))
    return mask


_RE_DT_KIND = {
    # date and dateTime occupy DISJOINT value spaces in the reference's
    # operator dispatch (NodeValue): ordering across kinds is a type
    # error; '='/'!=' across kinds is determinately not-equal
    "dateTime": (
        r'^"(?P<v>[^"]*)"\^\^<http://www\.w3\.org/2001/XMLSchema#'
        r"(?:dateTime|dateTimeStamp)>$"
    ),
    "date": r'^"(?P<v>[^"]*)"\^\^<http://www\.w3\.org/2001/XMLSchema#date>$',
}

# xsd:date allows a trailing timezone ("2006-08-23Z", "…+05:00") that
# pandas cannot parse on a bare date — rewrite to midnight-of-that-zone
_RE_DATE_TZ = re.compile(r"^(\d{4,}-\d{2}-\d{2})(Z|[+-]\d{2}:\d{2})?$")
_RE_HAS_TZ = re.compile(r"(?:Z|[+-]\d{2}:\d{2})$")

_TZ_WINDOW_NS = 14 * 3600 * 1_000_000_000  # XSD ±14:00 indeterminacy window


def _date_to_dt_lexical(lex: str) -> str | None:
    m = _RE_DATE_TZ.match(lex)
    if m is None:
        return None
    return f"{m.group(1)}T00:00:00{m.group(2) or ''}"


def _parse_dt_ns(vals: list[str | None]):
    """UTC epoch ns (int64, null on unparsable) for ISO lexicals.
    format="ISO8601" — mixed tz-aware / naive lexicals in one column; plain
    inference locks onto the first row's format and coerces the rest."""
    import pandas as pd

    ser = pd.to_datetime(
        pd.Series(vals, dtype="object"), errors="coerce", utc=True,
        format="ISO8601",
    )
    return pa.array(
        ser.astype("int64").where(ser.notna(), None), type=pa.int64()
    )


def _dt_parts(col, kind: str):
    """(t0, has_tz) for one temporal kind: UTC-reading epoch ns of
    xsd:date / xsd:dateTime literals (null for every other term) and
    whether the lexical carries an explicit timezone. A timezone-less
    lexical reads as UTC; the ±14h XSD indeterminacy window is applied by
    the comparison (mixed tz-ness is determinate only outside it),
    mirroring NodeValue's XSDDateTime comparators."""
    import pyarrow.compute as pc

    s = pc.cast(col, pa.string())
    lex = pc.struct_field(pc.extract_regex(s, _RE_DT_KIND[kind]), "v")
    vals = lex.to_pylist()
    has_tz = pa.array(
        [None if v is None else bool(_RE_HAS_TZ.search(v)) for v in vals],
        type=pa.bool_(),
    )
    if kind == "date":
        vals = [None if v is None else _date_to_dt_lexical(v) for v in vals]
    return _parse_dt_ns(vals), has_tz


def _dt_value(col, kind: str = "any"):
    """Temporal VALUE as UTC epoch ns for ORDER BY keys (both kinds merged;
    same-kind ordering is all SPARQL defines, and the sort key only needs
    a consistent total order)."""
    import pyarrow.compute as pc

    kinds = ("date", "dateTime") if kind == "any" else (kind,)
    out = None
    for k in kinds:
        arr, _ = _dt_parts(col, k)
        out = arr if out is None else pc.coalesce(out, arr)
    return out


def _dtcmp_mask(col, cmp_op: str, lexical: str, kind: str):
    """Determinate-TRUE mask for one temporal comparison against a constant
    (three-valued: indeterminate and type-error rows are False → dropped).
    Same tz-ness compares UTC readings directly; mixed tz-ness is
    determinate only outside the ±14h window; ordering across kinds is a
    type error while '='/'!=' across kinds is determinately not-equal."""
    import pyarrow.compute as pc

    c_tz = bool(_RE_HAS_TZ.search(lexical))
    lex = _date_to_dt_lexical(lexical) if kind == "date" else lexical
    c0 = _parse_dt_ns([lex])[0].as_py()
    if c0 is None:
        raise ValueError(f"unparsable temporal constant: {lexical!r}")

    t0, has_tz = _dt_parts(col, kind)
    other = "date" if kind == "dateTime" else "dateTime"
    t0_other, _ = _dt_parts(col, other)

    d = pc.subtract(t0, c0)
    same_tz = pc.equal(has_tz, c_tz)
    H = _TZ_WINDOW_NS
    if cmp_op == "=":
        mask = pc.and_(same_tz, pc.equal(d, 0))
    elif cmp_op == "!=":
        near = {"same": pc.not_equal(d, 0),
                "mixed": pc.greater(pc.abs(d), H)}
        mask = pc.if_else(same_tz, near["same"], near["mixed"])
        # different temporal kind → determinately not equal
        mask = pc.or_kleene(
            pc.fill_null(mask, False), pc.is_valid(t0_other)
        )
    else:
        strict = {"<": pc.less, ">": pc.greater}
        wide = {"<=": pc.less_equal, ">=": pc.greater_equal}
        kern = (strict | wide)[cmp_op]
        shift = -H if cmp_op in ("<", "<=") else H
        mask = pc.if_else(same_tz, kern(d, 0), kern(d, shift))
    return pc.fill_null(mask, False)


def _eval_num_expr(tb: pa.Table, expr, col_for):
    """Numeric value of an arithmetic expression AST over resolved term
    columns (E_Add/E_Subtract/E_Multiply/E_Divide with float64 promotion).
    Leaves: float constants and '?var' strings; nodes: ('+'|'-'|'*'|'/',
    a, b) and ('neg', a). Non-numeric terms → null → the comparison row
    drops (SPARQL type error)."""
    import pyarrow.compute as pc

    if isinstance(expr, (int, float)):
        return pa.array([float(expr)] * tb.num_rows, type=pa.float64())
    if isinstance(expr, str) and expr.startswith("?"):
        return _num_value(tb.column(col_for(expr[1:])))
    op = expr[0]
    if op == "neg":
        return pc.negate(_eval_num_expr(tb, expr[1], col_for))
    a = _eval_num_expr(tb, expr[1], col_for)
    b = _eval_num_expr(tb, expr[2], col_for)
    kern = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
            "/": pc.divide}[op]
    if op == "/":
        # SPARQL division by zero is a type error (row drops), not inf
        b = pc.if_else(pc.equal(b, 0.0), pa.scalar(None, pa.float64()), b)
    return kern(a, b)


def _id_filter_mask(tb: pa.Table, f: tuple):
    import pyarrow.compute as pc

    op, var = f[0], f[1][1:]
    col = tb.column(var)
    if op == "bound":
        return pc.is_valid(col)
    if op == "!bound":
        return pc.is_null(col)
    rhs = f[2]
    other = (tb.column(rhs[1:]) if rhs.startswith("?")
             else pa.scalar(term_id(rhs), ID_TYPE))
    mask = pc.equal(col, other)
    if op == "!=":
        mask = pc.invert(mask)
    return pc.fill_null(mask, False)


def _value_filter_mask(tb: pa.Table, f: tuple, col_for):
    """Boolean mask for a (possibly compound) value-space filter.
    ``col_for(varname)`` names the resolved term column of a variable.
    Error rows evaluate to False (SPARQL effective boolean value: an
    erroring branch cannot make the row pass; true||error stays true)."""
    import pyarrow.compute as pc

    op = f[0]
    if op in ("or", "and"):
        comb = pc.or_ if op == "or" else pc.and_
        mask = None
        for sub in f[1:]:
            m = _value_filter_mask(tb, sub, col_for)
            mask = m if mask is None else comb(mask, m)
        return pc.fill_null(mask, False)
    if op == "not":
        # E_LogicalNot over a subtree whose only error source is an
        # UNBOUND variable (parser lowers '!(...)' over streq/constb
        # and/or compositions only): an unbound operand is a type error,
        # and !error is still an error → the row drops on both polarities,
        # so the inverted mask is ANDed with every referenced var's
        # validity
        if f[1][0] == "fexpr":
            # !fn(...): evaluate once, require a DEFINED (non-error)
            # result — !error is still an error, so the row drops on
            # both polarities (Function/Lang 2: the bnode/IRI rows)
            from jena_ray.sparql import _eval_bind

            needed = sorted(_bind_expr_vars(f[1][1]))
            sub = pa.table(
                {v: pc.cast(tb.column(col_for(v)), pa.string())
                 for v in needed}
            ) if needed else pa.table(
                {"__r": pa.nulls(tb.num_rows, type=pa.string())}
            )
            truth, defined = _ebv_masks(_eval_bind(sub, f[1][1]))
            return pc.fill_null(pc.and_(pc.invert(truth), defined), False)
        if f[1][0] == "termeq":
            # !(?v = c) / !(?v != c): three-valued — value-space errors
            # (unknown datatype, ill-formed lexical) stay errors under
            # negation, so the row drops on both polarities
            m = _term_eq_mask(tb, f[1][1], f[1][2], f[1][3], col_for,
                              keep_null=True)
            return pc.fill_null(pc.invert(m), False)
        inner = pc.fill_null(_value_filter_mask(tb, f[1], col_for), False)
        m = pc.invert(inner)
        for v in sorted(_filter_vars(f[1])):
            m = pc.and_(m, pc.is_valid(tb.column(col_for(v))))
        return m
    if op in ("bound", "!bound"):
        col = tb.column(col_for(f[1][1:]))
        return pc.is_valid(col) if op == "bound" else pc.is_null(col)
    if op == "constb":
        # constant boolean leaf (FILTER(true), "false"^^xsd:boolean || ?v)
        return pa.array([bool(f[1])] * tb.num_rows, type=pa.bool_())
    if op in ("ebv", "notebv"):
        truth, defined = _ebv_masks(tb.column(col_for(f[1][1:])))
        if op == "ebv":
            return pc.and_(truth, defined)
        # !expr of a type error is still an error → row dropped
        return pc.and_(pc.invert(truth), defined)
    if op == "dtof":
        return _dtof_mask(tb, f, col_for)
    if op in ("fexpr", "cmpexpr"):
        # general expression filters: evaluate the bind-expression AST(s)
        # to term columns with the SPARQL layer's vectorized evaluator
        # (import at call time — sparql.py imports this module at load)
        from jena_ray.sparql import _eval_bind

        exprs = [f[1]] if op == "fexpr" else [f[2], f[3]]
        needed = sorted(set().union(*(_bind_expr_vars(e) for e in exprs)))
        if needed:
            sub = pa.table(
                {v: pc.cast(tb.column(col_for(v)), pa.string())
                 for v in needed}
            )
        else:
            sub = pa.table({"__r": pa.nulls(tb.num_rows, type=pa.string())})
        cols = [_eval_bind(sub, e) for e in exprs]
        if op == "fexpr":
            truth, defined = _ebv_masks(cols[0])
            return pc.fill_null(pc.and_(truth, defined), False)
        a, b = (pc.cast(c, pa.string()) for c in cols)
        if f[1] in ("=", "!="):
            tb2 = pa.table({"__cmpa": a, "__cmpb": b})
            return _term_eq_mask(tb2, f[1], "?__cmpa", "?__cmpb",
                                 lambda v: v)
        # ordering comparisons: numeric value space when both sides are
        # numeric, else simple-string codepoint order (XSDFuncOp
        # compareString); mixed/other value spaces are type errors
        kern = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater,
                ">=": pc.greater_equal}[f[1]]
        an, bn = _num_value(a), _num_value(b)
        both_num = pc.and_(pc.is_valid(an), pc.is_valid(bn))
        simple_re = (r'^"(?:[^"\\]|\\.)*"'
                     r"(?:\^\^<http://www\.w3\.org/2001/XMLSchema#string>)?$")
        both_str = pc.and_(
            pc.fill_null(pc.match_substring_regex(a, simple_re), False),
            pc.fill_null(pc.match_substring_regex(b, simple_re), False),
        )
        # temporal pairs: same-kind dateTime/dateTime or date/date compare
        # by instant with the dtcmp tz-indeterminacy rule (same tz-ness →
        # direct; mixed → determinate only outside the ±14h window)
        adt, adtz = _dt_parts(a, "dateTime")
        ad, adz = _dt_parts(a, "date")
        bdt, bdtz = _dt_parts(b, "dateTime")
        bd, bdz = _dt_parts(b, "date")
        both_dt = pc.and_(pc.is_valid(adt), pc.is_valid(bdt))
        both_d = pc.and_(pc.is_valid(ad), pc.is_valid(bd))
        ta = pc.if_else(both_dt, adt, ad)
        tb2 = pc.if_else(both_dt, bdt, bd)
        tz_a = pc.if_else(both_dt, adtz, adz)
        tz_b = pc.if_else(both_dt, bdtz, bdz)
        d = pc.subtract(ta, tb2)
        shift = -_TZ_WINDOW_NS if f[1] in ("<", "<=") else _TZ_WINDOW_NS
        tmask = pc.if_else(pc.equal(tz_a, tz_b), kern(d, 0), kern(d, shift))
        mask = pc.if_else(
            both_num, kern(an, bn),
            pc.if_else(both_str,
                       kern(pc.fill_null(_str_value(a), ""),
                            pc.fill_null(_str_value(b), "")),
                       pc.if_else(pc.or_(both_dt, both_d), tmask,
                                  pa.scalar(None, pa.bool_()))),
        )
        return pc.fill_null(mask, False)
    if op == "termeq":
        return _term_eq_mask(tb, f[1], f[2], f[3], col_for)
    if op == "nottype":
        # !isX(?v): invert the kind test but keep unbound rows False
        # (E_LogicalNot of an eval error is still an error → row dropped)
        inner = (f[1], f[2])
        col = tb.column(col_for(f[2][1:]))
        m = _value_filter_mask(tb, inner, col_for)
        return pc.and_(pc.is_valid(col), pc.invert(m))
    if op in _TYPE_FILTER_OPS:
        s = pc.cast(tb.column(col_for(f[1][1:])), pa.string())
        if op == "isiri":
            # quoted triples also start with '<' — exclude them
            mask = pc.and_(
                pc.starts_with(s, "<"), pc.invert(pc.starts_with(s, "<<"))
            )
        elif op == "isblank":
            mask = pc.starts_with(s, "_:")
        elif op == "isliteral":
            mask = pc.starts_with(s, '"')
        elif op == "istriple":  # E_IsTriple (RDF-star)
            mask = pc.starts_with(s, "<<")
        else:  # isnumeric
            mask = pc.is_valid(_num_value(s))
        return pc.fill_null(mask, False)
    if op == "dtcmp":
        cmp_op, var, lexical, kind = f[1], f[2][1:], f[3], f[4]
        return _dtcmp_mask(tb.column(col_for(var)), cmp_op, lexical, kind)
    if op == "streq":
        # E_Str '='/'!=' — effective string value of ANY term kind (STR()
        # widens IRIs/typed literals to their string form)
        cmp_op, var, rhs = f[1], f[2][1:], f[3]
        sv = _str_value(tb.column(col_for(var)))
        other = (_str_value(tb.column(col_for(rhs[1:])))
                 if rhs.startswith("?") else rhs)
        mask = pc.equal(sv, other)
        if cmp_op == "!=":
            mask = pc.invert(mask)
        return pc.fill_null(mask, False)
    if op == "scmp":
        # ("scmp", cmp, "?v", "lexical") — codepoint ordering on SIMPLE
        # strings (plain / xsd:string — XSDFuncOp.compareString via
        # VSPACE_STRING); any other term kind errors → row dropped
        cmp_op, var, rhs = f[1], f[2][1:], f[3]
        col = tb.column(col_for(var))
        s = pc.cast(col, pa.string())
        is_simple = pc.match_substring_regex(
            s,
            r'^"(?:[^"\\]|\\.)*"'
            r"(?:\^\^<http://www\.w3\.org/2001/XMLSchema#string>)?$",
        )
        kern = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater,
                ">=": pc.greater_equal, "=": pc.equal,
                "!=": pc.not_equal}[cmp_op]
        mask = pc.and_(is_simple, kern(_str_value(col), rhs))
        return pc.fill_null(mask, False)
    if op == "cmp":
        cmp_op = f[1]
        a = _eval_num_expr(tb, f[2], col_for)
        b = _eval_num_expr(tb, f[3], col_for)
        kern = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater,
                ">=": pc.greater_equal, "=": pc.equal,
                "!=": pc.not_equal}[cmp_op]
        return pc.fill_null(kern(a, b), False)
    if op in ("=", "!=") and isinstance(f[2], str):
        # sameTerm leaf reached in value space (inside a compound)
        col = pc.cast(tb.column(col_for(f[1][1:])), pa.string())
        rhs = f[2]
        other = (
            pc.cast(tb.column(col_for(rhs[1:])), pa.string())
            if rhs.startswith("?") else rhs
        )
        mask = pc.equal(col, other)
        if op == "!=":
            mask = pc.invert(mask)
        return pc.fill_null(mask, False)
    col = tb.column(col_for(f[1][1:]))
    if op in _NUM_FILTER_OPS:
        v = _num_value(col)
        kern = {
            "<": pc.less, "<=": pc.less_equal, ">": pc.greater,
            ">=": pc.greater_equal, "=": pc.equal, "!=": pc.not_equal,
        }[op]
        mask = kern(v, float(f[2]))
    elif op in ("lang", "langmatches", "notlangmatches"):
        # lang() is only defined on literals (type error drops the row).
        # langMatches uses BCP-47 basic ranges: case-insensitive, "*" = any
        # non-empty tag, "en" matches "en" and "en-GB" (E_LangMatches);
        # plain LANG(?x) =/!= "tag" stays an exact string compare.
        # notlangmatches = E_LogicalNot(E_LangMatches): inverted match but
        # non-literal rows stay errors (dropped) — the is_lit AND holds.
        is_lit = pc.starts_with(pc.cast(col, pa.string()), '"')
        lv = _lang_value(col)
        if op in ("langmatches", "notlangmatches"):
            rng = f[2].lower()
            lvl = pc.utf8_lower(lv)
            if rng == "*":
                m = pc.not_equal(lvl, "")
            else:
                m = pc.or_(pc.equal(lvl, rng),
                           pc.starts_with(lvl, rng + "-"))
            if op == "notlangmatches":
                m = pc.invert(m)
        else:
            m = pc.equal(lv, f[2])
            if len(f) > 3 and f[3]:
                m = pc.invert(m)
        mask = pc.and_(is_lit, m)
    elif op == "regexvar":
        # E_Regex with a VARIABLE pattern (ARQ regex-3/4): group rows by
        # distinct pattern value per batch, one compiled regex per group
        # (patterns are literals; non-literal/unbound patterns are type
        # errors → dropped)
        import re as _re

        pat_col = tb.column(col_for(f[2][1:]))
        sv = _str_value(col).to_pylist()
        pats = _lit_value(pat_col).to_pylist()
        if len(f) > 3 and f[3] is not None:
            flags = _lit_value(tb.column(col_for(f[3][1:]))).to_pylist()
        else:
            flags = [""] * tb.num_rows
        out = []
        cache: dict[tuple, object] = {}
        for v, p, fl in zip(sv, pats, flags):
            if v is None or p is None or fl is None:
                out.append(False)
                continue
            key = (p, fl)
            rx = cache.get(key)
            if rx is None:
                try:
                    rx = cache[key] = _re.compile(
                        f"(?{fl})" + p if fl else p
                    )
                except _re.error:
                    rx = cache[key] = False
            out.append(bool(rx.search(v)) if rx is not False else False)
        return pa.array(out, type=pa.bool_())
    else:
        # 4th tuple slot: STR(...) applied → effective string value;
        # absent/False → literal lexical only (type error on IRIs/bnodes
        # drops the row). Programmatic 3-tuples keep the STR behavior.
        wrapped = bool(f[3]) if len(f) > 3 else True
        sv = _str_value(col) if wrapped else _lit_value(col)
        if op == "regex":
            mask = pc.match_substring_regex(sv, f[2])
        elif op == "strstarts":
            mask = pc.starts_with(sv, f[2])
        elif op == "strends":
            mask = pc.ends_with(sv, f[2])
        else:  # contains
            mask = pc.match_substring(sv, f[2])
    return pc.fill_null(mask, False)


def _apply_filters(res, res_vars: set[str], filters, out_dir: str):
    """Apply OpFilter expressions to an id-space binding Dataset."""
    import pyarrow.compute as pc

    from jena_ray.stages.materialize import resolve_id_columns

    if any(f == ("never",) for f in (filters or [])):
        # constant-false filter (an out-of-scope FILTER replaced at group
        # merge — sparql.Parser._merge): no solution survives
        return res.map_batches(
            lambda tb: tb.slice(0, 0), batch_format="pyarrow"
        )
    live = []
    for f in list(filters or []):
        missing = _filter_vars(f) - res_vars
        if not missing:
            live.append(f)
            continue
        if f[0] in ("or", "and", "not"):
            # inside a boolean tree an unbound-var type error can still be
            # absorbed (err || true = true) — not statically resolvable
            raise ValueError(
                f"filter {f} references unbound vars {sorted(missing)}"
            )
        if f[0] == "!bound":
            continue  # a never-bound var is unbound in every row: TRUE
        # bound() is false; any other op is a type error → FALSE for every
        # row (SPARQL 1.1 §17.2 expression evaluation): statically empty
        return res.map_batches(
            lambda tb: tb.slice(0, 0), batch_format="pyarrow"
        )
    filters = live

    id_f = [f for f in filters if _is_id_filter(f)]
    val_f = [f for f in filters if not _is_id_filter(f)]
    for f in val_f:
        _validate_filter(f)

    if id_f:

        def apply_id(tb: pa.Table, _fs=tuple(id_f)) -> pa.Table:
            for f in _fs:
                tb = tb.filter(_id_filter_mask(tb, f))
            return tb

        res = res.map_batches(apply_id, batch_format="pyarrow")

    if val_f:
        vvars = sorted({v for f in val_f for v in _filter_vars(f)})

        def dup(tb: pa.Table, _vs=tuple(vvars)) -> pa.Table:
            for v in _vs:
                tb = tb.append_column(f"__fid_{v}", tb.column(v))
            return tb

        if vvars:  # constant-only filters (FILTER(true)) resolve nothing
            res = res.map_batches(dup, batch_format="pyarrow")
            res = resolve_id_columns(
                res, out_dir, {f"__fid_{v}": f"__ft_{v}" for v in vvars}
            )

        def apply_val(tb: pa.Table, _fs=tuple(val_f), _vs=tuple(vvars)) -> pa.Table:
            for f in _fs:
                tb = tb.filter(
                    _value_filter_mask(tb, f, lambda v: f"__ft_{v}")
                )
            return tb.drop_columns([f"__ft_{v}" for v in _vs])

        res = res.map_batches(apply_val, batch_format="pyarrow")
    return res


def binding_join(
    left,
    lvars: set[str],
    right,
    rvars: set[str],
    on: list[str],
    *,
    how: str = "inner",
    num_buckets: int = 16,
    right_extra: tuple[str, ...] = (),
    col_types: dict | None = None,
):
    """Hash-bucketed join of two id-space binding Datasets.

    ``col_types`` maps column name → pa.DataType for non-int64 columns
    (term-level joins pad with string nulls, aggregate-alias columns keep
    their value type); unlisted columns default to int64 id columns.

    NOT ``Dataset.join``: ray 2.49's native hash join derives each
    aggregator's schema from the first data block each side submits, and an
    EMPTY first block eats the one-shot schema broadcast
    (hash_shuffle._shuffle_block returns before honoring
    ``send_empty_blocks``), so a side whose first-arriving block is empty —
    a pattern that matched nothing, a filtered read — crashes the join with
    "No match for FieldRef". Binding schemas here are fully known (a
    fixed_size_binary(16) id per variable), so the bucketed-groupby join
    is both immune and
    idiomatic: pad both sides to the combined column set, tag the side,
    hash-bucket on the join keys, co-locate with ONE groupby shuffle, and
    run the vectorized ``pa.Table.join`` per bucket (the same per-partition
    arrow join ray's aggregators run). Empty buckets never call the UDF,
    and the zero-column empty blocks map_groups emits for empty hash
    partitions are tolerated by every downstream stage we use (map_batches
    skips them; groupby shuffles accept them).

    Skew note: buckets are keyed by the shared-variable ids; a hub binding
    (one entity joining millions of docs) lands one bucket — the same
    property as any hash join. At crawl scale raise num_buckets and salt
    hub keys upstream (the POS-bucketing story in stages/materialize.py).
    """
    import pyarrow.compute as pc

    from jena_ray.stages.dedup import add_bucket

    lcols = sorted(lvars)
    rcols = sorted(set(rvars) | set(right_extra))
    all_cols = sorted(set(lcols) | set(rcols))

    types = col_types or {}

    def prep(side: int, own: tuple[str, ...]):
        def f(tb: pa.Table, _own=own, _side=side) -> pa.Table:
            for c in all_cols:
                if c not in _own:
                    tb = tb.append_column(
                        c, pa.nulls(tb.num_rows, type=types.get(c, ID_TYPE))
                    )
            tb = tb.select(all_cols)
            tb = tb.append_column(
                "_side", pa.array([_side] * tb.num_rows, type=pa.int8())
            )
            return add_bucket(tb, list(on), num_buckets)

        return f

    u = left.map_batches(prep(0, tuple(lcols)), batch_format="pyarrow").union(
        right.map_batches(prep(1, tuple(rcols)), batch_format="pyarrow")
    )

    arrow_how = {"inner": "inner", "left_outer": "left outer",
                 "left_semi": "left semi", "left_anti": "left anti"}[how]

    def per_bucket(g: pa.Table, _l=tuple(lcols), _r=tuple(rcols)) -> pa.Table:
        side = g.column("_side")
        lt = g.filter(pc.equal(side, 0)).select(list(_l))
        rt = g.filter(pc.equal(side, 1)).select(list(_r))
        out = lt.join(rt, keys=list(on), right_keys=list(on), join_type=arrow_how)
        return out.select(sorted(out.schema.names))

    # coalesce before the shuffle: the groupby has at most num_buckets
    # groups, so more input blocks than buckets only adds empty reduce
    # tasks (fixed overhead that dominates query-sized joins; num_buckets
    # is the join's parallelism knob — large joins pass a larger value)
    u = u.repartition(num_buckets)
    return u.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def _execute_bgp_ids(
    out_dir: str,
    patterns: list[Pattern],
    info: dict,
    *,
    num_partitions: int = 16,
    stats: dict | None | bool = None,
    pf_context: dict | None = None,
):
    """Execute a BGP in id space → (bindings Dataset of id var columns,
    bound var set). The inner-join chain shared by bgp_execute and
    bgp_optional (OpBGP inside OpJoin/OpLeftJoin — OpExecutor.java:62).

    Property-function patterns run FIRST (they are binding generators with
    no index cardinality — the reference also lifts them out of the BGP via
    transformProperty); the remaining scan patterns are reordered by stats
    when a side-car exists (triples only — quad patterns use the fixed
    most-bound-first order)."""
    from jena_ray.pipelines.tdbstats import load_stats

    pf_pats = [p for p in patterns if _is_pf_pattern(p)]
    scan_pats = [p for p in patterns if not _is_pf_pattern(p)]

    if any(len(p) == 4 for p in scan_pats) or any(
        isinstance(p[1], tuple) for p in scan_pats if len(p) == 3
    ):
        stats = False  # stats side-car models plain triple predicates only
    if stats is None:
        stats = load_stats(out_dir)
    if stats:  # pass stats=False to force the fixed-order fallback
        plan = REORDER_STRATEGIES["stats"](scan_pats, stats)
    else:
        plan = REORDER_STRATEGIES["fixed"](scan_pats, None)
    plan = pf_pats + plan

    res = None
    res_vars: set[str] = set()
    for pat in plan:
        if _is_pf_pattern(pat):
            fn = BGP_PROPERTY_FUNCTIONS[pat[-2][1:-1]]
            ds = fn(out_dir, pat, info, pf_context or {})
        else:
            ds = _scan_pattern(out_dir, pat, info)
        pvars = {t[1:] for t in pat if is_var(t)}
        if res is None:
            res, res_vars = ds, pvars
            continue
        shared = sorted(res_vars & pvars)
        if not shared:
            # disconnected component → cartesian product (OpJoin with no
            # common vars — the reference's QueryIterNestedLoopJoin).
            # Implemented as a binding_join on a constant key: all rows
            # co-locate in ONE task, which is exactly the nested-loop
            # cost profile — fine for the typical shape (tiny ground-ish
            # probes, e.g. the DAWG type-promotion ASKs), unscalable for
            # two large sides by construction, same as the reference.
            res = _cross_join(res, res_vars, ds, pvars)
        else:
            res = binding_join(
                res, res_vars, ds, pvars, shared, num_buckets=num_partitions
            )
        res_vars |= pvars
    return res, res_vars


def _cross_join(left, lvars: set[str], right, rvars: set[str]):
    """Cartesian product of two binding Datasets via a constant join key."""

    def tag(tb: pa.Table) -> pa.Table:
        return tb.append_column(
            "__cross", pa.array([0] * tb.num_rows, type=pa.int64())
        )

    out = binding_join(
        left.map_batches(tag, batch_format="pyarrow"),
        lvars | {"__cross"},
        right.map_batches(tag, batch_format="pyarrow"),
        rvars | {"__cross"},
        ["__cross"],
        num_buckets=1,
        col_types={"__cross": pa.int64()},
    )
    return out.map_batches(
        lambda tb: tb.drop_columns(["__cross"]), batch_format="pyarrow"
    )


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
        res = dedup_exact(res, cols=tuple(select), coalesce=True)
    return resolve_id_columns(res, out_dir, {v: v for v in select})


def bgp_execute(
    out_dir: str,
    patterns: list[Pattern],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
    filters: list[tuple] | None = None,
    pf_context: dict | None = None,
    values: list[dict[str, str]] | None = None,
):
    """Execute a BGP; returns a Dataset whose columns are the selected
    variable names holding canonical term STRINGS (resolved via the terms
    NodeTable), distinct and unsorted (callers sort).

    Join order: cardinality-greedy when a stats side-car exists for the
    index (tdbstats.reorder_patterns — the TDB StatsMatcher/
    ReorderTransformationSubstitution path), else most-bound-first
    (ReorderFixed, the reference's fallback when no stats.opt is present).

    ``filters`` — OpFilter expressions (see module docstring);
    ``pf_context`` — side-car handles for property-function patterns
    (e.g. ``{"text_index": dir}`` for text:query);
    ``values`` — VALUES rows (OpTable) joined into the solution stream.
    """
    info = read_layout(out_dir)
    res, res_vars = _execute_bgp_ids(
        out_dir, patterns, info, num_partitions=num_partitions, stats=stats,
        pf_context=pf_context,
    )
    if values:
        vds, vvars = values_bindings(values)
        shared = sorted(res_vars & vvars)
        if not shared:
            raise ValueError("VALUES must share at least one variable with the BGP")
        res = binding_join(
            res, res_vars, vds, vvars, shared, num_buckets=num_partitions
        )
        res_vars |= vvars
    if filters:
        res = _apply_filters(res, res_vars, filters, out_dir)
    return _project_resolve(res, res_vars, select, out_dir, distinct=distinct)


def quad_bgp_execute(
    out_dir: str,
    patterns: list[Pattern],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    filters: list[tuple] | None = None,
):
    """BGP over QUAD patterns ``(g, s, p, o)`` against the GSPO/GPOS/GOSP
    store (stages/quads.py) — named-graph solving (SolverLib's quad path;
    GRAPH ?g { ... } with every pattern in the same graph term/variable).
    Same id-space join chain, filters, and bucket-aligned term resolution
    as the triple path; quad stores carry their own terms/ NodeTable."""
    for p in patterns:
        if len(p) != 4:
            raise ValueError(f"quad pattern must have 4 slots: {p}")
    return bgp_execute(
        out_dir, patterns, select,
        num_partitions=num_partitions, distinct=distinct, stats=False,
        filters=filters,
    )


def bgp_union(
    out_dir: str,
    branches: list[list[Pattern]],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
    filters: list[list[tuple] | None] | None = None,
    pf_context: dict | None = None,
):
    """OpUnion — each branch executes as its own id-space BGP; binding
    schemas are aligned by NULL-padding variables the branch does not bind
    (SPARQL UNION keeps per-branch bindings partial), then concatenated
    with ``Dataset.union`` (a metadata-only merge — no shuffle) and resolved
    once. ``filters`` optionally carries one OpFilter list per branch
    (FILTER scopes inside the braces of its branch)."""
    info = read_layout(out_dir)
    results = []
    all_vars: set[str] = set()
    for i, pats in enumerate(branches):
        if not pats:
            # empty group pattern { } — the unit table: ONE solution
            # binding nothing (algebra Join identity; Jena's
            # QueryIterUnion yields it from the empty BGP). Padded to
            # all-null over the union's variable set below.
            results.append((None, set()))
            continue
        res, rv = _execute_bgp_ids(
            out_dir, pats, info, num_partitions=num_partitions, stats=stats,
            pf_context=pf_context,
        )
        fl = filters[i] if filters else None
        if fl:
            res = _apply_filters(res, rv, fl, out_dir)
        results.append((res, rv))
        all_vars |= rv

    cols = sorted(all_vars)
    if not cols:
        raise ValueError("UNION of only empty branches is unsupported")
    padded = []
    for res, rv in results:
        if res is None:
            import ray.data as rd

            unit = pa.table({c: pa.nulls(1, type=ID_TYPE) for c in cols})
            padded.append(rd.from_arrow(unit))
            continue

        def pad(tb: pa.Table, _missing=tuple(sorted(all_vars - rv)), _cols=tuple(cols)) -> pa.Table:
            for m in _missing:
                tb = tb.append_column(m, pa.nulls(tb.num_rows, type=ID_TYPE))
            return tb.select(list(_cols))

        padded.append(res.map_batches(pad, batch_format="pyarrow"))
    u = padded[0] if len(padded) == 1 else padded[0].union(*padded[1:])
    return _project_resolve(u, all_vars, select, out_dir, distinct=distinct)


def _join_union_ids(
    out_dir: str,
    patterns: list[Pattern],
    branches: list[list[Pattern]],
    branch_filters: list | None,
    info: dict,
    *,
    num_partitions: int,
    stats,
    pf_context=None,
):
    """Id-space Join(BGP, Union(B₁…Bₙ)) — join distributes over union, so
    each branch joins the group BGP independently and the joined branches
    union; never a join against a padded null-bearing table (each
    branch's bound-variable set is known statically, so every per-branch
    join is a plain equi-join). With no patterns this is the plain union.
    Returns (ds, all_vars, maybe_null) — maybe_null = vars absent from at
    least one joined branch (null in its padded rows)."""
    if patterns:
        left, lvars = _execute_bgp_ids(
            out_dir, patterns, info, num_partitions=num_partitions,
            stats=stats, pf_context=pf_context,
        )
    else:
        left, lvars = None, set()
    all_vars = set(lvars)
    execs = []
    for i, pats in enumerate(branches):
        if not pats:
            # empty branch = the unit table: Join(L, unit) = L
            execs.append((None, set()))
            continue
        r, rv = _execute_bgp_ids(
            out_dir, pats, info, num_partitions=num_partitions, stats=stats,
            pf_context=pf_context,
        )
        bf = branch_filters[i] if branch_filters else None
        if bf:
            r = _apply_filters(r, rv, bf, out_dir)
        if left is not None and not (lvars & rv):
            raise ValueError(
                "UNION branch shares no variable with the group BGP "
                "(cartesian product pattern not supported)"
            )
        execs.append((r, rv))
        all_vars |= rv

    cols = sorted(all_vars)
    if not cols:
        raise ValueError("UNION of only empty branches is unsupported")
    joined = []
    maybe_null: set[str] = set()
    for r, rv in execs:
        if r is None and left is None:
            import ray.data as rd

            jb = rd.from_arrow(
                pa.table({c: pa.nulls(1, type=ID_TYPE) for c in cols})
            )
            maybe_null |= all_vars
            joined.append(jb)
            continue
        if r is None:
            jb = left
        elif left is None:
            jb = r
        else:
            jb = binding_join(left, lvars, r, rv, sorted(lvars & rv),
                              num_buckets=num_partitions)
        missing = tuple(sorted(all_vars - lvars - rv))
        maybe_null |= set(missing)

        def pad(tb: pa.Table, _m=missing, _c=tuple(cols)) -> pa.Table:
            for m in _m:
                tb = tb.append_column(m, pa.nulls(tb.num_rows, type=ID_TYPE))
            return tb.select(list(_c))

        joined.append(jb.map_batches(pad, batch_format="pyarrow"))
    u = joined[0] if len(joined) == 1 else joined[0].union(*joined[1:])
    return u, all_vars, maybe_null


def bgp_join_union(
    out_dir: str,
    patterns: list[Pattern],
    branches: list[list[Pattern]],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
    filters: list | None = None,
    branch_filters: list | None = None,
    pf_context: dict | None = None,
):
    """Join(BGP, Union) — a group holding triple patterns AND a UNION
    block (AlgebraGenerator joins the compiled union to the group's BGP).
    Group filters outside the UNION apply post-union over the merged
    scope. See :func:`_join_union_ids`."""
    info = read_layout(out_dir)
    u, all_vars, _mn = _join_union_ids(
        out_dir, patterns, branches, branch_filters, info,
        num_partitions=num_partitions, stats=stats, pf_context=pf_context,
    )
    if filters:
        u = _apply_filters(u, all_vars, filters, out_dir)
    return _project_resolve(u, all_vars, select, out_dir, distinct=distinct)


def bgp_minus(
    out_dir: str,
    patterns: list[Pattern],
    minus: list[Pattern],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
    filters: list[tuple] | None = None,
):
    """OpMinus — remove left bindings compatible with any right binding on
    the shared variables (QueryIterMinus semantics; both sides here are
    plain BGPs so every shared variable is bound → compatibility is exact
    key equality). Hash anti-join in id space: left_outer on the shared
    vars, keep rows whose right-side key came back null. Disjoint domains
    remove nothing (SPARQL MINUS with no shared vars is a no-op)."""
    info = read_layout(out_dir)
    left, lvars = _execute_bgp_ids(
        out_dir, patterns, info, num_partitions=num_partitions, stats=stats
    )
    if filters:
        left = _apply_filters(left, lvars, filters, out_dir)
    right, rvars = _execute_bgp_ids(
        out_dir, minus, info, num_partitions=num_partitions, stats=stats
    )
    shared = sorted(lvars & rvars)
    if not shared:
        return _project_resolve(left, lvars, select, out_dir, distinct=distinct)
    res = _semi_anti_join(
        left, lvars, right, shared, keep_matched=False,
        num_buckets=num_partitions,
    )
    return _project_resolve(res, lvars, select, out_dir, distinct=distinct)


def _semi_anti_join(left, lvars, right, shared, *, keep_matched, num_buckets):
    """Existence probe on the shared id columns: left_outer join against the
    right side's key set marked __m=1, then keep matched (semi) or unmatched
    (anti) rows. For semi the right keys are GLOBALLY deduped first —
    duplicate keys would multiply matched left rows; for anti a block-local
    combiner suffices (matched rows are dropped either way)."""
    import pyarrow.compute as pc

    def keys_only(tb: pa.Table, _k=tuple(shared)) -> pa.Table:
        from jena_ray.stages.dedup import dedup_batch

        return dedup_batch(tb.select(list(_k)), list(_k))

    rkeys = right.map_batches(keys_only, batch_format="pyarrow")
    if keep_matched:
        from jena_ray.stages.dedup import dedup_exact

        rkeys = dedup_exact(rkeys, cols=tuple(shared), coalesce=True)

    def mark(tb: pa.Table) -> pa.Table:
        return tb.append_column(
            "__m", pa.array([1] * tb.num_rows, type=pa.int64())
        )

    rkeys = rkeys.map_batches(mark, batch_format="pyarrow")
    j = binding_join(
        left, lvars, rkeys, set(shared), shared,
        how="left_outer", num_buckets=num_buckets, right_extra=("__m",),
        col_types={"__m": pa.int64()},
    )
    keep = pc.is_valid if keep_matched else pc.is_null

    def probe(tb: pa.Table) -> pa.Table:
        tb = tb.filter(keep(tb.column("__m")))
        return tb.drop_columns(["__m"])

    return j.map_batches(probe, batch_format="pyarrow")


def bgp_exists(
    out_dir: str,
    patterns: list[Pattern],
    exists: list[tuple[list[Pattern], bool]],
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
    filters: list[tuple] | None = None,
):
    """FILTER EXISTS / NOT EXISTS — OpFilter wrapping E_Exists /
    E_NotExists (sparql/expr/E_Exists.java, E_NotExists.java evaluated by
    the inner-execution path in ExprFunctionOp): each ``(patterns,
    inner_filters, negate)`` entry keeps left solutions that do (EXISTS)
    or do not (NOT EXISTS) join the inner BGP on the shared variables.
    Inner filters must reference only inner variables (a filter crossing
    into the outer scope would be per-row correlated — unsupported). An
    entry sharing NO variable with the group is a constant gate: one
    probe row decides whether the left stream passes or empties. With no
    outer patterns the left side is the unit table; EXISTS binds nothing,
    so never-bound selected variables surface as null columns."""
    info = read_layout(out_dir)
    left, lvars = _execute_bgp_ids(
        out_dir, patterns, info, num_partitions=num_partitions, stats=stats
    )
    if left is None:
        import ray.data as rd

        left = rd.from_arrow(pa.table({"__unit": pa.array([0])}))
        lvars = set()
    if filters:
        left = _apply_filters(left, lvars, filters, out_dir)
    for pats, efilters, negate in exists:
        right, rvars = _execute_bgp_ids(
            out_dir, pats, info, num_partitions=num_partitions, stats=stats
        )
        if right is None:
            raise ValueError("EXISTS block needs at least one pattern")
        if efilters:
            bad = [f for f in efilters if not (_filter_vars(f) <= rvars)]
            if bad:
                raise ValueError(
                    "EXISTS filter references outer variables (correlated "
                    f"filters are unsupported): {bad}"
                )
            right = _apply_filters(right, rvars, efilters, out_dir)
        shared = sorted(lvars & rvars)
        if shared:
            left = _semi_anti_join(
                left, lvars, right, shared, keep_matched=not negate,
                num_buckets=num_partitions,
            )
        elif (len(right.limit(1).take(1)) > 0) == negate:
            # constant probe failed its gate (EXISTS empty / NOT EXISTS
            # matched): the whole group yields no solutions
            left = left.map_batches(
                lambda tb: tb.slice(0, 0), batch_format="pyarrow"
            )
    bound_sel = [v for v in select if v in lvars]
    missing = [v for v in select if v not in lvars]
    if bound_sel or not missing:
        res = _project_resolve(
            left, lvars, bound_sel, out_dir, distinct=distinct
        )
    else:
        # nothing selected is bound: solutions are rows of unbound vars
        res = left

    if missing:

        def pad_unbound(tb: pa.Table, _m=tuple(missing),
                        _s=tuple(select)) -> pa.Table:
            for v in _m:
                tb = tb.append_column(v, pa.nulls(tb.num_rows,
                                                  type=pa.string()))
            return tb.select(list(_s))

        res = res.map_batches(pad_unbound, batch_format="pyarrow")
        if distinct and not bound_sel:
            from jena_ray.stages.dedup import dedup_exact

            res = dedup_exact(res, cols=tuple(select), coalesce=True)
    return res


def _tag_unique(ds, col: str = "__lid"):
    """Append a row-unique fixed_size_binary(16) column: an 8-byte random
    per-batch nonce + an 8-byte local row index — no coordination, no
    driver round-trip. Tracks left-row identity (bag multiplicity) through
    a conditional left join's matched/unmatched split.

    The tagged dataset is MATERIALIZED (object store, spillable — not the
    driver): both the join branch and the anti probe consume it, and a lazy
    Dataset re-executes the tag map per consumer with fresh nonces, so the
    probe would never match. The table is the compact id-space solution
    set (fixed 16-byte columns), not raw data."""
    import numpy as np

    def tag(tb: pa.Table, _c=col) -> pa.Table:
        import os as _os

        n = tb.num_rows
        buf = np.empty((n, 16), dtype=np.uint8)
        buf[:, :8] = np.frombuffer(_os.urandom(8), dtype=np.uint8)
        buf[:, 8:] = np.frombuffer(
            np.arange(n, dtype="<u8").tobytes(), dtype=np.uint8
        ).reshape(n, 8)
        arr = pa.Array.from_buffers(
            ID_TYPE, n, [None, pa.py_buffer(buf.tobytes())]
        )
        return tb.append_column(_c, arr)

    return ds.map_batches(tag, batch_format="pyarrow").materialize()


def left_join_conditional(
    left, lvars: set[str], right, rvars: set[str], cond_filters,
    out_dir: str, *, num_buckets: int = 16,
    right_null_keys: tuple[str, ...] = (),
):
    """OpLeftJoin WITH an expression — LeftJoin(L, R, expr), the reference's
    conditional left join (OpLeftJoin.java; FILTER inside OPTIONAL is part
    of the join condition, not a post-filter): a left row pairs with a
    right row only where expr holds over the MERGED binding; left rows with
    no surviving pair emerge once, null-padded. Also covers the
    no-shared-variable shape (cross left join). Left rows carry a unique
    tag so bag multiplicity survives the matched/unmatched split; every
    step is a bucketed Dataset join — nothing materializes on the driver.

    ``right_null_keys``: shared keys that may be UNBOUND on the right —
    SPARQL compatibility (§18.3 compatible mappings) lets an unbound
    right var match any left value and adopt it, which a hash join
    cannot express. The right side splits by the null-mask of those keys
    into 2^k branches — each an equi-join on its non-null key subset
    with the null columns dropped (the LEFT side supplies them in the
    merge) — whose pair sets union before the single anti probe decides
    which left rows emerge null-padded."""
    import itertools

    import pyarrow.compute as pc

    shared = sorted(lvars & rvars)
    lt = _tag_unique(left)
    ltvars = lvars | {"__lid"}
    out_order = sorted(ltvars | rvars)
    branches = []
    for mask in itertools.product((False, True),
                                  repeat=len(right_null_keys or ())):
        null_set = {v for v, isn in zip(right_null_keys, mask) if isn}

        def rsplit(tb: pa.Table, _ns=tuple(sorted(null_set)),
                   _nn=tuple(v for v in (right_null_keys or ())
                             if v not in null_set)) -> pa.Table:
            m = None
            for v in _ns:
                mm = pc.is_null(tb.column(v))
                m = mm if m is None else pc.and_(m, mm)
            for v in _nn:
                mm = pc.is_valid(tb.column(v))
                m = mm if m is None else pc.and_(m, mm)
            if m is not None:
                tb = tb.filter(m)
            return tb.drop_columns(list(_ns)) if _ns else tb

        r = (right.map_batches(rsplit, batch_format="pyarrow")
             if right_null_keys else right)
        rv = set(rvars) - null_set
        keys = sorted(set(shared) - null_set)
        if keys:
            jb = binding_join(lt, ltvars, r, rv, keys,
                              num_buckets=num_buckets)
        else:
            jb = _cross_join(lt, ltvars, r, rv)
        # null-branch pairs carry the dropped keys from the LEFT columns
        # already (null_set ⊆ shared ⊆ lvars); normalize column order so
        # the branch union schemas agree
        jb = jb.map_batches(
            lambda tb, _o=tuple(out_order): tb.select(list(_o)),
            batch_format="pyarrow",
        )
        branches.append(jb)
    j = branches[0] if len(branches) == 1 else branches[0].union(
        *branches[1:]
    )
    if cond_filters:
        j = _apply_filters(j, lvars | rvars, cond_filters, out_dir)
    # unmatched left rows: anti probe on the tag, then null-pad right vars
    unmatched = _semi_anti_join(
        lt, ltvars, j, ["__lid"], keep_matched=False,
        num_buckets=num_buckets,
    )
    pad_cols = sorted(set(rvars) - set(lvars))
    all_cols = sorted(lvars | rvars)

    def pad(tb: pa.Table, _p=tuple(pad_cols), _a=tuple(all_cols)) -> pa.Table:
        for c in _p:
            tb = tb.append_column(c, pa.nulls(tb.num_rows, type=ID_TYPE))
        return tb.select(list(_a))

    def strip(tb: pa.Table, _a=tuple(all_cols)) -> pa.Table:
        return tb.select(list(_a))

    return j.map_batches(strip, batch_format="pyarrow").union(
        unmatched.map_batches(pad, batch_format="pyarrow")
    )


def _left_tree_ids(
    out_dir: str,
    patterns: list[Pattern],
    blocks: list,
    info: dict,
    *,
    num_partitions: int,
    stats,
    base: tuple | None = None,
):
    """Recursive left-join tree in id space. ``blocks`` entries are
    ``(patterns, filters, subblocks)`` — one per OPTIONAL, nested to any
    depth (OPTIONAL { P OPTIONAL { Q } FILTER(e) } is
    LeftJoin(·, LeftJoin(P, Q), e) per the algebra — the block's OWN
    filters are the join CONDITION of the join that attaches it, NOT a
    post-filter of the block). Returns (Dataset | None-for-unit, bound
    vars, maybe-null vars). ``base`` pre-seeds the left side with an
    already-built id table (a Join(BGP, Union) — see _join_union_ids)
    instead of executing ``patterns``. Joins over possibly-unbound keys
    take the 2^k compatibility split on whichever side may be null."""
    if base is not None:
        res, res_vars, maybe_null = base[0], set(base[1]), set(base[2])
    else:
        res, res_vars = _execute_bgp_ids(
            out_dir, patterns, info, num_partitions=num_partitions,
            stats=stats,
        )
        maybe_null = set()
    if res is None:
        import ray.data as rd

        # the unit table: one solution binding nothing; the carrier
        # column is never selected by any downstream stage
        res = rd.from_arrow(pa.table({"__unit": pa.array([0])}))
        res_vars = set()
    for opt_pats, opt_filters, opt_sub in blocks:
        if not opt_pats and not opt_sub:
            # OPTIONAL { } — LeftJoin with the unit table: every left row
            # matches the unit solution; a no-op
            if opt_filters:
                raise ValueError(
                    "OPTIONAL { FILTER } without patterns is unsupported"
                )
            continue
        opt, opt_vars, opt_null = _left_tree_ids(
            out_dir, opt_pats, opt_sub, info,
            num_partitions=num_partitions, stats=stats,
        )
        shared = sorted(res_vars & opt_vars)
        left_nullable = [v for v in shared if v in maybe_null]
        right_nullable = [v for v in shared if v in opt_null]
        if len(left_nullable) > 3 or len(right_nullable) > 3:
            raise ValueError(
                f"too many possibly-unbound join keys (2^k branch union): "
                f"{left_nullable or right_nullable}"
            )
        bf = list(opt_filters or [])
        # condition filters referencing only never-null block vars are
        # equivalent pre-filters on the block side (cheaper: filter before
        # the join, plain left_outer after)
        solid = opt_vars - opt_null
        pre = [f for f in bf if _filter_vars(f) <= solid]
        cond = [f for f in bf if not _filter_vars(f) <= solid]
        for f in cond:
            missing = _filter_vars(f) - (res_vars | opt_vars)
            if missing:
                raise ValueError(
                    f"OPTIONAL filter references unbound vars "
                    f"{sorted(missing)}"
                )
        if pre:
            opt = _apply_filters(opt, opt_vars, pre, out_dir)
        if left_nullable:
            # SPARQL compatibility over possibly-unbound LEFT keys: an
            # unbound var matches anything and adopts the block's binding
            # (SPARQL 1.1 §18.3 compatible mappings; ARQ's
            # QueryIterLeftJoin evaluates per-row). Hash joins can't match
            # null keys, so split the left by the null-mask of the
            # nullable keys — 2^k branches, each a plain join on its
            # non-null key subset with the null columns dropped (the
            # block side supplies them in the merge) — and union.
            import itertools

            import pyarrow.compute as pc

            branches = []
            for mask in itertools.product(
                (False, True), repeat=len(left_nullable)
            ):
                null_set = {
                    v for v, isn in zip(left_nullable, mask) if isn
                }

                def split(
                    tb: pa.Table,
                    _ns=tuple(sorted(null_set)),
                    _nn=tuple(v for v in left_nullable if v not in null_set),
                ) -> pa.Table:
                    m = None
                    for v in _ns:
                        mm = pc.is_null(tb.column(v))
                        m = mm if m is None else pc.and_(m, mm)
                    for v in _nn:
                        mm = pc.is_valid(tb.column(v))
                        m = mm if m is None else pc.and_(m, mm)
                    tb = tb.filter(m)
                    return tb.drop_columns(list(_ns))

                lm = res.map_batches(split, batch_format="pyarrow")
                lv = res_vars - null_set
                sh = sorted(lv & opt_vars)
                rnk = tuple(v for v in right_nullable if v in sh)
                if cond or not sh or rnk:
                    bres = left_join_conditional(
                        lm, lv, opt, opt_vars, cond, out_dir,
                        num_buckets=num_partitions, right_null_keys=rnk,
                    )
                else:
                    bres = binding_join(
                        lm, lv, opt, opt_vars, sh,
                        how="left_outer", num_buckets=num_partitions,
                    )
                branches.append(bres)
            res = branches[0].union(*branches[1:])
        elif cond or not shared or right_nullable:
            res = left_join_conditional(
                res, res_vars, opt, opt_vars, cond, out_dir,
                num_buckets=num_partitions,
                right_null_keys=tuple(right_nullable),
            )
        else:
            res = binding_join(
                res, res_vars, opt, opt_vars, shared,
                how="left_outer", num_buckets=num_partitions,
            )
        maybe_null |= opt_vars - res_vars
        res_vars = res_vars | opt_vars
    return res, res_vars, maybe_null


def bgp_optionals(
    out_dir: str,
    patterns: list[Pattern],
    blocks: list,
    select: list[str],
    *,
    num_partitions: int = 16,
    distinct: bool = True,
    stats: dict | None | bool = None,
    filters: list[tuple] | None = None,
    union_branches: list | None = None,
    branch_filters: list | None = None,
):
    """A required BGP followed by OPTIONAL blocks — chained OpLeftJoins
    (AlgebraGenerator folds each OPTIONAL into LeftJoin(left-so-far,
    block, exprs)). ``blocks`` entries are ``(patterns, filters,
    subblocks)``; see :func:`_left_tree_ids` for the nesting and
    join-condition semantics. ``union_branches`` (with
    ``branch_filters``) makes the left side Join(BGP, Union) — a group
    holding patterns, a UNION block AND OPTIONALs."""
    info = read_layout(out_dir)
    base = None
    if union_branches is not None:
        base = _join_union_ids(
            out_dir, patterns, union_branches, branch_filters, info,
            num_partitions=num_partitions, stats=stats,
        )
    res, res_vars, _ = _left_tree_ids(
        out_dir, patterns, blocks, info,
        num_partitions=num_partitions, stats=stats, base=base,
    )
    if filters:
        # group filter scope: after all left joins, optional vars null
        # where unmatched (!bound(?x) expresses negation)
        res = _apply_filters(res, res_vars, filters, out_dir)
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
    filters: list[tuple] | None = None,
):
    """OPTIONAL — OpLeftJoin over two BGPs (QueryIterHashLeftJoin_Left
    semantics, engine/join/): the required BGP's bindings survive whether or
    not the optional BGP matches; optional-only variables are null where it
    does not. Single plain-block shorthand for :func:`bgp_optionals`."""
    return bgp_optionals(
        out_dir, patterns, [(optional, None, [])], select,
        num_partitions=num_partitions, distinct=distinct, stats=stats,
        filters=filters,
    )


def values_bindings(rows: list[dict[str, str]]):
    """VALUES (OpTable / inline data — sparql/algebra/op/OpTable.java):
    literal binding rows become an id-space Dataset joined into the BGP
    chain like any pattern result. Keys are variable names ('?' optional);
    values are concrete terms in canonical N-Triples form. UNDEF is not
    supported (every row must bind every listed variable — an UNDEF key
    would need null-compatible join semantics)."""
    import ray.data as rd

    if not rows:
        raise ValueError("VALUES needs at least one row")
    vars_ = sorted({k.lstrip("?") for k in rows[0]})
    cols: dict[str, list[int]] = {v: [] for v in vars_}
    for r in rows:
        got = {k.lstrip("?"): t for k, t in r.items()}
        if sorted(got) != vars_:
            raise ValueError(f"VALUES row binds {sorted(got)}, expected {vars_}")
        for v in vars_:
            cols[v].append(term_id(got[v]))
    tbl = pa.table({v: pa.array(cols[v], type=ID_TYPE) for v in vars_})
    return rd.from_arrow(tbl), set(vars_)


def bgp_construct(
    out_dir: str,
    patterns: list[Pattern],
    template: list[tuple[str, str, str]],
    *,
    num_partitions: int = 16,
    filters: list[tuple] | None = None,
    stats: dict | None | bool = None,
    pf_context: dict | None = None,
):
    """CONSTRUCT — execute the WHERE BGP, then instantiate the template
    triples per solution (TemplateLib.subst over the binding stream —
    jena-arq sparql/syntax/Template.java / modify/TemplateLib.java).
    Returns a distinct (subj, pred, obj) Dataset of canonical term strings.
    Solutions binding a template variable to null never occur here (plain
    BGP solutions are total); template slots may be variables or concrete
    terms. Template entries may also be QUADS — 4-tuples (graph, s, p, o)
    from ARQ's ``CONSTRUCT { GRAPH g { ... } }`` extension (arq.jj
    ConstructTemplate quads branch, TemplateLib.calcQuads) — in which case
    the result carries a leading ``graph`` column with default-graph rows
    tagged ``<urn:x-arq:DefaultGraph>`` (Quad.java:37); solutions binding
    a graph variable to a literal are dropped (TemplateLib quad-validity
    check)."""
    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.stages.materialize import resolve_id_columns

    info = read_layout(out_dir)
    DG = "<urn:x-arq:DefaultGraph>"
    # both reserved names address the default graph (Quad.java:37,42
    # defaultGraphIRI / defaultGraphNodeGenerated): a GRAPH block naming
    # them emits plain default-graph triples
    _DGS = (DG, "<urn:x-arq:DefaultGraphNode>")
    template = [trip[1:] if len(trip) == 4 and trip[0] in _DGS else trip
                for trip in template]
    has_quads = any(len(trip) == 4 for trip in template)
    if has_quads:
        template = [trip if len(trip) == 4 else (DG, *trip)
                    for trip in template]
    out_names = ("graph", "subj", "pred", "obj") if has_quads else (
        "subj", "pred", "obj")

    tvars = sorted({t[1:] for trip in template for t in trip if is_var(t)})
    if not tvars:
        # fully-ground template: TemplateLib.subst is constant per
        # solution, so the result is the template itself iff the WHERE
        # matches at least one solution (an empty WHERE group is one
        # empty solution — Construct Quad: Syntax 3)
        if any(t.startswith("_:") for trip in template for t in trip):
            raise ValueError(
                "bnode template slots need at least one template variable "
                "(fresh labels are allocated per distinct solution)"
            )
        pvars = {t for p in patterns for t in p if is_var(t)}
        if not patterns and not filters:
            holds = True
        elif not pvars:
            if filters:
                raise ValueError("FILTER over a fully ground WHERE")
            holds = all(
                len(
                    bgp_execute(
                        out_dir, [("?__g0", p, o)], ["__g0"],
                        filters=[("=", "?__g0", s)],
                        num_partitions=num_partitions, stats=False,
                    ).limit(1).take(1)
                ) > 0
                for s, p, o in patterns
            )
        else:
            sols, sol_vars = _execute_bgp_ids(
                out_dir, patterns, info,
                num_partitions=num_partitions, stats=stats,
                pf_context=pf_context,
            )
            if filters:
                sols = _apply_filters(sols, sol_vars, filters, out_dir)
            holds = len(sols.limit(1).take(1)) > 0
        import ray.data as rd

        trips = sorted(set(template)) if holds else []
        return rd.from_arrow(pa.table({
            name: pa.array([t[i] for t in trips], type=pa.string())
            for i, name in enumerate(out_names)
        }))

    res, res_vars = _execute_bgp_ids(
        out_dir, patterns, info, num_partitions=num_partitions, stats=stats,
        pf_context=pf_context,
    )
    if filters:
        res = _apply_filters(res, res_vars, filters, out_dir)

    missing = {v for v in tvars if v not in res_vars}
    if missing:
        # a template variable no WHERE solution can bind leaves its
        # entries uninstantiated for EVERY solution (TemplateLib.subst
        # null-skip — ARQ "Construct Quad: Syntax 2" expects the empty
        # dataset), so those entries drop; ground entries survive
        import ray.data as rd

        template = [
            trip for trip in template
            if all(not is_var(t) or t[1:] not in missing for t in trip)
        ]
        tvars = [v for v in tvars if v not in missing]
        if not template:
            return rd.from_arrow(pa.table(
                {n: pa.array([], type=pa.string()) for n in out_names}
            ))
        if not tvars:
            # only ground entries remain: they apply once iff the WHERE
            # has at least one solution
            holds = len(res.limit(1).take(1)) > 0
            trips = sorted(set(template)) if holds else []
            return rd.from_arrow(pa.table({
                name: pa.array([t[i] for t in trips], type=pa.string())
                for i, name in enumerate(out_names)
            }))
    has_bnodes = any(
        isinstance(t, str) and t.startswith("_:")
        for trip in template for t in trip
    )
    if has_bnodes and not tvars:
        raise ValueError(
            "bnode template slots need at least one template variable "
            "(fresh labels are allocated per distinct solution)"
        )

    def proj(tb: pa.Table, _v=tuple(tvars)) -> pa.Table:
        return tb.select(list(_v))

    res = res.map_batches(proj, batch_format="pyarrow")
    res = dedup_exact(res, cols=tuple(tvars), coalesce=True)
    res = resolve_id_columns(res, out_dir, {v: v for v in tvars})
    return construct_instantiate(res, template, tvars=tvars)


def construct_instantiate(res, template, *, tvars: list[str] | None = None):
    """Instantiate CONSTRUCT template entries over a TERM-space solution
    table — a Dataset (or Arrow Table / pandas frame) whose columns are
    canonical term strings named by variable. TemplateLib.subst semantics:
    a solution leaving a template variable UNBOUND (null — OPTIONAL/UNION
    WHERE shapes) skips just the template entries using it; an
    instantiation whose subject is a literal, predicate a non-IRI, or
    graph a literal is an invalid triple and is skipped. Template entries
    may be 3-tuples or (graph, s, p, o) quads. Returns a distinct
    Dataset."""
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact

    if not isinstance(res, rd.Dataset):
        if hasattr(res, "to_pandas") and not isinstance(res, pa.Table):
            res = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
        elif not isinstance(res, pa.Table):
            res = pa.Table.from_pandas(res, preserve_index=False)
        res = rd.from_arrow(res)

    DG = "<urn:x-arq:DefaultGraph>"
    _DGS = (DG, "<urn:x-arq:DefaultGraphNode>")
    template = [trip[1:] if len(trip) == 4 and trip[0] in _DGS else trip
                for trip in template]
    has_quads = any(len(trip) == 4 for trip in template)
    if has_quads:
        template = [trip if len(trip) == 4 else (DG, *trip)
                    for trip in template]
    out_names = ("graph", "subj", "pred", "obj") if has_quads else (
        "subj", "pred", "obj")
    if tvars is None:
        tvars = sorted({t[1:] for trip in template for t in trip
                        if is_var(t)})

    outs = []
    for trip in template:

        def emit(tb: pa.Table, _t=tuple(trip), _tv=tuple(tvars),
                 _names=out_names) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            from jena_ray.functions.hashing import (
                hash_string_array,
                splitmix64,
            )
            from jena_ray.stages.dedup import _key_hash

            # null-skip: a solution that leaves any of THIS entry's
            # variables unbound instantiates nothing for it
            used = [s[1:] for s in _t if is_var(s)]
            if used:
                keep = pc.is_valid(tb.column(used[0]))
                for v in used[1:]:
                    keep = pc.and_(keep, pc.is_valid(tb.column(v)))
                tb = tb.filter(keep)
            n = tb.num_rows
            cols = {}
            row_h = None
            for slot, name in zip(_t, _names):
                if is_var(slot):
                    cols[name] = pc.cast(tb.column(slot[1:]), pa.string())
                elif slot.startswith("_:"):
                    # fresh bnode PER SOLUTION (Template.java remaps
                    # template bnodes per binding): skolemize with the
                    # solution row's content hash — deterministic, and the
                    # same label in two template slots of one solution
                    # yields the same node
                    if row_h is None:
                        row_h = _key_hash(tb.select(list(_tv)), list(_tv))
                    lbl_h = hash_string_array(pa.array([slot]))[0]
                    h = splitmix64(row_h ^ np.uint64(lbl_h))
                    hexes = h.astype(">u8").tobytes().hex()
                    cols[name] = pa.array(
                        ["_:c" + hexes[i * 16:(i + 1) * 16] for i in range(n)],
                        type=pa.string(),
                    )
                else:
                    cols[name] = pa.array([slot] * n, type=pa.string())
            out = pa.table(cols)
            # invalid-instantiation skip (TemplateLib quad/triple checks):
            # literal subject, non-IRI predicate, literal graph
            mask = None
            for slot, name in zip(_t, _names):
                if not is_var(slot):
                    continue
                c = out.column(name)
                if name in ("subj", "graph"):
                    m = pc.or_(pc.starts_with(c, "<"),
                               pc.starts_with(c, "_:"))
                elif name == "pred":
                    m = pc.and_(pc.starts_with(c, "<"),
                                pc.invert(pc.starts_with(c, "<<")))
                else:
                    continue
                mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                out = out.filter(pc.fill_null(mask, False))
            return out

        outs.append(res.map_batches(emit, batch_format="pyarrow"))
    u = outs[0] if len(outs) == 1 else outs[0].union(*outs[1:])
    return dedup_exact(u, cols=out_names, coalesce=True)


def path_closure(
    out_dir: str,
    pred: str,
    source: str,
    *,
    max_iters: int = 25,
    num_partitions: int = 16,
    var: str = "y",
    inverse: bool = False,
):
    """Property path ``source (pred)+ ?y`` — P_OneOrMore transitive closure
    (jena-arq sparql/path/P_OneOrMore1 evaluated by PathEngine's BFS with a
    visited set). Semi-naive BFS in id space: each hop probes the
    distributed edge scan with a broadcast frontier (one vectorized
    ``is_in`` filter per block — no shuffle per hop), and the frontier /
    visited sets live on the DRIVER as id-byte sets, exactly because the
    closure of one source node is tiny next to the corpus (the reference's
    PathEngine holds its visited set in the query engine for the same
    reason). The loop runs at most graph diameter ≤ max_iters hops.
    ``inverse=True`` walks edges backwards (P_Inverse under the closure:
    ``source ^pred+ ?y``). Returns a Dataset with one term-string column
    ``var``."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.stages.materialize import resolve_id_columns

    info = read_layout(out_dir)
    # one distributed scan, reused every hop (block list is cached by Ray)
    edges = _scan_pattern(out_dir, ("?x", pred, "?y"), info).materialize()

    probe_col, out_col = ("y", "x") if inverse else ("x", "y")
    # frontier/visited are Arrow fixed-size-binary arrays, NOT Python sets:
    # 16 bytes per node, set algebra via vectorized is_in — the driver only
    # ever runs pc kernels, never a per-element loop, so a hub predicate
    # with a million-node frontier stays a few-ms unique+filter
    frontier = pa.array([term_id(source)], type=ID_TYPE)
    visited = pa.array([], type=ID_TYPE)
    for _ in range(max_iters):

        def hop(tb: pa.Table, _p=frontier) -> pa.Table:
            keep = pc.is_in(tb.column(probe_col), value_set=_p)
            ys = pc.unique(tb.filter(keep).column(out_col))
            # per-block dedup before anything crosses to the driver
            return pa.table({"y": ys})

        chunks = [
            c
            for b in edges.map_batches(hop, batch_format="pyarrow")
                          .iter_batches(batch_format="pyarrow")
            if b.num_rows
            for c in b.column("y").chunks
        ]
        if not chunks:
            break
        level = pc.unique(pa.chunked_array(chunks))
        frontier = level.filter(
            pc.invert(pc.is_in(level, value_set=visited))
        )
        if len(frontier) == 0:
            break
        visited = pa.concat_arrays([visited, frontier])
    else:
        raise RuntimeError(f"path closure did not converge in {max_iters} hops")

    if len(visited) == 0:
        return rd.from_arrow(pa.table({var: pa.array([], type=pa.string())}))
    ids = rd.from_arrow(pa.table({"y": visited}))
    return resolve_id_columns(ids, out_dir, {"y": var})


# driver-held (root, node) pair budget for path_closure_pairs: below this
# the frontier is pandas on the driver (fast path, same contract as the
# reference PathEngine's in-engine visited set); beyond it the BFS moves to
# Dataset semi-join hops so no driver structure scales with the closure
PATH_PAIR_SPILL = 2_000_000


def path_closure_pairs(
    out_dir: str,
    pred,
    sources: list[str],
    *,
    max_iters: int = 25,
    inverse: bool = False,
    one_step: bool = False,
    pair_spill: int | None = None,
):
    """(src, y) TERM pairs — y reachable from src via >=1 ``pred`` step
    (multi-root P_OneOrMore: PathEngine's per-binding BFS batched over all
    roots at once). Returns a ray Dataset with string columns (src, y).

    Adaptive frontier (round-4): one distributed edge scan reused per hop.
    While the discovered pair set is under ``pair_spill`` it lives on the
    DRIVER (vectorized pandas merges — closure-sized, the common case);
    the moment a hop would exceed the budget the BFS switches to
    Dataset-resident hops (bucketed join + anti-join per hop,
    _path_pairs_ds_loop), so a hub predicate x many roots cannot blow the
    driver. ``one_step=True`` stops after one hop (P_ZeroOrOne's non-zero
    leg). Zero-length pairs are the CALLER's to add."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.stages.materialize import resolve_id_columns

    if pair_spill is None:
        pair_spill = PATH_PAIR_SPILL  # read at call time (testable)
    info = read_layout(out_dir)
    edges = _scan_pattern(out_dir, ("?x", pred, "?y"), info).materialize()
    probe_col, out_col = ("y", "x") if inverse else ("x", "y")

    def _resolve(ids_ds):
        res = resolve_id_columns(ids_ds, out_dir, {"root": "src", "node": "y"})

        def proj(tb: pa.Table) -> pa.Table:
            return tb.select(["src", "y"])

        return res.map_batches(proj, batch_format="pyarrow")

    if not isinstance(sources, (list, tuple)):
        # sources as a Dataset (one string column "src"): huge root sets
        # (hub predicates) never materialize on the driver — the BFS runs
        # in Dataset mode from hop zero. Small root sets fall through to
        # the driver fast path.
        roots_ds = sources.materialize()
        if roots_ds.count() > pair_spill // 4:
            from jena_ray.stages.dedup import dedup_exact as _dedup
            from jena_ray.stages.materialize import term_id_array

            def to_pairs(tb: pa.Table) -> pa.Table:
                ids = term_id_array(tb.column("src"))
                return pa.table({"root": ids, "node": ids})

            f0 = _dedup(
                roots_ds.map_batches(to_pairs, batch_format="pyarrow"),
                cols=("root", "node"),
            )
            # visited starts EMPTY (discovered pairs only — the zero-hop
            # self pairs are frontier bootstrap, and a genuine cycle back
            # to a root must still be discoverable as a result pair)
            empty = rd.from_arrow(pa.table({
                "root": pa.array([], type=ID_TYPE),
                "node": pa.array([], type=ID_TYPE),
            }))
            ids_ds = _path_pairs_ds_loop(
                edges, probe_col, out_col, empty, f0, max_iters,
                one_step=one_step,
            )
            return _resolve(ids_ds)
        sources = [
            v
            for b in roots_ds.iter_batches(batch_format="pyarrow")
            for v in b.column("src").to_pylist()
            if v is not None
        ]

    src_ids = pd.Series([term_id(s) for s in sources]).drop_duplicates()
    frontier = pd.DataFrame({"root": src_ids, "node": src_ids})
    pairs = pd.DataFrame({"root": [], "node": []})
    for it in range(max_iters):
        nodes = pa.array(frontier["node"].unique().tolist(), type=ID_TYPE)

        def hop(tb: pa.Table, _n=nodes) -> pa.Table:
            keep = pc.is_in(tb.column(probe_col), value_set=_n)
            m = tb.filter(keep)
            return pa.table({"a": m.column(probe_col),
                             "b": m.column(out_col)})

        chunks = [
            b.to_pandas()
            for b in edges.map_batches(hop, batch_format="pyarrow")
                          .iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        if not chunks:
            break
        matched = pd.concat(chunks).drop_duplicates()
        new = (
            frontier.merge(matched, left_on="node", right_on="a")
            [["root", "b"]].rename(columns={"b": "node"}).drop_duplicates()
        )
        if len(pairs):
            new = new.merge(pairs, how="left", indicator=True,
                            on=["root", "node"])
            new = new[new["_merge"] == "left_only"][["root", "node"]]
        if not len(new):
            break
        if len(pairs) + len(new) > pair_spill and not one_step:
            import ray.data as rd2

            def pairs_tbl(df) -> pa.Table:
                return pa.table({
                    "root": pa.array(df["root"].tolist(), type=ID_TYPE),
                    "node": pa.array(df["node"].tolist(), type=ID_TYPE),
                })

            vis0 = rd2.from_arrow(pairs_tbl(
                pd.concat([pairs, new], ignore_index=True)))
            ids_ds = _path_pairs_ds_loop(
                edges, probe_col, out_col, vis0,
                rd2.from_arrow(pairs_tbl(new)), max_iters - it,
            )
            return _resolve(ids_ds)
        pairs = pd.concat([pairs, new], ignore_index=True)
        frontier = new
        if one_step:
            break
    else:
        raise RuntimeError(f"path closure did not converge in {max_iters} hops")

    if not len(pairs):
        e = pa.array([], type=pa.string())
        return rd.from_arrow(pa.table({"src": e, "y": e}))
    ids = rd.from_arrow(pa.table({
        "root": pa.array(pairs["root"].tolist(), type=ID_TYPE),
        "node": pa.array(pairs["node"].tolist(), type=ID_TYPE),
    }))
    return _resolve(ids)


def _path_pairs_ds_loop(edges, probe_col: str, out_col: str,
                        visited, frontier, iters_left: int,
                        one_step: bool = False):
    """Dataset-resident BFS hops for path_closure_pairs past the driver
    budget: per hop, frontier joins edges (bucketed binding_join), shift
    to (root, next), global dedup, anti-join against the visited pair set
    — everything object-store resident; the driver tracks COUNTS only.
    ``visited``/``frontier`` are (root, node) id-pair Datasets with
    frontier a subset of visited. Returns the visited Dataset."""
    from jena_ray.stages.dedup import dedup_exact

    visited = visited.materialize()
    frontier = frontier.materialize()

    def eview(tb: pa.Table) -> pa.Table:
        return pa.table({"node": tb.column(probe_col),
                         "nxt": tb.column(out_col)})

    edges_ds = edges.map_batches(eview, batch_format="pyarrow").materialize()

    for _ in range(iters_left):
        stepped = binding_join(
            frontier, {"root", "node"}, edges_ds, {"node", "nxt"},
            ["node"], num_buckets=16,
        )

        def shift(tb: pa.Table) -> pa.Table:
            return pa.table({"root": tb.column("root"),
                             "node": tb.column("nxt")})

        new = dedup_exact(
            stepped.map_batches(shift, batch_format="pyarrow"),
            cols=("root", "node"),
        )
        new = binding_join(
            new, {"root", "node"}, visited, {"root", "node"},
            ["root", "node"], how="left_anti", num_buckets=16,
        ).materialize()
        if new.count() == 0:
            return visited
        visited = visited.union(new).materialize()
        frontier = new
        if one_step:
            return visited
    raise RuntimeError(
        f"path closure did not converge in {iters_left} dataset hops"
    )


def kg_text_index_dir(sf_dir: str) -> str:
    """text:query side-car for the KG tier: an inverted index whose doc key
    is ``term_id(<doc IRI>)`` — the same id space as the triple
    indexes, so text:query bindings join the BGP chain with no resolve
    (jena-text builds its Lucene index next to the TDB dataset the same
    way: TextDatasetFactory wires index and graph into one dataset).
    Built once per tier under /tmp and reused."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.stages.materialize import term_id_array
    from jena_ray.stages.textindex import build_text_index

    base = os.path.join(
        "/tmp/jena_ray_textpf", os.path.basename(os.path.normpath(sf_dir))
    )

    def keyed(tb: pa.Table) -> pa.Table:
        iris = pc.binary_join_element_wise(
            "<http://",
            pc.cast(tb.column("source"), pa.string()),
            ".example.org/doc/",
            pc.cast(tb.column("doc_id"), pa.string()),
            ">",
            "",
        )
        return pa.table(
            {
                "doc_id": pa.array(term_id_array(iris)),
                "text": tb.column("text"),
            }
        )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "text"]
    ).map_batches(keyed, batch_format="pyarrow")
    build_text_index(docs, base)
    return base


def kg_index_dir(sf_dir: str, *, num_shards: int = 4) -> str:
    """Materialized KG index for a tier, built once under /tmp and reused
    (lineage manifests + _layout.json make the build idempotent: a completed
    build is detected and skipped, a partial one resumes)."""
    base = os.path.join(
        "/tmp/jena_ray_idx", os.path.basename(os.path.normpath(sf_dir))
    )
    from jena_ray.stages.materialize import stale_id_layout
    from jena_ray.state import manifest as M

    if os.path.exists(os.path.join(base, "_layout.json")) and stale_id_layout(
        base, "spo", "s_id"
    ):
        # cache written before the 128-bit id migration: wipe + rebuild
        import shutil

        shutil.rmtree(base, ignore_errors=True)
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
