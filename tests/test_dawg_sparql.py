"""DAWG SPARQL conformance — the reference's own evaluation suites
(jena-arq/testing/DAWG-Final, run by arq/junit/runners/RunnerSPARQL.java)
driven over OUR front-end: manifest.ttl parsed with the engine's Turtle
parser, each QueryEvaluationTest's data loaded into a materialized index,
the .rq executed by jena_ray.sparql, and results compared against the .srx
(bindings with blank-node bijection, mirroring ResultSetCompare) or the
expected .ttl graph (isomorphism) for CONSTRUCT.

Queries outside the documented SPARQL subset are SKIPPED (counted); every
query the parser ACCEPTS must evaluate to the expected results, and each
suite asserts a minimum accepted count so the run can't go vacuous.
"""

from __future__ import annotations

import os
from collections import defaultdict

import pytest

from jena_ray.resultset import parse_srj, parse_srx
from jena_ray.sparql import SparqlSyntaxError, parse_query, sparql_query
from jena_ray.turtle import parse_turtle

DAWG = "/root/reference/jena-arq/testing/DAWG-Final"
ARQ = "/root/reference/jena-arq/testing/ARQ"

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
# ARQ's own manifest test type (arq/junit/manifest vocabulary)
MFX = "http://jena.hpl.hp.com/2005/05/test-manifest-extra#"

# (suite, local test name) entries whose query parses but whose semantics
# are outside the engine subset; each line says why.
SKIP: dict[tuple[str, str], str] = {
    # round-4: algebra/filter-nested-2, both join-scope-1 copies, and
    # i18n/normalization-2 now execute (faithful nested-group scoping —
    # Parser._resolve_nested; absolute-IRI dot-segment normalization in
    # the query parser)
    ("optional-filter", "dawg-optional-filter-005-simplified"):
    "mutually exclusive with 005-not-simplified (same query+data, the two "
    "readings of nested-group filter scope); the engine implements ARQ's "
    "scope-then-simplify reading — the reference manifest also comments "
    "this entry out of its run list",
}

# minimum number of accepted (executed) tests per suite — the vacuity guard
# (raised to the round-3 measured acceptance; a regression that turns an
# executed test back into a skip trips the floor)
SUITES: dict[str, int] = {
    "basic": 25,      # term-6/term-7 retired from the manifest run list
    "triple-match": 4,
    "distinct": 11,
    "sort": 13,
    "bound": 1,
    "regex": 4,
    "optional": 5,
    "construct": 5,
    "ask": 4,
    "expr-equals": 12,
    "bnode-coreference": 1,
    "algebra": 14,  # round-4: filter-nested-2 + join-scope-1 now execute
    "reduced": 2,
    "i18n": 4,  # round-4: normalization-2 now executes
    "expr-builtin": 22,  # dawg-datatype-2 retired (RDF 1.1 langString)
    "solution-seq": 13,
    "optional-filter": 5,
    "open-world": 18,
    "expr-ops": 7,
    "boolean-effective-value": 7,
    "cast": 7,
    "type-promotion": 30,
    "graph": 12,
    "dataset": 15,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DAWG), reason="reference DAWG suites not present"
)


def _load_manifest(suite: str, root: str = DAWG):
    mdir = f"{root}/{suite}"
    text = open(f"{mdir}/manifest.ttl").read()
    triples = parse_turtle(text, base=f"file://{mdir}/")
    spo: dict[str, dict[str, list[str]]] = defaultdict(lambda: defaultdict(list))
    for s, p, o in triples:
        spo[s][p].append(o)

    # honor the manifest's mf:entries run list: suites retire tests by
    # dropping them from the collection while keeping the definition
    # triples (e.g. expr-builtin comments dawg-datatype-2 out after the
    # RDF 1.1 rdf:langString change)
    RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    members: set[str] | None = None
    roots = [x for p2 in spo.values() for x in p2.get(f"<{MF}entries>", [])]
    if roots:
        members = set()
        for node in roots:
            while node and node != f"<{RDFNS}nil>":
                np = spo.get(node, {})
                first = np.get(f"<{RDFNS}first>", [None])[0]
                if first is not None:
                    members.add(first)
                node = np.get(f"<{RDFNS}rest>", [None])[0]

    tests = []
    for s, props in spo.items():
        if members is not None and s not in members:
            continue
        types = props.get(RDF_TYPE, [])
        # DAWG marks eval tests mf:QueryEvaluationTest; ARQ manifests use
        # mfx:TestQuery or leave entries untyped (anything with an
        # action+result in the entries list is a query-eval test there)
        eval_typed = (
            f"<{MF}QueryEvaluationTest>" in types
            or f"<{MFX}TestQuery>" in types
            or (not types and root != DAWG)
        )
        if not eval_typed:
            continue
        action = props.get(f"<{MF}action>", [None])[0]
        result = props.get(f"<{MF}result>", [None])[0]
        if action is None or result is None:
            continue
        a = spo.get(action, {})
        query = a.get(f"<{QT}query>", [None])[0]
        data = sorted(a.get(f"<{QT}data>", []))
        graph_data = sorted(a.get(f"<{QT}graphData>", []))
        if query is None or not os.path.isfile(_path(query)):
            continue  # e.g. ARQ Distinct's broken <.rq> entry
        if s.startswith("<") and "#" in s:
            name = s.split("#")[-1].rstrip(">")
        else:
            # ARQ manifests use bnode entries: fall back to mf:name
            mf_name = props.get(f"<{MF}name>", [None])[0]
            if mf_name is not None and mf_name.startswith('"'):
                from jena_ray.term import split_literal

                name = split_literal(mf_name)[0]
            else:
                name = s
        lax = f"<{MF}LaxCardinality>" in props.get(
            f"<{MF}resultCardinality>", []
        )
        tests.append(
            {
                "name": name,
                "query": _path(query),
                "data": [_path(d) for d in data],
                "graph_data": [_path(gd) for gd in graph_data],
                "result": _path(result),
                "lax": lax,
            }
        )
    return tests


def _path(iri: str) -> str:
    assert iri.startswith("<file://"), iri
    return iri[len("<file://"):-1]


_INDEX_CACHE: dict[str, str] = {}


def _read_ttl(path: str, scope: str = "") -> list[tuple[str, str, str]]:
    """Parse one data document. ``scope`` isolates blank-node labels per
    document load (each graph of a dataset is its own document, so _:x in
    the default graph and _:x in a named graph are DIFFERENT nodes — the
    LabelToNode-per-parser-run discipline; dawg-graph-10/10b test it)."""
    if not path.endswith((".ttl", ".n3", ".nt")):
        # the DAWG/ARQ .n3 data files are all Turtle-compatible N3, and
        # N-Triples is a subset of Turtle
        pytest.skip(f"unsupported data format: {path}")
    rows = parse_turtle(open(path).read(), base=f"file://{path}")
    if not scope:
        return rows
    return [
        tuple(f"_:{scope}{t[2:]}" if t.startswith("_:") else t for t in r)
        for r in rows
    ]


def _index_for(data_paths: list[str] | str | None, tmp_factory,
               graph_data: list[str] | None = None) -> str:
    """Materialize (once per data file set) a tiny index for the test data:
    a plain triple store without named graphs, a full RDF-dataset store
    (default graph + GSPO quads sharing one NodeTable) when the manifest
    carries qt:graphData — each file becomes the named graph <file://...>,
    the RunnerSPARQL dataset construction. ``data_paths`` may be several
    qt:data documents (ARQ manifests merge them into the default graph;
    bnode labels are scoped per document)."""
    if isinstance(data_paths, str):
        data_paths = [data_paths]
    data_paths = data_paths or []
    key = ",".join(data_paths) + "|" + ",".join(graph_data or [])
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from jena_ray.stages.materialize import materialize_indexes
    from jena_ray.stages.quads import materialize_rdf_dataset

    out = str(tmp_factory.mktemp("dawgidx"))
    rows = []
    for i, dp in enumerate(data_paths):
        rows.extend(_read_ttl(dp, scope=f"d{i}x" if len(data_paths) > 1
                              else ""))
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows], type=pa.string()),
            "pred": pa.array([r[1] for r in rows], type=pa.string()),
            "obj": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    if graph_data:
        quads = []
        for i, gd in enumerate(graph_data):
            g = f"<file://{gd}>"
            quads.extend(
                (g, s, p, o) for s, p, o in _read_ttl(gd, scope=f"g{i}x")
            )
        qt = pa.table(
            {
                "graph": pa.array([q[0] for q in quads], type=pa.string()),
                "subj": pa.array([q[1] for q in quads], type=pa.string()),
                "pred": pa.array([q[2] for q in quads], type=pa.string()),
                "obj": pa.array([q[3] for q in quads], type=pa.string()),
            }
        )
        materialize_rdf_dataset(
            out, rd.from_arrow(t), rd.from_arrow(qt),
            num_buckets=2, min_rows_per_file=1000,
        )
    else:
        os.makedirs(f"{out}/triples")
        pq.write_table(t, f"{out}/triples/part0.parquet")
        materialize_indexes(out, num_buckets=2, min_rows_per_file=1000)
    _INDEX_CACHE[key] = out
    return out


def _rows_of(res) -> list[dict]:
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame) and res.shape[1] == 0:
        # zero-variable SELECT: n solutions each binding nothing (Arrow
        # cannot carry rows without columns, so the engine returns a
        # zero-column pandas frame whose LENGTH is the row count)
        return [{} for _ in range(len(res))]
    tb = res if isinstance(res, pa.Table) else pa.Table.from_pandas(
        res.to_pandas(), preserve_index=False
    )
    out = []
    for row in tb.to_pylist():
        out.append({k: v for k, v in row.items() if v is not None})
    return out


_NUM_DTS = tuple(
    f"<http://www.w3.org/2001/XMLSchema#{n}>"
    for n in ("integer", "decimal", "double", "float", "int", "long",
              "short", "byte", "nonNegativeInteger", "positiveInteger",
              "unsignedInt", "unsignedLong")
)


def _num_value(t) -> float | None:
    """Numeric value of a result cell: engine aggregates surface native
    numbers, expected .srx/.srj files carry typed literals — compare the
    two by VALUE (the reference's NodeValue/XSDFuncOp numeric promotion)."""
    if isinstance(t, bool):
        return None
    if isinstance(t, (int, float)):
        return float(t)
    if isinstance(t, str) and t.startswith('"'):
        pos = t.rfind('"^^')
        if pos > 0 and t[pos + 3:] in _NUM_DTS:
            try:
                return float(t[1:pos])
            except ValueError:
                return None
    return None


def _row_match(e: dict, g: dict, bmap: dict) -> dict | None:
    if set(e) != set(g):
        return None
    bm = dict(bmap)
    for v, t in e.items():
        gt = g[v]
        if not isinstance(t, str) or not isinstance(gt, str):
            ev, gv = _num_value(t), _num_value(gt)
            if ev is None or gv is None or ev != gv:
                return None
            continue
        if t.startswith("_:"):
            if t in bm:
                if bm[t] != gt:
                    return None
            else:
                if not gt.startswith("_:") or gt in bm.values():
                    return None
                bm[t] = gt
        elif t != gt:
            ev, gv = _num_value(t), _num_value(gt)
            if ev is None or gv is None or ev != gv:
                return None
    return bm


def _bag_equal(exp: list[dict], got: list[dict], bmap: dict) -> bool:
    """Multiset equality with a consistent bnode bijection (the
    ResultSetCompare.equalsByTerm + bnode-isomorphism discipline)."""
    if not exp:
        return not got
    e = exp[0]
    for j, g in enumerate(got):
        m = _row_match(e, g, bmap)
        if m is not None and _bag_equal(exp[1:], got[:j] + got[j + 1:], m):
            return True
    return False


def _ordered_equal(exp: list[dict], got: list[dict],
                   order_vars: list[str]) -> bool:
    """Ordered result comparison that treats rows TIED on every ORDER BY
    variable as interchangeable (SPARQL leaves tie order unspecified; the
    expected files pin Jena's stable-sort input order, which no other
    engine can reproduce). Consecutive expected rows with equal order-var
    values form a group; the got rows in those positions must bag-match
    the group under one global bnode bijection."""
    if len(exp) != len(got):
        return False
    gidx, last, k = [], object(), -1
    for e in exp:
        key = tuple(e.get(v) for v in order_vars)
        if key != last:
            k += 1
            last = key
        gidx.append(k)
    e2 = [dict(e, __grp=str(i)) for e, i in zip(exp, gidx)]
    g2 = [dict(g, __grp=str(i)) for g, i in zip(got, gidx)]
    return _bag_equal(e2, g2, {})


def _run_eval_suite(suite, floor, root, tmp_path_factory):
    tests = _load_manifest(suite, root)
    assert tests, f"no evaluation tests found in {suite}"
    accepted, failures, skipped = 0, [], 0
    for t in tests:
        qtext = open(t["query"]).read()
        if (suite, t["name"]) in SKIP:
            skipped += 1
            continue
        try:
            q = parse_query(qtext, base=f"file://{t['query']}")
        except SparqlSyntaxError:
            skipped += 1
            continue
        idx = _index_for(t["data"], tmp_path_factory, t.get("graph_data"))
        try:
            res = sparql_query(idx, q, num_partitions=2)
        except (SparqlSyntaxError, ValueError):
            skipped += 1  # parses but uses unsupported execution shapes
            continue
        ok = _check(t, q, res)
        if ok is None:
            skipped += 1  # expected-result format we cannot compare
            continue
        accepted += 1
        if not ok:
            failures.append(t["name"])
    assert not failures, f"{suite}: {failures} failed ({accepted} accepted)"
    assert accepted >= floor, (
        f"{suite}: only {accepted} accepted (floor {floor}, "
        f"{skipped} skipped)"
    )


@pytest.mark.parametrize("suite", sorted(SUITES))
def test_dawg_suite(suite, ray_session, tmp_path_factory):
    _run_eval_suite(suite, SUITES[suite], DAWG, tmp_path_factory)


# ARQ's own evaluation suites (testing/ARQ, run by manifest-arq.ttl →
# RunnerSPARQL with ARQ-extension syntax). Queries using ARQ-only syntax
# (LET, nested paths in groups, …) skip at parse; floors guard the rest.
ARQ_SUITES: dict[str, int] = {
    "Algebra": 13,  # round-4: join-scope-1 now executes
    "Ask": 8,
    "Assign": 8,
    "Basic": 5,
    "BasicPatterns": 72,
    "Bound": 1,
    "Construct": 19,
    "Dataset": 13,
    "Describe": 5,
    "Distinct": 19,
    "Expr": 4,
    "Expr1": 3,
    "Expr2": 6,
    "ExprBuiltIns": 18,
    "ExprDatatypes": 5,
    "ExprEquals": 9,
    "ExprRegex": 5,
    "Extra": 2,
    "Function": 19,
    "GroupBy": 33,
    "Negation": 8,
    "OpenWorld": 18,
    "OptFilterEquality": 13,
    "Optional": 10,
    "OrderBy": 10,
    "Paths": 12,
    "PropertyFunctions": 46,
    "Select": 6,
    "SelectExpr": 6,
    "SolutionSeq": 12,
    "Sort": 6,
    "SubQuery": 3,
    "TypePromotion": 30,
    "Union": 9,
    "ValueTesting": 15,
}


@pytest.mark.parametrize("suite", sorted(ARQ_SUITES))
def test_arq_suite(suite, ray_session, tmp_path_factory):
    _run_eval_suite(suite, ARQ_SUITES[suite], ARQ, tmp_path_factory)


RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"


def _parse_rs_graph(path: str) -> dict | None:
    """Expected results encoded as RDF with the DAWG result-set vocabulary
    (rs:ResultSet / rs:solution / rs:binding / rs:index), the other format
    RunnerSPARQL accepts besides .srx."""
    from jena_ray.term import split_literal

    if path.endswith((".ttl", ".n3")):
        triples = parse_turtle(open(path).read(), base=f"file://{path}")
    elif path.endswith(".rdf"):
        from jena_ray.rdfxml import parse_rdfxml

        triples = parse_rdfxml(open(path).read(), base=f"file://{path}")
    else:
        return None
    spo: dict[str, dict[str, list[str]]] = defaultdict(lambda: defaultdict(list))
    for s, p, o in triples:
        spo[s][p].append(o)
    rset = next(
        (s for s, pr in spo.items()
         if f"<{RS}ResultSet>" in pr.get(RDF_TYPE, [])), None
    )
    if rset is None:
        return None
    booleans = spo[rset].get(f"<{RS}boolean>")
    if booleans:
        return {"boolean": split_literal(booleans[0])[0] == "true"}
    rows = []
    for sol in spo[rset].get(f"<{RS}solution>", []):
        idx = spo[sol].get(f"<{RS}index>")
        row = {}
        for b in spo[sol].get(f"<{RS}binding>", []):
            var = split_literal(spo[b][f"<{RS}variable>"][0])[0]
            row[var] = spo[b][f"<{RS}value>"][0]
        rows.append((int(float(split_literal(idx[0])[0])) if idx else 0, row))
    ordered = bool(rows) and any(i != 0 for i, _ in rows)
    rows.sort(key=lambda x: x[0])
    return {"rows": [r for _, r in rows], "ordered": ordered}


def _lax_equal(exp: list[dict], got: list[dict]) -> bool:
    """mf:LaxCardinality (REDUCED results): the engine may return anything
    between the distinct rows and the full bag — got must be bag-contained
    in exp AND cover every distinct exp row."""
    remaining = list(exp)
    for g in got:
        for j, e in enumerate(remaining):
            if _row_match(e, g, {}) is not None:
                remaining.pop(j)
                break
        else:
            return False
    return all(
        any(_row_match(e, g, {}) is not None for g in got) for e in exp
    )


def _check(t, q, res) -> bool | None:
    if q.form in ("construct", "describe"):
        DG = "<urn:x-arq:DefaultGraph>"
        if t["result"].endswith(".trig"):
            # ARQ CONSTRUCT-quads results: dataset isomorphism over
            # (graph, s, p, o) with one shared bnode bijection
            from jena_ray.isomorphism import isomorphic_quads
            from jena_ray.trig import parse_trig

            exp_q = parse_trig(open(t["result"]).read(),
                               base=f"file://{t['result']}")
            rows = _rows_of(res)
            got_q = [
                (r.get("graph", DG), r["subj"], r["pred"], r["obj"])
                for r in rows
            ]
            return isomorphic_quads(got_q, exp_q)
        if t["result"].endswith((".ttl", ".n3")):
            exp = parse_turtle(open(t["result"]).read(),
                               base=f"file://{t['result']}")
        elif t["result"].endswith(".rdf"):
            from jena_ray.rdfxml import parse_rdfxml

            exp = parse_rdfxml(open(t["result"]).read(),
                               base=f"file://{t['result']}")
        else:
            return None
        from jena_ray.isomorphism import isomorphic

        rows = _rows_of(res)
        if rows and "graph" in rows[0]:
            # quad-template result checked against a triples-only
            # expected file: all rows must live in the default graph
            if any(r["graph"] != DG for r in rows):
                return False
        got = [tuple(r[c] for c in ("subj", "pred", "obj"))
               for r in _rows_of(res)]
        return isomorphic(got, exp)
    if t["result"].endswith(".srj"):
        exp = parse_srj(open(t["result"]).read())
    elif not t["result"].endswith(".srx"):
        exp = _parse_rs_graph(t["result"])
        if exp is None:
            return None
        if "boolean" in exp:
            return _rows_of(res)[0]["ask"] == exp["boolean"]
        got_rows = _rows_of(res)
        if q.order_by and exp["ordered"]:
            return _ordered_equal(exp["rows"], got_rows,
                                  [v for v, _ in q.order_by])
        return _bag_equal(exp["rows"], got_rows, {})
    else:
        exp = parse_srx(open(t["result"]).read())
    if "boolean" in exp:
        return _rows_of(res)[0]["ask"] == exp["boolean"]
    got_rows = _rows_of(res)
    if t.get("lax"):
        return _lax_equal(exp["rows"], got_rows)
    if q.order_by:
        # ordered comparison with tie-group freedom (shared bnode map)
        return _ordered_equal(exp["rows"], got_rows,
                              [v for v, _ in q.order_by])
    return _bag_equal(exp["rows"], got_rows, {})


# ------------------------------------------------------- syntax suites

SYNTAX_SUITES = ("syntax-sparql1", "syntax-sparql2", "syntax-sparql3",
                 "syntax-sparql4", "syntax-sparql5")

# minimum PositiveSyntaxTest queries the subset parser must accept, per
# suite — regression floor for parser breadth (negative tests are exact:
# every one must raise). Measured acceptance at round 3: 81/81, 53/53,
# 9/9, 4/4, 2/2 — every positive syntax test in all five DAWG suites.
SYNTAX_FLOORS = {"syntax-sparql1": 81, "syntax-sparql2": 53,
                 "syntax-sparql3": 9, "syntax-sparql4": 4,
                 "syntax-sparql5": 2}


_POS_Q_TYPES = (f"<{MF}PositiveSyntaxTest>", f"<{MF}PositiveSyntaxTest11>",
                f"<{MFX}PositiveSyntaxTestARQ>")
_NEG_Q_TYPES = (f"<{MF}NegativeSyntaxTest>", f"<{MF}NegativeSyntaxTest11>",
                f"<{MFX}NegativeSyntaxTestARQ>")
_POS_U_TYPES = (f"<{MF}PositiveUpdateSyntaxTest11>",)
_NEG_U_TYPES = (f"<{MF}NegativeUpdateSyntaxTest11>",)


def _load_syntax_manifest(suite: str, root: str = DAWG):
    mdir = f"{root}/{suite}"
    text = open(f"{mdir}/manifest.ttl").read()
    triples = parse_turtle(text, base=f"file://{mdir}/")
    spo: dict[str, dict[str, list[str]]] = defaultdict(lambda: defaultdict(list))
    for s, p, o in triples:
        spo[s][p].append(o)
    tests = []
    for s, props in spo.items():
        types = props.get(RDF_TYPE, [])
        pos = any(t in types for t in _POS_Q_TYPES)
        neg = any(t in types for t in _NEG_Q_TYPES)
        upos = any(t in types for t in _POS_U_TYPES)
        uneg = any(t in types for t in _NEG_U_TYPES)
        if not (pos or neg or upos or uneg):
            continue
        action = props.get(f"<{MF}action>", [None])[0]
        if action is None or not action.startswith("<file://"):
            continue
        tests.append({"name": s.split("#")[-1].rstrip(">"),
                      "query": _path(action), "positive": pos or upos,
                      "update": upos or uneg})
    return tests


def _run_syntax_suite(suite: str, root: str, floor: int):
    """Syntax conformance (RunnerSPARQLSyntax): every NegativeSyntaxTest
    must be REJECTED (the subset parser may reject more than full SPARQL,
    never less than the grammar forbids); accepted PositiveSyntaxTest
    counts are floored per suite so parser breadth can't silently
    regress. A positive test may only fail with SparqlSyntaxError (out of
    subset) — any other exception is a bug."""
    from jena_ray.sparql import Parser

    tests = _load_syntax_manifest(suite, root)
    assert tests, f"no syntax tests found in {suite}"
    accepted, false_accepts = 0, []
    for t in tests:
        qtext = open(t["query"]).read()
        # Jena picks the parser by file extension: .rq/.ru = strict
        # SPARQL 1.1, .arq = ARQ-extension syntax
        arq = t["query"].endswith(".arq")
        try:
            if t.get("update"):
                p = Parser(qtext, arq=arq)
                p.base = f"file://{t['query']}"
                p.parse_update_request()
            else:
                parse_query(qtext, base=f"file://{t['query']}", arq=arq)
            ok = True
        except SparqlSyntaxError:
            ok = False
        if t["positive"] and ok:
            accepted += 1
        elif not t["positive"] and ok:
            false_accepts.append(t["name"])
    assert not false_accepts, f"{suite}: accepted invalid SPARQL: {false_accepts}"
    assert accepted >= floor, (
        f"{suite}: only {accepted} positive syntax tests accepted "
        f"(floor {floor})"
    )


@pytest.mark.parametrize("suite", SYNTAX_SUITES)
def test_dawg_syntax_suite(suite):
    _run_syntax_suite(suite, DAWG, SYNTAX_FLOORS[suite])


# ARQ's own syntax manifests (testing/ARQ/Syntax): SPARQL 1.0 regression
# copies, the SPARQL 1.1 suite, ARQ-extension syntax, and the SPARQL
# Update syntax suites (driven through Parser.parse_update). Floors are
# the measured round-3 acceptance; negative tests are exact.
ARQ_SYNTAX_SUITES: dict[str, int] = {
    "Syntax-SPARQL_10_1": 81,
    "Syntax-SPARQL_10_2": 55,
    "Syntax-SPARQL_10_3": 11,
    "Syntax-SPARQL_11": 38,
    "Syntax-ARQ": 35,
    "Syntax-SPARQL-Fed": 3,
    "Syntax-SPARQL-Update": 40,
    "Syntax-SPARQL-Update-2": 1,
}


@pytest.mark.parametrize("suite", sorted(ARQ_SYNTAX_SUITES))
def test_arq_syntax_suite(suite):
    _run_syntax_suite(suite, f"{ARQ}/Syntax", ARQ_SYNTAX_SUITES[suite])
