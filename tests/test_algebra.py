"""SPARQL algebra breadth over the id indexes: FILTER / UNION / MINUS /
property functions (text:query) / quad BGPs / empty-side join robustness.

Reference semantics: OpFilter + expr/E_*.java, OpUnion, OpMinus
(QueryIterMinus), pfunction/PropertyFunctionRegistry + jena-text
TextQueryPF, and the TDB quad solver (SolverLib over G* indexes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

T = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
DOC = "<http://ex.org/Document>"
CH = "<http://ex.org/charCount>"
LBL = "<http://ex.org/label>"
MEN = "<http://ex.org/mentions>"
E1 = "<http://ex.org/e1>"
E2 = "<http://ex.org/e2>"
XSD_INT = "<http://www.w3.org/2001/XMLSchema#integer>"


def _subj(i: int) -> str:
    return f"<http://ex.org/d{i}>"


@pytest.fixture(scope="module")
def algebra_index(ray_session, tmp_path_factory):
    """10 docs: all typed; charCount = 100*i; label "Doc i"@en (even) /
    @fr (odd); d0-d3 mention e1, d2-d5 mention e2."""
    out = str(tmp_path_factory.mktemp("algidx"))
    rows = []
    for i in range(10):
        s = _subj(i)
        rows.append((s, T, DOC))
        rows.append((s, CH, f'"{100 * i}"^^{XSD_INT}'))
        rows.append((s, LBL, f'"Doc {i}"@{"en" if i % 2 == 0 else "fr"}'))
    for i in range(4):
        rows.append((_subj(i), MEN, E1))
    for i in range(2, 6):
        rows.append((_subj(i), MEN, E2))
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows]),
        }
    )
    import os

    os.makedirs(f"{out}/triples")
    pq.write_table(t, f"{out}/triples/part0.parquet")
    from jena_ray.stages.materialize import materialize_indexes

    materialize_indexes(out, num_buckets=4, min_rows_per_file=1000)
    return out


def _ds_set(ds, col="d"):
    return {r[col] for r in ds.take_all()}


def test_filter_numeric_compare(algebra_index):
    from jena_ray.pipelines.bgp import bgp_execute

    out = bgp_execute(
        algebra_index,
        [("?d", T, DOC), ("?d", CH, "?c")],
        ["d", "c"],
        filters=[(">", "?c", 600)],
    ).take_all()
    assert {r["d"] for r in out} == {_subj(7), _subj(8), _subj(9)}
    assert all(r["c"].startswith('"') for r in out)


def test_filter_numeric_bounds_and_equality(algebra_index):
    from jena_ray.pipelines.bgp import bgp_execute

    pats = [("?d", CH, "?c")]
    le = bgp_execute(algebra_index, pats, ["d"], filters=[("<=", "?c", 100)])
    assert _ds_set(le) == {_subj(0), _subj(1)}
    eq = bgp_execute(algebra_index, pats, ["d"], filters=[("=", "?c", 300)])
    assert _ds_set(eq) == {_subj(3)}
    ne = bgp_execute(algebra_index, pats, ["d"], filters=[("!=", "?c", 300), ("<", "?c", 500)])
    assert _ds_set(ne) == {_subj(i) for i in range(5) if i != 3}


def test_filter_string_ops(algebra_index):
    from jena_ray.pipelines.bgp import bgp_execute

    pats = [("?d", LBL, "?l")]
    regex = bgp_execute(algebra_index, pats, ["d"], filters=[("regex", "?l", "Doc [45]")])
    assert _ds_set(regex) == {_subj(4), _subj(5)}
    starts = bgp_execute(
        algebra_index, pats, ["d"], filters=[("strstarts", "?d", "http://ex.org/d9")]
    )
    assert _ds_set(starts) == {_subj(9)}
    ends = bgp_execute(algebra_index, pats, ["d"], filters=[("strends", "?l", "c 3")])
    assert _ds_set(ends) == {_subj(3)}


def test_filter_lang(algebra_index):
    from jena_ray.pipelines.bgp import bgp_execute

    en = bgp_execute(
        algebra_index, [("?d", LBL, "?l")], ["d"], filters=[("lang", "?l", "en")]
    )
    assert _ds_set(en) == {_subj(i) for i in range(0, 10, 2)}


def test_filter_sameterm_id_space(algebra_index):
    from jena_ray.pipelines.bgp import bgp_execute

    eq = bgp_execute(
        algebra_index, [("?d", MEN, "?e")], ["d"], filters=[("=", "?e", E1)]
    )
    assert _ds_set(eq) == {_subj(i) for i in range(4)}
    ne = bgp_execute(
        algebra_index, [("?d", MEN, "?e")], ["d"], filters=[("!=", "?e", E1)]
    )
    assert _ds_set(ne) == {_subj(i) for i in range(2, 6)}


def test_filter_var_var_and_unbound_raises(algebra_index):
    from jena_ray.pipelines.bgp import bgp_execute

    # ?a and ?b both mention-objects of the same doc; ?a != ?b keeps only
    # docs with two distinct entities (d2, d3 mention e1 AND e2)
    out = bgp_execute(
        algebra_index,
        [("?d", MEN, "?a"), ("?d", MEN, "?b")],
        ["d"],
        filters=[("!=", "?a", "?b")],
    )
    assert _ds_set(out) == {_subj(2), _subj(3)}
    # a filter over a never-bound var is a type error on every solution:
    # statically FALSE (SPARQL 1.1 §17.2) — empty result, not an exception
    out = bgp_execute(
        algebra_index, [("?d", T, DOC)], ["d"], filters=[(">", "?zzz", 1)]
    )
    assert out.count() == 0
    # …and !bound() of a never-bound var is TRUE on every solution
    out = bgp_execute(
        algebra_index, [("?d", T, DOC)], ["d"], filters=[("!bound", "?zzz")]
    )
    assert out.count() > 0


def test_optional_bang_bound_negation(algebra_index):
    """FILTER(!bound(?e)) over OPTIONAL = docs with NO mentions."""
    from jena_ray.pipelines.bgp import bgp_optional

    out = bgp_optional(
        algebra_index,
        [("?d", T, DOC)],
        [("?d", MEN, "?e")],
        ["d"],
        filters=[("!bound", "?e")],
    )
    assert _ds_set(out) == {_subj(i) for i in range(6, 10)}


def test_union_overlap_distinct(algebra_index):
    from jena_ray.pipelines.bgp import bgp_union

    out = bgp_union(
        algebra_index,
        [[("?d", MEN, E1)], [("?d", MEN, E2)]],
        ["d"],
    )
    assert _ds_set(out) == {_subj(i) for i in range(6)}


def test_union_disjoint_vars_null_padded(algebra_index):
    from jena_ray.pipelines.bgp import bgp_union

    out = bgp_union(
        algebra_index,
        [[("?d", MEN, E1)], [("?d", MEN, E2), ("?d", CH, "?c")]],
        ["d", "c"],
    ).take_all()
    by_d = {}
    for r in out:
        by_d.setdefault(r["d"], set()).add(r["c"])
    # branch-1 rows carry null c; branch-2 rows carry the literal
    assert None in by_d[_subj(0)]
    assert any(c and c.startswith('"400"') for c in by_d[_subj(4)])


def test_union_per_branch_filters(algebra_index):
    from jena_ray.pipelines.bgp import bgp_union

    out = bgp_union(
        algebra_index,
        [[("?d", MEN, E1), ("?d", CH, "?c")], [("?d", MEN, E2), ("?d", CH, "?c")]],
        ["d"],
        filters=[[("<", "?c", 100)], [(">", "?c", 400)]],
    )
    assert _ds_set(out) == {_subj(0), _subj(5)}


def test_minus_basic(algebra_index):
    from jena_ray.pipelines.bgp import bgp_minus

    out = bgp_minus(
        algebra_index,
        [("?d", MEN, E1)],
        [("?d", MEN, E2)],
        ["d"],
    )
    assert _ds_set(out) == {_subj(0), _subj(1)}


def test_minus_disjoint_domain_noop(algebra_index):
    from jena_ray.pipelines.bgp import bgp_minus

    out = bgp_minus(
        algebra_index,
        [("?d", MEN, E1)],
        [("?x", MEN, E2)],  # no shared var → SPARQL MINUS removes nothing
        ["d"],
    )
    assert _ds_set(out) == {_subj(i) for i in range(4)}


def test_empty_pattern_join_returns_empty(algebra_index):
    """An empty scan side must yield an empty result, not the ray-2.49
    hash-join schema crash (sentinel-guard regression test)."""
    from jena_ray.pipelines.bgp import bgp_execute

    out = bgp_execute(
        algebra_index,
        [("?d", T, DOC), ("?d", MEN, "<http://ex.org/never>")],
        ["d"],
    )
    assert out.take_all() == []


def test_minus_empty_right(algebra_index):
    from jena_ray.pipelines.bgp import bgp_minus

    out = bgp_minus(
        algebra_index,
        [("?d", MEN, E1)],
        [("?d", MEN, "<http://ex.org/never>")],
        ["d"],
    )
    assert _ds_set(out) == {_subj(i) for i in range(4)}


def test_text_query_property_function(algebra_index, tmp_path_factory):
    import ray.data as rd

    from jena_ray.pipelines.bgp import TEXT_QUERY_IRI, bgp_execute
    from jena_ray.stages.materialize import ID_TYPE, term_id
    from jena_ray.stages.textindex import build_text_index

    tix = str(tmp_path_factory.mktemp("textpf"))
    texts = {i: ("apple pie" if i < 3 else "banana bread") for i in range(10)}
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    [term_id(_subj(i)) for i in texts], type=ID_TYPE
                ),
                "text": pa.array(list(texts.values())),
            }
        )
    )
    build_text_index(docs, tix, num_buckets=4)

    out = bgp_execute(
        algebra_index,
        [("?d", f"<{TEXT_QUERY_IRI}>", '"apple"'), ("?d", CH, "?c")],
        ["d", "c"],
        pf_context={"text_index": tix},
    ).take_all()
    assert {r["d"] for r in out} == {_subj(0), _subj(1), _subj(2)}
    # OR semantics: two terms
    out2 = bgp_execute(
        algebra_index,
        [("?d", f"<{TEXT_QUERY_IRI}>", '"apple banana"'), ("?d", T, DOC)],
        ["d"],
        pf_context={"text_index": tix},
    )
    assert _ds_set(out2) == {_subj(i) for i in range(10)}


def test_values_inline_bindings(algebra_index):
    from jena_ray.pipelines.bgp import bgp_execute

    out = bgp_execute(
        algebra_index,
        [("?d", MEN, "?e")],
        ["d", "e"],
        values=[{"e": E1}],
    )
    assert _ds_set(out) == {_subj(i) for i in range(4)}
    with pytest.raises(ValueError, match="VALUES"):
        bgp_execute(
            algebra_index, [("?d", MEN, "?e")], ["d"], values=[{"zzz": E1}]
        ).take_all()


def test_construct_template(algebra_index):
    from jena_ray.pipelines.bgp import bgp_construct

    out = bgp_construct(
        algebra_index,
        [("?d", MEN, E1)],
        [("?d", "<http://ex.org/rel>", E1), (E1, T, "<http://ex.org/Entity>")],
    ).take_all()
    trips = {(r["subj"], r["pred"], r["obj"]) for r in out}
    # 4 docs × edge triple + 1 constant triple (deduped)
    assert len(trips) == 5
    assert (E1, T, "<http://ex.org/Entity>") in trips
    assert (_subj(2), "<http://ex.org/rel>", E1) in trips


@pytest.fixture(scope="module")
def chain_index(ray_session, tmp_path_factory):
    """a→b→c→d→a cycle plus e→f: closure from a = {a,b,c,d}."""
    out = str(tmp_path_factory.mktemp("chainidx"))
    P = "<http://ex.org/next>"
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "f")]
    t = pa.table(
        {
            "subj": pa.array([f"<http://ex.org/{x}>" for x, _ in edges]),
            "pred": pa.array([P] * len(edges)),
            "obj": pa.array([f"<http://ex.org/{y}>" for _, y in edges]),
        }
    )
    import os

    os.makedirs(f"{out}/triples")
    pq.write_table(t, f"{out}/triples/part0.parquet")
    from jena_ray.stages.materialize import materialize_indexes

    materialize_indexes(out, num_buckets=4, min_rows_per_file=1000)
    return out


def test_path_closure_cycle(chain_index):
    from jena_ray.pipelines.bgp import path_closure

    P = "<http://ex.org/next>"
    out = path_closure(chain_index, P, "<http://ex.org/a>")
    assert _ds_set(out, "y") == {
        f"<http://ex.org/{x}>" for x in ("a", "b", "c", "d")
    }
    # no outgoing edges → empty closure
    empty = path_closure(chain_index, P, "<http://ex.org/f>")
    assert empty.take_all() == []


@pytest.fixture(scope="module")
def quad_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from jena_ray.stages.quads import materialize_quad_indexes

    out = str(tmp_path_factory.mktemp("quadbgp"))
    rows = []
    for i in range(12):
        g = f"<urn:graph{i}>"
        s = _subj(i)
        rows.append({"graph": g, "subj": s, "pred": T, "obj": DOC})
        rows.append(
            {"graph": g, "subj": s, "pred": CH, "obj": f'"{100 * i}"^^{XSD_INT}'}
        )
    ds = rd.from_items(rows)
    materialize_quad_indexes(out, ds, num_buckets=4, min_rows_per_file=10)
    return out


def test_quad_bgp_join_and_filter(quad_index):
    from jena_ray.pipelines.bgp import quad_bgp_execute

    out = quad_bgp_execute(
        quad_index,
        [("?g", "?d", T, DOC), ("?g", "?d", CH, "?c")],
        ["g", "d", "c"],
        filters=[(">=", "?c", 1000)],
    ).take_all()
    assert {r["d"] for r in out} == {_subj(10), _subj(11)}
    assert {r["g"] for r in out} == {"<urn:graph10>", "<urn:graph11>"}


def test_quad_bgp_bound_graph(quad_index):
    from jena_ray.pipelines.bgp import quad_bgp_execute

    out = quad_bgp_execute(
        quad_index,
        [("<urn:graph3>", "?d", CH, "?c")],
        ["d", "c"],
    ).take_all()
    assert len(out) == 1 and out[0]["d"] == _subj(3)


def test_quad_bgp_rejects_triples(quad_index):
    from jena_ray.pipelines.bgp import quad_bgp_execute

    with pytest.raises(ValueError, match="4 slots"):
        quad_bgp_execute(quad_index, [("?s", "?p", "?o")], ["s"])


# ------------------------------------------------------------------
# round-4: faithful nested-group algebra scoping (Parser._resolve_nested;
# AlgebraGenerator.java preserves group nesting — DAWG algebra
# join-scope-1) + the hoisted-OPTIONAL-BIND / LET guards
# ------------------------------------------------------------------


@pytest.fixture(scope="module")
def scope_index(ray_session, tmp_path_factory):
    """The var-scope-join-1 shape: paul has a phone but no email; john and
    ringo have emails; george has neither."""
    NAME = "<http://ex.org/name>"
    EMAIL = "<http://ex.org/email>"
    PHONE = "<http://ex.org/phone>"
    rows = [
        ("<http://ex.org/b1>", NAME, '"paul"'),
        ("<http://ex.org/b1>", PHONE, '"777"'),
        ("<http://ex.org/b2>", NAME, '"john"'),
        ("<http://ex.org/b2>", EMAIL, "<mailto:john@x>"),
        ("<http://ex.org/b3>", NAME, '"george"'),
        ("<http://ex.org/b4>", NAME, '"ringo"'),
        ("<http://ex.org/b4>", EMAIL, "<mailto:ringo@x>"),
    ]
    out = str(tmp_path_factory.mktemp("scopeidx"))
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows]),
        }
    )
    import os

    os.makedirs(f"{out}/triples")
    pq.write_table(t, f"{out}/triples/part0.parquet")
    from jena_ray.stages.materialize import materialize_indexes

    materialize_indexes(out, num_buckets=2, min_rows_per_file=1000)
    return out


def _q(idx, q):
    from jena_ray.sparql import sparql_query

    return sparql_query(idx, q, num_partitions=2).to_pandas()


def test_nested_group_join_scope(scope_index):
    """Join(outer, LeftJoin(B, C)) — NOT LeftJoin(Join(outer, B), C): the
    inner OPTIONAL's ?X ranges over all email owners, none of whom is
    paul, so the join is empty (DAWG algebra join-scope-1)."""
    df = _q(scope_index, """
        PREFIX : <http://ex.org/>
        SELECT * { ?X :name "paul" { ?Y :name "george" .
                                     OPTIONAL { ?X :email ?Z } } }
    """)
    assert len(df) == 0


def test_nested_group_well_designed_flattens(scope_index):
    """When the inner group's required part binds the shared variable the
    flatten is semantics-preserving and must still produce the row."""
    df = _q(scope_index, """
        PREFIX : <http://ex.org/>
        SELECT * { ?X :name "paul" { ?X :phone ?P .
                                     OPTIONAL { ?X :email ?Z } } }
    """)
    assert len(df) == 1
    assert df.iloc[0]["P"] == '"777"'
    assert df.iloc[0]["Z"] is None or df.iloc[0]["Z"] != df.iloc[0]["Z"]


def test_nested_group_mirror_optional_risk_raises(scope_index):
    """Mirror of join-scope-1 (round-5 ADVICE): the PARENT's OPTIONAL
    binds ?Z (not bound by the parent's required part) and the nested
    group's patterns also bind ?Z. Textual order decides the reference
    algebra (Join(LeftJoin(P1,O),P2) vs LeftJoin(Join(P1,P2),O)), which
    the engine does not track — must refuse loudly, not flatten."""
    from jena_ray.sparql import SparqlSyntaxError, sparql_query

    with pytest.raises(SparqlSyntaxError):
        sparql_query(scope_index, """
            PREFIX : <http://ex.org/>
            SELECT * { ?X :name "paul"
                       OPTIONAL { ?X :email ?Z }
                       { ?Z :name ?N } }
        """, num_partitions=2)


def test_nested_group_mirror_safe_still_flattens(scope_index):
    """Parent OPTIONAL sharing only vars the parent's required part binds:
    the mirror guard must NOT fire (flatten stays semantics-preserving)."""
    df = _q(scope_index, """
        PREFIX : <http://ex.org/>
        SELECT * { ?X :name ?N OPTIONAL { ?X :email ?Z }
                   { ?X :phone ?P } }
    """)
    assert len(df) == 1
    assert df.iloc[0]["P"] == '"777"'


def test_nested_filter_scope(scope_index):
    """A FILTER inside a nested group cannot see outer bindings (DAWG
    algebra filter-nested-2): the inner filter errors on unbound ?N and
    the join with the empty inner group is empty."""
    df = _q(scope_index, """
        PREFIX : <http://ex.org/>
        SELECT ?N { ?X :name ?N . { FILTER(?N = "paul") } }
    """)
    assert len(df) == 0


def test_graph_scoped_optional_shared_var_raises(quad_index):
    """GRAPH g { ... OPTIONAL ... } sharing a variable with the enclosing
    group would flatten to a different algebra — must raise, not
    mis-answer (round-4 ADVICE)."""
    from jena_ray.sparql import SparqlSyntaxError, sparql_query

    with pytest.raises(SparqlSyntaxError):
        sparql_query(quad_index, """
            PREFIX : <http://ex.org/>
            SELECT * { ?s :p ?v
                       GRAPH :g1 { ?x :q ?w OPTIONAL { ?s :r ?z } } }
        """, num_partitions=2)


def test_optional_bind_sibling_marker_rejected(scope_index):
    """The matched-marker for a hoisted OPTIONAL BIND must be private to
    its block: a variable shared with a sibling OPTIONAL can be bound by
    the sibling alone (round-4 ADVICE) — raise."""
    from jena_ray.sparql import SparqlSyntaxError, sparql_query

    with pytest.raises(SparqlSyntaxError):
        sparql_query(scope_index, """
            PREFIX : <http://ex.org/>
            SELECT * { ?s :name ?n
                       OPTIONAL { ?s :phone ?x BIND(1 AS ?v) }
                       OPTIONAL { ?s :email ?x } }
        """, num_partitions=2)


def test_optional_bind_outer_ref_rejected(scope_index):
    """A BIND inside OPTIONAL referencing an enclosing-group variable
    evaluates post-join here but ARQ's Extend sees it unbound — raise."""
    from jena_ray.sparql import SparqlSyntaxError, sparql_query

    with pytest.raises(SparqlSyntaxError):
        sparql_query(scope_index, """
            PREFIX : <http://ex.org/>
            SELECT * { ?s :name ?n
                       OPTIONAL { ?s :phone ?p BIND(STR(?n) AS ?v) } }
        """, num_partitions=2)


def test_let_reassign_possibly_unbound_raises(scope_index):
    """ARQ LET re-assignment of a variable bound only in an OPTIONAL
    branch: ARQ assigns on unbound rows, the equality-filter lowering
    would drop them — raise (round-4 ADVICE)."""
    from jena_ray.sparql import SparqlSyntaxError, sparql_query

    with pytest.raises(SparqlSyntaxError):
        sparql_query(scope_index, """
            PREFIX : <http://ex.org/>
            SELECT * { ?s :name ?n OPTIONAL { ?s :email ?e }
                       LET(?e := "x") }
        """, num_partitions=2)
