"""SPARQL text front-end: parse → algebra → id-index execution.

Reference path: jena-arq Grammar/main.jj (ParserSPARQL11) →
sparql/algebra/AlgebraGenerator.java → engine/main/OpExecutor.java.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jena_ray.sparql import SparqlSyntaxError, parse_query, sparql_query

PFX = "PREFIX ex: <http://ex.org/>\n"
XSD_INT = "<http://www.w3.org/2001/XMLSchema#integer>"


def _subj(i: int) -> str:
    return f"<http://ex.org/d{i}>"


@pytest.fixture(scope="module")
def sparql_index(ray_session, tmp_path_factory):
    """Same corpus shape as test_algebra plus a linksTo chain d0→d1→…→d4."""
    out = str(tmp_path_factory.mktemp("sparqlidx"))
    T = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    rows = []
    for i in range(10):
        s = _subj(i)
        rows.append((s, T, "<http://ex.org/Document>"))
        rows.append((s, "<http://ex.org/charCount>", f'"{100 * i}"^^{XSD_INT}'))
        lang = "en" if i % 2 == 0 else "fr"
        rows.append((s, "<http://ex.org/label>", f'"Doc {i}"@{lang}'))
    for i in range(4):
        rows.append((_subj(i), "<http://ex.org/mentions>", "<http://ex.org/e1>"))
    for i in range(2, 6):
        rows.append((_subj(i), "<http://ex.org/mentions>", "<http://ex.org/e2>"))
    for i in range(4):
        rows.append((_subj(i), "<http://ex.org/linksTo>", _subj(i + 1)))
    # bnode chain off d0 (DESCRIBE bnode-closure semantics)
    rows.append((_subj(0), "<http://ex.org/note>", "_:n1"))
    rows.append(("_:n1", "<http://ex.org/text>", '"hi"'))
    # dateTime values on d6..d9 only (describe-count tests cover d0/d4)
    for i in range(6, 10):
        rows.append((
            _subj(i), "<http://ex.org/created>",
            f'"2024-01-0{i - 5}T12:00:00Z"'
            '^^<http://www.w3.org/2001/XMLSchema#dateTime>',
        ))
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


def _col(res, name):
    if not isinstance(res, pa.Table):
        res = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return sorted(v for v in res.column(name).to_pylist() if v is not None)


# ------------------------------------------------------------------ parsing

def test_parse_terms_and_abbreviations():
    q = parse_query(
        PFX + 'SELECT ?d WHERE { ?d a ex:Document ; ex:p "x"@EN-gb , 4.5 . }'
    )
    pats = q.where.patterns
    assert pats[0][2] == "<http://ex.org/Document>"
    assert pats[1][2] == '"x"@en-GB'
    assert pats[2][2].startswith('"4.5"^^')


def test_parse_bnode_property_list():
    # [ p o ] — BlankNodePropertyList desugars to a fresh scoped variable
    # plus its own patterns (TriplesNode expansion)
    q = parse_query(PFX + "SELECT ?s WHERE { ?s ex:p [ ex:q 1 ; ex:r ?v ] }")
    pats = q.where.patterns
    outer = [p for p in pats if p[0] == "?s"]
    assert len(outer) == 1 and outer[0][1] == "<http://ex.org/p>"
    node = outer[0][2]
    assert node.startswith("?__bn")
    assert (node, "<http://ex.org/q>",
            '"1"^^<http://www.w3.org/2001/XMLSchema#integer>') in pats
    assert (node, "<http://ex.org/r>", "?v") in pats


def test_parse_base_resolution():
    q = parse_query("BASE <http://ex.org/a/> SELECT ?x WHERE { ?x <b> <../c> }")
    assert q.where.patterns[0][1] == "<http://ex.org/a/b>"
    assert q.where.patterns[0][2] == "<http://ex.org/c>"


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s ?p ?o } FOO",
        PFX + 'SELECT ?s WHERE { ?s ex:p ?o . FILTER(?o + "a" = 2) }',
        "SELECT ?s WHERE { ?s undefined:p ?o }",
        # constructs inside GRAPH braces whose executors are not
        # quad-aware would silently be dropped (paths / subqueries)
        PFX + "SELECT ?s WHERE { GRAPH <urn:g> { ?s ex:p+ ?o } }",
    ],
)
def test_parse_rejects(bad):
    with pytest.raises(SparqlSyntaxError):
        parse_query(bad)


# ---------------------------------------------------------------- execution

def test_select_star_join(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:mentions ex:e1 ; ex:mentions ex:e2 }",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(2), _subj(3)]


def test_numeric_filter_and_order(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d ?c WHERE {
              ?d a ex:Document ; ex:charCount ?c .
              FILTER(?c >= 700)
            } ORDER BY DESC(?c) LIMIT 2""",
        num_partitions=4,
    )
    df = res.to_pandas()
    assert df["d"].tolist() == [_subj(9), _subj(8)]


def test_lang_filter(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + 'SELECT ?d WHERE { ?d ex:label ?l . FILTER(LANG(?l) = "fr") }',
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(i) for i in (1, 3, 5, 7, 9)]


def test_union_and_branch_filter(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d WHERE {
              { ?d ex:mentions ex:e1 }
              UNION
              { ?d ex:mentions ex:e2 . FILTER(REGEX(STR(?d), "d5$")) }
            }""",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(0), _subj(1), _subj(2), _subj(3), _subj(5)]


def test_optional_unbound(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d ?e WHERE {
              ?d ex:mentions ex:e1 .
              OPTIONAL { ?d ex:linksTo ?e . ?e ex:mentions ex:e2 }
            }""",
        num_partitions=4,
    )
    df = res.to_pandas().set_index("d")["e"]
    assert df[_subj(1)] == _subj(2)
    assert pa.compute.is_null(pa.array([df[_subj(0)]]))[0].as_py()


def test_minus(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d WHERE {
              ?d ex:mentions ex:e2 .
              MINUS { ?d ex:mentions ex:e1 }
            }""",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(4), _subj(5)]


def test_values(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d ?c WHERE {
              ?d ex:charCount ?c .
              VALUES ?d { ex:d3 ex:d7 }
            }""",
        num_partitions=4,
    )
    assert _col(res, "c") == [f'"300"^^{XSD_INT}', f'"700"^^{XSD_INT}']


def test_group_count_and_sum(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?e (COUNT(*) AS ?n) (SUM(?c) AS ?total)
            WHERE { ?d ex:mentions ?e ; ex:charCount ?c }
            GROUP BY ?e""",
        num_partitions=4,
    )
    df = res.to_pandas().set_index("e")
    assert df.loc["<http://ex.org/e1>", "n"] == 4
    assert df.loc["<http://ex.org/e2>", "n"] == 4
    # d0..d3 → 0+100+200+300; d2..d5 → 200+..+500
    assert int(df.loc["<http://ex.org/e1>", "total"]) == 600
    assert int(df.loc["<http://ex.org/e2>", "total"]) == 1400
    assert str(df["total"].dtype) == "int64"


def test_select_expr_over_aggregates(sparql_index):
    """Aggregate calls inside a SELECT expression (SUM/COUNT hoisted to
    internal aliases, expression evaluated post-group — OpExtend above
    OpGroup), and an expression over a named aggregate alias."""
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?e (SUM(?c)/COUNT(?c) AS ?avg)
            WHERE { ?d ex:mentions ?e ; ex:charCount ?c }
            GROUP BY ?e""",
        num_partitions=4,
    )
    df = res.to_pandas().set_index("e")
    assert df.loc["<http://ex.org/e1>", "avg"] == (
        '"150"^^<http://www.w3.org/2001/XMLSchema#integer>'
    )
    assert df.loc["<http://ex.org/e2>", "avg"] == (
        '"350"^^<http://www.w3.org/2001/XMLSchema#integer>'
    )
    # expression over a preceding (AGG AS ?alias); internal aliases and
    # group keys are not projected unless selected
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT (SUM(?c) AS ?s) (?s/100 AS ?hundreds)
            WHERE { ?d ex:charCount ?c }""",
        num_partitions=4,
    )
    df = res.to_pandas()
    assert list(df.columns) == ["s", "hundreds"]
    assert int(df["s"][0]) == 4500
    assert df["hundreds"][0] == (
        '"45"^^<http://www.w3.org/2001/XMLSchema#integer>'
    )


def test_select_expr_nongrouped_var_rejected(sparql_index):
    with pytest.raises(SparqlSyntaxError, match="non-grouped"):
        sparql_query(
            sparql_index,
            PFX + """SELECT ?e (?c + 1 AS ?c1)
                WHERE { ?d ex:mentions ?e ; ex:charCount ?c }
                GROUP BY ?e""",
            num_partitions=4,
        )


def test_group_concat_and_distinct_count(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?e (COUNT(DISTINCT ?d) AS ?n)
                      (GROUP_CONCAT(?d; SEPARATOR "|") AS ?ds)
            WHERE { ?d ex:mentions ?e } GROUP BY ?e""",
        num_partitions=4,
    )
    df = res.to_pandas().set_index("e")
    assert df.loc["<http://ex.org/e1>", "n"] == 4
    assert df.loc["<http://ex.org/e1>", "ds"] == "|".join(_subj(i) for i in range(4))


def test_ask(sparql_index):
    yes = sparql_query(sparql_index, PFX + "ASK { ex:d0 ex:mentions ex:e1 }")
    no = sparql_query(sparql_index, PFX + "ASK { ex:d9 ex:mentions ?e }")
    assert yes.column("ask").to_pylist() == [True]
    assert no.column("ask").to_pylist() == [False]


def test_construct(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """CONSTRUCT { ?d ex:tag "hit" . ?d a ex:Hit }
            WHERE { ?d ex:mentions ex:e1 ; ex:mentions ex:e2 }""",
        num_partitions=4,
    )
    df = res.to_pandas().sort_values(["subj", "pred"]).reset_index(drop=True)
    assert len(df) == 4  # 2 docs × 2 template triples
    assert set(df["pred"]) == {
        "<http://ex.org/tag>",
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
    }


def test_property_path(sparql_index):
    res = sparql_query(
        sparql_index, PFX + "SELECT ?y WHERE { ex:d0 ex:linksTo+ ?y }",
        num_partitions=4,
    )
    assert _col(res, "y") == [_subj(i) for i in (1, 2, 3, 4)]


def test_offset_slice(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d a ex:Document } ORDER BY ?d LIMIT 3 OFFSET 2",
        num_partitions=4,
    )
    assert isinstance(res, pa.Table)
    assert res.column("d").to_pylist() == [_subj(2), _subj(3), _subj(4)]


def test_filter_exists(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d WHERE {
              ?d ex:mentions ex:e1 .
              FILTER EXISTS { ?d ex:mentions ex:e2 }
            }""",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(2), _subj(3)]


def test_filter_not_exists(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d WHERE {
              ?d ex:mentions ex:e2 .
              FILTER NOT EXISTS { ?d ex:mentions ex:e1 }
              FILTER(REGEX(STR(?d), "d[0-9]$"))
            }""",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(4), _subj(5)]


def test_exists_preserves_multiplicity(sparql_index):
    # non-distinct grouped count through a semi-join: each (d, l) solution
    # for e1-mentioning docs must count once even though the EXISTS side
    # (charCount patterns) has one row per doc
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT (COUNT(*) AS ?n) WHERE {
              ?d ex:mentions ?e .
              FILTER EXISTS { ?d ex:mentions ex:e1 }
            } GROUP BY ?e""",
        num_partitions=4,
    )
    df = res.to_pandas()
    assert sorted(df["n"].tolist()) == [2, 4]  # e2 via d2,d3; e1 via d0-d3


def test_graph_block_over_quad_store(ray_session, tmp_path_factory):
    """GRAPH ?g / GRAPH <iri> compile to quad patterns over the
    GSPO/GPOS/GOSP store (SolverLib's named-graph path)."""
    import ray.data as rd

    from jena_ray.stages.quads import materialize_quad_indexes

    out = str(tmp_path_factory.mktemp("sparqlquads"))
    rows = []
    for i in range(12):
        rows.append(
            {
                "graph": f"<urn:g{i % 3}>",
                "subj": f"<urn:s{i}>",
                "pred": "<urn:p>",
                "obj": f'"{i % 4}"',
            }
        )
    materialize_quad_indexes(out, rd.from_items(rows), num_buckets=4,
                             min_rows_per_file=10)

    res = sparql_query(
        out,
        'SELECT ?s WHERE { GRAPH <urn:g0> { ?s <urn:p> "0" } }',
        num_partitions=4,
    )
    assert _col(res, "s") == ["<urn:s0>"]

    res = sparql_query(
        out,
        'SELECT ?g ?s WHERE { GRAPH ?g { ?s <urn:p> "1" } } ORDER BY ?g',
        num_partitions=4,
    )
    df = res.to_pandas()
    assert df["g"].tolist() == ["<urn:g0>", "<urn:g1>", "<urn:g2>"]
    assert sorted(df["s"]) == ["<urn:s1>", "<urn:s5>", "<urn:s9>"]

    # general groups inside GRAPH: UNION branches / MINUS blocks re-scope
    # to quad patterns (OpGraph over arbitrary sub-patterns)
    res = sparql_query(
        out,
        'SELECT ?s WHERE { GRAPH <urn:g0> { { ?s <urn:p> "0" } UNION '
        '{ ?s <urn:p> "1" } } }',
        num_partitions=4,
    )
    assert sorted(_col(res, "s")) == ["<urn:s0>", "<urn:s9>"]

    res = sparql_query(
        out,
        'SELECT ?g ?s WHERE { GRAPH ?g { ?s <urn:p> ?v MINUS '
        '{ ?s <urn:p> "2" } } } ORDER BY ?s',
        num_partitions=4,
    )
    df = res.to_pandas()
    # the MINUS side binds (g, s) for the obj="2" rows (s2, s6, s10), so
    # exactly those three solutions are removed: 12 - 3 = 9
    assert "<urn:s2>" not in set(df["s"])
    assert "<urn:s6>" not in set(df["s"])
    assert "<urn:s10>" not in set(df["s"])
    assert len(df) == 9


def test_bind_expressions(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d ?L ?n ?dt WHERE {
              ?d ex:label ?l ; ex:charCount ?c .
              BIND(UCASE(STR(?l)) AS ?L)
              BIND(STRLEN(?l) AS ?n)
              BIND(DATATYPE(?c) AS ?dt)
              FILTER(REGEX(STR(?d), "d1$"))
            }""",
        num_partitions=4,
    )
    df = res.to_pandas()
    assert df["L"].tolist() == ['"DOC 1"']
    assert df["n"].tolist() == [f'"5"^^{XSD_INT}']
    assert df["dt"].tolist() == [XSD_INT]


def test_bind_lang_and_concat(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT DISTINCT ?tag WHERE {
              ?d ex:label ?l .
              BIND(CONCAT("lang=", LANG(?l)) AS ?tag)
            }""",
        num_partitions=4,
    )
    assert _col(res, "tag") == ['"lang=en"', '"lang=fr"']


def test_describe_iri_with_bnode_closure(sparql_index):
    res = sparql_query(sparql_index, PFX + "DESCRIBE ex:d0", num_partitions=4)
    df = res.to_pandas()
    subs = df["subj"].value_counts().to_dict()
    # d0: type, charCount, label, mentions e1, linksTo d1, note _:n1
    assert subs[_subj(0)] == 6
    # the bnode object is described too (DescribeBNodeClosure)
    bn = [s for s in subs if s.startswith("_:")]
    assert len(bn) == 1 and subs[bn[0]] == 1
    assert '"hi"' in set(df["obj"])


def test_describe_where(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + 'DESCRIBE ?d WHERE { ?d ex:mentions ex:e2 . '
              'FILTER(REGEX(STR(?d), "d4$")) }',
        num_partitions=4,
    )
    df = res.to_pandas()
    assert set(df["subj"]) == {_subj(4)}
    assert len(df) == 4  # type, charCount, label, mentions e2


def test_path_sequence_and_inverse(sparql_index):
    # d0 linksTo/linksTo d2; inverse: who links to d2?
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?y WHERE { ex:d0 ex:linksTo/ex:linksTo ?y }",
        num_partitions=4,
    )
    assert _col(res, "y") == [_subj(2)]
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?x WHERE { ex:d2 ^ex:linksTo ?x }",
        num_partitions=4,
    )
    assert _col(res, "x") == [_subj(1)]


def test_path_zero_or_more_and_inverse_closure(sparql_index):
    res = sparql_query(
        sparql_index, PFX + "SELECT ?y WHERE { ex:d2 ex:linksTo* ?y }",
        num_partitions=4,
    )
    assert _col(res, "y") == [_subj(2), _subj(3), _subj(4)]
    res = sparql_query(
        sparql_index, PFX + "SELECT ?y WHERE { ex:d2 ^ex:linksTo+ ?y }",
        num_partitions=4,
    )
    assert _col(res, "y") == [_subj(0), _subj(1)]


def test_having_and_median_mode(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?e (COUNT(*) AS ?n) (MEDIAN(?c) AS ?med)
                      (MODE(?l) AS ?toplang)
            WHERE { ?d ex:mentions ?e ; ex:charCount ?c ; ex:label ?l }
            GROUP BY ?e HAVING(?n >= 4)""",
        num_partitions=4,
    )
    df = res.to_pandas().set_index("e")
    assert len(df) == 2
    # e1: d0..d3 → median of 0,100,200,300 = 150; e2: 200..500 → 350
    assert df.loc["<http://ex.org/e1>", "med"] == 150.0
    assert df.loc["<http://ex.org/e2>", "med"] == 350.0
    # labels of d0..d3: en,fr,en,fr → mode ties break to smallest term
    assert df.loc["<http://ex.org/e1>", "toplang"].startswith('"Doc 0"')

    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?e (COUNT(*) AS ?n) WHERE { ?d ex:mentions ?e }
            GROUP BY ?e HAVING(?n > 10)""",
        num_partitions=4,
    )
    assert len(res.to_pandas()) == 0


def test_path_zero_or_one(sparql_index):
    res = sparql_query(
        sparql_index, PFX + "SELECT ?y WHERE { ex:d2 ex:linksTo? ?y }",
        num_partitions=4,
    )
    assert _col(res, "y") == [_subj(2), _subj(3)]


def test_explain_plan_tree():
    """arq --explain / the fork's tdbqueryplan shape: SSE op tree with the
    BGP shown in executor join order (most-bound-first here)."""
    from jena_ray.sparql import explain

    plan = explain(
        PFX
        + """SELECT DISTINCT ?d WHERE {
              ?d ex:charCount ?c ; a ex:Document .
              FILTER(?c >= 100)
            } ORDER BY ?d LIMIT 3"""
    )
    assert plan.index("(slice") < plan.index("(order") < plan.index(
        "(distinct") < plan.index("(project") < plan.index("(filter")
    # most-bound-first: the 2-bound type pattern precedes the 1-bound one
    assert plan.index("rdf-syntax-ns#type>") < plan.index("charCount>")
    assert "(triple ?d <http://ex.org/charCount> ?c)" in plan


def test_parse_query_bnodes_as_variables():
    q = parse_query(PFX + "SELECT ?v WHERE { [] ex:num ?v . _:a ex:p _:a }")
    pats = q.where.patterns
    assert pats[0][0].startswith("?__bn")
    assert pats[1][0] == pats[1][2]  # same label → same variable
    assert pats[1][0].startswith("?__bl")


def test_filter_disjunction(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d ?c WHERE {
              ?d ex:charCount ?c .
              FILTER(?c < 200 || ?c > 700)
            }""",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(i) for i in (0, 1, 8, 9)]


def test_filter_nested_bool_and_type_checks(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX
        + """SELECT ?d WHERE {
              ?d ex:label ?l ; ex:charCount ?c .
              FILTER((LANG(?l) = "fr" && ?c >= 500) || ?c = 0)
            }""",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(i) for i in (0, 5, 7, 9)]

    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?o WHERE { ex:d0 ?p ?o . FILTER(isBlank(?o)) }",
        num_partitions=4,
    )
    vals = _col(res, "o")
    assert len(vals) == 1 and vals[0].startswith("_:")

    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?o WHERE { ex:d0 ?p ?o . FILTER(isNumeric(?o)) }",
        num_partitions=4,
    )
    assert _col(res, "o") == [f'"0"^^{XSD_INT}']


def test_construct_where_shorthand(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "CONSTRUCT WHERE { ?d ex:mentions ex:e1 }",
        num_partitions=4,
    )
    df = res.to_pandas()
    assert len(df) == 4
    assert set(df["pred"]) == {"<http://ex.org/mentions>"}


# ------------------------------------------------- round-3 expression breadth

def test_ground_ask_multi_pattern(sparql_index):
    """Fully-ground ASK with several conjuncts — each is an independent
    existence probe AND'd together (same or different subjects)."""
    def ask(body):
        res = sparql_query(sparql_index, PFX + "ASK { " + body + " }",
                           num_partitions=4)
        return res.column("ask").to_pylist()[0]

    assert ask("ex:d2 ex:mentions ex:e1 . ex:d2 ex:mentions ex:e2") is True
    assert ask("ex:d0 ex:mentions ex:e1 . ex:d5 ex:mentions ex:e2") is True
    assert ask("ex:d0 ex:mentions ex:e1 . ex:d0 ex:mentions ex:e2") is False


def test_filter_typed_numeric_constant_equality(sparql_index):
    """'=' against an XSD-numeric constant compares by VALUE (E_Equals
    numeric promotion) — non-canonical lexicals and sibling datatypes
    match (the sameTerm shortcut would miss both)."""
    for const in ('"200"^^xsd:integer', '"0200"^^xsd:integer',
                  '"200"^^xsd:int', "200"):
        res = sparql_query(
            sparql_index,
            "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n" + PFX
            + "SELECT ?d WHERE { ?d ex:charCount ?c . FILTER(?c = "
            + const + ") }",
            num_partitions=4,
        )
        assert _col(res, "d") == [_subj(2)], const


def test_filter_arithmetic(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:charCount ?c . "
              "FILTER(?c / 100 + 1 > 9) }",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(9)]
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:charCount ?c . "
              "FILTER((?c + 100) * 2 >= 1800) }",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(8), _subj(9)]
    # var-to-var arithmetic comparison across two bindings
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?a WHERE { ?a ex:linksTo ?b . ?a ex:charCount ?ca . "
              "?b ex:charCount ?cb . FILTER(?cb - ?ca = 100) }",
        num_partitions=4,
    )
    assert _col(res, "a") == [_subj(i) for i in range(4)]


def test_filter_in_not_in(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:mentions ?e . "
              "FILTER(?e IN (ex:e2, ex:nosuch)) }",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(i) for i in (2, 3, 4, 5)]
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:mentions ?e . "
              "FILTER(?e NOT IN (ex:e2)) }",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(i) for i in range(4)]
    # numeric IN uses value comparison
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:charCount ?c . FILTER(?c IN (100, 300)) }",
        num_partitions=4,
    )
    assert _col(res, "d") == [_subj(1), _subj(3)]


def test_filter_and_order_datetime(sparql_index):
    q = ("PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n" + PFX
         + "SELECT ?d WHERE { ?d ex:created ?t . "
           'FILTER(?t > "2024-01-02T00:00:00Z"^^xsd:dateTime) }')
    res = sparql_query(sparql_index, q, num_partitions=4)
    assert _col(res, "d") == [_subj(7), _subj(8), _subj(9)]
    # temporal ORDER BY (value, not lexical): descending
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:created ?t } ORDER BY DESC(?t) LIMIT 2",
        num_partitions=4,
    )
    assert [r["d"] for r in res.to_pandas().to_dict("records")] == [
        _subj(9), _subj(8)
    ]


def test_min_max_non_numeric_terms(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?e (MIN(?d) AS ?lo) (MAX(?d) AS ?hi) "
              "WHERE { ?d ex:mentions ?e } GROUP BY ?e ORDER BY ?e",
        num_partitions=4,
    )
    df = res.to_pandas()
    assert list(df["lo"]) == [_subj(0), _subj(2)]
    assert list(df["hi"]) == [_subj(3), _subj(5)]


def test_bind_arithmetic_if_coalesce(sparql_index):
    # arithmetic BIND: integral results are exact xsd:integer terms
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d ?k WHERE { ?d ex:charCount ?c . "
              "BIND(?c / 100 + 1 AS ?k) } ORDER BY ?d LIMIT 3",
        num_partitions=4,
    )
    df = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
    assert list(df["k"]) == [
        f'"{i + 1}"^^<http://www.w3.org/2001/XMLSchema#integer>'
        for i in range(3)
    ]
    # IF with a FILTER-grammar condition choosing string literals
    res = sparql_query(
        sparql_index,
        PFX + 'SELECT ?d ?size WHERE { ?d ex:charCount ?c . '
              'BIND(IF(?c >= 500, "long", "short") AS ?size) }',
        num_partitions=4,
    )
    df = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
    sizes = dict(zip(df["d"], df["size"]))
    assert sizes[_subj(2)] == '"short"'
    assert sizes[_subj(7)] == '"long"'
    # COALESCE over an OPTIONAL-unbound variable
    res = sparql_query(
        sparql_index,
        PFX + 'SELECT ?d ?w WHERE { ?d ex:charCount ?c . '
              "OPTIONAL { ?d ex:created ?t } "
              'BIND(COALESCE(?t, "unknown") AS ?w) }',
        num_partitions=4,
    )
    df = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
    w = dict(zip(df["d"], df["w"]))
    assert w[_subj(0)] == '"unknown"'
    assert w[_subj(6)].startswith('"2024-01-01T12:00:00Z"')


def test_bind_arithmetic_division_by_zero_unbinds(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d ?k WHERE { ?d ex:charCount ?c . "
              "BIND(100 / ?c AS ?k) } ORDER BY ?d LIMIT 2",
        num_partitions=4,
    )
    df = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
    assert df["k"].isna().tolist() == [True, False]  # d0 has c=0


def test_subquery_aggregate_then_join(sparql_index):
    """{ SELECT (MAX ...) } aggregate-then-join: docs whose charCount equals
    the per-entity maximum over mentioning docs."""
    q = PFX + """
    SELECT ?e ?d WHERE {
      ?d ex:mentions ?e .
      ?d ex:charCount ?c .
      { SELECT ?e (MAX(?c2) AS ?mx) WHERE {
          ?d2 ex:mentions ?e . ?d2 ex:charCount ?c2 } GROUP BY ?e }
      FILTER(?c = ?mx)
    }
    """
    res = sparql_query(sparql_index, q, num_partitions=4)
    df = res.to_pandas()
    got = sorted(zip(df["e"], df["d"]))
    assert got == [
        ("<http://ex.org/e1>", _subj(3)),
        ("<http://ex.org/e2>", _subj(5)),
    ]


def test_subquery_alone_with_modifiers(sparql_index):
    """A group that IS a subquery (with ORDER/LIMIT inside)."""
    q = PFX + """
    SELECT ?d WHERE {
      { SELECT ?d WHERE { ?d ex:mentions ex:e1 } ORDER BY ?d LIMIT 2 }
    }
    """
    res = sparql_query(sparql_index, q, num_partitions=4)
    assert _col(res, "d") == [_subj(0), _subj(1)]


def test_subquery_select_star(sparql_index):
    """Subquery SELECT * projects every visible variable of its own WHERE
    (Query.setResultVars; the ARQ SubQuery suite exercises it)."""
    q = PFX + "SELECT ?d WHERE { { SELECT * WHERE { ?d ex:mentions ?e } } }"
    res = sparql_query(sparql_index, q, num_partitions=4)
    assert len(_col(res, "d")) > 0


def test_subquery_rejects_disconnected(sparql_index):
    """A subquery sharing no variable with the enclosing group is a
    cartesian product — rejected loudly, not silently computed."""
    bad = (PFX + "SELECT ?d WHERE { ?d ex:charCount ?c . "
                 "{ SELECT ?x WHERE { ?x ex:mentions ex:e1 } } }")
    with pytest.raises((SparqlSyntaxError, ValueError)):
        res = sparql_query(sparql_index, bad, num_partitions=4)
        res.to_pandas() if hasattr(res, "to_pandas") else None


def test_path_alternation(sparql_index):
    """p1|p2 (P_Alt) — union of the per-predicate scans, join-able with
    other patterns."""
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d ?o WHERE { ?d ex:mentions|ex:linksTo ?o . "
              "?d ex:charCount ?c . FILTER(?c < 200) }",
        num_partitions=4,
    )
    df = res.to_pandas()
    got = sorted(zip(df["d"], df["o"]))
    assert got == [
        (_subj(0), _subj(1)), (_subj(0), "<http://ex.org/e1>"),
        (_subj(1), _subj(2)), (_subj(1), "<http://ex.org/e1>"),
    ]


def test_path_negated_property_set(sparql_index):
    """!(...) (P_NegPropSet) — open predicate scan minus the excluded set."""
    T = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    res = sparql_query(
        sparql_index,
        PFX + "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
        "SELECT ?p2 WHERE { ?s !(rdf:type|ex:charCount|ex:label"
        "|ex:mentions|ex:linksTo) ?o . ?s ?p2 ?o }",
        num_partitions=4,
    )
    # remaining predicates: note, text, created — ?p2 re-binds them
    assert set(_col(res, "p2")) == {
        "<http://ex.org/note>", "<http://ex.org/text>",
        "<http://ex.org/created>",
    }


def test_path_alternation_rejects_mixing():
    for bad in (
        PFX + "SELECT ?o WHERE { ex:d0 ex:a/ex:b|ex:c ?o }",
        PFX + "SELECT ?o WHERE { ex:d0 ^ex:a|ex:b ?o }",
        PFX + "SELECT ?o WHERE { ex:d0 ex:a+|ex:b ?o }",
    ):
        with pytest.raises(SparqlSyntaxError):
            parse_query(bad)


def test_construct_bnode_template(sparql_index):
    """Template bnodes allocate a FRESH node per solution (Template.java
    remapping): one bnode per mention row, shared across the two template
    triples of that solution."""
    q = PFX + """
    CONSTRUCT { ?d ex:hasMention _:m . _:m ex:of ?e }
    WHERE { ?d ex:mentions ?e }
    """
    res = sparql_query(sparql_index, q, num_partitions=4)
    df = res.to_pandas()
    has_m = df[df["pred"] == "<http://ex.org/hasMention>"]
    of_e = df[df["pred"] == "<http://ex.org/of>"]
    # 8 mention solutions → 8 fresh bnodes, each in exactly two triples
    assert len(has_m) == 8 and len(of_e) == 8
    assert has_m["obj"].str.startswith("_:").all()
    assert of_e["subj"].str.startswith("_:").all()
    assert set(has_m["obj"]) == set(of_e["subj"])
    assert has_m["obj"].nunique() == 8


def test_path_fixed_length_desugars():
    """ARQ p{n} (P_FixedLength) desugars to an n-step chain; {n,m} ranges
    and {0} are rejected loudly."""
    q = parse_query(PFX + "SELECT ?x WHERE { ?x ex:p{2} ?y . }")
    assert q.where.patterns == [
        ("?x", "<http://ex.org/p>", "?__seq0"),
        ("?__seq0", "<http://ex.org/p>", "?y"),
    ]
    # composes with '/' sequences and '^' inverse
    q2 = parse_query(PFX + "SELECT ?x WHERE { ?x ex:a/ex:p{2} ?y }")
    assert len(q2.where.patterns) == 3
    # {n,m} ranges survive to the path layer as a range mod
    q3 = parse_query(PFX + "SELECT ?y WHERE { ex:s ex:p{1,3} ?y }")
    assert q3.where.paths == [
        ("<http://ex.org/s>", "<http://ex.org/p>", "?y", ("range", 1, 3), False)
    ]
    for bad in ("{ ?x ex:p{0} ?y }", "{ ?x ex:p{3,1} ?y }",
                "{ ?x ex:p{1,40} ?y }", "{ ?x ex:a/ex:p{1,3} ?y }"):
        with pytest.raises(SparqlSyntaxError):
            parse_query(PFX + "SELECT * WHERE " + bad)


def test_path_range_executes(sparql_index):
    """p{n,m} = distinct union of the k-step chains over the linksTo chain
    d0→d1→d2→d3→d4."""
    got = sparql_query(
        sparql_index,
        PFX + "SELECT ?x WHERE { "
        "<http://ex.org/d0> ex:linksTo{1,3} ?x } ORDER BY ?x",
    ).to_pandas()
    assert list(got["x"]) == [
        "<http://ex.org/d1>", "<http://ex.org/d2>",
        "<http://ex.org/d3>",
    ]
    got2 = sparql_query(
        sparql_index,
        PFX + "SELECT ?x WHERE { "
        "<http://ex.org/d0> ex:linksTo{2,2} ?x }",
    ).to_pandas()
    assert list(got2["x"]) == ["<http://ex.org/d2>"]
    # inverse range walks the chain backwards from d3
    got3 = sparql_query(
        sparql_index,
        PFX + "SELECT ?x WHERE { "
        "<http://ex.org/d3> ^ex:linksTo{1,2} ?x } ORDER BY ?x",
    ).to_pandas()
    assert list(got3["x"]) == [
        "<http://ex.org/d1>", "<http://ex.org/d2>",
    ]


def test_path_fixed_length_executes(sparql_index):
    """p{1} equals the plain pattern (same result set end-to-end)."""
    a = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:mentions{1} ex:e1 } ORDER BY ?d",
    ).to_pandas()
    b = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:mentions ex:e1 } ORDER BY ?d",
    ).to_pandas()
    assert a.equals(b)


def test_ungrouped_aggregates(sparql_index):
    """Aggregates without GROUP BY form ONE implicit group; zero solutions
    still yield one row (COUNT/SUM -> 0, MIN -> unbound)."""
    res = sparql_query(
        sparql_index,
        PFX + "SELECT (COUNT(*) AS ?n) (SUM(?c) AS ?t) (MIN(?c) AS ?lo) "
        "WHERE { ?d ex:charCount ?c }",
    ).to_pandas()
    assert res["n"].tolist() == [10]
    assert int(res["t"].iloc[0]) == 4500  # 0+100+...+900
    assert float(res["lo"].iloc[0]) == 0.0
    # empty solution set
    res2 = sparql_query(
        sparql_index,
        PFX + "SELECT (COUNT(*) AS ?n) (SUM(?c) AS ?t) (MIN(?c) AS ?lo) "
        "WHERE { ?d ex:nosuch ?c }",
    ).to_pandas()
    assert res2["n"].tolist() == [0]
    assert int(res2["t"].iloc[0]) == 0
    assert res2["lo"].isna().all()


def test_var_var_value_ordering_filter(sparql_index):
    """FILTER(?a < ?b) over two variables compares by VALUE per space:
    numeric pairs numerically, dateTime pairs by instant, simple-string
    pairs by codepoint; mixed-space pairs are type errors (dropped)."""
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?x ?y WHERE { ?x ex:charCount ?a . ?y ex:charCount "
        "?b . FILTER(?a < ?b) }",
    )
    assert res.count() == 45  # 10 choose 2 ordered pairs
    res2 = sparql_query(
        sparql_index,
        PFX + "SELECT ?x ?y WHERE { ?x ex:created ?a . ?y ex:created ?b . "
        "FILTER(?a < ?b) }",
    )
    assert res2.count() == 6  # d6..d9: 4 choose 2


def test_offset_without_limit(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d ?c WHERE { ?d ex:charCount ?c } ORDER BY ?c "
        "OFFSET 7",
    )
    df = res.to_pandas() if not hasattr(res, "to_pandas") or not callable(
        getattr(res, "to_pandas", None)) else res.to_pandas()
    vals = sorted(float(v.split('"')[1]) for v in df["c"])
    assert vals == [700.0, 800.0, 900.0]


def test_construct_over_optional_where(sparql_index):
    """CONSTRUCT with an OPTIONAL WHERE: unbound template vars skip just
    their entries (TemplateLib.subst null-skip)."""
    res = sparql_query(
        sparql_index,
        PFX + "CONSTRUCT { ?d ex:hasDate ?t . ?d ex:seen true } "
        "WHERE { ?d ex:charCount ?c OPTIONAL { ?d ex:created ?t } }",
    )
    df = res.to_pandas()
    dated = df[df["pred"] == "<http://ex.org/hasDate>"]
    seen = df[df["pred"] == "<http://ex.org/seen>"]
    assert len(dated) == 4  # only d6..d9 carry ex:created
    assert len(seen) == 10


def test_exists_conjunct_filter(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?d WHERE { ?d ex:charCount ?c . "
        "FILTER(?c >= 0 && NOT EXISTS { ?d ex:mentions ex:e1 }) }",
    )
    # d0..d3 mention e1 -> excluded
    assert res.count() == 6


def test_having_expression(sparql_index):
    res = sparql_query(
        sparql_index,
        PFX + "SELECT ?e (COUNT(*) AS ?n) WHERE { ?d ex:mentions ?e } "
        "GROUP BY ?e HAVING (COUNT(*)*10 >= 40)",
    ).to_pandas()
    assert sorted(res["e"]) == ["<http://ex.org/e1>", "<http://ex.org/e2>"]
