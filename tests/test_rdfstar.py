"""RDF-star: quoted triples (Node_Triple) as first-class terms.

Mirrors the reference's parse suites (jena-arq rdf_star/TestNTriplesStarParse
.java, TestTurtleStarParse.java, TestNQuadsStarParse.java,
TestSPARQLStarParse.java) — good cases parse to quoted-triple TERMS in
canonical ``<< <s> <p> <o> >>`` form, bad cases raise. The engine treats a
quoted triple as an opaque canonical term string: it hashes, indexes, joins
and writes like any other term."""

import pytest

import jena_ray.term as T
from jena_ray.term import TermError
from jena_ray.turtle import parse_turtle


QT = "<< <x:s> <x:p> <x:o> >>"


# ---------------------------------------------------------------- N-Triples

def test_nt_star_subject():
    # TestNTriplesStarParse.parse_nt_good_1 (double-quoted literal: strict NT)
    out = T.parse_ntriples('<<<x:s> <x:p> <x:o>>> <x:q> "1" . ')
    assert out == [(QT, "<x:q>", '"1"')]


def test_nt_star_object():
    out = T.parse_ntriples("<http://ex/x> <http://ex/p> <<<x:s> <x:p> <x:o>>> .")
    assert out == [("<http://ex/x>", "<http://ex/p>", QT)]


def test_nt_star_bnodes_inside():
    # parse_nt_good_3
    out = T.parse_ntriples("_:b <x:p> <<_:b <x:p> _:o>>. ")
    assert out == [("_:b", "<x:p>", "<< _:b <x:p> _:o >>")]


def test_nt_star_nested():
    # parse_nt_good_4
    out = T.parse_ntriples(
        '<< << <x:s> <x:p> <x:o> >> <x:q> "1" >> <x:q> "2" .'
    )
    assert out == [(f'<< {QT} <x:q> "1" >>', "<x:q>", '"2"')]


def test_nt_star_statement_is_not_a_triple():
    # parse_nt_bad_1: a quoted triple alone is a term, not a statement
    with pytest.raises(TermError):
        T.parse_ntriples("<<<x:s> <x:p> <x:o>>> . ")


def test_nt_star_literal_subject_rejected():
    # parse_nt_bad_2 (with strict-NT double quotes)
    with pytest.raises(TermError):
        T.parse_ntriples('<<"str" <x:p> <x:o>>> <x:p> <x:o>. ')


def test_nt_star_predicate_position_rejected():
    with pytest.raises(TermError):
        T.parse_ntriples("<x:s> <<<x:a> <x:b> <x:c>>> <x:o> .")


def test_nt_star_skolemizes_inner_bnodes():
    out = T.parse_ntriples(
        "_:b <x:p> <<_:b <x:p> _:o>>. ", skolem_seed=b"\x01" * 16
    )
    (s, p, o) = out[0]
    assert s.startswith("_:") and not s.endswith(":b")
    inner_s, inner_p, inner_o = T.quoted_triple_parts(o)
    assert inner_s == s  # same label → same skolem
    assert inner_p == "<x:p>"
    assert inner_o.startswith("_:") and inner_o != inner_s


def test_nquads_star():
    out = T.parse_nquads(
        "<<<x:s> <x:p> <x:o>>> <x:q> \"1\" <http://g> .\n"
        "<x:a> <x:q> <<<x:s> <x:p> <x:o>>> ."
    )
    assert out[0] == ("<http://g>", QT, "<x:q>", '"1"')
    assert out[1][0] == "<urn:x-arq:DefaultGraph>"
    assert out[1][3] == QT


# ---------------------------------------------------------------- helpers

def test_term_kind_and_parts():
    assert T.term_kind(QT) == "triple"
    assert T.term_kind("<x:s>") == "iri"
    s, p, o = T.quoted_triple_parts(QT)
    assert (s, p, o) == ("<x:s>", "<x:p>", "<x:o>")
    nested = f'<< {QT} <x:q> "1" >>'
    s2, p2, o2 = T.quoted_triple_parts(nested)
    assert s2 == QT and p2 == "<x:q>" and o2 == '"1"'
    assert T.namespace_of(QT) is None


# ---------------------------------------------------------------- Turtle

TTL_PFX = "@prefix : <http://example/> .\n"


def _ttl(doc: str):
    return parse_turtle(TTL_PFX + doc)


def _t(local: str) -> str:
    return f"<http://example/{local}>"


def test_turtle_star_subject():
    # TestTurtleStarParse.parse_turtle_good_1
    out = _ttl("<<:s :p :o>> :q 1 . ")
    qt = f"<< {_t('s')} {_t('p')} {_t('o')} >>"
    assert out == [(qt, _t("q"), '"1"^^<http://www.w3.org/2001/XMLSchema#integer>')]


def test_turtle_star_object():
    out = _ttl(":x :p <<:s :p :o>> . ")
    assert out[0][2] == f"<< {_t('s')} {_t('p')} {_t('o')} >>"


def test_turtle_star_in_bnode_property_list():
    # parse_turtle_good_3
    out = _ttl(":x :p [ :q <<:s :p :o>> ]. ")
    assert len(out) == 2
    assert any(o == f"<< {_t('s')} {_t('p')} {_t('o')} >>" for _, _, o in out)


def test_turtle_star_in_collection():
    # parse_turtle_good_4 / good_5 (ANON inside the quoted triple)
    out = _ttl("( <<:s :p :o>> ) :p :z . ")
    assert any(o.startswith("<< ") for _, _, o in out)
    out = _ttl("( <<[] :p []>> ) :p :z . ")
    assert any(o.startswith("<< _:G") for _, _, o in out)


def test_turtle_star_nested():
    # parse_turtle_good_10 / good_20
    out = _ttl("<<:s :p <<:x :r :z >>>> :q 1 . ")
    inner = f"<< {_t('x')} {_t('r')} {_t('z')} >>"
    assert out[0][0] == f"<< {_t('s')} {_t('p')} {inner} >>"
    out = _ttl(":a :p <<:s :p <<:x :r :z >>>> . ")
    assert out[0][2] == f"<< {_t('s')} {_t('p')} {inner} >>"


@pytest.mark.parametrize(
    "doc",
    [
        "<<:s :p :o>> . ",            # bad_1: term as statement
        "<<:s <<:x :y :z>> :o >> :q 1 . ",  # bad_2: qt as predicate
        "<<:s :p (3) >> :q 1 . ",     # bad_3: collection inside
        "<< 3 :p :o >> :q 1 . ",      # bad_4: literal subject
        ":s << :x :y :z >> :o . ",    # bad_5: qt in predicate position
        "<<:s :p [ :q :o ] >> :q 1 . ",  # property list inside
    ],
)
def test_turtle_star_bad(doc):
    with pytest.raises(TermError):
        _ttl(doc)


# ---------------------------------------------------------------- writers

def test_nt_writer_round_trip():
    from jena_ray.sources.ntriples import format_nt_batch
    import pyarrow as pa

    tb = pa.table({"subj": [QT], "pred": ["<x:q>"], "obj": ['"1"']})
    line = format_nt_batch(tb).column("text")[0].as_py()
    assert line == f'{QT} <x:q> "1" .'
    assert T.parse_ntriples(line) == [(QT, "<x:q>", '"1"')]


def test_turtle_writer_verbatim():
    from jena_ray.writers import serialize_turtle

    doc = serialize_turtle([(QT, "<x:q>", '"1"')], {})
    assert parse_turtle(doc) == [(QT, "<x:q>", '"1"')]


def test_trix_writer_rejects_quoted_triples():
    from jena_ray.writers import serialize_trix

    with pytest.raises(TermError):
        serialize_trix([("<urn:x-arq:DefaultGraph>", QT, "<x:q>", '"1"')])


# ---------------------------------------------------------------- SPARQL

def test_sparql_parses_ground_quoted_triple(tmp_path):
    """Ground quoted triples are terms: data asserting one is queryable by
    the same term written in the query (sameTerm id-space match)."""
    import ray.data as rd

    from jena_ray.sparql import sparql_query
    from jena_ray.stages.materialize import materialize_indexes

    nt = (
        '<<<x:s> <x:p> <x:o>>> <x:conf> "0.9" .\n'
        "<x:s> <x:p> <x:o> .\n"
    )
    triples = T.parse_ntriples(nt)
    out_dir = str(tmp_path / "idx")
    rd.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in triples]
    ).write_parquet(str(tmp_path / "idx/triples"))
    materialize_indexes(out_dir, num_buckets=4)

    res = sparql_query(
        out_dir,
        'SELECT ?c WHERE { << <x:s> <x:p> <x:o> >> <x:conf> ?c }',
    )
    rows = res.to_pandas()
    assert list(rows["c"]) == ['"0.9"']


def test_sparql_star_variable_pattern_limits():
    """Variable quoted triples parse as embedded patterns with a
    placeholder; out-of-subset shapes still raise loudly."""
    from jena_ray.sparql import Parser, SparqlSyntaxError

    q = Parser(
        "SELECT ?s WHERE { << ?s <x:p> <x:o> >> <x:q> ?z }"
    ).parse_query()
    assert q.where.star == [("?__qt0", "?s", "<x:p>", "<x:o>")]
    assert q.where.patterns == [("?__qt0", "<x:q>", "?z")]
    for bad in (
        # nested variable quoted triple
        "SELECT * WHERE { << << ?a <x:p> <x:o> >> <x:p> <x:o> >> <x:q> ?z }",
        # component var reused in another pattern (needs an id-space join)
        "SELECT * WHERE { << ?s <x:p> ?o >> <x:q> ?z . ?s <x:r> ?w }",
        # component var in a FILTER
        "SELECT * WHERE { << ?s <x:p> ?o >> <x:q> ?z . "
        'FILTER(STR(?o) = "x") }',
        # variable quoted triple in VALUES
        "SELECT * WHERE { ?t <x:q> ?z . VALUES ?t { << ?a <x:p> <x:o> >> } }",
        # variable quoted triple in a CONSTRUCT template
        "CONSTRUCT { << ?s <x:p> ?o >> <x:q> ?z } "
        "WHERE { ?s <x:p> ?o . ?s <x:q2> ?z }",
    ):
        with pytest.raises(SparqlSyntaxError):
            qq = Parser(bad).parse_query()
            # some shapes only fail at execution planning
            from jena_ray.sparql import _execute_star_where

            _execute_star_where(
                "/nonexistent", qq, ["s", "o", "z"], distinct=True,
                num_partitions=2, pf_context=None, stats=False,
            )


def test_sparql_star_variable_patterns_execute(tmp_path, ray_session):
    """<< ?s ?p ?o >> provenance decompose: component vars bind from the
    quoted-triple term; ground components filter; repeated vars must
    agree."""
    import ray.data as rd

    from jena_ray.sparql import sparql_query
    from jena_ray.stages.materialize import materialize_indexes

    nt = (
        '<<<x:s> <x:p> <x:o>>> <x:conf> "0.9" .\n'
        '<<<x:s2> <x:p> <x:s2>>> <x:conf> "0.5" .\n'
        '<<<x:s3> <x:q> <x:o3>>> <x:conf> "0.7" .\n'
        '<x:plain> <x:conf> "0.1" .\n'
    )
    triples = T.parse_ntriples(nt)
    out_dir = str(tmp_path / "idx")
    rd.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in triples]
    ).write_parquet(str(tmp_path / "idx/triples"))
    materialize_indexes(out_dir, num_buckets=4)

    # full decompose: every asserted-via-conf quoted triple, all components
    res = sparql_query(
        out_dir,
        "SELECT ?s ?p ?o ?c WHERE { << ?s ?p ?o >> <x:conf> ?c } ORDER BY ?c",
    ).to_pandas()
    assert list(res["s"]) == ["<x:s2>", "<x:s3>", "<x:s>"]
    assert list(res["p"]) == ["<x:p>", "<x:q>", "<x:p>"]
    assert list(res["o"]) == ["<x:s2>", "<x:o3>", "<x:o>"]

    # ground predicate component filters to the <x:p> statements
    res2 = sparql_query(
        out_dir,
        "SELECT ?s ?c WHERE { << ?s <x:p> ?o >> <x:conf> ?c } ORDER BY ?c",
    ).to_pandas()
    assert list(res2["s"]) == ["<x:s2>", "<x:s>"]

    # repeated component variable → equality within the quoted triple
    res3 = sparql_query(
        out_dir,
        "SELECT ?s WHERE { << ?s <x:p> ?s >> <x:conf> ?c }",
    ).to_pandas()
    assert list(res3["s"]) == ["<x:s2>"]


def test_sparql_star_builtins(tmp_path):
    """isTRIPLE filter + SUBJECT/PREDICATE/OBJECT/TRIPLE builtins
    (E_IsTriple / E_TripleSubject / E_TripleFn lineage)."""
    import ray.data as rd

    from jena_ray.sparql import sparql_query
    from jena_ray.stages.materialize import materialize_indexes

    nt = (
        '<<<x:s> <x:p> <x:o>>> <x:conf> "0.9" .\n'
        '<x:s2> <x:conf> "0.5" .\n'
    )
    triples = T.parse_ntriples(nt)
    out_dir = str(tmp_path / "idx")
    rd.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in triples]
    ).write_parquet(str(tmp_path / "idx/triples"))
    materialize_indexes(out_dir, num_buckets=4)

    res = sparql_query(
        out_dir,
        "SELECT ?t ?ss WHERE { ?t <x:conf> ?c . FILTER(isTRIPLE(?t)) "
        "BIND(SUBJECT(?t) AS ?ss) }",
    ).to_pandas()
    assert list(res["t"]) == [QT]
    assert list(res["ss"]) == ["<x:s>"]

    res2 = sparql_query(
        out_dir,
        "SELECT ?t ?o WHERE { ?t <x:conf> ?c . FILTER(!isTRIPLE(?t)) "
        "BIND(OBJECT(?t) AS ?o) }",
    ).to_pandas()
    assert list(res2["t"]) == ["<x:s2>"]
    assert res2["o"].isna().all()  # OBJECT of a non-triple errors → unbound

    res3 = sparql_query(
        out_dir,
        "SELECT ?qt WHERE { ?t <x:conf> ?c . FILTER(isTRIPLE(?t)) "
        "BIND(TRIPLE(?t, <x:q>, ?c) AS ?qt) }",
    ).to_pandas()
    assert list(res3["qt"]) == [f'<< {QT} <x:q> "0.9" >>']
