"""TriG parser units, quad isomorphism, quad-store materialize + scan."""

from __future__ import annotations

import pytest

from jena_ray.isomorphism import isomorphic_quads
from jena_ray.term import TermError
from jena_ray.trig import DEFAULT_GRAPH, parse_trig


def test_default_and_named_graphs():
    text = """
    @prefix ex: <http://ex.org/> .
    ex:s ex:p ex:o .
    ex:g1 { ex:a ex:p 1 . ex:b ex:p 2 }
    GRAPH ex:g2 { ex:c ex:p "x" . }
    { ex:d ex:p ex:e }
    """
    quads = parse_trig(text)
    by_graph = {}
    for g, s, p, o in quads:
        by_graph.setdefault(g, []).append((s, p, o))
    assert len(by_graph[DEFAULT_GRAPH]) == 2
    assert len(by_graph["<http://ex.org/g1>"]) == 2
    assert by_graph["<http://ex.org/g2>"] == [
        ("<http://ex.org/c>", "<http://ex.org/p>", '"x"')
    ]


def test_bnode_graph_labels_and_shared_scope():
    text = """
    @prefix ex: <http://ex.org/> .
    _:g { ex:s ex:p _:x . }
    ex:other ex:q _:x .
    """
    quads = parse_trig(text)
    graphs = {g for g, *_ in quads}
    assert any(g.startswith("_:") for g in graphs)
    # _:x is the same node in both graphs (document-wide scope)
    objs = {o for *_, o in quads}
    assert len([o for o in objs if o.startswith("_:")]) == 1


def test_lone_collection_subject_rejected():
    with pytest.raises(TermError):
        parse_trig("( 1 2 ) .")
    with pytest.raises(TermError):
        parse_trig("{ ( 1 2 ) }")
    # lone bnode property list IS allowed
    parse_trig("[ <http://ex.org/p> 1 ] .")


def test_quad_isomorphism():
    a = [("_:g", "<s>", "<p>", "_:x"), ("<urn:g>", "_:x", "<p>", '"1"')]
    b = [("_:h", "<s>", "<p>", "_:y"), ("<urn:g>", "_:y", "<p>", '"1"')]
    c = [("_:h", "<s>", "<p>", "_:y"), ("<urn:g>", "_:z", "<p>", '"1"')]
    assert isomorphic_quads(a, b)
    assert not isomorphic_quads(a, c)


def test_quad_store_roundtrip(ray_session, tmp_path_factory):
    import ray.data as rd

    from jena_ray.stages.quads import materialize_quad_indexes, quad_pattern_scan

    out = str(tmp_path_factory.mktemp("quadstore"))
    rows = []
    for i in range(20):
        g = f"<urn:g{i % 3}>"
        rows.append(
            {"graph": g, "subj": f"<urn:s{i}>", "pred": "<urn:p>", "obj": f'"{i}"'}
        )
    # duplicates must collapse (set semantics)
    rows += rows[:5]
    ds = rd.from_items(rows)
    materialize_quad_indexes(out, ds, num_buckets=4, min_rows_per_file=10)

    allq = quad_pattern_scan(out).take_all()
    assert len(allq) == 20

    g0 = quad_pattern_scan(out, g="<urn:g0>").take_all()
    assert {r["graph"] for r in g0} == {"<urn:g0>"}
    assert len(g0) == 7

    one = quad_pattern_scan(out, g="<urn:g1>", s="<urn:s1>").take_all()
    assert len(one) == 1 and one[0]["obj"] == '"1"'

    po = quad_pattern_scan(out, p="<urn:p>", o='"4"').take_all()
    assert len(po) == 1 and po[0]["subj"] == "<urn:s4>"
