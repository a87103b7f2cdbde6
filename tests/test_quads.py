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


def test_graph_trailing_permutations(ray_session, tmp_path_factory):
    """Graph-UNBOUND scans with s/p/o bound must touch ONLY the
    graph-trailing permutation (Names.java POSG/OSPG/SPOG — round-5):
    proven by deleting every other permutation dir and asserting the scan
    still answers, bucket-pruned."""
    import os
    import shutil

    import ray.data as rd

    from jena_ray.stages.quads import (
        QUAD_ALL_ORDERS,
        materialize_quad_indexes,
        pick_quad_order,
        quad_pattern_scan,
    )

    # pure index choice: all eight binding shapes
    assert pick_quad_order({"graph", "subj"}) == "gspo"
    assert pick_quad_order({"graph", "pred"}) == "gpos"
    assert pick_quad_order({"graph", "obj"}) == "gosp"
    assert pick_quad_order({"graph"}) == "gspo"
    assert pick_quad_order({"subj"}) == "spog"
    assert pick_quad_order({"pred", "obj"}) == "posg"
    assert pick_quad_order({"obj"}) == "ospg"
    assert pick_quad_order(set()) == "gspo"

    rows = [
        {"graph": f"<urn:g{i % 4}>", "subj": f"<urn:s{i % 5}>",
         "pred": f"<urn:p{i % 2}>", "obj": f'"{i}"'}
        for i in range(40)
    ]
    base = str(tmp_path_factory.mktemp("gtrail"))
    materialize_quad_indexes(base, rd.from_items(rows), num_buckets=4,
                             min_rows_per_file=10)
    assert all(os.path.isdir(os.path.join(base, o)) for o in QUAD_ALL_ORDERS)

    for keep, kwargs, expect in [
        ("spog", {"s": "<urn:s1>"}, 8),          # s1 appears in i=1,6,..,36
        ("posg", {"p": "<urn:p0>", "o": '"4"'}, 1),
        ("ospg", {"o": '"7"'}, 1),
    ]:
        out = str(tmp_path_factory.mktemp(f"gtrail_{keep}"))
        materialize_quad_indexes(out, rd.from_items(rows), num_buckets=4,
                                 min_rows_per_file=10)
        for o in QUAD_ALL_ORDERS:
            if o != keep:
                shutil.rmtree(os.path.join(out, o))
        got = quad_pattern_scan(out, **kwargs).take_all()
        assert len(got) == expect, (keep, kwargs, len(got))

    # old store without graph-trailing dirs: falls back to the gspo sweep
    for o in ("spog", "posg", "ospg"):
        shutil.rmtree(os.path.join(base, o))
    got = quad_pattern_scan(base, s="<urn:s1>").take_all()
    assert len(got) == 8
