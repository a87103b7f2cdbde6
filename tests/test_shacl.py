"""SHACL core validation vs the reference's vendored WG test files
(jena-shacl/src/test/resources/std/core/*): each file carries data, shapes
and the expected ValidationReport; we compare sh:conforms and the
(focusNode, resultPath, sourceConstraintComponent) set."""

from __future__ import annotations

import os

import pytest

from jena_ray.shacl import Graph, validate
from jena_ray.turtle import parse_turtle

STD = "/root/reference/jena-shacl/src/test/resources/std/core"
SH = "http://www.w3.org/ns/shacl#"
SHT = "http://www.w3.org/ns/shacl-test#"

CASES = [
    ("property", n)
    for n in (
        "minCount-001", "minCount-002", "maxCount-001", "maxCount-002",
        "datatype-001", "datatype-002", "class-001", "nodeKind-001",
        "hasValue-001", "in-001", "pattern-001", "pattern-002",
        "minLength-001", "maxLength-001",
        "maxInclusive-001", "minExclusive-001", "maxExclusive-001",
    )
] + [
    ("property", n)
    for n in (
        "and-001", "or-001", "or-datatypes-001", "not-001", "node-001",
        "node-002", "equals-001", "disjoint-001", "lessThan-001",
        "lessThan-002", "lessThanOrEquals-001", "uniqueLang-001",
        "languageIn-001", "property-001",
    )
] + [
    ("node", n)
    for n in (
        "class-001", "datatype-001", "hasValue-001", "in-001",
        "minInclusive-001", "minInclusive-002", "nodeKind-001",
        "not-001", "not-002", "and-001", "and-002", "or-001",
        "xone-001", "node-001", "languageIn-001", "closed-001",
        "closed-002", "disjoint-001", "equals-001",
        "minLength-001", "maxLength-001",
    )
] + [
    ("targets", n)
    for n in (
        "targetClass-001", "targetClassImplicit-001", "targetNode-001",
        "targetObjectsOf-001", "targetSubjectsOf-001", "targetSubjectsOf-002",
        "multipleTargets-001",
    )
] + [
    # round-5: sh:qualifiedValueShape family
    ("property", n)
    for n in (
        "qualifiedValueShape-001", "qualifiedMinCountDisjoint-001",
        "qualifiedValueShapesDisjoint-001",
    )
] + [
    # round-5: property paths beyond plain IRIs
    ("path", n)
    for n in (
        "path-inverse-001", "path-sequence-001", "path-sequence-002",
        "path-sequence-duplicate-001", "path-alternative-001",
        "path-zeroOrMore-001", "path-oneOrMore-001", "path-zeroOrOne-001",
        "path-complex-001",
    )
]

# round-5: SHACL-SPARQL constraints (std/sparql — sibling dir of std/core)
SPARQL_CASES = [
    ("node", n) for n in ("sparql-001", "sparql-002", "sparql-003",
                          "prefixes-001")
] + [("property", "sparql-001")]


def _expected(g: Graph):
    validate_nodes = g.subjects(
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", f"<{SHT}Validate>"
    )
    assert validate_nodes, "no sht:Validate entry"
    rep = g.obj(validate_nodes[0], "<http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#result>")
    conforms = g.obj(rep, f"<{SH}conforms>") == '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
    results = set()
    for r in g.objs(rep, f"<{SH}result>"):
        rp = g.obj(r, f"<{SH}resultPath>")
        if rp is not None and rp.startswith("_:"):
            # complex-path resultPath: compare by the canonical path
            # string the engine reports (a bnode label is graph-local)
            from jena_ray.shacl import parse_path, path_str

            rp = path_str(parse_path(g, rp))
        results.add(
            (
                g.obj(r, f"<{SH}focusNode>"),
                rp,
                g.obj(r, f"<{SH}sourceConstraintComponent>"),
            )
        )
    return conforms, results


@pytest.mark.parametrize("sub,name", CASES, ids=[f"{s}/{n}" for s, n in CASES])
def test_shacl_wg(sub, name):
    path = os.path.join(STD, sub, name + ".ttl")
    with open(path, "rb") as f:
        text = f.read().decode("utf-8")
    base = "urn:x-base:default"
    triples = parse_turtle(text, base=base)
    g = Graph(triples)
    exp_conforms, exp_results = _expected(g)
    got_conforms, got = validate(triples)
    got_set = {(f, p, c) for f, p, c, _ in got}
    assert got_conforms == exp_conforms, f"conforms mismatch: got {got_set}"
    assert got_set == exp_results


@pytest.mark.parametrize(
    "sub,name", SPARQL_CASES, ids=[f"sparql/{s}/{n}" for s, n in SPARQL_CASES]
)
def test_shacl_sparql_wg(sub, name):
    path = os.path.join(os.path.dirname(STD), "sparql", sub, name + ".ttl")
    with open(path, "rb") as f:
        text = f.read().decode("utf-8")
    triples = parse_turtle(text, base="urn:x-base:default")
    g = Graph(triples)
    exp_conforms, exp_results = _expected(g)
    got_conforms, got = validate(triples)
    got_set = {(f, p, c) for f, p, c, _ in got}
    assert got_conforms == exp_conforms, f"conforms mismatch: got {got_set}"
    assert got_set == exp_results


def test_shacl_validate_dataset(ray_session):
    """Distributed path: subject-bucketed validation matches in-memory
    validate() on the same data."""
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.shacl import shacl_validate_dataset

    shapes = parse_turtle(
        """
        @prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <http://ex/> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
             sh:property [ sh:path ex:name ; sh:minCount 1 ;
                           sh:datatype xsd:string ] .
        """
    )
    data = [
        ("<http://ex/a>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://ex/Person>"),
        ("<http://ex/a>", "<http://ex/name>", '"Ann"'),
        ("<http://ex/b>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://ex/Person>"),
        ("<http://ex/c>", "<http://ex/name>", '"NotTargeted"'),
    ]
    ds = rd.from_arrow(
        pa.table({k: [t[i] for t in data] for i, k in enumerate(("subj", "pred", "obj"))})
    )
    out = shacl_validate_dataset(ds, shapes).to_pandas()
    assert list(out["focus"]) == ["<http://ex/b>"]
    assert out["component"].iloc[0].endswith("MinCountConstraintComponent>")
