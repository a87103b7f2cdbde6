"""Writer registry round-trips: serialize with each format's writer, parse
back with the engine's own conformance-tested readers, require isomorphism
(the same eval discipline the RIOT suites use)."""

from __future__ import annotations

import pytest

from jena_ray import term as T
from jena_ray.isomorphism import isomorphic, isomorphic_quads
from jena_ray.rdfjson import parse_rdfjson
from jena_ray.trig import parse_trig
from jena_ray.trix import parse_trix
from jena_ray.turtle import parse_turtle
from jena_ray.writers import (
    DEFAULT_GRAPH,
    WRITERS,
    serialize_rdfjson,
    serialize_trig,
    serialize_trix,
    serialize_turtle,
)

TRIPLES = [
    ("<http://ex.org/s1>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<http://ex.org/C>"),
    ("<http://ex.org/s1>", "<http://ex.org/p>", '"hello\\nworld"'),
    ("<http://ex.org/s1>", "<http://ex.org/p>", '"bonjour"@fr'),
    ("<http://ex.org/s2>", "<http://ex.org/q>", '"12"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ("_:b1", "<http://ex.org/q>", "_:b2"),
    ("<http://ex.org/s2>", "<http://ex.org/q>", '"<&>"'),
]

QUADS = [(DEFAULT_GRAPH, *t) for t in TRIPLES[:3]] + [
    ("<http://ex.org/g1>", *t) for t in TRIPLES[3:]
]

PREFIXES = {"ex": "http://ex.org/", "xsd": "http://www.w3.org/2001/XMLSchema#"}


def test_turtle_roundtrip():
    doc = serialize_turtle(TRIPLES, PREFIXES)
    assert "ex:s1" in doc and "xsd:integer" in doc and " a ex:C" in doc
    got = parse_turtle(doc)
    assert isomorphic(got, TRIPLES)


def test_trig_roundtrip():
    doc = serialize_trig(QUADS, PREFIXES)
    got = parse_trig(doc)
    assert isomorphic_quads(got, QUADS)


def test_trix_roundtrip():
    doc = serialize_trix(QUADS)
    got = parse_trix(doc)
    assert isomorphic_quads(got, QUADS)


def test_rdfjson_roundtrip():
    got = parse_rdfjson(serialize_rdfjson(TRIPLES))
    assert isomorphic(got, TRIPLES)


def test_nt_nq_docs():
    unit, nt = WRITERS["nt"]
    assert unit == "triples"
    got = T.parse_ntriples(nt(TRIPLES), strict=True)
    assert isomorphic(got, TRIPLES)
    unit, nq = WRITERS["nq"]
    got_q = T.parse_nquads(nq(QUADS), strict=True)
    assert isomorphic_quads(got_q, QUADS)


@pytest.mark.parametrize("name", sorted(WRITERS))
def test_registry_entries_callable(name):
    unit, fn = WRITERS[name]
    data = TRIPLES if unit == "triples" else QUADS
    assert isinstance(fn(data), str)


def test_jsonld_roundtrip():
    from jena_ray.jsonld import parse_jsonld
    from jena_ray.writers import serialize_jsonld

    doc = serialize_jsonld(TRIPLES)
    got = [(s, p, o) for (_g, s, p, o) in parse_jsonld(doc)]
    assert isomorphic(got, TRIPLES)


def test_rdfxml_roundtrip():
    from jena_ray.rdfxml import parse_rdfxml
    from jena_ray.writers import serialize_rdfxml

    doc = serialize_rdfxml(TRIPLES)
    assert 'rdf:datatype=' in doc and 'xml:lang="fr"' in doc
    got = parse_rdfxml(doc)
    assert isomorphic(got, TRIPLES)


def test_rdfxml_unsplittable_predicate_raises():
    from jena_ray.writers import serialize_rdfxml

    with pytest.raises(ValueError, match="Cannot split"):
        serialize_rdfxml([("<http://e/s>", "<http://e/p/>", '"x"')])
