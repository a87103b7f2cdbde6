"""JSON-LD reader vs the reference's own fixtures
(jena-arq/testing/RIOT/jsonld: .jsonld with .ttl/.trig ground truth),
eval by (quad-)isomorphism like the RIOT suites."""

from __future__ import annotations

import os

import pytest

from jena_ray.isomorphism import isomorphic, isomorphic_quads
from jena_ray.jsonld import DEFAULT_GRAPH, parse_jsonld
from jena_ray.trig import parse_trig
from jena_ray.turtle import parse_turtle

DIR = "/root/reference/jena-arq/testing/RIOT/jsonld"


def _read(name: str) -> str:
    with open(os.path.join(DIR, name), "rb") as f:
        return f.read().decode("utf-8")


@pytest.mark.parametrize("name", ["graph1", "graph2"])
def test_jsonld_graph_fixture(name):
    got = parse_jsonld(_read(name + ".jsonld"))
    triples = [(s, p, o) for g, s, p, o in got]
    assert all(g == DEFAULT_GRAPH for g, *_ in got)
    exp = parse_turtle(_read(name + ".ttl"))
    assert isomorphic(triples, exp), f"eval mismatch for {name}"


def test_jsonld_dataset_fixture():
    got = parse_jsonld(_read("dataset1.jsonld"))
    exp = parse_trig(_read("dataset1.trig"))
    assert isomorphic_quads(got, exp)


def test_jsonld_value_shapes():
    doc = """{
      "@context": {"ex": "http://example/", "name": {"@id": "http://example/name", "@language": "en"}},
      "@id": "ex:s",
      "ex:p": 4.5,
      "ex:q": true,
      "name": "Anna",
      "ex:r": {"@value": "x", "@type": "http://example/T"}
    }"""
    got = {(s, p, o) for g, s, p, o in parse_jsonld(doc)}
    assert (
        "<http://example/s>",
        "<http://example/p>",
        '"4.5E0"^^<http://www.w3.org/2001/XMLSchema#double>',
    ) in got
    assert (
        "<http://example/s>",
        "<http://example/q>",
        '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>',
    ) in got
    assert ("<http://example/s>", "<http://example/name>", '"Anna"@en') in got
    assert (
        "<http://example/s>",
        "<http://example/r>",
        '"x"^^<http://example/T>',
    ) in got
