"""RDF/JSON reader vs the reference's fixture pairs
(jena-arq/testing/RIOT/Lang/RDF-JSON: .rj ↔ .nt, bad cases raise)."""

from __future__ import annotations

import os

import pytest

from jena_ray import term as T
from jena_ray.isomorphism import isomorphic as isomorphic_triples
from jena_ray.rdfjson import parse_rdfjson

DIR = "/root/reference/jena-arq/testing/RIOT/Lang/RDF-JSON"

POSITIVE = sorted(
    f[:-3]
    for f in os.listdir(DIR)
    if f.endswith(".rj") and os.path.exists(os.path.join(DIR, f[:-3] + ".nt"))
)
NEGATIVE = sorted(f[:-3] for f in os.listdir(DIR) if f.startswith("rdf-json-bad"))


def _read(name: str, ext: str) -> str:
    with open(os.path.join(DIR, name + ext), "rb") as f:
        return f.read().decode("utf-8")


@pytest.mark.parametrize("name", POSITIVE)
def test_rdfjson_eval(name):
    got = parse_rdfjson(_read(name, ".rj"))
    exp = T.parse_ntriples(_read(name, ".nt"), strict=True)
    assert isomorphic_triples(got, exp), f"eval mismatch for {name}"


@pytest.mark.parametrize("name", NEGATIVE)
def test_rdfjson_bad(name):
    with pytest.raises(T.TermError):
        parse_rdfjson(_read(name, ".rj"))


def test_rdfjson_typed_and_lang():
    got = parse_rdfjson(
        """{"http://e/s": {"http://e/p": [
            {"type": "literal", "value": "12",
             "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
            {"type": "literal", "value": "hi", "lang": "en"}]}}"""
    )
    assert got == [
        ("<http://e/s>", "<http://e/p>", '"12"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<http://e/s>", "<http://e/p>", '"hi"@en'),
    ]
