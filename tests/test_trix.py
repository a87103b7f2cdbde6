"""TriX reader conformance against the reference's own fixture pairs
(jena-arq/testing/RIOT/Lang/TriX: trix-NN.trix ↔ trix-NN.nq, negatives
trix-bad-01..09 per TestTriXBad.java; trix-bad-00 is a stray duplicate of
trix-01 that the reference's own test list skips)."""

from __future__ import annotations

import os

import pytest

from jena_ray import term as T
from jena_ray.isomorphism import isomorphic_quads
from jena_ray.trix import parse_trix

DIR = "/root/reference/jena-arq/testing/RIOT/Lang/TriX"

POSITIVE = sorted(
    f[:-5]
    for f in os.listdir(DIR)
    if f.endswith(".trix") and os.path.exists(os.path.join(DIR, f[:-5] + ".nq"))
)
NEGATIVE = [f"trix-bad-{i:02d}" for i in range(1, 10)]


def _read(name: str, ext: str) -> str:
    with open(os.path.join(DIR, name + ext), "rb") as f:
        return f.read().decode("utf-8")


@pytest.mark.parametrize("name", POSITIVE)
def test_trix_eval(name):
    got = parse_trix(_read(name, ".trix"), base="http://example/base/")
    exp = T.parse_nquads(_read(name, ".nq"), strict=True)
    assert isomorphic_quads(got, exp), f"eval mismatch for {name}"


@pytest.mark.parametrize("name", NEGATIVE)
def test_trix_bad(name):
    with pytest.raises(T.TermError):
        parse_trix(_read(name, ".trix"), base="http://example/base/")


def test_trix_qname_resolution():
    text = """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"
                    xmlns:ex="http://example/ns#">
      <graph>
        <triple>
          <qname>ex:s</qname>
          <qname>ex:p</qname>
          <plainLiteral xml:lang="en">hello</plainLiteral>
        </triple>
      </graph>
    </TriX>"""
    got = parse_trix(text)
    assert got == [
        (
            "<urn:x-arq:DefaultGraph>",
            "<http://example/ns#s>",
            "<http://example/ns#p>",
            '"hello"@en',
        )
    ]


def test_trix_named_graph_and_bnode_graph():
    text = """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph>
        <uri>http://example/g</uri>
        <triple>
          <id>b1</id>
          <uri>http://example/p</uri>
          <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">12</typedLiteral>
        </triple>
      </graph>
    </TriX>"""
    (g, s, p, o), = parse_trix(text)
    assert g == "<http://example/g>"
    assert s.startswith("_:")
    assert o == '"12"^^<http://www.w3.org/2001/XMLSchema#integer>'
