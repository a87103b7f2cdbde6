"""RDF Core WG RDF/XML conformance, driven by the reference's own manifest
(jena-core/testing/wg/Manifest.rdf — the same file WGTestSuite reads):
APPROVED PositiveParserTest .rdf→.nt pairs eval by isomorphism, APPROVED
NegativeParserTest inputs must raise."""

from __future__ import annotations

import os
import re

import pytest

from jena_ray import term as T
from jena_ray.isomorphism import isomorphic
from jena_ray.rdfxml import parse_rdfxml

WG = "/root/reference/jena-core/testing/wg"
BASE = "http://www.w3.org/2000/10/rdf-tests/rdfcore/"


def _load_manifest():
    man = open(os.path.join(WG, "Manifest.rdf")).read()
    pos, neg = [], []
    for m in re.finditer(
        r"<test:(PositiveParserTest|NegativeParserTest)\s+rdf:about=\"([^\"]+)\"(.*?)"
        r"</test:\1>",
        man,
        re.S,
    ):
        kind, about, body = m.groups()
        status = re.search(r"<test:status>([^<]*)</test:status>", body)
        if not status or status.group(1) != "APPROVED":
            continue
        inp = re.search(
            r"test:RDF-XML-Document rdf:about=\"" + BASE + r"([^\"]+\.rdf)\"", body
        )
        if not inp:
            continue  # N-Triples-input tests target the NT parser, not this one
        if kind == "PositiveParserTest":
            out = re.search(
                r"test:NT-Document rdf:about=\"" + BASE + r"([^\"]+\.nt)\"", body
            )
            if out:
                pos.append((inp.group(1), out.group(1)))
        else:
            neg.append(inp.group(1))
    return pos, neg


# Manifest-APPROVED entries that use 1999-era syntax withdrawn by the 2004
# REC; the reference's own ARP (Jena 3.x) also rejects these inputs, so a
# modern reader must NOT produce the listed triples:
#   test0007 — rdf:aboutEach (distributive referent, withdrawn)
#   test012  — entire document commented out (not well-formed XML; marked
#              WITHDRAWN in the file body itself)
WITHDRAWN = {
    "rdf-ns-prefix-confusion/test0007.rdf",
    "xmlbase/test012.rdf",
}

POSITIVE, NEGATIVE = _load_manifest()
POSITIVE = [p for p in POSITIVE if p[0] not in WITHDRAWN]
assert len(POSITIVE) > 100 and len(NEGATIVE) > 20  # manifest parsed sanely


def _read(rel: str) -> str:
    return open(os.path.join(WG, rel), "rb").read().decode("utf-8")


@pytest.mark.parametrize("inp,out", POSITIVE, ids=[p[0] for p in POSITIVE])
def test_rdfxml_eval(inp, out):
    got = parse_rdfxml(_read(inp), base=BASE + inp)
    exp = T.parse_ntriples(_read(out), strict=True)
    assert isomorphic(got, exp), f"eval mismatch for {inp}"


@pytest.mark.parametrize("inp", NEGATIVE, ids=NEGATIVE)
def test_rdfxml_error(inp):
    with pytest.raises(T.TermError):
        parse_rdfxml(_read(inp), base=BASE + inp)
