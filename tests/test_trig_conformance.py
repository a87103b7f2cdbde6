"""W3C TriG 1.1 conformance (TrigStd suite, manifest-driven):
positive/negative syntax + eval-by-quad-isomorphism vs the .nq results
(RiotEvalTest semantics over DatasetGraphs)."""

from __future__ import annotations

import os
import re

import pytest

from jena_ray import term as T
from jena_ray.isomorphism import isomorphic_quads
from jena_ray.trig import parse_trig

DIR = "/root/reference/jena-arq/testing/RIOT/Lang/TrigStd"
BASE = "http://www.w3.org/2013/TriGTests/"


def _load_manifest():
    man = open(os.path.join(DIR, "manifest.ttl")).read()
    entries = []
    for m in re.finditer(
        r"<#([^>]+)>\s+rdf:type\s+rdft:(\w+)\s*;(.*?)(?=\n\s*<#|\Z)", man, re.S
    ):
        name, kind, body = m.groups()
        act = re.search(r"mf:action\s+<([^>]+)>", body)
        res = re.search(r"mf:result\s+<([^>]+)>", body)
        if act:
            entries.append((name, kind, act.group(1), res.group(1) if res else None))
    return entries


ENTRIES = _load_manifest()


def _read(fname: str) -> str:
    with open(os.path.join(DIR, fname), "rb") as f:
        return f.read().decode("utf-8")


@pytest.mark.parametrize(
    "name,kind,action,result", ENTRIES, ids=[e[0] for e in ENTRIES]
)
def test_trig(name, kind, action, result):
    text = _read(action)
    base = BASE + action
    if kind == "TestTrigNegativeSyntax":
        with pytest.raises(T.TermError):
            parse_trig(text, base=base)
    elif kind == "TestTrigPositiveSyntax":
        parse_trig(text, base=base)
    elif kind == "TestTrigEval":
        got = parse_trig(text, base=base)
        exp = T.parse_nquads(_read(result), strict=True)
        assert isomorphic_quads(got, exp), f"eval mismatch for {name}"
    elif kind == "TestTrigNegativeEval":
        with pytest.raises(T.TermError):
            parse_trig(text, base=base)
    else:
        pytest.skip(f"unknown kind {kind}")
