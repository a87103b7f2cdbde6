"""W3C Turtle 1.1 conformance (TurtleStd suite, 291 manifest entries):
positive/negative syntax + eval-by-isomorphism (RiotEvalTest semantics)."""

from __future__ import annotations

import os
import re

import pytest

from jena_ray import term as T
from jena_ray.isomorphism import isomorphic
from jena_ray.turtle import parse_turtle

DIR = "/root/reference/jena-arq/testing/RIOT/Lang/TurtleStd"
BASE = "http://www.w3.org/2013/TurtleTests/"


def _load_manifest():
    man = open(os.path.join(DIR, "manifest.ttl")).read()
    entries = []
    # entries look like: <#name> rdf:type rdft:Kind ; ... mf:action <f.ttl> ; [mf:result <f.nt> ;]
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
def test_turtle(name, kind, action, result):
    text = _read(action)
    base = BASE + action
    if kind == "TestTurtleNegativeSyntax":
        with pytest.raises(T.TermError):
            parse_turtle(text, base=base)
    elif kind == "TestTurtlePositiveSyntax":
        parse_turtle(text, base=base)
    elif kind == "TestTurtleEval":
        got = parse_turtle(text, base=base)
        exp = T.parse_ntriples(_read(result), strict=True)
        assert isomorphic(got, exp), f"eval mismatch for {name}"
    elif kind == "TestTurtleNegativeEval":
        with pytest.raises(T.TermError):
            parse_turtle(text, base=base)
    else:
        pytest.skip(f"unknown kind {kind}")


def test_manifest_loaded():
    assert len(ENTRIES) >= 280
