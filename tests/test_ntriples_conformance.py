"""W3C RIOT conformance: N-Triples + N-Quads syntax suites.

Mirrors the reference's conformance strategy (Scripts_LangSuite over
jena-arq/testing/RIOT/Lang/ manifests; RiotEvalTest.java). Test kind is
derived from the W3C test names: names containing ``-bad-`` are negative
syntax tests (parse must raise), all others are positive (parse must
succeed). The manifests confirm this naming convention
(NTriplesStd/manifest.ttl: rdft:TestNTriplesNegativeSyntax entries are
exactly the ``nt-syntax-bad-*`` ones).
"""

from __future__ import annotations

import glob
import os

import pytest

from jena_ray import term as T

NT_DIR = "/root/reference/jena-arq/testing/RIOT/Lang/NTriplesStd"
NQ_DIR = "/root/reference/jena-arq/testing/RIOT/Lang/NQuadsStd"

nt_files = sorted(glob.glob(os.path.join(NT_DIR, "*.nt")))
nq_files = sorted(glob.glob(os.path.join(NQ_DIR, "*.nq"))) + sorted(
    glob.glob(os.path.join(NQ_DIR, "*.nt"))
)


def _read(path: str) -> str:
    with open(path, "rb") as f:
        return f.read().decode("utf-8")


@pytest.mark.parametrize("path", nt_files, ids=[os.path.basename(p) for p in nt_files])
def test_ntriples_conformance(path):
    text = _read(path)
    negative = "-bad-" in os.path.basename(path)
    if negative:
        with pytest.raises(T.TermError):
            T.parse_ntriples(text, strict=True)
    else:
        T.parse_ntriples(text, strict=True)  # must not raise


@pytest.mark.parametrize("path", nq_files, ids=[os.path.basename(p) for p in nq_files])
def test_nquads_conformance(path):
    text = _read(path)
    negative = "-bad-" in os.path.basename(path)
    if negative:
        with pytest.raises(T.TermError):
            T.parse_nquads(text, strict=True)
    else:
        T.parse_nquads(text, strict=True)


def test_suite_present():
    # guard: the corpus actually loaded (72 N-Triples files per SURVEY §5)
    assert len(nt_files) >= 60
    assert len(nq_files) >= 60
