"""Scalar function library tests (registry + kernels, E_* parity)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from jena_ray.functions import scalar as S


def arr(*v):
    return pa.array(list(v))


def test_strings():
    a = arr("Hello", "wOrld")
    assert S.FUNCTIONS["strlen"](a).to_pylist() == [5, 5]
    assert S.FUNCTIONS["ucase"](a).to_pylist() == ["HELLO", "WORLD"]
    assert S.FUNCTIONS["lcase"](a).to_pylist() == ["hello", "world"]
    assert S.FUNCTIONS["substr"](a, start=2, length=3).to_pylist() == ["ell", "Orl"]
    assert S.FUNCTIONS["strstarts"](a, prefix="He").to_pylist() == [True, False]
    assert S.FUNCTIONS["contains"](a, pat="rld").to_pylist() == [False, True]
    assert S.FUNCTIONS["concat"](a, a, sep="-").to_pylist() == ["Hello-Hello", "wOrld-wOrld"]
    assert S.FUNCTIONS["replace"](a, pat="l+", rep="L").to_pylist() == ["HeLo", "wOrLd"]
    assert S.FUNCTIONS["regex"](a, pat="^H").to_pylist() == [True, False]
    assert S.FUNCTIONS["strbefore"](arr("a:b", "nope"), sep=":").to_pylist() == ["a", ""]
    assert S.FUNCTIONS["strafter"](arr("a:b", "nope"), sep=":").to_pylist() == ["b", ""]
    assert S.FUNCTIONS["encode_for_uri"](arr("a b/c")).to_pylist() == ["a%20b%2Fc"]


def test_hashes():
    a = arr("x")
    assert S.FUNCTIONS["md5"](a).to_pylist() == ["9dd4e461268c8034f5c8564e155c67a6"]
    assert S.FUNCTIONS["sha1"](a).to_pylist()[0].startswith("11f6ad8ec52a")


def test_numerics():
    a = pa.array([-1.5, 2.4])
    assert S.FUNCTIONS["abs"](a).to_pylist() == [1.5, 2.4]
    assert S.FUNCTIONS["ceil"](a).to_pylist() == [-1.0, 3.0]
    assert S.FUNCTIONS["floor"](a).to_pylist() == [-2.0, 2.0]
    assert S.FUNCTIONS["sqrt"](pa.array([4.0])).to_pylist() == [2.0]


def test_datetime():
    import datetime

    a = pa.array([datetime.datetime(2024, 3, 5, 7, 8, 9)])
    assert S.FUNCTIONS["year"](a).to_pylist() == [2024]
    assert S.FUNCTIONS["month"](a).to_pylist() == [3]
    assert S.FUNCTIONS["seconds"](a).to_pylist() == [9]


def test_term_accessors():
    a = arr("<http://e/x>", '"abc"@en', '"1"^^<http://www.w3.org/2001/XMLSchema#integer>', "_:b1", '"plain"')
    assert S.FUNCTIONS["term_kind"](a).to_pylist() == [
        "iri", "literal", "literal", "bnode", "literal",
    ]
    assert S.FUNCTIONS["term_str"](a).to_pylist() == ["http://e/x", "abc", "1", "b1", "plain"]
    assert S.FUNCTIONS["term_lang"](a).to_pylist() == ["", "en", "", "", ""]
    dt = S.FUNCTIONS["term_datatype"](a).to_pylist()
    assert dt[1].endswith("langString") and dt[2].endswith("integer")
    assert dt[4].endswith("string")


def test_apply_fn_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"s": "abc"}, {"s": "defg"}])
    out = S.apply_fn(ds, "strlen", "n", "s")
    assert sorted(r["n"] for r in out.take_all()) == [3, 4]


def test_register_custom():
    @S.register("exclaim")
    def exclaim(a):
        import pyarrow.compute as pc

        return pc.binary_join_element_wise(a, "!", "")

    assert S.FUNCTIONS["exclaim"](arr("hi")).to_pylist() == ["hi!"]
