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


def test_string_normalization_and_iri_parts():
    a = arr("  a \t b\nc ", None)
    assert S.FUNCTIONS["normalize_space"](a).to_pylist() == ["a b c", None]
    acc = arr("é")  # e + combining acute
    assert S.FUNCTIONS["normalize_unicode"](acc).to_pylist() == ["é"]
    iris = arr("<http://ex.org/ns#Name>", "<http://ex.org/a/b>", '"lit"')
    assert S.FUNCTIONS["localname"](iris).to_pylist() == ["Name", "b", None]
    assert S.FUNCTIONS["namespace"](iris).to_pylist() == [
        "http://ex.org/ns#", "http://ex.org/a/", None]


def test_math_library():
    import math

    a = pa.array([0.0, 1.0])
    assert S.FUNCTIONS["log10"](pa.array([100.0])).to_pylist() == [2.0]
    assert S.FUNCTIONS["log2"](pa.array([8.0])).to_pylist() == [3.0]
    assert S.FUNCTIONS["exp10"](pa.array([3.0])).to_pylist() == [1000.0]
    assert S.FUNCTIONS["sin"](a).to_pylist() == [0.0, math.sin(1.0)]
    assert S.FUNCTIONS["cos"](a).to_pylist()[0] == 1.0
    assert S.FUNCTIONS["atan2"](pa.array([1.0]), pa.array([1.0])).to_pylist() == [
        math.atan2(1.0, 1.0)]
    # banker's rounding: 0.5 and 1.5 both land on the even neighbour
    assert S.FUNCTIONS["round_half_even"](pa.array([0.5, 1.5, 2.5])).to_pylist() == [
        0.0, 2.0, 2.0]


def test_timezone_accessors():
    a = arr("2024-01-01T12:00:00Z", "2024-01-01T12:00:00+05:30",
            "2024-01-01T12:00:00-05:00", "2024-01-01T12:00:00", None)
    assert S.FUNCTIONS["tz"](a).to_pylist() == ["Z", "+05:30", "-05:00", "", None]
    assert S.FUNCTIONS["timezone"](a).to_pylist() == [
        "PT0S", "PT5H30M", "-PT5H", None, None]


def test_term_constructors():
    lex = arr("42", None)
    assert S.FUNCTIONS["strdt"](
        lex, datatype="http://www.w3.org/2001/XMLSchema#integer"
    ).to_pylist() == ['"42"^^<http://www.w3.org/2001/XMLSchema#integer>', None]
    assert S.FUNCTIONS["strlang"](arr("chat"), lang="FR").to_pylist() == ['"chat"@fr']
    got = S.FUNCTIONS["iri"](
        arr("b", "<http://ex.org/x>"), base="http://ex.org/a/"
    ).to_pylist()
    assert got == ["<http://ex.org/a/b>", "<http://ex.org/x>"]
    b = S.FUNCTIONS["bnode_for"](arr("k1", "k1", "k2")).to_pylist()
    assert b[0] == b[1] != b[2] and b[0].startswith("_:B")
    assert S.FUNCTIONS["sha224"](arr("x")).to_pylist()[0] == __import__(
        "hashlib").sha224(b"x").hexdigest()
