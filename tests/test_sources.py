"""N-Triples / N-Quads / Turtle Ray Data sources + N-Triples sink."""

from __future__ import annotations

import glob
import os

from jena_ray import term as T
from jena_ray.isomorphism import isomorphic

NT_FIXTURE = """<http://e/s1> <http://e/p> "v1" .
<http://e/s2> <http://e/p> <http://e/o> . # comment
# comment line
_:b1 <http://e/p> "x"@en .
"""

TTL_FIXTURE = """@prefix ex: <http://e/> .
ex:s1 ex:p "v1" ; ex:q [ ex:r (1 2) ] .
"""

NQ_FIXTURE = """<http://e/s> <http://e/p> <http://e/o> <http://g/1> .
<http://e/s> <http://e/p> "lit" .
"""


def test_read_write_roundtrip_nt(ray_session, tmp_path):
    from jena_ray.sources.ntriples import read_ntriples, write_ntriples

    src = tmp_path / "in.nt"
    src.write_text(NT_FIXTURE)
    ds = read_ntriples([str(src)])
    rows = [tuple(r.values()) for r in ds.take_all()]
    assert len(rows) == 3

    outdir = str(tmp_path / "out_nt")
    write_ntriples(ds, outdir)
    text = "".join(open(f).read() for f in sorted(glob.glob(outdir + "/*")))
    reparsed = T.parse_ntriples(text)
    assert isomorphic(rows, reparsed)


def test_read_nt_files_skolemizes_per_file(ray_session, tmp_path):
    from jena_ray.sources.ntriples import read_ntriples_files

    (tmp_path / "a.nt").write_text('_:x <http://e/p> "1" .\n')
    (tmp_path / "b.nt").write_text('_:x <http://e/p> "2" .\n')
    ds = read_ntriples_files([str(tmp_path / "a.nt"), str(tmp_path / "b.nt")])
    rows = ds.take_all()
    subjects = {r["subj"] for r in rows}
    assert len(subjects) == 2  # same label, different files → different nodes
    for s in subjects:
        assert s.startswith("_:") and len(s) == 34


def test_label_to_node_strategies(ray_session, tmp_path):
    """LabelToNode.java:46-75 strategy parity: as-given keeps labels
    verbatim; global scope merges the same label across files; the default
    file-hash scope separates them (covered above)."""
    from jena_ray.sources.ntriples import read_ntriples_files

    (tmp_path / "a.nt").write_text('_:x <http://e/p> "1" .\n')
    (tmp_path / "b.nt").write_text('_:x <http://e/p> "2" .\n')
    paths = [str(tmp_path / "a.nt"), str(tmp_path / "b.nt")]

    as_given = {r["subj"] for r in read_ntriples_files(paths, label_policy="as_given").take_all()}
    assert as_given == {"_:x"}

    glob_scope = {r["subj"] for r in read_ntriples_files(paths, label_policy="global").take_all()}
    assert len(glob_scope) == 1  # same label, same job scope → same node
    assert next(iter(glob_scope)).startswith("_:") and next(iter(glob_scope)) != "_:x"

    import pytest

    with pytest.raises(ValueError):
        read_ntriples_files(paths, label_policy="bogus")


def test_read_nquads(ray_session, tmp_path):
    from jena_ray.sources.ntriples import quads_to_triples, read_nquads, triples_to_quads

    src = tmp_path / "in.nq"
    src.write_text(NQ_FIXTURE)
    qs = read_nquads([str(src)])
    rows = qs.take_all()
    graphs = {r["graph"] for r in rows}
    assert graphs == {"<http://g/1>", "<urn:x-arq:DefaultGraph>"}  # Quad.java:37
    ts = quads_to_triples(qs)
    assert set(ts.take(5)[0].keys()) == {"subj", "pred", "obj"}
    qs2 = triples_to_quads(ts, "urn:x-arq:UnionGraph")
    assert qs2.take(1)[0]["graph"] == "<urn:x-arq:UnionGraph>"


def test_read_turtle_source(ray_session, tmp_path):
    from jena_ray.turtle import read_turtle

    src = tmp_path / "in.ttl"
    src.write_text(TTL_FIXTURE)
    ds = read_turtle([str(src)])
    rows = ds.take_all()
    # ex:s1 gets 2 triples (p, q) + bnode r + list (2 first/rest pairs) = 7
    assert len(rows) == 7
    # all bnode labels skolemized (32-hex)
    for r in rows:
        for term in (r["subj"], r["obj"]):
            if term.startswith("_:"):
                assert len(term) == 34


def test_tdb_loader_fixtures(ray_session):
    """The reference's TDB loader fixtures (jena-tdb/testing/Loader/data-*)
    parse to the sizes TestLoader.java:72-149 asserts."""
    from jena_ray.sources.ntriples import read_nquads, read_ntriples
    from jena_ray.turtle import read_turtle

    d = "/root/reference/jena-tdb/testing/Loader"
    if not os.path.isdir(d):
        return
    # loader fixtures use relative IRIs resolved against a base
    # (TestLoader loads with the file's base; TestLoader.java:72-149)
    nt = read_ntriples([f"{d}/data-2.nt"], base="http://example/")
    assert nt.count() > 0
    nq = read_nquads([f"{d}/data-1.nq"], base="http://example/")
    assert nq.count() > 0
    ttl = read_turtle([f"{d}/data-4.ttl"])
    assert ttl.count() > 0


def test_checked_reader_side_channel(ray_session, tmp_path):
    """Checker error side-channel (riot/system/Checker.java semantics, the
    elephas Valid/Ground filter mappers): bad lines become error rows, good
    lines parse, nothing raises, nothing is silently dropped."""
    from jena_ray.sources.ntriples import read_ntriples_checked, split_checked

    f = tmp_path / "mixed.nt"
    f.write_text(
        "<http://e/s> <http://e/p> <http://e/o> .\n"
        "this is not a triple\n"
        "<http://e/s> <http://e/p> \"lit\" .\n"
        "<relative> <http://e/p> <http://e/o> .\n"
    )
    valid, errors = split_checked(read_ntriples_checked([str(f)]))
    good = sorted(tuple(r.values()) for r in valid.take_all())
    bad = errors.take_all()
    assert good == [
        ("<http://e/s>", "<http://e/p>", '"lit"'),
        ("<http://e/s>", "<http://e/p>", "<http://e/o>"),
    ]
    assert len(bad) == 2
    assert all(r["error"] for r in bad)


def test_checked_reader_on_reference_bad_fixture(ray_session):
    """A W3C negative-syntax file yields only error rows."""
    import glob

    from jena_ray.sources.ntriples import read_ntriples_checked, split_checked

    bads = sorted(
        glob.glob(
            "/root/reference/jena-arq/testing/RIOT/Lang/NTriplesStd/nt-syntax-bad-struct-*.nt"
        )
    )
    if not bads:
        return
    valid, errors = split_checked(read_ntriples_checked(bads[:1]))
    assert valid.count() == 0
    assert errors.count() > 0


def test_ground_filters(ray_session):
    """Elephas Valid/Ground filter mapper semantics: bnode rows dropped."""
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.sources.ntriples import ground_quads, ground_triples

    t = pa.table(
        {
            "subj": ["<http://e/s>", "_:b", "<http://e/s2>"],
            "pred": ["<http://e/p>"] * 3,
            "obj": ['"x"', '"y"', "_:c"],
        }
    )
    out = ground_triples(rd.from_arrow(t)).to_pandas()
    assert out["subj"].tolist() == ["<http://e/s>"]

    q = pa.table(
        {
            "graph": ["<http://g>", "_:g"],
            "subj": ["<http://e/s>"] * 2,
            "pred": ["<http://e/p>"] * 2,
            "obj": ['"x"'] * 2,
        }
    )
    outq = ground_quads(rd.from_arrow(q)).to_pandas()
    assert outq["graph"].tolist() == ["<http://g>"]


def test_nt_fast_path_matches_slow(ray_session):
    """The vectorized RE2 fast path must emit EXACTLY what the per-line
    parser emits, in the same order, across plain/typed/tagged/escaped/
    bnode lines (fallback interleave)."""
    import pyarrow as pa

    from jena_ray import term as T
    from jena_ray.sources.nt_fast import parse_nt_batch_fast

    lines = [
        '<http://e/s1> <http://e/p> <http://e/o> .',
        '<http://e/s2> <http://e/p> "plain" .',
        '<http://e/s3> <http://e/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/s4> <http://e/p> "s"^^<http://www.w3.org/2001/XMLSchema#string> .',
        '_:b0 <http://e/p> _:b1.c .',
        '',
        '# comment',
        '<http://e/s5> <http://e/p> "esc\\nape" .   # fallback: ECHAR',
        '<http://e/s6> <http://e/p> "tag"@EN-gb .   # fallback: langtag canon',
        '<http://e/s7> <http://e/p> "\\u0041" .     # fallback: UCHAR',
        '<http://e/s8><http://e/p><http://e/o>.',
    ]
    got = parse_nt_batch_fast(
        pa.array(lines), lambda ln: T.parse_ntriples(ln, strict=True)
    )
    exp = []
    for ln in lines:
        if T._BLANK_RE.match(ln):
            continue
        exp.extend(T.parse_ntriples(ln, strict=True))
    assert [tuple(r.values()) for r in got.to_pylist()] == exp


def test_nt_fast_path_rejects_bad_lines(ray_session):
    import pyarrow as pa
    import pytest

    from jena_ray import term as T
    from jena_ray.sources.nt_fast import parse_nt_batch_fast

    for bad in (
        '<rel/iri> <http://e/p> <http://e/o> .',   # relative IRI
        '_:b. <http://e/p> <http://e/o> .',        # label ends with dot
        '<http://e/s> <http://e/p> .',             # missing object
    ):
        with pytest.raises(T.TermError):
            parse_nt_batch_fast(
                pa.array([bad]), lambda ln: T.parse_ntriples(ln, strict=True)
            )


def test_iri_violation_scan(ray_session):
    """riot IRI-check analog: distinct per-(iri, code) rows over a triple
    Dataset, warnings filterable."""
    import pyarrow as pa
    import ray.data as rd

    from jena_ray.sources.ntriples import iri_violation_scan

    rows = [
        ("<http://ex.org/ok>", "<http://ex.org/p>", "<HTTP://ex.org/up>"),
        ("<http://ex.org/a b>", "<http://ex.org/p>", '"literal ignored"'),
        # repeated IRI must produce ONE row per (iri, code)
        ("<http://ex.org/a b>", "<http://ex.org/p>", "<http://ex.org/ok>"),
    ]
    ds = rd.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows],
    }))
    got = {(r["iri"], r["code"], r["is_error"])
           for r in iri_violation_scan(ds, num_buckets=2).take_all()}
    assert got == {
        ("<http://ex.org/a b>", "WHITESPACE", True),
        ("<HTTP://ex.org/up>", "LOWERCASE_PREFERRED", False),
    }
    errs_only = iri_violation_scan(ds, warnings=False, num_buckets=2).take_all()
    assert {r["code"] for r in errs_only} == {"WHITESPACE"}
