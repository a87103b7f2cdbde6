"""riot CLI (riotcmd/riot.java + CmdLangParse analog) driven in-process:
every input syntax dispatches by extension; --count reports triples; --out
round-trips through the NT writer."""

import json
import sys

import pytest


def _run(argv, capsys):
    from jena_ray import cli

    old = sys.argv
    sys.argv = ["jena_ray"] + argv
    try:
        rc = cli.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    return rc, out


NT = '<http://e/s> <http://e/p> "v" .\n'
TTL = '@prefix e: <http://e/> .\ne:s e:p "v", "w" .\n'
RJ = '{"http://e/s": {"http://e/p": [{"type": "literal", "value": "v"}]}}'
JSONLD = '{"@id": "http://e/s", "http://e/p": "v"}'
TRIX = (
    '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph><triple>'
    "<uri>http://e/s</uri><uri>http://e/p</uri><plainLiteral>v</plainLiteral>"
    "</triple></graph></TriX>"
)
RDFXML = (
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
    'xmlns:e="http://e/"><rdf:Description rdf:about="http://e/s">'
    "<e:p>v</e:p></rdf:Description></rdf:RDF>"
)


@pytest.mark.parametrize(
    "ext,body,n",
    [
        ("nt", NT, 1),
        ("ttl", TTL, 2),
        ("rj", RJ, 1),
        ("jsonld", JSONLD, 1),
        ("trix", TRIX, 1),
        ("rdf", RDFXML, 1),
    ],
)
def test_riot_count_per_syntax(ray_session, tmp_path, capsys, ext, body, n):
    f = tmp_path / f"in.{ext}"
    f.write_text(body)
    rc, out = _run(["riot", "--count", str(f)], capsys)
    assert rc == 0
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["triples"] == n


def test_riot_unknown_syntax(ray_session, tmp_path, capsys):
    f = tmp_path / "in.unknown"
    f.write_text("x")
    rc, _ = _run(["riot", "--count", str(f)], capsys)
    assert rc != 0


def test_riot_nt_export_roundtrip(ray_session, tmp_path, capsys):
    f = tmp_path / "in.ttl"
    f.write_text(TTL)
    outdir = tmp_path / "out"
    rc, _ = _run(["riot", "--out", str(outdir), str(f)], capsys)
    assert rc == 0
    import glob

    from jena_ray import term as T

    text = "".join(open(p).read() for p in sorted(glob.glob(str(outdir) + "/*")))
    assert len(T.parse_ntriples(text)) == 2


def test_sparql_cli_result_formats(ray_session, tmp_path, capsys):
    """arq-style sparql subcommand with --results csv/json (W3C result-set
    serializers from jena_ray.resultset)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "cliidx")
    t = pa.table(
        {
            "subj": ["<http://e/a>", "<http://e/b>"],
            "pred": ["<http://e/p>", "<http://e/p>"],
            "obj": ['"1"', '"2"'],
        }
    )
    import os

    os.makedirs(f"{out}/triples")
    pq.write_table(t, f"{out}/triples/part0.parquet")
    from jena_ray.stages.materialize import materialize_indexes

    materialize_indexes(out, num_buckets=2, min_rows_per_file=100)

    q = "SELECT ?s ?o WHERE { ?s <http://e/p> ?o } ORDER BY ?s"
    rc, outp = _run(["sparql", "--loc", out, "--query", q,
                     "--results", "csv"], capsys)
    assert rc == 0
    lines = outp.strip().splitlines()
    assert lines[0].strip() == "s,o"
    assert lines[1].strip() == "http://e/a,1"

    rc, outp = _run(["sparql", "--loc", out, "--query", q,
                     "--results", "json"], capsys)
    doc = json.loads(outp)
    assert doc["head"]["vars"] == ["s", "o"]
    assert len(doc["results"]["bindings"]) == 2
