"""SPARQL result-set serializers (ResultSetWriterRegistry analog): W3C
CSV/TSV/JSON result formats over canonical term-string tables."""

from __future__ import annotations

import json

import pyarrow as pa

from jena_ray.resultset import (
    write_csv_results,
    write_json_results,
    write_tsv_results,
)

TB = pa.table(
    {
        "s": ["<http://e/a>", "_:b0", "<http://e/c>"],
        "o": ['"plain, with comma"', '"bonjour"@fr',
              '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'],
        "maybe": ['"x"', None, None],
    }
)


def test_csv_results_raw_values_and_quoting():
    doc = write_csv_results(TB)
    lines = doc.split("\r\n")
    assert lines[0] == "s,o,maybe"
    assert lines[1] == 'http://e/a,"plain, with comma",x'
    assert lines[2] == "_:b0,bonjour,"  # bnode keeps label, lang dropped
    assert lines[3] == "http://e/c,5,"


def test_tsv_results_full_terms():
    doc = write_tsv_results(TB)
    lines = doc.splitlines()
    assert lines[0] == "?s\t?o\t?maybe"
    assert lines[1].startswith("<http://e/a>\t")
    assert '"bonjour"@fr' in lines[2]


def test_json_results_bindings_and_ask():
    doc = json.loads(write_json_results(TB))
    assert doc["head"]["vars"] == ["s", "o", "maybe"]
    b0 = doc["results"]["bindings"][0]
    assert b0["s"] == {"type": "uri", "value": "http://e/a"}
    assert b0["o"]["value"] == "plain, with comma"
    b1 = doc["results"]["bindings"][1]
    assert b1["s"] == {"type": "bnode", "value": "b0"}
    assert b1["o"]["xml:lang"] == "fr"
    assert "maybe" not in b1  # unbound vars are absent per spec
    b2 = doc["results"]["bindings"][2]
    assert b2["o"]["datatype"].endswith("integer")

    ask = json.loads(write_json_results(pa.table({"ask": [True]})))
    assert ask == {"head": {}, "boolean": True}


def test_numeric_alias_columns():
    """Aggregate alias columns are plain numbers, not term strings — all
    three writers must serialize them (caught live via sparql --results)."""
    tb = pa.table({"l": ['"en"'], "n": pa.array([5], type=pa.int64())})
    assert "en,5" in write_csv_results(tb)
    assert '"en"\t5' in write_tsv_results(tb)
    doc = json.loads(write_json_results(tb))
    b = doc["results"]["bindings"][0]["n"]
    assert b["value"] == "5" and b["datatype"].endswith("integer")
