"""SPARQL result-set serializers — CSV / TSV / JSON (+ ASK forms).

The reference registers result-set languages separately from RDF syntaxes
(jena-arq riot/resultset/ResultSetLang.java:40-70 — "Used for result sets,
not RDF syntaxes" — with writers in ResultSetWriterRegistry.java), exposed
through ``arq --results=csv|tsv|json``. Formats follow the W3C specs:

- CSV (sparql-results-csv): header row of variable names; RAW values —
  IRIs bare, literal lexical forms only, bnodes ``_:label``; RFC-4180
  quoting.
- TSV (sparql-results-tsv): header ``?var`` names; full term syntax
  (IRIs in ``<>``, literals with quotes/lang/datatype) — our canonical
  term strings ARE that syntax.
- JSON (sparql-results-json): ``{"head": {"vars": [...]}, "results":
  {"bindings": [{var: {"type": ..., "value": ...}}]}}``; ASK results are
  ``{"head": {}, "boolean": b}``.

Inputs are pyarrow Tables of canonical term-string columns (what
sparql_query returns once consumed); unbound OPTIONAL values are nulls and
serialize as empty/absent per spec.
"""

from __future__ import annotations

import json

import pyarrow as pa

from jena_ray.term import split_literal


def _raw_value(term) -> str:
    if term is None:
        return ""
    if not isinstance(term, str):  # aggregate alias columns (plain numbers)
        return str(term)
    if term.startswith("<<"):
        return term  # RDF-star quoted triple: its text form (CSV/TSV-star)
    if term.startswith("<"):
        return term[1:-1]
    if term.startswith("_:"):
        return term
    if term.startswith('"'):
        return split_literal(term)[0]
    return term


def _csv_field(v: str) -> str:
    if any(c in v for c in (',', '"', "\n", "\r")):
        return '"' + v.replace('"', '""') + '"'
    return v


def write_csv_results(tb: pa.Table) -> str:
    cols = tb.column_names
    out = [",".join(_csv_field(c) for c in cols)]
    for row in tb.to_pylist():
        out.append(",".join(_csv_field(_raw_value(row[c])) for c in cols))
    return "\r\n".join(out) + "\r\n"


def write_tsv_results(tb: pa.Table) -> str:
    cols = tb.column_names
    out = ["\t".join("?" + c for c in cols)]
    for row in tb.to_pylist():
        out.append(
            "\t".join(
                "" if row[c] is None
                else row[c] if isinstance(row[c], str) else str(row[c])
                for c in cols
            )
        )
    return "\n".join(out) + "\n"


_XSD = "http://www.w3.org/2001/XMLSchema#"


def _json_binding(term):
    if not isinstance(term, str):  # aggregate alias columns (plain numbers)
        dt = _XSD + ("integer" if isinstance(term, int) else "double")
        return {"type": "literal", "value": str(term), "datatype": dt}
    if term.startswith("<<"):
        # SPARQL-star results-json: nested triple binding
        from jena_ray.term import quoted_triple_parts

        s, p, o = quoted_triple_parts(term)
        return {
            "type": "triple",
            "value": {
                "subject": _json_binding(s),
                "predicate": _json_binding(p),
                "object": _json_binding(o),
            },
        }
    if term.startswith("<"):
        return {"type": "uri", "value": term[1:-1]}
    if term.startswith("_:"):
        return {"type": "bnode", "value": term[2:]}
    lex, lang, dt = split_literal(term)
    b: dict = {"type": "literal", "value": lex}
    if lang:
        b["xml:lang"] = lang
    elif dt:
        b["datatype"] = dt
    return b


def write_json_results(tb: pa.Table) -> str:
    cols = tb.column_names
    if cols == ["ask"]:  # boolean result form
        return json.dumps(
            {"head": {}, "boolean": bool(tb.column("ask")[0].as_py())}
        ) + "\n"
    bindings = []
    for row in tb.to_pylist():
        bindings.append(
            {c: _json_binding(row[c]) for c in cols if row[c] is not None}
        )
    return json.dumps(
        {"head": {"vars": cols}, "results": {"bindings": bindings}},
        ensure_ascii=False, indent=2,
    ) + "\n"


RESULT_WRITERS = {
    "csv": write_csv_results,
    "tsv": write_tsv_results,
    "json": write_json_results,
}


# ------------------------------------------------------------- SRX reader

_SRX_NS = "{http://www.w3.org/2005/sparql-results#}"


def parse_srx(text: str) -> dict:
    """Read the SPARQL Query Results XML Format (ResultSetReaderRegistry's
    SPARQLResultSetXML lang — the DAWG suites' expected-result format).

    Returns ``{"boolean": b}`` for ASK results, else ``{"vars": [...],
    "rows": [ {var: canonical-term, ...} ]}`` (unbound vars absent)."""
    import xml.etree.ElementTree as ET

    from jena_ray.term import fmt_iri, fmt_literal

    root = ET.fromstring(text)
    b = root.find(f"{_SRX_NS}boolean")
    if b is not None:
        return {"boolean": b.text.strip() == "true"}
    head = root.find(f"{_SRX_NS}head")
    vars_ = [v.get("name") for v in head.findall(f"{_SRX_NS}variable")] \
        if head is not None else []
    rows = []
    results = root.find(f"{_SRX_NS}results")
    for r in (results or []):
        row = {}
        for bind in r.findall(f"{_SRX_NS}binding"):
            name = bind.get("name")
            el = list(bind)[0]
            tag = el.tag.removeprefix(_SRX_NS)
            val = el.text or ""
            if tag == "uri":
                row[name] = fmt_iri(val)
            elif tag == "bnode":
                row[name] = "_:" + val
            else:  # literal
                lang = el.get("{http://www.w3.org/XML/1998/namespace}lang")
                dt = el.get("datatype")
                row[name] = fmt_literal(val, lang=lang, datatype=dt)
        rows.append(row)
    return {"vars": vars_, "rows": rows}


# ------------------------------------------------------------- SRJ reader


def _srj_term(b: dict) -> str:
    from jena_ray.term import fmt_iri, fmt_literal

    t = b["type"]
    if t == "uri":
        return fmt_iri(b["value"])
    if t == "bnode":
        return "_:" + b["value"]
    if t == "triple":
        v = b["value"]
        return (f"<<{_srj_term(v['subject'])} {_srj_term(v['predicate'])} "
                f"{_srj_term(v['object'])}>>")
    # "literal" / legacy "typed-literal"
    return fmt_literal(
        b["value"], lang=b.get("xml:lang"), datatype=b.get("datatype")
    )


def parse_srj(text: str) -> dict:
    """Read the SPARQL Query Results JSON Format
    (resultset/rw/ResultSetReaderJSON — the ARQ suites' other
    expected-result format). Same output shape as :func:`parse_srx`."""
    doc = json.loads(text)
    if "boolean" in doc:
        return {"boolean": bool(doc["boolean"])}
    rows = [
        {var: _srj_term(term) for var, term in binding.items()}
        for binding in doc.get("results", {}).get("bindings", [])
    ]
    return {"vars": doc.get("head", {}).get("vars", []), "rows": rows}
