"""RDF/JSON (Talis) reader producing canonical triples.

Reference behavior: jena-arq riot/lang/JsonLDReader sibling LangRDFJSON
(riot/lang/LangRDFJSON.java): the document is one JSON object mapping a
subject key (IRI or "_:label") to an object mapping predicate IRIs to
ARRAYS of value objects {"type": "uri"|"literal"|"bnode", "value": str,
"lang"?: str, "datatype"?: str}. Anything else is a syntax error. Fixtures:
jena-arq/testing/RIOT/Lang/RDF-JSON (.rj ↔ .nt pairs + bad cases).
"""

from __future__ import annotations

import json

from jena_ray import term as T
from jena_ray.term import TermError, resolve_iri


def _subject(key: str, bnodes: dict[str, str], base: str | None) -> str:
    if key.startswith("_:"):
        return bnodes.setdefault(key, f"_:L{key[2:]}")
    return T.fmt_iri(T.check_iri(resolve_iri(base, key)))


def _object(v, bnodes: dict[str, str], base: str | None) -> str:
    if not isinstance(v, dict):
        raise TermError(f"RDF/JSON object value must be an object, got {type(v).__name__}")
    typ = v.get("type")
    val = v.get("value")
    if not isinstance(val, str):
        raise TermError("RDF/JSON value must be a string")
    if typ == "uri":
        return T.fmt_iri(T.check_iri(resolve_iri(base, val)))
    if typ == "bnode":
        if not val.startswith("_:"):
            raise TermError(f"bad bnode value {val!r}")
        return bnodes.setdefault(val, f"_:L{val[2:]}")
    if typ == "literal":
        lang = v.get("lang")
        dt = v.get("datatype")
        if lang is not None and dt is not None:
            raise TermError("literal with both lang and datatype")
        return T.fmt_literal(val, lang=lang, datatype=dt)
    raise TermError(f"unknown RDF/JSON term type {typ!r}")


def parse_rdfjson(text: str, *, base: str | None = None) -> list[tuple[str, str, str]]:
    """Parse an RDF/JSON document → list of canonical (subj, pred, obj)."""
    # the reference's JSON tokenizer (atlas json) accepts '#' line comments
    # (rdf-json-00.rj fixture); JSON strings cannot contain raw newlines, so
    # stripping whole lines whose first non-blank char is '#' is safe
    text = "\n".join(
        ln for ln in text.splitlines() if not ln.lstrip().startswith("#")
    )
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise TermError(f"JSON error: {e}") from None
    if not isinstance(doc, dict):
        raise TermError("RDF/JSON document must be a JSON object")
    bnodes: dict[str, str] = {}
    out: list[tuple[str, str, str]] = []
    for skey, pmap in doc.items():
        if not isinstance(pmap, dict):
            raise TermError("subject value must be an object of predicates")
        s = _subject(skey, bnodes, base)
        for pkey, values in pmap.items():
            p = T.fmt_iri(T.check_iri(resolve_iri(base, pkey)))
            if not isinstance(values, list):
                raise TermError("predicate value must be an array")
            for v in values:
                out.append((s, p, _object(v, bnodes, base)))
    return out
