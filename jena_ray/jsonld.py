"""JSON-LD reader (conservative JSON-LD 1.0 subset) producing canonical
quads.

Reference behavior: jena-arq riot/lang/JsonLDReader.java (delegates to
jsonld-java's expansion + toRDF). This is a fresh implementation of the
subset the reference's own fixtures exercise
(jena-arq/testing/RIOT/jsonld/*.jsonld with .ttl/.trig ground truth):

- inline ``@context`` objects (term → IRI, prefix → namespace, term
  definitions with ``@id``/``@type`` coercion incl. ``@type: @id``,
  ``@language``, ``@vocab``, ``@base``); arrays of contexts merge
  left-to-right. Remote contexts are NOT fetched (no network) — they raise.
- node objects (``@id``, ``@type``, nested node objects, node references),
  value objects (``@value``/``@type``/``@language``), ``@list`` (expanded
  to an rdf:first/rest/nil chain), ``@graph`` (named graphs; top-level
  arrays and ``@graph`` land in the default graph).
- JSON natives: integer → xsd:integer, float → xsd:double (XSD canonical
  lexical), boolean → xsd:boolean.

Quads are (graph, subj, pred, obj) canonical term strings with
``<urn:x-arq:DefaultGraph>`` for the default graph (matching trig/trix).
"""

from __future__ import annotations

import json

from jena_ray import term as T
from jena_ray.term import TermError, resolve_iri

DEFAULT_GRAPH = "<urn:x-arq:DefaultGraph>"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@graph", "@context"}


class _Context:
    def __init__(self):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base: str | None = None
        self.language: str | None = None

    def merge(self, obj) -> "_Context":
        ctx = _Context()
        ctx.terms = dict(self.terms)
        ctx.vocab, ctx.base, ctx.language = self.vocab, self.base, self.language
        items = obj if isinstance(obj, list) else [obj]
        for it in items:
            if it is None:
                ctx = _Context()
                continue
            if isinstance(it, str):
                raise TermError(f"remote @context not supported: {it!r}")
            if not isinstance(it, dict):
                raise TermError("@context must be an object")
            for k, v in it.items():
                if k == "@vocab":
                    ctx.vocab = v
                elif k == "@base":
                    ctx.base = v
                elif k == "@language":
                    ctx.language = v
                elif isinstance(v, str):
                    ctx.terms[k] = {"@id": v}
                elif isinstance(v, dict):
                    ctx.terms[k] = v
                else:
                    raise TermError(f"bad term definition for {k!r}")
        return ctx

    def expand_iri(self, value: str, *, vocab: bool = False) -> str | None:
        """Term/compact-IRI/absolute-IRI → absolute IRI string (no <>)."""
        if value.startswith("@"):
            return None
        if value in self.terms:
            tid = self.terms[value].get("@id", value)
            if tid == value and ":" not in tid and vocab and self.vocab:
                return self.vocab + tid
            return self.expand_iri(tid, vocab=False) if tid != value else tid
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if prefix == "_":
                return value  # blank node id, handled by caller
            if not suffix.startswith("//") and prefix in self.terms:
                ns = self.terms[prefix].get("@id", "")
                return ns + suffix
            return value  # absolute IRI
        if vocab and self.vocab:
            return self.vocab + value
        if self.base is not None:
            return resolve_iri(self.base, value)
        return None

    def term_def(self, key: str) -> dict:
        return self.terms.get(key, {})


class _JsonLDParser:
    def __init__(self, base: str | None):
        self.base = base
        self.quads: list[tuple[str, str, str, str]] = []
        self.bnodes: dict[str, str] = {}
        self.gen = 0

    def fresh_bnode(self) -> str:
        self.gen += 1
        return f"_:G{self.gen}"

    def node_term(self, ident: str, ctx: _Context) -> str:
        """@id string → IRI or bnode canonical term."""
        if ident.startswith("_:"):
            return self.bnodes.setdefault(ident, f"_:L{ident[2:]}")
        iri = ctx.expand_iri(ident) or ident
        return T.fmt_iri(T.check_iri(resolve_iri(self.base, iri)))

    def _native_literal(self, v) -> str:
        if isinstance(v, bool):
            return T.fmt_literal("true" if v else "false", datatype=XSD + "boolean")
        if isinstance(v, int):
            return T.fmt_literal(str(v), datatype=XSD + "integer")
        if isinstance(v, float):
            # XSD canonical double lexical (JSON-LD toRDF: mantissaEexp)
            mant, _, exp = f"{v:E}".partition("E")
            mant = mant.rstrip("0").rstrip(".")
            if "." not in mant:
                mant += ".0"
            return T.fmt_literal(f"{mant}E{int(exp)}", datatype=XSD + "double")
        raise TermError(f"unsupported native value {v!r}")

    def _typed_lexical(self, v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def value_object(self, obj: dict, ctx: _Context) -> str:
        v = obj["@value"]
        dt = obj.get("@type")
        lang = obj.get("@language")
        if dt is not None:
            dt_iri = ctx.expand_iri(dt, vocab=True) or dt
            return T.fmt_literal(self._typed_lexical(v), datatype=dt_iri)
        if lang is not None:
            return T.fmt_literal(str(v), lang=lang)
        if isinstance(v, (bool, int, float)):
            return self._native_literal(v)
        return T.fmt_literal(str(v))

    def coerced_value(self, v, tdef: dict, ctx: _Context, graph: str) -> str:
        """A property value (after array unwrap) → object term."""
        if isinstance(v, dict):
            if "@value" in v:
                return self.value_object(v, ctx)
            if "@list" in v:
                return self.rdf_list(v["@list"], tdef, ctx, graph)
            return self.node_object(v, ctx, graph)
        coerce = tdef.get("@type")
        if isinstance(v, str):
            if coerce == "@id":
                if v.startswith("_:"):
                    return self.bnodes.setdefault(v, f"_:L{v[2:]}")
                return self.node_term(v, ctx)
            if coerce:
                dt_iri = ctx.expand_iri(coerce, vocab=True) or coerce
                return T.fmt_literal(v, datatype=dt_iri)
            lang = tdef.get("@language", ctx.language)
            return T.fmt_literal(v, lang=lang)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            if coerce and not isinstance(v, bool):
                return T.fmt_literal(self._typed_lexical(v), datatype=ctx.expand_iri(coerce, vocab=True) or coerce)
            return self._native_literal(v)
        if coerce and coerce != "@id":
            dt_iri = ctx.expand_iri(coerce, vocab=True) or coerce
            return T.fmt_literal(self._typed_lexical(v), datatype=dt_iri)
        return self._native_literal(v)

    def rdf_list(self, items: list, tdef: dict, ctx: _Context, graph: str) -> str:
        head = T.fmt_iri(RDF_NS + "nil")
        first = T.fmt_iri(RDF_NS + "first")
        rest = T.fmt_iri(RDF_NS + "rest")
        prev = None
        head_term = head
        for it in items:
            node = self.fresh_bnode()
            if prev is None:
                head_term = node
            else:
                self.quads.append((graph, prev, rest, node))
            obj = self.coerced_value(it, {}, ctx, graph)
            self.quads.append((graph, node, first, obj))
            prev = node
        if prev is not None:
            self.quads.append((graph, prev, rest, head))
        return head_term

    def node_object(self, obj: dict, ctx: _Context, graph: str) -> str:
        if "@context" in obj:
            ctx = ctx.merge(obj["@context"])
        ident = obj.get("@id")
        subj = self.node_term(ident, ctx) if ident is not None else self.fresh_bnode()

        for tv in _as_list(obj.get("@type", [])):
            t_iri = ctx.expand_iri(tv, vocab=True)
            if t_iri:
                self.quads.append(
                    (graph, subj, T.fmt_iri(RDF_NS + "type"),
                     T.fmt_iri(T.check_iri(t_iri)))
                )

        if "@graph" in obj:
            # named graph: this node's @id names the graph of its contents
            inner_graph = subj if ident is not None else DEFAULT_GRAPH
            for n in _as_list(obj["@graph"]):
                self.node_object(n, ctx, inner_graph)

        for key, val in obj.items():
            if key in _KEYWORDS:
                continue
            pred_iri = ctx.expand_iri(key, vocab=True)
            if pred_iri is None or ":" not in pred_iri:
                continue  # JSON-LD drops non-IRI-mapped keys
            pred = T.fmt_iri(T.check_iri(pred_iri))
            tdef = ctx.term_def(key)
            if isinstance(val, dict) and "@list" in val:
                self.quads.append(
                    (graph, subj, pred, self.rdf_list(val["@list"], tdef, ctx, graph))
                )
                continue
            for v in _as_list(val):
                self.quads.append((graph, subj, pred, self.coerced_value(v, tdef, ctx, graph)))
        return subj


def _as_list(v):
    return v if isinstance(v, list) else [v]


def parse_jsonld(text: str, *, base: str | None = None) -> list[tuple[str, str, str, str]]:
    """Parse a JSON-LD document → list of canonical (graph, subj, pred, obj)."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise TermError(f"JSON error: {e}") from None
    p = _JsonLDParser(base)
    ctx = _Context()
    if isinstance(doc, dict):
        if "@context" in doc:
            ctx = ctx.merge(doc["@context"])
        if "@graph" in doc and "@id" not in doc:
            # top-level default-graph wrapper
            for n in _as_list(doc["@graph"]):
                p.node_object(n, ctx, DEFAULT_GRAPH)
            # a wrapper may still carry properties; handled if @id present
        else:
            p.node_object(doc, ctx, DEFAULT_GRAPH)
    elif isinstance(doc, list):
        for n in doc:
            p.node_object(n, ctx, DEFAULT_GRAPH)
    else:
        raise TermError("JSON-LD document must be an object or array")
    return p.quads
