"""TriX reader (RDF quads in XML) producing canonical quads.

Reference behavior: jena-arq riot/lang/ReaderTriX.java — a four-state StAX
machine (OUTER/TRIX/GRAPH/TRIPLE over tags trix|TriX, graph, triple, uri,
id, qname, plainLiteral, typedLiteral), with graph names as uri/qname/id,
rdf:XMLLiteral inner-XML slurping that reconstructs tags with their
namespace declarations (ReaderTriX.slurpRDFXMLLiteral), and hard errors for
literal subjects/predicates, wrong term counts, duplicate graph names, and
out-of-place elements. This is a fresh expat-based implementation of the
same state machine; the reference's own fixtures
(jena-arq/testing/RIOT/Lang/TriX: trix-NN.trix vs .nq pairs, trix-bad-NN
negatives) drive tests/test_trix.py.

Quads are (graph, subj, pred, obj) canonical term strings; default-graph
rows carry ``<urn:x-arq:DefaultGraph>`` like the TriG parser.
"""

from __future__ import annotations

import xml.parsers.expat

from jena_ray import term as T
from jena_ray.term import TermError, resolve_iri

DEFAULT_GRAPH = "<urn:x-arq:DefaultGraph>"
RDF_XMLLITERAL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"

_OUTER, _TRIX, _GRAPH, _TRIPLE = range(4)
_TERM_TAGS = {"uri", "id", "qname", "plainLiteral", "typedLiteral"}


def _local(name: str) -> str:
    return name.rsplit(":", 1)[-1]


class _TriXParser:
    """Event-driven mirror of ReaderTriX's state machine. Raw (non-namespace)
    expat parsing: prefixes stay visible, so qname resolution and XMLLiteral
    tag reconstruction use an explicit xmlns scope stack like StAX does."""

    def __init__(self, base: str | None):
        self.base = base
        self.state = _OUTER
        self.graph: str | None = None
        self.terms: list[str] = []
        self.quads: list[tuple[str, str, str, str]] = []
        self.ns_stack: list[dict[str, str]] = [{}]
        self.bnodes: dict[str, str] = {}
        self.gen = 0
        # current term element being collected (None between terms)
        self.term_tag: str | None = None
        self.term_attrs: dict[str, str] = {}
        self.text: list[str] = []
        # XMLLiteral slurp depth (-1 = not slurping)
        self.slurp_depth = -1

    # --- term construction (ParserProfileStd analogs) ---

    def _iri(self, x: str) -> str:
        return T.fmt_iri(T.check_iri(resolve_iri(self.base, x)))

    def _bnode(self, label: str) -> str:
        if label not in self.bnodes:
            self.bnodes[label] = f"_:L{label}"
        return self.bnodes[label]

    def _ns_lookup(self, prefix: str) -> str:
        for scope in reversed(self.ns_stack):
            if prefix in scope:
                return scope[prefix]
        raise TermError(f"unbound namespace prefix {prefix!r} in qname")

    def _finish_term(self) -> str:
        tag, attrs, lex = self.term_tag, self.term_attrs, "".join(self.text)
        if tag == "uri":
            return self._iri(lex)
        if tag == "id":
            return self._bnode(lex)
        if tag == "qname":
            if ":" not in lex:
                raise TermError(f"expected ':' in prefixed name, found {lex!r}")
            prefix, local = lex.split(":", 1)
            return self._iri(self._ns_lookup(prefix) + local)
        if tag == "plainLiteral":
            lang = attrs.get("xml:lang")
            extra = [k for k in attrs if k != "xml:lang" and not k.startswith("xmlns")]
            if extra:
                raise TermError("plainLiteral: only xml:lang allowed")
            return T.fmt_literal(lex, lang=lang)
        if tag == "typedLiteral":
            dts = [v for k, v in attrs.items() if _local(k) == "datatype"]
            others = [
                k for k in attrs if _local(k) != "datatype" and not k.startswith("xmlns")
            ]
            if not dts:
                raise TermError("typedLiteral: no datatype attribute")
            if len(dts) > 1 or others:
                raise TermError("typedLiteral: only one attribute allowed")
            return T.fmt_literal(lex, datatype=dts[0])
        raise TermError(f"unrecognized term tag {tag!r}")

    # --- expat handlers ---

    def start(self, name: str, attrs: dict[str, str]) -> None:
        if self.slurp_depth >= 0:
            # inside an rdf:XMLLiteral: reconstruct the tag verbatim
            # (attributes in document order include xmlns declarations)
            parts = [f'{k}="{v}"' for k, v in attrs.items()]
            self.text.append(f"<{name}" + ("".join(" " + p for p in parts)) + ">")
            self.slurp_depth += 1
            return
        scope = {
            (k[6:] if k.startswith("xmlns:") else ""): v
            for k, v in attrs.items()
            if k.startswith("xmlns")
        }
        self.ns_stack.append(scope)
        tag = _local(name)
        if self.term_tag is not None:
            raise TermError(f"unexpected element {tag!r} inside <{self.term_tag}>")
        if tag in ("trix", "TriX"):
            if self.state != _OUTER:
                raise TermError("out of place TriX element")
            self.state = _TRIX
        elif tag == "graph":
            if self.state != _TRIX:
                raise TermError("out of place graph element")
            self.state = _GRAPH
        elif tag == "triple":
            if self.state != _GRAPH:
                raise TermError("out of place triple element")
            self.state = _TRIPLE
        elif tag in ("uri", "id", "qname"):
            if self.state not in (_GRAPH, _TRIPLE):
                raise TermError(f"out of place {tag} element")
            self.term_tag, self.term_attrs, self.text = tag, dict(attrs), []
        elif tag in ("plainLiteral", "typedLiteral"):
            if self.state != _TRIPLE:
                raise TermError(f"out of place {tag} element")
            self.term_tag, self.term_attrs, self.text = tag, dict(attrs), []
            dts = [v for k, v in attrs.items() if _local(k) == "datatype"]
            if tag == "typedLiteral" and dts == [RDF_XMLLITERAL]:
                self.slurp_depth = 0
        else:
            raise TermError(f"unrecognized XML element {name!r}")

    def end(self, name: str) -> None:
        if self.slurp_depth > 0:
            self.text.append(f"</{name}>")
            self.slurp_depth -= 1
            return
        self.slurp_depth = -1
        tag = _local(name)
        if tag in _TERM_TAGS and self.term_tag == tag:
            term = self._finish_term()
            self.term_tag = None
            if self.state == _GRAPH:
                if term.startswith('"'):
                    raise TermError("graph name is a literal")
                if self.graph is not None:
                    raise TermError("duplicate graph name")
                self.graph = term
            else:
                if len(self.terms) >= 3:
                    raise TermError("too many terms for a triple")
                self.terms.append(term)
        elif tag == "triple":
            if len(self.terms) != 3:
                raise TermError(
                    f"wrong number of terms for a triple: want 3, got {len(self.terms)}"
                )
            s, p, o = self.terms
            if s.startswith('"'):
                raise TermError("subject is a literal")
            if p.startswith('"') or p.startswith("_:"):
                raise TermError("predicate must be an IRI")
            self.quads.append((self.graph or DEFAULT_GRAPH, s, p, o))
            self.terms = []
            self.state = _GRAPH
        elif tag == "graph":
            self.state = _TRIX
            self.graph = None
        elif tag in ("trix", "TriX"):
            self.state = _OUTER
        # every non-slurped start pushed a scope (slurp-inner ends returned
        # early above), so every end reaching here pops exactly one
        if len(self.ns_stack) > 1:
            self.ns_stack.pop()

    def chardata(self, data: str) -> None:
        if self.term_tag is not None:
            self.text.append(data)
        elif data.strip():
            raise TermError(f"unexpected character data {data.strip()[:40]!r}")


def parse_trix(text: str, *, base: str | None = None) -> list[tuple[str, str, str, str]]:
    """Parse a TriX document → list of canonical (graph, subj, pred, obj)."""
    handler = _TriXParser(base)
    p = xml.parsers.expat.ParserCreate(namespace_separator=None)
    p.ordered_attributes = False
    p.StartElementHandler = handler.start
    p.EndElementHandler = handler.end
    p.CharacterDataHandler = handler.chardata
    try:
        p.Parse(text, True)
    except xml.parsers.expat.ExpatError as e:
        raise TermError(f"XML error: {e}") from None
    if handler.state != _OUTER:
        raise TermError("premature end of file")
    return handler.quads
