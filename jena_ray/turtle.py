"""Turtle parser (W3C Turtle 1.1 grammar) producing canonical N-Triples terms.

Reference behavior: jena-arq riot/lang/LangTurtle.java + LangTurtleBase.java
(directives at LangTurtleBase.java:95-165, predicate-object lists,
collections) over TokenizerText. This is a fresh recursive-descent
implementation against the published W3C grammar; conformance is asserted by
the TurtleStd suite (jena-arq/testing/RIOT/Lang/TurtleStd, 390 files) with
graph-isomorphism eval comparison (RiotEvalTest.java:94).

Turtle is context-dependent (prefix/base state) → whole-document parsing,
one document per task (elephas AbstractWholeFileInputFormat.isSplitable=false).

Blank nodes: parsed labels map to ``L<label>``, generated (ANON, property
lists, collections) to ``G<counter>`` — collision-free namespaces; callers
wanting stable global labels skolemize afterwards (per-document seed).
"""

from __future__ import annotations

import re

from jena_ray import term as T
from jena_ray.term import TermError, resolve_iri

XSD = T.XSD
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = f"<{RDF}first>"
RDF_REST = f"<{RDF}rest>"
RDF_NIL = f"<{RDF}nil>"
RDF_TYPE = f"<{RDF}type>"

_WS_RE = re.compile(r"(?:[ \t\r\n]+|#[^\r\n]*)*")
_IRIREF_RE = re.compile(T.IRIREF)
_PNAME_NS_RE = re.compile(rf"(?:[{T._PN_CHARS_BASE}](?:[{T._PN_CHARS}.]*[{T._PN_CHARS}])?)?:")
_PN_LOCAL_ESC = r"\\[_~.\-!$&'()*+,;=/?#@%]"
_PLX = rf"(?:%[0-9A-Fa-f]{{2}}|{_PN_LOCAL_ESC})"
_PN_LOCAL_RE = re.compile(
    rf"(?:[{T._PN_CHARS_U}:0-9]|{_PLX})(?:(?:[{T._PN_CHARS}.:]|{_PLX})*(?:[{T._PN_CHARS}:]|{_PLX}))?"
)
_BNODE_RE = re.compile(T.BNODE_LABEL)
_LANGTAG_RE = re.compile(T.LANGTAG)
_INTEGER_RE = re.compile(r"[+-]?[0-9]+")
_DECIMAL_RE = re.compile(r"[+-]?[0-9]*\.[0-9]+")
_DOUBLE_RE = re.compile(
    r"[+-]?(?:[0-9]+\.[0-9]*[eE][+-]?[0-9]+|\.[0-9]+[eE][+-]?[0-9]+|[0-9]+[eE][+-]?[0-9]+)"
)
# string bodies
_STR_DQ = re.compile(r'(?:[^"\\\n\r]|\\.)*')
_STR_SQ = re.compile(r"(?:[^'\\\n\r]|\\.)*")
_STR_LDQ = re.compile(r'(?:[^"\\]|"(?!"")|\\.)*', re.S)
_STR_LSQ = re.compile(r"(?:[^'\\]|'(?!'')|\\.)*", re.S)

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class TurtleParser:
    def __init__(self, text: str, *, base: str | None = None):
        self.s = text
        self.i = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.gen = 0
        self.triples: list[tuple[str, str, str]] = []
        # True iff the most recent subject() came from '[ po-list ]' — only
        # that form may omit its own predicateObjectList (grammar triples2;
        # lone collections/ANON subjects are bad syntax: trig-syntax-bad-list)
        self.subject_was_bnpl = False

    # ---- scanning helpers ----

    def ws(self) -> None:
        self.i = _WS_RE.match(self.s, self.i).end()

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self, n: int = 1) -> str:
        return self.s[self.i : self.i + n]

    def expect(self, lit: str) -> None:
        if not self.s.startswith(lit, self.i):
            raise TermError(f"expected {lit!r} at offset {self.i}: ...{self.s[self.i:self.i+30]!r}")
        self.i += len(lit)

    def try_lit(self, lit: str) -> bool:
        if self.s.startswith(lit, self.i):
            self.i += len(lit)
            return True
        return False

    def _match(self, rx: re.Pattern) -> str | None:
        m = rx.match(self.s, self.i)
        if m is None or m.end() == m.start():
            return None
        self.i = m.end()
        return m.group()

    # ---- terms ----

    def fresh_bnode(self) -> str:
        self.gen += 1
        return f"_:G{self.gen}"

    def iriref_or_pname(self) -> str | None:
        if self.peek() == "<":
            m = _IRIREF_RE.match(self.s, self.i)
            if not m:
                raise TermError(f"bad IRIREF at offset {self.i}")
            self.i = m.end()
            iri = T.unescape_iri(m.group(1))
            iri = resolve_iri(self.base, iri)
            return T.fmt_iri(T.check_iri(iri))
        m = _PNAME_NS_RE.match(self.s, self.i)
        if m:
            ns = m.group()[:-1]
            self.i = m.end()
            local_m = _PN_LOCAL_RE.match(self.s, self.i)
            local = ""
            if local_m:
                local = local_m.group()
                self.i = local_m.end()
            if ns not in self.prefixes:
                raise TermError(f"undefined prefix '{ns}:'")
            local = re.sub(r"\\(.)", r"\1", local)  # PN_LOCAL_ESC
            return T.fmt_iri(T.check_iri(self.prefixes[ns] + local))
        return None

    def string_body(self) -> str | None:
        if self.try_lit('"""'):
            m = _STR_LDQ.match(self.s, self.i)
            self.i = m.end()
            self.expect('"""')
            return m.group()
        if self.try_lit("'''"):
            m = _STR_LSQ.match(self.s, self.i)
            self.i = m.end()
            self.expect("'''")
            return m.group()
        if self.try_lit('"'):
            m = _STR_DQ.match(self.s, self.i)
            self.i = m.end()
            self.expect('"')
            return m.group()
        if self.try_lit("'"):
            m = _STR_SQ.match(self.s, self.i)
            self.i = m.end()
            self.expect("'")
            return m.group()
        return None

    # NOTE: long strings ending in extra quotes before the delimiter
    # ('\"\"\"ab\"\"\"\"') are BAD syntax: the reference's own suite marks
    # them negative (TurtleStd turtle-syntax-bad-string-06/07) and Jena's
    # TokenizerText.readLongString terminates at the FIRST run of three
    # quotes, leaving a stray quote that fails the next token. The body
    # regexes above reproduce exactly that.

    def literal(self) -> str | None:
        start = self.i
        body = self.string_body()
        if body is not None:
            lex = _validated_unescape(body)
            if self.try_lit("^^"):
                dt = self.iriref_or_pname()
                if dt is None:
                    raise TermError(f"expected datatype IRI at offset {self.i}")
                return T.fmt_literal(lex, datatype=T.iri_value(dt))
            m = _LANGTAG_RE.match(self.s, self.i)
            if m:
                self.i = m.end()
                return T.fmt_literal(lex, lang=m.group(1))
            if self.peek() == "@":
                raise TermError(f"bad language tag at offset {self.i}")
            return T.fmt_literal(lex)
        # numeric / boolean
        for rx, dt in ((_DOUBLE_RE, "double"), (_DECIMAL_RE, "decimal"), (_INTEGER_RE, "integer")):
            m = rx.match(self.s, self.i)
            if m:
                self.i = m.end()
                return T.fmt_literal(m.group(), datatype=XSD + dt)
        if re.match(r"true(?![A-Za-z0-9_])", self.s[self.i :]):
            self.i += 4
            return T.fmt_literal("true", datatype=XSD + "boolean")
        if re.match(r"false(?![A-Za-z0-9_])", self.s[self.i :]):
            self.i += 5
            return T.fmt_literal("false", datatype=XSD + "boolean")
        self.i = start
        return None

    def blank_node(self) -> str | None:
        m = _BNODE_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return f"_:L{m.group(1)}"
        return None

    def quoted_triple(self) -> str | None:
        """Turtle-star ``<< qtSubject verb qtObject >>`` (RIOT Turtle with
        the star profile; rdf_star/TestTurtleStarParse.java). qtSubject:
        iri | BlankNode | ANON | quoted triple; qtObject adds literals;
        collections and '[ po-list ]' are bad syntax inside. Must be tried
        BEFORE iriref_or_pname (which raises 'bad IRIREF' on '<<')."""
        if self.peek(2) != "<<":
            return None
        self.i += 2

        def qt_term(object_pos: bool) -> str:
            self.ws()
            t = self.quoted_triple()
            if t is not None:
                return t
            t = self.iriref_or_pname()
            if t is not None:
                return t
            t = self.blank_node()
            if t is not None:
                return t
            if self.peek() == "[":
                save = self.i
                self.i += 1
                self.ws()
                if self.try_lit("]"):
                    return self.fresh_bnode()  # ANON is allowed
                self.i = save
                raise TermError(
                    f"property list not allowed inside a quoted triple "
                    f"(offset {self.i})"
                )
            if self.peek() == "(":
                raise TermError(
                    f"collection not allowed inside a quoted triple "
                    f"(offset {self.i})"
                )
            if object_pos:
                t = self.literal()
                if t is not None:
                    return t
            raise TermError(f"bad term inside quoted triple at offset {self.i}")

        s = qt_term(False)
        self.ws()
        v = self.verb()
        if v is None:
            raise TermError(
                f"expected predicate inside quoted triple at offset {self.i}"
            )
        o = qt_term(True)
        self.ws()
        self.expect(">>")
        return T.fmt_quoted_triple(s, v, o)

    def subject(self) -> str | None:
        self.subject_was_bnpl = False
        t = self.quoted_triple()
        if t is not None:
            return t
        t = self.iriref_or_pname()
        if t is not None:
            return t
        t = self.blank_node()
        if t is not None:
            return t
        if self.peek() == "(":
            return self.collection()
        if self.peek() == "[":
            save = self.i
            self.i += 1
            self.ws()
            if self.try_lit("]"):
                return self.fresh_bnode()  # ANON
            self.i = save
            node = self.bnode_property_list()
            self.subject_was_bnpl = True
            return node
        return None

    def object_(self) -> str | None:
        t = self.quoted_triple()
        if t is not None:
            return t
        t = self.iriref_or_pname()
        if t is not None:
            return t
        t = self.blank_node()
        if t is not None:
            return t
        if self.peek() == "(":
            return self.collection()
        if self.peek() == "[":
            save = self.i
            self.i += 1
            self.ws()
            if self.try_lit("]"):
                return self.fresh_bnode()
            self.i = save
            return self.bnode_property_list()
        return self.literal()

    def verb(self) -> str | None:
        if re.match(r"a(?![A-Za-z0-9_:\-])", self.s[self.i :]):
            self.i += 1
            return RDF_TYPE
        return self.iriref_or_pname()

    def collection(self) -> str:
        self.expect("(")
        items: list[str] = []
        while True:
            self.ws()
            if self.try_lit(")"):
                break
            if self.eof():
                raise TermError("unterminated collection")
            o = self.object_()
            if o is None:
                raise TermError(f"bad collection item at offset {self.i}")
            items.append(o)
        if not items:
            return RDF_NIL
        head = self.fresh_bnode()
        node = head
        for idx, item in enumerate(items):
            self.triples.append((node, RDF_FIRST, item))
            if idx + 1 < len(items):
                nxt = self.fresh_bnode()
                self.triples.append((node, RDF_REST, nxt))
                node = nxt
            else:
                self.triples.append((node, RDF_REST, RDF_NIL))
        return head

    def bnode_property_list(self) -> str:
        self.expect("[")
        node = self.fresh_bnode()
        self.ws()
        self.predicate_object_list(node)
        self.ws()
        self.expect("]")
        return node

    def predicate_object_list(self, subj: str) -> None:
        first = True
        while True:
            self.ws()
            v = self.verb()
            if v is None:
                if first:
                    raise TermError(f"expected predicate at offset {self.i}")
                return
            first = False
            while True:
                self.ws()
                o = self.object_()
                if o is None:
                    raise TermError(f"expected object at offset {self.i}")
                self.triples.append((subj, v, o))
                self.ws()
                if not self.try_lit(","):
                    break
            self.ws()
            if not self.try_lit(";"):
                return
            # allow trailing ';' (and repeated) before ']' or '.'
            while True:
                self.ws()
                if not self.try_lit(";"):
                    break

    # ---- statements ----

    def directive(self) -> bool:
        if self.try_lit("@prefix"):
            self.ws()
            m = _PNAME_NS_RE.match(self.s, self.i)
            if not m:
                raise TermError(f"bad @prefix at offset {self.i}")
            ns = m.group()[:-1]
            self.i = m.end()
            self.ws()
            iri = self._directive_iri()
            self.prefixes[ns] = iri
            self.ws()
            self.expect(".")
            return True
        if self.try_lit("@base"):
            self.ws()
            self.base = self._directive_iri()
            self.ws()
            self.expect(".")
            return True
        m = re.match(r"(?i)PREFIX(?=[ \t\r\n<])", self.s[self.i :])
        if m:
            self.i += m.end()
            self.ws()
            m2 = _PNAME_NS_RE.match(self.s, self.i)
            if not m2:
                raise TermError(f"bad PREFIX at offset {self.i}")
            ns = m2.group()[:-1]
            self.i = m2.end()
            self.ws()
            self.prefixes[ns] = self._directive_iri()
            return True
        m = re.match(r"(?i)BASE(?=[ \t\r\n<])", self.s[self.i :])
        if m:
            self.i += m.end()
            self.ws()
            self.base = self._directive_iri()
            return True
        return False

    def _directive_iri(self) -> str:
        m = _IRIREF_RE.match(self.s, self.i)
        if not m:
            raise TermError(f"expected IRIREF at offset {self.i}")
        self.i = m.end()
        iri = T.unescape_iri(m.group(1))
        return resolve_iri(self.base, iri) if not _SCHEME_RE.match(iri) else iri

    def parse(self) -> list[tuple[str, str, str]]:
        while True:
            self.ws()
            if self.eof():
                break
            if self.directive():
                continue
            subj = self.subject()
            if subj is None:
                raise TermError(f"expected subject at offset {self.i}: {self.s[self.i:self.i+30]!r}")
            self.ws()
            # a lone blankNodePropertyList may omit the predicateObjectList
            v_save = self.i
            has_pol = True
            if self.subject_was_bnpl:
                self.ws()
                if self.peek() == ".":
                    has_pol = False
            if has_pol:
                self.i = v_save
                self.predicate_object_list(subj)
            self.ws()
            self.expect(".")
        return self.triples


def _validated_unescape(body: str) -> str:
    """Unescape string body, rejecting bad \\-escapes (TokenizerText checks)."""
    return T.unescape_string(body)


def parse_turtle(
    text: str, *, base: str | None = None, skolem_seed: bytes | None = None
) -> list[tuple[str, str, str]]:
    """Parse a Turtle document → canonical triples (set semantics preserved
    as a list; dedup downstream). Optionally skolemize blank nodes."""
    p = TurtleParser(text, base=base)
    out = p.parse()
    if skolem_seed is not None:
        labels: dict[str, str] = {}
        out = [
            (
                T.skolemize_term(s, skolem_seed, labels),
                pp,
                T.skolemize_term(o, skolem_seed, labels),
            )
            for s, pp, o in out
        ]
    return out


def read_turtle(paths, *, base: str | None = None, job_seed: str = "jena-ray", concurrency: int = 4):
    """Whole-file Turtle Dataset source (one file per task — Turtle is
    order/context-dependent and not splittable; SURVEY §2.9). Blank nodes are
    skolemized with a per-file seed so labels are globally stable."""
    import pyarrow as pa
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        ss, ps, os_, srcs = [], [], [], []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            seed = T.bnode_seed(job_seed, path)
            for s, p, o in parse_turtle(
                data.decode("utf-8"), base=base or f"file://{path}", skolem_seed=seed
            ):
                ss.append(s)
                ps.append(p)
                os_.append(o)
                srcs.append(path)
        return pa.table(
            {
                "subj": pa.array(ss, type=pa.string()),
                "pred": pa.array(ps, type=pa.string()),
                "obj": pa.array(os_, type=pa.string()),
                "src": pa.array(srcs, type=pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
