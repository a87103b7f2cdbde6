"""SPARQL 1.1 text front-end — parse a query string, lower it to the
algebra layer in pipelines/bgp.py, execute over the id indexes.

Reference shape: jena-arq parses SPARQL with the javacc grammar
(jena-arq/Grammar/main.jj via sparql/lang/ParserSPARQL11.java), lowers
syntax to algebra ops in sparql/algebra/AlgebraGenerator.java, and
executes them in engine/main/OpExecutor.java.  Here the three layers are:
``tokenize`` → ``Parser`` (recursive descent producing a small AST) →
``sparql_query`` (compiles the AST onto bgp_execute / bgp_union /
bgp_optional / bgp_minus / quad_bgp_execute / bgp_construct /
path_closure and the Dataset-level solution modifiers).

Supported subset (documented; anything else raises ``SparqlSyntaxError``):

- Prologue: ``BASE`` / ``PREFIX``. Two grammar modes (Parser(arq=...)):
  the default accepts the ARQ syntax extensions (LET, bare select
  expressions / aggregates, braceless sub-SELECT amid group elements);
  ``arq=False`` parses strict SPARQL 1.1 and rejects them.
- ``SELECT [DISTINCT|REDUCED] (?v ... | * | (AGG(...) AS ?alias))``,
  ``ASK``, ``CONSTRUCT { template } WHERE { ... }`` — templates may hold
  ARQ quads blocks ``GRAPH g { ... }`` / bare ``{ ... }`` producing a
  (graph, subj, pred, obj) result, the WHERE may use OPTIONAL / UNION /
  MINUS / BIND / VALUES / paths (evaluated as a DISTINCT SELECT over the
  template variables with TemplateLib null-skip instantiation) — and
  ``DESCRIBE term-or-var ... [WHERE { ... }]`` (forward triples + bnode
  closure, DescribeBNodeClosure semantics).
- Dataset clause: ``FROM <doc>`` / ``FROM NAMED <doc>`` construct the
  query dataset by loading the documents (DynamicDatasets) into an
  ephemeral default-graph + named-graph store.
- Group graph pattern: triple blocks (``;`` ``,`` ``a`` abbreviations,
  prefixed names, typed/lang literals, numeric/boolean shorthand; the
  ``.`` separator between blocks and per-BGP blank-node label scoping
  are enforced per the grammar),
  ``FILTER`` (incl. ``EXISTS`` / ``NOT EXISTS`` sub-groups, bare or as
  top-level ``&&`` conjuncts, and ``!EXISTS``), ``BIND`` (also inside
  OPTIONAL via the guarded post-join rewrite),
  one ``OPTIONAL`` block, one ``MINUS`` block,
  ``{A} UNION {B} [UNION ...]``, ``VALUES``,
  ``GRAPH term-or-var { ... }`` blocks (lowered to 4-slot quad patterns
  that JOIN the group's default-graph patterns — mixed groups, GRAPH in
  UNION branches, multiple GRAPH blocks, and arbitrary sub-patterns
  inside GRAPH: UNION / OPTIONAL / MINUS / EXISTS / BIND / VALUES
  re-scope recursively), ``SERVICE`` (executes against an injectable
  IRI→local-store endpoint resolver; SILENT degrades to the unit
  solution, variable endpoints raise — Service.java semantics, no real
  HTTP in this sandbox), disconnected pattern
  components (cartesian OpJoin), ``{ SELECT ... }`` subqueries, and
  property paths: ``^p`` inverse and ``p1/p2`` sequences desugar into the
  BGP (PathCompiler reduction); ``p1|p2`` alternation and ``!(p1|...)``
  negated property sets (P_Alt / P_NegPropSet) as masked open scans;
  ``p{n}`` / ``p{n,n}`` fixed length (ARQ P_FixedLength) as an n-chain;
  ``p{n,m}`` ranges (ARQ P_Mod) as the distinct union of k-step chains;
  ``term p+ ?v`` / ``term p* ?v`` closures run path_closure
  (P_OneOrMore / P_ZeroOrMore), including inverted ``^p+``.
- FILTER expressions: ``&&`` / ``||`` boolean combinations (``&&`` binds
  tighter; parenthesised sub-expressions allowed) of comparisons
  (``= != < <= > >=`` over numbers or terms, with arithmetic
  ``+ - * /`` operand expressions, XSD-numeric typed constants compared
  by value, xsd:date/dateTime constants compared in the temporal
  value space with XSD ±14h timezone-indeterminacy semantics, VAR-VAR
  ordering comparisons per value space — numeric / simple-string /
  same-kind temporal — and constant-boolean compositions as operands);
  ``?a = ?b`` / ``= "literal"`` compare by VALUE (RDFterm-equal /
  E_Equals three-valued semantics: numeric promotion, string/lang/bool/
  temporal spaces, type errors on unknown value spaces);
  bare ``?v`` / ``!?v`` / boolean constants evaluate the EFFECTIVE
  BOOLEAN VALUE (SPARQL 17.2.2);
  ``datatype(?v | xsd:T(?v) | ?a + ?b) = xsd:T`` — DATATYPE over a
  variable, an XPath-table cast (success/failure per row), or an
  arithmetic expression with XSD numeric type promotion;
  ``IN`` / ``NOT IN`` lists, ``BOUND`` / ``!BOUND``, ``sameTerm``,
  ``isIRI`` / ``isBlank`` / ``isLiteral`` / ``isNumeric`` / ``isTRIPLE``
  (each also under ``!``),
  ``REGEX`` (with flags), ``STRSTARTS`` / ``STRENDS`` / ``CONTAINS``
  (with or without ``STR(...)``), ``LANG(?x) = "tag"``, and
  ``LANGMATCHES`` with BCP-47 basic ranges incl. ``"*"``.
- BIND expressions: ``STR`` / ``LANG`` / ``DATATYPE`` / ``STRLEN`` /
  ``UCASE`` / ``LCASE`` / ``CONCAT`` / ``MD5`` / ``SHA1..SHA512`` over
  variables and string constants; arithmetic (``+ - * /`` with standard
  precedence and unary minus); ``IF(cond, a, b)`` with the FILTER
  expression grammar for the condition; ``COALESCE(a, b, ...)``;
  RDF-star ``SUBJECT`` / ``PREDICATE`` / ``OBJECT`` accessors and the
  ``TRIPLE(s, p, o)`` constructor.
- RDF-star: ground ``<< s p o >>`` quoted triples as terms in patterns,
  templates and VALUES (variables inside quoted triples are rejected).
- Solution modifiers: ``GROUP BY`` with ``COUNT`` (incl. ``DISTINCT`` and
  ``*``), ``SUM`` / ``AVG`` / ``MIN`` / ``MAX`` / ``MEDIAN`` / ``MODE`` /
  ``SAMPLE`` / ``GROUP_CONCAT(...; SEPARATOR "..")``, with expression
  keys ``GROUP BY (expr [AS ?v])`` and bare BuiltInCall keys; ``HAVING``
  (numeric comparisons whose sides are full expressions with inline
  aggregate hoisting); ``ORDER BY [ASC|DESC]``, ``LIMIT`` / ``OFFSET``
  (together or either alone — the offset-only tail splits the Dataset).
- SPARQL Update (see sparql_update.py): ``;``-separated request
  sequences, INSERT/DELETE DATA, DELETE/INSERT WHERE (incl. quad
  templates, ``WITH``, executable ``USING``), ``LOAD [INTO GRAPH]``,
  and graph management (CREATE/CLEAR/DROP/ADD/COPY/MOVE).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from jena_ray.functions.property_arq import VALUE_PFS as _VALUE_PFS

import pyarrow as pa

from jena_ray.term import (
    RDF_NS,
    XSD,
    canonical_langtag,
    fmt_iri,
    fmt_literal,
    fmt_quoted_triple,
    resolve_iri,
    unescape_iri,
    unescape_string,
)

RDF_TYPE_IRI = RDF_NS + "type"


def _const_fold_bool(e: tuple) -> bool | None:
    """Fold a filter subtree of constant-boolean leaves to its value;
    None when any leaf is non-constant."""
    op = e[0]
    if op == "constb":
        return bool(e[1])
    if op in ("and", "or"):
        vals = [_const_fold_bool(s) for s in e[1:]]
        if any(v is None for v in vals):
            return None
        return all(vals) if op == "and" else any(vals)
    if op == "not":
        v = _const_fold_bool(e[1])
        return None if v is None else not v
    return None


def _not_total(expr: tuple) -> bool:
    """Is this filter subtree safe under '!(...)'? — a direct termeq child
    negates three-valued in the executor (errors preserved); inside
    and/or compositions every leaf's only error source must be an unbound
    variable (streq / constb / sameTerm), so E_LogicalNot lowers to an
    inverted mask ANDed with operand validity."""
    if expr and expr[0] == "termeq":
        return True  # direct child: three-valued negation in the executor

    def comp(e: tuple) -> bool:
        op = e[0]
        if op in ("and", "or", "not"):
            return all(comp(s) for s in e[1:])
        if op in ("=", "!=") and len(e) == 3 and isinstance(e[2], str):
            return True  # sameTerm leaf: total when bound
        return op in ("streq", "constb")

    return comp(expr)


class SparqlSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<VAR>[?$][^\W\d][\w]*)
  | (?P<BNODE>_:[^\W\d][\w.\-]*)
  | (?P<ANON>\[[ \t]*\])
  | (?P<LONGSTRING>'''(?:(?:''|')?(?:[^'\\]|\\.))*'''
                  |\"\"\"(?:(?:\"\"|\")?(?:[^"\\]|\\.))*\"\"\")
  | (?P<STRING>"(?:[^"\\\n\r]|\\.)*"|'(?:[^'\\\n\r]|\\.)*')
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*[eE][+-]?\d+
                    |(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?))
  | (?P<PNAME>(?:[^\W\d_][\w\-]*(?:\.[\w\-]+)*)?:
               (?:[\w%\-](?:[\w%\-]|\.(?=[\w.%\-]))*)?)
  | (?P<NAME>[^\W\d][\w]*)
  | (?P<OP>\^\^|&&|\|\||!=|<=|>=|<<|>>|[{}().;,*+\-=<>!/^?|\[\]])
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


_UESC_RE = re.compile(r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8}))")


def _decode_codepoint_escapes(s: str) -> str:
    """Grammar codepoint escapes \\uXXXX / \\UXXXXXXXX, processed over the
    whole query string BEFORE tokenization (SPARQL 1.1 §19.2; the
    reference decodes them in TokenizerText's char reader) — they may
    appear in IRIs, prefixed names and variable names, not just string
    literals. A backslash that is itself escaped (even run of preceding
    backslashes) is left alone."""
    out, i = [], 0
    for m in _UESC_RE.finditer(s):
        j = m.start()
        if j < i:
            continue  # overlapped a decoded region
        k = j
        while k > 0 and s[k - 1] == "\\":
            k -= 1
        if (j - k) % 2 == 1:
            continue
        out.append(s[i:j])
        out.append(chr(int(m.group(1) or m.group(2), 16)))
        i = m.end()
    out.append(s[i:])
    return "".join(out)


def tokenize(src: str) -> list[Tok]:
    if "\\u" in src or "\\U" in src:
        src = _decode_codepoint_escapes(src)
    toks: list[Tok] = []
    i, n = 0, len(src)
    while i < n:
        m = _TOKEN_RE.match(src, i)
        if m is None:
            raise SparqlSyntaxError(f"cannot tokenize at offset {i}: {src[i:i+20]!r}")
        kind = m.lastgroup
        if kind == "LONGSTRING":
            # normalize STRING_LITERAL_LONG1/2 to a canonical single-line
            # double-quoted token so every downstream [1:-1]+unescape site
            # works unchanged (grammar main.jj long-string productions)
            from jena_ray.term import string_esc, unescape_string as _un

            toks.append(
                Tok("STRING", '"' + string_esc(_un(m.group()[3:-3])) + '"', i)
            )
        elif kind != "WS":
            toks.append(Tok(kind, m.group(), i))
        i = m.end()
    toks.append(Tok("EOF", "", n))
    return toks


# ---------------------------------------------------------------- AST

@dataclass
class Group:
    patterns: list[tuple] = field(default_factory=list)  # 3-slot, term strings/vars
    paths: list[tuple] = field(default_factory=list)  # (subj, pred_iri, objvar)
    filters: list[tuple] = field(default_factory=list)
    optionals: list["Group"] = field(default_factory=list)
    minuses: list["Group"] = field(default_factory=list)
    exists: list[tuple["Group", bool]] = field(default_factory=list)  # (grp, negated)
    binds: list[tuple[tuple, str]] = field(default_factory=list)  # (expr AST, var)
    union: list["Group"] | None = None
    values: list[dict] | None = None
    graph: str | None = None
    # GRAPH x { } empty-group elements: '?var' enumerates named-graph
    # names, '<iri>' probes graph existence (OpGraph over an empty BGP)
    graph_enum: list[str] = field(default_factory=list)
    subqueries: list["Query"] = field(default_factory=list)  # { SELECT ... }
    # RDF-star embedded patterns: (placeholder '?__qtN', s, p, o) — the
    # placeholder stands in the triple pattern; components are '?var' or
    # ground terms, decomposed post-BGP (_execute_star_where)
    star: list[tuple] = field(default_factory=list)
    # ARQ property-function calls (PropertyFunctionRegistry analog):
    # (subject term-or-var, pf IRI, syntactic arg tuple) — evaluated in
    # value space by functions/property_arq.apply_value_pfs
    pfcalls: list[tuple] = field(default_factory=list)
    # SERVICE elements (ElementService): (endpoint var-or-IRI, Group,
    # silent) — parsed for grammar completeness; execution raises (a
    # batch engine has no federation endpoint to call)
    services: list[tuple] = field(default_factory=list)
    # plain nested ``{ ... }`` sub-groups, held unmerged until the
    # enclosing group closes: _resolve_nested then either flattens them
    # (the well-designed case) or compiles them as independent join units
    # (AlgebraGenerator preserves group nesting — DAWG algebra
    # join-scope-1). Always [] after parsing completes.
    nested: list["Group"] = field(default_factory=list)
    # set when this group arrived via GRAPH <g>/{?g} — unsafe-to-flatten
    # graph-scoped groups raise instead of becoming units (the quad
    # executors are not unit-aware)
    from_graph: str | None = None


@dataclass
class Agg:
    func: str  # count/sum/avg/min/max/sample/group_concat
    var: str | None  # None for COUNT(*)
    distinct: bool
    alias: str
    sep: str = " "


@dataclass
class UpdateOp:
    """One SPARQL Update operation (modify/request/UpdateModify lineage):
    ``insert_data`` / ``delete_data`` carry ground templates; ``modify``
    carries delete/insert templates instantiated per WHERE solution
    (DELETE WHERE is a modify whose delete template IS the pattern)."""

    kind: str  # insert_data / delete_data / modify / clear / drop / create
    #           / add / copy / move (graph management — UpdateClear/
    #           UpdateDrop/UpdateCreate/UpdateAdd/UpdateCopy/UpdateMove)
    insert: list[tuple] | None = None
    delete: list[tuple] | None = None
    where: "Group | None" = None
    # graph-management operands: '<iri>' | 'default' | 'named' | 'all'
    graph_src: str | None = None
    graph_dst: str | None = None
    silent: bool = False
    # UsingClause* operands: ('default'|'named', iri) — parsed for grammar
    # completeness; execution over a remote dataset description raises
    using: "list[tuple[str, str]] | None" = None


@dataclass
class Query:
    form: str  # select / ask / construct / describe
    describe: list[str] = field(default_factory=list)  # terms and/or '?v'
    select: list[str] = field(default_factory=list)  # plain vars (no '?')
    aggs: list[Agg] = field(default_factory=list)
    # (expr AS ?alias) select expressions (SPARQL 1.1 SelectClause exprs /
    # ARQ bare exprs auto-named ".N"); lowered to BINDs after WHERE parses
    select_exprs: list[tuple] = field(default_factory=list)
    star: bool = False
    distinct: bool = False
    reduced: bool = False
    where: Group | None = None
    template: list[tuple] | None = None
    group_by: list[str] = field(default_factory=list)
    # GROUP BY (expr [AS ?v]) keys (ElementGroup expr keys — arq.jj
    # GroupCondition): (bind-expr AST, alias, user-named?). Anonymous
    # exprs get an internal "__gexpr{i}" alias and are never projected.
    group_exprs: list[tuple] = field(default_factory=list)
    having: list[tuple[str, str, float]] = field(default_factory=list)  # (op, var, n)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    # ORDER BY expression conditions (OrderCondition = Constraint |
    # BrackettedExpression — main.jj; ARQ SortCondition holds an Expr):
    # (alias, bind-expr AST) pairs; order_by references the alias, the
    # column is computed per batch inside _value_order then dropped
    order_exprs: list[tuple[str, tuple]] = field(default_factory=list)
    limit: int | None = None
    offset: int = 0
    # dataset description (FROM / FROM NAMED — DatasetDescription +
    # DynamicDatasets in the reference): document IRIs to load
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)
    # implicit-subquery units lowered from SERVICE blocks evaluate
    # against this store instead of the enclosing query's (the injectable
    # endpoint resolver — Service.java's remote execution stand-in)
    service_dir: "str | None" = None


# ---------------------------------------------------------------- parser

_AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT",
              "MEDIAN", "MODE"}
_STR_FNS = {"REGEX": "regex", "STRSTARTS": "strstarts", "STRENDS": "strends",
            "CONTAINS": "contains"}


class Parser:
    def __init__(self, src: str, arq: bool = True):
        self.toks = tokenize(src)
        self.i = 0
        # ARQ-extension syntax (LET, bare select expressions / COUNT(*),
        # braceless sub-SELECT group elements — lang/arq/arq.jj). Jena
        # dispatches strict SPARQL 1.1 vs ARQ by query language (file
        # extension .rq vs .arq in its test runners); arq=False rejects
        # the extensions like Syntax.syntaxSPARQL_11 does
        self.arq = arq
        self.base: str | None = None
        self.prefixes: dict[str, str] = {}
        self._seq = 0  # fresh-variable counter for '/' path desugaring
        self._qt = 0  # placeholder counter for embedded RDF-star patterns
        self._bnode_vars: dict[str, str] = {}  # query bnodes act as vars
        # basic-graph-pattern scope tracking for blank-node labels: a label
        # may not recur in a DIFFERENT BGP (SPARQL 19.6; the reference's
        # LabelToNodeMap scope checks — DAWG syn-bad-34..38, blabel-cross-*).
        # _bgp_epoch = current scope id; _bgp_counter allocates fresh ids
        # (never reused, so a restored outer scope can't alias a nested one)
        self._bgp_epoch = 0
        self._bgp_counter = 0
        self._bnode_epoch: dict[str, int] = {}
        # aggregate calls inside a SELECT expression (SUM(?x)/COUNT(?x)):
        # each is hoisted to an internal-alias Agg and the expression
        # references the alias (ARQ's AggregatorFactory allocation inside
        # ExprTransformExpandAggregates). Non-None only while parsing a
        # select expression.
        self._pending_aggs: list[Agg] | None = None

    def _fresh_bgp_scope(self) -> None:
        self._bgp_counter += 1
        self._bgp_epoch = self._bgp_counter
        self._in_template = False  # CONSTRUCT templates keep bnode terms

    # -- token helpers
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "NAME" and t.text.upper() in kws

    def take_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.take_kw(kw):
            raise SparqlSyntaxError(f"expected {kw} at {self.peek().text!r}")

    def expect_op(self, op: str) -> None:
        t = self.peek()
        if t.kind == "OP" and t.text == op:
            self.next()
            return
        raise SparqlSyntaxError(f"expected {op!r} at {t.text!r} (offset {t.pos})")

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.text == op

    # -- terms
    def _iri(self, tok: Tok) -> str:
        if tok.kind == "IRIREF":
            iri = unescape_iri(tok.text[1:-1])
            # resolve even ABSOLUTE IRIs: RFC 3986 §5.3 applies
            # remove_dot_segments to a reference that carries a scheme
            # (DAWG i18n normalization-2 — the data parser already does,
            # so the query side must match); a relative IRI with no base
            # stays verbatim (harness-less parse)
            from jena_ray.term import TermError as _TE

            try:
                return fmt_iri(resolve_iri(self.base, iri))
            except _TE:
                return fmt_iri(iri)
        if tok.kind == "PNAME":
            pfx, _, local = tok.text.partition(":")
            if pfx not in self.prefixes:
                raise SparqlSyntaxError(f"undefined prefix {pfx!r}:")
            return fmt_iri(self.prefixes[pfx] + local)
        raise SparqlSyntaxError(f"expected IRI at {tok.text!r}")

    @staticmethod
    def _no_qtpat(t, ctx: str) -> str:
        if isinstance(t, tuple):
            raise SparqlSyntaxError(
                f"variable quoted triples are not allowed in {ctx}"
            )
        return t

    def parse_term(self):
        """One graph term or variable → canonical NT string / '?var'; a
        variable-bearing quoted triple returns a ('qtpat', s, p, o) marker
        (only pattern slots accept it — every other context raises)."""
        if self.at_op("<<"):
            # RDF-star quoted triple (rdf_star/TestSPARQLStarParse.java):
            # ground components form the canonical TERM (sameTerm match in
            # id space); variable components make this an embedded PATTERN,
            # executed by the placeholder + decompose stage (g.star)
            self.next()
            s = self.parse_term()
            p = self.parse_term()
            o = self.parse_term()
            self.expect_op(">>")
            for x in (s, o):
                if isinstance(x, tuple):
                    raise SparqlSyntaxError(
                        "variables in NESTED quoted triples are outside the "
                        "supported subset"
                    )
            if isinstance(p, tuple) or (not p.startswith("?") and (
                    not p.startswith("<") or p.startswith("<<"))):
                raise SparqlSyntaxError(
                    "quoted-triple predicate must be an IRI"
                )
            if isinstance(s, str) and s.startswith('"'):
                raise SparqlSyntaxError(
                    "quoted-triple subject cannot be a literal"
                )
            if any(x.startswith("?") for x in (s, p, o)):
                return ("qtpat", s, p, o)
            return fmt_quoted_triple(s, p, o)
        t = self.next()
        if t.kind == "VAR":
            return "?" + t.text[1:]
        if t.kind == "ANON":
            if self._in_template:
                self._seq += 1
                return f"_:__tpl{self._seq}"
            # [] in a query pattern is a fresh non-selectable variable
            # (SPARQL treats pattern bnodes as scoped variables)
            self._seq += 1
            return f"?__bn{self._seq}"
        if t.kind == "BNODE":
            if self._in_template:
                # CONSTRUCT-template bnodes stay bnode TERMS: the executor
                # allocates a fresh (skolemized) label per solution row
                # (Template.java / TemplateLib bnode remapping)
                return t.text
            if getattr(self, "_no_bnode_patterns", False):
                # DELETE WHERE forbids blank nodes in its quad pattern
                # (grammar QuadPatternNoBNodes — syntax-update-bad-10)
                raise SparqlSyntaxError(
                    "DELETE WHERE cannot contain blank nodes"
                )
            seen = self._bnode_epoch.get(t.text)
            if seen is not None and seen != self._bgp_epoch:
                raise SparqlSyntaxError(
                    f"blank-node label {t.text} reused across basic graph "
                    "patterns (SPARQL 19.6)"
                )
            self._bnode_epoch[t.text] = self._bgp_epoch
            v = self._bnode_vars.setdefault(
                t.text, f"?__bl{len(self._bnode_vars)}"
            )
            return v
        if t.kind in ("IRIREF", "PNAME"):
            return self._iri(t)
        if t.kind == "STRING":
            lex = unescape_string(t.text[1:-1])
            nxt = self.peek()
            if nxt.kind == "LANGTAG":
                self.next()
                return fmt_literal(lex, lang=canonical_langtag(nxt.text[1:]))
            if nxt.kind == "OP" and nxt.text == "^^":
                self.next()
                dt = self._iri(self.next())[1:-1]
                # keep the written lexical form — query constants match by
                # TERM (sameTerm), exactly as Jena builds them; value-space
                # equivalence is the FILTER layer's job, not the parser's
                return fmt_literal(lex, datatype=dt)
            return fmt_literal(lex)
        if t.kind == "NUMBER":
            return _number_term(t.text)
        if t.kind == "NAME" and t.text.lower() in ("true", "false"):
            # boolean keywords are case-insensitive (BooleanLiteral via
            # keyword tokens); the term canonicalizes to lowercase
            return fmt_literal(t.text.lower(), datatype=XSD + "boolean")
        raise SparqlSyntaxError(f"expected term at {t.text!r} (offset {t.pos})")

    # -- query entry
    def parse_query(self) -> Query:
        self._parse_prologue()
        if self.at_kw("SELECT"):
            q = self._parse_select()
        elif self.at_kw("ASK"):
            q = self._parse_ask()
        elif self.at_kw("CONSTRUCT"):
            q = self._parse_construct()
        elif self.at_kw("DESCRIBE"):
            q = self._parse_describe()
        else:
            raise SparqlSyntaxError(
                f"expected SELECT/ASK/CONSTRUCT/DESCRIBE at {self.peek().text!r}"
            )
        t = self.peek()
        if t.kind != "EOF":
            raise SparqlSyntaxError(f"unexpected trailing input at {t.text!r}")
        return q

    # -- update requests (ParserSPARQL11Update / UpdateEngineMain lineage)
    def _graph_ref(self, *, allow_sets: bool) -> str:
        """GraphRef / GraphOrDefault operand: DEFAULT | [GRAPH] iri,
        plus NAMED / ALL for CLEAR and DROP."""
        if self.take_kw("DEFAULT"):
            return "default"
        if allow_sets and self.take_kw("NAMED"):
            return "named"
        if allow_sets and self.take_kw("ALL"):
            return "all"
        self.take_kw("GRAPH")  # optional in GraphOrDefault, required in
        # GraphRef — accepting both is a superset of the grammar
        t = self.next()
        if t.kind not in ("IRIREF", "PNAME"):
            raise SparqlSyntaxError(f"expected a graph IRI at {t.text!r}")
        return self._iri(t)

    def parse_update(self) -> UpdateOp:
        """Parse a request that must contain exactly ONE operation (the
        single-op API most callers use)."""
        ops = self.parse_update_request()
        if len(ops) != 1:
            raise SparqlSyntaxError(
                f"expected exactly one update operation, got {len(ops)}"
            )
        return ops[0]

    def parse_update_request(self) -> list[UpdateOp]:
        """Update ::= Prologue (UpdateUnit (';' Update)?)? — a
        ';'-separated, possibly EMPTY sequence of operations (grammar
        main.jj Update / modify/request/UpdateRequest.java); each
        operation may carry its own prologue."""
        ops: list[UpdateOp] = []
        while True:
            self._parse_prologue()
            if self.peek().kind == "EOF":
                break
            ops.append(self._parse_update_op())
            if self.at_op(";"):
                self.next()
                continue
            t = self.peek()
            if t.kind != "EOF":
                raise SparqlSyntaxError(
                    f"unexpected trailing input at {t.text!r}"
                )
            break
        return ops

    def _parse_update_op(self) -> UpdateOp:
        # graph management (UpdateClear.java / UpdateDrop.java /
        # UpdateCreate.java / UpdateAdd/Copy/Move — update/ in jena-arq)
        for kw, kind in (("CLEAR", "clear"), ("DROP", "drop")):
            if self.take_kw(kw):
                silent = self.take_kw("SILENT")
                return UpdateOp(kind, silent=silent,
                                graph_src=self._graph_ref(allow_sets=True))
        if self.take_kw("CREATE"):
            silent = self.take_kw("SILENT")
            self.expect_kw("GRAPH")
            t = self.next()
            if t.kind not in ("IRIREF", "PNAME"):
                raise SparqlSyntaxError(f"expected a graph IRI at {t.text!r}")
            return UpdateOp("create", silent=silent, graph_src=self._iri(t))
        for kw, kind in (("ADD", "add"), ("COPY", "copy"), ("MOVE", "move")):
            if self.take_kw(kw):
                silent = self.take_kw("SILENT")
                src = self._graph_ref(allow_sets=False)
                self.expect_kw("TO")
                dst = self._graph_ref(allow_sets=False)
                return UpdateOp(kind, silent=silent, graph_src=src,
                                graph_dst=dst)
        if self.take_kw("LOAD"):
            # LOAD SILENT? iri (INTO GRAPH iri)? — update/UpdateLoad.java
            silent = self.take_kw("SILENT")
            t = self.next()
            if t.kind not in ("IRIREF", "PNAME"):
                raise SparqlSyntaxError(f"expected a document IRI at {t.text!r}")
            doc = self._iri(t)
            dst = None
            if self.take_kw("INTO"):
                self.expect_kw("GRAPH")
                t = self.next()
                if t.kind not in ("IRIREF", "PNAME"):
                    raise SparqlSyntaxError(
                        f"expected a graph IRI at {t.text!r}"
                    )
                dst = self._iri(t)
            return UpdateOp("load", silent=silent, graph_src=doc,
                            graph_dst=dst)
        with_graph = None
        if self.take_kw("WITH"):
            # WITH iri (DeleteWhere|Modify) — update/UpdateModify.java
            # .getWithIRI: un-GRAPH-ed template quads and WHERE patterns
            # re-scope to this graph; lowered HERE so the executor only
            # ever sees explicit graph slots
            t = self.next()
            if t.kind not in ("IRIREF", "PNAME"):
                raise SparqlSyntaxError(f"expected a graph IRI at {t.text!r}")
            with_graph = self._iri(t)
            if not (self.at_kw("INSERT") or self.at_kw("DELETE")):
                raise SparqlSyntaxError("WITH must precede INSERT/DELETE")
        if self.take_kw("INSERT"):
            if self.take_kw("DATA"):
                if with_graph is not None:
                    raise SparqlSyntaxError("WITH cannot precede DATA")
                op = UpdateOp("insert_data", insert=self._parse_ground_block())
            else:
                tmpl = self._parse_template_block()
                using = self._parse_using()
                self.expect_kw("WHERE")
                op = UpdateOp("modify", insert=tmpl, using=using,
                              where=self._parse_group())
        elif self.take_kw("DELETE"):
            if self.take_kw("DATA"):
                block = self._parse_ground_block()
                for trip in block:
                    if any(isinstance(t, str) and t.startswith("_:")
                           for t in trip):
                        raise SparqlSyntaxError(
                            "DELETE DATA cannot contain blank nodes"
                        )
                op = UpdateOp("delete_data", delete=block)
            elif self.at_kw("WHERE"):
                self.expect_kw("WHERE")
                self._no_bnode_patterns = True
                try:
                    where = self._parse_group()
                finally:
                    self._no_bnode_patterns = False
                if not where.patterns:
                    raise SparqlSyntaxError("DELETE WHERE needs triple patterns")
                self._no_bnodes(where.patterns, "DELETE WHERE")
                op = UpdateOp("modify", delete=list(where.patterns), where=where)
            else:
                dtmpl = self._parse_template_block()
                self._no_bnodes(dtmpl, "a DELETE template")
                itmpl = None
                if self.take_kw("INSERT"):
                    itmpl = self._parse_template_block()
                using = self._parse_using()
                self.expect_kw("WHERE")
                op = UpdateOp("modify", delete=dtmpl, insert=itmpl,
                              using=using, where=self._parse_group())
        else:
            raise SparqlSyntaxError(
                f"expected INSERT or DELETE at {self.peek().text!r}"
            )
        if with_graph is not None:
            if op.kind != "modify":
                raise SparqlSyntaxError("WITH cannot precede DATA")
            op.delete = ([t if len(t) == 4 else (with_graph, *t)
                          for t in op.delete] if op.delete else None)
            op.insert = ([t if len(t) == 4 else (with_graph, *t)
                          for t in op.insert] if op.insert else None)
            if not op.using:
                # a USING clause overrides WITH for the query pattern
                # (UpdateModify semantics) — templates keep the WITH graph
                self._wrap_graph(op.where, with_graph)
        return op

    def _parse_using(self) -> "list[tuple[str, str]] | None":
        """UsingClause* — USING (NAMED)? iri (update grammar; the
        reference's UpdateModify.getUsing/getUsingNamed)."""
        out: list[tuple[str, str]] = []
        while self.take_kw("USING"):
            kind = "named" if self.take_kw("NAMED") else "default"
            t = self.next()
            if t.kind not in ("IRIREF", "PNAME"):
                raise SparqlSyntaxError(
                    f"expected a graph IRI at {t.text!r}"
                )
            out.append((kind, self._iri(t)))
        return out or None

    @staticmethod
    def _no_bnodes(trips: list[tuple], where: str) -> None:
        # UpdateModify grammar: blank nodes (incl. ANON / property lists)
        # are forbidden in DELETE templates and DELETE WHERE patterns
        # (syntax-update-bad-10/11)
        for trip in trips:
            if any(isinstance(t, str) and t.startswith("_:") for t in trip):
                raise SparqlSyntaxError(
                    f"{where} cannot contain blank nodes"
                )

    def _parse_template_block(self) -> list[tuple]:
        self.expect_op("{")
        template: list[tuple] = []
        g = Group()
        self._in_template = True
        try:
            last_was_triples = False
            while not self.at_op("}"):
                if last_was_triples:
                    raise SparqlSyntaxError(
                        "expected '.' between template triples"
                    )
                self._parse_triples_into(g, template_out=template)
                last_was_triples = True
                if self.at_op("."):
                    self.next()
                    last_was_triples = False
        finally:
            self._in_template = False
        self.expect_op("}")
        return template

    def _parse_ground_block(self) -> list[tuple]:
        """QuadData: ``{ triples… GRAPH <g> { triples… } … }`` → mixed
        ground 3-tuples (default graph) and 4-tuples ``(g, s, p, o)``
        (the Quads production restricted to ground terms)."""
        self.expect_op("{")
        out: list[tuple] = []
        g = Group()
        self._in_template = True
        try:
            while not self.at_op("}"):
                if self.take_kw("GRAPH"):
                    t = self.next()
                    if t.kind not in ("IRIREF", "PNAME"):
                        raise SparqlSyntaxError(
                            f"QuadData names a graph IRI, got {t.text!r}"
                        )
                    giri = self._iri(t)
                    self.expect_op("{")
                    inner: list[tuple] = []
                    while not self.at_op("}"):
                        self._parse_triples_into(g, template_out=inner)
                        if self.at_op("."):
                            self.next()
                    self.expect_op("}")
                    out.extend((giri, *tr) for tr in inner)
                else:
                    self._parse_triples_into(g, template_out=out)
                if self.at_op("."):
                    self.next()
        finally:
            self._in_template = False
        self.expect_op("}")
        for trip in out:
            if any(t.startswith("?") for t in trip):
                raise SparqlSyntaxError(f"DATA block must be ground: {trip}")
        return out

    def _parse_prologue(self) -> None:
        while True:
            if self.take_kw("PREFIX"):
                pn = self.next()
                if pn.kind != "PNAME" or not pn.text.endswith(":"):
                    raise SparqlSyntaxError(f"expected prefix name at {pn.text!r}")
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise SparqlSyntaxError("PREFIX needs an IRIREF")
                ns = unescape_iri(iri.text[1:-1])
                from jena_ray.term import TermError as _TE

                try:
                    self.prefixes[pn.text[:-1]] = resolve_iri(self.base, ns)
                except _TE:
                    self.prefixes[pn.text[:-1]] = ns
            elif self.take_kw("BASE"):
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise SparqlSyntaxError("BASE needs an IRIREF")
                self.base = unescape_iri(iri.text[1:-1])
            else:
                return

    def _parse_select(self) -> Query:
        q = Query(form="select")
        self.expect_kw("SELECT")
        if self.take_kw("DISTINCT"):
            q.distinct = True
        elif self.take_kw("REDUCED"):
            q.reduced = True
        if self.at_op("*"):
            self.next()
            q.star = True
        else:
            anon = 0  # ARQ-style ".N" allocation for anonymous exprs
            outer_pending = self._pending_aggs
            self._pending_aggs = pending = []
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    q.select.append(t.text[1:])
                elif t.kind == "OP" and t.text == "(":
                    save = self.i
                    self.next()
                    try:
                        q.aggs.append(self._parse_agg())
                        continue
                    except SparqlSyntaxError:
                        self.i = save
                    # SelectClause expression: (expr [AS ?alias]); a bare
                    # (expr) is the ARQ form, auto-named ".N" (ARQ's
                    # internal-variable allocator)
                    self.next()
                    expr = self._parse_bind_expr()
                    alias = None
                    if self.take_kw("AS"):
                        a = self.next()
                        if a.kind != "VAR":
                            raise SparqlSyntaxError("AS needs a variable")
                        alias = a.text[1:]
                    self.expect_op(")")
                    if alias is None:
                        if not self.arq:
                            raise SparqlSyntaxError(
                                "a select expression needs AS (bare "
                                "(expr) is ARQ-only syntax)"
                            )
                        alias = f".{anon}"
                        anon += 1
                    q.select_exprs.append((expr, alias))
                elif (t.kind == "NAME" and t.text.upper() in _AGG_FUNCS
                        and self.peek(1).kind == "OP"
                        and self.peek(1).text == "("):
                    # bare aggregate (ARQ): SELECT count(*) — the agg
                    # binds an internal var, the select expr referencing
                    # it gets the NEXT ".N" slot (matches ARQ's .1)
                    if not self.arq:
                        raise SparqlSyntaxError(
                            "a bare aggregate in SELECT is ARQ-only syntax"
                        )
                    func, var, distinct, sep = self._parse_agg_core()
                    q.aggs.append(Agg(func, var, distinct, f".{anon + 1}",
                                      sep))
                    anon += 2
                elif t.kind == "NAME" and (
                    t.text.upper() in self._BIND_FNS
                    or t.text.upper() in ("IF", "COALESCE")
                ):
                    # bare function expression (ARQ): SELECT str(?v)
                    if not self.arq:
                        raise SparqlSyntaxError(
                            "a bare expression in SELECT is ARQ-only syntax"
                        )
                    expr = self._parse_bind_expr()
                    q.select_exprs.append((expr, f".{anon}"))
                    anon += 1
                elif (t.kind in ("PNAME", "IRIREF")
                        and self.peek(1).kind == "OP"
                        and self.peek(1).text == "("):
                    # bare URI function call (ARQ): SELECT :f(?x + ?y)
                    if not self.arq:
                        raise SparqlSyntaxError(
                            "a bare expression in SELECT is ARQ-only syntax"
                        )
                    expr = self._parse_bind_expr()
                    q.select_exprs.append((expr, f".{anon}"))
                    anon += 1
                else:
                    break
            self._pending_aggs = outer_pending
            q.aggs.extend(pending)
            if not q.select and not q.aggs and not q.select_exprs:
                raise SparqlSyntaxError("empty SELECT list")
        self._parse_dataset_clause(q)
        self.take_kw("WHERE")
        q.where = self._parse_group()
        self._parse_modifiers(q)
        self._check_select_scope(q)
        self._lower_select_exprs(q)
        return q

    def _check_select_scope(self, q: Query) -> None:
        """Projection scope rules (SPARQL 1.1 §18.2.4.2; ARQ
        syntax-scope-bad-01/02, syn-bad-01..05): an AS alias must be
        FRESH — not a previously projected variable or alias, and not a
        variable read by any select expression or aggregate; under an
        explicit GROUP BY, ``SELECT *`` is forbidden and every plain
        projected variable must be a group key."""
        from jena_ray.pipelines.bgp import _bind_expr_vars

        seen: set[str] = set(q.select)
        for a in q.aggs:
            if a.alias.startswith("."):
                continue  # internal ARQ ".N" slots are never user vars
            if a.alias in seen:
                raise SparqlSyntaxError(
                    f"select alias ?{a.alias} is already in use"
                )
            seen.add(a.alias)
        # a LATER expression may legally read an earlier alias; the alias
        # itself must be fresh w.r.t. everything projected or read SO FAR
        read_so_far: set[str] = set()
        for e, alias in q.select_exprs:
            read_so_far |= set(_bind_expr_vars(e))
            if alias.startswith("."):
                continue
            if alias in seen or alias in read_so_far:
                raise SparqlSyntaxError(
                    f"select alias ?{alias} is already in use"
                )
            seen.add(alias)
        if q.group_by or q.group_exprs:
            if q.star:
                # strict SPARQL 1.1 forbids it (syn-bad-01); ARQ's parser
                # accepts and projects the group keys
                if not self.arq:
                    raise SparqlSyntaxError(
                        "SELECT * cannot combine with GROUP BY"
                    )
                q.star = False
                q.select = list(q.group_by) + [
                    al for _, al, user in q.group_exprs if user
                ]
            keys = set(q.group_by) | {al for _, al, _u in q.group_exprs}
            bad = [v for v in q.select if v not in keys]
            if bad:
                raise SparqlSyntaxError(
                    f"non-group-key variable(s) in SELECT: {bad}"
                )

    def _lower_select_exprs(self, q: Query) -> None:
        """Lower (expr AS ?alias) select expressions to BINDs over the
        WHERE solutions (AlgebraGenerator lowers them to OpExtend the same
        way). With aggregates/GROUP BY they stay on the query as
        post-group extends — OpExtend ABOVE OpGroup — evaluated over the
        group keys and (hoisted) aggregate aliases by the grouped branch
        of sparql_query; referencing a non-grouped pattern variable there
        is the same error ARQ raises at algebra build."""
        if not q.select_exprs:
            return
        if q.aggs or q.group_by:
            known = set(q.group_by) | {a.alias for a in q.aggs}
            for expr, alias in q.select_exprs:
                bad = sorted(_bind_vars(expr) - known)
                if bad:
                    raise SparqlSyntaxError(
                        f"select expression uses non-grouped variables: "
                        f"{bad}"
                    )
                known.add(alias)
            return
        for expr, alias in q.select_exprs:
            q.where.binds.append((expr, alias))
            q.select.append(alias)
        q.select_exprs = []

    def _finish_sub(self, sub: Query) -> Query:
        """Post-parse a subquery: SELECT * projects every visible variable
        of its own WHERE (Query.setResultVars over the pattern vars)."""
        if sub.star:
            sub.select = sorted(
                v for v in _scope_vars(sub.where) if not v.startswith("__")
            )
            sub.star = False
            if not sub.select:
                raise SparqlSyntaxError(
                    "subquery SELECT * projects no variables"
                )
        return sub

    def _parse_dataset_clause(self, q: Query) -> None:
        """FROM <iri> / FROM NAMED <iri> (DatasetClause): collect document
        IRIs; sparql_query constructs the query dataset by loading them."""
        while self.at_kw("FROM"):
            self.next()
            named = self.take_kw("NAMED")
            iri = self._iri(self.next())
            (q.from_named if named else q.from_graphs).append(iri[1:-1])

    def _having_side(self, q: Query) -> tuple:
        """One HAVING comparison side as a numeric bind-expr AST: a full
        bind expression whose inline aggregate calls are hoisted to Aggs
        (reusing a SELECT aggregate with identical (func, var, distinct,
        sep); fresh ones get collision-free ``__agghN`` aliases)."""
        outer = self._pending_aggs
        self._pending_aggs = pending = []
        try:
            e = self._parse_bind_expr()
        finally:
            self._pending_aggs = outer

        def sub(x, old: str, new: str):
            if isinstance(x, tuple):
                if x == ("var", old):
                    return ("var", new)
                return tuple(sub(i, old, new) for i in x)
            return x

        for a in pending:
            m = next(
                (x for x in q.aggs
                 if (x.func, x.var, x.distinct, x.sep)
                 == (a.func, a.var, a.distinct, a.sep)),
                None,
            )
            if m is None:
                m = Agg(a.func, a.var, a.distinct,
                        f"__aggh{len(q.aggs)}", a.sep)
                q.aggs.append(m)
            e = sub(e, a.alias, m.alias)
        if isinstance(e, (int, float)):
            return ("numconst", float(e))
        return e

    def _parse_agg_core(self) -> tuple:
        """``AGG(... )`` through its own closing paren; returns
        (func, var, distinct, sep) without the ``AS ?alias`` wrapper."""
        t = self.next()
        if t.kind != "NAME" or t.text.upper() not in _AGG_FUNCS:
            raise SparqlSyntaxError(f"expected aggregate at {t.text!r}")
        func = t.text.upper()
        self.expect_op("(")
        distinct = self.take_kw("DISTINCT")
        var = None
        if self.at_op("*"):
            if func != "COUNT":
                raise SparqlSyntaxError(f"{func}(*) is not valid")
            self.next()
        else:
            v = self.next()
            if v.kind != "VAR":
                raise SparqlSyntaxError(
                    f"aggregate argument must be a variable, got {v.text!r}"
                )
            var = v.text[1:]
        sep = " "
        if self.at_op(";"):
            self.next()
            self.expect_kw("SEPARATOR")
            if self.at_op("="):
                self.next()
            s = self.next()
            if s.kind != "STRING":
                raise SparqlSyntaxError("SEPARATOR needs a string")
            sep = unescape_string(s.text[1:-1])
        self.expect_op(")")
        return (func.lower(), var, distinct, sep)

    def _parse_agg(self) -> Agg:
        func, var, distinct, sep = self._parse_agg_core()
        self.expect_kw("AS")
        a = self.next()
        if a.kind != "VAR":
            raise SparqlSyntaxError("AS needs a variable alias")
        self.expect_op(")")
        return Agg(func, var, distinct, a.text[1:], sep)

    def _parse_ask(self) -> Query:
        self.expect_kw("ASK")
        q = Query(form="ask")
        self._parse_dataset_clause(q)
        self.take_kw("WHERE")
        q.where = self._parse_group()
        return q

    def _parse_construct(self) -> Query:
        self.expect_kw("CONSTRUCT")
        if self.at_kw("WHERE") or self.at_kw("FROM"):
            # SPARQL 1.1 shorthand: CONSTRUCT DatasetClause* WHERE
            # { patterns } — the pattern doubles as the template
            # (plain BGP only; syntax-construct-where-02 carries FROM)
            q = Query(form="construct")
            self._parse_dataset_clause(q)
            self.expect_kw("WHERE")
            q.where = self._parse_group()
            g = q.where
            if (g.filters or g.optionals or g.minuses or g.union or g.values
                    or g.paths or g.graph or g.exists or g.binds
                    or g.subqueries):
                raise SparqlSyntaxError(
                    "CONSTRUCT WHERE shorthand allows only triple patterns"
                )
            q.template = list(g.patterns)
            self._parse_modifiers(q)
            return q
        self.expect_op("{")
        template: list[tuple] = []
        g = Group()
        self._in_template = True
        try:
            last_was_triples = False
            while not self.at_op("}"):
                if self.at_kw("GRAPH") or self.at_op("{"):
                    # ARQ quads extension (arq.jj ConstructTemplate quads
                    # branch, modify/TemplateLib.calcQuads): GRAPH VarOrIri
                    # { triples } emits 4-tuple template entries; a bare
                    # { triples } block names the default graph explicitly
                    if self.take_kw("GRAPH"):
                        t = self.peek()
                        if t.kind not in ("VAR", "IRIREF", "PNAME") or (
                                t.kind == "PNAME" and t.text == "a"):
                            raise SparqlSyntaxError(
                                "template GRAPH names a variable or IRI"
                            )
                        gt = self.parse_term()
                    else:
                        gt = None
                    self.expect_op("{")
                    sub: list[tuple] = []
                    sub_last = False
                    while not self.at_op("}"):
                        if sub_last:
                            raise SparqlSyntaxError(
                                "expected '.' between template triples"
                            )
                        self._parse_triples_into(g, template_out=sub)
                        sub_last = True
                        if self.at_op("."):
                            self.next()
                            sub_last = False
                    self.expect_op("}")
                    template.extend(
                        t if gt is None else (gt, *t) for t in sub
                    )
                    last_was_triples = False
                    if self.at_op("."):
                        self.next()
                    continue
                if last_was_triples:
                    # a second TriplesBlock needs the '.' separator
                    # (ConstructTemplate grammar — syn-bad-16)
                    raise SparqlSyntaxError(
                        "expected '.' between template triples"
                    )
                self._parse_triples_into(g, template_out=template)
                last_was_triples = True
                if self.at_op("."):
                    self.next()
                    last_was_triples = False
        finally:
            self._in_template = False
        self.expect_op("}")
        if g.patterns or g.paths:
            raise SparqlSyntaxError("internal: template captured as patterns")
        # WHERE is optional before the group (Query.rq grammar:
        # ConstructQuery takes DatasetClause* WhereClause, and WhereClause
        # makes the keyword itself optional)
        self.take_kw("WHERE")
        q = Query(form="construct", template=template)
        q.where = self._parse_group()
        self._parse_modifiers(q)
        return q

    def _parse_describe(self) -> Query:
        self.expect_kw("DESCRIBE")
        q = Query(form="describe")
        while True:
            t = self.peek()
            if t.kind == "VAR":
                self.next()
                q.describe.append("?" + t.text[1:])
            elif t.kind in ("IRIREF", "PNAME"):
                q.describe.append(self._iri(self.next()))
            else:
                break
        if not q.describe:
            raise SparqlSyntaxError("DESCRIBE needs at least one resource/variable")
        if self.at_kw("WHERE") or self.at_op("{"):
            self.take_kw("WHERE")
            q.where = self._parse_group()
        elif any(d.startswith("?") for d in q.describe):
            raise SparqlSyntaxError("DESCRIBE with variables needs a WHERE clause")
        self._parse_modifiers(q)
        return q

    @staticmethod
    def _add_order(q: Query, expr: tuple, desc: bool) -> None:
        """Register one ORDER BY condition: plain variables sort directly,
        anything else becomes an internal computed key column."""
        if expr[0] == "var":
            q.order_by.append((expr[1], desc))
            return
        alias = f"__ord{len(q.order_exprs)}"
        q.order_exprs.append((alias, expr))
        q.order_by.append((alias, desc))

    def _parse_modifiers(self, q: Query) -> None:
        if self.take_kw("GROUP"):
            self.expect_kw("BY")
            while True:
                if self.peek().kind == "VAR":
                    q.group_by.append(self.next().text[1:])
                elif self.at_op("("):
                    # GroupCondition '(' Expression [AS ?var] ')' — keys
                    # computed per solution before grouping (OpGroup's
                    # VarExprList); reuses the BIND expression subset
                    self.next()
                    expr = self._parse_bind_expr()
                    if self.take_kw("AS"):
                        v = self.next()
                        if v.kind != "VAR":
                            raise SparqlSyntaxError(
                                "GROUP BY (expr AS ?var) needs a variable"
                            )
                        alias, named = v.text[1:], True
                    else:
                        alias, named = f"__gexpr{len(q.group_exprs)}", False
                    self.expect_op(")")
                    q.group_exprs.append((expr, alias, named))
                elif (self.peek().kind == "NAME"
                        and (self.peek().text.upper() in self._BIND_FNS
                             or self.peek().text.upper() in ("IF",
                                                             "COALESCE"))
                        and self.peek(1).kind == "OP"
                        and self.peek(1).text == "("):
                    # bare BuiltInCall group key — GroupCondition's
                    # unparenthesized branch (GROUP BY str(?p); ARQ
                    # syntax-group-04)
                    expr = self._parse_bind_expr()
                    q.group_exprs.append(
                        (expr, f"__gexpr{len(q.group_exprs)}", False)
                    )
                else:
                    break
            if not q.group_by and not q.group_exprs:
                raise SparqlSyntaxError("GROUP BY needs at least one variable")
        if self.take_kw("HAVING"):
            # numeric comparisons over aggregate aliases, inline aggregate
            # calls (HAVING (count(*) = 1) — hoisted to an internal Agg,
            # reusing a SELECT aggregate when one matches) and arithmetic
            # expressions over group keys (HAVING (?p*?q > 1) — ARQ
            # syntax-group-02); && conjunctions
            self.expect_op("(")
            while True:
                a = self._having_side(q)
                op_t = self.next()
                if op_t.kind != "OP" or op_t.text not in (
                    "=", "!=", "<", "<=", ">", ">="
                ):
                    raise SparqlSyntaxError("HAVING supports numeric comparisons")
                b = self._having_side(q)
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=",
                        "=": "=", "!=": "!="}
                if a[0] == "var" and b[0] == "numconst":
                    q.having.append((op_t.text, a[1], float(b[1])))
                elif a[0] == "numconst" and b[0] == "var":
                    q.having.append((flip[op_t.text], b[1], float(a[1])))
                else:
                    q.having.append(("hx", op_t.text, a, b))
                if self.at_op("&&"):
                    self.next()
                    continue
                break
            self.expect_op(")")
        if self.take_kw("ORDER"):
            self.expect_kw("BY")
            while True:
                desc = None
                if self.take_kw("DESC"):
                    desc = True
                elif self.take_kw("ASC"):
                    desc = False
                if desc is not None:
                    self.expect_op("(")
                    e = self._parse_bind_expr()
                    self.expect_op(")")
                    self._add_order(q, e, desc)
                    continue
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    q.order_by.append((t.text[1:], False))
                    continue
                if self.at_op("("):
                    # BrackettedExpression condition: ORDER BY (?a + ?b)
                    self.next()
                    e = self._parse_bind_expr()
                    self.expect_op(")")
                    self._add_order(q, e, False)
                    continue
                if (self.peek(1).kind == "OP" and self.peek(1).text == "("
                        and (t.kind in ("IRIREF", "PNAME")
                             or (t.kind == "NAME"
                                 and (t.text.upper() in self._BIND_FNS
                                      or t.text.upper() in ("IF",
                                                            "COALESCE"))))):
                    # Constraint condition: built-in / cast / function call
                    self._add_order(q, self._parse_bind_atom(), False)
                    continue
                break
            if not q.order_by:
                raise SparqlSyntaxError("empty ORDER BY")
        if self.take_kw("LIMIT"):
            q.limit = int(self.next().text)
        if self.take_kw("OFFSET"):
            q.offset = int(self.next().text)
        if self.take_kw("LIMIT"):  # OFFSET-then-LIMIT order also legal
            q.limit = int(self.next().text)

    # -- group graph pattern
    def _parse_group(self) -> Group:
        self.expect_op("{")
        group_start = self.i  # token index of the first group element
        g = Group()
        # entering a group starts a new basic graph pattern (blank-node
        # label scope); so does returning from any nested group
        self._fresh_bgp_scope()
        last_was_triples = False
        while not self.at_op("}"):
            if self.take_kw("FILTER"):
                # a FILTER does NOT end the basic graph pattern (the
                # grammar merges TriplesBlocks around it — DAWG
                # syn-blabel-cross-filter is legal), so restore the label
                # epoch around it (EXISTS groups bump it internally)
                epoch = self._bgp_epoch
                nxt = self.peek()
                # FILTER (NOT) EXISTS {…} — bare keyword form; the
                # parenthesized forms (alone or as && conjuncts) parse as
                # existsmark atoms inside _parse_filter and hoist here
                if nxt.kind == "NAME" and (
                    nxt.text.upper() == "EXISTS"
                    or (nxt.text.upper() == "NOT"
                        and self.peek(1).kind == "NAME"
                        and self.peek(1).text.upper() == "EXISTS")
                ):
                    neg = self.take_kw("NOT")
                    self.expect_kw("EXISTS")
                    g.exists.append((self._parse_group(), neg))
                else:
                    for f in self._parse_filter():
                        if f[0] == "existsmark":
                            g.exists.append((f[1], f[2]))
                        else:
                            g.filters.append(f)
                self._bgp_epoch = epoch
                if self.at_op("."):
                    self.next()
                last_was_triples = False
                continue
            elif self.take_kw("BIND"):
                self.expect_op("(")
                expr = self._parse_bind_expr()
                self.expect_kw("AS")
                v = self.next()
                if v.kind != "VAR":
                    raise SparqlSyntaxError("BIND needs AS ?var")
                self.expect_op(")")
                if v.text[1:] in _scope_vars(g):
                    # §18.2.1 in-scope rule: BIND may not re-assign a
                    # variable used by the group so far (Update
                    # syntax-update-bad-14/15)
                    raise SparqlSyntaxError(
                        f"BIND assigns {v.text!r}, already in scope of "
                        "the group"
                    )
                g.binds.append((expr, v.text[1:]))
            elif self.take_kw("LET"):
                # ARQ extension LET(?v := expr) (ElementAssign,
                # lang/arq/arq.jj) — same lowering as BIND in this subset
                if not self.arq:
                    raise SparqlSyntaxError("LET is ARQ-only syntax")
                self.expect_op("(")
                v = self.next()
                if v.kind != "VAR":
                    raise SparqlSyntaxError("LET needs a ?var")
                t = self.peek()
                if t.kind == "PNAME" and t.text == ":":
                    self.next()  # ':=' tokenizes as PNAME ':' + OP '='
                    self.expect_op("=")
                else:
                    raise SparqlSyntaxError("LET needs ':='")
                expr = self._parse_bind_expr()
                self.expect_op(")")
                vname = v.text[1:]
                certain = _group_vars(g) | {bv for _, bv in g.binds}
                if vname in certain:
                    # ARQ LET compatibility semantics (ElementAssign /
                    # OpAssign): assigning an ALREADY-BOUND variable keeps
                    # the row iff the existing binding equals the
                    # expression VALUE — lowered to a value-equality
                    # FILTER over the binding and the expression
                    # (Assign assign-08/09 pin: 6-?v = ?v keeps only 3)
                    g.filters.append(
                        ("cmpexpr", "=", ("var", vname), expr)
                    )
                elif vname in _scope_vars(g):
                    # in-scope but NOT certainly bound (OPTIONAL/UNION/
                    # nested binder): ARQ assigns on unbound rows while
                    # the equality filter would error and drop them —
                    # raise rather than silently diverge
                    raise SparqlSyntaxError(
                        f"LET re-assignment of {v.text!r}, which may be "
                        "unbound (bound only in an OPTIONAL/UNION/nested "
                        "branch), is not in the supported subset"
                    )
                else:
                    g.binds.append((expr, vname))
            elif (self.at_kw("EXISTS") and self.peek(1).kind == "OP"
                    and self.peek(1).text == "{") or (
                    self.at_kw("NOT") and self.peek(1).kind == "NAME"
                    and self.peek(1).text.upper() == "EXISTS"):
                # ARQ extension: bare EXISTS{}/NOT EXISTS{} group elements
                # (ElementExists/ElementNotExists) — FILTER (NOT) EXISTS
                neg = self.take_kw("NOT")
                self.expect_kw("EXISTS")
                epoch = self._bgp_epoch
                g.exists.append((self._parse_group(), neg))
                self._bgp_epoch = epoch
            elif self.take_kw("SERVICE"):
                # ElementService — SERVICE (SILENT)? VarOrIri GGP; parsed
                # so strict-grammar queries round-trip, raises at exec
                silent = self.take_kw("SILENT")
                t = self.peek()
                if t.kind == "VAR":
                    ep = "?" + self.next().text[1:]
                elif t.kind in ("IRIREF", "PNAME"):
                    ep = self._iri(self.next())
                else:
                    raise SparqlSyntaxError(
                        "SERVICE names a variable or IRI"
                    )
                g.services.append((ep, self._parse_group(), silent))
            elif self.take_kw("OPTIONAL"):
                g.optionals.append(self._no_pf(self._parse_group(), 'OPTIONAL'))
            elif self.take_kw("MINUS"):
                g.minuses.append(self._no_pf(self._parse_group(), 'MINUS'))
            elif self.take_kw("GRAPH"):
                # GRAPH term-or-var { BGP [FILTER...] } lowers to 4-slot
                # quad patterns IN PLACE — they join the enclosing group's
                # triple patterns on shared variables through the same
                # id-space chain (OpGraph inside OpJoin; the TDB quad
                # solver path). Mixed default/named groups, UNION branches
                # with GRAPH, and multiple GRAPH blocks all compose.
                if self.peek().kind in ("BNODE", "ANON"):
                    # GraphGraphPattern takes VarOrIri only (syn-bad-31)
                    raise SparqlSyntaxError(
                        "GRAPH names a variable or IRI, not a blank node"
                    )
                gt = self._no_qtpat(self.parse_term(), "GRAPH")
                inner = self._parse_group()
                if not (inner.patterns or inner.filters or inner.union
                        or inner.optionals or inner.minuses or inner.binds
                        or inner.values or inner.exists or inner.paths
                        or inner.star or inner.pfcalls
                        or inner.subqueries):
                    # GRAPH <g>/?g { } — the empty BGP matches ONCE per
                    # named graph: enumerates graph names / probes graph
                    # existence (ARQ Dataset graph-07/08/10)
                    g.graph_enum.append(gt)
                    last_was_triples = False
                    continue
                # re-scope the whole inner group to this graph term
                # (OpGraph over an arbitrary sub-pattern): every triple
                # pattern at any depth — UNION branches, OPTIONAL / MINUS
                # / EXISTS blocks — becomes a 4-slot quad pattern; a
                # nested GRAPH block already produced 4-slot patterns and
                # keeps its own (inner) scope, since SPARQL GRAPH
                # re-scopes rather than nests. Held unmerged until the
                # enclosing group closes: a graph-scoped OPTIONAL/MINUS
                # sharing variables with sibling elements flattens to a
                # different algebra (LeftJoin∘Join vs Join∘LeftJoin) and
                # must raise instead (_resolve_nested)
                self._wrap_graph(inner, gt)
                inner.from_graph = gt
                g.nested.append(inner)
            elif self.take_kw("VALUES"):
                g.values = (g.values or []) + self._parse_values()
            elif (self.peek().kind == "NAME"
                    and self.peek().text.upper() == "SELECT"):
                # '{' SubSelect '}' — the grammar allows a sub-SELECT as
                # the WHOLE group (GroupGraphPattern ::= '{' (SubSelect |
                # GroupGraphPatternSub) '}'); ARQ additionally allows it
                # braceless AMID other elements (arq.jj ElementSubQuery)
                sole = self.i == group_start
                g.subqueries.append(self._finish_sub(self._parse_select()))
                self._fresh_bgp_scope()
                last_was_triples = False
                if not self.arq and not (sole and self.at_op("}")):
                    raise SparqlSyntaxError(
                        "a sub-SELECT amid other group elements needs "
                        "braces (braceless form is ARQ-only syntax)"
                    )
                if self.at_op("."):
                    self.next()
                continue
            elif self.at_op("{"):
                nxt = self.peek(1)
                if nxt.kind == "NAME" and nxt.text.upper() == "SELECT":
                    # ElementSubQuery: { SELECT ... } — a nested query whose
                    # solution table joins the enclosing group
                    self.next()
                    sub = self._finish_sub(self._parse_select())
                    self.expect_op("}")
                    g.subqueries.append(sub)
                    self._fresh_bgp_scope()
                    last_was_triples = False
                    if self.at_op("."):
                        self.next()
                    continue
                first = self._parse_group()
                branches = [first]
                while self.take_kw("UNION"):
                    branches.append(self._no_pf(self._parse_group(), 'UNION'))
                if len(branches) > 1:
                    self._no_pf(first, 'UNION')
                if len(branches) == 1:
                    # plain nested group — held until the enclosing group
                    # closes, where _resolve_nested either flattens it
                    # (well-designed case) or compiles it as its own join
                    # unit (DAWG algebra join-scope-1)
                    g.nested.append(first)
                else:
                    if g.union is not None:
                        raise SparqlSyntaxError("only one UNION block per group")
                    g.union = branches
            else:
                # TriplesBlock: a second block directly after another needs
                # the '.' separator (the grammar's TriplesBlock boundary —
                # DAWG syn-bad-02/03)
                if last_was_triples:
                    raise SparqlSyntaxError(
                        f"expected '.' between triple patterns at "
                        f"{self.peek().text!r}"
                    )
                self._parse_triples_into(g)
                last_was_triples = True
                if self.at_op("."):
                    self.next()
                    last_was_triples = False
                continue
            # a non-triples element (OPTIONAL/MINUS/GRAPH/BIND/VALUES/
            # group/UNION) ends the enclosing basic graph pattern: labels
            # may not span it (syn-bad-OPT-breaks-BGP and friends)
            self._fresh_bgp_scope()
            last_was_triples = False
            if self.at_op("."):
                self.next()
        self.expect_op("}")
        self._resolve_nested(g)
        self._rescope_optional_filters(g)
        return g

    def _resolve_nested(self, g: Group) -> None:
        """Faithful nested-group algebra scoping (the reference's
        AlgebraGenerator compiles the group TREE — group→op preserves
        nesting, jena-arq sparql/algebra/AlgebraGenerator.java). A plain
        nested ``{ ... }`` merges into its parent ONLY when flattening
        cannot change semantics (_flatten_safe — the well-designed case
        of Pérez et al.). Otherwise it compiles as its own join unit: an
        implicit SELECT subquery over the nested group, evaluated
        independently and joined on the shared variables —
        Join(outer, LeftJoin(B, C)), not LeftJoin(Join(outer, B), C)
        (DAWG algebra join-scope-1). GRAPH-scoped groups in the unsafe
        shape raise loudly (the quad executors are not unit-aware)."""
        nested, g.nested = list(g.nested), []
        for i, n in enumerate(nested):
            g.nested = nested[i + 1:]  # unprocessed siblings stay in scope
            sib = _scope_vars(g)
            for m in g.minuses:
                sib |= _scope_vars(m)
            for e, _neg in g.exists:
                sib |= _scope_vars(e)
            # mirror direction: the PARENT's OPTIONAL/MINUS/EXISTS blocks
            # may bind vars the nested group's patterns also bind. If such
            # a var is not bound by the parent's required part, flattening
            # yields LeftJoin(Join(P1,P2),O) where the reference's
            # AlgebraGenerator (textual order) may yield
            # Join(LeftJoin(P1,O),P2) — refuse to flatten; the unit path
            # then either evaluates correctly or raises loudly.
            parent_risk: set[str] = set()
            for o in g.optionals:
                parent_risk |= _scope_vars(o)
            for m in g.minuses:
                parent_risk |= _scope_vars(m)
            for e, _neg in g.exists:
                parent_risk |= _scope_vars(e)
            parent_core = _group_vars(g) | {v for _, v in g.binds}
            g.nested = []
            if (self._flatten_safe(n, sib)
                    and not ((parent_risk - parent_core) & _scope_vars(n))):
                self._merge(g, n)
            elif n.from_graph is not None:
                raise SparqlSyntaxError(
                    "GRAPH-scoped OPTIONAL/MINUS/EXISTS sharing variables "
                    "with the enclosing group is not in the supported "
                    "subset (would flatten to a different algebra)"
                )
            else:
                sub = Query(form="select",
                            select=sorted(_scope_vars(n)), where=n)
                g.subqueries.append(sub)
        g.nested = []

    @staticmethod
    def _flatten_safe(n: Group, sib_vars: set[str]) -> bool:
        """True iff merging nested group ``n`` into a parent whose other
        elements bind ``sib_vars`` preserves the algebra: every variable
        n's OPTIONAL/MINUS/EXISTS blocks share with a sibling is already
        bound by n's required part (so the blocks' left side is the same
        rows either way), and no BIND expression reads enclosing-scope
        variables (ARQ's Extend(P, v, e) sees them unbound)."""
        from jena_ray.pipelines.bgp import _bind_expr_vars

        nscope = _scope_vars(n)
        for expr, _v in n.binds:
            if set(_bind_expr_vars(expr)) - nscope:
                return False
        core = _group_vars(n) | {v for _, v in n.binds}
        risk: set[str] = set()
        for o in n.optionals:
            risk |= _scope_vars(o)
        for m in n.minuses:
            risk |= _scope_vars(m)
        for e, _neg in n.exists:
            risk |= _scope_vars(e)
        return not ((risk & sib_vars) - core)

    @staticmethod
    def _rescope_optional_filters(g: Group) -> None:
        """Pin the visibility of each direct OPTIONAL block's filters at
        the close of THIS group: the LeftJoin condition sees this group's
        scope (left side) plus the block's own vars — never an enclosing
        group's (DAWG algebra filter-scope-1: the merge into the parent
        must not widen visibility). An out-of-scope reference is a type
        error on every solution — constant false, or constant true for
        !bound. Deeper OPTIONALs were pinned when their own group closed."""
        from jena_ray.pipelines.bgp import _filter_vars

        scope = None
        for o in g.optionals:
            if not o.filters:
                continue
            if scope is None:
                scope = _scope_vars(g)
            o.filters = [
                f for f in o.filters
                if not (f[0] == "!bound" and not _filter_vars(f) <= scope)
            ]
            o.filters = [
                f if _filter_vars(f) <= scope else ("never",)
                for f in o.filters
            ]

    @staticmethod
    def _merge(g: Group, h: Group) -> None:
        # FILTER scope: a filter sees only variables in scope of its OWN
        # group (SPARQL 1.1 §18.2.1; ARQ simplifies {{…}} only AFTER
        # scoping — DAWG optional-filter-005-not-simplified). A merged
        # subgroup's filter referencing out-of-scope vars is a type error
        # on every solution: constant false (("never",)), or constant
        # true for !bound (dropped).
        from jena_ray.pipelines.bgp import _filter_vars

        scope = _scope_vars(h)
        for f in h.filters:
            if _filter_vars(f) <= scope:
                g.filters.append(f)
            elif f[0] == "!bound":
                continue
            else:
                g.filters.append(("never",))
        g.patterns.extend(h.patterns)
        g.paths.extend(h.paths)
        g.optionals.extend(h.optionals)
        g.minuses.extend(h.minuses)
        g.exists.extend(h.exists)
        g.binds.extend(h.binds)
        g.subqueries.extend(h.subqueries)
        g.pfcalls.extend(h.pfcalls)
        g.services.extend(h.services)
        if h.union:
            if g.union is not None:
                raise SparqlSyntaxError("only one UNION block per group")
            g.union = h.union
        if h.values:
            g.values = (g.values or []) + h.values

    def _wrap_graph(self, h: Group, gt: str) -> None:
        """Re-scope a parsed group to graph term ``gt`` (SPARQL §18.5
        Graph(g, P) over arbitrary P): every 3-slot triple pattern at any
        nesting depth becomes a 4-slot quad pattern, and — for a graph
        VARIABLE — filters are rewritten so references to it see an
        unbound variable (the {var→g} join happens after P evaluates).
        Shapes whose executors are not quad-aware raise loudly rather
        than mis-answer."""
        if (h.paths or h.star or h.pfcalls or h.subqueries
                or h.graph_enum or h.services):
            raise SparqlSyntaxError(
                "paths / quoted triples / property functions / subqueries "
                "/ SERVICE inside GRAPH are not in the supported subset"
            )
        h.patterns = [p if len(p) == 4 else (gt, *p) for p in h.patterns]
        if gt.startswith("?"):
            h.filters = [_unbind_graph_var(f, gt[1:]) for f in h.filters]
        for sub in h.optionals:
            self._wrap_graph(sub, gt)
        for sub in h.minuses:
            self._wrap_graph(sub, gt)
        for sub, _neg in h.exists:
            self._wrap_graph(sub, gt)
        for sub in h.union or []:
            self._wrap_graph(sub, gt)

    @staticmethod
    def _no_pf(sub: Group, where: str) -> Group:
        """Property-function calls execute only in the main solution chain;
        inside OPTIONAL/MINUS/EXISTS/UNION branches they would be silently
        dropped — raise instead (the module contract: unsupported shapes
        raise, never mis-answer)."""
        if sub.pfcalls:
            raise SparqlSyntaxError(
                f"property functions inside {where} are not in the "
                "supported subset"
            )
        return sub

    def _path_iri(self) -> str:
        t = self.peek()
        if t.kind == "NAME" and t.text == "a":
            self.next()
            return fmt_iri(RDF_TYPE_IRI)
        return self._iri(self.next())

    def _parse_path_step(self) -> tuple[str | tuple, bool, str | None]:
        """One path step → (pred, inverse, modifier). Modifiers: '+' / '*'
        (P_OneOrMore / P_ZeroOrMore), '^' inverse (P_Inverse). A '!'
        prefix parses a negated property set — ``!iri`` or
        ``!(iri1|iri2|...)`` (P_NegPropSet, forward IRIs only) — returned
        as a ("negset", ...) predicate tuple."""
        if self.at_op("!"):
            self.next()
            iris = []
            if self.at_op("("):
                self.next()
                iris.append(self._path_iri())
                while self.at_op("|"):
                    self.next()
                    iris.append(self._path_iri())
                self.expect_op(")")
            else:
                iris.append(self._path_iri())
            return ("negset", *iris), False, None
        inv = False
        if self.at_op("^"):
            self.next()
            inv = True
        t = self.peek()
        if t.kind == "NAME" and t.text == "a":
            self.next()
            pred = fmt_iri(RDF_TYPE_IRI)
        elif t.kind == "VAR":
            self.next()
            pred = "?" + t.text[1:]
        else:
            pred = self._iri(self.next())
        mod = None
        if self.at_op("+"):
            self.next()
            mod = "+"
        elif self.at_op("*"):
            self.next()
            mod = "*"
        elif self.at_op("?"):
            self.next()
            mod = "?"
        elif self.at_op("{"):
            # ARQ extension p{n} / p{n,m} (sparql/path/P_Mod.java /
            # P_FixedLength.java — dropped from final SPARQL 1.1 but kept
            # by ARQ). Fixed length desugars exactly (a chain of n steps,
            # bag semantics); an n<m range evaluates as the DISTINCT union
            # of the k-step chains for k=n..m (the draft's alternation
            # desugaring P{n,m} = P{n}|…|P{m}, set semantics).
            self.next()
            t = self.next()
            if t.kind != "NUMBER" or not t.text.isdigit():
                raise SparqlSyntaxError(f"expected path length at {t.text!r}")
            n = int(t.text)
            m = n
            if self.at_op(","):
                self.next()
                t = self.next()
                if t.kind != "NUMBER" or not t.text.isdigit():
                    raise SparqlSyntaxError(
                        f"expected path length at {t.text!r}"
                    )
                m = int(t.text)
            self.expect_op("}")
            if n < 1:
                raise SparqlSyntaxError("path{0} (zero-length) unsupported")
            if m < n:
                raise SparqlSyntaxError(f"path{{{n},{m}}}: upper bound < lower")
            if m > 32:
                raise SparqlSyntaxError(
                    f"path{{{n},{m}}}: bound above 32 (each length is a "
                    "join chain; deeper ranges belong to the '+' closure)"
                )
            mod = ("fixed", n) if n == m else ("range", n, m)
        return pred, inv, mod

    def _qt_placeholder(self, g: Group, qt: tuple,
                        template_out: list | None) -> str:
        """Register a variable-bearing quoted-triple pattern: a fresh
        placeholder variable takes its slot in the enclosing pattern and
        (placeholder, s, p, o) is queued for the post-BGP decompose stage."""
        if template_out is not None:
            raise SparqlSyntaxError(
                "variable quoted triples are not allowed in templates"
            )
        ph = f"?__qt{self._qt}"
        self._qt += 1
        g.star.append((ph, qt[1], qt[2], qt[3]))
        return ph

    def _parse_bnode_plist(self, g: Group, template_out: list | None) -> str:
        """``[ p1 o1 ; p2 o2 , o3 ]`` — BlankNodePropertyList (the grammar's
        TriplesNode): a fresh scoped variable (fresh template bnode inside
        CONSTRUCT templates) plus its predicate-object patterns. Plain
        predicates only (no paths inside the brackets)."""
        self.expect_op("[")
        self._seq += 1
        node = (f"_:__tpl{self._seq}" if self._in_template
                else f"?__bn{self._seq}")
        while not self.at_op("]"):
            t = self.peek()
            if t.kind == "NAME" and t.text == "a":
                self.next()
                pred = fmt_iri(RDF_TYPE_IRI)
            elif t.kind == "VAR":
                self.next()
                pred = "?" + t.text[1:]
            else:
                pred = self._iri(self.next())
            while True:
                obj = self._parse_object_node(g, template_out)
                trip = (node, pred, obj)
                if template_out is not None:
                    template_out.append(trip)
                else:
                    g.patterns.append(trip)
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                while self.at_op(";"):
                    self.next()
                continue
            break
        self.expect_op("]")
        return node

    def _parse_collection(self, g: Group, template_out: list | None) -> str:
        """Collection '( e1 ... en )' (main.jj Collection production →
        ElementTriplesBlock via TripleCollectorMark): desugars to an
        rdf:first/rdf:rest chain on fresh nodes ('()' is rdf:nil). In a
        WHERE pattern the fresh nodes are internal variables (pattern
        blank nodes act as variables); in a template they are fresh
        per-solution blank nodes."""
        self.expect_op("(")
        items = []
        while not self.at_op(")"):
            items.append(self._parse_object_node(g, template_out))
        self.expect_op(")")
        nil = fmt_iri(RDF_NS + "nil")
        if not items:
            return nil
        nodes = []
        for _ in items:
            self._seq += 1
            nodes.append(f"_:__tpl{self._seq}" if self._in_template
                         else f"?__bn{self._seq}")
        first, rest = fmt_iri(RDF_NS + "first"), fmt_iri(RDF_NS + "rest")
        sink = g.patterns if template_out is None else template_out
        for i, (n, item) in enumerate(zip(nodes, items)):
            sink.append((n, first, item))
            sink.append((n, rest, nodes[i + 1] if i + 1 < len(nodes)
                         else nil))
        return nodes[0]

    def _parse_object_node(self, g: Group, template_out: list | None) -> str:
        """One node in subject/object position: bnode property list,
        collection, or a plain term (quoted triples via placeholder)."""
        if self.at_op("["):
            return self._parse_bnode_plist(g, template_out)
        if self.at_op("("):
            return self._parse_collection(g, template_out)
        obj = self.parse_term()
        if isinstance(obj, tuple):
            obj = self._qt_placeholder(g, obj, template_out)
        return obj

    def _parse_triples_into(self, g: Group, template_out: list | None = None) -> None:
        if self.at_op("["):
            subj = self._parse_bnode_plist(g, template_out)
            if self.at_op(".") or self.at_op("}"):
                return  # bare TriplesNode: [ ... ] with no predicate list
        elif self.at_op("("):
            subj = self._parse_collection(g, template_out)
            if self.at_op(".") or self.at_op("}"):
                if subj.endswith("#nil>"):
                    # '()' is the NIL GraphTerm, not a TriplesNode — as a
                    # lone subject it needs a PropertyListNotEmpty
                    # (DAWG syn-bad-lone-list)
                    raise SparqlSyntaxError(
                        "lone '()' subject needs a predicate-object list"
                    )
                return  # bare collection TriplesNode
        else:
            subj = self.parse_term()
            if isinstance(subj, tuple):
                subj = self._qt_placeholder(g, subj, template_out)
        while True:
            # predicate position: a property PATH — 'a' / IRI / ?var steps
            # with '^' inverse, '/' sequences, '+' / '*' closures
            steps = [self._parse_path_step()]
            # '/' sequences; a directly-juxtaposed '^' also continues the
            # sequence (ARQ arq.jj accepts ^:p3^:p2^:p1 — Paths path-06)
            while self.at_op("/") or self.at_op("^"):
                if self.at_op("/"):
                    self.next()
                steps.append(self._parse_path_step())
            # expand fixed-length {n} steps into n chained copies
            # (P_FixedLength → P_Seq, PathCompiler's reduction) before any
            # other handling, so p{n} composes with '/' sequences
            if any(isinstance(s[2], tuple) and s[2][0] == "fixed" for s in steps):
                expanded = []
                for pred, inv, mod in steps:
                    if isinstance(mod, tuple) and mod[0] == "fixed":
                        if isinstance(pred, tuple) or (
                            isinstance(pred, str) and pred.startswith("?")
                        ):
                            raise SparqlSyntaxError(
                                "p{n} needs a plain IRI predicate"
                            )
                        expanded.extend([(pred, inv, None)] * mod[1])
                    else:
                        expanded.append((pred, inv, mod))
                steps = expanded
            if (len(steps) > 1
                    and any(isinstance(s[2], tuple) and s[2][0] == "range"
                            for s in steps)):
                raise SparqlSyntaxError(
                    "p{n,m} ranges cannot combine with '/' sequences"
                )
            if self.at_op("|"):
                # P_Alt: alternation of PLAIN forward IRIs ('|' binds
                # looser than '/', so mixing them in one path is out of
                # the subset — parenthesised paths are unsupported anyway)
                if len(steps) > 1:
                    raise SparqlSyntaxError(
                        "'|' cannot combine with '/' sequences in a path"
                    )
                alts = [steps[0]]
                while self.at_op("|"):
                    self.next()
                    alts.append(self._parse_path_step())
                iris = []
                for pred, inv, mod in alts:
                    if (inv or mod is not None or isinstance(pred, tuple)
                            or pred.startswith("?")):
                        raise SparqlSyntaxError(
                            "path alternation supports plain forward IRIs"
                        )
                    iris.append(pred)
                steps = [(("alt", *iris), False, None)]
            if len(steps) > 1:
                for pred, _inv, mod in steps:
                    if isinstance(pred, tuple) or pred.startswith("?"):
                        raise SparqlSyntaxError(
                            "variables / property sets not allowed in '/' "
                            "sequences"
                        )
            if (template_out is None and len(steps) == 1
                    and steps[0][1] is False and steps[0][2] is None
                    and isinstance(steps[0][0], str)
                    and steps[0][0].startswith("<")
                    and steps[0][0][1:-1] in _VALUE_PFS):
                # ARQ property-function call (list:member, apf:assign, …):
                # the argument list is SYNTACTIC (PropFuncArg in the
                # reference) — it is NOT desugared to rdf:first/rest
                # patterns like a data collection would be
                if self.at_op("("):
                    self.next()
                    pf_args = []
                    while not self.at_op(")"):
                        t = self._no_qtpat(
                            self.parse_term(), "property-function arguments"
                        )
                        if t.startswith("_:"):
                            # '[]' argument — a don't-care slot (ARQ binds
                            # a fresh bnode nothing else can join on); a
                            # fresh internal variable has the same effect
                            self._pf_anon = getattr(self, "_pf_anon", 0) + 1
                            t = f"?__pfa{self._pf_anon}"
                        pf_args.append(t)
                    self.expect_op(")")
                    if not pf_args:
                        # '()' is the empty collection — the rdf:nil term
                        # (ARQ parses it as a plain node, not an arg list)
                        pf_args = [
                            "<http://www.w3.org/1999/02/22-rdf-syntax-ns"
                            "#nil>"
                        ]
                else:
                    pf_args = [self._no_qtpat(
                        self.parse_term(), "property-function arguments"
                    )]
                g.pfcalls.append((subj, steps[0][0][1:-1], tuple(pf_args)))
                if self.at_op(";"):
                    self.next()
                    while self.at_op(";"):
                        self.next()
                    if self.at_op(".") or self.at_op("}"):
                        break
                    continue
                break
            while True:
                obj = self._parse_object_node(g, template_out)
                if len(steps) == 1 and steps[0][2] is not None:
                    pred, inv, mod = steps[0]
                    if template_out is not None:
                        raise SparqlSyntaxError("property path in template")
                    if isinstance(pred, str) and pred.startswith("?"):
                        raise SparqlSyntaxError("variables not allowed in paths")
                    g.paths.append((subj, pred, obj, mod, inv))
                elif len(steps) > 1 and any(s[2] is not None for s in steps):
                    # mixed sequence with closure step(s): plain steps
                    # chain through fresh variables as patterns, each
                    # closure step becomes a path entry from its chain
                    # node (PathCompiler splits P_Seq the same way —
                    # type/subClassOf*, p+/label)
                    if template_out is not None:
                        raise SparqlSyntaxError("property path in template")
                    node = subj
                    for i, (pred, inv, mod) in enumerate(steps):
                        last = i == len(steps) - 1
                        nxt = obj if last else f"?__seq{self._seq}"
                        if not last:
                            self._seq += 1
                        if mod is None:
                            trip = ((nxt, pred, node) if inv
                                    else (node, pred, nxt))
                            g.patterns.append(trip)
                        else:
                            g.paths.append((node, pred, nxt, mod, inv))
                        node = nxt
                else:
                    # desugar: inverse swaps slots; sequences chain through
                    # fresh variables (P_Seq → conjunctive BGP, the
                    # PathCompiler reduction in jena-arq sparql/path)
                    node = subj
                    for i, (pred, inv, _mod) in enumerate(steps):
                        last = i == len(steps) - 1
                        nxt = obj if last else f"?__seq{self._seq}"
                        if not last:
                            self._seq += 1
                        trip = (nxt, pred, node) if inv else (node, pred, nxt)
                        if template_out is not None:
                            if inv or len(steps) > 1 or isinstance(pred, tuple):
                                raise SparqlSyntaxError("property path in template")
                            template_out.append(trip)
                        else:
                            g.patterns.append(trip)
                        node = nxt
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                while self.at_op(";"):
                    self.next()
                if self.at_op(".") or self.at_op("}"):
                    break  # dangling ';' ends the predicate list
                t = self.peek()
                if (t.kind == "NAME" and t.text != "a") or (
                        t.kind == "OP" and t.text == "{"):
                    # trailing ';' directly before a group element
                    # (OPTIONAL / FILTER / GRAPH / '{') — the grammar's
                    # empty PropertyListNotEmpty tail (syntax-struct-11,
                    # syn-07)
                    break
                continue
            break

    def _parse_values(self) -> list[dict]:
        t = self.peek()
        if t.kind == "VAR":  # VALUES ?x { t1 t2 ... }
            self.next()
            var = t.text[1:]
            self.expect_op("{")
            rows = []
            while not self.at_op("}"):
                rows.append({var: self._no_qtpat(self.parse_term(), "VALUES")})
            self.expect_op("}")
            return rows
        self.expect_op("(")
        vars_: list[str] = []
        while self.peek().kind == "VAR":
            vars_.append(self.next().text[1:])
        self.expect_op(")")
        self.expect_op("{")
        rows = []
        while self.at_op("("):
            self.next()
            row = {}
            for v in vars_:
                row[v] = self._no_qtpat(self.parse_term(), "VALUES")
            self.expect_op(")")
            rows.append(row)
        self.expect_op("}")
        return rows

    # -- FILTER expressions → bgp.py filter tuples ('&&' binds tighter
    #    than '||'; a top-level conjunction splits into separate filters)
    def _parse_filter(self) -> list[tuple]:
        # grammar: FILTER Constraint, Constraint = BrackettedExpression |
        # BuiltInCall | FunctionCall — a bare builtin (FILTER regex(...))
        # or function call (FILTER fn:f(?x)) needs no parens
        if not self.at_op("("):
            t = self.peek()
            if (t.kind in ("NAME", "PNAME", "IRIREF")
                    or (t.kind == "OP" and t.text == "!")):
                return [self._parse_filter_atom()]
        self.expect_op("(")
        expr = self._parse_filter_or()
        self.expect_op(")")
        out = list(expr[1:]) if expr[0] == "and" else [expr]

        def has_mark(e) -> bool:
            return isinstance(e, tuple) and (
                e[0] == "existsmark"
                or any(has_mark(s) for s in e[1:])
            )

        for f in out:
            if f[0] != "existsmark" and has_mark(f):
                raise SparqlSyntaxError(
                    "EXISTS may appear only as a top-level FILTER conjunct"
                )
        return out

    def _parse_filter_or(self) -> tuple:
        branches = [self._parse_filter_and()]
        while self.at_op("||"):
            self.next()
            branches.append(self._parse_filter_and())
        return branches[0] if len(branches) == 1 else ("or", *branches)

    def _parse_filter_and(self) -> tuple:
        atoms = [self._parse_filter_atom()]
        while self.at_op("&&"):
            self.next()
            atoms.append(self._parse_filter_atom())
        return atoms[0] if len(atoms) == 1 else ("and", *atoms)

    _TYPE_FNS = {"ISIRI": "isiri", "ISURI": "isiri", "ISBLANK": "isblank",
                 "ISLITERAL": "isliteral", "ISNUMERIC": "isnumeric",
                 "ISTRIPLE": "istriple"}  # E_IsTriple (RDF-star)

    def _closes_atom(self, k: int = 0) -> bool:
        t = self.peek(k)
        return t.kind == "EOF" or (
            t.kind == "OP" and t.text in (")", "&&", "||", ",")
        )

    _TRUE_TERM = '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
    _FALSE_TERM = '"false"^^<http://www.w3.org/2001/XMLSchema#boolean>'

    def _at_exists_brace(self, k: int = 0) -> bool:
        t, b = self.peek(k), self.peek(k + 1)
        return (t.kind == "NAME" and t.text.upper() == "EXISTS"
                and b.kind == "OP" and b.text == "{")

    def _parse_filter_atom(self) -> tuple:
        neg = False
        # (NOT) EXISTS { ... } as a boolean atom — expressible only as a
        # TOP-LEVEL conjunct (hoisted into the group's exists elements by
        # the FILTER branch); any nested position raises in _parse_filter
        if self._at_exists_brace() or (
                self.peek().kind == "NAME"
                and self.peek().text.upper() == "NOT"
                and self._at_exists_brace(1)):
            negx = self.take_kw("NOT")
            self.expect_kw("EXISTS")
            return ("existsmark", self._parse_group(), bool(negx))
        # bare variable → effective boolean value (FILTER(?v), ?v && ...)
        if self.peek().kind == "VAR" and self._closes_atom(1):
            return ("ebv", "?" + self.next().text[1:])
        # constant boolean leaf: 'true'/'false' keyword or typed literal
        t0 = self.peek()
        if t0.kind == "STRING" or (
            t0.kind == "NAME" and t0.text.lower() in ("true", "false")
        ):
            save = self.i
            try:
                term = self.parse_term()
            except SparqlSyntaxError:
                term = None
            if (term in (self._TRUE_TERM, self._FALSE_TERM)
                    and self._closes_atom()):
                return ("constb", term == self._TRUE_TERM)
            self.i = save
        if self.at_op("("):
            # a '(' here is either a nested boolean expression or a
            # parenthesised arithmetic operand of a comparison — try the
            # boolean parse first, backtrack to arithmetic on failure
            save = self.i
            self.next()
            try:
                a = self._parse_filter_or()
                self.expect_op(")")
                is_cmp = (self.peek().kind == "OP" and self.peek().text in
                          ("=", "!=", "<", "<=", ">", ">="))
                if not (self.at_op("+") or self.at_op("-") or self.at_op("*")
                        or self.at_op("/") or is_cmp):
                    return a
                if is_cmp:
                    # a boolean subtree as a comparison OPERAND — constant
                    # compositions fold to an xsd:boolean term and compare
                    # by value ((TRUE || FALSE) = ?v — ValueTesting)
                    cv = _const_fold_bool(a)
                    if cv is not None:
                        return self._parse_comparison_tail(
                            self._TRUE_TERM if cv else self._FALSE_TERM
                        )
            except SparqlSyntaxError:
                pass
            self.i = save
            return self._parse_comparison_tail(self._parse_add_expr())
        if self.at_op("!"):
            self.next()
            neg = True
            # ! EXISTS { ... } — E_LogicalNot over E_Exists = NOT EXISTS
            if self._at_exists_brace():
                self.expect_kw("EXISTS")
                return ("existsmark", self._parse_group(), True)
            # negated EBV of a bare variable: FILTER(!?v)
            if self.peek().kind == "VAR" and self._closes_atom(1):
                return ("notebv", "?" + self.next().text[1:])
            if self.at_op("("):
                # E_LogicalNot of a parenthesised boolean subtree — only
                # over operands whose sole error source is unboundness
                # (streq / constb compositions; BasicPatterns test-3-07)
                self.next()
                inner = self._parse_filter_or()
                self.expect_op(")")
                if not _not_total(inner):
                    raise SparqlSyntaxError(
                        "'!(...)' supports STR-equality / constant-boolean "
                        "subtrees only"
                    )
                return ("not", inner)
        t = self.peek()
        if t.kind == "NAME":
            fn = t.text.upper()
            if fn in self._TYPE_FNS:
                self.next()
                self.expect_op("(")
                v = self.next()
                self.expect_op(")")
                if v.kind != "VAR":
                    raise SparqlSyntaxError(f"{fn} needs a variable")
                if neg:
                    # !isX(?v): unbound rows stay an error (False), so this
                    # is NOT a plain mask inversion — dedicated op
                    return ("nottype", self._TYPE_FNS[fn], "?" + v.text[1:])
                return (self._TYPE_FNS[fn], "?" + v.text[1:])
            if fn == "BOUND":
                self.next()
                self.expect_op("(")
                v = self.next()
                self.expect_op(")")
                if v.kind != "VAR":
                    raise SparqlSyntaxError("BOUND needs a variable")
                return ("!bound" if neg else "bound", "?" + v.text[1:])
            if neg and fn == "LANGMATCHES":
                # E_LogicalNot(E_LangMatches) — inverted range match,
                # non-literal operands stay type errors (ExprBuiltIns
                # LangMatches-4)
                self.next()
                self.expect_op("(")
                var = self._parse_lang_arg()
                self.expect_op(",")
                s = self.next()
                self.expect_op(")")
                if s.kind != "STRING":
                    raise SparqlSyntaxError("LANGMATCHES range must be a string")
                return ("notlangmatches", var,
                        unescape_string(s.text[1:-1]).lower())
            if neg:
                raise SparqlSyntaxError(f"'!' only supported before BOUND, not {fn}")
            if (fn == "STR" and self.peek(1).kind == "OP"
                    and self.peek(1).text == "("
                    and self._str_cmp_ahead()):
                # E_Str under '='/'!=': STR(x) = STR(y) / "lit" — constant
                # operands fold to their string value at parse time
                # (BasicPatterns test-3-*: str(?x) = str(<iri>))
                self.next()
                self.expect_op("(")
                a = self._str_fold_operand()
                self.expect_op(")")
                op_t = self.next()
                if op_t.kind != "OP" or op_t.text not in ("=", "!="):
                    raise SparqlSyntaxError(
                        "STR(...) comparisons support only = / !="
                    )
                if self.at_kw("STR"):
                    self.next()
                    self.expect_op("(")
                    b = self._str_fold_operand()
                    self.expect_op(")")
                else:
                    t2 = self.next()
                    if t2.kind != "STRING":
                        raise SparqlSyntaxError(
                            "STR(...) compares to a string or STR(...)"
                        )
                    b = unescape_string(t2.text[1:-1])
                a_var = isinstance(a, str) and a.startswith("?")
                b_var = isinstance(b, str) and b.startswith("?")
                if a_var:
                    return ("streq", op_t.text, a, b)
                if b_var:
                    return ("streq", op_t.text, b, a)
                return ("constb", (a == b) == (op_t.text == "="))
            if fn == "SAMETERM":
                self.next()
                self.expect_op("(")
                a = self._no_qtpat(self.parse_term(), "sameTerm")
                self.expect_op(",")
                b = self._no_qtpat(self.parse_term(), "sameTerm")
                self.expect_op(")")
                return ("=", a, b)
            if fn == "DATATYPE":
                # E_Datatype under '='/'!=' against an IRI constant:
                # datatype(?v), datatype(xsd:T(?v)) cast success, or
                # datatype(?a + ?b) promotion — the dtof value filter
                return self._parse_datatype_filter()
            if fn in _STR_FNS:
                self.next()
                self.expect_op("(")
                var, wrapped = self._parse_str_arg()
                self.expect_op(",")
                if fn == "REGEX" and self.peek().kind == "VAR":
                    # E_Regex with a VARIABLE pattern (and optionally
                    # variable flags — ARQ regex-3/4): per-distinct-pattern
                    # compile at evaluation
                    pv = self.next()
                    fv = None
                    if self.at_op(","):
                        self.next()
                        fvt = self.next()
                        if fvt.kind != "VAR":
                            raise SparqlSyntaxError(
                                "REGEX with a variable pattern takes "
                                "variable flags"
                            )
                        fv = "?" + fvt.text[1:]
                    self.expect_op(")")
                    return ("regexvar", var, "?" + pv.text[1:], fv)
                s = self.next()
                if s.kind != "STRING":
                    raise SparqlSyntaxError(f"{fn} pattern must be a string")
                pat = unescape_string(s.text[1:-1])
                if fn == "REGEX" and self.at_op(","):
                    self.next()
                    flags = self.next()
                    if flags.kind != "STRING":
                        raise SparqlSyntaxError("REGEX flags must be a string")
                    fl = unescape_string(flags.text[1:-1])
                    if fl not in ("", "i", "s", "m", "is", "si"):
                        raise SparqlSyntaxError(f"unsupported REGEX flags {fl!r}")
                    if fl:
                        pat = f"(?{fl})" + pat
                self.expect_op(")")
                # 4th slot: STR(...) widens the op from literal-only to the
                # effective string value (E_Regex raises a type error on
                # IRIs/bnodes unless STR() is applied first)
                return (_STR_FNS[fn], var, pat, wrapped)
            if fn == "LANGMATCHES":
                self.next()
                self.expect_op("(")
                var = self._parse_lang_arg()
                self.expect_op(",")
                s = self.next()
                self.expect_op(")")
                if s.kind != "STRING":
                    raise SparqlSyntaxError("LANGMATCHES range must be a string")
                return ("langmatches", var, unescape_string(s.text[1:-1]).lower())
            if fn == "LANG":
                var = self._parse_lang_arg()
                op_t = self.next()
                if op_t.kind != "OP" or op_t.text not in ("=", "!="):
                    raise SparqlSyntaxError(
                        "LANG(...) compares with = / != to a string"
                    )
                s = self.next()
                if s.kind != "STRING":
                    raise SparqlSyntaxError("LANG(...) compares to a string")
                return ("lang", var, unescape_string(s.text[1:-1]),
                        op_t.text == "!=")
        t0 = self.peek()
        if (t0.kind in ("PNAME", "IRIREF") and self.peek(1).kind == "OP"
                and self.peek(1).text == "("):
            # iriOrFunction as a FILTER atom: a custom/XPath function call
            # or an XSD constructor cast (E_Function / E_Cast under
            # FILTER). Bare call → effective boolean value of the result;
            # followed by a comparison → value compare of the two
            # expression columns (cmpexpr).
            lhs = self._parse_bind_atom()
            if (self.peek().kind == "OP"
                    and self.peek().text in ("=", "!=", "<", "<=",
                                             ">", ">=")):
                cmp_op = self.next().text
                node: tuple = ("cmpexpr", cmp_op, lhs,
                               self._parse_bind_expr())
            else:
                node = ("fexpr", lhs)
            return ("not", node) if neg else node
        if neg:
            raise SparqlSyntaxError("'!' only supported before BOUND")
        # comparison: additive-expr (OP additive-expr | IN (...) | NOT IN (...))
        return self._parse_comparison_tail(self._parse_add_expr())

    _CAST_TARGETS = {
        XSD + local
        for local in ("string", "boolean", "integer", "decimal", "float",
                      "double", "dateTime")
    }

    def _parse_datatype_filter(self) -> tuple:
        """FILTER(datatype(inner) =|!= xsd:T) → ('dtof', op, target, inner)
        where inner is ('var', ?v) | ('cast', target_iri, ?v) |
        ('arith', expr).  Covers E_Datatype over E_Cast (XPath casting
        table) and over arithmetic (XSD numeric promotion)."""
        self.expect_kw("DATATYPE")
        self.expect_op("(")
        t = self.peek()
        if t.kind == "VAR" and self.peek(1).kind == "OP" and self.peek(1).text == ")":
            inner = ("var", "?" + self.next().text[1:])
        elif (t.kind in ("PNAME", "IRIREF") and self.peek(1).kind == "OP"
              and self.peek(1).text == "("):
            cast_iri = self._iri(self.next())[1:-1]
            if cast_iri not in self._CAST_TARGETS:
                raise SparqlSyntaxError(f"unsupported cast target <{cast_iri}>")
            self.expect_op("(")
            v = self.next()
            if v.kind != "VAR":
                raise SparqlSyntaxError("cast argument must be a variable")
            self.expect_op(")")
            inner = ("cast", cast_iri, "?" + v.text[1:])
        else:
            inner = ("arith", self._parse_add_expr())
        self.expect_op(")")
        op_t = self.next()
        if op_t.kind != "OP" or op_t.text not in ("=", "!="):
            raise SparqlSyntaxError(
                "datatype(...) supports only = / != against an IRI constant"
            )
        rhs_t = self.next()
        if rhs_t.kind not in ("PNAME", "IRIREF"):
            raise SparqlSyntaxError("datatype(...) compares to an IRI constant")
        return ("dtof", op_t.text, self._iri(rhs_t)[1:-1], inner)

    def _parse_comparison_tail(self, lhs) -> tuple:
        if self.at_kw("IN") or (self.at_kw("NOT") and self.peek(1).kind == "NAME"
                                and self.peek(1).text.upper() == "IN"):
            # E_OneOf / E_NotOneOf — sugar for a disjunction/conjunction of
            # '='/'!=' atoms, which reuse the value/term lowering below
            negated = self.take_kw("NOT")
            self.expect_kw("IN")
            self.expect_op("(")
            items = []
            if not self.at_op(")"):
                items.append(self._parse_add_expr())
                while self.at_op(","):
                    self.next()
                    items.append(self._parse_add_expr())
            self.expect_op(")")
            if not items:
                # empty list: IN () is constant-false, NOT IN () constant-
                # true (E_OneOf over zero branches — syntax-oneof-02)
                return ("constb", negated)
            atoms = [self._lower_comparison("!=" if negated else "=", lhs, it)
                     for it in items]
            if len(atoms) == 1:
                return atoms[0]
            return ("and", *atoms) if negated else ("or", *atoms)
        op_t = self.next()
        if op_t.kind != "OP" or op_t.text not in ("=", "!=", "<", "<=", ">", ">="):
            raise SparqlSyntaxError(f"expected comparison operator at {op_t.text!r}")
        rhs = self._parse_add_expr()
        return self._lower_comparison(op_t.text, lhs, rhs)

    def _lower_comparison(self, op: str, lhs, rhs) -> tuple:
        """Lower one comparison to the executor's filter forms: arithmetic
        sides → ('cmp', …) value compare; XSD-numeric constants → numeric
        value filter like bare NUMBER tokens (E_Equals/E_LessThan numeric
        promotion); dateTime/date constants → ('dtcmp', …); otherwise the
        flat var-on-left form (sameTerm in id space for '='/'!=')."""
        lhs_n, rhs_n = _numeric_const(lhs), _numeric_const(rhs)
        if lhs_n is not None:
            lhs = lhs_n
        if rhs_n is not None:
            rhs = rhs_n
        if isinstance(lhs, tuple) or isinstance(rhs, tuple):
            for side in (lhs, rhs):
                if (isinstance(side, str) and not side.startswith("?")):
                    raise SparqlSyntaxError(
                        f"non-numeric operand in arithmetic comparison: {side!r}"
                    )
            return ("cmp", op, lhs, rhs)
        # dateTime/date constants compare by temporal VALUE (NodeValue
        # dateTime comparators) — lowered to the dtcmp value filter
        for a, b, flipped in ((lhs, rhs, False), (rhs, lhs, True)):
            dt = _datetime_const(b)
            if (dt is not None and isinstance(a, str) and a.startswith("?")):
                o2 = op
                if flipped:
                    o2 = {"<": ">", "<=": ">=", ">": "<", ">=": "<=",
                          "=": "=", "!=": "!="}[op]
                return ("dtcmp", o2, a, dt[1], dt[0])
        # simple-string constants order by codepoint (XSDFuncOp
        # compareString — FILTER(?name < "M")); lowered to the scmp
        # value filter, which errors (drops) non-simple-string terms
        if op in ("<", "<=", ">", ">="):
            import re as _re

            for a, b, flipped in ((lhs, rhs, False), (rhs, lhs, True)):
                if not (isinstance(a, str) and a.startswith("?")
                        and isinstance(b, str) and b.startswith('"')):
                    continue
                m = _re.match(
                    r'^"((?:[^"\\]|\\.)*)"(?:\^\^<http://www\.w3\.org'
                    r"/2001/XMLSchema#string>)?$",
                    b,
                )
                if m:
                    o2 = op
                    if flipped:
                        o2 = {"<": ">", "<=": ">=", ">": "<",
                              ">=": "<="}[op]
                    return ("scmp", o2, a, unescape_string(m.group(1)))
        if (op in ("<", "<=", ">", ">=")
                and isinstance(lhs, str) and lhs.startswith("?")
                and isinstance(rhs, str) and rhs.startswith("?")):
            # var-var ordering: NodeValue value-space comparison (numeric
            # when both numeric, codepoint order when both simple strings,
            # temporal when both dateTime/date — type error otherwise)
            return ("cmpexpr", op, ("var", lhs[1:]), ("var", rhs[1:]))
        if isinstance(lhs, float) and isinstance(rhs, float):
            raise SparqlSyntaxError("constant-only FILTER comparison")
        if isinstance(lhs, float) or (
                isinstance(lhs, str) and not lhs.startswith("?")
                and isinstance(rhs, str) and rhs.startswith("?")):
            # flip to var-on-left (constants — numeric or term — on the
            # left swap sides with the comparison direction inverted)
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "!=": "!="}
            lhs, rhs, op = rhs, lhs, flip[op]
        if not (isinstance(lhs, str) and lhs.startswith("?")):
            raise SparqlSyntaxError("comparison left side must be a variable")
        if (op in ("=", "!=") and isinstance(rhs, str)
                and (rhs.startswith("?") or rhs.startswith('"'))):
            # '='/'!=' against a variable or a literal constant is VALUE
            # equality (E_Equals / RDFterm-equal), not sameTerm —
            # "1"^^xsd:integer equals "01"^^xsd:integer, and unknown-value
            # literal pairs are type errors (open-world). IRI/bnode
            # constants keep the id-space sameTerm form (for them value
            # equality IS term identity), as does the sameTerm() builtin.
            return ("termeq", op, lhs, rhs)
        return (op, lhs, rhs)

    def _parse_add_expr(self):
        """Additive arithmetic expression over FILTER operands (E_Add /
        E_Subtract over E_Multiply/E_Divide, standard precedence). Returns
        a float constant, a '?var' / term string, or a nested tuple AST
        ('+'|'-'|'*'|'/', a, b) / ('neg', a) for the cmp value filter."""
        e = self._parse_mul_expr()
        while True:
            if self.at_op("+") or self.at_op("-"):
                op = self.next().text
                r = self._parse_mul_expr()
            elif (self.peek().kind == "NUMBER"
                    and self.peek().text[0] in "+-"):
                # '?v+9' tokenizes the sign INTO the number — the
                # grammar's NumericLiteralPositive/Negative additive
                # branch; the literal may itself start a mul chain
                t = self.next()
                op, r = t.text[0], float(t.text[1:])
                while self.at_op("*") or self.at_op("/"):
                    op2 = self.next().text
                    r = self._fold_arith(op2, r, self._parse_unary_expr())
            else:
                break
            e = self._fold_arith(op, e, r)
        return e

    def _parse_mul_expr(self):
        e = self._parse_unary_expr()
        while self.at_op("*") or self.at_op("/"):
            op = self.next().text
            r = self._parse_unary_expr()
            e = self._fold_arith(op, e, r)
        return e

    @staticmethod
    def _fold_arith(op: str, a, b):
        a2 = _numeric_const(a)
        b2 = _numeric_const(b)
        a, b = (a2 if a2 is not None else a), (b2 if b2 is not None else b)
        for side in (a, b):
            if isinstance(side, str) and not side.startswith("?"):
                raise SparqlSyntaxError(
                    f"non-numeric operand in arithmetic: {side!r}"
                )
        if isinstance(a, float) and isinstance(b, float):  # constant fold
            if op == "/" and b == 0.0:
                raise SparqlSyntaxError("constant division by zero")
            return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[op]
        return (op, a, b)

    def _parse_unary_expr(self):
        if self.at_op("-"):
            self.next()
            e = self._parse_unary_expr()
            if isinstance(e, float):
                return -e
            return ("neg", e)
        if self.at_op("+"):
            self.next()
            return self._parse_unary_expr()
        if self.at_op("("):
            self.next()
            e = self._parse_add_expr()
            self.expect_op(")")
            return e
        return self._parse_operand()

    def _parse_lang_arg(self) -> str:
        self.expect_kw("LANG")
        self.expect_op("(")
        v = self.next()
        self.expect_op(")")
        if v.kind != "VAR":
            raise SparqlSyntaxError("LANG needs a variable")
        return "?" + v.text[1:]

    def _str_cmp_ahead(self) -> bool:
        """Lookahead: does STR( ... ) close and continue with '=' / '!='?
        (distinguishes the E_Str comparison from STR as a plain operand of
        an unsupported expression shape)."""
        k = 2  # past STR (
        depth = 1
        while depth and self.peek(k).kind != "EOF":
            t = self.peek(k)
            if t.kind == "OP" and t.text == "(":
                depth += 1
            elif t.kind == "OP" and t.text == ")":
                depth -= 1
            k += 1
        nxt = self.peek(k)
        return nxt.kind == "OP" and nxt.text in ("=", "!=")

    def _str_fold_operand(self) -> str:
        """STR(x) operand: a variable, or a constant folded to its string
        value (IRI → IRI string, literal → lexical form — E_Str)."""
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return "?" + t.text[1:]
        term = self._no_qtpat(self.parse_term(), "STR")
        if term.startswith("<"):
            return term[1:-1]
        if term.startswith('"'):
            from jena_ray.term import split_literal

            return split_literal(term)[0]
        raise SparqlSyntaxError("STR operand must be a variable/IRI/literal")

    def _parse_str_arg(self) -> tuple[str, bool]:
        wrapped = False
        if self.at_kw("STR"):
            self.next()
            self.expect_op("(")
            v = self.next()
            self.expect_op(")")
            wrapped = True
        else:
            v = self.next()
        if v.kind != "VAR":
            raise SparqlSyntaxError("string function argument must be a variable")
        return "?" + v.text[1:], wrapped

    def _parse_operand(self):
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return float(t.text)
        if t.kind in ("BNODE", "ANON"):
            # the expression grammar has no blank-node production
            # (PrimaryExpression — DAWG syn-bad-30)
            raise SparqlSyntaxError(
                "blank nodes are not allowed in expressions"
            )
        return self._no_qtpat(self.parse_term(), "FILTER expressions")

    # -- BIND expressions (E_Str / E_Lang / E_Datatype / E_StrLength /
    #    E_StrUpperCase / E_StrLowerCase / E_StrConcat / E_MD5 / E_SHA* /
    #    E_Add..E_Divide / E_Conditional / E_Coalesce)
    _BIND_FNS = {"STR", "LANG", "DATATYPE", "STRLEN", "UCASE", "LCASE",
                 "CONCAT", "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
                 # RDF-star accessors/constructor (E_TripleSubject /
                 # E_TriplePredicate / E_TripleObject / E_TripleFn)
                 "SUBJECT", "PREDICATE", "OBJECT", "TRIPLE"}

    def _parse_bind_expr(self) -> tuple:
        return self._parse_bind_add()

    def _parse_bind_add(self) -> tuple:
        e = self._parse_bind_mul()
        while True:
            if self.at_op("+") or self.at_op("-"):
                op = self.next().text
                e = ("arith", op, e, self._parse_bind_mul())
            elif (self.peek().kind == "NUMBER"
                    and self.peek().text[0] in "+-"):
                # signed numeric literal as additive op+operand (the
                # grammar's NumericLiteralPositive/Negative branch)
                t = self.next()
                r: tuple = ("numconst", float(t.text[1:]))
                while self.at_op("*") or self.at_op("/"):
                    op2 = self.next().text
                    r = ("arith", op2, r, self._parse_bind_unary())
                e = ("arith", t.text[0], e, r)
            else:
                break
        return e

    def _parse_bind_mul(self) -> tuple:
        e = self._parse_bind_unary()
        while self.at_op("*") or self.at_op("/"):
            op = self.next().text
            e = ("arith", op, e, self._parse_bind_unary())
        return e

    def _parse_bind_unary(self) -> tuple:
        if self.at_op("-"):
            self.next()
            return ("neg", self._parse_bind_unary())
        if self.at_op("+"):
            self.next()
            return self._parse_bind_unary()
        if self.at_op("("):
            self.next()
            e = self._parse_bind_add()
            self.expect_op(")")
            return e
        return self._parse_bind_atom()

    def _parse_bind_atom(self) -> tuple:
        t = self.peek()
        if (self._pending_aggs is not None and t.kind == "NAME"
                and t.text.upper() in _AGG_FUNCS
                and self.peek(1).kind == "OP" and self.peek(1).text == "("):
            # aggregate call inside a SELECT expression — hoisted to an
            # internal-alias Agg computed by the group stage; the
            # expression references the alias (ARQ expands nested
            # aggregates the same way before algebra generation)
            func, var, distinct, sep = self._parse_agg_core()
            alias = f"__agg{len(self._pending_aggs)}"
            self._pending_aggs.append(Agg(func, var, distinct, alias, sep))
            return ("var", alias)
        if t.kind == "VAR":
            self.next()
            return ("var", t.text[1:])
        if t.kind == "STRING":
            self.next()
            return ("const", unescape_string(t.text[1:-1]))
        if t.kind == "NUMBER":
            self.next()
            return ("numconst", float(t.text))
        if t.kind == "NAME" and t.text.lower() in ("true", "false"):
            self.next()
            return ("termconst",
                    fmt_literal(t.text.lower(), datatype=XSD + "boolean"))
        if t.kind == "NAME" and t.text.upper() == "IF":
            # E_Conditional: IF(cond, then, else). The condition reuses the
            # FILTER expression grammar/kernels; an erroring condition row
            # takes the else branch (engine simplification of "error →
            # error" — documented; the common guards isNumeric/BOUND are
            # exact)
            self.next()
            self.expect_op("(")
            cond = self._parse_filter_or()
            self.expect_op(",")
            a = self._parse_bind_add()
            self.expect_op(",")
            b = self._parse_bind_add()
            self.expect_op(")")
            return ("if", cond, a, b)
        if t.kind == "NAME" and t.text.upper() == "COALESCE":
            self.next()
            self.expect_op("(")
            args = [self._parse_bind_add()]
            while self.at_op(","):
                self.next()
                args.append(self._parse_bind_add())
            self.expect_op(")")
            return ("coalesce", args)
        if t.kind == "NAME" and t.text.upper() in self._BIND_FNS:
            fn = self.next().text.upper()
            self.expect_op("(")
            args = [self._parse_bind_expr()]
            while self.at_op(","):
                self.next()
                args.append(self._parse_bind_expr())
            self.expect_op(")")
            if fn == "TRIPLE":
                if len(args) != 3:
                    raise SparqlSyntaxError("TRIPLE takes three arguments")
            elif fn != "CONCAT" and len(args) != 1:
                raise SparqlSyntaxError(f"{fn} takes one argument")
            return (fn.lower(), args)
        if t.kind in ("IRIREF", "PNAME"):
            if self.peek(1).kind == "OP" and self.peek(1).text == "(":
                # iriOrFunction: an IRI applied to arguments — either an
                # XSD constructor cast (xsd:integer(?v), XPath 17.5 table)
                # or a custom function resolved against the URI registry
                # (E_Function → FunctionRegistry; ARQ/XPath libraries in
                # functions/scalar.py URI_FUNCTIONS)
                iri = self._iri(self.next())[1:-1]
                self.expect_op("(")
                args = []
                if not self.at_op(")"):
                    args.append(self._parse_bind_expr())
                    while self.at_op(","):
                        self.next()
                        args.append(self._parse_bind_expr())
                self.expect_op(")")
                if iri.startswith(XSD):
                    if len(args) != 1:
                        raise SparqlSyntaxError(
                            f"cast {iri} takes one argument"
                        )
                    return ("xcast", iri, args[0])
                return ("funcall", iri, args)
            # IRI constant (canonical term) — e.g. TRIPLE(?s, <p>, ?o)
            return ("termconst", self._iri(self.next()))
        raise SparqlSyntaxError(f"unsupported BIND expression at {t.text!r}")


def _number_term(text: str) -> str:
    if re.fullmatch(r"[+-]?\d+", text):
        dt = XSD + "integer"
    elif re.fullmatch(r"[+-]?(?:\d+\.\d*|\.\d+)", text):
        dt = XSD + "decimal"
    else:
        dt = XSD + "double"
    return fmt_literal(text, datatype=dt)


_NUM_CONST_RE = re.compile(
    r'^"([^"]*)"\^\^<http://www\.w3\.org/2001/XMLSchema#(?:integer|decimal|'
    r"double|float|int|long|short|byte|nonPositiveInteger|negativeInteger|"
    r"nonNegativeInteger|positiveInteger|unsignedLong|unsignedInt|"
    r"unsignedShort|unsignedByte)>$"
)
_DT_CONST_RE = re.compile(
    r'^"(\d{4,}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?)?'
    r'(?:Z|[+-]\d{2}:\d{2})?)"\^\^'
    r"<http://www\.w3\.org/2001/XMLSchema#(dateTime|date)>$"
)


def _numeric_const(operand) -> float | None:
    """Numeric VALUE of an XSD-numeric-datatype literal term, else None."""
    if not isinstance(operand, str) or not operand.startswith('"'):
        return None
    m = _NUM_CONST_RE.match(operand)
    if m is None:
        return None
    try:
        return float(m.group(1))
    except ValueError:
        return None


def _datetime_const(operand) -> tuple[str, str] | None:
    """(kind, ISO lexical form) of an xsd:dateTime/xsd:date literal term,
    else None (timezone kept; the dtcmp kernel parses it to an instant and
    compares type-strictly within the kind's value space)."""
    if not isinstance(operand, str) or not operand.startswith('"'):
        return None
    m = _DT_CONST_RE.match(operand)
    return (m.group(2), m.group(1)) if m else None


def parse_query(src: str, base: str | None = None,
                arq: bool = True) -> Query:
    """Parse one SPARQL query string. ``base`` seeds the IRI resolver
    (needed for relative FROM / FROM NAMED document IRIs — the reference
    resolves them against the query's syntax base); an in-query BASE
    declaration overrides it. ``arq=False`` parses strict SPARQL 1.1,
    rejecting the ARQ syntax extensions."""
    p = Parser(src, arq=arq)
    if base is not None:
        p.base = base
    return p.parse_query()


# ---------------------------------------------------------------- executor

def _group_vars(g: Group) -> set[str]:
    out = set()
    for p in g.patterns:
        out |= {t[1:] for t in p
                if isinstance(t, str) and t.startswith("?")}
    for ph, s, p_, o in g.star:
        out |= {t[1:] for t in (s, p_, o) if t.startswith("?")}
        out.discard(ph[1:])  # placeholders are internal
    for s, _p, o, *_ in g.paths:
        out |= {t[1:] for t in (s, o) if t.startswith("?")}
    if g.graph and g.graph.startswith("?"):
        out.add(g.graph[1:])
    out |= {t[1:] for t in g.graph_enum if t.startswith("?")}
    for r in g.values or []:
        out |= {k.lstrip("?") for k in r}
    for sub in g.subqueries:
        out |= set(_sub_vars(sub))
    for subj, _iri, args in g.pfcalls:
        out |= {t[1:] for t in (subj, *args)
                if isinstance(t, str) and t.startswith("?")}
    return out


def _filter_tree_vars(f: tuple) -> set[str]:
    from jena_ray.pipelines.bgp import _filter_vars

    return _filter_vars(f)


def _const_filter_value(f: tuple) -> bool:
    """Fold a filter tree whose leaves are all ``constb`` (after
    unbound-variable lowering) to its boolean value."""
    op = f[0]
    if op == "and":
        return all(_const_filter_value(s) for s in f[1:])
    if op == "or":
        return any(_const_filter_value(s) for s in f[1:])
    if op == "constb":
        return bool(f[1])
    raise SparqlSyntaxError(f"non-constant FILTER with no in-scope vars: {f}")


def _unbind_graph_var(f: tuple, gv: str) -> tuple:
    """SPARQL §18.5 Graph(var, P): eval joins {var→g} AFTER evaluating P,
    so a FILTER inside the GRAPH braces sees the graph variable UNBOUND
    (ARQ Dataset/graph-20 vs graph-21). Rewrite leaves referencing it:
    bound → false, !bound → true, every other leaf ERRORS on the unbound
    arg — and error and false are outcome-equivalent at every position in
    an and/or tree (negations are baked into leaf ops), so they lower to
    constant false."""
    op = f[0]
    if op in ("or", "and"):
        return (op, *(_unbind_graph_var(s, gv) for s in f[1:]))
    from jena_ray.pipelines.bgp import _filter_vars

    if gv not in _filter_vars(f):
        return f
    if op in ("bound", "!bound") and f[1] == "?" + gv:
        return ("constb", op == "!bound")
    return ("constb", False)


def _sub_vars(sub: "Query") -> list[str]:
    """Variables a subquery projects into the enclosing group (explicit
    projection + aggregate aliases)."""
    return list(sub.select) + [a.alias for a in sub.aggs]


def _opt_blocks(g: Group) -> list[tuple]:
    """Compile a group's OPTIONAL blocks to bgp_optionals' nested
    ``(patterns, filters, subblocks)`` entries, rejecting block shapes
    outside the subset."""

    def one(o: Group) -> tuple:
        if (o.minuses or o.union or o.paths or o.binds or o.values
                or o.exists or o.subqueries or o.star or o.graph):
            raise SparqlSyntaxError(
                "OPTIONAL block must be patterns + FILTER (+ nested "
                "OPTIONAL)"
            )
        return (o.patterns, o.filters or None, [one(s) for s in o.optionals])

    return [one(o) for o in g.optionals]


def _binding_vars(g: Group) -> set[str]:
    """Variables a group's solutions may bind, excluding BIND aliases
    (tracked separately) and MINUS sides (never bind): the group's own
    binders plus OPTIONAL blocks at any depth and UNION branches."""
    out = _group_vars(g)
    for o in g.optionals:
        out |= _binding_vars(o)
    for b in g.union or []:
        out |= _binding_vars(b)
    for n in g.nested:
        out |= _binding_vars(n)
    return out


def _scope_vars(g: Group) -> set[str]:
    """All variables in scope of a group for FILTER visibility (SPARQL 1.1
    §18.2.1): the group's own binders plus OPTIONAL blocks, UNION branches,
    and BIND aliases — but NOT the enclosing group's variables."""
    out = _group_vars(g)
    for o in g.optionals:
        out |= _scope_vars(o)
    for b in g.union or []:
        out |= _scope_vars(b)
    for n in g.nested:
        out |= _scope_vars(n)
    out |= {v for _, v in g.binds}
    return out


def _execute_star_where(out_dir: str, q: Query, select: list[str], *,
                        distinct: bool, num_partitions: int, pf_context,
                        stats):
    """Variable-bearing quoted-triple patterns (``<< ?s ?p ?o >> :p ?c``).

    The reference matches these natively in its SPARQL-star engine
    (jena-arq rdf_star/; quoted triples are first-class Node_Triple values).
    Here a quoted triple is an opaque TERM, so the embedded pattern runs as
    placeholder-variable BGP → per-distinct-term canonical decompose
    (term.quoted_triple_parts) → ground-component/equality mask → component
    columns. Component variables are OUTPUT-ONLY: they may not occur
    elsewhere in the group (that join would need component ids in the index
    space — out of subset, rejected loudly)."""
    import dataclasses

    g = q.where
    if (g.optionals or g.minuses or g.union or g.values or g.graph
            or g.exists or g.paths or g.subqueries or g.binds):
        raise SparqlSyntaxError(
            "quoted-triple patterns combine only with plain patterns + FILTER"
        )
    comp: dict[str, tuple[str, int]] = {}  # var -> (placeholder, slot)
    eqs: list[tuple[str, int, int]] = []   # repeated var within one pattern
    grounds: list[tuple[str, int, str]] = []
    for ph, s, p, o in g.star:
        local: dict[str, int] = {}
        for idx, t in enumerate((s, p, o)):
            if t.startswith("?"):
                v = t[1:]
                if v in local:
                    eqs.append((ph, local[v], idx))
                elif v in comp:
                    raise SparqlSyntaxError(
                        "a quoted-triple component variable cannot span "
                        "two quoted-triple patterns"
                    )
                else:
                    local[v] = idx
                    comp[v] = (ph, idx)
            else:
                grounds.append((ph, idx, t))
    pattern_vars = {t[1:] for pat in g.patterns
                    for t in pat if isinstance(t, str) and t.startswith("?")}
    filter_vars = set()
    for f in g.filters:
        filter_vars |= {v for v in _filter_var_names(f)}
    clash = set(comp) & (pattern_vars | filter_vars)
    if clash:
        raise SparqlSyntaxError(
            f"quoted-triple component variables {sorted(clash)} cannot be "
            "used in other patterns or FILTERs (output-only subset)"
        )
    inner_select = [v for v in select if v not in comp]
    for ph, *_ in g.star:
        if ph[1:] not in inner_select:
            inner_select.append(ph[1:])
    q2 = dataclasses.replace(q, where=dataclasses.replace(g, star=[]))
    sub = _execute_where(out_dir, q2, inner_select, distinct=False,
                         num_partitions=num_partitions,
                         pf_context=pf_context, stats=stats)

    star = list(g.star)
    comp_items = sorted(comp.items())
    sel = list(select)

    def decompose(tb: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from jena_ray.term import TermError, quoted_triple_parts

        cache: dict[str, tuple | None] = {}

        def parts_of(v):
            if v is None or not v.startswith("<<"):
                return None
            if v not in cache:
                try:
                    cache[v] = quoted_triple_parts(v)
                except TermError:
                    cache[v] = None
            return cache[v]

        parts_by_ph = {}
        keep = np.ones(tb.num_rows, dtype=bool)
        for ph, _s, _p, _o in star:
            vals = pc.cast(tb.column(ph[1:]), pa.string()).to_pylist()
            ps = [parts_of(v) for v in vals]
            parts_by_ph[ph] = ps
            keep &= np.array([p is not None for p in ps], dtype=bool)
        for ph, idx, term in grounds:
            ps = parts_by_ph[ph]
            keep &= np.array(
                [p is not None and p[idx] == term for p in ps], dtype=bool
            )
        for ph, i, j in eqs:
            ps = parts_by_ph[ph]
            keep &= np.array(
                [p is not None and p[i] == p[j] for p in ps], dtype=bool
            )
        cols = {}
        for name in sel:
            if name in comp:
                ph, idx = comp[name]
                ps = parts_by_ph[ph]
                cols[name] = pa.array(
                    [None if p is None else p[idx] for p in ps],
                    type=pa.string(),
                )
            else:
                cols[name] = pc.cast(tb.column(name), pa.string())
        return pa.table(cols).filter(pa.array(keep))

    res = sub.map_batches(decompose, batch_format="pyarrow")
    if distinct:
        from jena_ray.stages.dedup import dedup_exact

        res = dedup_exact(res, cols=tuple(sel), coalesce=True)
    return res


def _filter_var_names(f) -> set[str]:
    out: set[str] = set()
    for a in (f[1:] if isinstance(f, tuple) else ()):
        if isinstance(a, tuple):
            out |= _filter_var_names(("_", *a))
        elif isinstance(a, str) and a.startswith("?"):
            out.add(a[1:])
    return out


def _apply_path_ds(res, res_cols: list[str], pairs_ds, roots_ds,
                   src, obj, mod: str, s_var, o_var,
                   num_partitions: int):
    """Dataset-resident application of one path step to the binding stream
    — the scale leg of _execute_bound_paths, used when the (root, target)
    pair set or the root set exceeds the driver budget
    (bgp.PATH_PAIR_SPILL). extend = bucketed binding_join on the root
    column; semi = left-semi binding_join on the correlated columns.
    Everything stays object-store resident. Returns (res, res_cols)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.pipelines import bgp
    from jena_ray.stages.dedup import dedup_exact

    if s_var is None:
        # Concrete-source path past the driver budget (round-5 ADVICE —
        # this shape previously raised, regressing queries the old driver
        # path completed): pairs_ds holds only pairs rooted at ``src``, so
        # every operation is expressible Dataset-resident.
        if mod in ("*", "?"):
            zl = rd.from_arrow(pa.table({
                "src": pa.array([src], type=pa.string()),
                "y": pa.array([src], type=pa.string())}))
            pairs_ds = dedup_exact(pairs_ds.union(zl), cols=("src", "y"))
        if o_var is not None and o_var not in res_cols:
            tgt = pairs_ds.map_batches(
                lambda t, _o=o_var: pa.table({_o: t.column("y")}),
                batch_format="pyarrow",
            )
            if not res_cols:
                # unit-solution base (pure path chain from a concrete
                # endpoint): the reached set IS the extension
                return tgt, [o_var]
            # EXTEND: |res| × |reached| rows by contract. Broadcast the
            # bounded binding stream once (ray.put) and cross it against
            # each pair batch — output stays object-store resident.
            import ray

            res_m = res.materialize()
            if res_m.count() > bgp.PATH_PAIR_SPILL:
                raise SparqlSyntaxError(
                    "a concrete-source path extend with BOTH the closure "
                    "and the binding stream past the driver budget is not "
                    "in the supported subset"
                )
            left_tb = pa.concat_tables(
                res_m.iter_batches(batch_format="pyarrow")
            ).combine_chunks().select(res_cols)
            left_ref = ray.put(left_tb)

            def cross(tb: pa.Table, _ref=left_ref, _o=o_var) -> pa.Table:
                import numpy as np

                lt = ray.get(_ref)
                li = np.repeat(np.arange(lt.num_rows), tb.num_rows)
                ri = np.tile(np.arange(tb.num_rows), lt.num_rows)
                out = lt.take(pa.array(li))
                return out.append_column(
                    _o, tb.column(_o).combine_chunks().take(pa.array(ri)))

            return tgt.map_batches(cross, batch_format="pyarrow"), \
                res_cols + [o_var]
        if o_var is not None:
            # SEMI on the bound object column: keep rows whose o_var value
            # is reached from the concrete source
            pr = pairs_ds.map_batches(
                lambda t, _o=o_var: pa.table({_o: t.column("y")}),
                batch_format="pyarrow",
            )
            res = bgp.binding_join(
                res, set(res_cols), pr, {o_var}, [o_var],
                how="left_semi", num_buckets=num_partitions,
                col_types={c: pa.string() for c in set(res_cols) | {o_var}},
            )
            return res, res_cols
        # both endpoints concrete: the path holds (res unchanged) or not
        hold = pairs_ds.map_batches(
            lambda t, _o=obj: t.filter(pc.equal(t.column("y"), _o)),
            batch_format="pyarrow",
        ).limit(1).count()
        return (res if hold else res.limit(0)), res_cols
    if mod in ("*", "?"):
        def selfp(tb: pa.Table) -> pa.Table:
            return pa.table({"src": tb.column("src"),
                             "y": tb.column("src")})

        zl = roots_ds.map_batches(selfp, batch_format="pyarrow")
        pairs_ds = dedup_exact(pairs_ds.union(zl), cols=("src", "y"))

    def rename(tb: pa.Table, _m: dict) -> pa.Table:
        return tb.rename_columns([_m.get(c, c) for c in tb.schema.names])

    str_types = {c: pa.string() for c in set(res_cols) | {s_var, o_var or ""}}
    if o_var is not None and o_var not in res_cols:
        pr = pairs_ds.map_batches(
            lambda t, _m={"src": s_var, "y": o_var}: rename(t, _m),
            batch_format="pyarrow",
        )
        res = bgp.binding_join(
            res, set(res_cols), pr, {s_var, o_var}, [s_var],
            num_buckets=num_partitions, col_types=str_types,
        )
        return res, res_cols + [o_var]

    # SEMI: keep binding rows whose (root, target) pair holds
    keys = [s_var]
    m = {"src": s_var}
    pr = pairs_ds
    if o_var is not None:
        m["y"] = o_var
        keys.append(o_var)
    else:
        pr = pr.map_batches(
            lambda t, _o=obj: t.filter(pc.equal(t.column("y"), _o)),
            batch_format="pyarrow",
        )
    pr = pr.map_batches(lambda t, _m=m: rename(t, _m),
                        batch_format="pyarrow")
    rv = {s_var} | ({o_var} if o_var is not None else set())

    def proj_keys(tb: pa.Table, _k=tuple(sorted(rv))) -> pa.Table:
        return tb.select(list(_k))

    pr = pr.map_batches(proj_keys, batch_format="pyarrow")
    res = bgp.binding_join(
        res, set(res_cols), pr, rv, keys,
        how="left_semi", num_buckets=num_partitions, col_types=str_types,
    )
    return res, res_cols


def _execute_bound_paths(out_dir: str, g: Group, select: list[str], *,
                         distinct: bool, num_partitions: int, stats):
    """Property paths joined with triple patterns (ARQ Paths path-10/11,
    rdf:type/rdfs:subClassOf* idioms): execute the plain-BGP base first,
    then evaluate each path per distinct root binding — multi-root BFS
    pairs broadcast into a vectorized per-batch join/semi-join (the
    reference's PathEngine runs the path once per incoming binding; the
    batched-roots form is the same contract without the per-row loop).
    Partitioning assumption: path closures are driver-sized (PathEngine
    visited-set contract); the BASE bindings stay distributed."""
    import pandas as pd
    import pyarrow.compute as pc

    from jena_ray.pipelines import bgp
    from jena_ray.stages.dedup import dedup_exact

    if (g.minuses or g.union or g.values or g.graph
            or g.exists or g.subqueries or g.star or g.binds):
        raise SparqlSyntaxError(
            "property paths combine only with triple patterns + FILTER"
        )
    for o in g.optionals:
        # OPTIONAL over a path block (ARQ Paths path-22): the block —
        # itself plain patterns + paths — evaluates independently and
        # LEFT-joins the accumulated solutions on its shared variables
        # (LeftJoin(base, PathBlock); the block's closure tables are
        # driver-sized per the PathEngine visited-set contract)
        if (o.optionals or o.minuses or o.union or o.values or o.exists
                or o.subqueries or o.star or o.binds or o.pfcalls
                or o.graph_enum or o.filters or o.services):
            raise SparqlSyntaxError(
                "an OPTIONAL combining with paths must be a plain "
                "pattern+path block"
            )
    base_vars = {t[1:] for p in g.patterns for t in p
                 if isinstance(t, str) and t.startswith("?")}
    # endpoint vars the base must provide; paths evaluate in order, each
    # may extend the binding set with its object variable
    bound: set[str] = set(base_vars)
    plan: list[tuple] = []
    for src, pred, obj, mod, inv in g.paths:
        if isinstance(mod, tuple):
            raise SparqlSyntaxError(
                "p{n,m} ranges join patterns only via the sole-path form"
            )
        s_var = src[1:] if isinstance(src, str) and src.startswith("?") else None
        o_var = obj[1:] if isinstance(obj, str) and obj.startswith("?") else None
        if s_var is not None and s_var not in bound:
            if (o_var is None) or (o_var in bound):
                # roots only known on the object side: walk backwards
                src, obj = obj, src
                s_var, o_var = o_var, s_var
                inv = not inv
            else:
                raise SparqlSyntaxError(
                    "path needs one endpoint bound by the base patterns"
                )
        plan.append((src, pred, obj, mod, inv, s_var, o_var))
        if o_var is not None:
            bound.add(o_var)
    for o in g.optionals:
        bound |= {t[1:] for p in o.patterns for t in p
                  if isinstance(t, str) and t.startswith("?")}
        bound |= {t[1:] for s, _p, t2, _m, _i in o.paths
                  for t in (s, t2)
                  if isinstance(t, str) and t.startswith("?")}
    missing = [v for v in select if v not in bound]
    if missing:
        raise SparqlSyntaxError(f"select vars not bound: {missing}")
    for f in g.filters or []:
        if not _filter_tree_vars(f) <= base_vars:
            raise SparqlSyntaxError(
                "FILTER over path-bound variables is unsupported"
            )

    need = set(select)
    for src, pred, obj, mod, inv, s_var, o_var in plan:
        need |= {v for v in (s_var, o_var) if v is not None}
    base_sel = sorted(need & base_vars)
    if g.patterns:
        res = bgp.bgp_execute(
            out_dir, g.patterns, base_sel, num_partitions=num_partitions,
            distinct=False, stats=stats, filters=g.filters or None,
        )
        res_cols = list(base_sel)
    else:
        # pure path chain from a concrete endpoint (p+/q* …): start from
        # the unit solution and let the first path extend it
        import ray.data as rd

        res = rd.from_arrow(
            pa.table({"__unit": pa.array([0], type=pa.int8())})
        )
        res_cols = []

    for src, pred, obj, mod, inv, s_var, o_var in plan:
        import ray.data as rd

        from jena_ray.stages.dedup import dedup_exact

        if s_var is not None:
            # roots as a DATASET (round-4): the root set is never forced
            # through the driver — path_closure_pairs collects it only
            # when small, else runs the BFS in Dataset mode
            def rcol(tb: pa.Table, _v=s_var) -> pa.Table:
                col = tb.column(_v)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return pa.table({"src": col.drop_null()})

            roots_ds = dedup_exact(
                res.map_batches(rcol, batch_format="pyarrow"),
                cols=("src",), coalesce=True,
            ).materialize()
            n_roots = roots_ds.count()
            roots_arg = roots_ds
        else:
            roots_ds, n_roots, roots_arg = None, 1, [src]
        pairs_ds = bgp.path_closure_pairs(
            out_dir, pred, roots_arg, inverse=inv,
            one_step=(mod == "?"),
        ).materialize()
        big = max(n_roots, pairs_ds.count()) > bgp.PATH_PAIR_SPILL
        if big:
            res, res_cols = _apply_path_ds(
                res, res_cols, pairs_ds, roots_ds,
                src, obj, mod, s_var, o_var, num_partitions,
            )
            continue
        pairs = pairs_ds.to_pandas()
        if roots_ds is not None:
            roots = sorted(
                v
                for b in roots_ds.iter_batches(batch_format="pyarrow")
                for v in b.column("src").to_pylist()
            )
        else:
            roots = [src]
        if mod in ("*", "?"):
            # zero-length leg: every root reaches itself
            pairs = pd.concat(
                [pairs, pd.DataFrame({"src": list(roots),
                                      "y": list(roots)})],
                ignore_index=True,
            ).drop_duplicates()
        if o_var is not None and o_var not in res_cols:
            # EXTEND: base row × its root's reached set
            pdf = pairs.rename(columns={"y": o_var})

            def extend(tb: pa.Table, _p=pdf, _sv=s_var, _ov=o_var,
                       _src=src) -> pa.Table:
                df = tb.to_pandas()
                if _sv is not None:
                    out = df.merge(_p, left_on=_sv, right_on="src")
                    out = out.drop(columns=["src"])
                else:
                    rows = _p[_p["src"] == _src][[_ov]]
                    out = df.merge(rows, how="cross")
                return pa.Table.from_pandas(out, preserve_index=False)

            res = res.map_batches(extend, batch_format="pyarrow")
            res_cols.append(o_var)
        else:
            # SEMI-JOIN: keep rows whose (root, target) pair holds
            tgt_col = o_var  # None → concrete obj
            keyset = pa.array(
                # "\n" separator: canonical N-Triples terms never contain
                # a raw newline (and pandas object-Series concat silently
                # drops NUL bytes, so "\x00" is NOT usable here)
                (pairs["src"] + "\n" + pairs["y"]).tolist(),
                type=pa.string(),
            )

            def keep(tb: pa.Table, _k=keyset, _sv=s_var, _tv=tgt_col,
                     _src=src, _obj=obj) -> pa.Table:
                n = tb.num_rows
                s_arr = (pc.cast(tb.column(_sv), pa.string())
                         if _sv is not None
                         else pa.array([_src] * n, type=pa.string()))
                t_arr = (pc.cast(tb.column(_tv), pa.string())
                         if _tv is not None
                         else pa.array([_obj] * n, type=pa.string()))
                key = pc.binary_join_element_wise(s_arr, t_arr, "\n")
                return tb.filter(
                    pc.fill_null(pc.is_in(key, value_set=_k), False)
                )

            res = res.map_batches(keep, batch_format="pyarrow")

    for o in g.optionals:
        ovars = sorted(
            ({t[1:] for p in o.patterns for t in p
              if isinstance(t, str) and t.startswith("?")}
             | {t[1:] for s, _p, t2, _m, _i in o.paths
                for t in (s, t2)
                if isinstance(t, str) and t.startswith("?")})
        )
        user_ovars = [v for v in ovars if not v.startswith("__")]
        shared = [v for v in user_ovars if v in res_cols]
        if not shared:
            raise SparqlSyntaxError(
                "the OPTIONAL path block shares no variable with the base"
            )
        inner = _execute_bound_paths(
            out_dir, o, user_ovars, distinct=False,
            num_partitions=num_partitions, stats=stats,
        )
        idf = pd.concat(
            [b.to_pandas()
             for b in inner.iter_batches(batch_format="pyarrow")]
            or [pd.DataFrame(columns=user_ovars)],
            ignore_index=True,
        )

        def left_extend(tb: pa.Table, _p=idf, _on=tuple(shared)) -> pa.Table:
            df = tb.to_pandas()
            out = df.merge(_p, on=list(_on), how="left")
            return pa.Table.from_pandas(out, preserve_index=False)

        res = res.map_batches(left_extend, batch_format="pyarrow")
        res_cols.extend(v for v in user_ovars if v not in res_cols)

    if set(res_cols) != set(select):
        def proj(tb: pa.Table, _s=tuple(select)) -> pa.Table:
            return tb.select(list(_s))

        res = res.map_batches(proj, batch_format="pyarrow")
    if distinct:
        res = dedup_exact(res, cols=tuple(select), coalesce=True)
    return res


def _execute_pf_group(out_dir: str, g: Group, select: list[str], *,
                      distinct: bool, num_partitions: int, pf_context,
                      stats):
    """A group containing ARQ property-function calls (list:member,
    apf:assign, rdfs:member, …): evaluate the plain patterns first
    (per connected component — a PF argument list can bridge otherwise
    disjoint patterns, e.g. apf:concat over two independent scans), then
    lower the PF calls over the solution stream in value space
    (functions/property_arq.apply_value_pfs — the reference runs each
    PropertyFunction per incoming binding, PropFuncArg.java:34; result
    sets are order-independent, so pattern-first evaluation matches the
    suite's expected rows). FILTERs wholly inside one pattern component
    push into its scan; the rest apply post-PF."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.functions.property_arq import apply_value_pfs
    from jena_ray.pipelines import bgp
    from jena_ray.stages.dedup import dedup_exact

    if (g.union or g.optionals or g.minuses or g.graph or g.paths
            or g.exists or g.values or g.subqueries or g.star or g.binds
            or g.graph_enum):
        raise SparqlSyntaxError(
            "property functions combine only with plain patterns + FILTER"
        )

    def tvars(p) -> set[str]:
        return {t[1:] for t in p
                if isinstance(t, str) and t.startswith("?")}

    pat_vars = set().union(*(tvars(p) for p in g.patterns)) \
        if g.patterns else set()
    pf_vars = {t[1:] for subj, _iri, args in g.pfcalls
               for t in (subj, *args)
               if isinstance(t, str) and t.startswith("?")}

    # connected components of the pattern block (vars as edges)
    comps: list[list] = []
    cvars: list[set[str]] = []
    for p in g.patterns:
        pv = tvars(p)
        hit = [i for i, cv in enumerate(cvars) if cv & pv]
        if not hit:
            comps.append([p])
            cvars.append(pv)
        else:
            first, *rest = hit
            comps[first].append(p)
            cvars[first] |= pv
            for i in reversed(rest):
                comps[first].extend(comps.pop(i))
                cvars[first] |= cvars.pop(i)

    base_filters: list[list[tuple]] = [[] for _ in comps]
    post_filters: list[tuple] = []
    for f in g.filters:
        fv = bgp._filter_vars(f)
        tgt = next((i for i, cv in enumerate(cvars) if fv <= cv), None)
        if tgt is None:
            post_filters.append(f)
        else:
            base_filters[tgt].append(f)

    need = (set(select) | pf_vars) & pat_vars
    for f in post_filters:
        need |= bgp._filter_vars(f) & pat_vars

    res, res_vars = None, set()
    for comp, cv, cfs in zip(comps, cvars, base_filters):
        cneed = sorted(need & cv) or sorted(cv)[:1]
        part = bgp.bgp_execute(
            out_dir, comp, cneed, num_partitions=num_partitions,
            distinct=False, stats=stats, filters=cfs or None,
            pf_context=pf_context,
        )
        if res is None:
            res, res_vars = part, set(cneed)
        else:
            res = bgp._cross_join(res, res_vars, part, set(cneed))
            res_vars |= set(cneed)

    res, res_vars = apply_value_pfs(out_dir, res, res_vars, g.pfcalls,
                                    num_partitions)

    if post_filters:
        fs = tuple(post_filters)

        def fmask(tb: pa.Table, _fs=fs) -> pa.Table:
            m = None
            for f in _fs:
                mm = bgp._value_filter_mask(tb, f, lambda v: v)
                m = mm if m is None else pc.and_(m, mm)
            return tb.filter(pc.fill_null(m, False))

        res = res.map_batches(fmask, batch_format="pyarrow")

    if res is None:
        # all calls were ground existence tests that held: one unit row
        res = rd.from_arrow(pa.table(
            {v: pa.array([None], type=pa.string()) for v in select}
            if select else {"__unit": pa.array([0], type=pa.int8())}
        ))
        res_vars = set(select)

    def proj(tb: pa.Table, _s=tuple(select), _have=tuple(sorted(res_vars))
             ) -> pa.Table:
        # vars mentioned only in unsatisfiable slots stay unbound (null)
        cols = {v: (pc.cast(tb.column(v), pa.string()) if v in _have
                    else pa.nulls(tb.num_rows, type=pa.string()))
                for v in _s}
        return pa.table(cols) if cols else tb

    res = res.map_batches(proj, batch_format="pyarrow")
    if distinct:
        res = dedup_exact(res, cols=tuple(select), coalesce=True)
    return res


def _execute_where(out_dir: str, q: Query, select: list[str], *,
                   distinct: bool, num_partitions: int, pf_context, stats):
    """Lower the WHERE group onto the pipelines/bgp.py algebra entry points
    (the executor dispatch of OpExecutor.java, specialized per shape)."""
    from jena_ray.pipelines import bgp

    g = q.where
    kw = dict(num_partitions=num_partitions, distinct=distinct)

    if g.pfcalls:
        return _execute_pf_group(out_dir, g, select, distinct=distinct,
                                 num_partitions=num_partitions,
                                 pf_context=pf_context, stats=stats)

    if g.graph_enum:
        # GRAPH x { } elements (empty BGP per named graph): sole-element
        # subset — enumerate names / probe existence over the GSPO store
        import ray.data as rd

        from jena_ray.stages.dedup import dedup_exact
        from jena_ray.stages.materialize import resolve_id_columns

        if (g.patterns or g.paths or g.filters or g.optionals or g.minuses
                or g.union or g.values or g.exists or g.subqueries
                or g.star or len(g.graph_enum) != 1):
            raise SparqlSyntaxError(
                "GRAPH x { } combines with nothing else in this subset"
            )
        gt = g.graph_enum[0]
        has_quads = os.path.isdir(os.path.join(out_dir, "gspo"))
        if not gt.startswith("?"):
            # existence probe: one empty solution iff the graph exists
            import pandas as pd

            n = 0
            if has_quads:
                from jena_ray.stages.quads import quad_pattern_scan

                probe = quad_pattern_scan(out_dir, g=gt,
                                          resolve_terms=False)
                n = 1 if len(probe.limit(1).take(1)) > 0 else 0
            return pd.DataFrame(index=range(n))
        gvar = gt[1:]
        if select != [gvar]:
            raise SparqlSyntaxError(
                "GRAPH ?g { } must select the graph variable"
            )
        if not has_quads:
            return rd.from_arrow(
                pa.table({gvar: pa.array([], type=pa.string())})
            )
        ids = rd.read_parquet(
            os.path.join(out_dir, "gspo"), columns=["g_id"]
        )
        ids = dedup_exact(ids, cols=("g_id",), coalesce=True)
        return resolve_id_columns(ids, out_dir, {"g_id": gvar})

    if g.star:
        return _execute_star_where(
            out_dir, q, select, distinct=distinct,
            num_partitions=num_partitions, pf_context=pf_context,
            stats=stats,
        )

    if g.subqueries:
        return _execute_subquery_group(
            out_dir, q, select, distinct=distinct,
            num_partitions=num_partitions, pf_context=pf_context, stats=stats,
        )

    if g.paths:
        sole = (
            len(g.paths) == 1 and not g.patterns and not g.optionals
            and not g.minuses and not g.union and not g.values
            and not g.graph and not g.exists and not g.filters
            and isinstance(g.paths[0][0], str)
            and not g.paths[0][0].startswith("?")
            and isinstance(g.paths[0][2], str)
            and g.paths[0][2].startswith("?")
            and select == [g.paths[0][2][1:]]
        )
        if not sole:
            # paths JOINED with triple patterns / several paths / bound
            # endpoints: per-binding path evaluation batched over all
            # roots (PathEngine's evaluation under a binding stream)
            return _execute_bound_paths(
                out_dir, g, select, distinct=distinct,
                num_partitions=num_partitions, stats=stats,
            )
        src, pred, obj, mod, inv = g.paths[0]
        if isinstance(mod, tuple) and mod[0] == "range":
            # p{n,m}: DISTINCT union of the k-step chains for k=n..m (the
            # draft alternation P{n}|…|P{m}, set semantics). One multi-arg
            # union — chained .union calls build pathological plan depth.
            from jena_ray.stages.dedup import dedup_exact

            _, n, m = mod
            branches = []
            for k in range(n, m + 1):
                pats, node = [], src
                for i in range(k):
                    nxt = obj if i == k - 1 else f"?__rng{k}_{i}"
                    pats.append((nxt, pred, node) if inv else (node, pred, nxt))
                    node = nxt
                branches.append(
                    bgp.bgp_execute(out_dir, pats, [obj[1:]],
                                    num_partitions=num_partitions, stats=False)
                )
            first, *rest = branches
            res = first.union(*rest) if rest else first
            return dedup_exact(res, cols=(obj[1:],), coalesce=True)
        if mod == "?":
            # P_ZeroOrOne: direct objects plus the source itself
            pat = (obj, pred, src) if inv else (src, pred, obj)
            res = bgp.bgp_execute(out_dir, [pat], [obj[1:]],
                                  num_partitions=num_partitions, stats=False)
        else:
            res = bgp.path_closure(out_dir, pred, src, var=obj[1:],
                                   num_partitions=num_partitions, inverse=inv)
        if mod in ("*", "?"):
            # zero steps: the source reaches itself
            import ray.data as rd

            from jena_ray.stages.dedup import dedup_exact

            extra = rd.from_arrow(
                pa.table({obj[1:]: pa.array([src], type=pa.string())})
            )
            res = dedup_exact(res.union(extra), cols=(obj[1:],), coalesce=True)
        return res

    if g.exists:
        if g.optionals or g.minuses or g.union or g.values or g.graph:
            raise SparqlSyntaxError(
                "FILTER EXISTS combines only with plain patterns + FILTER"
            )
        ex, pf_ex = [], []
        for eg, neg in g.exists:
            if (eg.optionals or eg.minuses or eg.union or eg.values
                    or eg.paths or eg.graph or eg.exists or eg.binds
                    or eg.subqueries or eg.star or eg.services):
                raise SparqlSyntaxError(
                    "EXISTS block must be a BGP (+ FILTER)"
                )
            if eg.pfcalls:
                pf_ex.append((eg, neg))
            else:
                ex.append((eg.patterns, eg.filters or None, neg))
        if not pf_ex:
            return bgp.bgp_exists(out_dir, g.patterns, ex, select,
                                  filters=g.filters or None, stats=stats,
                                  **kw)
        # EXISTS blocks holding ARQ property-function calls (list:member
        # etc. — PropertyFunctions list-8/9): evaluate each block ONCE as
        # its own solution table through the value-space pf executor,
        # then gate the outer solutions by a vectorized semi-/anti-join
        # on the correlated variables (E_Exists's inner execution with
        # the pf solutions precomputed; the pf solution table is
        # driver-sized like every value-pf evaluation here)
        import pyarrow.compute as pc

        gvars = _binding_vars(g)

        def _eg_vars(eg: Group) -> set[str]:
            out = {t[1:] for p in eg.patterns for t in p
                   if isinstance(t, str) and t.startswith("?")}
            for subj, _iri, args in eg.pfcalls:
                for t in (subj, *args):
                    if isinstance(t, str) and t.startswith("?"):
                        out.add(t[1:])
            return out

        shared_all: list[list[str]] = [
            sorted(_eg_vars(eg) & gvars) for eg, _neg in pf_ex
        ]
        sel2 = list(select) + sorted(
            {v for sh in shared_all for v in sh} - set(select)
        )
        kw2 = dict(kw)
        kw2["distinct"] = kw["distinct"] and sel2 == list(select)
        res = bgp.bgp_exists(out_dir, g.patterns, ex, sel2,
                             filters=g.filters or None, stats=stats, **kw2)
        for (eg, neg), shared in zip(pf_ex, shared_all):
            probe_sel = shared or sorted(_eg_vars(eg))[:1]
            E = _execute_pf_group(
                out_dir, eg, probe_sel, distinct=True,
                num_partitions=num_partitions, pf_context=pf_context,
                stats=stats,
            )
            if not shared:
                # uncorrelated: one probe decides the whole stream
                hit = len(E.limit(1).take(1)) > 0
                if hit == neg:
                    res = res.limit(0)
                continue
            keys: set[tuple] = set()
            for b in E.iter_batches(batch_format="pyarrow"):
                keys.update(zip(*[
                    pc.cast(b.column(v), pa.string()).to_pylist()
                    for v in shared
                ]))
            if any(None in t for t in keys):
                # EXISTS compatibility treats an unbound correlated
                # variable as a wildcard; the semi-join key can't express
                # that — raise rather than silently drop the match
                raise SparqlSyntaxError(
                    "unbound correlated variable in a property-function "
                    "EXISTS block is not in the supported subset"
                )
            # composite key: length-prefixed components ("3:abc2:xy") —
            # unambiguous for any literal content (a separator character
            # could collide with literals containing it)
            karr = pa.array(
                ["".join(f"{len(s)}:{s}" for s in t) for t in keys],
                type=pa.string(),
            )

            def gate(tb: pa.Table, _k=karr, _sv=tuple(shared),
                     _neg=neg) -> pa.Table:
                arrs = [pc.cast(tb.column(v), pa.string()) for v in _sv]
                if any(a.null_count for a in arrs):
                    raise SparqlSyntaxError(
                        "unbound correlated variable in the outer stream "
                        "of a property-function EXISTS gate is not in "
                        "the supported subset"
                    )
                encs = [
                    pc.binary_join_element_wise(
                        pc.cast(pc.utf8_length(a), pa.string()), a, ":"
                    )
                    for a in arrs
                ]
                key = (encs[0] if len(encs) == 1
                       else pc.binary_join_element_wise(*encs, ""))
                m = pc.fill_null(pc.is_in(key, value_set=_k), False)
                return tb.filter(pc.invert(m) if _neg else m)

            res = res.map_batches(gate, batch_format="pyarrow")
        if sel2 != list(select):
            def proj(tb: pa.Table, _s=tuple(select)) -> pa.Table:
                return tb.select(list(_s))

            res = res.map_batches(proj, batch_format="pyarrow")
            if kw["distinct"]:
                from jena_ray.stages.dedup import dedup_exact

                res = dedup_exact(res, cols=tuple(select), coalesce=True)
        return res

    if g.union is not None:
        if g.minuses or g.values:
            raise SparqlSyntaxError(
                "UNION combines only with triple patterns, FILTER and "
                "OPTIONAL in its group"
            )
        if g.filters and not (g.patterns or g.optionals):
            raise SparqlSyntaxError(
                "FILTER outside UNION branches is unsupported (put it inside)"
            )
        branches, branch_filters = [], []
        for b in g.union:
            if b.optionals or b.minuses or b.union or b.values or b.paths or b.graph:
                raise SparqlSyntaxError("UNION branches must be plain BGPs")
            branches.append(b.patterns)
            branch_filters.append(b.filters or None)
        if g.optionals:
            # LeftJoins over Join(BGP, Union) — the OPTIONALs attach to
            # the joined union base
            return bgp.bgp_optionals(
                out_dir, g.patterns, _opt_blocks(g), select,
                filters=g.filters or None, union_branches=branches,
                branch_filters=branch_filters, stats=stats, **kw)
        if g.patterns:
            # Join(BGP, Union): the union's branches each join the BGP
            return bgp.bgp_join_union(
                out_dir, g.patterns, branches, select,
                filters=g.filters or None, branch_filters=branch_filters,
                pf_context=pf_context, stats=stats, **kw)
        return bgp.bgp_union(out_dir, branches, select,
                             filters=branch_filters, pf_context=pf_context,
                             stats=stats, **kw)

    if g.minuses:
        if len(g.minuses) != 1 or g.optionals or g.values:
            raise SparqlSyntaxError("exactly one MINUS block is supported")
        m = g.minuses[0]
        if m.filters or m.optionals or m.minuses or m.union or m.paths:
            raise SparqlSyntaxError("MINUS block must be a plain BGP")
        return bgp.bgp_minus(out_dir, g.patterns, m.patterns, select,
                             filters=g.filters or None, stats=stats, **kw)

    if g.optionals:
        if g.values:
            raise SparqlSyntaxError("VALUES with OPTIONAL is unsupported")
        return bgp.bgp_optionals(out_dir, g.patterns, _opt_blocks(g),
                                 select, filters=g.filters or None,
                                 stats=stats, **kw)

    return bgp.bgp_execute(out_dir, g.patterns, select,
                           filters=g.filters or None, values=g.values,
                           pf_context=pf_context, stats=stats, **kw)


def _execute_subquery_group(out_dir: str, q: Query, select: list[str], *,
                            distinct: bool, num_partitions: int,
                            pf_context, stats):
    """``{ SELECT ... }`` inside a group (ElementSubQuery,
    sparql/syntax/ElementSubQuery.java:24): evaluate the nested query to
    its own solution table, then join it to the enclosing BGP at the TERM
    level — aggregate aliases are plain values, not terms, so the id-space
    chain can't carry them. Group FILTERs apply post-join (they may
    reference both sides, the aggregate-then-filter shape). The subquery
    result is aggregate-/projection-bounded, so materializing it for
    schema discovery stays in the object store and is small relative to
    the corpus; the join itself is the bucketed shuffle join."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.pipelines import bgp
    from jena_ray.stages.dedup import dedup_exact

    g = q.where
    if (len(g.subqueries) != 1 or g.union or g.optionals or g.minuses
            or g.graph or g.paths or g.exists or g.values):
        raise SparqlSyntaxError(
            "a subquery combines only with plain patterns + FILTER"
        )
    sub = g.subqueries[0]
    subvars = _sub_vars(sub)
    sub_res = sparql_query(sub.service_dir or out_dir, sub,
                           num_partitions=num_partitions,
                           pf_context=pf_context, stats=stats)
    if isinstance(sub_res, pa.Table):
        sub_res = rd.from_arrow(sub_res)
    sub_m = sub_res.materialize()
    sub_schema = sub_m.schema()
    sub_types = dict(zip(sub_schema.names, sub_schema.types))

    outer_vars = set()
    for p in g.patterns:
        outer_vars |= {t[1:] for t in p
                       if isinstance(t, str) and t.startswith("?")}

    if not g.patterns:
        res, res_vars = sub_m, set(subvars)
    else:
        shared = sorted(set(subvars) & outer_vars)
        if not shared:
            raise SparqlSyntaxError(
                "the subquery must share a variable with the group patterns"
            )
        # SPARQL compatibility-join treats an UNBOUND shared variable as
        # compatible with anything; binding_join is a strict equi join, so
        # a sub-solution with a null shared column would silently drop —
        # raise instead (module contract). sub_m is materialized and
        # bounded, so this scan is cheap.
        def _null_counts(tb: pa.Table, _sh=tuple(shared)) -> pa.Table:
            return pa.table({v: [tb.column(v).null_count] for v in _sh})

        nulls = sub_m.map_batches(_null_counts, batch_format="pyarrow").to_pandas()
        bad = [v for v in shared if nulls[v].sum() > 0]
        if bad:
            raise SparqlSyntaxError(
                f"subquery join on variable(s) {bad} with unbound "
                "solutions is not in the supported subset (compatibility "
                "join with unbound shared variables)"
            )
        need = (set(select) & outer_vars) | set(shared)
        for f in g.filters:
            need |= bgp._filter_vars(f) & outer_vars
        outer = bgp.bgp_execute(
            out_dir, g.patterns, sorted(need),
            num_partitions=num_partitions, distinct=False, stats=stats,
            pf_context=pf_context,
        )
        col_types = {c: pa.string() for c in need} | sub_types
        res = bgp.binding_join(
            outer, need, sub_m, set(subvars), shared,
            num_buckets=num_partitions, col_types=col_types,
        )
        res_vars = need | set(subvars)

    if g.filters:
        def lower(f: tuple, tb: pa.Table) -> tuple:
            # var-to-var comparisons against a joined aggregate alias
            # column (plain numeric, not a term) compare by VALUE — the
            # aggregate-then-filter shape this operator exists for
            def numeric(v):
                t = tb.column(v[1:]).type
                return pa.types.is_integer(t) or pa.types.is_floating(t)

            if (f[0] in ("<", "<=", ">", ">=", "=", "!=")
                    and isinstance(f[2], str) and f[2].startswith("?")
                    and (numeric(f[1]) or numeric(f[2]))):
                return ("cmp", f[0], f[1], f[2])
            if (f[0] == "termeq"
                    and f[2].startswith("?") and f[3].startswith("?")
                    and (numeric(f[2]) or numeric(f[3]))):
                # the parser's value-equality form, one side an alias
                return ("cmp", f[1], f[2], f[3])
            return f

        fs = tuple(g.filters)

        def fmask(tb: pa.Table, _fs=fs) -> pa.Table:
            m = None
            for f in _fs:
                mm = bgp._value_filter_mask(tb, lower(f, tb), lambda v: v)
                m = mm if m is None else pc.and_(m, mm)
            return tb.filter(pc.fill_null(m, False))

        res = res.map_batches(fmask, batch_format="pyarrow")

    missing = [v for v in select if v not in res_vars]
    if missing:
        raise SparqlSyntaxError(
            f"selected vars not bound by patterns or subquery: {missing}"
        )

    def proj(tb: pa.Table, _s=tuple(select)) -> pa.Table:
        return tb.select(list(_s))

    res = res.map_batches(proj, batch_format="pyarrow")
    if distinct:
        res = dedup_exact(res, cols=tuple(select), coalesce=True)
    return res


_XSD_NUM_DTS = ("integer|decimal|double|float|int|long|short|byte|"
                "negativeInteger|nonNegativeInteger|nonPositiveInteger|"
                "positiveInteger|unsignedLong|unsignedInt|unsignedShort|"
                "unsignedByte")


def _term_number(col):
    """Numeric VALUE of a term-string column — literals with a numeric XSD
    datatype and a well-formed lexical only. Plain/xsd:string literals like
    '"12"' are NOT numbers (NodeValue.classifyValueSpace puts them in
    VSPACE_STRING: they order by codepoint and error in arithmetic)."""
    import pyarrow.compute as pc

    num = pc.struct_field(
        pc.extract_regex(
            pc.cast(col, pa.string()),
            r'^"(?P<v>[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"'
            r"\^\^<http://www\.w3\.org/2001/XMLSchema#(?:" + _XSD_NUM_DTS
            + r")>$",
        ),
        "v",
    )
    return pc.cast(num, pa.float64())


# ------------------------------------------------------------- BIND exprs

def _group_is_empty(g: Group) -> bool:
    """True when the group pattern carries no solution-producing element
    (binds/filters aside) — the algebra unit table."""
    return not (g.patterns or g.paths or g.optionals or g.minuses
                or g.exists or g.union or g.values or g.graph
                or g.subqueries or g.star)


def _bind_vars(expr: tuple) -> set[str]:
    k = expr[0]
    if k == "var":
        return {expr[1]}
    if k in ("const", "numconst", "termconst"):
        return set()
    if k == "if":
        from jena_ray.pipelines.bgp import _filter_vars

        return (_filter_vars(expr[1]) | _bind_vars(expr[2])
                | _bind_vars(expr[3]))
    if k == "arith":
        return _bind_vars(expr[2]) | _bind_vars(expr[3])
    if k == "neg":
        return _bind_vars(expr[1])
    if k == "xcast":
        return _bind_vars(expr[2])
    if k == "funcall":
        return set().union(*(_bind_vars(a) for a in expr[2])) if expr[2] else set()
    return set().union(*(_bind_vars(a) for a in expr[1])) if expr[1] else set()


def _escape_lex(col):
    """Canonical N-Triples escaping for the common classes, vectorized
    (string_esc's \\ \" \\n \\r \\t \\f; other control chars are not
    produced by these string kernels)."""
    import pyarrow.compute as pc

    for pat, rep in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t"), ("\f", "\\f")):
        col = pc.replace_substring(col, pattern=pat, replacement=rep)
    return col


def _mk_plain(raw):
    import pyarrow.compute as pc

    return pc.binary_join_element_wise('"', _escape_lex(raw), '"', "")


def _eval_raw(tb: pa.Table, expr: tuple):
    """Effective string value of a BIND sub-expression (E_Str semantics for
    variables: IRIs drop <>, literals take the lexical form)."""
    import pyarrow.compute as pc

    from jena_ray.pipelines.bgp import _str_value

    k = expr[0]
    if k == "var":
        return _str_value(tb.column(expr[1]))
    if k == "const":
        return pa.array([expr[1]] * tb.num_rows, type=pa.string())
    if k in ("numconst", "arith", "neg", "if", "coalesce", "termconst",
             "subject", "predicate", "object", "triple"):
        return _str_value(_eval_bind(tb, expr))
    if k == "lang":
        from jena_ray.pipelines.bgp import _lang_value

        a = expr[1][0]
        if a[0] != "var":
            raise SparqlSyntaxError("LANG takes a variable")
        return _lang_value(tb.column(a[1]))
    if k == "strlen":
        return pc.cast(pc.utf8_length(_eval_raw(tb, expr[1][0])), pa.string())
    args = [_eval_raw(tb, a) for a in expr[1]]
    if k == "str":
        return args[0]
    if k == "ucase":
        return pc.utf8_upper(args[0])
    if k == "lcase":
        return pc.utf8_lower(args[0])
    if k == "concat":
        return pc.binary_join_element_wise(*args, "")
    if k in ("md5", "sha1", "sha256", "sha384", "sha512"):
        from jena_ray.functions.scalar import FUNCTIONS

        return FUNCTIONS[k](args[0])
    raise SparqlSyntaxError(f"{k.upper()} is not usable inside this expression")


def _datatype_term(col):
    """E_Datatype: typed literal → its datatype IRI, lang literal →
    rdf:langString, simple literal → xsd:string, IRI/bnode → null."""
    import pyarrow.compute as pc

    s = pc.cast(col, pa.string())
    dt = pc.struct_field(pc.extract_regex(s, r"\^\^<(?P<v>[^>]*)>$"), "v")
    lang = pc.struct_field(
        pc.extract_regex(s, r'"@(?P<v>[A-Za-z0-9\-]+)$'), "v"
    )
    is_lit = pc.starts_with(s, '"')
    fallback = pc.if_else(
        pc.is_valid(lang),
        pa.scalar(RDF_NS + "langString", type=pa.string()),
        pc.if_else(
            is_lit,
            pa.scalar(XSD + "string", type=pa.string()),
            pa.scalar(None, type=pa.string()),
        ),
    )
    full = pc.coalesce(dt, fallback)
    return pc.binary_join_element_wise("<", full, ">", "")


def _eval_bind_num(tb: pa.Table, expr: tuple):
    """Numeric float64 value of a BIND sub-expression (promotion per
    E_Add..E_Divide; non-numeric rows → null → unbound)."""
    import pyarrow.compute as pc

    from jena_ray.pipelines.bgp import _num_value

    k = expr[0]
    if k == "numconst":
        return pa.array([expr[1]] * tb.num_rows, type=pa.float64())
    if k == "var":
        # straight from the column: native numeric columns (aggregate
        # aliases) pass through _num_value without a lossy string hop
        return _num_value(tb.column(expr[1]))
    if k == "neg":
        return pc.negate(_eval_bind_num(tb, expr[1]))
    if k == "arith":
        a = _eval_bind_num(tb, expr[2])
        b = _eval_bind_num(tb, expr[3])
        if expr[1] == "/":
            # division by zero is a type error (unbound), not inf
            b = pc.if_else(pc.equal(b, 0.0), pa.scalar(None, pa.float64()), b)
        kern = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
                "/": pc.divide}[expr[1]]
        return kern(a, b)
    return _num_value(pc.cast(_eval_bind(tb, expr), pa.string()))


def _num_to_term(v):
    """Format a float64 column as canonical numeric literal terms: integral
    values → xsd:integer (exact, the common case); non-integral → xsd:double
    with Arrow's shortest-roundtrip lexical (engine-defined — the reference
    keeps decimal arithmetic in xsd:decimal)."""
    import pyarrow.compute as pc

    finite = pc.and_kleene(pc.is_valid(v), pc.is_finite(v))
    v = pc.if_else(pc.fill_null(finite, False), v,
                   pa.scalar(None, pa.float64()))
    integral = pc.fill_null(pc.equal(v, pc.round(v)), False)
    int_lex = pc.cast(
        pc.cast(pc.if_else(integral, v, 0.0), pa.int64()), pa.string()
    )
    dbl_lex = pc.cast(v, pa.string())
    term = pc.if_else(
        integral,
        pc.binary_join_element_wise('"', int_lex, f'"^^<{XSD}integer>', ""),
        pc.binary_join_element_wise('"', dbl_lex, f'"^^<{XSD}double>', ""),
    )
    return pc.if_else(pc.is_valid(v), term, pa.scalar(None, pa.string()))


#: value ranges of the XSD derived integer types (XSD 1.1 §3.4); None =
#: unbounded on that side. unsignedLong's bound exceeds float64 precision
#: but casts that large arrive via xsd:integer anyway.
_XSD_INT_RANGES: dict[str, tuple[int | None, int | None]] = {
    "long": (-(2 ** 63), 2 ** 63 - 1),
    "int": (-(2 ** 31), 2 ** 31 - 1),
    "short": (-32768, 32767),
    "byte": (-128, 127),
    "unsignedLong": (0, 2 ** 64 - 1),
    "unsignedInt": (0, 2 ** 32 - 1),
    "unsignedShort": (0, 65535),
    "unsignedByte": (0, 255),
    "nonNegativeInteger": (0, None),
    "positiveInteger": (1, None),
    "nonPositiveInteger": (None, 0),
    "negativeInteger": (None, -1),
}


def _xcast_col(col, target_iri: str):
    """XSD constructor cast producing TERM strings (XSDFuncOp cast
    dispatch / the XPath 17.5 casting table): rows outside the table are
    evaluation errors (null). Used by ('xcast', iri, expr) bind nodes —
    ORDER BY xsd:integer(?o), BIND(xsd:boolean(?v) AS ?b), …"""
    import pyarrow.compute as pc

    from jena_ray.pipelines.bgp import (_castable_mask, _num_value,
                                        _str_value)

    local = target_iri.rsplit("#", 1)[-1]
    # derived integer types (XSD 1.1 §3.4 hierarchy): cast like
    # xsd:integer, then range-check the value and keep the derived
    # datatype IRI (XSDFuncOp casts via the primitive, XSDDatatype
    # validates the derived range)
    lo, hi = _XSD_INT_RANGES.get(local, (None, None))
    derived = lo is not None or hi is not None
    if not derived and local not in ("string", "boolean", "integer",
                                     "decimal", "float", "double",
                                     "dateTime"):
        return pa.nulls(len(col), type=pa.string())
    ok = pc.fill_null(
        _castable_mask("integer" if derived else local, col), False)
    sv = _str_value(col)
    if local == "string":
        out = pc.binary_join_element_wise(
            '"', _escape_lex(sv), f'"^^<{XSD}string>', "")
    elif local == "dateTime":
        out = pc.binary_join_element_wise(
            '"', sv, f'"^^<{XSD}dateTime>', "")
    elif local == "boolean":
        num = _num_value(col)
        truth = pc.if_else(
            pc.is_valid(num),
            pc.and_(pc.not_equal(num, 0.0), pc.equal(num, num)),
            pc.is_in(sv, value_set=pa.array(["true", "1"])),
        )
        out = pc.if_else(
            truth,
            pa.scalar(f'"true"^^<{XSD}boolean>', pa.string()),
            pa.scalar(f'"false"^^<{XSD}boolean>', pa.string()),
        )
    else:  # numeric targets
        num = _num_value(col)
        # boolean sources: true→1, false→0
        b_t = pc.fill_null(pc.equal(sv, "true"), False)
        b_f = pc.fill_null(pc.equal(sv, "false"), False)
        num = pc.coalesce(
            num,
            pc.if_else(b_t, 1.0,
                       pc.if_else(b_f, 0.0, pa.scalar(None, pa.float64()))),
        )
        # string-lexical sources pass _castable_mask's per-target regex —
        # mask first so the cast below never sees a non-numeric string
        lexnum = pc.if_else(pc.and_(ok, pc.is_null(num)), sv,
                            pa.scalar(None, pa.string()))
        num = pc.coalesce(num, pc.cast(lexnum, pa.float64(), safe=False))
        if local == "integer" or derived:
            num = pc.trunc(num)
            lex = pc.cast(pc.cast(pc.fill_null(num, 0.0), pa.int64()),
                          pa.string())
            if lo is not None:
                ok = pc.and_(ok, pc.fill_null(
                    pc.greater_equal(num, float(lo)), False))
            if hi is not None:
                ok = pc.and_(ok, pc.fill_null(
                    pc.less_equal(num, float(hi)), False))
        else:
            lex = pc.cast(num, pa.string())
        out = pc.if_else(
            pc.is_valid(num),
            pc.binary_join_element_wise(
                '"', lex, f'"^^<{XSD}{local}>', ""),
            pa.scalar(None, pa.string()),
        )
    return pc.if_else(ok, out, pa.scalar(None, pa.string()))


def _eval_bind(tb: pa.Table, expr: tuple):
    """Evaluate a BIND expression to a column of canonical TERM strings."""
    import pyarrow.compute as pc

    from jena_ray.pipelines.bgp import _lang_value, _value_filter_mask

    k = expr[0]
    if k in ("numconst", "arith", "neg"):
        return _num_to_term(_eval_bind_num(tb, expr))
    if k == "if":
        mask = pc.fill_null(
            _value_filter_mask(tb, expr[1], lambda v: v), False
        )
        return pc.if_else(mask, _eval_bind(tb, expr[2]),
                          _eval_bind(tb, expr[3]))
    if k == "coalesce":
        return pc.coalesce(*[_eval_bind(tb, a) for a in expr[1]])
    if k == "termconst":
        return pa.array([expr[1]] * tb.num_rows, type=pa.string())
    if k == "funcall":
        # E_Function resolved against the URI registry
        # (FunctionRegistry.java:32 analog). Unknown IRIs evaluate every
        # row to an error (null → unbound / filter drop) — the observable
        # semantics of ARQ's Function suite (func-01/02 expect empty sets)
        from jena_ray.functions.scalar import URI_FUNCTIONS

        fn = URI_FUNCTIONS.get(expr[1])
        if fn is None:
            return pa.nulls(tb.num_rows, type=pa.string())
        args = [pc.cast(_eval_bind(tb, a), pa.string()) for a in expr[2]]
        try:
            return pc.cast(fn(*args), pa.string())
        except TypeError:  # arity mismatch → per-row eval error
            return pa.nulls(tb.num_rows, type=pa.string())
    if k == "xcast":
        return _xcast_col(pc.cast(_eval_bind(tb, expr[2]), pa.string()),
                          expr[1])
    if k == "var":
        return pc.cast(tb.column(expr[1]), pa.string())
    if k == "strlen":
        raw = _eval_raw(tb, expr[1][0])
        n = pc.cast(pc.utf8_length(raw), pa.string())
        return pc.binary_join_element_wise('"', n, f'"^^<{XSD}integer>', "")
    if k == "lang":
        return _mk_plain(_lang_value(_eval_bind(tb, expr[1][0])))
    if k == "datatype":
        return _datatype_term(_eval_bind(tb, expr[1][0]))
    if k in ("subject", "predicate", "object"):
        # E_TripleSubject/Predicate/Object: component of a quoted-triple
        # term; non-triple rows are an eval error → unbound (null). The
        # recursive canonical parse is per distinct VALUE, not vectorizable
        # (nesting); quoted-triple columns are rare and small
        from jena_ray.term import TermError, quoted_triple_parts

        idx = ("subject", "predicate", "object").index(k)
        col = _eval_bind(tb, expr[1][0])
        cache: dict[str, str | None] = {}
        out = []
        for v in pc.cast(col, pa.string()).to_pylist():
            if v is None or not v.startswith("<<"):
                out.append(None)
                continue
            if v not in cache:
                try:
                    cache[v] = quoted_triple_parts(v)[idx]
                except TermError:
                    cache[v] = None
            out.append(cache[v])
        return pa.array(out, type=pa.string())
    if k == "triple":
        # E_TripleFn: TRIPLE(s, p, o) → quoted-triple term. Rows whose
        # subject is a literal / predicate is not an IRI error → null
        s_c = pc.cast(_eval_bind(tb, expr[1][0]), pa.string())
        p_c = pc.cast(_eval_bind(tb, expr[1][1]), pa.string())
        o_c = pc.cast(_eval_bind(tb, expr[1][2]), pa.string())
        built = pc.binary_join_element_wise("<<", s_c, p_c, o_c, ">>", " ")
        ok = pc.and_(
            pc.invert(pc.starts_with(s_c, '"')),
            pc.and_(
                pc.starts_with(p_c, "<"),
                pc.invert(pc.starts_with(p_c, "<<")),
            ),
        )
        return pc.if_else(pc.fill_null(ok, False), built,
                          pa.scalar(None, type=pa.string()))
    return _mk_plain(_eval_raw(tb, expr))


def _aggregate(sols, q: Query, *, num_buckets: int = 16):
    """GROUP BY + aggregates over the solution Dataset (OpGroup +
    aggregate/Agg*.java accumulators). One bucketed shuffle, then a
    vectorized pandas groupby per bucket (bucketed_group_apply — one Python
    call per bucket, not per key)."""
    import pandas as pd

    from jena_ray.stages.dedup import bucketed_group_apply

    keys = list(q.group_by) + [alias for _e, alias, _n in q.group_exprs]
    aggs = list(q.aggs)
    ungrouped = not keys
    if ungrouped:
        # no GROUP BY → ONE implicit group (OpGroup with an empty key list):
        # aggregate under a constant key, drop it afterwards. The single
        # group lands on one worker — fine for the tiny post-projection
        # solution sets aggregates see; a crawl-scale global COUNT belongs
        # to Dataset.count()/pre_aggregated_count, not the query layer.
        keys = ["__g0"]

        def add_g(tb: pa.Table) -> pa.Table:
            return tb.append_column(
                "__g0", pa.array([0] * tb.num_rows, type=pa.int8())
            )

        sols = sols.map_batches(add_g, batch_format="pyarrow")
    num_vars = sorted({a.var for a in aggs
                       if a.var and a.func in ("sum", "avg", "min", "max",
                                               "median")})

    def add_nums(tb: pa.Table, _nv=tuple(num_vars)) -> pa.Table:
        for v in _nv:
            tb = tb.append_column(f"__num_{v}", _term_number(tb.column(v)))
        return tb

    if num_vars:
        sols = sols.map_batches(add_nums, batch_format="pyarrow")

    int_sums = {a.alias: a.var for a in aggs if a.func == "sum"}

    def per_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(keys, sort=False, dropna=False)
        if not aggs:
            # GROUP BY with no aggregates: one row per distinct key tuple
            return g.size().reset_index()[keys]
        out: dict[str, object] = {}
        for a in aggs:
            if a.func == "count":
                if a.var is None and a.distinct:
                    # COUNT(DISTINCT *): distinct whole solution rows per
                    # group (AggCountDistinct); __num_* helper columns are
                    # functions of their vars so excluding them suffices
                    scols = [c for c in df.columns
                             if not c.startswith("__num_")]
                    s = g.apply(
                        lambda x, _c=scols: x[_c].drop_duplicates().shape[0]
                    )
                elif a.var is None:
                    s = g.size()
                elif a.distinct:
                    s = g[a.var].nunique()
                else:
                    s = g[a.var].count()
            elif a.func in ("min", "max") and df[f"__num_{a.var}"].isna().all():
                # non-numeric variable (strings/dates/IRIs): fall back to
                # lexicographic term min/max (the reference's MIN/MAX order
                # terms by NodeValue; codepoint order on the canonical term
                # string approximates it for same-kind terms — documented)
                s = g[a.var].min() if a.func == "min" else g[a.var].max()
            elif a.func in ("sum", "avg", "min", "max", "median"):
                col = g[f"__num_{a.var}"]
                s = {"sum": col.sum, "avg": col.mean, "min": col.min,
                     "max": col.max, "median": col.median}[a.func]()
            elif a.func == "sample":
                s = g[a.var].first()
            elif a.func == "mode":
                # most frequent term; ties break to the smallest (AggMode)
                s = g[a.var].agg(
                    lambda x: x.mode().sort_values().iloc[0] if len(x) else None
                )
            else:  # group_concat
                col = g[a.var]
                if a.distinct:
                    s = col.agg(lambda x, _s=a.sep: _s.join(sorted(set(x.dropna()))))
                else:
                    s = col.agg(lambda x, _s=a.sep: _s.join(sorted(x.dropna())))
            out[a.alias] = s
        res = pd.DataFrame(out).reset_index()
        return res

    out = bucketed_group_apply(
        sols, keys, per_bucket, num_buckets=num_buckets, coalesce=True
    )

    if int_sums:
        # SUM over xsd:integer terms → int64 output (matches SQL BIGINT sums)
        def cast_sums(tb: pa.Table, _is=tuple(int_sums.items())) -> pa.Table:
            import pyarrow.compute as pc

            for alias, _var in _is:
                idx = tb.schema.get_field_index(alias)
                if idx >= 0 and pa.types.is_floating(tb.column(idx).type):
                    tb = tb.set_column(
                        idx, alias,
                        pc.cast(pc.round(tb.column(idx)), pa.int64()),
                    )
            return tb

        out = out.map_batches(cast_sums, batch_format="pyarrow")
    if ungrouped:
        def drop_g(tb: pa.Table) -> pa.Table:
            return tb.drop_columns(["__g0"])

        out = out.map_batches(drop_g, batch_format="pyarrow").materialize()
        if out.count() == 0:
            # aggregate over ZERO solutions still yields ONE row
            # (SetAlgebra/AggregatorBase: Count/Sum → 0, GroupConcat → "",
            # Min/Max/Avg/Median/Mode/Sample error → unbound)
            import ray.data as rd

            cols: dict[str, pa.Array] = {}
            for a in aggs:
                if a.func == "count":
                    cols[a.alias] = pa.array([0], type=pa.int64())
                elif a.func == "sum":
                    cols[a.alias] = pa.array([0], type=pa.int64())
                elif a.func == "group_concat":
                    cols[a.alias] = pa.array([""], type=pa.string())
                elif a.func in ("avg", "min", "max", "median"):
                    cols[a.alias] = pa.array([None], type=pa.float64())
                else:
                    cols[a.alias] = pa.array([None], type=pa.string())
            out = rd.from_arrow(pa.table(cols))
    return out


def _describe(out_dir: str, q: Query, *, num_partitions: int, pf_context, stats):
    """DESCRIBE — Jena's default handler describes each resource as its
    forward one-hop triples plus the blank-node closure of their objects
    (jena-arq sparql/core/describe/DescribeBNodeClosure.java). Each hop is
    one vectorized ``is_in`` probe of the SPO scan; matched rows are
    closure-sized, so they collect driver-side like path_closure."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.pipelines.bgp import _scan_pattern
    from jena_ray.stages.materialize import (
        read_layout,
        resolve_id_columns,
        term_id,
    )

    roots: set[int] = set()
    for d in q.describe:
        if not d.startswith("?"):
            roots.add(term_id(d))
    dvars = [d[1:] for d in q.describe if d.startswith("?")]
    if dvars:
        sols = _execute_where(out_dir, q, dvars, distinct=True,
                              num_partitions=num_partitions,
                              pf_context=pf_context, stats=stats)
        if q.limit is not None:
            sols = sols.limit(q.limit)
        for b in sols.iter_batches(batch_format="pyarrow"):
            for v in dvars:
                roots.update(
                    term_id(t) for t in b.column(v).to_pylist() if t is not None
                )

    info = read_layout(out_dir)
    scan = _scan_pattern(out_dir, ("?s", "?p", "?o"), info)
    if os.path.isdir(os.path.join(out_dir, "gspo")):
        # DescribeBNodeClosure.java:53-70 describes the resource in the
        # default model AND every named model — union the named-graph quads
        # (projected to s/p/o; the quad store shares the NodeTable)
        from jena_ray.stages.quads import quad_pattern_scan

        def drop_g(tb: pa.Table) -> pa.Table:
            return pa.table({"s": tb.column("s_id"), "p": tb.column("p_id"),
                             "o": tb.column("o_id")})

        scan = scan.union(
            quad_pattern_scan(out_dir, resolve_terms=False)
            .map_batches(drop_g, batch_format="pyarrow")
        )

    rows: list[pa.Table] = []
    described: set[bytes] = set()
    frontier = roots
    for _ in range(25):  # bnode chains are shallow; bounded like PathEngine
        frontier -= described
        if not frontier:
            break
        from jena_ray.stages.materialize import ID_TYPE

        probe = pa.array(sorted(frontier), type=ID_TYPE)

        def hop(tb: pa.Table, _p=probe) -> pa.Table:
            return tb.filter(pc.is_in(tb.column("s"), value_set=_p))

        matched = pa.concat_tables(
            list(scan.map_batches(hop, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
            or [pa.table({"s": pa.array([], ID_TYPE),
                          "p": pa.array([], ID_TYPE),
                          "o": pa.array([], ID_TYPE)})]
        )
        rows.append(matched)
        described |= frontier
        # blank-node objects extend the description (resolve just the
        # object ids of this hop to spot bnode terms)
        obj_ids = rd.from_arrow(
            pa.table({"o": pc.unique(matched.column("o"))})
        )
        objs = resolve_id_columns(obj_ids, out_dir, {"o": "t"})
        frontier = set()
        for b in objs.iter_batches(batch_format="pyarrow"):
            frontier.update(
                term_id(t) for t in b.column("t").to_pylist()
                if t is not None and t.startswith("_:")
            )

    if not rows:
        empty = pa.array([], type=pa.string())
        return pa.table({"subj": empty, "pred": empty, "obj": empty})
    allrows = pa.concat_tables(rows).rename_columns(["s_id", "p_id", "o_id"])
    # the description is a GRAPH (set of triples): a triple present in
    # several graphs of the dataset must appear once
    allrows = allrows.group_by(["s_id", "p_id", "o_id"]).aggregate([])
    ds = rd.from_arrow(allrows)
    return resolve_id_columns(
        ds, out_dir, {"s_id": "subj", "p_id": "pred", "o_id": "obj"}
    )


def _value_order(res, order_by: list[tuple[str, bool]],
                 order_exprs: list[tuple[str, tuple]] = ()):
    """ORDER BY with ARQ's comparator (NodeValue.compareAlways → value
    compare, falling to NodeUtils.compareRDFTerms syntactic order): unbound
    < blank nodes (label) < IRIs (codepoint) < literals. Literals: typed
    numerics / temporals by VALUE first, then lexical form, then class
    (simple < lang-tagged < other-typed — compareLiteralsBySyntax), then
    lang tag case-insensitively / datatype IRI, then lang tag exactly.
    Each order variable expands to six key columns sorted together then
    dropped. Known divergence (documented, inherent to key-based sorting):
    Jena compares two lang-tagged literals by TAG before lexical
    (VSPACE_LANG) — a pair where tag order and lexical order conflict
    ("b"@en vs "a"@fr) sorts lexically here; Jena's pairwise comparator is
    not transitive across value spaces, so no key order can match it
    everywhere."""
    import pyarrow.compute as pc

    from jena_ray.pipelines.bgp import _str_value

    n_keys = len(order_by)
    _RE_LANG = r'^"(?:[^"\\]|\\.)*"@(?P<v>[A-Za-z0-9-]+)$'
    _RE_DT = r'^"(?:[^"\\]|\\.)*"\^\^<(?P<v>[^>]*)>$'

    def add_keys(tb: pa.Table, _ov=tuple(order_by),
                 _oe=tuple(order_exprs)) -> pa.Table:
        # expression conditions (ORDER BY str(?o) / (?a+?b) / DESC(expr)):
        # compute the internal key column per batch, sort on it like a
        # variable, drop it with the other key columns below
        for alias, expr in _oe:
            tb = tb.append_column(alias, _eval_bind(tb, expr))
        for i, (v, _d) in enumerate(_ov):
            col = tb.column(v)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                s = pc.cast(col, pa.string())
                rank = pc.if_else(
                    pc.is_null(s),
                    pa.scalar(0, type=pa.int8()),
                    pc.if_else(
                        pc.starts_with(s, "_:"),
                        pa.scalar(1, type=pa.int8()),
                        pc.if_else(pc.starts_with(s, "<"),
                                   pa.scalar(2, type=pa.int8()),
                                   pa.scalar(3, type=pa.int8())),
                    ),
                )
                from jena_ray.pipelines.bgp import _dt_value

                # numeric literals order by numeric value; dateTime/date
                # literals by temporal value (epoch ns — disjoint from the
                # numeric range in practice, and same-kind ordering is all
                # SPARQL defines)
                num = pc.coalesce(
                    _term_number(s),
                    pc.cast(_dt_value(s), pa.float64(), safe=False),
                )
                sv = _str_value(s)
                lang = pc.struct_field(pc.extract_regex(s, _RE_LANG), "v")
                dt = pc.struct_field(pc.extract_regex(s, _RE_DT), "v")
                cls = pc.if_else(
                    pc.is_valid(lang),
                    pa.scalar(1, type=pa.int8()),
                    pc.if_else(pc.is_valid(dt),
                               pa.scalar(2, type=pa.int8()),
                               pa.scalar(0, type=pa.int8())),
                )
                dv = pc.coalesce(pc.utf8_lower(lang), dt)
                ev = lang
            else:  # aggregate alias columns are plain values already
                rank = pa.array([3] * tb.num_rows, type=pa.int8())
                num = pc.cast(col, pa.float64())
                sv = pc.cast(col, pa.string())
                cls = pa.nulls(tb.num_rows, type=pa.int8())
                dv = ev = None
            # sort keys must be null-free: Ray's range-partitioned sort
            # duplicates boundary rows when a key column is all-null
            tb = tb.append_column(f"__o{i}r", rank)
            tb = tb.append_column(f"__o{i}n", pc.fill_null(num, float("inf")))
            tb = tb.append_column(f"__o{i}s", pc.fill_null(sv, ""))
            tb = tb.append_column(
                f"__o{i}c", pc.fill_null(cls, 0).cast(pa.int8())
            )
            for suf, c in (("d", dv), ("e", ev)):
                c = (pa.nulls(tb.num_rows, type=pa.string())
                     if c is None else c)
                tb = tb.append_column(f"__o{i}{suf}", pc.fill_null(c, ""))
        return tb

    keys, descs = [], []
    for i, (_v, d) in enumerate(order_by):
        keys += [f"__o{i}{c}" for c in "rnscde"]
        descs += [d] * 6
    out = res.map_batches(add_keys, batch_format="pyarrow").sort(
        keys, descending=descs
    )
    drop = [f"__o{i}{c}" for i in range(n_keys) for c in "rnscde"]
    drop += [alias for alias, _e in order_exprs]

    def strip(tb: pa.Table, _d=tuple(drop)) -> pa.Table:
        return tb.drop_columns(list(_d))

    return out.map_batches(strip, batch_format="pyarrow")


def explain(query: str | Query, *, stats: dict | None = None) -> str:
    """Render the query plan as an SSE-style op tree (ARQ's
    ``arq --explain`` / Algebra.compile printout; the fork's
    jena-neo-optimizer tdbqueryplan.java:150 dumps the same shape to train
    its learned reorderer). BGP patterns are shown in the join order the
    executor will use — stats-greedy when a stats side-car is supplied,
    else most-bound-first (ReorderFixed)."""
    from jena_ray.pipelines.bgp import REORDER_STRATEGIES

    q = parse_query(query) if isinstance(query, str) else query
    reorder = REORDER_STRATEGIES["stats" if stats else "fixed"]

    def bgp_lines(patterns, indent):
        pats = reorder(list(patterns), stats) if patterns else []
        pad = " " * indent
        out = [f"{pad}(bgp"]
        for p in pats:
            out.append(f"{pad}  (triple {' '.join(p)})")
        out.append(f"{pad})")
        return out

    def group_lines(g: Group, indent) -> list[str]:
        pad = " " * indent
        if g.paths:
            s, p, o, mod, inv = g.paths[0]
            if isinstance(mod, tuple):
                op = f"path{{{mod[1]},{mod[2]}}}"
            else:
                op = {"+": "path+", "*": "path*", "?": "path?"}[mod]
            inner = [f"{pad}({op}{' ^' if inv else ''} {s} {p} {o})"]
        elif g.union is not None:
            inner = [f"{pad}(union"]
            for b in g.union:
                inner += group_lines(b, indent + 2)
            inner.append(f"{pad})")
        else:
            inner = bgp_lines(g.patterns, indent)
        if g.graph is not None:
            inner = [f"{pad}(graph {g.graph}"] + \
                ["  " + ln for ln in inner] + [f"{pad})"]
        if g.values:
            inner = [f"{pad}(join (table {len(g.values)} rows)"] + \
                ["  " + ln for ln in inner] + [f"{pad})"]
        if g.optionals:
            inner = [f"{pad}(leftjoin"] + ["  " + ln for ln in inner]
            for o in g.optionals:
                inner += ["  " + ln for ln in group_lines(o, indent)]
            inner.append(f"{pad})")
        for m in g.minuses:
            inner = [f"{pad}(minus"] + ["  " + ln for ln in inner] + \
                ["  " + ln for ln in group_lines(m, indent)] + [f"{pad})"]
        for eg, neg in g.exists:
            op = "notexists" if neg else "exists"
            inner = [f"{pad}(filter-{op}"] + ["  " + ln for ln in inner] + \
                ["  " + ln for ln in group_lines(eg, indent)] + [f"{pad})"]
        for f in g.filters:
            args = " ".join(str(a) for a in f[1:])
            inner = [f"{pad}(filter ({f[0]} {args})"] + \
                ["  " + ln for ln in inner] + [f"{pad})"]
        for expr, v in g.binds:
            inner = [f"{pad}(extend (?{v} {expr})"] + \
                ["  " + ln for ln in inner] + [f"{pad})"]
        return inner

    lines = group_lines(q.where, 0) if q.where else ["(table empty)"]
    if q.aggs or q.group_by:
        aggs = " ".join(
            f"(?{a.alias} ({a.func}{' distinct' if a.distinct else ''} "
            f"{'?' + a.var if a.var else '*'}))" for a in q.aggs
        )
        gb = " ".join("?" + v for v in q.group_by)
        lines = [f"(group ({gb}) ({aggs})"] + \
            ["  " + ln for ln in lines] + [")"]
        for h in q.having:
            cond = (f"({h[1]} {h[2]} {h[3]})" if h[0] == "hx"
                    else f"({h[0]} ?{h[1]} {h[2]})")
            lines = [f"(filter {cond}"] + \
                ["  " + ln for ln in lines] + [")"]
    if q.form == "select":
        sel = "*" if q.star else " ".join(
            "?" + v for v in (q.select + [a.alias for a in q.aggs])
        )
        lines = [f"(project ({sel})"] + ["  " + ln for ln in lines] + [")"]
        if q.distinct:
            lines = ["(distinct"] + ["  " + ln for ln in lines] + [")"]
        if q.reduced:
            lines = ["(reduced"] + ["  " + ln for ln in lines] + [")"]
    elif q.form == "construct":
        tmpl = " ".join(f"(triple {' '.join(t)})" for t in q.template or [])
        lines = [f"(construct ({tmpl})"] + ["  " + ln for ln in lines] + [")"]
    elif q.form == "ask":
        lines = ["(ask"] + ["  " + ln for ln in lines] + [")"]
    elif q.form == "describe":
        lines = [f"(describe ({' '.join(q.describe)})"] + \
            ["  " + ln for ln in lines] + [")"]
    if q.order_by:
        conds = " ".join(
            f"({'desc' if d else 'asc'} ?{v})" for v, d in q.order_by
        )
        lines = [f"(order ({conds})"] + ["  " + ln for ln in lines] + [")"]
    if q.limit is not None or q.offset:
        lines = [f"(slice {q.offset} {q.limit if q.limit is not None else '_'}"] \
            + ["  " + ln for ln in lines] + [")"]
    return "\n".join(lines) + "\n"


def _replace_order(q: Query) -> Query:
    """Copy of the query with ORDER BY cleared (already applied upstream)."""
    import copy

    q2 = copy.copy(q)
    q2.order_by = []
    q2.order_exprs = []
    return q2


_DYN_DATASET_CACHE: dict[tuple, str] = {}


def _load_document(iri: str) -> list[tuple[str, str, str]]:
    """Load one RDF document by IRI for FROM / FROM NAMED (file:// only in
    this sandbox — the reference's DatasetDescription fetch), dispatching
    on extension through the same in-process parsers the riot CLI uses."""
    import os

    path = iri[len("file://"):] if iri.startswith("file://") else iri
    if not os.path.exists(path):
        raise SparqlSyntaxError(f"FROM document not found: {iri}")
    text = open(path).read()
    base = f"file://{path}"
    if path.endswith((".ttl", ".turtle")):
        from jena_ray.turtle import parse_turtle

        return parse_turtle(text, base=base)
    if path.endswith(".nt"):
        from jena_ray.term import parse_ntriples

        return parse_ntriples(text, base=base)
    if path.endswith((".rdf", ".xml", ".owl")):
        from jena_ray.rdfxml import parse_rdfxml

        return parse_rdfxml(text, base=base)
    raise SparqlSyntaxError(f"unsupported FROM document syntax: {iri}")


def _scope_bnodes(rows, scope: str):
    """Per-document blank-node label isolation (LabelToNode-per-run): _:x
    loaded from two FROM documents must be two nodes."""
    return [
        tuple(f"_:{scope}{t[2:]}" if t.startswith("_:") else t for t in r)
        for r in rows
    ]


def _dynamic_dataset(q: Query) -> str:
    """Materialize the FROM / FROM NAMED dataset description into an
    ephemeral RDF-dataset store (default graph = merge of FROM documents,
    one named graph per FROM NAMED document) — ARQ's DynamicDatasets +
    DatasetUtils.createDataset. Dynamic datasets are query-scoped document
    loads by definition; corpus-scale data belongs in a pre-materialized
    store, not a FROM clause."""
    import os
    import tempfile

    import ray.data as rd

    from jena_ray.stages.quads import materialize_rdf_dataset

    key = (tuple(q.from_graphs), tuple(q.from_named))
    hit = _DYN_DATASET_CACHE.get(key)
    if hit and os.path.isdir(os.path.join(hit, "terms")):
        return hit

    triples: list[tuple] = []
    for i, iri in enumerate(q.from_graphs):
        triples.extend(_scope_bnodes(_load_document(iri), f"d{i}b"))
    quads: list[tuple] = []
    for i, iri in enumerate(q.from_named):
        g = fmt_iri(iri)
        quads.extend(
            (g, s, p, o)
            for s, p, o in _scope_bnodes(_load_document(iri), f"n{i}b")
        )
    out = tempfile.mkdtemp(prefix="jena_ray_dynds_")
    tt = pa.table({
        "subj": pa.array([r[0] for r in triples], type=pa.string()),
        "pred": pa.array([r[1] for r in triples], type=pa.string()),
        "obj": pa.array([r[2] for r in triples], type=pa.string()),
    })
    qt = pa.table({
        "graph": pa.array([r[0] for r in quads], type=pa.string()),
        "subj": pa.array([r[1] for r in quads], type=pa.string()),
        "pred": pa.array([r[2] for r in quads], type=pa.string()),
        "obj": pa.array([r[3] for r in quads], type=pa.string()),
    })
    materialize_rdf_dataset(
        out, rd.from_arrow(tt), rd.from_arrow(qt),
        num_buckets=2, min_rows_per_file=100_000,
    )
    _DYN_DATASET_CACHE[key] = out
    return out


def _group_has_solution(out_dir: str, g: "Group",
                        *, num_partitions: int = 16) -> bool:
    """Uncorrelated EXISTS probe (ElementExists over the unit solution —
    ARQ Negation-01..06): does this plain-BGP group match the store at
    all? Ground patterns use the existence probe; otherwise one BGP
    execution limited to the first solution."""
    from jena_ray.pipelines import bgp
    from jena_ray.pipelines.bgp import is_var

    if (g.union or g.optionals or g.minuses or g.paths or g.graph
            or g.exists or g.binds or g.values or g.subqueries or g.star
            or g.filters):
        raise SparqlSyntaxError("EXISTS group must be a plain BGP")
    gvars = sorted({t[1:] for p in g.patterns for t in p if is_var(t)})
    if not gvars:
        return all(
            ground_pattern_holds(out_dir, p, num_partitions=num_partitions)
            for p in g.patterns
        )
    res = bgp.bgp_execute(out_dir, g.patterns, gvars[:1],
                          num_partitions=num_partitions, stats=False)
    return len(res.limit(1).take(1)) > 0


def ground_pattern_holds(out_dir: str, pattern: tuple,
                         *, num_partitions: int = 16) -> bool:
    """Existence probe for one fully-ground triple pattern (the ground-BGP
    leg of ASK / update-WHERE): open the subject slot as a variable and
    constrain it back with a sameTerm id filter — one bucket-pruned index
    scan, no join."""
    from jena_ray.pipelines import bgp

    s, p, o = pattern
    res = bgp.bgp_execute(
        out_dir, [("?__g0", p, o)], ["__g0"],
        filters=[("=", "?__g0", s)],
        num_partitions=num_partitions, stats=False,
    )
    return len(res.limit(1).take(1)) > 0


def reject_services(g: "Group | None") -> None:
    """SERVICE parses (grammar completeness) but cannot execute without an
    endpoint mapping — a batch engine has no HTTP federation; raise rather
    than silently drop."""
    if g is None:
        return
    if g.services:
        raise SparqlSyntaxError(
            "SERVICE execution needs an endpoint mapping "
            "(pf_context['service_endpoints']: IRI → store dir); a batch "
            "engine has no HTTP federation endpoint"
        )
    for sub in (list(g.optionals) + list(g.minuses) + list(g.union or [])
                + [e for e, _ in g.exists]):
        reject_services(sub)
    for sq in g.subqueries:
        reject_services(sq.where)


def _lower_services(g: "Group | None", pf_context: dict | None) -> None:
    """Minimal SERVICE execution (Service.java solution semantics with an
    INJECTABLE endpoint resolver — real HTTP federation is out of a batch
    engine's scope): each ``SERVICE <iri> { P }`` at the top level of the
    WHERE group becomes an implicit subquery unit evaluated against the
    MAPPED second store (``pf_context["service_endpoints"]``: endpoint
    IRI → materialized index dir), joined to the enclosing group on the
    shared variables — exactly the remote-evaluate-then-join shape of
    QueryIterService. ``SERVICE SILENT`` with an unmapped endpoint
    degrades to the unit solution (Service.java's silent failure);
    non-silent unmapped endpoints raise. Variable endpoints and SERVICE
    inside OPTIONAL/MINUS/UNION/EXISTS raise (reject_services)."""
    if g is None:
        return
    eps = (pf_context or {}).get("service_endpoints") or {}
    services, g.services = list(g.services), []
    for ep, sg, silent in services:
        if ep.startswith("?"):
            raise SparqlSyntaxError(
                "variable SERVICE endpoints are not in the supported "
                "subset (the endpoint set is not enumerable in a batch "
                "engine)"
            )
        target = eps.get(ep) or eps.get(ep.strip("<>"))
        if target is None:
            if silent:
                continue  # unit solution: the join identity
            g.services = services
            reject_services(g)
        reject_services(sg)
        sub = Query(form="select", select=sorted(_scope_vars(sg)),
                    where=sg, service_dir=target)
        g.subqueries.append(sub)
    for sub_g in (list(g.optionals) + list(g.minuses)
                  + list(g.union or []) + [e for e, _ in g.exists]):
        reject_services(sub_g)
    for sq in g.subqueries:
        if sq.service_dir is None:
            reject_services(sq.where)


def _hoist_optional_binds(q: Query) -> None:
    """Rewrite ``OPTIONAL { P BIND(e AS v) }`` to the guarded post-join
    extend ``BIND(IF(bound(?marker), e, <null>) AS v)`` on the enclosing
    group — equivalent to ARQ's LeftJoin(outer, Extend(P, v, e)) because a
    BGP solution of P binds every P variable, so any P-only variable
    marks "P matched" (ARQ Assign assign-02/03 pin the semantics).
    Raises when no P-only marker variable exists (the rewrite could not
    distinguish matched from unmatched rows)."""
    from jena_ray.pipelines.bgp import _bind_expr_vars

    g = q.where
    if g is None:
        return
    outer = _group_vars(g)
    for o in g.optionals:
        if not o.binds:
            continue
        # the hoisted expression evaluates post-join, where it would see
        # enclosing-group bindings; ARQ's Extend(P, v, e) evaluates inside
        # the block and sees them UNBOUND — reject rather than diverge
        oscope = _scope_vars(o)
        for e, _v in o.binds:
            if set(_bind_expr_vars(e)) - oscope:
                raise SparqlSyntaxError(
                    "BIND inside OPTIONAL may only reference variables "
                    "bound within the optional block (the reference's "
                    "Extend sees enclosing-group variables as unbound)"
                )
        # the matched-marker must be private to THIS block: a variable
        # also bound by a sibling OPTIONAL/UNION branch can be bound when
        # only the sibling matched, fabricating the BIND value
        sib: set[str] = set()
        for o2 in g.optionals:
            if o2 is not o:
                sib |= _scope_vars(o2)
        for b in g.union or []:
            sib |= _scope_vars(b)
        ovars = _group_vars(o)
        markers = sorted(ovars - outer - sib - {v for _, v in o.binds})
        if not markers:
            raise SparqlSyntaxError(
                "BIND inside OPTIONAL needs a variable private to the "
                "optional block (to mark whether the block matched)"
            )
        m = markers[0]
        for e, v in o.binds:
            g.binds.append(
                (("if", ("bound", "?" + m), e, ("termconst", None)), v)
            )
        o.binds = []


def sparql_query(
    out_dir: str,
    query: str | Query,
    *,
    num_partitions: int = 16,
    pf_context: dict | None = None,
    stats: dict | None | bool = None,
):
    """Parse + execute a SPARQL string over the index layout at ``out_dir``.

    SELECT → Dataset of term-string columns named by the projected
    variables (aggregate aliases for grouped queries); ASK → 1-row
    ``{"ask": bool}`` pyarrow Table; CONSTRUCT → (subj, pred, obj) Dataset.
    """
    from jena_ray.pipelines import bgp
    from jena_ray.pipelines.relational import slice_rows

    q = parse_query(query) if isinstance(query, str) else query
    _lower_services(q.where, pf_context)
    _hoist_optional_binds(q)

    if q.from_graphs or q.from_named:
        # FROM / FROM NAMED override the store: build (and cache) the
        # described dataset from its documents, query that instead
        out_dir = _dynamic_dataset(q)

    if q.form == "describe":
        return _describe(out_dir, q, num_partitions=num_partitions,
                         pf_context=pf_context, stats=stats)

    if q.form == "construct":
        if q.order_by or q.limit is not None or q.offset or q.group_by or q.aggs:
            raise SparqlSyntaxError(
                "solution modifiers on CONSTRUCT are not in the supported "
                "subset (they would bound the WHERE solutions, not the graph)"
            )
        g = q.where
        general = (g.optionals or g.minuses or g.union or g.values
                   or g.binds or g.paths or g.exists or g.subqueries
                   or g.star or g.pfcalls or g.graph_enum)
        if not general:
            return bgp.bgp_construct(
                out_dir, g.patterns, q.template,
                num_partitions=num_partitions,
                filters=g.filters or None, pf_context=pf_context,
                stats=stats,
            )
        # general WHERE shapes (OPTIONAL/UNION/MINUS/BIND/VALUES/paths):
        # evaluate the WHERE as a SELECT over the template variables —
        # DISTINCT projection is sound because the output graph is a set —
        # then instantiate the template per solution with TemplateLib's
        # null-skip semantics (an unbound template var skips just the
        # entries using it)
        from dataclasses import replace as _dc_replace

        from jena_ray.pipelines.bgp import is_var

        tvars = sorted({t[1:] for trip in q.template for t in trip
                        if is_var(t)})
        if any(s.startswith("_:") for trip in q.template for s in trip
               ) and not tvars:
            raise SparqlSyntaxError(
                "bnode template slots need at least one template variable"
            )
        wvars = _binding_vars(g) | {v for _, v in g.binds}
        for sq in g.subqueries:
            wvars |= set(_sub_vars(sq))
        missing = {v for v in tvars if v not in wvars}
        if missing:
            # never-bindable template vars null-skip their entries for
            # every solution — drop the entries, keep ground ones
            template = [
                trip for trip in q.template
                if all(not is_var(t) or t[1:] not in missing for t in trip)
            ]
            if not template:
                import ray.data as rd

                return rd.from_arrow(pa.table({
                    n: pa.array([], type=pa.string())
                    for n in (("graph", "subj", "pred", "obj")
                              if any(len(t) == 4 for t in q.template)
                              else ("subj", "pred", "obj"))
                }))
            q = _dc_replace(q, template=template)
            tvars = sorted({t[1:] for trip in template for t in trip
                            if is_var(t)})
        if not tvars:
            # fully-ground template over a general WHERE: it applies once
            # iff the WHERE has at least one solution (ASK probe)
            sub = _dc_replace(q, form="ask", template=None, select=[],
                              star=False)
            holds = sparql_query(
                out_dir, sub, num_partitions=num_partitions,
                pf_context=pf_context, stats=stats,
            )
            holds = bool(holds.column("ask")[0].as_py())
            return bgp.construct_instantiate(
                pa.table({"__u": pa.array([None] if holds else [],
                                          type=pa.string())}),
                q.template,
            )
        sub = _dc_replace(q, form="select", template=None, select=tvars,
                          star=False, distinct=True)
        sol = sparql_query(
            out_dir, sub, num_partitions=num_partitions,
            pf_context=pf_context, stats=stats,
        )
        return bgp.construct_instantiate(sol, q.template, tvars=tvars)

    # MINUS-side variables never bind in the result, so they are excluded;
    # OPTIONAL blocks bind (possibly null) at ANY nesting depth, as do
    # UNION branches and their optionals
    wvars = _binding_vars(q.where)

    if q.form == "ask":
        if not wvars:
            # fully-ground ASK: ground conjuncts are independent — evaluate
            # each pattern as its own existence probe and AND the booleans
            # (a shared fresh variable would demand the probes join, which
            # ground patterns with different subjects never do)
            g = q.where
            if (g.union or g.optionals or g.minuses or g.paths or g.graph
                    or g.filters):
                raise SparqlSyntaxError("ground ASK must be a plain BGP")
            got = all(
                ground_pattern_holds(out_dir, p,
                                     num_partitions=num_partitions)
                for p in g.patterns
            )
            # uncorrelated EXISTS / NOT EXISTS elements gate the unit
            # solution (ARQ Negation-01..05)
            for eg, negated in g.exists:
                hit = _group_has_solution(out_dir, eg,
                                          num_partitions=num_partitions)
                if hit == negated:
                    got = False
            return pa.table({"ask": pa.array([got], type=pa.bool_())})
        sel = sorted(wvars)[:1]
        res = _execute_where(out_dir, q, sel, distinct=False,
                             num_partitions=num_partitions,
                             pf_context=pf_context, stats=stats)
        got = len(res.limit(1).take(1)) > 0
        return pa.table({"ask": pa.array([got], type=pa.bool_())})

    binds = q.where.binds
    bind_names = [v for _, v in binds]
    if binds:
        clash = set(bind_names) & wvars
        if clash:
            raise SparqlSyntaxError(f"BIND reuses bound variables: {sorted(clash)}")

    grouped = bool(q.group_by or q.aggs or q.group_exprs)
    if grouped and binds:
        raise SparqlSyntaxError("BIND with GROUP BY is not in the supported subset")
    if grouped:
        # group / aggregate / group-expr vars may be UNBOUND in the WHERE
        # (ARQ "Group var does not occur", count-13): an unbound variable
        # keys null (one group) and an aggregate over it sees only errors
        # (COUNT → 0) — appended as null columns, never an error here
        gexpr_vars: set[str] = set()
        for e, _alias, _named in q.group_exprs:
            gexpr_vars |= _bind_vars(e)
        referenced = (set(q.group_by)
                      | {a.var for a in q.aggs if a.var is not None}
                      | gexpr_vars)
        if any(a.var is None and a.distinct for a in q.aggs):
            # COUNT(DISTINCT *) dedups WHOLE solution rows — every USER
            # variable must survive into the aggregate input (internal
            # "__"-prefixed path/sequence hops are not part of the
            # solution — Extra count-distinct-star pins this)
            referenced |= {v for v in wvars if not v.startswith("__")}
        unbound_vars = sorted(referenced - wvars)
        needed = sorted(referenced & wvars)
        named_aliases = {a for _e, a, named in q.group_exprs if named}
        extra = [v for v in q.select
                 if v not in q.group_by and v not in named_aliases]
        if extra:
            raise SparqlSyntaxError(
                f"non-grouped variables in SELECT: {extra}"
            )
        # bag semantics under the projection: solutions keep multiplicity
        if needed:
            sols = _execute_where(out_dir, q, needed, distinct=False,
                                  num_partitions=num_partitions,
                                  pf_context=pf_context, stats=stats)
        elif wvars:
            # nothing referenced is bound: carry one bound variable so
            # solution MULTIPLICITY survives into the aggregate (an empty
            # projection would collapse the solution bag)
            sols = _execute_where(out_dir, q, [sorted(wvars)[0]],
                                  distinct=False,
                                  num_partitions=num_partitions,
                                  pf_context=pf_context, stats=stats)
        else:
            # fully ground WHERE (GroupBy "Zero data"): ONE unit solution
            # iff every ground pattern holds, else zero groups
            import ray.data as rd

            g2 = q.where
            if (g2.union or g2.optionals or g2.minuses or g2.paths
                    or g2.graph or g2.filters or g2.exists
                    or g2.subqueries):
                raise SparqlSyntaxError(
                    "aggregates over a non-BGP ground WHERE are unsupported"
                )
            n_unit = 1 if all(
                ground_pattern_holds(out_dir, p,
                                     num_partitions=num_partitions)
                for p in g2.patterns
            ) else 0
            sols = rd.from_arrow(pa.table(
                {"__unit": pa.array([0] * n_unit, type=pa.int8())}
            ))
        if q.group_exprs or unbound_vars:
            def add_group_keys(tb: pa.Table, _ge=tuple(q.group_exprs),
                               _uk=tuple(unbound_vars)) -> pa.Table:
                for v in _uk:
                    tb = tb.append_column(
                        v, pa.array([None] * tb.num_rows, type=pa.string())
                    )
                for e, alias, _named in _ge:
                    tb = tb.append_column(alias, _eval_bind(tb, e))
                return tb

            sols = sols.map_batches(add_group_keys, batch_format="pyarrow")
        res = _aggregate(sols, q, num_buckets=num_partitions)
        if q.having:
            from jena_ray.pipelines.bgp import _bind_expr_vars

            known = (set(q.group_by) | {a.alias for a in q.aggs}
                     | {al for _e, al, _u in q.group_exprs})
            bad = sorted(
                {v for h in q.having
                 for v in (set(_bind_expr_vars(h[2]))
                           | set(_bind_expr_vars(h[3]))
                           if h[0] == "hx" else {h[1]})}
                - known
            )
            if bad:
                raise SparqlSyntaxError(f"HAVING references unknown vars: {bad}")

            def apply_having(tb: pa.Table, _h=tuple(q.having)) -> pa.Table:
                import pyarrow.compute as pc

                kerns = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater,
                         ">=": pc.greater_equal, "=": pc.equal,
                         "!=": pc.not_equal}
                for h in _h:
                    if h[0] == "hx":
                        _tag, op, ea, eb = h
                        mask = kerns[op](_eval_bind_num(tb, ea),
                                         _eval_bind_num(tb, eb))
                    else:
                        op, v, n = h
                        mask = kerns[op](
                            pc.cast(tb.column(v), pa.float64()), n
                        )
                    tb = tb.filter(pc.fill_null(mask, False))
                return tb

            res = res.map_batches(apply_having, batch_format="pyarrow")
        if q.select_exprs:
            # OpExtend above OpGroup: select expressions over group keys
            # and aggregate aliases (validated at parse); group cardinality
            # is small, one vectorized pass per block
            def apply_exprs(tb: pa.Table,
                            _b=tuple(q.select_exprs)) -> pa.Table:
                for expr, v in _b:
                    tb = tb.append_column(v, _eval_bind(tb, expr))
                return tb

            res = res.map_batches(apply_exprs, batch_format="pyarrow")
        out_cols = (
            (q.select or ([] if q.select_exprs
                          else q.group_by + [a for _e, a, named
                                             in q.group_exprs if named]))
            + [a.alias for a in q.aggs if not a.alias.startswith("__agg")]
            + [v for _, v in q.select_exprs]
        )

        def proj(tb: pa.Table, _c=tuple(out_cols)) -> pa.Table:
            return tb.select(list(_c))

        res = res.map_batches(proj, batch_format="pyarrow")
    else:
        if q.star:
            # SELECT * — every user variable; "__"-prefixed names are
            # engine-internal (path sequence hops) and never projected
            sel = sorted(v for v in wvars | set(bind_names)
                         if not v.startswith("__"))
        else:
            sel = q.select
        missing = [v for v in sel if v not in wvars and v not in bind_names]
        if missing and set(missing) == set(sel):
            if binds or wvars:
                raise SparqlSyntaxError(
                    f"no SELECT var bound in WHERE: {missing}"
                )
            # nothing in the WHERE ever binds: each solution binds NOTHING
            # for the selected vars — n empty rows, the zero-variable
            # shape (ARQ Negation-06 SELECT ?x ?z { EXISTS {...} })
            sel = []
        if not sel and not binds:
            # ZERO projectable variables — ground patterns, constant
            # FILTERs, or bnode-placeholder vars only (SELECT * { :x :p
            # _:a }): every solution binds NOTHING, so the result is n
            # empty rows (one, under DISTINCT/REDUCED, iff any solution
            # exists) — Jena's ResultSet rows with an empty binding set.
            import pandas as pd

            g = q.where
            if not wvars and g.graph_enum:
                # GRAPH <iri> { } existence probe drives the row count
                # (ARQ Dataset graph-10)
                res0 = _execute_where(out_dir, q, [], distinct=False,
                                      num_partitions=num_partitions,
                                      pf_context=pf_context, stats=stats)
                n = len(res0)
                if (q.distinct or q.reduced) and n > 1:
                    n = 1
                if q.offset:
                    n = max(0, n - q.offset)
                if q.limit is not None:
                    n = min(n, q.limit)
                return pd.DataFrame(index=range(n))
            if not wvars:
                # an entirely EMPTY optional group is the identity left
                # join (OPTIONAL {} — ARQ filter-equality-07); any other
                # non-BGP element is out of subset here
                def _empty_grp(og: "Group") -> bool:
                    return not (og.patterns or og.paths or og.filters
                                or og.optionals or og.minuses or og.exists
                                or og.binds or og.union or og.values
                                or og.graph or og.subqueries or og.star)

                if (g.union or g.minuses or g.paths
                        or g.graph or g.subqueries
                        or not all(_empty_grp(o) for o in g.optionals)):
                    raise SparqlSyntaxError(
                        "zero-variable WHERE shape unsupported"
                    )
                n = 1
                for p in g.patterns:
                    if not ground_pattern_holds(
                        out_dir, p, num_partitions=num_partitions
                    ):
                        n = 0
                for eg, negated in g.exists:
                    hit = _group_has_solution(out_dir, eg,
                                              num_partitions=num_partitions)
                    if hit == negated:
                        n = 0
                for f in g.filters or []:
                    # every referenced variable is unbound: the same
                    # error→false lowering as GRAPH-var scope, then the
                    # constant and/or tree folds on the driver
                    for v in _filter_tree_vars(f):
                        f = _unbind_graph_var(f, v)
                    if not _const_filter_value(f):
                        n = 0
            else:
                carrier = sorted(wvars)[0]
                zres = _execute_where(out_dir, q, [carrier], distinct=False,
                                      num_partitions=num_partitions,
                                      pf_context=pf_context, stats=stats)
                n = zres.count()
            if (q.distinct or q.reduced) and n > 1:
                n = 1
            if q.offset:
                n = max(0, n - q.offset)
            if q.limit is not None:
                n = min(n, q.limit)
            return pd.DataFrame(index=range(n))
        if binds:
            # run the pattern part for (selected pattern vars + expr inputs),
            # compute the BIND columns post-resolve, project, then dedup
            pattern_sel = [v for v in sel if v not in bind_names]
            # BINDs evaluate in order (chained OpExtend): an input may be a
            # PRIOR bind's output — only pattern-variable inputs need to
            # come out of the WHERE execution
            seen: set[str] = set()
            for e, v in binds:
                bad = [vv for vv in _bind_vars(e)
                       if vv not in wvars and vv not in seen]
                if bad:
                    raise SparqlSyntaxError(
                        f"BIND expression vars not bound: {bad}")
                seen.add(v)
            # group FILTERs referencing a BIND output evaluate AFTER the
            # extends (OpFilter over OpExtend — ARQ keeps the filter above
            # the assignment in the algebra); push the rest into the BGP
            from jena_ray.pipelines.bgp import (
                _filter_vars as _fvars,
                _value_filter_mask,
            )

            post_f = [f for f in q.where.filters
                      if _fvars(f) & set(bind_names)]
            push_f = [f for f in q.where.filters if f not in post_f]
            # pattern vars a post-bind filter needs beyond the selection
            f_extra = sorted(
                {vv for f in post_f for vv in _fvars(f)}
                & wvars - set(pattern_sel) - set(bind_names)
            )
            expr_in = sorted(
                ({vv for e, _ in binds for vv in _bind_vars(e)}
                 | set(f_extra))
                - set(pattern_sel) - set(bind_names)
            )
            if not pattern_sel and not expr_in and _group_is_empty(q.where):
                # SELECT (expr AS ?v) {} — the empty group pattern is the
                # unit table: ONE solution binding nothing (Jena's
                # OpTable.unit()); BINDs extend it. The carrier column is
                # dropped by apply_binds' projection.
                import ray.data as rd

                res = rd.from_arrow(
                    pa.table({"__unit": pa.array([0], type=pa.int64())})
                )
            else:
                saved_f = q.where.filters
                q.where.filters = push_f
                try:
                    res = _execute_where(out_dir, q, pattern_sel + expr_in,
                                         distinct=False,
                                         num_partitions=num_partitions,
                                         pf_context=pf_context, stats=stats)
                finally:
                    q.where.filters = saved_f

            def apply_binds(tb: pa.Table, _b=tuple(binds), _s=tuple(sel),
                            _pf=tuple(post_f)) -> pa.Table:
                for expr, v in _b:
                    tb = tb.append_column(v, _eval_bind(tb, expr))
                for f in _pf:
                    tb = tb.filter(_value_filter_mask(tb, f, lambda v: v))
                return tb.select(list(_s))

            res = res.map_batches(apply_binds, batch_format="pyarrow")
            if q.distinct:
                from jena_ray.stages.dedup import dedup_exact

                res = dedup_exact(res, cols=tuple(sel), coalesce=True)
        else:
            # ORDER BY may reference non-projected pattern variables: carry
            # them through execution and drop them after the sort (illegal
            # under DISTINCT — the projection changes the multiset first)
            ord_src = [v for v, _ in q.order_by]
            for _a, _e in q.order_exprs:
                ord_src += sorted(_bind_vars(_e))
            extra_order = []
            for v in ord_src:
                if v not in sel and v in wvars and v not in extra_order:
                    extra_order.append(v)
            if extra_order and q.distinct:
                raise SparqlSyntaxError(
                    f"ORDER BY on non-projected vars with DISTINCT: {extra_order}"
                )
            bound_sel = [v for v in sel if v not in missing]
            res = _execute_where(out_dir, q, bound_sel + extra_order,
                                 distinct=q.distinct,
                                 num_partitions=num_partitions,
                                 pf_context=pf_context, stats=stats)
            if missing:
                # selecting a variable the WHERE never binds is legal —
                # it is simply unbound in every solution (Jena projects a
                # null column, not an error)
                def pad_missing(tb: pa.Table, _m=tuple(missing),
                                _s=tuple(bound_sel + extra_order)) -> pa.Table:
                    for v in _m:
                        tb = tb.append_column(
                            v, pa.nulls(tb.num_rows, type=pa.string())
                        )
                    return tb.select(list(sel) + [c for c in _s
                                                  if c not in sel])

                res = res.map_batches(pad_missing, batch_format="pyarrow")
            if extra_order:
                if q.order_by:
                    res = _value_order(res, q.order_by, q.order_exprs)
                    q = _replace_order(q)

                def proj_sel(tb: pa.Table, _s=tuple(sel)) -> pa.Table:
                    return tb.select(list(_s))

                res = res.map_batches(proj_sel, batch_format="pyarrow")
        if q.reduced:
            from jena_ray.pipelines.relational import reduced

            res = reduced(res, sel)

    if q.order_by:
        res = _value_order(res, q.order_by, q.order_exprs)
    if q.offset:
        if q.limit is not None:
            return pa.Table.from_pandas(
                slice_rows(res, q.offset, q.limit), preserve_index=False
            )
        # OpSlice with offset but no limit (QueryIterSlice skips `offset`
        # rows then yields the rest): split_at_indices keeps the tail
        # distributed and order-preserving
        res = res.split_at_indices([q.offset])[1]
    if q.limit is not None:
        res = res.limit(q.limit)
    return res
