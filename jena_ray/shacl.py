"""SHACL core validation over canonical triples.

Reference behavior: jena-shacl (ShaclValidator.get().validate — shapes
parsed from a graph, constraint components evaluated per focus node,
ValidationReport emitted). This is a fresh implementation of the core
constraint subset, driven by the reference's vendored SHACL WG test files
(jena-shacl/src/test/resources/std/core/{property,targets,node}/*.ttl —
each file holds data + shapes + the expected report; tests compare
``conforms`` and the (focusNode, resultPath, constraintComponent) set).

Supported: targets (sh:targetClass incl. rdfs:subClassOf closure and
implicit class targets, sh:targetNode, sh:targetSubjectsOf,
sh:targetObjectsOf) and constraints sh:minCount, sh:maxCount, sh:datatype,
sh:class, sh:nodeKind, sh:hasValue, sh:in, sh:pattern (+sh:flags),
sh:minLength/maxLength, sh:minInclusive/maxInclusive/minExclusive/
maxExclusive, the pair components sh:equals/disjoint/lessThan/
lessThanOrEquals, sh:languageIn/uniqueLang, sh:closed
(+sh:ignoredProperties), and the shape-valued components sh:node, sh:not,
sh:and, sh:or, sh:xone (recursive conformance evaluation) — on property
shapes (IRI paths) and node shapes.

Ray-Data-first use: ``shacl_validate_dataset`` broadcasts the (small)
shapes graph and validates focus-node groups co-located by a subject-hash
``bucketed_group_apply``; sh:class / targetClass lookups use a broadcast
node→types map (types are the small fraction of a KG; at crawl scale this
becomes a co-partitioned join on the value node id).
"""

from __future__ import annotations

import re
from collections import defaultdict

from jena_ray import term as T

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
RDF_FIRST = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
RDF_REST = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
RDF_NIL = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"
RDFS_SUBCLASS = "<http://www.w3.org/2000/01/rdf-schema#subClassOf>"
RDFS_CLASS = "<http://www.w3.org/2000/01/rdf-schema#Class>"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

def _sh(local: str) -> str:
    return f"<{SH}{local}>"


class Graph:
    """Minimal indexed view over a triple list (SPO + POS maps)."""

    def __init__(self, triples):
        self.spo = defaultdict(lambda: defaultdict(list))
        self.pos = defaultdict(lambda: defaultdict(list))
        for s, p, o in triples:
            self.spo[s][p].append(o)
            self.pos[p][o].append(s)

    def objs(self, s, p):
        return self.spo.get(s, {}).get(p, [])

    def obj(self, s, p):
        v = self.objs(s, p)
        return v[0] if v else None

    def subjects(self, p, o):
        return self.pos.get(p, {}).get(o, [])

    def rdf_list(self, head):
        out = []
        while head and head != RDF_NIL:
            out.extend(self.objs(head, RDF_FIRST))
            head = self.obj(head, RDF_REST)
        return out

    def types_closure(self, node):
        """rdf:type plus rdfs:subClassOf superclasses (SHACL class targets
        and sh:class follow the subclass closure)."""
        out = set()
        todo = list(self.objs(node, RDF_TYPE))
        while todo:
            c = todo.pop()
            if c in out:
                continue
            out.add(c)
            todo.extend(self.objs(c, RDFS_SUBCLASS))
        return out


# ---------------------------------------------------------- property paths
# SHACL property paths (spec §2.3.1; jena-shacl parser/ShaclPaths.java):
# IRI, sequence (rdf list), sh:inversePath, sh:alternativePath,
# sh:zeroOrMorePath / sh:oneOrMorePath / sh:zeroOrOnePath. Parsed to a
# small expression tree; reports print the canonical SPARQL path string
# (the shapes-graph bnode would not be comparable across graphs).


def parse_path(g: Graph, node: str):
    """Path expression tree from a shapes-graph path node."""
    if node.startswith("<"):
        return ("pred", node)
    inv = g.obj(node, _sh("inversePath"))
    if inv is not None:
        return ("inv", parse_path(g, inv))
    alt = g.obj(node, _sh("alternativePath"))
    if alt is not None:
        return ("alt", [parse_path(g, m) for m in g.rdf_list(alt)])
    for key, tag in (("zeroOrMorePath", "zom"), ("oneOrMorePath", "oom"),
                     ("zeroOrOnePath", "zoo")):
        sub = g.obj(node, _sh(key))
        if sub is not None:
            return (tag, parse_path(g, sub))
    members = g.rdf_list(node)
    if members:
        return ("seq", [parse_path(g, m) for m in members])
    raise ValueError(f"unsupported SHACL path structure at {node}")


def path_str(expr) -> str:
    """Canonical SPARQL property-path string for an expression tree."""
    kind = expr[0]
    if kind == "pred":
        return expr[1]
    if kind == "inv":
        return "^" + path_str(expr[1])
    if kind == "alt":
        return "(" + "|".join(path_str(e) for e in expr[1]) + ")"
    if kind == "seq":
        return "(" + "/".join(path_str(e) for e in expr[1]) + ")"
    return "(" + path_str(expr[1]) + {"zom": "*", "oom": "+", "zoo": "?"}[kind]


def eval_path(data: Graph, focus: str, expr) -> list:
    """Value nodes of ``focus`` under the path (a SET per the spec —
    deduplicated, first-seen order; a plain predicate path keeps the raw
    object list, matching the pre-path behavior)."""
    kind = expr[0]
    if kind == "pred":
        return data.objs(focus, expr[1])
    if kind == "inv":
        if expr[1][0] != "pred":
            raise ValueError(
                "inverse of a non-predicate SHACL path is unsupported")
        return data.subjects(expr[1][1], focus)
    if kind == "alt":
        out = []
        for e in expr[1]:
            out.extend(eval_path(data, focus, e))
        return list(dict.fromkeys(out))
    if kind == "seq":
        nodes = [focus]
        for e in expr[1]:
            nxt = []
            for n in nodes:
                if not n.startswith('"'):
                    nxt.extend(eval_path(data, n, e))
            nodes = list(dict.fromkeys(nxt))
        return nodes
    if kind in ("zom", "oom"):
        seen: list = []
        frontier = [focus]
        visited = {focus}
        while frontier:
            nxt = []
            for n in frontier:
                if n.startswith('"'):
                    continue
                for v in eval_path(data, n, expr[1]):
                    if v not in visited:
                        visited.add(v)
                        nxt.append(v)
                    if v not in seen:
                        seen.append(v)
            frontier = nxt
        if kind == "zom":
            return list(dict.fromkeys([focus] + seen))
        return list(dict.fromkeys(seen))
    if kind == "zoo":
        return list(dict.fromkeys([focus] + eval_path(data, focus, expr[1])))
    raise ValueError(f"unknown path expression {expr!r}")


_CONSTRAINT_PROPS = (
    "minCount", "maxCount", "datatype", "class", "nodeKind", "hasValue",
    "in", "pattern", "flags", "minLength", "maxLength",
    "minInclusive", "maxInclusive", "minExclusive", "maxExclusive",
    "equals", "disjoint", "lessThan", "lessThanOrEquals",
    "languageIn", "uniqueLang", "closed",
)
# shape-valued constraints (ShaclValidator evaluates these recursively:
# constraint/ConstraintOp.java — Not/And/Or/Xone/Node hold sub-shapes)
_LIST_PROPS = frozenset({"in", "languageIn"})


def _lex(term: str) -> str:
    if term.startswith('"'):
        return T.split_literal(term)[0]
    if term.startswith("<"):
        return term[1:-1]
    return term[2:]


def _num(term: str):
    """Comparable key for range constraints: numeric literals → float,
    date/dateTime literals → datetime (offset-aware), else None."""
    try:
        lex, _, dt = T.split_literal(term)
    except T.TermError:
        return None
    if dt and ("date" in dt or "Time" in dt):
        from datetime import datetime, timezone

        try:
            v = datetime.fromisoformat(lex.replace("Z", "+00:00"))
            if v.tzinfo is None:
                v = v.replace(tzinfo=timezone.utc)
            return v
        except ValueError:
            return None
    try:
        return float(lex)
    except ValueError:
        return None


def _datatype_of(term: str) -> str | None:
    if not term.startswith('"'):
        return None
    _, lang, dt = T.split_literal(term)
    if lang:
        return RDF_LANGSTRING
    return dt or XSD_STRING


class Shape:
    def __init__(self, g: Graph, node: str, *, is_property: bool):
        self.g = g  # shapes graph handle — logical sub-shapes resolve lazily
        self.node = node
        self.is_property = is_property
        self.path = g.obj(node, _sh("path")) if is_property else None
        self.path_expr = None
        if self.path is not None:
            self.path_expr = parse_path(g, self.path)
            if self.path_expr[0] != "pred":
                # reports carry the canonical path STRING (a shapes-graph
                # bnode label means nothing outside that graph)
                self.path = path_str(self.path_expr)
        self.constraints: dict[str, object] = {}
        for c in _CONSTRAINT_PROPS:
            v = g.objs(node, _sh(c))
            if v:
                self.constraints[c] = g.rdf_list(v[0]) if c in _LIST_PROPS else v[0]
        # shape-valued constraints: refs only (cycles in a shapes graph must
        # not recurse at parse time; _sub_shape builds on demand)
        self.node_refs = g.objs(node, _sh("node"))
        self.not_refs = g.objs(node, _sh("not"))
        self.and_lists = [g.rdf_list(h) for h in g.objs(node, _sh("and"))]
        self.or_lists = [g.rdf_list(h) for h in g.objs(node, _sh("or"))]
        self.xone_lists = [g.rdf_list(h) for h in g.objs(node, _sh("xone"))]
        self.ignored = (
            g.rdf_list(g.obj(node, _sh("ignoredProperties")))
            if g.obj(node, _sh("ignoredProperties"))
            else []
        )
        # sh:qualifiedValueShape (+ qualifiedMin/MaxCount, sibling
        # disjointness) — jena-shacl constraint/QualifiedValueShape.java
        self.qualified_ref = g.obj(node, _sh("qualifiedValueShape"))
        self.q_min = g.obj(node, _sh("qualifiedMinCount"))
        self.q_max = g.obj(node, _sh("qualifiedMaxCount"))
        qd = g.obj(node, _sh("qualifiedValueShapesDisjoint"))
        self.q_disjoint = qd is not None and _lex(qd) in ("true", "1")
        self.sibling_qualified: list[str] = []  # filled by the parent below
        # SHACL-SPARQL constraints (constraint/SparqlConstraint.java):
        # refs to constraint nodes carrying sh:select + sh:prefixes
        self.sparql_refs = g.objs(node, _sh("sparql"))
        self.property_shapes = [
            Shape(g, ps, is_property=True) for ps in g.objs(node, _sh("property"))
        ]
        for ps in self.property_shapes:
            ps.sibling_qualified = [
                other.qualified_ref
                for other in self.property_shapes
                if other is not ps and other.qualified_ref is not None
            ]

    def _sub_shape(self, ref: str) -> "Shape":
        return Shape(self.g, ref, is_property=self.g.obj(ref, _sh("path")) is not None)


def _conforms(data: Graph, node: str, shape: Shape, depth: int = 0) -> bool:
    """Does ``node`` conform to ``shape``? (recursive shape evaluation —
    the ValidationEngine's nested validation for Not/And/Or/Xone/Node.)"""
    if depth > 50:
        raise RecursionError(f"shape recursion depth exceeded at {shape.node}")
    tmp: list = []
    _check_values(data, node, shape, tmp, depth=depth + 1)
    if not shape.is_property:
        for ps in shape.property_shapes:
            _check_values(data, node, ps, tmp, depth=depth + 1)
    return not tmp


def _value_nodes(data: Graph, focus: str, shape: Shape):
    if shape.is_property:
        if shape.path_expr is None:
            return None
        return eval_path(data, focus, shape.path_expr)
    return [focus]


def _check_values(data: Graph, focus: str, shape: Shape, out: list, depth: int = 0):
    """Evaluate one shape's constraints for one focus node."""
    values = _value_nodes(data, focus, shape)
    if values is None:
        return
    path_iri = shape.path if shape.is_property else None

    def report(component: str, value: str | None = None, path: str | None = None):
        out.append(
            (focus, path or path_iri, _sh(component + "ConstraintComponent"), shape.node)
        )

    c = shape.constraints
    if "minCount" in c and len(values) < int(_lex(c["minCount"])):
        report("MinCount")
    if "maxCount" in c and len(values) > int(_lex(c["maxCount"])):
        report("MaxCount")
    for v in values:
        if "datatype" in c:
            want = c["datatype"][1:-1]
            if _datatype_of(v) != want or not _well_formed(v, want):
                report("Datatype", v)
        if "class" in c and c["class"] not in (
            data.types_closure(v) if not v.startswith('"') else set()
        ):
            report("Class", v)
        if "nodeKind" in c:
            kind = c["nodeKind"]
            ok = not v.startswith("<<") and (  # RDF-star: no nodeKind matches
                (kind == _sh("IRI") and v.startswith("<"))
                or (kind == _sh("BlankNode") and v.startswith("_:"))
                or (kind == _sh("Literal") and v.startswith('"'))
                or (kind == _sh("BlankNodeOrIRI") and not v.startswith('"'))
                or (kind == _sh("BlankNodeOrLiteral") and not v.startswith("<"))
                or (kind == _sh("IRIOrLiteral") and not v.startswith("_:"))
            )
            if not ok:
                report("NodeKind", v)
        if "in" in c and v not in c["in"]:
            report("In", v)
        if "pattern" in c:
            flags = _lex(c["flags"]) if "flags" in c else ""
            fl = re.I if "i" in flags else 0
            if v.startswith("_:") or not re.search(_lex(c["pattern"]), _lex(v), fl):
                report("Pattern", v)
        if "minLength" in c and (
            v.startswith("_:") or len(_lex(v)) < int(_lex(c["minLength"]))
        ):
            report("MinLength", v)
        if "maxLength" in c and (
            v.startswith("_:") or len(_lex(v)) > int(_lex(c["maxLength"]))
        ):
            report("MaxLength", v)
        for comp, op in (
            ("minInclusive", lambda a, b: a >= b),
            ("maxInclusive", lambda a, b: a <= b),
            ("minExclusive", lambda a, b: a > b),
            ("maxExclusive", lambda a, b: a < b),
        ):
            if comp in c:
                lo = _num(c[comp])
                val = _num(v) if v.startswith('"') else None
                try:
                    ok = val is not None and lo is not None and op(val, lo)
                except TypeError:  # cross-kind compare (number vs dateTime)
                    ok = False
                if not ok:
                    report(comp[0].upper() + comp[1:], v)
    if "hasValue" in c and c["hasValue"] not in values:
        report("HasValue")

    # ---- pair constraints (Equals/Disjoint/LessThan* — property shapes) --
    if "equals" in c:
        other = set(data.objs(focus, c["equals"]))
        for v in set(values) ^ other:  # symmetric difference, both directions
            report("Equals", v)
    if "disjoint" in c:
        other = set(data.objs(focus, c["disjoint"]))
        for v in values:
            if v in other:
                report("Disjoint", v)
    for comp, op in (
        ("lessThan", lambda a, b: a < b),
        ("lessThanOrEquals", lambda a, b: a <= b),
    ):
        if comp in c:
            others = data.objs(focus, c[comp])
            for v in values:
                for o in others:
                    a, b = _num(v), _num(o)
                    if a is None or b is None:
                        # fall back to string compare of same-kind plain
                        # literals, else incomparable → violation
                        la, lb = _lex(v), _lex(o)
                        ok = (
                            v.startswith('"')
                            and o.startswith('"')
                            and _num(v) is None
                            and _num(o) is None
                            and op(la, lb)
                        )
                    else:
                        try:
                            ok = op(a, b)
                        except TypeError:
                            ok = False
                    if not ok:
                        report(comp[0].upper() + comp[1:], v)

    # ---- language constraints --------------------------------------------
    if "languageIn" in c:
        ranges = [_lex(t).lower() for t in c["languageIn"]]

        def lang_matches(tag: str) -> bool:
            # langMatches basic filtering (RFC 4647 §3.3.1): "en" matches
            # "en" and "en-NZ"; "*" matches any tag
            t = tag.lower()
            return any(
                r == "*" or t == r or t.startswith(r + "-") for r in ranges
            )

        for v in values:
            lang = T.split_literal(v)[1] if v.startswith('"') else None
            if not lang or not lang_matches(lang):
                report("LanguageIn", v)
    if "uniqueLang" in c and _lex(c["uniqueLang"]) in ("true", "1"):
        seen: dict[str, int] = {}
        for v in values:
            lang = T.split_literal(v)[1] if v.startswith('"') else None
            if lang:
                seen[lang] = seen.get(lang, 0) + 1
        for lang, n in sorted(seen.items()):
            if n > 1:
                report("UniqueLang", lang)

    # ---- shape-valued constraints (Node/Not/And/Or/Xone) ------------------
    if shape.node_refs or shape.not_refs or shape.and_lists or shape.or_lists or shape.xone_lists:
        for v in values:
            for ref in shape.node_refs:
                if not _conforms(data, v, shape._sub_shape(ref), depth):
                    report("Node", v)
            for ref in shape.not_refs:
                if _conforms(data, v, shape._sub_shape(ref), depth):
                    report("Not", v)
            for members in shape.and_lists:
                if not all(
                    _conforms(data, v, shape._sub_shape(m), depth) for m in members
                ):
                    report("And", v)
            for members in shape.or_lists:
                if not any(
                    _conforms(data, v, shape._sub_shape(m), depth) for m in members
                ):
                    report("Or", v)
            for members in shape.xone_lists:
                n_ok = sum(
                    1 for m in members if _conforms(data, v, shape._sub_shape(m), depth)
                )
                if n_ok != 1:
                    report("Xone", v)

    # ---- sh:qualifiedValueShape: count the value nodes conforming to the
    # qualified shape (minus, when disjoint, those conforming to a SIBLING
    # qualified shape) against qualifiedMin/MaxCount ------------------------
    if shape.qualified_ref is not None and shape.is_property:
        q_shape = shape._sub_shape(shape.qualified_ref)
        sibs = (
            [shape._sub_shape(r) for r in shape.sibling_qualified]
            if shape.q_disjoint else []
        )
        n_q = sum(
            1 for v in values
            if _conforms(data, v, q_shape, depth)
            and not any(_conforms(data, v, sb, depth) for sb in sibs)
        )
        if shape.q_min is not None and n_q < int(_lex(shape.q_min)):
            report("QualifiedMinCount")
        if shape.q_max is not None and n_q > int(_lex(shape.q_max)):
            report("QualifiedMaxCount")

    # ---- SHACL-SPARQL constraints: run the SELECT with $this pre-bound;
    # every result row is one violation (SparqlConstraint.java) -------------
    for ref in shape.sparql_refs:
        sel = shape.g.obj(ref, _sh("select"))
        if sel is None:
            continue
        prefixes = _sparql_prefixes(shape.g, ref)
        rows = _eval_sparql_constraint(
            data, _lex(sel), prefixes, this=focus, path=shape.path
        )
        for row in rows:
            report("SPARQL", row.get("value"),
                   path=(shape.path if shape.is_property else row.get("path")))

    # ---- nested property shapes on a PROPERTY shape: each value node
    # becomes the focus of the sub-shapes (property-001.ttl — person →
    # address → city chain; node shapes handle theirs in validate())
    if shape.is_property and shape.property_shapes:
        if depth > 50:
            raise RecursionError(f"shape recursion depth exceeded at {shape.node}")
        for v in values:
            if not v.startswith('"'):
                for ps in shape.property_shapes:
                    _check_values(data, v, ps, out, depth=depth + 1)

    # ---- sh:closed (node shapes): every predicate must be declared --------
    if "closed" in c and _lex(c["closed"]) in ("true", "1") and not shape.is_property:
        declared = {
            ps.path for ps in shape.property_shapes if ps.path
        } | set(shape.ignored)
        for v in values:  # value == focus for node shapes
            for p in sorted(data.spo.get(v, {})):
                if p not in declared:
                    report("Closed", path=p)


_WF = {
    "http://www.w3.org/2001/XMLSchema#integer": re.compile(r"^[+-]?\d+$"),
    "http://www.w3.org/2001/XMLSchema#boolean": re.compile(r"^(true|false|0|1)$"),
    "http://www.w3.org/2001/XMLSchema#decimal": re.compile(r"^[+-]?\d+(\.\d+)?$"),
    "http://www.w3.org/2001/XMLSchema#date": re.compile(r"^\d{4}-\d{2}-\d{2}"),
}


def _well_formed(term: str, dt: str) -> bool:
    rx = _WF.get(dt)
    return True if rx is None else bool(rx.match(_lex(term)))


# --------------------------------------------------------------------------
# SHACL-SPARQL constraint evaluation. The reference compiles sh:select with
# ARQ and pre-binds $this (SparqlConstraint.java / SparqlValidation.java).
# Here the constraint runs inside the per-bucket in-memory validator, so a
# micro-evaluator covers the constraint-query subset the WG suite and
# real-world shapes use: SELECT with plain vars / $this / (const AS ?var)
# projections, a WHERE of triple patterns + FILTERs over
# =, !=, !, &&, ||, isLiteral/isIRI/isBlank, lang(), langMatches(),
# datatype(), str(). Anything else raises loudly (unsupported, not wrong).
# --------------------------------------------------------------------------

OWL_IMPORTS = "<http://www.w3.org/2002/07/owl#imports>"


def _sparql_prefixes(g: Graph, constraint: str) -> dict[str, str]:
    """prefix→namespace map for a constraint node: sh:declare rows on the
    sh:prefixes target, following owl:imports transitively."""
    out: dict[str, str] = {}
    todo = list(g.objs(constraint, _sh("prefixes")))
    seen: set[str] = set()
    while todo:
        node = todo.pop()
        if node in seen:
            continue
        seen.add(node)
        for d in g.objs(node, _sh("declare")):
            p = g.obj(d, _sh("prefix"))
            ns = g.obj(d, _sh("namespace"))
            if p is not None and ns is not None:
                out[_lex(p)] = _lex(ns)
        todo.extend(g.objs(node, OWL_IMPORTS))
    return out


_SPQ_TOK = re.compile(
    r"""\s+
      | (?P<iri><[^<>\s]*>)
      | (?P<lit>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^\S+)?)
      | (?P<var>[?$][A-Za-z_][A-Za-z_0-9]*)
      | (?P<kw>SELECT|WHERE|FILTER|AS)\b
      | (?P<name>[A-Za-z_][\w.-]*)?:(?P<local>[A-Za-z_][\w.-]*)?
      | (?P<word>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op>\|\||&&|!=|[(){}.=!,])
    """,
    re.VERBOSE | re.IGNORECASE,
)


def _eval_sparql_constraint(data: Graph, query: str, prefixes: dict[str, str],
                            *, this: str, path: str | None) -> list[dict]:
    """Evaluate one sh:select constraint query against the in-memory data
    graph with ``$this`` pre-bound (and ``$PATH`` substituted for property
    shapes). Returns the solution rows as var→term dicts."""
    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(query):
        m = _SPQ_TOK.match(query, i)
        if not m or m.end() == i:
            raise ValueError(f"sh:sparql: cannot tokenize at {query[i:i+25]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind is None:  # whitespace
            continue
        if kind == "local":  # prefixed name (name may be empty group)
            pfx = m.group("name") or ""
            local = m.group("local") or ""
            if pfx not in prefixes:
                raise ValueError(f"sh:sparql: undeclared prefix {pfx!r}")
            toks.append(("term", f"<{prefixes[pfx]}{local}>"))
        elif kind == "iri":
            toks.append(("term", m.group()))
        elif kind == "lit":
            toks.append(("term", m.group()))
        elif kind == "var":
            v = m.group()[1:]
            if m.group() == "$PATH":
                if path is None:
                    raise ValueError("sh:sparql: $PATH outside a property shape")
                toks.append(("term", path))
            elif v == "this":
                toks.append(("term", this))
            else:
                toks.append(("var", v))
        elif kind == "kw":
            toks.append(("kw", m.group().upper()))
        elif kind == "word":
            toks.append(("word", m.group()))
        else:
            toks.append(("op", m.group()))

    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else ("eof", "")

    def take(kind=None, val=None):
        k, v = peek()
        if (kind and k != kind) or (val and v != val):
            raise ValueError(f"sh:sparql: expected {val or kind}, got {v!r}")
        pos[0] += 1
        return v

    # ---- SELECT clause ----
    take("kw", "SELECT")
    proj: list[tuple[str, object]] = []  # (out var, 'var'|const term)
    while peek() != ("kw", "WHERE"):
        k, v = peek()
        if k == "var":
            take()
            proj.append((v, ("var", v)))
        elif k == "term":  # pre-bound $this in projection
            take()
            proj.append(("this", ("const", v)))
        elif (k, v) == ("op", "("):
            take()
            ek, ev = peek()
            take()
            take("kw", "AS")
            out = take("var")
            take("op", ")")
            proj.append((out, ("var", ev) if ek == "var" else ("const", ev)))
        else:
            raise ValueError(f"sh:sparql: unsupported SELECT item {v!r}")
    take("kw", "WHERE")
    take("op", "{")

    # ---- WHERE clause: triple patterns + FILTERs ----
    patterns: list[tuple] = []
    filters: list[tuple] = []

    def parse_expr():
        return parse_or()

    def parse_or():
        left = parse_and()
        while peek() == ("op", "||"):
            take()
            left = ("or", left, parse_and())
        return left

    def parse_and():
        left = parse_not()
        while peek() == ("op", "&&"):
            take()
            left = ("and", left, parse_not())
        return left

    def parse_not():
        if peek() == ("op", "!"):
            take()
            return ("not", parse_not())
        return parse_cmp()

    def parse_cmp():
        left = parse_primary()
        k, v = peek()
        if (k, v) in (("op", "="), ("op", "!=")):
            take()
            return (v, left, parse_primary())
        return left

    def parse_primary():
        k, v = peek()
        if (k, v) == ("op", "("):
            take()
            e = parse_expr()
            take("op", ")")
            return e
        if k == "var":
            take()
            return ("var", v)
        if k == "term":
            take()
            return ("const", v)
        if k == "word":
            take()
            take("op", "(")
            args = [parse_expr()]
            while peek() == ("op", ","):
                take()
                args.append(parse_expr())
            take("op", ")")
            return ("fn", v.lower(), args)
        raise ValueError(f"sh:sparql: unsupported expression at {v!r}")

    while peek() != ("op", "}"):
        k, v = peek()
        if (k, v) == ("kw", "FILTER"):
            take()
            take("op", "(")
            filters.append(parse_expr())
            take("op", ")")
            if peek() == ("op", "."):
                take()
            continue
        slots = []
        for _ in range(3):
            kk, vv = peek()
            if kk not in ("term", "var"):
                raise ValueError(f"sh:sparql: bad triple slot {vv!r}")
            take()
            slots.append((kk, vv))
        patterns.append(tuple(slots))
        if peek() == ("op", "."):
            take()
    take("op", "}")

    # ---- evaluate: backtracking BGP over the indexed graph ----
    def match(patts, binding):
        if not patts:
            yield dict(binding)
            return
        (sk, sv), (pk, pv), (ok, ov) = patts[0]

        def ground(kind, val):
            if kind == "term":
                return val
            return binding.get(val)

        s, p, o = ground(sk, sv), ground(pk, pv), ground(ok, ov)
        if s is not None and p is not None:
            cands = [(s, p, obj) for obj in data.objs(s, p)]
        elif p is not None and o is not None:
            cands = [(subj, p, o) for subj in data.subjects(p, o)]
        elif s is not None:
            cands = [(s, pred, obj) for pred, objs in data.spo.get(s, {}).items()
                     for obj in objs]
        elif p is not None:
            cands = [(subj, p, obj) for obj, subjs in data.pos.get(p, {}).items()
                     for subj in subjs]
        else:
            cands = [(subj, pred, obj) for subj, po in data.spo.items()
                     for pred, objs in po.items() for obj in objs]
        for ts, tp, to in cands:
            nb = dict(binding)
            ok2 = True
            for (kind, val), got in (((sk, sv), ts), ((pk, pv), tp), ((ok, ov), to)):
                if kind == "term":
                    if val != got:
                        ok2 = False
                        break
                elif val in nb:
                    if nb[val] != got:
                        ok2 = False
                        break
                else:
                    nb[val] = got
            if ok2:
                yield from match(patts[1:], nb)

    def ev(expr, b):
        op = expr[0]
        if op == "const":
            return expr[1]
        if op == "var":
            return b.get(expr[1])
        if op == "or":
            return bool(ev(expr[1], b)) or bool(ev(expr[2], b))
        if op == "and":
            return bool(ev(expr[1], b)) and bool(ev(expr[2], b))
        if op == "not":
            return not bool(ev(expr[1], b))
        if op in ("=", "!="):
            a, c = ev(expr[1], b), ev(expr[2], b)
            na = _num(a) if isinstance(a, str) and a.startswith('"') else None
            nc = _num(c) if isinstance(c, str) and c.startswith('"') else None
            eq = (na == nc) if (na is not None and nc is not None) else (a == c)
            return eq if op == "=" else not eq
        if op == "fn":
            name, args = expr[1], [ev(a, b) for a in expr[2]]
            t = args[0]
            if name == "isliteral":
                return isinstance(t, str) and t.startswith('"')
            if name in ("isiri", "isuri"):
                return isinstance(t, str) and t.startswith("<")
            if name == "isblank":
                return isinstance(t, str) and t.startswith("_:")
            if name == "lang":
                lang = T.split_literal(t)[1] if (
                    isinstance(t, str) and t.startswith('"')) else None
                return f'"{lang or ""}"'
            if name == "langmatches":
                tag, rng = _lex(args[0]).lower(), _lex(args[1]).lower()
                if not tag:
                    return False
                return rng == "*" or tag == rng or tag.startswith(rng + "-")
            if name == "datatype":
                dt = _datatype_of(t) if isinstance(t, str) else None
                return f"<{dt}>" if dt else None
            if name == "str":
                return f'"{_lex(t)}"' if isinstance(t, str) else None
            raise ValueError(f"sh:sparql: unsupported function {name}")
        raise ValueError(f"sh:sparql: unsupported expression {expr!r}")

    rows = []
    for b in match(patterns, {}):
        if all(bool(ev(f, b)) for f in filters):
            row = {}
            for out, src in proj:
                row[out] = src[1] if src[0] == "const" else b.get(src[1])
            rows.append(row)
    return rows


def parse_shapes(shapes_graph: Graph) -> list[tuple[Shape, dict]]:
    """Shapes + their target declarations from a shapes graph."""
    out = []
    shape_nodes = set(shapes_graph.subjects(RDF_TYPE, _sh("NodeShape")))
    shape_nodes |= set(shapes_graph.subjects(RDF_TYPE, _sh("PropertyShape")))
    for tgt in ("targetClass", "targetNode", "targetSubjectsOf", "targetObjectsOf"):
        shape_nodes |= {
            s for subs in shapes_graph.pos.get(_sh(tgt), {}).values() for s in subs
        }
    # implicit class targets: a shape that is also an rdfs:Class
    for node in sorted(shape_nodes):
        targets = {
            t: shapes_graph.objs(node, _sh(t))
            for t in ("targetClass", "targetNode", "targetSubjectsOf", "targetObjectsOf")
        }
        if RDFS_CLASS in shapes_graph.objs(node, RDF_TYPE):
            targets["targetClass"] = targets["targetClass"] + [node]
        is_prop = shapes_graph.obj(node, _sh("path")) is not None
        out.append((Shape(shapes_graph, node, is_property=is_prop), targets))
    return out


def _class_closure(data: Graph, cls: str) -> set[str]:
    """cls plus all its rdfs:subClassOf DESCENDANTS (classes whose
    instances are also instances of cls)."""
    out, todo = set(), [cls]
    while todo:
        c = todo.pop()
        if c in out:
            continue
        out.add(c)
        todo.extend(data.subjects(RDFS_SUBCLASS, c))
    return out


def _focus_nodes(data: Graph, targets: dict) -> set[str]:
    focus = set(targets["targetNode"])
    typed = data.pos.get(RDF_TYPE, {})
    for cls in targets["targetClass"]:
        for sub_cls in _class_closure(data, cls):
            focus.update(typed.get(sub_cls, []))
    for p in targets["targetSubjectsOf"]:
        focus.update(s for subs in data.pos.get(p, {}).values() for s in subs)
    for p in targets["targetObjectsOf"]:
        focus.update(data.pos.get(p, {}).keys())
    return focus


def validate(data_triples, shapes_triples=None) -> tuple[bool, list]:
    """SHACL core validation: returns (conforms, results) where results are
    (focusNode, resultPath, constraintComponent, sourceShape) rows."""
    data = Graph(data_triples)
    shapes = Graph(shapes_triples if shapes_triples is not None else data_triples)
    results: list = []
    for shape, targets in parse_shapes(shapes):
        for focus in sorted(_focus_nodes(data, targets)):
            if shape.is_property:
                _check_values(data, focus, shape, results)
            else:
                _check_values(data, focus, shape, results)
                for ps in shape.property_shapes:
                    _check_values(data, focus, ps, results)
    return (len(results) == 0), results


def shacl_validate_dataset(ds, shapes_triples, *, num_buckets: int = 64):
    """Distributed validation of a triples Dataset: focus nodes co-located
    by subject hash (bucketed_group_apply), shapes + the node→types map
    broadcast (the small sides). Constraints needing the VALUE node's types
    (sh:class) consult the broadcast map — at crawl scale replace with a
    co-partitioned join against the type-triple table."""
    import pandas as pd
    import ray

    from jena_ray.stages.dedup import bucketed_group_apply

    # broadcast: shapes + node→types (type triples are the small fraction)
    types_rows = []
    for t in ds.map_batches(
        lambda b: b.filter(
            __import__("pyarrow").compute.equal(b.column("pred"), RDF_TYPE)
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        types_rows.extend(zip(t.column("subj").to_pylist(), t.column("obj").to_pylist()))
    shapes_ref = ray.put(shapes_triples)
    types_ref = ray.put(types_rows)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        shp = ray.get(shapes_ref)
        ty = ray.get(types_ref)
        triples = list(zip(df["subj"], df["pred"], df["obj"]))
        # merge broadcast type rows for class/target closure on value nodes
        _, results = validate(triples + [(s, RDF_TYPE, o) for s, o in ty], shp)
        subj_here = set(df["subj"])
        rows = [r for r in results if r[0] in subj_here]  # focus owned by bucket
        return pd.DataFrame(
            rows, columns=["focus", "path", "component", "source_shape"]
        )

    return bucketed_group_apply(ds, ["subj"], per_bucket, num_buckets=num_buckets)
