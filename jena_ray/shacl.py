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
        self.property_shapes = [
            Shape(g, ps, is_property=True) for ps in g.objs(node, _sh("property"))
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
        if shape.path is None or not shape.path.startswith("<"):
            return None  # complex paths unsupported in v1
        return data.objs(focus, shape.path)
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
