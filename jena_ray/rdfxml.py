"""RDF/XML reader producing canonical N-Triples terms.

Reference behavior: jena-arq riot/ReaderRIOTRDFXML.java (ARP parser bridge;
the grammar is the W3C RDF/XML syntax spec). This is a fresh implementation
over the stdlib XML parser covering the full RDF/XML 1.0 grammar minus XML
canonicalization detail of ``rdf:parseType="Literal"`` (inner XML is
serialized as-is, not exclusive-c14n). Conformance: the RDF Core WG suite
vendored under jena-core/testing/wg (positive pairs eval by isomorphism,
error cases must raise) — see tests/test_rdfxml_conformance.py.

Produces (subj, pred, obj) canonical term strings; bnode labels are
``_:L<nodeID>`` / ``_:G<n>`` exactly like the Turtle parser, so downstream
skolemization is shared.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from jena_ray import term as T
from jena_ray.term import TermError, resolve_iri

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
XSD = T.XSD

_RDF = "{" + RDF_NS + "}"
_XML_BASE = "{" + XML_NS + "}base"
_XML_LANG = "{" + XML_NS + "}lang"

RDF_TYPE = f"<{RDF_NS}type>"
RDF_FIRST = f"<{RDF_NS}first>"
RDF_REST = f"<{RDF_NS}rest>"
RDF_NIL = f"<{RDF_NS}nil>"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"

# syntax-only names never allowed as node-element / property names
_BAD_NODE_NAMES = {
    "RDF", "ID", "about", "bagID", "parseType", "resource", "nodeID",
    "li", "aboutEach", "aboutEachPrefix", "datatype",
}
_BAD_PROP_NAMES = {
    "RDF", "ID", "about", "bagID", "parseType", "resource", "nodeID",
    "Description", "aboutEach", "aboutEachPrefix", "datatype",
}
# rdf: attributes understood on node/property elements; anything else in the
# rdf: namespace that looks like a syntax term is an error (ARP semantics)
_OLD_TERMS = {"aboutEach", "aboutEachPrefix", "bagID"}

_NCNAME_RE = re.compile(r"^[A-Za-z_À-￿][\w.\-·À-￿]*$")


class RDFXMLParser:
    def __init__(self, base: str | None = None):
        self.base0 = base
        self.gen = 0
        self.triples: list[tuple[str, str, str]] = []
        self.used_ids: set[tuple[str, str]] = set()

    # ---- helpers ----

    def fresh_bnode(self) -> str:
        self.gen += 1
        return f"_:G{self.gen}"

    def _bnode(self, node_id: str) -> str:
        if not _NCNAME_RE.match(node_id):
            raise TermError(f"bad rdf:nodeID {node_id!r}")
        return f"_:L{node_id}"

    def _iri(self, iri: str, base: str | None) -> str:
        return T.fmt_iri(T.check_iri(resolve_iri(base, iri)))

    def _id_iri(self, frag: str, base: str | None) -> str:
        if not _NCNAME_RE.match(frag):
            raise TermError(f"bad rdf:ID {frag!r}")
        iri = self._iri("#" + frag, base)
        key = (base or "", frag)
        if key in self.used_ids:
            raise TermError(f"duplicate rdf:ID {frag!r}")
        self.used_ids.add(key)
        return iri

    def _split(self, tag: str) -> tuple[str, str]:
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns, local
        return "", tag

    def _base(self, elem, base: str | None) -> str | None:
        b = elem.get(_XML_BASE)
        if b is not None:
            # the fragment of a base URI is dropped when used as a base
            b = re.sub(r"#.*$", "", b)
            return resolve_iri(base, b) if base else b
        return base

    def _lang(self, elem, lang: str) -> str:
        v = elem.get(_XML_LANG)
        return v if v is not None else lang

    def emit(self, s: str, p: str, o: str) -> None:
        self.triples.append((s, p, o))

    # ---- grammar ----

    def parse(self, text: str) -> list[tuple[str, str, str]]:
        try:
            root = ET.fromstring(text)
        except ET.ParseError as e:
            raise TermError(f"XML parse error: {e}") from None
        base = self._base(root, self.base0)
        lang = self._lang(root, "")
        ns, local = self._split(root.tag)
        if ns == RDF_NS and local == "RDF":
            for attr in root.attrib:
                ans, alocal = self._split(attr)
                if ans == RDF_NS:
                    raise TermError(f"unexpected rdf:{alocal} on rdf:RDF")
            for child in root:
                self.node_element(child, base, lang)
        else:
            self.node_element(root, base, lang)
        return self.triples

    def node_element(self, elem, base, lang) -> str:
        ns, local = self._split(elem.tag)
        base = self._base(elem, base)
        lang = self._lang(elem, lang)
        if ns == RDF_NS and local in _BAD_NODE_NAMES:
            raise TermError(f"rdf:{local} is not a valid node element")
        # subject from rdf:about / rdf:ID / rdf:nodeID (mutually exclusive)
        about = elem.get(_RDF + "about")
        rid = elem.get(_RDF + "ID")
        node_id = elem.get(_RDF + "nodeID")
        if sum(x is not None for x in (about, rid, node_id)) > 1:
            raise TermError("rdf:about / rdf:ID / rdf:nodeID are exclusive")
        if about is not None:
            subj = self._iri(about, base)
        elif rid is not None:
            subj = self._id_iri(rid, base)
        elif node_id is not None:
            subj = self._bnode(node_id)
        else:
            subj = self.fresh_bnode()
        # typed node element
        if not (ns == RDF_NS and local == "Description"):
            self.emit(subj, RDF_TYPE, self._iri(ns + local, None))
        # property attributes
        self._property_attributes(elem, subj, base, lang, node_element=True)
        # property elements
        li_counter = [0]
        for child in elem:
            self.property_element(child, subj, base, lang, li_counter)
        return subj

    def _property_attributes(self, elem, subj, base, lang, *, node_element):
        for attr, val in elem.attrib.items():
            ans, alocal = self._split(attr)
            if ans == XML_NS or attr in (_XML_BASE, _XML_LANG):
                continue
            if ans == "" and alocal.startswith("xml"):
                continue  # xml-prefixed reserved attrs
            if ans == RDF_NS:
                if alocal in _OLD_TERMS:
                    raise TermError(f"rdf:{alocal} is withdrawn RDF/XML syntax")
                if alocal in ("about", "ID", "nodeID") and node_element:
                    continue
                if alocal in ("resource", "nodeID", "datatype", "parseType") and not node_element:
                    continue
                if alocal == "type":
                    self.emit(subj, RDF_TYPE, self._iri(val, base))
                    continue
                if alocal in ("li",) or alocal in _BAD_PROP_NAMES:
                    raise TermError(f"rdf:{alocal} is not a property attribute")
                # rdf:_n and user terms in rdf: ns are fine as property attrs
                self.emit(subj, self._iri(ans + alocal, None), _plain(val, lang))
                continue
            if ans == "":
                raise TermError(f"unqualified attribute {alocal!r}")
            self.emit(subj, self._iri(ans + alocal, None), _plain(val, lang))

    def property_element(self, elem, subj, base, lang, li_counter) -> None:
        ns, local = self._split(elem.tag)
        base = self._base(elem, base)
        lang = self._lang(elem, lang)
        if ns == RDF_NS:
            if local == "li":
                li_counter[0] += 1
                pred = self._iri(f"{RDF_NS}_{li_counter[0]}", None)
            elif local in _BAD_PROP_NAMES or local in _OLD_TERMS:
                raise TermError(f"rdf:{local} is not a valid property element")
            else:
                pred = self._iri(ns + local, None)
        else:
            if ns == "":
                raise TermError(f"unqualified property element {local!r}")
            pred = self._iri(ns + local, None)

        rid = elem.get(_RDF + "ID")
        reify_iri = self._id_iri(rid, base) if rid is not None else None

        parse_type = elem.get(_RDF + "parseType")
        resource = elem.get(_RDF + "resource")
        node_id = elem.get(_RDF + "nodeID")
        datatype = elem.get(_RDF + "datatype")
        children = list(elem)
        text = (elem.text or "") + "".join((c.tail or "") for c in children)

        def finish(obj: str) -> None:
            self.emit(subj, pred, obj)
            if reify_iri is not None:
                self.emit(reify_iri, RDF_TYPE, f"<{RDF_NS}Statement>")
                self.emit(reify_iri, f"<{RDF_NS}subject>", subj)
                self.emit(reify_iri, f"<{RDF_NS}predicate>", pred)
                self.emit(reify_iri, f"<{RDF_NS}object>", obj)

        if parse_type is not None:
            if resource is not None or node_id is not None or datatype is not None:
                raise TermError("rdf:parseType excludes resource/nodeID/datatype")
            for attr in elem.attrib:
                ans, alocal = self._split(attr)
                if attr in (_XML_BASE, _XML_LANG) or ans == XML_NS:
                    continue
                if ans == RDF_NS and alocal in ("ID", "parseType"):
                    continue
                if ans == "" and alocal.startswith("xml"):
                    continue
                raise TermError(
                    f"attribute {alocal!r} not allowed with rdf:parseType"
                )
            if parse_type == "Resource":
                bn = self.fresh_bnode()
                inner_li = [0]
                for child in children:
                    self.property_element(child, bn, base, lang, inner_li)
                finish(bn)
                return
            if parse_type == "Collection":
                items = [self.node_element(c, base, lang) for c in children]
                if not items:
                    finish(RDF_NIL)
                    return
                head = self.fresh_bnode()
                node = head
                for i, item in enumerate(items):
                    self.emit(node, RDF_FIRST, item)
                    if i + 1 < len(items):
                        nxt = self.fresh_bnode()
                        self.emit(node, RDF_REST, nxt)
                        node = nxt
                    else:
                        self.emit(node, RDF_REST, RDF_NIL)
                finish(head)
                return
            # "Literal" and any unknown parseType → XML literal (spec: treat
            # unknown values as Literal)
            xml_text = (elem.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            finish(T.fmt_literal(xml_text, datatype=RDF_XMLLITERAL))
            return

        if children:
            if resource is not None or node_id is not None or datatype is not None:
                raise TermError("node-element property excludes resource/nodeID/datatype")
            if text.strip():
                raise TermError("mixed text and element content in property")
            if len(children) > 1:
                raise TermError("property element with multiple node elements")
            obj = self.node_element(children[0], base, lang)
            finish(obj)
            return

        if resource is not None or node_id is not None:
            if resource is not None and node_id is not None:
                raise TermError("rdf:resource and rdf:nodeID are exclusive")
            if text.strip():
                raise TermError("text content with rdf:resource/rdf:nodeID")
            obj = (
                self._iri(resource, base)
                if resource is not None
                else self._bnode(node_id)
            )
            # empty property element may still carry property attributes
            sub_attrs = self._collect_prop_attrs(elem)
            for p2, o2 in sub_attrs:
                self.emit(obj, p2, o2(lang))
            finish(obj)
            return

        sub_attrs = self._collect_prop_attrs(elem)
        if sub_attrs:
            if text.strip():
                raise TermError("text content with property attributes")
            bn = self.fresh_bnode()
            for p2, o2 in sub_attrs:
                self.emit(bn, p2, o2(lang))
            finish(bn)
            return

        # literal property
        if datatype is not None:
            finish(T.fmt_literal(text, datatype=resolve_iri(base, datatype)))
        elif lang:
            finish(T.fmt_literal(text, lang=lang))
        else:
            finish(T.fmt_literal(text))

    def _collect_prop_attrs(self, elem):
        """Property attributes on a property element → [(pred, fn(lang)->obj)].
        rdf:type gets resource semantics."""
        out = []
        for attr, val in elem.attrib.items():
            ans, alocal = self._split(attr)
            if ans == XML_NS or attr in (_XML_BASE, _XML_LANG):
                continue
            if ans == RDF_NS:
                if alocal in ("ID", "resource", "nodeID", "datatype", "parseType"):
                    continue
                if alocal in _OLD_TERMS:
                    raise TermError(f"rdf:{alocal} is withdrawn RDF/XML syntax")
                if alocal == "type":
                    out.append((RDF_TYPE, lambda lg, v=val: self._iri(v, None)))
                    continue
                if alocal in _BAD_PROP_NAMES or alocal == "li":
                    raise TermError(f"rdf:{alocal} is not a property attribute")
                out.append(
                    (self._iri(ans + alocal, None), lambda lg, v=val: _plain(v, lg))
                )
                continue
            if ans == "":
                if alocal.startswith("xml"):
                    continue
                raise TermError(f"unqualified attribute {alocal!r}")
            out.append(
                (self._iri(ans + alocal, None), lambda lg, v=val: _plain(v, lg))
            )
        return out


def _plain(val: str, lang: str) -> str:
    return T.fmt_literal(val, lang=lang or None)


def parse_rdfxml(
    text: str, *, base: str | None = None, skolem_seed: bytes | None = None
) -> list[tuple[str, str, str]]:
    """Parse an RDF/XML document → canonical triples."""
    p = RDFXMLParser(base=base)
    out = p.parse(text)
    if skolem_seed is not None:
        labels: dict[str, str] = {}

        def sk(t: str) -> str:
            if t.startswith("_:"):
                lbl = t[2:]
                if lbl not in labels:
                    labels[lbl] = T.skolem_label(skolem_seed, lbl)
                return "_:" + labels[lbl]
            return t

        out = [(sk(s), pp, sk(o)) for s, pp, o in out]
    return out


def read_rdfxml(
    paths, *, base: str | None = None, job_seed: str = "jena-ray", concurrency: int = 4
):
    """Whole-file RDF/XML Dataset source (XML is not splittable)."""
    import pyarrow as pa
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        ss, ps, os_, srcs = [], [], [], []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            seed = T.bnode_seed(job_seed, path)
            for s, p, o in parse_rdfxml(
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

    return files.map_batches(
        parse, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )
