"""TriG parser (W3C TriG 1.1 grammar) producing canonical quads.

Reference behavior: jena-arq riot/lang/LangTriG.java (graph blocks over the
LangTurtleBase machinery; the GRAPH keyword, label-or-subject dispatch at
LangTriG.oneNamedGraphBlock, optional final '.' inside braces). This extends
the repo's fresh recursive-descent Turtle parser (jena_ray.turtle) with the
TriG block grammar; conformance is asserted by the TrigStd suite
(jena-arq/testing/RIOT/Lang/TrigStd, manifest-driven) with quad-isomorphism
eval against the .nq results.

Quads are (graph, subj, pred, obj) canonical term strings; default-graph
rows carry ``<urn:x-arq:DefaultGraph>`` (Quad.java:37), matching
term.parse_nquads. TriG is context-dependent (prefix/base/bnode-label
state) → whole-document parsing, one document per task.
"""

from __future__ import annotations

import re

from jena_ray import term as T
from jena_ray.term import TermError
from jena_ray.turtle import TurtleParser

DEFAULT_GRAPH = "<urn:x-arq:DefaultGraph>"

Quad = tuple[str, str, str, str]

_GRAPH_KW = re.compile(r"(?i)GRAPH(?=[ \t\r\n<_\[#])")


class TriGParser(TurtleParser):
    def __init__(self, text: str, *, base: str | None = None):
        super().__init__(text, base=base)
        self.quads: list[Quad] = []

    # triples accumulated by the inherited machinery are drained into quads
    # after each statement/block, tagged with the owning graph
    def _drain(self, graph: str) -> None:
        self.quads.extend((graph, s, p, o) for s, p, o in self.triples)
        self.triples.clear()

    def label_or_subject(self) -> str | None:
        """labelOrSubject ::= iri | BlankNode (no property lists here)."""
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
                return self.fresh_bnode()  # ANON graph label
            self.i = save
        return None

    def _one_triples(self) -> None:
        """triples inside a block: subject predicateObjectList, with the
        lone-blankNodePropertyList form (POL optional)."""
        subj = self.subject()
        if subj is None:
            raise TermError(
                f"expected subject at offset {self.i}: {self.s[self.i:self.i+30]!r}"
            )
        self.ws()
        if self.subject_was_bnpl and self.peek() in (".", "}"):
            return  # lone [ po-list ] — predicateObjectList omitted
        self.predicate_object_list(subj)

    def wrapped_graph(self, graph: str) -> None:
        """'{' triplesBlock? '}' — '.' separates triples, optional before
        '}' (LangTriG allows the final dot to be dropped)."""
        self.expect("{")
        while True:
            self.ws()
            if self.try_lit("}"):
                break
            if self.eof():
                raise TermError("unterminated graph block")
            self._one_triples()
            self.ws()
            if self.try_lit("."):
                continue
            self.expect("}")
            break
        self._drain(graph)

    def parse_quads(self) -> list[Quad]:
        while True:
            self.ws()
            if self.eof():
                break
            if self.directive():
                continue
            m = _GRAPH_KW.match(self.s, self.i)
            if m:
                self.i = m.end()
                self.ws()
                label = self.label_or_subject()
                if label is None:
                    raise TermError(f"expected graph label at offset {self.i}")
                self.ws()
                self.wrapped_graph(label)
                continue
            if self.peek() == "{":
                self.wrapped_graph(DEFAULT_GRAPH)
                continue
            # triplesOrGraph: labelOrSubject ('{' block | predicateObjectList '.')
            label = self.label_or_subject()
            if label is not None:
                self.ws()
                if self.peek() == "{":
                    self.wrapped_graph(label)
                    continue
                if label.startswith("_:G"):
                    # ANON '[]' not followed by a graph block: it was really
                    # an ANON/bnode-property-list subject — but a bare ANON
                    # subject needs a predicateObjectList anyway, so parse on
                    pass
                self.predicate_object_list(label)
                self.ws()
                self.expect(".")
                self._drain(DEFAULT_GRAPH)
                continue
            # triples2: blankNodePropertyList/collection subject, default graph
            self._one_triples()
            self.ws()
            self.expect(".")
            self._drain(DEFAULT_GRAPH)
        return self.quads

    def parse(self):  # pragma: no cover - guard against Turtle-entry misuse
        raise TermError("TriGParser.parse_quads() must be used for TriG input")


def parse_trig(
    text: str, *, base: str | None = None, skolem_seed: bytes | None = None
) -> list[Quad]:
    """Parse a TriG document → canonical quads (graph, subj, pred, obj).
    Blank-node scope is the whole document (shared across graph blocks);
    optional skolemization covers graph labels too."""
    p = TriGParser(text, base=base)
    out = p.parse_quads()
    if skolem_seed is not None:
        labels: dict[str, str] = {}

        def sk(t: str) -> str:
            if t.startswith("_:"):
                lbl = t[2:]
                if lbl not in labels:
                    labels[lbl] = T.skolem_label(skolem_seed, lbl)
                return "_:" + labels[lbl]
            return t

        out = [(sk(g), sk(s), pp, sk(o)) for g, s, pp, o in out]
    return out


def read_trig(
    paths, *, base: str | None = None, job_seed: str = "jena-ray", concurrency: int = 4
):
    """Whole-file TriG Dataset source (one document per task — TriG is
    context-dependent and not splittable). Columns (graph, subj, pred, obj,
    src); bnodes skolemized with a per-file seed for globally stable labels."""
    import pyarrow as pa
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        gs, ss, ps, os_, srcs = [], [], [], [], []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            seed = T.bnode_seed(job_seed, path)
            for g, s, p, o in parse_trig(
                data.decode("utf-8"), base=base or f"file://{path}", skolem_seed=seed
            ):
                gs.append(g)
                ss.append(s)
                ps.append(p)
                os_.append(o)
                srcs.append(path)
        return pa.table(
            {
                "graph": pa.array(gs, type=pa.string()),
                "subj": pa.array(ss, type=pa.string()),
                "pred": pa.array(ps, type=pa.string()),
                "obj": pa.array(os_, type=pa.string()),
                "src": pa.array(srcs, type=pa.string()),
            }
        )

    return files.map_batches(
        parse, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )
