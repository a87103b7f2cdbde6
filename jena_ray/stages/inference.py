"""Streaming RDFS materialization — the `infer` CLI / InferenceProcessorRDFS.

Reference semantics (jena-arq riot/process/inf/InferenceProcessorRDFS.java,
closure setup InferenceSetupRDFS.java:31-41): a small vocabulary graph is
preprocessed driver-side into transitive-closure maps —

  subClassOf+   (class → all superclasses)
  subPropertyOf+ (property → all superproperties)
  domain        (property → classes)
  range         (property → classes)

— then every data triple expands 1→N:

  (s rdf:type C)  → (s rdf:type C') for every C' ∈ superClasses(C)
  (s P o)         → (s P' o) for every P' ∈ superProperties(P)
  (s P o)         → (s rdf:type D) for D ∈ domain(P)
  (s P o)         → (o rdf:type R) for R ∈ range(P)   [o an IRI/bnode]

Ray Data mapping: the closure maps are the broadcast small side (`ray.put`
once, fetched per actor in ``__init__``), the expansion is a vectorized
flat-map inside ``map_batches``. Output includes the input triples
(materialization), deduped downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = f"<{RDF_NS}type>"
SUBCLASS = f"<{RDFS_NS}subClassOf>"
SUBPROP = f"<{RDFS_NS}subPropertyOf>"
DOMAIN = f"<{RDFS_NS}domain>"
RANGE = f"<{RDFS_NS}range>"


def _transitive_closure(edges: dict[str, set[str]]) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for start in edges:
        seen: set[str] = set()
        stack = list(edges.get(start, ()))
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(edges.get(n, ()))
        out[start] = seen
    return out


def build_rdfs_closure(vocab_triples) -> dict[str, dict[str, tuple[str, ...]]]:
    """Driver-side closure maps from a (small) vocabulary triple list/Dataset
    (InferenceSetupRDFS analog). Accepts a list of (s,p,o) or a Dataset."""
    if hasattr(vocab_triples, "take_all"):
        rows = [(r["subj"], r["pred"], r["obj"]) for r in vocab_triples.take_all()]
    else:
        rows = list(vocab_triples)
    sub_class: dict[str, set[str]] = {}
    sub_prop: dict[str, set[str]] = {}
    domain: dict[str, set[str]] = {}
    range_: dict[str, set[str]] = {}
    for s, p, o in rows:
        if p == SUBCLASS:
            sub_class.setdefault(s, set()).add(o)
        elif p == SUBPROP:
            sub_prop.setdefault(s, set()).add(o)
        elif p == DOMAIN:
            domain.setdefault(s, set()).add(o)
        elif p == RANGE:
            range_.setdefault(s, set()).add(o)
    superclass = _transitive_closure(sub_class)

    def _with_superclasses(classes: dict[str, set[str]]) -> dict[str, tuple[str, ...]]:
        # The reference's domain()/range() call derive(x, rdf:type, c) AND
        # subClass(x, rdf:type, c) — i.e. domain/range-inferred types are
        # also propagated up the class hierarchy
        # (InferenceProcessorRDFS.java:116-145). Pre-expanding the class
        # sets with their superclass closures reproduces that chaining in
        # a single expansion pass.
        out = {}
        for p, cs in classes.items():
            full = set(cs)
            for c in cs:
                full |= superclass.get(c, set())
            out[p] = tuple(sorted(full))
        return out

    return {
        "superclass": {k: tuple(sorted(v)) for k, v in superclass.items()},
        "superprop": {k: tuple(sorted(v)) for k, v in _transitive_closure(sub_prop).items()},
        "domain": _with_superclasses(domain),
        "range": _with_superclasses(range_),
    }


class RDFSExpand:
    """Actor-pool map_batches stage: triples → triples + inferred triples.

    The closure dict is broadcast (ray.put on the driver, ray.get once per
    actor here). Expansion is column-vectorized: each rule is a pandas
    map + explode over the affected rows only.
    """

    def __init__(self, closure_ref=None, closure: dict | None = None):
        if closure_ref is not None:
            import ray

            self.c = ray.get(closure_ref)
        else:
            self.c = closure or {"superclass": {}, "superprop": {}, "domain": {}, "range": {}}

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["subj", "pred", "obj"]).to_pandas()
        outs = [df]

        is_type = df["pred"] == RDF_TYPE
        # rdfs9: type propagation up the class hierarchy
        t = df.loc[is_type, ["subj", "obj"]]
        if len(t):
            sup = t["obj"].map(self.c["superclass"])
            mask = sup.notna()
            if mask.any():
                e = pd.DataFrame(
                    {"subj": t.loc[mask, "subj"], "obj": sup[mask]}
                ).explode("obj")
                e["pred"] = RDF_TYPE
                outs.append(e[["subj", "pred", "obj"]])

        # subProperty/domain/range apply to EVERY triple including rdf:type
        # rows (InferenceProcessorRDFS.process applies all four rules
        # unconditionally — e.g. a vocab putting rdf:type in a property
        # hierarchy, or a domain/range on rdf:type, still derives).
        nt = df
        if len(nt):
            # rdfs7: property propagation
            supp = nt["pred"].map(self.c["superprop"])
            mask = supp.notna()
            if mask.any():
                e = pd.DataFrame(
                    {"subj": nt.loc[mask, "subj"], "pred": supp[mask], "obj": nt.loc[mask, "obj"]}
                ).explode("pred")
                outs.append(e[["subj", "pred", "obj"]])
            # rdfs2: domain
            dom = nt["pred"].map(self.c["domain"])
            mask = dom.notna()
            if mask.any():
                e = pd.DataFrame({"subj": nt.loc[mask, "subj"], "obj": dom[mask]}).explode("obj")
                e["pred"] = RDF_TYPE
                outs.append(e[["subj", "pred", "obj"]])
            # rdfs3: range (only for non-literal objects)
            rng = nt["pred"].map(self.c["range"])
            obj_ok = ~nt["obj"].str.startswith('"')
            mask = rng.notna() & obj_ok
            if mask.any():
                e = pd.DataFrame({"subj": nt.loc[mask, "obj"], "obj": rng[mask]}).explode("obj")
                e["pred"] = RDF_TYPE
                outs.append(e[["subj", "pred", "obj"]])

        out = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(out[["subj", "pred", "obj"]], preserve_index=False)


def rdfs_materialize(triples, vocab_triples, *, concurrency=(1, 4)):
    """Dataset pipeline: expand every triple against the broadcast RDFS
    closure, then exact-dedup (materialized graphs are sets)."""
    import ray

    from jena_ray.stages.dedup import dedup_exact

    closure = build_rdfs_closure(vocab_triples)
    ref = ray.put(closure)
    expanded = triples.map_batches(
        RDFSExpand,
        fn_constructor_kwargs={"closure_ref": ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    return dedup_exact(expanded, cols=("subj", "pred", "obj"))
