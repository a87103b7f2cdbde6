"""Named-graph (quads) pipeline: documents → per-doc TriG → quad store.

End-to-end exercise of the TriG parser (jena_ray.trig; LangTriG.java
semantics) and the GSPO/GPOS/GOSP quad materialization (stages/quads.py;
jena-tdb sys/Names.java:24-28): each document becomes one named graph whose
TriG serialization is synthesized deterministically from the row, parsed
back in a distributed stage, and loaded into the bucketed quad indexes.
Every value is a pure function of the documents table so the DuckDB oracle
reproduces the quads exactly.
"""

from __future__ import annotations

import os

import pyarrow as pa

from jena_ray import vocab as V

GRAPH_NS = V.KG + "graph/"


def _synth_trig(doc_id: int, lang: str, source: str, n_chars: int) -> str:
    """One named graph per document; prefixed + bare-literal forms exercise
    prefix resolution, numeric literals and predicate-object lists."""
    return (
        f"@prefix d: <{V.doc_url(source, doc_id)[: -len(str(doc_id))]}> .\n"
        f"@prefix r: <{V.REL}> .\n"
        f"<{GRAPH_NS}{doc_id}> {{\n"
        f'  d:{doc_id} r:language "{lang}" ;\n'
        f"      r:source <{V.SRC}{source}> ;\n"
        f"      r:charCount {n_chars} .\n"
        f"}}\n"
    )


def doc_quads(sf_dir: str):
    """(graph, subj, pred, obj) canonical quads, one graph per document —
    TriG synthesis + parse inside map_batches (parser runs distributed)."""
    import ray.data as rd

    from jena_ray.trig import parse_trig

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def to_quads(batch: pa.Table) -> pa.Table:
        gs, ss, ps, os_ = [], [], [], []
        for did, lang, src, nch in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("source").to_pylist(),
            batch.column("n_chars").to_pylist(),
        ):
            for g, s, p, o in parse_trig(_synth_trig(did, lang, src, nch)):
                gs.append(g)
                ss.append(s)
                ps.append(p)
                os_.append(o)
        return pa.table(
            {
                "graph": pa.array(gs, type=pa.string()),
                "subj": pa.array(ss, type=pa.string()),
                "pred": pa.array(ps, type=pa.string()),
                "obj": pa.array(os_, type=pa.string()),
            }
        )

    return ds.map_batches(to_quads, batch_format="pyarrow")


def quad_store_dir(sf_dir: str) -> str:
    """Quad indexes for a tier, built once under /tmp and reused. A cache
    whose id columns predate the 128-bit fixed_size_binary migration is
    wiped and rebuilt (stale_id_layout probe) — existence of _layout.json
    alone proved stale once."""
    import shutil

    from jena_ray.stages.materialize import stale_id_layout
    from jena_ray.stages.quads import materialize_quad_indexes

    base = os.path.join(
        "/tmp/jena_ray_quads", os.path.basename(os.path.normpath(sf_dir))
    )
    marker = os.path.join(base, "_layout.json")
    if os.path.exists(marker) and stale_id_layout(base, "gspo", "s_id"):
        shutil.rmtree(base, ignore_errors=True)
    if not os.path.exists(marker):
        materialize_quad_indexes(base, doc_quads(sf_dir), num_buckets=8)
    return base


def trig_doc_quads(sf_dir: str):
    """Driver query: the full quad set (sorted)."""
    return doc_quads(sf_dir).sort(["graph", "subj", "pred", "obj"])


def quad_lang_scan(sf_dir: str):
    """Driver query: GPOS pattern scan (?g, ?s, r:language, "en") over the
    materialized quad store → (graph, subj)."""
    from jena_ray.stages.quads import quad_pattern_scan

    store = quad_store_dir(sf_dir)
    out = quad_pattern_scan(store, p=f"<{V.P_LANG}>", o='"en"')

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["graph", "subj"])

    return out.map_batches(proj, batch_format="pyarrow").sort(["graph", "subj"])
