"""NER mention detection, entity linking, relation extraction, triple emission.

Per-document KG construction (the north-star stage chain): tokenized text →
candidate mentions (closed-vocabulary NER) → entity linking against a
broadcast alias dictionary with deterministic scoring → adjacent-pair
relation extraction → RDF triples with skolemized blank-node provenance.

Design notes for scale:

- Each stage is a small pure function over one batch's worth of rows; the
  flagship pipeline fuses them into ONE ``map_batches`` pass (``KGAnnotator``)
  so the 100 TB page stream flows through a single linear pipeline — no
  branch re-computation, no mid-pipeline materialization.
- The alias dictionary is the broadcast small side (``ray.put`` once, fetched
  per actor in ``__init__``) — the InferenceSetupRDFS pattern
  (jena-arq riot/process/inf/InferenceProcessorRDFS.java: closure maps built
  once, read by every record).
- Blank-node labels are skolemized with a per-document seed
  (murmur3-128(job_seed + url + local label) — BlankNodeAllocatorHash.java:97-151
  with the FixedSeedHash variant's determinism), so labels never depend on
  shard boundaries or processing order (SURVEY.md §2.9).
- Token work is vectorized with pandas string ops / numpy; no per-row Python
  in the outer loop beyond the final list build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from jena_ray import term as T
from jena_ray import vocab as V

JOB_SEED = "jena-ray-v1"  # job-level skolem seed: fixed for resumable runs

TRIPLE_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("url", pa.string()),  # provenance (lineage); dropped for P/R
    ]
)


def tokenize(texts: pd.Series) -> pd.DataFrame:
    """Explode texts to (row idx, pos, token) — vectorized split + explode."""
    toks = texts.str.split(" ")
    df = toks.explode().to_frame("token")
    df["row"] = df.index
    df["pos"] = df.groupby("row").cumcount()
    return df.reset_index(drop=True)


def detect_mentions(tok_df: pd.DataFrame) -> pd.DataFrame:
    """Closed-vocabulary NER: keep tokens that are entity-alias surfaces.

    Returns (row, pos, surface). This models the mention-detector actor
    stage; the surface→entity decision is the linker's job.
    """
    mask = tok_df["token"].isin(V.ALIAS_TO_ENTITY.keys())
    out = tok_df.loc[mask, ["row", "pos", "token"]].rename(columns={"token": "surface"})
    return out


def link_mentions(mentions: pd.DataFrame, alias_to_entity: dict[str, str]) -> pd.DataFrame:
    """Entity linking: candidate generation via the broadcast alias dict +
    deterministic scoring + per-mention argmax.

    The closed dictionary yields exactly one candidate per surface with score
    1.0, so argmax is the identity — the structure (candidates → score →
    best-per-mention) matches the cross-encoder path and is where a learned
    scorer would slot in (actor state).
    """
    out = mentions.copy()
    out["entity"] = out["surface"].map(alias_to_entity)
    out["score"] = 1.0
    # per-mention argmax (mentions are batch-local, so no shuffle needed)
    out = out.sort_values(["row", "pos", "score"], kind="stable")
    out = out.drop_duplicates(subset=["row", "pos"], keep="last")
    return out


def extract_relations(linked: pd.DataFrame) -> pd.DataFrame:
    """Adjacent-entity-pair relation extraction: mentions at (pos, pos+1)
    within one document → (row, ent1, ent2)."""
    df = linked.sort_values(["row", "pos"], kind="stable")
    nxt_row = df["row"].shift(-1)
    nxt_pos = df["pos"].shift(-1)
    nxt_ent = df["entity"].shift(-1)
    adj = (nxt_row == df["row"]) & (nxt_pos == df["pos"] + 1)
    out = pd.DataFrame(
        {"row": df.loc[adj, "row"], "ent1": df.loc[adj, "entity"], "ent2": nxt_ent[adj]}
    )
    return out.reset_index(drop=True)


def _ts_lexical(ts: pd.Series) -> pd.Series:
    """xsd:dateTime canonical lexical form (UTC, no fractional zeros)."""
    s = ts.dt.strftime("%Y-%m-%dT%H:%M:%S")
    frac = ts.dt.strftime(".%f").str.rstrip("0").replace({".": ""}, regex=False)
    return s + frac.where(frac != ".", "") + "Z"


def page_triples(batch: pa.Table, alias_to_entity: dict[str, str]) -> pa.Table:
    """One fused pass: pages batch → triples batch (metadata + mentions +
    provenance bnodes + relations). Pure function; deterministic."""
    df = batch.select(["url", "text", "lang", "warc_ts", "source", "n_chars"]).to_pandas()
    n = len(df)
    urls = df["url"]
    doc_iri = "<" + urls + ">"

    subj: list[pd.Series | np.ndarray] = []
    pred: list = []
    obj: list = []
    prov: list = []

    def emit(s, p, o, u) -> None:
        subj.append(np.asarray(s, dtype=object))
        pred.append(np.full(len(u), f"<{p}>", dtype=object))
        obj.append(np.asarray(o, dtype=object))
        prov.append(np.asarray(u, dtype=object))

    # --- metadata triples (vectorized) ---
    emit(doc_iri, V.RDF_TYPE, np.full(n, f"<{V.C_DOCUMENT}>", dtype=object), urls)
    emit(doc_iri, V.P_LANG, '"' + df["lang"] + '"', urls)
    emit(doc_iri, V.P_SOURCE, "<" + V.SRC + df["source"] + ">", urls)
    emit(
        doc_iri,
        V.P_CHARS,
        '"' + df["n_chars"].astype(str) + f'"^^<{T.XSD}integer>',
        urls,
    )
    emit(doc_iri, V.P_CRAWLTS, '"' + _ts_lexical(df["warc_ts"]) + f'"^^<{T.XSD}dateTime>', urls)

    # --- NER → linking ---
    toks = tokenize(df["text"])
    mentions = detect_mentions(toks)
    linked = link_mentions(mentions, alias_to_entity)

    if len(linked):
        m_url = urls.iloc[linked["row"].to_numpy()].to_numpy(dtype=object)
        m_doc = "<" + m_url + ">"
        ent_iri = ("<" + V.ENT + linked["entity"] + ">").to_numpy(dtype=object)
        emit(m_doc, V.P_MENTIONS, ent_iri, m_url)

        # skolemized mention provenance bnodes: one per (url, pos)
        seeds = [T.bnode_seed(JOB_SEED, u) for u in m_url]
        bn = np.array(
            [
                "_:" + T.skolem_label(sd, f"m{p}")
                for sd, p in zip(seeds, linked["pos"].to_numpy())
            ],
            dtype=object,
        )
        emit(bn, V.RDF_TYPE, np.full(len(bn), f"<{V.C_MENTION}>", dtype=object), m_url)
        emit(bn, V.P_OF_ENTITY, ent_iri, m_url)
        emit(bn, V.P_IN_DOC, m_doc, m_url)
        surf = ('"' + linked["surface"] + '"').to_numpy(dtype=object)
        emit(bn, V.P_SURFACE, surf, m_url)

        # --- relations ---
        rels = extract_relations(linked)
        if len(rels):
            r_url = urls.iloc[rels["row"].to_numpy()].to_numpy(dtype=object)
            emit(
                ("<" + V.ENT + rels["ent1"] + ">").to_numpy(dtype=object),
                V.P_COOCCURS,
                ("<" + V.ENT + rels["ent2"] + ">").to_numpy(dtype=object),
                r_url,
            )

    return pa.table(
        {
            "subj": pa.array(np.concatenate(subj), type=pa.string()),
            "pred": pa.array(np.concatenate(pred), type=pa.string()),
            "obj": pa.array(np.concatenate(obj), type=pa.string()),
            "url": pa.array(np.concatenate(prov), type=pa.string()),
        }
    )


class KGAnnotator:
    """Actor-pool stage: fused NER + linking + relation extraction + triple
    emission. The alias dict is fetched from the object store once per actor
    (broadcast small side)."""

    def __init__(self, alias_ref=None) -> None:
        if alias_ref is not None:
            import ray

            self.alias = ray.get(alias_ref)
        else:
            self.alias = dict(V.ALIAS_TO_ENTITY)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return page_triples(batch, self.alias)


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: canonicalize object terms (XSD canonical lexical
    forms + lang-tag case — the opt-in CanonicalizeLiteral/StreamCanonicalLangTag
    stage). Only literal rows need per-term work; IRIs/bnodes pass through."""
    obj = batch.column("obj").to_pandas()
    is_lit = obj.str.startswith('"')
    if is_lit.any():
        obj.loc[is_lit] = obj.loc[is_lit].map(T.canonicalize_term)
    return batch.set_column(
        batch.schema.get_field_index("obj"), "obj", pa.array(obj, type=pa.string())
    )
