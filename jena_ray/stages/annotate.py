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


class CrossEncoderScorer:
    """Deterministic stand-in for the cross-encoder (mention, candidate)
    scorer: hashed surface/entity features → fixed-weight MLP → score.

    The weights are seeded constants loaded once per actor (the model-load
    pattern; a real transformer slots in with the same signature), and the
    forward pass is batched numpy matmuls — the compute profile of real
    batched CPU inference, which is what dominates KG construction at crawl
    scale. Scores are deterministic, so pipeline output is reproducible.
    """

    # sized to ~15ms/doc on one core — the compute profile of real batched
    # CPU inference (a distilled transformer cross-encoder)
    DIM = 512
    LAYERS = 14
    VOCAB = 4096

    def __init__(self, seed: int = 3):
        rng = np.random.RandomState(seed)  # fixed weights — deterministic
        self.emb = (rng.normal(size=(self.VOCAB, self.DIM)) / 16).astype(np.float32)
        self.w1 = (rng.normal(size=(self.DIM, self.DIM)) / np.sqrt(self.DIM)).astype(
            np.float32
        )
        self.w2 = (rng.normal(size=(self.DIM, 1)) / np.sqrt(self.DIM)).astype(np.float32)

    def _feature_ids(self, values: pd.Series) -> np.ndarray:
        h = pd.util.hash_pandas_object(values, index=False).to_numpy()
        return (h % np.uint64(self.VOCAB)).astype(np.int64)

    def score(self, surfaces: pd.Series, entities: pd.Series) -> np.ndarray:
        x = self.emb[self._feature_ids(surfaces)] + self.emb[self._feature_ids(entities)]
        h = x
        for _ in range(self.LAYERS):
            h = np.maximum(h @ self.w1, 0.0)
        return (h @ self.w2).ravel().astype(np.float64)


def link_mentions(
    mentions: pd.DataFrame,
    alias_to_entity: dict[str, str],
    scorer: CrossEncoderScorer | None = None,
) -> pd.DataFrame:
    """Entity linking: candidate generation via the broadcast alias dict +
    cross-encoder scoring + per-mention argmax.

    The closed dictionary yields exactly one candidate per surface, so the
    argmax cannot change the linked entity — the scorer exercises the real
    inference cost and its scores flow through, while output remains exactly
    reproducible (and SQL-oracle checkable).
    """
    out = mentions.copy()
    out["entity"] = out["surface"].map(alias_to_entity)
    if scorer is not None and len(out):
        out["score"] = scorer.score(out["surface"], out["entity"])
    else:
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


_SPLITMIX_1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public algorithm, Vigna 2015)."""
    x = (x + _SPLITMIX_1).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * _SPLITMIX_2).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * _SPLITMIX_3).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _mention_bnode_labels(urls: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """32-hex-char skolem labels for mention bnodes, vectorized.

    One murmur3-128 per unique url gives the per-document 128-bit seed
    (bnode_seed); the mention position is mixed into the low half with
    splitmix64. Fresh-bnode semantics match BlankNodeAllocatorHash.create
    (counter fed through the per-run seed, .java:104-112): deterministic,
    collision-resistant, independent of partitioning."""
    uniq, inv = np.unique(urls, return_inverse=True)
    h1 = np.empty(len(uniq), dtype=np.uint64)
    h2 = np.empty(len(uniq), dtype=np.uint64)
    for i, u in enumerate(uniq):
        a, b = T.murmur3_128((JOB_SEED + "\x00" + u).encode("utf-8"))
        h1[i], h2[i] = a, b
    lo = h1[inv] ^ _splitmix64(pos.astype(np.uint64))
    hi = h2[inv]
    with np.errstate(over="ignore"):
        return np.array(
            ["_:%016x%016x" % (a, b) for a, b in zip(lo, hi)], dtype=object
        )


def _ts_lexical(ts: pd.Series) -> pd.Series:
    """xsd:dateTime canonical lexical form (UTC, no fractional zeros)."""
    s = ts.dt.strftime("%Y-%m-%dT%H:%M:%S")
    frac = ts.dt.strftime(".%f").str.rstrip("0").replace({".": ""}, regex=False)
    return s + frac.where(frac != ".", "") + "Z"


def page_triples(
    batch: pa.Table,
    alias_to_entity: dict[str, str],
    num_shards: int = 1,
    scorer: CrossEncoderScorer | None = None,
) -> pa.Table:
    """One fused pass: pages batch → triples batch (metadata + mentions +
    provenance bnodes + relations). Pure function; deterministic. The `part`
    column (doc_id % num_shards) keys the partitioned phase-1 write."""
    part_ids = (batch.column("doc_id").to_numpy() % num_shards).astype("int64")
    df = batch.select(["url", "text", "lang", "warc_ts", "source", "n_chars"]).to_pandas()
    n = len(df)
    urls = df["url"]
    doc_iri = "<" + urls + ">"

    url_part = dict(zip(df["url"], part_ids))
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

    # --- NER → linking (cross-encoder scoring) ---
    toks = tokenize(df["text"])
    mentions = detect_mentions(toks)
    linked = link_mentions(mentions, alias_to_entity, scorer)

    if len(linked):
        m_url = urls.iloc[linked["row"].to_numpy()].to_numpy(dtype=object)
        m_doc = "<" + m_url + ">"
        ent_iri = ("<" + V.ENT + linked["entity"] + ">").to_numpy(dtype=object)
        emit(m_doc, V.P_MENTIONS, ent_iri, m_url)

        # skolemized mention provenance bnodes: one per (url, pos).
        # Deterministic + per-document-scoped like BlankNodeAllocatorHash, but
        # vectorized: one murmur3 per UNIQUE url (the per-doc seed), then the
        # mention position mixed in with splitmix64 — labels depend only on
        # (job seed, url, pos), never on shard/order.
        bn = _mention_bnode_labels(m_url, linked["pos"].to_numpy())
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

    urls_all = np.concatenate(prov)
    parts_all = pd.Series(urls_all).map(url_part).to_numpy(dtype=np.int64)
    return pa.table(
        {
            "subj": pa.array(np.concatenate(subj), type=pa.string()),
            "pred": pa.array(np.concatenate(pred), type=pa.string()),
            "obj": pa.array(np.concatenate(obj), type=pa.string()),
            "url": pa.array(urls_all, type=pa.string()),
            "part": pa.array(parts_all, type=pa.int64()),
        }
    )


class KGAnnotator:
    """Actor-pool stage: fused NER + linking + relation extraction + triple
    emission. The alias dict is fetched from the object store once per actor
    (broadcast small side)."""

    def __init__(self, alias_ref=None, num_shards: int = 1, use_scorer: bool = True) -> None:
        if alias_ref is not None:
            import ray

            self.alias = ray.get(alias_ref)
        else:
            self.alias = dict(V.ALIAS_TO_ENTITY)
        self.num_shards = num_shards
        # model weights built once per actor (TextIndexLucene singleton pattern)
        self.scorer = CrossEncoderScorer() if use_scorer else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        return page_triples(batch, self.alias, self.num_shards, self.scorer)


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: canonicalize object terms (XSD canonical lexical
    forms + lang-tag case — the opt-in CanonicalizeLiteral/StreamCanonicalLangTag
    stage). Only literal rows need per-term work; IRIs/bnodes pass through.
    Literal values repeat heavily (surfaces, lang tags), so the per-term
    function runs once per UNIQUE literal and is mapped back via a dict."""
    obj = batch.column("obj").to_pandas()
    is_lit = obj.str.startswith('"')
    if is_lit.any():
        lits = obj.loc[is_lit]
        mapping = {v: T.canonicalize_term(v) for v in pd.unique(lits)}
        obj.loc[is_lit] = lits.map(mapping)
    return batch.set_column(
        batch.schema.get_field_index("obj"), "obj", pa.array(obj, type=pa.string())
    )
