"""Document deduplication family: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data curation operators (graft brief).

All operators are deterministic (fixed hash seeds) and built on the engine's
two-phase shuffle primitives (jena_ray.stages.dedup): per-block vectorized
work → hash-bucket groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from jena_ray.stages.dedup import bucketed_group_apply
from jena_ray.term import murmur3_128

# --------------------------------------------------------------------------
# exact dedup (content-hash partition + per-group min)
# --------------------------------------------------------------------------


def exact_dedup_docs(sf_dir: str):
    """Exact text dedup: md5(text) → keep the smallest doc_id per hash.
    Hash-partition + per-group-first (SURVEY.md §2.7); the survivor rule
    (min doc_id) makes the result order-independent and SQL-checkable."""
    import hashlib

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch["text_md5"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"]
        ]
        return batch[["doc_id", "text_md5"]]

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("text_md5", sort=False)["doc_id"].agg(["min", "count"])
        return pd.DataFrame(
            {
                "text_md5": agg.index.to_numpy(),
                "keep_doc_id": agg["min"].to_numpy(),
                "n_dups": agg["count"].to_numpy(),
            }
        )

    # two-phase: local min/count per block, then merge partials per bucket
    local = hashed.map_batches(keep_min, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("text_md5", sort=False).agg(
            keep_doc_id=("keep_doc_id", "min"), n_dups=("n_dups", "sum")
        )
        return agg.reset_index()

    return bucketed_group_apply(local, ["text_md5"], merge).sort("text_md5")


# --------------------------------------------------------------------------
# MinHash + LSH near-dedup
# --------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int = N_PERM) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic permutation parameters from murmur3 of the index."""
    a = np.empty(n_perm, dtype=np.uint64)
    b = np.empty(n_perm, dtype=np.uint64)
    for i in range(n_perm):
        h1, h2 = murmur3_128(f"perm{i}".encode(), seed=7)
        a[i] = (h1 % (_MERSENNE - 1)) + 1
        b[i] = h2 % _MERSENNE
    return a, b


_PERM_A, _PERM_B = _perm_params()


def shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (murmur3 low-64, deterministic)."""
    toks = text.split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = np.unique(
        np.array([murmur3_128(g.encode())[0] & ((1 << 61) - 1) for g in grams], dtype=np.uint64)
    )
    return out


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """64-perm MinHash signature, vectorized: min((a*x+b) mod p) per perm."""
    if len(sh) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    x = sh[None, :].astype(np.object_)  # python ints avoid uint64 overflow
    vals = (_PERM_A[:, None].astype(np.object_) * x + _PERM_B[:, None].astype(np.object_)) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


class MinHasher:
    """Actor-pool stage: doc → LSH band rows (band_id, band_hash, doc_id).
    Signature computed once per doc; bands emitted for the bucket groupby."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids = []
        band_ids = []
        band_hashes = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            sig = minhash_signature(shingles(text))
            for b in range(N_BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                h = murmur3_128(chunk.tobytes(), seed=b)[0]
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(np.uint64(h))
        return pd.DataFrame(
            {
                "doc_id": np.array(doc_ids, dtype=np.int64),
                "band_id": np.array(band_ids, dtype=np.int64),
                "band_hash": np.array(band_hashes, dtype=np.uint64).astype(np.int64),
            }
        )


def minhash_candidate_pairs(sf_dir: str):
    """Near-dup candidate pairs via MinHash LSH: shingle → minhash → band →
    bucket groupby → pairs within a bucket. Returns distinct (doc_a, doc_b)
    with doc_a < doc_b."""
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bands = ds.map_batches(
        MinHasher, batch_format="pandas", concurrency=(1, 4), num_cpus=1
    )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), grp in df.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(grp["doc_id"].unique())
            if len(ids) > 1:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": np.array([], dtype=np.int64), "doc_b": np.array([], dtype=np.int64)})
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    pairs = bucketed_group_apply(bands, ["band_id", "band_hash"], pairs_in_bucket)
    return dedup_exact(pairs, cols=("doc_a", "doc_b")).sort(["doc_a", "doc_b"])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over tokens (murmur3 per token, deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split(" "):
        h = murmur3_128(tok.encode())[0]
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_docs(sf_dir: str):
    """Per-doc 64-bit SimHash (hex) — near-dup clustering key."""
    import ray.data as rd

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": [format(simhash64(t), "016x") for t in batch["text"]],
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(f, batch_format="pandas").sort("doc_id")


# --------------------------------------------------------------------------
# n-gram Jaccard verification (over candidate pairs)
# --------------------------------------------------------------------------


def verified_near_dups(sf_dir: str, threshold: float = 0.8):
    """MinHash-LSH candidates verified by true 3-gram Jaccard ≥ threshold.

    The verify side joins each candidate pair back to its shingle sets: the
    doc_id→shingles map for candidate docs only is broadcast (candidates are
    a tiny fraction of the corpus — the small side by construction)."""
    import ray
    import ray.data as rd

    pairs_ds = minhash_candidate_pairs(sf_dir)
    pairs = pairs_ds.to_pandas()
    if len(pairs) == 0:
        return pairs_ds
    cand_ids = np.unique(np.concatenate([pairs["doc_a"], pairs["doc_b"]]))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def keep_cands(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        mask = np.isin(ids, cand_ids)
        return t.filter(pa.array(mask))

    cand_docs = docs.map_batches(keep_cands, batch_format="pyarrow").to_pandas()
    sh = {r.doc_id: shingles(r.text) for r in cand_docs.itertuples()}
    sh_ref = ray.put(sh)

    class Verify:
        def __init__(self, ref):
            self.sh = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = []
            for a, b in zip(batch["doc_a"], batch["doc_b"]):
                sa, sb = self.sh[a], self.sh[b]
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                jac.append(inter / union if union else 0.0)
            batch["jaccard"] = jac
            return batch[np.asarray(jac) >= threshold]

    return pairs_ds.map_batches(
        Verify, fn_constructor_args=(sh_ref,), batch_format="pandas",
        concurrency=(1, 4), num_cpus=1,
    ).sort(["doc_a", "doc_b"])
