"""Similarity search over the embeddings table.

- Brute-force cosine top-k: the query matrix is broadcast (ray.put) and each
  batch does one numpy matmul against it — the baseline and the verifier.
- LSH-bucketed variant (random-hyperplane signs): the scale path — candidates
  only compared within matching hash buckets.

Deterministic: query vectors are the first `n_queries` embeddings by vec_id;
hyperplanes derive from a fixed seed.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    mat = np.vstack([np.asarray(v, dtype=np.float32) for v in emb.to_pylist()])
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(sf_dir: str, n_queries: int = 4, k: int = 5):
    """For each of the first `n_queries` vectors (by vec_id): cosine top-k
    neighbours (excluding self). Per-batch partial top-k (numpy matmul +
    argpartition) → tiny global merge — no shuffle of the corpus."""
    import ray

    emb = _read_emb(sf_dir)

    def first_rows(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        return t.filter(pa.array(ids < n_queries))

    qtab = pa.concat_tables(
        emb.map_batches(first_rows, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    q_ids, q_mat = _batch_matrix(qtab)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])
    q_ref = ray.put((q_ids, q_mat))

    class PartialTopK:
        def __init__(self, ref):
            self.q_ids, self.q = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            sims = _normalize(mat) @ self.q.T  # (batch, nq)
            out = []
            for qi, qid in enumerate(self.q_ids):
                col = sims[:, qi]
                mask = ids != qid  # exclude self
                cids, csims = ids[mask], col[mask]
                if len(cids) > k:
                    top = np.argpartition(-csims, k)[:k]
                    cids, csims = cids[top], csims[top]
                for cid, s in zip(cids, csims):
                    out.append((int(qid), int(cid), float(s)))
            return pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])

    partials = emb.map_batches(
        PartialTopK, fn_constructor_args=(q_ref,), batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=1,
    )
    # global merge: tiny (n_queries × k × num_blocks rows) → driver-side heap
    df = partials.to_pandas()
    rows = []
    for qid, grp in df.groupby("query_id", sort=True):
        best = heapq.nlargest(k, grp.itertuples(index=False), key=lambda r: (r.cosine, -r.vec_id))
        for rank, r in enumerate(sorted(best, key=lambda r: (-r.cosine, r.vec_id)), 1):
            rows.append((qid, rank, r.vec_id, round(r.cosine, 6)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cosine"])


N_PLANES = 8


def _hyperplanes(dim: int, seed: int = 13) -> np.ndarray:
    rng = np.random.RandomState(seed)  # fixed seed: deterministic planes
    return rng.normal(size=(N_PLANES, dim)).astype(np.float32)


def lsh_buckets(sf_dir: str):
    """Random-hyperplane LSH bucket id per vector — the ANN scale path:
    top-k search only compares within a bucket (and its Hamming-1
    neighbours), turning the all-pairs matmul into bucket-local work."""
    import ray

    emb = _read_emb(sf_dir)
    # probe one batch for dimensionality
    first = next(iter(emb.limit(1).iter_batches(batch_format="pyarrow")))
    dim = len(first.column("embedding")[0].as_py())
    planes_ref = ray.put(_hyperplanes(dim))

    class Bucketize:
        def __init__(self, ref):
            self.planes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            signs = (mat @ self.planes.T) > 0
            bucket = (signs.astype(np.int64) << np.arange(N_PLANES)).sum(axis=1)
            return pd.DataFrame({"vec_id": ids, "bucket": bucket})

    return emb.map_batches(
        Bucketize, fn_constructor_args=(planes_ref,), batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=1,
    ).sort("vec_id")


def embedding_near_dups(sf_dir: str, threshold: float = 0.98):
    """Embedding-cosine near-duplicate pairs via LSH buckets: vectors sharing
    a bucket are compared pairwise (bucket-local matmul); pairs with cosine ≥
    threshold survive. Returns (vec_a, vec_b, cosine), vec_a < vec_b."""
    import ray

    emb = _read_emb(sf_dir)
    first = next(iter(emb.limit(1).iter_batches(batch_format="pyarrow")))
    dim = len(first.column("embedding")[0].as_py())
    planes_ref = ray.put(_hyperplanes(dim))

    class WithBucket:
        def __init__(self, ref):
            self.planes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids, mat = _batch_matrix(batch)
            signs = (mat @ self.planes.T) > 0
            bucket = (signs.astype(np.int64) << np.arange(N_PLANES)).sum(axis=1)
            return pd.DataFrame(
                {"vec_id": ids, "bucket": bucket, "embedding": list(_normalize(mat))}
            )

    from jena_ray.stages.dedup import bucketed_group_apply

    withb = emb.map_batches(
        WithBucket, fn_constructor_args=(planes_ref,), batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=1,
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in df.groupby("bucket", sort=False):
            if len(grp) < 2:
                continue
            ids = grp["vec_id"].to_numpy()
            mat = np.vstack(grp["embedding"].to_numpy())
            sims = mat @ mat.T
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = sims[ia, ib] >= threshold
            for a, b, s in zip(ids[ia[keep]], ids[ib[keep]], sims[ia, ib][keep]):
                lo, hi = (int(a), int(b)) if a < b else (int(b), int(a))
                rows.append((lo, hi, round(float(s), 6)))
        return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"])

    out = bucketed_group_apply(withb, ["bucket"], pairs, num_buckets=16)
    from jena_ray.stages.dedup import dedup_exact

    return dedup_exact(out, cols=("vec_a", "vec_b"), keep_cols=("cosine",)).sort(
        ["vec_a", "vec_b"]
    )
