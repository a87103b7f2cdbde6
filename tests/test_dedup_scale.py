"""Scale hazards of the dedup family: LSH bucket blow-up and the exact-
collapse prelude (round-2 verdict "what's wrong" #2 — a boilerplate-heavy
crawl puts millions of identical docs in one band bucket; C(n,2) emission
is O(n²))."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(doc_ids, texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    )


@pytest.fixture()
def adversarial_dir(ray_session, tmp_path):
    """10k IDENTICAL docs (the boilerplate flood) + two seeded near-dup
    pairs that must survive every mitigation."""
    import pyarrow.parquet as pq

    flood = ["the same boilerplate page body repeated verbatim again"] * 10_000
    seeded = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        "one two three four five six seven eight nine ten eleven",
        "one two three four five six seven eight nine ten twelve",
    ]
    texts = flood + seeded
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_collapse_exact_docs(ray_session, tmp_path):
    from jena_ray.functions.dedup_ops import collapse_exact_docs

    ds = _docs_ds([5, 3, 9, 7], ["a a", "a a", "b b", "a a"])
    out = collapse_exact_docs(ds).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [3, 9]  # min id per distinct text


def test_lsh_flood_bounded_with_recall(adversarial_dir):
    """collapse_exact + bucket cap: the 10k-identical flood finishes in
    bounded time and the seeded near-dup pairs are still candidates."""
    from jena_ray.functions.dedup_ops import minhash_candidate_pairs

    t0 = time.perf_counter()
    pairs = minhash_candidate_pairs(
        adversarial_dir, collapse_exact=True, bucket_cap=64
    ).to_pandas()
    took = time.perf_counter() - t0
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # seeded pairs recalled
    assert (10_000, 10_001) in got
    assert (10_002, 10_003) in got
    # the flood collapsed: no pair may touch two flood members
    flood_pairs = [p for p in got if p[0] < 10_000 and p[1] < 10_000]
    assert flood_pairs == []
    assert took < 120, f"flood run took {took:.1f}s — blow-up not bounded"


def test_bucket_cap_star_links(ray_session, monkeypatch, tmp_path):
    """Near-identical (not exact) flood: the cap star-links the bucket —
    n-1 pairs to the min id instead of C(n,2)."""
    import pyarrow.parquet as pq

    from jena_ray.functions.dedup_ops import minhash_candidate_pairs

    texts = [
        f"common shared boilerplate sentence body here tail{'x' if i % 997 == 0 else ''}"
        for i in range(300)
    ]
    t = pa.table({
        "doc_id": pa.array(range(300), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    pairs = minhash_candidate_pairs(
        str(tmp_path), bucket_cap=16
    ).to_pandas()
    # bounded: far below C(300,2)=44850
    assert len(pairs) <= 300 * 3
    # connectivity: every doc reachable from the representative (doc 0)
    assert set(pairs["doc_a"]).issubset({0} | set(range(300)))
    touched = set(pairs["doc_a"]) | set(pairs["doc_b"])
    assert len(touched) >= 299
