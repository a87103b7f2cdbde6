"""Text-analysis operators for training-data curation over `documents`.

Each operator is a vectorized map_batches stage (pandas str / numpy kernels),
plus a global aggregate where the semantics need one. Stateful pieces
(compiled regexes, stopword tables) are actor-pool state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# deterministic per-language stopword marker sets (closed-vocabulary corpus:
# language id must come from text statistics, so we use the corpus's own
# function-word distribution per language)
EN_MARKERS = frozenset({"the", "a"})


def _read_docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _token_stats(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-doc (n_tokens, marker_count, distinct_count) over a
    batch: Arrow split + one token-hash pass (functions.hashing), marker
    membership by hash comparison, distinct via lexsorted first-occurrence.
    Replaces the round-1 per-doc ``toks.map(lambda ...)`` remnants."""
    import pyarrow as pa

    from jena_ray.functions.hashing import hash_string_array, tokenize_column

    tok_h, offs = tokenize_column(pa.array(list(texts), type=pa.string()))
    n_docs = len(offs) - 1
    n_tokens = np.diff(offs)
    marker_h = hash_string_array(pa.array(sorted(EN_MARKERS)))
    is_stop = np.isin(tok_h, marker_h)
    doc_idx = np.repeat(np.arange(n_docs), n_tokens)
    stop_counts = np.bincount(doc_idx, weights=is_stop, minlength=n_docs).astype(np.int64)
    order = np.lexsort((tok_h, doc_idx))
    d_s, h_s = doc_idx[order], tok_h[order]
    first = np.empty(len(h_s), dtype=bool)
    if len(h_s):
        first[0] = True
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    distinct = np.bincount(d_s[first], minlength=n_docs).astype(np.int64)
    return n_tokens.astype(np.int64), stop_counts, distinct


class QualityScorer:
    """Per-doc quality features: token count, mean token length, stopword
    ratio, distinct-token ratio. Deterministic; SQL-expressible for the
    oracle."""

    def __init__(self) -> None:
        self.stop = EN_MARKERS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_tokens, stop_counts, distinct = _token_stats(batch["text"].to_numpy())
        n_tokens = pd.Series(n_tokens, index=batch.index)
        stop_counts = pd.Series(stop_counts, index=batch.index)
        distinct = pd.Series(distinct, index=batch.index)
        tok_chars = batch["text"].str.len() - (n_tokens - 1)  # total non-space chars
        mean_tok_len = (tok_chars / n_tokens).astype("float64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens,
                "mean_tok_len": mean_tok_len,
                "stopword_ratio": (stop_counts / n_tokens).astype("float64"),
                "distinct_ratio": (distinct / n_tokens).astype("float64"),
            }
        )


def quality_scores(sf_dir: str):
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        QualityScorer, batch_format="pandas", concurrency=(1, 4), num_cpus=1
    ).sort("doc_id")


def language_id(sf_dir: str):
    """Heuristic language ID: a doc is 'en' iff it contains an English marker
    function word ('the'/'a'), else 'other'. (A real model slots into the
    same actor-pool stage; the rule is deterministic so the DuckDB oracle can
    replicate it.) Emits per-doc prediction + agreement with the source tag."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        _, stop_counts, _ = _token_stats(batch["text"].to_numpy())
        pred = pd.Series(
            np.where(stop_counts > 0, "en", "other"), index=batch.index
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "pred_lang": pred,
                "agree": (pred == batch["lang"]).astype("int64"),
            }
        )

    ds = _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
    return ds.map_batches(f, batch_format="pandas").sort("doc_id")


def token_counts(sf_dir: str):
    """Global token frequency: per-block partial counts → groupby sum
    (the canonical word-count; elephas NodeCount shape on text)."""
    import pyarrow as pa

    from jena_ray.stages.dedup import pre_aggregated_count

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ").explode()
        return pd.DataFrame({"token": toks.to_numpy()})

    ds = _read_docs(sf_dir, columns=["text"]).map_batches(explode, batch_format="pandas")
    return pre_aggregated_count(ds, ["token"], alias="count").sort("token")


def doc_fingerprints(sf_dir: str):
    """Per-doc content fingerprint (md5 hex) for fast change detection /
    exact-dup pre-screen. md5 rather than the engine's splitmix kernel so
    the DuckDB oracle can reproduce every value (round 1 used a per-byte
    Python FNV loop with only a rows-only determinism check); hashlib's C
    md5 is one call per doc — no per-byte Python."""
    import hashlib

    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)})

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


def text_metrics(sf_dir: str):
    """One row per doc with the full text-analysis feature set in a single
    pass: quality features (token count / mean token length / stopword and
    distinct ratios — QualityScorer), heuristic language id (+ agreement
    with the source tag), and the md5 content fingerprint. Consolidates
    quality_scores / language_id / doc_fingerprints for the driver registry
    (the driver records correctness rows for the first 50 queries only);
    the individual operators remain available above."""
    import hashlib

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        n_tokens, stop_counts, distinct = _token_stats(batch["text"].to_numpy())
        n_tokens = pd.Series(n_tokens, index=batch.index)
        stop_counts = pd.Series(stop_counts, index=batch.index)
        distinct = pd.Series(distinct, index=batch.index)
        tok_chars = batch["text"].str.len() - (n_tokens - 1)
        pred = pd.Series(
            np.where(stop_counts.to_numpy() > 0, "en", "other"),
            index=batch.index,
        )
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"]
        ]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens,
                "mean_tok_len": (tok_chars / n_tokens).astype("float64"),
                "stopword_ratio": (stop_counts / n_tokens).astype("float64"),
                "distinct_ratio": (distinct / n_tokens).astype("float64"),
                "pred_lang": pred,
                "agree": (pred == batch["lang"]).astype("int64"),
                "fingerprint": fps,
            }
        )

    ds = _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
    return ds.map_batches(f, batch_format="pandas").sort("doc_id")
