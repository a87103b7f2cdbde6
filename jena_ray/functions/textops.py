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


class QualityScorer:
    """Per-doc quality features: token count, mean token length, stopword
    ratio, distinct-token ratio. Deterministic; SQL-expressible for the
    oracle."""

    def __init__(self) -> None:
        self.stop = EN_MARKERS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        tok_chars = batch["text"].str.len() - (n_tokens - 1)  # total non-space chars
        mean_tok_len = (tok_chars / n_tokens).astype("float64")
        stop_counts = toks.map(lambda ws: sum(w in EN_MARKERS for w in ws))
        distinct = toks.map(lambda ws: len(set(ws)))
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
        toks = batch["text"].str.split(" ")
        pred = toks.map(lambda ws: "en" if any(w in EN_MARKERS for w in ws) else "other")
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


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def _fnv1a_tokens(tokens: list[str]) -> int:
    """FNV-1a over the token stream — deterministic document fingerprint."""
    h = _FP_OFFSET
    for t in tokens:
        for b in t.encode("utf-8"):
            h = (h ^ np.uint64(b)) * _FP_BASE
        h = (h ^ np.uint64(0x20)) * _FP_BASE
    return int(h)


def doc_fingerprints(sf_dir: str):
    """Per-doc rolling-hash fingerprint (FNV-1a over tokens) for fast
    change detection / exact-dup pre-screen. Deterministic; rows-only check
    (no SQL hash equivalent)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            fps = [
                format(_fnv1a_tokens(t.split(" ")), "016x") for t in batch["text"]
            ]
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fps})

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(f, batch_format="pandas").sort("doc_id")
