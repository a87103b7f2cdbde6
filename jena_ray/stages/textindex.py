"""Free-text index side-car: inverted index build + ranked search.

The reference couples a Lucene index to the graph for ``text:query``
(jena-text TextIndexLucene.java:82 — the index is built alongside the
dataset and queried as a property function). Ray-Data-first analog:

- **build**: documents → per-block vectorized (token, doc_id, tf)
  postings (a document's text lives in one row, so block-local term
  frequencies are exact — no combine shuffle needed for tf), hash-bucketed
  by token and written sorted (token, doc_id) to
  ``text/bucket=<h(token)%B>/`` — the posting-list file layout. The
  vocabulary side-car ``vocab/`` ((token, df) per bucket) comes from a
  column-pruned second pass over the postings parquet (token column only).
- **search**: each query term maps to exactly one bucket (hash-pruned
  read, the posting-list seek analog), the tiny per-term df slice
  resolves idf, and scoring is one vectorized pass: score(doc) =
  Σ_t tf(t, doc) · ln(1 + N/df(t)) — classic tf-idf, deterministic and
  SQL-expressible so the driver oracle can replicate every value.

Scale notes: posting lists are partitioned by token hash, so hub tokens
(stopwords) skew buckets — ``build_text_index(stoplist_df_frac=x)`` is the
crawl-scale mitigation (df-capped stoplist: postings for df > x·N are
dropped at build, stopped query terms skipped at search). Queries touch
only their terms' buckets; the corpus never shuffles at query time.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_text_meta.json")


# ----------------------------------------------------------------- analyzers
# Pluggable tokenizers (round-4) mirroring jena-text's configurable Lucene
# analyzer surface (jena-text TextIndexConfig/analyzer assembler):
#   standard   — whitespace split (the engine's original behavior; keeps
#                the SQL oracle's string_split(text, ' ') equivalence)
#   lowercase  — lowercase + alphanumeric word extraction (Lucene
#                StandardAnalyzer-ish)
#   ascii_fold — lowercase + NFKD accent folding (ASCIIFoldingFilter)
#   cjk_bigram — latin words lowercased + CJK-run BIGRAMS (CJKAnalyzer)
# The analyzer is fixed at BUILD time (recorded in _text_meta.json) and
# re-applied to query terms at search time — index and query must agree,
# exactly as a Lucene index bakes its analyzer in.

_CJK = r"\u4e00-\u9fff\u3040-\u30ff\u31f0-\u31ff\uac00-\ud7af"


def _an_standard(s):
    return s.str.split(" ")


def _an_lowercase(s):
    return s.str.lower().str.findall(r"[0-9a-z]+")


def _an_ascii_fold(s):
    import unicodedata

    def fold(x: str) -> str:
        return "".join(
            ch for ch in unicodedata.normalize("NFKD", x)
            if not unicodedata.combining(ch)
        )

    return s.map(fold, na_action="ignore").str.lower().str.findall(r"[0-9a-z]+")


def _an_cjk_bigram(s):
    import re as _re

    pat = _re.compile(rf"[0-9a-z]+|[{_CJK}]+")

    def toks(x: str) -> list[str]:
        out = []
        for run in pat.findall(x.lower()):
            if _re.match(rf"[{_CJK}]", run):
                if len(run) == 1:
                    out.append(run)
                else:
                    out.extend(run[i:i + 2] for i in range(len(run) - 1))
            else:
                out.append(run)
        return out

    return s.map(toks, na_action="ignore")


ANALYZERS = {
    "standard": _an_standard,
    "lowercase": _an_lowercase,
    "ascii_fold": _an_ascii_fold,
    "cjk_bigram": _an_cjk_bigram,
}


def analyze_terms(terms: list[str], analyzer: str) -> list[str]:
    """Apply the index's analyzer to QUERY terms (flattened)."""
    import pandas as pd

    tok = ANALYZERS[analyzer](pd.Series(list(terms), dtype=object))
    return [t for lst in tok for t in (lst or [])]


def build_text_index(
    docs,
    out_dir: str,
    *,
    num_buckets: int = 16,
    min_rows_per_file: int = 500_000,
    analyzer: str = "standard",
    stoplist_df_frac: float | None = None,
    positions: bool = False,
) -> str:
    """documents Dataset (doc_id, text) → ``text/`` postings + ``vocab/`` df
    table + ``_text_meta.json`` (doc count). Idempotent: a completed build
    (meta present) is reused.

    ``stoplist_df_frac`` (round-5, the crawl-scale knob this module's scale
    note promised): tokens whose document frequency exceeds
    ``stoplist_df_frac × n_docs`` are DROPPED from the postings — a
    df-capped stoplist. A hub token ("the") otherwise concentrates an
    O(corpus)-row posting list in one hash bucket at build time and makes
    any query containing it read that list whole; past the cap its idf is
    ~ln(1+1/frac) ≈ noise anyway (Lucene reaches the same end through
    scoring). The stoplist lands in ``_text_meta.json`` (bounded: at most
    total_postings/(frac·N) tokens can exceed the cap) and search skips
    stopped query terms. Default ``None`` keeps every token — the
    oracle-comparable build.

    ``positions=True`` (round-5) additionally stores each posting's token
    positions as a packed int32 blob — the Lucene positions file —
    enabling :func:`phrase_search`. Off by default: positions roughly
    double posting bytes and tf-idf search never reads them."""
    import ray.data as rd

    from jena_ray.stages.dedup import add_bucket

    if os.path.exists(_meta_path(out_dir)):
        return out_dir

    import shutil

    shutil.rmtree(os.path.join(out_dir, "text"), ignore_errors=True)
    shutil.rmtree(os.path.join(out_dir, "vocab"), ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    n_docs = docs.count()
    id_type = docs.schema().base_schema.field("doc_id").type
    id_kind = "binary16" if id_type == pa.binary(16) else "int64"

    if analyzer not in ANALYZERS:
        raise ValueError(f"unknown text analyzer {analyzer!r}; "
                         f"one of {sorted(ANALYZERS)}")

    def postings(batch: pd.DataFrame) -> pa.Table:
        import pyarrow.compute as pc

        toks = ANALYZERS[analyzer](batch["text"])
        doc_ids = np.repeat(batch["doc_id"].to_numpy(), toks.str.len().to_numpy())
        ex = toks.explode()
        # an analyzer may emit ZERO tokens for a doc (e.g. lowercase over
        # pure CJK text); explode turns the empty list into one NaN row
        # that str.len counted as 0 — drop it to keep alignment
        flat = ex[ex.notna()].to_numpy()
        df = pd.DataFrame({"token": flat, "doc_id": doc_ids})
        if positions:
            # position = token index within its doc (explode preserves
            # document order); packed little-endian int32 per posting
            df["pos"] = df.groupby("doc_id", sort=False).cumcount()
            g = df.groupby(["token", "doc_id"], sort=False)["pos"].agg(list)
            df = g.reset_index()
            df["tf"] = df["pos"].str.len()
            df["positions"] = [
                np.asarray(p, dtype="<i4").tobytes() for p in df["pos"]
            ]
            df = df[["token", "doc_id", "tf", "positions"]]
        else:
            df = (
                df.groupby(["token", "doc_id"], sort=False)
                .size()
                .reset_index(name="tf")
            )
        t = pa.Table.from_pandas(df, preserve_index=False)
        if id_kind == "binary16":
            # pandas round-trips fixed_size_binary ids as object bytes →
            # variable binary; restore the id dtype so text_match bindings
            # join the fixed_size_binary(16) id space directly
            i = t.schema.get_field_index("doc_id")
            t = t.set_column(i, "doc_id", pc.cast(t.column("doc_id"), id_type))
        t = add_bucket(t, ["token"], num_buckets)
        return t.rename_columns(
            [("bucket" if c == "_bucket" else c) for c in t.schema.names]
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if id_kind == "binary16" and g.column("doc_id").type != id_type:
            # an EMPTY pandas postings batch infers doc_id as a loose type
            # and ray's schema unification then degrades fixed_size_binary
            # to variable binary for the whole shuffle — restore before
            # writing the layout
            i = g.schema.get_field_index("doc_id")
            g = g.set_column(i, "doc_id", pc.cast(g.column("doc_id"), id_type))
        idx = pc.sort_indices(
            g, sort_keys=[("token", "ascending"), ("doc_id", "ascending")]
        )
        return g.take(idx)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["token", "bucket"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["token", "bucket", "_partial"])

    from ray.data.aggregate import Sum

    stoplist: list[str] = []
    if stoplist_df_frac is not None:
        # df pre-pass BEFORE the postings land: vocabulary from the
        # tokenized stream (each (token, doc) pair is one postings row, so
        # df = row count per token), stoplist from its hub tail, postings
        # then written WITHOUT the stopped tokens — bounded buckets by
        # construction
        pre = docs.map_batches(postings, batch_format="pandas")
        vocab = (
            pre.map_batches(partial, batch_format="pyarrow")
            .groupby(["token", "bucket"])
            .aggregate(Sum("_partial", alias_name="df"))
        ).materialize()
        cap = stoplist_df_frac * n_docs
        big = vocab.map_batches(
            lambda t, _c=cap: t.filter(
                __import__("pyarrow").compute.greater(t.column("df"), _c)
            ).select(["token"]),
            batch_format="pyarrow",
        )
        stoplist = sorted(
            tok for b in big.iter_batches(batch_format="pyarrow")
            for tok in b.column("token").to_pylist()
        )
        stop_set = frozenset(stoplist)

        def drop_stopped(t: pa.Table, _s=stop_set) -> pa.Table:
            import pyarrow.compute as pc

            if not _s:
                return t
            return t.filter(pc.invert(pc.is_in(
                t.column("token"), value_set=pa.array(sorted(_s))
            )))

        out = (
            docs.map_batches(postings, batch_format="pandas")
            .map_batches(drop_stopped, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pyarrow")
        )
        out.write_parquet(
            os.path.join(out_dir, "text"),
            partition_cols=["bucket"],
            min_rows_per_file=min_rows_per_file,
        )
        vocab.write_parquet(
            os.path.join(out_dir, "vocab"),
            partition_cols=["bucket"],
            min_rows_per_file=min_rows_per_file,
        )
    else:
        out = (
            docs.map_batches(postings, batch_format="pandas")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pyarrow")
        )
        out.write_parquet(
            os.path.join(out_dir, "text"),
            partition_cols=["bucket"],
            min_rows_per_file=min_rows_per_file,
        )

        # vocabulary (token, df): column-pruned pass over the postings —
        # each (token, doc) pair is one row, so df = row count per token;
        # the bucket column rides along so vocab/ shares the postings'
        # hash layout.
        post = rd.read_parquet(
            os.path.join(out_dir, "text"), columns=["token", "bucket"]
        )
        vocab = (
            post.map_batches(partial, batch_format="pyarrow")
            .groupby(["token", "bucket"])
            .aggregate(Sum("_partial", alias_name="df"))
        )
        vocab.write_parquet(
            os.path.join(out_dir, "vocab"),
            partition_cols=["bucket"],
            min_rows_per_file=min_rows_per_file,
        )

    with open(_meta_path(out_dir), "w") as f:
        json.dump(
            {"n_docs": int(n_docs), "num_buckets": num_buckets,
             "id_kind": id_kind, "analyzer": analyzer,
             "stoplist_df_frac": stoplist_df_frac, "stoplist": stoplist,
             "positions": positions},
            f,
        )
    return out_dir


def _drop_stopped_terms(terms: list[str], meta: dict) -> list[str]:
    """Skip query terms the index's df-capped stoplist dropped at build
    time (their postings don't exist; matching Lucene, a stopped term
    contributes nothing to the query)."""
    stop = set(meta.get("stoplist") or [])
    if not stop:
        return terms
    dropped = [t for t in terms if t in stop]
    if dropped:
        import logging

        logging.getLogger(__name__).warning(
            "text index stoplist: skipping hub query terms %s", dropped
        )
    return [t for t in terms if t not in stop]


def _token_bucket(token: str, num_buckets: int) -> int:
    from jena_ray.stages.dedup import _key_hash

    h = _key_hash(pa.table({"t": pa.array([token])}), ["t"])
    return int(h[0]) % num_buckets


def text_match(index_dir: str, terms: list[str], *, id_col: str = "doc_id"):
    """Unranked OR match (the text:query property-function shape — jena-text
    TextQueryPF binds the subject var to every index hit): one int64 column
    ``id_col`` of doc keys whose text contains ANY query term. Only the
    terms' hash buckets are read. Dedup is BLOCK-LOCAL only — a doc matching
    several terms can appear once per term — because the result feeds
    ``Dataset.join`` in the BGP chain, and ray 2.49 joins reject the
    zero-column empty blocks a groupby().map_groups global dedup emits for
    empty partitions; the BGP's final distinct collapses the duplicates."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_batch

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    nb = meta["num_buckets"]

    terms = sorted(set(
        analyze_terms(terms, meta.get("analyzer", "standard"))
    ))
    terms = _drop_stopped_terms(terms, meta)
    by_bucket: dict[int, list[str]] = {}
    for t in terms:
        by_bucket.setdefault(_token_bucket(t, nb), []).append(t)

    datasets = []
    for b, ts in by_bucket.items():
        path = os.path.join(index_dir, "text", f"bucket={b}")
        if not os.path.isdir(path):
            continue
        datasets.append(
            rd.read_parquet(
                path, columns=["doc_id"], filter=pc.field("token").isin(ts)
            )
        )
    if not datasets:
        empty_t = (pa.binary(16) if meta.get("id_kind") == "binary16"
                   else pa.int64())
        return rd.from_arrow(pa.table({id_col: pa.array([], empty_t)}))
    matches = datasets[0] if len(datasets) == 1 else datasets[0].union(*datasets[1:])

    fix_type = (pa.binary(16) if meta.get("id_kind") == "binary16" else None)

    def local(tb: pa.Table, _n=id_col, _t=fix_type) -> pa.Table:
        if _t is not None and tb.column("doc_id").type != _t:
            import pyarrow.compute as pc

            tb = tb.set_column(0, "doc_id", pc.cast(tb.column("doc_id"), _t))
        return dedup_batch(tb, ["doc_id"]).rename_columns([_n])

    return matches.map_batches(local, batch_format="pyarrow")


def text_search(index_dir: str, terms: list[str], k: int = 20):
    """Ranked OR-query (Lucene/text:query semantics): docs matching any term,
    scored Σ tf·idf with idf = ln(1 + N/df), top-k by (score desc, doc_id).

    Only the query terms' hash buckets are read (posting-list seeks); the
    score integerizes to micros before ranking so the top-k cut is stable
    across engines."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    n_docs, nb = meta["n_docs"], meta["num_buckets"]

    terms = sorted(set(
        analyze_terms(terms, meta.get("analyzer", "standard"))
    ))
    terms = _drop_stopped_terms(terms, meta)
    by_bucket: dict[int, list[str]] = {}
    for t in terms:
        by_bucket.setdefault(_token_bucket(t, nb), []).append(t)

    # idf from the tiny vocab slices (driver-side: |terms| rows)
    idf: dict[str, float] = {}
    for b, ts in by_bucket.items():
        path = os.path.join(index_dir, "vocab", f"bucket={b}")
        if not os.path.isdir(path):
            continue
        vt = pq.read_table(path, columns=["token", "df"])
        vt = vt.filter(pc.is_in(vt.column("token"), value_set=pa.array(ts)))
        for tok, df_ in zip(vt.column("token").to_pylist(), vt.column("df").to_pylist()):
            # np.log(1 + x), not log1p: mirrors the oracle's ln(1 + N/df)
            # bit-for-bit (log1p skips the 1+x rounding and can differ 1 ulp)
            idf[tok] = float(np.log(1.0 + n_docs / df_))

    datasets = []
    for b, ts in by_bucket.items():
        path = os.path.join(index_dir, "text", f"bucket={b}")
        if not os.path.isdir(path):
            continue
        datasets.append(
            rd.read_parquet(
                path,
                columns=["token", "doc_id", "tf"],
                filter=pc.field("token").isin(ts),
            )
        )
    if not datasets:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score_micros": pa.array([], pa.int64()),
                    "n_terms": pa.array([], pa.int64()),
                }
            )
        )
    matches = datasets[0] if len(datasets) == 1 else datasets[0].union(*datasets[1:])

    idf_items = sorted(idf.items())
    idf_tokens = pa.array([t for t, _ in idf_items])
    idf_vals = np.array([v for _, v in idf_items])

    def score(batch: pa.Table) -> pa.Table:
        pos = pc.index_in(batch.column("token"), value_set=idf_tokens)
        w = idf_vals[pos.to_numpy(zero_copy_only=False)]
        contrib = batch.column("tf").to_numpy() * w
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "contrib": pa.array(contrib),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    scored = (
        matches.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("contrib", alias_name="s"), Sum("one", alias_name="n_terms"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score_micros": pa.array(np.rint(s * 1e6).astype(np.int64)),
                "n_terms": batch.column("n_terms"),
            }
        )

    out = scored.map_batches(finalize, batch_format="pyarrow")
    return out.sort(["score_micros", "doc_id"], descending=[True, False]).limit(k)


def phrase_search(index_dir: str, phrase: str, k: int = 20, *,
                  slop: int = 0):
    """Phrase / proximity query (jena-text "quoted phrase" semantics —
    Lucene PhraseQuery over the positions file): docs where the analyzed
    phrase tokens occur consecutively (``slop=0``) or IN ORDER within a
    window (``slop=n``: total stretch between slots ≤ n — the ordered
    subset of Lucene's slop edit distance), ranked by occurrence count
    then doc_id.

    Needs an index built with ``positions=True`` (loud error otherwise).
    Only the phrase terms' hash buckets are read; the per-doc adjacency
    verification is one vectorized pass inside a doc_id-bucketed groupby
    (the corpus never shuffles — only the phrase terms' posting slices).
    Duplicate tokens in the phrase are handled (each token maps to every
    slot offset it occupies)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from jena_ray.stages.dedup import bucketed_group_apply, with_empty_schema

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    if not meta.get("positions"):
        raise ValueError(
            "phrase_search needs an index built with positions=True "
            "(this index stores no positions file)"
        )
    nb = meta["num_buckets"]
    id_t = pa.binary(16) if meta.get("id_kind") == "binary16" else pa.int64()
    empty = pa.table({"doc_id": pa.array([], id_t),
                      "n_hits": pa.array([], pa.int64())})

    terms = analyze_terms([phrase], meta.get("analyzer", "standard"))
    if not terms or set(terms) & set(meta.get("stoplist") or []):
        # a stopped token inside a phrase makes adjacency unverifiable
        if terms and set(terms) & set(meta.get("stoplist") or []):
            import logging

            logging.getLogger(__name__).warning(
                "phrase contains stoplisted token(s): no match possible")
        return rd.from_arrow(empty)
    # token → the phrase slot offsets it occupies (duplicates allowed)
    offsets: dict[str, list[int]] = {}
    for j, t in enumerate(terms):
        offsets.setdefault(t, []).append(j)

    by_bucket: dict[int, list[str]] = {}
    for t in offsets:
        by_bucket.setdefault(_token_bucket(t, nb), []).append(t)
    datasets = []
    for b, ts in by_bucket.items():
        path = os.path.join(index_dir, "text", f"bucket={b}")
        if not os.path.isdir(path):
            return rd.from_arrow(empty)  # a phrase term absent → no match
        datasets.append(rd.read_parquet(
            path, columns=["token", "doc_id", "positions"],
            filter=pc.field("token").isin(ts),
        ))
    matches = (datasets[0] if len(datasets) == 1
               else datasets[0].union(*datasets[1:]))

    n_slots = len(terms)
    distinct_terms = len(offsets)

    def per_doc(df) -> "object":
        import pandas as pd

        out_ids, out_hits = [], []
        for doc, grp in df.groupby("doc_id", sort=False):
            if grp["token"].nunique() < distinct_terms:
                continue  # some phrase term missing from this doc
            pos_by_slot: dict[int, np.ndarray] = {}
            for tok, blob in zip(grp["token"], grp["positions"]):
                arr = np.frombuffer(blob, dtype="<i4")
                for j in offsets[tok]:
                    pos_by_slot[j] = arr
            if slop == 0:
                starts = pos_by_slot[0]
                for j in range(1, n_slots):
                    starts = starts[np.isin(starts + j, pos_by_slot[j])]
                    if not len(starts):
                        break
                n_found = len(starts)
            else:
                # ordered-within-window: for each start, greedily pick the
                # smallest strictly-increasing successor per slot
                # (searchsorted — minimal span is achieved greedily);
                # match iff span stretch ≤ slop
                n_found = 0
                for p0 in np.sort(pos_by_slot[0]):
                    prev, ok = p0, True
                    for j in range(1, n_slots):
                        arr = pos_by_slot[j]
                        i = np.searchsorted(arr, prev + 1)
                        if i == len(arr):
                            ok = False
                            break
                        prev = arr[i]
                    if ok and (prev - p0 - (n_slots - 1)) <= slop:
                        n_found += 1
            if n_found:
                out_ids.append(doc)
                out_hits.append(n_found)
        return pd.DataFrame({"doc_id": out_ids,
                             "n_hits": pd.array(out_hits, dtype="int64")})

    scored = bucketed_group_apply(matches, ["doc_id"], per_doc,
                                  num_buckets=min(nb, 16), coalesce=True)
    scored = with_empty_schema(
        scored, pa.schema([("doc_id", id_t), ("n_hits", pa.int64())]))
    return scored.sort(["n_hits", "doc_id"],
                       descending=[True, False]).limit(k)


# ------------------------------------------------------------- fuzzy match
# Lucene FuzzyQuery analog: a query term expands to every VOCABULARY term
# within Levenshtein distance ≤ max_edits (optionally sharing a literal
# prefix, Lucene's prefixLength). The vocabulary is distributed parquet
# (vocabulary-scale — orders of magnitude below corpus rows); the DP runs
# vectorized across each batch's candidate words (numpy rows over the
# query dimension — no per-word Python DP), and only the tiny matching
# term list crosses to the driver.


def _edit_distance_batch(words: list[str], q: str) -> "np.ndarray":
    """Levenshtein distances of a batch of words vs one query word:
    one (n × m+1) numpy DP — vectorized across the batch, sequential only
    in the (short) query dimension."""
    n, m = len(words), len(q)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(w) for w in words), np.int64, n)
    L = int(lens.max()) if n else 0
    mat = np.zeros((n, max(L, 1)), dtype=np.int64)
    for i, w in enumerate(words):
        if w:
            mat[i, :len(w)] = np.fromiter(map(ord, w), np.int64, len(w))
    qv = np.fromiter(map(ord, q), np.int64, m) if m else np.zeros(0, np.int64)
    prev = np.broadcast_to(np.arange(m + 1), (n, m + 1)).astype(np.int64)
    for j in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = j
        wc = mat[:, j - 1][:, None]
        sub = prev[:, :-1] + (wc != qv[None, :])
        dele = prev[:, 1:] + 1
        for k in range(1, m + 1):
            cur[:, k] = np.minimum(
                np.minimum(sub[:, k - 1], dele[:, k - 1]), cur[:, k - 1] + 1)
        frozen = lens < j  # word already fully consumed: keep its row
        cur[frozen] = prev[frozen]
        prev = cur
    return prev[:, m]


def fuzzy_expand(index_dir: str, term: str, *, max_edits: int = 2,
                 prefix_len: int = 0) -> list[str]:
    """Vocabulary terms within ``max_edits`` Levenshtein edits of the
    analyzed query term (sharing its first ``prefix_len`` chars)."""
    import ray.data as rd

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    analyzed = analyze_terms([term], meta.get("analyzer", "standard"))
    if len(analyzed) != 1:
        raise ValueError(
            f"fuzzy term must analyze to exactly one token: {term!r}")
    q = analyzed[0]
    vocab_root = os.path.join(index_dir, "vocab")
    if not os.path.isdir(vocab_root):
        return []
    ds = rd.read_parquet(vocab_root, columns=["token"])
    pre = q[:prefix_len]

    def match(tb: pa.Table, _q=q, _e=max_edits, _p=pre) -> pa.Table:
        toks = tb.column("token").to_pylist()
        # cheap bands first: length window + literal prefix
        cand = [t for t in toks
                if abs(len(t) - len(_q)) <= _e
                and (not _p or t.startswith(_p))]
        d = _edit_distance_batch(cand, _q)
        keep = [t for t, dd in zip(cand, d) if dd <= _e]
        return pa.table({"token": pa.array(keep, type=pa.string())})

    out = sorted({
        t for b in ds.map_batches(match, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        for t in b.column("token").to_pylist()
    })
    return out


def fuzzy_search(index_dir: str, terms: list[str], k: int = 20, *,
                 max_edits: int = 2, prefix_len: int = 0):
    """tf-idf OR search with FUZZY term expansion: each query term is
    replaced by its vocabulary neighbourhood (fuzzy_expand), then scored
    by the regular :func:`text_search` machinery."""
    expanded: list[str] = []
    for t in terms:
        expanded.extend(fuzzy_expand(index_dir, t, max_edits=max_edits,
                                     prefix_len=prefix_len))
    import ray.data as rd

    if not expanded:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score_micros": pa.array([], pa.int64()),
            "n_terms": pa.array([], pa.int64()),
        }))
    return text_search(index_dir, sorted(set(expanded)), k)
