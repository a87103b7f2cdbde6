"""Deterministic synthesis of the Common-Crawl-style pages table.

The engine's authoritative input shape (BASELINE.json input_hint) is
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
This module derives that table as a pure, seedless, deterministic function of
the driver's ``documents.parquet`` rows — no wall clock, no RNG — so tests,
the DuckDB oracle and benchmarks all agree (FIXTURES.md §1).

``html`` wraps the document text in boilerplate (nav/header/script/footer);
``text`` is the expected boilerplate-stripped extraction, byte-identical to
the source document text (the per-row invariant in BASELINE.md).

Runs as a vectorized ``map_batches`` stage over Arrow batches.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_HTML_HEAD = (
    "<!DOCTYPE html><html><head><title>Doc {doc_id}</title>"
    '<script type="text/javascript">var docId={doc_id};trackPageView();</script>'
    "<style>.nav{{color:#333;padding:4px}}footer{{font-size:10px}}</style>"
    '<meta charset="utf-8"><meta name="generator" content="sitegen/2.1">'
    "</head><body>"
    '<nav class="nav"><a href="/">Home</a> | <a href="/about">About</a> | '
    '<a href="/contact">Contact</a></nav>'
    "<header><h1>Document {doc_id}</h1><span>source: {source}</span></header>"
    "<main>"
)
_HTML_FOOT = (
    "</main>"
    '<aside>Related: <a href="/doc/{prev}">prev</a> <a href="/doc/{nxt}">next</a></aside>'
    "<footer>&copy; 2024 {source}.example.org &mdash; All rights reserved. "
    '<a href="/privacy">Privacy</a> <a href="/terms">Terms</a></footer>'
    "</body></html>"
)

WORDS_PER_PARA = 12


def render_html(doc_id: int, source: str, text: str) -> bytes:
    """Deterministic boilerplate-wrapped HTML for one document."""
    words = text.split(" ")
    paras = [
        "<p>" + _html.escape(" ".join(words[i : i + WORDS_PER_PARA])) + "</p>"
        for i in range(0, len(words), WORDS_PER_PARA)
    ]
    page = (
        _HTML_HEAD.format(doc_id=doc_id, source=source)
        + "".join(paras)
        + _HTML_FOOT.format(prev=max(doc_id - 1, 0), nxt=doc_id + 1, source=source)
    )
    return page.encode("utf-8")


def pages_from_documents(batch: pa.Table) -> pa.Table:
    """map_batches UDF: documents rows → pages rows (input_hint schema)."""
    from jena_ray.vocab import doc_url

    doc_ids = batch.column("doc_id").to_pylist()
    sources = batch.column("source").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()

    urls = [doc_url(s, d) for s, d in zip(sources, doc_ids)]
    ts = pa.array(
        [EPOCH_US + d * 1_000_000 for d in doc_ids], type=pa.timestamp("us")
    )
    htmls = pa.array(
        [render_html(d, s, t) for d, s, t in zip(doc_ids, sources, texts)],
        type=pa.binary(),
    )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": htmls,
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            # carried for provenance/oracle joins; real crawls would not have these
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "n_chars": batch.column("n_chars"),
        }
    )


REPEAT_STRIDE = 10_000_000  # doc_id offset per repeat copy (bench amplification)


def wave_granularity(sf_dir: str, repeat: int = 1) -> tuple[int, int]:
    """(read blocks, actor batch_size) for the fused wave over a tier.

    The task is the scheduling unit, and the repeat-amplification stage
    FUSES into the wave actor pool, so one task of B raw rows carries
    B × repeat docs of work. Two interacting knobs must agree:

    - the READ must be split so a block holds ~150 docs of
      post-amplification work (several tasks per actor keeps the pool's
      tail short — 32 × 94 s tasks for a 28-actor pool left stragglers
      pinning the wall clock);
    - the actor ``batch_size`` must not exceed the block's raw rows,
      because Ray BUNDLES input blocks per actor task until batch_size
      rows — a fixed 256 re-coalesced 300 fine blocks into 19 coarse
      tasks.

    Inside a task the fused UDF chain still amplifies before the wave
    kernels run, so per-call vectorization sees batch × repeat docs.
    At crawl scale fragments are 128 MB+, repeat=1, and Ray's defaults
    take over (blocks ≈ fragments).
    """
    import pyarrow.parquet as pq
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_rows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    blocks = min(4096, max(3 * max(8, cpus), (n_rows * repeat) // 150 or 1))
    blocks = min(blocks, max(1, n_rows))
    batch = max(1, n_rows // blocks)
    return blocks, batch


def load_pages(
    sf_dir: str,
    *,
    with_expected_text: bool = True,
    shard: tuple[int, int] | None = None,
    repeat: int = 1,
):
    """pages Dataset for a testdata tier: read_parquet(documents) →
    map_batches(pages_from_documents). Column-pruned at the read.

    `shard=(k_or_set, n)` keeps rows whose doc_id % n is k (int) or in the
    given set — the single-file testdata stand-in for fragment-group sharding
    of a crawl (at scale a shard is a set of parquet fragments and this mask
    disappears).

    `repeat=R` amplifies each batch into R copies with distinct doc_id
    ranges (offset by REPEAT_STRIDE per copy) — deterministic work
    amplification for benchmarking; every downstream stage (urls, bnodes,
    dedup keys) sees distinct documents. The amplification is ONE cheap
    task stage over a SINGLE read — round 2 first built it as an R-branch
    union of reads, and the branches trickling through the small task lane
    starved the fused actor pool to ~50% utilization at 32 CPUs (measured
    via ds.stats(): 2901 CPU-s of actor work spread over 208 s wall)."""
    import ray
    import ray.data as rd

    blocks, _batch = wave_granularity(sf_dir, repeat)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
        override_num_blocks=blocks,
    )

    if repeat > 1:
        import pyarrow.compute as pc

        def amplify(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("doc_id")
            copies = [t]
            for r in range(1, repeat):
                copies.append(
                    t.set_column(
                        i,
                        "doc_id",
                        pc.add(t.column("doc_id"), pa.scalar(r * REPEAT_STRIDE)),
                    )
                )
            return pa.concat_tables(copies)

        ds = ds.map_batches(amplify, batch_format="pyarrow")

    if shard is not None:
        k, nshards = shard
        wanted = np.array(sorted(k) if isinstance(k, (set, frozenset)) else [k])

        def shard_mask(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            return t.filter(pa.array(np.isin(ids % nshards, wanted)))

        ds = ds.map_batches(shard_mask, batch_format="pyarrow")
    pages = ds.map_batches(pages_from_documents, batch_format="pyarrow")
    if not with_expected_text:
        pages = pages.drop_columns(["text"])
    return pages
