"""Flagship KG-construction pipeline (the north star).

    pages (url, warc_ts, html, text, lang)
      → ExtractText            (actor pool; boilerplate-strip, byte-identical)
      → KGAnnotator            (actor pool; NER + broadcast-dict linking +
                                relations + skolemized provenance bnodes)
      → Canonicalizer          (XSD canonical forms, lang-tag case)
      → dedup_exact            (two-phase: block-local combiner + groupby)
      → write_parquet          (phase-1 triple table, per-shard layout)
      → materialize_indexes    (phase-2 SPO/POS/OSP sorts — tdbloader2 analog)

One linear streaming pipeline — no full materialization of the page stream,
no branch recompute. Checkpoint/resume: the input is processed as shards
(file-fragment groups at crawl scale; doc_id hash-buckets on the single-file
testdata), each shard committing a lineage manifest after its parquet lands
(state/manifest.py). A rerun skips completed shards.
"""

from __future__ import annotations

import os
import time

import pyarrow.compute as pc

from jena_ray.stages.annotate import KGAnnotator, canonicalize_batch
from jena_ray.stages.dedup import dedup_exact
from jena_ray.stages.extract import ExtractText
from jena_ray.stages.materialize import materialize_indexes
from jena_ray.state import manifest as M
from jena_ray.testgen import load_pages
from jena_ray import vocab as V


def _use_extracted(batch):
    """Replace `text` with the extractor's output (drop the ground-truth
    column so downstream stages consume what extraction produced)."""
    idx = batch.schema.get_field_index("text")
    batch = batch.set_column(idx, "text", batch.column("extracted_text"))
    return batch.drop_columns(["extracted_text"])


def build_triples(pages, *, concurrency: int | tuple[int, int] = (1, 8)):
    """pages Dataset → deduped canonical triples Dataset (lazy)."""
    import ray

    ds = pages.map_batches(
        ExtractText, batch_size=1024, concurrency=concurrency, num_cpus=1,
        batch_format="pyarrow",
    )
    ds = ds.map_batches(_use_extracted, batch_format="pyarrow")
    alias_ref = ray.put(dict(V.ALIAS_TO_ENTITY))
    ds = ds.map_batches(
        KGAnnotator,
        fn_constructor_kwargs={"alias_ref": alias_ref},
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
        batch_format="pyarrow",
    )
    ds = ds.map_batches(canonicalize_batch, batch_format="pyarrow")
    return dedup_exact(ds, cols=("subj", "pred", "obj"))


def run_kg(
    sf_dir: str,
    out_dir: str,
    *,
    num_shards: int = 4,
    concurrency: int | tuple[int, int] = (1, 8),
    build_indexes: bool = True,
    resume: bool = True,
) -> dict:
    """Sharded, resumable end-to-end run. Returns run metrics.

    Shard = doc_id % num_shards on the testdata single file; at crawl scale a
    shard is a group of parquet fragments and the filter disappears. Each
    shard runs the full linear pipeline and commits `triples/part=<k>/` +
    its manifest atomically; completed shards are skipped on resume.
    """
    metrics: dict = {"shards": {}, "skipped": []}
    t_all = time.perf_counter()
    for k in range(num_shards):
        part_id = str(k)
        if resume and M.is_complete(out_dir, part_id):
            metrics["skipped"].append(part_id)
            continue
        t0 = time.perf_counter()
        pages = load_pages(
            sf_dir, shard=(k, num_shards) if num_shards > 1 else None
        )
        rows_in = pages.count()
        t_read = time.perf_counter()
        triples = build_triples(pages, concurrency=concurrency)
        part_path = os.path.join(out_dir, "triples", f"part={part_id}")
        # idempotent overwrite of an uncommitted partial partition
        import shutil

        if os.path.isdir(part_path):
            shutil.rmtree(part_path)
        triples.write_parquet(part_path)
        t_write = time.perf_counter()
        import pyarrow.parquet as pq

        triples_out = pq.read_table(part_path, columns=["pred"]).num_rows
        M.write_manifest(
            out_dir,
            part_id,
            input_fragments=[f"{sf_dir}/documents.parquet#mod{num_shards}={k}"],
            rows_in=rows_in,
            triples_out=triples_out,
            stage_latencies={
                "read_count": t_read - t0,
                "build_write": t_write - t_read,
            },
        )
        metrics["shards"][part_id] = {
            "rows_in": rows_in,
            "triples_out": triples_out,
            "sec": time.perf_counter() - t0,
        }
    if build_indexes:
        t0 = time.perf_counter()
        materialize_indexes(out_dir, triples_path=os.path.join(out_dir, "triples"))
        metrics["index_sec"] = time.perf_counter() - t0
    metrics["total_sec"] = time.perf_counter() - t_all
    return metrics


def kg_triples_dataset(sf_dir: str, *, include_bnodes: bool = True):
    """In-memory (lazy) triples Dataset for a tier — the driver-facing query.
    `include_bnodes=False` drops skolemized provenance rows so results are
    SQL-oracle comparable (bnode labels are hashes SQL can't reproduce)."""
    pages = load_pages(sf_dir)
    triples = build_triples(pages, concurrency=(1, 4))
    if not include_bnodes:
        def drop_bnodes(t):
            mask = pc.and_(
                pc.invert(pc.starts_with(t.column("subj"), "_:")),
                pc.invert(pc.starts_with(t.column("obj"), "_:")),
            )
            return t.filter(mask)

        triples = triples.map_batches(drop_bnodes, batch_format="pyarrow")
    return triples
