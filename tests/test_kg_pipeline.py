"""End-to-end KG pipeline tests: byte-identical extraction, P/R vs the
independent oracle, sharded resume, global dedup, index consistency."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from tests.oracle_kg import expected_triples


@pytest.fixture(scope="module")
def kg_out(ray_session, sf_dir, tmp_path_factory):
    from jena_ray.pipelines.kg import run_kg

    out = str(tmp_path_factory.mktemp("kgout"))
    metrics = run_kg(sf_dir, out, num_shards=2, concurrency=(1, 2))
    return out, metrics


def _read_triples(path: str) -> set[tuple[str, str, str]]:
    t = pq.read_table(path, columns=["subj", "pred", "obj"])
    return set(zip(*[t.column(c).to_pylist() for c in ("subj", "pred", "obj")]))


def _read_index(out: str, order: str) -> set[tuple[str, str, str]]:
    from jena_ray.stages.materialize import read_index_terms

    rows = read_index_terms(out, order).take_all()
    return {(r["subj"], r["pred"], r["obj"]) for r in rows}


def test_extraction_byte_identical(ray_session, sf_dir):
    """Per-row invariant: extracted text == source text per url (BASELINE.md)."""
    from jena_ray.stages.extract import ExtractText
    from jena_ray.testgen import load_pages

    pages = load_pages(sf_dir)
    ds = pages.map_batches(
        ExtractText, batch_size=256, concurrency=2, num_cpus=1, batch_format="pyarrow"
    )
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        exp = batch.column("text").to_pylist()
        got = batch.column("extracted_text").to_pylist()
        assert exp == got


def test_triples_match_oracle_exactly(kg_out, sf_dir):
    """P/R vs the independent oracle — target ≥0.95; we assert 1.0 (exact
    set equality; skolem labels are deterministic so no isomorphism search
    is needed — isomorphism invariance is covered in test_isomorphism)."""
    out, _ = kg_out
    got = _read_index(out, "spo")
    exp = expected_triples(sf_dir)
    missing = exp - got
    extra = got - exp
    assert not missing, f"{len(missing)} missing, e.g. {sorted(missing)[:3]}"
    assert not extra, f"{len(extra)} extra, e.g. {sorted(extra)[:3]}"


def test_indexes_consistent_and_sorted(kg_out):
    out, _ = kg_out
    spo = _read_index(out, "spo")
    pos = _read_index(out, "pos")
    osp = _read_index(out, "osp")
    assert spo == pos == osp
    # global dedup: spo id-table has no duplicate rows
    t = pq.read_table(os.path.join(out, "spo"))
    assert t.num_rows == len(spo)
    # bucketed layout: every index file is range-sorted on its id permutation
    # (within-bucket order is what pruning + ordered scans need)
    import glob as _glob

    import pyarrow.parquet as _pq

    files = _glob.glob(os.path.join(out, "pos", "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        t2 = _pq.read_table(f, columns=["p_id", "o_id", "s_id"])
        rows = list(zip(*[t2.column(c).to_pylist() for c in ("p_id", "o_id", "s_id")]))
        assert rows == sorted(rows)
    # terms table covers every id exactly once
    ids = pq.read_table(os.path.join(out, "spo"), columns=["s_id", "p_id", "o_id"])
    terms = pq.read_table(os.path.join(out, "terms"), columns=["id"])
    import numpy as np

    used = np.unique(
        np.concatenate([ids.column(c).to_numpy() for c in ("s_id", "p_id", "o_id")])
    )
    have = terms.column("id").to_numpy()
    assert len(have) == len(np.unique(have))  # no dup ids in the node table
    assert set(used) <= set(have)


def test_pattern_scan(kg_out, ray_session):
    from jena_ray.stages.materialize import pattern_scan

    out, _ = kg_out
    r = pattern_scan(out, p="<http://kg.example.org/rel/coOccursWith>",
                     o="<http://kg.example.org/entity/spark>")
    rows = r.take_all()
    assert rows and all(
        row["pred"] == "<http://kg.example.org/rel/coOccursWith>"
        and row["obj"] == "<http://kg.example.org/entity/spark>"
        for row in rows
    )
    assert pattern_scan(out, o="<http://nonexistent>").count() == 0


def test_manifests_written(kg_out, sf_dir):
    out, metrics = kg_out
    from jena_ray.state import manifest as M

    parts = M.completed_parts(out)
    assert parts == ["0", "1"]
    m0 = M.read_manifest(out, "0")
    assert m0["rows_in"] > 0 and m0["triples_out"] > 0
    assert m0["input_fragments"] and "stage_latencies" in m0


def test_resume_recomputes_only_missing(ray_session, sf_dir, tmp_path_factory):
    from jena_ray.pipelines.kg import run_kg

    out = str(tmp_path_factory.mktemp("kgresume"))
    m1 = run_kg(sf_dir, out, num_shards=2, concurrency=(1, 2), build_indexes=False)
    assert set(m1["shards"]) == {"0", "1"}
    before = _read_triples(os.path.join(out, "triples"))
    # simulate partial failure: lose shard 1's data + manifest
    os.remove(os.path.join(out, "_manifest", "part-1.json"))
    shutil.rmtree(os.path.join(out, "triples", "part=1"))
    m2 = run_kg(sf_dir, out, num_shards=2, concurrency=(1, 2), build_indexes=False)
    assert m2["skipped"] == ["0"]
    assert set(m2["shards"]) == {"1"}
    assert _read_triples(os.path.join(out, "triples")) == before


def test_stage_pools_leave_scheduling_headroom():
    """Regression (round-1 deadlock): fixed actor pools summing to the full
    CPU budget starve Ray Data's task stages (read/canonicalize/write). The
    pools must always leave >=1 CPU free, at every cluster size."""
    from jena_ray.pipelines.kg import _stage_pools

    for hi in range(1, 129):
        pool = _stage_pools(hi)
        reserved = pool or 0
        assert reserved < hi or reserved == 0, (
            f"hi={hi}: pool reserves {reserved} of {hi} CPUs — task stages starve"
        )


def test_flagship_runs_on_exact_pool_budget(ray_session, sf_dir):
    """The flagship must complete on a session whose CPU count equals the
    concurrency hint (the round-1 deadlock scenario: conftest gives 4 CPUs,
    concurrency=4)."""
    from jena_ray.pipelines.kg import kg_triples_dataset

    n = kg_triples_dataset(sf_dir).count()
    assert n > 0


def test_terms_build_detects_id_collision(ray_session, tmp_path):
    """Two distinct terms sharing one 64-bit id must abort the NodeTable
    build (silent conflation would corrupt every downstream id join) —
    the fail-loud half of the 64-bit/128-bit collision note in
    stages/materialize.py."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from jena_ray.stages.materialize import _build_terms_table

    t = pa.table(
        {
            "subj": ["<http://e/a>", "<http://e/b>"],  # distinct terms...
            "pred": ["<http://e/p>", "<http://e/p>"],
            "obj": ['"1"', '"2"'],
            "s_id": pa.array([7, 7], type=pa.int64()),  # ...forced same id
            "p_id": pa.array([1, 1], type=pa.int64()),
            "o_id": pa.array([2, 3], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="collision"):
        _build_terms_table(rd.from_arrow(t), str(tmp_path / "terms"), 2, 1000)
