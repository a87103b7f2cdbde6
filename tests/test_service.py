"""Minimal SERVICE execution: injectable endpoint resolver mapping the
endpoint IRI to a second materialized store (Service.java /
QueryIterService remote-evaluate-then-join semantics; real HTTP
federation is out of a batch engine's scope)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jena_ray.sparql import SparqlSyntaxError, sparql_query

PFX = "PREFIX : <http://ex.org/>\n"


def _mk(tmp, rows):
    out = str(tmp)
    t = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
    })
    os.makedirs(f"{out}/triples")
    pq.write_table(t, f"{out}/triples/part0.parquet")
    from jena_ray.stages.materialize import materialize_indexes

    materialize_indexes(out, num_buckets=2, min_rows_per_file=1000)
    return out


@pytest.fixture(scope="module")
def two_stores(ray_session, tmp_path_factory):
    local = _mk(tmp_path_factory.mktemp("svc_local"), [
        ("<http://ex.org/a>", "<http://ex.org/name>", '"alice"'),
        ("<http://ex.org/b>", "<http://ex.org/name>", '"bob"'),
        ("<http://ex.org/c>", "<http://ex.org/name>", '"carol"'),
    ])
    remote = _mk(tmp_path_factory.mktemp("svc_remote"), [
        ("<http://ex.org/a>", "<http://ex.org/age>", '"30"'),
        ("<http://ex.org/b>", "<http://ex.org/age>", '"40"'),
        ("<http://ex.org/d>", "<http://ex.org/age>", '"50"'),
    ])
    return local, remote


def _ctx(remote):
    return {"service_endpoints": {"<http://remote.example/sparql>": remote}}


def test_service_joins_second_store(two_stores):
    local, remote = two_stores
    res = sparql_query(local, PFX + """
        SELECT ?s ?n ?a {
          ?s :name ?n
          SERVICE <http://remote.example/sparql> { ?s :age ?a }
        }
    """, num_partitions=2, pf_context=_ctx(remote)).to_pandas()
    got = sorted(zip(res["n"], res["a"]))
    assert got == [('"alice"', '"30"'), ('"bob"', '"40"')]


def test_service_silent_unmapped_is_unit(two_stores):
    local, remote = two_stores
    res = sparql_query(local, PFX + """
        SELECT ?s ?n {
          ?s :name ?n
          SERVICE SILENT <http://nowhere.example/> { ?s :age ?a }
        }
    """, num_partitions=2, pf_context=_ctx(remote)).to_pandas()
    assert len(res) == 3  # silent failure → join identity


def test_service_unmapped_raises(two_stores):
    local, _remote = two_stores
    with pytest.raises(SparqlSyntaxError):
        sparql_query(local, PFX + """
            SELECT ?s { ?s :name ?n
              SERVICE <http://nowhere.example/> { ?s :age ?a } }
        """, num_partitions=2)


def test_service_variable_endpoint_raises(two_stores):
    local, remote = two_stores
    with pytest.raises(SparqlSyntaxError):
        sparql_query(local, PFX + """
            SELECT ?s { ?s :name ?n SERVICE ?ep { ?s :age ?a } }
        """, num_partitions=2, pf_context=_ctx(remote))
