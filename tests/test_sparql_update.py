"""SPARQL Update: parse → delta Datasets → atomic triples swap → index
rebuild (UpdateEngineMain / tdbloader batch-reload semantics)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jena_ray.sparql import SparqlSyntaxError, sparql_query
from jena_ray.sparql_update import sparql_update

PFX = "PREFIX ex: <http://ex.org/>\n"


@pytest.fixture()
def small_index(ray_session, tmp_path):
    out = str(tmp_path / "upidx")
    rows = []
    for i in range(6):
        s = f"<http://ex.org/d{i}>"
        rows.append((s, "<http://ex.org/status>", '"active"'))
        if i < 3:
            rows.append((s, "<http://ex.org/flag>", '"old"'))
    t = pa.table(
        {
            "subj": pa.array([r[0] for r in rows]),
            "pred": pa.array([r[1] for r in rows]),
            "obj": pa.array([r[2] for r in rows]),
        }
    )
    import os

    os.makedirs(f"{out}/triples")
    pq.write_table(t, f"{out}/triples/part0.parquet")
    from jena_ray.stages.materialize import materialize_indexes

    materialize_indexes(out, num_buckets=4, min_rows_per_file=1000)
    return out


def _count(idx, query):
    res = sparql_query(idx, query, num_partitions=4)
    return len(res.to_pandas())


def test_insert_data(small_index):
    m = sparql_update(
        small_index,
        PFX + 'INSERT DATA { ex:d9 ex:status "active" . ex:d9 ex:flag "new" }',
        num_partitions=4,
    )
    assert m["triples_after"] == m["triples_before"] + 2
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:flag "new" }') == 1


def test_insert_data_is_set_semantics(small_index):
    m = sparql_update(
        small_index,
        PFX + 'INSERT DATA { ex:d0 ex:status "active" }',  # already present
        num_partitions=4,
    )
    assert m["triples_after"] == m["triples_before"]


def test_delete_data(small_index):
    m = sparql_update(
        small_index, PFX + 'DELETE DATA { ex:d0 ex:flag "old" }',
        num_partitions=4,
    )
    assert m["triples_after"] == m["triples_before"] - 1
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:flag "old" }') == 2


def test_delete_where(small_index):
    m = sparql_update(
        small_index, PFX + 'DELETE WHERE { ?s ex:flag "old" }',
        num_partitions=4,
    )
    assert m["triples_after"] == m["triples_before"] - 3
    assert _count(small_index, PFX + "SELECT ?s WHERE { ?s ex:flag ?f }") == 0


def test_modify_delete_insert_where(small_index):
    m = sparql_update(
        small_index,
        PFX
        + """DELETE { ?s ex:flag "old" }
            INSERT { ?s ex:flag "migrated" }
            WHERE { ?s ex:flag "old" }""",
        num_partitions=4,
    )
    assert m["triples_after"] == m["triples_before"]
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:flag "migrated" }') == 3
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:flag "old" }') == 0


def test_update_rejects(small_index):
    with pytest.raises(SparqlSyntaxError):
        sparql_update(small_index, PFX + "INSERT DATA { ?s ex:p 1 }")
    with pytest.raises(SparqlSyntaxError):
        sparql_update(
            small_index,
            PFX + 'INSERT DATA { ex:a ex:b "c" } ; DELETE DATA { ex:a ex:b "c" }',
        )
