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


def test_update_request_chain_and_empty(small_index):
    """';'-separated requests apply in order (UpdateRequest semantics);
    an empty request is a no-op."""
    from jena_ray.sparql import sparql_query

    before = sparql_query(
        small_index, PFX + "SELECT ?s WHERE { ?s ex:status ?o }",
        num_partitions=2,
    ).count()
    r = sparql_update(
        small_index,
        PFX + 'INSERT DATA { ex:c1 ex:status "tmp" } ; '
              'DELETE DATA { ex:c1 ex:status "tmp" }',
        num_partitions=2,
    )
    # the returned dict is the LAST operation's (the delete: one more
    # triple before it than after)
    assert r["triples_before"] == r["triples_after"] + 1
    after = sparql_query(
        small_index, PFX + "SELECT ?s WHERE { ?s ex:status ?o }",
        num_partitions=2,
    ).count()
    assert after == before
    assert sparql_update(small_index, "# nothing\n") == {"changed": False}


def test_load_document(small_index, tmp_path):
    doc = tmp_path / "doc.nt"
    doc.write_text('<urn:ls> <urn:lp> "loaded" .\n')
    sparql_update(small_index, f"LOAD <file://{doc}>", num_partitions=2)
    from jena_ray.sparql import sparql_query

    res = sparql_query(
        small_index, "SELECT ?o WHERE { <urn:ls> <urn:lp> ?o }",
        num_partitions=2,
    )
    assert res.count() == 1
    # missing document: LOAD raises, LOAD SILENT is a no-op
    with pytest.raises(SparqlSyntaxError):
        sparql_update(small_index, "LOAD <file:///nonexistent.nt>")
    assert sparql_update(
        small_index, "LOAD SILENT <file:///nonexistent.nt>"
    ) == {"changed": False}


def test_with_graph_modify(dataset_index):
    """WITH <g> re-scopes un-GRAPH-ed templates and WHERE to the graph
    (UpdateModify.getWithIRI)."""
    sparql_update(
        dataset_index,
        'WITH <http://ex.org/g1> INSERT { ?s <http://ex.org/r> "m" } '
        "WHERE { ?s <http://ex.org/q> ?o }",
        num_partitions=2,
    )
    _n, per = _store_state(dataset_index)
    assert per["<http://ex.org/g1>"] == 4  # 2 quads + 2 marked
    sparql_update(
        dataset_index,
        'WITH <http://ex.org/g1> DELETE WHERE '
        '{ ?s <http://ex.org/r> "m" }',
        num_partitions=2,
    )
    _n, per = _store_state(dataset_index)
    assert per["<http://ex.org/g1>"] == 2


def test_using_clause(dataset_index):
    """USING g: the WHERE evaluates against the named store graph(s) as
    the default graph; templates still target the real default graph.
    USING NAMED is not executable and fails loudly."""
    from jena_ray.sparql import sparql_query

    sparql_update(
        dataset_index,
        'INSERT { ?s <http://ex.org/seen> "u" } USING <http://ex.org/g1> '
        "WHERE { ?s <http://ex.org/q> ?o }",
        num_partitions=2,
    )
    res = sparql_query(
        dataset_index,
        'SELECT ?s WHERE { ?s <http://ex.org/seen> "u" }',
        num_partitions=2,
    )
    assert sorted(res.to_pandas()["s"]) == ["<http://ex.org/x>",
                                            "<http://ex.org/y>"]
    with pytest.raises(SparqlSyntaxError):
        sparql_update(
            dataset_index,
            "DELETE { <urn:s> ?p ?o } USING NAMED <urn:g1> "
            "WHERE { GRAPH ?g { <urn:s> ?p ?o } }",
            num_partitions=2,
        )


# ------------------------------------------------- graph management (quads)

@pytest.fixture()
def dataset_index(ray_session, tmp_path):
    """RDF-dataset store: 2 default triples + 2 named graphs (g1: 2 quads,
    g2: 1 quad) — the UpdateClear/Drop/Add/Copy/Move target shape."""
    import ray.data as rd

    from jena_ray.stages.quads import materialize_rdf_dataset

    out = str(tmp_path / "dsidx")
    tri = pa.table({
        "subj": pa.array(["<http://ex.org/a>", "<http://ex.org/b>"]),
        "pred": pa.array(["<http://ex.org/p>"] * 2),
        "obj": pa.array(['"1"', '"2"']),
    })
    quads = pa.table({
        "graph": pa.array(["<http://ex.org/g1>", "<http://ex.org/g1>",
                           "<http://ex.org/g2>"]),
        "subj": pa.array(["<http://ex.org/x>", "<http://ex.org/y>",
                          "<http://ex.org/z>"]),
        "pred": pa.array(["<http://ex.org/q>"] * 3),
        "obj": pa.array(['"g1a"', '"g1b"', '"g2a"']),
    })
    materialize_rdf_dataset(out, rd.from_arrow(tri), rd.from_arrow(quads),
                            num_buckets=2, min_rows_per_file=1000)
    return out


def _store_state(idx):
    """(default-triple count, {graph: quad count}) via full scans."""
    from collections import Counter

    from jena_ray.pipelines.bgp import _scan_pattern
    from jena_ray.stages.materialize import read_layout
    from jena_ray.stages.quads import quad_pattern_scan

    info = read_layout(idx)
    n_tri = _scan_pattern(idx, ("?s", "?p", "?o"), info).count()
    per = Counter()
    for b in quad_pattern_scan(idx).iter_batches(batch_format="pyarrow"):
        per.update(b.column("graph").to_pylist())
    return n_tri, dict(per)


def test_clear_named_graph(dataset_index):
    sparql_update(dataset_index, "CLEAR GRAPH <http://ex.org/g1>",
                  num_partitions=2)
    n_tri, per = _store_state(dataset_index)
    assert n_tri == 2
    assert per == {"<http://ex.org/g2>": 1}


def test_drop_all(dataset_index):
    sparql_update(dataset_index, "DROP ALL", num_partitions=2)
    n_tri, per = _store_state(dataset_index)
    assert n_tri == 0 and per == {}


def test_clear_default(dataset_index):
    sparql_update(dataset_index, "CLEAR DEFAULT", num_partitions=2)
    n_tri, per = _store_state(dataset_index)
    assert n_tri == 0
    assert per == {"<http://ex.org/g1>": 2, "<http://ex.org/g2>": 1}


def test_add_default_to_graph(dataset_index):
    sparql_update(dataset_index, "ADD DEFAULT TO GRAPH <http://ex.org/g2>",
                  num_partitions=2)
    n_tri, per = _store_state(dataset_index)
    assert n_tri == 2  # ADD keeps the source
    assert per == {"<http://ex.org/g1>": 2, "<http://ex.org/g2>": 3}


def test_copy_replaces_destination(dataset_index):
    sparql_update(dataset_index,
                  "COPY GRAPH <http://ex.org/g1> TO GRAPH <http://ex.org/g2>",
                  num_partitions=2)
    _n, per = _store_state(dataset_index)
    assert per == {"<http://ex.org/g1>": 2, "<http://ex.org/g2>": 2}


def test_move_removes_source(dataset_index):
    sparql_update(dataset_index,
                  "MOVE GRAPH <http://ex.org/g1> TO DEFAULT",
                  num_partitions=2)
    n_tri, per = _store_state(dataset_index)
    assert n_tri == 2  # destination REPLACED by g1's content
    assert per == {"<http://ex.org/g2>": 1}


def test_quad_insert_and_delete_data(dataset_index):
    sparql_update(
        dataset_index,
        PFX + 'INSERT DATA { ex:n ex:p "dflt" . '
              'GRAPH ex:g3 { ex:n ex:q "in3" } }',
        num_partitions=2,
    )
    n_tri, per = _store_state(dataset_index)
    assert n_tri == 3
    assert per["<http://ex.org/g3>"] == 1
    sparql_update(
        dataset_index,
        PFX + 'DELETE DATA { GRAPH ex:g1 { ex:x ex:q "g1a" } }',
        num_partitions=2,
    )
    _n, per = _store_state(dataset_index)
    assert per["<http://ex.org/g1>"] == 1


def test_create_is_noop(dataset_index):
    m = sparql_update(dataset_index, "CREATE GRAPH <http://ex.org/new>",
                      num_partitions=2)
    assert m == {"changed": False}


# ------------------------------------------------------------------
# round-4: incremental delta overlay (state/deltas — TDB2 journal-then-
# merge). INSERT/DELETE DATA touch O(delta) files; everything else
# compacts first.
# ------------------------------------------------------------------


def _index_files(idx):
    import os

    out = set()
    for root, _dirs, files in os.walk(idx):
        rel = os.path.relpath(root, idx)
        if rel.split(os.sep)[0] in ("spo", "pos", "osp", "terms", "triples"):
            for f in files:
                out.add((os.path.join(rel, f),
                         os.stat(os.path.join(root, f)).st_mtime_ns))
    return out


def test_insert_data_touches_o_delta_files(small_index):
    """A small INSERT DATA must leave every base index/NodeTable/triples
    file untouched (byte-identical mtimes) — only the delta overlay is
    written."""
    import os

    before = _index_files(small_index)
    m = sparql_update(
        small_index,
        PFX + 'INSERT DATA { ex:dx ex:status "active" }',
        num_partitions=4,
    )
    assert m["triples_after"] == m["triples_before"] + 1
    assert _index_files(small_index) == before
    assert os.path.isdir(os.path.join(small_index, "delta"))
    # and the new triple is visible through the SPARQL layer
    assert _count(small_index,
                  PFX + "SELECT ?p WHERE { ex:dx ?p ?o }") == 1


def test_delete_data_is_delta(small_index):
    before = _index_files(small_index)
    m = sparql_update(
        small_index, PFX + 'DELETE DATA { ex:d0 ex:flag "old" }',
        num_partitions=4,
    )
    assert m["triples_after"] == m["triples_before"] - 1
    assert _index_files(small_index) == before
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:flag "old" }') == 2


def test_delta_normalization_roundtrip(small_index):
    """insert → delete cancels to an empty overlay; delete → re-insert of
    a base row cancels too (inserts ∩ base = ∅, deletes ⊆ base)."""
    from jena_ray.state import deltas

    sparql_update(small_index,
                  PFX + 'INSERT DATA { ex:dz ex:status "active" }',
                  num_partitions=4)
    sparql_update(small_index,
                  PFX + 'DELETE DATA { ex:dz ex:status "active" }',
                  num_partitions=4)
    st = deltas.load_state(small_index)
    assert st is not None and st.empty
    sparql_update(small_index,
                  PFX + 'DELETE DATA { ex:d0 ex:status "active" }',
                  num_partitions=4)
    sparql_update(small_index,
                  PFX + 'INSERT DATA { ex:d0 ex:status "active" }',
                  num_partitions=4)
    st = deltas.load_state(small_index)
    assert st is not None and st.empty
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:status "active" }') == 6


def test_modify_compacts_deltas(small_index):
    """A WHERE-carrying update folds pending deltas first and reads the
    merged store; the overlay clears."""
    import os

    sparql_update(small_index,
                  PFX + 'INSERT DATA { ex:dy ex:flag "old" }',
                  num_partitions=4)
    sparql_update(
        small_index,
        PFX + 'DELETE { ?s ex:flag "old" } INSERT { ?s ex:flag "new" } '
              'WHERE { ?s ex:flag "old" }',
        num_partitions=4,
    )
    assert not os.path.isdir(os.path.join(small_index, "delta"))
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:flag "new" }') == 4
    assert _count(small_index,
                  PFX + 'SELECT ?s WHERE { ?s ex:flag "old" }') == 0


def test_delta_new_term_resolves(small_index):
    """A brand-new subject term (absent from the base NodeTable, landing
    in a base bucket that may not exist) must scan AND resolve through
    the overlay."""
    sparql_update(
        small_index,
        PFX + 'INSERT DATA { ex:brandnew ex:status "fresh" }',
        num_partitions=4,
    )
    res = sparql_query(
        small_index,
        PFX + 'SELECT ?s WHERE { ?s ex:status "fresh" }',
        num_partitions=4,
    ).to_pandas()
    assert res["s"].tolist() == ["<http://ex.org/brandnew>"]
