"""RDFS materialization tests (InferenceProcessorRDFS semantics)."""

from __future__ import annotations

from jena_ray.stages.inference import (
    DOMAIN,
    RANGE,
    RDF_TYPE,
    SUBCLASS,
    SUBPROP,
    RDFSExpand,
    build_rdfs_closure,
)

EX = "http://e/"


def iri(x):
    return f"<{EX}{x}>"


VOCAB = [
    (iri("Dog"), SUBCLASS, iri("Animal")),
    (iri("Animal"), SUBCLASS, iri("Thing")),
    (iri("hasPet"), SUBPROP, iri("owns")),
    (iri("hasPet"), DOMAIN, iri("Person")),
    (iri("hasPet"), RANGE, iri("Animal")),
]


def test_closure_transitive():
    c = build_rdfs_closure(VOCAB)
    assert set(c["superclass"][iri("Dog")]) == {iri("Animal"), iri("Thing")}
    assert c["superprop"][iri("hasPet")] == (iri("owns"),)


def _expand(rows):
    import pyarrow as pa

    batch = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
        }
    )
    ex = RDFSExpand(closure=build_rdfs_closure(VOCAB))
    out = ex(batch)
    return set(zip(*(out.column(c).to_pylist() for c in ("subj", "pred", "obj"))))


def test_type_propagation():
    got = _expand([(iri("rex"), RDF_TYPE, iri("Dog"))])
    assert (iri("rex"), RDF_TYPE, iri("Animal")) in got
    assert (iri("rex"), RDF_TYPE, iri("Thing")) in got


def test_property_domain_range():
    got = _expand([(iri("ann"), iri("hasPet"), iri("rex"))])
    assert (iri("ann"), iri("owns"), iri("rex")) in got  # rdfs7
    assert (iri("ann"), RDF_TYPE, iri("Person")) in got  # rdfs2
    assert (iri("rex"), RDF_TYPE, iri("Animal")) in got  # rdfs3


def test_range_skips_literals():
    got = _expand([(iri("ann"), iri("hasPet"), '"fluffy"')])
    assert ('"fluffy"', RDF_TYPE, iri("Animal")) not in got


def test_dataset_pipeline(ray_session):
    import ray.data as rd

    from jena_ray.stages.inference import rdfs_materialize

    data = rd.from_items(
        [
            {"subj": iri("rex"), "pred": RDF_TYPE, "obj": iri("Dog")},
            {"subj": iri("ann"), "pred": iri("hasPet"), "obj": iri("rex")},
        ]
    )
    out = rdfs_materialize(data, VOCAB, concurrency=2)
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.take_all()}
    assert (iri("rex"), RDF_TYPE, iri("Thing")) in rows
    assert (iri("ann"), RDF_TYPE, iri("Person")) in rows
    assert len(rows) == len(set(rows))


def test_domain_range_chain_through_subclass():
    """InferenceProcessorRDFS.domain()/range() call derive AND subClass:
    range(hasPet)=Animal, Animal subClassOf Thing → (rex type Thing) too."""
    got = _expand([(iri("ann"), iri("hasPet"), iri("rex"))])
    assert (iri("rex"), RDF_TYPE, iri("Animal")) in got
    assert (iri("rex"), RDF_TYPE, iri("Thing")) in got  # chained rdfs9


def test_rules_apply_to_type_triples():
    """subProperty/domain/range run on EVERY triple, including rdf:type rows
    (process() applies all four rules unconditionally)."""
    vocab = VOCAB + [(RDF_TYPE, SUBPROP, iri("classifiedAs"))]
    import pyarrow as pa

    batch = pa.table(
        {"subj": [iri("rex")], "pred": [RDF_TYPE], "obj": [iri("Dog")]}
    )
    ex = RDFSExpand(closure=build_rdfs_closure(vocab))
    out = ex(batch)
    got = set(zip(*(out.column(c).to_pylist() for c in ("subj", "pred", "obj"))))
    assert (iri("rex"), iri("classifiedAs"), iri("Dog")) in got
