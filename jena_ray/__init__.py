"""jena_ray — a Ray-Data-native RDF / knowledge-graph construction engine.

A brand-new engine (not a port) reproducing the data-processing semantics of
Apache Jena (reference: dacasals/jena fork of Jena 3.16.0-SNAPSHOT):

- RDF 1.1 term model with canonical N-Triples lexical encoding
  (reference semantics: jena-arq riot/out/NodeFormatterNT.java,
  jena-base atlas/lib/EscapeStr.java)
- N-Triples / N-Quads parsing per the W3C grammar
  (reference: riot/lang/LangNTriples.java, LangNTuple.java)
- Skolemized blank nodes (riot/lang/BlankNodeAllocatorHash.java)
- XSD literal canonicalization (riot/process/normalize/NormalizeValue.java)
- TDB-style SPO/POS/OSP sorted, partitioned Parquet materialization
  (jena-tdb bulkloader / apache-jena/bin/tdbloader2index)
- Elephas-style distributed stats jobs (jena-elephas-stats JobFactory)

Architecture is Ray-Data-first: every stage is a `map_batches` transform over
Arrow batches on a `ray.data.Dataset`; stateful stages are actor pools; wide
steps are groupby/sort shuffles with explicit skew salting.

This package never calls ray.init()/ray.shutdown() — sessions are owned by
bench.py, CLI entry points and the test fixture.
"""

from jena_ray import _compat  # noqa: F401  (fsspec stub for threaded Ray IO)

__version__ = "0.1.0"
