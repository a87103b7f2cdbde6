"""Distributed RDF statistics — the jena-elephas job recipes on Ray Data.

Each job from jena-elephas-stats JobFactory (jena-elephas-stats/.../jobs/
JobFactory.java:101-547) becomes a 1-2 stage map_batches → groupby pipeline
(the Hadoop mapper/combiner/reducer chain collapses into pre-aggregated
counts; chained jobs chain as Dataset expressions without HDFS
materialization — SURVEY.md §3.3).

Input: a triples Dataset with canonical term columns (subj, pred, obj).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from jena_ray.stages.dedup import pre_aggregated_count
from jena_ray.term import namespace_of


def _explode_nodes(batch: pa.Table) -> pa.Table:
    """TripleNodeCountMapper analog: emit (node, position) for s, p, o."""
    arrays_node = []
    arrays_pos = []
    for col, posname in (("subj", "s"), ("pred", "p"), ("obj", "o")):
        arr = batch.column(col)
        arrays_node.append(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
        arrays_pos.append(pa.array([posname] * len(batch), type=pa.string()))
    node = pa.concat_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays_node]
    )
    pos = pa.concat_arrays(arrays_pos)
    return pa.table({"node": node, "position": pos})


def node_counts(triples):
    """(node, position) → count. Elephas NodeCount job
    (TripleNodeCountMapper + NodeCountReducer, JobFactory.java:101-110)."""
    exploded = triples.map_batches(_explode_nodes, batch_format="pyarrow")
    return pre_aggregated_count(exploded, ["node", "position"], alias="count")


def predicate_counts(triples):
    """pred → count (positional count mapper,
    count/positional/TriplePredicateCountMapper.java)."""
    return pre_aggregated_count(triples.select_columns(["pred"]), ["pred"], alias="count")


def _namespaces(batch: pa.Table) -> pa.Table:
    """TripleNamespaceCountMapper analog: namespace of each IRI term.

    Vectorized port of term.namespace_of (split at LAST '#', else last '/',
    provided the separator index exceeds len('http://')-1, else whole IRI)
    as three pc.extract_regex passes — greedy '.*' pins the last separator,
    '.{7,}' enforces the index floor."""
    cols = [batch.column(c) for c in ("subj", "pred", "obj")]
    arr = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols]
    )
    iris = arr.filter(pc.starts_with(arr, "<"))

    def _ext(pattern):
        s = pc.extract_regex(iris, pattern)
        return pc.struct_field(s, "ns")

    by_hash = _ext(r"^<(?P<ns>.{7,}#)")
    by_slash = _ext(r"^<(?P<ns>.{7,}/)")
    whole = _ext(r"^<(?P<ns>.*)>$")
    ns = pc.coalesce(by_hash, by_slash, whole)
    return pa.table({"namespace": ns})


def namespace_counts(triples):
    """namespace → count over IRI terms in any position."""
    ns = triples.map_batches(_namespaces, batch_format="pyarrow")
    return pre_aggregated_count(ns, ["namespace"], alias="count")


def type_counts(triples):
    """rdf:type object → count (JobFactory.getTypeCountJobs, :453-484)."""
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

    def only_types(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("pred"), rdf_type)).select(["obj"])

    typed = triples.map_batches(only_types, batch_format="pyarrow")
    return pre_aggregated_count(typed, ["obj"], alias="count")


def characteristic_sets(triples):
    """subject → sorted distinct predicate set, then count per set.

    The elephas 2-job chain (JobFactory.java:261-296;
    AbstractCharacteristicSetGeneratingReducer.java:75-84 sorts the predicate
    set) as: per-block distinct (subj, pred) combiner → groupby(subj) with a
    vectorized per-group sorted-join → count per set string.
    """
    import pandas as pd

    from jena_ray.stages.dedup import bucketed_group_apply, dedup_exact

    sp = dedup_exact(triples.select_columns(["subj", "pred"]), cols=("subj", "pred"))

    def sets_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["subj", "pred"], kind="stable")
        agg = df.groupby("subj", sort=False)["pred"].agg("|".join)
        return pd.DataFrame({"pred_set": agg.to_numpy()})

    sets = bucketed_group_apply(sp, ["subj"], sets_per_bucket)
    return pre_aggregated_count(sets, ["pred_set"], alias="count")
