"""Property functions ("magic predicates") — table-function plugins.

The reference resolves certain predicates not against the data but by
executing a registered function over the incoming bindings
(sparql/pfunction/PropertyFunctionRegistry.java:29; library
pfunction/library/splitIRI.java, strSplit.java, listMember.java).
Ray-Data-first mapping: a property function is a BATCH TRANSFORM over a
bindings Dataset — it consumes one (or more) bound columns and appends /
explodes new binding columns. Registered by IRI so query layers can
dispatch on the predicate, exactly like the reference's registry.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

APF = "http://jena.apache.org/ARQ/property#"

PROPERTY_FUNCTIONS: dict[str, Callable] = {}


def register_property_fn(iri: str, fn: Callable) -> None:
    """PropertyFunctionRegistry.put analog."""
    PROPERTY_FUNCTIONS[iri] = fn


def apply_property_fn(ds, iri: str, **kwargs):
    fn = PROPERTY_FUNCTIONS[iri]
    return fn(ds, **kwargs)


def split_iri(ds, *, iri_col: str, ns_col: str = "namespace", local_col: str = "localname"):
    """apf:splitIRI — namespace/localname of an IRI binding (splitIRI.java).
    Split at the last '#' or '/' (vectorized regex, same rule as the
    namespace stats job)."""

    def f(t: pa.Table) -> pa.Table:
        arr = t.column(iri_col)

        def ext(pattern, field):
            s = pc.extract_regex(arr, pattern)
            return pc.struct_field(s, field)

        ns = pc.coalesce(
            ext(r"^<(?P<ns>.{7,}#)", "ns"),
            ext(r"^<(?P<ns>.{7,}/)", "ns"),
            ext(r"^<(?P<ns>.*)>$", "ns"),
        )
        local = pc.coalesce(
            ext(r"^<.{7,}#(?P<l>[^#]*)>$", "l"),
            ext(r"^<.{7,}/(?P<l>[^/]*)>$", "l"),
        )
        local = pc.fill_null(local, "")
        return t.append_column(ns_col, ns).append_column(local_col, local)

    return ds.map_batches(f, batch_format="pyarrow")


def str_split(ds, *, str_col: str, sep: str, out_col: str = "part"):
    """apf:strSplit — explode a literal's lexical form into one binding row
    per part (strSplit.java). Vectorized split + explode via list flatten;
    all other columns replicate by list length."""

    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        lex = pc.replace_substring_regex(
            t.column(str_col), r'^"(.*)"(@[A-Za-z0-9-]+|\^\^<[^>]*>)?$', r"\1"
        )
        parts = pc.split_pattern(lex, sep)
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(t.num_rows), lens)
        flat = pc.list_flatten(parts)
        out = t.take(pa.array(idx, type=pa.int64()))
        return out.append_column(out_col, flat)

    return ds.map_batches(f, batch_format="pyarrow")


def list_member(ds, *, list_col: str, out_col: str = "member"):
    """list:member — explode an Arrow list column into one row per element
    (listMember.java over RDF collections; here the collection is already
    a list-typed column, e.g. from a groupby collect)."""

    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        parts = t.column(list_col)
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(t.num_rows), lens)
        flat = pc.list_flatten(parts)
        out = t.take(pa.array(idx, type=pa.int64()))
        return out.append_column(out_col, flat)

    return ds.map_batches(f, batch_format="pyarrow")


register_property_fn(APF + "splitIRI", split_iri)
register_property_fn(APF + "strSplit", str_split)
register_property_fn("http://jena.apache.org/ARQ/list#member", list_member)
