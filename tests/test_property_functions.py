"""Property-function registry (PropertyFunctionRegistry.java:29 +
pfunction/library semantics) as bindings-Dataset table functions."""

import pyarrow as pa


def test_split_iri(ray_session):
    import ray.data as rd

    from jena_ray.functions.property import APF, apply_property_fn

    ds = rd.from_arrow(
        pa.table(
            {
                "iri": [
                    "<http://ex.org/ns#Local>",
                    "<http://ex.org/path/leaf>",
                ]
            }
        )
    )
    out = apply_property_fn(ds, APF + "splitIRI", iri_col="iri").to_pandas()
    assert out["namespace"].tolist() == ["http://ex.org/ns#", "http://ex.org/path/"]
    assert out["localname"].tolist() == ["Local", "leaf"]


def test_str_split(ray_session):
    import ray.data as rd

    from jena_ray.functions.property import APF, apply_property_fn

    ds = rd.from_arrow(pa.table({"k": [1, 2], "lit": ['"a,b,c"', '"x"@en']}))
    out = apply_property_fn(ds, APF + "strSplit", str_col="lit", sep=",").to_pandas()
    assert out["part"].tolist() == ["a", "b", "c", "x"]
    assert out["k"].tolist() == [1, 1, 1, 2]


def test_list_member_and_registration(ray_session):
    import ray.data as rd

    from jena_ray.functions.property import (
        PROPERTY_FUNCTIONS,
        apply_property_fn,
        register_property_fn,
    )

    ds = rd.from_arrow(pa.table({"g": ["a", "b"], "xs": [[1, 2], [3]]}))
    out = apply_property_fn(
        ds, "http://jena.apache.org/ARQ/list#member", list_col="xs"
    ).to_pandas()
    assert out["member"].tolist() == [1, 2, 3]
    assert out["g"].tolist() == ["a", "a", "b"]

    register_property_fn("http://ex.org/id", lambda d: d)
    assert "http://ex.org/id" in PROPERTY_FUNCTIONS


def test_reorder_strategy_hook(ray_session):
    from jena_ray.pipelines.bgp import REORDER_STRATEGIES, register_reorder

    def reverse_order(patterns, _stats):
        return list(reversed(patterns))

    register_reorder("reverse", reverse_order)
    pats = [("?a", "<p>", "?b"), ("?b", "<q>", "?c")]
    assert REORDER_STRATEGIES["reverse"](pats, None) == list(reversed(pats))
    assert REORDER_STRATEGIES["fixed"](pats, None)  # builtin present
    assert "stats" in REORDER_STRATEGIES
