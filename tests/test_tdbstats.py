"""tdbstats side-car + StatsMatcher-style BGP reordering.

Reference: jena-tdb solver/stats/Stats.java + StatsMatcher.java and
optimizer/ReorderTransformationSubstitution.java — stats file written by a
scan, patterns greedily reordered lightest-first with variable
substitution.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jena_ray.pipelines.tdbstats import (
    collect_stats,
    estimate,
    load_stats,
    reorder_patterns,
)

T = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
DOC = "<http://ex.org/Document>"
MEN = "<http://ex.org/mentions>"
E1 = "<http://ex.org/e1>"


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    """30 docs all typed Document; only 2 mention e1 → `mentions` is the
    selective predicate, `type` the common one."""
    out = str(tmp_path_factory.mktemp("idx"))
    subj = [f"<http://ex.org/d{i}>" for i in range(30)]
    rows = [(s, T, DOC) for s in subj] + [(s, MEN, E1) for s in subj[:2]]
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


def test_collect_stats_counts(small_index):
    stats = collect_stats(small_index)
    assert stats["count"] == 32
    assert stats["predicates"][T] == {"count": 30, "vs": 30, "vo": 1}
    assert stats["predicates"][MEN] == {"count": 2, "vs": 2, "vo": 1}
    # persisted side-car round-trips
    assert load_stats(small_index) == stats


def test_reorder_selective_first(small_index):
    stats = load_stats(small_index)
    common = ("?d", T, DOC)
    rare = ("?d", MEN, E1)
    # both patterns have 2 bound slots — the most-bound-first fallback
    # cannot distinguish them; stats place the rare predicate first
    assert reorder_patterns([common, rare], stats) == [rare, common]
    assert reorder_patterns([rare, common], stats) == [rare, common]


def test_estimate_substitution(small_index):
    """A var bound by an earlier pattern counts as a bound slot: (?d type
    Document) with d bound is estimated at count/vs = 1, not count."""
    stats = load_stats(small_index)
    pat = ("?d", T, DOC)
    assert estimate(pat, stats, set()) == 30.0  # count/vo = 30/1
    pat_open = ("?d", T, "?c")
    assert estimate(pat_open, stats, set()) == 30.0
    assert estimate(pat_open, stats, {"d"}) == 1.0  # 30 / vs=30


def test_bgp_uses_stats_same_answer(small_index):
    from jena_ray.pipelines.bgp import bgp_execute

    pats = [("?d", T, DOC), ("?d", MEN, E1)]
    with_stats = bgp_execute(small_index, pats, ["d"]).to_pandas()
    no_stats = bgp_execute(small_index, pats, ["d"], stats=False).to_pandas()
    got = sorted(with_stats["d"].tolist())
    assert got == sorted(no_stats["d"].tolist())
    assert got == ["<http://ex.org/d0>", "<http://ex.org/d1>"]


def test_bgp_optional_left_join(small_index):
    """OPTIONAL (OpLeftJoin): required bindings survive with nulls where
    the optional BGP does not match."""
    from jena_ray.pipelines.bgp import bgp_optional

    out = bgp_optional(
        small_index,
        [("?d", T, DOC)],
        [("?d", MEN, E1)],
        ["d"],
    ).to_pandas()
    assert len(out) == 30  # every doc survives

    out2 = bgp_optional(
        small_index,
        [("?d", T, DOC)],
        [("?d", MEN, "?e")],
        ["d", "e"],
    ).to_pandas()
    assert len(out2) == 30
    matched = out2[out2["e"].notna()]
    assert sorted(matched["d"]) == ["<http://ex.org/d0>", "<http://ex.org/d1>"]
    assert set(matched["e"]) == {E1}
    assert out2["e"].isna().sum() == 28
