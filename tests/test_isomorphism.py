"""Tests for bnode-invariant graph comparison (GraphMatcher semantics)."""

from jena_ray.isomorphism import isomorphic


def t(s, p, o):
    return (s, p, o)


P = "<http://e/p>"
Q = "<http://e/q>"
A = "<http://e/a>"
B = "<http://e/b>"


def test_ground_equal():
    g = [t(A, P, B), t(B, Q, A)]
    assert isomorphic(g, list(reversed(g)))


def test_ground_unequal():
    assert not isomorphic([t(A, P, B)], [t(A, Q, B)])


def test_bnode_rename():
    g1 = [t("_:x", P, A), t("_:x", Q, B)]
    g2 = [t("_:zzz", P, A), t("_:zzz", Q, B)]
    assert isomorphic(g1, g2)


def test_bnode_split_not_isomorphic():
    # one bnode with two props vs two bnodes with one each
    g1 = [t("_:x", P, A), t("_:x", Q, B)]
    g2 = [t("_:y", P, A), t("_:z", Q, B)]
    assert not isomorphic(g1, g2)


def test_bnode_chain():
    g1 = [t("_:a", P, "_:b"), t("_:b", P, "_:c"), t("_:c", P, A)]
    g2 = [t("_:1", P, "_:2"), t("_:2", P, "_:3"), t("_:3", P, A)]
    assert isomorphic(g1, g2)
    g3 = [t("_:1", P, "_:2"), t("_:3", P, "_:2"), t("_:3", P, A)]
    assert not isomorphic(g1, g3)


def test_symmetric_tie_needs_backtracking():
    # two indistinguishable-by-refinement bnodes in a 2-cycle
    g1 = [t("_:a", P, "_:b"), t("_:b", P, "_:a")]
    g2 = [t("_:x", P, "_:y"), t("_:y", P, "_:x")]
    assert isomorphic(g1, g2)


def test_cardinality_mismatch():
    assert not isomorphic([t(A, P, B)], [t(A, P, B), t(A, Q, B)])


def test_set_semantics():
    # duplicates collapse (Graph.add is idempotent — Graph = set of triples)
    assert isomorphic([t(A, P, B), t(A, P, B)], [t(A, P, B)])
