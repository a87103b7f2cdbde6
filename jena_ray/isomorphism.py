"""Blank-node-invariant graph comparison (test-scale).

Reference comparator: `graph.isIsomorphicWith(results)` used by the RIOT eval
conformance tests (jena-arq RiotEvalTest.java:94; algorithm
jena-core/.../graph/impl/GraphMatcher.java:41). We only need small-fixture
isomorphism, so: iterative color (hash) refinement over blank nodes, with a
bounded backtracking fallback for symmetric ties (SURVEY.md §7 hard parts).

Triples are canonical N-Triples term strings (jena_ray.term).
"""

from __future__ import annotations

from itertools import permutations

Triple = tuple[str, str, str]

_MAX_PERMUTE = 8  # backtracking bound per tie-class; fixtures are tiny


def _is_bnode(t: str) -> bool:
    return t.startswith("_:")


def _signatures(triples: list[Triple], colors: dict[str, int]) -> dict[str, tuple]:
    sig: dict[str, list] = {b: [] for b in colors}
    for s, p, o in triples:
        sb, ob = _is_bnode(s), _is_bnode(o)
        if sb:
            sig[s].append(("S", p, ("B", colors[o]) if ob else ("G", o)))
        if ob:
            sig[o].append(("O", p, ("B", colors[s]) if sb else ("G", s)))
    return {b: tuple(sorted(v)) for b, v in sig.items()}


def _refine(triples: list[Triple]) -> dict[str, tuple]:
    """Stable color refinement; returns final signature per bnode."""
    bnodes = {t for tr in triples for t in (tr[0], tr[2]) if _is_bnode(t)}
    colors = {b: 0 for b in bnodes}
    sigs: dict[str, tuple] = {b: () for b in bnodes}
    for _ in range(len(bnodes) + 1):
        sigs = _signatures(triples, colors)
        palette = {s: i for i, s in enumerate(sorted(set(sigs.values())))}
        new_colors = {b: palette[sigs[b]] for b in bnodes}
        if new_colors == colors:
            break
        colors = new_colors
    return sigs


def _canon_with_mapping(triples: list[Triple], mapping: dict[str, str]) -> frozenset:
    def m(t: str) -> str:
        return mapping.get(t, t)

    return frozenset((m(s), p, m(o)) for s, p, o in triples)


def isomorphic(a: list[Triple], b: list[Triple]) -> bool:
    """True iff triple sets a and b are equal up to blank-node renaming."""
    sa, sb = set(a), set(b)
    a, b = list(sa), list(sb)
    if len(sa) != len(sb):
        return False
    ga = {t for tr in sa for t in (tr[0], tr[2]) if not _is_bnode(t)}
    gb = {t for tr in sb for t in (tr[0], tr[2]) if not _is_bnode(t)}
    # ground triples must match exactly
    if {tr for tr in sa if not (_is_bnode(tr[0]) or _is_bnode(tr[2]))} != {
        tr for tr in sb if not (_is_bnode(tr[0]) or _is_bnode(tr[2]))
    }:
        return False
    del ga, gb

    siga, sigb = _refine(a), _refine(b)
    if sorted(siga.values()) != sorted(sigb.values()):
        return False

    # group bnodes by signature class
    classes_a: dict[tuple, list[str]] = {}
    classes_b: dict[tuple, list[str]] = {}
    for n, s in siga.items():
        classes_a.setdefault(s, []).append(n)
    for n, s in sigb.items():
        classes_b.setdefault(s, []).append(n)
    if set(classes_a) != set(classes_b):
        return False

    # singleton classes give a forced mapping; permute the rest (bounded)
    forced: dict[str, str] = {}
    tied: list[tuple[list[str], list[str]]] = []
    for sig, na in classes_a.items():
        nb = classes_b[sig]
        if len(na) != len(nb):
            return False
        if len(na) == 1:
            forced[na[0]] = nb[0]
        else:
            if len(na) > _MAX_PERMUTE:
                raise ValueError(
                    f"isomorphism tie-class too large ({len(na)}) for the "
                    "backtracking fallback; fixture not supported"
                )
            tied.append((sorted(na), sorted(nb)))

    def try_assign(idx: int, mapping: dict[str, str]) -> bool:
        if idx == len(tied):
            return _canon_with_mapping(a, mapping) == frozenset(b)
        na, nb = tied[idx]
        for perm in permutations(nb):
            mapping2 = dict(mapping)
            mapping2.update(zip(na, perm))
            if try_assign(idx + 1, mapping2):
                return True
        return False

    return try_assign(0, forced)


# --------------------------------------------------------------------------
# quad (dataset) isomorphism — DatasetGraph comparison for the TriG/NQ eval
# tests (reference: IsoMatcher.java handles tuples of any length; same
# refinement idea generalized to the graph position, where TriG permits
# blank-node graph labels with document-wide bnode scope).
# Quads are (graph, subj, pred, obj).
# --------------------------------------------------------------------------

Quad = tuple[str, str, str, str]

_QPOS = ((0, "G"), (1, "S"), (3, "O"))  # bnode-capable positions


def _q_signatures(quads: list[Quad], colors: dict[str, int]) -> dict[str, tuple]:
    def col(t: str):
        return ("B", colors[t]) if _is_bnode(t) else ("G", t)

    sig: dict[str, list] = {b: [] for b in colors}
    for q in quads:
        p = q[2]
        for idx, tag in _QPOS:
            t = q[idx]
            if _is_bnode(t):
                others = tuple(col(q[j]) for j, _ in _QPOS if j != idx)
                sig[t].append((tag, p, others))
    return {b: tuple(sorted(v)) for b, v in sig.items()}


def _q_refine(quads: list[Quad]) -> dict[str, tuple]:
    bnodes = {q[i] for q in quads for i, _ in _QPOS if _is_bnode(q[i])}
    colors = {b: 0 for b in bnodes}
    sigs: dict[str, tuple] = {b: () for b in bnodes}
    for _ in range(len(bnodes) + 1):
        sigs = _q_signatures(quads, colors)
        palette = {s: i for i, s in enumerate(sorted(set(sigs.values())))}
        new_colors = {b: palette[sigs[b]] for b in bnodes}
        if new_colors == colors:
            break
        colors = new_colors
    return sigs


def isomorphic_quads(a: list[Quad], b: list[Quad]) -> bool:
    """True iff quad sets a and b are equal up to blank-node renaming
    (bnodes may appear in graph, subject and object positions)."""
    sa, sb = set(a), set(b)
    a, b = list(sa), list(sb)
    if len(sa) != len(sb):
        return False

    def ground(q: Quad) -> bool:
        return not any(_is_bnode(q[i]) for i, _ in _QPOS)

    if {q for q in sa if ground(q)} != {q for q in sb if ground(q)}:
        return False

    siga, sigb = _q_refine(a), _q_refine(b)
    if sorted(siga.values()) != sorted(sigb.values()):
        return False

    classes_a: dict[tuple, list[str]] = {}
    classes_b: dict[tuple, list[str]] = {}
    for n, s in siga.items():
        classes_a.setdefault(s, []).append(n)
    for n, s in sigb.items():
        classes_b.setdefault(s, []).append(n)
    if set(classes_a) != set(classes_b):
        return False

    forced: dict[str, str] = {}
    tied: list[tuple[list[str], list[str]]] = []
    for sig, na in classes_a.items():
        nb = classes_b[sig]
        if len(na) != len(nb):
            return False
        if len(na) == 1:
            forced[na[0]] = nb[0]
        else:
            if len(na) > _MAX_PERMUTE:
                raise ValueError(
                    f"isomorphism tie-class too large ({len(na)}) for the "
                    "backtracking fallback; fixture not supported"
                )
            tied.append((sorted(na), sorted(nb)))

    bset = frozenset(b)

    def apply(mapping: dict[str, str]) -> frozenset:
        def m(t: str) -> str:
            return mapping.get(t, t)

        return frozenset((m(g), m(s), p, m(o)) for g, s, p, o in a)

    def try_assign(idx: int, mapping: dict[str, str]) -> bool:
        if idx == len(tied):
            return apply(mapping) == bset
        na, nb = tied[idx]
        for perm in permutations(nb):
            mapping2 = dict(mapping)
            mapping2.update(zip(na, perm))
            if try_assign(idx + 1, mapping2):
                return True
        return False

    return try_assign(0, forced)
