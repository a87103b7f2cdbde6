"""Statistics side-car + cardinality-driven BGP reordering.

The reference ships a statistics file and a pattern-weight planner:
``tdbstats`` scans a dataset and writes ``stats.opt`` (total triple count +
per-predicate counts — jena-tdb/.../solver/stats/Stats.java,
StatsCollector.java), and the TDB optimizer reorders each BGP before
execution by greedily picking the lightest pattern while substituting the
chosen pattern's variables as bound for subsequent estimates
(StatsMatcher.java + ReorderTransformationSubstitution.java).

Ray-Data-first mapping:

- ``collect_stats`` is a two-stage aggregate over the **id-space** SPO index
  (id columns only — the strings stay in the NodeTable): map-side partial
  counts per ``p_id`` plus distinct (p,s)/(p,o) pair counts, then a small
  groupby. Per-predicate distinct-subject/object counts give the planner
  average fan-outs, which stats.opt approximates with fixed weights.
- The result is bounded by the number of distinct predicates (same
  assumption stats.opt makes by being an in-memory file), so it is written
  as a small JSON side-car next to ``_layout.json`` and broadcast-read by
  every query — never shuffled.
- ``reorder_patterns`` reproduces the substitution-greedy loop: connected
  patterns first (avoid cartesian joins), lightest estimate next, chosen
  pattern's variables marked bound.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

Pattern = tuple[str, str, str]

STATS_FILE = "stats.json"  # stats.opt analog


def _is_var(t: str) -> bool:
    return t.startswith("?")


def collect_stats(out_dir: str, *, write: bool = True) -> dict:
    """Scan the id SPO index → per-predicate stats; optionally persist.

    Output shape (the stats.opt record set as JSON)::

        {"count": N,
         "predicates": {"<iri>": {"count": c, "vs": distinct_subjects,
                                  "vo": distinct_objects}}}
    """
    import ray.data as rd

    from jena_ray.stages.dedup import dedup_exact, pre_aggregated_count
    from jena_ray.stages.materialize import lookup_terms

    spo = os.path.join(out_dir, "spo")
    ids = rd.read_parquet(spo, columns=["s_id", "p_id", "o_id"])

    counts = {
        r["p_id"]: r["count"]
        for r in pre_aggregated_count(ids, ["p_id"]).take_all()
    }
    vs = {
        r["p_id"]: r["count"]
        for r in pre_aggregated_count(
            dedup_exact(
                ids.select_columns(["p_id", "s_id"]), cols=("p_id", "s_id")
            ),
            ["p_id"],
        ).take_all()
    }
    vo = {
        r["p_id"]: r["count"]
        for r in pre_aggregated_count(
            dedup_exact(
                ids.select_columns(["p_id", "o_id"]), cols=("p_id", "o_id")
            ),
            ["p_id"],
        ).take_all()
    }
    terms = lookup_terms(out_dir, list(counts))
    stats = {
        "count": int(sum(counts.values())),
        "predicates": {
            terms[p]: {"count": int(c), "vs": int(vs[p]), "vo": int(vo[p])}
            for p, c in counts.items()
        },
    }
    if write:
        tmp = os.path.join(out_dir, STATS_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(stats, f)
        os.replace(tmp, os.path.join(out_dir, STATS_FILE))
    return stats


def load_stats(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, STATS_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def estimate(pattern: Pattern, stats: dict, bound_vars: set[str]) -> float:
    """Estimated rows a pattern scan yields once earlier joins bind
    ``bound_vars`` — StatsMatcher's weight, with per-predicate average
    fan-outs where stats.opt uses fixed abbreviation weights.

    A variable already bound upstream counts as a bound slot
    (ReorderTransformationSubstitution substitutes Var→TERM before
    weighing), but keeps the predicate-count ceiling: a bound join var
    still requires the scan to produce the matching rows before the join
    filters them.
    """
    s, p, o = pattern

    def bound(t: str) -> bool:
        return (not _is_var(t)) or t[1:] in bound_vars

    S, P, O = bound(s), bound(p), bound(o)
    total = max(1, stats.get("count", 1))
    st = stats.get("predicates", {}).get(p) if not _is_var(p) else None

    if st is not None:
        c = max(1, st["count"])
        if S and O:
            return 1.0
        if S:  # (S, P, ?o): average objects per subject for this predicate
            return max(1.0, c / max(1, st["vs"]))
        if O:  # (?s, P, O): average subjects per object
            return max(1.0, c / max(1, st["vo"]))
        return float(c)
    # no per-predicate stats (variable predicate, or predicate absent from
    # the data — the latter yields 0 rows but weigh it as selective, not 0,
    # so absent-predicate guesses don't override real information)
    if S and P and O:
        return 1.0
    if S and O:
        return 4.0
    if S or O:
        return 40.0 if S else float(total) / 10.0
    if P:
        return float(total) / 5.0
    return float(total)


def reorder_patterns(patterns: list[Pattern], stats: dict) -> list[Pattern]:
    """Substitution-greedy join order: among patterns connected to the
    variables bound so far (all patterns, for the first pick or when
    nothing connects), take the lowest-estimate one; bind its variables."""
    remaining = list(patterns)
    plan: list[Pattern] = []
    bound: set[str] = set()
    while remaining:
        connected = [
            pat
            for pat in remaining
            if not plan or ({t[1:] for t in pat if _is_var(t)} & bound)
        ]
        cands = connected or remaining
        pick = min(cands, key=lambda pat: estimate(pat, stats, bound))
        remaining.remove(pick)
        plan.append(pick)
        bound |= {t[1:] for t in pick if _is_var(t)}
    return plan
