"""GenericRuleReasoner forward subset (stages/rules.py) — fixpoint
materialization vs closed-form closures.

Reference: jena-core reasoner/rulesys/GenericRuleReasoner.java:47 (forward
mode), rule syntax Rule.java:84."""

from __future__ import annotations

import pyarrow as pa
import pytest

from jena_ray.stages.rules import forward_chain, parse_rules
from jena_ray.term import TermError

EX = "http://ex/"


def _ds(triples):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "subj": [s for s, _, _ in triples],
                "pred": [p for _, p, _ in triples],
                "obj": [o for _, _, o in triples],
            }
        )
    )


def _rows(ds):
    return {(r["subj"], r["pred"], r["obj"]) for r in ds.take_all()}


def anc(a, b):
    return (f"<{EX}{a}>", f"<{EX}anc>", f"<{EX}{b}>")


def test_parse_rejects_unbound_head_and_garbage():
    with pytest.raises(TermError):
        parse_rules("[ (?a <http://e/p> ?b) -> (?a <http://e/q> ?c) ]")
    with pytest.raises(TermError):
        parse_rules("[ -> (?a <http://e/q> ?b) ]")
    with pytest.raises(TermError):
        parse_rules("[ (?a unknown:p ?b) -> (?a unknown:q ?b) ]")


def test_transitive_closure(ray_session):
    """[(?a anc ?b) (?b anc ?c) -> (?a anc ?c)] over a 10-chain converges
    to the full reachability closure in O(log n) semi-naive rounds."""
    chain = [anc(f"n{i}", f"n{i+1}") for i in range(10)]
    out, rounds = forward_chain(
        _ds(chain),
        f"[anc: (?a <{EX}anc> ?b) (?b <{EX}anc> ?c) -> (?a <{EX}anc> ?c)]",
        num_buckets=4,
    )
    expect = {anc(f"n{i}", f"n{j}") for i in range(11) for j in range(i + 1, 11)}
    assert _rows(out) == expect
    assert rounds <= 6  # doubling, not linear: semi-naive over the delta


def test_transitive_closure_distributed_path(ray_session, monkeypatch):
    """The distributed semi-naive fixpoint (forced past RULES_LOCAL_BUDGET)
    matches the driver-local fast path bit for bit."""
    from jena_ray.stages import rules as R

    chain = [anc(f"n{i}", f"n{i+1}") for i in range(10)]
    src = f"[anc: (?a <{EX}anc> ?b) (?b <{EX}anc> ?c) -> (?a <{EX}anc> ?c)]"
    local_out, _ = forward_chain(_ds(chain), src, num_buckets=4)
    local_rows = _rows(local_out)
    monkeypatch.setattr(R, "RULES_LOCAL_BUDGET", 0)
    dist_out, _ = forward_chain(_ds(chain), src, num_buckets=4)
    assert _rows(dist_out) == local_rows


def test_symmetric_property_var_predicate(ray_session):
    """Variable in PREDICATE position — the owl:SymmetricProperty rule
    shape the RDFS-only materializer cannot express."""
    rules = """
    [sym: (?p rdf:type owl:SymmetricProperty) (?s ?p ?o) -> (?o ?p ?s)]
    """
    data = [
        (f"<{EX}knows>",
         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         "<http://www.w3.org/2002/07/owl#SymmetricProperty>"),
        (f"<{EX}a>", f"<{EX}knows>", f"<{EX}b>"),
        (f"<{EX}a>", f"<{EX}likes>", f"<{EX}c>"),  # not symmetric
    ]
    out, _ = forward_chain(_ds(data), rules, num_buckets=4)
    rows = _rows(out)
    assert (f"<{EX}b>", f"<{EX}knows>", f"<{EX}a>") in rows
    assert (f"<{EX}c>", f"<{EX}likes>", f"<{EX}a>") not in rows


def test_builtin_filters(ray_session):
    rules = f"""
    [small: (?s <{EX}v> ?x) lessThan(?x, 5) -> (?s rdf:type <{EX}Small>)]
    [ne: (?s <{EX}peer> ?o) notEqual(?s, ?o) -> (?o <{EX}peer> ?s)]
    """
    dt = "<http://www.w3.org/2001/XMLSchema#integer>"
    data = [
        (f"<{EX}x>", f"<{EX}v>", f'"3"^^{dt}'),
        (f"<{EX}y>", f"<{EX}v>", f'"7"^^{dt}'),
        (f"<{EX}x>", f"<{EX}peer>", f"<{EX}y>"),
        (f"<{EX}z>", f"<{EX}peer>", f"<{EX}z>"),  # self-loop: filtered
    ]
    out, _ = forward_chain(_ds(data), rules, num_buckets=4)
    rows = _rows(out)
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    assert (f"<{EX}x>", rdf_type, f"<{EX}Small>") in rows
    assert (f"<{EX}y>", rdf_type, f"<{EX}Small>") not in rows
    assert (f"<{EX}y>", f"<{EX}peer>", f"<{EX}x>") in rows
    assert len([r for r in rows if r[1] == f"<{EX}peer>"]) == 3


def test_rdfs_rules_match_rdfs_materializer(ray_session):
    """The RDFS entailment rules expressed as GENERIC rules agree with the
    dedicated broadcast-closure materializer (stages/inference.py) on the
    rdf:type triples they derive for data entities."""
    from jena_ray.stages.inference import rdfs_materialize

    vocab = [
        (f"<{EX}Dog>", "<http://www.w3.org/2000/01/rdf-schema#subClassOf>", f"<{EX}Animal>"),
        (f"<{EX}hasDog>", "<http://www.w3.org/2000/01/rdf-schema#domain>", f"<{EX}Owner>"),
        (f"<{EX}hasDog>", "<http://www.w3.org/2000/01/rdf-schema#range>", f"<{EX}Dog>"),
    ]
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    data = [
        (f"<{EX}rex>", rdf_type, f"<{EX}Dog>"),
        (f"<{EX}ann>", f"<{EX}hasDog>", f"<{EX}rex>"),
    ]
    rules = """
    [rdfs2: (?p rdfs:domain ?c) (?s ?p ?o) -> (?s rdf:type ?c)]
    [rdfs3: (?p rdfs:range ?c) (?s ?p ?o) -> (?o rdf:type ?c)]
    [rdfs9: (?a rdfs:subClassOf ?b) (?s rdf:type ?a) -> (?s rdf:type ?b)]
    """
    out, _ = forward_chain(_ds(vocab + data), rules, num_buckets=4)
    generic = {r for r in _rows(out) if r[1] == rdf_type and r[0].startswith(f"<{EX}")}

    ref = rdfs_materialize(_ds(data), vocab)
    dedicated = {
        (r["subj"], r["pred"], r["obj"])
        for r in ref.take_all()
        if r["pred"] == rdf_type
    }
    assert dedicated <= generic
    assert generic - dedicated == {
        # rdfs3 on the vocab triple itself (the broadcast materializer only
        # expands DATA triples — a documented semantic scope difference)
        (f"<{EX}Animal>", rdf_type, f"<{EX}Dog>"),
    } or generic == dedicated


def test_cartesian_body_rejected(ray_session):
    with pytest.raises(Exception, match="cartesian"):
        forward_chain(
            _ds([anc("a", "b")]),
            f"[ (?a <{EX}p> ?b) (?c <{EX}q> ?d) -> (?a <{EX}r> ?d) ]",
            num_buckets=4,
        )


def test_rulesets_load_and_owl_transitive(ray_session):
    """Built-in presets parse; owl-lite's TransitiveProperty rule closes a
    chain whose predicate is only known FROM THE DATA."""
    from jena_ray.stages.rules import load_ruleset

    assert len(load_ruleset("rdfs")) == 6
    owl = load_ruleset("owl-lite")
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    data = [
        (f"<{EX}part>", rdf_type, "<http://www.w3.org/2002/07/owl#TransitiveProperty>"),
        (f"<{EX}a>", f"<{EX}part>", f"<{EX}b>"),
        (f"<{EX}b>", f"<{EX}part>", f"<{EX}c>"),
        (f"<{EX}c>", f"<{EX}part>", f"<{EX}d>"),
    ]
    out, _ = forward_chain(_ds(data), owl, num_buckets=4)
    rows = _rows(out)
    assert (f"<{EX}a>", f"<{EX}part>", f"<{EX}d>") in rows


def test_novalue_parse_and_validation():
    """noValue takes 2 or 3 args; its variables must be body-bound."""
    r = parse_rules(
        "[ (?a <http://e/p> ?b) noValue(?a <http://e/q>) "
        "-> (?a <http://e/r> ?b) ]"
    )[0]
    assert r.filters == [("noValue", "?a", "<http://e/q>")]
    r3 = parse_rules(
        "[ (?a <http://e/p> ?b) noValue(?a <http://e/q> ?b) "
        "-> (?a <http://e/r> ?b) ]"
    )[0]
    assert r3.filters == [("noValue", "?a", "<http://e/q>", "?b")]
    with pytest.raises(TermError):  # unbound guard variable
        parse_rules(
            "[ (?a <http://e/p> ?b) noValue(?a <http://e/q> ?c) "
            "-> (?a <http://e/r> ?b) ]"
        )
    with pytest.raises(TermError):  # wrong arity
        parse_rules("[ (?a <http://e/p> ?b) noValue(?a) -> (?a <http://e/q> ?b) ]")


def test_novalue_guard(ray_session):
    """noValue blocks derivation for subjects that already carry the
    predicate (wildcard form) or the exact triple (3-arg form)."""
    P, Q, R = f"<{EX}p>", f"<{EX}q>", f"<{EX}r>"
    A, B, C, V = f"<{EX}a>", f"<{EX}b>", f"<{EX}c>", f"<{EX}v>"
    base = [(A, P, V), (B, P, V), (C, P, V), (B, Q, V)]
    # wildcard: b already has SOME q value -> only a and c derive r
    out, _ = forward_chain(
        _ds(base),
        f"[ (?x {P} ?y) noValue(?x {Q}) -> (?x {R} ?y) ]",
        num_buckets=2,
    )
    got = _rows(out) - set(base)
    assert got == {(A, R, V), (C, R, V)}
    # 3-arg exact form: blocks only the exact (s, q, o) match
    out2, _ = forward_chain(
        _ds(base + [(C, Q, f"<{EX}other>")]),
        f"[ (?x {P} ?y) noValue(?x {Q} ?y) -> (?x {R} ?y) ]",
        num_buckets=2,
    )
    got2 = _rows(out2) - set(base) - {(C, Q, f"<{EX}other>")}
    assert got2 == {(A, R, V), (C, R, V)}


def test_novalue_ground_guard(ray_session):
    """A guard with no binding variables is a single existence probe that
    enables or disables the whole rule."""
    P, Q, FLAG = f"<{EX}p>", f"<{EX}q>", f"<{EX}flag>"
    A, V, ON = f"<{EX}a>", f"<{EX}v>", f"<{EX}on>"
    rule = f"[ (?x {P} ?y) noValue({FLAG} {Q} {ON}) -> (?x {Q} ?y) ]"
    out, _ = forward_chain(_ds([(A, P, V)]), rule, num_buckets=2)
    assert (A, Q, V) in _rows(out)
    out2, _ = forward_chain(
        _ds([(A, P, V), (FLAG, Q, ON)]), rule, num_buckets=2
    )
    assert (A, Q, V) not in _rows(out2)


# ------------------------------------------------------------------
# round-4: builtin breadth — arithmetic / string / skolem / tests /
# tabling directives (rulesys/builtins/{Sum,Product,StrConcat,
# MakeSkolem,Table,TableAll,...}.java)
# ------------------------------------------------------------------

INT = "http://www.w3.org/2001/XMLSchema#integer"


def _lit_int(n):
    return f'"{n}"^^<{INT}>'


def test_sum_product_builtins(ray_session):
    data = _ds([
        (f"<{EX}x>", f"<{EX}a>", _lit_int(3)),
        (f"<{EX}x>", f"<{EX}b>", _lit_int(4)),
    ])
    rules = parse_rules(f"""
        [r1: (?s <{EX}a> ?m) (?s <{EX}b> ?n) sum(?m ?n ?t)
             -> (?s <{EX}total> ?t)]
        [r2: (?s <{EX}a> ?m) (?s <{EX}b> ?n) product(?m ?n ?t)
             -> (?s <{EX}prod> ?t)]
    """)
    out = _rows(forward_chain(data, rules, num_buckets=4)[0])
    assert (f"<{EX}x>", f"<{EX}total>", _lit_int(7)) in out
    assert (f"<{EX}x>", f"<{EX}prod>", _lit_int(12)) in out


def test_difference_quotient_min_max(ray_session):
    data = _ds([
        (f"<{EX}x>", f"<{EX}a>", _lit_int(10)),
        (f"<{EX}x>", f"<{EX}b>", _lit_int(4)),
    ])
    rules = parse_rules(f"""
        [ (?s <{EX}a> ?m) (?s <{EX}b> ?n)
          difference(?m ?n ?d) min(?m ?n ?lo) max(?m ?n ?hi)
          -> (?s <{EX}d> ?d) (?s <{EX}lo> ?lo) (?s <{EX}hi> ?hi)]
        [ (?s <{EX}a> ?m) quotient(?m ?m ?q) -> (?s <{EX}q> ?q)]
    """)
    out = _rows(forward_chain(data, rules, num_buckets=4)[0])
    assert (f"<{EX}x>", f"<{EX}d>", _lit_int(6)) in out
    assert (f"<{EX}x>", f"<{EX}lo>", _lit_int(4)) in out
    assert (f"<{EX}x>", f"<{EX}hi>", _lit_int(10)) in out
    assert (f"<{EX}x>", f"<{EX}q>", _lit_int(1)) in out


def test_strconcat_uriconcat(ray_session):
    data = _ds([(f"<{EX}x>", f"<{EX}name>", '"alice"')])
    rules = parse_rules(f"""
        [ (?s <{EX}name> ?n) strConcat('hi ' ?n ?out)
          -> (?s <{EX}greet> ?out)]
        [ (?s <{EX}name> ?n) uriConcat('{EX}person/' ?n ?u)
          -> (?s <{EX}uri> ?u)]
    """)
    out = _rows(forward_chain(data, rules, num_buckets=4)[0])
    assert (f"<{EX}x>", f"<{EX}greet>", '"hi alice"') in out
    assert (f"<{EX}x>", f"<{EX}uri>", f"<{EX}person/alice>") in out


def test_make_skolem_deterministic(ray_session):
    data = _ds([
        (f"<{EX}x>", f"<{EX}p>", f"<{EX}y>"),
        (f"<{EX}z>", f"<{EX}p>", f"<{EX}y>"),
    ])
    rules = parse_rules(f"""
        [ (?s <{EX}p> ?o) makeSkolem(?sk ?s ?o) -> (?s <{EX}node> ?sk)]
    """)
    out1 = _rows(forward_chain(data, rules, num_buckets=4)[0])
    out2 = _rows(forward_chain(data, rules, num_buckets=4)[0])
    assert out1 == out2  # deterministic across runs
    sks = {o for s, p, o in out1 if p == f"<{EX}node>"}
    assert len(sks) == 2 and all(o.startswith("_:sk") for o in sks)


def test_type_tests_and_regex(ray_session):
    data = _ds([
        (f"<{EX}x>", f"<{EX}v>", '"abc"'),
        (f"<{EX}y>", f"<{EX}v>", f"<{EX}iri>"),
        (f"_:b1", f"<{EX}v>", '"zzz"'),
    ])
    rules = parse_rules(f"""
        [ (?s <{EX}v> ?o) isLiteral(?o) regex(?o 'a.c')
          -> (?s <{EX}m> 'hit')]
        [ (?s <{EX}v> ?o) isBNode(?s) -> (?s <{EX}bn> 'yes')]
        [ (?s <{EX}v> ?o) notLiteral(?o) -> (?s <{EX}nl> 'yes')]
    """)
    out = _rows(forward_chain(data, rules, num_buckets=4)[0])
    assert (f"<{EX}x>", f"<{EX}m>", '"hit"') in out
    assert not any(s == f"<{EX}y>" and p == f"<{EX}m>" for s, p, _ in out)
    assert ("_:b1", f"<{EX}bn>", '"yes"') in out
    assert (f"<{EX}y>", f"<{EX}nl>", '"yes"') in out


def test_regex_variable_pattern(ray_session):
    """regex with a VARIABLE pattern arg must use the bound value per row
    (Regex.java resolves the bound node), not the literal text '?v'."""
    data = _ds([
        (f"<{EX}x>", f"<{EX}v>", '"abc"'),
        (f"<{EX}x>", f"<{EX}pat>", '"a.c"'),
        (f"<{EX}y>", f"<{EX}v>", '"zzz"'),
        (f"<{EX}y>", f"<{EX}pat>", '"a.c"'),
        (f"<{EX}z>", f"<{EX}v>", '"zzz"'),
        (f"<{EX}z>", f"<{EX}pat>", '"z+"'),
    ])
    rules = parse_rules(f"""
        [ (?s <{EX}v> ?o) (?s <{EX}pat> ?p) regex(?o ?p)
          -> (?s <{EX}m> 'hit')]
    """)
    out = _rows(forward_chain(data, rules, num_buckets=4)[0])
    hits = {s for s, p, _ in out if p == f"<{EX}m>"}
    assert hits == {f"<{EX}x>", f"<{EX}z>"}


def test_table_directives_are_noops(ray_session):
    data = _ds([(f"<{EX}a>", f"<{EX}anc>", f"<{EX}b>"),
                (f"<{EX}b>", f"<{EX}anc>", f"<{EX}c>")])
    rules = parse_rules(f"""
        [ tableAll() (?a <{EX}anc> ?b) (?b <{EX}anc> ?c)
          -> (?a <{EX}anc> ?c)]
    """)
    out = _rows(forward_chain(data, rules, num_buckets=4)[0])
    assert (f"<{EX}a>", f"<{EX}anc>", f"<{EX}c>") in out


def test_bind_builtin_unbound_input_rejected():
    with pytest.raises(TermError):
        parse_rules(f"[ (?s <{EX}p> ?o) sum(?o ?zz ?t) -> (?s <{EX}q> ?t)]")
    with pytest.raises(TermError):
        parse_rules(f"[ (?s <{EX}p> ?o) sum(?o ?o 1) -> (?s <{EX}q> ?o)]")


def test_owl_micro_preset(ray_session):
    """OWLMicroReasoner scope: functional-property equality, sameAs
    propagation, hasValue restrictions."""
    from jena_ray.stages.rules import forward_chain, load_ruleset

    OWL = "http://www.w3.org/2002/07/owl#"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    data = _ds([
        (f"<{EX}hasMother>", f"<{RDF}type>", f"<{OWL}FunctionalProperty>"),
        (f"<{EX}kid>", f"<{EX}hasMother>", f"<{EX}m1>"),
        (f"<{EX}kid>", f"<{EX}hasMother>", f"<{EX}m2>"),
        (f"<{EX}m1>", f"<{EX}age>", '"41"'),
        # hasValue restriction
        (f"<{EX}R>", f"<{OWL}onProperty>", f"<{EX}color>"),
        (f"<{EX}R>", f"<{OWL}hasValue>", '"red"'),
        (f"<{EX}car>", f"<{EX}color>", '"red"'),
        (f"<{EX}truck>", f"<{RDF}type>", f"<{EX}R>"),
    ])
    out = _rows(forward_chain(data, load_ruleset("owl-micro"),
                              num_buckets=4)[0])
    # functional property ⇒ m1 sameAs m2, and m2 inherits m1's triples
    assert (f"<{EX}m1>", f"<{OWL}sameAs>", f"<{EX}m2>") in out
    assert (f"<{EX}m2>", f"<{EX}age>", '"41"') in out
    # hasValue both directions
    assert (f"<{EX}car>", f"<{RDF}type>", f"<{EX}R>") in out
    assert (f"<{EX}truck>", f"<{EX}color>", '"red"') in out


# ------------------------------------------------------------------
# round-5: backward (`<-`) rules + hybrid FB engine (HybridEngine —
# FBRuleReasoner/TestBasicLP fixtures, jena-core reasoner/rulesys/test/
# TestBasicLP.java:117-213; data = single triple (a p b) per
# doBasicTest, TestBasicLP.java:1356-1358)
# ------------------------------------------------------------------

def _lp(rule_src, data=None):
    from jena_ray.stages.rules import HybridEngine

    data = data or [(f"<{EX}a>", f"<{EX}p>", f"<{EX}b>")]
    return HybridEngine(_ds(data), rule_src)


def _t(s, p, o):
    return (f"<{EX}{s}>", f"<{EX}{p}>", f"<{EX}{o}>")


def test_lp_base_rules1_lookup(ray_session):
    """TestBasicLP.testBaseRules1: plain lookup, rule not triggered."""
    eng = _lp(f"[r1: (?x <{EX}r> <{EX}c>) <- (?x <{EX}p> <{EX}b>)]")
    got = _rows(eng.find(p=f"<{EX}p>", o=f"<{EX}b>"))
    assert got == {_t("a", "p", "b")}


def test_lp_base_rules2_chain(ray_session):
    """testBaseRules2: simple chain rule derives (a r c)."""
    eng = _lp(f"[r1: (?x <{EX}r> <{EX}c>) <- (?x <{EX}p> <{EX}b>)]")
    got = _rows(eng.find(p=f"<{EX}r>", o=f"<{EX}c>"))
    assert got == {_t("a", "r", "c")}


def test_lp_base_rules3_head_unification(ray_session):
    """testBaseRules3: (?x r ?x) head — find(ANY, r, a) → (a r a)."""
    eng = _lp(f"[r1: (?x <{EX}r> ?x) <- (?x <{EX}p> <{EX}b>)]")
    got = _rows(eng.find(p=f"<{EX}r>", o=f"<{EX}a>"))
    assert got == {_t("a", "r", "a")}


def test_lp_base_rules5_cascade(ray_session):
    """testBaseRules5: three-rule cascade with a join in r1."""
    eng = _lp(
        f"[r1: (?x <{EX}q> ?y) <- (?x <{EX}r> ?y)(?y <{EX}s> ?x)]"
        f"[r2: (?x <{EX}r> ?y) <- (?x <{EX}p> ?y)]"
        f"[r3: (?x <{EX}s> ?y) <- (?y <{EX}p> ?x)]"
    )
    got = _rows(eng.find(p=f"<{EX}q>"))
    assert got == {_t("a", "q", "b")}


def test_lp_recursive_backward_rule(ray_session):
    """Recursive backward transitive closure (the tabling test shape —
    TestBasicLP tabled-predicate tests): anc+ via `<-` rules."""
    eng = _lp(
        f"[base: (?x <{EX}anc> ?y) <- (?x <{EX}par> ?y)]"
        f"[rec: (?x <{EX}anc> ?z) <- (?x <{EX}par> ?y)(?y <{EX}anc> ?z)]",
        data=[_t("a", "par", "b"), _t("b", "par", "c"), _t("c", "par", "d")],
    )
    got = _rows(eng.find(p=f"<{EX}anc>"))
    assert got == {_t(a, "anc", b) for a, b in
                   [("a", "b"), ("a", "c"), ("a", "d"),
                    ("b", "c"), ("b", "d"), ("c", "d")]}


def test_hybrid_forward_feeds_backward(ray_session):
    """FB mode: the forward rule closes at bind time, the backward rule
    derives from its output on demand (FBRuleInfGraph behavior)."""
    eng = _lp(
        f"[f: (?x <{EX}p> ?y) -> (?x <{EX}p2> ?y)]"
        f"[b: (?x <{EX}r> ?y) <- (?x <{EX}p2> ?y)]"
    )
    assert _rows(eng.find(p=f"<{EX}r>")) == {_t("a", "r", "b")}
    # the full closure includes data + forward + backward derivations
    assert _rows(eng.closure()) >= {
        _t("a", "p", "b"), _t("a", "p2", "b"), _t("a", "r", "b")}


def test_backward_goal_directed_pruning(ray_session):
    """Goal-directedness: a find on one predicate must select only the
    rules reachable from that goal (predicate-level magic sets)."""
    from jena_ray.stages.rules import parse_rules, relevant_backward_rules

    rules = parse_rules(
        f"[r1: (?x <{EX}q> ?y) <- (?x <{EX}r> ?y)]"
        f"[r2: (?x <{EX}r> ?y) <- (?x <{EX}p> ?y)]"
        f"[r3: (?x <{EX}zzz> ?y) <- (?x <{EX}p> ?y)]"
    )
    assert relevant_backward_rules(rules, f"<{EX}q>") == [0, 1]
    assert relevant_backward_rules(rules, f"<{EX}r>") == [1]
    assert relevant_backward_rules(rules, f"<{EX}zzz>") == [2]
    assert relevant_backward_rules(rules, f"<{EX}nosuch>") == []
    assert relevant_backward_rules(rules, None) == [0, 1, 2]
    # memoization: two finds on the same goal family share one closure
    eng = _lp(
        f"[r1: (?x <{EX}q> ?y) <- (?x <{EX}r> ?y)]"
        f"[r2: (?x <{EX}r> ?y) <- (?x <{EX}p> ?y)]"
        f"[r3: (?x <{EX}zzz> ?y) <- (?x <{EX}p> ?y)]"
    )
    eng.find(p=f"<{EX}q>").count()
    eng.find(p=f"<{EX}q>").count()
    assert set(eng._tables) == {frozenset({0, 1})}
    # an unrelated goal must not have evaluated r3's closure yet
    assert frozenset({2}) not in eng._tables


def test_backward_with_builtin_body(ray_session):
    """Builtins inside a backward body (shared _eval_rule machinery)."""
    eng = _lp(
        f"[r1: (?x <{EX}big> ?n) <- (?x <{EX}v> ?n) greaterThan(?n 5)]",
        data=[
            (f"<{EX}a>", f"<{EX}v>",
             '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'),
            (f"<{EX}b>", f"<{EX}v>",
             '"9"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ],
    )
    got = _rows(eng.find(p=f"<{EX}big>"))
    assert got == {(f"<{EX}b>", f"<{EX}big>",
                    '"9"^^<http://www.w3.org/2001/XMLSchema#integer>')}


def test_forward_chain_rejects_backward_rules():
    with pytest.raises(TermError):
        forward_chain(None, f"[r1: (?x <{EX}r> ?y) <- (?x <{EX}p> ?y)]")


# ------------------------------------------------------------------
# round-5: owl-fb preset over the jena-core OWL WG entailment fixtures
# (OWLUnitTest.java:127-146 runs these against OWLFBRuleReasoner; the
# functor/comprehension exclusions are documented in owl-fb.rules)
# ------------------------------------------------------------------

WG = "/root/reference/jena-core/testing/wg"


def _wg_triples(rel):
    from jena_ray.rdfxml import parse_rdfxml

    with open(f"{WG}/{rel}", "rb") as f:
        base = "http://www.w3.org/2002/03owlt/" + rel[:-len(".rdf")]
        return parse_rdfxml(f.read().decode("utf-8"), base=base)


def _entails(closure_rows: set, conclusion: list) -> bool:
    """WG entailment: the conclusion graph, bnodes as existential vars,
    must match INTO the closure (simple entailment — the same check the
    reference's TestUtil/WGReasonerTester does on the InfGraph find)."""
    bvars = sorted({t for trip in conclusion for t in trip
                    if t.startswith("_:")})

    def match(i, binding):
        if i == len(conclusion):
            return True
        s, p, o = conclusion[i]
        for cs, cp, co in closure_rows:
            nb = dict(binding)
            ok = True
            for want, got in ((s, cs), (p, cp), (o, co)):
                if want.startswith("_:"):
                    if nb.setdefault(want, got) != got:
                        ok = False
                        break
                elif want != got:
                    ok = False
                    break
            if ok and match(i + 1, nb):
                return True
        return False

    assert bvars is not None
    return match(0, {})


@pytest.mark.parametrize("sub,prem,conc,positive", [
    ("someValuesFrom", "premises001.rdf", "conclusions001.rdf", True),
    ("someValuesFrom", "premises002.rdf", "nonconclusions002.rdf", False),
    ("allValuesFrom", "premises001.rdf", "conclusions001.rdf", True),
    ("allValuesFrom", "premises002.rdf", "nonconclusions002.rdf", False),
], ids=["someValuesFrom-001-pos", "someValuesFrom-002-neg",
        "allValuesFrom-001-pos", "allValuesFrom-002-neg"])
def test_owl_fb_wg_entailment(ray_session, sub, prem, conc, positive):
    from jena_ray.stages.rules import HybridEngine, load_ruleset

    premises = _wg_triples(f"{sub}/{prem}")
    conclusion = _wg_triples(f"{sub}/{conc}")
    eng = HybridEngine(_ds(premises), load_ruleset("owl-fb"))
    rows = _rows(eng.closure())
    assert _entails(rows, conclusion) == positive


def test_owl_fb_max_cardinality_merging(ray_session):
    """max1: two fillers of a maxCardinality-1 restricted property on one
    instance merge via owl:sameAs (owl-fb.rules max1 semantics)."""
    from jena_ray.stages.rules import HybridEngine, load_ruleset

    OWL = "http://www.w3.org/2002/07/owl#"
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    xsd_int = "<http://www.w3.org/2001/XMLSchema#nonNegativeInteger>"
    data = [
        (f"<{EX}R>", f"<{OWL}onProperty>", f"<{EX}p>"),
        (f"<{EX}R>", f"<{OWL}maxCardinality>", f'"1"^^{xsd_int}'),
        (f"<{EX}i>", rdf_type, f"<{EX}R>"),
        (f"<{EX}i>", f"<{EX}p>", f"<{EX}a>"),
        (f"<{EX}i>", f"<{EX}p>", f"<{EX}b>"),
    ]
    eng = HybridEngine(_ds(data), load_ruleset("owl-fb"))
    rows = _rows(eng.closure())
    assert (f"<{EX}a>", f"<{OWL}sameAs>", f"<{EX}b>") in rows
