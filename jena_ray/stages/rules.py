"""GenericRuleReasoner (forward + hybrid backward subset) on Ray Data.

The reference's rule engine (jena-core reasoner/rulesys/
GenericRuleReasoner.java:47, rule syntax Rule.java:84 — ``[name: (?a p ?b),
builtin(..) -> (?a q ?b)]``) runs RETE/fixpoint over an in-memory graph.
This is the distributed re-expression: **semi-naive forward chaining** where
each rule body is a chain of vectorized pattern scans over the triple
Dataset joined with the hash-bucketed ``binding_join``, and each round only
re-derives from the previous round's DELTA (one body pattern ranges over
the delta, the rest over the full set — the classic semi-naive split), so a
converged fixpoint costs rounds × |delta-joins|, not rounds × |corpus-joins|.

Backward (``head <- body``) rules and the hybrid FB mode are served by
``HybridEngine`` (FBRuleReasoner / FBRuleInfGraph analog): forward rules
close at bind time; a ``find`` goal selects the goal-relevant backward
rules (predicate-reachability magic) and runs the same semi-naive fixpoint
restricted to them, memoized per rule subset — the distributed stand-in
for LPBackwardRuleReasoner's tabled SLD, answer-equivalent on the Datalog
subset these rules occupy.

Subset: triple patterns with variables/constants/wildcards in any slot
(variable predicates included), test builtins (notEqual/equal/ordering/
isLiteral/isBNode/regex), value builtins (sum/difference/product/
quotient/min/max/addOne/strConcat/uriConcat/makeSkolem), tabling
directives as no-ops (the hybrid engine memoizes whole closures), the
noValue guard, one-or-more consequents. No functors-as-actions, no
embedded rules — the batch-materialization north star needs neither (the
rdfs / owl-lite / owl-micro presets are pure triple rules + these
builtins).

Terms stay canonical STRINGS here: rule vocabularies join on arbitrary
slots, and fixpoint deltas are tiny next to the corpus, so the id-space
detour would cost more than the string hash joins it saves. The bucketed
shuffle hashes strings block-locally (stages.dedup._key_hash).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from jena_ray.term import TermError, fmt_iri, fmt_literal

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

DEFAULT_PREFIXES = {
    "rdf": RDF_NS,
    "rdfs": RDFS_NS,
    "owl": OWL_NS,
    "xsd": XSD_NS,
}

# test builtins: boolean row filters (rulesys/builtins/{NotEqual,Equal,
# LessThan,GreaterThan,LE,GE,IsLiteral,NotLiteral,IsBNode,NotBNode,
# Regex}.java). Arity: None = variadic.
_TEST_BUILTINS = {
    "notEqual": 2, "equal": 2, "lessThan": 2, "greaterThan": 2,
    "le": 2, "ge": 2,
    "isLiteral": 1, "notLiteral": 1, "isBNode": 1, "notBNode": 1,
    "regex": 2,
}
# value builtins: bind their OUTPUT variable per row (rulesys/builtins/
# {Sum,Difference,Product,Quotient,Min,Max,AddOne,StrConcat,UriConcat,
# MakeSkolem}.java). Output slot: last argument, except makeSkolem
# (first — MakeSkolem.java's bodyCall binds args[0]).
_BIND_BUILTINS = {
    "sum": 3, "difference": 3, "product": 3, "quotient": 3,
    "min": 3, "max": 3, "addOne": 2,
    "strConcat": None, "uriConcat": None, "makeSkolem": None,
}
# tabling directives (Table/TableAll/Hide.java): RETE/backward-mode
# memoization hints — meaningful only to the hybrid engine; the forward
# fixpoint materializes everything anyway, so they parse as NO-OPS
_DIRECTIVE_BUILTINS = {"table": None, "tableAll": 0, "hide": None}
_BUILTINS = set(_TEST_BUILTINS)
# graph-state guards: negation-as-failure against the round-start graph
# (nonmonotonic, same caveat as the reference's builtin — rulesys/builtins/
# NoValue.java checks the graph at rule-firing time)
_GUARD_BUILTINS = {"noValue"}

TRIPLE_COLS = ("subj", "pred", "obj")


@dataclass
class Rule:
    name: str | None
    body: list[tuple[str, str, str]]  # patterns: '?v' vars / canonical terms
    head: list[tuple[str, str, str]]
    filters: list[tuple] = field(default_factory=list)  # (builtin, a, b)
    backward: bool = False  # written as ``head <- body`` (Rule.java:101)


# --------------------------------------------------------------------- parse

_TOK_RE = re.compile(
    r"""\s+|,                          # whitespace and ignorable commas
      | (?P<comment>\#[^\n]*|//[^\n]*)
      | (?P<arrow>->)
      | (?P<barrow><-)
      | (?P<lbrk>\[)|(?P<rbrk>\])|(?P<lpar>\()|(?P<rpar>\))
      | (?P<var>\?[A-Za-z_][A-Za-z_0-9]*)
      | (?P<star>\*)
      | (?P<iri><[^<>\s]+>)
      | (?P<lit>'[^']*'|"[^"]*")
      | (?P<num>[+-]?\d+(?:\.\d+)?)
      | (?P<name>[A-Za-z_][A-Za-z_0-9.\-]*(?::[A-Za-z_0-9.\-]+)?)
      | (?P<colon>:)
    """,
    re.VERBOSE,
)


def parse_rules(text: str, prefixes: dict[str, str] | None = None) -> list[Rule]:
    """Parse the reference's embedded rule syntax (Rule.java:84 docstring
    grammar, forward subset): ``[name: (pat) builtin(args) -> (pat) ...]``."""
    pfx = dict(DEFAULT_PREFIXES)
    if prefixes:
        pfx.update(prefixes)

    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(text):
        m = _TOK_RE.match(text, i)
        if not m:
            raise TermError(f"cannot tokenize rules at {text[i:i+25]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind and kind != "comment":
            toks.append((kind, m.group()))

    pos = 0
    fresh = [0]

    def peek() -> tuple[str, str]:
        return toks[pos] if pos < len(toks) else ("eof", "")

    def take(kind: str) -> str:
        nonlocal pos
        k, v = peek()
        if k != kind:
            raise TermError(f"rules: expected {kind}, got {v!r}")
        pos += 1
        return v

    def term(tok: tuple[str, str]) -> str:
        k, v = tok
        if k == "var":
            return v
        if k == "star":  # wildcard: fresh variable
            fresh[0] += 1
            return f"?__w{fresh[0]}"
        if k == "iri":
            return v
        if k == "lit":
            return fmt_literal(v[1:-1])
        if k == "num":
            dt = XSD_NS + ("integer" if re.fullmatch(r"[+-]?\d+", v) else "decimal")
            return fmt_literal(v, datatype=dt)
        if k == "name" and ":" in v:
            p, _, local = v.partition(":")
            if p not in pfx:
                raise TermError(f"rules: undefined prefix {p!r}")
            return fmt_iri(pfx[p] + local)
        raise TermError(f"rules: bad term {v!r}")

    def triple() -> tuple[str, str, str]:
        nonlocal pos
        take("lpar")
        out = []
        for _ in range(3):
            out.append(term(peek()))
            pos += 1
        take("rpar")
        return tuple(out)  # type: ignore[return-value]

    rules: list[Rule] = []
    while peek()[0] != "eof":
        take("lbrk")
        name = None
        if peek()[0] == "name" and pos + 1 < len(toks) and toks[pos + 1][0] == "colon":
            name = take("name")
            take("colon")
        body: list[tuple[str, str, str]] = []
        filters: list[tuple] = []
        def _args(fn: str, arity: int | None) -> list[str]:
            nonlocal pos
            take("lpar")
            out: list[str] = []
            while peek()[0] != "rpar":
                out.append(term(peek()))
                pos += 1
            take("rpar")
            if arity is not None and len(out) != arity:
                raise TermError(f"rules: {fn} takes {arity} args")
            return out

        def parse_elements(pats: list, filts: list, stop: tuple) -> None:
            nonlocal pos
            while peek()[0] not in stop:
                k, v = peek()
                if k == "lpar":
                    pats.append(triple())
                elif k == "name" and v in _TEST_BUILTINS:
                    pos += 1
                    filts.append((v, *_args(v, _TEST_BUILTINS[v])))
                elif k == "name" and v in _BIND_BUILTINS:
                    pos += 1
                    args = _args(v, _BIND_BUILTINS[v])
                    if len(args) < 2:
                        raise TermError(f"rules: {v} needs ≥2 args")
                    out_slot = 0 if v == "makeSkolem" else len(args) - 1
                    if not args[out_slot].startswith("?"):
                        raise TermError(
                            f"rules: {v}'s output argument must be a variable"
                        )
                    filts.append((v, *args))
                elif k == "name" and v in _DIRECTIVE_BUILTINS:
                    # tabling hints: parsed, validated, dropped (the hybrid
                    # engine memoizes whole relevant-rule-set closures)
                    pos += 1
                    _args(v, _DIRECTIVE_BUILTINS[v])
                elif k == "name" and v in _GUARD_BUILTINS:
                    pos += 1
                    args = _args(v, None)
                    if len(args) not in (2, 3):
                        raise TermError(f"rules: {v} takes 2 or 3 args")
                    filts.append((v, *args))
                else:
                    raise TermError(f"rules: unexpected {v!r} in body")

        parse_elements(body, filters, ("arrow", "barrow"))
        backward = peek()[0] == "barrow"
        if backward:
            # ``[name: (head...) <- (body...)]`` — Rule.java's backward
            # form (isBackward, Rule.java:101-102): the patterns BEFORE
            # ``<-`` are the conclusion, the elements after are the body
            take("barrow")
            if filters:
                raise TermError(
                    "rules: builtins cannot appear in a backward rule head"
                )
            head = body
            body, filters = [], []
            parse_elements(body, filters, ("rbrk",))
            take("rbrk")
        else:
            take("arrow")
            head = []
            while peek()[0] == "lpar":
                head.append(triple())
            take("rbrk")
        if not body or not head:
            raise TermError("rules: need at least one body and head pattern")
        hv = {t for trip in head for t in trip if t.startswith("?")}
        bv = {t for trip in body for t in trip if t.startswith("?")}
        # bind builtins extend the bound set IN ORDER; their inputs must
        # already be bound (by patterns or earlier builtins)
        for f in filters:
            if f[0] in _BIND_BUILTINS:
                out_slot = 1 if f[0] == "makeSkolem" else len(f) - 1
                ins = [a for j, a in enumerate(f[1:], 1)
                       if j != out_slot and a.startswith("?")]
                missing = [a for a in ins if a not in bv]
                if missing:
                    raise TermError(
                        f"rules: {f[0]} input variables {missing} unbound"
                    )
                bv.add(f[out_slot])
        if not hv <= bv:
            raise TermError(f"rules: unbound head variables {sorted(hv - bv)}")
        gv = {a for f in filters if f[0] in _GUARD_BUILTINS
              for a in f[1:] if a.startswith("?")}
        tv = {a for f in filters if f[0] in _TEST_BUILTINS
              for a in f[1:] if a.startswith("?")}
        if not (gv | tv) <= bv:
            raise TermError(
                f"rules: unbound builtin variables {sorted((gv | tv) - bv)}"
            )
        rules.append(Rule(name, body, head, filters, backward=backward))
    return rules


# ---------------------------------------------------------------- evaluation

def _scan_fn(pattern: tuple[str, str, str]):
    """The per-batch kernel of :func:`_scan` — shared by the distributed
    map_batches path and the driver-local fast path (one table)."""
    consts = [(c, t) for c, t in zip(TRIPLE_COLS, pattern) if not t.startswith("?")]
    var_cols: dict[str, str] = {}
    dupes: list[tuple[str, str]] = []
    for c, t in zip(TRIPLE_COLS, pattern):
        if t.startswith("?"):
            v = t[1:]
            if v in var_cols:
                dupes.append((var_cols[v], c))
            else:
                var_cols[v] = c

    def f(tb: pa.Table) -> pa.Table:
        mask = None
        for c, t in consts:
            m = pc.equal(tb.column(c), t)
            mask = m if mask is None else pc.and_(mask, m)
        for a, b in dupes:
            m = pc.equal(tb.column(a), tb.column(b))
            mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            tb = tb.filter(pc.fill_null(mask, False))
        return pa.table({v: pc.cast(tb.column(c), pa.string())
                         for v, c in var_cols.items()})

    return f


def _scan(ds, pattern: tuple[str, str, str]):
    """Vectorized pattern scan over a (subj,pred,obj) Dataset → binding
    Dataset of string columns named by the pattern's variables."""
    return ds.map_batches(_scan_fn(pattern), batch_format="pyarrow")


def _num(col):
    """Numeric value of canonical literal terms (null for non-numeric)."""
    s = pc.cast(col, pa.string())
    lex = pc.struct_field(pc.extract_regex(s, r'^"(?P<v>[^"]*)"'), "v")
    return pc.cast(
        pc.if_else(
            pc.match_substring_regex(
                pc.fill_null(lex, ""), r"^[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?$"
            ),
            lex,
            pa.scalar(None, type=pa.string()),
        ),
        pa.float64(),
    )


_INT_DT_RE = (r'\^\^<http://www\.w3\.org/2001/XMLSchema#'
              r'(?:integer|int|long|short|byte|nonNegativeInteger|'
              r'positiveInteger|unsignedInt|unsignedLong)>$')


def _lex(col, n: int):
    """Lexical form of term-string values: literal lexical, IRI string,
    bnode label (StrConcat's Node lexical-form rule)."""
    from jena_ray.pipelines.bgp import _str_value

    if isinstance(col, str):
        col = pa.array([col] * n, type=pa.string())
    return _str_value(pc.cast(col, pa.string()))


def _col_or_const(tb: pa.Table, t: str):
    return tb.column(t[1:]) if t.startswith("?") else t


def _num_of(tb: pa.Table, t: str):
    v = _col_or_const(tb, t)
    return _num(v) if not isinstance(v, str) else _num(
        pa.array([v] * tb.num_rows)
    )


def _is_int_term(tb: pa.Table, t: str):
    v = _col_or_const(tb, t)
    if isinstance(v, str):
        import re as _re

        return pa.array([bool(_re.search(_INT_DT_RE, v))] * tb.num_rows)
    return pc.match_substring_regex(pc.cast(v, pa.string()), _INT_DT_RE)


def _num_term(val, is_int):
    """Format numeric results back to canonical literal terms: integer
    literals when every input was integer-typed (Sum.java's
    Util.makeIntNode path), xsd:double otherwise."""
    sval = pc.cast(val, pa.string())
    ival = pc.cast(pc.round(val), pa.int64())
    int_term = pc.binary_join_element_wise(
        '"', pc.cast(ival, pa.string()),
        '"^^<http://www.w3.org/2001/XMLSchema#integer>', "")
    dbl_term = pc.binary_join_element_wise(
        '"', sval, '"^^<http://www.w3.org/2001/XMLSchema#double>', "")
    return pc.if_else(is_int, int_term, dbl_term)


def _filters_fn(filters: list[tuple]):
    """The per-batch kernel of :func:`_apply_filters` — shared by the
    distributed path and the driver-local fast path."""

    def f(tb: pa.Table) -> pa.Table:
        for flt in filters:
            fn, args = flt[0], list(flt[1:])
            if fn in _TEST_BUILTINS:
                if fn in ("notEqual", "equal"):
                    a, b = (_col_or_const(tb, x) for x in args)
                    m = pc.equal(a, b)
                    if fn == "notEqual":
                        m = pc.invert(m)
                elif fn in ("lessThan", "greaterThan", "le", "ge"):
                    an, bn = (_num_of(tb, x) for x in args)
                    kern = {"lessThan": pc.less, "greaterThan": pc.greater,
                            "le": pc.less_equal, "ge": pc.greater_equal}[fn]
                    m = kern(an, bn)
                elif fn in ("isLiteral", "notLiteral"):
                    v = pc.cast(_col_or_const(tb, args[0]), pa.string()) \
                        if args[0].startswith("?") else pa.array(
                            [args[0]] * tb.num_rows)
                    m = pc.starts_with(pc.cast(v, pa.string()), '"')
                    if fn == "notLiteral":
                        m = pc.invert(m)
                elif fn in ("isBNode", "notBNode"):
                    v = _col_or_const(tb, args[0])
                    if isinstance(v, str):
                        v = pa.array([v] * tb.num_rows)
                    m = pc.starts_with(pc.cast(v, pa.string()), "_:")
                    if fn == "notBNode":
                        m = pc.invert(m)
                elif fn == "regex":
                    from jena_ray.term import split_literal

                    subj = _lex(_col_or_const(tb, args[0]), tb.num_rows)
                    pat = args[1]
                    if pat.startswith("?"):
                        # variable pattern: Regex.java resolves the BOUND
                        # node per environment — vectorize per distinct
                        # bound pattern value (round-5 ADVICE: the old code
                        # used the literal text '?v' as the regex)
                        import numpy as np

                        pv = _lex(_col_or_const(tb, pat),
                                  tb.num_rows).to_pylist()
                        m_np = np.zeros(tb.num_rows, dtype=bool)
                        for p in set(pv):
                            if p is None:
                                continue
                            idx = np.flatnonzero(
                                np.array([x == p for x in pv]))
                            sub = pc.match_substring_regex(
                                subj.take(pa.array(idx)), f"^(?:{p})$")
                            m_np[idx] = pc.fill_null(sub, False).to_numpy(
                                zero_copy_only=False)
                        m = pa.array(m_np)
                    else:
                        if pat.startswith('"'):
                            pat = split_literal(pat)[0]
                        m = pc.match_substring_regex(
                            subj,
                            f"^(?:{pat})$",  # Regex.java: full match
                        )
                else:  # pragma: no cover
                    raise ValueError(fn)
                tb = tb.filter(pc.fill_null(m, False))
            elif fn in _BIND_BUILTINS:
                out_slot = 0 if fn == "makeSkolem" else len(args) - 1
                out_var = args[out_slot][1:]
                ins = [a for j, a in enumerate(args) if j != out_slot]
                if fn in ("sum", "difference", "product", "quotient",
                          "min", "max", "addOne"):
                    an = _num_of(tb, ins[0])
                    bn = (_num_of(tb, ins[1]) if len(ins) > 1
                          else pa.array([1.0] * tb.num_rows))
                    val = {
                        "sum": pc.add, "addOne": pc.add,
                        "difference": pc.subtract,
                        "product": pc.multiply,
                        "quotient": pc.divide,
                        "min": pc.min_element_wise,
                        "max": pc.max_element_wise,
                    }[fn](an, bn)
                    is_int = _is_int_term(tb, ins[0])
                    if len(ins) > 1:
                        is_int = pc.and_(is_int, _is_int_term(tb, ins[1]))
                    if fn == "quotient":
                        # integer division only when exact (else double)
                        is_int = pc.and_(
                            is_int, pc.equal(val, pc.round(val))
                        )
                    col = _num_term(val, is_int)
                elif fn in ("strConcat", "uriConcat"):
                    lex = [pc.fill_null(_lex(_col_or_const(tb, a),
                                             tb.num_rows), "")
                           for a in ins]
                    joined = (pc.binary_join_element_wise(*lex, "")
                              if len(lex) > 1 else lex[0])
                    if fn == "strConcat":
                        col = pc.binary_join_element_wise(
                            '"', joined, '"', "")
                    else:
                        col = pc.binary_join_element_wise(
                            "<", joined, ">", "")
                else:  # makeSkolem: deterministic bnode of the arg terms
                    parts = []
                    for a in ins:
                        v = _col_or_const(tb, a)
                        if isinstance(v, str):
                            v = pa.array([v] * tb.num_rows)
                        parts.append(pc.cast(v, pa.string()))
                    key = (pc.binary_join_element_wise(*parts, "\x1f")
                           if len(parts) > 1 else parts[0])
                    import hashlib

                    col = pa.array([
                        "_:sk" + hashlib.md5(k.encode()).hexdigest()[:24]
                        if k is not None else None
                        for k in key.to_pylist()
                    ], type=pa.string())
                if out_var in tb.schema.names:
                    # output already bound: equality check (BindingStack
                    # semantics — a builtin bind to a bound var tests)
                    tb = tb.filter(pc.fill_null(
                        pc.equal(tb.column(out_var), col), False))
                else:
                    tb = tb.append_column(out_var, col)
            else:  # pragma: no cover
                raise ValueError(fn)
        return tb

    return f


def _apply_filters(ds, filters: list[tuple]):
    """Apply test + value builtins IN ORDER per batch: tests mask rows,
    value builtins append the bound output column (visible to later
    builtins and the head)."""
    return ds.map_batches(_filters_fn(filters), batch_format="pyarrow")


def _novalue_pattern(guard: tuple, res_vars: set[str]):
    """Normalize a noValue guard to (scan pattern, shared key vars)."""
    args = list(guard[1:])
    if len(args) == 2:
        args.append("?__nv_obj")
    pat: list[str] = []
    keys: list[str] = []
    for slot, a in zip(TRIPLE_COLS, args):
        if a.startswith("?") and a[1:] in res_vars:
            pat.append(a)
            keys.append(a[1:])
        elif a.startswith("?"):
            pat.append(f"?__nv_{slot}")  # wildcard slot
        else:
            pat.append(a)
    return tuple(pat), keys


def _apply_novalue(res, res_vars: set[str], guard: tuple, full,
                   *, num_buckets: int):
    """``noValue(s, p[, o])`` guard: drop binding rows for which the
    round-start graph ``full`` holds a matching triple (negation as
    failure — nonmonotonic, evaluated per round like the reference's
    rulesys/builtins/NoValue.java fires against the current graph). A
    two-argument form matches any object (wildcard)."""
    import pandas as pd  # noqa: F401  (bucketed_group_apply group fns)

    from jena_ray.stages.dedup import bucketed_group_apply, dedup_batch

    pat, keys = _novalue_pattern(guard, res_vars)
    if not keys:
        # ground/wildcard-only guard: one existence probe decides the rule
        # (_scan would project to a zero-column — hence zero-row — table)
        def probe(tb: pa.Table, _pat=tuple(pat)) -> pa.Table:
            mask = None
            for c, t in zip(TRIPLE_COLS, _pat):
                if not t.startswith("?"):
                    m = pc.equal(tb.column(c), t)
                    mask = m if mask is None else pc.and_(mask, m)
            n = tb.num_rows if mask is None else pc.sum(
                pc.cast(pc.fill_null(mask, False), pa.int64())
            ).as_py()
            return pa.table({"hit": pa.array([1] * min(int(n or 0), 1),
                                             type=pa.int8())})

        blocked = (
            full.map_batches(probe, batch_format="pyarrow").limit(1).count() > 0
        )
        if not blocked:
            return res
        return res.map_batches(lambda tb: tb.slice(0, 0), batch_format="pyarrow")
    bad = _scan(full, tuple(pat))

    cols = sorted(res_vars)

    def mark_left(tb: pa.Table) -> pa.Table:
        tb = tb.select(cols)
        return tb.append_column("_nv", pa.array([0] * tb.num_rows, type=pa.int8()))

    def mark_bad(tb: pa.Table) -> pa.Table:
        tb = dedup_batch(tb.select(sorted(keys)), sorted(keys))
        out = {}
        for c in cols:
            if c in keys:
                out[c] = pc.cast(tb.column(c), pa.string())
            else:
                out[c] = pa.nulls(tb.num_rows, type=pa.string())
        t2 = pa.table(out)
        return t2.append_column("_nv", pa.array([1] * t2.num_rows, type=pa.int8()))

    u = res.map_batches(mark_left, batch_format="pyarrow").union(
        bad.map_batches(mark_bad, batch_format="pyarrow")
    )

    def per_bucket(df):
        hit = df.loc[df["_nv"] == 1, keys].drop_duplicates()
        keep = df.loc[df["_nv"] == 0, cols].merge(
            hit, on=keys, how="left", indicator=True
        )
        return keep.loc[keep["_merge"] == "left_only", cols]

    return bucketed_group_apply(u, keys, per_bucket, num_buckets=num_buckets)


def _pattern_vars(p: tuple[str, str, str]) -> set[str]:
    return {t[1:] for t in p if t.startswith("?")}


def _order_patterns(body: list, delta_idx: int) -> list[tuple[int, tuple]]:
    """Join order: the delta pattern first, then most-connected-first so no
    join is a cartesian product (raise if unavoidable)."""
    rest = [(i, p) for i, p in enumerate(body) if i != delta_idx]
    ordered = [(delta_idx, body[delta_idx])]
    bound = _pattern_vars(body[delta_idx])
    while rest:
        k = next((j for j, (_, p) in enumerate(rest) if _pattern_vars(p) & bound),
                 None)
        if k is None:
            raise ValueError("rule body requires a cartesian product join")
        i, p = rest.pop(k)
        ordered.append((i, p))
        bound |= _pattern_vars(p)
    return ordered


def _emit_fn(head: tuple):
    """Per-batch head emission (bindings table → derived triples)."""

    def emit(tb: pa.Table, _head=tuple(head)) -> pa.Table:
        parts = []
        for trip in _head:
            cols = {}
            for c, t in zip(TRIPLE_COLS, trip):
                if t.startswith("?"):
                    cols[c] = pc.cast(tb.column(t[1:]), pa.string())
                else:
                    cols[c] = pa.array([t] * tb.num_rows, type=pa.string())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return emit


def _eval_rule(rule: Rule, full, delta, *, num_buckets: int):
    """Semi-naive: union over i of (pattern_i over DELTA ⋈ others over
    FULL). Returns the derived (subj,pred,obj) Dataset (pre-dedup)."""
    from jena_ray.pipelines.bgp import binding_join

    batch_filters = [f for f in rule.filters if f[0] not in _GUARD_BUILTINS]
    guards = [f for f in rule.filters if f[0] in _GUARD_BUILTINS]
    outs = []
    # round 1 runs with delta == full: every semi-naive variant scans the
    # same data, so ONE variant suffices (3× fewer join chains for
    # 3-pattern rules on the heaviest round)
    n_variants = 1 if delta is full else len(rule.body)
    for di in range(n_variants):
        ordered = _order_patterns(rule.body, di)
        res = None
        res_vars: set[str] = set()
        for i, p in ordered:
            side = _scan(delta if i == di else full, p)
            pv = _pattern_vars(p)
            if res is None:
                res, res_vars = side, pv
                continue
            shared = sorted(res_vars & pv)
            all_vars = res_vars | pv
            res = binding_join(
                res, res_vars, side, pv, shared,
                num_buckets=num_buckets,
                col_types={v: pa.string() for v in all_vars},
            )
            res_vars = all_vars
        if batch_filters:
            res = _apply_filters(res, batch_filters)
            for f in batch_filters:
                if f[0] in _BIND_BUILTINS:
                    out_slot = 1 if f[0] == "makeSkolem" else len(f) - 1
                    res_vars = res_vars | {f[out_slot][1:]}
        for guard in guards:
            res = _apply_novalue(res, res_vars, guard, full,
                                 num_buckets=num_buckets)

        outs.append(res.map_batches(_emit_fn(rule.head),
                                    batch_format="pyarrow"))
    # ONE multi-input union, not a chained tree: a 10-rule set × variants
    # × joins builds hundreds of plan operators per round, and a linear
    # union chain makes the plan deep enough to blow Python's recursion
    # limit inside Ray's plan/stats walkers
    return outs[0] if len(outs) == 1 else outs[0].union(*outs[1:])


# --------------------------------------------- driver-local small-graph path

# Below this many input triples the fixpoint runs DRIVER-LOCAL on in-memory
# Arrow tables with the SAME per-batch kernels (_scan_fn/_filters_fn/
# _emit_fn) — semantics identical, zero per-operation cluster overhead.
# Rule fixpoints iterate (rounds × rules × variants × joins); at
# vocabulary-scale inputs every one of those steps is a fixed-cost
# distributed op over a handful of rows, which made a 30-rule OWL preset
# over 15 triples take minutes. The reference runs entirely in memory;
# the distributed path remains the ≥budget default (rules_order_chain and
# the bench stay distributed). Monkeypatchable for tests.
RULES_LOCAL_BUDGET = 5_000


def _eval_rule_local(rule: Rule, full_tb: pa.Table,
                     delta_tb: pa.Table) -> pa.Table:
    """_eval_rule on in-memory tables: same kernels, pandas merges for the
    binding joins, local anti-merge for noValue."""
    import pandas as pd

    batch_filters = [f for f in rule.filters if f[0] not in _GUARD_BUILTINS]
    guards = [f for f in rule.filters if f[0] in _GUARD_BUILTINS]
    outs = []
    n_variants = 1 if delta_tb is full_tb else len(rule.body)
    for di in range(n_variants):
        ordered = _order_patterns(rule.body, di)
        res_df = None
        for i, p in ordered:
            side = _scan_fn(p)(delta_tb if i == di else full_tb).to_pandas()
            if res_df is None:
                res_df = side
                continue
            shared = sorted(set(res_df.columns) & set(side.columns))
            res_df = res_df.merge(side, on=shared)
        tb = pa.table({
            c: pa.array(res_df[c], type=pa.string()) for c in res_df.columns
        })
        if batch_filters:
            tb = _filters_fn(batch_filters)(tb)
        for guard in guards:
            res_vars = set(tb.schema.names)
            pat, keys = _novalue_pattern(guard, res_vars)
            if not keys:
                if _ground_probe_local(full_tb, pat):
                    tb = tb.slice(0, 0)
                continue
            bad = _scan_fn(pat)(full_tb).to_pandas().drop_duplicates()
            df = tb.to_pandas()
            merged = df.merge(bad[keys].drop_duplicates(), on=keys,
                              how="left", indicator=True)
            df = merged.loc[merged["_merge"] == "left_only",
                            list(tb.schema.names)]
            tb = pa.table({
                c: pa.array(df[c], type=pa.string())
                for c in tb.schema.names
            })
        outs.append(_emit_fn(rule.head)(tb))
    return pa.concat_tables(outs) if outs else pa.table(
        {c: pa.array([], type=pa.string()) for c in TRIPLE_COLS})


def _ground_probe_local(full_tb: pa.Table, pat: tuple) -> bool:
    mask = None
    for c, t in zip(TRIPLE_COLS, pat):
        if not t.startswith("?"):
            m = pc.equal(full_tb.column(c), t)
            mask = m if mask is None else pc.and_(mask, m)
    if mask is None:
        return full_tb.num_rows > 0
    return bool(pc.any(pc.fill_null(mask, False)).as_py())


def _collect_triples(ds) -> pa.Table:
    """Driver-local copy of a bounded triples Dataset (string schema;
    0-column empty blocks from upstream groupbys dropped)."""
    parts = [
        pa.table({c: pc.cast(b.column(c), pa.string())
                  for c in TRIPLE_COLS})
        for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if not parts:
        return pa.table({c: pa.array([], type=pa.string())
                         for c in TRIPLE_COLS})
    return pa.concat_tables(parts)


def _forward_chain_local(rules: list[Rule], full_tb: pa.Table,
                         max_rounds: int):
    """Driver-local semi-naive fixpoint. Returns (triples table, rounds)."""
    def rows_of(tb: pa.Table) -> set:
        return set(zip(*(tb.column(c).to_pylist() for c in TRIPLE_COLS)))

    def tb_of(rows: set) -> pa.Table:
        rows = sorted(rows)
        return pa.table({
            c: pa.array([r[j] for r in rows], type=pa.string())
            for j, c in enumerate(TRIPLE_COLS)
        })

    full_rows = rows_of(full_tb)
    full_tb = tb_of(full_rows)
    delta_tb = full_tb
    rounds = 0
    for _ in range(max_rounds):
        derived = pa.concat_tables([
            _eval_rule_local(r, full_tb, delta_tb) for r in rules
        ]) if rules else tb_of(set())
        new_rows = rows_of(derived) - full_rows
        rounds += 1
        if not new_rows:
            return tb_of(full_rows), rounds
        full_rows |= new_rows
        full_tb = tb_of(full_rows)
        delta_tb = tb_of(new_rows)
    raise RuntimeError(f"rule fixpoint did not converge in {max_rounds} rounds")


def _minus(new, old, *, num_buckets: int):
    """new \\ old on (subj,pred,obj): marker + bucketed anti-merge (the
    sparql_update._set_minus shape — join-free, empty-block-safe)."""
    import pandas as pd  # noqa: F401

    from jena_ray.stages.dedup import bucketed_group_apply

    cols = list(TRIPLE_COLS)

    def mark(v: int):
        def f(tb: pa.Table) -> pa.Table:
            return tb.append_column("_old", pa.array([v] * tb.num_rows, type=pa.int8()))
        return f

    u = new.map_batches(mark(0), batch_format="pyarrow").union(
        old.map_batches(mark(1), batch_format="pyarrow")
    )

    def per_bucket(df):
        bad = df.loc[df["_old"] == 1, cols].drop_duplicates()
        keep = df.loc[df["_old"] == 0, cols].drop_duplicates().merge(
            bad, on=cols, how="left", indicator=True
        )
        return keep.loc[keep["_merge"] == "left_only", cols]

    return bucketed_group_apply(
        u, cols, per_bucket, num_buckets=num_buckets, coalesce=True
    )


def forward_chain(
    triples,
    rules: list[Rule] | str,
    *,
    max_rounds: int = 30,
    num_buckets: int = 16,
):
    """Fixpoint materialization: input triples ∪ everything the rules
    derive. Returns (Dataset, rounds_run). The per-round driver work is one
    ``count()`` on the delta — everything else is Dataset lineage
    (materialized per round to bound it, as the fixpoint loop is inherently
    iterative)."""
    from jena_ray.stages.dedup import dedup_exact

    if isinstance(rules, str):
        rules = parse_rules(rules)
    if any(r.backward for r in rules):
        raise TermError(
            "forward_chain got backward (`<-`) rules — use HybridEngine "
            "(the FBRuleReasoner analog) for mixed forward/backward sets"
        )

    def three(tb: pa.Table) -> pa.Table:
        return tb.select(list(TRIPLE_COLS))

    full = dedup_exact(
        triples.map_batches(three, batch_format="pyarrow"), cols=TRIPLE_COLS
    ).materialize()
    if full.count() <= RULES_LOCAL_BUDGET:
        import ray.data as rd

        out_tb, rounds = _forward_chain_local(
            rules, _collect_triples(full), max_rounds
        )
        return rd.from_arrow(out_tb), rounds
    delta = full
    rounds = 0
    # a large preset (owl-micro: 18 rules × semi-naive variants × join
    # stages) builds plans deep enough to hit Python's default recursion
    # limit inside Ray's plan walkers — raise it for the fixpoint loop
    import sys

    _old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(_old_limit, 20_000))
    try:
        return _forward_chain_loop(
            rules, full, delta, rounds, max_rounds, num_buckets
        )
    finally:
        sys.setrecursionlimit(_old_limit)


def _forward_chain_loop(rules, full, delta, rounds, max_rounds, num_buckets):
    for _ in range(max_rounds):
        per_rule = [
            _eval_rule(r, full, delta, num_buckets=num_buckets) for r in rules
        ]
        derived = (
            per_rule[0] if len(per_rule) == 1
            else per_rule[0].union(*per_rule[1:])
        )
        # no separate dedup shuffle: _minus's per-bucket anti-merge already
        # drop_duplicates the new side (one shuffle per round, not two)
        delta = _minus(derived, full, num_buckets=num_buckets).materialize()
        rounds += 1
        if delta.count() == 0:
            break
        full = full.union(delta).materialize()
    else:
        raise RuntimeError(f"rule fixpoint did not converge in {max_rounds} rounds")
    return full, rounds


# ------------------------------------------------------- backward / hybrid


def relevant_backward_rules(rules: list[Rule], goal_pred: str | None) -> list[int]:
    """Goal-directed rule selection (magic-sets at predicate granularity):
    the indexes of backward rules that can contribute to a goal with
    predicate ``goal_pred`` — rules whose head predicate matches, closed
    transitively through their body predicates. A variable head predicate
    always matches; a variable body predicate makes everything reachable.
    ``goal_pred=None`` (unbound goal predicate) selects every rule.

    This is the sideways-information-free half of magic sets: it prunes
    whole derivation trees the goal can never reach, which is the dominant
    win for preset rule files (a find on one predicate must not pay the
    fixpoint of 50 unrelated rules). Per-binding filtering happens anyway
    at the final scan; at crawl scale the fixpoint is shared across all
    bindings, exactly like the reference's tabled LP engine shares its
    memo tables (LPBRuleEngine.java tabledGoals)."""
    if goal_pred is None:
        return list(range(len(rules)))
    needed = {goal_pred}
    chosen: list[int] = []
    changed = True
    while changed:
        changed = False
        for i, r in enumerate(rules):
            if i in chosen:
                continue
            if any(t[1].startswith("?") or t[1] in needed for t in r.head):
                chosen.append(i)
                changed = True
                for t in r.body:
                    if t[1].startswith("?"):
                        return list(range(len(rules)))
                    needed.add(t[1])
    return sorted(chosen)


class HybridEngine:
    """FBRuleReasoner re-expressed for Ray Data (jena-core reasoner/
    rulesys/FBRuleReasoner.java + FBRuleInfGraph): forward (``->``) rules
    run to fixpoint at construction ("bind time"), backward (``<-``) rules
    answer ``find`` goals on demand.

    Goal-directed evaluation strategy: instead of per-binding tabled SLD
    (LPBackwardRuleReasoner's interpreter — a per-row pointer machine that
    cannot be vectorized), a find selects the goal-relevant backward rules
    (relevant_backward_rules — predicate-reachability magic) and runs the
    existing SEMI-NAIVE fixpoint restricted to that subset over the
    forward-closed graph. For the Datalog subset these rules occupy (no
    functors — same subset the forward engine supports), the restricted
    fixpoint computes exactly the answers tabled SLD would produce; the
    closure per relevant-rule-set is memoized (the distributed analog of
    the LP engine's tabled goals), so repeated finds on the same predicate
    family cost one scan. Builtins are supported in backward bodies via
    the shared _eval_rule machinery."""

    def __init__(self, triples, rules: list[Rule] | str, *,
                 max_rounds: int = 30, num_buckets: int = 16):
        from jena_ray.stages.dedup import dedup_exact

        if isinstance(rules, str):
            rules = parse_rules(rules)
        self._bwd = [r for r in rules if r.backward]
        fwd = [r for r in rules if not r.backward]
        self._max_rounds = max_rounds
        self._num_buckets = num_buckets
        if fwd:
            self.graph, _ = forward_chain(
                triples, fwd, max_rounds=max_rounds, num_buckets=num_buckets
            )
        else:
            def three(tb: pa.Table) -> pa.Table:
                return tb.select(list(TRIPLE_COLS))

            self.graph = dedup_exact(
                triples.map_batches(three, batch_format="pyarrow"),
                cols=TRIPLE_COLS,
            ).materialize()
        self._tables: dict[frozenset, object] = {}

    def _closure_for(self, idxs: list[int]):
        key = frozenset(idxs)
        if key not in self._tables:
            if not idxs:
                self._tables[key] = self.graph
            elif self.graph.count() <= RULES_LOCAL_BUDGET:
                import ray.data as rd

                closed_tb, _ = _forward_chain_local(
                    [self._bwd[i] for i in idxs],
                    _collect_triples(self.graph), self._max_rounds,
                )
                self._tables[key] = rd.from_arrow(closed_tb)
            else:
                import sys

                rules = [self._bwd[i] for i in idxs]
                _old = sys.getrecursionlimit()
                sys.setrecursionlimit(max(_old, 20_000))
                try:
                    closed, _ = _forward_chain_loop(
                        rules, self.graph, self.graph, 0,
                        self._max_rounds, self._num_buckets,
                    )
                finally:
                    sys.setrecursionlimit(_old)
                self._tables[key] = closed
        return self._tables[key]

    def find(self, s: str | None = None, p: str | None = None,
             o: str | None = None):
        """InfGraph.find(s, p, o): matching triples from data ∪ forward
        closure ∪ goal-relevant backward derivations. ``None`` (or a
        ``?var``) is a wildcard slot."""
        def wild(t):
            return t is None or (isinstance(t, str) and t.startswith("?"))

        goal_pred = None if wild(p) else p
        g = self._closure_for(relevant_backward_rules(self._bwd, goal_pred))
        consts = [(c, t) for c, t in zip(TRIPLE_COLS, (s, p, o))
                  if not wild(t)]

        def match(tb: pa.Table, _c=tuple(consts)) -> pa.Table:
            mask = None
            for col, t in _c:
                m = pc.equal(tb.column(col), t)
                mask = m if mask is None else pc.and_(mask, m)
            return tb if mask is None else tb.filter(
                pc.fill_null(mask, False))

        return g.map_batches(match, batch_format="pyarrow")

    def closure(self):
        """The full inference closure (find(ANY, ANY, ANY) shape)."""
        return self.find()


def order_chain_closure(sf_dir: str):
    """Driver query: transitive closure of per-customer order-succession
    edges via the generic rule engine. Each customer's orders (by
    o_orderdate, o_orderkey) form a chain; the rule
    ``[tc: (?a next ?b) (?b next ?c) -> (?a next ?c)]`` materializes full
    reachability — the DuckDB oracle is the same closure as a recursive
    CTE. Returns (a, b) int64 orderkey pairs, sorted."""
    import pandas as pd
    import ray.data as rd

    from jena_ray.stages.dedup import bucketed_group_apply

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def edges(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        nxt = df.groupby("o_custkey", sort=False)["o_orderkey"].shift(-1)
        m = nxt.notna()
        return pd.DataFrame(
            {
                "a": df.loc[m, "o_orderkey"].astype("int64"),
                "b": nxt[m].astype("int64"),
            }
        )

    edge_pairs = bucketed_group_apply(ds, ["o_custkey"], edges, coalesce=True)

    def to_triples(tb: pa.Table) -> pa.Table:
        def term(col):
            return pc.binary_join_element_wise(
                "<urn:o:", pc.cast(tb.column(col), pa.string()), ">", ""
            )

        n = tb.num_rows
        return pa.table(
            {
                "subj": term("a"),
                "pred": pa.array(["<urn:p:next>"] * n, type=pa.string()),
                "obj": term("b"),
            }
        )

    triples = edge_pairs.map_batches(to_triples, batch_format="pyarrow")
    closed, _rounds = forward_chain(
        triples,
        "[tc: (?a <urn:p:next> ?b) (?b <urn:p:next> ?c) -> (?a <urn:p:next> ?c)]",
    )

    def to_ints(tb: pa.Table) -> pa.Table:
        a = pc.cast(
            pc.struct_field(
                pc.extract_regex(tb.column("subj"), r"<urn:o:(?P<v>\d+)>"), "v"
            ),
            pa.int64(),
        )
        b = pc.cast(
            pc.struct_field(
                pc.extract_regex(tb.column("obj"), r"<urn:o:(?P<v>\d+)>"), "v"
            ),
            pa.int64(),
        )
        return pa.table({"a": a, "b": b})

    return closed.map_batches(to_ints, batch_format="pyarrow").sort(["a", "b"])


def load_ruleset(name: str) -> list[Rule]:
    """Built-in rule presets (the reference ships etc/rdfs.rules etc. for
    GenericRuleReasoner): 'rdfs' (rdfs2/3/5/7/9/11), 'owl-lite'
    (symmetric/transitive/inverse/equivalent/sameAs property semantics),
    'owl-micro' (OWLMicroReasoner scope: RDFS core + owl-lite +
    functional/inverse-functional equality reasoning with sameAs
    propagation + hasValue restrictions), and 'owl-fb' (round-5 —
    OWLFBRuleReasoner's functor-free subset with backward recognition
    rules for someValuesFrom/allValuesFrom/minCardinality; run it through
    HybridEngine; exclusions documented in the preset file)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rulesets",
        f"{name}.rules",
    )
    with open(path) as f:
        return parse_rules(f.read())
