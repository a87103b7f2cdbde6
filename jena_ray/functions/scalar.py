"""Scalar function library + registries (SPARQL expression parity, §2.8/2.10).

The reference exposes ~90 expression classes (jena-arq sparql/expr/E_*.java)
and registries for user extensions (FunctionRegistry.java:32,86-102,
AggregateRegistry.java:31). Here each function is a vectorized kernel over
Arrow arrays (pyarrow.compute / numpy / pandas), registered by name, applied
inside map_batches via ``apply_fn``.

Value semantics note: these operate on plain columns. For RDF term columns
(canonical N-Triples strings) the term accessors (str/lang/datatype) mirror
E_Str / E_Lang / E_Datatype via jena_ray.term.split_literal.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FUNCTIONS: dict[str, Callable] = {}
AGGREGATES: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        FUNCTIONS[name] = fn
        return fn

    return deco


def register_aggregate(name: str, factory: Callable) -> None:
    """AggregateRegistry.put analog: factory(col, alias) → ray AggregateFn."""
    AGGREGATES[name] = factory


def apply_fn(ds, name: str, out_col: str, *in_cols: str, **kwargs):
    """map_batches wrapper: ds + registered function → ds with a new column."""
    fn = FUNCTIONS[name]

    def run(batch: pa.Table) -> pa.Table:
        args = [batch.column(c) for c in in_cols]
        return batch.append_column(out_col, fn(*args, **kwargs))

    return ds.map_batches(run, batch_format="pyarrow")


# ---- strings (E_StrLength, E_StrUpperCase, ..., E_StrConcat, E_Regex) ----


@register("strlen")
def strlen(a):
    return pc.utf8_length(a)


@register("ucase")
def ucase(a):
    return pc.utf8_upper(a)


@register("lcase")
def lcase(a):
    return pc.utf8_lower(a)


@register("substr")
def substr(a, *, start: int, length: int | None = None):
    # SPARQL SUBSTR is 1-based (E_StrSubstring / XPath fn:substring)
    return pc.utf8_slice_codeunits(
        a, start - 1, None if length is None else start - 1 + length
    )


@register("strstarts")
def strstarts(a, *, prefix: str):
    return pc.starts_with(a, prefix)


@register("strends")
def strends(a, *, suffix: str):
    return pc.ends_with(a, suffix)


@register("contains")
def contains(a, *, pat: str):
    return pc.match_substring(a, pat)


@register("concat")
def concat(*arrays, sep: str = ""):
    return pc.binary_join_element_wise(*arrays, sep)


@register("replace")
def replace(a, *, pat: str, rep: str):
    return pc.replace_substring_regex(a, pat, rep)


@register("regex")
def regex(a, *, pat: str):
    # E_Regex (Java regex engine; pyarrow uses RE2 — document the divergence
    # for backreference patterns)
    return pc.match_substring_regex(a, pat)


@register("strbefore")
def strbefore(a, *, sep: str):
    # E_StrBefore: "" when the separator is absent (not an error)
    return pa.array(
        [
            None if v is None else (v.split(sep, 1)[0] if sep in v else "")
            for v in a.to_pylist()
        ],
        type=pa.string(),
    )


@register("strafter")
def strafter(a, *, sep: str):
    return pa.array(
        [
            None if v is None else (v.split(sep, 1)[1] if sep in v else "")
            for v in a.to_pylist()
        ],
        type=pa.string(),
    )


@register("encode_for_uri")
def encode_for_uri(a):
    import urllib.parse

    return pa.array(
        [None if v is None else urllib.parse.quote(v, safe="") for v in a.to_pylist()],
        type=pa.string(),
    )


# ---- hashes (E_MD5, E_SHA1, E_SHA256, E_SHA384, E_SHA512) ----


def _hash_fn(algo: str):
    def fn(a):
        return pa.array(
            [
                None if v is None else hashlib.new(algo, v.encode("utf-8")).hexdigest()
                for v in a.to_pylist()
            ],
            type=pa.string(),
        )

    return fn


for _algo in ("md5", "sha1", "sha224", "sha256", "sha384", "sha512"):
    FUNCTIONS[_algo] = _hash_fn(_algo)


@register("normalize_space")
def normalize_space(a):
    # FN_StrNormalizeSpace (XPath fn:normalize-space): trim + collapse
    # internal whitespace runs to a single space
    return pc.replace_substring_regex(
        pc.utf8_trim_whitespace(a), r"[ \t\r\n]+", " "
    )


@register("normalize_unicode")
def normalize_unicode(a, *, form: str = "NFC"):
    # FN_StrNormalizeUnicode (fn:normalize-unicode; NFC default)
    import unicodedata

    return pa.array(
        [None if v is None else unicodedata.normalize(form, v)
         for v in a.to_pylist()],
        type=pa.string(),
    )


@register("localname")
def localname(a):
    # apf/library localname: the IRI fragment after the last '#' or '/'
    # (SplitIRI.localname) over canonical `<...>` terms; null for non-IRIs
    return pc.struct_field(
        pc.extract_regex(a, r"^<.*[/#](?P<v>[^/#]*)>$"), "v"
    )


@register("namespace")
def namespace(a):
    # library namespace: everything up to and including the last '#'/'/'
    return pc.struct_field(
        pc.extract_regex(a, r"^<(?P<v>.*[/#])[^/#]*>$"), "v"
    )


# ---- numerics (E_NumAbs, E_NumCeiling, E_NumFloor, E_NumRound, Math_*) ----


@register("abs")
def abs_(a):
    return pc.abs(a)


@register("ceil")
def ceil(a):
    return pc.ceil(a)


@register("floor")
def floor(a):
    return pc.floor(a)


@register("round")
def round_(a, *, ndigits: int = 0):
    return pc.round(a, ndigits=ndigits)


@register("sqrt")
def sqrt(a):
    return pc.sqrt(a)


@register("pow")
def pow_(a, *, exp: float):
    return pc.power(a, exp)


@register("exp")
def exp(a):
    return pc.exp(a)


@register("log")
def log(a):
    return pc.ln(a)


@register("log10")
def log10(a):
    return pc.log10(pc.cast(a, pa.float64()))


@register("log2")
def log2(a):
    return pc.log2(pc.cast(a, pa.float64()))


@register("exp10")
def exp10(a):
    # Math_exp10: 10^x
    return pc.power(pa.scalar(10.0), pc.cast(a, pa.float64()))


@register("sin")
def sin(a):
    return pc.sin(pc.cast(a, pa.float64()))


@register("cos")
def cos(a):
    return pc.cos(pc.cast(a, pa.float64()))


@register("tan")
def tan(a):
    return pc.tan(pc.cast(a, pa.float64()))


@register("asin")
def asin(a):
    return pc.asin(pc.cast(a, pa.float64()))


@register("acos")
def acos(a):
    return pc.acos(pc.cast(a, pa.float64()))


@register("atan")
def atan(a):
    return pc.atan(pc.cast(a, pa.float64()))


@register("atan2")
def atan2(a, b):
    # Math_atan2(y, x)
    return pc.atan2(pc.cast(a, pa.float64()), pc.cast(b, pa.float64()))


@register("round_half_even")
def round_half_even(a, *, ndigits: int = 0):
    # FN_Round_Half_Even (fn:round-half-to-even, banker's rounding)
    return pc.round(a, ndigits=ndigits, round_mode="half_to_even")


# ---- datetimes (E_DateTimeYear ... E_DateTimeSeconds, E_Now is banned —
# deterministic pipelines take the timestamp as config) ----


@register("year")
def year(a):
    return pc.year(a)


@register("month")
def month(a):
    return pc.month(a)


@register("day")
def day(a):
    return pc.day(a)


@register("hours")
def hours(a):
    return pc.hour(a)


@register("minutes")
def minutes(a):
    return pc.minute(a)


@register("seconds")
def seconds(a):
    return pc.second(a)


@register("tz")
def tz(a):
    # E_DateTimeTZ: the LEXICAL timezone of an xsd:dateTime lexical form —
    # "Z", "+05:00", … or "" when absent (NodeValue.dtGetTZ). Input is the
    # lexical string (term_str of the literal), not an Arrow timestamp,
    # because Arrow timestamps normalize the offset away.
    ext = pc.struct_field(
        pc.extract_regex(a, r"(?P<v>Z|[+-][0-9]{2}:[0-9]{2})$"), "v"
    )
    return pc.if_else(pc.is_valid(a), pc.fill_null(ext, ""), ext)


@register("timezone")
def timezone(a):
    # E_DateTimeTimezone: timezone as an xsd:dayTimeDuration lexical
    # ("PT0S" for Z, "-PT5H"/"PT5H30M" for offsets); null (eval error)
    # when the dateTime carries no timezone
    out = []
    for v in a.to_pylist():
        if v is None:
            out.append(None)
        elif v.endswith("Z"):
            out.append("PT0S")
        elif len(v) >= 6 and v[-6] in "+-" and v[-3] == ":":
            sign = "-" if v[-6] == "-" else ""
            h, m = int(v[-5:-3]), int(v[-2:])
            if h == 0 and m == 0:
                out.append("PT0S")
            else:
                parts = (f"{h}H" if h else "") + (f"{m}M" if m else "")
                out.append(f"{sign}PT{parts}")
        else:
            out.append(None)
    return pa.array(out, type=pa.string())


# ---- term constructors (E_StrDatatype / E_StrLang / E_IRI; E_BNode's
# fresh-per-row label becomes a deterministic skolem hash — E_UUID /
# E_StrUUID / E_Random / E_Now stay banned: nondeterminism breaks
# shard-resumable pipelines) ----


@register("strdt")
def strdt(a, *, datatype: str):
    from jena_ray.term import fmt_literal

    return pa.array(
        [None if v is None else fmt_literal(v, datatype=datatype)
         for v in a.to_pylist()],
        type=pa.string(),
    )


@register("strlang")
def strlang(a, *, lang: str):
    from jena_ray.term import canonical_langtag, fmt_literal

    tag = canonical_langtag(lang)
    return pa.array(
        [None if v is None else fmt_literal(v, lang=tag)
         for v in a.to_pylist()],
        type=pa.string(),
    )


@register("iri")
def iri(a, *, base: str | None = None):
    from jena_ray.term import TermError, fmt_iri, resolve_iri

    out = []
    for v in a.to_pylist():
        if v is None:
            out.append(None)
            continue
        if v.startswith("<"):  # IRI(?iri) is the identity on IRI terms
            out.append(v)
            continue
        try:
            out.append(fmt_iri(resolve_iri(base, v)))
        except TermError:
            out.append(None)  # eval error → unbound, SPARQL error semantics
    return pa.array(out, type=pa.string())


@register("bnode_for")
def bnode_for(a):
    # E_BNode(expr) analog: one blank node PER DISTINCT INPUT, labeled by a
    # content hash (the skolemization strategy used across this engine);
    # diverges from the reference's fresh-label-per-row semantics, which
    # cannot be reproduced deterministically under shard retry
    import hashlib

    return pa.array(
        [None if v is None
         else "_:B" + hashlib.sha1(v.encode("utf-8")).hexdigest()[:16]
         for v in a.to_pylist()],
        type=pa.string(),
    )


# ---- RDF term accessors (E_Str, E_Lang, E_Datatype, E_IsIRI/IsBlank/IsLiteral,
# E_SameTerm is plain string equality on canonical terms) ----


def _term_kind_np(values: list) -> np.ndarray:
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        c = v[0] if v else ""
        out[i] = "iri" if c == "<" else ("bnode" if c == "_" else "literal")
    return out


@register("term_kind")
def term_kind(a):
    return pa.array(_term_kind_np(a.to_pylist()), type=pa.string())


@register("term_str")
def term_str(a):
    from jena_ray import term as T

    out = []
    for v in a.to_pylist():
        if v is None:
            out.append(None)
        elif v.startswith("<<"):
            out.append(None)  # STR(tripleTerm) is an eval error (NodeFunctions)
        elif v.startswith("<"):
            out.append(v[1:-1])
        elif v.startswith('"'):
            out.append(T.split_literal(v)[0])
        else:
            out.append(v[2:])
    return pa.array(out, type=pa.string())


@register("term_lang")
def term_lang(a):
    from jena_ray import term as T

    out = []
    for v in a.to_pylist():
        if v is None or not v.startswith('"'):
            out.append("")
        else:
            out.append(T.split_literal(v)[1] or "")
    return pa.array(out, type=pa.string())


@register("term_datatype")
def term_datatype(a):
    from jena_ray import term as T
    from jena_ray.term import RDF_LANGSTRING, XSD_STRING

    out = []
    for v in a.to_pylist():
        if v is None:
            out.append(None)
        elif not v.startswith('"'):
            out.append("")
        else:
            _, lang, dt = T.split_literal(v)
            out.append(RDF_LANGSTRING if lang else (dt or XSD_STRING))
    return pa.array(out, type=pa.string())


# --------------------------------------------------------------------------
# aggregate parity (AggGroupConcat / AggMedian / AggMode / AggSample /
# Agg*Distinct — jena-arq sparql/expr/aggregate/Agg*.java) as registered
# Ray AggregateFn factories (AggregateRegistry.java:31 analog).
#
# Accumulators: group_concat / count_distinct / sum_distinct hold the
# DISTINCT value set (bounded by domain cardinality, not group size);
# median/mode hold all values / value counts per group — fine for
# grouped-aggregate shapes with bounded groups. At crawl scale swap median
# for a quantile sketch (ray.data.aggregate.Quantile / t-digest); the
# registry seam is exactly where that substitution lands.
# --------------------------------------------------------------------------


def _col_vals(block, col):
    if isinstance(block, pa.Table):
        return block.column(col).drop_null().to_pylist()
    return block[col].dropna().tolist()


def _make_agg(col, alias, init, acc_vals, merge, finalize):
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: init(),
        accumulate_block=lambda a, block: acc_vals(a, _col_vals(block, col)),
        merge=merge,
        finalize=finalize,
        name=alias,
    )


# NOTE: accumulators are serialized through Arrow blocks between the map and
# reduce sides, which turns sets into lists and Counters into dicts — every
# merge/finalize below coerces its inputs back before combining.


def agg_group_concat(col, alias, sep="|"):
    """GroupConcat(DISTINCT, value-ordered) — deterministic under any block
    order (AggGroupConcatDistinct; Jena's ordering is arrival-order, which
    is nondeterministic under parallelism — sorted order is the stable
    choice)."""
    return _make_agg(
        col, alias, set, lambda a, vs: set(a) | set(vs),
        lambda a, b: set(a) | set(b),
        lambda a: sep.join(sorted(set(a))),
    )


def agg_median(col, alias):
    """AggMedian: exact median; even counts interpolate (lo+hi)/2."""

    def fin(vals):
        vals = sorted(list(vals))
        n = len(vals)
        if n == 0:
            return None
        m = n // 2
        return float(vals[m]) if n % 2 else (vals[m - 1] + vals[m]) / 2

    return _make_agg(
        col, alias, list, lambda a, vs: a + vs, lambda a, b: a + b, fin
    )


def agg_mode(col, alias):
    """AggMode with deterministic tie-break: highest count, then smallest
    value."""
    from collections import Counter

    def fin(c):
        c = dict(c)
        if not c:
            return None
        best = max(c.values())
        return min(v for v, n in c.items() if n == best)

    def acc(a, vs):
        a = Counter(dict(a))
        a.update(vs)
        return a

    def merge(a, b):
        out = Counter(dict(a))
        for k, v in dict(b).items():
            out[k] += v
        return out

    return _make_agg(col, alias, Counter, acc, merge, fin)


def agg_count_distinct(col, alias):
    """AggCountVarDistinct."""
    return _make_agg(
        col, alias, set, lambda a, vs: set(a) | set(vs),
        lambda a, b: set(a) | set(b), lambda a: len(set(a)),
    )


def agg_sum_distinct(col, alias):
    """AggSumDistinct."""
    return _make_agg(
        col, alias, set, lambda a, vs: set(a) | set(vs),
        lambda a, b: set(a) | set(b),
        lambda a: sum(set(a)) if a else None,
    )


def agg_sample(col, alias):
    """AggSample — Jena may return any group member; the smallest value is
    the deterministic (and SQL-checkable) choice."""

    def acc(a, vs):
        m = min(vs) if vs else None
        if m is None:
            return a
        return m if a is None or m < a else a

    return _make_agg(
        col, alias, lambda: None, acc,
        lambda a, b: a if b is None else (b if a is None else min(a, b)),
        lambda a: a,
    )


register_aggregate("group_concat", agg_group_concat)
register_aggregate("median", agg_median)
register_aggregate("mode", agg_mode)
register_aggregate("count_distinct", agg_count_distinct)
register_aggregate("sum_distinct", agg_sum_distinct)
register_aggregate("sample", agg_sample)


# ---- SPARQL custom-function registry, keyed by function IRI ----
#
# FunctionRegistry.java:32 keeps FactoryFunction entries keyed by the
# function's IRI; the parser emits E_Function nodes that resolve against it
# at build time and raise per-row evaluation errors when absent. Here a
# URI function is ``fn(*term_columns) -> term_column`` over canonical
# N-Triples term strings (null = eval error → unbound / filter drop), and
# the SPARQL front-end's ("funcall", iri, args) expression node dispatches
# through URI_FUNCTIONS inside its vectorized batch evaluator. Unknown
# IRIs do NOT raise: every row evaluates to error (null), matching the
# observable FILTER semantics of the reference's ARQ/Function suite
# (func-01/func-02 expect empty results, not a build failure).

URI_FUNCTIONS: dict[str, Callable] = {}

_ARQ_FN = "http://jena.apache.org/ARQ/function#"
_XPATH_FN = "http://www.w3.org/2005/xpath-functions#"


def register_uri(iri: str):
    def deco(fn):
        URI_FUNCTIONS[iri] = fn
        return fn

    return deco


def _term_str_value(col) -> pa.Array:
    """STR(term) per E_Str: IRI → its text, literal → lexical form (with
    escapes resolved), blank/quoted-triple → error (null)."""
    from jena_ray.pipelines.bgp import _str_value

    return _str_value(pc.cast(col, pa.string()))


def _plain(col) -> pa.Array:
    """Wrap raw strings as simple-literal terms."""
    from jena_ray.term import string_esc

    return pa.array(
        [None if v is None else f'"{string_esc(v)}"' for v in col.to_pylist()],
        type=pa.string(),
    )


def _bool_terms(mask) -> pa.Array:
    t = '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
    f = '"false"^^<http://www.w3.org/2001/XMLSchema#boolean>'
    return pc.if_else(mask, pa.scalar(t, pa.string()), pa.scalar(f, pa.string()))


@register_uri(_ARQ_FN + "sha1sum")
def uri_sha1sum(col):
    """afn:sha1sum (ARQ function library): SHA1 hex digest of the node's
    string value — IRIs hash their IRI text, literals their lexical form,
    so sha1sum(<mailto:x>) = sha1sum("mailto:x") (Function/func-sha1sum)."""
    sv = _term_str_value(col)
    return _plain(pa.array(
        [None if v is None else hashlib.sha1(v.encode()).hexdigest()
         for v in sv.to_pylist()],
        type=pa.string(),
    ))


_LOCALNAME_RE = r"^<(?P<ns>.*[#/:])(?P<ln>[^#/:]*)>$"


@register_uri(_ARQ_FN + "localname")
def uri_localname(col):
    """afn:localname: local name of an IRI, split at the last '#'/'/'/':'
    (Util.splitNamespaceXML's split point for these suites); non-IRI rows
    are evaluation errors (null)."""
    s = pc.cast(col, pa.string())
    return _plain(pc.struct_field(pc.extract_regex(s, _LOCALNAME_RE), "ln"))


@register_uri(_ARQ_FN + "namespace")
def uri_namespace(col):
    """afn:namespace: namespace part of an IRI (see uri_localname)."""
    s = pc.cast(col, pa.string())
    return _plain(pc.struct_field(pc.extract_regex(s, _LOCALNAME_RE), "ns"))


@register_uri(_ARQ_FN + "langeq")
def uri_langeq(col, tag):
    """afn:langeq (LangEq.java): basic langMatches of LANG(?v) against the
    given range — "en" matches "en" and "en-GB" but not "xx-en"; literals
    without a tag have lang "" (no match, so !langeq keeps them);
    non-literals are evaluation errors. The range argument must be a
    constant (it is in every reference query)."""
    from jena_ray.pipelines.bgp import _lang_value

    s = pc.cast(col, pa.string())
    is_lit = pc.fill_null(pc.starts_with(s, '"'), False)
    lang = pc.utf8_lower(pc.fill_null(_lang_value(s), ""))
    want_vals = [v for v in pc.utf8_lower(_term_str_value(tag)).to_pylist()
                 if v is not None]
    rng = want_vals[0] if want_vals else ""
    match = pc.or_(pc.equal(lang, rng), pc.starts_with(lang, rng + "-"))
    return pc.if_else(is_lit, _bool_terms(match),
                      pa.scalar(None, pa.string()))


@register_uri(_ARQ_FN + "strlen")
def uri_strlen(col):
    """afn:strlen: length of the node's string value, as xsd:integer."""
    n = pc.cast(pc.utf8_length(_term_str_value(col)), pa.string())
    return pc.binary_join_element_wise(
        '"', n, '"^^<http://www.w3.org/2001/XMLSchema#integer>', "")


def _java_substring(col, begin, end=None):
    """afn:substring / afn:substr (StrSubstring.java): JAVA
    String.substring semantics — 0-based begin, exclusive end, and an
    index out of range is an evaluation error (null), not a clamp. The
    index arguments must be constants (they are in every reference
    query)."""
    sv = _term_str_value(col)
    ln = pc.utf8_length(sv)

    def _scalar(c):
        from jena_ray.pipelines.bgp import _num_value

        vals = [v for v in _num_value(pc.cast(c, pa.string())).to_pylist()
                if v is not None]
        return int(vals[0]) if vals else None

    b = _scalar(begin)
    e = None if end is None else _scalar(end)
    if b is None or b < 0 or (end is not None and e is None):
        return pa.nulls(len(col), type=pa.string())
    ok = pc.fill_null(pc.greater_equal(ln, e if e is not None else b), False)
    if e is not None and e < b:
        return pa.nulls(len(col), type=pa.string())
    sliced = pc.utf8_slice_codeunits(pc.fill_null(sv, ""), b, e)
    return pc.if_else(ok, _plain(sliced), pa.scalar(None, pa.string()))


@register_uri(_ARQ_FN + "substring")
def uri_substring(col, begin, end=None):
    return _java_substring(col, begin, end)


@register_uri(_ARQ_FN + "substr")
def uri_substr(col, begin, end=None):
    return _java_substring(col, begin, end)


@register_uri(_ARQ_FN + "strjoin")
def uri_strjoin(sep, *cols):
    """afn:strjoin(sep, a, b, ...): string values joined by the separator."""
    svs = [pc.fill_null(_term_str_value(c), "") for c in cols]
    sep_v = _term_str_value(sep).to_pylist()
    out = []
    lists = [s.to_pylist() for s in svs]
    for i, sp in enumerate(sep_v):
        if sp is None:
            out.append(None)
        else:
            out.append(sp.join(l[i] for l in lists))
    return _plain(pa.array(out, type=pa.string()))


@register_uri(_XPATH_FN + "concat")
def uri_fn_concat(*cols):
    """fn:concat (XPath function library): string values concatenated."""
    svs = [pc.fill_null(_term_str_value(c), "") for c in cols]
    return _plain(pc.binary_join_element_wise(*svs, ""))


@register_uri(_ARQ_FN + "evenInteger")
def uri_even_integer(col):
    """jfn:evenInteger — the reference's FunctionRegistry demo function
    (registered by its Function-suite harness for func-03/func-04): true
    for integer-datatype literals with an even value, eval error
    otherwise."""
    s = pc.cast(col, pa.string())
    lex = pc.struct_field(
        pc.extract_regex(
            s, r'^"(?P<v>-?\d+)"\^\^<http://www\.w3\.org/2001/XMLSchema#'
               r'(?:integer|int|long|short|byte)>$'
        ),
        "v",
    )
    num = pc.cast(lex, pa.int64(), safe=False)
    even = pc.equal(pc.bit_wise_and(num, 1), 0)
    return pc.if_else(pc.is_valid(num), _bool_terms(even),
                      pa.scalar(None, pa.string()))


@register_uri(_ARQ_FN + "min")
def uri_min2(a, b):
    """afn:min of two numeric terms."""
    from jena_ray.pipelines.bgp import _num_value

    av, bv = _num_value(pc.cast(a, pa.string())), _num_value(pc.cast(b, pa.string()))
    return _num_term_col(pc.min_element_wise(av, bv))


@register_uri(_ARQ_FN + "max")
def uri_max2(a, b):
    """afn:max of two numeric terms."""
    from jena_ray.pipelines.bgp import _num_value

    av, bv = _num_value(pc.cast(a, pa.string())), _num_value(pc.cast(b, pa.string()))
    return _num_term_col(pc.max_element_wise(av, bv))


@register_uri(_ARQ_FN + "sqrt")
def uri_sqrt(a):
    """afn:sqrt of a numeric term."""
    from jena_ray.pipelines.bgp import _num_value

    return _num_term_col(pc.sqrt(_num_value(pc.cast(a, pa.string()))))


def _num_term_col(v):
    from jena_ray.sparql import _num_to_term

    return _num_to_term(pc.cast(v, pa.float64()))
