"""RDF term kernel: canonical N-Triples encoding, parsing, skolemization,
XSD canonicalization.

Pure Python/regex — no Ray dependency. Used inside `map_batches` UDFs.

Terms are represented as canonical N-Triples lexical strings (the same trick
the reference uses between distributed jobs — elephas text line formats and
tdbloader2's sorted text rows, apache-jena/bin/tdbloader2index:270):

- IRI:      ``<http://example.org/x>``
- bnode:    ``_:label`` (skolemized: 32 lower-hex chars, murmur3-128)
- literal:  ``"lex"``, ``"lex"@lang``, ``"lex"^^<datatype-iri>``

Reference semantics reproduced here (file:line cites into /root/reference):

- escaping: jena-base/src/main/java/org/apache/jena/atlas/lib/EscapeStr.java:32-110
  (single-line UTF-8 mode: escape ``\\ \" \n \t \r \f`` only)
- term formatting: jena-arq/.../riot/out/NodeFormatterNT.java:44-83 (RDF 1.1:
  xsd:string datatype is not written)
- N-Triples/N-Quads grammar: jena-arq/.../riot/lang/LangNTuple.java:87-156 and
  the W3C N-Triples grammar (tokens IRIREF, BLANK_NODE_LABEL,
  STRING_LITERAL_QUOTE, LANGTAG, UCHAR/ECHAR)
- skolemization: jena-arq/.../riot/lang/BlankNodeAllocatorHash.java:97-151
  (murmur3-128x64 with Apache-Commons seed 104729 over seed-bytes ++ label
  bytes, hex output low-byte-first per 64-bit half, lower case)
- XSD canonicalization: jena-arq/.../riot/process/normalize/NormalizeValue.java:54-175
  (integer/decimal/double/boolean/dateTime canonical lexical forms)
- lang-tag canonical case: riot/process/normalize/StreamCanonicalLangTag.java
  (RFC 5646 conventional case: 2-letter region upper, 4-letter script title)
"""

from __future__ import annotations

import re
import struct
from decimal import Decimal

# --------------------------------------------------------------------------
# murmur3 128 x64 (public algorithm, Austin Appleby; seed matches Apache
# Commons Codec default 104729 used by Jena's BlankNodeAllocatorHash)
# --------------------------------------------------------------------------

_M = 0xFFFFFFFFFFFFFFFF
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
JENA_MURMUR_SEED = 104729  # BlankNodeAllocatorHash.java:146 (DEFAULT_SEED)


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = JENA_MURMUR_SEED) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit. Returns (h1, h2) as unsigned 64-bit ints."""
    length = len(data)
    nblocks = length // 16
    h1 = seed
    h2 = seed

    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & _M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M

    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    tl = len(tail)
    if tl > 8:
        for i in range(tl - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
    if tl > 0:
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def _long_hex_lc_low_first(v: int) -> str:
    # BlankNodeAllocatorHash.longAsHexLC: low byte of the long printed first.
    return struct.pack("<Q", v).hex()


def skolem_label(seed: bytes, label: str | bytes) -> str:
    """Deterministic blank-node label: murmur3-128(seed ++ label) lower hex.

    Byte layout per BlankNodeAllocatorHash.alloc (.java:117-151): the two
    64-bit halves are each emitted low-byte-first, lower case — 32 hex chars.
    `seed` is any fixed byte string (job seed + document scope); Jena uses a
    16-byte UUID (fixed for BlankNodeAllocatorFixedSeedHash).
    """
    lb = label.encode("utf-8") if isinstance(label, str) else label
    h1, h2 = murmur3_128(seed + lb)
    return _long_hex_lc_low_first(h1) + _long_hex_lc_low_first(h2)


def bnode_seed(job_seed: str, scope: str) -> bytes:
    """Per-document skolem seed: depends only on (job seed, scope=url), never
    on shard/order, so labels are stable under repartitioning and resume
    (SURVEY.md §2.9; BlankNodeAllocatorFixedSeedHash semantics)."""
    h1, h2 = murmur3_128((job_seed + "\x00" + scope).encode("utf-8"))
    return struct.pack("<QQ", h1, h2)


# --------------------------------------------------------------------------
# N-Triples string escaping (EscapeStr.java:32-110, single-line UTF-8 space)
# --------------------------------------------------------------------------

_ESC_MAP = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\t": "\\t",
    "\r": "\\r",
    "\f": "\\f",
}
_ESC_RE = re.compile(r'[\\"\n\t\r\f]')


def string_esc(s: str) -> str:
    """Escape a literal lexical form for N-Triples output (UTF-8 char space:
    only backslash, quote, \\n \\t \\r \\f are escaped — EscapeStr.stringEsc
    single-line branch; control chars and non-ASCII pass through)."""
    return _ESC_RE.sub(lambda m: _ESC_MAP[m.group()], s)


_UNESC_RE = re.compile(r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))", re.S)
_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


class TermError(ValueError):
    """Raised on malformed terms / syntax errors (Checker.java / LangNTuple)."""


def _unesc_one(m: re.Match, allow_echar: bool) -> str:
    u4, u8, ch = m.group(1), m.group(2), m.group(3)
    if u4 is not None:
        cp = int(u4, 16)
    elif u8 is not None:
        cp = int(u8, 16)
        if cp > 0x10FFFF:
            raise TermError(f"\\U escape out of range: {m.group()}")
    else:
        if not allow_echar:
            raise TermError(f"illegal escape in IRI: \\{ch}")
        if ch not in _ECHAR:
            raise TermError(f"illegal escape: \\{ch}")
        return _ECHAR[ch]
    if 0xD800 <= cp <= 0xDFFF:
        raise TermError(f"surrogate code point in escape: {m.group()}")
    return chr(cp)


def unescape_string(s: str) -> str:
    """Resolve ECHAR + UCHAR escapes in a quoted-string body."""
    return _UNESC_RE.sub(lambda m: _unesc_one(m, allow_echar=True), s)


def unescape_iri(s: str) -> str:
    """Resolve UCHAR escapes only (ECHAR is illegal in IRIREF)."""
    return _UNESC_RE.sub(lambda m: _unesc_one(m, allow_echar=False), s)


# --------------------------------------------------------------------------
# N-Triples / N-Quads grammar (W3C; LangNTuple.java:87-156 checks)
# --------------------------------------------------------------------------

# IRIREF ::= '<' ([^#x00-#x20<>"{}|^`\] | UCHAR)* '>'
_IRI_BODY = r'(?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*'
IRIREF = rf"<({_IRI_BODY})>"

# PN_CHARS_BASE — W3C production, full unicode ranges
_PN_CHARS_BASE = (
    "A-Za-z"
    "À-ÖØ-öø-˿Ͱ-ͽͿ-῿"
    "‌-‍⁰-↏Ⰰ-⿯、-퟿豈-﷏"
    "ﷰ-�\U00010000-\U000EFFFF"
)
# BLANK_NODE_LABEL uses PN_CHARS_U = PN_CHARS_BASE | '_' ( ':' is Turtle-only)
_PN_CHARS_U = _PN_CHARS_BASE + "_"
_PN_CHARS = _PN_CHARS_U + "0-9·̀-ͯ‿-⁀\\-"
# BLANK_NODE_LABEL ::= '_:' (PN_CHARS_U|[0-9]) ((PN_CHARS|'.')* PN_CHARS)?
BNODE_LABEL = rf"_:([{_PN_CHARS_U}0-9](?:(?:[{_PN_CHARS}.])*[{_PN_CHARS}])?)"

# STRING_LITERAL_QUOTE ::= '"' ([^"\\\n\r] | ECHAR | UCHAR)* '"'
_STR_BODY = r'(?:[^"\\\n\r]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8}|\\[tbnrf"\'\\])*'
STRING_LIT = rf'"({_STR_BODY})"'

# LANGTAG ::= '@' [a-zA-Z]+ ('-' [a-zA-Z0-9]+)*
LANGTAG = r"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)"

_SUBJ = rf"(?:{IRIREF}|{BNODE_LABEL})"
_PRED = IRIREF
_OBJ = rf"(?:{IRIREF}|{BNODE_LABEL}|{STRING_LIT}(?:\^\^{IRIREF}|{LANGTAG})?)"

# groups: 1 s_iri, 2 s_bnode, 3 p_iri, 4 o_iri, 5 o_bnode, 6 o_lex, 7 o_dt, 8 o_lang
_TRIPLE_RE = re.compile(rf"^[ \t]*{_SUBJ}[ \t]*{_PRED}[ \t]*{_OBJ}[ \t]*\.[ \t]*(?:#.*)?$")
# quad: optional 4th term (IRI or bnode) before '.'  (LangNQuads)
_GRAPH = rf"(?:{IRIREF}|{BNODE_LABEL})"
_QUAD_RE = re.compile(
    rf"^[ \t]*{_SUBJ}[ \t]*{_PRED}[ \t]*{_OBJ}[ \t]*(?:{_GRAPH}[ \t]*)?\.[ \t]*(?:#.*)?$"
)

_BLANK_RE = re.compile(r"^[ \t]*(?:#.*)?$")
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_STRING = XSD + "string"
RDF_LANGSTRING = RDF_NS + "langString"


def check_iri(iri: str, strict: bool = True) -> str:
    """Validate + finalize an IRI string (post-unescape).

    Mirrors Checker.checkIRI / IRIResolver strict mode for the properties the
    N-Triples conformance suite exercises: absolute IRI (has a scheme), no
    whitespace/control chars, no relative forms. (riot/system/Checker.java:28,
    ParserProfileStd.java:157-164.)
    """
    if strict:
        if not _SCHEME_RE.match(iri):
            raise TermError(f"relative IRI (no scheme): <{iri}>")
        for ch in iri:
            o = ord(ch)
            if o <= 0x20 or ch in '<>"{}|^`\\':
                raise TermError(f"illegal character U+{o:04X} in IRI: <{iri}>")
    return iri


# --------------------------------------------------------------------------
# jena-iri violation taxonomy (practical subset)
#
# The reference classifies IRI problems into ~60 named codes
# (jena-iri iri/ViolationCodes.java) and riot surfaces them per IRI as
# "Bad IRI" (error-class) / "Not advised IRI" (warning-class) messages,
# skipping LOWERCASE_PREFERRED / PERCENT_ENCODING_SHOULD_BE_UPPERCASE at
# parse time (jena-arq riot/checker/CheckerIRI.java:120-190). This subset
# covers the codes decidable without the IANA scheme registry / IDN
# machinery; is_error follows jena-iri's classification.
# --------------------------------------------------------------------------

_IRI_SPLIT_RE = re.compile(
    r"^(?:(?P<scheme>[^:/?#]*):)?(?://(?P<auth>[^/?#]*))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)
_UNWISE = set('{}|\\^`"<>')
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def iri_violations(
    iri: str, *, allow_relative: bool = False
) -> list[tuple[str, bool]]:
    """Classified violations of one IRI string (no angle brackets):
    ``[(code, is_error), ...]`` using jena-iri's code names and
    error/warning split. Empty list = clean."""
    import unicodedata

    out: list[tuple[str, bool]] = []
    m = _IRI_SPLIT_RE.match(iri)
    scheme = m.group("scheme")
    auth = m.group("auth")
    path = m.group("path") or ""

    if scheme is None or (scheme == "" and iri.startswith(":")):
        if iri.startswith(":"):
            out.append(("EMPTY_SCHEME", True))
        elif not allow_relative:
            out.append(("REQUIRED_COMPONENT_MISSING", True))
    elif scheme == "":
        out.append(("EMPTY_SCHEME", True))
    else:
        if not scheme[0].isalpha():
            out.append(("SCHEME_MUST_START_WITH_LETTER", True))
        if scheme != scheme.lower():
            out.append(("LOWERCASE_PREFERRED", False))

    seen: set[str] = set()
    for ch in iri:
        o = ord(ch)
        if ch in _UNWISE:
            code = ("UNWISE_CHARACTER", True)
        elif o < 0x20 or o == 0x7F:
            code = ("CONTROL_CHARACTER", True)
        elif ch in " \t":
            code = ("WHITESPACE", True)
        elif 0xE000 <= o <= 0xF8FF or 0xF0000 <= o <= 0x10FFFD:
            code = ("PRIVATE_USE_CHARACTER", False)
        else:
            continue
        if code[0] not in seen:
            seen.add(code[0])
            out.append(code)

    for pm in re.finditer(r"%(..)?", iri):
        h = pm.group(1)
        if h is None or not re.fullmatch(r"[0-9A-Fa-f]{2}", h):
            if "ILLEGAL_PERCENT_ENCODING" not in seen:
                seen.add("ILLEGAL_PERCENT_ENCODING")
                out.append(("ILLEGAL_PERCENT_ENCODING", True))
        elif h != h.upper():
            if "PERCENT_ENCODING_SHOULD_BE_UPPERCASE" not in seen:
                seen.add("PERCENT_ENCODING_SHOULD_BE_UPPERCASE")
                out.append(("PERCENT_ENCODING_SHOULD_BE_UPPERCASE", False))

    if auth:
        userinfo, _, hostport = auth.rpartition("@")
        if ":" in userinfo:
            out.append(("HAS_PASSWORD", False))
        host, colon, port = hostport.rpartition(":")
        if "]" in port:  # bracketed IPv6 literal, no port present
            host, colon, port = hostport, "", ""
        if colon and not port.lstrip("0123456789"):
            if port == "":
                out.append(("PORT_SHOULD_NOT_BE_EMPTY", False))
            elif scheme and _DEFAULT_PORTS.get(scheme.lower()) == port:
                out.append(("DEFAULT_PORT_SHOULD_BE_OMITTED", False))
            elif port.startswith("0"):
                out.append(("PORT_SHOULD_NOT_START_IN_ZERO", False))
        else:
            host = hostport
        if host != host.lower() and ("LOWERCASE_PREFERRED", False) not in out:
            out.append(("LOWERCASE_PREFERRED", False))

    if path and ("/./" in path or "/../" in path or path in (".", "..")
                 or path.endswith(("/.", "/.."))
                 or path.startswith(("./", "../"))):
        out.append(("NON_INITIAL_DOT_SEGMENT", False))

    if not unicodedata.is_normalized("NFC", iri):
        out.append(("NOT_NFC", False))
    elif not unicodedata.is_normalized("NFKC", iri):
        out.append(("NOT_NFKC", False))

    return out


def fmt_iri(iri: str) -> str:
    return f"<{iri}>"


def fmt_bnode(label: str) -> str:
    return f"_:{label}"


def fmt_literal(lex: str, lang: str | None = None, datatype: str | None = None) -> str:
    """Canonical N-Triples literal (NodeFormatterNT.java:44-83; RDF 1.1 —
    xsd:string datatype is implicit and not written)."""
    body = f'"{string_esc(lex)}"'
    if lang:
        return f"{body}@{lang}"
    if datatype and datatype != XSD_STRING:
        return f"{body}^^<{datatype}>"
    return body


# --------------------------------------------------------------------------
# IRI reference resolution (RFC 3986 §5.2 — IRIResolver semantics)
# --------------------------------------------------------------------------


def resolve_iri(base: str | None, ref: str) -> str:
    """RFC 3986 §5.2 reference resolution (IRIResolver semantics)."""
    if _SCHEME_RE.match(ref):
        scheme, rest = ref.split(":", 1)
        if not rest.startswith("/"):
            return ref
        # RFC 3986 §5.2.2: remove_dot_segments applies to the PATH only —
        # split off the authority first, or a leading '..' segment would
        # pop the authority ('http://a/../c' must stay authority 'a').
        am = re.match(r"^(//[^/?#]*)?([^?#]*)([\s\S]*)$", rest)
        auth, path, tail = am.groups()
        return scheme + ":" + (auth or "") + _remove_dot_segments(path) + tail
    if base is None:
        raise TermError(f"relative IRI with no base: <{ref}>")
    m = re.match(r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$", base)
    b_scheme, b_auth, b_path, b_query, _ = m.groups()
    r = re.match(r"^(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$", ref)
    r_auth, r_path, r_query, r_frag = r.groups()
    if r_auth is not None:
        t_auth, t_path, t_query = r_auth, _remove_dot_segments(r_path), r_query
    elif r_path == "":
        t_auth, t_path = b_auth, b_path
        t_query = r_query if r_query is not None else b_query
    else:
        t_auth = b_auth
        if r_path.startswith("/"):
            t_path = _remove_dot_segments(r_path)
        else:
            if b_auth is not None and b_path == "":
                merged = "/" + r_path
            else:
                merged = b_path[: b_path.rfind("/") + 1] + r_path if "/" in b_path else r_path
            t_path = _remove_dot_segments(merged)
        t_query = r_query
    out = ""
    if b_scheme is not None:
        out += b_scheme + ":"
    if t_auth is not None:
        out += "//" + t_auth
    out += t_path
    if t_query is not None:
        out += "?" + t_query
    if r_frag is not None:
        out += "#" + r_frag
    return out


def _remove_dot_segments(path: str) -> str:
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            seg, inp = (inp, "") if i < 0 else (inp[:i], inp[i:])
            out.append(seg)
    return "".join(out)



# --------------------------------------------------------------------------
# lang tag canonical case (StreamCanonicalLangTag / LangTag formatting)
# --------------------------------------------------------------------------


def canonical_langtag(tag: str) -> str:
    """RFC 5646 conventional case: primary subtag lower, 2-letter region
    UPPER, 4-letter script Titlecase, others lower — e.g. en-gb → en-GB."""
    parts = tag.split("-")
    out = [parts[0].lower()]
    for p in parts[1:]:
        if len(p) == 2 and p.isalpha():
            out.append(p.upper())
        elif len(p) == 4 and p.isalpha():
            out.append(p[0].upper() + p[1:].lower())
        else:
            out.append(p.lower())
    return "-".join(out)


# --------------------------------------------------------------------------
# XSD literal canonicalization (NormalizeValue.java:54-175)
# --------------------------------------------------------------------------

_INTEGER_TYPES = {
    XSD + t
    for t in (
        "integer int long short byte nonPositiveInteger negativeInteger "
        "nonNegativeInteger positiveInteger unsignedLong unsignedInt "
        "unsignedShort unsignedByte"
    ).split()
}
_DATETIME_TYPES = {
    XSD + t for t in "dateTime dateTimeStamp time date gYear gYearMonth gMonth gMonthDay gDay".split()
}

_DT_SECOND_RE = re.compile(r"(\d{2}:\d{2}:)(\d{2}\.\d+)")


def _canon_integer(lex: str) -> str:
    try:
        return str(int(lex))
    except ValueError:
        return lex  # illegal lexical form: pass through (NormalizeValue returns node)


def _canon_decimal(lex: str) -> str:
    # BigDecimal.stripTrailingZeros().toPlainString() + ensure '.' present
    # (NormalizeValue.java:139-155: Turtle short form needs ".0")
    try:
        d = Decimal(lex)
    except Exception:
        return lex
    d = d.normalize()
    s = format(d, "f")
    if "." not in s:
        s += ".0"
    return s


def _canon_double(lex: str) -> str:
    # XSD canonical double: single nonzero digit left of '.', >=1 digit right,
    # exponent 'E' with no '+'/leading zeros; zero is 0.0E0
    # (NormalizeValue.java:160-175, DecimalFormat "0.0#################E0").
    try:
        d = float(lex)
    except ValueError:
        return lex
    if d != d:  # NaN
        return "NaN"
    if d == float("inf"):
        return "INF"
    if d == float("-inf"):
        return "-INF"
    if d == 0.0:
        return "-0.0E0" if str(d)[0] == "-" else "0.0E0"
    # shortest round-trip digits via repr → Decimal gives (sign, digits, exp)
    sign, digits, exp = Decimal(repr(d)).as_tuple()
    ds = "".join(map(str, digits)).rstrip("0") or "0"
    e10 = exp + (len(digits) - len(ds))  # value = int(ds) * 10^e10
    e_out = e10 + len(ds) - 1  # normalized: one digit left of the point
    frac = ds[1:] or "0"
    return f"{'-' if sign else ''}{ds[0]}.{frac}E{e_out}"


def _canon_boolean(lex: str) -> str:
    # dtBoolean (NormalizeValue.java:54-58): only "1"/"0" are rewritten.
    if lex == "1":
        return "true"
    if lex == "0":
        return "false"
    return lex


def _canon_datetime(lex: str) -> str:
    # dtAnyDateTime (NormalizeValue.java:59-105): canonicalize fractional
    # seconds only — strip trailing zeros; drop '.' if all-zero fraction.
    if "." not in lex:
        return lex

    def fix(m: re.Match) -> str:
        head, sec = m.group(1), m.group(2)
        sec = sec.rstrip("0")
        if sec.endswith("."):
            sec = sec[:-1]
        return head + sec

    return _DT_SECOND_RE.sub(fix, lex, count=1)


def canonical_lexical(lex: str, datatype: str) -> str:
    """Canonical lexical form for a typed literal (CanonicalizeLiteral.java:34-46
    dispatch over NormalizeValue handlers). Unknown datatypes pass through
    unchanged (BaseDatatype semantics — lexical form is authoritative)."""
    if datatype in _INTEGER_TYPES:
        return _canon_integer(lex)
    if datatype == XSD + "decimal":
        return _canon_decimal(lex)
    if datatype in (XSD + "double", XSD + "float"):
        return _canon_double(lex)
    if datatype == XSD + "boolean":
        return _canon_boolean(lex)
    if datatype in _DATETIME_TYPES:
        return _canon_datetime(lex)
    return lex


# --------------------------------------------------------------------------
# N-Triples / N-Quads line parser (LangNTriples/LangNQuads semantics)
# --------------------------------------------------------------------------


def _finish_iri(raw: str, base: str | None) -> str:
    iri = unescape_iri(raw)
    if base is not None and not _SCHEME_RE.match(iri):
        # riot resolves relative IRIs against the (file) base before strict
        # checking (ParserProfileStd.java:157-164); plain N-Triples default
        # has no base and rejects relative IRIs
        iri = resolve_iri(base, iri)
    return fmt_iri(check_iri(iri))


def _finish_terms(
    m: re.Match, bnode_prefix: str, base: str | None = None
) -> tuple[str, str, str]:
    s_iri, s_bn, p_iri, o_iri, o_bn, o_lex, o_dt, o_lang = m.groups()[:8]
    if s_iri is not None:
        subj = _finish_iri(s_iri, base)
    else:
        subj = fmt_bnode(bnode_prefix + s_bn)
    pred = _finish_iri(p_iri, base)
    if o_iri is not None:
        obj = _finish_iri(o_iri, base)
    elif o_bn is not None:
        obj = fmt_bnode(bnode_prefix + o_bn)
    else:
        lex = unescape_string(o_lex)
        if o_dt is not None:
            obj = fmt_literal(lex, datatype=iri_value(_finish_iri(o_dt, base)))
        elif o_lang is not None:
            obj = fmt_literal(lex, lang=o_lang)
        else:
            obj = fmt_literal(lex)
    return subj, pred, obj


def parse_ntriples(
    text: str,
    *,
    skolem_seed: bytes | None = None,
    strict: bool = True,
    base: str | None = None,
) -> list[tuple[str, str, str]]:
    """Parse an N-Triples document into canonical (subj, pred, obj) strings.

    Grammar/checks per LangNTriples.java:51-70 + LangNTuple.java:127-156
    (subject: IRI or bnode; predicate: IRI; object: any term) with `riot`
    default strict checking (CmdLangParse.java:256-261).

    If `skolem_seed` is given, blank-node labels are skolemized with
    murmur3-128(seed ++ label) (BlankNodeAllocatorHash); otherwise labels are
    kept as given (LabelToNode 'labels as given' mode).
    """
    out: list[tuple[str, str, str]] = []
    labels: dict[str, str] = {}
    for lineno, line in enumerate(text.split("\n"), 1):
        if _BLANK_RE.match(line):
            continue
        m = _TRIPLE_RE.match(line)
        if not m:
            if "<<" in line:  # RDF-star quoted triple (never regex-matched)
                try:
                    out.append(_parse_star_statement(line, base=base))
                except TermError as e:
                    if strict:
                        raise TermError(f"line {lineno}: {e}") from None
                continue
            if strict:
                raise TermError(f"line {lineno}: not a valid N-Triples line: {line[:100]!r}")
            continue
        try:
            subj, pred, obj = _finish_terms(m, "", base)
        except TermError as e:
            if strict:
                raise TermError(f"line {lineno}: {e}") from None
            continue
        out.append((subj, pred, obj))
    if skolem_seed is not None:
        out = [
            (
                skolemize_term(s, skolem_seed, labels),
                p,
                skolemize_term(o, skolem_seed, labels),
            )
            for s, p, o in out
        ]
    return out


def parse_nquads(
    text: str,
    *,
    skolem_seed: bytes | None = None,
    strict: bool = True,
    base: str | None = None,
    default_graph: str = "urn:x-arq:DefaultGraph",
) -> list[tuple[str, str, str, str]]:
    """Parse N-Quads → canonical (graph, subj, pred, obj). Triples in the
    default graph get `urn:x-arq:DefaultGraph` (Quad.java:37)."""
    out: list[tuple[str, str, str, str]] = []
    labels: dict[str, str] = {}
    for lineno, line in enumerate(text.split("\n"), 1):
        if _BLANK_RE.match(line):
            continue
        m = _QUAD_RE.match(line)
        if not m:
            if "<<" in line:  # RDF-star quoted triple (never regex-matched)
                try:
                    g, s, p, o = _parse_star_statement(
                        line, base=base, quads=True
                    )
                    out.append(
                        (g if g is not None else fmt_iri(default_graph), s, p, o)
                    )
                except TermError as e:
                    if strict:
                        raise TermError(f"line {lineno}: {e}") from None
                continue
            if strict:
                raise TermError(f"line {lineno}: not a valid N-Quads line: {line[:100]!r}")
            continue
        try:
            subj, pred, obj = _finish_terms(m, "", base)
            g_iri, g_bn = m.groups()[8:10]
            if g_iri is not None:
                graph = _finish_iri(g_iri, base)
            elif g_bn is not None:
                graph = fmt_bnode(g_bn)
            else:
                graph = fmt_iri(default_graph)
        except TermError as e:
            if strict:
                raise TermError(f"line {lineno}: {e}") from None
            continue
        out.append((graph, subj, pred, obj))
    if skolem_seed is not None:
        out = [
            (
                skolemize_term(g, skolem_seed, labels),
                skolemize_term(s, skolem_seed, labels),
                p,
                skolemize_term(o, skolem_seed, labels),
            )
            for g, s, p, o in out
        ]
    return out


# --------------------------------------------------------------------------
# RDF-star quoted triples (Node_Triple — jena-core graph/Node_Triple.java:27;
# RIOT's LT2/GT2 '<<'/'>>' tokens). A quoted triple is a TERM: canonical
# string form "<< <s> <p> <o> >>" (single-space separators, nesting allowed
# in subject/object). It flows through the engine as an opaque term string —
# term_id hashes it, the NodeTable stores it, writers print it verbatim.
# --------------------------------------------------------------------------

_QT_OPEN_RE = re.compile(r"<<[ \t]*")
_IRI_TOK_RE = re.compile(IRIREF)
_BN_TOK_RE = re.compile(BNODE_LABEL)
_LIT_TOK_RE = re.compile(rf"{STRING_LIT}(?:\^\^{IRIREF}|{LANGTAG})?")
_WS_TOK_RE = re.compile(r"[ \t]*")


def fmt_quoted_triple(s: str, p: str, o: str) -> str:
    return f"<< {s} {p} {o} >>"


class _NTStarCursor:
    """Recursive-descent scan of one N-Triples/N-Quads statement containing
    ``<<`` (the vectorized fast path and the plain regex never match those
    lines). Grammar per the RDF-star spec as the reference's RIOT implements
    it (rdf_star/TestNTriplesStarParse.java): subject = IRI | bnode | quoted
    triple; predicate = IRI; object adds literals; a quoted triple may NOT
    be a whole statement, a predicate, or contain a literal subject."""

    def __init__(self, line: str, base: str | None = None):
        self.s = line
        self.i = 0
        self.base = base

    def ws(self) -> None:
        self.i = _WS_TOK_RE.match(self.s, self.i).end()

    def err(self, what: str) -> TermError:
        return TermError(
            f"{what} at offset {self.i}: ...{self.s[self.i:self.i + 40]!r}"
        )

    def term(self, pos: str) -> str:
        """pos: 'subj' | 'pred' | 'obj'."""
        self.ws()
        if self.s.startswith("<<", self.i):
            if pos == "pred":
                raise self.err("quoted triple cannot be a predicate")
            return self.quoted_triple()[0]
        m = _IRI_TOK_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return _finish_iri(m.group(1), self.base)
        if pos != "pred":
            m = _BN_TOK_RE.match(self.s, self.i)
            if m:
                self.i = m.end()
                return fmt_bnode(m.group(1))
        if pos == "obj":
            m = _LIT_TOK_RE.match(self.s, self.i)
            if m:
                self.i = m.end()
                lex = unescape_string(m.group(1))
                dt, lang = m.group(2), m.group(3)
                if dt is not None:
                    return fmt_literal(
                        lex, datatype=iri_value(_finish_iri(dt, self.base))
                    )
                if lang is not None:
                    return fmt_literal(lex, lang=lang)
                return fmt_literal(lex)
        raise self.err(f"expected {pos} term")

    def quoted_triple(self) -> tuple[str, str, str, str]:
        """At '<<': parse the quoted triple; returns (canonical term,
        subj, pred, obj)."""
        self.i = _QT_OPEN_RE.match(self.s, self.i).end()
        s = self.term("subj")
        p = self.term("pred")
        o = self.term("obj")
        self.ws()
        if not self.s.startswith(">>", self.i):
            raise self.err("expected '>>'")
        self.i += 2
        return fmt_quoted_triple(s, p, o), s, p, o


def _parse_star_statement(
    line: str, *, base: str | None = None, quads: bool = False
) -> tuple[str, ...]:
    """One N-Triples (or N-Quads) statement containing a quoted triple →
    (s, p, o) or (graph|None, s, p, o). Raises TermError on bad syntax,
    including a bare quoted triple used as a whole statement."""
    c = _NTStarCursor(line, base)
    s = c.term("subj")
    c.ws()
    if c.s.startswith(".", c.i):
        raise c.err("a quoted triple is a term, not a statement")
    p = c.term("pred")
    o = c.term("obj")
    g: str | None = None
    if quads:
        c.ws()
        if not c.s.startswith(".", c.i):
            m = _IRI_TOK_RE.match(c.s, c.i)
            if m:
                c.i = m.end()
                g = _finish_iri(m.group(1), base)
            else:
                m = _BN_TOK_RE.match(c.s, c.i)
                if not m:
                    raise c.err("expected graph label")
                c.i = m.end()
                g = fmt_bnode(m.group(1))
    c.ws()
    if not c.s.startswith(".", c.i):
        raise c.err("expected '.'")
    c.i += 1
    rest = c.s[c.i:].strip()
    if rest and not rest.startswith("#"):
        raise c.err("trailing content after '.'")
    return (g, s, p, o) if quads else (s, p, o)


def quoted_triple_parts(term: str) -> tuple[str, str, str]:
    """Canonical quoted-triple term → (s, p, o) canonical component terms
    (the Node_Triple.triple(n) accessor)."""
    c = _NTStarCursor(term)
    if not term.startswith("<<"):
        raise TermError(f"not a quoted-triple term: {term!r}")
    _, s, p, o = c.quoted_triple()
    c.ws()
    if c.i != len(c.s):
        raise TermError(f"not a quoted-triple term: {term!r}")
    return s, p, o


def skolemize_term(t: str, seed: bytes, labels: dict[str, str]) -> str:
    """Skolemize the blank nodes of one term, recursing into quoted
    triples; ``labels`` is the per-document label → skolem cache."""
    if t.startswith("_:"):
        lbl = t[2:]
        if lbl not in labels:
            labels[lbl] = skolem_label(seed, lbl)
        return "_:" + labels[lbl]
    if t.startswith("<<"):
        s, p, o = quoted_triple_parts(t)
        return fmt_quoted_triple(
            skolemize_term(s, seed, labels), p, skolemize_term(o, seed, labels)
        )
    return t


# --------------------------------------------------------------------------
# term inspection helpers (for stats jobs and writers)
# --------------------------------------------------------------------------

_LIT_RE = re.compile(rf'^"({_STR_BODY})"(?:\^\^<({_IRI_BODY})>|{LANGTAG})?$')


def term_kind(term: str) -> str:
    """'iri' | 'bnode' | 'literal' | 'triple' for a canonical term string
    ('triple' = RDF-star quoted triple, Node.isNodeTriple())."""
    if term.startswith("<<"):
        return "triple"
    c = term[0] if term else ""
    if c == "<":
        return "iri"
    if c == "_":
        return "bnode"
    return "literal"


def iri_value(term: str) -> str:
    return term[1:-1]


def split_literal(term: str) -> tuple[str, str | None, str | None]:
    """Canonical literal term → (lexical form, lang, datatype IRI)."""
    m = _LIT_RE.match(term)
    if not m:
        raise TermError(f"not a literal term: {term!r}")
    lex = unescape_string(m.group(1))
    dt = m.group(2)
    lang = m.group(3)
    return lex, lang, dt


def namespace_of(term: str) -> str | None:
    """Namespace of an IRI term (split at last '#' or '/'), for the elephas
    namespace-count job (TripleNamespaceCountMapper semantics)."""
    if not term.startswith("<") or term.startswith("<<"):
        return None
    iri = term[1:-1]
    for sep in ("#", "/"):
        idx = iri.rfind(sep)
        if idx > len("http://") - 1:
            return iri[: idx + 1]
    return iri


def canonicalize_term(term: str) -> str:
    """Canonicalize one term string: XSD canonical lexical forms for typed
    literals + canonical lang-tag case. IRIs/bnodes pass through. This is the
    opt-in canonicalization stage (CanonicalizeLiteral wrapper), applied in
    the KG pipeline's canonicalize stage."""
    if not term.startswith('"'):
        return term
    lex, lang, dt = split_literal(term)
    if lang:
        return fmt_literal(lex, lang=canonical_langtag(lang))
    if dt:
        return fmt_literal(canonical_lexical(lex, dt), datatype=dt)
    return fmt_literal(lex)
