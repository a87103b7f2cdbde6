"""RDF-Thrift (RDF Binary using Apache Thrift) reader/writer.

The reference serializes StreamRDF rows as Thrift-compact-encoded
``RDF_StreamRow`` structs back to back (jena-arq riot/thrift/TRDF.java:51
chooses TCompactProtocol; struct/field ids from Grammar/BinaryRDF.thrift;
term mapping riot/thrift/ThriftConvert.java; row iteration
IteratorThriftRDF.java). This module is a from-scratch implementation of
the SUBSET of the public Thrift Compact Protocol those structs use —
structs, unions (one-field structs), strings, i32/i64 (zigzag varints)
and doubles — plus the term mapping to/from the engine's canonical
N-Triples strings. No Thrift library involved.

Closes the one documented SURVEY §2 skip (row 15): Parquet remains the
engine's internal binary row format; RDF-Thrift exists for interchange
parity with the reference's ``riot --out rdf-thrift`` surface.

Supported rows: prefixDecl (applied to resolve RDF_PrefixName terms),
triple, quad. Supported terms: IRI, bnode, full-form literal,
prefixName, and the VALUE forms (valInteger / valDouble / valDecimal —
read back to canonical typed literals exactly as ThriftConvert.convert
expands them). Variables / ANY / UNDEF / REPEAT raise (pattern rows are
not data).
"""

from __future__ import annotations

import struct as _struct

from jena_ray.term import TermError, fmt_literal

XSD = "http://www.w3.org/2001/XMLSchema#"

# thrift compact type nibbles (public spec: thrift-compact-protocol.md)
_CT_STOP = 0x0
_CT_TRUE = 0x1
_CT_FALSE = 0x2
_CT_BYTE = 0x3
_CT_I16 = 0x4
_CT_I32 = 0x5
_CT_I64 = 0x6
_CT_DOUBLE = 0x7
_CT_BINARY = 0x8
_CT_LIST = 0x9
_CT_STRUCT = 0xC


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def field_header(self, fid: int, last_fid: int, ctype: int) -> None:
        delta = fid - last_fid
        if 0 < delta <= 15:
            self.buf.append((delta << 4) | ctype)
        else:
            self.buf.append(ctype)
            self.buf += _varint(_zigzag(fid))

    def string(self, fid: int, last: int, s: str) -> None:
        self.field_header(fid, last, _CT_BINARY)
        raw = s.encode("utf-8")
        self.buf += _varint(len(raw)) + raw

    def i64(self, fid: int, last: int, v: int) -> None:
        self.field_header(fid, last, _CT_I64)
        self.buf += _varint(_zigzag(v))

    def i32(self, fid: int, last: int, v: int) -> None:
        self.field_header(fid, last, _CT_I32)
        self.buf += _varint(_zigzag(v))

    def double(self, fid: int, last: int, v: float) -> None:
        self.field_header(fid, last, _CT_DOUBLE)
        self.buf += _struct.pack("<d", v)  # compact doubles: little-endian

    def begin_struct(self, fid: int, last: int) -> None:
        self.field_header(fid, last, _CT_STRUCT)

    def stop(self) -> None:
        self.buf.append(_CT_STOP)


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def _byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def _varint(self) -> int:
        out = shift = 0
        while True:
            b = self._byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def read_struct(self) -> dict[int, object]:
        """struct → {field id: decoded value} (nested structs as dicts)."""
        fields: dict[int, object] = {}
        last_fid = 0
        while True:
            b = self._byte()
            if b == _CT_STOP:
                return fields
            ctype = b & 0x0F
            delta = (b & 0xF0) >> 4
            fid = last_fid + delta if delta else _unzigzag(self._varint())
            last_fid = fid
            if ctype == _CT_BINARY:
                n = self._varint()
                fields[fid] = self.data[self.pos:self.pos + n].decode("utf-8")
                self.pos += n
            elif ctype in (_CT_I16, _CT_I32, _CT_I64):
                fields[fid] = _unzigzag(self._varint())
            elif ctype == _CT_DOUBLE:
                (fields[fid],) = _struct.unpack_from("<d", self.data, self.pos)
                self.pos += 8
            elif ctype == _CT_STRUCT:
                fields[fid] = self.read_struct()
            elif ctype in (_CT_TRUE, _CT_FALSE):
                fields[fid] = ctype == _CT_TRUE
            elif ctype == _CT_BYTE:
                fields[fid] = _unzigzag(self._varint())
            else:
                raise TermError(f"RDF-Thrift: unsupported compact type {ctype}")


# ------------------------------------------------------- term <-> RDF_Term

def _write_term(w: _Writer, fid: int, last: int, term: str) -> None:
    """One RDF_Term union as field ``fid`` of the enclosing struct
    (BinaryRDF.thrift union field ids: 1 iri, 2 bnode, 3 literal)."""
    w.begin_struct(fid, last)
    if term.startswith("<"):
        w.begin_struct(1, 0)          # RDF_IRI
        w.string(1, 0, term[1:-1])
        w.stop()
    elif term.startswith("_:"):
        w.begin_struct(2, 0)          # RDF_BNode
        w.string(1, 0, term[2:])
        w.stop()
    elif term.startswith('"'):
        from jena_ray.term import split_literal

        lex, lang, dt = split_literal(term)
        w.begin_struct(3, 0)          # RDF_Literal
        w.string(1, 0, lex)
        if lang:
            w.string(2, 1, lang)
        elif dt:
            w.string(3, 1, dt)
        w.stop()
    else:
        raise TermError(f"RDF-Thrift: cannot serialize term {term!r}")
    w.stop()


def _decimal_lex(value: int, scale: int) -> str:
    """BigDecimal(unscaled, scale) lexical form (RDF_Decimal)."""
    s = str(abs(value))
    sign = "-" if value < 0 else ""
    if scale <= 0:
        return sign + s + "0" * (-scale)
    s = s.rjust(scale + 1, "0")
    return f"{sign}{s[:-scale]}.{s[-scale:]}"


def _read_term(d: dict, prefixes: dict[str, str]) -> str:
    """RDF_Term union dict → canonical term string (ThriftConvert.convert
    semantics, incl. the value forms)."""
    if 1 in d:  # iri
        return f"<{d[1][1]}>"
    if 2 in d:  # bnode
        return "_:" + d[2][1]
    if 3 in d:  # literal
        lit = d[3]
        lex = lit.get(1, "")
        lang = lit.get(2)
        dt = lit.get(3)
        if 4 in lit:  # dtPrefix — prefix-name datatype
            pn = lit[4]
            dt = prefixes[pn[1]] + pn[2]
        return fmt_literal(lex, lang=lang, datatype=dt)
    if 4 in d:  # prefixName subject/predicate/object
        pn = d[4]
        try:
            return f"<{prefixes[pn[1]]}{pn[2]}>"
        except KeyError:
            raise TermError(f"RDF-Thrift: undeclared prefix {pn[1]!r}")
    if 10 in d:  # valInteger
        return fmt_literal(str(d[10]), datatype=XSD + "integer")
    if 11 in d:  # valDouble
        return fmt_literal(repr(d[11]), datatype=XSD + "double")
    if 12 in d:  # valDecimal
        dec = d[12]
        return fmt_literal(_decimal_lex(dec[1], dec[2]),
                           datatype=XSD + "decimal")
    raise TermError(f"RDF-Thrift: unsupported RDF_Term fields {sorted(d)}")


# ----------------------------------------------------------- public surface

def write_thrift(rows, quads: bool = False) -> bytes:
    """Triples ``(s, p, o)`` (or quads ``(g, s, p, o)`` with
    ``quads=True``) of canonical term strings → RDF-Thrift bytes (one
    RDF_StreamRow compact struct per row, the TRDF stream layout)."""
    w = _Writer()
    for row in rows:
        w.begin_struct(3 if quads else 2, 0)  # StreamRow: 2 triple, 3 quad
        if quads:
            g, s, p, o = row
            _write_term(w, 1, 0, s)
            _write_term(w, 2, 1, p)
            _write_term(w, 3, 2, o)
            _write_term(w, 4, 3, g)
        else:
            s, p, o = row
            _write_term(w, 1, 0, s)
            _write_term(w, 2, 1, p)
            _write_term(w, 3, 2, o)
        w.stop()
        w.stop()
    return bytes(w.buf)


def read_thrift(data: bytes):
    """RDF-Thrift bytes → list of (g|None, s, p, o) canonical-term rows.
    prefixDecl rows update the prefix table used by RDF_PrefixName
    terms; triple rows carry graph None."""
    r = _Reader(data)
    prefixes: dict[str, str] = {}
    out = []
    while not r.eof():
        row = r.read_struct()
        if 1 in row:  # prefixDecl
            pd = row[1]
            prefixes[pd[1]] = pd[2]
        elif 2 in row:  # triple
            t = row[2]
            out.append((None, _read_term(t[1], prefixes),
                        _read_term(t[2], prefixes),
                        _read_term(t[3], prefixes)))
        elif 3 in row:  # quad
            q = row[3]
            g = _read_term(q[4], prefixes) if 4 in q else None
            out.append((g, _read_term(q[1], prefixes),
                        _read_term(q[2], prefixes),
                        _read_term(q[3], prefixes)))
        else:
            raise TermError(
                f"RDF-Thrift: unsupported stream row fields {sorted(row)}")
    return out


def read_thrift_files(paths, *, concurrency: int = 4):
    """Whole-file RDF-Thrift reader → (subj, pred, obj) Dataset (the
    binary format is not line-splittable — same whole-file contract as
    the Turtle-family readers)."""
    import pyarrow as pa
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: pa.Table) -> pa.Table:
        subs, preds, objs = [], [], []
        for blob in batch.column("bytes").to_pylist():
            for _g, s, p, o in read_thrift(blob):
                subs.append(s)
                preds.append(p)
                objs.append(o)
        return pa.table({
            "subj": pa.array(subs, type=pa.string()),
            "pred": pa.array(preds, type=pa.string()),
            "obj": pa.array(objs, type=pa.string()),
        })

    ds = rd.read_binary_files(paths)
    return ds.map_batches(parse, batch_format="pyarrow",
                          concurrency=concurrency)
