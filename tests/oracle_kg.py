"""Independent pure-Python oracle for the KG pipeline (no Ray, no pandas
vectorization — deliberately a second implementation, plain row loops).

Computes the expected triple set for a testdata tier directly from
documents.parquet using only jena_ray.term (the shared kernel) and the
published extraction rules (jena_ray.vocab alias dictionary).
"""

from __future__ import annotations

import pyarrow.parquet as pq

from jena_ray import term as T
from jena_ray import vocab as V
from jena_ray.stages.annotate import JOB_SEED

EPOCH = 1_704_067_200  # 2024-01-01T00:00:00Z

_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Plain-python splitmix64 (matches the vectorized engine version)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def _ts_lex(doc_id: int) -> str:
    import datetime

    dt = datetime.datetime.fromtimestamp(EPOCH + doc_id, tz=datetime.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + "Z"


def expected_triples(sf_dir: str, include_bnodes: bool = True) -> set[tuple[str, str, str]]:
    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    out: set[tuple[str, str, str]] = set()
    for row in tbl.to_pylist():
        doc_id, text, lang, source, n_chars = (
            row["doc_id"],
            row["text"],
            row["lang"],
            row["source"],
            row["n_chars"],
        )
        url = V.doc_url(source, doc_id)
        d = f"<{url}>"
        out.add((d, f"<{V.RDF_TYPE}>", f"<{V.C_DOCUMENT}>"))
        out.add((d, f"<{V.P_LANG}>", f'"{lang}"'))
        out.add((d, f"<{V.P_SOURCE}>", f"<{V.SRC}{source}>"))
        out.add((d, f"<{V.P_CHARS}>", f'"{n_chars}"^^<{T.XSD}integer>'))
        out.add((d, f"<{V.P_CRAWLTS}>", f'"{_ts_lex(doc_id)}"^^<{T.XSD}dateTime>'))

        toks = text.split(" ")
        ents: list[tuple[int, str, str]] = []  # (pos, surface, entity)
        for pos, tok in enumerate(toks):
            ent = V.ALIAS_TO_ENTITY.get(tok)
            if ent is not None:
                ents.append((pos, tok, ent))
        h1, h2 = T.murmur3_128((JOB_SEED + "\x00" + url).encode("utf-8"))
        for pos, surface, ent in ents:
            e = f"<{V.ENT}{ent}>"
            out.add((d, f"<{V.P_MENTIONS}>", e))
            if include_bnodes:
                bn = "_:%016x%016x" % (h1 ^ _splitmix64(pos), h2)
                out.add((bn, f"<{V.RDF_TYPE}>", f"<{V.C_MENTION}>"))
                out.add((bn, f"<{V.P_OF_ENTITY}>", e))
                out.add((bn, f"<{V.P_IN_DOC}>", d))
                out.add((bn, f"<{V.P_SURFACE}>", f'"{surface}"'))
        for (p1, _, e1), (p2, _, e2) in zip(ents, ents[1:]):
            if p2 == p1 + 1:
                out.add((f"<{V.ENT}{e1}>", f"<{V.P_COOCCURS}>", f"<{V.ENT}{e2}>"))
    return out
