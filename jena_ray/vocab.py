"""Closed extraction vocabulary and KG namespaces.

The synthetic corpus (/root/testdata/*/documents.parquet) draws from a closed
31-word vocabulary. The alias dictionary below maps surface tokens to
canonical entity ids — the broadcast small-side lookup of the entity-linking
stage (pattern: InferenceSetupRDFS closure maps built once and read by every
record, jena-arq riot/process/inf/InferenceSetupRDFS.java:31-41).

Everything here is deterministic and mirrored in the DuckDB oracle SQL
(__ray_entry__.oracle_sql) as an inline VALUES alias table.
"""

from __future__ import annotations

KG = "http://kg.example.org/"
ENT = KG + "entity/"
REL = KG + "rel/"
SRC = KG + "source/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"

# canonical entity id ← surface aliases (entity linking candidate dictionary)
ENTITY_ALIASES: dict[str, tuple[str, ...]] = {
    "sorting": ("sort", "order"),
    "aggregation": ("agg", "group"),
    "join": ("join", "merge"),
    "scan": ("scan", "filter"),
    "hashing": ("hash", "key"),
    "batching": ("batch", "stream"),
    "spark": ("spark",),
    "storage": ("table", "column", "row"),
    "dedup": ("dup",),
    "query": ("query",),
    "vector": ("vector",),
    "window": ("window",),
    "data": ("data", "value"),
    "partition": ("part",),
    "customer": ("customer",),
    "line": ("line",),
}

# surface token → canonical entity id (the broadcast lookup table)
ALIAS_TO_ENTITY: dict[str, str] = {
    alias: eid for eid, aliases in ENTITY_ALIASES.items() for alias in aliases
}

# non-entity tokens in the corpus (stopwords / qualifiers)
STOPWORDS = frozenset({"the", "a", "fast", "slow", "small", "big"})

P_MENTIONS = REL + "mentions"
P_COOCCURS = REL + "coOccursWith"
P_SOURCE = REL + "source"
P_LANG = REL + "language"
P_CHARS = REL + "charCount"
P_CRAWLTS = REL + "crawlTs"
P_SURFACE = REL + "surface"
P_OF_ENTITY = REL + "ofEntity"
P_IN_DOC = REL + "inDocument"
C_DOCUMENT = KG + "class/Document"
C_MENTION = KG + "class/Mention"


def doc_url(source: str, doc_id: int) -> str:
    """Deterministic page URL — pure function of (source, doc_id) so the
    DuckDB oracle can reproduce it: 'http://' || source || '.example.org/doc/' || doc_id."""
    return f"http://{source}.example.org/doc/{doc_id}"


def entity_iri(eid: str) -> str:
    return ENT + eid


def alias_sql_values() -> str:
    """The alias dictionary as a SQL VALUES list: (word, eid) rows."""
    rows = ", ".join(
        f"('{alias}', '{eid}')" for eid, aliases in sorted(ENTITY_ALIASES.items()) for alias in aliases
    )
    return f"(VALUES {rows})"
