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


# --------------------------------------------------------------------------
# RDFS fixture vocabulary (T-Box) for the rdfs_materialize driver query —
# exercises every InferenceProcessorRDFS rule over the KG A-Box: a 2-level
# subClassOf chain (tests domain/range→subClass chaining), subPropertyOf,
# domain, range. Mirrored verbatim in the DuckDB oracle SQL.
# --------------------------------------------------------------------------

C_WEBRESOURCE = KG + "class/WebResource"
C_RESOURCE = KG + "class/Resource"
C_ENTITY_CLS = KG + "class/Entity"
C_SOURCE_CLS = KG + "class/Source"
P_REFERENCES = REL + "references"


def _t(iri: str) -> str:
    return f"<{iri}>"


RDFS_FIXTURE_VOCAB: tuple[tuple[str, str, str], ...] = (
    (_t(C_DOCUMENT), _t("http://www.w3.org/2000/01/rdf-schema#subClassOf"), _t(C_WEBRESOURCE)),
    (_t(C_WEBRESOURCE), _t("http://www.w3.org/2000/01/rdf-schema#subClassOf"), _t(C_RESOURCE)),
    (_t(C_ENTITY_CLS), _t("http://www.w3.org/2000/01/rdf-schema#subClassOf"), _t(C_RESOURCE)),
    (_t(P_MENTIONS), _t("http://www.w3.org/2000/01/rdf-schema#subPropertyOf"), _t(P_REFERENCES)),
    (_t(P_MENTIONS), _t("http://www.w3.org/2000/01/rdf-schema#domain"), _t(C_DOCUMENT)),
    (_t(P_MENTIONS), _t("http://www.w3.org/2000/01/rdf-schema#range"), _t(C_ENTITY_CLS)),
    (_t(P_SOURCE), _t("http://www.w3.org/2000/01/rdf-schema#range"), _t(C_SOURCE_CLS)),
)


# SHACL fixture shapes for the driver contract: a NodeShape over Document
# with three violable property shapes whose verdicts are SQL-reproducible
# (n_chars < 100 → MinInclusive; lang outside the allowed set → In;
# 120 < n_chars < 200 → Or over two disjunct range sub-shapes).
# Shape nodes get explicit IRIs so the report's source_shape column is
# deterministic across engines.
SH = "http://www.w3.org/ns/shacl#"
SHAPE_DOC = KG + "shape/Document"
SHAPE_CHARS = KG + "shape/chars"
SHAPE_LANG = KG + "shape/lang"
SHAPE_CHARS_OR = KG + "shape/charsOr"
SHACL_ALLOWED_LANGS: tuple[str, ...] = ("en", "de", "fr", "es")
SHACL_MIN_CHARS = 100
SHACL_OR_LO = 120  # conforms when n_chars <= LO (small-doc branch) ...
SHACL_OR_HI = 200  # ... or n_chars >= HI (large-doc branch)


def _shacl_lang_list() -> tuple[tuple[str, str, str], ...]:
    rows = []
    labels = [f"_:langs{i}" for i in range(len(SHACL_ALLOWED_LANGS))]
    nil = _t(RDF_NS + "nil")
    for i, lang in enumerate(SHACL_ALLOWED_LANGS):
        rows.append((labels[i], _t(RDF_NS + "first"), f'"{lang}"'))
        rows.append(
            (labels[i], _t(RDF_NS + "rest"), labels[i + 1] if i + 1 < len(labels) else nil)
        )
    return tuple(rows)


SHACL_FIXTURE_SHAPES: tuple[tuple[str, str, str], ...] = (
    (_t(SHAPE_DOC), _t(RDF_TYPE), _t(SH + "NodeShape")),
    (_t(SHAPE_DOC), _t(SH + "targetClass"), _t(C_DOCUMENT)),
    (_t(SHAPE_DOC), _t(SH + "property"), _t(SHAPE_CHARS)),
    (_t(SHAPE_DOC), _t(SH + "property"), _t(SHAPE_LANG)),
    (_t(SHAPE_DOC), _t(SH + "property"), _t(SHAPE_CHARS_OR)),
    (_t(SHAPE_CHARS), _t(SH + "path"), _t(P_CHARS)),
    (
        _t(SHAPE_CHARS),
        _t(SH + "minInclusive"),
        f'"{SHACL_MIN_CHARS}"^^<{XSD}integer>',
    ),
    (_t(SHAPE_LANG), _t(SH + "path"), _t(P_LANG)),
    (_t(SHAPE_LANG), _t(SH + "in"), "_:langs0"),
    # sh:or disjunction: charCount must sit in the small-doc OR large-doc
    # band (violated when SHACL_OR_LO < n_chars < SHACL_OR_HI)
    (_t(SHAPE_CHARS_OR), _t(SH + "path"), _t(P_CHARS)),
    (_t(SHAPE_CHARS_OR), _t(SH + "or"), "_:or0"),
    ("_:or0", _t(RDF_NS + "first"), "_:orSmall"),
    ("_:or0", _t(RDF_NS + "rest"), "_:or1"),
    ("_:or1", _t(RDF_NS + "first"), "_:orLarge"),
    ("_:or1", _t(RDF_NS + "rest"), _t(RDF_NS + "nil")),
    ("_:orSmall", _t(SH + "maxInclusive"), f'"{SHACL_OR_LO}"^^<{XSD}integer>'),
    ("_:orLarge", _t(SH + "minInclusive"), f'"{SHACL_OR_HI}"^^<{XSD}integer>'),
) + _shacl_lang_list()
