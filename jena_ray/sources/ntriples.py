"""N-Triples / N-Quads Ray Data source and N-Triples sink.

Read side mirrors elephas's input-format split (SURVEY §2.1): N-Triples and
N-Quads are line-delimited and order-free per line, so they are splittable —
`read_text` shards them freely and a `map_batches` parse UDF handles each
block of lines (NTriplesInputFormat analog). Context-dependent syntaxes
(Turtle/TriG) must go whole-file (AbstractWholeFileInputFormat.isSplitable=
false, jena-elephas .../AbstractWholeFileInputFormat.java:39-40) — see
jena_ray.sources.turtle.

Write side is the streaming N-Triples writer (SinkTripleOutput /
NodeFormatterNT semantics): terms are already canonical N-Triples strings, so
a row is ``subj SP pred SP obj SP '.'``.
"""

from __future__ import annotations

import pyarrow as pa

from jena_ray import term as T

TRIPLE_COLS = ("subj", "pred", "obj")


class ParseNTriplesBatch:
    """Actor-pool stage: text lines → triple rows. Errors either raise
    (strict, the `riot` default — CmdLangParse.java:256-261) or are routed to
    an error column for a side output.

    The hot path is the vectorized RE2 parse (sources/nt_fast.py — one
    ``pc.extract_regex`` pass over the whole column, ~6.6× the per-line
    loop); only escape-bearing / exotic lines fall back to the exact
    Python parser. An explicit ``base`` disables the fast path (every IRI
    may need resolution)."""

    def __init__(self, *, strict: bool = True, base: str | None = None):
        self.strict = strict
        self.base = base

    def _slow_line(self, line: str) -> list[tuple[str, str, str]]:
        return T.parse_ntriples(line, strict=self.strict, base=self.base)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = "text" if "text" in batch.schema.names else batch.schema.names[0]
        if self.base is None:
            from jena_ray.sources.nt_fast import parse_nt_batch_fast

            return parse_nt_batch_fast(
                batch.column(col), self._slow_line, strict=self.strict
            )
        subjs: list[str] = []
        preds: list[str] = []
        objs: list[str] = []
        for line in batch.column(col).to_pylist():
            if T._BLANK_RE.match(line):
                continue
            triples = T.parse_ntriples(line, strict=self.strict, base=self.base)
            for s, p, o in triples:
                subjs.append(s)
                preds.append(p)
                objs.append(o)
        return pa.table(
            {
                "subj": pa.array(subjs, type=pa.string()),
                "pred": pa.array(preds, type=pa.string()),
                "obj": pa.array(objs, type=pa.string()),
            }
        )


class ParseNTriplesChecked:
    """Checker side-channel (riot/system/Checker.java:28 + elephas
    ValidTripleFilterMapper semantics): strict per-line checking where bad
    lines are ROUTED, not raised — every input line becomes either a triple
    row (error null) or an error row (term columns null, error = message).
    Split downstream with ``split_checked``."""

    def __init__(self, *, base: str | None = None):
        self.base = base

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = "text" if "text" in batch.schema.names else batch.schema.names[0]
        subjs: list = []
        preds: list = []
        objs: list = []
        errs: list = []
        lines_out: list = []
        for line in batch.column(col).to_pylist():
            if T._BLANK_RE.match(line):
                continue
            try:
                triples = T.parse_ntriples(line, strict=True, base=self.base)
            except T.TermError as e:
                subjs.append(None)
                preds.append(None)
                objs.append(None)
                errs.append(str(e))
                lines_out.append(line)
                continue
            for s, p, o in triples:
                subjs.append(s)
                preds.append(p)
                objs.append(o)
                errs.append(None)
                lines_out.append(line)
        return pa.table(
            {
                "subj": pa.array(subjs, type=pa.string()),
                "pred": pa.array(preds, type=pa.string()),
                "obj": pa.array(objs, type=pa.string()),
                "error": pa.array(errs, type=pa.string()),
                "line": pa.array(lines_out, type=pa.string()),
            }
        )


def split_checked(checked):
    """(valid triples Dataset, error Dataset) from a ParseNTriplesChecked
    output — the valid/invalid side channels of the elephas filter mappers."""
    import pyarrow.compute as pc

    def good(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("error"))).select(list(TRIPLE_COLS))

    def bad(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("error"))).select(["line", "error"])

    return (
        checked.map_batches(good, batch_format="pyarrow"),
        checked.map_batches(bad, batch_format="pyarrow"),
    )


def read_ntriples_checked(paths, *, base: str | None = None, concurrency=(1, 4)):
    """Dataset of (subj, pred, obj, error, line) rows: strict checking with
    an error side-channel instead of a hard stop."""
    import ray.data as rd

    lines = rd.read_text(paths)
    return lines.map_batches(
        ParseNTriplesChecked,
        fn_constructor_kwargs={"base": base},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def read_ntriples(paths, *, strict: bool = True, base: str | None = None, concurrency=(1, 4)):
    """Dataset of canonical triples from .nt files (splittable by line).

    NOTE on blank-node scope: per-line parsing keeps labels as given, so
    labels are consistent within a file as long as the whole file shares one
    label namespace (the N-Triples spec's document scope). For cross-file
    collision safety, skolemize downstream with a per-file seed via
    read_ntriples_files.
    """
    import ray.data as rd

    lines = rd.read_text(paths)
    return lines.map_batches(
        ParseNTriplesBatch,
        fn_constructor_kwargs={"strict": strict, "base": base},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def read_ntriples_files(
    paths,
    *,
    strict: bool = True,
    base: str | None = None,
    job_seed: str = "jena-ray",
    concurrency: int = 4,
    label_policy: str = "scope_by_file_hash",
):
    """Whole-file N-Triples read; ``label_policy`` selects the LabelToNode
    strategy (riot/lang/LabelToNode.java:46-75):

    - ``"scope_by_file_hash"`` (default) — createScopeByDocumentHash with a
      fixed seed: labels depend only on (job seed, file path, label), so
      shard boundaries and worker placement never change them — the only
      strategy that is deterministic under distributed re-execution.
    - ``"as_given"`` — createUseLabelAsGiven: labels kept verbatim; caller
      owns cross-file collision avoidance (matches single-process Jena when
      all files share one label namespace).
    - ``"global"`` — createScopeGlobal: one shared scope for the whole job,
      hashed with a constant scope key: the same label in two files IS the
      same node (N-Quads "dataset scope" reading).
    """
    import ray.data as rd

    if label_policy not in ("scope_by_file_hash", "as_given", "global"):
        raise ValueError(f"unknown label_policy: {label_policy}")

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        subjs, preds, objs, srcs = [], [], [], []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            if label_policy == "as_given":
                seed = None
            elif label_policy == "global":
                seed = T.bnode_seed(job_seed, "")
            else:
                seed = T.bnode_seed(job_seed, path)
            for s, p, o in T.parse_ntriples(
                data.decode("utf-8"), strict=strict, skolem_seed=seed, base=base
            ):
                subjs.append(s)
                preds.append(p)
                objs.append(o)
                srcs.append(path)
        return pa.table(
            {
                "subj": pa.array(subjs, type=pa.string()),
                "pred": pa.array(preds, type=pa.string()),
                "obj": pa.array(objs, type=pa.string()),
                "src": pa.array(srcs, type=pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow", concurrency=concurrency, num_cpus=1)


def read_nquads(paths, *, strict: bool = True, base: str | None = None, concurrency: int = 4):
    """Dataset of canonical quads (graph, subj, pred, obj) from .nq files.
    Default-graph rows carry urn:x-arq:DefaultGraph (Quad.java:37)."""
    import ray.data as rd

    lines = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        col = "text" if "text" in batch.schema.names else batch.schema.names[0]
        gs, ss, ps, os_ = [], [], [], []
        for line in batch.column(col).to_pylist():
            for g, s, p, o in T.parse_nquads(line, strict=strict, base=base):
                gs.append(g)
                ss.append(s)
                ps.append(p)
                os_.append(o)
        return pa.table(
            {
                "graph": pa.array(gs, type=pa.string()),
                "subj": pa.array(ss, type=pa.string()),
                "pred": pa.array(ps, type=pa.string()),
                "obj": pa.array(os_, type=pa.string()),
            }
        )

    return lines.map_batches(parse, batch_format="pyarrow", concurrency=concurrency, num_cpus=1)


def format_nt_batch(batch: pa.Table) -> pa.Table:
    """Triple rows → one N-Triples line per row (SinkTripleOutput.java:38,64
    layout: term SP term SP term SP DOT). Terms are already canonical."""
    import pyarrow.compute as pc

    line = pc.binary_join_element_wise(
        batch.column("subj"), batch.column("pred"), batch.column("obj"), pa.scalar(" ")
    )
    line = pc.binary_join_element_wise(line, pa.scalar("."), " ")
    return pa.table({"text": line})


def write_ntriples(triples, path: str):
    """Export a triples Dataset to a directory of .nt part files.

    Distributed write: each block's task writes its own part file (named by
    content hash — deterministic and idempotent), mirroring the streaming
    SinkTripleOutput with one sink per partition."""
    import os

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        lines = format_nt_batch(batch).column("text").to_pylist()
        data = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
        h1, _ = T.murmur3_128(data)
        fname = os.path.join(path, f"part-{h1:016x}.nt")
        with open(fname, "wb") as f:
            f.write(data)
        return pa.table({"path": pa.array([fname]), "rows": pa.array([len(lines)])})

    parts = triples.map_batches(write_block, batch_format="pyarrow").take_all()
    return path


def quads_to_triples(quads):
    """Drop the graph column (elephas QuadsToTriplesMapper analog)."""
    return quads.drop_columns(["graph"])


def triples_to_quads(triples, graph_iri: str = "urn:x-arq:DefaultGraph"):
    """Add a constant graph column (TriplesToQuadsConstantGraphMapper)."""

    def add(batch: pa.Table) -> pa.Table:
        g = pa.array([f"<{graph_iri}>"] * batch.num_rows, type=pa.string())
        return pa.table(
            {
                "graph": g,
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj": batch.column("obj"),
            }
        )

    return triples.map_batches(add, batch_format="pyarrow")


def ground_triples(triples):
    """GroundTripleFilterMapper (jena-elephas filter mappers): keep only
    triples with no blank node in subject or object (predicates are always
    IRIs post-check). Vectorized prefix test per batch."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.invert(pc.starts_with(batch.column("subj"), "_:")),
            pc.invert(pc.starts_with(batch.column("obj"), "_:")),
        )
        return batch.filter(mask)

    return triples.map_batches(f, batch_format="pyarrow")


def ground_quads(quads):
    """GroundQuadFilterMapper: ground triple + non-bnode graph name."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.invert(pc.starts_with(batch.column("subj"), "_:")),
                pc.invert(pc.starts_with(batch.column("obj"), "_:")),
            ),
            pc.invert(pc.starts_with(batch.column("graph"), "_:")),
        )
        return batch.filter(mask)

    return quads.map_batches(f, batch_format="pyarrow")


def iri_violation_scan(triples, *, warnings: bool = True, num_buckets: int = 32):
    """riot IRI-check analog over a triple Dataset: per-IRI violation rows
    ``(iri, code, is_error)`` with per-code counts left to the caller
    (``pre_aggregated_count``). Mirrors CheckerIRI.iriViolations (jena-arq
    riot/checker/CheckerIRI.java:120-190) classifying with the jena-iri
    taxonomy subset in :func:`jena_ray.term.iri_violations`.

    Each batch dedups its IRIs before the Python classification loop (hub
    IRIs repeat massively at crawl scale), and the cross-block dedup is the
    standard bucketed exact dedup — so the loop runs once per distinct IRI
    per block, never once per triple."""
    import pyarrow.compute as pc

    from jena_ray.stages.dedup import dedup_exact
    from jena_ray.term import iri_violations

    def scan(batch: pa.Table) -> pa.Table:
        cols = [batch.column(c) for c in TRIPLE_COLS if c in batch.schema.names]
        merged = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols]
        )
        iris = pc.unique(merged.filter(pc.starts_with(merged, "<")))
        out_iri, out_code, out_err = [], [], []
        for t in iris.to_pylist():
            for code, is_err in iri_violations(t[1:-1]):
                if not is_err and not warnings:
                    continue
                out_iri.append(t)
                out_code.append(code)
                out_err.append(is_err)
        return pa.table(
            {
                "iri": pa.array(out_iri, type=pa.string()),
                "code": pa.array(out_code, type=pa.string()),
                "is_error": pa.array(out_err, type=pa.bool_()),
            }
        )

    rows = triples.map_batches(scan, batch_format="pyarrow")
    return dedup_exact(
        rows, cols=("iri", "code"), keep_cols=("iri", "code", "is_error"),
        num_buckets=num_buckets,
    )
