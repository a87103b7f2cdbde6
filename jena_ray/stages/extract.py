"""Boilerplate-stripping text extraction (trafilatura-style, deterministic).

Stage 1 of the KG pipeline: ``html: binary`` → ``text: string``. The rule set
is deterministic so the per-url byte-identical invariant (BASELINE.md) is
checkable: main-content block → paragraph texts → single-space join →
HTML-entity unescape.

Stateful pieces (compiled regexes) live in an actor pool class — compiled
once per actor in ``__init__``, used per batch in ``__call__`` (the
reference's analogous pattern: TextIndexLucene holds its IndexWriter
singleton per process, jena-text/.../TextIndexLucene.java:82,124).
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa


class ExtractText:
    """Actor-pool map_batches stage: pages(html) → pages + extracted_text."""

    def __init__(self) -> None:
        flags = re.S | re.I
        self.main_re = re.compile(r"<main[^>]*>(.*?)</main>", flags)
        self.body_re = re.compile(r"<body[^>]*>(.*?)</body>", flags)
        self.para_re = re.compile(r"<p[^>]*>(.*?)</p>", flags)
        self.drop_re = re.compile(
            r"<(script|style|nav|header|footer|aside)[^>]*>.*?</\1>", flags
        )
        self.tag_re = re.compile(r"<[^>]+>")

    def extract_one(self, html: bytes) -> str:
        doc = html.decode("utf-8", errors="replace")
        m = self.main_re.search(doc)
        if m:
            content = m.group(1)
        else:
            # fall back: whole body minus boilerplate containers
            b = self.body_re.search(doc)
            content = self.drop_re.sub("", b.group(1) if b else doc)
        paras = self.para_re.findall(content)
        if not paras:
            paras = [self.tag_re.sub(" ", content)]
        text = " ".join(_html.unescape(self.tag_re.sub("", p)).strip() for p in paras)
        return " ".join(text.split())  # normalize internal runs of whitespace

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [self.extract_one(h) for h in batch.column("html").to_pylist()]
        out = batch.append_column("extracted_text", pa.array(texts, type=pa.string()))
        return out
