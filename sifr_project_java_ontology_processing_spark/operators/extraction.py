"""HTML → text boilerplate removal (SURVEY.md U5; north_star stage 1).

The reference consumes ontologies, not web pages; this operator is the
target pipeline's mandated entry stage: trafilatura-style main-content
extraction over the ``pages.html`` binary column, **byte-identical per
url** across runs (BASELINE.json input_hint invariant).

Implementation: a vendored, dependency-free, pure-Python extractor
(stdlib ``html.parser`` only — deterministic, no version drift) driven
through ``mapInPandas`` so each Arrow batch is processed vectorized on
the executor. No per-row Python UDF, no driver involvement.

Scale: the stage is embarrassingly parallel (map-only, zero shuffle);
throughput scales linearly with executors. Column pruning matters —
callers should select only (url, html [, warc_ts, lang]) into this
operator so the scan never ships the golden ``text`` column.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Containers whose entire subtree is boilerplate.
_SKIP_TAGS = {"script", "style", "nav", "footer", "aside", "header", "noscript",
              "form", "iframe", "svg", "template"}
# class/id substrings marking boilerplate blocks (ads, banners, related links)
_SKIP_CLASS_HINTS = ("ad", "banner", "promo", "related", "cookie", "popup",
                     "social", "share", "comment")
# Block-level tags: their text becomes one extracted line.
_BLOCK_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "pre",
               "blockquote", "td", "figcaption", "dt", "dd"}
# Main-content containers, in preference order.
_MAIN_TAGS = ("article", "main", "body")
# HTML5 void elements: never have an end tag, never open a subtree.
# Real Common-Crawl pages put <img>/<br>/<meta> inside nav/footer blocks;
# counting a void tag as opening a skip-subtree level would be wrong
# (they never open a subtree at all).
_VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
              "link", "meta", "param", "source", "track", "wbr"}


class _Extractor(HTMLParser):
    """One-pass SAX-style extractor (same event-driven shape as the
    reference's SAX handler, utils/NcboSparqlOutputToTTL.java:62-103,
    but for HTML content instead of SPARQL XML)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # While skipping, track only the NAME of the tag that started
        # the skip plus its same-name nesting count. Counting every
        # start/end tag (the naive depth counter) never recovers when
        # the skipped subtree holds unclosed non-void tags (<li>, <p> —
        # ubiquitous in real web HTML): html.parser does not auto-close
        # them, so the depth stays positive and the rest of the page is
        # silently dropped. Matching only the opener's tag name ends the
        # skip exactly at its real close tag regardless of inner soup.
        self._skip_tag: str | None = None
        self._skip_same = 0
        self._block_stack: list[list[str]] = []
        # blocks collected per container kind: article / main / body
        self._container_stack: list[str] = []
        self._blocks: dict[str, list[str]] = {t: [] for t in _MAIN_TAGS}

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            # no subtree: nothing to collect, nothing to skip — even when
            # the void tag itself is boilerplate (<img class="ad">)
            return
        if self._skip_tag is not None:
            if tag == self._skip_tag:
                self._skip_same += 1
            return
        if tag in _SKIP_TAGS or self._is_boiler_attrs(attrs):
            self._skip_tag = tag
            self._skip_same = 0
            return
        if tag in _MAIN_TAGS:
            self._container_stack.append(tag)
        if tag in _BLOCK_TAGS:
            # browsers auto-close an open <p>/<li> when a sibling block
            # starts; mirror that so unclosed tags don't swallow text
            if tag in ("p", "li") and self._block_stack:
                self._flush_block()
            self._block_stack.append([])

    def _flush_block(self) -> None:
        parts = self._block_stack.pop()
        line = "".join(parts)
        if line.strip():
            for container in set(self._container_stack) or {"body"}:
                self._blocks[container].append(line)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            # browsers ignore stray </br>, </img>; and a self-closing
            # <img/> start-end pair must not end an active skip
            return
        if self._skip_tag is not None:
            if tag == self._skip_tag:
                if self._skip_same:
                    self._skip_same -= 1
                else:
                    self._skip_tag = None
            return
        if tag in _BLOCK_TAGS and self._block_stack:
            self._flush_block()
        if tag in _MAIN_TAGS and self._container_stack and self._container_stack[-1] == tag:
            while self._block_stack:  # blocks left open inside this container
                self._flush_block()
            self._container_stack.pop()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <div/>-style XHTML self-closing: a balanced start+end pair;
        # void tags stay no-ops via the checks in both handlers
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def close(self) -> None:  # flush blocks left open by malformed HTML
        super().close()
        while self._block_stack:
            self._flush_block()

    def handle_data(self, data: str) -> None:
        if self._skip_tag is not None:
            return
        if self._block_stack:
            self._block_stack[-1].append(data)

    @staticmethod
    def _is_boiler_attrs(attrs) -> bool:
        for name, value in attrs:
            if name in ("class", "id") and value:
                v = value.lower()
                if any(h in v for h in _SKIP_CLASS_HINTS):
                    return True
        return False

    def result(self) -> str:
        for container in _MAIN_TAGS:
            if self._blocks[container]:
                return "\n".join(self._blocks[container])
        return ""


def extract_text(html: bytes | None) -> str:
    """Pure function: HTML bytes → extracted main text. Deterministic —
    stdlib-only, pinned in-repo (SURVEY.md §7.4 risk 1)."""
    if html is None:
        return ""
    try:
        parser = _Extractor()
        parser.feed(bytes(html).decode("utf-8", errors="replace"))
        parser.close()
        return parser.result()
    except Exception:
        return ""


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang, …) → (url, warc_ts, extracted_text,
    lang, part_id) via Arrow-batched ``mapInPandas``. Map-only: no shuffle.
    ``part_id`` records the producing partition for the lineage/metrics
    table (north_rule)."""
    cols = [c for c in ("url", "warc_ts", "lang") if c in pages.columns]
    src = pages.select(*cols, "html")
    out_schema = ", ".join(
        {
            "url": "url string",
            "warc_ts": "warc_ts timestamp",
            "lang": "lang string",
        }[c]
        for c in cols
    ) + ", extracted_text string, part_id int"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            out = pdf[cols].copy()
            out["extracted_text"] = [extract_text(h) for h in pdf["html"]]
            out["part_id"] = pid
            yield out

    return src.mapInPandas(_batches, schema=out_schema)


def verify_extraction(pages: DataFrame) -> DataFrame:
    """Per-url byte-identical check of extracted text vs the golden
    ``text`` column (input_hint invariant). Returns mismatching rows —
    empty result ⇒ invariant holds."""
    extracted = extract_pages(pages).select("url", "extracted_text")
    golden = pages.select("url", "text")
    return (
        golden.join(extracted, "url", "left")
        .where(
            F.coalesce(F.col("extracted_text"), F.lit(""))
            != F.coalesce(F.col("text"), F.lit(""))
        )
    )
