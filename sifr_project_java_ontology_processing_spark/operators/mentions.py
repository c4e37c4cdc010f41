"""Dictionary-driven mention detection (SURVEY.md J9; north_star stage 2).

Generalizes the reference's label↔code index lookups
(cli/generation/EHealth2017DictionaryToSkos.java:187-196) and UMLS
candidate-term fetch (ontology/umls/SQLUMLSDelegate.java:99-164) into
span detection over page text: a token-level trie built from the SKOS
label surface (prefLabel/altLabel — BaseOntologyDelegate.java:42-43) is
**broadcast** to executors (the Spark analog of the reference's whole
in-RAM OntModel), and an Arrow-batched ``mapInPandas`` scans each text
once, emitting longest-match spans.

Semantics:
  * case-insensitive exact phrase match on whitespace-token boundaries;
  * longest match wins at a position (greedy, like dictionary matchers);
  * after a match, scanning resumes after the matched phrase
    (non-overlapping).

Scale: map-side only — the label dimension rides the broadcast, so there
is NO shuffle between scan and mention emission; the first shuffle in
the pipeline appears only at the downstream groupBy/canonicalize. That
is the property that survives a 100 TB scan: mention detection cost is
one pass over text, label-set size only affects broadcast build time.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_WORD_RX = re.compile(r"\S+")
_EDGE_PUNCT_RX = re.compile(r"^[^\w]+|[^\w]+$")


def _norm_token(tok: str) -> str:
    """Lowercase + strip edge punctuation, so ``Aorta,`` matches ``aorta``."""
    return _EDGE_PUNCT_RX.sub("", tok.lower())

# trie node: dict token -> child; special key "" -> (concept_iri, label_kind, lang)
_LEAF = ""


def build_label_trie(labels: list[tuple[str, str, str, str]]) -> dict:
    """(concept_iri, label, label_kind, lang) rows → token trie.

    Only pref/alt/hidden labels participate in mention detection
    (notation codes are lookup keys, not surface forms). CUI-shaped
    labels (C0000000) are excluded — the reference treats those as
    mis-stored CUIs, not labels (cuis/CUIOntologyDelegateImpl.java:123-138).
    """
    cui_rx = re.compile(r"^C[0-9]{7}$")
    root: dict = {}
    for concept_iri, label, kind, lang in labels:
        if kind not in ("pref", "alt", "hidden"):
            continue
        if cui_rx.fullmatch(label.strip()):
            continue
        tokens = [_norm_token(t) for t in label.split()]
        tokens = [t for t in tokens if t]
        if not tokens:
            continue
        node = root
        for t in tokens:
            node = node.setdefault(t, {})
        # keep first (pref beats alt if both map; caller pre-sorts)
        node.setdefault(_LEAF, (concept_iri, kind, lang))
    return root


def _scan_text(text: str, trie: dict) -> list[tuple[int, int, str, str, str]]:
    """Longest-match scan → [(start, end, surface, concept_iri, kind)]."""
    if not text:
        return []
    words = [
        (m.start(), m.end(), _norm_token(m.group(0))) for m in _WORD_RX.finditer(text)
    ]
    words = [w for w in words if w[2]]  # drop pure-punctuation tokens
    out = []
    i = 0
    n = len(words)
    while i < n:
        node = trie.get(words[i][2])
        best = None
        j = i
        while node is not None:
            leaf = node.get(_LEAF)
            if leaf is not None:
                best = (j, leaf)
            j += 1
            if j >= n:
                break
            node = node.get(words[j][2])
        if best is not None:
            jend, (concept, kind, lang) = best
            start, end = words[i][0], words[jend][1]
            out.append((start, end, text[start:end], concept, kind))
            i = jend + 1
        else:
            i += 1
    return out


def detect_mentions(
    spark: SparkSession,
    extracted: DataFrame,
    ontology_labels: DataFrame,
    text_col: str = "extracted_text",
) -> DataFrame:
    """extracted(url, <text_col>, lang, …) × broadcast(labels) → MENTIONS.

    The label DataFrame is collected once on the driver (dimension-sized:
    the reference holds the same data as an in-memory OntModel) and
    broadcast via ``SparkContext.broadcast`` so every executor builds the
    trie exactly once per process.
    """
    label_rows = [
        (r["concept_iri"], r["label"], r["label_kind"], r["lang"])
        for r in ontology_labels.select(
            "concept_iri", "label", "label_kind", "lang"
        )
        # pref first so trie leaf prefers pref over alt on identical phrases
        .orderBy("label_kind", "concept_iri")
        .collect()
    ]
    label_rows.sort(key=lambda r: {"pref": 0, "alt": 1, "hidden": 2}.get(r[2], 3))
    bc = spark.sparkContext.broadcast(label_rows)

    src = extracted.select("url", text_col, "lang")
    out_schema = (
        "url string, span_start int, span_end int, surface string, "
        "concept_iri string, label_kind string, lang string, part_id int"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        trie = build_label_trie(bc.value)
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            # columnar accumulation — a list-of-tuples DataFrame build is
            # 3-4x slower and allocation-bound at millions of mentions
            c_url: list = []
            c_start: list = []
            c_end: list = []
            c_surface: list = []
            c_concept: list = []
            c_kind: list = []
            c_lang: list = []
            for url, text, lang in zip(pdf["url"], pdf[text_col], pdf["lang"]):
                hits = _scan_text(text or "", trie)
                if not hits:
                    continue
                for start, end, surface, concept, kind in hits:
                    c_start.append(start)
                    c_end.append(end)
                    c_surface.append(surface)
                    c_concept.append(concept)
                    c_kind.append(kind)
                n = len(hits)
                c_url.extend([url] * n)
                c_lang.extend([lang] * n)
            yield pd.DataFrame(
                {
                    "url": pd.Series(c_url, dtype="object"),
                    "span_start": pd.Series(c_start, dtype="int32"),
                    "span_end": pd.Series(c_end, dtype="int32"),
                    "surface": pd.Series(c_surface, dtype="object"),
                    "concept_iri": pd.Series(c_concept, dtype="object"),
                    "label_kind": pd.Series(c_kind, dtype="object"),
                    "lang": pd.Series(c_lang, dtype="object"),
                    "part_id": pd.Series([pid] * len(c_start), dtype="int32"),
                }
            )

    return src.mapInPandas(_batches, schema=out_schema)
