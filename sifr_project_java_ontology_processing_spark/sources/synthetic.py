"""Deterministic synthetic fixtures (FIXTURES.md §1-4).

Everything is seeded and pure — no wall clock, no external data. The
generated corpus is the sandbox stand-in for the Common-Crawl-style
Iceberg ``pages`` table of BASELINE.json's input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

The HTML is templated boilerplate (nav/ads/footer/script) wrapping a
content region whose paragraphs embed ontology labels; the ``text``
column is the golden extraction target — the extractor
(operators/extraction.py) must recover it byte-identically
(north_rule's per-row invariant).

Concept/label/mapping shapes mirror the reference's SKOS surface:
pref/alt/hidden/notation labels (BaseOntologyDelegate.java:42-43,
OWLOntologyCleaner.java:111, SKOSNotationCodeFinder.java:23), mapping
predicates (DefaultOntologyMappingDelegate.java:27-32), UMLS
MRCONSO/MRSTY dims (SQLUMLSDelegate.java:54,100,177,204). Edge cases
per FIXTURES.md: CUI-shaped altLabels, labels equal to prefLabel modulo
case/trim, high-uppercase labels, codes with 0/1/>1 CUIs, mapping
chains and cycles, skewed head-entity URLs.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

ONT_BASE = "http://example.org/onto/SRC#"
ONT2_BASE = "http://example.org/onto/TGT#"

# Two word pools: concept-label surface forms vs filler. Filler words
# never appear inside labels so golden mention counts are unambiguous.
_LABEL_WORDS = [
    "aorta", "bronchus", "carcinoma", "dyspnea", "embolism", "fibrosis",
    "glaucoma", "hepatitis", "ischemia", "jaundice", "keratitis", "lymphoma",
    "myopathy", "neuralgia", "otitis", "pleurisy", "quinsy", "rhinitis",
    "sepsis", "tachycardia", "ulcer", "vertigo", "wheeze", "xerosis",
]
# NOTE: must stay disjoint from every label SHAPE, not just label
# words — "acute"/"chronic" are banned because even-index concepts get
# an "acute {word}" alt label, so filler "acute" right before a label
# word would fuse into an unintended alt-label mention (longest match).
_FILLER_WORDS = [
    "report", "notes", "the", "patient", "with", "shows", "mild", "noted",
    "during", "left", "right", "exam", "finding", "stable", "review",
    "history", "plan", "follow", "visit", "result",
]
_LANGS = ["en", "en", "en", "fr", ""]  # mostly en, some fr, some empty


@dataclass
class KGFixture:
    """In-memory fixture bundle; convert with ``to_spark``."""

    pages: list[tuple] = field(default_factory=list)       # PAGES schema order
    ontology_labels: list[tuple] = field(default_factory=list)
    mappings: list[tuple] = field(default_factory=list)
    umls_concepts: list[tuple] = field(default_factory=list)
    umls_semtypes: list[tuple] = field(default_factory=list)
    # concept_iri -> notation code (skos:notation analog) used by the cascade
    concept_codes: dict[str, str] = field(default_factory=dict)
    # concept_iri -> directly asserted CUIs (umls:cui triples already present)
    concept_cuis: dict[str, list[str]] = field(default_factory=dict)
    # concept_iri -> directly asserted TUIs
    concept_tuis: dict[str, list[str]] = field(default_factory=dict)

    def to_spark(self, spark):
        from sifr_project_java_ontology_processing_spark import schemas

        return {
            "pages": spark.createDataFrame(self.pages, schemas.PAGES),
            "ontology_labels": spark.createDataFrame(
                self.ontology_labels, schemas.ONTOLOGY_LABELS
            ),
            "mappings": spark.createDataFrame(self.mappings, schemas.MAPPINGS),
            "umls_concepts": spark.createDataFrame(
                self.umls_concepts, schemas.UMLS_CONCEPTS
            ),
            "umls_semtypes": spark.createDataFrame(
                self.umls_semtypes, schemas.UMLS_SEMTYPES
            ),
        }


def _render_html(title: str, paragraphs: list[str], host: str) -> str:
    """Boilerplate-wrapped content. The golden extraction is
    ``title + "\\n" + "\\n".join(paragraphs)`` — extraction.py must invert
    this template for ANY input (it parses HTML; it does not know the
    template)."""
    # void elements (<img>, <br>, <input>, <hr>, <meta>, <link>) are
    # deliberately placed inside skipped containers AND content: real
    # Common-Crawl nav/footers always contain them, and an extractor
    # that counts them into its skip depth truncates everything after
    # the first <nav><img> (round-2 ADVICE regression fixture).
    nav = '<nav><img src="/logo.png" alt="logo"><ul>' + "".join(
        f'<li><a href="/{p}">{p.capitalize()}</a></li>' for p in ("home", "about", "contact")
    ) + '</ul><br><input type="search" placeholder="Search"></nav>'
    body_paras = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (
        "<html><head>"
        '<meta charset="utf-8"><link rel="stylesheet" href="/s.css">'
        f"<title>{title} | {host}</title>"
        "<style>body{font:12px serif}</style>"
        '<script type="text/javascript">var tracker="useless";track(1);</script>'
        "</head><body>"
        f"{nav}"
        '<div class="ads"><img src="/banner.jpg">BUY NOW!!! Limited offer — click here</div>'
        "<hr>"
        f'<main><article><h1>{title}</h1>{body_paras}</article></main>'
        '<aside class="related"><a href="/x">Related junk</a><img src="/thumb.png"></aside>'
        f"<footer><img src=\"/badge.svg\"><br>&copy; 2026 {host} — all rights reserved</footer>"
        "</body></html>"
    )


def golden_text(title: str, paragraphs: list[str]) -> str:
    return title + "\n" + "\n".join(paragraphs)


def make_fixture(
    n_pages: int = 200,
    n_concepts: int = 40,
    seed: int = 42,
    skew_hot_fraction: float = 0.25,
) -> KGFixture:
    """Build the full deterministic KG fixture.

    ``skew_hot_fraction`` of all mention mass is concentrated on the two
    "head" concepts + one hot host to exercise salting/AQE-skew paths.
    """
    rng = random.Random(seed)
    fx = KGFixture()

    # ---- concepts + labels -------------------------------------------------
    concept_iris: list[str] = []
    label_to_concept: dict[str, str] = {}
    for i in range(n_concepts):
        word = _LABEL_WORDS[i % len(_LABEL_WORDS)]
        suffix = "" if i < len(_LABEL_WORDS) else f" {i // len(_LABEL_WORDS) + 1}"
        code = f"{chr(ord('A') + i % 26)}{i % 10}{(i * 7) % 10}{(i * 3) % 10}"
        iri = f"{ONT_BASE}{code}"
        concept_iris.append(iri)
        pref = f"{word}{suffix}"
        fx.ontology_labels.append((iri, pref, "pref", "en"))
        label_to_concept[pref.lower()] = iri
        # alt: two-word phrase (adds multi-token trie paths)
        if i % 2 == 0:
            alt = f"acute {word}{suffix}"
            fx.ontology_labels.append((iri, alt, "alt", "en"))
            label_to_concept[alt.lower()] = iri
        # alt equal to pref modulo case/trim (dedup path E3)
        if i % 5 == 0:
            fx.ontology_labels.append((iri, f" {pref.upper()} ", "alt", "en"))
        # CUI-shaped altLabel (cascade stage 2, P4)
        if i % 4 == 1:
            cui = f"C{1000000 + i:07d}"
            fx.ontology_labels.append((iri, cui, "alt", ""))
        # high-uppercase label (W2 heuristic fodder)
        if i % 6 == 3:
            fx.ontology_labels.append((iri, word.upper() + " SYNDROME", "hidden", "en"))
        # notation code — every 8th concept omits the skos:notation label
        # so its code only exists via the URI-fragment finder (F5) and the
        # pipeline must ADD the notation triple (updateCodeNotes :333-335)
        fx.concept_codes[iri] = code
        if i % 8 != 5:
            fx.ontology_labels.append((iri, code, "notation", ""))
        # directly asserted CUIs for a third of concepts (cascade stage 1)
        if i % 3 == 0:
            fx.concept_cuis[iri] = [f"C{2000000 + i:07d}"]
        if i % 7 == 0:
            fx.concept_tuis[iri] = [f"T{100 + i:03d}"]

    # ---- mappings: chains and cycles (FIXTURES.md §3) ----------------------
    props = [
        "http://www.w3.org/2004/02/skos/core#exactMatch",
        "http://www.w3.org/2004/02/skos/core#closeMatch",
        "http://www.w3.org/2004/02/skos/core#relatedMatch",
        "http://www.w3.org/2004/02/skos/core#broadMatch",
        "http://purl.org/linguistics/gold/freeTranslation",
        "http://purl.org/linguistics/gold/translation",
    ]
    tgt_cuis: dict[str, list[str]] = {}
    for i, iri in enumerate(concept_iris):
        tgt = f"{ONT2_BASE}T{i:03d}"
        if i % 3 == 1:  # concepts without own CUI get a mapping route
            fx.mappings.append((iri, props[i % len(props)], tgt))
            if i % 2 == 1:
                tgt_cuis[tgt] = [f"C{3000000 + i:07d}"]
        if i % 10 == 4:  # cycle A<->B
            other = concept_iris[(i + 1) % len(concept_iris)]
            fx.mappings.append((iri, props[0], other))
            fx.mappings.append((other, props[0], iri))
        if i % 10 == 7:  # chain A->B->C
            b = concept_iris[(i + 2) % len(concept_iris)]
            c = concept_iris[(i + 4) % len(concept_iris)]
            fx.mappings.append((iri, props[1], b))
            fx.mappings.append((b, props[1], c))
        if i % 9 == 2:  # hierarchy edge → rdfs:subClassOf in the KG
            parent = concept_iris[(i + 3) % len(concept_iris)]
            fx.mappings.append(
                (iri, "http://www.w3.org/2004/02/skos/core#broader", parent)
            )
    fx.target_cuis = tgt_cuis  # type: ignore[attr-defined]

    # ---- UMLS dims: codes with 0 / 1 / >1 CUIs ------------------------------
    for i, iri in enumerate(concept_iris):
        code = fx.concept_codes[iri]
        n_cuis = [0, 1, 1, 2, 1][i % 5]
        for k in range(n_cuis):
            cui = f"C{4000000 + i * 10 + k:07d}"
            fx.umls_concepts.append((code, cui, "ENG", f"{_LABEL_WORDS[i % len(_LABEL_WORDS)]} term {k}"))
            # duplicate (cui,lat) with different str → signature merge (A8)
            if k == 0 and i % 6 == 0:
                fx.umls_concepts.append((code, cui, "ENG", f"alt name {i}"))
            for t in range((i + k) % 3):
                fx.umls_semtypes.append((cui, f"T{200 + i + t:03d}"))

    # ---- pages --------------------------------------------------------------
    epoch = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    all_labels = sorted(
        {
            lbl
            for (c, lbl, kind, lg) in fx.ontology_labels
            if kind in ("pref", "alt")
            and not lbl.startswith("C")
            # exclude the space-padded uppercase dedup-fodder variants:
            # sorted() would otherwise rank them first and make them the
            # hot_labels, giving hot pages double-space text instead of
            # real surface forms
            and lbl == lbl.strip()
        }
    )
    hot_labels = all_labels[:2]
    for p in range(n_pages):
        hot = rng.random() < skew_hot_fraction
        host = "hot-host0" if hot else f"host{p % 7}"
        url = f"https://{host}.example/p/{p}"
        title = f"Case {p}: {rng.choice(all_labels)}"
        n_paras = rng.randint(1, 4)
        paragraphs = []
        for _ in range(n_paras):
            words = []
            for _ in range(rng.randint(5, 12)):
                words.append(rng.choice(_FILLER_WORDS))
                if rng.random() < 0.35:
                    words.append(rng.choice(hot_labels if hot else all_labels))
            paragraphs.append(" ".join(words))
        text = golden_text(title, paragraphs)
        html = _render_html(title, paragraphs, host).encode("utf-8")
        ts = epoch + dt.timedelta(seconds=p * 137)
        lang = _LANGS[p % len(_LANGS)]
        fx.pages.append((url, ts, bytearray(html), text, lang))

    return fx
