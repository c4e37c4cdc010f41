"""Property-based tests (hypothesis) for the pure-Python hot paths —
no SparkSession needed, so these run fast and fuzz wide."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sifr_project_java_ontology_processing_spark.operators.extraction import extract_text
from sifr_project_java_ontology_processing_spark.operators.mentions import (
    _scan_text,
    build_label_trie,
)
from sifr_project_java_ontology_processing_spark.sources.sparql_xml import (
    parse_sparql_results,
)

from .oracle import mentions_oracle


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_text_never_raises(data):
    out = extract_text(data)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048))
def test_extract_text_utf8_html_never_raises(s):
    out = extract_text(s.encode("utf-8", errors="ignore"))
    assert isinstance(out, str)


_WORDS = st.sampled_from(
    ["aorta", "acute", "sepsis", "the", "with", "x1", "C1234567", "...", "a-b", "é"]
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_WORDS, max_size=40))
def test_scan_matches_independent_oracle(words):
    text = " ".join(words)
    labels = [
        ("c:aorta", "aorta", "pref", "en"),
        ("c:acute-aorta", "acute aorta", "alt", "en"),
        ("c:sepsis", "sepsis", "pref", "en"),
        ("c:cui", "C1234567", "alt", "en"),  # excluded by CUI-shape rule
    ]
    trie = build_label_trie(labels)
    got = [h[3] for h in _scan_text(text, trie)]
    want = [c for (_i, c, _l) in mentions_oracle(text, labels)]
    assert got == want, (text, got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(_WORDS, max_size=30))
def test_scan_spans_slice_back_to_surface(words):
    text = "  ".join(words)
    trie = build_label_trie([("c", "aorta", "pref", "en")])
    for start, end, surface, _c, _k in _scan_text(text, trie):
        assert text[start:end] == surface
        assert re.sub(r"^[^\w]+|[^\w]+$", "", surface.lower()) == "aorta"


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1024))
def test_sparql_parse_never_raises(s):
    out = parse_sparql_results(s)
    assert isinstance(out, list)
