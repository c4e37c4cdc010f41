"""Mention detection vs independent oracle — the P/R ≥ 0.95 gate
(BASELINE.json north_rule) on the held-out fixture sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.uris import SIFR_MENTION
from sifr_project_java_ontology_processing_spark.operators.extraction import extract_pages
from sifr_project_java_ontology_processing_spark.operators.mentions import (
    _scan_text,
    build_label_trie,
    detect_mentions,
)

from .oracle import mention_triples_oracle, precision_recall


def test_scan_longest_match_wins():
    trie = build_label_trie(
        [("c1", "aorta", "pref", "en"), ("c2", "acute aorta", "alt", "en")]
    )
    hits = _scan_text("patient with acute aorta today", trie)
    assert [(h[3], h[2]) for h in hits] == [("c2", "acute aorta")]


def test_scan_non_overlapping_and_case():
    trie = build_label_trie([("c1", "Aorta", "pref", "en")])
    hits = _scan_text("AORTA aorta, aortax", trie)
    assert [h[2] for h in hits] == ["AORTA", "aorta,"]


def test_scan_excludes_cui_shaped_labels():
    trie = build_label_trie([("c1", "C1234567", "alt", "en")])
    assert _scan_text("C1234567 here", trie) == []


def test_mention_triples_pr_gate(spark, kg_fixture, kg_tables):
    extracted = extract_pages(kg_tables["pages"])
    mentions = detect_mentions(spark, extracted, kg_tables["ontology_labels"])
    emitted = {
        (r["url"], SIFR_MENTION, r["concept_iri"])
        for r in mentions.select(
            "url", F.col("concept_iri")
        ).distinct().collect()
    }
    golden = mention_triples_oracle(kg_fixture.pages, kg_fixture.ontology_labels)
    p, r = precision_recall(emitted, golden)
    assert p >= 0.95 and r >= 0.95, (p, r, len(emitted), len(golden))


def test_mentions_map_only_plan(spark, kg_tables):
    extracted = extract_pages(kg_tables["pages"])
    mentions = detect_mentions(spark, extracted, kg_tables["ontology_labels"])
    plan = mentions._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
