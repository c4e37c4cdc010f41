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
    detect_mentions_joined,
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


def _rows(df):
    return sorted(
        (r["url"], r["span_start"], r["span_end"], r["surface"],
         r["concept_iri"], r["label_kind"], r["lang"])
        for r in df.drop("part_id").collect()
    )


def test_joined_path_equals_trie_path(spark, kg_tables):
    """The no-broadcast inverted-index path must emit row-for-row the
    same mentions (spans, surfaces, concepts, kinds) as the trie path."""
    extracted = extract_pages(kg_tables["pages"])
    trie = detect_mentions(spark, extracted, kg_tables["ontology_labels"])
    joined = detect_mentions_joined(spark, extracted, kg_tables["ontology_labels"])
    assert _rows(joined) == _rows(trie)


def test_joined_path_tie_and_overlap_semantics(spark):
    """Shared-first-token phrases of equal length, pref-beats-alt on an
    identical normalized phrase, and greedy non-overlap — the cases where
    a naive join would diverge from the trie."""
    extracted = spark.createDataFrame(
        [
            ("u1", "acute aorta pain then Aorta, stop", "en"),
            ("u2", "acute bronchus acute aorta acute", "en"),
            ("u3", "", "en"),
            ("u4", None, "en"),
        ],
        "url string, extracted_text string, lang string",
    )
    labels = spark.createDataFrame(
        [
            ("c:A", "aorta", "alt", "en"),
            ("c:B", "AORTA", "pref", "en"),       # same phrase: pref wins
            ("c:C", "acute aorta", "pref", "en"),  # longest-match beats 'aorta'
            ("c:D", "acute bronchus", "pref", "en"),  # shares first token with c:C
            ("c:E", "C1234567", "pref", "en"),     # CUI-shaped: excluded
        ],
        "concept_iri string, label string, label_kind string, lang string",
    )
    trie = detect_mentions(spark, extracted, labels)
    joined = detect_mentions_joined(spark, extracted, labels)
    got = _rows(joined)
    assert got == _rows(trie)
    concepts = [(u, c) for (u, _s, _e, _surf, c, _k, _l) in got]
    assert ("u1", "c:C") in concepts          # 'acute aorta' as one span
    assert ("u1", "c:B") in concepts          # standalone 'Aorta,' → pref concept
    assert ("u2", "c:D") in concepts and ("u2", "c:C") in concepts
    assert not any(u == "u3" or u == "u4" for u, _ in concepts)


def test_fused_extract_and_detect_equals_chained(spark, kg_tables):
    """extract_and_detect (one mapInArrow pass) must emit row-for-row
    the same mentions as detect_mentions over extract_pages, and stay
    map-only (no shuffle exchange in the plan)."""
    from sifr_project_java_ontology_processing_spark.operators.mentions import (
        extract_and_detect,
    )

    chained = detect_mentions(
        spark, extract_pages(kg_tables["pages"]), kg_tables["ontology_labels"]
    )
    fused = extract_and_detect(spark, kg_tables["pages"], kg_tables["ontology_labels"])
    assert _rows(fused) == _rows(chained)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
