"""CUI/TUI enrichment cascade vs independent imperative oracle
(reference OntologyCUIProcessor.java:121-231,273-297 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.cascade import (
    STAGE_NONE,
    cui_cascade,
    find_codes,
    reject_sink,
    stage_counters,
    tui_cascade,
)

from .oracle import cascade_oracle


def _cascade_df(spark, kg_fixture, kg_tables):
    fx = kg_fixture
    classes = kg_tables["ontology_labels"].select("concept_iri").distinct()
    own_cuis = spark.createDataFrame(
        [(c, cui) for c, cuis in fx.concept_cuis.items() for cui in cuis] or
        [("__none__", "__none__")],
        "concept_iri string, cui string",
    )
    own_tuis = spark.createDataFrame(
        [(c, t) for c, ts in fx.concept_tuis.items() for t in ts] or
        [("__none__", "__none__")],
        "concept_iri string, tui string",
    )
    target_cuis = spark.createDataFrame(
        [(t, cui) for t, cuis in fx.target_cuis.items() for cui in cuis],
        "concept_iri string, cui string",
    )
    out = cui_cascade(
        classes,
        kg_tables["ontology_labels"],
        kg_tables["mappings"],
        kg_tables["umls_concepts"],
        own_cuis=own_cuis,
        target_cuis=target_cuis,
    )
    return tui_cascade(
        out, kg_tables["mappings"], kg_tables["umls_semtypes"], own_tuis=own_tuis
    )


def test_cascade_matches_oracle_exactly(spark, kg_fixture, kg_tables):
    got = {
        r["concept_iri"]: (r["code"], list(r["cuis"]), r["cui_stage"], list(r["tuis"]), r["tui_stage"])
        for r in _cascade_df(spark, kg_fixture, kg_tables).collect()
    }
    want = cascade_oracle(kg_fixture)
    assert set(got) == set(want)
    mismatches = {c: (got[c], want[c]) for c in want if got[c] != tuple(want[c])}
    assert not mismatches, dict(list(mismatches.items())[:3])


def test_stage_counters_and_reject(spark, kg_fixture, kg_tables):
    df = _cascade_df(spark, kg_fixture, kg_tables)
    counts = {r["counter"]: r["value"] for r in stage_counters(df).collect()}
    want = cascade_oracle(kg_fixture)
    from collections import Counter

    oracle_counts = Counter(v[2] for v in want.values())
    assert counts == dict(oracle_counts)
    rejects = {r["concept_iri"] for r in reject_sink(df).collect()}
    assert rejects == {c for c, v in want.items() if v[2] == STAGE_NONE}


def test_find_codes_uri_fragment_fallback(spark):
    classes = spark.createDataFrame(
        [("http://x.org/onto#K123_extra",), ("http://x.org/onto#PLAIN",), ("http://x.org/noFragment",)],
        "concept_iri string",
    )
    labels = spark.createDataFrame([], "concept_iri string, label string, label_kind string, lang string")
    got = {r["concept_iri"]: r["code"] for r in find_codes(classes, labels).collect()}
    assert got["http://x.org/onto#K123_extra"] == "K123"
    assert got["http://x.org/onto#PLAIN"] == "PLAIN"
    assert got["http://x.org/noFragment"] is None


def test_cascade_joins_are_broadcast(spark, kg_fixture, kg_tables):
    """At scale the fact side is huge; every dim join must broadcast —
    assert no SortMergeJoin/ShuffledHashJoin appears in the plan."""
    df = _cascade_df(spark, kg_fixture, kg_tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
