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


def test_named_classes_owl_else_skos_fallback(spark):
    """S2 (BaseOntologyDelegate.java:173-190): named owl:Class subjects;
    fall back to skos:Concept subjects when the ontology declares none."""
    from sifr_project_java_ontology_processing_spark.operators.cascade import named_classes

    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
    SKOS_CONCEPT = "http://www.w3.org/2004/02/skos/core#Concept"
    owl_triples = spark.createDataFrame(
        [
            ("http://x/A", RDF_TYPE, OWL_CLASS),
            ("_:anon1", RDF_TYPE, OWL_CLASS),          # blank node excluded
            ("http://x/K", RDF_TYPE, SKOS_CONCEPT),    # ignored: owl wins
            ("http://x/A", "http://p/q", "v"),
        ],
        "subj string, pred string, obj string",
    )
    assert {r["concept_iri"] for r in named_classes(owl_triples).collect()} == {"http://x/A"}
    skos_only = spark.createDataFrame(
        [
            ("http://x/K1", RDF_TYPE, SKOS_CONCEPT),
            ("http://x/K2", RDF_TYPE, SKOS_CONCEPT),
        ],
        "subj string, pred string, obj string",
    )
    assert {r["concept_iri"] for r in named_classes(skos_only).collect()} == {
        "http://x/K1", "http://x/K2",
    }


def test_ontology_name_from_path():
    """F8 (BaseOntologyDelegate.java:74-107)."""
    from sifr_project_java_ontology_processing_spark.operators.cascade import (
        ontology_name_from_path,
    )

    assert ontology_name_from_path("/data/onto/MSHFRE.ttl") == "MSHFRE"
    assert ontology_name_from_path("MDRFRE.owl.bz2") == "MDRFRE"
    assert ontology_name_from_path("http://host/onto/CIM-10.xrdf") == "CIM-10"
    assert ontology_name_from_path("/data/plainname") == "plainname"


def test_umls_comparison_counters(spark):
    """A9 tail (compareCUIsToUMLS :235-246): ambiguous count + less/more
    vs the UMLS code→CUI map; unknown non-null code counts as 0 (MORE)."""
    from sifr_project_java_ontology_processing_spark.operators.cascade import (
        umls_comparison_counters,
    )

    cascade_out = spark.createDataFrame(
        [
            ("c:less", "X1", ["C1", "C2"], "own_cui"),        # umls has 3
            ("c:more", "X2", ["C1", "C2", "C3"], "own_cui"),  # umls has 1
            ("c:eq", "X3", ["C1", "C2"], "own_cui"),          # umls has 2
            ("c:unknown", "X9", ["C1", "C2"], "own_cui"),     # code not in umls -> 0 -> more
            ("c:nocode", None, ["C1", "C2"], "own_cui"),      # skipped by null guard
            ("c:single", "X1", ["C1"], "own_cui"),            # not ambiguous
        ],
        "concept_iri string, code string, cuis array<string>, cui_stage string",
    )
    umls = spark.createDataFrame(
        [("X1", f"C{i}", "ENG", "s") for i in range(3)]
        + [("X2", "C0", "ENG", "s")]
        + [("X3", "C0", "ENG", "s"), ("X3", "C1", "ENG", "s")],
        "code string, cui string, lat string, str string",
    )
    got = {r["counter"]: r["value"] for r in umls_comparison_counters(cascade_out, umls).collect()}
    assert got == {
        "classes_with_ambiguous_cui": 5,
        "classes_with_less_cuis_than_umls": 1,
        "classes_with_more_cuis_than_umls": 2,
    }
