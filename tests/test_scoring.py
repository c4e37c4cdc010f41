"""Tversky scorer + disambiguation (reference U1/W1 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.scoring import (
    concept_descriptions,
    disambiguate,
    link_score,
    rank_candidates,
    tversky_similarity,
)


def _tversky_py(a: str, b: str, alpha=1.0, beta=0.5) -> float:
    ta, tb = set(a.lower().split()), set(b.lower().split())
    i = len(ta & tb)
    d = i + alpha * len(ta - tb) + beta * len(tb - ta)
    return i / d if d else 0.0


def test_tversky_values(spark):
    rows = [
        ("acute aorta disease", "aorta disease"),
        ("aorta", "aorta"),
        ("", "aorta"),
        ("x y z", "a b c"),
    ]
    df = spark.createDataFrame(rows, "a string, b string").withColumn(
        "s", tversky_similarity("a", "b")
    )
    got = {(r["a"], r["b"]): r["s"] for r in df.collect()}
    for a, b in rows:
        assert abs(got[(a, b)] - _tversky_py(a, b)) < 1e-12, (a, b)


def test_rank_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("k", "c2", 1.0), ("k", "c1", 1.0), ("k", "c3", 0.5)],
        "key string, cand string, score double",
    )
    top = (
        rank_candidates(df, "key", "score", tiebreak="cand")
        .where(F.col("rank") == 1)
        .collect()
    )
    assert [(r["cand"]) for r in top] == ["c1"]  # equal score → lexicographic min


def test_disambiguate_top1_replaces_set(spark):
    cascade_out = spark.createDataFrame(
        [
            ("c:amb", "X1", ["C0000001", "C0000002"], "own_cui"),
            ("c:single", "X2", ["C0000009"], "own_cui"),
            ("c:noterm", "X3", ["C0000007", "C0000008"], "own_cui"),
        ],
        "concept_iri string, code string, cuis array<string>, cui_stage string",
    )
    descriptions = spark.createDataFrame(
        [("c:amb", "aorta disease"), ("c:single", "x"), ("c:noterm", "y")],
        "concept_iri string, description string",
    )
    umls = spark.createDataFrame(
        [
            ("X1", "C0000001", "ENG", "aorta disease"),   # perfect match
            ("X1", "C0000002", "ENG", "unrelated words"),
        ],
        "code string, cui string, lat string, str string",
    )
    got = {
        r["concept_iri"]: (list(r["cuis"]), r["disambiguated"])
        for r in disambiguate(cascade_out, descriptions, umls).collect()
    }
    assert got["c:amb"] == (["C0000001"], True)
    assert got["c:single"] == (["C0000009"], False)
    # no UMLS terms for its CUIs → set unchanged (reference :254-262)
    assert got["c:noterm"] == (["C0000007", "C0000008"], False)


def test_match_fallback_rescues_zero_cui_concepts(spark):
    """-mc path (OntologyCUIProcessor.java:149-152): concepts the whole
    cascade failed get matched against the FULL UMLS term map; concepts
    that already have CUIs are untouched (that's -dc's job)."""
    from sifr_project_java_ontology_processing_spark.operators.scoring import (
        match_fallback,
    )

    cascade_out = spark.createDataFrame(
        [
            ("c:empty", "X1", [], "remaining_without_cui"),
            ("c:hopeless", "X2", [], "remaining_without_cui"),
            ("c:has", "X3", ["C0000001", "C0000002"], "own_cui"),
        ],
        "concept_iri string, code string, cuis array<string>, cui_stage string",
    )
    descriptions = spark.createDataFrame(
        [
            ("c:empty", "chronic aorta disease"),
            ("c:hopeless", "zzz qqq www"),  # shares no token with any term
            ("c:has", "whatever"),
        ],
        "concept_iri string, description string",
    )
    umls = spark.createDataFrame(
        [
            ("Y1", "C0000101", "ENG", "aorta disease"),
            ("Y2", "C0000102", "ENG", "chronic nothing"),
            ("Y3", "C0000103", "ENG", "unrelated term"),
        ],
        "code string, cui string, lat string, str string",
    )
    got = {
        r["concept_iri"]: (list(r["cuis"]), r["cui_stage"], r["matched"])
        for r in match_fallback(cascade_out, descriptions, umls).collect()
    }
    # best overlap+score: 'aorta disease' (2 shared tokens)
    assert got["c:empty"] == (["C0000101"], "matched_umls_fallback", True)
    # no token overlap anywhere → stays an explicit reject
    assert got["c:hopeless"] == ([], "remaining_without_cui", False)
    # multi-CUI concept untouched by -mc
    assert got["c:has"] == (["C0000001", "C0000002"], "own_cui", False)


def test_concept_descriptions_sorted_concat(spark, kg_tables):
    df = concept_descriptions(kg_tables["ontology_labels"])
    row = df.where(F.col("concept_iri").endswith("#A000")).collect()[0]
    assert row["description"] == "aorta"


def test_link_score_monotonic(spark):
    df = spark.createDataFrame(
        [("aorta disease", "aorta disease"), ("aorta disease", "zzz qqq")],
        "d string, t string",
    ).withColumn("s", link_score("d", "t"))
    rows = {r["t"]: r["s"] for r in df.collect()}
    assert rows["aorta disease"] == 1.0 and rows["zzz qqq"] < 0.2
