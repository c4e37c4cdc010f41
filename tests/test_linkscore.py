"""TF-IDF context-vector link scoring vs an independent numpy oracle."""

from __future__ import annotations

import math

from sifr_project_java_ontology_processing_spark.operators.linkscore import (
    idf_table,
    tfidf_link_scores,
)

DOCS = [
    (0, "aorta disease found in aorta scan"),
    (1, "patient shows chronic disease"),
    (2, "unrelated filler words only"),
]
DESCS = [
    ("c:aorta", "aorta disease"),
    ("c:chronic", "chronic disease patient"),
]
CANDS = [(0, "c:aorta"), (1, "c:aorta"), (1, "c:chronic"), (2, "c:aorta")]


def _py_scores():
    doc_toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    df: dict[str, int] = {}
    for toks in doc_toks.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log((n + 1) / (d + 1)) + 1 for t, d in df.items()}

    def vec(toks):
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        w = {t: c * idf[t] for t, c in tf.items() if t in idf}
        nm = math.sqrt(sum(x * x for x in w.values()))
        return {t: x / nm for t, x in w.items()} if nm else {}

    dvec = {i: vec(t) for i, t in doc_toks.items()}
    cvec = {c: vec(d.split()) for c, d in DESCS}
    out = {}
    for doc, concept in CANDS:
        dv, cv = dvec[doc], cvec[concept]
        out[(doc, concept)] = round(
            sum(w * cv[t] for t, w in dv.items() if t in cv), 6
        )
    return out


def test_tfidf_scores_match_python_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    descs = spark.createDataFrame(DESCS, "concept_iri string, description string")
    cands = spark.createDataFrame(CANDS, "doc_id long, concept_iri string")
    got = {
        (r["doc_id"], r["concept_iri"]): r["tfidf_cosine"]
        for r in tfidf_link_scores(docs, cands, descs).collect()
    }
    assert got == _py_scores()
    # contextual support ranks the right concept first for doc 1
    assert got[(1, "c:chronic")] > got[(1, "c:aorta")]
    # zero-overlap candidate is kept with score 0
    assert got[(2, "c:aorta")] == 0.0


def test_idf_stop_token_cap(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idf = {r["token"]: r["idf"] for r in idf_table(docs, max_token_df=1).collect()}
    # 'disease' appears in 2 docs -> dropped by cap 1; 'aorta' in 1 doc kept
    assert "disease" not in idf and "aorta" in idf


def test_pipeline_scored_mentions_stage(spark, kg_fixture, kg_tables):
    """score_links=True attaches per-mention link scores without
    changing the triple output."""
    from sifr_project_java_ontology_processing_spark.plans.kg_pipeline import (
        run_kg_pipeline,
    )

    res = run_kg_pipeline(
        spark,
        kg_tables["pages"],
        kg_tables["ontology_labels"],
        kg_tables["mappings"],
        kg_tables["umls_concepts"],
        kg_tables["umls_semtypes"],
        disambiguate_cuis=False,
        score_links=True,
    )
    rows = res.scored_mentions.limit(500).collect()
    assert rows, "no scored mentions"
    for r in rows[:50]:
        assert 0.0 <= r["tfidf_cosine"] <= 1.000001
        assert r["link_score"] is not None
    # a mention whose surface IS the concept's description scores high
    # on surface_sim for at least some rows
    assert any(r["surface_sim"] > 0.9 for r in rows)


def test_no_doc_concept_product_in_plan(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    descs = spark.createDataFrame(DESCS, "concept_iri string, description string")
    cands = spark.createDataFrame(CANDS, "doc_id long, concept_iri string")
    plan = (
        tfidf_link_scores(docs, cands, descs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
