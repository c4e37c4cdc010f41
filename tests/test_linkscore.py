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


# --- link-quality harness (round-3 VERDICT #6) ---------------------------
# A labeled golden set with the two failure modes the blend must cover:
#   * AMBIGUOUS SURFACES ("bank"): both concepts carry the same label,
#     so surface_sim ties at 1.0 and only context can disambiguate;
#   * NEAR-IDENTICAL CONCEPTS (hypertension/hypotension): descriptions
#     share almost all tokens, so context ties and only the surface
#     term separates them.

LQ_DESCS = [
    ("http://c/riverbank", "river shore water sediment erosion flow channel"),
    ("http://c/moneybank", "money deposit loan finance interest account branch"),
    ("http://c/hypertension", "blood pressure disorder circulatory measurement"),
    ("http://c/hypotension", "blood pressure disorder circulatory reading"),
]
LQ_LABELS = [
    ("http://c/riverbank", "bank"),
    ("http://c/moneybank", "bank"),
    ("http://c/hypertension", "hypertension"),
    ("http://c/hypotension", "hypotension"),
]


def _lq_fixture(spark):
    pages, golden, cands = [], [], []
    for i in range(8):
        url = f"http://p/river{i}"
        pages.append((url, f"the bank by the river carried water and sediment downstream {i}"))
        golden.append((url, "bank", "http://c/riverbank"))
        cands += [(url, "http://c/riverbank", "bank"), (url, "http://c/moneybank", "bank")]
    for i in range(8):
        url = f"http://p/money{i}"
        pages.append((url, f"the bank approved the loan and the deposit earned interest {i}"))
        golden.append((url, "bank", "http://c/moneybank"))
        cands += [(url, "http://c/riverbank", "bank"), (url, "http://c/moneybank", "bank")]
    for i in range(4):
        url = f"http://p/ht{i}"
        pages.append((url, f"patient diagnosed with hypertension blood pressure disorder {i}"))
        golden.append((url, "hypertension", "http://c/hypertension"))
        cands += [
            (url, "http://c/hypertension", "hypertension"),
            (url, "http://c/hypotension", "hypertension"),
        ]
    extracted = spark.createDataFrame(pages, "url string, extracted_text string")
    golden_df = spark.createDataFrame(golden, "url string, surface string, concept_iri string")
    mentions = spark.createDataFrame(cands, "url string, concept_iri string, surface string")
    return extracted, golden_df, mentions


def test_link_quality_gate(spark):
    """score_mentions link accuracy on the labeled golden set must
    clear the floor, and the 0.7/0.3 blend must be at least as good as
    either feature alone (this is the gate that justifies the blend)."""
    from sifr_project_java_ontology_processing_spark.operators.linkscore import (
        evaluate_link_quality,
        score_mentions,
    )

    extracted, golden, mentions = _lq_fixture(spark)
    descs = spark.createDataFrame(LQ_DESCS, "concept_iri string, description string")
    labels = spark.createDataFrame(LQ_LABELS, "concept_iri string, label string")
    scored = score_mentions(extracted, mentions, descs, labels=labels).cache()

    def _metrics(score_col):
        r = evaluate_link_quality(scored, golden, score_col=score_col).collect()[0]
        return r["precision"], r["recall"]

    p_blend, r_blend = _metrics("link_score")
    p_ctx, _ = _metrics("tfidf_cosine")
    p_surf, _ = _metrics("surface_sim")

    # stated floor: the blend must resolve BOTH failure modes
    assert p_blend >= 0.95 and r_blend >= 0.95, (p_blend, r_blend)
    # each single feature fails its blind spot...
    assert p_surf < 0.95, f"surface-only unexpectedly resolves ambiguity: {p_surf}"
    # ...and the blend dominates both
    assert p_blend >= p_ctx and p_blend >= p_surf, (p_blend, p_ctx, p_surf)


def test_link_quality_counts_missing_candidates_in_recall(spark):
    from sifr_project_java_ontology_processing_spark.operators.linkscore import (
        evaluate_link_quality,
    )

    scored = spark.createDataFrame(
        [("u1", "s", "http://c/a", 0.9)],
        "url string, surface string, concept_iri string, link_score double",
    )
    golden = spark.createDataFrame(
        [("u1", "s", "http://c/a"), ("u2", "s", "http://c/b")],
        "url string, surface string, concept_iri string",
    )
    r = evaluate_link_quality(scored, golden).collect()[0]
    assert r["n_gold"] == 2 and r["n_pred"] == 1 and r["n_correct"] == 1
    assert r["precision"] == 1.0 and r["recall"] == 0.5


def test_link_quality_zero_predictions_reads_zero(spark):
    """With NO scored candidates at all (the no-candidates regression
    this harness gates) the metrics must be 0, never NULL."""
    from sifr_project_java_ontology_processing_spark.operators.linkscore import (
        evaluate_link_quality,
    )

    scored = spark.createDataFrame(
        [], "url string, surface string, concept_iri string, link_score double"
    )
    golden = spark.createDataFrame(
        [("u1", "s", "http://c/a")], "url string, surface string, concept_iri string"
    )
    r = evaluate_link_quality(scored, golden).collect()[0]
    assert (r["n_correct"], r["precision"], r["recall"]) == (0, 0.0, 0.0)
