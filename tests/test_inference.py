"""RDFS entailment materialization + SKOS integrity audit
(operators/inference.py). Exact expected triple sets, hand-derived."""

from __future__ import annotations

from sifr_project_java_ontology_processing_spark.operators.inference import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    rdfs_entail,
    skos_audit,
)

SCHEMA = "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean"
SKOS = "http://www.w3.org/2004/02/skos/core#"


def _iri(s, p, o):
    return (s, p, o, None, False)


def _triples(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_rdfs_entail_full_rule_set(spark):
    """Chain hierarchy + domain/range; every rule fires, including
    rdfs3 on an rdfs7-DERIVED assertion (stratification order)."""
    asserted = [
        _iri("p1", RDFS_SUBPROPERTYOF, "p2"),
        _iri("p2", RDFS_SUBPROPERTYOF, "p3"),
        _iri("A", RDFS_SUBCLASSOF, "B"),
        _iri("B", RDFS_SUBCLASSOF, "C"),
        _iri("p1", RDFS_DOMAIN, "D1"),
        _iri("p2", RDFS_RANGE, "R2"),
        _iri("x", "p1", "y"),
        _iri("u", RDF_TYPE, "A"),
    ]
    expected = set(asserted) | {
        _iri("p1", RDFS_SUBPROPERTYOF, "p3"),  # rdfs5
        _iri("x", "p2", "y"),  # rdfs7
        _iri("x", "p3", "y"),  # rdfs7 via closure
        _iri("A", RDFS_SUBCLASSOF, "C"),  # rdfs11
        _iri("x", RDF_TYPE, "D1"),  # rdfs2 (domain of p1)
        _iri("y", RDF_TYPE, "R2"),  # rdfs3 on DERIVED (x p2 y)
        _iri("u", RDF_TYPE, "B"),  # rdfs9
        _iri("u", RDF_TYPE, "C"),  # rdfs9 via closure
    }
    out = {
        (r.subj, r.pred, r.obj, r.obj_lang, r.obj_is_literal)
        for r in rdfs_entail(_triples(spark, asserted)).collect()
    }
    assert out == expected


def test_rdfs_entail_literal_range_not_typed(spark):
    """rdfs3 must NOT type literal objects."""
    asserted = [
        _iri("p", RDFS_RANGE, "R"),
        ("x", "p", "hello", "en", True),
    ]
    out = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_entail(_triples(spark, asserted)).collect()
    }
    assert ("hello", RDF_TYPE, "R") not in out
    # domain-free, so only the asserted pair remains
    assert out == {("p", RDFS_RANGE, "R"), ("x", "p", "hello")}


def test_rdfs_entail_idempotent(spark):
    """Entailing an already-entailed graph adds nothing (fixpoint)."""
    asserted = [
        _iri("A", RDFS_SUBCLASSOF, "B"),
        _iri("B", RDFS_SUBCLASSOF, "C"),
        _iri("u", RDF_TYPE, "A"),
        _iri("p", RDFS_DOMAIN, "A"),
        _iri("x", "p", "y"),
    ]
    once = rdfs_entail(_triples(spark, asserted))
    r1 = {tuple(r) for r in once.collect()}
    r2 = {tuple(r) for r in rdfs_entail(once).collect()}
    assert r1 == r2
    assert ("x", RDF_TYPE, "C", None, False) in r1  # rdfs2 then rdfs9


def test_skos_audit_all_issues(spark):
    C, PL, BR, IS = (
        SKOS + "Concept",
        SKOS + "prefLabel",
        SKOS + "broader",
        SKOS + "inScheme",
    )
    rows = [
        # c1: healthy — one label, in scheme
        _iri("c1", RDF_TYPE, C),
        ("c1", PL, "one", "en", True),
        ("c1", IS, "sch", None, False),
        # c2: missing prefLabel, linked via broader to c1
        _iri("c2", RDF_TYPE, C),
        _iri("c2", BR, "c1"),
        # c3: two @en prefLabels, linked
        _iri("c3", RDF_TYPE, C),
        ("c3", PL, "x", "en", True),
        ("c3", PL, "y", "en", True),
        _iri("c3", BR, "c1"),
        # c4 <-> c5: broader cycle (both labeled, linked)
        _iri("c4", RDF_TYPE, C),
        ("c4", PL, "four", "en", True),
        _iri("c4", BR, "c5"),
        _iri("c5", RDF_TYPE, C),
        ("c5", PL, "five", "en", True),
        _iri("c5", BR, "c4"),
        # c6: orphan (label but no links)
        _iri("c6", RDF_TYPE, C),
        ("c6", PL, "six", "en", True),
        # c7: same label twice (duplicate triple-ish) is NOT a violation;
        # different langs are NOT a violation
        _iri("c7", RDF_TYPE, C),
        ("c7", PL, "sept", "fr", True),
        ("c7", PL, "seven", "en", True),
        ("c7", PL, "seven", "en", True),
        _iri("c7", BR, "c1"),
    ]
    out = {(r.concept, r.issue) for r in skos_audit(_triples(spark, rows)).collect()}
    assert out == {
        ("c2", "missing_preflabel"),
        ("c3", "multiple_preflabel"),
        ("c4", "broader_cycle"),
        ("c5", "broader_cycle"),
        ("c6", "orphan_concept"),
    }


def test_skos_audit_self_loop_is_cycle(spark):
    C, PL, BR = SKOS + "Concept", SKOS + "prefLabel", SKOS + "broader"
    rows = [
        _iri("c1", RDF_TYPE, C),
        ("c1", PL, "one", "en", True),
        _iri("c1", BR, "c1"),
    ]
    out = {(r.concept, r.issue) for r in skos_audit(_triples(spark, rows)).collect()}
    assert out == {("c1", "broader_cycle")}


def test_rdfs_plus_inverse_symmetric_transitive(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INVERSEOF,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        rdfs_plus_entail,
    )

    asserted = [
        _iri("p:madeBy", OWL_INVERSEOF, "p:makes"),
        _iri("x", "p:madeBy", "m"),
        _iri("w", "p:makes", "v"),  # inverse applies in BOTH directions
        _iri("p:adj", RDF_TYPE, OWL_SYMMETRIC),
        _iri("a", "p:adj", "b"),
        _iri("p:part", RDF_TYPE, OWL_TRANSITIVE),
        _iri("c1", "p:part", "c2"),
        _iri("c2", "p:part", "c3"),
        _iri("c3", "p:part", "c4"),
    ]
    out = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_plus_entail(_triples(spark, asserted)).collect()
    }
    expected = {(s, p, o) for s, p, o, *_ in asserted} | {
        ("m", "p:makes", "x"),  # inverseOf P→Q
        ("v", "p:madeBy", "w"),  # inverseOf Q→P
        ("b", "p:adj", "a"),  # symmetric
        ("c1", "p:part", "c3"),
        ("c2", "p:part", "c4"),
        ("c1", "p:part", "c4"),  # transitive closure depth 3
    }
    assert out == expected


def test_rdfs_plus_inverse_of_transitive_mirrors_closure(spark):
    """(P inv Q) with P transitive: Q must mirror P's CLOSURE pairs,
    not just the asserted edges (post-closure re-application)."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INVERSEOF,
        OWL_TRANSITIVE,
        rdfs_plus_entail,
    )

    asserted = [
        _iri("p:anc", OWL_INVERSEOF, "p:desc"),
        _iri("p:anc", RDF_TYPE, OWL_TRANSITIVE),
        _iri("a", "p:anc", "b"),
        _iri("b", "p:anc", "c"),
    ]
    out = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_plus_entail(_triples(spark, asserted)).collect()
    }
    assert ("a", "p:anc", "c") in out  # closure
    assert ("c", "p:desc", "a") in out  # inverse OF the closure pair
    assert ("b", "p:desc", "a") in out and ("c", "p:desc", "b") in out


def test_rdfs_plus_symmetric_transitive_connected_component(spark):
    """A property both symmetric and transitive entails ALL ordered
    pairs (incl. reflexive) within a connected component."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        rdfs_plus_entail,
    )

    asserted = [
        _iri("p:near", RDF_TYPE, OWL_SYMMETRIC),
        _iri("p:near", RDF_TYPE, OWL_TRANSITIVE),
        _iri("a", "p:near", "b"),
        _iri("b", "p:near", "c"),
    ]
    out = {
        (r.subj, r.obj)
        for r in rdfs_plus_entail(_triples(spark, asserted)).collect()
        if r.pred == "p:near"
    }
    assert out == {(x, y) for x in "abc" for y in "abc"}


def test_rdfs_plus_runs_rdfs_rules_on_derived(spark):
    """range() must fire on a transitively-DERIVED assertion."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_TRANSITIVE,
        rdfs_plus_entail,
    )

    asserted = [
        _iri("p:part", RDF_TYPE, OWL_TRANSITIVE),
        _iri("p:part", RDFS_RANGE, "C:Whole"),
        _iri("x", "p:part", "y"),
        _iri("y", "p:part", "z"),
    ]
    out = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_plus_entail(_triples(spark, asserted)).collect()
    }
    assert ("z", RDF_TYPE, "C:Whole") in out and ("y", RDF_TYPE, "C:Whole") in out


def test_rdfs7_preserves_lang_tag(spark):
    """Review fix: "Hello"@en generalized under a superproperty stays
    "Hello"@en — the plain literal "Hello" is NOT entailed."""
    asserted = [
        _iri("p:pref", RDFS_SUBPROPERTYOF, "p:label"),
        ("x", "p:pref", "Hello", "en", True),
    ]
    out = {
        (r.subj, r.pred, r.obj, r.obj_lang, r.obj_is_literal)
        for r in rdfs_entail(_triples(spark, asserted)).collect()
    }
    assert ("x", "p:label", "Hello", "en", True) in out
    assert ("x", "p:label", "Hello", None, True) not in out


def test_incremental_delta_equals_full(spark):
    """Semi-naive maintenance: entail(base) + delta must equal
    entail(base ∪ delta) exactly, with no duplicate rows."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_entail_delta,
    )

    base = [
        _iri("p1", RDFS_SUBPROPERTYOF, "p2"),
        _iri("A", RDFS_SUBCLASSOF, "B"),
        _iri("B", RDFS_SUBCLASSOF, "C"),
        _iri("p1", RDFS_DOMAIN, "A"),
        _iri("x", "p1", "y"),
        _iri("u", RDF_TYPE, "A"),
    ]
    delta = [
        _iri("z", "p1", "w"),      # fires rdfs7, rdfs2, then rdfs9 chain
        _iri("v", RDF_TYPE, "B"),  # fires rdfs9
        _iri("x", "p1", "y"),      # duplicate of an existing assertion
        ("z", "p:lbl", "zed", "en", True),  # inert literal triple
    ]
    full = rdfs_entail(_triples(spark, base + delta))
    inc = rdfs_entail_delta(rdfs_entail(_triples(spark, base)), _triples(spark, delta))
    f_rows = sorted(tuple(r) for r in full.collect())
    i_rows = sorted(tuple(r) for r in inc.collect())
    assert f_rows == i_rows  # same SET and same MULTISET (no dupes)
    assert ("z", RDF_TYPE, "C", None, False) in set(i_rows)  # domain->subclass chain


def test_incremental_schema_delta_falls_back(spark):
    """A delta carrying schema triples invalidates the saturated-schema
    shortcut — the operator must still produce the full entailment."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_entail_delta,
    )

    base = [
        _iri("A", RDFS_SUBCLASSOF, "B"),
        _iri("u", RDF_TYPE, "A"),
    ]
    delta = [
        _iri("B", RDFS_SUBCLASSOF, "C"),  # schema change!
    ]
    inc = rdfs_entail_delta(rdfs_entail(_triples(spark, base)), _triples(spark, delta))
    got = {(r.subj, r.pred, r.obj) for r in inc.collect()}
    # u must now be typed C through the EXTENDED hierarchy
    assert ("u", RDF_TYPE, "C") in got
    assert ("A", RDFS_SUBCLASSOF, "C") in got


def test_streaming_entail_matches_batch_rules(spark, tmp_path):
    """streaming_entail over a file stream emits exactly the batch
    delta-rule consequences (stateless stream-static broadcast joins)."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        apply_rules_to_delta,
        rdfs_entail_delta,
        saturated_schema_views,
    )
    from sifr_project_java_ontology_processing_spark.streaming.jobs import (
        streaming_entail,
    )

    schema_rows = [
        _iri("p1", RDFS_SUBPROPERTYOF, "p2"),
        _iri("A", RDFS_SUBCLASSOF, "B"),
        _iri("p1", RDFS_DOMAIN, "A"),
    ]
    schema_graph = rdfs_entail(_triples(spark, schema_rows))
    stream_rows = [
        _iri("x", "p1", "y"),
        _iri("u", RDF_TYPE, "A"),
    ]
    src = str(tmp_path / "tsrc")
    _triples(spark, stream_rows).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .format("parquet")
        .load(src)
    )
    q = (
        streaming_entail(stream, schema_graph)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "tout"))
        .option("checkpointLocation", str(tmp_path / "tckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.subj, r.pred, r.obj)
        for r in spark.read.parquet(str(tmp_path / "tout")).collect()
    }
    sp, sc, dom, rng = saturated_schema_views(schema_graph)
    want = {
        (r.subj, r.pred, r.obj)
        for r in apply_rules_to_delta(
            _triples(spark, stream_rows), sp, sc, dom, rng
        ).collect()
    }
    assert got == want
    # and the consequences are the expected ones
    assert {("x", "p2", "y"), ("x", RDF_TYPE, "A"), ("x", RDF_TYPE, "B"),
            ("u", RDF_TYPE, "B")} <= got


def test_functional_violations(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_FUNCTIONAL,
        OWL_INVERSE_FUNCTIONAL,
        functional_violations,
    )

    rows = [
        _iri("p:ssn", RDF_TYPE, OWL_INVERSE_FUNCTIONAL),
        _iri("p:bp", RDF_TYPE, OWL_FUNCTIONAL),
        # a has two distinct birthplaces -> functional violation
        _iri("a", "p:bp", "city1"),
        _iri("a", "p:bp", "city2"),
        # b is fine (one value, asserted twice)
        _iri("b", "p:bp", "city1"),
        _iri("b", "p:bp", "city1"),
        # two nodes share an SSN value -> inverse-functional violation
        _iri("a", "p:ssn", "v:123"),
        _iri("b", "p:ssn", "v:123"),
        # unique ssn value: fine
        _iri("c", "p:ssn", "v:999"),
        # same lexical obj, different lang = DIFFERENT values
        ("d", "p:bp", "x", "en", True),
        ("d", "p:bp", "x", "fr", True),
        # undeclared property: never flagged
        _iri("a", "p:other", "o1"),
        _iri("a", "p:other", "o2"),
    ]
    out = {
        (r.node, r.pred, r.n_values, r.kind)
        for r in functional_violations(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert out == {
        ("a", "p:bp", 2, "functional"),
        ("d", "p:bp", 2, "functional"),
        ("v:123", "p:ssn", 2, "inverse_functional"),
    }


def test_incremental_meta_schema_delta_falls_back(spark):
    """Review fix: a delta predicate that is a declared SUBPROPERTY of
    rdfs:subClassOf derives schema via rdfs7 — the saturated-schema
    shortcut must detect it and fall back to full entailment."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_entail_delta,
    )

    base = [
        _iri("p:q", RDFS_SUBPROPERTYOF, RDFS_SUBCLASSOF),
        _iri("x", RDF_TYPE, "A"),
    ]
    delta = [_iri("A", "p:q", "B")]  # entails A subClassOf B -> x type B
    inc = rdfs_entail_delta(
        rdfs_entail(_triples(spark, base)), _triples(spark, delta)
    )
    got = {(r.subj, r.pred, r.obj) for r in inc.collect()}
    assert ("A", RDFS_SUBCLASSOF, "B") in got
    assert ("x", RDF_TYPE, "B") in got


def test_rdfs_plus_equivalent_class_and_property(spark):
    """owl:equivalentClass/equivalentProperty — desugared to
    bidirectional sub-axioms (scm-eqc1/eqp1), closed equivalences
    re-derived from mutual subsumption (scm-eqc2/eqp2)."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_EQCLASS,
        OWL_EQPROP,
        rdfs_plus_entail,
    )

    asserted = [
        _iri("A", OWL_EQCLASS, "B"),
        _iri("B", OWL_EQCLASS, "C"),       # chain: transitivity of ≡
        _iri("x", RDF_TYPE, "A"),
        _iri("p", OWL_EQPROP, "q"),
        _iri("s", "p", "o"),
        # mutual subsumption WITHOUT an asserted equivalence (scm-eqc2)
        _iri("M", RDFS_SUBCLASSOF, "N"),
        _iri("N", RDFS_SUBCLASSOF, "M"),
    ]
    out = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_plus_entail(_triples(spark, asserted)).collect()
    }
    # instance typing crosses the equivalence in every direction
    assert {("x", RDF_TYPE, "B"), ("x", RDF_TYPE, "C")} <= out
    # both subClassOf directions materialized
    assert {("A", RDFS_SUBCLASSOF, "B"), ("B", RDFS_SUBCLASSOF, "A"),
            ("A", RDFS_SUBCLASSOF, "C"), ("C", RDFS_SUBCLASSOF, "A")} <= out
    # ≡ symmetry + transitivity via scm-eqc2
    assert {("B", OWL_EQCLASS, "A"), ("A", OWL_EQCLASS, "C"),
            ("C", OWL_EQCLASS, "A")} <= out
    # mutual subsumption alone derives ≡
    assert {("M", OWL_EQCLASS, "N"), ("N", OWL_EQCLASS, "M")} <= out
    # no reflexive A ≡ A noise from the cycle
    assert not any(s == o and p == OWL_EQCLASS for s, p, o in out)
    # property side: assertion carried across ≡ via rdfs7
    assert {("s", "q", "o"), ("q", OWL_EQPROP, "p"),
            ("p", RDFS_SUBPROPERTYOF, "q"), ("q", RDFS_SUBPROPERTYOF, "p")} <= out


def test_rdfs_plus_equivalence_idempotent(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_EQCLASS,
        rdfs_plus_entail,
    )

    asserted = [
        _iri("A", OWL_EQCLASS, "B"),
        _iri("x", RDF_TYPE, "A"),
    ]
    once = rdfs_plus_entail(_triples(spark, asserted))
    rows1 = {(r.subj, r.pred, r.obj) for r in once.collect()}
    twice = rdfs_plus_entail(once.select(*once.columns))
    rows2 = {(r.subj, r.pred, r.obj) for r in twice.collect()}
    assert rows1 == rows2


def test_ifp_entity_resolution(spark):
    """IFP collisions → canonical merge map (prp-ifp as identity merge):
    literal-valued keys merge, components close transitively across
    different values/predicates, non-IFP sharing never merges, and
    oversize collision groups are skipped."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INVERSE_FUNCTIONAL,
        ifp_entity_resolution,
    )

    mbox, isbn, other = "p:mbox", "p:isbn", "p:tag"
    asserted = [
        _iri(mbox, RDF_TYPE, OWL_INVERSE_FUNCTIONAL),
        _iri(isbn, RDF_TYPE, OWL_INVERSE_FUNCTIONAL),
        # literal-valued IFP key shared by a and b
        ("a", mbox, "x@e.org", None, True),
        ("b", mbox, "x@e.org", None, True),
        # b and c share a DIFFERENT key under a different IFP → one
        # component {a, b, c} via transitivity
        ("b", isbn, "978-1", None, True),
        ("c", isbn, "978-1", None, True),
        # duplicate assertion by ONE subject is not a collision
        ("d", mbox, "only@e.org", None, True),
        ("d", mbox, "only@e.org", None, True),
        # sharing under a non-IFP predicate must not merge
        ("e", other, "shared", None, True),
        ("f", other, "shared", None, True),
        # lang/literal-flag are part of value identity: no collision
        ("g", mbox, "same", "en", True),
        ("h", mbox, "same", "fr", True),
    ]
    got = {
        (r["iri"], r["canonical_iri"])
        for r in ifp_entity_resolution(_triples(spark, asserted)).collect()
    }
    assert got == {("b", "a"), ("c", "a")}  # root maps by absence

    # max_group cap: a key shared by 3 subjects is skipped at cap 2
    capped = [
        _iri(mbox, RDF_TYPE, OWL_INVERSE_FUNCTIONAL),
        ("a", mbox, "junk", None, True),
        ("b", mbox, "junk", None, True),
        ("c", mbox, "junk", None, True),
    ]
    out = ifp_entity_resolution(_triples(spark, capped), max_group=2).collect()
    assert out == []


def test_fp_value_merge(spark):
    """include_functional: a functional property asserted twice on one
    subject merges its IRI values (prp-fp); literal double-assertion is
    an inconsistency for the audit, never a merge; cross-family edges
    (IFP + FP) close into one component."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_FUNCTIONAL,
        OWL_INVERSE_FUNCTIONAL,
        ifp_entity_resolution,
    )

    fp, ifp = "p:primary", "p:mbox"
    asserted = [
        _iri(fp, RDF_TYPE, OWL_FUNCTIONAL),
        _iri(ifp, RDF_TYPE, OWL_INVERSE_FUNCTIONAL),
        _iri("x", fp, "A"),
        _iri("x", fp, "B"),                 # prp-fp: A ≡ B
        ("y", fp, "lit1", None, True),
        ("y", fp, "lit2", None, True),      # inconsistency, NOT a merge
        ("B", ifp, "k@e", None, True),
        ("C", ifp, "k@e", None, True),      # IFP: B ≡ C → {A,B,C}
    ]
    got = {
        (r["iri"], r["canonical_iri"])
        for r in ifp_entity_resolution(
            _triples(spark, asserted), include_functional=True
        ).collect()
    }
    assert got == {("B", "A"), ("C", "A")}
    # default (IFP only): just B≡C
    got2 = {
        (r["iri"], r["canonical_iri"])
        for r in ifp_entity_resolution(_triples(spark, asserted)).collect()
    }
    assert got2 == {("C", "B")}


def test_property_chain_axioms(spark):
    """owl:propertyChainAxiom (prp-spo2): hasParent∘hasParent ⇒
    hasGrandparent; a chain whose output feeds ANOTHER chain converges
    in iterated rounds; literals cannot continue a path; idempotent."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_PROPERTY_CHAIN,
        _RDF_FIRST,
        _RDF_NIL,
        _RDF_REST,
        apply_property_chains,
        extract_property_chains,
    )

    P, GP, GGP = "p:hasParent", "p:hasGrandparent", "p:hasGreatGrandparent"

    def _list(pred_chain, base):
        rows = []
        node = _RDF_NIL
        for i, p in enumerate(reversed(pred_chain)):
            nxt = f"_:{base}{len(pred_chain) - i}"
            rows += [
                _iri(nxt, _RDF_FIRST, p),
                _iri(nxt, _RDF_REST, node),
            ]
            node = nxt
        return node, rows

    l1, rows1 = _list([P, P], "gp")
    l2, rows2 = _list([GP, P], "ggp")
    asserted = (
        [_iri(GP, OWL_PROPERTY_CHAIN, l1), _iri(GGP, OWL_PROPERTY_CHAIN, l2)]
        + rows1 + rows2
        + [
            _iri("a", P, "b"),
            _iri("b", P, "c"),
            _iri("c", P, "d"),
            ("x", P, "not-a-node", None, True),  # literal: no continuation
            _iri("y", P, "x"),
        ]
    )
    df = _triples(spark, asserted)
    chains = dict(extract_property_chains(df))
    assert chains == {GP: [P, P], GGP: [GP, P]}

    out = apply_property_chains(df)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert {("a", GP, "c"), ("b", GP, "d")} <= got
    # round 2: GGP from the DERIVED hasGrandparent
    assert ("a", GGP, "d") in got
    # literal objects never chain
    assert not any(s == "y" and p in (GP, GGP) for s, p, o in got)
    # idempotent: re-applying adds nothing
    again = {(r.subj, r.pred, r.obj) for r in apply_property_chains(out).collect()}
    assert again == got

    # malformed list raises
    import pytest as _pytest
    bad = _triples(spark, [
        _iri(GP, OWL_PROPERTY_CHAIN, "_:b1"),
        _iri("_:b1", _RDF_FIRST, P),   # missing rdf:rest
    ])
    with _pytest.raises(ValueError, match="malformed"):
        extract_property_chains(bad)


def test_property_chain_guards(spark):
    """Round-cap overrun raises (not silent truncation); forked list
    nodes raise; literal twin on a chain-output pred does not suppress
    the derived IRI triple."""
    import pytest as _pytest

    from sifr_project_java_ontology_processing_spark.operators.inference import (
        apply_property_chains,
        extract_property_chains,
        OWL_PROPERTY_CHAIN,
        _RDF_FIRST,
        _RDF_REST,
        _RDF_NIL,
    )

    S = [
        _iri("a", "p:r", "n0"),
    ] + [_iri(f"n{i}", "p:p", f"n{i+1}") for i in range(8)]
    df = _triples(spark, S)
    # self-feeding chain r ⊒ r∘p over an 8-hop path: needs 8 rounds
    with _pytest.raises(ValueError, match="fixpoint"):
        apply_property_chains(df, chains=[("p:r", ["p:r", "p:p"])], max_rounds=3)
    out = apply_property_chains(df, chains=[("p:r", ["p:r", "p:p"])], max_rounds=10)
    got = {(r.subj, r.obj) for r in out.where("pred = 'p:r'").collect()}
    assert got == {("a", f"n{i}") for i in range(9)}

    # forked list node raises
    forked = _triples(spark, [
        _iri("p:g", OWL_PROPERTY_CHAIN, "_:n1"),
        _iri("_:n1", _RDF_FIRST, "p:p"),
        _iri("_:n1", _RDF_FIRST, "p:q"),
        _iri("_:n1", _RDF_REST, _RDF_NIL),
    ])
    with _pytest.raises(ValueError, match="forked"):
        extract_property_chains(forked)

    # literal twin: asserted ('x', g, 'z')@literal must not suppress
    # the derived IRI triple ('x', g, <z>)
    lit = _triples(spark, [
        _iri("x", "p:p", "y"),
        _iri("y", "p:p", "z"),
        ("x", "p:g", "z", None, True),
    ])
    out2 = apply_property_chains(lit, chains=[("p:g", ["p:p", "p:p"])])
    rows = [(r.obj_is_literal,) for r in out2.where(
        "subj = 'x' and pred = 'p:g' and obj = 'z'").collect()]
    assert sorted(rows) == [(False,), (True,)]


# ---------------------------------------------------------------------------
# Incremental RDFS-Plus maintenance (round-5 VERDICT ask #4)
# ---------------------------------------------------------------------------

_PLUS_SCHEMA_ROWS = None  # built per test via _plus_fixture


def _plus_fixture(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INVERSEOF,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
    )

    schema = [
        _iri("p:in", RDF_TYPE, OWL_TRANSITIVE),
        _iri("p:in", OWL_INVERSEOF, "p:has"),
        _iri("p:adj", RDF_TYPE, OWL_SYMMETRIC),
        _iri("p:in", RDFS_RANGE, "c:Box"),
        _iri("p:sub_in", RDFS_SUBPROPERTYOF, "p:in"),
    ]
    base = [
        _iri("a", "p:in", "b"),
        _iri("b", "p:in", "c"),
        _iri("x", "p:adj", "y"),
        _iri("q", "p:sub_in", "r"),
    ]
    delta = [
        _iri("c", "p:in", "d"),    # extends the old closure
        _iri("d", "p:in", "e"),    # delta-delta chain (alternating paths)
        _iri("z", "p:adj", "x"),   # symmetric mirror
        _iri("m", "p:sub_in", "a"),  # generalizes INTO the transitive pred
        _iri("e", "p:has", "f"),   # inverse-asserted: mirrors into p:in
    ]
    return schema, base, delta


def test_rdfs_plus_delta_equals_full_recompute(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_plus_entail,
        rdfs_plus_entail_delta,
    )

    schema, base, delta = _plus_fixture(spark)
    full = {
        tuple(r)
        for r in rdfs_plus_entail(_triples(spark, schema + base + delta)).collect()
    }
    e = rdfs_plus_entail(_triples(spark, schema + base))
    inc = {
        tuple(r)
        for r in rdfs_plus_entail_delta(e, _triples(spark, delta)).collect()
    }
    assert inc == full


def test_rdfs_plus_delta_runs_no_full_entailment(spark, monkeypatch):
    """Scale gate: an instance-only delta touching transitive/inverse/
    symmetric properties must stay on the incremental path — no full
    rdfs_plus_entail call, and the closure job sees only delta-incident
    bridged pairs, never the old fact stream."""
    from sifr_project_java_ontology_processing_spark.operators import inference

    schema, base, delta = _plus_fixture(spark)
    e = inference.rdfs_plus_entail(_triples(spark, schema + base))
    e = e.localCheckpoint(eager=True)  # freeze: fixture built pre-patch

    def _boom(*a, **k):
        raise AssertionError("full rdfs_plus_entail called on the delta path")

    closure_inputs = []
    real_closure = inference.transitive_closure

    def _spy_closure(edges, **kw):
        closure_inputs.append(edges.count())
        return real_closure(edges, **kw)

    monkeypatch.setattr(inference, "rdfs_plus_entail", _boom)
    monkeypatch.setattr(inference, "transitive_closure", _spy_closure)
    out = inference.rdfs_plus_entail_delta(e, _triples(spark, delta))
    n = out.count()
    assert n > 0
    # bridged pairs: delta edges extended through the (tiny) old
    # closure — far below the old graph's closure-pair count; the
    # fixture's full graph has >25 triples, bridged must stay ~delta²
    assert closure_inputs and all(c <= 20 for c in closure_inputs)


def test_rdfs_plus_delta_schema_delta_falls_back(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_TRANSITIVE,
        rdfs_plus_entail,
        rdfs_plus_entail_delta,
    )

    schema, base, delta = _plus_fixture(spark)
    e = rdfs_plus_entail(_triples(spark, schema + base))
    schema_delta = delta + [_iri("p:new", RDF_TYPE, OWL_TRANSITIVE)]
    full = {
        tuple(r)
        for r in rdfs_plus_entail(
            _triples(spark, schema + base + schema_delta)
        ).collect()
    }
    inc = {
        tuple(r)
        for r in rdfs_plus_entail_delta(
            e, _triples(spark, schema_delta)
        ).collect()
    }
    assert inc == full


def test_rdfs_plus_delta_idempotent_on_duplicate_delta(spark):
    """Replaying a delta already present in the saturated graph adds
    nothing (exactly-once friendliness for restarted batches)."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_plus_entail,
        rdfs_plus_entail_delta,
    )

    schema, base, delta = _plus_fixture(spark)
    full_df = rdfs_plus_entail(_triples(spark, schema + base + delta))
    full = {tuple(r) for r in full_df.collect()}
    again = {
        tuple(r)
        for r in rdfs_plus_entail_delta(full_df, _triples(spark, delta)).collect()
    }
    assert again == full


# ---------------------------------------------------------------------------
# round 5: owl:sameAs consolidation
# ---------------------------------------------------------------------------


def test_sameas_consolidation_chain_predicates_and_literals(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_SAMEAS,
        sameas_consolidate,
        sameas_mapping,
    )

    sch = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean"
    )
    t = spark.createDataFrame(
        [
            ("a", OWL_SAMEAS, "b", None, False),
            ("b", OWL_SAMEAS, "c", None, False),  # chain → {a,b,c}, canon a
            ("c", "p", "x", None, False),
            ("x", "q", "b", None, False),
            ("z", OWL_SAMEAS, "lit", None, True),  # literal endpoint: ignored
            ("z", "p", "z", None, False),  # asserted self-loop survives
            ("p1", OWL_SAMEAS, "p2", None, False),  # predicate identity
            ("s", "p2", "o", None, False),  # eq-rep-p rewrite → p1
            # a fact BETWEEN two merged entities: must survive as the
            # entailed self-loop (a knows a), not vanish in the merge
            ("a", "knows", "b", None, False),
        ],
        sch,
    )
    m = {r["iri"]: r["canonical_iri"] for r in sameas_mapping(t).collect()}
    assert m == {"b": "a", "c": "a", "p2": "p1"}
    out = {
        (r["subj"], r["pred"], r["obj"])
        for r in sameas_consolidate(t).collect()
    }
    assert out == {
        ("a", "p", "x"),
        ("x", "q", "a"),
        ("z", "p", "z"),
        ("s", "p1", "o"),
        ("a", "knows", "a"),
    }


def test_sameas_consolidation_collapses_duplicates_once(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_SAMEAS,
        sameas_consolidate,
    )

    sch = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean"
    )
    t = spark.createDataFrame(
        [
            ("a", OWL_SAMEAS, "b", None, False),
            ("a", "p", "v", None, True),
            ("b", "p", "v", None, True),  # merges onto the same row
        ],
        sch,
    )
    rows = sameas_consolidate(t).collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in rows] == [("a", "p", "v")]
    # dedup=False keeps both (caller owns the downstream distinct)
    assert sameas_consolidate(t, dedup=False).count() == 2


# ---------------------------------------------------------------------------
# round 5: OWL RL restriction-class rules
# ---------------------------------------------------------------------------


def _restr(spark, rows):
    sch = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean"
    )
    return spark.createDataFrame(rows, sch)


def test_restrictions_hasvalue_both_directions(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_HASVALUE,
        OWL_ONPROPERTY,
        RDF_TYPE,
        restrictions_entail,
    )

    t = _restr(
        spark,
        [
            ("C", OWL_HASVALUE, "red", "en", True),
            ("C", OWL_ONPROPERTY, "color", None, False),
            ("x", RDF_TYPE, "C", None, False),     # hv1 → x color "red"@en
            ("y", "color", "red", "en", True),     # hv2 → y type C
            ("z", "color", "red", "fr", True),     # wrong lang: no typing
        ],
    )
    out = {
        (r["subj"], r["pred"], r["obj"], r["obj_lang"])
        for r in restrictions_entail(t).collect()
    }
    assert ("x", "color", "red", "en") in out
    assert ("y", RDF_TYPE, "C", None) in out
    assert ("z", RDF_TYPE, "C", None) not in out


def test_restrictions_svf_avf_and_chaining(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_ALLVALUES,
        OWL_ONPROPERTY,
        OWL_SOMEVALUES,
        OWL_THING,
        RDF_TYPE,
        restrictions_entail,
    )

    t = _restr(
        spark,
        [
            # AVF: members of A have all p-values in D
            ("A", OWL_ALLVALUES, "D", None, False),
            ("A", OWL_ONPROPERTY, "p", None, False),
            # SVF: something with a p-value in D is an S
            ("S", OWL_SOMEVALUES, "D", None, False),
            ("S", OWL_ONPROPERTY, "p", None, False),
            # SVF Thing: anything with a q-value is a Q
            ("Q", OWL_SOMEVALUES, OWL_THING, None, False),
            ("Q", OWL_ONPROPERTY, "q", None, False),
            ("a", RDF_TYPE, "A", None, False),
            ("a", "p", "b", None, False),   # avf → b type D; then svf1 → a type S (2 rounds)
            ("a", "p", "lit", None, True),  # literal object: never typed
            ("w", "q", "anything", None, False),  # svf2 → w type Q
        ],
    )
    res = restrictions_entail(t)
    out = {(r["subj"], r["pred"], r["obj"]) for r in res.collect()}
    assert ("b", RDF_TYPE, "D") in out          # cls-avf
    assert ("a", RDF_TYPE, "S") in out          # cls-svf1 via the avf-derived type
    assert ("w", RDF_TYPE, "Q") in out          # cls-svf2 (owl:Thing)
    assert ("lit", RDF_TYPE, "D") not in out
    # idempotent: re-entailing adds nothing
    assert restrictions_entail(res).count() == res.count()


def test_restrictions_no_axioms_is_identity(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        restrictions_entail,
    )

    t = _restr(spark, [("a", "p", "b", None, False)])
    assert restrictions_entail(t).count() == 1


# ---------------------------------------------------------------------------
# OWL RL boolean class expressions (class_expressions_entail)
# ---------------------------------------------------------------------------

_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"


def _rdf_list(prefix, members):
    """rows for an rdf:first/rdf:rest chain; members = [(obj, lang, lit)]."""
    rows = []
    for i, (m, lang, lit) in enumerate(members):
        node = f"{prefix}{i}"
        nxt = f"{prefix}{i + 1}" if i + 1 < len(members) else _NIL
        rows.append((node, _FIRST, m, lang, lit))
        rows.append((node, _REST, nxt, None, False))
    return rows


def test_class_expressions_full_rule_set(spark):
    """int1/int2/uni/oo plus scm-int/scm-uni, with REAL chaining:
    z typed C1 unfolds to A,B (int2), A lifts to C2 (uni), and
    C2∧B completes C3 (int1) — three semi-naive rounds."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INTERSECTION,
        OWL_ONEOF,
        OWL_UNION,
        class_expressions_entail,
    )

    rows = [
        _iri("C1", OWL_INTERSECTION, "_:i0"),
        *_rdf_list("_:i", [("A", None, False), ("B", None, False)]),
        _iri("C2", OWL_UNION, "_:u0"),
        *_rdf_list("_:u", [("A", None, False), ("E", None, False)]),
        _iri("C3", OWL_INTERSECTION, "_:j0"),
        *_rdf_list("_:j", [("C2", None, False), ("B", None, False)]),
        _iri("C4", OWL_ONEOF, "_:o0"),
        *_rdf_list("_:o", [("n1", None, False), ("v", None, True)]),
        _iri("x", RDF_TYPE, "A"),
        _iri("x", RDF_TYPE, "B"),
        _iri("y", RDF_TYPE, "E"),
        _iri("z", RDF_TYPE, "C1"),
    ]
    res = class_expressions_entail(_triples(spark, rows))
    types = {
        (r["subj"], r["obj"])
        for r in res.where(f"pred = '{RDF_TYPE}'").collect()
    }
    subs = {
        (r["subj"], r["obj"])
        for r in res.where(f"pred = '{RDFS_SUBCLASSOF}'").collect()
    }
    # cls-int1 + cls-uni on asserted typings
    assert ("x", "C1") in types and ("x", "C2") in types
    # chained: x's C2 (derived) + B completes C3
    assert ("x", "C3") in types
    # partial conjunction never fires
    assert ("y", "C2") in types
    assert ("y", "C1") not in types and ("y", "C3") not in types
    # cls-int2 unfold, then re-lift through uni and int1
    assert {("z", "A"), ("z", "B"), ("z", "C2"), ("z", "C3")} <= types
    # cls-oo: IRI member typed, literal member skipped
    assert ("n1", "C4") in types
    assert ("v", "C4") not in types
    # scm-int / scm-uni schema triples
    assert {("C1", "A"), ("C1", "B"), ("A", "C2"), ("E", "C2")} <= subs
    # idempotent
    assert class_expressions_entail(res).count() == res.count()


def test_class_expressions_guards(spark):
    """Literal members of intersection/union raise; empty intersection
    raises; no axioms = identity; forked/cyclic lists raise through the
    shared walker."""
    import pytest as _pytest

    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INTERSECTION,
        OWL_UNION,
        class_expressions_entail,
    )

    plain = _triples(spark, [_iri("a", "p", "b")])
    assert class_expressions_entail(plain).count() == 1

    lit_member = _triples(
        spark,
        [
            _iri("C", OWL_UNION, "_:l0"),
            *_rdf_list("_:l", [("oops", None, True)]),
        ],
    )
    with _pytest.raises(ValueError, match="literal list member"):
        class_expressions_entail(lit_member)

    empty_int = _triples(
        spark,
        [
            _iri("C", OWL_INTERSECTION, _NIL),
            _iri("x", RDF_TYPE, "A"),
        ],
    )
    with _pytest.raises(ValueError, match="empty list"):
        class_expressions_entail(empty_int)

    cyclic = _triples(
        spark,
        [
            _iri("C", OWL_INTERSECTION, "_:c0"),
            ("_:c0", _FIRST, "A", None, False),
            _iri("_:c0", _REST, "_:c0"),
        ],
    )
    with _pytest.raises(ValueError, match="cycle"):
        class_expressions_entail(cyclic)


def test_class_expressions_duplicate_member_count(spark):
    """A DUPLICATED member in an intersection list must not inflate the
    required conjunct count: C = A ∧ A ∧ B is satisfied by {A, B}."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INTERSECTION,
        class_expressions_entail,
    )

    rows = [
        _iri("C", OWL_INTERSECTION, "_:d0"),
        *_rdf_list(
            "_:d",
            [("A", None, False), ("A", None, False), ("B", None, False)],
        ),
        _iri("x", RDF_TYPE, "A"),
        _iri("x", RDF_TYPE, "B"),
    ]
    res = class_expressions_entail(_triples(spark, rows))
    types = {
        (r["subj"], r["obj"])
        for r in res.where(f"pred = '{RDF_TYPE}'").collect()
    }
    assert ("x", "C") in types


def test_class_expressions_multiple_axioms_same_class(spark):
    """Two intersection axioms on ONE class stay independent
    conjunctions (members must not pool): C = A∧B and C = D —
    x:{D} satisfies the second alone; y:{A} satisfies neither."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INTERSECTION,
        class_expressions_entail,
    )

    rows = [
        _iri("C", OWL_INTERSECTION, "_:a0"),
        *_rdf_list("_:a", [("A", None, False), ("B", None, False)]),
        _iri("C", OWL_INTERSECTION, "_:b0"),
        *_rdf_list("_:b", [("D", None, False)]),
        _iri("x", RDF_TYPE, "D"),
        _iri("y", RDF_TYPE, "A"),
    ]
    res = class_expressions_entail(_triples(spark, rows))
    types = {
        (r["subj"], r["obj"])
        for r in res.where(f"pred = '{RDF_TYPE}'").collect()
    }
    assert ("x", "C") in types
    assert ("y", "C") not in types


def test_consistency_violations_all_rules(spark):
    """Every OWL RL "false" rule fires exactly on its planted
    inconsistency and nowhere else; symmetric pairs report once."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_ASYMMETRIC,
        OWL_DIFFERENTFROM,
        OWL_DISJOINTWITH,
        OWL_IRREFLEXIVE,
        OWL_NOTHING,
        OWL_NPA_PROP,
        OWL_NPA_SOURCE,
        OWL_NPA_TARGET,
        OWL_NPA_VALUE,
        OWL_PROPDISJOINTWITH,
        OWL_SAMEAS,
        consistency_violations,
    )

    rows = [
        # cax-dw (axiom asserted in BOTH directions -> still one row)
        _iri("C1", OWL_DISJOINTWITH, "C2"),
        _iri("C2", OWL_DISJOINTWITH, "C1"),
        _iri("x1", RDF_TYPE, "C1"),
        _iri("x1", RDF_TYPE, "C2"),
        _iri("x2", RDF_TYPE, "C1"),  # only one side: fine
        # prp-irp
        _iri("pIr", RDF_TYPE, OWL_IRREFLEXIVE),
        _iri("a", "pIr", "a"),
        _iri("a", "pIr", "b"),  # fine
        _iri("c", "pUn", "c"),  # undeclared: fine
        # prp-asyp (mutual pair reported once, normalized)
        _iri("pAs", RDF_TYPE, OWL_ASYMMETRIC),
        _iri("n", "pAs", "m"),
        _iri("m", "pAs", "n"),
        _iri("m", "pAs", "q"),  # one-way: fine
        # prp-pdw
        _iri("p1", OWL_PROPDISJOINTWITH, "p2"),
        _iri("s", "p1", "o"),
        _iri("s", "p2", "o"),
        _iri("s", "p2", "o2"),  # different object: fine
        ("s2", "p1", "lv", None, True),  # literal twins violate too
        ("s2", "p2", "lv", None, True),
        ("s3", "p1", "lv", "en", True),  # lang differs from plain:
        ("s3", "p2", "lv", "fr", True),  # DIFFERENT values, fine
        # eq-diff1 (stated in opposite orders)
        _iri("u", OWL_SAMEAS, "v"),
        _iri("v", OWL_DIFFERENTFROM, "u"),
        _iri("u", OWL_SAMEAS, "w"),  # no differentFrom: fine
        # cls-nothing2
        _iri("z", RDF_TYPE, OWL_NOTHING),
        # prp-npa1 violated, npa2 violated, third NPA holds vacuously
        _iri("_:n1", OWL_NPA_SOURCE, "i"),
        _iri("_:n1", OWL_NPA_PROP, "pN"),
        _iri("_:n1", OWL_NPA_TARGET, "j"),
        _iri("i", "pN", "j"),
        _iri("_:n2", OWL_NPA_SOURCE, "i"),
        _iri("_:n2", OWL_NPA_PROP, "pV"),
        ("_:n2", OWL_NPA_VALUE, "42", None, True),
        ("i", "pV", "42", None, True),
        _iri("_:n3", OWL_NPA_SOURCE, "i"),
        _iri("_:n3", OWL_NPA_PROP, "pN"),
        _iri("_:n3", OWL_NPA_TARGET, "nope"),
        # npa2 with a matching lexical form but an IRI object: no hit
        _iri("_:n4", OWL_NPA_SOURCE, "i"),
        _iri("_:n4", OWL_NPA_PROP, "pW"),
        ("_:n4", OWL_NPA_VALUE, "53", None, True),
        _iri("i", "pW", "53"),
    ]
    out = {
        (r.rule, r.subj, r.pred, r.obj)
        for r in consistency_violations(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert out == {
        ("cax-dw", "x1", "C1", "C2"),
        ("prp-irp", "a", "pIr", "a"),
        ("prp-asyp", "m", "pAs", "n"),
        ("prp-pdw", "s", "p1|p2", "o"),
        ("prp-pdw", "s2", "p1|p2", "lv"),
        ("eq-diff1", "u", OWL_SAMEAS, "v"),
        ("cls-nothing2", "z", RDF_TYPE, OWL_NOTHING),
        ("prp-npa1", "i", "pN", "j"),
        ("prp-npa2", "i", "pV", "42"),
    }


def test_consistency_violations_clean_graph_empty(spark):
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_DISJOINTWITH,
        consistency_violations,
    )

    rows = [
        _iri("C1", OWL_DISJOINTWITH, "C2"),
        _iri("x", RDF_TYPE, "C1"),
        _iri("y", RDF_TYPE, "C2"),
        _iri("x", "p", "y"),
    ]
    assert (
        consistency_violations(spark.createDataFrame(rows, SCHEMA)).count() == 0
    )
