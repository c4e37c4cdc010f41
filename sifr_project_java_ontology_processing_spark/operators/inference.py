"""RDFS entailment materialization over a triples DataFrame.

The reference processes SKOS/OWL ontologies with Jena, whose
``InfModel``/reasoner registry (the ``ModelFactory.createRDFSModel``
path Jena ships next to the plain ``createDefaultModel`` used at
OntologyLoader.java:31) materializes RDFS consequences; downstream the
reference hand-codes the 2-hop subclass walk (OntologyCUIProcessor
mapping cascade, J3).  This module is the distributed twin: one batch
operator that materializes the standard ρdf / RDFS-subset rules over a
``(subj, pred, obj, obj_lang, obj_is_literal)`` frame.

Rules (names per the RDFS semantics REC):

* rdfs5  — ``subPropertyOf`` transitivity
* rdfs7  — ``(x P y) ∧ (P subPropertyOf+ Q) ⇒ (x Q y)``
* rdfs11 — ``subClassOf`` transitivity
* rdfs9  — ``(x type C) ∧ (C subClassOf+ D) ⇒ (x type D)``
* rdfs2  — ``(P domain C) ∧ (x P y) ⇒ (x type C)``
* rdfs3  — ``(P range C) ∧ (x P y) ∧ y is IRI ⇒ (y type C)``

Scale design — the WebPIE insight (Urbani et al., "OWL reasoning with
WebPIE", ESWC 2010): schema triples are tiny relative to instance
triples, so the right plan closes the SCHEMA (transitively) first and
then applies every instance rule as a map-side BROADCAST join against
the closed schema — the 100 TB instance stream is scanned, never
shuffled, until the single final ``distinct``.  The schema closures
reuse ``graph.transitive_closure`` (frontier BFS, per-level
anti-join), so a pathological million-edge ontology still closes
distributedly before the broadcast.

Stratification: rules are applied in the order rdfs5 → rdfs7 →
(rdfs11 | rdfs2 | rdfs3) → rdfs9, with the subclass closure extracted
AFTER rdfs7 (so ``subClassOf`` edges asserted via a subproperty of
``rdfs:subClassOf`` are seen).  This is fixpoint-complete for graphs
whose schema is not itself derived by domain/range rules (the standard
stratified-materialization assumption; a ``rdfs:domain`` triple about
``rdf:type`` would need another round — such graphs are rejected
nowhere but simply entailed one stratum deep, as in every production
materializer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.uris import expand
from .graph import transitive_closure

RDF_TYPE = expand("rdf:type")
RDFS_SUBCLASSOF = expand("rdfs:subClassOf")
RDFS_SUBPROPERTYOF = expand("rdfs:subPropertyOf")
RDFS_DOMAIN = expand("rdfs:domain")
RDFS_RANGE = expand("rdfs:range")

_TRIPLE_COLS = ["subj", "pred", "obj", "obj_lang", "obj_is_literal"]


def _as_type_triple(subj_col, cls_col) -> list:
    return [
        subj_col.alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        cls_col.alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(False).alias("obj_is_literal"),
    ]


_DRIVER_CLOSURE_MAX = 65_536  # schema edge count below which the
# closure runs driver-side (same hybrid pattern as
# canonicalize.connected_components' driver_threshold: a schema is a
# DIMENSION — collecting it is the same cost class as broadcasting it,
# and the driver loop replaces ~4 Spark jobs per BFS level)


def _schema_closure(triples: DataFrame, pred_iri: str, *, max_depth: int) -> DataFrame:
    """Transitive closure of one schema predicate as (sub, sup) pairs
    (closure depth collapsed — consumers only need reachability).

    Hybrid: schemas up to ``_DRIVER_CLOSURE_MAX`` edges close in a
    driver-side frontier loop (output-bounded: each round extends the
    known pair set by one hop, cycle-safe); a pathological larger
    ontology falls back to the distributed frontier BFS."""
    edges = (
        triples.where((F.col("pred") == pred_iri) & ~F.col("obj_is_literal"))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    sample = edges.limit(_DRIVER_CLOSURE_MAX + 1).collect()
    if len(sample) <= _DRIVER_CLOSURE_MAX:
        adj: dict[str, list[str]] = {}
        for r in sample:
            adj.setdefault(r["src"], []).append(r["dst"])
        paths: set[tuple[str, str]] = {(r["src"], r["dst"]) for r in sample}
        frontier = set(paths)
        for _ in range(1, max_depth):
            # derived self-pairs (a, a) stay: a subClassOf cycle
            # A ⊑ B ⊑ A entails A ⊑ A, matching the distributed twin
            new = {
                (a, c)
                for a, b in frontier
                for c in adj.get(b, ())
                if (a, c) not in paths
            }
            if not new:
                break
            paths |= new
            frontier = new
        spark = triples.sparkSession
        if not paths:
            return spark.createDataFrame([], "_sub string, _sup string")
        return spark.createDataFrame(
            sorted(paths), "_sub string, _sup string"
        )
    closed = transitive_closure(edges, max_depth=max_depth, partitions=8)
    return closed.select(
        F.col("src").alias("_sub"), F.col("dst").alias("_sup")
    ).distinct()


def rdfs_entail(
    triples: DataFrame,
    *,
    max_schema_depth: int = 20,
    materialize_strata: bool = True,
    _sp: DataFrame | None = None,
) -> DataFrame:
    """Materialize the RDFS consequences of ``triples`` and return the
    ENTAILED graph (asserted ∪ inferred, distinct) in the same
    5-column triple schema.

    rdfs7 copies the object TERM verbatim (lexical form, lang tag,
    literal flag — ``"Hello"@en`` generalized under a superproperty is
    still ``"Hello"@en``); rdfs2/3/9 emit IRI-object ``rdf:type``
    triples with NULL lang. ``_sp`` (internal) supplies a precomputed
    subPropertyOf closure so ``rdfs_plus_entail`` does not re-run the
    closure job chain.
    ``max_schema_depth`` bounds the subclass/subproperty closure depth
    (a deeper real hierarchy simply needs a larger bound; the closure
    loop stops at the ACTUAL hierarchy depth, so a generous bound
    costs nothing).
    """
    t = triples.select(*_TRIPLE_COLS)

    def _schema_triples(closed: DataFrame, pred_iri: str) -> DataFrame:
        # rdfs5/rdfs11 also ENTAIL the closed schema pairs as triples
        return closed.select(
            F.col("_sub").alias("subj"),
            F.lit(pred_iri).alias("pred"),
            F.col("_sup").alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )

    # --- stratum 1: property hierarchy (rdfs5 closure + rdfs7) -----------
    sp = (
        _sp
        if _sp is not None
        else _schema_closure(t, RDFS_SUBPROPERTYOF, max_depth=max_schema_depth)
    )
    derived7 = (
        t.join(F.broadcast(sp), t["pred"] == sp["_sub"])
        .select(
            F.col("subj"),
            F.col("_sup").alias("pred"),
            F.col("obj"),
            # the object TERM is copied verbatim — lang tag included
            # ("Hello"@en under Q is still "Hello"@en, not "Hello")
            F.col("obj_lang"),
            F.col("obj_is_literal"),
        )
    )
    g1 = t.unionByName(derived7).unionByName(
        _schema_triples(sp, RDFS_SUBPROPERTYOF)
    )
    if materialize_strata:
        # each stratum frame has SEVERAL consumers (the next stratum's
        # union branch plus every rule join probing it) — a lazy
        # checkpoint evaluates it once instead of re-deriving the
        # whole subtree per consumer. At fact scale where
        # materializing the stream is worse than re-scanning the
        # (pushdown-pruned) source, pass materialize_strata=False.
        g1 = g1.localCheckpoint(eager=False)

    # --- stratum 2: class hierarchy + domain/range -----------------------
    # ONE schema-dim-sized slice feeds the subClassOf closure AND the
    # domain/range dimensions: without it each build is its own full
    # scan of the (fact-scale) g1 stream — three passes where one
    # suffices (guide §2.3 "shuffle/scan fewer bytes"). The slice is a
    # lazy localCheckpoint: the sc closure's collect materializes it,
    # dom/rng then read the tiny materialized frame.
    schema_slice = (
        g1.where(
            F.col("pred").isin(RDFS_SUBCLASSOF, RDFS_DOMAIN, RDFS_RANGE)
            & ~F.col("obj_is_literal")
        )
        .select(*_TRIPLE_COLS)
        .localCheckpoint(eager=False)
    )
    sc = _schema_closure(schema_slice, RDFS_SUBCLASSOF, max_depth=max_schema_depth)
    dom = (
        schema_slice.where(F.col("pred") == RDFS_DOMAIN)
        .select(F.col("subj").alias("_p"), F.col("obj").alias("_c"))
        .distinct()
    )
    rng = (
        schema_slice.where(F.col("pred") == RDFS_RANGE)
        .select(F.col("subj").alias("_p"), F.col("obj").alias("_c"))
        .distinct()
    )
    derived2 = g1.join(F.broadcast(dom), g1["pred"] == dom["_p"]).select(
        *_as_type_triple(F.col("subj"), F.col("_c"))
    )
    derived3 = (
        g1.where(~F.col("obj_is_literal"))
        .join(F.broadcast(rng), g1["pred"] == rng["_p"])
        .select(*_as_type_triple(F.col("obj"), F.col("_c")))
    )
    g2 = (
        g1.unionByName(derived2)
        .unionByName(derived3)
        .unionByName(_schema_triples(sc, RDFS_SUBCLASSOF))
    )
    if materialize_strata:
        g2 = g2.localCheckpoint(eager=False)

    # --- stratum 3: type inheritance (rdfs9) -----------------------------
    types = g2.where(F.col("pred") == RDF_TYPE)
    derived9 = types.join(F.broadcast(sc), types["obj"] == sc["_sub"]).select(
        *_as_type_triple(F.col("subj"), F.col("_sup"))
    )
    return g2.unionByName(derived9).distinct()


def skos_audit(
    triples: DataFrame,
    *,
    max_depth: int = 50,
) -> DataFrame:
    """SKOS integrity audit: one row per (concept, issue) for the
    vocabulary-quality checks the SKOS reference ("SKOS Simple
    Knowledge Organization System Reference", W3C REC, §integrity
    conditions) and the reference's own cleaning passes care about
    (the reference's ChangeNote/prefLabel repair stages —
    SKOSGenerator.java — fix exactly these by hand):

    * ``missing_preflabel``   — a typed ``skos:Concept`` with no
      ``skos:prefLabel`` at all
    * ``multiple_preflabel``  — >1 ``skos:prefLabel`` in one language
      (S14 violation); NULL-lang labels count as one language bucket
    * ``broader_cycle``       — the concept lies on a ``skos:broader``
      cycle (detected via the depth-bounded reachability closure:
      ``c broader+ c``)
    * ``orphan_concept``      — a typed concept with no ``broader``,
      ``narrower``, or ``inScheme`` link in either direction

    Scale shape: every check is a partial-agg or (anti-)semi-join over
    the predicate-filtered slices; the cycle check reuses the
    broadcast-friendly closure.  Output: (concept, issue) distinct.
    """
    skos = "http://www.w3.org/2004/02/skos/core#"
    C, PL, BR, NW, IS = (
        skos + "Concept",
        skos + "prefLabel",
        skos + "broader",
        skos + "narrower",
        skos + "inScheme",
    )
    t = triples.select(*_TRIPLE_COLS)
    concepts = (
        t.where((F.col("pred") == RDF_TYPE) & (F.col("obj") == C))
        .select(F.col("subj").alias("concept"))
        .distinct()
    )

    pls = (
        t.where(F.col("pred") == PL)
        .select(
            F.col("subj").alias("concept"),
            F.col("obj_lang").alias("_lang"),
            F.col("obj").alias("_val"),
        )
        .distinct()  # S14 is about distinct VALUES per language
    )
    missing = concepts.join(pls, "concept", "left_anti").select(
        "concept", F.lit("missing_preflabel").alias("issue")
    )
    multi = (
        pls.groupBy("concept", "_lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .join(concepts, "concept", "left_semi")
        .select("concept", F.lit("multiple_preflabel").alias("issue"))
        .distinct()
    )

    br = (
        t.where(F.col("pred") == BR)
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )
    closed = transitive_closure(
        br.where(F.col("src") != F.col("dst")), max_depth=max_depth, partitions=8
    )
    on_cycle = (
        closed.where(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("concept"))
        .unionByName(
            br.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias("concept")
            )
        )
        .distinct()
        .join(concepts, "concept", "left_semi")
        .select("concept", F.lit("broader_cycle").alias("issue"))
    )

    linked = (
        t.where(F.col("pred").isin(BR, NW, IS))
        .select(F.col("subj").alias("concept"))
        .unionByName(
            t.where((F.col("pred").isin(BR, NW)) & ~F.col("obj_is_literal")).select(
                F.col("obj").alias("concept")
            )
        )
        .distinct()
    )
    orphan = concepts.join(linked, "concept", "left_anti").select(
        "concept", F.lit("orphan_concept").alias("issue")
    )

    return missing.unionByName(multi).unionByName(on_cycle).unionByName(orphan)


OWL_INVERSEOF = expand("owl:inverseOf")
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"
OWL_EQCLASS = "http://www.w3.org/2002/07/owl#equivalentClass"
OWL_EQPROP = "http://www.w3.org/2002/07/owl#equivalentProperty"
_PSEP = "\x00"  # joins pred onto node ids for the pooled closure


def _expand_inv_sym(
    g: DataFrame, inv_both: DataFrame, sym: DataFrame
) -> DataFrame:
    """owl:inverseOf / owl:SymmetricProperty expansion of a fact frame
    against broadcast property dimensions: (x P y) with (P inv Q) adds
    (y Q x); (x P y) with P symmetric adds (y P x). Literal-object
    assertions never mirror (their inverses are not valid RDF)."""
    iri_asserts = g.where(~F.col("obj_is_literal"))
    derived_inv = iri_asserts.join(
        F.broadcast(inv_both), iri_asserts["pred"] == inv_both["_p"]
    ).select(
        F.col("obj").alias("subj"),
        F.col("_q").alias("pred"),
        F.col("subj").alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(False).alias("obj_is_literal"),
    )
    derived_sym = iri_asserts.join(
        F.broadcast(sym), iri_asserts["pred"] == sym["_p"]
    ).select(
        F.col("obj").alias("subj"),
        F.col("pred"),
        F.col("subj").alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(False).alias("obj_is_literal"),
    )
    return g.unionByName(derived_inv).unionByName(derived_sym)


def rdfs_plus_entail(
    triples: DataFrame,
    *,
    max_schema_depth: int = 20,
    max_transitive_depth: int = 20,
    materialize_strata: bool = True,
) -> DataFrame:
    """RDFS-Plus materialization: the full ``rdfs_entail`` rule set
    plus the three OWL property characteristics every production
    RDFS-Plus store (Jena's OWLMicroReasoner tier, the AllegroGraph
    "RDFS++" profile) materializes:

    * ``owl:inverseOf``            — ``(P inv Q) ∧ (x P y) ⇒ (y Q x)``
      (and symmetrically for Q, since inverseOf is its own inverse)
    * ``owl:SymmetricProperty``    — ``(x P y) ⇒ (y P x)``
    * ``owl:TransitiveProperty``   — ``(x P y) ∧ (y P z) ⇒ (x P z)``
    * ``owl:equivalentClass``      — desugared to BIDIRECTIONAL
      ``rdfs:subClassOf`` up front (OWL RL scm-eqc1), so the existing
      rdfs11/rdfs9 machinery yields instance typing across the
      equivalence; closed equivalences are re-derived at the end from
      mutual subsumption (scm-eqc2: ``A⊑B ∧ B⊑A ⇒ A≡B``), which also
      covers symmetry and transitivity of ≡. Reflexive ``A≡A`` pairs
      (every cycle member subsumes itself through the cycle) are
      filtered — they carry no information.
    * ``owl:equivalentProperty``   — same treatment via
      ``rdfs:subPropertyOf`` (scm-eqp1 / scm-eqp2).

    ``owl:sameAs`` is deliberately NOT expanded here: identity-merge
    is the canonicalization stage's job
    (operators/canonicalize.py::connected_components — rewriting to a
    canonical IRI beats materializing the O(n²) sameAs clique).

    Stratification (extends rdfs_entail's): property-hierarchy
    generalization (rdfs5/7) → inverse/symmetric expansion →
    transitive closure → inverse/symmetric AGAIN → class rules
    (rdfs11/2/3/9, applied by the inner ``rdfs_entail`` over the
    expanded graph).  Inverse/symmetric run BEFORE the closure so a
    symmetric transitive property closes over both directions, and
    once more AFTER it so the inverse of a transitive property mirrors
    the closure pairs; class rules run last so domain/range see every
    derived assertion.

    Scale shape: inverse/symmetric are broadcast-join /
    map-side-union expansions of the instance stream.  The transitive
    closure pools EVERY transitive predicate into ONE distributed
    frontier-BFS run by fusing the predicate into the node key
    (``pred\\x00node``) — paths cannot cross predicates because the
    join key carries the predicate, and one closure job replaces P
    sequential ones.  Literal-object assertions never enter inverse /
    transitive expansion (their inverses/compositions are not valid
    RDF)."""
    t = triples.select(*_TRIPLE_COLS)

    # stratum 0: equivalence desugaring (scm-eqc1 / scm-eqp1). Must run
    # BEFORE the subPropertyOf closure so equivalence-derived
    # subPropertyOf edges participate in it. Equivalence assertions are
    # schema-dim-sized.
    def _eq_to_sub(eq_pred: str, sub_pred: str) -> DataFrame:
        pairs = (
            t.where((F.col("pred") == eq_pred) & ~F.col("obj_is_literal"))
            .select("subj", "obj")
            .distinct()
        )
        fwd = pairs.select(
            "subj",
            F.lit(sub_pred).alias("pred"),
            "obj",
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )
        rev = pairs.select(
            F.col("obj").alias("subj"),
            F.lit(sub_pred).alias("pred"),
            F.col("subj").alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )
        return fwd.unionByName(rev)

    # no distinct here: a desugared sub-axiom duplicating an asserted
    # one is collapsed by the final rdfs_entail distinct; a fact-scale
    # shuffle just to dedupe schema-sized additions would be waste
    t = t.unionByName(_eq_to_sub(OWL_EQCLASS, RDFS_SUBCLASSOF)).unionByName(
        _eq_to_sub(OWL_EQPROP, RDFS_SUBPROPERTYOF)
    )
    if materialize_strata:
        # t is evaluated by the subPropertyOf closure probe AND again
        # when g1 materializes; when the input arrives as a live plan
        # (joins/unions upstream) each evaluation re-runs it. One lazy
        # checkpoint; the g1 checkpoint below then copies from it.
        t = t.localCheckpoint(eager=False)

    # stratum 1: property hierarchy (reuse rdfs_entail's rules later;
    # here we only need the generalized assertions for owl expansion)
    sp = _schema_closure(t, RDFS_SUBPROPERTYOF, max_depth=max_schema_depth)
    sp = sp.localCheckpoint(eager=True)  # shared with the inner rdfs_entail
    derived7 = t.join(F.broadcast(sp), t["pred"] == sp["_sub"]).select(
        F.col("subj"),
        F.col("_sup").alias("pred"),
        F.col("obj"),
        F.col("obj_lang"),  # object term verbatim, lang tag included
        F.col("obj_is_literal"),
    )
    g1 = t.unionByName(derived7)
    if materialize_strata:
        # g1 has MANY consumers below (the property-dimension slice,
        # both expansion passes, the transitive-edge extraction, and
        # the inner rdfs_entail) — without a checkpoint each broadcast
        # build and closure probe re-evaluates the full input stream
        # (~10 evaluations measured on the bench fixture). Same
        # tradeoff knob as rdfs_entail's materialize_strata.
        g1 = g1.localCheckpoint(eager=False)

    # stratum 2: inverse + symmetric expansion (IRI objects only).
    # The three property dimensions (inverseOf pairs, Symmetric,
    # Transitive) come from ONE schema-dim-sized slice of g1 so the
    # stream is scanned once for all of them, and the eager checkpoint
    # pins the tiny slice for its five broadcast consumers.
    prop_slice = (
        g1.where(
            ((F.col("pred") == OWL_INVERSEOF) & ~F.col("obj_is_literal"))
            | (
                (F.col("pred") == RDF_TYPE)
                & F.col("obj").isin(OWL_SYMMETRIC, OWL_TRANSITIVE)
            )
        )
        .select("subj", "pred", "obj")
        .localCheckpoint(eager=True)
    )
    inv = (
        prop_slice.where(F.col("pred") == OWL_INVERSEOF)
        .select(F.col("subj").alias("_p"), F.col("obj").alias("_q"))
        .distinct()
    )
    inv_both = inv.unionByName(
        inv.select(F.col("_q").alias("_p"), F.col("_p").alias("_q"))
    ).distinct()
    sym = (
        prop_slice.where(F.col("obj") == OWL_SYMMETRIC)
        .select(F.col("subj").alias("_p"))
        .distinct()
    )

    def _inv_sym_expand(g: DataFrame) -> DataFrame:
        return _expand_inv_sym(g, inv_both, sym)

    g2 = _inv_sym_expand(g1)
    if materialize_strata:
        # g2 is read by the transitive-edge extraction AND three times
        # by the g3 expansion (x ∪ inv(x) ∪ sym(x) references x per
        # branch) — checkpoint once instead of four evaluations
        g2 = g2.localCheckpoint(eager=False)

    # stratum 3: pooled transitive closure over every TransitiveProperty
    # (from g2, as before — an inverse/symmetric mirror can in principle
    # mint a new typing triple; with g1 checkpointed this probe is one
    # map-side pass over the materialized stream, not a re-derivation)
    trans = (
        g2.where((F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_TRANSITIVE))
        .select(F.col("subj").alias("_p"))
        .distinct()
    )
    tedges = (
        g2.where(~F.col("obj_is_literal"))
        .join(F.broadcast(trans), g2["pred"] == trans["_p"])
        .select(
            F.concat_ws(_PSEP, "pred", "subj").alias("src"),
            F.concat_ws(_PSEP, "pred", "obj").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    closed = transitive_closure(tedges, max_depth=max_transitive_depth)
    derived_trans = closed.select(
        F.substring_index("src", _PSEP, -1).alias("subj"),
        F.substring_index("src", _PSEP, 1).alias("pred"),
        F.substring_index("dst", _PSEP, -1).alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(False).alias("obj_is_literal"),
    )
    # re-apply inverse/symmetric AFTER the closure: (P inv Q) with P
    # transitive entails Q-mirrors of every CLOSURE pair, which the
    # pre-closure pass cannot see. One extra broadcast application is
    # the fixpoint for these characteristics (Q's own closure is the
    # exact mirror of P's, and symmetric props were symmetrized before
    # closing) — no iteration needed.
    g3 = _inv_sym_expand(g2.unionByName(derived_trans))

    # stratum 4: full RDFS class/property rules over the expanded graph
    # (the inner rdfs7 pass is still needed — inverse/transitive-derived
    # assertions must be generalized too — but it reuses the checkpointed
    # subPropertyOf closure instead of re-running the closure job chain)
    out = rdfs_entail(
        g3,
        max_schema_depth=max_schema_depth,
        materialize_strata=materialize_strata,
        _sp=sp,
    )
    if materialize_strata:
        # `out` feeds BOTH the stratum-5 schema slice and the final
        # union: un-checkpointed, the whole entailed stream evaluates
        # twice (the docstring's former "two fact-stream evaluations");
        # one lazy checkpoint halves that.
        out = out.localCheckpoint(eager=False)

    # stratum 5: re-derive closed equivalences from mutual subsumption
    # (scm-eqc2 / scm-eqp2) — this is how ≡'s own symmetry and
    # transitivity materialize. Extract the schema-dim-sized slice
    # (sub-hierarchies + asserted equivalences) from `out` ONCE and
    # lazily checkpoint it: the self-joins below would otherwise each
    # re-evaluate the un-checkpointed fact-scale entailed plan just to
    # read a handful of schema rows (out itself still feeds the final
    # union — two fact-stream evaluations total, not five). LAZY
    # checkpoint (same as rdfs_entail's strata): materializes bottom-up
    # on the first action, so building this plan stays job-free.
    schema_slice = (
        out.where(
            F.col("pred").isin(
                RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, OWL_EQCLASS, OWL_EQPROP
            )
            & ~F.col("obj_is_literal")
        )
        .select("subj", "pred", "obj")
        .repartition(4)
        .localCheckpoint(eager=False)
    )

    def _mutual(sub_pred: str, eq_pred: str) -> DataFrame:
        sub = (
            schema_slice.where(F.col("pred") == sub_pred)
            .where(F.col("subj") != F.col("obj"))  # drop cycle reflexives
            .select("subj", "obj")
            .distinct()
        )
        rev = sub.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
        return sub.intersect(rev).select(
            "subj",
            F.lit(eq_pred).alias("pred"),
            "obj",
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )

    eq_derived = _mutual(RDFS_SUBCLASSOF, OWL_EQCLASS).unionByName(
        _mutual(RDFS_SUBPROPERTYOF, OWL_EQPROP)
    )
    # dedupe ONLY against the (schema-sized) equivalence slice — a
    # global distinct would re-shuffle the whole fact-scale entailed
    # graph for a handful of schema rows
    existing_eq = schema_slice.where(
        F.col("pred").isin(OWL_EQCLASS, OWL_EQPROP)
    )
    eq_new = eq_derived.join(
        F.broadcast(existing_eq), ["subj", "pred", "obj"], "left_anti"
    )
    return out.unionByName(eq_new)


_SCHEMA_PREDS = (
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    RDFS_DOMAIN,
    RDFS_RANGE,
    OWL_INVERSEOF,
)
_SCHEMA_TYPES = (OWL_SYMMETRIC, OWL_TRANSITIVE)


def saturated_schema_views(
    entailed: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(subPropertyOf, subClassOf, domain, range) views of an already-
    ENTAILED graph — direct selects, no closure jobs (``rdfs_entail``
    materializes its closures as triples, so the graph IS saturated)."""
    e = entailed.select(*_TRIPLE_COLS)

    def pairs(pred_iri: str, a: str, b: str) -> DataFrame:
        out = (
            e.where((F.col("pred") == pred_iri) & ~F.col("obj_is_literal"))
            .select(F.col("subj").alias(a), F.col("obj").alias(b))
            .distinct()
        )
        return out.where(F.col(a) != F.col(b)) if a == "_sub" else out

    return (
        pairs(RDFS_SUBPROPERTYOF, "_sub", "_sup"),
        pairs(RDFS_SUBCLASSOF, "_sub", "_sup"),
        pairs(RDFS_DOMAIN, "_p", "_c"),
        pairs(RDFS_RANGE, "_p", "_c"),
    )


def apply_rules_to_delta(
    d: DataFrame,
    sp: DataFrame,
    sc: DataFrame,
    dom: DataFrame,
    rng: DataFrame,
) -> DataFrame:
    """rdfs7/2/3/9 over a DELTA frame against saturated schema views —
    every join is a broadcast, every stage stateless, so the same plan
    drops into a STREAMING frame (streaming/jobs.streaming_entail).
    Returns the delta plus its consequences, NOT deduplicated (batch
    callers add ``.distinct()``; streams leave dedup to compaction)."""
    d7 = d.join(F.broadcast(sp), d["pred"] == sp["_sub"]).select(
        F.col("subj"),
        F.col("_sup").alias("pred"),
        F.col("obj"),
        F.col("obj_lang"),
        F.col("obj_is_literal"),
    )
    n1 = d.unionByName(d7)
    d2 = n1.join(F.broadcast(dom), n1["pred"] == dom["_p"]).select(
        *_as_type_triple(F.col("subj"), F.col("_c"))
    )
    d3 = (
        n1.where(~F.col("obj_is_literal"))
        .join(F.broadcast(rng), n1["pred"] == rng["_p"])
        .select(*_as_type_triple(F.col("obj"), F.col("_c")))
    )
    n2 = n1.unionByName(d2).unionByName(d3)
    types = n2.where(F.col("pred") == RDF_TYPE)
    d9 = types.join(F.broadcast(sc), types["obj"] == sc["_sub"]).select(
        *_as_type_triple(F.col("subj"), F.col("_sup"))
    )
    return n2.unionByName(d9)


def rdfs_entail_delta(
    entailed: DataFrame,
    delta: DataFrame,
    *,
    max_schema_depth: int = 20,
    materialize_entailed: bool = True,
) -> DataFrame:
    """Incremental (semi-naive) RDFS maintenance: given a previously
    ENTAILED graph and a batch of newly asserted triples, return the
    entailed graph of the union — without re-deriving anything the old
    graph already holds.

    This is what makes materialization viable at 100 TB: a daily batch
    of new instance triples costs rules-over-the-DELTA (broadcast
    joins against the already-closed schema) plus one null-safe
    anti-join against the old graph — the old fact stream is scanned
    once for the anti-join and never re-derived.  The schema closures
    are NOT recomputed: ``rdfs_entail`` materializes closed
    subClassOf/subPropertyOf pairs as triples, so the old graph IS the
    closure (semi-naive evaluation's "use the saturated database").

    If the delta itself contains schema triples (subClassOf,
    subPropertyOf, domain, range, inverseOf, or Symmetric/Transitive
    typing) the saturated-schema shortcut is invalid — the operator
    detects that with one probe of the (small) delta and falls back to
    a full ``rdfs_entail`` over the union, which is always correct
    (entailment is idempotent).

    ``materialize_entailed``: as in ``rdfs_plus_entail_delta`` — pin a
    LIVE ``entailed`` plan once (schema views + anti-join + union all
    re-read it); pass False for stored tables.
    """
    d = delta.select(*_TRIPLE_COLS)
    e = entailed.select(*_TRIPLE_COLS)
    if materialize_entailed:
        e = e.localCheckpoint(eager=False)
    # one pinned schema slice for the four saturated views (see
    # rdfs_plus_entail_delta) instead of four full scans of the old
    # graph; materializes the lazy e-checkpoint as a side effect
    e_schema = (
        e.where(
            F.col("pred").isin(
                RDFS_SUBPROPERTYOF, RDFS_SUBCLASSOF, RDFS_DOMAIN, RDFS_RANGE
            )
            & ~F.col("obj_is_literal")
        )
        .select(*_TRIPLE_COLS)
        .localCheckpoint(eager=True)
    )
    sp, sc, dom, rng = saturated_schema_views(e_schema)
    # a delta triple is schema-bearing if its predicate IS a schema
    # predicate, types a property characteristic, OR is a declared
    # SUBPROPERTY of a schema predicate / rdf:type in the old graph
    # (rdfs7 would derive schema triples from it — e.g. ex:q ⊑
    # rdfs:subClassOf — which the saturated-schema shortcut cannot see)
    meta_preds = sp.where(
        F.col("_sup").isin(*_SCHEMA_PREDS) | (F.col("_sup") == RDF_TYPE)
    ).select("_sub")
    schema_in_delta = not d.where(
        F.col("pred").isin(*_SCHEMA_PREDS)
        | ((F.col("pred") == RDF_TYPE) & F.col("obj").isin(*_SCHEMA_TYPES))
    ).isEmpty() or not d.join(
        F.broadcast(meta_preds), d["pred"] == meta_preds["_sub"], "left_semi"
    ).isEmpty()
    if schema_in_delta:
        return rdfs_entail(e.unionByName(d), max_schema_depth=max_schema_depth)
    # lazy checkpoint before the rules: apply_rules_to_delta's union
    # tree references its input ~12× (see rdfs_plus_entail_delta) —
    # one delta-sized copy beats a dozen re-evaluations of the live
    # delta plan
    d = d.localCheckpoint(eager=False)
    fresh = apply_rules_to_delta(d, sp, sc, dom, rng).distinct()

    # null-safe anti-join: keep only genuinely new triples, then append
    cond = None
    for c in _TRIPLE_COLS:
        eq = fresh[c].eqNullSafe(e[c])
        cond = eq if cond is None else (cond & eq)
    return e.unionByName(fresh.join(e, cond, "left_anti"))


def rdfs_plus_entail_delta(
    entailed: DataFrame,
    delta: DataFrame,
    *,
    max_schema_depth: int = 20,
    max_transitive_depth: int = 20,
    materialize_entailed: bool = True,
) -> DataFrame:
    """Incremental (semi-naive) RDFS-PLUS maintenance: given a graph
    previously saturated by ``rdfs_plus_entail`` and a batch of new
    INSTANCE triples, return the saturation of the union without
    re-deriving the old graph — including deltas that touch
    TRANSITIVE / INVERSE / SYMMETRIC properties, which
    ``rdfs_entail_delta`` cannot handle (round-4 VERDICT ask #4).

    The transitive piece is the classic incremental-closure identity:
    with C the old (already transitive) pair set and Δ the new edges,

        C' = C ∪ (C? ∘ Δ ∘ C?)+        (C? = C ∪ identity)

    — each new edge is bridged through the old closure on both sides
    (two joins whose small side is the delta, broadcast), and the
    tiny bridged pair set is closed on ITSELF (alternating old/new
    paths compose because every bridged pair already absorbs the old
    hops). The closure job therefore runs over delta-incident pairs
    only — never the old fact stream, which is scanned just for the
    pred-filtered slices (pushdown-eligible) and the final anti-join.

    Inverse/symmetric mirrors apply to the delta before the closure
    (so a symmetric transitive property closes both directions) and
    once more to the new closure pairs after it — the same two-pass
    fixpoint ``rdfs_plus_entail`` uses. Class rules (domain/range/
    subClassOf/subPropertyOf) run last over the whole delta expansion
    against the saturated schema views, all broadcast.

    A delta carrying SCHEMA triples (hierarchy/domain/range/inverseOf/
    equivalence axioms or property-characteristic typings) invalidates
    the saturated-view shortcut; detected with one probe of the small
    delta → full ``rdfs_plus_entail`` over the union (idempotent,
    always correct).

    ``materialize_entailed`` (default True) lazily localCheckpoints
    the old graph once: this function reads it ~8 times (schema views,
    property dimensions, the two closure-bridge slices, the final
    anti-join + union), and when ``entailed`` arrives as a LIVE plan
    (the common test/pipeline composition) every read would otherwise
    re-run the full base saturation. Pass False when the input is
    already a stored table whose re-scan is cheaper than a block-
    storage copy (the 100-TB shape: Parquet serves the slices with
    predicate pushdown the checkpoint copy cannot)."""
    d = delta.select(*_TRIPLE_COLS)
    e = entailed.select(*_TRIPLE_COLS)
    if materialize_entailed:
        e = e.localCheckpoint(eager=False)
    # ONE schema-dim-sized slice of the saturated graph feeds all seven
    # dimension builds below (sp/sc/dom/rng views + inv/sym/trans) —
    # without it each build is its own full scan of the old graph. The
    # eager checkpoint also forces the lazy e-checkpoint to materialize
    # here, so every later job reads stored blocks.
    e_schema = (
        e.where(
            F.col("pred").isin(
                RDFS_SUBPROPERTYOF,
                RDFS_SUBCLASSOF,
                RDFS_DOMAIN,
                RDFS_RANGE,
                OWL_INVERSEOF,
            )
            | (
                (F.col("pred") == RDF_TYPE)
                & F.col("obj").isin(OWL_SYMMETRIC, OWL_TRANSITIVE)
            )
        )
        .select(*_TRIPLE_COLS)
        .localCheckpoint(eager=True)
    )
    sp, sc, dom, rng = saturated_schema_views(e_schema)
    meta_preds = sp.where(
        F.col("_sup").isin(*_SCHEMA_PREDS, OWL_EQCLASS, OWL_EQPROP)
        | (F.col("_sup") == RDF_TYPE)
    ).select("_sub")
    schema_in_delta = not d.where(
        F.col("pred").isin(*_SCHEMA_PREDS, OWL_EQCLASS, OWL_EQPROP)
        | ((F.col("pred") == RDF_TYPE) & F.col("obj").isin(*_SCHEMA_TYPES))
    ).isEmpty() or not d.join(
        F.broadcast(meta_preds), d["pred"] == meta_preds["_sub"], "left_semi"
    ).isEmpty()
    if schema_in_delta:
        return rdfs_plus_entail(
            e.unionByName(d),
            max_schema_depth=max_schema_depth,
            max_transitive_depth=max_transitive_depth,
        )

    # property dimensions from the pinned schema slice (schema-dim-sized)
    inv = (
        e_schema.where(
            (F.col("pred") == OWL_INVERSEOF) & ~F.col("obj_is_literal")
        )
        .select(F.col("subj").alias("_p"), F.col("obj").alias("_q"))
        .distinct()
    )
    inv_both = inv.unionByName(
        inv.select(F.col("_q").alias("_p"), F.col("_p").alias("_q"))
    ).distinct()
    sym = (
        e_schema.where(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_SYMMETRIC)
        )
        .select(F.col("subj").alias("_p"))
        .distinct()
    )
    trans = (
        e_schema.where(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_TRANSITIVE)
        )
        .select(F.col("subj").alias("_p"))
        .distinct()
    )

    # stratum 1: generalize the delta through the saturated property
    # hierarchy (rdfs7) so sub-property assertions of transitive /
    # mirrored properties participate below
    d7 = d.join(F.broadcast(sp), d["pred"] == sp["_sub"]).select(
        F.col("subj"),
        F.col("_sup").alias("pred"),
        F.col("obj"),
        F.col("obj_lang"),
        F.col("obj_is_literal"),
    )
    n1 = d.unionByName(d7)

    # stratum 2: inverse/symmetric mirrors of the new assertions
    n2 = _expand_inv_sym(n1, inv_both, sym)

    # stratum 3: incremental pooled transitive closure (pred fused into
    # the node key, as in rdfs_plus_entail). The delta side of every
    # join is broadcast; the old closure is read as two pred-filtered
    # slices of the saturated graph.
    def _fused(g: DataFrame) -> DataFrame:
        return (
            g.where(~F.col("obj_is_literal"))
            .join(F.broadcast(trans), g["pred"] == trans["_p"])
            .select(
                F.concat_ws(_PSEP, "pred", "subj").alias("src"),
                F.concat_ws(_PSEP, "pred", "obj").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    d_edges = _fused(n2).localCheckpoint(eager=True)  # small: delta-sized
    e_pairs = _fused(e)  # old closure pairs (C), pred-filtered slice
    # C? ∘ Δ : extend each new edge backwards through the old closure
    pre = d_edges.unionByName(
        e_pairs.select(F.col("src"), F.col("dst").alias("_mid")).join(
            F.broadcast(
                d_edges.select(
                    F.col("src").alias("_mid"), F.col("dst").alias("_b")
                )
            ),
            "_mid",
        ).select("src", F.col("_b").alias("dst"))
    )
    # (C? ∘ Δ) ∘ C? : and forwards
    bridged = (
        pre.unionByName(
            pre.select(F.col("src"), F.col("dst").alias("_mid")).join(
                e_pairs.select(
                    F.col("src").alias("_mid"), F.col("dst").alias("_b")
                ),
                "_mid",
            ).select("src", F.col("_b").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    closed = transitive_closure(bridged, max_depth=max_transitive_depth)
    derived_trans = closed.select(
        F.substring_index("src", _PSEP, -1).alias("subj"),
        F.substring_index("src", _PSEP, 1).alias("pred"),
        F.substring_index("dst", _PSEP, -1).alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(False).alias("obj_is_literal"),
    )

    # stratum 4: mirror the NEW closure pairs (inverse of a transitive
    # property mirrors the closure), then class rules over everything.
    # n3 is lazily checkpointed first: apply_rules_to_delta's union tree
    # references its input ~12× (n1 = 2×d, n2 = 3×n1, out = 2×n2 — each
    # union branch re-evaluates the shared subtree), and without the
    # checkpoint every reference re-runs the delta bridging joins. The
    # frame is delta-sized, so the copy is the cheap side of that trade
    # at any scale.
    n3 = _expand_inv_sym(
        n2.unionByName(derived_trans), inv_both, sym
    ).localCheckpoint(eager=False)
    fresh = apply_rules_to_delta(n3, sp, sc, dom, rng).distinct()

    cond = None
    for c in _TRIPLE_COLS:
        eq = fresh[c].eqNullSafe(e[c])
        cond = eq if cond is None else (cond & eq)
    return e.unionByName(fresh.join(e, cond, "left_anti"))


OWL_FUNCTIONAL = "http://www.w3.org/2002/07/owl#FunctionalProperty"
OWL_INVERSE_FUNCTIONAL = (
    "http://www.w3.org/2002/07/owl#InverseFunctionalProperty"
)


def functional_violations(triples: DataFrame) -> DataFrame:
    """KG-consistency audit for cardinality-one properties: one row
    per violation, (node, pred, n_values, kind) where

    * kind='functional'          — ``P a owl:FunctionalProperty`` and
      some subject has >1 DISTINCT object under P
    * kind='inverse_functional'  — ``P a owl:InverseFunctionalProperty``
      and some IRI object has >1 distinct subject (the classic
      entity-resolution signal: two nodes sharing an IFP value should
      have been merged by canonicalization)

    Scale shape: predicate-filtered slice (broadcast semi-join against
    the tiny declared-property set) → one partial-agg count-distinct
    per (node, pred) → filter >1. Literal objects participate in
    'functional' (values) but never in 'inverse_functional' (only IRIs
    can be merge candidates)."""
    t = triples.select(*_TRIPLE_COLS)
    fp = (
        t.where((F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_FUNCTIONAL))
        .select(F.col("subj").alias("_p"))
        .distinct()
    )
    ifp = (
        t.where(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_INVERSE_FUNCTIONAL)
        )
        .select(F.col("subj").alias("_p"))
        .distinct()
    )
    f_slice = t.join(F.broadcast(fp), t["pred"] == fp["_p"]).select(
        F.col("subj").alias("node"), "pred",
        F.concat_ws(
            "\x1f", F.col("obj"), F.coalesce(F.col("obj_lang"), F.lit("")),
            F.col("obj_is_literal").cast("string"),
        ).alias("_val"),
    )
    f_out = (
        f_slice.groupBy("node", "pred")
        .agg(F.count_distinct("_val").alias("n_values"))
        .where(F.col("n_values") > 1)
        .withColumn("kind", F.lit("functional"))
    )
    i_slice = (
        t.where(~F.col("obj_is_literal"))
        .join(F.broadcast(ifp), t["pred"] == ifp["_p"])
        .select(F.col("obj").alias("node"), "pred", F.col("subj").alias("_val"))
    )
    i_out = (
        i_slice.groupBy("node", "pred")
        .agg(F.count_distinct("_val").alias("n_values"))
        .where(F.col("n_values") > 1)
        .withColumn("kind", F.lit("inverse_functional"))
    )
    return f_out.unionByName(i_out)


OWL_PROPERTY_CHAIN = "http://www.w3.org/2002/07/owl#propertyChainAxiom"
_RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
_RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"


#: one RDF-list member: (lexical form, lang tag, is-literal flag)
ListMember = tuple[str, "str | None", bool]


def _collect_rdf_lists(
    triples: DataFrame, axiom_pred: str, label: str
) -> list[tuple[str, list[ListMember]]]:
    """Collect ``(s, axiom_pred, (m1 m2 ...))`` axioms as
    ``(s, [(obj, lang, is_lit), ...])`` — the RDF list
    (rdf:first/rdf:rest chains, which both the Turtle ``( )`` and
    RDF/XML parseType=Collection readers emit) is walked DRIVER-side:
    axioms are a schema dimension (same stance as _schema_closure's
    driver path). Malformed lists (missing first/rest, FORKED nodes
    with duplicate first/rest arcs, cycles) raise rather than silently
    shortening or nondeterministically reordering members. The
    list-cell collect is capped at ``_DRIVER_CLOSURE_MAX`` rows: a
    graph whose INSTANCE data carries millions of RDF collections
    (OWL class expressions, SKOS ordered collections) must pass the
    axioms explicitly rather than OOM the driver. ``rdf:first``
    members keep full literal term identity (oneOf lists may hold
    literals); ``rdf:rest`` arcs must be IRIs/blank nodes."""
    t = triples.select(*_TRIPLE_COLS)
    axioms = t.where(
        (F.col("pred") == axiom_pred) & ~F.col("obj_is_literal")
    ).select("subj", "obj").collect()
    if not axioms:
        return []
    cell_rows = (
        t.where(
            (F.col("pred") == _RDF_FIRST)
            | ((F.col("pred") == _RDF_REST) & ~F.col("obj_is_literal"))
        )
        .select("subj", "pred", "obj", "obj_lang", "obj_is_literal")
        .limit(_DRIVER_CLOSURE_MAX + 1)
        .collect()
    )
    if len(cell_rows) > _DRIVER_CLOSURE_MAX:
        raise ValueError(
            f"graph carries > {_DRIVER_CLOSURE_MAX} rdf:first/rdf:rest "
            f"cells — extract the {label} axioms from the schema graph "
            "and pass them explicitly instead of walking instance-data "
            "collections driver-side"
        )
    cells: dict[tuple[str, str], ListMember] = {}
    for r in cell_rows:
        key = (r["subj"], r["pred"])
        val = (r["obj"], r["obj_lang"], bool(r["obj_is_literal"]))
        if key in cells and cells[key] != val:
            raise ValueError(
                f"forked {label} list node {r['subj']!r}: "
                f"duplicate {r['pred']!r} arcs"
            )
        cells[key] = val
    out: list[tuple[str, list[ListMember]]] = []
    for ax in axioms:
        node, elems, seen = ax["obj"], [], set()
        while node != _RDF_NIL:
            if node in seen:
                raise ValueError(f"{label} list cycle at {node!r}")
            seen.add(node)
            first = cells.get((node, _RDF_FIRST))
            rest = cells.get((node, _RDF_REST))
            if first is None or rest is None:
                raise ValueError(
                    f"malformed {label} list node {node!r} "
                    "(missing rdf:first/rdf:rest)"
                )
            elems.append(first)
            node = rest[0]
        out.append((ax["subj"], elems))
    return out


def extract_property_chains(triples: DataFrame) -> list[tuple[str, list[str]]]:
    """Collect ``(r, owl:propertyChainAxiom, (p1 p2 ...))`` axioms as
    ``(r, [p1, p2, ...])`` via the driver-side RDF-list walk
    (``_collect_rdf_lists`` — capped, fork/cycle/malformation-checked).
    Chain elements must be IRIs; a literal member or a <2-element
    chain raises."""
    chains: list[tuple[str, list[str]]] = []
    for subj, members in _collect_rdf_lists(
        triples, OWL_PROPERTY_CHAIN, "propertyChainAxiom"
    ):
        elems: list[str] = []
        for obj, _lang, is_lit in members:
            if is_lit:
                raise ValueError(
                    f"malformed propertyChainAxiom for {subj!r}: "
                    f"literal list member {obj!r}"
                )
            elems.append(obj)
        if len(elems) < 2:
            raise ValueError(
                f"propertyChainAxiom for {subj!r} needs >= 2 elements"
            )
        chains.append((subj, elems))
    return chains


def apply_property_chains(
    triples: DataFrame,
    chains: "list[tuple[str, list[str]]] | None" = None,
    *,
    max_rounds: int = 5,
) -> DataFrame:
    """Materialize ``owl:propertyChainAxiom`` consequences (OWL RL
    prp-spo2): for a chain ``r ⊒ p1 ∘ p2 ∘ ... ∘ pk``, every path
    ``x -p1-> . -p2-> ... -pk-> y`` entails ``x r y``. Returns the
    entailed graph (asserted ∪ derived, set semantics on the derived
    slice).

    ``chains`` defaults to ``extract_property_chains(triples)``; pass
    them explicitly to replay axioms from a separate schema graph.

    Scale shape: each chain is k-1 equi-joins of PREDICATE-FILTERED
    slices of the fact stream (pushdown- and pred_kind-partition-
    prunable — never a scan of the whole graph per hop); literal
    objects cannot continue a path and are filtered before every hop.
    Chains whose output predicate feeds another chain converge by
    iterated rounds: each round derives over the graph so far, keeps
    only genuinely-new rows (anti-join of the round's SMALL derived
    slice against the chain-output slice of the accumulated graph —
    never a shuffle of the untouched base), checkpoints the frontier,
    and stops at the fixpoint (O(1) isEmpty probe) or ``max_rounds``
    (cycles through chain outputs are bounded, same stance as
    transitive_closure's cap)."""
    t = triples.select(*_TRIPLE_COLS)
    if chains is None:
        chains = extract_property_chains(triples)
    if not chains:
        return t

    def _derive(g: DataFrame) -> DataFrame:
        iri = g.where(~F.col("obj_is_literal"))
        outs = []
        for r, elems in chains:
            cur = iri.where(F.col("pred") == elems[0]).select(
                F.col("subj").alias("_s"), F.col("obj").alias("_o")
            )
            for p in elems[1:]:
                nxt = iri.where(F.col("pred") == p).select(
                    F.col("subj").alias("_o"), F.col("obj").alias("_o2")
                )
                cur = cur.join(nxt, "_o").select(
                    "_s", F.col("_o2").alias("_o")
                )
            outs.append(
                cur.select(
                    F.col("_s").alias("subj"),
                    F.lit(r).alias("pred"),
                    F.col("_o").alias("obj"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.lit(False).alias("obj_is_literal"),
                )
            )
        d = outs[0]
        for o in outs[1:]:
            d = d.unionByName(o)
        return d.distinct()

    g = t
    converged = False
    for _ in range(max_rounds):
        new = _derive(g)
        # keep only rows not already asserted/derived — both anti-join
        # sides keyed on the derived slice (chain outputs), never a
        # shuffle of the untouched base graph. Full RDF-term identity:
        # obj_is_literal joins too, so an asserted LITERAL value on a
        # chain-output predicate cannot suppress a genuinely new
        # derived IRI triple with the same lexical object (derived
        # rows are always is_literal=false, lang null).
        new = new.join(
            g.where(F.col("pred").isin([r for r, _ in chains])).select(
                "subj", "pred", "obj", "obj_is_literal"
            ),
            ["subj", "pred", "obj", "obj_is_literal"],
            "left_anti",
        ).localCheckpoint(eager=True)
        if new.isEmpty():
            converged = True
            break
        g = g.unionByName(new)
    if not converged:
        # one O(1) probe past the cap: silence here would return an
        # incomplete entailment with no signal (transitive_closure's
        # cap raises for the same reason)
        if not _derive(g).join(
            g.where(F.col("pred").isin([r for r, _ in chains])).select(
                "subj", "pred", "obj", "obj_is_literal"
            ),
            ["subj", "pred", "obj", "obj_is_literal"],
            "left_anti",
        ).isEmpty():
            raise ValueError(
                f"property chains did not reach a fixpoint within "
                f"max_rounds={max_rounds} — raise max_rounds (self-feeding "
                "chains derive one extra hop per round)"
            )
    return g


def _collision_star_edges(
    slice_: DataFrame, max_group: int | None
) -> DataFrame:
    """(key..., member) → star edges (min-member hub, k-1 edges per
    collision group); groups above ``max_group`` members are skipped.
    ``slice_`` columns: any number of key columns plus ``member``."""
    keys = [c for c in slice_.columns if c != "member"]
    slice_ = slice_.dropDuplicates([*keys, "member"])
    hubs = (
        slice_.groupBy(*keys)
        .agg(F.min("member").alias("_hub"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
    )
    if max_group is not None:
        hubs = hubs.where(F.col("_n") <= max_group)
    return (
        slice_.join(hubs, keys)
        .where(F.col("member") != F.col("_hub"))
        .select(F.col("_hub").alias("src"), F.col("member").alias("dst"))
        .distinct()
    )


def _declared_props(t: DataFrame, type_iri: str) -> DataFrame:
    return (
        t.where((F.col("pred") == RDF_TYPE) & (F.col("obj") == type_iri))
        .select(F.col("subj").alias("_p"))
        .distinct()
    )


def ifp_entity_resolution(
    triples: DataFrame,
    *,
    max_group: int | None = 10_000,
    include_functional: bool = False,
) -> DataFrame:
    """Entity resolution from inverse-functional-property collisions:
    ``P a owl:InverseFunctionalProperty ∧ x P v ∧ y P v ⇒ x owl:sameAs
    y`` — the OWL prp-ifp rule, resolved the way the rest of this
    engine handles identity: as a CANONICAL-IRI MERGE MAP, not
    materialized sameAs cliques (same stance as rdfs_plus_entail's
    sameAs note). → (iri, canonical_iri) for every NON-CANONICAL member
    of a merged component (roots and singletons absent — compose with
    ``canonicalize.canonical_mapping`` semantics: nodes outside the map
    are their own canonical).

    Unlike ``functional_violations``'s IFP audit, the shared value here
    may be ANY RDF term — the classic IFP keys (mbox, homepage, ISBN)
    are often literals; full term identity (lexical form + lang +
    literal flag) is the join key.

    Scale shape: broadcast IFP-predicate semi-join slices the fact
    stream; per (pred, value) collision group, a min-subject HUB emits
    a STAR of k-1 edges — NEVER the O(k²) clique; the components are
    identical, pair volume is linear. ``max_group`` skips collision
    groups larger than the cap — a value shared by millions of subjects
    (empty string, "n/a") is a data-quality artifact, and merging its
    subjects would both be wrong and create the giant-component skew
    this engine salts against elsewhere. Components close transitively
    across predicates and values via ``connected_components`` (hybrid
    driver/distributed, checkpointed rounds).

    ``include_functional=True`` adds the prp-fp twin: a FUNCTIONAL
    property asserted twice on one subject merges its IRI values
    (``x P a ∧ x P b ⇒ a sameAs b``); both rule families contribute
    edges to the same component closure."""
    from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
        connected_components,
    )

    t = triples.select(*_TRIPLE_COLS)
    ifp = _declared_props(t, OWL_INVERSE_FUNCTIONAL)
    ifp_slice = t.join(F.broadcast(ifp), t["pred"] == ifp["_p"]).select(
        "pred",
        F.concat_ws(
            "\x1f",
            F.col("obj"),
            F.coalesce(F.col("obj_lang"), F.lit("")),
            F.col("obj_is_literal").cast("string"),
        ).alias("_key"),
        F.col("subj").alias("member"),
    )
    edges = _collision_star_edges(ifp_slice, max_group)
    if include_functional:
        # prp-fp: (P functional) ∧ (x P a) ∧ (x P b) ⇒ a sameAs b —
        # merges the IRI VALUES this time (a functional property with
        # two distinct LITERAL values is an inconsistency, which
        # functional_violations reports; literals cannot be merged)
        fp = _declared_props(t, OWL_FUNCTIONAL)
        fp_slice = (
            t.where(~F.col("obj_is_literal"))
            .join(F.broadcast(fp), t["pred"] == fp["_p"])
            .select("pred", F.col("subj").alias("_key"), F.col("obj").alias("member"))
        )
        edges = edges.unionByName(_collision_star_edges(fp_slice, max_group))
    return connected_components(edges)


OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_mapping(triples: DataFrame) -> DataFrame:
    """Asserted ``owl:sameAs`` links → canonical-IRI merge map
    ``(iri, canonical_iri)``: the transitive-symmetric closure of the
    identity relation collapsed to connected components, canonical =
    lexicographic min (deterministic), non-canonical members only.

    This is the scalable stance on OWL eq-sym/eq-trans: the closure of
    a k-member identity clique is O(k²) sameAs pairs, but its component
    map is k-1 rows — same reasoning as ``ifp_entity_resolution``
    (reference parity note: the reference's Jena models leave sameAs
    unexpanded too; OntologyLoader.java loads mappings as plain
    triples). sameAs with a literal endpoint is ill-typed (identity is
    between resources) and ignored."""
    from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
        connected_components,
    )

    t = triples.select(*_TRIPLE_COLS)
    pairs = t.where(
        (F.col("pred") == OWL_SAMEAS)
        & ~F.col("obj_is_literal")
        & (F.col("subj") != F.col("obj"))
    ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    return connected_components(pairs)


def sameas_consolidate(
    triples: DataFrame,
    *,
    rewrite_predicates: bool = True,
    dedup: bool = True,
) -> DataFrame:
    """Consolidate a graph by its asserted ``owl:sameAs`` links — the
    OWL RL eq-rep-s / eq-rep-p / eq-rep-o replacement rules applied as
    ONE canonical rewrite instead of materializing every replacement
    variant: each subject/object (and, with ``rewrite_predicates``,
    each predicate — eq-rep-p) maps to its identity-component
    canonical; the quadratic eq-sym/eq-trans closure never exists.
    Equivalent data: a query against the consolidated graph under
    canonical IRIs sees every fact the replacement rules would entail,
    without the |component|× blow-up per fact.

    The sameAs triples themselves are dropped: every identity link
    joins two nodes of ONE component, so the rewrite would collapse
    each to a self-loop by construction — the identity information
    lives in the merge map instead (recover it with
    ``sameas_mapping``).

    Scale shape: component map is a broadcast dimension
    (``connected_components`` hybrid); the rewrite is
    ``apply_canonical_map``'s two broadcast left joins (+ one more for
    predicates, pred-position rewrites being rare but required by
    eq-rep-p); one full-width exchange only for the final set-semantics
    dedup (merging collapses rows), skippable with ``dedup=False``."""
    from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
        apply_canonical_map,
    )

    t = triples.select(*_TRIPLE_COLS)
    mapping = sameas_mapping(t)
    base = t.where(F.col("pred") != OWL_SAMEAS)
    # drop_self_loops=False: a non-sameAs fact BETWEEN two merged
    # entities ((a, knows, b) with a sameAs b) collapses to
    # (a, knows, a) — that self-loop IS the eq-rep entailment and must
    # survive (unlike kg_pipeline's merge loops, which are noise)
    out = apply_canonical_map(
        base, mapping, dedup=False, drop_self_loops=False
    )
    if rewrite_predicates:
        m = F.broadcast(
            mapping.select(
                F.col("iri").alias("pred"), F.col("canonical_iri").alias("_cp")
            )
        )
        out = out.join(m, "pred", "left").select(
            "subj",
            F.coalesce("_cp", "pred").alias("pred"),
            "obj",
            "obj_lang",
            "obj_is_literal",
        )
    return out.distinct() if dedup else out


OWL_ONPROPERTY = "http://www.w3.org/2002/07/owl#onProperty"
OWL_HASVALUE = "http://www.w3.org/2002/07/owl#hasValue"
OWL_SOMEVALUES = "http://www.w3.org/2002/07/owl#someValuesFrom"
OWL_ALLVALUES = "http://www.w3.org/2002/07/owl#allValuesFrom"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"


def _row_key() -> F.Column:
    """Null-safe full-row identity key for triple set differences
    (plain multi-column anti-joins drop NULL-lang rows: NULL ≠ NULL)."""
    return F.concat_ws(
        "\x1f",
        F.col("subj"),
        F.col("pred"),
        F.col("obj"),
        F.coalesce(F.col("obj_lang"), F.lit("\x00")),
        F.col("obj_is_literal").cast("string"),
    )


def restrictions_entail(
    triples: DataFrame, *, max_rounds: int = 10
) -> DataFrame:
    """OWL RL restriction-class rules to fixpoint — the class-
    expression tier above RDFS-Plus (Jena's OWL Micro/Mini reasoners
    cover these; reference parity: a Jena user loading SIFR ontologies
    with restriction axioms gets this from OntModelSpec for free):

    * cls-hv1: ``(C hasValue v) (C onProperty P) (x type C) ⇒ x P v``
    * cls-hv2: ``(C hasValue v) (C onProperty P) (x P v) ⇒ x type C``
      (full RDF term identity on v — lexical + lang + literal flag)
    * cls-svf1: ``(C someValuesFrom D) (C onProperty P) (x P y)
      (y type D) ⇒ x type C``
    * cls-svf2: D = owl:Thing — ``(x P y) ⇒ x type C``
    * cls-avf:  ``(C allValuesFrom D) (C onProperty P) (x type C)
      (x P y) ⇒ y type D`` (y non-literal; typing a literal is not
      valid RDF)

    Returns input ∪ entailed (idempotent). Rules chain (an avf-derived
    type can satisfy an svf filler), so they run to fixpoint with a
    per-round novelty anti-join on the null-safe row key; restriction
    chains are shallow in practice — ``max_rounds`` raises if not.

    Scale shape: restriction axioms are SCHEMA — the three
    (class, prop, …) dimensions are broadcast once, eagerly
    materialized (each is reused every round). hv1/hv2/svf2 are pure
    broadcast joins against the fact stream (map-side, no exchange).
    svf1 and avf genuinely correlate TWO instance facts (x P y with
    y's/x's typing), which no broadcast can avoid — each is ONE
    equi-join per round, with the type side pre-pruned by a broadcast
    semi-join against the relevant filler/restriction classes so the
    exchange carries only candidate rows (types of restriction-
    relevant classes), never the whole type table."""
    t = triples.select(*_TRIPLE_COLS)

    onprop = (
        t.where((F.col("pred") == OWL_ONPROPERTY) & ~F.col("obj_is_literal"))
        .select(F.col("subj").alias("_c"), F.col("obj").alias("_p"))
        .distinct()
    )
    hv_dim = (
        t.where(F.col("pred") == OWL_HASVALUE)
        .select(
            F.col("subj").alias("_c"),
            F.col("obj").alias("_v"),
            F.col("obj_lang").alias("_vl"),
            F.col("obj_is_literal").alias("_vlit"),
        )
        .distinct()
        .join(onprop, "_c")
        .localCheckpoint(eager=True)
    )
    svf_dim = (
        t.where((F.col("pred") == OWL_SOMEVALUES) & ~F.col("obj_is_literal"))
        .select(F.col("subj").alias("_c"), F.col("obj").alias("_d"))
        .distinct()
        .join(onprop, "_c")
        .localCheckpoint(eager=True)
    )
    avf_dim = (
        t.where((F.col("pred") == OWL_ALLVALUES) & ~F.col("obj_is_literal"))
        .select(F.col("subj").alias("_c"), F.col("obj").alias("_d"))
        .distinct()
        .join(onprop, "_c")
        .localCheckpoint(eager=True)
    )
    # single emptiness probe per dimension (reused below — the previous
    # shape probed each checkpointed dim twice, 6 jobs where 3 suffice)
    have_hv = not hv_dim.isEmpty()
    have_svf = not svf_dim.isEmpty()
    have_avf = not avf_dim.isEmpty()
    if not (have_hv or have_svf or have_avf):
        return t

    def _new_type(subj_col: F.Column, cls_col: F.Column, frame: DataFrame) -> DataFrame:
        return frame.select(
            subj_col.alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            cls_col.alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )

    # loop-invariant hoists: the axiom dimensions never change, so
    # the owl:Thing slice and its probe run ONCE
    thing = svf_dim.where(F.col("_d") == OWL_THING)
    have_thing = have_svf and not thing.isEmpty()
    svf_fillers = F.broadcast(
        svf_dim.where(F.col("_d") != OWL_THING).select("_d").distinct()
    )
    avf_classes = F.broadcast(avf_dim.select("_c").distinct())

    def _types_of(frame: DataFrame) -> DataFrame:
        return frame.where(
            (F.col("pred") == RDF_TYPE) & ~F.col("obj_is_literal")
        )

    def _derive(delta: DataFrame, allf: DataFrame, first: bool) -> DataFrame | None:
        """One semi-naive round: the LINEAR rules (hv1/hv2/svf2) read
        only the delta; the two-fact rules (svf1/avf) correlate
        delta-vs-all in BOTH orientations (first round: all-vs-all
        once — delta IS all, two orientations would double-derive)."""
        d_types = _types_of(delta)
        derived: list[DataFrame] = []
        if have_hv:
            derived.append(
                d_types.join(
                    F.broadcast(hv_dim), d_types["obj"] == hv_dim["_c"]
                ).select(
                    "subj",
                    F.col("_p").alias("pred"),
                    F.col("_v").alias("obj"),
                    F.col("_vl").alias("obj_lang"),
                    F.col("_vlit").alias("obj_is_literal"),
                )
            )
            # full RDF term identity on the value — null-safe lang
            # equality (NULL and '' are DIFFERENT tags, matching
            # _row_key's sentinel)
            hv2 = delta.join(
                F.broadcast(hv_dim),
                (delta["pred"] == hv_dim["_p"])
                & (delta["obj"] == hv_dim["_v"])
                & delta["obj_lang"].eqNullSafe(hv_dim["_vl"])
                & (delta["obj_is_literal"] == hv_dim["_vlit"]),
            )
            derived.append(_new_type(delta["subj"], F.col("_c"), hv2))
        if have_thing:
            sv2 = delta.join(
                F.broadcast(thing), delta["pred"] == thing["_p"]
            )
            derived.append(_new_type(delta["subj"], F.col("_c"), sv2))

        def _svf1(facts_side: DataFrame, types_side: DataFrame) -> DataFrame:
            typed_d = _types_of(types_side).join(
                svf_fillers, F.col("obj") == F.col("_d"), "left_semi"
            ).select(F.col("subj").alias("_y"), F.col("obj").alias("_yd"))
            sv1 = (
                facts_side.where(~F.col("obj_is_literal"))
                .join(typed_d, facts_side["obj"] == typed_d["_y"])
                .join(
                    F.broadcast(svf_dim),
                    (facts_side["pred"] == svf_dim["_p"])
                    & (F.col("_yd") == svf_dim["_d"]),
                )
            )
            return _new_type(facts_side["subj"], F.col("_c"), sv1)

        def _avf(types_side: DataFrame, facts_side: DataFrame) -> DataFrame:
            typed_c = _types_of(types_side).join(
                avf_classes, F.col("obj") == F.col("_c"), "left_semi"
            ).select(F.col("subj").alias("_x"), F.col("obj").alias("_xc"))
            av = (
                facts_side.where(~F.col("obj_is_literal"))
                .join(typed_c, facts_side["subj"] == typed_c["_x"])
                .join(
                    F.broadcast(avf_dim),
                    (facts_side["pred"] == avf_dim["_p"])
                    & (F.col("_xc") == avf_dim["_c"]),
                )
            )
            return _new_type(facts_side["obj"], F.col("_d"), av)

        if have_svf:
            derived.append(_svf1(delta, allf))
            if not first:
                derived.append(_svf1(allf, delta))
        if have_avf:
            derived.append(_avf(allf, delta))
            if not first:
                derived.append(_avf(delta, allf))
        if not derived:
            return None
        new = derived[0]
        for d in derived[1:]:
            new = new.unionByName(d)
        return new

    facts = t.localCheckpoint(eager=True)
    delta, first = facts, True
    for _ in range(max_rounds):
        new = _derive(delta, facts, first)
        first = False
        if new is None:
            break
        new = (
            new.distinct()
            .withColumn("_k", _row_key())
            .join(
                facts.select(_row_key().alias("_k")),
                "_k",
                "left_anti",
            )
            .drop("_k")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        # union of eagerly-checkpointed leaves: re-reads are cheap and
        # the accumulated graph is never re-copied per round (the
        # transitive_closure pattern)
        facts = facts.unionByName(new)
        delta = new
    else:
        raise ValueError(
            f"restrictions_entail: no fixpoint within {max_rounds} rounds"
        )
    return facts


# ---------------------------------------------------------------------------
# OWL RL boolean class expressions: intersectionOf / unionOf / oneOf
# ---------------------------------------------------------------------------

OWL_INTERSECTION = "http://www.w3.org/2002/07/owl#intersectionOf"
OWL_UNION = "http://www.w3.org/2002/07/owl#unionOf"
OWL_ONEOF = "http://www.w3.org/2002/07/owl#oneOf"

#: driver-extracted class-expression axioms:
#: (intersections, unions, oneofs) — each [(class IRI, members)]
ClassAxioms = tuple[
    "list[tuple[str, list[str]]]",
    "list[tuple[str, list[str]]]",
    "list[tuple[str, list[ListMember]]]",
]


def extract_class_expressions(triples: DataFrame) -> ClassAxioms:
    """Collect ``owl:intersectionOf`` / ``owl:unionOf`` / ``owl:oneOf``
    axioms via the driver-side RDF-list walk (``_collect_rdf_lists`` —
    capped, fork/cycle/malformation-checked). Intersection and union
    members must be class IRIs (a literal member raises); an EMPTY
    intersection list raises too — a vacuous conjunction would type
    every resource. ``oneOf`` members keep full literal term identity
    (enumerated datatype classes are legal OWL)."""

    def _iri_members(
        axioms: list[tuple[str, list[ListMember]]], label: str
    ) -> list[tuple[str, list[str]]]:
        out = []
        for subj, members in axioms:
            elems: list[str] = []
            for obj, _lang, is_lit in members:
                if is_lit:
                    raise ValueError(
                        f"malformed {label} for {subj!r}: "
                        f"literal list member {obj!r}"
                    )
                elems.append(obj)
            if label == "intersectionOf" and not elems:
                raise ValueError(
                    f"malformed intersectionOf for {subj!r}: empty list "
                    "(a vacuous conjunction would type every resource)"
                )
            out.append((subj, elems))
        return out

    inter = _iri_members(
        _collect_rdf_lists(triples, OWL_INTERSECTION, "intersectionOf"),
        "intersectionOf",
    )
    uni = _iri_members(
        _collect_rdf_lists(triples, OWL_UNION, "unionOf"), "unionOf"
    )
    oneof = _collect_rdf_lists(triples, OWL_ONEOF, "oneOf")
    return inter, uni, oneof


def class_expressions_entail(
    triples: DataFrame,
    axioms: "ClassAxioms | None" = None,
    *,
    max_rounds: int = 10,
) -> DataFrame:
    """OWL RL boolean class-expression rules to fixpoint — the tier
    Jena's OWL reasoners add for ``owl:intersectionOf`` / ``unionOf`` /
    ``oneOf`` (reference parity: SIFR ontologies loaded through Jena
    OntModelSpec get these from the reference's model layer for free;
    see reference OntologyLoader.java model construction):

    * scm-int: ``C intersectionOf (c1..ck) ⇒ C rdfs:subClassOf ci``
    * scm-uni: ``C unionOf (c1..ck) ⇒ ci rdfs:subClassOf C``
    * cls-oo:  ``C oneOf (v1..vk) ⇒ vi rdf:type C`` (IRI members;
      typing a literal is not valid RDF, so literal members only
      define the enumeration and emit no typing — cls-avf stance)
    * cls-int1: ``C intersectionOf (c1..ck), x type c1..ck (ALL)
      ⇒ x type C``
    * cls-int2: ``C intersectionOf (c1..ck), x type C ⇒ x type ci``
    * cls-uni:  ``C unionOf (c1..ck), x type ci (ANY) ⇒ x type C``

    Rules chain (a oneOf/union-derived typing can complete an
    intersection), so they run semi-naive to fixpoint with a per-round
    novelty anti-join on the null-safe row key. Returns
    input ∪ entailed (idempotent).

    Scale shape: the axioms are SCHEMA — member lists walk driver-side
    (capped) and become broadcast literal dimensions; scm-int/scm-uni/
    cls-oo derive once from the dimensions alone. cls-int2 and cls-uni
    are broadcast joins against the type slice of the DELTA (map-side,
    no exchange). cls-int1 — the only conjunctive rule — prunes the
    accumulated type slice to member-class typings with a broadcast
    semi-join FIRST, so its one equi-join per round exchanges only
    restriction-relevant rows, and the ALL-k check is a partial-agg
    ``count == k`` (map-side combinable), never a per-entity window."""
    t = triples.select(*_TRIPLE_COLS)
    if axioms is None:
        axioms = extract_class_expressions(t)
    inter, uni, oneof = axioms
    if not inter and not uni and not oneof:
        return t
    spark = t.sparkSession

    def _typing(subj: str, cls: str) -> tuple:
        return (subj, RDF_TYPE, cls, None, False)

    sch = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean"
    )
    static_rows: list[tuple] = []
    for c, members in inter:
        for m in members:
            static_rows.append((c, RDFS_SUBCLASSOF, m, None, False))
    for c, members in uni:
        for m in members:
            static_rows.append((m, RDFS_SUBCLASSOF, c, None, False))
    for c, members in oneof:
        for obj, _lang, is_lit in members:
            if not is_lit:
                static_rows.append(_typing(obj, c))

    # intersections key on the AXIOM instance (_i), not the class IRI:
    # a class may carry several equivalent intersection lists, and
    # pooling their members would conflate the conjunctions. Member
    # sets dedupe per axiom — a duplicated list member must not
    # inflate the required conjunct count.
    int_members = [
        (i, c, m) for i, (c, ms) in enumerate(inter) for m in sorted(set(ms))
    ]
    int_counts = [(i, c, len(set(ms))) for i, (c, ms) in enumerate(inter)]
    uni_members = [(c, m) for c, ms in uni for m in ms]
    mem_sch = "_c string, _m string"
    int_dim = (
        F.broadcast(
            spark.createDataFrame(int_members, "_i long, _c string, _m string")
        )
        if int_members
        else None
    )
    cnt_dim = (
        F.broadcast(
            spark.createDataFrame(int_counts, "_i long, _c string, _k long")
        )
        if int_counts
        else None
    )
    uni_dim = (
        F.broadcast(spark.createDataFrame(uni_members, mem_sch).distinct())
        if uni_members
        else None
    )
    member_classes = (
        F.broadcast(
            spark.createDataFrame(
                [(m,) for _i, _c, m in int_members], "_m string"
            ).distinct()
        )
        if int_members
        else None
    )

    def _types_of(frame: DataFrame) -> DataFrame:
        return frame.where(
            (F.col("pred") == RDF_TYPE) & ~F.col("obj_is_literal")
        )

    def _derive(delta: DataFrame, allf: DataFrame) -> DataFrame | None:
        d_types = _types_of(delta)
        derived: list[DataFrame] = []
        if int_dim is not None:
            # cls-int2 (linear): delta typing of the intersection class
            i2 = d_types.join(int_dim, d_types["obj"] == int_dim["_c"])
            derived.append(
                i2.select(
                    "subj",
                    F.lit(RDF_TYPE).alias("pred"),
                    F.col("_m").alias("obj"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.lit(False).alias("obj_is_literal"),
                )
            )
            # cls-int1 (conjunctive): only (x, axiom) pairs TOUCHED by
            # the delta can newly satisfy the conjunction
            cand = (
                d_types.join(int_dim, d_types["obj"] == int_dim["_m"])
                .select("subj", "_i")
                .distinct()
            )
            req = cand.join(int_dim, "_i")  # (subj, _i, _c, _m) required
            typed = (
                _types_of(allf)
                .join(
                    member_classes,
                    F.col("obj") == member_classes["_m"],
                    "left_semi",
                )
                .select(F.col("subj").alias("_ts"), F.col("obj").alias("_tc"))
            )
            sat = (
                req.join(
                    typed,
                    (req["subj"] == typed["_ts"]) & (req["_m"] == typed["_tc"]),
                    "left_semi",
                )
                .groupBy("subj", "_i", "_c")
                .agg(F.count("*").alias("_n"))
                .join(cnt_dim.select("_i", "_k"), "_i")
                .where(F.col("_n") == F.col("_k"))
            )
            derived.append(
                sat.select(
                    "subj",
                    F.lit(RDF_TYPE).alias("pred"),
                    F.col("_c").alias("obj"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.lit(False).alias("obj_is_literal"),
                )
            )
        if uni_dim is not None:
            # cls-uni (linear): delta typing of any union member
            u = d_types.join(uni_dim, d_types["obj"] == uni_dim["_m"])
            derived.append(
                u.select(
                    "subj",
                    F.lit(RDF_TYPE).alias("pred"),
                    F.col("_c").alias("obj"),
                    F.lit(None).cast("string").alias("obj_lang"),
                    F.lit(False).alias("obj_is_literal"),
                )
            )
        if not derived:
            return None
        new = derived[0]
        for d in derived[1:]:
            new = new.unionByName(d)
        return new

    facts = t.localCheckpoint(eager=True)
    if static_rows:
        new0 = (
            spark.createDataFrame(sorted(set(static_rows)), sch)
            .withColumn("_k", _row_key())
            .join(facts.select(_row_key().alias("_k")), "_k", "left_anti")
            .drop("_k")
            .localCheckpoint(eager=True)
        )
        if not new0.isEmpty():
            facts = facts.unionByName(new0)
    delta = facts
    for _ in range(max_rounds):
        new = _derive(delta, facts)
        if new is None:
            break
        new = (
            new.distinct()
            .withColumn("_k", _row_key())
            .join(facts.select(_row_key().alias("_k")), "_k", "left_anti")
            .drop("_k")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        facts = facts.unionByName(new)
        delta = new
    else:
        raise ValueError(
            f"class_expressions_entail: no fixpoint within {max_rounds} "
            "rounds"
        )
    return facts


OWL_DISJOINTWITH = "http://www.w3.org/2002/07/owl#disjointWith"
OWL_PROPDISJOINTWITH = "http://www.w3.org/2002/07/owl#propertyDisjointWith"
OWL_IRREFLEXIVE = "http://www.w3.org/2002/07/owl#IrreflexiveProperty"
OWL_ASYMMETRIC = "http://www.w3.org/2002/07/owl#AsymmetricProperty"
OWL_DIFFERENTFROM = "http://www.w3.org/2002/07/owl#differentFrom"
OWL_NOTHING = "http://www.w3.org/2002/07/owl#Nothing"
OWL_NPA = "http://www.w3.org/2002/07/owl#NegativePropertyAssertion"
OWL_NPA_SOURCE = "http://www.w3.org/2002/07/owl#sourceIndividual"
OWL_NPA_PROP = "http://www.w3.org/2002/07/owl#assertionProperty"
OWL_NPA_TARGET = "http://www.w3.org/2002/07/owl#targetIndividual"
OWL_NPA_VALUE = "http://www.w3.org/2002/07/owl#targetValue"


def consistency_violations(triples: DataFrame) -> DataFrame:
    """OWL RL consistency audit: the profile's "false"-conclusion rules
    materialized as a violations frame instead of an exception — one
    row per inconsistency, ``(rule, subj, pred, obj)``.  The reference
    never validates its merged SKOS/UMLS graph (OntologyMerger.java
    unions models unchecked); at web scale a KG build wants the
    violation SET, not a boolean, so every rule lands as rows:

    * cax-dw      — ``(C1 disjointWith C2) (x type C1) (x type C2)``;
                    row ``(x, least(C1,C2), greatest(C1,C2))``
    * prp-irp     — ``(P type IrreflexiveProperty) (x P x)``;
                    row ``(x, P, x)``
    * prp-asyp    — ``(P type AsymmetricProperty) (x P y) (y P x)``;
                    row ``(least(x,y), P, greatest(x,y))`` (pair once)
    * prp-pdw     — ``(P1 propertyDisjointWith P2) (x P1 y) (x P2 y)``;
                    row ``(x, least(P1,P2)|greatest(P1,P2), y)``
    * eq-diff1    — ``(x sameAs y) (x differentFrom y)``;
                    row ``(least(x,y), owl:sameAs, greatest(x,y))``
    * cls-nothing2— ``(x type owl:Nothing)``; row ``(x, rdf:type,
                    owl:Nothing)``
    * prp-npa1/2  — a reified NegativePropertyAssertion whose asserted
                    triple nevertheless holds; row = the asserted triple

    Scale shape (the WebPIE stance shared by the rest of this module):
    every schema dimension (disjoint class pairs, declared irreflexive/
    asymmetric props, disjoint property pairs, assembled NPAs) is tiny
    and broadcast; the instance stream is scanned per rule family with
    a predicate pushdown filter and never shuffled except (a) the
    type-slice self-equi-join on ``subj`` for cax-dw — both sides are
    the SAME semi-join-pruned slice of typing triples whose classes
    appear in some disjoint pair, so the exchange is dimension-bounded,
    not fact-bounded — and (b) the pred-filtered slice ⋈ its own
    mirror for prp-asyp, again pruned to declared-asymmetric predicates
    first.  eq-diff1 is a broadcast join when either side fits
    (sameAs/differentFrom assertions are canonicalization inputs, not
    the fact stream).  Symmetric axiom declarations are normalized with
    least/greatest so mirror declarations don't double-report."""
    t = triples.select(*_TRIPLE_COLS)

    def _decl(type_iri: str) -> DataFrame:
        return (
            t.where((F.col("pred") == RDF_TYPE) & (F.col("obj") == type_iri))
            .select(F.col("subj").alias("_p"))
            .distinct()
        )

    def _pairs(pred_iri: str) -> DataFrame:
        # symmetric axiom: normalize so (a,b) and (b,a) declare once
        return (
            t.where((F.col("pred") == pred_iri) & ~F.col("obj_is_literal"))
            .select(
                F.least("subj", "obj").alias("_a"),
                F.greatest("subj", "obj").alias("_b"),
            )
            .distinct()
        )

    out_cols = [
        F.col("rule"), F.col("subj"), F.col("pred"), F.col("obj"),
    ]

    # cax-dw — prune the typing slice to classes in SOME disjoint pair
    # (semi-join against the broadcast dim) before the subj self-join.
    dw = _pairs(OWL_DISJOINTWITH)
    dw_classes = (
        dw.select(F.col("_a").alias("_c"))
        .unionByName(dw.select(F.col("_b").alias("_c")))
        .distinct()
    )
    types = (
        t.where(F.col("pred") == RDF_TYPE)
        .join(F.broadcast(dw_classes), F.col("obj") == F.col("_c"))
        .select(F.col("subj").alias("_x"), F.col("obj").alias("_cls"))
        .distinct()
    )
    t2 = types.select(F.col("_x").alias("_x2"), F.col("_cls").alias("_cls2"))
    cax_dw = (
        types.join(t2, (types["_x"] == t2["_x2"]) & (types["_cls"] < t2["_cls2"]))
        .join(
            F.broadcast(dw),
            (F.col("_cls") == F.col("_a")) & (F.col("_cls2") == F.col("_b")),
            "left_semi",
        )
        .select(
            F.lit("cax-dw").alias("rule"),
            F.col("_x").alias("subj"),
            F.col("_cls").alias("pred"),
            F.col("_cls2").alias("obj"),
        )
    )

    # prp-irp — map-side: broadcast declared props, filter subj == obj
    irp = (
        t.where((F.col("subj") == F.col("obj")) & ~F.col("obj_is_literal"))
        .join(F.broadcast(_decl(OWL_IRREFLEXIVE)), F.col("pred") == F.col("_p"), "left_semi")
        .select(
            F.lit("prp-irp").alias("rule"), "subj", "pred", "obj",
        )
        .distinct()
    )

    # prp-asyp — pred-pruned slice ⋈ its mirror; emit each pair once
    asy_slice = (
        t.where(~F.col("obj_is_literal"))
        .join(F.broadcast(_decl(OWL_ASYMMETRIC)), F.col("pred") == F.col("_p"), "left_semi")
        .select("subj", "pred", "obj")
        .distinct()
    )
    mirror = asy_slice.select(
        F.col("obj").alias("subj"), F.col("pred").alias("pred"),
        F.col("subj").alias("obj"),
    )
    asyp = (
        asy_slice.intersect(mirror)
        .where(F.col("subj") <= F.col("obj"))  # pair once; x==y also irp-shaped but asserted both ways
        .select(
            F.lit("prp-asyp").alias("rule"),
            F.least("subj", "obj").alias("subj"),
            "pred",
            F.greatest("subj", "obj").alias("obj"),
        )
    )

    # prp-pdw — disjoint property pairs: (x P1 y) ∧ (x P2 y). Prune the
    # fact stream to predicates in SOME pair, then self-join on (x, y)
    # — exchange bounded by the pruned slice.
    pdw = _pairs(OWL_PROPDISJOINTWITH)
    pdw_props = (
        pdw.select(F.col("_a").alias("_c"))
        .unionByName(pdw.select(F.col("_b").alias("_c")))
        .distinct()
    )
    val = F.concat_ws(
        "\x1f", F.col("obj"), F.coalesce(F.col("obj_lang"), F.lit("")),
        F.col("obj_is_literal").cast("string"),
    )
    pslice = (
        t.join(F.broadcast(pdw_props), F.col("pred") == F.col("_c"), "left_semi")
        .select(F.col("subj").alias("_x"), F.col("pred").alias("_q"), val.alias("_v"), F.col("obj").alias("_o"))
        .distinct()
    )
    p2 = pslice.select(
        F.col("_x").alias("_x2"), F.col("_q").alias("_q2"), F.col("_v").alias("_v2")
    )
    prp_pdw = (
        pslice.join(
            p2,
            (pslice["_x"] == p2["_x2"]) & (pslice["_v"] == p2["_v2"])
            & (pslice["_q"] < p2["_q2"]),
        )
        .join(
            F.broadcast(pdw),
            (F.col("_q") == F.col("_a")) & (F.col("_q2") == F.col("_b")),
            "left_semi",
        )
        .select(
            F.lit("prp-pdw").alias("rule"),
            F.col("_x").alias("subj"),
            F.concat_ws("|", F.col("_q"), F.col("_q2")).alias("pred"),
            F.col("_o").alias("obj"),
        )
    )

    # eq-diff1 — sameAs ∩ differentFrom, order-normalized on both sides
    same = (
        t.where(F.col("pred") == OWL_SAMEAS)
        .select(F.least("subj", "obj").alias("subj"), F.greatest("subj", "obj").alias("obj"))
        .distinct()
    )
    diff = (
        t.where(F.col("pred") == OWL_DIFFERENTFROM)
        .select(F.least("subj", "obj").alias("subj"), F.greatest("subj", "obj").alias("obj"))
        .distinct()
    )
    eq_diff = same.intersect(diff).select(
        F.lit("eq-diff1").alias("rule"), "subj",
        F.lit(OWL_SAMEAS).alias("pred"), "obj",
    )

    # cls-nothing2 — membership in the empty class
    nothing = (
        t.where((F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_NOTHING))
        .select(
            F.lit("cls-nothing2").alias("rule"), "subj",
            F.lit(RDF_TYPE).alias("pred"), "obj",
        )
        .distinct()
    )

    # prp-npa1/2 — assemble the reified NPA dimension (schema-sized:
    # one groupBy over the 4 reification predicates), broadcast it,
    # probe the fact stream for the asserted triple.
    npa_preds = [OWL_NPA_SOURCE, OWL_NPA_PROP, OWL_NPA_TARGET, OWL_NPA_VALUE]
    npa = (
        t.where(F.col("pred").isin(npa_preds))
        .groupBy("subj")
        .agg(
            F.min(F.when(F.col("pred") == OWL_NPA_SOURCE, F.col("obj"))).alias("_src"),
            F.min(F.when(F.col("pred") == OWL_NPA_PROP, F.col("obj"))).alias("_prop"),
            F.min(F.when(F.col("pred") == OWL_NPA_TARGET, F.col("obj"))).alias("_tgt"),
            F.min(
                F.when(
                    F.col("pred") == OWL_NPA_VALUE,
                    F.concat_ws(
                        "\x1f", F.col("obj"),
                        F.coalesce(F.col("obj_lang"), F.lit("")), F.lit("true"),
                    ),
                )
            ).alias("_tval"),
        )
        .where(F.col("_src").isNotNull() & F.col("_prop").isNotNull())
    )
    npa1 = npa.where(F.col("_tgt").isNotNull()).select("_src", "_prop", F.col("_tgt").alias("_want"))
    npa2 = npa.where(F.col("_tval").isNotNull()).select("_src", "_prop", F.col("_tval").alias("_want"))
    fact_keyed = t.select(
        "subj", "pred", "obj",
        F.when(F.col("obj_is_literal"), val).otherwise(F.col("obj")).alias("_k"),
    )
    def _npa_hits(dim: DataFrame, rule: str) -> DataFrame:
        return (
            fact_keyed.join(
                F.broadcast(dim),
                (F.col("subj") == F.col("_src"))
                & (F.col("pred") == F.col("_prop"))
                & (F.col("_k") == F.col("_want")),
                "left_semi",
            )
            .select(F.lit(rule).alias("rule"), "subj", "pred", "obj")
            .distinct()
        )

    return (
        cax_dw.select(*out_cols)
        .unionByName(irp.select(*out_cols))
        .unionByName(asyp.select(*out_cols))
        .unionByName(prp_pdw.select(*out_cols))
        .unionByName(eq_diff.select(*out_cols))
        .unionByName(nothing.select(*out_cols))
        .unionByName(_npa_hits(npa1, "prp-npa1").select(*out_cols))
        .unionByName(_npa_hits(npa2, "prp-npa2").select(*out_cols))
    )
