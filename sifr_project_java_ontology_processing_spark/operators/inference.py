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


def _schema_closure(triples: DataFrame, pred_iri: str, *, max_depth: int) -> DataFrame:
    """Transitive closure of one schema predicate as (sub, sup) pairs
    (closure depth collapsed — consumers only need reachability)."""
    edges = (
        triples.where((F.col("pred") == pred_iri) & ~F.col("obj_is_literal"))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    closed = transitive_closure(edges, max_depth=max_depth, partitions=8)
    return closed.select(
        F.col("src").alias("_sub"), F.col("dst").alias("_sup")
    ).distinct()


def rdfs_entail(
    triples: DataFrame,
    *,
    max_schema_depth: int = 20,
) -> DataFrame:
    """Materialize the RDFS consequences of ``triples`` and return the
    ENTAILED graph (asserted ∪ inferred, distinct) in the same
    5-column triple schema.

    Inferred triples carry ``obj_lang = NULL`` and inherit
    ``obj_is_literal`` from their provenance (rdfs7 copies the object
    term verbatim; rdfs2/3/9 emit IRI-object ``rdf:type`` triples).
    ``max_schema_depth`` bounds the subclass/subproperty closure depth
    (a deeper real hierarchy simply needs a larger bound; the closure
    loop is depth-bounded, not fixpoint-probed, so the job count is
    static).
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
    sp = _schema_closure(t, RDFS_SUBPROPERTYOF, max_depth=max_schema_depth)
    derived7 = (
        t.join(F.broadcast(sp), t["pred"] == sp["_sub"])
        .select(
            F.col("subj"),
            F.col("_sup").alias("pred"),
            F.col("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.col("obj_is_literal"),
        )
    )
    g1 = t.unionByName(derived7).unionByName(
        _schema_triples(sp, RDFS_SUBPROPERTYOF)
    )

    # --- stratum 2: class hierarchy + domain/range -----------------------
    sc = _schema_closure(g1, RDFS_SUBCLASSOF, max_depth=max_schema_depth)
    dom = (
        g1.where((F.col("pred") == RDFS_DOMAIN) & ~F.col("obj_is_literal"))
        .select(F.col("subj").alias("_p"), F.col("obj").alias("_c"))
        .distinct()
    )
    rng = (
        g1.where((F.col("pred") == RDFS_RANGE) & ~F.col("obj_is_literal"))
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
