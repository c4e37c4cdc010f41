"""CUI/TUI enrichment cascade (SURVEY.md J1-J8, A9, S11).

Re-expresses the reference's per-class fallback loops
(cli/enrichment/OntologyCUIProcessor.java:121-231 ``processCUIs`` /
``findCUIs``, :273-297 ``processTUIs``) as ONE declarative plan:

    classes LEFT JOIN (each candidate source, pre-aggregated to arrays)
            → coalesce in priority order + stage tag

Priority (reference findCUIs): own ``umls:cui`` → CUI-shaped altLabels
→ mapping targets' CUIs → UMLS lookup by code → (optional, separate
operator) similarity disambiguation → reject.

Where the reference does O(classes) Redis-memoized point lookups
(BaseOntologyDelegate.java:257-283), each source here is joined exactly
once; negative caching (utils/EmptyResultsCache.java) is simply the
null side of the left join (SURVEY.md §4.1).

Scale notes:
  * every right side is a pre-aggregated dimension (one row per
    concept) → joins can't explode and are hinted ``broadcast`` —
    dimension tables are ontology-sized (≤ millions), facts are
    page-mention-sized (billions);
  * the per-stage short-circuit of the reference (later stages only
    fire for still-empty keys) is semantically identical to
    coalesce-after-left-joins; Catalyst prunes columns, and the join
    fan-out is bounded by construction, so there is no wasted work to
    short-circuit;
  * stage counters (reference stats/CUIOntologyStats.java:7-33) fall
    out of ``groupBy("cui_stage").count()`` — no accumulators (those
    are at-least-once under task retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.text import CUI_PATTERN
from sifr_project_java_ontology_processing_spark.functions.uris import (
    MAPPING_PREDICATES,
    uri_fragment_code,
)

# Stage names double as the counter names of the metrics table
# (analogs of stats/CUIOntologyStats.java:7-33).
STAGE_OWN = "own_cui"
STAGE_ALT = "cui_in_alt_label"
STAGE_MAPPING = "cui_in_mappings"
STAGE_CODE = "cui_through_code"
STAGE_NONE = "remaining_without_cui"
# -mc full-UMLS fallback match (scoring.match_fallback,
# OntologyCUIProcessor.java:149-152)
STAGE_MATCH = "matched_umls_fallback"

TUI_STAGE_OWN = "own_tui"
TUI_STAGE_UMLS = "tui_from_umls_by_cui"
TUI_STAGE_MAPPING = "tui_in_mappings"
TUI_STAGE_NONE = "remaining_without_tui"

def _empty_arr():
    return F.array().cast("array<string>")


def _agg_set(df: DataFrame, key: str, value: str, out: str) -> DataFrame:
    """Pre-aggregate a candidate source to one sorted-distinct array per
    key — the TreeSet semantics of the reference (O3 determinism)."""
    return df.groupBy(F.col(key).alias("concept_iri")).agg(
        F.sort_array(F.collect_set(F.col(value))).alias(out)
    )


def _agg_sets_fused(
    sources: list[tuple[DataFrame | None, str]],
) -> DataFrame | None:
    """Fused multi-source set aggregation: N candidate streams
    ``(concept_iri, value)`` → ONE row per concept with one
    sorted-distinct array per PRESENT source (absent sources get no
    column — the caller backfills null arrays).

    This replaces N separate groupBy+broadcast-join pairs with a single
    tagged union → one hash aggregate → one join: the cascade's shuffle
    count is constant in the number of stages, at any dimension size
    (VERDICT round-1 perf note: "fuse cascade's _agg_set shuffles where
    keys align"). Per-source sets come out of conditional collect_set
    (nulls are skipped by aggregation semantics); a concept absent from
    a source gets an EMPTY array where the unfused shape produced NULL —
    both read as "stage empty" downstream (size() > 0), which the exact
    cascade oracle tests pin."""
    present = [(df, out) for df, out in sources if df is not None]
    if not present:
        return None
    tagged = None
    for i, (df, _out) in enumerate(present):
        t = df.select(
            F.col("concept_iri"),
            F.col("value").alias("_v"),
            F.lit(i).alias("_src"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    return tagged.groupBy("concept_iri").agg(
        *[
            F.sort_array(
                F.collect_set(F.when(F.col("_src") == i, F.col("_v")))
            ).alias(out)
            for i, (_df, out) in enumerate(present)
        ]
    )


# Code-property priority chain (reference code/CompositeCodeFinder.java:24-40):
# skos:notation → icd:cdCode → icpc2p:ICPCCODE, then URI-fragment fallback.
CODE_PREDICATES = [
    "http://www.w3.org/2004/02/skos/core#notation",          # SKOSNotationCodeFinder.java:23
    "http://chu-rouen.fr/cismef/ICD-10#cdCode",              # ICDCodeFinder.java
    "http://purl.lirmm.fr/ontology/ICPC2P#ICPCCODE",         # ICPC2PCodeFinder.java
]


def find_codes(
    classes: DataFrame,
    ontology_labels: DataFrame,
    code_triples: DataFrame | None = None,
) -> DataFrame:
    """Composite code finder (reference code/CompositeCodeFinder.java:24-40):
    first non-null across the prioritized code-property chain
    (CODE_PREDICATES, each "first of a TreeSet" = min, O3), then the URI
    fragment before ``_`` (code/URICodeFinder.java:16-28).

    ``ontology_labels`` rows with label_kind='notation' are the
    skos:notation source; ``code_triples`` (concept_iri, pred, code)
    optionally supplies the icd/icpc2p property assertions.
    Returns (concept_iri, code) with code possibly null.
    """
    out = classes
    stage_cols: list[str] = []

    notations = _agg_set(
        ontology_labels.where(F.col("label_kind") == "notation"),
        "concept_iri",
        "label",
        "_codes0",
    ).select("concept_iri", F.col("_codes0").getItem(0).alias("_code0"))
    out = out.join(F.broadcast(notations), "concept_iri", "left")
    stage_cols.append("_code0")

    if code_triples is not None:
        for i, pred in enumerate(CODE_PREDICATES[1:], start=1):
            dim = _agg_set(
                code_triples.where(F.col("pred") == pred).select(
                    "concept_iri", F.col("code").alias("c")
                ),
                "concept_iri",
                "c",
                f"_codes{i}",
            ).select(
                "concept_iri", F.col(f"_codes{i}").getItem(0).alias(f"_code{i}")
            )
            out = out.join(F.broadcast(dim), "concept_iri", "left")
            stage_cols.append(f"_code{i}")

    frag = uri_fragment_code(F.col("concept_iri"))
    out = out.withColumn(
        "code",
        F.coalesce(*[F.col(c) for c in stage_cols], F.when(frag != "", frag)),
    )
    return out.drop(*stage_cols)


def cui_cascade(
    classes: DataFrame,
    ontology_labels: DataFrame,
    mappings: DataFrame,
    umls_concepts: DataFrame,
    own_cuis: DataFrame | None = None,
    target_cuis: DataFrame | None = None,
    lat: str | None = None,
) -> DataFrame:
    """→ (concept_iri, code, cuis array<string>, cui_stage string).

    classes:        (concept_iri)
    ontology_labels: ONTOLOGY_LABELS schema (pref/alt/hidden/notation)
    mappings:       MAPPINGS schema
    umls_concepts:  UMLS_CONCEPTS schema (the MRCONSO dim)
    own_cuis:       (concept_iri, cui) already-asserted umls:cui triples
    target_cuis:    (concept_iri, cui) for the *target* ontology's classes
    lat:            optional UMLS language restriction (SQLUMLSDelegate
                    :166-191 with-lang vs :193-217 without)
    """
    spark_classes = find_codes(classes.select("concept_iri").distinct(), ontology_labels)

    # J1 — own CUIs
    own = (
        own_cuis.select("concept_iri", F.col("cui").alias("value"))
        if own_cuis is not None
        else None
    )

    # P4 — CUI-shaped altLabels (cuis/CUIOntologyDelegateImpl.java:123-138)
    alt = ontology_labels.where(
        (F.col("label_kind") == "alt") & F.trim(F.col("label")).rlike(CUI_PATTERN)
    ).select("concept_iri", F.trim(F.col("label")).alias("value"))

    # J2+J3 — mapping targets' CUIs (6 mapping predicates,
    # DefaultOntologyMappingDelegate.java:81-86; targets per findCUIs :201)
    if target_cuis is not None:
        mapped = (
            mappings.where(F.col("property").isin(MAPPING_PREDICATES))
            .select(F.col("source_iri").alias("concept_iri"), "target_iri")
            .join(
                F.broadcast(
                    target_cuis.select(
                        F.col("concept_iri").alias("target_iri"), "cui"
                    )
                ),
                "target_iri",
            )
            .select("concept_iri", F.col("cui").alias("value"))
        )
    else:
        mapped = None

    # J4 — UMLS by code (broadcast MRCONSO dim; DISTINCT per :177,204)
    umls = umls_concepts
    if lat is not None:
        umls = umls.where(F.col("lat") == lat)
    code_cuis = (
        spark_classes.where(F.col("code").isNotNull())
        .select("concept_iri", "code")
        .join(F.broadcast(umls.select("code", "cui")), "code")
        .select("concept_iri", F.col("cui").alias("value"))
    )

    # all four stages share the concept_iri key: ONE tagged-union hash
    # aggregate + ONE broadcast join instead of four of each
    stage_sources = [
        (own, "own_cuis"),
        (alt, "alt_cuis"),
        (mapped, "mapping_cuis"),
        (code_cuis, "code_cuis"),
    ]
    fused = _agg_sets_fused(stage_sources)
    out = spark_classes.join(F.broadcast(fused), "concept_iri", "left")
    for dim, col in stage_sources:
        if dim is None:
            out = out.withColumn(col, F.lit(None).cast("array<string>"))

    def nonempty(c: str):
        return F.size(F.col(c)) > 0

    out = out.withColumn(
        "cuis",
        F.when(nonempty("own_cuis"), F.col("own_cuis"))
        .when(nonempty("alt_cuis"), F.col("alt_cuis"))
        .when(nonempty("mapping_cuis"), F.col("mapping_cuis"))
        .when(nonempty("code_cuis"), F.col("code_cuis"))
        .otherwise(_empty_arr()),
    ).withColumn(
        "cui_stage",
        F.when(nonempty("own_cuis"), STAGE_OWN)
        .when(nonempty("alt_cuis"), STAGE_ALT)
        .when(nonempty("mapping_cuis"), STAGE_MAPPING)
        .when(nonempty("code_cuis"), STAGE_CODE)
        .otherwise(STAGE_NONE),
    )
    return out.select("concept_iri", "code", "cuis", "cui_stage")


def tui_cascade(
    cascade_out: DataFrame,
    mappings: DataFrame,
    umls_semtypes: DataFrame,
    own_tuis: DataFrame | None = None,
    target_tuis: DataFrame | None = None,
    reference_bug_compat: bool = True,
) -> DataFrame:
    """TUI cascade (reference processTUIs, OntologyCUIProcessor.java:273-297):
    own ``umls:tui`` → (CUIs found? → MRSTY by CUI) → mapping lookup → none.

    ``reference_bug_compat``: the reference queries the TARGET delegate
    with the mappings' **source** classes (:280 ``Mapping::getSourceClass``)
    where the CUI path uses targets (:201) — almost certainly a bug, kept
    reproducible behind this flag (SURVEY.md §7.4 risk 2). With
    compat=True the mapping stage therefore looks up the *source* IRI in
    the target-TUI dim (matching the reference's, usually-empty, result).

    → (concept_iri, cuis, cui_stage, tuis array<string>, tui_stage).
    """
    own = (
        own_tuis.select("concept_iri", F.col("tui").alias("value"))
        if own_tuis is not None
        else None
    )

    # MRSTY lookup for every found CUI (J5): explode bounded arrays,
    # broadcast-join the dim, re-aggregate.
    by_cui = (
        cascade_out.select("concept_iri", F.explode("cuis").alias("cui"))
        .join(F.broadcast(umls_semtypes), "cui")
        .select("concept_iri", F.col("tui").alias("value"))
    )

    if target_tuis is not None:
        key = "source_iri" if reference_bug_compat else "target_iri"
        mapped = (
            mappings.where(F.col("property").isin(MAPPING_PREDICATES))
            .select(F.col(key).alias("lookup_iri"), F.col("source_iri"))
            .join(
                F.broadcast(
                    target_tuis.select(
                        F.col("concept_iri").alias("lookup_iri"), "tui"
                    )
                ),
                "lookup_iri",
            )
            .select(F.col("source_iri").alias("concept_iri"), F.col("tui").alias("value"))
        )
    else:
        mapped = None

    # same fusion as cui_cascade: one hash aggregate + one broadcast
    # join regardless of how many TUI stages are active
    stage_sources = [
        (own, "own_tuis"),
        (by_cui, "umls_tuis"),
        (mapped, "mapping_tuis"),
    ]
    fused = _agg_sets_fused(stage_sources)
    out = cascade_out.join(F.broadcast(fused), "concept_iri", "left")
    for dim, col in stage_sources:
        if dim is None:
            out = out.withColumn(col, F.lit(None).cast("array<string>"))

    def nonempty(c: str):
        return F.size(F.col(c)) > 0

    has_cuis = F.size(F.col("cuis")) > 0
    out = out.withColumn(
        "tuis",
        F.when(nonempty("own_tuis"), F.col("own_tuis"))
        .when(has_cuis & nonempty("umls_tuis"), F.col("umls_tuis"))
        .when(~has_cuis & nonempty("mapping_tuis"), F.col("mapping_tuis"))
        .otherwise(_empty_arr()),
    ).withColumn(
        "tui_stage",
        F.when(nonempty("own_tuis"), TUI_STAGE_OWN)
        .when(has_cuis & nonempty("umls_tuis"), TUI_STAGE_UMLS)
        .when(~has_cuis & nonempty("mapping_tuis"), TUI_STAGE_MAPPING)
        .otherwise(TUI_STAGE_NONE),
    )
    return out.select(
        "concept_iri", "code", "cuis", "cui_stage", "tuis", "tui_stage"
    )


def stage_counters(cascade_out: DataFrame, stage_col: str = "cui_stage") -> DataFrame:
    """A9 — named counters as an aggregation over outcome tags
    (replaces stats/OntologyStats.java:44-56 mutable counters)."""
    return (
        cascade_out.groupBy(F.col(stage_col).alias("counter"))
        .agg(F.count(F.lit(1)).alias("value"))
        .orderBy("counter")
    )


def umls_comparison_counters(
    cascade_out: DataFrame,
    umls_concepts: DataFrame,
    lat: str | None = None,
) -> DataFrame:
    """A9 parity tail (round-1 VERDICT gap): the reference's
    ``compareCUIsToUMLS`` counters (OntologyCUIProcessor.java:235-246,
    invoked at :175-177 for every class left with >1 CUI) plus the
    ambiguous-CUI counter itself (:174
    ``CLASSES_WITH_AMBIGUOUS_CUI_STATISTIC``).

    For each ambiguous class: umls_n = |distinct CUIs UMLS maps its code
    to (lat-filtered, getUMLSCUIs :166-191)|; umls_n > |cuis| → LESS,
    umls_n < |cuis| → MORE (classes without a code are skipped by the
    null guard :236, i.e. counted ambiguous only).

    → (counter, value) rows, all three counters always present (0 when
    no class qualifies) so the stats CSV row shape is stable.
    """
    spark = cascade_out.sparkSession
    umls = umls_concepts
    if lat is not None:
        umls = umls.where(F.col("lat") == lat)
    umls_counts = umls.groupBy("code").agg(
        F.count_distinct(F.col("cui")).alias("umls_n")
    )
    ambiguous = cascade_out.where(F.size("cuis") > 1)
    compared = ambiguous.join(F.broadcast(umls_counts), "code", "left").withColumn(
        # non-null code unknown to UMLS ⇒ getUMLSCUIs returns the empty
        # set (size 0), which counts toward MORE; null code skips (:236)
        "umls_n",
        F.when(F.col("code").isNotNull(), F.coalesce("umls_n", F.lit(0))),
    )
    counts = compared.agg(
        F.count(F.lit(1)).alias("classes_with_ambiguous_cui"),
        F.sum(
            F.when(F.col("umls_n") > F.size("cuis"), 1).otherwise(0)
        ).alias("classes_with_less_cuis_than_umls"),
        F.sum(
            F.when(F.col("umls_n") < F.size("cuis"), 1).otherwise(0)
        ).alias("classes_with_more_cuis_than_umls"),
    )
    names = spark.createDataFrame(
        [
            ("classes_with_ambiguous_cui",),
            ("classes_with_less_cuis_than_umls",),
            ("classes_with_more_cuis_than_umls",),
        ],
        "counter string",
    )
    melted = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("counter"), F.coalesce(F.col(c), F.lit(0)).cast("long").alias("value"))
                    for c in (
                        "classes_with_ambiguous_cui",
                        "classes_with_less_cuis_than_umls",
                        "classes_with_more_cuis_than_umls",
                    )
                ]
            )
        ).alias("kv")
    ).select(F.col("kv.counter").alias("counter"), F.col("kv.value").alias("value"))
    # left join against the fixed name list: all three rows even if the
    # agg produced an empty frame upstream (it can't — agg always yields
    # one row — but the join keeps the contract explicit)
    return names.join(melted, "counter", "left").select(
        "counter", F.coalesce("value", F.lit(0)).alias("value")
    )


def named_classes(triples: DataFrame) -> DataFrame:
    """S2 — class scan with the reference's fallback
    (BaseOntologyDelegate.java:173-190 ``getClasses``): subjects typed
    ``owl:Class``; when the ontology declares none (pure SKOS
    vocabularies), fall back to subjects typed ``skos:Concept``.
    Blank-node subjects are excluded (listNamedClasses = named only).

    → (concept_iri). The emptiness probe is one cheap limit(1) action
    on a filtered dimension scan, not a full count."""
    from sifr_project_java_ontology_processing_spark.functions.uris import (
        OWL_CLASS,
        RDF_TYPE,
        SKOS_CONCEPT,
    )

    def _subjects_of(type_obj: str) -> DataFrame:
        return (
            triples.where(
                (F.col("pred") == RDF_TYPE)
                & (F.col("obj") == type_obj)
                & ~F.col("subj").startswith("_:")
            )
            .select(F.col("subj").alias("concept_iri"))
            .distinct()
        )

    owl = _subjects_of(OWL_CLASS)
    if owl.limit(1).isEmpty():
        return _subjects_of(SKOS_CONCEPT)
    return owl


def ontology_name_from_path(path: str) -> str:
    """F8 — ontology name from a model URL/path
    (BaseOntologyDelegate.java:74-107): URL → file part, else the
    filename; then everything before the first dot (the reference also
    strips a trailing .bz2 from the extension for format sniffing —
    irrelevant to the name)."""
    import re

    if re.match(r"^[^:]{2,6}:.*$", path):  # URL_PATTERN :36
        name = path.split("://", 1)[-1]
        name = "/" + name.split("/", 1)[1] if "/" in name else name
        name = name.rsplit("/", 1)[-1]
    else:
        name = path.replace("\\", "/").rstrip("/").rsplit("/", 1)[-1]
    return name.split(".", 1)[0] if "." in name else name


def reject_sink(cascade_out: DataFrame) -> DataFrame:
    """S11 — concepts with no CUI anywhere (reference streams them to
    ``<ont>_concepts_without_cui.txt`` under a lock,
    OntologyCUIProcessor.java:211-217; here it is just a filtered
    DataFrame the caller writes with ``write.text``)."""
    return cascade_out.where(F.col("cui_stage") == STAGE_NONE).select("concept_iri")
