"""Multilingual label cleanup — the reference's ``OWLOntologyCleaner``
entry point (SURVEY.md §3.3, W3/P9/F2/E3/E4) as DataFrame transforms
over the ONTOLOGY_LABELS dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.text import (
    camelcase_split,
    norm_eq,
)


def keep_target_language(
    labels: DataFrame, target_lang: str = "en",
    entity_col: str = "concept_iri", kind_col: str = "label_kind",
) -> DataFrame:
    """W3 (reference cli/OWLOntologyCleaner.java:169-247): per
    (entity, property) group — if ANY literal carries the target
    language, drop that group's literals in other languages; else keep
    all. Empty-string language is always kept (reference :189,225
    treats untagged literals as keep-always)."""
    w = Window.partitionBy(entity_col, kind_col)
    has_target = F.max(
        F.when(F.col("lang") == target_lang, 1).otherwise(0)
    ).over(w)
    return (
        labels.withColumn("_has_target", has_target)
        .where(
            (F.col("_has_target") == 0)
            | (F.col("lang") == target_lang)
            | (F.col("lang") == "")
        )
        .drop("_has_target")
    )


def synthesize_pref_labels(
    labels: DataFrame, lang: str = "fr"
) -> DataFrame:
    """Ontopneumo-style prefLabel synthesis (reference :95-167): for
    concepts with no prefLabel, synthesize one from an altLabel if
    present, else from a hiddenLabel via CamelCase split + domain
    fix-ups (F2), tagged ``@lang``. Deterministic pick: min label."""
    has_pref = (
        labels.where(F.col("label_kind") == "pref")
        .select("concept_iri")
        .distinct()
    )
    candidates = labels.where(F.col("label_kind").isin("alt", "hidden")).join(
        has_pref, "concept_iri", "left_anti"
    )
    w = Window.partitionBy("concept_iri").orderBy(
        # alt preferred over hidden, then lexicographic min (O3)
        F.when(F.col("label_kind") == "alt", 0).otherwise(1).asc(),
        F.asc("label"),
    )
    picked = (
        candidates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "concept_iri",
            F.when(
                F.col("label_kind") == "hidden", camelcase_split(F.col("label"))
            )
            .otherwise(F.col("label"))
            .alias("label"),
        )
        .select(
            "concept_iri",
            "label",
            F.lit("pref").alias("label_kind"),
            F.lit(lang).alias("lang"),
        )
    )
    return labels.unionByName(picked)


def drop_alt_equal_pref(labels: DataFrame) -> DataFrame:
    """E3 (reference cuis/CUIOntologyDelegateImpl.java:140-162 driven by
    OntologyCUIProcessor.java:362-367): remove altLabels equal to the
    concept's prefLabel modulo case/trim — join + anti-join, no mutation."""
    prefs = labels.where(F.col("label_kind") == "pref").select(
        "concept_iri", F.col("label").alias("_pref")
    )
    alts = labels.where(F.col("label_kind") == "alt")
    dupes = alts.join(prefs, "concept_iri").where(
        norm_eq(F.col("label"), F.col("_pref"))
    ).select("concept_iri", "label", "label_kind", "lang")
    return labels.join(
        dupes, ["concept_iri", "label", "label_kind", "lang"], "left_anti"
    )


def promote_code_to_pref(labels: DataFrame, codes: DataFrame) -> DataFrame:
    """E4 (reference CUIOntologyDelegateImpl.java:164-187, -cpl flag):
    new prefLabel = ``"code - oldPref"``; the old prefLabel is demoted to
    altLabel. codes: (concept_iri, code)."""
    joined = labels.join(F.broadcast(codes), "concept_iri", "left")
    is_pref = (F.col("label_kind") == "pref") & F.col("code").isNotNull()
    rewritten = joined.select(
        "concept_iri",
        F.when(is_pref, F.concat(F.col("code"), F.lit(" - "), F.col("label")))
        .otherwise(F.col("label"))
        .alias("label"),
        "label_kind",
        "lang",
    )
    demoted = joined.where(is_pref).select(
        "concept_iri",
        F.col("label"),
        F.lit("alt").alias("label_kind"),
        "lang",
    )
    return rewritten.unionByName(demoted)
