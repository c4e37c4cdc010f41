"""Candidate scoring + disambiguation (SURVEY.md U1, W1; north_star
link scorer: TF-IDF context vectors + label edit distance).

Successor of the reference's Tverski similarity ranker
(ontology/matching/TverskiTermSimilarityRanker.java:37-96 — lexsema
Tverski, α=1 β=γ=0.5, bag-of-words signatures from
matching/CUITermImpl.java:15-22,59-66, scored on a fixed thread pool and
memoized in Redis) and its top-1 pick
(cli/enrichment/OntologyCUIProcessor.java:256-262: winner replaces the
whole CUI set).

Spark-first design:
  * Tversky on token sets: Arrow-batched ``pandas_udf`` (set ops aren't
    expressible as a single Catalyst expression over two token arrays
    without an explode-join shuffle; the UDF keeps it map-side).
  * Edit distance: Spark's built-in ``levenshtein`` (JVM codegen).
  * Top-1: ``row_number`` over (score desc, candidate asc) — the
    deterministic replacement for "first element after sort" (W1/O3).
  * No memoization: vectorized single pass makes the reference's Redis
    ``rscore_`` cache (TverskiTermSimilarityRanker.java:20,47-56) moot.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Reference config: alpha=1.0, beta=0.5 (TverskiTermSimilarityRanker.java:39-41)
TVERSKY_ALPHA = 1.0
TVERSKY_BETA = 0.5


def _tversky_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for sa, sb in zip(a, b):
        ta = set((sa or "").lower().split())
        tb = set((sb or "").lower().split())
        inter = len(ta & tb)
        denom = inter + TVERSKY_ALPHA * len(ta - tb) + TVERSKY_BETA * len(tb - ta)
        out.append(inter / denom if denom else 0.0)
    return pd.Series(out, dtype="float64")


_tversky_udf = None


def tversky_similarity(a, b) -> F.Column:
    """Tversky index over whitespace bag-of-words signatures:
    |A∩B| / (|A∩B| + α·|A\\B| + β·|B\\A|); 0.0 when either side empty.
    Arrow-batched pandas UDF (built lazily — registration needs an
    active session)."""
    global _tversky_udf
    if _tversky_udf is None:
        _tversky_udf = pandas_udf(_tversky_batch, "double")
    return _tversky_udf(a, b)


def link_score(desc_col: str, term_col: str) -> F.Column:
    """Combined candidate score: Tversky token overlap blended with a
    normalized-levenshtein surface similarity (north_star's
    label-edit-distance feature). Both components ∈ [0,1]."""
    lev = F.levenshtein(F.lower(F.col(desc_col)), F.lower(F.col(term_col)))
    maxlen = F.greatest(
        F.length(F.col(desc_col)), F.length(F.col(term_col)), F.lit(1)
    )
    lev_sim = 1.0 - lev / maxlen
    return 0.7 * tversky_similarity(F.col(desc_col), F.col(term_col)) + 0.3 * lev_sim


def rank_candidates(
    candidates: DataFrame,
    key: str,
    score_col: str = "score",
    tiebreak: str | None = None,
) -> DataFrame:
    """W1 — deterministic rank per key: score desc, then tiebreak asc.
    Adds ``rank``; filter ``rank == 1`` for the winner."""
    order = [F.desc(score_col)]
    if tiebreak:
        order.append(F.asc(tiebreak))
    return candidates.withColumn(
        "rank", F.row_number().over(Window.partitionBy(key).orderBy(*order))
    )


def disambiguate(
    cascade_out: DataFrame,
    concept_descriptions: DataFrame,
    umls_concepts: DataFrame,
    lat: str | None = None,
) -> DataFrame:
    """-dc semantics (OntologyCUIProcessor.java:249-263): for concepts
    with >1 candidate CUI, fetch UMLS concept-name terms for those CUIs
    (J6, with A8 signature merge: colliding (cui,lat) strings appended),
    score vs the concept description (P3 prefLabel concat), keep top-1.
    Concepts with ≤1 CUI pass through unchanged.

    concept_descriptions: (concept_iri, description)
    → cascade_out with ``cuis`` replaced by the disambiguated set and
      ``disambiguated`` boolean.
    """
    ambiguous = cascade_out.where(F.size("cuis") > 1)
    rest = cascade_out.where(F.size("cuis") <= 1).withColumn(
        "disambiguated", F.lit(False)
    )

    umls = umls_concepts
    if lat is not None:
        umls = umls.where(F.col("lat") == lat)
    # A8 — signature merge: duplicate (cui,lat) rows' strings concatenated
    # (SQLUMLSDelegate.java:220-232 via CUITermImpl.equals/append)
    terms = umls.groupBy("cui").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("str"))).alias("term")
    )

    scored = (
        ambiguous.select("concept_iri", F.explode("cuis").alias("cui"))
        .join(F.broadcast(terms), "cui", "left")
        .join(F.broadcast(concept_descriptions), "concept_iri", "left")
        .withColumn(
            "score",
            F.when(
                F.col("term").isNotNull(),
                link_score("description", "term"),
            ).otherwise(F.lit(-1.0)),
        )
    )
    winners = (
        rank_candidates(scored, "concept_iri", "score", tiebreak="cui")
        .where(F.col("rank") == 1)
        # reference: winner only replaces the set when terms existed
        # (conceptNameCUIMap non-empty, OntologyCUIProcessor.java:254-262)
        .withColumn("won", F.col("score") >= 0)
        .select("concept_iri", "cui", "won")
    )
    disamb = (
        ambiguous.join(winners, "concept_iri", "left")
        .withColumn(
            "cuis",
            F.when(F.col("won"), F.array("cui")).otherwise(F.col("cuis")),
        )
        .withColumn("disambiguated", F.coalesce(F.col("won"), F.lit(False)))
        .drop("cui", "won")
    )
    return rest.unionByName(disamb)


def match_fallback(
    cascade_out: DataFrame,
    concept_descriptions: DataFrame,
    umls_concepts: DataFrame,
    lat: str | None = None,
    max_candidates: int = 50,
    max_token_df: int | None = 10_000,
) -> DataFrame:
    """-mc semantics (OntologyCUIProcessor.java:149-152 → disambiguate
    :250-263 with EMPTY cuis): for concepts where the whole cascade
    found NOTHING (cui_stage == remaining_without_cui), score the
    concept description against the ENTIRE (lat-filtered) UMLS
    concept-name map and adopt the top-1 CUI. Distinct from -dc, which
    re-scores concepts that already have >1 candidates — round 1 wired
    both flags to disambiguate(), making -mc a silent no-op for exactly
    the concepts it exists to rescue.

    Scale: the reference linearly scans the whole UMLS term map per
    concept (getCUIConceptNameMap). A rejects × UMLS cross join is the
    one thing this engine must never emit, so candidates come from a
    TOKEN INVERTED INDEX: explode description tokens, equi-join the
    term-token index, count overlap per (concept, cui), keep the top
    ``max_candidates`` by overlap, THEN run the full scorer on that
    bounded set. ``max_token_df`` drops stop-tokens ('de', 'syndrome')
    whose posting lists would dominate the join.

    Divergence, stated: a concept whose description shares no token
    with any UMLS term gets NO match here (stays remaining_without_cui);
    the reference would 'rank' all-zero scores and adopt whatever
    sorted first — an arbitrary CUI. We keep the reject explicit.

    → cascade_out with matched rows' ``cuis`` = [winner],
      ``cui_stage`` = 'matched_umls_fallback', plus ``matched`` boolean.
    """
    from sifr_project_java_ontology_processing_spark.operators.cascade import (
        STAGE_MATCH,
        STAGE_NONE,
    )

    rejects = cascade_out.where(F.col("cui_stage") == STAGE_NONE)
    rest = cascade_out.where(F.col("cui_stage") != STAGE_NONE).withColumn(
        "matched", F.lit(False)
    )

    umls = umls_concepts
    if lat is not None:
        umls = umls.where(F.col("lat") == lat)
    # A8 signature merge, as in disambiguate()
    terms = umls.groupBy("cui").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("str"))).alias("term")
    )
    term_tokens = terms.select(
        "cui", F.explode(F.array_distinct(F.split(F.lower("term"), r"\s+"))).alias("tok")
    ).where(F.col("tok") != "")
    if max_token_df is not None:
        hot = term_tokens.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") > max_token_df
        )
        term_tokens = term_tokens.join(
            F.broadcast(hot.select("tok")), "tok", "left_anti"
        )

    desc = rejects.select("concept_iri").join(
        concept_descriptions, "concept_iri", "left"
    )
    desc_tokens = desc.select(
        "concept_iri",
        F.explode(
            F.array_distinct(F.split(F.lower(F.coalesce("description", F.lit(""))), r"\s+"))
        ).alias("tok"),
    ).where(F.col("tok") != "")

    overlap = (
        desc_tokens.join(term_tokens, "tok")
        .groupBy("concept_iri", "cui")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    shortlist = (
        rank_candidates(overlap, "concept_iri", "overlap", tiebreak="cui")
        .where(F.col("rank") <= max_candidates)
        .drop("rank")
    )
    scored = (
        shortlist.join(F.broadcast(terms), "cui")
        .join(concept_descriptions, "concept_iri", "left")
        .withColumn("score", link_score("description", "term"))
    )
    winners = (
        rank_candidates(scored, "concept_iri", "score", tiebreak="cui")
        .where((F.col("rank") == 1) & (F.col("score") > 0))
        .select("concept_iri", F.col("cui").alias("_match_cui"))
    )
    matched = (
        rejects.join(winners, "concept_iri", "left")
        .withColumn(
            "cuis",
            F.when(F.col("_match_cui").isNotNull(), F.array("_match_cui")).otherwise(
                F.col("cuis")
            ),
        )
        .withColumn(
            "cui_stage",
            F.when(F.col("_match_cui").isNotNull(), STAGE_MATCH).otherwise(
                F.col("cui_stage")
            ),
        )
        .withColumn("matched", F.col("_match_cui").isNotNull())
        .drop("_match_cui")
    )
    return rest.unionByName(matched)


def concept_descriptions(ontology_labels: DataFrame) -> DataFrame:
    """P3/A7 — concatenated prefLabel description per concept
    (BaseOntologyDelegate.java:148-170): all prefLabels joined in sorted
    order (the reference iterates Jena statements; sorting makes it
    deterministic, O3)."""
    return (
        ontology_labels.where(F.col("label_kind") == "pref")
        .groupBy("concept_iri")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_list("label"))).alias("description"))
    )
