"""Entity-link scoring: TF-IDF context vectors (north_star: "candidate
entity-link scoring via TF-IDF context vectors plus label-edit-distance
features" — operators/scoring.link_score supplies the edit-distance
half; this module supplies the context-vector half).

No reference analog (the reference scores ontology labels against
ontology terms, never against page context); this is the north_star's
own stage. Design is pure Catalyst — explode/groupBy/join, no UDF:

    1. corpus DF statistics: one pass over (doc, token) pairs →
       per-token document frequency → idf = ln((N+1)/(df+1)) + 1
       (smoothed, strictly positive).
    2. document context vectors: tf(token, doc) × idf, L2-normalized.
    3. candidate descriptions get the same vectorization (broadcast —
       the concept dimension is ontology-sized).
    4. score(doc, concept) = cosine = Σ_shared w_doc·w_desc — computed
       as an equi-join on token + groupBy (doc, concept): shuffle keyed
       on token then on the pair, never a doc × concept product.

Scale: the token join's fan-out is bounded by stop-token removal
(``max_token_df``), the same guardrail as scoring.match_fallback and
dedup's stop-shingle cap. IDF weighting makes hot tokens nearly
worthless anyway — dropping them changes scores by ε while removing the
quadratic blowup; the cap is honest about that trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, tf) — lowercased whitespace tokens with counts."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def idf_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_df: int | None = None,
) -> DataFrame:
    """(token, idf): smoothed inverse document frequency over the
    corpus, idf = ln((N+1)/(df+1)) + 1. ``max_token_df`` drops
    stop-tokens entirely (df above cap) — the scale guardrail."""
    n_docs = docs.count()
    df_counts = (
        _doc_tokens(docs, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    if max_token_df is not None:
        df_counts = df_counts.where(F.col("df") <= max_token_df)
    return df_counts.select(
        "token",
        (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )


def tfidf_vectors(
    df: DataFrame,
    idf: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_idf: bool = False,
) -> DataFrame:
    """(id, token, w): L2-normalized tf·idf weights. Tokens absent from
    the idf table (stop-dropped or unseen) vanish — exactly the ε the
    cap trades away."""
    idf_side = F.broadcast(idf) if broadcast_idf else idf
    weighted = (
        _doc_tokens(df, id_col, text_col)
        .join(idf_side, "token")
        .select(F.col(id_col), "token", (F.col("tf") * F.col("idf")).alias("w_raw"))
    )
    # L2 norm via a window over id — NOT a groupBy + self-join: Spark
    # does not dedupe the two references to `weighted`, so the join
    # shape re-ran the whole tokenize→idf-join pipeline a second time
    # (visible as doubled scans in the executed plan). One id-keyed
    # window = one exchange, zero recompute; per-id row counts are
    # bounded by distinct tokens per document, so no skew risk.
    w_id = Window.partitionBy(id_col)
    return weighted.select(
        F.col(id_col),
        "token",
        (
            F.col("w_raw")
            / F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw")).over(w_id))
        ).alias("w"),
    )


def tfidf_link_scores(
    docs: DataFrame,
    candidates: DataFrame,
    descriptions: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    concept_id: str = "concept_iri",
    desc_col: str = "description",
    max_token_df: int | None = None,
) -> DataFrame:
    """Cosine(TF-IDF(document context), TF-IDF(concept description))
    for each candidate (doc, concept) pair.

    candidates:   (doc_id, concept_iri) — e.g. distinct mention pairs
    descriptions: (concept_iri, description)
    → (doc_id, concept_iri, tfidf_cosine) rounded(6); pairs with zero
      token overlap score 0.0 (kept — a candidate with no contextual
      support is a signal, not a missing row).

    Plan shape: both vectorizations share ONE corpus idf table; the
    score join is token-keyed (doc side) × broadcast (description side
    is ontology-dimension), then one groupBy on the candidate pair. No
    doc × concept product anywhere."""
    idf = idf_table(docs, doc_id, text_col, max_token_df=max_token_df)
    # semi-join to candidate docs BEFORE vectorizing: the token join's
    # fan-out must be bounded by |candidate docs|, not |corpus| —
    # scoring docs nobody asked about is pure wasted shuffle
    cand_docs = candidates.select(doc_id).distinct()
    doc_vecs = tfidf_vectors(
        docs.join(cand_docs, doc_id, "left_semi"), idf, doc_id, text_col
    )
    desc_vecs = tfidf_vectors(descriptions, idf, concept_id, desc_col, broadcast_idf=False)

    pair_overlap = (
        doc_vecs.join(
            F.broadcast(desc_vecs.withColumnRenamed("w", "w_desc")), "token"
        )
        .select(doc_id, concept_id, (F.col("w") * F.col("w_desc")).alias("contrib"))
        .groupBy(doc_id, concept_id)
        .agg(F.sum("contrib").alias("cos"))
    )
    return (
        candidates.join(pair_overlap, [doc_id, concept_id], "left")
        .select(
            doc_id,
            concept_id,
            F.round(F.coalesce("cos", F.lit(0.0)), 6).alias("tfidf_cosine"),
        )
    )


def score_mentions(
    extracted: DataFrame,
    mentions: DataFrame,
    descriptions: DataFrame,
    labels: DataFrame | None = None,
    max_token_df: int | None = 10_000,
) -> DataFrame:
    """north_star link scorer over detected mentions: TF-IDF context
    cosine (page text vs concept description) blended with a
    label-edit-distance surface feature. Opt-in pipeline stage
    (kg_pipeline score_links=True).

    extracted:    (url, extracted_text, …) — stage-1 output
    mentions:     MENTIONS schema (url, surface, concept_iri, …)
    descriptions: (concept_iri, description)
    labels:       optional (concept_iri, label, …) — when given,
                  surface_sim is the BEST edit-similarity over the
                  concept's individual labels (an exact label match
                  scores 1.0). Without it, the surface is compared to
                  the concatenated description, which punishes
                  multi-label concepts (round-2 review finding).
    → (url, concept_iri, surface, tfidf_cosine, surface_sim, link_score)
      one row per distinct (url, concept, surface)."""
    cands = mentions.select("url", "concept_iri", "surface").distinct()
    ctx = tfidf_link_scores(
        extracted.select("url", "extracted_text"),
        cands.select("url", "concept_iri").distinct(),
        descriptions,
        doc_id="url",
        text_col="extracted_text",
        max_token_df=max_token_df,
    )

    def _lev_sim(a, b) -> F.Column:
        lev = F.levenshtein(F.lower(a), F.lower(b))
        maxlen = F.greatest(F.length(a), F.length(b), F.lit(1))
        return 1.0 - lev / maxlen

    if labels is not None:
        lab = labels.select("concept_iri", "label").distinct()
        best = (
            cands.join(F.broadcast(lab), "concept_iri")
            .select(
                "url", "concept_iri", "surface",
                _lev_sim(F.col("surface"), F.col("label")).alias("_sim"),
            )
            .groupBy("url", "concept_iri", "surface")
            .agg(F.max("_sim").alias("_surface_sim"))
        )
        scored = cands.join(best, ["url", "concept_iri", "surface"], "left").join(
            ctx, ["url", "concept_iri"]
        )
        surface_sim = F.coalesce("_surface_sim", F.lit(0.0))
    else:
        scored = cands.join(ctx, ["url", "concept_iri"]).join(
            F.broadcast(descriptions), "concept_iri", "left"
        )
        surface_sim = _lev_sim(F.col("surface"), F.coalesce("description", F.lit("")))
    return scored.select(
        "url",
        "concept_iri",
        "surface",
        "tfidf_cosine",
        F.round(surface_sim, 6).alias("surface_sim"),
        # 0.7/0.3: context dominates (it disambiguates same-surface
        # candidates, where surface_sim ties by construction), surface
        # breaks context ties between near-identical concepts. The
        # blend is validated by evaluate_link_quality's pytest gate
        # (tests/test_linkscore.py): blended accuracy ≥ either feature
        # alone on the labeled golden set.
        F.round(0.7 * F.col("tfidf_cosine") + 0.3 * surface_sim, 6).alias("link_score"),
    )


def evaluate_link_quality(
    scored: DataFrame,
    golden: DataFrame,
    score_col: str = "link_score",
) -> DataFrame:
    """Link-quality harness (round-3 VERDICT #6): precision/recall of
    argmax-per-mention linking against a labeled golden set.

    scored: ``score_mentions`` output — one row per candidate
            (url, surface, concept_iri) with ``score_col``.
    golden: (url, surface, concept_iri) — the CORRECT concept per
            mention occurrence (one row per (url, surface)).

    The prediction for each (url, surface) is the top-scored candidate
    (ties broken by ascending concept_iri — deterministic). →
    one row: (n_gold, n_pred, n_correct, precision, recall).

    precision = correct / mentions with a prediction;
    recall    = correct / |golden| (a golden mention with no candidate
    row counts against recall, not precision).

    Scale shape: one window over (url, surface) — candidate fan-in per
    mention is generator-bounded (top-k candidates), so no skew."""
    w = Window.partitionBy("url", "surface").orderBy(
        F.desc(score_col), F.asc("concept_iri")
    )
    pred = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "surface", F.col("concept_iri").alias("pred_iri"))
    )
    g = golden.select("url", "surface", F.col("concept_iri").alias("gold_iri"))
    joined = g.join(pred, ["url", "surface"], "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_gold"),
        F.count("pred_iri").alias("n_pred"),
        # coalesce: with ZERO predictions the sum is over all-NULLs and
        # would return NULL — the no-candidates regression this harness
        # gates must read as 0 correct, not as a None that breaks the
        # pytest comparison
        F.coalesce(
            F.sum((F.col("pred_iri") == F.col("gold_iri")).cast("int")), F.lit(0)
        ).alias("n_correct"),
    ).select(
        "n_gold",
        "n_pred",
        "n_correct",
        F.round(F.col("n_correct") / F.greatest("n_pred", F.lit(1)), 6).alias(
            "precision"
        ),
        F.round(F.col("n_correct") / F.greatest("n_gold", F.lit(1)), 6).alias(
            "recall"
        ),
    )
