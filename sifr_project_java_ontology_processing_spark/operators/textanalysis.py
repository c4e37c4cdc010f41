"""Text analysis operators (task mandate): language ID, quality
scoring, token counting, document fingerprinting. All pure Catalyst
expressions — vectorized JVM-side, zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.dedup import (
    shingle_array,
    tokens,
)

# Tiny deterministic stopword marker lists per language (n-gram/stopword
# heuristic — a real model would ride a broadcast table; the operator
# shape is identical).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "und", "die", "das", "ein"],
    "es": ["el", "los", "las", "una", "y"],
}


def _count_in(text_col, words: list[str]) -> F.Column:
    toks = tokens(F.lower(text_col))
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, pred_lang, marker_hits): argmax of per-language marker
    counts, ties → lexicographically-first language, zero hits → 'und'."""
    scored = docs.select(
        id_col,
        *[
            _count_in(F.col(text_col), ws).alias(f"_c_{lang}")
            for lang, ws in sorted(LANG_MARKERS.items())
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_c_{lang}") for lang in langs])
    pred = F.lit("und")
    # iterate reversed so earlier languages win ties (when-chain priority)
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"_c_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col,
        pred.alias("pred_lang"),
        best.cast("bigint").alias("marker_hits"),
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """→ (id, fingerprint): min-md5 over word n-gram shingles — a
    content-defined rolling-hash fingerprint stable under reordering of
    document boundaries; md5(text) fallback for short docs. Replayable
    in any engine (portable hashing, same rationale as minhash)."""
    sh = shingle_array(F.col(text_col), n)
    mins = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return docs.select(
        id_col,
        F.coalesce(mins, F.md5(F.col(text_col))).alias("fingerprint"),
    )


def rolling_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mod: int = 2_147_483_647,
    mult: int = 31,
) -> DataFrame:
    """→ (id, rolling_hash): order-SENSITIVE polynomial rolling hash
    (Karp–Rabin shape) over the token stream — h = Σ vᵢ·multⁿ⁻ⁱ mod M,
    folded left as (h·mult + vᵢ) mod M with vᵢ = first 32 bits of
    md5(tokenᵢ). Complements ``doc_fingerprint`` (order-insensitive
    min-shingle): two docs with the same token multiset but different
    order get different rolling hashes.

    Map-only single fold per row, zero shuffle; md5-derived token
    values keep it engine-replayable (DuckDB ``list_reduce`` oracle).
    Bounds: acc < M = 2³¹-1, token value < 2³², so acc·31 + v < 2³⁶ —
    no bigint overflow in any dialect. Empty docs hash to 0."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import tokens

    vals = F.transform(
        tokens(F.col(text_col)),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
    )
    h = F.aggregate(
        vals,
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc * mult + v) % mod,
    )
    return docs.select(id_col, h.alias("rolling_hash"))
