"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", appendix A1.1) as one map-only Catalyst
pass — the published heuristic filter suite a web-scale LLM data
pipeline runs between extraction and dedup.

Reference parity note: the reference pipeline has no quality gate at
all (its corpus is curated CSV — see reference CorpusLoader usage);
this module is part of the training-data mandate layer, alongside
operators/textanalysis.py (repetition ratios) and
operators/quality_model.py (model-based scoring).

Scale shape: every feature is a pyspark.sql.functions expression over
the text column (split / aggregate / filter higher-order functions —
JVM-side, whole-stage codegen, zero Python). No shuffle, no UDF: the
operator composes with a parquet scan into one mapped stage and
streams at input bandwidth. The thresholds are the published
defaults, overridable per call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the Gopher stop-word presence check: a quality document contains at
# least ``min_stop_hits`` DISTINCT words from this set
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _occurrences(text: Column, needle: str) -> Column:
    """Occurrence count via length difference (no regex escape pitfalls,
    stays in codegen)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / len(needle)


def gopher_features(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append the Gopher rule features (all doubles rounded to 6 so
    results are exactly replayable relationally):

    n_words, mean_word_len, frac_alpha_words, symbol_word_ratio
    (``#`` + ``...``/``…`` per word), bullet_line_frac,
    ellipsis_line_frac, stopword_hits (distinct GOPHER_STOPWORDS
    present as whole lowercase words)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.round(
        F.aggregate(
            words, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w)
        )
        / nw,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / nw, 6
    )
    symbols = (
        _occurrences(text, "#")
        + _occurrences(text, "...")
        + _occurrences(text, "…")
    )
    symbol_ratio = F.round(symbols / nw, 6)
    lines = F.filter(
        F.split(text, "\n"), lambda ln: F.trim(ln) != ""
    )
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike("^[\\u2022\\-\\*]"),
            )
        )
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike("(\\.\\.\\.|\\u2026)$"),
            )
        )
        / n_lines,
        6,
    )
    lower_words = F.transform(words, F.lower)
    stop_hits = sum(
        (
            F.array_contains(lower_words, w).cast("int")
            for w in GOPHER_STOPWORDS
        ),
        F.lit(0),
    )
    return docs.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": mean_len,
            "frac_alpha_words": alpha_frac,
            "symbol_word_ratio": symbol_ratio,
            "bullet_line_frac": bullet_frac,
            "ellipsis_line_frac": ellipsis_frac,
            "stopword_hits": stop_hits,
        }
    )


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """``gopher_features`` + the published pass/fail verdict as a
    ``gopher_pass`` boolean (keep the row, let the caller filter —
    curation pipelines log reject reasons before dropping)."""
    feats = gopher_features(docs, text_col)
    verdict = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("frac_alpha_words") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stop_hits)
    )
    return feats.withColumn("gopher_pass", verdict)
