"""Text analysis operators (task mandate): language ID, quality
scoring, token counting, document fingerprinting. All pure Catalyst
expressions — vectorized JVM-side, zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def lang_pred_cols(text: Column) -> tuple[Column, Column]:
    """(pred_lang, marker_hits) as pure COLUMN expressions over a text
    column — argmax of per-language marker counts, ties →
    lexicographically-first language, zero hits → 'und'. Inline-able
    into any select (no extra scan or join)."""
    langs = sorted(LANG_MARKERS)
    counts = {lang: _count_in(text, LANG_MARKERS[lang]) for lang in langs}
    best = F.greatest(*[counts[lang] for lang in langs])
    pred = F.lit("und")
    # iterate reversed so earlier languages win ties (when-chain priority)
    for lang in reversed(langs):
        pred = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return pred, best.cast("bigint")


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, pred_lang, marker_hits); see :func:`lang_pred_cols`."""
    pred, hits = lang_pred_cols(F.col(text_col))
    return docs.select(
        id_col, pred.alias("pred_lang"), hits.alias("marker_hits")
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


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word-level n-grams of ``text`` (space-tokenized,
    empties dropped) as an array of space-joined strings. Pure codegen
    expressions — no UDF. Empty when the text has fewer than n tokens."""
    toks = F.filter(F.split(F.lower(text), " "), lambda x: x != "")

    # let-bind the token array (single-element transform): no CSE
    # happens inside higher-order lambdas, so slice(toks, i, n) would
    # re-tokenize the text once per n-gram index — O(n²) per doc
    def _grams(ts):
        k = F.size(ts) - (n - 1)
        return F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.array_distinct(F.element_at(F.transform(F.array(toks), _grams), 1))


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing any
    word n-gram with a benchmark/test set (the standard n-gram-overlap
    contamination check run before training on web text).

    → (id, n_contaminated, is_contaminated) for EVERY corpus doc.
    ``n_contaminated`` counts the doc's DISTINCT n-grams that appear
    anywhere in the benchmark (multiplicity within a doc is ignored —
    one leaked 8-gram repeated ten times is one leak).

    Scale shape: the benchmark n-gram dictionary is test-set-sized →
    broadcast; corpus n-grams are a map-side explode; the only shuffle
    is the per-doc hit count (partial-aggregated). Never a corpus ×
    benchmark product."""
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(bench_text), n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_c"), F.lit(0)).alias("n_contaminated"),
            (F.coalesce(F.col("_c"), F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def repetition_ratios(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, map-only pure
    expressions: → (id, dup_bigram_frac, top_token_frac).

      * ``dup_bigram_frac`` — fraction of token bigrams that are
        repeats of an earlier bigram (1 − distinct/total); boilerplate
        and looping generations score high.
      * ``top_token_frac`` — share of the single most frequent token
        (mode) in the token stream.

    Both replay exactly in SQL (registry oracle). The per-row mode is
    O(n·distinct) array work — bounded by document length, no shuffle."""
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)

    # both features let-bind the token array (single-element transform):
    # no CSE inside higher-order lambdas, so element_at(toks, i) /
    # filter(toks, ...) would re-tokenize the text per index / per
    # distinct token — O(n²) (and O(n·d·n) for the mode) per doc
    def _bigrams(ts):
        n1 = F.size(ts) - 1
        return F.when(
            F.size(ts) >= 2,
            F.zip_with(
                F.slice(ts, 1, n1),
                F.slice(ts, 2, n1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bg = F.element_at(F.transform(F.array(toks), _bigrams), 1)
    n_bg = F.size(bg)
    dup_frac = F.when(n_bg == 0, F.lit(0.0)).otherwise(
        (n_bg - F.size(F.array_distinct(bg))) / n_bg.cast("double")
    )
    mode_count = F.element_at(
        F.transform(
            F.array(toks),
            lambda ts: F.array_max(
                F.transform(
                    F.array_distinct(ts),
                    lambda d: F.size(F.filter(ts, lambda x: x == d)),
                )
            ),
        ),
        1,
    )
    top_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        mode_count / n.cast("double")
    )
    return docs.select(
        id_col,
        F.round(dup_frac, 6).alias("dup_bigram_frac"),
        F.round(top_frac, 6).alias("top_token_frac"),
    )


def _nfkc_clean(s: str) -> str:
    """Pure function: one document's normalization (tested directly;
    the distributed twin maps it over Arrow batches)."""
    import re as _re
    import unicodedata as _u

    s = _u.normalize("NFKC", s)
    # drop control/format chars (Cc/Cf: zero-width spaces/joiners, BOM,
    # bidi marks, raw control bytes) EXCEPT \n and \t, which carry
    # document structure
    s = "".join(
        ch
        for ch in s
        if ch in "\n\t" or _u.category(ch) not in ("Cc", "Cf")
    )
    s = _re.sub(r"[ \t]+", " ", s)       # space/tab runs → one space
    s = _re.sub(r" ?\n ?", "\n", s)      # spaces hugging a newline
    s = _re.sub(r"\n{3,}", "\n\n", s)    # 3+ blank lines → one blank
    return s.strip()


def normalize_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode text normalization — the standard pre-tokenization pass
    of a training-data pipeline (task mandate, text-analysis family):

    * NFKC normalization (ligatures ``ﬁ``→``fi``, fullwidth ``Ａ``→A,
      circled digits, compatibility forms) so dedup/token counts see
      one lexical form per grapheme;
    * control/format characters stripped (zero-width space/joiner,
      BOM, bidi embedding marks — classic web-crawl junk that splits
      tokens invisibly) with ``\\n``/``\\t`` preserved as structure;
    * whitespace canonicalized: space/tab runs collapse to one space,
      spaces hugging newlines drop, ≥3 consecutive newlines collapse
      to a paragraph break, outer whitespace trimmed.

    → every input row with ``text`` replaced by its normalized form and
    ``text_changed`` marking rows the pass altered (cheap drift metric:
    ``sum(text_changed)`` per partition rides the lineage table).
    NULL text stays NULL (``text_changed`` false) — the same
    never-drop-rows stance as curate_corpus.

    Scale shape: map-only ``mapInPandas`` (Arrow batches; unicodedata
    is per-string Python, ~1M docs/s/core on web-length texts), zero
    shuffle, columns beyond (id, text) pass through untouched."""
    import pandas as pd

    out_fields = []
    for f in docs.schema.fields:
        out_fields.append(f"`{f.name}` {f.dataType.simpleString()}")
    schema = ", ".join(out_fields) + ", `text_changed` boolean"
    names = [f.name for f in docs.schema.fields]

    def _batches(it):
        for pdf in it:
            texts = pdf[text_col]
            norm = texts.map(lambda s: _nfkc_clean(s) if s is not None else None)
            out = pdf[names].copy()
            out[text_col] = norm
            out["text_changed"] = [
                a is not None and a != b for a, b in zip(texts, norm)
            ]
            yield out

    return docs.mapInPandas(_batches, schema=schema)
