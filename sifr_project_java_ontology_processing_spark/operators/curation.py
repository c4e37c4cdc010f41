"""End-to-end corpus curation: the decision a training-data pipeline
actually materializes — per document, keep or drop, and why.

Composes the individual operators this engine already oracle-gates
(exact dedup keeper, n-gram decontamination, heuristic quality, n-gram
language ID) into one kept/dropped view with a deterministic priority
of drop reasons:

    exact_dup > contaminated > quality > lang

Scale shape: one window shuffle on the content hash (exact dedup), one
broadcast join against the benchmark n-gram dictionary plus a
partial-aggregated hit count (decontamination), map-side quality and
language features — no corpus × corpus or corpus × benchmark product
anywhere. The whole decision is replayed in SQL by the
``corpus_curation`` registry oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.textanalysis import (
    lang_pred_cols,
    ngram_decontaminate,
)

STOPWORDS = ["the", "a", "of", "and", "to"]


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    allowed_langs: tuple[str, ...] = ("en",),
    n: int = 8,
) -> DataFrame:
    """→ (id, keeper, drop_reason, is_kept) for EVERY corpus doc.

    ``drop_reason`` is '' for kept docs, else the highest-priority
    failing check: 'exact_dup' (not the min-id of its content-hash
    group), 'contaminated' (shares a word n-gram with the benchmark),
    'quality' (too short or stopword-starved), 'lang' (predicted
    language not allowed)."""
    # quality and language are pure row-wise expressions — computed
    # inline on the SAME scan as the keeper window, never joined back
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    n_tok = F.size(toks)
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) / n_tok.cast("double")
    )
    quality_fail = (n_tok < min_tokens) | (stop_ratio < min_stopword_ratio)
    pred_lang, _hits = lang_pred_cols(F.col(text_col))

    w = Window.partitionBy(F.md5(F.col(text_col)))
    base = docs.select(
        F.col(id_col),
        F.min(F.col(id_col)).over(w).alias("keeper"),
        quality_fail.alias("_qfail"),
        pred_lang.alias("pred_lang"),
    )

    cont = ngram_decontaminate(docs, benchmark, id_col, text_col, n=n).select(
        id_col, "is_contaminated"
    )

    out = base.join(cont, id_col)
    reason = (
        F.when(F.col(id_col) != F.col("keeper"), "exact_dup")
        .when(F.col("is_contaminated"), "contaminated")
        .when(F.col("_qfail"), "quality")
        .when(~F.col("pred_lang").isin(*allowed_langs), "lang")
        .otherwise("")
    )
    return out.select(
        F.col(id_col),
        F.col("keeper"),
        reason.alias("drop_reason"),
        (reason == "").alias("is_kept"),
    )
