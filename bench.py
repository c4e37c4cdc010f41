#!/usr/bin/env python3
"""Headline benchmark (driver contract): runs the flagship KG pipeline +
representative operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], prints ONE JSON line.

The KG pipeline input is the documents table deterministically wrapped
as HTML pages and amplified ×AMPLIFY (cross-join with a copy index) so
the map stages have real work at bench scale; AMPLIFY is fixed per sf
for comparable numbers across rounds.

Execution is forced with the noop sink (full computation, no driver
collect). Per-query wall seconds + derived triples/sec are reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

AMPLIFY = int(os.environ.get("SPARK_GRAFT_BENCH_AMPLIFY", "40"))

HEADLINE = [
    "mention_detect",
    "mention_detect_joined",  # round 2: no-broadcast J9 scale path
    "pricing_summary",
    "window_top1",
    "fallback_cascade",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_lsh_verified",   # round 2: the canonical LSH→verify scale path
    "ann_cosine_topk",
    "ann_ivf_topk",         # round 2: IVF scale path
    "embedding_neardup",
    "cc_components",
    "events_hourly",
    "tfidf_link_score",     # round 2: north_star TF-IDF context scorer
    "corpus_curation",      # round 2: composed curation decision
    "turtle_full_parse",    # round 3: full-Turtle render∘parse identity
    "multimodal_real_decode",  # round 3: real PNG/WAV container decode
    "fuzzy_decontaminate",  # round 4: candidate-pruned shingle verify
    "model_quality_score",  # round 4: NB log-odds subword classifier
    "ann_ivf_kmeans_topk",  # round 4: trained-codebook IVF search
    "graph_pagerank",       # round 4: iterative-join entity salience
    "paragraph_dedup",      # round 4: keep-first paragraph dedup
    "rdfs_entailment",      # round 4 cont.: broadcast-schema RDFS closure
    "graph_triangle_count", # round 4 cont.: degree-oriented wedge join
    "rdfs_plus_entail_incremental",  # round 5: bridged-closure delta
    "sparql_path_group",    # round 5: closure over a derived edge frame
    "lm_perplexity",        # round 5: CCNet bigram-LM train + score
    "gopher_quality",       # round 5: map-only quality rule suite
    "owl_sameas_consolidation",  # round 5: CC + broadcast identity rewrite
    "owl_restrictions_entail",   # round 5: restriction-rule fixpoint
    "sparql_nested_union",  # round 5: bottom-up group sub-plans
]


def amplified_pages(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from sifr_project_java_ontology_processing_spark.plans.flagship import (
        documents_as_pages,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(AMPLIFY - 1))).alias("copy")
    ).select(
        (F.col("doc_id") * AMPLIFY + F.col("copy")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return documents_as_pages(copies).repartition(cpus * 2)


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from sifr_project_java_ontology_processing_spark.plans.flagship import vocab_tables
    from sifr_project_java_ontology_processing_spark.plans.kg_pipeline import (
        run_kg_pipeline,
    )
    from sifr_project_java_ontology_processing_spark.plans.testdata_queries import (
        queries as registry,
    )
    from sifr_project_java_ontology_processing_spark.session import get_spark

    spark = get_spark(app_name="sifr-bench")
    timings: dict[str, float] = {}

    # --- flagship KG pipeline ------------------------------------------------
    pages = amplified_pages(spark, sf_dir)
    pages.cache().count()  # isolate pipeline cost from parquet scan + amplify
    dims = vocab_tables(spark)
    t0 = time.perf_counter()
    result = run_kg_pipeline(
        spark,
        pages,
        dims["ontology_labels"],
        dims["mappings"],
        dims["umls_concepts"],
        dims["umls_semtypes"],
        own_cuis=dims["own_cuis"],
        disambiguate_cuis=False,
    )
    triples = result.triples.persist()
    run_noop(triples)
    kg_sec = time.perf_counter() - t0
    timings["kg_pipeline"] = round(kg_sec, 3)
    n_triples = triples.count()  # served from cache — no recompute
    n_pages = pages.count()
    triples.unpersist()
    pages.unpersist()

    # --- operator queries ------------------------------------------------------
    reg = registry()
    for name in HEADLINE:
        fn = reg[name]
        t0 = time.perf_counter()
        run_noop(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # round 4: real-BPE counting over the FULL documents table (the
    # registry twin is fixture-bound to sf0.01 doc ids, so the bench
    # drives the distributed encoder on every doc at this sf instead)
    from sifr_project_java_ontology_processing_spark.functions.bpe import (
        bpe_token_count,
        load_fixture_merges,
    )

    t0 = time.perf_counter()
    run_noop(
        bpe_token_count(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            load_fixture_merges(),
        )
    )
    timings["bpe_token_count_full"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "kg_pages": n_pages,
                "kg_triples": n_triples,
                "triples_per_sec": round(n_triples / kg_sec, 1),
                "pages_per_sec": round(n_pages / kg_sec, 1),
                "amplify": AMPLIFY,
                # ACTUAL parallelism used, from the live session — the
                # env default is local[*], so echoing "32" when unset
                # would misstate the measurement on a non-32-core host
                "cpus": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
