"""Flagship entry: the full KG pipeline driven from the generic
``documents`` testdata table (deterministically wrapped as web pages).

This is the driver smoke-check path: documents → HTML-wrapped pages →
extraction → trie mention detection → cascade → canonicalization →
triples. The label dimension is a fixed vocabulary dictionary (the
corpus' own analytic terms), with a small deterministic mapping/UMLS
side-model so every cascade stage is exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.uris import expand
from sifr_project_java_ontology_processing_spark.plans.kg_pipeline import run_kg_pipeline

VOCAB = [
    "scan", "filter", "join", "window", "hash", "merge", "agg", "batch",
    "spark", "query", "table", "column", "row", "partition", "shuffle",
]
CONCEPT_BASE = "http://example.org/vocab#"


def documents_as_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, …) → PAGES-shaped table. The HTML
    wrapping is a pure column expression (no UDF): boilerplate template
    around the text as one paragraph; golden ``text`` = `Doc {id}\\n{text}`
    (title + paragraph, matching the extractor's block semantics)."""
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    html = F.concat(
        F.lit(
            "<html><head><title>t</title><script>junk()</script></head><body>"
            '<nav><a href="/">Home</a></nav><div class="ads">AD</div>'
            "<main><article><h1>"
        ),
        title,
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p></article></main><footer>foot</footer></body></html>"),
    )
    return documents.select(
        F.concat(F.lit("https://corpus.example/doc/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.concat(title, F.lit("\n"), F.col("text")).alias("text"),
        F.col("lang"),
    )


def vocab_tables(spark: SparkSession):
    """Deterministic dimension tables over the fixed vocabulary."""
    labels = []
    mappings = []
    umls_concepts = []
    umls_semtypes = []
    own_cuis = []
    for i, w in enumerate(VOCAB):
        iri = f"{CONCEPT_BASE}{w.upper()}{i:02d}"
        labels.append((iri, w, "pref", "en"))
        code = f"{chr(ord('A') + i % 26)}{i % 10}{(i * 3) % 10}{(i * 7) % 10}"
        labels.append((iri, code, "notation", ""))
        if i % 3 == 0:
            own_cuis.append((iri, f"C{5000000 + i:07d}"))
        elif i % 3 == 1:
            labels.append((iri, f"C{5100000 + i:07d}", "alt", ""))
        else:
            umls_concepts.append((code, f"C{5200000 + i:07d}", "ENG", f"{w} concept"))
            umls_semtypes.append((f"C{5200000 + i:07d}", f"T{100 + i:03d}"))
        if i % 4 == 2 and i + 1 < len(VOCAB):
            nxt = f"{CONCEPT_BASE}{VOCAB[i + 1].upper()}{i + 1:02d}"
            mappings.append((iri, expand("skos:exactMatch"), nxt))
    mk = spark.createDataFrame
    return {
        "ontology_labels": mk(labels, "concept_iri string, label string, label_kind string, lang string"),
        "mappings": mk(
            mappings or [("x", "y", "z")],
            "source_iri string, property string, target_iri string",
        ),
        "umls_concepts": mk(
            umls_concepts or [("_", "_", "ENG", "_")],
            "code string, cui string, lat string, str string",
        ),
        "umls_semtypes": mk(
            umls_semtypes or [("_", "_")], "cui string, tui string"
        ),
        "own_cuis": mk(
            own_cuis or [("_", "_")], "concept_iri string, cui string"
        ),
    }


def flagship_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = documents_as_pages(docs)
    dims = vocab_tables(spark)
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
    return result.triples
