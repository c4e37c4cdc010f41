"""Fixed StructType schemas for every engine table (SURVEY.md §1.5).

The reference keeps its schema implicit in Jena property-URI constants
(reference: ontology/BaseOntologyDelegate.java:42-43,
cuis/CUIOntologyDelegateImpl.java:19-21,
mapping/DefaultOntologyMappingDelegate.java:27-32). Here every table is
an explicit StructType; language tags and XSD datatypes are first-class
columns instead of the reference's embedded ``"lit"@fr`` /
``lit^^xsd:string`` suffixes (which it parses back by regex,
cuis/CUIOntologyDelegateImpl.java:23-24).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Input fact table (BASELINE.json input_hint) -------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# --- Triple store (reference: BaseOntologyDelegate.java:235-254) ---------
TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), True),
        StructField("obj_lang", StringType(), True),
        StructField("obj_is_literal", BooleanType(), True),
        StructField("src_url", StringType(), True),
    ]
)

# --- Ontology label dimension (SKOS label surface) ------------------------
# reference: BaseOntologyDelegate.java:42-43 (pref/alt),
# cli/OWLOntologyCleaner.java:111 (hidden), code/SKOSNotationCodeFinder.java:23
ONTOLOGY_LABELS = StructType(
    [
        StructField("concept_iri", StringType(), False),
        StructField("label", StringType(), False),
        StructField("label_kind", StringType(), False),  # pref|alt|hidden|notation
        StructField("lang", StringType(), True),
    ]
)

# --- Interportal mappings (reference: mapping/DefaultMapping.java:4-20) ---
MAPPINGS = StructType(
    [
        StructField("source_iri", StringType(), False),
        StructField("property", StringType(), False),
        StructField("target_iri", StringType(), False),
    ]
)

# --- UMLS dimensions (reference: ontology/umls/SQLUMLSDelegate.java) -------
UMLS_CONCEPTS = StructType(
    [
        StructField("code", StringType(), False),
        StructField("cui", StringType(), False),
        StructField("lat", StringType(), True),  # ENG|FRE|... (UMLSLanguageCode.java)
        StructField("str", StringType(), True),
    ]
)

UMLS_SEMTYPES = StructType(
    [
        StructField("cui", StringType(), False),
        StructField("tui", StringType(), False),
    ]
)

# --- Mention/link intermediates -------------------------------------------
MENTIONS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("span_start", IntegerType(), False),
        StructField("span_end", IntegerType(), False),
        StructField("surface", StringType(), False),
        StructField("concept_iri", StringType(), False),
        StructField("label_kind", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("part_id", IntegerType(), True),
    ]
)

# --- Graph output tables ---------------------------------------------------
NODES = StructType(
    [
        StructField("iri", StringType(), False),
        StructField("canonical_iri", StringType(), False),
        StructField("kind", StringType(), True),
    ]
)

EDGES = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("src_url", StringType(), True),
    ]
)

# --- Metrics / lineage (reference: stats/OntologyStats.java:28-84) ---------
METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("part_id", IntegerType(), False),
        StructField("counter", StringType(), False),
        StructField("value", LongType(), False),
    ]
)

# --- Training-data tables (testdata) ---------------------------------------
DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

# --- Multimodal blob table (plumbing; decode stubbed — see operators/multimodal)
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("url", StringType(), True),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
        StructField("meta_codec", StringType(), True),
    ]
)
