"""sifr_project_java_ontology_processing_spark — a PySpark-native
knowledge-graph construction engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference `gsanou/sifr_project_java_ontology_processing` (a single-JVM
Java/Jena ontology-enrichment pipeline): ontology-grounded triple
extraction over web-page tables, dictionary-driven mention detection,
CUI/TUI enrichment cascades, similarity-based disambiguation, SKOS
generation, canonicalization via connected components, plus the
training-data-pipeline operators (dedup, ANN similarity search, text
quality analysis, multimodal plumbing) that a 100 TB corpus needs.

Design principles (see SURVEY.md):
  * DataFrame/Catalyst-first — declarative plans, no driver-side loops
    over collected data in any hot path.
  * Broadcast dimension joins replace the reference's Redis-memoized
    point lookups (SURVEY.md §4.1).
  * Arrow-batched pandas UDFs only where built-ins can't express the
    semantics (HTML extraction, trie mention matching).
  * Explicit skew handling (salting helpers), AQE on by default.
  * Checkpoint/resume as snapshot-based batch stages, not streaming.
"""

from sifr_project_java_ontology_processing_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
