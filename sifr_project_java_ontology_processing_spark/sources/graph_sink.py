"""Partitioned graph-table sink (north_rule: "materialized into
partitioned Iceberg graph tables for nodes and edges").

Partition scheme (Iceberg hidden-partitioning stand-in on parquet):
  * triples/edges partitioned by ``pred_kind`` — the low-cardinality
    predicate class (mention | type | cui | tui | sty | other), so a
    reader of one triple kind prunes every other kind's files;
  * within a partition, files are written pre-sorted by subj
    (``sortWithinPartitions``) for row-group min/max pruning on point
    lookups;
  * nodes bucketed implicitly by the writer's task partitioning.

On a real cluster with Iceberg jars, swap ``.write.parquet`` for
``.writeTo(...).partitionedBy(...)`` — column derivations are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.uris import (
    RDF_TYPE,
    SIFR_MENTION,
    UMLS_CUI,
    UMLS_HAS_STY,
    UMLS_TUI,
)

_KIND = {
    SIFR_MENTION: "mention",
    RDF_TYPE: "type",
    UMLS_CUI: "cui",
    UMLS_TUI: "tui",
    UMLS_HAS_STY: "sty",
}


def with_pred_kind(df: DataFrame, pred_col: str = "pred") -> DataFrame:
    expr = F.lit("other")
    for uri, kind in _KIND.items():
        expr = F.when(F.col(pred_col) == uri, kind).otherwise(expr)
    return df.withColumn("pred_kind", expr)


def write_triples(triples: DataFrame, path: str) -> None:
    (
        with_pred_kind(triples)
        .sortWithinPartitions("subj")
        .write.mode("overwrite")
        .partitionBy("pred_kind")
        .parquet(path)
    )


def write_edges(edges: DataFrame, path: str) -> None:
    (
        with_pred_kind(edges)
        .sortWithinPartitions("src")
        .write.mode("overwrite")
        .partitionBy("pred_kind")
        .parquet(path)
    )


def write_nodes(nodes: DataFrame, path: str) -> None:
    nodes.sortWithinPartitions("canonical_iri").write.mode("overwrite").parquet(path)


def write_quads(quads: DataFrame, path: str) -> None:
    """Quads table partitioned BY GRAPH (then pred_kind): a
    ``GRAPH <iri>`` query or a FROM/FROM NAMED dataset clause becomes a
    partition-directory prune — the named-graph slice never reads the
    other graphs' files. NULL graph (default graph) lands in the
    writer's ``__HIVE_DEFAULT_PARTITION__`` directory and reads back as
    NULL, so the default-graph view prunes too. Same Iceberg swap note
    as write_triples."""
    (
        with_pred_kind(quads)
        .sortWithinPartitions("subj")
        .write.mode("overwrite")
        .partitionBy("graph", "pred_kind")
        .parquet(path)
    )


def read_quads(spark, path: str) -> DataFrame:
    """Read a write_quads table back into the QUADS column order
    (partition columns come back last; execute_bgp only needs the
    ``graph`` column present)."""
    df = spark.read.parquet(path)
    cols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "graph"]
    return df.select(*cols)
