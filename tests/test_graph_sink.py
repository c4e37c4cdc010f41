"""Partitioned graph-table sink: the partition scheme must actually
DELIVER pruning — a reader of one triple kind skips every other kind's
files (the Iceberg-hidden-partitioning property the north_star asks
for, verified on the parquet stand-in)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.uris import (
    RDF_TYPE,
    SIFR_MENTION,
    UMLS_CUI,
)
from sifr_project_java_ontology_processing_spark.sources.graph_sink import (
    with_pred_kind,
    write_edges,
    write_triples,
)


def _triples(spark):
    rows = [
        (f"http://p/{i}", pred, f"http://o/{i}", None, False, None)
        for i in range(30)
        for pred in (SIFR_MENTION, RDF_TYPE, UMLS_CUI, "http://other/p")
    ]
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string",
    )


def test_triples_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "graph_triples")
    write_triples(_triples(spark), out)
    back = spark.read.parquet(out)
    q = back.where(F.col("pred_kind") == "mention")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the kind filter must land in PartitionFilters (file skipping),
    # not as a post-scan Filter over all kinds
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "pred_kind" in pf, plan
    assert q.count() == 30
    assert {r["pred"] for r in q.collect()} == {SIFR_MENTION}
    # round-trip completeness: nothing lost across partitions
    assert back.count() == 120


def test_edges_partition_pruning_and_sort(spark, tmp_path):
    edges = _triples(spark).select(
        F.col("subj").alias("src"), "pred", F.col("obj").alias("dst")
    )
    out = str(tmp_path / "graph_edges")
    write_edges(edges, out)
    back = spark.read.parquet(out)
    q = back.where(F.col("pred_kind") == "cui")
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "pred_kind" in pf, plan
    assert q.count() == 30


def test_with_pred_kind_classification(spark):
    df = _triples(spark)
    kinds = {
        r["pred"]: r["pred_kind"]
        for r in with_pred_kind(df).select("pred", "pred_kind").distinct().collect()
    }
    assert kinds[SIFR_MENTION] == "mention"
    assert kinds[RDF_TYPE] == "type"
    assert kinds[UMLS_CUI] == "cui"
    assert kinds["http://other/p"] == "other"
