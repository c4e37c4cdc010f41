"""Bucketed-table sink: pre-shuffle ONCE at write time so every later
equi-join/aggregation on the bucket key runs shuffle-free (task brief:
"repartition()/bucketing for co-located joins").

When the same dimension or fact table is joined on the same key by many
downstream jobs (the graph tables' canonical_iri, the corpus' doc_id),
paying one clustered write beats re-shuffling per query: a bucketed
scan reports ``HashPartitioning(key, n)`` so Catalyst drops the
Exchange on both join sides (SortMergeJoin over pre-sorted buckets when
``sort_by`` is set). This is the Spark-native equivalent of the
Iceberg bucket-partition layout the north_star describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sort_by: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table in the
    session catalog. ``table`` may be db-qualified; the caller owns the
    database location (tests create one under tmp)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — zero
    Exchange when bucket counts match (asserted by tests/test_plans)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
