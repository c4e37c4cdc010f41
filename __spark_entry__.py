"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship KG pipeline (documents → pages → extraction →
mention detection → cascade → canonicalization → triples) at sf0.001.
``queries``/``oracle_sql``: operator registry with DuckDB oracle twins
(sifr_project_java_ontology_processing_spark/plans/testdata_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sifr_project_java_ontology_processing_spark.plans import testdata_queries
from sifr_project_java_ontology_processing_spark.plans.flagship import flagship_triples


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return testdata_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI oracle per query (omitted ⇒ rows-only check)."""
    return testdata_queries.oracle_sql()
