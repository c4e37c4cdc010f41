#!/usr/bin/env python3
"""Phase-level profiling of the rdfs_plus_entail_incremental bench row
(guide §1: measure first). Times, with the noop sink, the pieces the
query composes so the optimization targets the real cost:
  1. fixture build alone
  2. rdfs_plus_entail(base) alone
  3. full query (entail + delta)
Run: SPARK_GRAFT_SF_DIR=... python scripts/profile_incremental.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sifr_project_java_ontology_processing_spark.plans.testdata_queries import (
        _rdfs_plus_fixture,
    )
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_plus_entail,
        rdfs_plus_entail_delta,
    )
    from sifr_project_java_ontology_processing_spark.session import get_spark

    spark = get_spark(app_name="profile-incremental")
    sc = spark.sparkContext
    t: dict[str, float] = {}

    sc.setJobDescription("fixture build")
    t0 = time.perf_counter()
    contains, adjacent, static = _rdfs_plus_fixture(spark, sf_dir)
    base = (
        contains.where(F.col("_k") % 7 != 0)
        .drop("_k")
        .unionByName(adjacent.where(F.col("_k") % 5 != 0).drop("_k"))
        .unionByName(static)
    )
    delta = (
        contains.where(F.col("_k") % 7 == 0)
        .drop("_k")
        .unionByName(adjacent.where(F.col("_k") % 5 == 0).drop("_k"))
    )
    noop(base)
    noop(delta)
    t["fixture"] = time.perf_counter() - t0

    sc.setJobDescription("rdfs_plus_entail(base) alone")
    t0 = time.perf_counter()
    entailed = rdfs_plus_entail(base, max_transitive_depth=6)
    noop(entailed)
    t["entail_base"] = time.perf_counter() - t0

    sc.setJobDescription("full incremental query")
    t0 = time.perf_counter()
    entailed2 = rdfs_plus_entail(base, max_transitive_depth=6)
    out = rdfs_plus_entail_delta(entailed2, delta, max_transitive_depth=6)
    noop(out)
    t["full_query"] = time.perf_counter() - t0

    for k, v in t.items():
        print(f"{k}: {v:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
