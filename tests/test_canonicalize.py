"""Connected-components canonicalization vs a union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
    canonical_mapping,
    connected_components,
    salted_collect_set,
    salted_count,
)


from .oracle import union_find_oracle as _uf_oracle


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    want = _uf_oracle(edges)
    want_nonroot = {k: v for k, v in want.items() if k != v}
    # both physical strategies must agree with the oracle:
    # driver union-find (small-graph fast path) and distributed stars
    for threshold in (200_000, 0):
        got = {
            r["iri"]: r["canonical_iri"]
            for r in connected_components(df, driver_threshold=threshold).collect()
        }
        assert got == want_nonroot, (threshold, got, want_nonroot)


def test_cc_chain_cycle_singleton(spark):
    _check(spark, [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x")])


def test_cc_long_chain(spark):
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(60)]
    _check(spark, edges)


def test_cc_random_graph(spark):
    rng = random.Random(3)
    nodes = [f"v{i:02d}" for i in range(50)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_canonical_mapping_with_isolated(spark):
    mappings = spark.createDataFrame(
        [("a", "eq", "b"), ("b", "eq", "c"), ("p", "rel", "q")],
        "source_iri string, property string, target_iri string",
    )
    all_iris = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("p",), ("q",), ("z",)], "iri string"
    )
    got = {
        r["iri"]: r["canonical_iri"]
        for r in canonical_mapping(mappings, ["eq"], all_iris).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "p": "p", "q": "q", "z": "z"}


def test_salted_count_matches_plain(spark):
    df = spark.range(0, 5000).withColumn(
        "k", F.when(F.col("id") % 10 < 8, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7))
    )
    got = {r["k"]: r["n"] for r in salted_count(df, ["k"], salt_buckets=8).collect()}
    want = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_collect_set_matches_plain(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 5).cast("string").alias("k"),
        (F.col("id") % 37).cast("string").alias("v"),
    )
    got = {r["k"]: r["values"] for r in salted_collect_set(df, ["k"], "v", 4).collect()}
    want = {
        r["k"]: sorted(r["s"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    assert got == want


def test_salted_join_equals_plain_join(spark):
    """Skew salting must be a pure physical rewrite: row-identical to
    the plain join, hot key spread across (key, salt) reducers."""
    from pyspark.sql import functions as F

    from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
        salted_join,
    )

    # heavily skewed facts: one hot key with 5000 rows, tail of 50
    facts = spark.range(5000).select(F.lit("hot").alias("k"), F.col("id").alias("v")).unionByName(
        spark.range(50).select(F.concat(F.lit("t"), F.col("id")).cast("string").alias("k"), F.col("id").alias("v"))
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"t{i}", f"D{i}") for i in range(0, 50, 2)],
        "k string, attr string",
    )
    for how in ("inner", "left"):
        got = salted_join(facts, dim, "k", salt_buckets=8, how=how)
        want = facts.join(dim, "k", how)
        assert got.count() == want.count(), how
        g = {(r["k"], r["v"], r["attr"]) for r in got.collect()}
        w = {(r["k"], r["v"], r["attr"]) for r in want.collect()}
        assert g == w, how
    # the join key includes the salt → the shuffle spreads the hot key
    plan = salted_join(facts, dim, "k", salt_buckets=8)._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan
