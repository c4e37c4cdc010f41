"""Column profiling (operators/profiling.py): exact stats, approx mode
schema parity, single-pass plan shape, histogram determinism."""

from __future__ import annotations

import pytest

from sifr_project_java_ontology_processing_spark.operators.profiling import (
    column_histogram,
    profile_table,
)


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (2, None, 2.5), (None, "a", None)],
        "k int, s string, v double",
    )


def test_profile_exact_values(sample):
    rows = {r.column: r for r in profile_table(sample).collect()}
    assert set(rows) == {"k", "s", "v"}
    k = rows["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (4, 1, 2)
    assert (k.min_value, k.max_value) == ("1", "2")
    assert k.avg_value == pytest.approx(5 / 3)
    assert k.sum_value == 5.0
    s = rows["s"]
    assert (s.n_null, s.n_distinct, s.min_value, s.max_value) == (1, 2, "a", "b")
    assert s.avg_value is None and s.sum_value is None


def test_profile_column_subset_and_unknown(sample):
    assert [r.column for r in profile_table(sample, ["v"]).collect()] == ["v"]
    with pytest.raises(ValueError, match="no such column"):
        profile_table(sample, ["nope"])


def test_profile_approx_same_schema_and_close(sample):
    exact = profile_table(sample)
    approx = profile_table(sample, approx=True)
    assert approx.columns == exact.columns
    a = {r.column: r.n_distinct for r in approx.collect()}
    assert a["k"] in (1, 2, 3)  # HLL estimate on 2 distinct values


def test_profile_single_aggregation_pass(sample):
    """Scale gate: one scan, one aggregate — no per-column jobs, no
    join of per-column frames."""
    plan = profile_table(sample)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    # exact distincts use ONE expand over the single scan
    assert plan.count("Scan ExistingRDD") <= 1, plan


def test_histogram_topk_deterministic(sample):
    got = [(r.value, r.n) for r in column_histogram(sample, "s", top_k=2).collect()]
    assert got[0] == ("a", 2) and got[1][1] == 1
    full = {(r.value, r.n) for r in column_histogram(sample, "s").collect()}
    assert full == {("a", 2), ("b", 1), (None, 1)}


def test_profile_weird_column_names(spark):
    """Review fix: dots/spaces/dashes/backticks in column names must
    survive the whole pipeline (pure Column API, no SQL parsing)."""
    df = (
        spark.createDataFrame([(1, "a"), (2, None)], "k int, s string")
        .withColumnRenamed("k", "order-date.v 1`x")
        .withColumnRenamed("s", "my col")
    )
    rows = {r.column: r for r in profile_table(df).collect()}
    assert rows["order-date.v 1`x"].n_distinct == 2
    assert rows["my col"].n_null == 1
    h = column_histogram(df, "my col").collect()
    assert {(r.value, r.n) for r in h} == {("a", 1), (None, 1)}
