"""Table / column profiling — the data-quality pass a 100 TB corpus
pipeline runs before (and after) every ingestion batch.

The reference's metrics stage writes per-class counts to CSV
(MetricsWriter usage in OntologyCUIProcessor.java); this is the
column-generalized distributed twin: one row per profiled column with
null rate, distinct count, min/max, and numeric moments.

Scale design: ``profile_table`` computes EVERY column's statistics in
ONE aggregation pass (a single scan, partial-agg/map-side combined) —
not one job per column.  Exact distinct counts use one
``count(distinct ...)`` expansion per column, which Spark plans as an
expand + two-phase aggregate; with ``approx=True`` they switch to
HyperLogL++ sketches (``approx_count_distinct``), keeping the whole
profile a single narrow pass with NO expand — the 100 TB default.
``column_histogram`` is a separate partial-agg (its result is
per-value, not per-column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_value, max_value, avg_value, sum_value) — min/max as strings
    (lexical for string columns, numeric rendering otherwise), moments
    NULL for non-numeric columns.

    ``approx=True``: distinct counts become HyperLogLog++ estimates at
    relative standard deviation ``rsd`` — the single-pass no-expand
    shape for fact-scale tables (estimates are NOT oracle-replayable;
    the registry twin runs exact).
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        if c not in schema:
            raise ValueError(f"profile_table: no such column {c!r}")
        # backtick-quote the source reference (exact top-level name —
        # dots/spaces/dashes never parse); internal aliases are
        # index-based so they stay bare identifiers
        col = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__null_{i}"))
        aggs.append(
            (
                F.approx_count_distinct(col, rsd)
                if approx
                else F.count_distinct(col)
            ).alias(f"__dist_{i}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{i}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.avg(col.cast("double")).alias(f"__avg_{i}"))
            aggs.append(F.sum(col.cast("double")).alias(f"__sum_{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__avg_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"__sum_{i}"))
    wide = df.agg(*aggs)
    # pivot the single wide row into one row per column with an
    # array-of-structs explode — pure Column API, so column names
    # containing spaces/dots/dashes/backticks never hit a SQL parser
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__null_{i}").cast("long").alias("n_null"),
            F.col(f"__dist_{i}").cast("long").alias("n_distinct"),
            F.col(f"__min_{i}").alias("min_value"),
            F.col(f"__max_{i}").alias("max_value"),
            F.col(f"__avg_{i}").alias("avg_value"),
            F.col(f"__sum_{i}").alias("sum_value"),
        )
        for i, c in enumerate(cols)
    ]
    stacked = wide.select(
        F.col("__n").cast("long").alias("n_rows"),
        F.explode(F.array(*structs)).alias("s"),
    )
    return stacked.select(
        "s.column", "n_rows", "s.n_null", "s.n_distinct",
        "s.min_value", "s.max_value", "s.avg_value", "s.sum_value",
    )


def column_histogram(
    df: DataFrame, column: str, *, top_k: int | None = None
) -> DataFrame:
    """Value histogram for one column: (value, n) — a single
    partial-agg pass; ``top_k`` keeps the most frequent values
    (ties broken by value for determinism)."""
    out = df.groupBy(
        F.col("`" + column.replace("`", "``") + "`").alias("value")
    ).agg(F.count(F.lit(1)).alias("n"))
    if top_k is not None:
        out = out.orderBy(F.col("n").desc(), F.col("value").asc()).limit(top_k)
    return out
