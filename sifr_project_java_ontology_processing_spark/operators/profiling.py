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
    for c in cols:
        if c not in schema:
            raise ValueError(f"profile_table: no such column {c!r}")
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(
            (
                F.approx_count_distinct(col, rsd)
                if approx
                else F.count_distinct(col)
            ).alias(f"__dist_{c}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.avg(col.cast("double")).alias(f"__avg_{c}"))
            aggs.append(F.sum(col.cast("double")).alias(f"__sum_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__avg_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__sum_{c}"))
    wide = df.agg(*aggs)
    # pivot the single wide row into one row per column — the stack is
    # over a 1-row frame, so this is driver-trivial but stays in-plan
    stack_args: list[str] = []
    for c in cols:
        quoted = c.replace("'", "''")
        stack_args.append(
            f"'{quoted}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}, "
            f"__avg_{c}, __sum_{c}"
        )
    stacked = wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column, n_null, n_distinct, min_value, max_value, "
        "avg_value, sum_value)",
    )
    return stacked.select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
        "avg_value",
        "sum_value",
    )


def column_histogram(
    df: DataFrame, column: str, *, top_k: int | None = None
) -> DataFrame:
    """Value histogram for one column: (value, n) — a single
    partial-agg pass; ``top_k`` keeps the most frequent values
    (ties broken by value for determinism)."""
    out = df.groupBy(F.col(column).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    if top_k is not None:
        out = out.orderBy(F.col("n").desc(), F.col("value").asc()).limit(top_k)
    return out
