#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same parquet tables, compare row count, column
names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def row_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from sifr_project_java_ontology_processing_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd filter would otherwise skip EVERYTHING and print
        # "all queries match" having verified zero queries
        raise SystemExit(
            f"unknown query name(s): {sorted(unknown)} — not in queries()"
        )
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name:32s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        rel = con.sql(oracles[name])
        ocols = rel.columns
        orows = rel.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        sh, oh = row_hash(srows, scols), row_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"  {name:32s} {status} rows {len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} hash {sh}/{oh}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols and ok_rows:
                # print first differing rows for debugging
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                snorm = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in srows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                onorm = sorted("\x1f".join(_norm_cell(r[i]) for i in oorder) for r in orows)
                for a, b in zip(snorm, onorm):
                    if a != b:
                        print(f"    spark : {a!r}\n    oracle: {b!r}")
                        break
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
