#!/usr/bin/env python3
"""Per-query benchmark/plan harness for the optimization rounds
(guide §1: noop-sink isolation + labeled jobs + formatted plans).

The driver's frozen ``bench.py`` is untouched; this file exists so
individual registry queries can be timed and their physical plans
captured without re-running the whole headline set.

Usage:
  python bench_extra.py q1 q2 ...          # time each query (noop sink)
  python bench_extra.py --explain TAG q1   # also write plans/r06/q1_TAG.txt
  python bench_extra.py --repeat 2 q1      # repeat (fresh composition each time)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    tag = None
    repeat = 1
    if "--explain" in args:
        i = args.index("--explain")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sifr_project_java_ontology_processing_spark.plans.testdata_queries import (
        queries as registry,
    )
    from sifr_project_java_ontology_processing_spark.session import get_spark

    spark = get_spark(app_name="sifr-bench-extra")
    reg = registry()
    timings: dict[str, list[float]] = {}
    for name in names:
        fn = reg[name]
        for it in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} [{it}]")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
        if tag is not None:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(plan)
    print(json.dumps(timings))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
