#!/usr/bin/env python3
"""Interleaved A/B of the ANN-family bench queries between two repo
checkouts (round-4 VERDICT ask #8: settle whether the driver-bench ANN
regressions were co-tenant noise or plan changes).

Runs each side in a FRESH JVM per trial, strictly interleaved
(A,B,A,B,...), records the 1-minute load average immediately before
each run, and prints per-query wall seconds plus medians. One Spark
session at a time — never concurrent (BENCH discipline).

Usage: python scripts/ab_ann_bench.py <repoA> <repoB> [trials]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

QUERIES = [
    "dedup_lsh_verified",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "embedding_neardup",
]

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from sifr_project_java_ontology_processing_spark.session import get_spark
from sifr_project_java_ontology_processing_spark.plans.testdata_queries import queries
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab-ann")
reg = queries()
out = {}
for name in json.loads(sys.argv[2]):
    df = reg[name](spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def one_run(repo: str) -> tuple[float, dict[str, float]]:
    load1 = os.getloadavg()[0]
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, repo, json.dumps(QUERIES)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return load1, json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"run failed for {repo}: {proc.stderr[-2000:]}")


def main() -> int:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    results: dict[str, list[dict[str, float]]] = {"A": [], "B": []}
    loads: dict[str, list[float]] = {"A": [], "B": []}
    for t in range(trials):
        for side, repo in (("A", repo_a), ("B", repo_b)):
            load1, r = one_run(repo)
            loads[side].append(round(load1, 2))
            results[side].append(r)
            print(
                f"trial {t + 1} side {side} load1m={load1:.2f} {r}",
                flush=True,
            )
    summary = {"repo_a": repo_a, "repo_b": repo_b, "trials": trials,
               "loads": loads, "per_query": {}}
    for q in QUERIES:
        med_a = statistics.median(r[q] for r in results["A"])
        med_b = statistics.median(r[q] for r in results["B"])
        summary["per_query"][q] = {
            "A_median": med_a, "B_median": med_b,
            "A_all": [r[q] for r in results["A"]],
            "B_all": [r[q] for r in results["B"]],
        }
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
