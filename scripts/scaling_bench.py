#!/usr/bin/env python3
"""Scaling-efficiency evidence (north_rule: ≥0.8 throughput scaling
efficiency between N and 4N executors; sandbox substitute = the same
job at local[8] vs local[32] on the same input).

Each measurement runs in a FRESH subprocess (own JVM) so parallelism
levels don't share executor state. Two jobs are measured:

  * ``map_path`` — extraction + mention detection + mention-triple
    assembly (the 100 TB throughput path: map-only over pages);
  * ``full_pipeline`` — the whole KG pipeline incl. the
    dimension-side cascade/CC stages, whose fixed driver-side cost does
    NOT scale with executors (reported for honesty; at real scale it
    amortizes to noise).

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [amplify] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sifr_project_java_ontology_processing_spark.session import get_spark
from sifr_project_java_ontology_processing_spark.plans.flagship import (
    documents_as_pages, vocab_tables)
from sifr_project_java_ontology_processing_spark.plans.kg_pipeline import run_kg_pipeline
from sifr_project_java_ontology_processing_spark.operators.extraction import extract_pages
from sifr_project_java_ontology_processing_spark.operators.mentions import detect_mentions
from sifr_project_java_ontology_processing_spark.functions.uris import SIFR_MENTION

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
amplify = {amplify}
spark = get_spark(app_name=f"scaling-{{cpus}}")
docs = spark.read.parquet({sf_dir!r} + "/documents.parquet")
docs = docs.select("*", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))).alias("copy")) \
    .select((F.col("doc_id") * amplify + F.col("copy")).alias("doc_id"),
            "text", "lang", "source", "n_chars")
pages = documents_as_pages(docs).repartition(64)   # fixed partitioning at both levels
n_pages = pages.cache().count()
dims = vocab_tables(spark)

# --- map path: extract -> mentions -> mention triples (no dim stages) ---
t0 = time.perf_counter()
ext = extract_pages(pages)
m = detect_mentions(spark, ext, dims["ontology_labels"])
mt = m.select(F.col("url").alias("subj"), F.lit(SIFR_MENTION).alias("pred"),
              F.col("concept_iri").alias("obj")).distinct()
mt.write.format("noop").mode("overwrite").save()
map_sec = time.perf_counter() - t0

# --- full pipeline ---
t0 = time.perf_counter()
res = run_kg_pipeline(spark, pages, dims["ontology_labels"], dims["mappings"],
                      dims["umls_concepts"], dims["umls_semtypes"],
                      own_cuis=dims["own_cuis"], disambiguate_cuis=False)
res.triples.write.format("noop").mode("overwrite").save()
full_sec = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "pages": n_pages,
                   "map_sec": round(map_sec, 2), "full_sec": round(full_sec, 2)}}))
spark.stop()
"""


def run_at(cpus: int, amplify: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = CHILD.format(repo=REPO, amplify=amplify, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stderr[-3000:]}")


def main() -> int:
    amplify = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    lo, hi = 8, 32
    r_lo = run_at(lo, amplify, sf_dir)
    r_hi = run_at(hi, amplify, sf_dir)

    def eff(key: str) -> dict:
        thr_lo = r_lo["pages"] / r_lo[key]
        thr_hi = r_hi["pages"] / r_hi[key]
        return {
            f"local[{lo}]_sec": r_lo[key],
            f"local[{hi}]_sec": r_hi[key],
            f"local[{lo}]_pages_per_sec": round(thr_lo, 1),
            f"local[{hi}]_pages_per_sec": round(thr_hi, 1),
            "speedup": round(r_lo[key] / r_hi[key], 2),
            "efficiency": round((thr_hi / thr_lo) / (hi / lo), 3),
        }

    report = {
        "pages": r_hi["pages"],
        "amplify": amplify,
        "sf_dir": sf_dir,
        "map_path": eff("map_sec"),
        "full_pipeline": eff("full_sec"),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    mp, fp = report["map_path"], report["full_pipeline"]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers (this engine)

Scaling evidence for the north_rule's two-cluster-size criterion,
sandbox form: the same job, same input ({report['pages']:,} pages =
documents×{amplify} from {sf_dir}), fixed 64 input partitions, run in
fresh JVMs at local[{lo}] (N) and local[{hi}] (4N).

| job | local[{lo}] sec | local[{hi}] sec | local[{lo}] pages/s | local[{hi}] pages/s | speedup | scaling efficiency |
|---|---|---|---|---|---|---|
| map path (extract→mentions→mention triples) | {mp[f'local[{lo}]_sec']} | {mp[f'local[{hi}]_sec']} | {mp[f'local[{lo}]_pages_per_sec']} | {mp[f'local[{hi}]_pages_per_sec']} | {mp['speedup']}× | **{mp['efficiency']}** |
| full KG pipeline (incl. dim-side cascade+CC) | {fp[f'local[{lo}]_sec']} | {fp[f'local[{hi}]_sec']} | {fp[f'local[{lo}]_pages_per_sec']} | {fp[f'local[{hi}]_pages_per_sec']} | {fp['speedup']}× | **{fp['efficiency']}** |

The map path is the 100 TB throughput shape (map-only over the pages
fact table; zero shuffle before the mention-triple distinct). The full
pipeline includes the ontology-dimension stages (cascade broadcasts,
connected-components iterations) whose wall time is independent of
input size — a fixed cost that shrinks toward zero relative share as
input grows, which is why the map-path efficiency is the scale signal.

Reference baseline: the reference publishes no numbers (BASELINE.md);
its engine is a single-JVM `parallelStream()` loop with no cross-node
scaling path at all.
""")
    return 0


if __name__ == "__main__":
    sys.exit(main())
