#!/usr/bin/env python3
"""Per-core ceiling probe — NO Spark anywhere in this measurement.

Purpose (round-3 VERDICT #8): when an N→4N wall-clock pair on this
co-tenanted single-memory-system box lands below the 0.8 gate, decide
whether the ENGINE or the BOX is the limiter. This script runs the
engine's actual per-page work (html→text extraction + trie mention
scan — the exact functions the fused Spark operator calls) under plain
``multiprocessing`` with an N-worker pool, at N and 4N. There is no
JVM, no Arrow, no shuffle, no scheduler: any efficiency loss measured
here is the hardware/co-tenant ceiling, and the Spark pair can at best
match it.

Method mirrors scaling_bench.py: fresh pool per point, interleaved
order, best of K, pre-run 1-min load recorded. ROUND-4 KERNEL NOTE:
this kernel (6.18.x-fc) does not enforce sched_setaffinity — the
taskset mask below is advisory only (kept for kernels that do enforce
it). The effective bound is the POOL SIZE: N single-threaded workers ≈
N compute lanes, the same lane-emulation stance as scaling_bench.py's
-XX:ActiveProcessorCount method. Rows recorded in
BENCH/SCALING_NOTES.md before 2026-08-17 were measured under an
enforcing kernel (actually pinned); later rows are lane-bounded only.
Prints one JSON line; appends a row to BENCH/SCALING_NOTES.md.

Usage: python scripts/cpu_ceiling_probe.py [n_pages] [repeats] [levels]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, multiprocessing as mp, sys, time
sys.path.insert(0, {repo!r})
from sifr_project_java_ontology_processing_spark.sources.synthetic import make_fixture
from sifr_project_java_ontology_processing_spark.operators.extraction import extract_text
from sifr_project_java_ontology_processing_spark.operators.mentions import (
    build_label_trie, _scan_text)

N_PROCS = {n_procs}
N_PAGES = {n_pages}

fx = make_fixture(n_pages=2000, n_concepts=60, seed=23)
HTMLS = [p[2] for p in fx.pages]  # html column (url, warc_ts, html, ...)
LABELS = fx.ontology_labels

def _work(args):
    lo, hi = args
    trie = build_label_trie([(r[0], r[1], r[2], r[3]) for r in LABELS])
    n = 0
    for i in range(lo, hi):
        html = HTMLS[i % len(HTMLS)]
        text = extract_text(html.encode() if isinstance(html, str) else html)
        n += len(_scan_text(text, trie))
    return n

if __name__ == "__main__":
    chunks = []
    per = max(1, N_PAGES // (N_PROCS * 4))  # 4 waves per proc; >=1 so tiny inputs terminate
    lo = 0
    while lo < N_PAGES:
        hi = min(lo + per, N_PAGES)
        chunks.append((lo, hi))
        lo = hi
    with mp.Pool(N_PROCS) as pool:
        pool.map(_work, chunks[:1])  # warm-up: import+JIT per worker
        t0 = time.perf_counter()
        total = sum(pool.map(_work, chunks))
        sec = time.perf_counter() - t0
    print(json.dumps({{"procs": N_PROCS, "sec": round(sec, 2),
                       "mentions": total}}))
"""


def load_avg() -> float:
    return round(os.getloadavg()[0], 1)


def run_once(n_procs: int, n_pages: int) -> tuple[float, float]:
    import random as _r

    code = CHILD.format(repo=REPO, n_procs=n_procs, n_pages=n_pages)
    total = os.cpu_count() or 32
    start = _r.randrange(0, max(1, total - n_procs + 1))
    pre = load_avg()
    out = subprocess.run(
        ["taskset", "-c", f"{start}-{start + n_procs - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)["sec"], pre
    raise RuntimeError(f"probe failed at {n_procs} procs:\n{out.stderr[-2000:]}")


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    levels = (
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [4, 16]
    )
    best: dict[int, float] = {}
    loads = []
    for _ in range(repeats):
        for n in levels:
            sec, pre = run_once(n, n_pages)
            loads.append(pre)
            best[n] = min(best.get(n, float("inf")), sec)
    report = {"n_pages": n_pages, "repeats": repeats, "loads": loads,
              "best_sec": {str(k): v for k, v in best.items()}}
    for lo in levels:
        hi = 4 * lo
        if hi in best:
            eff = (best[lo] / best[hi]) / (hi / lo)
            report[f"efficiency_{lo}_to_{hi}"] = round(eff, 3)
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH", "SCALING_NOTES.md"), "a") as f:
        f.write(
            f"\n## Plain-multiprocessing ceiling probe ({n_pages:,} pages, "
            f"no Spark, best of {repeats}, loads {loads})\n\n"
            f"`cpu_ceiling_probe.py`: the engine's exact per-page work "
            f"(extract_text + trie scan) under a pinned mp.Pool:\n\n"
            + "".join(
                f"- {lo} procs {best[lo]} s → {4*lo} procs {best[4*lo]} s: "
                f"efficiency **{report[f'efficiency_{lo}_to_{4*lo}']}** — any "
                f"Spark pair on this box is bounded above by this number.\n"
                for lo in levels if 4 * lo in best
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
