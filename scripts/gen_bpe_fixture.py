#!/usr/bin/env python3
"""Generate the committed BPE fixtures (no Spark involved):

  * ``fixtures/bpe_merges.txt`` — merges trained on the sf0.01
    documents table (deterministic greedy training, pure Python);
  * ``fixtures/bpe_counts_sf001.csv`` — per-document token counts from
    the PURE-PYTHON reference encoder, keyed (doc_id, md5(text)).

The ``bpe_token_count`` registry query joins documents to the counts
fixture on (doc_id, text-md5) and recomputes the counts with the
DISTRIBUTED encoder; the DuckDB oracle replays them from the CSV — so
the gate is "Spark operator == committed reference encoding", and the
md5 key makes a silently drifted testdata table drop out of the compare
instead of poisoning it. Rerun this script only when the tokenizer
algorithm intentionally changes.
"""

from __future__ import annotations

import csv
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sifr_project_java_ontology_processing_spark.functions.bpe import (  # noqa: E402
    bpe_encode,
    token_id_table,
    train_bpe,
)

SF_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_SF", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sifr_project_java_ontology_processing_spark",
    "fixtures",
)
N_MERGES = 256


def main() -> None:
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    texts = [t for _, t in rows if t]
    merges = train_bpe(texts, n_merges=N_MERGES)

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "bpe_merges.txt"), "w") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")

    vocab = token_id_table(merges)
    with open(os.path.join(OUT_DIR, "bpe_counts_sf001.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "text_md5", "n_bpe_tokens", "ids_md5"])
        for doc_id, text in rows:
            md5 = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            toks = bpe_encode(text or "", merges)
            ids = ",".join(str(vocab[t]) for t in toks)
            w.writerow([
                doc_id, md5, len(toks),
                hashlib.md5(ids.encode()).hexdigest(),
            ])
    print(f"wrote {len(merges)} merges + {len(rows)} counts to {OUT_DIR}")


if __name__ == "__main__":
    main()
