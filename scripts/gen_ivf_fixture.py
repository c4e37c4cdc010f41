#!/usr/bin/env python3
"""Generate the committed IVF k-means codebook fixture:
``fixtures/ivf_centroids_sf001.json`` — a 10 × 64 spherical-k-means
codebook trained on the sf0.01 embeddings table by
``similarity.train_ivf_codebook`` (deterministic md5 init, 5 Lloyd's
rounds).

The ``ann_ivf_kmeans_topk`` registry query passes these centroids as
an explicit codebook, and its DuckDB oracle inlines the same numbers
as literals — so the assignment/probe/rank machinery replays exactly
while the *training* path is gated separately by the recall harness in
tests/test_similarity.py. Rerun only when the trainer intentionally
changes."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sifr_project_java_ontology_processing_spark",
    "fixtures",
    "ivf_centroids_sf001.json",
)


def main() -> None:
    from sifr_project_java_ontology_processing_spark import get_spark
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        train_ivf_codebook,
    )

    spark = get_spark(app_name="gen-ivf-fixture", shuffle_partitions=8)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cmat = train_ivf_codebook(emb, dim=64, m=10, iters=5)
    spark.stop()
    with open(OUT, "w") as f:
        json.dump({"m": 10, "dim": 64, "iters": 5,
                   "centroids": [[float(x) for x in row] for row in cmat]}, f)
    print(f"wrote {cmat.shape} codebook to {OUT}")


if __name__ == "__main__":
    main()
