"""Similarity search vs numpy oracle; LSH recall sanity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    neardup_pairs,
)


def _emb_df(spark, n=40, dim=16, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    vecs[1] = vecs[0] + rng.randn(dim).astype(np.float32) * 0.01  # near-dup pair
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def _np_topk(vecs, q_ids, k):
    out = {}
    norms = np.linalg.norm(vecs, axis=1)
    for q in q_ids:
        sims = (vecs @ vecs[q]) / (norms * norms[q])
        cand = [(round(float(sims[j]), 6), j) for j in range(len(vecs)) if j != q]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[q] = [(j, s) for s, j in cand[:k]]
    return out


def test_brute_force_topk_matches_numpy(spark):
    df, vecs = _emb_df(spark)
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in brute_force_topk(df, queries, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cos_sim"]))
    want = _np_topk(vecs, range(4), 3)
    for q in range(4):
        got_sorted = [ (n, s) for _rk, n, s in sorted(got[q]) ]
        assert got_sorted == want[q], (q, got_sorted, want[q])


def test_lsh_topk_valid_and_finds_neardup(spark):
    df, vecs = _emb_df(spark)
    queries = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = lsh_topk(df, queries, dim=16, k=3, n_planes=3).collect()
    assert rows, "lsh bucket empty — lower n_planes"
    # the near-identical vector lands in the same bucket and ranks first
    top = min(rows, key=lambda r: r["rank"])
    assert top["neighbor_id"] == 1 and top["cos_sim"] > 0.99


def test_neardup_pairs(spark):
    df, vecs = _emb_df(spark)
    pairs = {(r["vec_a"], r["vec_b"]) for r in neardup_pairs(df, threshold=0.95).collect()}
    assert pairs == {(0, 1)}


def test_distributed_topk_equals_broadcast(spark):
    """The sharded cogroup-GEMM path (no driver collect) must return
    exactly the broadcast path's rows — shard count changes the plan,
    never the result."""
    df, vecs = _emb_df(spark)
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    small = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
             for r in brute_force_topk(df, queries, k=3).collect()}
    dist = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in brute_force_topk(df, queries, k=3, num_shards=4).collect()}
    assert dist == small


def test_distributed_neardup_equals_broadcast(spark):
    df, vecs = _emb_df(spark)
    small = {(r["vec_a"], r["vec_b"], r["cos_sim"])
             for r in neardup_pairs(df, threshold=0.3).collect()}
    dist = {(r["vec_a"], r["vec_b"], r["cos_sim"])
            for r in neardup_pairs(df, threshold=0.3, num_blocks=3).collect()}
    assert dist == small and small, "block-pair path diverged (or empty)"


def test_pinned_mode_skips_sizing_count(spark, monkeypatch):
    """``mode='broadcast'`` / ``'sharded'`` / ``'blocked'`` must never
    run the pre-job sizing ``count()`` (a full corpus scan before the
    real job) and must return the same rows as auto."""
    from pyspark.sql import DataFrame

    df, vecs = _emb_df(spark)
    queries = df.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    auto_topk = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
                 for r in brute_force_topk(df, queries, k=3).collect()}
    auto_nd = {(r["vec_a"], r["vec_b"], r["cos_sim"])
               for r in neardup_pairs(df, threshold=0.3).collect()}

    def _no_count(self):
        raise AssertionError("sizing count() ran despite pinned mode")

    monkeypatch.setattr(DataFrame, "count", _no_count)
    got_b = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
             for r in brute_force_topk(df, queries, k=3, mode="broadcast").collect()}
    got_s = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
             for r in brute_force_topk(df, queries, k=3, mode="sharded",
                                       num_shards=3).collect()}
    nd_b = {(r["vec_a"], r["vec_b"], r["cos_sim"])
            for r in neardup_pairs(df, threshold=0.3, mode="broadcast").collect()}
    nd_k = {(r["vec_a"], r["vec_b"], r["cos_sim"])
            for r in neardup_pairs(df, threshold=0.3, mode="blocked",
                                   num_blocks=3).collect()}
    assert got_b == auto_topk and got_s == auto_topk
    assert nd_b == auto_nd and nd_k == auto_nd


def test_ivf_recall_rises_with_nprobe(spark):
    """IVF top-k: probing more cells must raise recall vs exact ground
    truth; probing ALL cells is exact."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import ivf_topk

    df, vecs = _emb_df(spark)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {}
    for r in brute_force_topk(df, queries, k=3).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(nprobe):
        approx = {}
        for r in ivf_topk(df, queries, dim=16, k=3, m=8, nprobe=nprobe).collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8 + 1e-9, (r1, r4, r8)
    assert r8 == 1.0, r8  # all cells probed == exact
    assert r4 >= 0.5, r4


def test_lsh_recall_floor_vs_exact(spark):
    """Recall harness (round-1 VERDICT item 1a): LSH top-k candidates
    vs exact ground truth. With 3 planes on 40 docs the buckets are
    coarse; require recall@3 ≥ 0.5 and that every returned neighbor's
    score matches the exact score."""
    df, vecs = _emb_df(spark)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {}
    for r in brute_force_topk(df, queries, k=3).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = {}
    for n_tables in (1, 6):
        approx = {}
        for r in lsh_topk(df, queries, dim=16, k=3, n_planes=3, n_tables=n_tables).collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        recalls[n_tables] = hits / total
    # OR-amplification must raise recall; 6 tables clear the floor
    assert recalls[6] >= 0.5, f"recall@3 {recalls} below floor"
    assert recalls[6] > recalls[1], recalls


def test_embedding_decontaminate_semantics(spark):
    """Identical vector → 1.0 flagged; scaled copy → 1.0 (cosine is
    scale-invariant); orthogonal → 0.0 unflagged; empty benchmark →
    all clean."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        embedding_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0]),   # scaled copy of the bench vector
            (3, [0.0, 1.0, 0.0]),   # orthogonal
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["max_cos"], r["is_semantic_contaminated"])
        for r in embedding_decontaminate(corpus, bench, threshold=0.99).collect()
    }
    assert got[1] == (1.0, True)
    assert got[2] == (1.0, True)
    assert got[3] == (0.0, False)

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    clean = embedding_decontaminate(corpus, empty).collect()
    assert all(not r["is_semantic_contaminated"] for r in clean) and len(clean) == 3


def test_embedding_decontaminate_zero_norm_vectors(spark):
    """Zero-norm vectors must never poison the result with NaN (Spark
    orders NaN above every double, so a NaN max_cos would flag rows as
    contaminated). A zero-norm BENCHMARK vector is dropped (no signal);
    a zero-norm CORPUS vector scores 0.0 against everything; an
    all-zero-norm benchmark behaves like an empty one."""
    import math

    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        embedding_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [0.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["max_cos"], r["is_semantic_contaminated"])
        for r in embedding_decontaminate(corpus, bench, threshold=0.99).collect()
    }
    assert all(not math.isnan(c) for c, _ in got.values()), got
    assert got[1] == (0.0, False)   # orthogonal to the only live bench vec
    assert got[2] == (0.0, False)   # zero-norm corpus vec: defined 0.0
    assert got[3] == (1.0, True)    # identical to the live bench vec

    all_zero = spark.createDataFrame(
        [(100, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    clean = embedding_decontaminate(corpus, all_zero).collect()
    assert all(not r["is_semantic_contaminated"] for r in clean) and len(clean) == 3


def test_mode_typo_raises(spark):
    """An unknown mode must raise, not silently fall through to the
    auto path (whose sizing count / driver collect the explicit mode
    exists to avoid)."""
    import pytest

    df, _ = _emb_df(spark, n=8)
    q = df.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="unknown mode"):
        brute_force_topk(df, q, mode="Sharded")
    with pytest.raises(ValueError, match="unknown mode"):
        neardup_pairs(df, mode="block")


def test_ivf_kmeans_codebook_recall_beats_md5(spark):
    """Round-3 VERDICT #3 gate: the trained spherical-k-means codebook
    must reach at-least the md5-pick recall at EQUAL nprobe, and
    strictly beat it where the cell structure matters (nprobe 2-3 with
    m = the natural cluster count of the synthetic embeddings). Ground
    truth = brute-force exact top-5."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {}
    for r in brute_force_topk(emb, q, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(codebook, nprobe):
        got = {}
        rows = ivf_topk(
            emb, q, dim=64, k=5, m=10, nprobe=nprobe, codebook=codebook, iters=5
        ).collect()
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(qid, set()) & t) / len(t) for qid, t in truth.items()
        ) / len(truth)

    strict_win = False
    for nprobe in (1, 2, 3):
        r_md5, r_km = recall("md5", nprobe), recall("kmeans", nprobe)
        assert r_km >= r_md5, (nprobe, r_md5, r_km)
        if nprobe >= 2 and r_km > r_md5:
            strict_win = True
    assert strict_win, "kmeans never strictly beat the md5 pick"


def test_ivf_explicit_codebook_and_validation(spark):
    """An explicit pre-trained codebook is honored verbatim (the
    fixture path the ann_ivf_kmeans_topk oracle replays), and a
    wrong-shape codebook fails loudly instead of mis-assigning."""
    import numpy as np
    import pytest

    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        ivf_topk,
        train_ivf_codebook,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cmat = train_ivf_codebook(emb, dim=64, m=4, iters=2)
    assert cmat.shape == (4, 64)
    via_array = ivf_topk(emb, q, dim=64, k=3, m=4, nprobe=2, codebook=cmat).collect()
    assert len(via_array) > 0
    with pytest.raises(ValueError, match="codebook shape"):
        ivf_topk(emb, q, dim=64, k=3, m=8, nprobe=2, codebook=cmat)
    with pytest.raises(ValueError, match="unknown codebook"):
        ivf_topk(emb, q, dim=64, k=3, m=4, nprobe=2, codebook="faiss")
    # kmeans training is deterministic: same input -> same codebook
    cmat2 = train_ivf_codebook(emb, dim=64, m=4, iters=2)
    assert np.allclose(cmat, cmat2, rtol=0, atol=1e-12)


def test_ivf_corpus_smaller_than_m(spark):
    """Regression: with fewer corpus vectors than m, the md5/kmeans
    codebook has < m centroids and the probe's tie-break index must
    match the actual centroid count (np.lexsort raised a shape
    mismatch, killing every query task)."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    df, _ = _emb_df(spark, n=10)
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding")
    got = ivf_topk(df, queries, dim=16, k=3, m=16, nprobe=16).collect()
    assert got, "small corpus must still answer"
    # probing every cell is exact: match brute force
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(df, queries, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    assert approx == exact


def test_string_vec_ids_supported(spark):
    """Regression: the GEMM paths hardcoded `long` id schemas /
    np.int64 arrays, so string (e.g. url) vec ids crashed or nulled at
    the Arrow boundary. All four paths must carry the caller's id type
    through and agree with each other."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        brute_force_topk,
        embedding_decontaminate,
        neardup_pairs,
    )

    df_long, _ = _emb_df(spark, n=12)
    df = df_long.select(
        F.concat(F.lit("url-"), F.format_string("%02d", "vec_id")).alias("vec_id"),
        "embedding",
    )
    queries = df.select(F.col("vec_id").alias("query_id"), "embedding")

    got_b = {(r["query_id"], r["rank"], r["neighbor_id"])
             for r in brute_force_topk(df, queries, k=3, mode="broadcast").collect()}
    got_s = {(r["query_id"], r["rank"], r["neighbor_id"])
             for r in brute_force_topk(df, queries, k=3, mode="sharded",
                                       num_shards=3).collect()}
    assert got_b and got_b == got_s
    assert all(isinstance(q, str) and isinstance(nb, str) for q, _, nb in got_b)

    nd_b = {(r["vec_a"], r["vec_b"]) for r in
            neardup_pairs(df, threshold=0.3, mode="broadcast").collect()}
    nd_k = {(r["vec_a"], r["vec_b"]) for r in
            neardup_pairs(df, threshold=0.3, mode="blocked", num_blocks=3).collect()}
    assert nd_b == nd_k and all(a < b for a, b in nd_b)

    dec = embedding_decontaminate(df, df.limit(3)).collect()
    assert len(dec) == 12 and all(isinstance(r["vec_id"], str) for r in dec)


def test_semantic_dedup_keep_first_within_cluster(spark):
    """SemDeDup composition: duplicates only marked WITHIN a cell, the
    lowest id of each near-dup group is kept, cross-cell twins are
    never compared."""
    import math

    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        semantic_dedup,
    )

    dim = 4
    # two orthogonal centroids; vectors hug one or the other
    codebook = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),   # cell 1, keeper
        (2, [0.99, 0.01, 0.0, 0.0]), # cell 1, near-dup of 1
        (3, [0.8, 0.0, 0.6, 0.0]),   # cell 1, cos(1,3)=0.8 < 0.95: kept
        (4, [0.0, 1.0, 0.0, 0.0]),   # cell 2, keeper (identical DIRECTION
                                      # to nothing in cell 2 yet)
        (5, [0.0, 0.99, 0.0, 0.01]), # cell 2, near-dup of 4
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: (r.cell, r.is_dup) for r in
           semantic_dedup(emb, codebook, threshold=0.95).collect()}
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3][1] is False
    assert out[4] == (2, False)
    assert out[5] == (2, True)


def test_semantic_dedup_cross_cell_twins_not_compared(spark):
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        semantic_dedup,
    )

    codebook = [[1.0, 0.0], [0.0, 1.0]]
    # 2 (40 deg) and 3 (50 deg) are 10 degrees apart — cosine 0.985 —
    # but straddle the 45-degree cell boundary, so they are never
    # compared; within-cell pairs stay below the threshold
    rows = [
        (1, [1.0, 0.0]),       # cell 1; cos(1,2) = cos40 = 0.766 < 0.9
        (2, [0.766, 0.643]),   # cell 1
        (3, [0.643, 0.766]),   # cell 2
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.is_dup for r in
           semantic_dedup(emb, codebook, threshold=0.9).collect()}
    # 2 vs 3 exceed 0.9 cosine but sit in different cells: both kept
    assert out[2] is False and out[3] is False


def test_semantic_dedup_hot_cell_block_split(spark):
    """Hot-cell guard (round-5 VERDICT What's-wrong #1): a cell larger
    than ``max_cell_rows`` is block-split into (cell, block_a, block_b)
    join keys, and the split path returns EXACTLY the unsplit result.
    Plan-gated: with the bound exceeded the pair join keys on the block
    columns (so no single task owns a whole hot cell); at or above the
    cell size the keys collapse to the single-cell shape."""
    import math

    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        semantic_dedup,
    )

    codebook = [[1.0, 0.0], [0.0, 1.0]]
    # one hot cell: 40 vectors hugging centroid 0 in 4 near-dup bands,
    # plus 3 in the other cell
    rows = []
    for i in range(40):
        ang = 0.001 * (i % 4)
        rows.append((i, [math.cos(ang), math.sin(ang)]))
    for i in range(40, 43):
        ang = math.pi / 2 - 0.001 * (i % 3)
        rows.append((i, [math.cos(ang), math.sin(ang)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    unsplit = {
        (r.vec_id, r.cell, r.is_dup)
        for r in semantic_dedup(
            emb, codebook, threshold=0.9, max_cell_rows=1000
        ).collect()
    }
    split = semantic_dedup(emb, codebook, threshold=0.9, max_cell_rows=8)
    assert {(r.vec_id, r.cell, r.is_dup) for r in split.collect()} == unsplit

    # plan gate: the pair join carries the block columns when splitting
    plan = spark._jvm.PythonSQLUtils.explainString(
        split._jdf.queryExecution(), "formatted"
    )
    assert "_ba" in plan and "_bb" in plan
