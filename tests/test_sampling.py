"""Deterministic sampling / mixing / packing (operators/sampling.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    stratified_sample,
    upsample,
)


def _docs(spark, n=400):
    rows = [(i, ["en", "fr", "de", "zh"][i % 4], f"tok{i} " * (1 + i % 7)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _kept(doc_id: int, seed: int, frac: float) -> bool:
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8]
    return h < format(int(frac * 16**8), "08x")


def test_hash_sample_deterministic_and_exact(spark):
    df = _docs(spark)
    got = {r["doc_id"] for r in hash_sample(df, 0.5, seed=7).collect()}
    want = {i for i in range(400) if _kept(i, 7, 0.5)}
    assert got == want  # EXACT per-row decision, not approximate
    # rerun + different partitioning → identical sample
    again = {r["doc_id"] for r in hash_sample(df.repartition(13), 0.5, seed=7).collect()}
    assert again == got
    assert hash_sample(df, 1.0).count() == 400  # frac >= 1 keeps all


def test_stratified_sample_per_stratum(spark):
    df = _docs(spark)
    out = stratified_sample(
        df, {"en": 0.5, "fr": 1.0}, stratum_col="lang", seed=42, default_fraction=0.0
    )
    rows = out.collect()
    langs = {r["lang"] for r in rows}
    assert langs == {"en", "fr"}
    assert sum(r["lang"] == "fr" for r in rows) == 100  # all fr kept
    en_ids = {r["doc_id"] for r in rows if r["lang"] == "en"}
    assert en_ids == {i for i in range(0, 400, 4) if _kept(i, 42, 0.5)}


def test_upsample_copy_counts(spark):
    df = _docs(spark, n=200)
    out = upsample(df, 2.3, seed=43).collect()
    by_id: dict[int, list[int]] = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r["copy"])
    for i in range(200):
        # threshold arithmetic: frac = 2.3 - 2 exactly as the operator
        # computes it (NOT a literal 0.3 — float subtraction differs)
        expect = 2 + (1 if _kept(i, 43, 2.3 - 2) else 0)
        assert sorted(by_id[i]) == list(range(expect)), (i, by_id[i])
    # rate < 1 degenerates to a sample with copy=0
    small = upsample(df, 0.25, seed=43).collect()
    assert all(r["copy"] == 0 for r in small)
    assert {r["doc_id"] for r in small} == {i for i in range(200) if _kept(i, 43, 0.25)}


def test_pack_sequences_matches_python_and_partitioning_invariant(spark):
    df = _docs(spark, n=150)
    budget = 17
    got = {
        r["doc_id"]: (r["n_tok"], r["start_seq"], r["start_offset"], r["end_seq"])
        for r in pack_sequences(df, budget=budget).collect()
    }
    cum = 0
    for i in range(150):
        n = 1 + i % 7
        start = cum
        cum += n
        want = (n, start // budget, start % budget, max(cum - 1, start) // budget)
        assert got[i] == want, (i, got[i], want)
    # the packing is a function of the ordered counts ONLY — any input
    # partitioning yields the identical layout
    got2 = {
        r["doc_id"]: (r["n_tok"], r["start_seq"], r["start_offset"], r["end_seq"])
        for r in pack_sequences(df.repartition(11), budget=budget).collect()
    }
    assert got2 == got


def test_pack_sequences_empty_doc_and_doc_spanning_sequences(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, " ".join(["w"] * 40)), (4, "x")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["start_seq"], r["start_offset"], r["end_seq"])
        for r in pack_sequences(df, budget=10).collect()
    }
    assert got[1] == (3, 0, 0, 0)
    assert got[2] == (0, 0, 3, 0)          # empty doc: zero-width at its offset
    assert got[3] == (40, 0, 3, 4)         # spans sequences 0..4
    assert got[4] == (1, 4, 3, 4)


def test_sampling_ops_are_map_only(spark):
    """hash/stratified/upsample must add NO shuffle — pure codegen
    expressions over the scan."""
    df = _docs(spark)
    for op in (
        lambda d: hash_sample(d, 0.5),
        lambda d: stratified_sample(d, {"en": 0.5}, "lang"),
        lambda d: upsample(d, 2.3),
    ):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_mix_corpora_single_pass(spark):
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        mix_corpora,
    )

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_corpora(df, {"a": 2.5, "b": 0.25}, seed=43)
    by_id: dict[int, int] = {}
    for r in out.collect():
        by_id[r["doc_id"]] = by_id.get(r["doc_id"], 0) + 1
    for i, src in rows:
        if src == "a":
            want = 2 + (1 if _kept(i, 43, 0.5) else 0)
        elif src == "b":
            want = 1 if _kept(i, 43, 0.25) else 0
        else:
            want = 1
        assert by_id.get(i, 0) == want, (i, src, by_id.get(i, 0), want)
    # single pass: one scan, no union, no shuffle
    plan = mix_corpora(df, {"a": 2.5, "b": 0.25})._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Exchange" not in plan and plan.count("Scan") <= 1, plan


def test_pack_sequences_null_text_is_zero_tokens(spark):
    """A NULL text row must count 0 tokens — F.size(NULL) is -1 under
    Spark's legacy sizeOfNull and would silently shift every later
    document's offsets (round-3 review finding)."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "c d e")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["start_seq"], r["start_offset"], r["end_seq"])
        for r in pack_sequences(df, budget=4).collect()
    }
    assert got[2] == (0, 0, 2, 0)
    assert got[3] == (3, 0, 2, 1)  # NOT shifted by a phantom -1


# ---------------------------------------------------------------------------
# chunk_documents (round 4)
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        chunk_documents,
    )

    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = sorted(
        chunk_documents(docs, max_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 3: starts 0,3,6 -> ceil((10-1)/3)=3 chunks
    assert [r["chunk_text"] for r in out] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4]


def test_chunk_documents_tail_and_empty(spark):
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "")], "doc_id long, text string"
    )
    out = chunk_documents(docs, max_tokens=3, overlap=0)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert rows[(1, 0)]["chunk_text"] == "a b c"
    assert rows[(1, 1)]["chunk_text"] == "d e"
    assert rows[(1, 1)]["n_chunk_tokens"] == 2
    # empty doc -> exactly one empty chunk (no silent row loss)
    assert rows[(2, 0)]["chunk_text"] == "" and rows[(2, 0)]["n_chunk_tokens"] == 0
    assert len(rows) == 3


def test_chunk_documents_coverage_identity(spark):
    """Concatenating stride-window heads reconstructs the doc: chunks
    cover every token exactly once at overlap=0."""
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        chunk_documents,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(i))) for i in range(1, 30)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=7, overlap=0)
    rebuilt = (
        out.groupBy("doc_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_id", "chunk_text"))
                        ),
                        lambda s: F.split(s["chunk_text"], " "),
                    )
                ),
                " ",
            ).alias("re")
        )
    )
    joined = docs.join(rebuilt, "doc_id")
    bad = joined.where(F.col("re") != F.col("text")).count()
    assert bad == 0
