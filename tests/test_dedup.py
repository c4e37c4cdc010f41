"""Dedup operators vs independent Python oracles."""

from __future__ import annotations

import hashlib

from sifr_project_java_ontology_processing_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)

DOCS = [
    (0, "a b c d e f g h"),
    (1, "a b c d e f g h"),                  # exact dup of 0
    (2, "a b c d e f g x"),                  # near dup of 0
    (3, "p q r s t u v w"),                  # unrelated
    (4, "p q r s t u v w y z"),              # near dup of 3
    (5, "one two"),                          # too short for 5-shingles
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text: str, n=5) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup(spark):
    got = {r["text_hash"]: (r["n_docs"], r["keeper"]) for r in exact_dedup(_docs_df(spark)).collect()}
    h = hashlib.md5(b"a b c d e f g h").hexdigest()
    assert got[h] == (2, 0)
    assert sum(n for n, _ in got.values()) == len(DOCS)


def test_ngram_jaccard_vs_python(spark):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(_docs_df(spark), threshold=0.01).collect()}
    want = {}
    for i, (ida, ta) in enumerate(DOCS):
        for idb, tb in DOCS[i + 1 :]:
            sa, sb = _py_shingles(ta), _py_shingles(tb)
            inter = len(sa & sb)
            if sa and sb and inter:
                j = inter / len(sa | sb)
                if j >= 0.01:
                    want[(ida, idb)] = round(j, 6)
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0


def test_minhash_identical_signatures_for_dups(spark):
    sigs = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(_docs_df(spark)).collect()}
    assert sigs[0] == sigs[1]          # identical docs → identical sigs
    assert sigs[0] != sigs[3]
    assert 5 not in sigs               # short doc: no shingles → no signature
    assert all(len(s) == 8 for s in sigs.values())


def test_minhash_lsh_finds_dups(spark):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(_docs_df(spark)).collect()}
    assert (0, 1) in pairs             # exact dups always collide
    assert (0, 3) not in pairs         # unrelated docs shouldn't


def test_simhash_neardup(spark):
    # pigeonhole needs bands >= hamming+1: 32 two-bit bands cover h<=20
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_neardup_pairs(_docs_df(spark), max_hamming=20, prefix_bands=32).collect()}
    assert pairs.get((0, 1)) == 0      # identical → hamming 0
    near = pairs.get((0, 2))
    assert near is not None and near <= 20


def test_simhash_banding_rejects_lossy_params(spark):
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_neardup_pairs(_docs_df(spark), max_hamming=16, prefix_bands=4)


def test_jaccard_verify_matches_selfjoin_on_candidates(spark):
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        jaccard_verify,
        minhash_lsh_pairs,
    )

    docs = _docs_df(spark)
    cands = minhash_lsh_pairs(docs)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verify(docs, cands, threshold=0.01).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.01).collect()
    }
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    # verify path == full-pairs jaccard restricted to the candidate set
    assert got == {p: j for p, j in full.items() if p in cand_set}
    assert got[(0, 1)] == 1.0


def test_dedup_clusters_keeper(spark):
    from sifr_project_java_ontology_processing_spark.operators.dedup import dedup_clusters

    docs = _docs_df(spark)
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: (r["keeper"], r["is_kept"]) for r in dedup_clusters(docs, pairs).collect()}
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (3, False), 5: (5, True),
    }


def test_rolling_fingerprint_order_sensitive(spark):
    from sifr_project_java_ontology_processing_spark.operators.textanalysis import (
        rolling_fingerprint,
    )

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "c b a"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["rolling_hash"] for r in rolling_fingerprint(docs).collect()}
    assert got[0] == got[2]          # same order -> same hash
    assert got[0] != got[1]          # same tokens, different order -> different
    assert got[3] == 0               # empty doc
    # python oracle for doc 0
    import hashlib
    h = 0
    for t in ["a", "b", "c"]:
        v = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        h = (h * 31 + v) % 2147483647
    assert got[0] == h


def test_fuzzy_decontaminate_semantics(spark):
    """A lightly edited copy of a benchmark doc is flagged (exact n-gram
    overlap may still exist, but the point is high Jaccard); unrelated
    docs are not; benchmark members flag themselves at 1.0."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        fuzzy_decontaminate,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
                 "lambda mu nu xi omicron pi rho sigma tau upsilon"
    edited = bench_text.replace("pi rho", "pie rho")  # light edit
    docs = spark.createDataFrame(
        [
            (1, bench_text),   # identical to benchmark -> 1.0
            (2, edited),       # near-dup -> high jaccard, flagged
            (3, "totally different words that share nothing at all " * 3),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["max_jaccard"], r["is_fuzzy_contaminated"])
        for r in fuzzy_decontaminate(docs, bench, threshold=0.5).collect()
    }
    assert got[1] == (1.0, True)
    assert got[2][1] and 0.5 <= got[2][0] < 1.0
    assert got[3] == (0.0, False)


# ---------------------------------------------------------------------------
# paragraph-level dedup (round 4)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from sifr_project_java_ontology_processing_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha one\nshared para\nbeta two"),
            (2, "shared para\ngamma three"),
            (3, "SHARED PARA  \nalpha one"),  # normalized dup of doc 1's paras
            (4, ""),  # empty doc must survive
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["text_dedup"] == "alpha one\nshared para\nbeta two"
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text_dedup"] == "gamma three"
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["text_dedup"] == ""  # both paras are normalized repeats
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (2, 0)
    assert (out[4]["n_paras"], out[4]["n_kept"], out[4]["text_dedup"]) == (0, 0, "")


def test_paragraph_dedup_order_restored_within_doc(spark):
    from sifr_project_java_ontology_processing_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "z last\na first\nm mid")], "doc_id long, text string"
    )
    out = paragraph_dedup(docs).collect()[0]
    assert out["text_dedup"] == "z last\na first\nm mid"


def test_duplicate_spans_and_regions(spark):
    """ExactSubstr-lite: planted 12-token boilerplate across two docs
    is found window-by-window and merged into one maximal region per
    doc; the unique doc reports nothing."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        duplicate_spans,
        merge_duplicate_regions,
    )

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + boiler + " gamma delta"),
            (2, "one two three " + boiler + " four"),
            (3, "totally unique text with no duplication at all here ok fine"),
        ],
        "doc_id long, text string",
    )
    s = duplicate_spans(docs, span_tokens=5, stride=1)
    assert sorted((r.doc_id, r.pos) for r in s.collect()) == (
        [(1, p) for p in range(2, 10)] + [(2, p) for p in range(3, 11)]
    )
    assert {r.n_docs for r in s.collect()} == {2}
    m = merge_duplicate_regions(s, span_tokens=5)
    assert sorted((r.doc_id, r.start_token, r.end_token) for r in m.collect()) == [
        (1, 2, 14), (2, 3, 15),
    ]


def test_duplicate_spans_stride_and_within_doc(spark):
    """stride>1 samples windows; min_docs=2 means WITHIN-doc repetition
    alone is not reported."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        duplicate_spans,
    )

    rep = "x y z w v"
    docs = spark.createDataFrame(
        [(1, rep + " " + rep + " filler tokens here")],  # self-repeat only
        "doc_id long, text string",
    )
    assert duplicate_spans(docs, span_tokens=5, stride=1).count() == 0
    docs2 = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    s = duplicate_spans(docs2, span_tokens=4, stride=2)
    assert sorted((r.doc_id, r.pos) for r in s.collect()) == [
        (1, 0), (1, 2), (1, 4), (1, 6), (2, 0), (2, 2), (2, 4), (2, 6),
    ]


def test_minhash_banding_rejects_indivisible_k(spark):
    """Regression: k % bands != 0 silently left the trailing signature
    rows outside every band (recall loss with no error) — now it raises
    like simhash's prefix_bands check."""
    import pytest

    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        fuzzy_decontaminate,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="not divisible"):
        minhash_lsh_pairs(docs, k=8, bands=3)
    with pytest.raises(ValueError, match="not divisible"):
        fuzzy_decontaminate(docs, docs, k=8, bands=3)
