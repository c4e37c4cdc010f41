"""Real BPE tokenizer gates (round-3 VERDICT #4): deterministic
training, canonical inference, distributed-operator == pure-Python
reference, and the pack_sequences wiring."""

from sifr_project_java_ontology_processing_spark.functions.bpe import (
    bpe_encode,
    bpe_encode_word,
    bpe_token_count,
    load_fixture_merges,
    pretokenize,
    train_bpe,
)

CORPUS = [
    "the theory of the theater",
    "the theme is theft, the theory thorough",
    "lower lowest newer newest wider widest",
    "low lower lowest new newer newest",
]


def test_train_is_deterministic_and_greedy():
    m1 = train_bpe(CORPUS, n_merges=50)
    m2 = train_bpe(list(CORPUS), n_merges=50)
    assert m1 == m2
    # 'th' ('74','68') is the most frequent pair in this corpus — the
    # first merge must pick it (greedy, not arbitrary)
    assert m1[0] == ("74", "68")


def test_encode_applies_lowest_rank_first():
    # ranks: ('74','68')->0 then ('7468','65')->1 chains into 'the'
    merges = [("74", "68"), ("7468", "65")]
    assert bpe_encode_word("the", {p: i for i, p in enumerate(merges)}) == ["746865"]
    # a word with no applicable merges stays byte-split
    assert bpe_encode_word("xyz", {p: i for i, p in enumerate(merges)}) == [
        "78", "79", "7a",
    ]


def test_encode_roundtrip_identity():
    """Byte-level BPE loses nothing: concatenating the hex symbols of
    every token reconstructs the exact UTF-8 bytes of the pre-tokens —
    for ANY text, including unicode and punctuation."""
    merges = train_bpe(CORPUS, n_merges=40)
    for text in CORPUS + ["naïve café — ¡hola! 東京 123.45"]:
        toks = bpe_encode(text, merges)
        joined = bytes.fromhex("".join(toks)).decode("utf-8")
        assert joined == "".join(pretokenize(text))


def test_more_merges_never_increase_token_count():
    merges = train_bpe(CORPUS, n_merges=60)
    text = "the lowest theory of the newest theater"
    counts = [len(bpe_encode(text, merges[:k])) for k in (0, 5, 20, 60)]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] == sum(len(w.encode()) for w in pretokenize(text))


def test_spark_operator_matches_reference_encoder(spark):
    merges = train_bpe(CORPUS, n_merges=40)
    rows = [(i, t) for i, t in enumerate(CORPUS)] + [
        (100, None),          # NULL text -> 0 tokens, row kept
        (101, ""),            # empty -> 0
        (102, "naïve café — ¡hola! 東京"),
        (103, "the " * 500),  # cache-hammering repeat
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(docs, merges).collect()
    }
    assert len(got) == len(rows)
    for i, t in rows:
        assert got[i] == len(bpe_encode(t or "", merges)), (i, t)


def test_fixture_merges_load_and_count():
    merges = load_fixture_merges()
    assert len(merges) > 50
    assert all(len(p) == 2 for p in merges)
    # fixture merges must actually compress common English
    text = "the more the merrier in the theater"
    assert len(bpe_encode(text, merges)) < sum(
        len(w.encode()) for w in pretokenize(text)
    )


def test_pack_sequences_takes_bpe_counts(spark):
    """The advertised wiring: bpe_token_count output feeds
    pack_sequences' n_tokens_col and the cut points follow the REAL
    token counts (not whitespace counts)."""
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        pack_sequences,
    )

    merges = train_bpe(CORPUS, n_merges=40)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    counted = docs.join(bpe_token_count(docs, merges), "doc_id")
    packed = {
        r["doc_id"]: (r["n_tok"], r["start_seq"], r["start_offset"])
        for r in pack_sequences(
            counted, budget=16, n_tokens_col="n_bpe_tokens"
        ).collect()
    }
    ref = [len(bpe_encode(t, merges)) for t in CORPUS]
    run = 0
    for i, n in enumerate(ref):
        assert packed[i] == (n, run // 16, run % 16), i
        run += n


def test_bpe_count_string_ids(spark):
    """Code-review hardening: the id column's real type flows through
    the Arrow schema — url-string ids must survive, not null out."""
    merges = train_bpe(CORPUS, n_merges=20)
    docs = spark.createDataFrame(
        [("http://a/1", CORPUS[0]), ("http://a/2", CORPUS[1])], "url string, text string"
    )
    got = {
        r["url"]: r["n_bpe_tokens"]
        for r in bpe_token_count(docs, merges, id_col="url").collect()
    }
    assert set(got) == {"http://a/1", "http://a/2"}
    assert got["http://a/1"] == len(bpe_encode(CORPUS[0], merges))


def test_token_ids_match_reference_and_roundtrip(spark):
    """bpe_token_ids: vocab layout is 256 base bytes + one id per merge
    rank; the distributed id stream equals the reference encoding and
    decodes back to the pre-token byte stream."""
    from sifr_project_java_ontology_processing_spark.functions.bpe import (
        bpe_token_ids,
        token_id_table,
    )

    merges = train_bpe(CORPUS, n_merges=40)
    vocab = token_id_table(merges)
    assert vocab["61"] == 0x61  # base byte ids are the byte values
    assert min(v for k, v in vocab.items() if len(k) > 2) == 256
    inv = {v: k for k, v in vocab.items()}

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)] + [(100, None), (101, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_token_ids(docs, merges).collect()
    }
    assert got[100] == [] and got[101] == []
    for i, t in enumerate(CORPUS):
        ref = [vocab[s] for s in bpe_encode(t, merges)]
        assert got[i] == ref, i
        decoded = bytes.fromhex("".join(inv[x] for x in got[i])).decode()
        assert decoded == "".join(pretokenize(t))


def test_token_id_table_colliding_concat_keeps_first_rank():
    """ADVICE round-4: ('61','6263') and ('6162','63') both concatenate
    to '616263' — the FIRST rank's id must stay stable (later overwrite
    would orphan an assigned id and break bijectivity)."""
    from sifr_project_java_ontology_processing_spark.functions.bpe import token_id_table

    merges = [("62", "63"), ("61", "6263"), ("61", "62"), ("6162", "63")]
    vocab = token_id_table(merges)
    assert vocab["6263"] == 256
    assert vocab["616263"] == 257  # first producer (rank 1), not rank 3
    assert vocab["6162"] == 258
    # every assigned id maps to exactly one symbol
    ids = list(vocab.values())
    assert len(ids) == len(set(ids))
