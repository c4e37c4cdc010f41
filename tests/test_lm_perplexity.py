"""CCNet-style bigram LM perplexity scoring (operators/lm_perplexity)."""

import math

import pytest
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.operators.lm_perplexity import (
    bucket_perplexity,
    perplexity_thresholds,
    score_perplexity,
    train_word_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the dog sat"),
        (4, None),  # NULL text must still train/score
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_counts_and_vocab(spark, corpus):
    lm = train_word_lm(corpus, alpha=0.5)
    bg = {(r.ctx, r.tok): r.c for r in lm.bigrams.collect()}
    # 3 sentences start with 'the'; doc 4 is the bare (<s>, </s>) bigram
    assert bg[("<s>", "the")] == 3
    assert bg[("the", "cat")] == 2
    assert bg[("<s>", "</s>")] == 1
    cx = {r.ctx: r.cc for r in lm.contexts.collect()}
    assert cx["<s>"] == 4 and cx["the"] == 3
    # successors: the cat sat ran dog </s>  (never <s>)
    assert lm.vocab_size == 6


def test_score_matches_hand_computation(spark, corpus):
    lm = train_word_lm(corpus, alpha=0.5)
    scored = {r.doc_id: r for r in score_perplexity(corpus, lm).collect()}
    a, v = 0.5, lm.vocab_size
    # doc 1: (<s>,the)(the,cat)(cat,sat)(sat,</s>)
    # NB (sat,</s>) counts 2 — 'sat' ends docs 1 AND 3
    ps = [(3 + a) / (4 + a * (v + 1)),
          (2 + a) / (3 + a * (v + 1)),
          (1 + a) / (2 + a * (v + 1)),
          (2 + a) / (2 + a * (v + 1))]
    ce = -sum(math.log(p) for p in ps) / 4
    assert scored[1].n_bigrams == 4
    assert scored[1].cross_entropy == pytest.approx(ce, rel=1e-12)
    assert scored[1].perplexity == pytest.approx(math.exp(ce), rel=1e-12)
    # NULL text: single (<s>, </s>) bigram, count 1
    assert scored[4].n_bigrams == 1
    p = (1 + a) / (4 + a * (v + 1))
    assert scored[4].cross_entropy == pytest.approx(-math.log(p), rel=1e-12)


def test_unseen_tokens_score_higher(spark, corpus):
    lm = train_word_lm(corpus, alpha=0.5)
    unseen = spark.createDataFrame(
        [(10, "zq xv qqq")], "doc_id long, text string"
    )
    in_dom = score_perplexity(corpus.where("doc_id = 1"), lm).first()
    oov = score_perplexity(unseen, lm).first()
    assert oov.cross_entropy > in_dom.cross_entropy
    # exact: (<s>,zq) unseen tok in seen ctx; the rest unseen ctx
    # (the 1/(V+1) floor); (qqq,</s>) also unseen ctx
    a, v = 0.5, lm.vocab_size
    ps = [a / (4 + a * (v + 1))] + [a / (a * (v + 1))] * 3
    ce = -sum(math.log(p) for p in ps) / 4
    assert oov.cross_entropy == pytest.approx(ce, rel=1e-12)


def test_thresholds_and_buckets(spark):
    rows = [(i, "the cat sat" if i % 3 else "zz qq ww") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_word_lm(docs.where("doc_id % 3 != 0"), alpha=0.1)
    scored = score_perplexity(docs, lm)
    t1, t2 = perplexity_thresholds(scored)
    assert t1 <= t2
    b = bucket_perplexity(scored, t1, t2)
    counts = {r.bucket: r.c for r in b.groupBy("bucket").agg(
        F.count("*").alias("c")).collect()}
    # the 20 in-domain docs land head/middle, the 10 gibberish tail
    assert counts.get("tail", 0) == 10
    assert sum(counts.values()) == 30


def test_broadcast_off_path_same_result(spark, corpus):
    lm = train_word_lm(corpus, alpha=0.5)
    on = sorted(
        (r.doc_id, round(r.cross_entropy, 10))
        for r in score_perplexity(corpus, lm, broadcast_model=True).collect()
    )
    off = sorted(
        (r.doc_id, round(r.cross_entropy, 10))
        for r in score_perplexity(corpus, lm, broadcast_model=False).collect()
    )
    assert on == off
