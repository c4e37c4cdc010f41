"""Model-based quality scorer gates (round-3 VERDICT #5): closed-form
NB log-odds training, held-out accuracy, NULL/empty handling, and the
broadcast-join plan shape."""

import pytest

from sifr_project_java_ontology_processing_spark.operators.quality_model import (
    evaluate_quality_model,
    score_quality_model,
    train_quality_weights,
)

GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a short history of the printing press and its impact on europe",
    "cooking pasta requires salted water and a watchful eye on the clock",
    "the committee approved the budget after a long debate on tuesday",
    "solar panels convert sunlight into electricity with improving efficiency",
    "she walked to the market and bought fresh bread and ripe tomatoes",
]
BAD = [
    "zqx vbn mmklo pqrst wxyz qqq jjj kkk",
    "aa1 bb2 cc3 dd4 ee5 ff6 gg7 hh8",
    "lorem zxcvb asdfg qwert poiuy mnbvc",
    "xx yy zz ww vv uu tt ss rr qq",
    "blarg snork fleeb glomp wizzle frap",
    "krx plm ssn ttv uuw xxy zza bbq",
]


def _labeled(spark, goods, bads, start_id=0):
    rows = [(start_id + i, t, 1) for i, t in enumerate(goods)] + [
        (start_id + 100 + i, t, 0) for i, t in enumerate(bads)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_weights_are_exact_log_odds(spark):
    labeled = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "alpha gamma", 1), (3, "beta delta", 0)],
        "doc_id long, text string, label int",
    )
    weights, bias = train_quality_weights(labeled)
    import math

    got = {r["token"]: r["weight"] for r in weights.collect()}
    # alpha: df_pos=2 df_neg=0 -> ln(2.5/0.5); beta: 1/1 -> ln(1.5/1.5)
    assert got["alpha"] == pytest.approx(math.log(5.0))
    assert got["beta"] == pytest.approx(0.0)
    assert got["delta"] == pytest.approx(math.log(0.5 / 1.5))
    assert bias == pytest.approx(math.log(2.5 / 1.5))
    # binarized: repeating a token must not change its weight
    labeled2 = spark.createDataFrame(
        [(1, "alpha alpha alpha beta", 1), (2, "alpha gamma", 1), (3, "beta delta", 0)],
        "doc_id long, text string, label int",
    )
    w2, _ = train_quality_weights(labeled2)
    assert {r["token"]: r["weight"] for r in w2.collect()}["alpha"] == got["alpha"]


def test_held_out_accuracy_gate(spark):
    """Train on one half, score the UNSEEN half: the model must still
    separate text from gibberish (shared English function words carry
    the signal) — accuracy >= 0.9 on the held-out golden set."""
    train = _labeled(spark, GOOD[:3], BAD[:3])
    held = _labeled(spark, GOOD[3:], BAD[3:], start_id=50)
    weights, bias = train_quality_weights(train)
    scored = score_quality_model(held, weights, bias)
    m = evaluate_quality_model(scored, held)
    assert m["n"] == 6.0
    assert m["accuracy"] >= 0.9, m
    assert m["recall"] >= 0.9, m


def test_every_doc_scored_incl_null_and_empty(spark):
    train = _labeled(spark, GOOD[:3], BAD[:3])
    weights, bias = train_quality_weights(train)
    docs = spark.createDataFrame(
        [(1, GOOD[0]), (2, None), (3, ""), (4, BAD[0])], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in score_quality_model(docs, weights, bias).collect()}
    assert set(got) == {1, 2, 3, 4}
    import math

    sb = 1.0 / (1.0 + math.exp(-bias))
    assert got[2]["model_quality"] == pytest.approx(round(sb, 6))
    assert got[3]["model_quality"] == pytest.approx(round(sb, 6))
    assert got[1]["model_quality"] > got[4]["model_quality"]


def test_min_df_prunes_vocabulary(spark):
    train = _labeled(spark, GOOD, BAD)
    w_all, _ = train_quality_weights(train, min_df=1)
    w_df2, _ = train_quality_weights(train, min_df=2)
    n_all, n_df2 = w_all.count(), w_df2.count()
    assert n_df2 < n_all
    # 'the' appears in >= 2 good docs -> survives
    assert w_df2.where("token = 'the'").count() == 1


def test_scoring_plan_is_broadcast_no_shuffle_join(spark):
    """The weights join must be a broadcast hash join (map-side): token
    skew never shuffles the corpus token stream."""
    train = _labeled(spark, GOOD[:3], BAD[:3])
    weights, bias = train_quality_weights(train)
    docs = spark.createDataFrame([(1, GOOD[0])], "doc_id long, text string")
    plan = score_quality_model(
        docs, weights, bias
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_evaluate_empty_golden_reports_zero_not_crash(spark):
    """Code-review hardening: a golden set sharing no ids with the
    scored frame must report zero metrics, not TypeError on NULL
    aggregates."""
    train = _labeled(spark, GOOD[:3], BAD[:3])
    weights, bias = train_quality_weights(train)
    scored = score_quality_model(
        spark.createDataFrame([(1, GOOD[0])], "doc_id long, text string"),
        weights,
        bias,
    )
    golden = spark.createDataFrame([(999, 1)], "doc_id long, label int")
    m = evaluate_quality_model(scored, golden)
    assert m == {"accuracy": 0.0, "precision": 0.0, "recall": 0.0, "n": 0.0}


def test_inline_scorer_matches_grouped_scorer(spark):
    """score_quality_inline (constant-folded map literal + F.aggregate
    fold, zero shuffle) must produce the SAME scores as the grouped
    broadcast-join scorer — same model, two physical shapes."""
    from sifr_project_java_ontology_processing_spark.operators.quality_model import (
        score_quality_inline,
        weights_as_dict,
    )

    train = _labeled(spark, GOOD[:4], BAD[:4])
    weights, bias = train_quality_weights(train)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + BAD)] + [(99, None), (98, "")],
        "doc_id long, text string",
    )
    grouped = {
        r["doc_id"]: (r["model_quality"], r["is_good"])
        for r in score_quality_model(docs, weights, bias).collect()
    }
    wd = weights_as_dict(weights)
    inline = {
        r["doc_id"]: (r["model_quality"], r["is_good"])
        for r in score_quality_inline(docs, wd, bias).select(
            "doc_id", "model_quality", "is_good"
        ).collect()
    }
    assert set(inline) == set(grouped)
    for k in grouped:
        assert inline[k][0] == pytest.approx(grouped[k][0], abs=2e-6), k
        assert inline[k][1] == grouped[k][1], k
    # empty weights dict: score == sigmoid(bias), nothing passes strict
    none_scored = score_quality_inline(docs, {}, 0.0).collect()
    assert all(not r["is_good"] for r in none_scored)
    # inline scoring is shuffle-free (streamable): no Exchange at all
    plan = score_quality_inline(docs, wd, bias)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan, plan
