"""Gopher rule-suite quality filter (operators/quality_rules.py):
hand-computed feature values, verdict thresholds, null-text safety,
and the no-shuffle plan guarantee."""

from __future__ import annotations

from sifr_project_java_ontology_processing_spark.operators.quality_rules import (
    gopher_features,
    gopher_quality,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_features_hand_computed(spark):
    text = "The cat sat on # mat...\n• bullet one\n- bullet two\nplain line…"
    out = gopher_features(_docs(spark, [(1, text)])).collect()[0]
    # words: The cat sat on # mat... • bullet one - bullet two plain line…
    assert out["n_words"] == 14
    # '#' and '-' and '•' count as words but carry no alpha
    assert out["frac_alpha_words"] == round(11 / 14, 6)
    # one '#', one '...', one '…' over 14 words
    assert out["symbol_word_ratio"] == round(3 / 14, 6)
    # 4 non-empty lines: 2 bullets; 2 end in an ellipsis ('mat...' and
    # 'line…')
    assert out["bullet_line_frac"] == 0.5
    assert out["ellipsis_line_frac"] == 0.5
    # 'the' (lowercased) and 'on' -> only 'the' is a Gopher stopword
    assert out["stopword_hits"] == 1


def test_gopher_null_and_empty_text_are_safe(spark):
    out = {
        r["doc_id"]: r["gopher_pass"]
        for r in gopher_quality(_docs(spark, [(1, None), (2, "")])).collect()
    }
    assert out == {1: False, 2: False}


def test_gopher_verdict_thresholds(spark):
    good = (
        "The quick brown fox jumps over the lazy dog and that is fine "
        "to have with all of the words being normal prose sentences. "
    ) * 3  # ~60 words, plenty of stopwords, no symbols
    short = "The cat sat with that."  # < 50 words
    symbols = ("word " * 60) + "# # # # # # # #"  # symbol ratio > 0.1... 
    rows = [(1, good), (2, short), (3, symbols)]
    out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, rows)).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["gopher_pass"] is False  # word count floor
    # 8 '#' over 68 words = 0.118 > 0.1 -> fails symbol rule (and
    # stop-hits: 'word' repeated has none)
    assert out[3]["gopher_pass"] is False
    assert out[3]["symbol_word_ratio"] > 0.1
    # thresholds are overridable
    relaxed = gopher_quality(
        _docs(spark, [(2, short)]), min_words=3, min_stop_hits=2
    ).collect()[0]
    assert relaxed["gopher_pass"] is True


def test_gopher_plan_has_no_shuffle(spark):
    df = gopher_quality(_docs(spark, [(1, "a b c")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
