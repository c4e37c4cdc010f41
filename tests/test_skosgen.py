"""SKOS generator (A1-A6, W2, J10, F1) vs reference semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.uris import (
    SKOS_ALT_LABEL,
    SKOS_BROADER,
    SKOS_PREF_LABEL,
)
from sifr_project_java_ontology_processing_spark.operators.skosgen import (
    assign_chapters,
    generate_skos,
    label_code_pairs,
    most_frequent_code,
    pick_pref_labels,
    unambiguous_std_labels,
)

BASE = "http://chu-rouen.fr/cismef/CIM-10#"


def _dict_df(spark):
    return spark.createDataFrame(
        [
            ("angine aigue", "J029", None),
            ("ANGINE SAI", "J029", None),       # high-uppercase → not pref
            ("angine", "J029", "J03"),          # second code column
            ("grippe", "J111", ""),             # empty second code dropped
            ("x", "NULL", None),                # NULL code dropped
        ],
        "label string, code string, code2 string",
    )


def _corpus_df(spark):
    return spark.createDataFrame(
        [
            ("grippe saisonniere", "grippe", "J111"),
            ("angine rouge", "angine", "J029"),
            ("angine rouge", "angine", "J029"),
            ("angine blanche", "angine", "J03"),  # 'angine' std now ambiguous
            ("toux grasse", "toux", "R051"),
        ],
        "raw_text string, std_text string, code string",
    )


def test_pairs_normalization_and_filters(spark):
    pairs = label_code_pairs(_dict_df(spark), _corpus_df(spark))
    rows = {(r["label"], r["code"]) for r in pairs.collect()}
    assert ("angine aigue", "J02.9") in rows       # F1: J029 → J02.9
    assert ("angine", "J03") in rows               # code2 kept
    assert not any(c in ("", "NULL") for _, c in rows)
    assert ("toux grasse", "R05.1") in rows        # corpus raw text


def test_most_frequent_code_argmax(spark):
    pairs = label_code_pairs(_dict_df(spark), _corpus_df(spark))
    mfc = {r["label"]: r["code"] for r in most_frequent_code(pairs).collect()}
    assert mfc["angine"] == "J02.9"  # seen 2x with J02.9 (dict+corpus), 2x J03 → tie? no: dict(J029), corpus std 2x J029, 1x J03 → J02.9 wins


def test_unambiguous_std_labels(spark):
    pairs = label_code_pairs(_dict_df(spark), _corpus_df(spark))
    kept = {(r["label"], r["code"]) for r in unambiguous_std_labels(pairs).collect()}
    assert ("grippe", "J11.1") in kept       # unique std label
    assert not any(l == "angine" for l, _ in kept)  # ambiguous std dropped
    assert ("angine rouge", "J02.9") in kept  # raw labels always kept


def test_pref_label_heuristic(spark):
    pairs = label_code_pairs(_dict_df(spark))
    pref = {r["code"]: r["pref_label"] for r in pick_pref_labels(pairs).collect()}
    # 'angine' (6) shorter than 'angine aigue'; 'ANGINE SAI' rejected by ratio
    assert pref["J02.9"] == "angine"


def test_chapter_range_join(spark):
    codes = spark.createDataFrame([("A01.1",), ("J02.9",), ("Z99.9",)], "code string")
    chapters = spark.createDataFrame(
        [("ch1", "A00", "B99"), ("ch2", "C00", "K99")],
        "chapter_uri string, lo string, hi string",
    )
    got = {r["code"]: r["chapter_uri"] for r in assign_chapters(codes, chapters).collect()}
    # reference takes the FIRST chapter with hi >= code (min hi)
    assert got["A01.1"] == "ch1"
    assert got["J02.9"] == "ch2"
    # reference-parity: a code above every hi falls back to the FIRST
    # chapter (getChapterURI's rangeURI default), not to null
    assert got["Z99.9"] == "ch1"


def test_generate_skos_triples(spark):
    chapters = spark.createDataFrame(
        [("ch1", "A00", "Z99")], "chapter_uri string, lo string, hi string"
    )
    triples = generate_skos(_dict_df(spark), _corpus_df(spark), chapters, lang="fr")
    rows = {(r["subj"], r["pred"], r["obj"], r["obj_lang"]) for r in triples.collect()}
    assert (f"{BASE}J02.9", SKOS_PREF_LABEL, "angine", "fr") in rows
    assert (f"{BASE}J02.9", SKOS_ALT_LABEL, "ANGINE SAI", "fr") in rows
    assert (f"{BASE}J02.9", SKOS_BROADER, "ch1", None) in rows
    # determinism: two runs identical
    rows2 = {(r["subj"], r["pred"], r["obj"], r["obj_lang"]) for r in triples.collect()}
    assert rows == rows2
