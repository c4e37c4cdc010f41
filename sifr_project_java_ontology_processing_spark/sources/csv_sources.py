"""CSV sources for the SKOS generator (SURVEY.md S3/S4/S5).

The reference hand-parses ``;``-separated files line by line
(EHealth2017DictionaryToSkos.java:207-232 dictionary, :129-147 corpus,
:112-127 chapters); here Spark's CSV source does the splitting and the
field selections/validity predicates are Catalyst filters (P7/P8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_dictionary(spark: SparkSession, path: str) -> DataFrame:
    """S3 — dictionary CSV: label field 0, code field 1, second code
    field 3 (reference :66-67). → (label, code, code2)."""
    raw = spark.read.option("sep", ";").option("header", "false").csv(path)
    cols = raw.columns
    return raw.select(
        F.col(cols[0]).alias("label"),
        F.col(cols[1]).alias("code"),
        (F.col(cols[3]) if len(cols) > 3 else F.lit(None).cast("string")).alias("code2"),
    )


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S4 — 12-field corpus CSV: raw text f6, std text f10, code f11;
    header row (f0 == 'DocID') and short rows dropped (P7, :136-139).
    → (raw_text, std_text, code)."""
    raw = spark.read.option("sep", ";").option("header", "false").csv(path)
    cols = raw.columns
    if len(cols) < 12:
        raise ValueError(f"corpus CSV must have 12 fields, found {len(cols)}")
    return (
        raw.where(F.col(cols[0]) != "DocID")
        .where(F.col(cols[11]).isNotNull())
        .select(
            F.col(cols[6]).alias("raw_text"),
            F.col(cols[10]).alias("std_text"),
            F.col(cols[11]).alias("code"),
        )
    )


def read_chapters(spark: SparkSession, path: str) -> DataFrame:
    """S5 — chapter ranges: ``chapterURI,LO-HI`` rows (reference
    :112-127; NB the reference's own resource file is missing — its
    loader NPEs as shipped; this reader requires the caller's file).
    → (chapter_uri, lo, hi)."""
    raw = spark.read.option("sep", ",").option("header", "false").csv(path)
    cols = raw.columns
    rng = F.split(F.col(cols[1]), "-")
    return raw.select(
        F.col(cols[0]).alias("chapter_uri"),
        rng.getItem(0).alias("lo"),
        rng.getItem(1).alias("hi"),
    )
