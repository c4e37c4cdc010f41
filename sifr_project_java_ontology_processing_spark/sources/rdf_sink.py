"""RDF serialization sinks (SURVEY.md S8/S9/S11).

The reference serializes its in-memory Jena model to RDF/XML or Turtle
(BaseOntologyDelegate.java:208-220). Here serialization is a column
expression over the TRIPLES DataFrame — ``format_string`` into N-Triples
/ Turtle lines — written with the distributed text sink (S8), plus the
reject-file sink (S11) as a plain filtered text write (no lock needed:
one file per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _escape_literal(col) -> F.Column:
    # N-Triples literal escaping: backslash, quote, newline, tab, CR
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def to_ntriples_lines(triples: DataFrame) -> DataFrame:
    """TRIPLES → one N-Triples line per row (column ``line``).

    Object rendering follows the reference's literal flavors (§1.2):
    plain literal, ``@lang``-tagged literal, or IRI."""
    obj_lit = F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
    obj_lang = F.concat(obj_lit, F.lit("@"), F.col("obj_lang"))
    obj_iri = F.concat(F.lit("<"), F.col("obj"), F.lit(">"))
    obj = (
        F.when(~F.col("obj_is_literal"), obj_iri)
        .when(F.col("obj_lang").isNotNull() & (F.col("obj_lang") != ""), obj_lang)
        .otherwise(obj_lit)
    )
    line = F.format_string(
        "<%s> <%s> %s .",
        F.col("subj"),
        F.col("pred"),
        obj,
    )
    return triples.select(line.alias("line"))


def write_ntriples(triples: DataFrame, path: str, single_file: bool = False) -> None:
    """S8 — distributed N-Triples write. ``single_file`` coalesces to one
    part (only for dimension-sized outputs; at fact scale keep N parts)."""
    lines = to_ntriples_lines(triples)
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def write_reject_file(concept_iris: DataFrame, path: str) -> None:
    """S11 — concepts-without-CUI reject sink
    (OntologyCUIProcessor.java:94-98 writes under a lock; a distributed
    text write needs none)."""
    concept_iris.select(F.col(concept_iris.columns[0]).cast("string")).write.mode(
        "overwrite"
    ).text(path)
