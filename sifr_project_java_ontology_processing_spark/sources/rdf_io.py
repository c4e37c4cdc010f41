"""RDF file ingestion (SURVEY.md S1/S12 input half).

The reference's first step loads ontology files through Jena —
RDF/XML, Turtle, and .gz/.bz2-compressed variants
(utils/OntologyLoader.java:41-92). This module closes the engine's
input loop: N-Triples and a line-oriented Turtle subset parse into the
TRIPLES-schema DataFrame with pure Catalyst regex expressions over
``spark.read.text`` — distributed, splittable (per-line format, no
cross-line state), and compression-transparent (Spark's text source
decodes .gz/.bz2 by extension, mirroring OntologyLoader's
getFileModelReader:83-92).

Format coverage, stated honestly:
  * N-Triples: full (IRI / blank-node subjects, IRI predicates,
    IRI / blank / literal objects with @lang or ^^datatype, standard
    string escapes, comments, blank lines).
  * Turtle: the line-oriented subset — @prefix / PREFIX declarations,
    one ``subj pred obj .`` statement per line with ``a`` and prefixed
    names; NOT the multi-line ``;``/``,`` continuation syntax. That
    subset covers this engine's own sink output and typical
    machine-generated dictionaries; full Turtle needs a real parser
    (Jena-equivalent), which the reference gets from Jena, not from
    its own code.
  * RDF/XML: not line-splittable — out of scope for the distributed
    text path (use the SPARQL-XML converter's mapInPandas SAX pattern,
    sources/sparql_xml.py, per ontology file if ever needed).

``strict=True`` (default) raises if any non-comment line fails to
parse — silent row loss is how ingestion bugs hide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# subject: <iri> or _:blank ; predicate: <iri> ; object: rest
_NT_LINE_RX = r"^[ \t]*(<[^>]*>|_:[^ \t]+)[ \t]+<([^>]*)>[ \t]+(.*?)[ \t]*\.[ \t]*$"
# literal object: "..." with escaped chars, then optional @lang / ^^<dt>
_NT_LIT_RX = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<[^>]*>)?$'

_SENTINEL = "\x00"  # never present in N-Triples (control chars are escaped)


def _unescape_literal(col: Column) -> Column:
    """Inverse of rdf_sink._escape_literal: restore \\\\, \\", \\n, \\r,
    \\t. A sentinel keeps ``\\\\n`` (backslash + n) distinct from ``\\n``
    (newline)."""
    out = F.regexp_replace(col, r"\\\\", _SENTINEL)
    out = F.regexp_replace(out, r'\\"', '"')
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r"\\t", "\t")
    return F.regexp_replace(out, _SENTINEL, r"\\")


def _strip_angle(col: Column) -> Column:
    return F.regexp_replace(col, r"^<(.*)>$", r"$1")


def parse_ntriples_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Lines → TRIPLES-schema rows. Pure expressions (regexp_extract +
    conditional unescape); comments/blank lines dropped. Unparseable
    non-comment lines come out with subj NULL — callers (read_ntriples)
    decide whether that is an error."""
    line = F.col(line_col)
    content = lines.where(
        (F.trim(line) != "") & ~F.trim(line).startswith("#")
    )
    subj_raw = F.regexp_extract(line, _NT_LINE_RX, 1)
    pred = F.regexp_extract(line, _NT_LINE_RX, 2)
    obj_raw = F.regexp_extract(line, _NT_LINE_RX, 3)
    is_lit = obj_raw.startswith('"')
    lit_body = F.regexp_extract(obj_raw, _NT_LIT_RX, 1)
    lit_lang = F.regexp_extract(obj_raw, _NT_LIT_RX, 2)
    parsed = content.select(
        F.when(subj_raw == "", None).otherwise(_strip_angle(subj_raw)).alias("subj"),
        F.when(subj_raw == "", None).otherwise(pred).alias("pred"),
        F.when(is_lit, _unescape_literal(lit_body))
        .otherwise(_strip_angle(obj_raw))
        .alias("obj"),
        F.when(is_lit & (lit_lang != ""), lit_lang).alias("obj_lang"),
        is_lit.alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
        line.alias("_raw"),
    )
    return parsed


def read_ntriples(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """N-Triples file(s) → TRIPLES DataFrame. ``path`` may be a file,
    directory, or glob; .gz/.bz2 decode transparently
    (OntologyLoader.java:83-92 parity). With ``strict`` (default) an
    unparseable non-comment line raises instead of vanishing."""
    parsed = parse_ntriples_lines(spark.read.text(path))
    if strict:
        bad = parsed.where(F.col("subj").isNull()).select("_raw").limit(5)
        bad_rows = bad.collect()
        if bad_rows:
            raise ValueError(
                f"unparseable N-Triples line(s) in {path}: "
                + "; ".join(repr(r["_raw"]) for r in bad_rows)
            )
        return parsed.drop("_raw")
    return parsed.where(F.col("subj").isNotNull()).drop("_raw")


# --------------------------------------------------------------------------
# Line-oriented Turtle subset
# --------------------------------------------------------------------------

_PREFIX_RX = r"^\s*@?[Pp][Rr][Ee][Ff][Ii][Xx]\s+([A-Za-z][\w-]*)?:\s*<([^>]*)>\s*\.?\s*$"
_TTL_TERM = r"(<[^>]*>|[A-Za-z][\w-]*:[\w.-]+|a|_:[^ \t]+)"
_TTL_LINE_RX = (
    rf"^[ \t]*{_TTL_TERM}[ \t]+{_TTL_TERM}[ \t]+(.*?)[ \t]*\.[ \t]*$"
)

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _expand_term(col: Column, prefixes: dict[str, str]) -> Column:
    """``p:local`` → full IRI via the file's @prefix table; ``a`` →
    rdf:type; ``<iri>`` stripped. Prefix table is tiny (a handful of
    declarations) so a when-chain expression beats a join."""
    out = F.when(col == "a", F.lit(_RDF_TYPE))
    for p, iri in prefixes.items():
        out = out.when(
            col.startswith(f"{p}:") & ~col.startswith("<"),
            F.concat(F.lit(iri), F.substring(col, len(p) + 2, 1_000_000)),
        )
    return out.otherwise(_strip_angle(col))


def read_turtle_lines(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """Line-oriented Turtle subset → TRIPLES DataFrame (see module
    docstring for the exact subset). @prefix declarations are collected
    to the driver first — they are a handful of header lines, the same
    cost class as reading a schema."""
    raw = spark.read.text(path)
    prefix_rows = (
        raw.where(F.col("value").rlike(_PREFIX_RX))
        .select(
            F.regexp_extract("value", _PREFIX_RX, 1).alias("p"),
            F.regexp_extract("value", _PREFIX_RX, 2).alias("iri"),
        )
        .collect()
    )
    prefixes = {r["p"]: r["iri"] for r in prefix_rows}

    line = F.col("value")
    content = raw.where(
        (F.trim(line) != "")
        & ~F.trim(line).startswith("#")
        & ~line.rlike(_PREFIX_RX)
    )
    subj_t = F.regexp_extract(line, _TTL_LINE_RX, 1)
    pred_t = F.regexp_extract(line, _TTL_LINE_RX, 2)
    obj_raw = F.regexp_extract(line, _TTL_LINE_RX, 3)
    is_lit = obj_raw.startswith('"')
    lit_body = F.regexp_extract(obj_raw, _NT_LIT_RX, 1)
    lit_lang = F.regexp_extract(obj_raw, _NT_LIT_RX, 2)
    parsed = content.select(
        F.when(subj_t == "", None).otherwise(_expand_term(subj_t, prefixes)).alias("subj"),
        F.when(subj_t == "", None).otherwise(_expand_term(pred_t, prefixes)).alias("pred"),
        F.when(is_lit, _unescape_literal(lit_body))
        .when(obj_raw.rlike(r"^<|^_:|^[A-Za-z][\w-]*:[\w.-]+$|^a$"), _expand_term(obj_raw, prefixes))
        .otherwise(obj_raw)
        .alias("obj"),
        F.when(is_lit & (lit_lang != ""), lit_lang).alias("obj_lang"),
        is_lit.alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
        line.alias("_raw"),
    )
    if strict:
        bad_rows = parsed.where(F.col("subj").isNull()).select("_raw").limit(5).collect()
        if bad_rows:
            raise ValueError(
                f"unparseable Turtle line(s) in {path} (line-oriented subset): "
                + "; ".join(repr(r["_raw"]) for r in bad_rows)
            )
        return parsed.drop("_raw")
    return parsed.where(F.col("subj").isNotNull()).drop("_raw")


def load_model(spark: SparkSession, path: str) -> DataFrame:
    """Format dispatch mirroring OntologyLoader.loadModel:41-71 —
    ``.ttl`` (incl. .ttl.gz/.bz2) → Turtle, everything else N-Triples
    (the reference defaults to RDF/XML there; this engine's native
    serialization is N-Triples, see module docstring)."""
    base = path
    for ext in (".gz", ".bz2"):
        if base.endswith(ext):
            base = base[: -len(ext)]
    if base.endswith(".ttl"):
        return read_turtle_lines(spark, path)
    return read_ntriples(spark, path)
