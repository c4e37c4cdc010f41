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
  * RDF/XML (the reference's DEFAULT format): not line-splittable, so
    it parallelizes ACROSS FILES instead — ``binaryFile`` source → one
    streaming SAX parse per file inside ``mapInPandas`` (the same
    pattern as sources/sparql_xml.py). Subset: rdf:Description and
    typed node elements, rdf:about/ID/nodeID, nested node elements,
    rdf:resource, property attributes, xml:lang (inherited),
    rdf:datatype (stripped, P5 semantics). rdf:parseType raises —
    honestly unsupported rather than silently wrong.

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

import re as _re

_NT_ESC_RX = _re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_NT_ESC_MAP = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
               '"': '"', "'": "'", "\\": "\\"}


def _decode_nt_string(s: str) -> str:
    """Full N-Triples string unescape, single pass: the five char
    escapes PLUS \\uXXXX / \\UXXXXXXXX numeric escapes — Jena (the
    reference's serializer) ASCII-escapes every non-ASCII char, so a
    regex chain that skips \\u silently corrupts accented labels."""
    def sub(m) -> str:
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _NT_ESC_MAP.get(g, "\\" + g)

    return _NT_ESC_RX.sub(sub, s)


_unescape_udf = None


def _unescape_literal(col: Column) -> Column:
    """Inverse of rdf_sink._escape_literal incl. numeric escapes —
    an Arrow-batched pandas UDF (a single-pass decoder has no faithful
    regexp_replace chain: \\uXXXX → chr needs real code). RDF files are
    ontology-dimension inputs, so the Python batch cost is a dim-load
    cost, never the fact path."""
    global _unescape_udf
    if _unescape_udf is None:
        from pyspark.sql.functions import pandas_udf

        def _batch(s):  # pd.Series -> pd.Series (scalar pandas UDF)
            return s.map(lambda v: _decode_nt_string(v) if v is not None else None)

        _unescape_udf = pandas_udf(_batch, "string")
    return _unescape_udf(col)


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
    # a quoted object that fails the literal grammar is a parse error,
    # not an empty literal — mark subj null so strict mode catches it
    bad = (subj_raw == "") | (is_lit & ~obj_raw.rlike(_NT_LIT_RX))
    lit_body = F.regexp_extract(obj_raw, _NT_LIT_RX, 1)
    lit_lang = F.regexp_extract(obj_raw, _NT_LIT_RX, 2)
    parsed = content.select(
        F.when(bad, None).otherwise(_strip_angle(subj_raw)).alias("subj"),
        F.when(bad, None).otherwise(pred).alias("pred"),
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
    is_str_lit = obj_raw.startswith('"')
    # Turtle's shorthand literals: numbers and booleans are literals,
    # not IRIs — round-2 review caught them falling through as fake IRIs
    is_shorthand_lit = obj_raw.rlike(r"^[+-]?(\d|\.\d)") | obj_raw.isin("true", "false")
    is_lit = is_str_lit | is_shorthand_lit
    bad = (subj_t == "") | (is_str_lit & ~obj_raw.rlike(_NT_LIT_RX))
    lit_body = F.regexp_extract(obj_raw, _NT_LIT_RX, 1)
    lit_lang = F.regexp_extract(obj_raw, _NT_LIT_RX, 2)
    parsed = content.select(
        F.when(bad, None).otherwise(_expand_term(subj_t, prefixes)).alias("subj"),
        F.when(bad, None).otherwise(_expand_term(pred_t, prefixes)).alias("pred"),
        F.when(is_str_lit, _unescape_literal(lit_body))
        .when(is_shorthand_lit, obj_raw)
        .when(obj_raw.rlike(r"^<|^_:|^[A-Za-z][\w-]*:[\w.-]+$|^a$"), _expand_term(obj_raw, prefixes))
        .otherwise(obj_raw)
        .alias("obj"),
        F.when(is_str_lit & (lit_lang != ""), lit_lang).alias("obj_lang"),
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


# --------------------------------------------------------------------------
# RDF/XML (the reference's default input format)
# --------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_NS = "http://www.w3.org/XML/1998/namespace"


def _parse_rdfxml_bytes(data: bytes, src: str | None) -> list[tuple]:
    """One streaming SAX pass over an RDF/XML document → TRIPLES rows.
    Pure function (testable without Spark); runs on executors inside
    read_rdfxml's mapInPandas."""
    import xml.sax

    triples: list[tuple] = []

    # blank nodes, rdf:nodeID and rdf:ID are DOCUMENT-scoped: without a
    # per-file scope, multi-file loads would merge unrelated anonymous
    # nodes from different ontologies (round-2 review finding)
    import hashlib

    scope = hashlib.md5(src.encode()).hexdigest()[:8] if src else ""

    class Handler(xml.sax.ContentHandler):
        def __init__(self) -> None:
            super().__init__()
            # frames: ["node", subj, lang] | ["prop", pred, lang, obj_iri, text_parts]
            self.stack: list[list] = []
            self.blank_n = 0

        def _lang(self, attrs) -> str | None:
            lang = attrs.get((_XML_NS, "lang"))
            if lang is not None:
                return lang
            for frame in reversed(self.stack):
                if frame[2] is not None:
                    return frame[2]
            return None

        def _new_blank(self) -> str:
            self.blank_n += 1
            return f"_:{scope}b{self.blank_n}"

        def startElementNS(self, name, qname, attrs) -> None:
            uri, local = name
            full = (uri or "") + local
            if full == f"{_RDF_NS}RDF":
                return
            lang = self._lang(attrs)
            expecting_node = not self.stack or self.stack[-1][0] == "prop"
            if expecting_node:
                about = attrs.get((_RDF_NS, "about"))
                rid = attrs.get((_RDF_NS, "ID"))
                node_id = attrs.get((_RDF_NS, "nodeID"))
                if about is not None:
                    subj = about
                elif rid is not None:
                    # rdf:ID resolves against the document URI
                    subj = f"{src}#{rid}" if src else f"#{rid}"
                elif node_id is not None:
                    subj = f"_:{scope}{node_id}"
                else:
                    subj = self._new_blank()
                if full != f"{_RDF_NS}Description":
                    triples.append((subj, f"{_RDF_NS}type", full, None, False, src))
                # property attributes → literal triples
                for (auri, alocal), val in attrs.items():
                    if auri in (None, "", _RDF_NS, _XML_NS):
                        continue
                    triples.append((subj, auri + alocal, val, lang, True, src))
                # this node is the object of the enclosing property
                if self.stack and self.stack[-1][0] == "prop":
                    self.stack[-1][3] = subj
                self.stack.append(["node", subj, lang])
            else:
                if attrs.get((_RDF_NS, "parseType")) is not None:
                    raise NotImplementedError(
                        "rdf:parseType is outside this reader's RDF/XML subset"
                    )
                res = attrs.get((_RDF_NS, "resource"))
                node_id = attrs.get((_RDF_NS, "nodeID"))
                obj_iri = res if res is not None else (
                    f"_:{scope}{node_id}" if node_id else None
                )
                self.stack.append(["prop", full, lang, obj_iri, []])

        def characters(self, content: str) -> None:
            if self.stack and self.stack[-1][0] == "prop":
                self.stack[-1][4].append(content)

        def endElementNS(self, name, qname) -> None:
            uri, local = name
            if (uri or "") + local == f"{_RDF_NS}RDF":
                return
            frame = self.stack.pop()
            if frame[0] != "prop":
                return
            _tag, pred, lang, obj_iri, parts = frame
            subj = self.stack[-1][1]
            if obj_iri is not None:
                triples.append((subj, pred, obj_iri, None, False, src))
            else:
                text = "".join(parts).strip()
                triples.append((subj, pred, text, lang, True, src))

    parser = xml.sax.make_parser()
    parser.setFeature(xml.sax.handler.feature_namespaces, True)
    parser.setContentHandler(Handler())
    import io

    parser.parse(io.BytesIO(data))
    return triples


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    """RDF/XML file(s) → TRIPLES DataFrame. Parallel ACROSS files
    (binaryFile source, one SAX stream per file on the executor);
    .gz/.bz2 decompressed in the parser task. This is the format
    OntologyLoader.java:62-66 defaults to; subset limits in the module
    docstring."""
    from collections.abc import Iterator

    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bz2 as _bz2
        import gzip as _gzip

        cols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "src_url"]
        for pdf in it:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    data = _gzip.decompress(data)
                elif p.endswith(".bz2"):
                    data = _bz2.decompress(data)
                rows = _parse_rdfxml_bytes(data, p)
                yield pd.DataFrame(rows, columns=cols)

    schema = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string"
    )
    return files.mapInPandas(_parse, schema=schema)


def labels_from_triples(triples: DataFrame) -> DataFrame:
    """TRIPLES → ONTOLOGY_LABELS bridge: SKOS label assertions become
    (concept_iri, label, label_kind, lang) rows — the dimension shape
    every cleaner/cascade operator consumes. Untagged literals get
    lang '' (the reference's keep-always convention)."""
    from sifr_project_java_ontology_processing_spark.functions.uris import (
        SKOS_ALT_LABEL,
        SKOS_HIDDEN_LABEL,
        SKOS_NOTATION,
        SKOS_PREF_LABEL,
    )

    kind = (
        F.when(F.col("pred") == SKOS_PREF_LABEL, "pref")
        .when(F.col("pred") == SKOS_ALT_LABEL, "alt")
        .when(F.col("pred") == SKOS_HIDDEN_LABEL, "hidden")
        .when(F.col("pred") == SKOS_NOTATION, "notation")
    )
    return (
        triples.where(F.col("obj_is_literal") & kind.isNotNull())
        .select(
            F.col("subj").alias("concept_iri"),
            F.col("obj").alias("label"),
            kind.alias("label_kind"),
            F.coalesce("obj_lang", F.lit("")).alias("lang"),
        )
    )


def labels_to_triples(labels: DataFrame) -> DataFrame:
    """ONTOLOGY_LABELS → TRIPLES (inverse bridge, for writing cleaned
    label sets back out through the RDF sink)."""
    from sifr_project_java_ontology_processing_spark.functions.uris import (
        SKOS_ALT_LABEL,
        SKOS_HIDDEN_LABEL,
        SKOS_NOTATION,
        SKOS_PREF_LABEL,
    )

    pred = (
        F.when(F.col("label_kind") == "pref", SKOS_PREF_LABEL)
        .when(F.col("label_kind") == "alt", SKOS_ALT_LABEL)
        .when(F.col("label_kind") == "hidden", SKOS_HIDDEN_LABEL)
        .otherwise(SKOS_NOTATION)
    )
    return labels.select(
        F.col("concept_iri").alias("subj"),
        pred.alias("pred"),
        F.col("label").alias("obj"),
        F.when(F.col("lang") != "", F.col("lang")).alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
    )


def load_model(spark: SparkSession, path: str) -> DataFrame:
    """Format dispatch mirroring OntologyLoader.loadModel:41-71 —
    ``.ttl`` → Turtle, ``.nt`` → N-Triples, XML-flavored extensions
    (.owl/.xml/.xrdf/.rdf — the reference's RDF/XML default) →
    read_rdfxml; anything else N-Triples (this engine's native
    serialization). Compression suffixes are transparent."""
    base = path
    for ext in (".gz", ".bz2"):
        if base.endswith(ext):
            base = base[: -len(ext)]
    if base.endswith(".ttl"):
        return read_turtle_lines(spark, path)
    if base.endswith((".owl", ".xml", ".xrdf", ".rdf")):
        return read_rdfxml(spark, path)
    return read_ntriples(spark, path)
