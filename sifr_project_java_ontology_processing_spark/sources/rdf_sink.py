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


def _term(col) -> F.Column:
    """Render a non-literal term: ``_:``-prefixed values are blank-node
    labels and must be emitted VERBATIM — '_' is not a legal IRI scheme,
    so ``<_:b1>`` is invalid Turtle/N-Triples for a conformant external
    parser. Everything else is an IRI wrapped in ``<>``. The full
    Turtle/RDF-XML readers routinely produce ``_:`` terms (bnode
    property lists, collections, parseType=Resource), so parsed-then-
    written graphs hit this path."""
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def to_ntriples_lines(triples: DataFrame) -> DataFrame:
    """TRIPLES → one N-Triples line per row (column ``line``).

    Object rendering follows the reference's literal flavors (§1.2):
    plain literal, ``@lang``-tagged literal, IRI, or blank node."""
    obj_lit = F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
    obj_lang = F.concat(obj_lit, F.lit("@"), F.col("obj_lang"))
    obj = (
        F.when(~F.col("obj_is_literal"), _term(F.col("obj")))
        .when(F.col("obj_lang").isNotNull() & (F.col("obj_lang") != ""), obj_lang)
        .otherwise(obj_lit)
    )
    line = F.format_string(
        "%s <%s> %s .",
        _term(F.col("subj")),
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


def to_turtle_lines(
    triples: DataFrame, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """TRIPLES → Turtle statement lines (column ``line``), with IRIs
    compacted against ``prefixes`` ({prefix: namespace_iri}) — the
    reference's mappings sink emits ``.ttl``
    (mapping/DefaultOntologyMappingDelegate.java:135-142); this is the
    distributed equivalent. One statement per line (the engine's own
    ``read_turtle_lines`` subset, and valid input for any full Turtle
    parser). The @prefix header lines are NOT included here — the
    writer prepends them (they are driver-side constants).

    Compaction rule: longest matching namespace wins; a local part must
    be a simple PN_LOCAL ([A-Za-z0-9_][\\w.-]* not ending in '.') or
    the IRI stays in ``<>`` form. Literal escaping is shared with the
    N-Triples sink, so ttl∘parse round-trips byte-identically."""
    prefixes = prefixes or {}

    def compact(col) -> F.Column:
        out = _term(col)  # blank nodes verbatim, IRIs in <>; namespaces
        # all start with a scheme so no compaction branch can fire on _:
        # SHORTEST namespace first: each F.when wraps the previous, so
        # the LAST-added (longest) branch is checked first — which is
        # what makes the longest matching namespace win for nested
        # namespaces (round-3 review: longest-first iteration inverted
        # the precedence)
        for p, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
            local = F.substring(col, len(ns) + 1, 1_000_000)
            ok = col.startswith(ns) & local.rlike(
                r"^[A-Za-z0-9_](?:[\w.-]*[\w-])?$"
            )
            out = F.when(ok, F.concat(F.lit(f"{p}:"), local)).otherwise(out)
        return out

    obj_lit = F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
    obj_lang = F.concat(obj_lit, F.lit("@"), F.col("obj_lang"))
    obj = (
        F.when(~F.col("obj_is_literal"), compact(F.col("obj")))
        .when(F.col("obj_lang").isNotNull() & (F.col("obj_lang") != ""), obj_lang)
        .otherwise(obj_lit)
    )
    line = F.format_string(
        "%s %s %s .",
        compact(F.col("subj")),
        compact(F.col("pred")),
        obj,
    )
    return triples.select(line.alias("line"))


DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
}


def write_turtle(
    triples: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    single_file: bool = False,
) -> None:
    """S8/S9 ``.ttl`` twin of ``write_ntriples``: every part-file is a
    SELF-CONTAINED Turtle document — the @prefix header is prepended to
    each partition (mapInPandas yields the header frame first), so a
    single part parses through ``read_turtle`` and the whole directory
    parses through ``read_turtle_lines`` (repeated identical @prefix
    lines are idempotent). ``single_file`` coalesces to one part for
    dimension-sized outputs.

    Blank-node caveat: labels are emitted verbatim (``_:b1``), which a
    conformant reader scopes PER DOCUMENT — i.e. per part-file. With
    the multi-part default, bnode-connected triples split across parts
    lose their shared identity under an external parser (the engine's
    own line reader keeps labels verbatim, so engine-internal
    round-trips are exact). For bnode-heavy graphs bound for external
    consumers, pass ``single_file=True`` or pre-partition by bnode
    connected component (``canonicalize.connected_components``)."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    header_lines = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())]
    lines = to_turtle_lines(triples, prefixes)
    if single_file:
        lines = lines.coalesce(1)

    def _with_header(it):
        import pandas as pd

        yield pd.DataFrame({"line": header_lines})
        for pdf in it:
            yield pdf

    lines.mapInPandas(_with_header, schema="line string").write.mode(
        "overwrite"
    ).text(path)


def write_reject_file(concept_iris: DataFrame, path: str) -> None:
    """S11 — concepts-without-CUI reject sink
    (OntologyCUIProcessor.java:94-98 writes under a lock; a distributed
    text write needs none)."""
    concept_iris.select(F.col(concept_iris.columns[0]).cast("string")).write.mode(
        "overwrite"
    ).text(path)


def to_nquads_lines(quads: DataFrame) -> DataFrame:
    """QUADS (TRIPLES + nullable ``graph``) → one N-Quads line per row
    (column ``line``). Default-graph rows (NULL graph) render as plain
    triple lines, so a quads frame with no named rows round-trips
    through the N-Triples grammar too."""
    obj_lit = F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
    obj_lang = F.concat(obj_lit, F.lit("@"), F.col("obj_lang"))
    obj = (
        F.when(~F.col("obj_is_literal"), _term(F.col("obj")))
        .when(F.col("obj_lang").isNotNull() & (F.col("obj_lang") != ""), obj_lang)
        .otherwise(obj_lit)
    )
    line = F.concat(
        _term(F.col("subj")),
        F.lit(" <"),
        F.col("pred"),
        F.lit("> "),
        obj,
        F.when(
            F.col("graph").isNotNull(),
            F.concat(F.lit(" "), _term(F.col("graph"))),
        ).otherwise(F.lit("")),
        F.lit(" ."),
    )
    return quads.select(line.alias("line"))


def write_nquads(quads: DataFrame, path: str, single_file: bool = False) -> None:
    """Distributed N-Quads write (named-graph sink twin of S8)."""
    lines = to_nquads_lines(quads)
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)
