"""SHACL-lite shape validation over a triples DataFrame.

The reference's cleaning passes hand-enforce shape rules (every concept
has exactly one prefLabel, codes match a regex, annotations point at
typed concepts — OWLOntologyCleaner + the P4/P8 validity filters); this
module is the declarative distributed twin: a shapes table in the
SHACL core vocabulary subset, validated in one batch pass.

Shape row schema (one row per (shape, property) constraint set —
``sh:NodeShape`` with one ``sh:property`` each):

  shape_id       string  — report key
  target_class   string  — focus nodes = subjects rdf:typed this IRI
  path           string  — the constrained predicate
  min_count      long?   — sh:minCount
  max_count      long?   — sh:maxCount
  node_kind      string? — 'IRI' | 'Literal' (sh:nodeKind)
  pattern        string? — regex on the value's lexical form (sh:pattern)
  class_iri      string? — values must be rdf:typed this (sh:class)

Extended columns (SHAPE_SCHEMA_EXT; shapes tables without them
validate unchanged — constraints are read per-row with .get()):

  datatype       string? — sh:datatype. Values must be literals of
      this datatype. When the triples frame carries an
      ``obj_datatype`` column (rdf_io ``keep_datatype=True``) the
      check is exact RDF 1.1 (untagged plain literal = xsd:string,
      lang-tagged = rdf:langString); on a P5-stripped frame the
      LEXICAL SPACE is checked for the common XSD types
      (string/integer/decimal/double/boolean/date/dateTime) and other
      datatypes only require literal-ness (documented subset).
  in_values      array<string>? — sh:in on the lexical form (compiles
      to a pushdown-eligible IN filter).
  min_length     long? — sh:minLength on the lexical form of literals
      AND IRIs (per SHACL both are in scope).
  max_length     long? — sh:maxLength, same scope.

Report: (focus, shape_id, path, constraint_name, value) — one row per
violation; count violations carry the offending cardinality as value.

Scale shape: shapes are a SCHEMA dimension — they are collected once
(the same cost class as broadcasting them) and compiled into per-shape
predicate-filtered subplans with LITERAL constraints, so every path
filter is pushdown-eligible and regex patterns compile into codegen
``rlike`` instead of a per-row pattern join.  Counts are per-focus
partial aggs; sh:class checks are one anti-join per constrained shape
against the (reused) type frame.  The instance stream is never joined
to a non-broadcast side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .inference import RDF_TYPE, _TRIPLE_COLS

SHAPE_SCHEMA = (
    "shape_id string, target_class string, path string, min_count long, "
    "max_count long, node_kind string, pattern string, class_iri string"
)
SHAPE_SCHEMA_EXT = SHAPE_SCHEMA + (
    ", datatype string, in_values array<string>, "
    "min_length long, max_length long"
)

_REPORT_COLS = ["focus", "shape_id", "path", "constraint_name", "value"]

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
# lexical spaces for sh:datatype on a datatype-stripped frame
_LEXICAL_RX = {
    f"{_XSD}integer": r"^[+-]?\d+$",
    f"{_XSD}decimal": r"^[+-]?(\d+(\.\d*)?|\.\d+)$",
    f"{_XSD}double": r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$",
    f"{_XSD}boolean": r"^(true|false|1|0)$",
    f"{_XSD}date": r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$",
    f"{_XSD}dateTime": (
        r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?"
        r"(Z|[+-]\d{2}:\d{2})?$"
    ),
}


def _report(focus_col, shape_id: str, path: str, constraint: str, value_col):
    return [
        focus_col.alias("focus"),
        F.lit(shape_id).alias("shape_id"),
        F.lit(path).alias("path"),
        F.lit(constraint).alias("constraint_name"),
        value_col.cast("string").alias("value"),
    ]


def validate_shapes(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """Validate ``triples`` against ``shapes`` (SHAPE_SCHEMA rows);
    returns the violation report (empty = conforms). See module
    docstring for semantics and the compiled-plan shape."""
    t = triples.select(*_TRIPLE_COLS)
    spark = triples.sparkSession
    shape_rows = shapes.collect()  # schema dimension — see module doc
    types = t.where((F.col("pred") == RDF_TYPE) & ~F.col("obj_is_literal")).select(
        F.col("subj").alias("_node"), F.col("obj").alias("_cls")
    )

    has_dt_col = "obj_datatype" in triples.columns
    if has_dt_col:
        t = triples.select(*_TRIPLE_COLS, "obj_datatype")

    parts: list[DataFrame] = []
    for row_ in shape_rows:
        s = row_.asDict()
        focus = types.where(F.col("_cls") == s["target_class"]).select(
            F.col("_node").alias("_focus")
        ).distinct()
        # RDF graphs are SETS: duplicate assertions (repeated file
        # lines, unioned sources) must not inflate cardinalities
        vals = (
            t.where(F.col("pred") == s["path"])
            .distinct()
            .join(focus, t["subj"] == focus["_focus"], "left_semi")
        )
        if s["min_count"] is not None or s["max_count"] is not None:
            counts = vals.groupBy(F.col("subj").alias("_focus")).agg(
                F.count(F.lit(1)).alias("_n")
            )
            if s["min_count"] is not None:
                have = focus.join(counts, "_focus", "left").select(
                    "_focus", F.coalesce(F.col("_n"), F.lit(0)).alias("_n")
                )
                parts.append(
                    have.where(F.col("_n") < s["min_count"]).select(
                        *_report(
                            F.col("_focus"), s["shape_id"], s["path"],
                            "min_count", F.col("_n"),
                        )
                    )
                )
            if s["max_count"] is not None:
                parts.append(
                    counts.where(F.col("_n") > s["max_count"]).select(
                        *_report(
                            F.col("_focus"), s["shape_id"], s["path"],
                            "max_count", F.col("_n"),
                        )
                    )
                )
        if s["node_kind"] is not None:
            want_literal = s["node_kind"] == "Literal"
            parts.append(
                vals.where(F.col("obj_is_literal") != F.lit(want_literal)).select(
                    *_report(
                        F.col("subj"), s["shape_id"], s["path"],
                        "node_kind", F.col("obj"),
                    )
                )
            )
        if s["pattern"] is not None:
            parts.append(
                vals.where(~F.col("obj").rlike(s["pattern"])).select(
                    *_report(
                        F.col("subj"), s["shape_id"], s["path"],
                        "pattern", F.col("obj"),
                    )
                )
            )
        if s.get("datatype") is not None:
            want = s["datatype"]
            if has_dt_col:
                eff = F.coalesce(
                    F.col("obj_datatype"),
                    F.when(
                        F.col("obj_lang").isNotNull(), F.lit(_RDF_LANGSTRING)
                    ).otherwise(F.lit(f"{_XSD}string")),
                )
                ok = F.col("obj_is_literal") & (eff == want)
            else:
                ok = F.col("obj_is_literal")
                if want == f"{_XSD}string":
                    # a lang-tagged literal is rdf:langString, not string
                    ok = ok & F.col("obj_lang").isNull()
                elif want in _LEXICAL_RX:
                    # lexical check only applies to plain literals — a
                    # lang-tagged literal is rdf:langString whatever its
                    # lexical form looks like
                    ok = (
                        ok
                        & F.col("obj_lang").isNull()
                        & F.col("obj").rlike(_LEXICAL_RX[want])
                    )
                # other datatypes: literal-ness only (documented subset)
            parts.append(
                vals.where(~ok).select(
                    *_report(
                        F.col("subj"), s["shape_id"], s["path"],
                        "datatype", F.col("obj"),
                    )
                )
            )
        if s.get("in_values") is not None:
            parts.append(
                vals.where(~F.col("obj").isin(*list(s["in_values"]))).select(
                    *_report(
                        F.col("subj"), s["shape_id"], s["path"],
                        "in", F.col("obj"),
                    )
                )
            )
        # sh:minLength/sh:maxLength: literals use the lexical form, IRIs
        # use str(IRI), but a blank-node value is ALWAYS a violation per
        # SHACL (its label is not a value to measure).
        _blank = (~F.col("obj_is_literal")) & F.col("obj").startswith("_:")
        if s.get("min_length") is not None:
            parts.append(
                vals.where(
                    _blank | (F.length("obj") < s["min_length"])
                ).select(
                    *_report(
                        F.col("subj"), s["shape_id"], s["path"],
                        "min_length", F.col("obj"),
                    )
                )
            )
        if s.get("max_length") is not None:
            parts.append(
                vals.where(
                    _blank | (F.length("obj") > s["max_length"])
                ).select(
                    *_report(
                        F.col("subj"), s["shape_id"], s["path"],
                        "max_length", F.col("obj"),
                    )
                )
            )
        if s["class_iri"] is not None:
            typed_ok = types.where(F.col("_cls") == s["class_iri"]).select(
                F.col("_node").alias("_ok")
            )
            bad = vals.where(~F.col("obj_is_literal")).join(
                typed_ok, vals["obj"] == typed_ok["_ok"], "left_anti"
            )
            lit_bad = vals.where(F.col("obj_is_literal"))
            parts.append(
                bad.unionByName(lit_bad).select(
                    *_report(
                        F.col("subj"), s["shape_id"], s["path"],
                        "class", F.col("obj"),
                    )
                )
            )
    if not parts:
        return spark.createDataFrame(
            [],
            "focus string, shape_id string, path string, "
            "constraint_name string, value string",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
