"""SHACL-lite validation (operators/shacl.py): every constraint kind
with exact expected violation sets."""

from __future__ import annotations

from sifr_project_java_ontology_processing_spark.operators.inference import RDF_TYPE
from sifr_project_java_ontology_processing_spark.operators.shacl import (
    SHAPE_SCHEMA,
    validate_shapes,
)

T = "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean"


def _iri(s, p, o):
    return (s, p, o, None, False)


def test_validate_shapes_all_constraints(spark):
    data = [
        _iri("c1", RDF_TYPE, "x:Concept"),
        ("c1", "x:label", "GOOD-1", "en", True),
        _iri("c1", "x:in", "s1"),
        _iri("s1", RDF_TYPE, "x:Scheme"),
        # c2: no label (min_count violation); its single scheme link is fine
        _iri("c2", RDF_TYPE, "x:Concept"),
        _iri("c2", "x:in", "s1"),
        # c3: two labels (max violation), one fails the pattern
        _iri("c3", RDF_TYPE, "x:Concept"),
        ("c3", "x:label", "GOOD-3", "en", True),
        ("c3", "x:label", "bad", "en", True),
        _iri("c3", "x:in", "s1"),
        # c4: label is an IRI (node_kind), scheme link to UNTYPED node (class)
        _iri("c4", RDF_TYPE, "x:Concept"),
        _iri("c4", "x:label", "x:notaliteral"),
        _iri("c4", "x:in", "nowhere"),
        # non-focus node: never reported
        ("z", "x:label", "bad", None, True),
    ]
    shapes = [
        ("s_lbl", "x:Concept", "x:label", 1, 1, "Literal", "^GOOD", None),
        ("s_in", "x:Concept", "x:in", 1, None, "IRI", None, "x:Scheme"),
    ]
    out = {
        (r.focus, r.shape_id, r.constraint_name, r.value)
        for r in validate_shapes(
            spark.createDataFrame(data, T),
            spark.createDataFrame(shapes, SHAPE_SCHEMA),
        ).collect()
    }
    assert out == {
        ("c2", "s_lbl", "min_count", "0"),
        ("c3", "s_lbl", "max_count", "2"),
        ("c3", "s_lbl", "pattern", "bad"),
        ("c4", "s_lbl", "node_kind", "x:notaliteral"),
        ("c4", "s_lbl", "pattern", "x:notaliteral"),
        ("c4", "s_in", "class", "nowhere"),
    }


def test_validate_shapes_conforming_and_empty(spark):
    data = [
        _iri("c1", RDF_TYPE, "x:Concept"),
        ("c1", "x:label", "GOOD", "en", True),
    ]
    shapes = [("s", "x:Concept", "x:label", 1, 1, "Literal", "^GOOD", None)]
    assert (
        validate_shapes(
            spark.createDataFrame(data, T),
            spark.createDataFrame(shapes, SHAPE_SCHEMA),
        ).count()
        == 0
    )
    empty_shapes = spark.createDataFrame([], SHAPE_SCHEMA)
    out = validate_shapes(spark.createDataFrame(data, T), empty_shapes)
    assert out.count() == 0 and out.columns == [
        "focus", "shape_id", "path", "constraint_name", "value",
    ]


def test_duplicate_assertions_do_not_inflate_counts(spark):
    """Review fix: RDF graphs are sets — the same statement twice must
    not trip max_count."""
    data = [
        _iri("c1", RDF_TYPE, "x:Concept"),
        ("c1", "x:label", "GOOD", "en", True),
        ("c1", "x:label", "GOOD", "en", True),  # duplicate row
    ]
    shapes = [("s", "x:Concept", "x:label", 1, 1, "Literal", "^GOOD", None)]
    assert (
        validate_shapes(
            spark.createDataFrame(data, T),
            spark.createDataFrame(shapes, SHAPE_SCHEMA),
        ).count()
        == 0
    )


def test_extended_constraints_datatype_in_lengths(spark):
    """Round-5 widening: sh:datatype / sh:in / sh:minLength /
    sh:maxLength (SHAPE_SCHEMA_EXT). Lexical-space datatype checks on
    a P5-stripped frame; exact RDF 1.1 checks when the frame carries
    obj_datatype."""
    from sifr_project_java_ontology_processing_spark.operators.shacl import (
        SHAPE_SCHEMA_EXT,
        validate_shapes,
    )

    XSD = "http://www.w3.org/2001/XMLSchema#"
    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("n1", RDF_T, "c:N", None, False),
        ("n2", RDF_T, "c:N", None, False),
        ("n3", RDF_T, "c:N", None, False),
        ("n1", "p:age", "42", None, True),
        ("n2", "p:age", "forty", None, True),       # bad integer lexical
        ("n3", "p:age", "i:someiri", None, False),  # not a literal
        ("n1", "p:status", "open", None, True),
        ("n2", "p:status", "weird", None, True),    # not in sh:in list
        ("n1", "p:code", "ABCDE", None, True),
        ("n2", "p:code", "AB", None, True),         # too short
        ("n3", "p:code", "ABCDEFGHIJ", None, True), # too long
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    shapes = spark.createDataFrame(
        [
            ("s_age", "c:N", "p:age", None, None, None, None, None,
             f"{XSD}integer", None, None, None),
            ("s_status", "c:N", "p:status", None, None, None, None, None,
             None, ["open", "closed"], None, None),
            ("s_code", "c:N", "p:code", None, None, None, None, None,
             None, None, 3, 8),
        ],
        SHAPE_SCHEMA_EXT,
    )
    rep = {
        (r.focus, r.constraint_name, r.value)
        for r in validate_shapes(t, shapes).collect()
    }
    assert rep == {
        ("n2", "datatype", "forty"),
        ("n3", "datatype", "i:someiri"),
        ("n2", "in", "weird"),
        ("n2", "min_length", "AB"),
        ("n3", "max_length", "ABCDEFGHIJ"),
    }


def test_datatype_exact_with_obj_datatype_column(spark):
    from sifr_project_java_ontology_processing_spark.operators.shacl import (
        SHAPE_SCHEMA_EXT,
        validate_shapes,
    )

    XSD = "http://www.w3.org/2001/XMLSchema#"
    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("n1", RDF_T, "c:N", None, False, None),
        ("n2", RDF_T, "c:N", None, False, None),
        ("n3", RDF_T, "c:N", None, False, None),
        ("n4", RDF_T, "c:N", None, False, None),
        # typed integer: ok
        ("n1", "p:age", "42", None, True, f"{XSD}integer"),
        # numeric-looking but UNTYPED (plain = xsd:string): violation
        ("n2", "p:age", "42", None, True, None),
        # lang-tagged (rdf:langString): violation
        ("n3", "p:age", "42", "en", True, None),
        # typed with the WRONG datatype: violation
        ("n4", "p:age", "42", None, True, f"{XSD}decimal"),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, obj_datatype string",
    )
    shapes = spark.createDataFrame(
        [("s_age", "c:N", "p:age", None, None, None, None, None,
          f"{XSD}integer", None, None, None)],
        SHAPE_SCHEMA_EXT,
    )
    rep = {(r.focus, r.constraint_name) for r in validate_shapes(t, shapes).collect()}
    assert rep == {("n2", "datatype"), ("n3", "datatype"), ("n4", "datatype")}


def test_core_schema_shapes_still_validate(spark):
    """Shapes tables in the 8-column CORE schema (no extended columns)
    keep validating unchanged — constraints are read with .get()."""
    from sifr_project_java_ontology_processing_spark.operators.shacl import (
        SHAPE_SCHEMA,
        validate_shapes,
    )

    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    t = spark.createDataFrame(
        [("n1", RDF_T, "c:N", None, False)],
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    shapes = spark.createDataFrame(
        [("s", "c:N", "p:x", 1, None, None, None, None)], SHAPE_SCHEMA
    )
    rep = [(r.focus, r.constraint_name, r.value) for r in validate_shapes(t, shapes).collect()]
    assert rep == [("n1", "min_count", "0")]


def test_datatype_langtag_and_length_blank_nodes(spark):
    """Review fixes: (1) on a datatype-stripped frame a lang-tagged
    literal is rdf:langString whatever its lexical form looks like, so
    the lexical-space sh:datatype branch must still flag it; (2) a
    blank-node value ALWAYS violates sh:minLength/sh:maxLength per
    SHACL (its label is not a measurable value)."""
    from sifr_project_java_ontology_processing_spark.operators.shacl import (
        SHAPE_SCHEMA_EXT,
        validate_shapes,
    )

    XSD = "http://www.w3.org/2001/XMLSchema#"
    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("n1", RDF_T, "c:N", None, False),
        ("n2", RDF_T, "c:N", None, False),
        ("n1", "p:age", "123", "en", True),     # lang-tagged: langString
        ("n2", "p:age", "123", None, True),     # plain: passes lexical rx
        ("n1", "p:code", "_:b1", None, False),  # blank node value
        ("n2", "p:code", "ABCDE", None, True),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean",
    )
    shapes = spark.createDataFrame(
        [
            ("s_age", "c:N", "p:age", None, None, None, None, None,
             f"{XSD}integer", None, None, None),
            ("s_code", "c:N", "p:code", None, None, None, None, None,
             None, None, 3, 8),
        ],
        SHAPE_SCHEMA_EXT,
    )
    rep = {
        (r.focus, r.constraint_name, r.value)
        for r in validate_shapes(t, shapes).collect()
    }
    assert rep == {
        ("n1", "datatype", "123"),
        ("n1", "min_length", "_:b1"),
        ("n1", "max_length", "_:b1"),
    }
