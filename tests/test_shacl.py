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
