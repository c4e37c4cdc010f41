"""N-Quads source/sink (sources/rdf_io.read_nquads,
rdf_sink.to_nquads_lines): grammar edge cases the lazy-object regex
must get right, strict-mode errors, file round-trip."""

from __future__ import annotations

import pytest

from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
    parse_nquads_lines,
    read_nquads,
)
from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
    to_nquads_lines,
    write_nquads,
)

QSCHEMA = (
    "subj string, pred string, obj string, obj_lang string, "
    "obj_is_literal boolean, graph string"
)


def _parse(spark, *lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    return [
        (r.subj, r.pred, r.obj, r.obj_lang, r.obj_is_literal, r.graph)
        for r in parse_nquads_lines(df).collect()
    ]


def test_quad_and_triple_lines(spark):
    got = _parse(
        spark,
        "<s> <p> <o> <g> .",
        "<s> <p> <o> .",  # default graph
        "_:b <p> _:c _:g .",  # blank node everywhere
    )
    assert got == [
        ("s", "p", "o", None, False, "g"),
        ("s", "p", "o", None, False, None),
        ("_:b", "p", "_:c", None, False, "_:g"),
    ]


def test_literal_objects_never_bleed_into_graph(spark):
    got = _parse(
        spark,
        '<s> <p> "a <b> c" .',  # angle brackets inside a literal
        '<s> <p> "x <y>" <g> .',  # ... followed by a real graph label
        '<s> <p> "plain" <g> .',
        '<s> <p> "tagged"@fr <g> .',
        '<s> <p> "5"^^<http://www.w3.org/2001/XMLSchema#int> <g> .',
    )
    assert got == [
        ("s", "p", "a <b> c", None, True, None),
        ("s", "p", "x <y>", None, True, "g"),
        ("s", "p", "plain", None, True, "g"),
        ("s", "p", "tagged", "fr", True, "g"),
        ("s", "p", "5", None, True, "g"),
    ]


def test_escapes_and_comments(spark):
    got = _parse(
        spark,
        '<s> <p> "q\\"uote\\\\and\\ttab\\u00e9" <g> .',
        "# a comment",
        "   ",
    )
    assert got == [("s", "p", 'q"uote\\and\ttabé', None, True, "g")]


def test_roundtrip_identity(spark):
    rows = [
        ("s1", "p", 'we"ird\\\t\n<o>', None, True, "g:1"),
        ("s1", "p", "iri:o", None, False, None),
        ("_:b", "p", "été", "fr", True, "_:g"),
    ]
    quads = spark.createDataFrame(rows, QSCHEMA)
    lines = to_nquads_lines(quads)
    back = parse_nquads_lines(lines, "line").select(
        "subj", "pred", "obj", "obj_lang", "obj_is_literal", "graph"
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_file_roundtrip_and_strict(spark, tmp_path):
    rows = [("s", "p", "o", None, False, "g"), ("s", "p", "lit", "en", True, None)]
    quads = spark.createDataFrame(rows, QSCHEMA)
    out = str(tmp_path / "q.nq")
    write_nquads(quads, out, single_file=True)
    back = read_nquads(spark, out)
    assert "graph" in back.columns
    got = sorted(
        (r.subj, r.pred, r.obj, r.obj_lang, r.obj_is_literal, r.graph)
        for r in back.collect()
    )
    assert got == sorted(rows)

    bad = str(tmp_path / "bad.nq")
    (tmp_path / "bad.nq").write_text('<s> <p> "unclosed .\n')
    with pytest.raises(ValueError, match="unparseable N-Quads"):
        read_nquads(spark, bad)
    assert read_nquads(spark, bad, strict=False).count() == 0


def test_read_feeds_graph_queries(spark, tmp_path):
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    p = tmp_path / "data.nq"
    p.write_text(
        '<a> <http://ex/v> "1" <http://g/one> .\n'
        '<a> <http://ex/v> "2" <http://g/two> .\n'
        '<a> <http://ex/lbl> "base" .\n'
    )
    quads = read_nquads(spark, str(p))
    out = execute_bgp(
        quads,
        "SELECT ?g ?v WHERE { GRAPH ?g { <a> <http://ex/v> ?v . } } ORDER BY ?g",
    ).collect()
    assert [(r.g, r.v) for r in out] == [("http://g/one", "1"), ("http://g/two", "2")]


def test_load_model_dispatches_nq(spark, tmp_path):
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import load_model

    p = tmp_path / "m.nq"
    p.write_text('<a> <p> "v" <g> .\n<a> <p> "w" .\n')
    df = load_model(spark, str(p))
    assert "graph" in df.columns
    assert df.count() == 2


def test_literal_ending_in_bnode_token_stays_in_object(spark):
    """Review fix: '"foo _:bar"' on a default-graph line must parse as
    the literal object, not leak '_:bar"' into the graph slot."""
    got = _parse(
        spark,
        '<s> <p> "foo _:bar" .',
        '<s> <p> "foo _:bar" <g> .',
        '<s> <p> "x _:b" _:g .',
    )
    assert got == [
        ("s", "p", "foo _:bar", None, True, None),
        ("s", "p", "foo _:bar", None, True, "g"),
        ("s", "p", "x _:b", None, True, "_:g"),
    ]


def test_illegal_literal_graph_label_is_strict_error(spark, tmp_path):
    """Review fix: a literal 4th term is not a legal graph label — the
    line must be REJECTED in strict mode, not accepted with a
    corrupted object."""
    import pytest as _pytest

    from sifr_project_java_ontology_processing_spark.sources.rdf_io import read_nquads

    p = tmp_path / "bad.nq"
    p.write_text('<s> <p> <o> "g" .\n')
    with _pytest.raises(ValueError, match="unparseable N-Quads"):
        read_nquads(spark, str(p))
    assert read_nquads(spark, str(p), strict=False).count() == 0


def test_literal_with_angle_tail_before_graph_label(spark, tmp_path):
    """Deterministic pin of a hypothesis-found parse bug: a literal
    whose body contains ' <' followed by a graph label. The old lazy
    object group left the object as a bare '"' and let the graph
    alternation swallow '<" <http://g/one>'."""
    p = tmp_path / "angle.nq"
    p.write_text('<http://s> <http://p> " <" <http://g/one> .\n')
    rows = read_nquads(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["subj"], r["pred"], r["obj"], r["obj_is_literal"], r["graph"]) == (
        "http://s", "http://p", " <", True, "http://g/one"
    )
