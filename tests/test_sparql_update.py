"""SPARQL UPDATE subset (plans/sparql_update.py): semantics on a tiny
graph, parser rejections, and the zero-shuffle plan gate.

Reference analog: Jena's UpdateAction over any Model — the mutable-graph
capability behind the reference's model.add/model.remove batch-update
stages (OntologyCUIProcessor.java E5/S6 paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.plans.sparql_update import (
    apply_update,
    parse_update,
)

EX = "http://ex/p/"
SKOS = "http://www.w3.org/2004/02/skos/core#"

ROWS = [
    ("http://ex/a", f"{EX}knows", "http://ex/b", None, False),
    ("http://ex/b", f"{EX}knows", "http://ex/c", None, False),
    ("http://ex/a", f"{SKOS}prefLabel", "Alpha", "en", True),
    ("http://ex/b", f"{SKOS}prefLabel", "Beta", "en", True),
    ("http://ex/c", f"{SKOS}prefLabel", "Gamma", None, True),
]


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(
        ROWS,
        "subj string, pred string, obj string, "
        "obj_lang string, obj_is_literal boolean",
    ).cache()


def _set(df):
    return {
        (r.subj, r.pred, r.obj, r.obj_lang, r.obj_is_literal)
        for r in df.collect()
    }


def test_insert_data_set_semantics(graph):
    """Inserting an already-present triple is a no-op (graph = set);
    a genuinely new triple appears once."""
    out = apply_update(
        graph,
        """PREFIX ex: <http://ex/p/>
        INSERT DATA { <http://ex/a> ex:knows <http://ex/b> .
                      <http://ex/c> ex:knows <http://ex/a> .
                      <http://ex/c> ex:knows <http://ex/a> }""",
    )
    s = _set(out)
    assert len(s) == 6
    assert ("http://ex/c", f"{EX}knows", "http://ex/a", None, False) in s


def test_delete_data_lang_null_safe(graph):
    """Deleting "Alpha"@en removes exactly the lang-tagged literal;
    the plain-literal Gamma (obj_lang NULL) survives a NULL-lang
    delete of a different row — eqNullSafe identity."""
    out = apply_update(
        graph,
        """PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        DELETE DATA { <http://ex/a> skos:prefLabel "Alpha"@en .
                      <http://ex/c> skos:prefLabel "Gamma" }""",
    )
    s = _set(out)
    assert len(s) == 3
    assert not any(o in ("Alpha", "Gamma") for _, _, o, _, _ in s)


def test_delete_data_wrong_lang_is_noop(graph):
    out = apply_update(
        graph,
        """PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        DELETE DATA { <http://ex/a> skos:prefLabel "Alpha"@fr .
                      <http://ex/c> skos:prefLabel "Gamma"@en }""",
    )
    assert out.count() == 5


def test_delete_where(graph):
    out = apply_update(
        graph,
        "PREFIX ex: <http://ex/p/> DELETE WHERE { ?x ex:knows ?y }",
    )
    s = _set(out)
    assert len(s) == 3
    assert all(p == f"{SKOS}prefLabel" for _, p, *_ in s)


def test_delete_insert_where_with_filter(graph):
    """Predicate rename restricted by a FILTER; the INSERT template
    also emits a constant literal per solution."""
    out = apply_update(
        graph,
        """PREFIX ex: <http://ex/p/>
        PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        DELETE { ?x ex:knows ?y }
        INSERT { ?x ex:met ?y . ?x ex:flag "seen" }
        WHERE { ?x ex:knows ?y . ?x skos:prefLabel ?l
                FILTER(regex(?l, "^A")) }""",
    )
    s = _set(out)
    assert ("http://ex/a", f"{EX}met", "http://ex/b", None, False) in s
    assert ("http://ex/a", f"{EX}flag", "seen", None, True) in s
    # only a's edge matched the filter; b's edge untouched
    assert ("http://ex/a", f"{EX}knows", "http://ex/b", None, False) not in s
    assert ("http://ex/b", f"{EX}knows", "http://ex/c", None, False) in s
    assert len(s) == 6


def test_insert_where_carries_lang_metadata(graph):
    """An object variable bound to a lang-tagged literal keeps its
    tag through the INSERT template (__m_ metadata path)."""
    out = apply_update(
        graph,
        """PREFIX ex: <http://ex/p/>
        PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
        INSERT { ?x ex:alias ?l } WHERE { ?x skos:prefLabel ?l }""",
    )
    s = _set(out)
    assert ("http://ex/a", f"{EX}alias", "Alpha", "en", True) in s
    assert ("http://ex/c", f"{EX}alias", "Gamma", None, True) in s
    assert len(s) == 8


def test_sequence_delete_then_reinsert(graph):
    out = apply_update(
        graph,
        """PREFIX ex: <http://ex/p/>
        DELETE DATA { <http://ex/a> ex:knows <http://ex/b> } ;
        INSERT DATA { <http://ex/a> ex:knows <http://ex/b> }""",
    )
    assert out.count() == 5
    assert len(parse_update("INSERT DATA { <u:a> <u:p> <u:b> } ; "
                            "DELETE DATA { <u:a> <u:p> <u:b> }")) == 2


def test_single_op_delete_insert_same_triple(graph):
    """Within ONE operation SPARQL applies DELETE then INSERT — a
    triple in both templates ends up present."""
    out = apply_update(
        graph,
        """PREFIX ex: <http://ex/p/>
        DELETE { ?x ex:knows ?y } INSERT { ?x ex:knows ?y }
        WHERE { ?x ex:knows ?y }""",
    )
    assert out.count() == 5


def test_parser_rejections():
    with pytest.raises(ValueError, match="must be ground"):
        parse_update("INSERT DATA { ?x <u:p> <u:b> }")
    with pytest.raises(ValueError, match="literal subject"):
        parse_update('DELETE DATA { "lit" <u:p> <u:b> }')
    with pytest.raises(ValueError, match="expected WHERE"):
        parse_update("DELETE { <u:a> <u:p> <u:b> }")
    with pytest.raises(ValueError, match="empty"):
        parse_update("")
    with pytest.raises(ValueError, match="unsupported operation"):
        parse_update("LOAD <http://ex/graph>")
    with pytest.raises(ValueError, match="plain triples"):
        parse_update(
            'DELETE { <u:a> <u:p> ?y FILTER(regex(?y, "x")) } '
            "WHERE { <u:a> <u:p> ?y }"
        )


def test_plan_zero_shuffle_broadcast_apply(graph):
    """The 100 TB gate: a DATA-form update must compile to broadcast
    anti/semi joins only — the base graph is scanned, never exchanged."""
    out = apply_update(
        graph,
        """PREFIX ex: <http://ex/p/>
        DELETE DATA { <http://ex/a> ex:knows <http://ex/b> } ;
        INSERT DATA { <http://ex/z> ex:knows <http://ex/a> }""",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan  # anti, semi, anti


def test_prefix_keyword_inside_literal_survives(graph):
    """Regression: PREFIX declarations were stripped with a global
    re.sub that also deleted matching text from INSIDE quoted string
    literals, silently corrupting the inserted value."""
    lit = "see PREFIX ex: <http://e/> docs"
    out = apply_update(
        graph,
        f'PREFIX ex: <http://ex/p/> '
        f'INSERT DATA {{ <http://ex/a> ex:note "{lit}" }}',
    )
    notes = {
        r.obj
        for r in out.where(F.col("pred") == f"{EX}note").collect()
    }
    assert notes == {lit}


QROWS = [
    ("http://ex/a", f"{EX}knows", "http://ex/b", None, False, None),
    ("http://ex/a", f"{SKOS}prefLabel", "Alpha", "en", True, None),
    ("http://ex/a", f"{EX}knows", "http://ex/c", None, False, "http://g/one"),
    ("http://ex/c", f"{SKOS}prefLabel", "Gamma", None, True, "http://g/one"),
    ("http://ex/d", f"{EX}knows", "http://ex/a", None, False, "http://g/two"),
]


@pytest.fixture(scope="module")
def quads(spark):
    return spark.createDataFrame(
        QROWS,
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, graph string",
    ).cache()


def _qset(df):
    return {
        (r.subj, r.pred, r.obj, r.obj_lang, r.obj_is_literal, r.graph)
        for r in df.collect()
    }


def test_insert_data_graph_blocks(quads):
    out = apply_update(
        quads,
        'INSERT DATA { <http://ex/n> <http://ex/p> "v" . '
        'GRAPH <http://g/one> { <http://ex/n> <http://ex/p> "v" } }',
    )
    got = _qset(out)
    assert ("http://ex/n", "http://ex/p", "v", None, True, None) in got
    assert ("http://ex/n", "http://ex/p", "v", None, True, "http://g/one") in got
    assert len(got) == len(QROWS) + 2


def test_delete_data_is_graph_scoped(quads):
    # deleting the default-graph row leaves the same triple in g/one
    out = apply_update(
        quads,
        f"DELETE DATA {{ <http://ex/a> <{EX}knows> <http://ex/b> }}",
    )
    got = _qset(out)
    assert ("http://ex/a", f"{EX}knows", "http://ex/b", None, False, None) not in got
    assert ("http://ex/a", f"{EX}knows", "http://ex/c", None, False, "http://g/one") in got
    # the named-graph twin requires the GRAPH block
    out2 = apply_update(
        quads,
        f"DELETE DATA {{ GRAPH <http://g/one> {{ "
        f"<http://ex/a> <{EX}knows> <http://ex/c> }} }}",
    )
    got2 = _qset(out2)
    assert ("http://ex/a", f"{EX}knows", "http://ex/c", None, False, "http://g/one") not in got2
    assert len(got2) == len(QROWS) - 1


def test_with_scopes_where_and_templates(quads):
    """WITH <g>: WHERE matches inside g only; inserts land in g."""
    out = apply_update(
        quads,
        f"WITH <http://g/one> "
        f"INSERT {{ ?s <{EX}mentioned> ?o . }} "
        f"WHERE {{ ?s <{EX}knows> ?o }}",
    )
    got = _qset(out)
    # derived from g/one's (a knows c); default-graph (a knows b) and
    # g/two's (d knows a) must NOT contribute
    assert ("http://ex/a", f"{EX}mentioned", "http://ex/c", None, False, "http://g/one") in got
    assert len(got) == len(QROWS) + 1


def test_plain_where_matches_default_graph_only(quads):
    out = apply_update(
        quads,
        f"INSERT {{ ?s <{EX}seen> ?o . }} WHERE {{ ?s <{EX}knows> ?o }}",
    )
    got = _qset(out)
    assert ("http://ex/a", f"{EX}seen", "http://ex/b", None, False, None) in got
    assert len(got) == len(QROWS) + 1  # only the default-graph match


def test_graph_block_in_where_with_default_template(quads):
    out = apply_update(
        quads,
        f"INSERT {{ ?s <{EX}linked> ?o . }} "
        f"WHERE {{ GRAPH <http://g/two> {{ ?s <{EX}knows> ?o }} }}",
    )
    got = _qset(out)
    assert ("http://ex/d", f"{EX}linked", "http://ex/a", None, False, None) in got
    assert len(got) == len(QROWS) + 1


def test_graph_update_on_triples_frame_raises(graph):
    with pytest.raises(ValueError, match="quads frame"):
        apply_update(
            graph,
            'INSERT DATA { GRAPH <http://g/x> { <http://s> <http://p> "v" } }',
        )
    with pytest.raises(ValueError, match="quads frame"):
        apply_update(
            graph,
            f"WITH <http://g/x> DELETE {{ ?s <{EX}knows> ?o . }} "
            f"WHERE {{ ?s <{EX}knows> ?o }}",
        )


def test_with_data_form_rejected(quads):
    with pytest.raises(ValueError, match="WITH applies"):
        apply_update(
            quads, 'WITH <http://g/x> INSERT DATA { <http://s> <http://p> "v" }'
        )


QROWS_SET = {tuple(r) for r in QROWS}


def test_graph_management_ops(quads):
    """CLEAR / DROP / COPY / MOVE / ADD over the quads frame."""
    # CLEAR GRAPH <g>
    got = _qset(apply_update(quads, "CLEAR GRAPH <http://g/one>"))
    assert not any(g == "http://g/one" for *_, g in got) and len(got) == 3
    # DROP SILENT ≡ CLEAR
    assert got == _qset(apply_update(quads, "DROP SILENT GRAPH <http://g/one>"))
    # CLEAR DEFAULT keeps only named rows
    got_d = _qset(apply_update(quads, "CLEAR DEFAULT"))
    assert all(g is not None for *_, g in got_d) and len(got_d) == 3
    # CLEAR NAMED keeps only the default graph
    got_n = _qset(apply_update(quads, "CLEAR NAMED"))
    assert all(g is None for *_, g in got_n) and len(got_n) == 2
    # CLEAR ALL
    assert _qset(apply_update(quads, "CLEAR ALL")) == set()

    # COPY replaces dst with src content
    got_c = _qset(apply_update(quads, "COPY DEFAULT TO GRAPH <http://g/two>"))
    two = {(s, p, o) for s, p, o, _l, _il, g in got_c if g == "http://g/two"}
    dflt = {(s, p, o) for s, p, o, _l, _il, g in QROWS_SET if g is None}
    assert two == dflt and len(got_c) == 2 + 2 + 2  # default + g/one + copied

    # ADD set-unions (no replacement, no duplicates on repeat)
    got_a = _qset(apply_update(quads, "ADD DEFAULT TO <http://g/two> ; "
                                      "ADD DEFAULT TO <http://g/two>"))
    two_a = {x for x in got_a if x[5] == "http://g/two"}
    assert len(two_a) == 3  # original 1 + 2 added
    assert len(got_a) == len(QROWS_SET) + 2

    # MOVE clears src and replaces dst
    got_m = _qset(apply_update(quads, "MOVE GRAPH <http://g/one> TO DEFAULT"))
    assert not any(g == "http://g/one" for *_, g in got_m)
    new_default = {(s, p, o) for s, p, o, _l, _il, g in got_m if g is None}
    src_was = {(s, p, o) for s, p, o, _l, _il, g in QROWS_SET if g == "http://g/one"}
    assert new_default == src_was  # default REPLACED by g/one content
    # COPY g TO g is a no-op
    assert _qset(apply_update(quads, "COPY GRAPH <http://g/one> TO <http://g/one>")) == QROWS_SET

    # management on a triples frame raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="quads frame"):
        apply_update(quads.drop("graph"), "CLEAR ALL")
