"""SPARQL named-graph support (plans/bgp.py): GRAPH ?g / GRAPH <iri>
groups and FROM / FROM NAMED dataset clauses over a quads frame
(triples + nullable ``graph`` column; NULL = default graph)."""

from __future__ import annotations

import pytest

from sifr_project_java_ontology_processing_spark.plans.bgp import (
    execute_bgp,
    parse_sparql,
)

QSCHEMA = (
    "subj string, pred string, obj string, obj_lang string, "
    "obj_is_literal boolean, graph string"
)


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        # default graph
        ("s1", "p:knows", "s2", None, False, None),
        ("s1", "p:name", "Alice", "en", True, None),
        # named graph g1
        ("s1", "p:age", "30", None, True, "g:one"),
        ("s2", "p:age", "40", None, True, "g:one"),
        # named graph g2
        ("s1", "p:age", "31", None, True, "g:two"),
        ("s3", "p:name", "Carol", "en", True, "g:two"),
    ]
    return spark.createDataFrame(rows, QSCHEMA)


def test_default_graph_excludes_named(quads):
    out = execute_bgp(quads, "SELECT ?s ?o WHERE { ?s <p:age> ?o . }").collect()
    assert out == []  # p:age only exists in named graphs
    out2 = execute_bgp(quads, "SELECT ?o WHERE { <s1> <p:name> ?o . }").collect()
    assert [r.o for r in out2] == ["Alice"]


def test_graph_constant_iri(quads):
    out = execute_bgp(
        quads,
        "SELECT ?s ?o WHERE { GRAPH <g:one> { ?s <p:age> ?o . } } ORDER BY ?s",
    ).collect()
    assert [(r.s, r.o) for r in out] == [("s1", "30"), ("s2", "40")]


def test_graph_variable_binds_label(quads):
    out = execute_bgp(
        quads,
        "SELECT ?g ?o WHERE { GRAPH ?g { <s1> <p:age> ?o . } } ORDER BY ?g",
    ).collect()
    assert [(r.g, r.o) for r in out] == [("g:one", "30"), ("g:two", "31")]


def test_graph_group_patterns_share_one_graph(quads, spark):
    """Two patterns inside one GRAPH ?g must come from the SAME named
    graph: s1 and s3 never co-occur, s1 and s2 do (g:one only)."""
    out = execute_bgp(
        quads,
        """SELECT ?g ?a ?b WHERE {
             GRAPH ?g { <s1> <p:age> ?a . <s2> <p:age> ?b . } }""",
    ).collect()
    assert [(r.g, r.a, r.b) for r in out] == [("g:one", "30", "40")]


def test_graph_joins_with_default_patterns(quads):
    """Outer (default-graph) patterns join GRAPH-group bindings on the
    shared variable."""
    out = execute_bgp(
        quads,
        """SELECT ?s ?n ?a WHERE {
             ?x <p:knows> ?s . GRAPH <g:one> { ?s <p:age> ?a . }
             ?x <p:name> ?n . }""",
    ).collect()
    assert [(r.s, r.n, r.a) for r in out] == [("s2", "Alice", "40")]


def test_from_merges_named_into_default(quads):
    out = execute_bgp(
        quads,
        "SELECT ?s ?o FROM <g:one> WHERE { ?s <p:age> ?o . } ORDER BY ?s",
    ).collect()
    assert [(r.s, r.o) for r in out] == [("s1", "30"), ("s2", "40")]
    # ... and the original default graph is NOT part of the dataset
    out2 = execute_bgp(
        quads, "SELECT ?o FROM <g:one> WHERE { <s1> <p:name> ?o . }"
    ).collect()
    assert out2 == []


def test_from_named_restricts_graph_patterns(quads):
    out = execute_bgp(
        quads,
        """SELECT ?g ?o FROM NAMED <g:two>
           WHERE { GRAPH ?g { <s1> <p:age> ?o . } }""",
    ).collect()
    assert [(r.g, r.o) for r in out] == [("g:two", "31")]


def test_from_only_empties_named_view(quads):
    out = execute_bgp(
        quads,
        """SELECT ?g ?o FROM <g:one>
           WHERE { GRAPH ?g { ?s <p:age> ?o . } }""",
    ).collect()
    assert out == []  # FROM without FROM NAMED: no named graphs


def test_graph_on_tripleonly_table_matches_nothing(spark):
    t = spark.createDataFrame(
        [("s", "p", "o", None, False)],
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    out = execute_bgp(t, "SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o . } }").collect()
    assert out == []
    # and plain patterns still see the whole (graph-less) table
    assert execute_bgp(t, "SELECT ?s WHERE { ?s ?p ?o . }").count() == 1


def test_graph_aggregate_per_graph(quads):
    out = execute_bgp(
        quads,
        """SELECT ?g (COUNT(?s) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o . } }
           GROUP BY ?g ORDER BY ?g""",
    ).collect()
    assert [(r.g, r.n) for r in out] == [("g:one", 2), ("g:two", 2)]


def test_parse_errors(quads):
    with pytest.raises(ValueError):
        parse_sparql('SELECT ?s WHERE { GRAPH "lit" { ?s ?p ?o . } }')
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?s WHERE { GRAPH ?g { } }")
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?s WHERE { OPTIONAL { GRAPH ?g { ?s ?p ?o . } } }")
    with pytest.raises(ValueError):
        execute_bgp(quads, "SELECT ?s FROM ?g WHERE { ?s ?p ?o . }")
    t_no_g = quads.drop("graph")
    with pytest.raises(ValueError):
        execute_bgp(t_no_g, "SELECT ?s FROM <g:one> WHERE { ?s ?p ?o . }")


def test_from_multiple_graphs_is_set_union(quads, spark):
    """Review fix: FROM <g1> FROM <g2> is the RDF MERGE — a triple in
    both graphs contributes ONE solution."""
    rows = [
        ("s", "p:x", "o", None, False, "ga"),
        ("s", "p:x", "o", None, False, "gb"),
    ]
    q = spark.createDataFrame(rows, QSCHEMA)
    out = execute_bgp(
        q, "SELECT ?s FROM <ga> FROM <gb> WHERE { ?s <p:x> <o> . }"
    ).collect()
    assert len(out) == 1


def test_construct_template_rejects_graph_group(quads):
    with pytest.raises(ValueError, match="plain triples"):
        parse_sparql(
            "CONSTRUCT { <a> <b> <c> GRAPH ?g { ?s ?p ?o . } } "
            "WHERE { ?s ?p ?o . }"
        )


def test_partitioned_quads_prune_by_graph(quads, spark, tmp_path):
    """Scale gate: over a graph-partitioned quads table, GRAPH <iri>
    must reach the scan as a PartitionFilter (directory prune), and the
    default-graph view must round-trip NULL through the partition
    column."""
    from sifr_project_java_ontology_processing_spark.sources.graph_sink import (
        read_quads,
        write_quads,
    )

    path = str(tmp_path / "quads_tbl")
    write_quads(quads, path)
    table = read_quads(spark, path)

    out = execute_bgp(
        table,
        "SELECT ?s ?o WHERE { GRAPH <g:one> { ?s <p:age> ?o . } } ORDER BY ?s",
    )
    assert [(r.s, r.o) for r in out.collect()] == [("s1", "30"), ("s2", "40")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "graph" in plan.split("PartitionFilters")[1].split("]")[0], plan

    # default graph reads back as NULL and stays isolated
    dflt = execute_bgp(table, "SELECT ?o WHERE { <s1> <p:name> ?o . }").collect()
    assert [r.o for r in dflt] == ["Alice"]
    assert execute_bgp(table, "SELECT ?s ?o WHERE { ?s <p:age> ?o . }").collect() == []


# ---------------------------------------------------------------------------
# { SELECT ... } subqueries
# ---------------------------------------------------------------------------

TSCHEMA = (
    "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean"
)


@pytest.fixture(scope="module")
def regions(spark):
    rows = [
        ("n1", "p:in", "r1", None, False),
        ("n2", "p:in", "r1", None, False),
        ("n3", "p:in", "r2", None, False),
        ("r1", "p:lbl", "west", "en", True),
        ("r2", "p:lbl", "east", "en", True),
        ("r3", "p:lbl", "empty", "en", True),  # no members
    ]
    return spark.createDataFrame(rows, TSCHEMA)


def test_subquery_groupby_joins_outer(regions):
    out = execute_bgp(
        regions,
        """SELECT ?r ?l ?n WHERE {
             ?r <p:lbl> ?l .
             { SELECT ?r (COUNT(?x) AS ?n) WHERE { ?x <p:in> ?r . }
               GROUP BY ?r }
           } ORDER BY ?r""",
    ).collect()
    # inner join: r3 (no members) is absent, per SPARQL join semantics
    assert [(r.r, r.l, r.n) for r in out] == [("r1", "west", 2), ("r2", "east", 1)]


def test_subquery_only_where(regions):
    out = execute_bgp(
        regions,
        """SELECT ?r ?n WHERE {
             { SELECT ?r (COUNT(?x) AS ?n) WHERE { ?x <p:in> ?r . }
               GROUP BY ?r } } ORDER BY ?n ?r""",
    ).collect()
    assert [(r.r, r.n) for r in out] == [("r2", 1), ("r1", 2)]


def test_subquery_limit_is_evaluated_inside(regions):
    """ORDER/LIMIT belong to the subquery: the outer pattern joins the
    single projected row, not a truncated final result."""
    out = execute_bgp(
        regions,
        """SELECT ?r ?l WHERE {
             ?r <p:lbl> ?l .
             { SELECT ?r WHERE { ?x <p:in> ?r . } ORDER BY ?r LIMIT 1 }
           }""",
    ).collect()
    assert [(r.r, r.l) for r in out] == [("r1", "west")]


def test_subquery_projection_scopes_variables(regions):
    """?x is not projected by the subquery, so it must NOT join or leak
    into the outer scope — SPARQL subquery scoping."""
    out = execute_bgp(
        regions,
        """SELECT ?x ?r WHERE {
             ?x <p:in> ?r .
             { SELECT ?r WHERE { ?x <p:in> ?r . } GROUP BY ?r }
           } ORDER BY ?x""",
    )
    assert [(r.x, r.r) for r in out.collect()] == [
        ("n1", "r1"), ("n2", "r1"), ("n3", "r2"),
    ]


def test_subquery_in_graph_dataset(quads):
    """A subquery evaluates over the same dataset: GRAPH works inside."""
    out = execute_bgp(
        quads,
        """SELECT ?g ?n WHERE {
             { SELECT ?g (COUNT(?s) AS ?n) WHERE {
                 GRAPH ?g { ?s ?p ?o . } } GROUP BY ?g }
           } ORDER BY ?g""",
    ).collect()
    assert [(r.g, r.n) for r in out] == [("g:one", 2), ("g:two", 2)]


def test_subquery_errors(regions):
    with pytest.raises(ValueError, match="dataset clauses"):
        parse_sparql(
            "SELECT ?r WHERE { { SELECT ?r FROM <g> WHERE { ?x <p:in> ?r . } } }"
        )
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?r WHERE { OPTIONAL { { SELECT ?r WHERE { ?x <p:in> ?r . } } } }")
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?r WHERE { { NOTSELECT } }")


def test_filter_inside_optional_fails_group_not_solution(regions):
    """FILTER inside OPTIONAL: a failing filter unbinds the group's
    variables but keeps the outer solution (left-join semantics) —
    unlike a top-level FILTER, which would drop the row."""
    out = execute_bgp(
        regions,
        """SELECT ?r ?l ?x WHERE {
             ?r <p:lbl> ?l .
             OPTIONAL { ?x <p:in> ?r . FILTER(?x != "n1") }
           } ORDER BY ?r ?x""",
    ).collect()
    got = [(r.r, r.l, r.x) for r in out]
    assert got == [
        ("r1", "west", "n2"),  # n1 filtered INSIDE the group
        ("r2", "east", "n3"),
        ("r3", "empty", None),  # no members at all: still present
    ]
    # contrast: the same filter at group level drops unbound rows too
    out2 = execute_bgp(
        regions,
        """SELECT ?r ?x WHERE {
             ?r <p:lbl> ?l . OPTIONAL { ?x <p:in> ?r . }
             FILTER(?x != "n1")
           } ORDER BY ?r""",
    ).collect()
    assert [(r.r, r.x) for r in out2] == [("r1", "n2"), ("r2", "n3")]


def test_filter_inside_optional_outer_var_rejected(regions):
    with pytest.raises(ValueError, match="own variables"):
        execute_bgp(
            regions,
            """SELECT ?r WHERE {
                 ?r <p:lbl> ?l .
                 OPTIONAL { ?x <p:in> ?r . FILTER(?x != ?l) }
               }""",
        )


def test_select_scalar_expressions(regions):
    out = execute_bgp(
        regions,
        """SELECT ?r (UCASE(?l) AS ?u) (STRLEN(?l) AS ?n) WHERE {
             ?r <p:lbl> ?l . } ORDER BY ?r""",
    ).collect()
    assert [(r.r, r.u, r.n) for r in out] == [
        ("r1", "WEST", 4), ("r2", "EAST", 4), ("r3", "EMPTY", 5),
    ]


def test_select_expression_over_aggregate_alias(regions):
    out = execute_bgp(
        regions,
        """SELECT ?r (COUNT(?x) AS ?c) (CONCAT("grp-", ?r) AS ?tag)
           WHERE { ?x <p:in> ?r . } GROUP BY ?r ORDER BY ?r""",
    ).collect()
    assert [(r.r, r.c, r.tag) for r in out] == [
        ("r1", 2, "grp-r1"), ("r2", 1, "grp-r2"),
    ]


def test_select_expression_rebind_rejected(regions):
    with pytest.raises(ValueError, match="rebind"):
        execute_bgp(
            regions, "SELECT (STRLEN(?l) AS ?l) WHERE { ?r <p:lbl> ?l . }"
        )


def test_optional_filter_literal_with_backtick(regions):
    """Review fix: a backtick inside a FILTER string literal must not
    be mistaken for a variable reference."""
    out = execute_bgp(
        regions,
        """SELECT ?r ?x WHERE {
             ?r <p:lbl> ?l .
             OPTIONAL { ?x <p:in> ?r . FILTER(?x != "`n1`") }
           } ORDER BY ?r ?x""",
    ).collect()
    # nothing equals the literal "`n1`", so all members survive
    assert [(r.r, r.x) for r in out] == [
        ("r1", "n1"), ("r1", "n2"), ("r2", "n3"), ("r3", None),
    ]


def test_graph_var_path_closure_stays_within_graph(spark):
    """Round-5: property-path closures inside GRAPH ?g run as ONE
    pooled closure with the graph label fused into the node key —
    paths never hop between graphs, the default graph never joins."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    rows = [
        ("a", "p:x", "b", None, False, "g:1"),
        ("b", "p:x", "c", None, False, "g:1"),
        ("c", "p:x", "d", None, False, "g:2"),
        ("d", "p:x", "e", None, False, None),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, graph string",
    )
    out = sorted(
        (r.g, r.x, r.y)
        for r in execute_bgp(
            t, "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x <p:x>+ ?y } }"
        ).collect()
    )
    assert out == [
        ("g:1", "a", "b"), ("g:1", "a", "c"), ("g:1", "b", "c"),
        ("g:2", "c", "d"),
    ]
    # star identity is per-graph; constant subject narrows it
    star = sorted(
        (r.g, r.y)
        for r in execute_bgp(
            t, "SELECT ?g ?y WHERE { GRAPH ?g { <a> <p:x>* ?y } }"
        ).collect()
    )
    assert star == [("g:1", "a"), ("g:1", "b"), ("g:1", "c")]
    # graph var shared with a plain pattern in the same group
    mixed = sorted(
        (r.g, r.x)
        for r in execute_bgp(
            t, "SELECT ?g ?x WHERE { GRAPH ?g { ?x <p:x>+ <c> . ?x <p:x> ?z } }"
        ).collect()
    )
    assert mixed == [("g:1", "a"), ("g:1", "b")]


def test_construct_where_shorthand(spark):
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    rows = [("a", "p:x", "b", None, False), ("b", "p:y", "lit", "fr", True)]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    out = [tuple(r) for r in execute_bgp(t, "CONSTRUCT WHERE { ?s <p:y> ?o }").collect()]
    assert out == [("b", "p:y", "lit", "fr", True)]  # lang metadata carried
    joined = sorted(
        tuple(r)
        for r in execute_bgp(
            t, "CONSTRUCT WHERE { ?s <p:x> ?m . ?m <p:y> ?o }"
        ).collect()
    )
    assert joined == [
        ("a", "p:x", "b", None, False),
        ("b", "p:y", "lit", "fr", True),
    ]


def test_path_group_inside_graph_var_stays_within_graph(spark):
    """(a/b)+ under GRAPH ?g: the derived-edge closure is graph-fused —
    a chain whose second hop lives in ANOTHER graph must not close."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    sch = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, graph string"
    )
    quads = spark.createDataFrame(
        [
            # g1: x -a-> m -b-> y -a-> n -b-> z  ((a/b)+ reaches x->y, y->z, x->z)
            ("x", "a", "m", None, False, "g1"),
            ("m", "b", "y", None, False, "g1"),
            ("y", "a", "n", None, False, "g1"),
            ("n", "b", "z", None, False, "g1"),
            # g2: a DIFFERENT x -a-> m, and m -b-> q — must not leak into g1
            ("x", "a", "m", None, False, "g2"),
            ("m", "b", "q", None, False, "g2"),
            # cross-graph trap: g3 holds only the second hop of a chain
            ("u", "a", "v", None, False, "g1"),
            ("v", "b", "w", None, False, "g3"),
        ],
        sch,
    )
    out = execute_bgp(
        quads,
        "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s (<a>/<b>)+ ?t . } }",
    ).collect()
    got = {(r["g"], r["s"], r["t"]) for r in out}
    assert got == {
        ("g1", "x", "y"), ("g1", "y", "z"), ("g1", "x", "z"),
        ("g2", "x", "q"),
    }
    # constant-graph form composes too (plain slice, no fusing needed)
    out2 = execute_bgp(
        quads,
        "SELECT ?s ?t WHERE { GRAPH <g1> { ?s (<a>/<b>)+ ?t . } }",
    ).collect()
    assert {(r["s"], r["t"]) for r in out2} == {("x", "y"), ("y", "z"), ("x", "z")}
