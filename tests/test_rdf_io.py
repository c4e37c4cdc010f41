"""RDF ingestion (S1/S12): write→read round-trip identity, Turtle
subset, compression, strict-mode errors."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark import schemas
from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
    load_model,
    read_ntriples,
    read_turtle_lines,
)
from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
    write_ntriples,
)

TRIPLES = [
    ("http://x/A", "http://p/label", "plain label", None, True, None),
    ("http://x/A", "http://p/label", "étiquette fr", "fr", True, None),
    ("http://x/A", "http://p/sub", "http://x/B", None, False, None),
    # escaping gauntlet: quote, backslash, newline, tab, backslash-n text
    ("http://x/B", "http://p/note", 'has "quotes" and \\ and \n and \t and \\n', None, True, None),
]


def _triples_df(spark):
    return spark.createDataFrame(TRIPLES, schemas.TRIPLES)


def test_ntriples_roundtrip_identity(spark, tmp_path):
    """write_ntriples → read_ntriples must be the identity on
    (subj, pred, obj, obj_lang, obj_is_literal) — closes the loop the
    round-1 VERDICT flagged (engine could write RDF but not read it)."""
    out = str(tmp_path / "nt")
    write_ntriples(_triples_df(spark), out)
    back = read_ntriples(spark, out)
    want = {(s, p, o, lg, lit) for s, p, o, lg, lit, _ in TRIPLES}
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"])
        for r in back.collect()
    }
    assert got == want


def test_ntriples_gz_and_comments(spark, tmp_path):
    p = tmp_path / "t.nt.gz"
    content = (
        "# a comment line\n"
        "\n"
        '<http://x/A> <http://p/q> "v" .\n'
        '<http://x/A> <http://p/q> "typed"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
        "<http://x/A> <http://p/r> _:blank1 .\n"
        '_:blank1 <http://p/s> "from blank" .\n'
    )
    p.write_bytes(gzip.compress(content.encode()))
    rows = read_ntriples(spark, str(p)).collect()
    assert len(rows) == 4
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["pred"], []).append(r)
    # typed literal: datatype suffix stripped (P5 strip_xsd_type
    # semantics); set comparison — collect() row order is not guaranteed
    assert {r["obj"] for r in by_pred["http://p/q"]} == {"v", "typed"}
    assert by_pred["http://p/r"][0]["obj"] == "_:blank1"
    assert by_pred["http://p/r"][0]["obj_is_literal"] is False
    assert by_pred["http://p/s"][0]["subj"] == "_:blank1"


def test_ntriples_strict_raises_on_garbage(spark, tmp_path):
    p = tmp_path / "bad.nt"
    p.write_text('<http://x/A> <http://p/q> "ok" .\nthis is not a triple\n')
    with pytest.raises(ValueError, match="unparseable"):
        read_ntriples(spark, str(p))
    # permissive mode keeps the good row
    rows = read_ntriples(spark, str(p), strict=False).collect()
    assert len(rows) == 1 and rows[0]["obj"] == "ok"


def test_ntriples_unicode_escapes(spark, tmp_path):
    """Jena ASCII-escapes non-ASCII chars as \\uXXXX — they must decode
    (round-2 review finding: silent label corruption otherwise)."""
    p = tmp_path / "u.nt"
    p.write_text(
        '<http://x/A> <http://p/l> "proc\\u00E9dure"@fr .\n'
        '<http://x/A> <http://p/m> "astral \\U0001F600 char" .\n'
        '<http://x/A> <http://p/n> "literal backslash-u: \\\\u0041" .\n'
    )
    got = {r["obj"] for r in read_ntriples(spark, str(p)).collect()}
    assert got == {"procédure", "astral 😀 char", "literal backslash-u: \\u0041"}


def test_ntriples_strict_catches_bad_literal(spark, tmp_path):
    """A quoted object failing the literal grammar is a parse error,
    not an empty literal (round-2 review finding)."""
    p = tmp_path / "badlit.nt"
    p.write_text('<http://x/A> <http://p/q> "unterminated .\n')
    with pytest.raises(ValueError, match="unparseable"):
        read_ntriples(spark, str(p))


def test_ntriples_strict_catches_bare_garbage_object(spark, tmp_path):
    """A bare object that is neither <iri> nor _:bnode must raise under
    strict instead of flowing through as a fake IRI (regression: the
    N-Quads reader rejected this via _NQ_TERM_RX while the N-Triples
    reader silently accepted it — the two strict contracts disagreed)."""
    p = tmp_path / "badobj.nt"
    p.write_text(
        '<http://x/A> <http://p/q> garbage .\n'
        '<http://x/A> <http://p/q> "ok" .\n'
    )
    with pytest.raises(ValueError, match="unparseable"):
        read_ntriples(spark, str(p))
    rows = read_ntriples(spark, str(p), strict=False).collect()
    assert len(rows) == 1 and rows[0]["obj"] == "ok"


def test_turtle_lines_strict_catches_bare_garbage_object(spark, tmp_path):
    p = tmp_path / "badobj.ttl"
    p.write_text(
        "@prefix ex: <http://x/> .\n"
        "ex:A ex:q %%nonsense%% .\n"
        'ex:A ex:q "ok" .\n'
    )
    with pytest.raises(ValueError, match="unparseable"):
        read_turtle_lines(spark, str(p))
    rows = read_turtle_lines(spark, str(p), strict=False).collect()
    assert len(rows) == 1 and rows[0]["obj"] == "ok"


def test_rdfxml_blank_nodes_scoped_per_file(spark, tmp_path):
    """Anonymous nodes from different files must not merge
    (round-2 review finding)."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import read_rdfxml

    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:x="http://x/"><rdf:Description rdf:about="http://e/%s">'
        "<x:p><rdf:Description><x:q>v%s</x:q></rdf:Description></x:p>"
        "</rdf:Description></rdf:RDF>"
    )
    (tmp_path / "f1.rdf").write_text(doc % ("A", "1"))
    (tmp_path / "f2.rdf").write_text(doc % ("B", "2"))
    rows = read_rdfxml(spark, str(tmp_path) + "/*.rdf").collect()
    blank_subjects = {r["subj"] for r in rows if r["subj"].startswith("_:")}
    assert len(blank_subjects) == 2, blank_subjects  # one blank PER FILE


def test_turtle_shorthand_literals(spark, tmp_path):
    p = tmp_path / "num.ttl"
    p.write_text(
        "@prefix ex: <http://e/> .\n"
        "ex:s ex:count 42 .\n"
        "ex:s ex:ratio -3.14 .\n"
        "ex:s ex:flag true .\n"
    )
    rows = {(r["obj"], r["obj_is_literal"]) for r in read_turtle_lines(spark, str(p)).collect()}
    assert rows == {("42", True), ("-3.14", True), ("true", True)}


def test_batch_clean_name_collision_raises(spark, tmp_path):
    from sifr_project_java_ontology_processing_spark.cli import main

    ind = tmp_path / "coll"
    ind.mkdir()
    (ind / "MDR.ttl").write_text("@prefix ex: <http://e/> .\n")
    (ind / "MDR.nt").write_text("")
    with pytest.raises(ValueError, match="collision"):
        main(["clean", "--in-dir", str(ind), "--out", str(tmp_path / "o")])


def test_turtle_subset(spark, tmp_path):
    p = tmp_path / "dict.ttl"
    p.write_text(
        "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
        "@prefix ex: <http://example.org/onto/> .\n"
        "# comment\n"
        "ex:C01 a skos:Concept .\n"
        'ex:C01 skos:prefLabel "angine"@fr .\n'
        'ex:C01 skos:notation "J02.9" .\n'
        "ex:C01 skos:broader ex:C00 .\n"
        "<http://example.org/onto/C00> a skos:Concept .\n"
    )
    rows = read_turtle_lines(spark, str(p)).collect()
    got = {(r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"]) for r in rows}
    SKOS = "http://www.w3.org/2004/02/skos/core#"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert got == {
        ("http://example.org/onto/C01", RDF_TYPE, f"{SKOS}Concept", None, False),
        ("http://example.org/onto/C01", f"{SKOS}prefLabel", "angine", "fr", True),
        ("http://example.org/onto/C01", f"{SKOS}notation", "J02.9", None, True),
        ("http://example.org/onto/C01", f"{SKOS}broader", "http://example.org/onto/C00", None, False),
        ("http://example.org/onto/C00", RDF_TYPE, f"{SKOS}Concept", None, False),
    }


RDFXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Class rdf:about="http://e/C1">
    <skos:prefLabel xml:lang="fr">angine</skos:prefLabel>
    <skos:notation>J02.9</skos:notation>
    <skos:broader rdf:resource="http://e/C0"/>
    <skos:related>
      <owl:Class rdf:about="http://e/C2">
        <skos:prefLabel xml:lang="en">nested concept</skos:prefLabel>
      </owl:Class>
    </skos:related>
  </owl:Class>
  <rdf:Description rdf:about="http://e/C0" skos:altLabel="attr label"/>
</rdf:RDF>
"""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SKOS = "http://www.w3.org/2004/02/skos/core#"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"


def test_rdfxml_reader_subset(spark, tmp_path):
    """S12: typed nodes, nested node elements, rdf:resource, xml:lang,
    property attributes — the RDF/XML surface the reference's SKOS
    ontologies actually use."""
    import gzip

    p = tmp_path / "onto.owl.gz"
    p.write_bytes(gzip.compress(RDFXML.encode()))
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import read_rdfxml

    rows = read_rdfxml(spark, str(p)).collect()
    got = {(r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"]) for r in rows}
    assert got == {
        ("http://e/C1", RDF_TYPE, OWL_CLASS, None, False),
        ("http://e/C1", f"{SKOS}prefLabel", "angine", "fr", True),
        ("http://e/C1", f"{SKOS}notation", "J02.9", None, True),
        ("http://e/C1", f"{SKOS}broader", "http://e/C0", None, False),
        ("http://e/C1", f"{SKOS}related", "http://e/C2", None, False),
        ("http://e/C2", RDF_TYPE, OWL_CLASS, None, False),
        ("http://e/C2", f"{SKOS}prefLabel", "nested concept", "en", True),
        ("http://e/C0", f"{SKOS}altLabel", "attr label", None, True),
    }
    # every row carries file lineage
    assert all(r["src_url"].endswith("onto.owl.gz") for r in rows)


def test_rdfxml_parsetype_resource_collection_literal():
    """rdf:parseType coverage (round-3 VERDICT #2): Resource → nested
    blank node, Collection → rdf:first/rest/nil chain, Literal → the
    inner XML captured as one literal."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        _parse_rdfxml_bytes,
    )

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    doc = (
        f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:x="http://x/">'
        '<rdf:Description rdf:about="http://e/A">'
        '<x:p rdf:parseType="Resource"><x:q>v</x:q>'
        '<x:r rdf:resource="http://e/R"/></x:p>'
        '<x:c rdf:parseType="Collection">'
        '<rdf:Description rdf:about="http://e/i1"/>'
        '<rdf:Description rdf:about="http://e/i2"/></x:c>'
        '<x:l rdf:parseType="Literal">pre <x:em>mid</x:em> post</x:l>'
        '<x:e rdf:parseType="Collection"/>'
        "</rdf:Description></rdf:RDF>"
    )
    rows = _parse_rdfxml_bytes(doc.encode(), "mem://pt.rdf")
    by_pred = {}
    for s, p, o, lang, lit, _src in rows:
        by_pred.setdefault(p, []).append((s, o, lang, lit))

    # Resource: A --x:p--> blank; blank has q (literal) and r (IRI)
    (s, bn, _l, is_lit), = by_pred["http://x/p"]
    assert s == "http://e/A" and bn.startswith("_:") and not is_lit
    assert by_pred["http://x/q"] == [(bn, "v", None, True)]
    assert by_pred["http://x/r"] == [(bn, "http://e/R", None, False)]

    # Collection: chain of rdf:first/rest ending in nil, head on x:c
    (_, head, _l2, _lit2), = by_pred["http://x/c"]
    firsts = {s: o for s, o, _l3, _lit3 in by_pred[f"{RDF}first"]}
    rests = {s: o for s, o, _l4, _lit4 in by_pred[f"{RDF}rest"]}
    assert firsts[head] == "http://e/i1"
    second = rests[head]
    assert firsts[second] == "http://e/i2"
    assert rests[second] == f"{RDF}nil"

    # Literal: inner XML captured verbatim (local-name serialization +
    # namespace redeclared as default — same infoset)
    (_, xml_lit, _l5, lit5), = by_pred["http://x/l"]
    assert lit5 and xml_lit == 'pre <em xmlns="http://x/">mid</em> post'

    # empty Collection → rdf:nil directly
    (_, nil_obj, _l6, _lit6), = by_pred["http://x/e"]
    assert nil_obj == f"{RDF}nil"


TTL_FULL = """@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix owl:  <http://www.w3.org/2002/07/owl#> .
@prefix ex:   <http://full.org/> .

# a realistic hand-authored SKOS release: ';'/',' continuations,
# multi-line statements, bnodes, long strings, numeric shorthand
ex:C01 a owl:Class , skos:Concept ;
    skos:prefLabel "angine"@fr ,
        "sore throat"@en ;
    skos:altLabel "angina"@en ;
    skos:notation "J02.9"^^ex:icd ;
    skos:broader ex:C00 ;
    skos:definition '''an
inflammation'''@en ;
    ex:rank 3 .

ex:C00 a skos:Concept ; skos:prefLabel "maladie"@fr ;
    skos:related [ a owl:Restriction ; owl:onProperty ex:site ] .
"""


def test_turtle_full_parser_multiline(spark, tmp_path):
    """Full Turtle (round-3 VERDICT #2): ';'/',' continuations,
    multi-line statements, datatyped + long literals, bnode property
    lists — rows land in the TRIPLES schema."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        read_turtle,
    )

    p = tmp_path / "full.ttl"
    p.write_text(TTL_FULL)
    rows = read_turtle(spark, str(p)).collect()
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"])
        for r in rows
    }
    OWL = "http://www.w3.org/2002/07/owl#"
    c1 = "http://full.org/C01"
    assert (c1, RDF_TYPE, f"{OWL}Class", None, False) in got
    assert (c1, RDF_TYPE, f"{SKOS}Concept", None, False) in got
    assert (c1, f"{SKOS}prefLabel", "angine", "fr", True) in got
    assert (c1, f"{SKOS}prefLabel", "sore throat", "en", True) in got
    assert (c1, f"{SKOS}notation", "J02.9", None, True) in got
    assert (c1, f"{SKOS}definition", "an\ninflammation", "en", True) in got
    assert (c1, "http://full.org/rank", "3", None, True) in got
    bnodes = {r["obj"] for r in rows if r["pred"] == f"{SKOS}related"}
    assert len(bnodes) == 1 and next(iter(bnodes)).startswith("_:")
    bn = next(iter(bnodes))
    assert (bn, RDF_TYPE, f"{OWL}Restriction", None, False) in got
    assert all(r["src_url"].endswith("full.ttl") for r in rows)


def test_turtle_full_through_cascade(spark, tmp_path):
    """The ';'-style TTL fixture loads via load_model and feeds the S2
    named-class scan + label bridge — the 'unmodified third-party SKOS
    file through the cascade' gate from the round-3 verdict."""
    from sifr_project_java_ontology_processing_spark.operators.cascade import (
        named_classes,
    )
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        labels_from_triples,
    )

    p = tmp_path / "full.ttl"
    p.write_text(TTL_FULL)
    triples = load_model(spark, str(p))  # .ttl → full parser dispatch
    classes = {r["concept_iri"] for r in named_classes(triples).collect()}
    # C01 is owl:Class; owl classes exist, so the skos:Concept fallback
    # does NOT fire (reference getClasses semantics) and C00 stays out
    assert classes == {"http://full.org/C01"}
    labels = labels_from_triples(triples)
    got = {
        (r["concept_iri"], r["label"], r["label_kind"], r["lang"])
        for r in labels.collect()
    }
    assert ("http://full.org/C01", "angine", "pref", "fr") in got
    assert ("http://full.org/C01", "angina", "alt", "en") in got
    assert ("http://full.org/C01", "J02.9", "notation", "") in got


def test_turtle_full_parser_errors_are_loud():
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        parse_turtle_text,
    )

    with pytest.raises(ValueError, match="undeclared prefix"):
        parse_turtle_text('miss:a miss:b "x" .', "m")
    with pytest.raises(ValueError, match="bad object"):
        parse_turtle_text("@prefix ex: <http://e/> .\nex:a ex:b ", "m")
    with pytest.raises(ValueError, match="unexpected char"):
        parse_turtle_text("@prefix ex: <http://e/> .\nex:a ex:b ~ .", "m")


def test_batch_clean_directory_driver(spark, tmp_path):
    """S13 (OWLOntologyCleaner.java:45-63): per-file loop over a
    directory; each ontology cleaned and written under its F8 name."""
    from sifr_project_java_ontology_processing_spark.cli import main

    ind = tmp_path / "ontos"
    ind.mkdir()
    (ind / "ONTOA.ttl").write_text(
        "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
        "@prefix ex: <http://a/> .\n"
        'ex:C1 skos:prefLabel "maladie"@fr .\n'
        'ex:C1 skos:prefLabel "disease"@en .\n'      # dropped: fr present
        'ex:C1 skos:altLabel " MALADIE "@fr .\n'     # dropped: ==pref mod case/trim
        'ex:C2 skos:hiddenLabel "acuteDisease"@fr .\n'  # synthesized pref
    )
    (ind / "ONTOB.nt").write_text(
        '<http://b/K> <http://www.w3.org/2004/02/skos/core#prefLabel> "kappa"@fr .\n'
    )
    out = tmp_path / "cleaned"
    assert main(["clean", "--in-dir", str(ind), "--out", str(out), "-l", "fr"]) == 0
    import pyspark.sql.functions as F

    a = spark.read.text(str(out / "ONTOA")).collect()
    lines = {r["value"] for r in a}
    assert '<http://a/C1> <http://www.w3.org/2004/02/skos/core#prefLabel> "maladie"@fr .' in lines
    assert not any('"disease"@en' in l for l in lines)     # W3 drop
    assert not any("MALADIE" in l for l in lines)          # E3 drop
    assert any("acute disease" in l and "prefLabel" in l for l in lines)  # F2+synth
    b = spark.read.text(str(out / "ONTOB")).collect()
    assert len(b) == 1 and "kappa" in b[0]["value"]


def test_load_model_dispatch_and_cascade_integration(spark, tmp_path):
    """A .ttl ontology loads into a triples frame that feeds the S2
    class scan (cascade input path) — OntologyLoader.java:41-71 parity."""
    p = tmp_path / "onto.ttl"
    p.write_text(
        "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
        "@prefix ex: <http://e/> .\n"
        "ex:K1 a skos:Concept .\n"
        'ex:K1 skos:prefLabel "kappa one"@en .\n'
        "ex:K2 a skos:Concept .\n"
    )
    df = load_model(spark, str(p))
    assert df.count() == 3
    concepts = (
        df.where(
            (F.col("pred") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
            & (F.col("obj") == "http://www.w3.org/2004/02/skos/core#Concept")
        )
        .select(F.col("subj").alias("concept_iri"))
        .distinct()
    )
    assert {r["concept_iri"] for r in concepts.collect()} == {"http://e/K1", "http://e/K2"}


def test_mappings_sink_roundtrip(spark, tmp_path):
    """S9 — the mappings write sink (mapping/DefaultOntologyMappingDelegate
    .java:135-142 writes `<src>_<tgt>_mappings.ttl`): MAPPINGS-shaped
    rows serialized as resource-object N-Triples round-trip losslessly
    through the same sink/reader pair as the model sink."""
    from pyspark.sql import functions as F

    from sifr_project_java_ontology_processing_spark.functions.uris import expand

    mappings = spark.createDataFrame(
        [
            ("http://a/1", expand("skos:exactMatch"), "http://b/1"),
            ("http://a/2", expand("skos:closeMatch"), "http://b/2"),
            ("http://a/3", expand("skos:broadMatch"), "http://b/3"),
        ],
        "source_iri string, property string, target_iri string",
    )
    triples = mappings.select(
        F.col("source_iri").alias("subj"),
        F.col("property").alias("pred"),
        F.col("target_iri").alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(False).alias("obj_is_literal"),
    )
    out = str(tmp_path / "mappings_nt")
    write_ntriples(triples, out)
    back = read_ntriples(spark, out).select(
        F.col("subj").alias("source_iri"),
        F.col("pred").alias("property"),
        F.col("obj").alias("target_iri"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, mappings.collect()))


def test_write_turtle_roundtrip_both_readers(spark, tmp_path):
    """S8/S9 .ttl sink: write_turtle output parses back IDENTICALLY
    through read_turtle_lines (whole directory) AND the full parser
    (per part-file) — compaction, escaping and @lang all round-trip."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
        write_turtle,
    )
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        read_turtle,
        read_turtle_lines,
    )

    rows = [
        ("http://e/C1", RDF_TYPE, f"{SKOS}Concept", None, False, None),
        ("http://e/C1", f"{SKOS}prefLabel", "ang\"ine\tx", "fr", True, None),
        ("http://e/C1", f"{SKOS}broader", "http://e/C0", None, False, None),
        ("http://e/C1", "http://other/p", "plain", None, True, None),
        # IRI with a local part that cannot compact (trailing dot)
        ("http://e/C.", f"{SKOS}notation", "J02", None, True, None),
    ]
    triples = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string",
    )
    out = str(tmp_path / "out.ttl")
    write_turtle(triples, out, prefixes={"skos": SKOS, "e": "http://e/"})
    want = {(r[0], r[1], r[2], r[3], r[4]) for r in rows}
    got_lines = {
        (r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"])
        for r in read_turtle_lines(spark, out).collect()
    }
    assert got_lines == want
    got_full = {
        (r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"])
        for r in read_turtle(spark, out).collect()
    }
    assert got_full == want


def test_turtle_compaction_longest_namespace_wins(spark, tmp_path):
    """Nested namespaces: the longest matching prefix must win
    (round-3 review: the when-chain order inverted the precedence)."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
        to_turtle_lines,
    )

    triples = spark.createDataFrame(
        [("http://ex/abcd", "http://ex/abc/p", "http://other/x", None, False, None)],
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string",
    )
    line = to_turtle_lines(
        triples, {"short": "http://ex/ab", "long": "http://ex/abc/"}
    ).collect()[0]["line"]
    # subj matches only the short ns; pred matches both → long must win
    assert line == "short:cd long:p <http://other/x> ."


def test_sink_blank_nodes_rendered_verbatim(spark, tmp_path):
    """Blank-node subjects/objects (which the full Turtle/RDF-XML
    readers routinely produce) must serialize as bare ``_:label`` —
    ``<_:b1>`` is invalid Turtle/N-Triples ('_' is not a legal IRI
    scheme). Both sinks, and the written graph round-trips through
    both readers."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
        to_ntriples_lines,
        to_turtle_lines,
        write_turtle,
    )
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        read_turtle,
        read_turtle_lines,
    )

    rows = [
        ("_:f0b1", RDF_TYPE, f"{SKOS}Concept", None, False, None),
        ("http://e/C1", f"{SKOS}related", "_:f0b1", None, False, None),
        ("_:f0b1", f"{SKOS}prefLabel", "anon", "en", True, None),
    ]
    triples = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string",
    )
    nt = {r["line"] for r in to_ntriples_lines(triples).collect()}
    assert f"_:f0b1 <{RDF_TYPE}> <{SKOS}Concept> ." in nt
    assert f"<http://e/C1> <{SKOS}related> _:f0b1 ." in nt
    assert not any("<_:" in ln for ln in nt)
    ttl = {r["line"] for r in to_turtle_lines(triples, {"skos": SKOS}).collect()}
    assert "_:f0b1 skos:prefLabel \"anon\"@en ." in ttl
    assert not any("<_:" in ln for ln in ttl)

    out = str(tmp_path / "bn.ttl")
    write_turtle(triples, out, prefixes={"skos": SKOS}, single_file=True)
    want = {(r[0], r[1], r[2], r[3], r[4]) for r in rows}
    # line reader: labels kept verbatim → byte-identity round-trip
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"])
        for r in read_turtle_lines(spark, out).collect()
    }
    assert got == want
    # full parser: bnode labels are document-scoped per RDF semantics,
    # so it rescopes them — round-trip is graph ISOMORPHISM, not label
    # identity: one consistent relabeling of _:f0b1 across all triples
    full = read_turtle(spark, out).collect()
    bn = {r["subj"] for r in full if r["subj"].startswith("_:")} | {
        r["obj"] for r in full if not r["obj_is_literal"] and r["obj"].startswith("_:")
    }
    assert len(bn) == 1, bn  # same label everywhere → structure preserved
    relabel = bn.pop()
    got_full = {
        (
            relabel if r["subj"] == "_:f0b1" else r["subj"],
            r["pred"],
            relabel if (not r["obj_is_literal"] and r["obj"] == "_:f0b1") else r["obj"],
            r["obj_lang"],
            r["obj_is_literal"],
        )
        for r in rows_as_tuples(rows)
    }
    assert {
        (r["subj"], r["pred"], r["obj"], r["obj_lang"], r["obj_is_literal"])
        for r in full
    } == got_full


def rows_as_tuples(rows):
    return [
        {
            "subj": r[0],
            "pred": r[1],
            "obj": r[2],
            "obj_lang": r[3],
            "obj_is_literal": r[4],
        }
        for r in rows
    ]
