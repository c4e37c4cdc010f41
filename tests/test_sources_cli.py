"""SPARQL-XML converter (S7), UMLS lang codes, code-finder chain, CLI."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.functions.langcodes import (
    iso2_to_umls,
    umls_to_iso2,
)
from sifr_project_java_ontology_processing_spark.operators.cascade import (
    CODE_PREDICATES,
    find_codes,
)
from sifr_project_java_ontology_processing_spark.sources.sparql_xml import (
    parse_sparql_results,
    sparql_xml_to_triples,
)

SPARQL_XML = """<?xml version="1.0"?>
<sparql xmlns="http://www.w3.org/2005/sparql-results#">
 <results>
  <result>
   <binding name="s"><uri>http://x/Class1</uri></binding>
   <binding name="o"><literal>C0001234</literal></binding>
  </result>
  <result>
   <binding name="s"><uri>http://x/Class2</uri></binding>
  </result>
  <result>
   <binding name="s"><uri>http://x/Class3</uri></binding>
   <binding name="o"><literal>C0009999</literal></binding>
  </result>
 </results>
</sparql>
"""


def test_parse_sparql_results_pure():
    pairs = parse_sparql_results(SPARQL_XML)
    # result without a literal is skipped (reference emits only uri+literal)
    assert pairs == [("http://x/Class1", "C0001234"), ("http://x/Class3", "C0009999")]
    assert parse_sparql_results("not xml <<<") == []


def test_sparql_xml_to_triples(spark, tmp_path):
    p = tmp_path / "res.xml"
    p.write_text(SPARQL_XML)
    df = sparql_xml_to_triples(spark, str(p))
    rows = {(r["subj"], r["obj"]) for r in df.collect()}
    assert rows == {("http://x/Class1", "C0001234"), ("http://x/Class3", "C0009999")}
    assert df.columns == ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "src_url"]


def test_umls_lang_codes(spark):
    # bug-compat with UMLSLanguageCode.java:6-26: CZE->cz, JPN->jp,
    # SWE->sw, KOR->kr; CHI/TUR absent from the enum -> null
    df = spark.createDataFrame(
        [("ENG",), ("FRE",), ("CZE",), ("JPN",), ("SWE",), ("KOR",), ("CHI",), ("XXX",)],
        "lat string",
    )
    got = [r["iso"] for r in df.select(umls_to_iso2(F.col("lat")).alias("iso")).collect()]
    assert got == ["en", "fr", "cz", "jp", "sw", "kr", None, None]
    # reverse accepts both legacy shortCodes and ISO-correct aliases
    df2 = spark.createDataFrame(
        [("en",), ("fr",), ("cz",), ("cs",), ("jp",), ("ja",), ("sv",), ("ko",)],
        "lang string",
    )
    got2 = [r["u"] for r in df2.select(iso2_to_umls(F.col("lang")).alias("u")).collect()]
    assert got2 == ["ENG", "FRE", "CZE", "CZE", "JPN", "JPN", "SWE", "KOR"]


def test_code_finder_chain_priority(spark):
    classes = spark.createDataFrame(
        [("c:notation",), ("c:icd",), ("c:icpc",), ("http://x#FRAG",)],
        "concept_iri string",
    )
    labels = spark.createDataFrame(
        [("c:notation", "N01", "notation", "")],
        "concept_iri string, label string, label_kind string, lang string",
    )
    code_triples = spark.createDataFrame(
        [
            ("c:icd", CODE_PREDICATES[1], "I02"),
            ("c:icpc", CODE_PREDICATES[2], "P03"),
            # notation beats icd when both present
            ("c:notation", CODE_PREDICATES[1], "SHOULD_LOSE"),
        ],
        "concept_iri string, pred string, code string",
    )
    got = {r["concept_iri"]: r["code"] for r in find_codes(classes, labels, code_triples).collect()}
    assert got == {
        "c:notation": "N01",
        "c:icd": "I02",
        "c:icpc": "P03",
        "http://x#FRAG": "FRAG",
    }


def test_cli_skosgen_end_to_end(spark, tmp_path):
    from sifr_project_java_ontology_processing_spark.cli import main

    d = tmp_path / "dict.csv"
    d.write_text("angine;J029;x;\ngrippe;J111;x;\n")
    out = tmp_path / "out"
    rc = main(["skosgen", "--dictionary", str(d), "--out", str(out), "--single-file", "-l", "fr"])
    assert rc == 0
    triples = spark.read.parquet(str(out / "triples"))
    assert triples.count() > 0
    nt = spark.read.text(str(out / "ntriples"))
    assert nt.where(F.col("value").contains("J02.9")).count() > 0


def test_tui_cascade_bug_compat_flag(spark):
    """J7 asymmetry: reference looks up mapping SOURCE classes in the
    target delegate (OntologyCUIProcessor.java:280) where the CUI path
    uses targets (:201). compat=True reproduces it; compat=False fixes it."""
    from sifr_project_java_ontology_processing_spark.operators.cascade import tui_cascade

    cascade_out = spark.createDataFrame(
        [("c:src", "X", [], "remaining_without_cui")],
        "concept_iri string, code string, cuis array<string>, cui_stage string",
    )
    mappings = spark.createDataFrame(
        [("c:src", "http://www.w3.org/2004/02/skos/core#exactMatch", "c:tgt")],
        "source_iri string, property string, target_iri string",
    )
    sem = spark.createDataFrame([], "cui string, tui string")
    target_tuis = spark.createDataFrame(
        [("c:tgt", "T100")], "concept_iri string, tui string"
    )
    compat = tui_cascade(cascade_out, mappings, sem, target_tuis=target_tuis,
                         reference_bug_compat=True).collect()[0]
    fixed = tui_cascade(cascade_out, mappings, sem, target_tuis=target_tuis,
                        reference_bug_compat=False).collect()[0]
    # compat: looks up SOURCE iri in target dim -> misses -> no TUI
    assert list(compat["tuis"]) == [] and compat["tui_stage"] == "remaining_without_tui"
    # fixed: looks up TARGET iri -> finds T100
    assert list(fixed["tuis"]) == ["T100"] and fixed["tui_stage"] == "tui_in_mappings"


def test_partitioned_graph_sink(spark, tmp_path):
    from sifr_project_java_ontology_processing_spark.sources.graph_sink import (
        write_triples,
    )
    import os

    triples = spark.createDataFrame(
        [
            ("u1", "http://purl.lirmm.fr/ontology/SIFR/mention", "c1", None, False, "u1"),
            ("c1", "http://bioportal.bioontology.org/ontologies/umls/cui", "C1", None, True, None),
        ],
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean, src_url string",
    )
    out = str(tmp_path / "t")
    write_triples(triples, out)
    parts = {d for d in os.listdir(out) if d.startswith("pred_kind=")}
    assert parts == {"pred_kind=mention", "pred_kind=cui"}
    # partition pruning: reading one kind scans only its files
    back = spark.read.parquet(out).where("pred_kind = 'mention'")
    assert back.count() == 1
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(pred_kind" in plan, plan


def test_cli_curate_end_to_end(spark, tmp_path):
    """`curate` subcommand: decisions + kept (mixed) + reason counts,
    from parquet in to parquet out — the spark-submit-able curation
    entry (round-3 addition)."""
    from sifr_project_java_ontology_processing_spark.cli import main

    out = str(tmp_path / "curated")
    sf = "/root/testdata/sf0.001"
    assert main([
        "curate", "--docs", f"{sf}/documents.parquet", "--out", out,
        "--langs", "en,fr", "--min-tokens", "5", "--mix", "src0=2.0",
    ]) == 0
    dec = spark.read.parquet(f"{out}/decisions")
    kept = spark.read.parquet(f"{out}/kept")
    reasons = {r["drop_reason"]: r["count"]
               for r in spark.read.parquet(f"{out}/reason_counts").collect()}
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert dec.count() == n_docs
    assert set(reasons) <= {"", "exact_dup", "contaminated", "quality", "lang"}
    # kept ⊆ decisions.is_kept, with src0 docs doubled by the mixture
    kept_ids = dec.where("is_kept")
    n_src0 = kept.where("source = 'src0'").count()
    base_src0 = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .join(kept_ids.select("doc_id"), "doc_id", "left_semi")
        .where("source = 'src0'").count()
    )
    assert n_src0 == 2 * base_src0
    assert kept.where("copy = 1").count() > 0


def test_cli_sparql_end_to_end(spark, tmp_path):
    from sifr_project_java_ontology_processing_spark.cli import main

    # a tiny N-Triples graph file as --triples input
    nt = tmp_path / "g.nt"
    nt.write_text(
        '<http://ex/a> <http://ex/p> "one" .\n'
        '<http://ex/a> <http://ex/q> <http://ex/b> .\n'
        '<http://ex/b> <http://ex/p> "two" .\n'
    )
    out = tmp_path / "res"
    rc = main([
        "sparql", "--triples", str(nt),
        "--query", "SELECT ?s ?v WHERE { ?s <http://ex/p> ?v } ORDER BY ?s",
        "--out", str(out),
    ])
    assert rc == 0
    got = {(r["s"], r["v"]) for r in spark.read.parquet(str(out)).collect()}
    assert got == {("http://ex/a", "one"), ("http://ex/b", "two")}

    # CONSTRUCT result round-trips through the N-Triples sink
    out2 = tmp_path / "res2"
    rc = main([
        "sparql", "--triples", str(nt),
        "--query", "CONSTRUCT { ?s <http://ex/r> ?v . } WHERE { ?s <http://ex/p> ?v }",
        "--out", str(out2), "--format", "ntriples",
    ])
    assert rc == 0
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import load_model
    back = load_model(spark, str(out2) + "/*")
    assert back.count() == 2
    assert {r["pred"] for r in back.collect()} == {"http://ex/r"}

    # exactly-one-of --query/--query-file is enforced
    assert main(["sparql", "--triples", str(nt)]) == 2


def test_cli_sparql_accepts_nquads_input(spark, tmp_path):
    """Regression: _looks_like_rdf_file omitted .nq/.xrdf, so an
    N-Quads --triples input was read as parquet and crashed even though
    load_model dispatches .nq."""
    from sifr_project_java_ontology_processing_spark.cli import (
        _looks_like_rdf_file,
        main,
    )

    assert _looks_like_rdf_file("g.nq")
    assert _looks_like_rdf_file("g.nq.gz")
    assert _looks_like_rdf_file("onto.xrdf")

    nq = tmp_path / "g.nq"
    nq.write_text(
        '<http://ex/a> <http://ex/p> "one" <http://ex/g> .\n'
        '<http://ex/b> <http://ex/p> "two" .\n'
    )
    # plain BGP sees only the DEFAULT graph (SPARQL dataset semantics)
    out = tmp_path / "res"
    rc = main([
        "sparql", "--triples", str(nq),
        "--query", "SELECT ?s ?v WHERE { ?s <http://ex/p> ?v } ORDER BY ?s",
        "--out", str(out),
    ])
    assert rc == 0
    got = {(r["s"], r["v"]) for r in spark.read.parquet(str(out)).collect()}
    assert got == {("http://ex/b", "two")}

    # the named-graph quad is reachable via FROM
    out_g = tmp_path / "res_g"
    rc = main([
        "sparql", "--triples", str(nq),
        "--query", "SELECT ?s ?v FROM <http://ex/g> "
                   "WHERE { ?s <http://ex/p> ?v }",
        "--out", str(out_g),
    ])
    assert rc == 0
    got_g = {(r["s"], r["v"]) for r in spark.read.parquet(str(out_g)).collect()}
    assert got_g == {("http://ex/a", "one")}


def test_cli_ingest_export_roundtrip(spark, tmp_path):
    """ingest: RDF file → partitioned parquet graph tables; export: the
    inverse. Triples land pred_kind-partitioned, N-Quads land
    graph-partitioned; a full circle preserves the graph exactly."""
    from sifr_project_java_ontology_processing_spark.cli import main
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        load_model,
        read_nquads,
    )

    nt = tmp_path / "g.nt"
    nt.write_text(
        '<http://ex/a> <http://ex/p> "one"@en .\n'
        '<http://ex/a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/T> .\n'
    )
    pq = tmp_path / "tbl"
    assert main(["ingest", "--in", str(nt), "--out", str(pq)]) == 0
    import os
    # pred_kind partition directories exist (pruning layout)
    assert any(d.startswith("pred_kind=") for d in os.listdir(pq))
    back = spark.read.parquet(str(pq))
    assert back.count() == 2

    out_nt = tmp_path / "export_nt"
    assert main(["export", "--triples", str(pq), "--out", str(out_nt)]) == 0
    reread = load_model(spark, str(out_nt) + "/*")
    got = {(r.subj, r.pred, r.obj, r.obj_lang, r.obj_is_literal)
           for r in reread.collect()}
    assert got == {
        ("http://ex/a", "http://ex/p", "one", "en", True),
        ("http://ex/a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://ex/T", None, False),
    }

    # quads circle: .nq ingest → graph-partitioned table → nquads export
    nq = tmp_path / "g.nq"
    nq.write_text(
        '<http://ex/a> <http://ex/p> "one" .\n'
        '<http://ex/b> <http://ex/p> "two" <http://g/one> .\n'
    )
    pq2 = tmp_path / "tbl2"
    assert main(["ingest", "--in", str(nq), "--out", str(pq2)]) == 0
    assert any(d.startswith("graph=") for d in os.listdir(pq2))
    out_nq = tmp_path / "export_nq"
    assert main(["export", "--triples", str(pq2), "--out", str(out_nq),
                 "--format", "nquads"]) == 0
    q = {(r.subj, r.obj, r.graph) for r in read_nquads(spark, str(out_nq) + "/*").collect()}
    assert q == {("http://ex/a", "one", None), ("http://ex/b", "two", "http://g/one")}


def test_cli_ingest_empty_and_export_flatten_warning(spark, tmp_path, capsys):
    from sifr_project_java_ontology_processing_spark.cli import main

    empty = tmp_path / "empty.nt"
    empty.write_text("# only a comment\n")
    out = tmp_path / "tbl_empty"
    assert main(["ingest", "--in", str(empty), "--out", str(out)]) == 0
    cap = capsys.readouterr()
    assert "ingested 0" in cap.out and "zero rows" in cap.err

    # quads table exported as ntriples warns about the flatten
    nq = tmp_path / "g.nq"
    nq.write_text('<http://ex/a> <http://ex/p> "v" <http://g/one> .\n')
    tbl = tmp_path / "tbl_q"
    assert main(["ingest", "--in", str(nq), "--out", str(tbl)]) == 0
    assert main(["export", "--triples", str(tbl), "--out",
                 str(tmp_path / "flat")]) == 0
    cap = capsys.readouterr()
    assert "flattens all named graphs" in cap.err


def test_kg_no_checkpoint_contradicts_checkpoint_dir(tmp_path):
    """ADVICE round-4: --no-checkpoint used to be silently ignored when
    --checkpoint-dir was also passed; now the combo errors up front."""
    import pytest

    from sifr_project_java_ontology_processing_spark.cli import main

    with pytest.raises(SystemExit, match="contradicts"):
        main([
            "kg",
            "--pages", "x", "--labels", "x", "--mappings", "x",
            "--umls-concepts", "x", "--umls-semtypes", "x", "--out", "x",
            "--checkpoint-dir", str(tmp_path), "--no-checkpoint",
        ])


def test_kg_fingerprint_glob_and_remote_paths(spark, tmp_path):
    """ADVICE round-4 (medium): for paths that aren't locally statable
    (globs, remote URIs) the fingerprint must reflect CONTENT via the
    Hadoop FileSystem — or signal None for a fresh run id — never
    degrade to a path-string-only hash that resumes stale stages."""
    import argparse

    from sifr_project_java_ontology_processing_spark.cli import _kg_run_fingerprint

    d = tmp_path / "pages"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"aaaa")

    def mkargs(pages):
        return argparse.Namespace(
            pages=pages, labels=str(d), mappings=str(d),
            umls_concepts=str(d), umls_semtypes=str(d),
            disambiguate=False, match=False, score_links=False,
            no_broadcast_labels=False,
        )

    glob_path = str(tmp_path / "pag*")  # not isfile/isdir → Hadoop glob
    fp1 = _kg_run_fingerprint(mkargs(glob_path), spark)
    assert fp1 is not None and fp1.startswith("auto-")
    # same content → same id (crash-resume works through the glob)
    assert _kg_run_fingerprint(mkargs(glob_path), spark) == fp1
    # content change behind the same glob → different id (no stale resume)
    import os
    import time

    (d / "part-1.parquet").write_bytes(b"bbbbbb")
    fp2 = _kg_run_fingerprint(mkargs(glob_path), spark)
    assert fp2 != fp1
    # unresolvable path (and no spark to ask) → None, caller goes fresh
    assert _kg_run_fingerprint(mkargs(str(tmp_path / "nope*")), spark) is None
    assert _kg_run_fingerprint(mkargs(glob_path), None) is None
