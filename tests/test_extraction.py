"""Byte-identical extraction invariant (BASELINE.json input_hint):
extracted text must equal the golden ``text`` column per url, exactly."""

from __future__ import annotations

from sifr_project_java_ontology_processing_spark.operators.extraction import (
    extract_pages,
    extract_text,
    verify_extraction,
)


def test_extract_text_pure_function():
    html = (
        b"<html><head><title>T | h</title><script>junk();</script></head>"
        b"<body><nav><a href='/'>Home</a></nav>"
        b"<main><article><h1>Title</h1><p>para one</p><p>para two</p></article></main>"
        b"<div class='ads'>BUY</div><footer>foot</footer></body></html>"
    )
    assert extract_text(html) == "Title\npara one\npara two"


def test_void_elements_in_skipped_containers():
    """Round-2 ADVICE regression: HTML5 void elements (<img>, <br>, …)
    have no end tag; inside a skipped container they must not leave
    _skip_depth stuck above 0 (which silently dropped all later text)."""
    assert (
        extract_text(b"<main><p>hello</p><nav><img></nav><p>world</p></main>")
        == "hello\nworld"
    )
    # void element that is itself boilerplate: skip it alone
    assert extract_text(b"<body><p>a</p><img class='ad'><p>b</p></body>") == "a\nb"
    # self-closing void inside a skipped block must not decrement depth
    assert extract_text(b"<body><nav><img/><span>junk</span></nav><p>x</p></body>") == "x"
    # <br>/<hr>/<input> piles in nav+footer, content untouched
    assert (
        extract_text(
            b"<body><nav><br><input><hr></nav><article><p>keep me</p></article>"
            b"<footer><img><br>foot</footer></body>"
        )
        == "keep me"
    )


def test_extract_text_edge_cases():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"not html at all") == ""
    # body fallback when no article/main
    assert extract_text(b"<body><p>solo</p></body>") == "solo"


def test_byte_identical_invariant(spark, kg_tables):
    mismatches = verify_extraction(kg_tables["pages"])
    rows = mismatches.collect()
    assert rows == [], f"extraction mismatch on {len(rows)} urls, e.g. {rows[:2]}"


def test_extraction_is_map_only(spark, kg_tables):
    """Plan check: no Exchange (shuffle) in the extraction stage."""
    plan = extract_pages(kg_tables["pages"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_extraction_deterministic(spark, kg_tables):
    a = sorted(extract_pages(kg_tables["pages"]).select("url", "extracted_text").collect())
    b = sorted(extract_pages(kg_tables["pages"]).select("url", "extracted_text").collect())
    assert a == b


def test_unclosed_tags_inside_skipped_subtree_do_not_swallow_page():
    """Regression: <li>/<p> left unclosed inside a skipped <nav> (or any
    boilerplate container) must not leave the extractor stuck in skip
    mode — html.parser does not auto-close them, so a naive depth
    counter never returns to zero and the whole page after the first
    malformed nav/footer vanished."""
    html = (
        b"<body><nav><ul><li>Home<li>About</ul></nav>"
        b"<main><article><p>content</p></article></main></body>"
    )
    assert extract_text(html) == "content"
    # same failure shape via a boiler-attrs div
    html2 = (
        b"<body><div class='ad-banner'><p>buy now<p>cheap</div>"
        b"<p>real text</p></body>"
    )
    assert extract_text(html2) == "real text"
    # nested same-name skip containers still close at the right level
    html3 = (
        b"<body><nav>outer<nav>inner</nav>still boiler</nav>"
        b"<p>kept</p></body>"
    )
    assert extract_text(html3) == "kept"
