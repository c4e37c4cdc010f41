"""Property-based tests (hypothesis) for the pure-Python hot paths —
no SparkSession needed, so these run fast and fuzz wide."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sifr_project_java_ontology_processing_spark.operators.extraction import extract_text
from sifr_project_java_ontology_processing_spark.operators.mentions import (
    _scan_text,
    build_label_trie,
)
from sifr_project_java_ontology_processing_spark.sources.sparql_xml import (
    parse_sparql_results,
)

from .oracle import mentions_oracle


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_text_never_raises(data):
    out = extract_text(data)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048))
def test_extract_text_utf8_html_never_raises(s):
    out = extract_text(s.encode("utf-8", errors="ignore"))
    assert isinstance(out, str)


_WORDS = st.sampled_from(
    ["aorta", "acute", "sepsis", "the", "with", "x1", "C1234567", "...", "a-b", "é"]
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_WORDS, max_size=40))
def test_scan_matches_independent_oracle(words):
    text = " ".join(words)
    labels = [
        ("c:aorta", "aorta", "pref", "en"),
        ("c:acute-aorta", "acute aorta", "alt", "en"),
        ("c:sepsis", "sepsis", "pref", "en"),
        ("c:cui", "C1234567", "alt", "en"),  # excluded by CUI-shape rule
    ]
    trie = build_label_trie(labels)
    got = [h[3] for h in _scan_text(text, trie)]
    want = [c for (_i, c, _l) in mentions_oracle(text, labels)]
    assert got == want, (text, got, want)


@settings(max_examples=100, deadline=None)
@given(st.lists(_WORDS, max_size=30))
def test_scan_spans_slice_back_to_surface(words):
    text = "  ".join(words)
    trie = build_label_trie([("c", "aorta", "pref", "en")])
    for start, end, surface, _c, _k in _scan_text(text, trie):
        assert text[start:end] == surface
        assert re.sub(r"^[^\w]+|[^\w]+$", "", surface.lower()) == "aorta"


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1024))
def test_sparql_parse_never_raises(s):
    out = parse_sparql_results(s)
    assert isinstance(out, list)


# --- full-Turtle parser properties (round 3) -----------------------------

_LIT = st.text(max_size=60)
_LANG = st.sampled_from([None, "en", "fr", "zh-Hans"])
_LOCAL = st.from_regex(r"[A-Za-z0-9_][A-Za-z0-9_-]{0,12}", fullmatch=True)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_LOCAL, _LOCAL, _LIT, _LANG), min_size=1, max_size=12))
def test_turtle_serialize_parse_roundtrip(rows):
    """NT-escape ∘ ttl-compact ∘ full-parse is the identity on
    arbitrary literal content (quotes, backslashes, newlines, unicode —
    whatever hypothesis throws)."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        parse_turtle_text,
    )

    def esc(s: str) -> str:
        out = s.replace("\\", "\\\\").replace('"', '\\"')
        return out.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

    header = "@prefix ex: <http://e/> .\n"
    doc_lines, want = [], set()
    for s_local, p_local, lit, lang in rows:
        tag = f"@{lang}" if lang else ""
        doc_lines.append(f'ex:{s_local} ex:{p_local} "{esc(lit)}"{tag} .')
        want.add((f"http://e/{s_local}", f"http://e/{p_local}", lit, lang, True))
    got = {
        (s, p, o, lg, il)
        for s, p, o, lg, il, _src in parse_turtle_text(header + "\n".join(doc_lines), None)
    }
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=300))
def test_turtle_parser_never_hangs_or_segfaults(s):
    """Arbitrary garbage either parses or raises ValueError — never
    an unbounded loop or any other exception type (the strict-ingestion
    contract)."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        parse_turtle_text,
    )

    try:
        parse_turtle_text(s, "fuzz")
    except ValueError:
        pass


# XML 1.0 cannot carry most control chars even escaped; the reader's
# contract starts at well-formed documents. Whitespace-only content
# strips to '' by design (XML pretty-printing), asserted via .strip().
_XML_LIT = st.text(
    alphabet=st.characters(blacklist_categories=("Cc", "Cs"), min_codepoint=0x20),
    max_size=60,
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(_LOCAL, st.sampled_from(["pref", "alt"]), _XML_LIT, _LANG),
        min_size=1,
        max_size=10,
    )
)
def test_rdfxml_parse_roundtrip_literals(rows):
    """XML-escape ∘ SAX-parse is the identity (modulo the documented
    whitespace strip) on arbitrary literal property values (incl.
    xml:lang inheritance)."""
    from xml.sax.saxutils import escape

    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        _parse_rdfxml_bytes,
    )

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    body, want = [], []
    for i, (local, _kind, lit, lang) in enumerate(rows):
        lang_attr = f' xml:lang="{lang}"' if lang else ""
        body.append(
            f'<rdf:Description rdf:about="http://e/{local}{i}">'
            f"<x:p{lang_attr}>{escape(lit)}</x:p></rdf:Description>"
        )
        want.append((f"http://e/{local}{i}", "http://x/p", lit.strip(), lang, True))
    doc = (
        f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:x="http://x/">'
        + "".join(body)
        + "</rdf:RDF>"
    )
    got = [(s, p, o, lg, il) for s, p, o, lg, il, _src in _parse_rdfxml_bytes(doc.encode(), None)]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_bpe_encode_roundtrip_any_text(s):
    """Byte-level BPE is lossless for ARBITRARY unicode: hex-joining
    the encoded symbols reconstructs the exact UTF-8 bytes of the
    pre-token stream, and every token is in the vocab id table."""
    from sifr_project_java_ontology_processing_spark.functions.bpe import (
        bpe_encode,
        load_fixture_merges,
        pretokenize,
        token_id_table,
    )

    merges = load_fixture_merges()
    toks = bpe_encode(s, merges)
    assert bytes.fromhex("".join(toks)).decode("utf-8") == "".join(pretokenize(s))
    vocab = token_id_table(merges)
    assert all(t in vocab for t in toks)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_media_header_parsers_never_raise(data):
    """image_dims / mp4_info are fed crawl bytes — arbitrary binary
    must produce a clean result-or-None, never an exception."""
    from sifr_project_java_ontology_processing_spark.operators.multimodal import (
        image_dims,
        mp4_info,
    )

    for fn in (image_dims, mp4_info):
        out = fn(data)
        assert out is None or isinstance(out, tuple)
    # and with plausible magic prefixes grafted on
    for magic in (b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"GIF89a",
                  b"\x00\x00\x00\x14ftypisom"):
        for fn in (image_dims, mp4_info):
            out = fn(magic + data)
            assert out is None or isinstance(out, tuple)


# ---------------------------------------------------------------------------
# N-Quads line grammar (pure-regex core of sources/rdf_io.parse_nquads_lines)
# ---------------------------------------------------------------------------

_NQ_LIT = st.text(max_size=60)
_GRAPHS = st.sampled_from([None, "http://g/one", "_:g1"])


def _nq_parse_line(line: str):
    """Pure-Python replica of the parse_nquads_lines column logic (same
    regexes), so the grammar can be fuzzed without a SparkSession."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        _NQ_LINE_RX,
        _NQ_TERM_RX,
        _NT_LIT_RX,
        _decode_nt_string,
    )

    m = re.match(_NQ_LINE_RX, line)
    if not m:
        return None
    subj_raw, pred, obj_raw, graph_raw = m.group(1), m.group(2), m.group(3), m.group(4)
    is_lit = obj_raw.startswith('"')
    if is_lit:
        lm = re.match(_NT_LIT_RX, obj_raw)
        if not lm:
            return None
        obj = _decode_nt_string(lm.group(1))
        lang = lm.group(2) or None
    else:
        if not re.match(_NQ_TERM_RX, obj_raw):
            return None
        obj = obj_raw[1:-1] if obj_raw.startswith("<") else obj_raw
        lang = None
    subj = subj_raw[1:-1] if subj_raw.startswith("<") else subj_raw
    graph = None
    if graph_raw:
        graph = graph_raw[1:-1] if graph_raw.startswith("<") else graph_raw
    return (subj, pred, obj, lang, is_lit, graph)


def _nq_esc(s: str) -> str:
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    return out.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")


@settings(max_examples=300, deadline=None)
@given(_NQ_LIT, _LANG, _GRAPHS)
def test_nquads_literal_roundtrip_any_content(lit, lang, graph):
    """render ∘ parse is the identity for arbitrary literal content —
    including literals ending in '_:'-like or '<x>'-like tokens, which
    must never leak into the graph slot."""
    tag = f"@{lang}" if lang else ""
    gterm = "" if graph is None else (
        f" <{graph}>" if not graph.startswith("_:") else f" {graph}"
    )
    line = f'<http://s> <http://p> "{_nq_esc(lit)}"{tag}{gterm} .'
    got = _nq_parse_line(line)
    assert got == ("http://s", "http://p", lit, lang, True, graph), (line, got)


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(["<http://o>", "_:b9"]), _GRAPHS)
def test_nquads_iri_object_roundtrip(obj_term, graph):
    gterm = "" if graph is None else (
        f" <{graph}>" if not graph.startswith("_:") else f" {graph}"
    )
    line = f"<http://s> <http://p> {obj_term}{gterm} ."
    want_obj = obj_term[1:-1] if obj_term.startswith("<") else obj_term
    got = _nq_parse_line(line)
    assert got == ("http://s", "http://p", want_obj, None, False, graph), (line, got)
