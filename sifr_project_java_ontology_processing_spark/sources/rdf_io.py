"""RDF file ingestion (SURVEY.md S1/S12 input half).

The reference's first step loads ontology files through Jena —
RDF/XML, Turtle, and .gz/.bz2-compressed variants
(utils/OntologyLoader.java:41-92). This module closes the engine's
input loop: N-Triples and a line-oriented Turtle subset parse into the
TRIPLES-schema DataFrame with pure Catalyst regex expressions over
``spark.read.text`` — distributed, splittable (per-line format, no
cross-line state), and compression-transparent (Spark's text source
decodes .gz/.bz2 by extension, mirroring OntologyLoader's
getFileModelReader:83-92).

Format coverage, stated honestly:
  * N-Triples: full (IRI / blank-node subjects, IRI predicates,
    IRI / blank / literal objects with @lang or ^^datatype, standard
    string escapes, comments, blank lines).
  * Turtle, two readers:
      - ``read_turtle`` (the default for .ttl): a real streaming
        tokenizer + recursive-descent parser per file inside
        ``mapInPandas`` — multi-line statements, ``;``/``,``
        continuations, ``[ ... ]`` blank-node property lists,
        ``( ... )`` collections, long/short single/double-quoted
        strings, @lang, ^^datatype (stripped, P5), numeric/boolean
        shorthand, @prefix/@base and SPARQL-style PREFIX/BASE.
        Parallel ACROSS files (one ontology = one task — dim-load
        cost class). Relative-IRI resolution is simple concatenation
        against the @base (no dot-segment normalization).
      - ``read_turtle_lines``: the line-oriented subset (one
        statement per line), kept as the WITHIN-file splittable scale
        path for machine-generated exports (it reads a single 100 GB
        dictionary file in parallel; the real parser cannot).
  * RDF/XML (the reference's DEFAULT format): not line-splittable, so
    it parallelizes ACROSS FILES instead — ``binaryFile`` source → one
    streaming SAX parse per file inside ``mapInPandas`` (the same
    pattern as sources/sparql_xml.py). Coverage: rdf:Description and
    typed node elements, rdf:about/ID/nodeID, nested node elements,
    rdf:resource, property attributes, xml:lang (inherited),
    rdf:datatype (stripped, P5 semantics), and rdf:parseType —
    "Resource" (nested blank node), "Collection" (rdf:first/rest/nil
    chain), "Literal"/other (captured as an XML literal; since expat
    never reports namespace prefixes, serialized elements re-declare
    their namespace as the default namespace — same infoset,
    normalized spelling).

``strict=True`` (default) raises if any non-comment line fails to
parse — silent row loss is how ingestion bugs hide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# subject: <iri> or _:blank ; predicate: <iri> ; object: rest
_NT_LINE_RX = r"^[ \t]*(<[^>]*>|_:[^ \t]+)[ \t]+<([^>]*)>[ \t]+(.*?)[ \t]*\.[ \t]*$"
# literal object: "..." with escaped chars, then optional @lang / ^^<dt>
# (group 3 captures the datatype IRI for keep_datatype readers)
_NT_LIT_RX = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$'
# a bare (non-literal) term: IRI or blank node — shared by the strict
# N-Triples object check and the N-Quads graph-slot check
_NQ_TERM_RX = r"^(<[^>]*>|_:[^ \t]+)$"

import re as _re

_NT_ESC_RX = _re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_NT_ESC_MAP = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
               '"': '"', "'": "'", "\\": "\\"}


def _decode_nt_string(s: str) -> str:
    """Full N-Triples string unescape, single pass: the five char
    escapes PLUS \\uXXXX / \\UXXXXXXXX numeric escapes — Jena (the
    reference's serializer) ASCII-escapes every non-ASCII char, so a
    regex chain that skips \\u silently corrupts accented labels."""
    def sub(m) -> str:
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _NT_ESC_MAP.get(g, "\\" + g)

    return _NT_ESC_RX.sub(sub, s)


_unescape_udf = None


def _unescape_literal(col: Column) -> Column:
    """Inverse of rdf_sink._escape_literal incl. numeric escapes —
    an Arrow-batched pandas UDF (a single-pass decoder has no faithful
    regexp_replace chain: \\uXXXX → chr needs real code). RDF files are
    ontology-dimension inputs, so the Python batch cost is a dim-load
    cost, never the fact path."""
    global _unescape_udf
    if _unescape_udf is None:
        from pyspark.sql.functions import pandas_udf

        def _batch(s):  # pd.Series -> pd.Series (scalar pandas UDF)
            return s.map(lambda v: _decode_nt_string(v) if v is not None else None)

        _unescape_udf = pandas_udf(_batch, "string")
    return _unescape_udf(col)


def _strip_angle(col: Column) -> Column:
    return F.regexp_replace(col, r"^<(.*)>$", r"$1")


def parse_ntriples_lines(
    lines: DataFrame, line_col: str = "value", keep_datatype: bool = False
) -> DataFrame:
    """Lines → TRIPLES-schema rows. Pure expressions (regexp_extract +
    conditional unescape); comments/blank lines dropped. Unparseable
    non-comment lines come out with subj NULL — callers (read_ntriples)
    decide whether that is an error.

    ``keep_datatype`` appends an ``obj_datatype`` column (the
    ``^^<dt>`` IRI; NULL for untyped literals and non-literals) instead
    of the default P5-stripped shape — the opt-in carrier for SPARQL
    typed-numeric ordering (plans/bgp.py ``typed_numerics``). Default
    stays the 6-column TRIPLES schema every other consumer expects."""
    line = F.col(line_col)
    content = lines.where(
        (F.trim(line) != "") & ~F.trim(line).startswith("#")
    )
    subj_raw = F.regexp_extract(line, _NT_LINE_RX, 1)
    pred = F.regexp_extract(line, _NT_LINE_RX, 2)
    obj_raw = F.regexp_extract(line, _NT_LINE_RX, 3)
    is_lit = obj_raw.startswith('"')
    # a quoted object that fails the literal grammar is a parse error,
    # not an empty literal — mark subj null so strict mode catches it;
    # likewise a bare object that is neither <iri> nor _:bnode must not
    # flow through as a fake IRI (the N-Quads reader already rejects
    # this via _NQ_TERM_RX — the strict contracts must agree)
    bad = (
        (subj_raw == "")
        | (is_lit & ~obj_raw.rlike(_NT_LIT_RX))
        | (~is_lit & ~obj_raw.rlike(_NQ_TERM_RX))
    )
    lit_body = F.regexp_extract(obj_raw, _NT_LIT_RX, 1)
    lit_lang = F.regexp_extract(obj_raw, _NT_LIT_RX, 2)
    cols = [
        F.when(bad, None).otherwise(_strip_angle(subj_raw)).alias("subj"),
        F.when(bad, None).otherwise(pred).alias("pred"),
        F.when(is_lit, _unescape_literal(lit_body))
        .otherwise(_strip_angle(obj_raw))
        .alias("obj"),
        F.when(is_lit & (lit_lang != ""), lit_lang).alias("obj_lang"),
        is_lit.alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
    ]
    if keep_datatype:
        lit_dt = F.regexp_extract(obj_raw, _NT_LIT_RX, 3)
        cols.append(
            F.when(is_lit & (lit_dt != ""), lit_dt).alias("obj_datatype")
        )
    parsed = content.select(*cols, line.alias("_raw"))
    return parsed


def read_ntriples(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    keep_datatype: bool = False,
) -> DataFrame:
    """N-Triples file(s) → TRIPLES DataFrame. ``path`` may be a file,
    directory, or glob; .gz/.bz2 decode transparently
    (OntologyLoader.java:83-92 parity). With ``strict`` (default) an
    unparseable non-comment line raises instead of vanishing.
    ``keep_datatype``: see parse_ntriples_lines."""
    parsed = parse_ntriples_lines(
        spark.read.text(path), keep_datatype=keep_datatype
    )
    if strict:
        bad = parsed.where(F.col("subj").isNull()).select("_raw").limit(5)
        bad_rows = bad.collect()
        if bad_rows:
            raise ValueError(
                f"unparseable N-Triples line(s) in {path}: "
                + "; ".join(repr(r["_raw"]) for r in bad_rows)
            )
        return parsed.drop("_raw")
    return parsed.where(F.col("subj").isNotNull()).drop("_raw")


# --------------------------------------------------------------------------
# Line-oriented Turtle subset
# --------------------------------------------------------------------------

_PREFIX_RX = r"^\s*@?[Pp][Rr][Ee][Ff][Ii][Xx]\s+([A-Za-z][\w-]*)?:\s*<([^>]*)>\s*\.?\s*$"
_TTL_TERM = r"(<[^>]*>|[A-Za-z][\w-]*:[\w.-]+|a|_:[^ \t]+)"
_TTL_LINE_RX = (
    rf"^[ \t]*{_TTL_TERM}[ \t]+{_TTL_TERM}[ \t]+(.*?)[ \t]*\.[ \t]*$"
)

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _expand_term(col: Column, prefixes: dict[str, str]) -> Column:
    """``p:local`` → full IRI via the file's @prefix table; ``a`` →
    rdf:type; ``<iri>`` stripped. Prefix table is tiny (a handful of
    declarations) so a when-chain expression beats a join."""
    out = F.when(col == "a", F.lit(_RDF_TYPE))
    for p, iri in prefixes.items():
        out = out.when(
            col.startswith(f"{p}:") & ~col.startswith("<"),
            F.concat(F.lit(iri), F.substring(col, len(p) + 2, 1_000_000)),
        )
    return out.otherwise(_strip_angle(col))


def read_turtle_lines(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """Line-oriented Turtle subset → TRIPLES DataFrame (see module
    docstring for the exact subset). @prefix declarations are collected
    to the driver first — they are a handful of header lines, the same
    cost class as reading a schema."""
    raw = spark.read.text(path)
    prefix_rows = (
        raw.where(F.col("value").rlike(_PREFIX_RX))
        .select(
            F.regexp_extract("value", _PREFIX_RX, 1).alias("p"),
            F.regexp_extract("value", _PREFIX_RX, 2).alias("iri"),
        )
        .collect()
    )
    prefixes = {r["p"]: r["iri"] for r in prefix_rows}

    line = F.col("value")
    content = raw.where(
        (F.trim(line) != "")
        & ~F.trim(line).startswith("#")
        & ~line.rlike(_PREFIX_RX)
    )
    subj_t = F.regexp_extract(line, _TTL_LINE_RX, 1)
    pred_t = F.regexp_extract(line, _TTL_LINE_RX, 2)
    obj_raw = F.regexp_extract(line, _TTL_LINE_RX, 3)
    is_str_lit = obj_raw.startswith('"')
    # Turtle's shorthand literals: numbers and booleans are literals,
    # not IRIs — round-2 review caught them falling through as fake IRIs
    is_shorthand_lit = obj_raw.rlike(r"^[+-]?(\d|\.\d)") | obj_raw.isin("true", "false")
    is_lit = is_str_lit | is_shorthand_lit
    # bare objects must be one of the Turtle term forms the subset
    # knows (<iri>, _:bnode, prefixed name, 'a') — garbage must raise
    # under strict, not land as a fake IRI
    _ttl_obj_rx = r"^(<[^>]*>|_:[^ \t]+|[A-Za-z][\w-]*:[\w.-]+|a)$"
    bad = (
        (subj_t == "")
        | (is_str_lit & ~obj_raw.rlike(_NT_LIT_RX))
        | (~is_lit & ~obj_raw.rlike(_ttl_obj_rx))
    )
    lit_body = F.regexp_extract(obj_raw, _NT_LIT_RX, 1)
    lit_lang = F.regexp_extract(obj_raw, _NT_LIT_RX, 2)
    parsed = content.select(
        F.when(bad, None).otherwise(_expand_term(subj_t, prefixes)).alias("subj"),
        F.when(bad, None).otherwise(_expand_term(pred_t, prefixes)).alias("pred"),
        F.when(is_str_lit, _unescape_literal(lit_body))
        .when(is_shorthand_lit, obj_raw)
        .when(obj_raw.rlike(r"^<|^_:|^[A-Za-z][\w-]*:[\w.-]+$|^a$"), _expand_term(obj_raw, prefixes))
        .otherwise(obj_raw)
        .alias("obj"),
        F.when(is_str_lit & (lit_lang != ""), lit_lang).alias("obj_lang"),
        is_lit.alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
        line.alias("_raw"),
    )
    if strict:
        bad_rows = parsed.where(F.col("subj").isNull()).select("_raw").limit(5).collect()
        if bad_rows:
            raise ValueError(
                f"unparseable Turtle line(s) in {path} (line-oriented subset): "
                + "; ".join(repr(r["_raw"]) for r in bad_rows)
            )
        return parsed.drop("_raw")
    return parsed.where(F.col("subj").isNotNull()).drop("_raw")


# --------------------------------------------------------------------------
# Full Turtle (streaming tokenizer + recursive descent, per file)
# --------------------------------------------------------------------------
# The reference reads .ttl through Jena's Turtle parser
# (utils/OntologyLoader.java:41-71 selects the TTL reader by filename);
# this is an original PySpark-era equivalent: one parse per file on an
# executor, so a directory of ontologies loads in parallel.

_TTL_TOKEN_SPECS = [
    ("ws", _re.compile(r"\s+")),
    ("comment", _re.compile(r"#[^\n]*")),
    ("iriref", _re.compile(r"<[^<>\"{}|^`\\\x00-\x20]*>")),
    ("string", _re.compile(
        r'"""(?:[^"\\]|\\.|"(?!""))*"""'
        r"|'''(?:[^'\\]|\\.|'(?!''))*'''"
        r'|"(?:[^"\\\n\r]|\\.)*"'
        r"|'(?:[^'\\\n\r]|\\.)*'"
    )),
    ("langtag", _re.compile(r"@[A-Za-z]+(?:-[A-Za-z0-9]+)*")),
    ("dtype", _re.compile(r"\^\^")),
    ("blank", _re.compile(r"_:[A-Za-z0-9_](?:[\w.-]*[\w-])?")),
    # decimal REQUIRES digits after the dot (Turtle grammar) so '1.'
    # lexes as integer '1' + statement-terminating '.'
    ("number", _re.compile(
        r"[+-]?(?:\d*\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)"
    )),
    # PNAME_LN / PNAME_NS (approximate PN_CHARS; '%' escapes kept
    # as-is). The local part must not END with '.' — 'ex:foo.' lexes
    # as 'ex:foo' + '.'
    ("pname", _re.compile(
        r"(?:[A-Za-z][\w.-]*)?:"
        r"(?:(?:[\w:.-]|%[0-9A-Fa-f]{2}|\\[~.!$&'()*+,;=/?#@%_-])*"
        r"(?:[\w:-]|%[0-9A-Fa-f]{2}|\\[~.!$&'()*+,;=/?#@%_-]))?"
    )),
    ("word", _re.compile(r"[A-Za-z][A-Za-z_]*")),  # a / true / false / BASE ...
    ("punct", _re.compile(r"[.;,\[\]()]")),
]


def _ttl_tokens(text: str) -> list[tuple[str, str]]:
    """Ordered-alternative scanner → [(kind, lexeme)]; raises on any
    character no alternative matches (position + context in the
    message — silent skips are how parser bugs hide)."""
    out: list[tuple[str, str]] = []
    pos, n = 0, len(text)
    while pos < n:
        for kind, rx in _TTL_TOKEN_SPECS:
            m = rx.match(text, pos)
            if m and m.end() > pos:
                if kind not in ("ws", "comment"):
                    out.append((kind, m.group(0)))
                pos = m.end()
                break
        else:
            raise ValueError(
                f"Turtle tokenizer: unexpected char {text[pos]!r} at "
                f"offset {pos}: ...{text[max(0, pos - 30):pos + 10]!r}..."
            )
    return out


class _TtlParser:
    """Recursive-descent Turtle parser over ``_ttl_tokens`` output.
    Emits TRIPLES-schema rows; blank nodes are file-scoped (same rule
    as the RDF/XML reader)."""

    def __init__(self, text: str, src: str | None) -> None:
        self.toks = _ttl_tokens(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.scope = (
            __import__("hashlib").md5(src.encode()).hexdigest()[:8] if src else ""
        )
        self.src = src
        self.blank_n = 0
        self.rows: list[tuple] = []

    # -- token helpers ---------------------------------------------------
    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.pos += 1
        return t

    def _expect(self, kind: str, value: str | None = None):
        k, v = self._next()
        if k != kind or (value is not None and v != value):
            raise ValueError(
                f"Turtle parse error in {self.src}: expected "
                f"{value or kind}, got {v!r} (token #{self.pos - 1})"
            )
        return v

    # -- term builders ---------------------------------------------------
    def _resolve_iri(self, raw: str) -> str:
        iri = _decode_nt_string(raw[1:-1])
        if self.base and not _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return self.base + iri
        return iri

    def _expand_pname(self, pname: str) -> str:
        p, _, local = pname.partition(":")
        if p not in self.prefixes:
            raise ValueError(
                f"Turtle parse error in {self.src}: undeclared prefix "
                f"{p!r}: in {pname!r}"
            )
        return self.prefixes[p] + local.replace("\\", "")

    def _new_blank(self) -> str:
        self.blank_n += 1
        return f"_:{self.scope}tb{self.blank_n}"

    # -- grammar ---------------------------------------------------------
    def parse(self) -> list[tuple]:
        while self._peek()[0] is not None:
            k, v = self._peek()
            if (k == "langtag" and v.lower() in ("@prefix", "@base")) or (
                k == "word" and v.upper() in ("PREFIX", "BASE")
            ):
                self._directive()
            else:
                self._triples()
                self._expect("punct", ".")
        return self.rows

    def _directive(self) -> None:
        _k, v = self._next()
        sparql_style = not v.startswith("@")
        if v.lower().lstrip("@").startswith("prefix") or v.upper() == "PREFIX":
            pk, pv = self._next()
            if pk != "pname" or not pv.endswith(":"):
                raise ValueError(
                    f"Turtle parse error in {self.src}: bad prefix name {pv!r}"
                )
            iri = self._resolve_iri(self._expect("iriref"))
            self.prefixes[pv[:-1]] = iri
        else:  # base
            self.base = _decode_nt_string(self._expect("iriref")[1:-1])
        if not sparql_style:
            self._expect("punct", ".")

    def _triples(self) -> None:
        k, v = self._peek()
        if k == "punct" and v == "[":
            subj = self._blank_node_property_list()
            # trailing predicateObjectList is optional for [ ... ] subjects
            if self._peek() != ("punct", "."):
                self._predicate_object_list(subj)
        elif k == "punct" and v == "(":
            subj = self._collection()
            self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)

    def _subject(self) -> str:
        k, v = self._next()
        if k == "iriref":
            return self._resolve_iri(v)
        if k == "pname":
            return self._expand_pname(v)
        if k == "blank":
            return f"_:{self.scope}{v[2:]}"
        raise ValueError(
            f"Turtle parse error in {self.src}: bad subject {v!r}"
        )

    def _verb(self) -> str:
        k, v = self._next()
        if k == "word" and v == "a":
            return _RDF_TYPE
        if k == "iriref":
            return self._resolve_iri(v)
        if k == "pname":
            return self._expand_pname(v)
        raise ValueError(f"Turtle parse error in {self.src}: bad verb {v!r}")

    def _predicate_object_list(self, subj: str) -> None:
        while True:
            pred = self._verb()
            self._object_list(subj, pred)
            if self._peek() == ("punct", ";"):
                self._next()
                # '; .'  and  ';;' are legal (empty continuations)
                while self._peek() == ("punct", ";"):
                    self._next()
                if self._peek() in (("punct", "."), ("punct", "]")):
                    return
                continue
            return

    def _object_list(self, subj: str, pred: str) -> None:
        while True:
            self._object(subj, pred)
            if self._peek() == ("punct", ","):
                self._next()
                continue
            return

    def _object(self, subj: str, pred: str) -> None:
        k, v = self._peek()
        if k == "punct" and v == "[":
            self.rows.append(
                (subj, pred, self._blank_node_property_list(), None, False, self.src)
            )
            return
        if k == "punct" and v == "(":
            self.rows.append((subj, pred, self._collection(), None, False, self.src))
            return
        self._next()
        if k == "iriref":
            self.rows.append(
                (subj, pred, self._resolve_iri(v), None, False, self.src)
            )
        elif k == "pname":
            self.rows.append(
                (subj, pred, self._expand_pname(v), None, False, self.src)
            )
        elif k == "blank":
            self.rows.append(
                (subj, pred, f"_:{self.scope}{v[2:]}", None, False, self.src)
            )
        elif k == "string":
            body = v[3:-3] if v[:3] in ('"""', "'''") else v[1:-1]
            text = _decode_nt_string(body)
            lang = None
            nk, nv = self._peek()
            if nk == "langtag":
                self._next()
                lang = nv[1:]
            elif nk == "dtype":
                self._next()  # datatype IRI stripped — P5 semantics
                dk, dv = self._next()
                if dk not in ("iriref", "pname"):
                    raise ValueError(
                        f"Turtle parse error in {self.src}: bad datatype {dv!r}"
                    )
            self.rows.append((subj, pred, text, lang, True, self.src))
        elif k == "number" or (k == "word" and v in ("true", "false")):
            self.rows.append((subj, pred, v, None, True, self.src))
        else:
            raise ValueError(
                f"Turtle parse error in {self.src}: bad object {v!r}"
            )

    def _blank_node_property_list(self) -> str:
        self._expect("punct", "[")
        blank = self._new_blank()
        if self._peek() != ("punct", "]"):
            self._predicate_object_list(blank)
        self._expect("punct", "]")
        return blank

    def _collection(self) -> str:
        self._expect("punct", "(")
        # items are gathered via a sentinel (subject, predicate): nested
        # bnodes/collections inside an item append their OWN rows too,
        # which must be kept — only the sentinel rows are rewritten into
        # the rdf:first/rest chain
        sink = self._new_blank()
        sentinel = "urn:x-collect:item"
        mark = len(self.rows)
        while self._peek() != ("punct", ")"):
            self._object(sink, sentinel)
        self._expect("punct", ")")
        emitted = self.rows[mark:]
        del self.rows[mark:]
        item_rows = [r for r in emitted if r[0] == sink and r[1] == sentinel]
        self.rows.extend(
            r for r in emitted if not (r[0] == sink and r[1] == sentinel)
        )
        nil = f"{_RDF_NS}nil"
        if not item_rows:
            return nil
        cells = [self._new_blank() for _ in item_rows]
        for i, (cell, item) in enumerate(zip(cells, item_rows)):
            self.rows.append(
                (cell, f"{_RDF_NS}first", item[2], item[3], item[4], self.src)
            )
            rest = cells[i + 1] if i + 1 < len(cells) else nil
            self.rows.append((cell, f"{_RDF_NS}rest", rest, None, False, self.src))
        return cells[0]


def parse_turtle_text(text: str, src: str | None = None) -> list[tuple]:
    """Full-Turtle document → TRIPLES rows. Pure function (testable
    without Spark); runs on executors inside read_turtle's mapInPandas."""
    return _TtlParser(text, src).parse()


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Full Turtle file(s) → TRIPLES DataFrame. Parallel ACROSS files
    (binaryFile source, one parse per file on the executor); .gz/.bz2
    decompressed in the parser task. Use ``read_turtle_lines`` instead
    when ONE machine-generated file is huge and line-oriented — that
    reader splits within the file."""
    from collections.abc import Iterator

    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bz2 as _bz2
        import gzip as _gzip

        cols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "src_url"]
        for pdf in it:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    data = _gzip.decompress(data)
                elif p.endswith(".bz2"):
                    data = _bz2.decompress(data)
                rows = parse_turtle_text(data.decode("utf-8"), p)
                yield pd.DataFrame(rows, columns=cols)

    schema = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string"
    )
    return files.mapInPandas(_parse, schema=schema)


# --------------------------------------------------------------------------
# RDF/XML (the reference's default input format)
# --------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_NS = "http://www.w3.org/XML/1998/namespace"


def _parse_rdfxml_bytes(data: bytes, src: str | None) -> list[tuple]:
    """One streaming SAX pass over an RDF/XML document → TRIPLES rows.
    Pure function (testable without Spark); runs on executors inside
    read_rdfxml's mapInPandas."""
    import xml.sax

    triples: list[tuple] = []

    # blank nodes, rdf:nodeID and rdf:ID are DOCUMENT-scoped: without a
    # per-file scope, multi-file loads would merge unrelated anonymous
    # nodes from different ontologies (round-2 review finding)
    import hashlib

    scope = hashlib.md5(src.encode()).hexdigest()[:8] if src else ""

    class Handler(xml.sax.ContentHandler):
        def __init__(self) -> None:
            super().__init__()
            # frames (index 1/2 shared so _lang and child props work on all):
            #   ["node",    subj,  lang]
            #   ["prop",    pred,  lang, obj_iri, text_parts]
            #   ["noderes", blank, lang, pred]      parseType="Resource"
            #   ["ptcoll",  pred,  lang, items]     parseType="Collection"
            self.stack: list[list] = []
            self.blank_n = 0
            # parseType="Literal" capture state: [pred, lang, parts, depth]
            self.lit: list | None = None

        def _lang(self, attrs) -> str | None:
            lang = attrs.get((_XML_NS, "lang"))
            if lang is not None:
                return lang
            for frame in reversed(self.stack):
                if frame[2] is not None:
                    return frame[2]
            return None

        def _new_blank(self) -> str:
            self.blank_n += 1
            return f"_:{scope}b{self.blank_n}"

        # -- rdf:parseType="Literal" serialization helpers --------------
        # expat never reports namespace PREFIXES (qname is None), so the
        # captured XML re-declares each element's namespace as the
        # default namespace: '<x:b/>' → '<b xmlns="urn:x"/>'. Same
        # infoset, normalized spelling — documented subset.
        @staticmethod
        def _ser_start(name, attrs) -> str:
            from xml.sax.saxutils import quoteattr

            uri, local = name
            parts = [f"<{local}"]
            if uri:
                parts.append(f" xmlns={quoteattr(uri)}")
            for (auri, alocal), val in attrs.items():
                if auri in (_XML_NS,):
                    continue
                parts.append(f" {alocal}={quoteattr(val)}")
            parts.append(">")
            return "".join(parts)

        def startElementNS(self, name, qname, attrs) -> None:
            uri, local = name
            full = (uri or "") + local
            if self.lit is not None:  # inside an XMLLiteral: serialize
                self.lit[2].append(self._ser_start(name, attrs))
                self.lit[3] += 1
                return
            if full == f"{_RDF_NS}RDF":
                return
            lang = self._lang(attrs)
            expecting_node = not self.stack or self.stack[-1][0] in (
                "prop", "ptcoll"
            )
            if expecting_node:
                about = attrs.get((_RDF_NS, "about"))
                rid = attrs.get((_RDF_NS, "ID"))
                node_id = attrs.get((_RDF_NS, "nodeID"))
                if about is not None:
                    subj = about
                elif rid is not None:
                    # rdf:ID resolves against the document URI
                    subj = f"{src}#{rid}" if src else f"#{rid}"
                elif node_id is not None:
                    subj = f"_:{scope}{node_id}"
                else:
                    subj = self._new_blank()
                if full != f"{_RDF_NS}Description":
                    triples.append((subj, f"{_RDF_NS}type", full, None, False, src))
                # property attributes → literal triples
                for (auri, alocal), val in attrs.items():
                    if auri in (None, "", _RDF_NS, _XML_NS):
                        continue
                    triples.append((subj, auri + alocal, val, lang, True, src))
                # this node is the object of the enclosing property /
                # the next item of an enclosing parseType=Collection
                if self.stack and self.stack[-1][0] == "prop":
                    self.stack[-1][3] = subj
                elif self.stack and self.stack[-1][0] == "ptcoll":
                    self.stack[-1][3].append(subj)
                self.stack.append(["node", subj, lang])
            else:
                pt = attrs.get((_RDF_NS, "parseType"))
                if pt == "Resource":
                    # the property's object is a fresh blank node whose
                    # own properties are this element's children
                    self.stack.append(
                        ["noderes", self._new_blank(), lang, full]
                    )
                    return
                if pt == "Collection":
                    self.stack.append(["ptcoll", full, lang, []])
                    return
                if pt is not None:
                    # "Literal" — and per the RDF/XML spec any OTHER
                    # parseType value is treated as Literal too
                    self.lit = [full, lang, [], 0]
                    return
                res = attrs.get((_RDF_NS, "resource"))
                node_id = attrs.get((_RDF_NS, "nodeID"))
                obj_iri = res if res is not None else (
                    f"_:{scope}{node_id}" if node_id else None
                )
                self.stack.append(["prop", full, lang, obj_iri, []])

        def characters(self, content: str) -> None:
            if self.lit is not None:
                from xml.sax.saxutils import escape

                self.lit[2].append(escape(content))
            elif self.stack and self.stack[-1][0] == "prop":
                self.stack[-1][4].append(content)

        def endElementNS(self, name, qname) -> None:
            uri, local = name
            if self.lit is not None:
                if self.lit[3] > 0:  # closing a serialized child element
                    self.lit[2].append(f"</{local}>")
                    self.lit[3] -= 1
                    return
                # closing the parseType=Literal property itself: the
                # accumulated XML is the literal value (rdf:XMLLiteral
                # datatype — stripped, P5 semantics, like ^^<dt>)
                pred, lang, parts, _ = self.lit
                subj = self.stack[-1][1]
                triples.append((subj, pred, "".join(parts), lang, True, src))
                self.lit = None
                return
            if (uri or "") + local == f"{_RDF_NS}RDF":
                return
            frame = self.stack.pop()
            if frame[0] == "noderes":
                _tag, blank, _lang_, pred = frame
                subj = self.stack[-1][1]
                triples.append((subj, pred, blank, None, False, src))
                return
            if frame[0] == "ptcoll":
                _tag, pred, _lang_, items = frame
                subj = self.stack[-1][1]
                nil = f"{_RDF_NS}nil"
                if not items:
                    head = nil
                else:
                    cells = [self._new_blank() for _ in items]
                    for i, (cell, item) in enumerate(zip(cells, items)):
                        triples.append(
                            (cell, f"{_RDF_NS}first", item, None, False, src)
                        )
                        rest = cells[i + 1] if i + 1 < len(cells) else nil
                        triples.append(
                            (cell, f"{_RDF_NS}rest", rest, None, False, src)
                        )
                    head = cells[0]
                triples.append((subj, pred, head, None, False, src))
                return
            if frame[0] != "prop":
                return
            _tag, pred, lang, obj_iri, parts = frame
            subj = self.stack[-1][1]
            if obj_iri is not None:
                triples.append((subj, pred, obj_iri, None, False, src))
            else:
                text = "".join(parts).strip()
                triples.append((subj, pred, text, lang, True, src))

    parser = xml.sax.make_parser()
    parser.setFeature(xml.sax.handler.feature_namespaces, True)
    parser.setContentHandler(Handler())
    import io

    parser.parse(io.BytesIO(data))
    return triples


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    """RDF/XML file(s) → TRIPLES DataFrame. Parallel ACROSS files
    (binaryFile source, one SAX stream per file on the executor);
    .gz/.bz2 decompressed in the parser task. This is the format
    OntologyLoader.java:62-66 defaults to; subset limits in the module
    docstring."""
    from collections.abc import Iterator

    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bz2 as _bz2
        import gzip as _gzip

        cols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "src_url"]
        for pdf in it:
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    data = _gzip.decompress(data)
                elif p.endswith(".bz2"):
                    data = _bz2.decompress(data)
                rows = _parse_rdfxml_bytes(data, p)
                yield pd.DataFrame(rows, columns=cols)

    schema = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string"
    )
    return files.mapInPandas(_parse, schema=schema)


def labels_from_triples(triples: DataFrame) -> DataFrame:
    """TRIPLES → ONTOLOGY_LABELS bridge: SKOS label assertions become
    (concept_iri, label, label_kind, lang) rows — the dimension shape
    every cleaner/cascade operator consumes. Untagged literals get
    lang '' (the reference's keep-always convention)."""
    from sifr_project_java_ontology_processing_spark.functions.uris import (
        SKOS_ALT_LABEL,
        SKOS_HIDDEN_LABEL,
        SKOS_NOTATION,
        SKOS_PREF_LABEL,
    )

    kind = (
        F.when(F.col("pred") == SKOS_PREF_LABEL, "pref")
        .when(F.col("pred") == SKOS_ALT_LABEL, "alt")
        .when(F.col("pred") == SKOS_HIDDEN_LABEL, "hidden")
        .when(F.col("pred") == SKOS_NOTATION, "notation")
    )
    return (
        triples.where(F.col("obj_is_literal") & kind.isNotNull())
        .select(
            F.col("subj").alias("concept_iri"),
            F.col("obj").alias("label"),
            kind.alias("label_kind"),
            F.coalesce("obj_lang", F.lit("")).alias("lang"),
        )
    )


def labels_to_triples(labels: DataFrame) -> DataFrame:
    """ONTOLOGY_LABELS → TRIPLES (inverse bridge, for writing cleaned
    label sets back out through the RDF sink)."""
    from sifr_project_java_ontology_processing_spark.functions.uris import (
        SKOS_ALT_LABEL,
        SKOS_HIDDEN_LABEL,
        SKOS_NOTATION,
        SKOS_PREF_LABEL,
    )

    pred = (
        F.when(F.col("label_kind") == "pref", SKOS_PREF_LABEL)
        .when(F.col("label_kind") == "alt", SKOS_ALT_LABEL)
        .when(F.col("label_kind") == "hidden", SKOS_HIDDEN_LABEL)
        .otherwise(SKOS_NOTATION)
    )
    return labels.select(
        F.col("concept_iri").alias("subj"),
        pred.alias("pred"),
        F.col("label").alias("obj"),
        F.when(F.col("lang") != "", F.col("lang")).alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
    )


def load_model(spark: SparkSession, path: str) -> DataFrame:
    """Format dispatch mirroring OntologyLoader.loadModel:41-71 —
    ``.ttl`` → full Turtle (read_turtle; use read_turtle_lines directly
    for huge splittable machine-generated files), ``.nt`` → N-Triples,
    XML-flavored extensions (.owl/.xml/.xrdf/.rdf — the reference's
    RDF/XML default) → read_rdfxml; anything else N-Triples (this
    engine's native serialization). Compression suffixes are
    transparent."""
    base = path
    for ext in (".gz", ".bz2"):
        if base.endswith(ext):
            base = base[: -len(ext)]
    if base.endswith(".ttl"):
        return read_turtle(spark, path)
    if base.endswith((".owl", ".xml", ".xrdf", ".rdf")):
        return read_rdfxml(spark, path)
    if base.endswith(".nq"):
        # quads: the extra nullable ``graph`` column rides along —
        # execute_bgp treats it as the dataset, every other consumer
        # sees the same five triple columns
        return read_nquads(spark, path)
    return read_ntriples(spark, path)


# --------------------------------------------------------------------------
# N-Quads (named graphs)
# --------------------------------------------------------------------------

# subj pred obj [graph] . — graph label is an IRI or blank node; the
# lazy (.+?) object backtracks until the optional graph term (if any)
# and the final '.' both fit, so literals containing spaces or '<'
# never bleed into the graph slot (grammar: RDF 1.1 N-Quads REC §2).
# The blank-node-graph alternative excludes '"' (labels never contain
# quotes) — otherwise a literal ENDING in a '_:' token ("foo _:bar")
# would leak its tail into the graph slot and corrupt the object.
# The object slot is TERM-AWARE (quoted literal with escapes +
# optional @lang/^^<dt>, or <iri>, or _:bnode) rather than a lazy
# catch-all: a lazy ``(.+?)`` mis-split literals whose body contains
# `` <`` when a graph label follows (hypothesis-found: the graph
# alternation ``<[^>]*>`` swallowed ``<" <http://g/one>`` and the
# object was left as a bare ``"``).
_NQ_OBJ = (
    r'("(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?'
    r"|<[^>]*>|_:[^ \t]+)"
)
_NQ_LINE_RX = (
    r"^[ \t]*(<[^>]*>|_:[^ \t]+)[ \t]+<([^>]*)>[ \t]+" + _NQ_OBJ
    + r'(?:[ \t]+(<[^>]*>|_:[^ \t"]+))?[ \t]*\.[ \t]*$'
)
# a non-literal object must still re-verify as exactly one IRI or
# blank-node term (_NQ_TERM_RX, defined next to _NT_LIT_RX at the top
# of the module, shared with the strict N-Triples object check).


def parse_nquads_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Lines → QUADS-schema rows (TRIPLES columns + nullable ``graph``;
    NULL = default graph, matching plans/bgp.py's dataset convention).
    Same pure-expression shape as ``parse_ntriples_lines`` — per-line,
    splittable, compression-transparent."""
    line = F.col(line_col)
    content = lines.where(
        (F.trim(line) != "") & ~F.trim(line).startswith("#")
    )
    subj_raw = F.regexp_extract(line, _NQ_LINE_RX, 1)
    pred = F.regexp_extract(line, _NQ_LINE_RX, 2)
    obj_raw = F.regexp_extract(line, _NQ_LINE_RX, 3)
    graph_raw = F.regexp_extract(line, _NQ_LINE_RX, 4)
    is_lit = obj_raw.startswith('"')
    bad = (
        (subj_raw == "")
        | (is_lit & ~obj_raw.rlike(_NT_LIT_RX))
        | (~is_lit & ~obj_raw.rlike(_NQ_TERM_RX))
    )
    lit_body = F.regexp_extract(obj_raw, _NT_LIT_RX, 1)
    lit_lang = F.regexp_extract(obj_raw, _NT_LIT_RX, 2)
    return content.select(
        F.when(bad, None).otherwise(_strip_angle(subj_raw)).alias("subj"),
        F.when(bad, None).otherwise(pred).alias("pred"),
        F.when(is_lit, _unescape_literal(lit_body))
        .otherwise(_strip_angle(obj_raw))
        .alias("obj"),
        F.when(is_lit & (lit_lang != ""), lit_lang).alias("obj_lang"),
        is_lit.alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
        F.when(graph_raw == "", None).otherwise(_strip_angle(graph_raw)).alias(
            "graph"
        ),
        line.alias("_raw"),
    )


def read_nquads(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """N-Quads file(s) → QUADS DataFrame (triples + nullable ``graph``
    column; lines with no graph label land in the default graph). The
    output feeds ``plans.bgp.execute_bgp`` GRAPH / FROM [NAMED]
    directly. ``path`` may be a file, directory, or glob; .gz/.bz2
    decode transparently."""
    parsed = parse_nquads_lines(spark.read.text(path))
    if strict:
        bad_rows = (
            parsed.where(F.col("subj").isNull()).select("_raw").limit(5).collect()
        )
        if bad_rows:
            raise ValueError(
                f"unparseable N-Quads line(s) in {path}: "
                + "; ".join(repr(r["_raw"]) for r in bad_rows)
            )
        return parsed.drop("_raw")
    return parsed.where(F.col("subj").isNotNull()).drop("_raw")
