"""SPARQL basic-graph-pattern (BGP) subset executor over the triples
DataFrame.

The reference gets SPARQL for free from Jena (its NcboSparqlOutputToTTL
path consumes SPARQL *result* XML, and every Jena Model supports ARQ
queries; see reference OntologyLoader.java / NcboSparqlOutputToTTL.java
usage of Jena models). A user of the reference can therefore point a
BGP query at any loaded model. This module supplies that capability
Spark-first: a small SPARQL SELECT parser (the BGP + FILTER + ORDER BY
+ LIMIT subset) and a compiler from triple patterns to a join tree over
the canonical triples frame (schemas.TRIPLES: subj, pred, obj,
obj_lang, obj_is_literal).

Execution model — why this scales:

* Each pattern becomes ONE scan of the triples frame with every
  constant position pushed as a filter (``pred`` is almost always
  constant, so on a parquet/Iceberg triples table the predicate
  reaches ``PushedFilters`` and partition pruning applies when the
  table is partitioned by predicate, as graph_sink writes it).
* Patterns are joined on their SHARED VARIABLES. Join order is chosen
  greedily by connectivity: start from the most-selective pattern
  (most constants), then repeatedly attach the pattern sharing the
  most already-bound variables. This structurally avoids cartesian
  products for any connected BGP — Catalyst then picks the physical
  strategy (broadcast for small selective sides under AQE).
* FILTERs become Spark SQL expressions over the variable columns, so
  they stay inside whole-stage codegen and are pushed below joins by
  Catalyst where legal.

Scope (documented subset): SELECT [DISTINCT] ?v ... | * , WHERE with
triple patterns ('a' keyword, prefixed names, <IRIs>, "literals"
with optional @lang, integers, variables), FILTER(expr) with
regex/str/comparisons/&&/||/!, OPTIONAL { patterns } (one level,
LEFT join on shared vars), { group } UNION { group } (top level,
null-filled variable alignment), ORDER BY ?v [ASC|DESC], LIMIT n.
Property paths and nested groups are documented out of scope; for
transitive paths use operators/graph.py::transitive_closure.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_STD_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


@dataclass(frozen=True)
class Term:
    """One position of a triple pattern.

    kind: 'var' (name without '?'), 'iri' (absolute IRI), or
    'literal' (lexical form, optional lang tag).
    """

    kind: str
    value: str
    lang: str | None = None


Pattern = tuple[Term, Term, Term]


@dataclass
class Branch:
    """One UNION alternative: required patterns, OPTIONAL groups
    (each LEFT-joined on its shared variables), and branch-scoped
    FILTER expressions."""

    patterns: list[Pattern] = field(default_factory=list)
    optionals: list[list[Pattern]] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)  # Spark SQL exprs


@dataclass
class BGPQuery:
    select: list[str]  # variable names, [] = SELECT *
    branches: list[Branch]  # >1 = UNION of alternatives
    distinct: bool = False
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: int | None = None

    # single-branch conveniences (the common case)
    @property
    def patterns(self) -> list[Pattern]:
        return self.branches[0].patterns

    @property
    def filters(self) -> list[str]:
        return self.branches[0].filters


# ---------------------------------------------------------------------------
# Parser (SPARQL SELECT subset)
# ---------------------------------------------------------------------------

_ESCAPE_RE = re.compile(r"\\(?:u([0-9a-fA-F]{4})|U([0-9a-fA-F]{8})|(.))")
_ESCAPE_MAP = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}


def _unescape(s: str) -> str:
    """SPARQL string-literal escapes: \\uXXXX, \\UXXXXXXXX, \\n \\t \\r
    \\b \\f, pass-through for escaped quote/backslash. Unicode-safe
    (unlike unicode_escape, which mojibakes non-ASCII text)."""

    def rep(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        c = m.group(3)
        return _ESCAPE_MAP.get(c, c)

    return _ESCAPE_RE.sub(rep, s)


def _sql_str(s: str) -> str:
    """Embed a python string as a Spark SQL single-quoted literal
    (backslashes are escape chars in Spark SQL string literals)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<comment>\#[^\n]*) |
        (?P<str>"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*)?) |
        (?P<iri><[^<>\s]*>) |
        (?P<var>\?[A-Za-z_][A-Za-z0-9_]*) |
        (?P<num>[+-]?\d+(?:\.\d+)?) |
        (?P<punct>&&|\|\||[!<>]=|[=<>]|[{}().,;!*]) |
        (?P<word>[A-Za-z_][A-Za-z0-9_-]*(?::[A-Za-z_][A-Za-z0-9_.-]*)?|:[A-Za-z_][A-Za-z0-9_.-]*)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    toks: list[str] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"BGP parse error at: {text[pos:pos + 30]!r}")
        pos = m.end()
        if m.lastgroup != "comment":
            toks.append(m.group(m.lastgroup))
    return toks


class _P:
    def __init__(self, toks: list[str], prefixes: dict[str, str]):
        self.toks, self.i, self.prefixes = toks, 0, dict(prefixes)

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("BGP parse error: unexpected end of query")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.lower() != tok.lower():
            raise ValueError(f"BGP parse error: expected {tok!r}, got {t!r}")

    def term(self) -> Term:
        t = self.next()
        if t.startswith("?"):
            return Term("var", t[1:])
        if t.startswith("<"):
            return Term("iri", t[1:-1])
        if t.startswith('"'):
            lang = None
            body = t
            at = t.rfind('"@')
            if at > 0:
                lang, body = t[at + 2 :], t[: at + 1]
            lex = _unescape(body[1:-1])
            return Term("literal", lex, lang)
        if t == "a":
            return Term("iri", RDF_TYPE)
        if re.fullmatch(r"[+-]?\d+(?:\.\d+)?", t):
            return Term("literal", t)
        if ":" in t:
            pfx, _, local = t.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"BGP parse error: unknown prefix {pfx!r}:")
            return Term("iri", self.prefixes[pfx] + local)
        raise ValueError(f"BGP parse error: cannot read term {t!r}")


def _filter_to_sql(p: _P) -> str:
    """Translate one FILTER(...) body to a Spark SQL expression.

    Supported: regex(?v, "pat"), str(?v), comparisons, && || !,
    parentheses, string/number literals, variables.
    """
    p.expect("(")
    out: list[str] = []
    depth = 1
    while depth > 0:
        t = p.next()
        if t == "(":
            depth += 1
            out.append("(")
        elif t == ")":
            depth -= 1
            if depth > 0:
                out.append(")")
        elif t == "&&":
            out.append("AND")
        elif t == "||":
            out.append("OR")
        elif t == "!":
            out.append("NOT")
        elif t == "=":
            out.append("=")
        elif t.lower() == "regex":
            # regex(?v, "pat") -> (v RLIKE 'pat')
            p.expect("(")
            v = p.term()
            p.expect(",")
            pat = p.term()
            p.expect(")")
            if v.kind != "var" or pat.kind != "literal":
                raise ValueError("BGP: regex() needs (?var, \"pattern\")")
            out.append(f"(`{v.value}` RLIKE {_sql_str(pat.value)})")
        elif t.lower() == "str":
            p.expect("(")
            v = p.term()
            p.expect(")")
            out.append(f"`{v.value}`")
        elif t.startswith("?"):
            out.append(f"`{t[1:]}`")
        elif t.startswith('"'):
            # strip an @lang tag (compared on the lexical form) and
            # unescape before embedding as a SQL literal
            body = t
            at = t.rfind('"@')
            if at > 0:
                body = t[: at + 1]
            out.append(_sql_str(_unescape(body[1:-1])))
        elif re.fullmatch(r"[+-]?\d+(?:\.\d+)?|[<>]=?|!=", t):
            out.append(t)
        else:
            raise ValueError(f"BGP: unsupported token in FILTER: {t!r}")
    return " ".join(out)


def _parse_group(p: _P, branch: Branch, *, in_optional: bool = False) -> None:
    """Parse group contents up to (and consuming) the closing '}'.
    Fills ``branch``; OPTIONAL sub-groups collect into
    ``branch.optionals`` (one level — nested OPTIONAL is out of scope)."""
    patterns = branch.patterns if not in_optional else branch.optionals[-1]
    subj: Term | None = None
    pred: Term | None = None
    while True:
        t = p.peek()
        if t is None:
            raise ValueError("BGP parse error: unterminated { block")
        if t == "}":
            p.next()
            return
        if t.lower() == "filter":
            if in_optional:
                raise ValueError("BGP: FILTER inside OPTIONAL is not supported")
            p.next()
            branch.filters.append(_filter_to_sql(p))
            if p.peek() == ".":
                p.next()
            continue
        if t.lower() == "optional":
            if in_optional:
                raise ValueError("BGP: nested OPTIONAL is not supported")
            p.next()
            p.expect("{")
            branch.optionals.append([])
            _parse_group(p, branch, in_optional=True)
            if not branch.optionals[-1]:
                raise ValueError("BGP: empty OPTIONAL group")
            if p.peek() == ".":
                p.next()
            continue
        if t == ";":  # predicate list continuation: same subject
            p.next()
            if subj is None:
                raise ValueError("BGP parse error: ';' without a subject")
            pred = p.term()
            patterns.append((subj, pred, p.term()))
            continue
        if t == ",":  # object list continuation: same subject+predicate
            p.next()
            if subj is None or pred is None:
                raise ValueError("BGP parse error: ',' without a pattern")
            patterns.append((subj, pred, p.term()))
            continue
        if t == ".":
            p.next()
            subj = pred = None
            continue
        subj = p.term()
        pred = p.term()
        patterns.append((subj, pred, p.term()))


def parse_sparql(text: str) -> BGPQuery:
    """Parse the supported SPARQL SELECT subset into a BGPQuery."""
    prefixes = dict(_STD_PREFIXES)
    # PREFIX declarations (before tokenizing the body keeps the grammar tiny)
    body = text
    for m in re.finditer(
        r"(?i)\bPREFIX\s+([A-Za-z_][A-Za-z0-9_-]*)?:\s*<([^>]*)>", text
    ):
        prefixes[m.group(1) or ""] = m.group(2)
    body = re.sub(r"(?i)\bPREFIX\s+(?:[A-Za-z_][A-Za-z0-9_-]*)?:\s*<[^>]*>", "", body)

    p = _P(_tokenize(body), prefixes)
    p.expect("SELECT")
    q = BGPQuery(select=[], branches=[])
    if p.peek() and p.peek().lower() == "distinct":
        p.next()
        q.distinct = True
    while p.peek() and p.peek() != "{" and p.peek().lower() != "where":
        t = p.next()
        if t == "*":
            q.select = []
            break
        if not t.startswith("?"):
            raise ValueError(f"BGP: SELECT expects variables or *, got {t!r}")
        q.select.append(t[1:])
    if p.peek() and p.peek().lower() == "where":
        p.next()
    p.expect("{")
    if p.peek() == "{":
        # UNION form: { group } UNION { group } [ UNION { group } ]*
        while True:
            p.expect("{")
            q.branches.append(Branch())
            _parse_group(p, q.branches[-1])
            t = p.peek()
            if t is not None and t.lower() == "union":
                p.next()
                continue
            break
        p.expect("}")
    else:
        q.branches.append(Branch())
        _parse_group(p, q.branches[0])
    # solution modifiers
    while p.peek() is not None:
        t = p.next().lower()
        if t == "order":
            p.expect("BY")
            while p.peek() and (
                p.peek().startswith("?") or p.peek().lower() in ("asc", "desc")
            ):
                tok = p.next()
                if tok.lower() in ("asc", "desc"):
                    p.expect("(")
                    v = p.term()
                    p.expect(")")
                    q.order_by.append((v.value, tok.lower() == "asc"))
                else:
                    q.order_by.append((tok[1:], True))
        elif t == "limit":
            q.limit = int(p.next())
        else:
            raise ValueError(f"BGP: unsupported solution modifier {t!r}")
    for b in q.branches:
        if not b.patterns:
            raise ValueError("BGP: empty graph pattern")
    return q


# ---------------------------------------------------------------------------
# Compiler: patterns -> DataFrame join tree
# ---------------------------------------------------------------------------


def _pattern_vars(pat: tuple[Term, Term, Term]) -> set[str]:
    return {t.value for t in pat if t.kind == "var"}


def _pattern_frame(
    triples: DataFrame, pat: tuple[Term, Term, Term]
) -> tuple[DataFrame, set[str]]:
    """One scan per pattern: constants filtered (pushdown-eligible),
    variables projected under their names."""
    s, p, o = pat
    if s.kind == "literal" or p.kind == "literal":
        raise ValueError("BGP: literal subjects/predicates are not valid RDF")
    df = triples
    if s.kind == "iri":
        df = df.where(F.col("subj") == s.value)
    if p.kind == "iri":
        df = df.where(F.col("pred") == p.value)
    if o.kind == "iri":
        df = df.where((F.col("obj") == o.value) & (~F.col("obj_is_literal")))
    elif o.kind == "literal":
        df = df.where((F.col("obj") == o.value) & F.col("obj_is_literal"))
        # SPARQL term equality: "x"@fr only matches that lang;
        # a plain "x" only matches an UNtagged literal
        if o.lang is not None:
            df = df.where(F.col("obj_lang") == o.lang)
        else:
            df = df.where(F.col("obj_lang").isNull())
    cols: dict[str, str] = {}
    for term, src in ((s, "subj"), (p, "pred"), (o, "obj")):
        if term.kind == "var":
            if term.value in cols:
                # repeated variable inside one pattern: equality filter
                df = df.where(F.col(cols[term.value]) == F.col(src))
            else:
                cols[term.value] = src
    out = df.select(*(F.col(src).alias(var) for var, src in cols.items()))
    return out, set(cols)


def _greedy_order(patterns: list[tuple[Term, Term, Term]]) -> list[int]:
    """Connectivity-greedy join order: seed with the most-constant
    pattern, then always attach the pattern sharing the most bound
    variables (ties: more constants, then input order)."""

    def n_const(i: int) -> int:
        return sum(1 for t in patterns[i] if t.kind != "var")

    remaining = set(range(len(patterns)))
    order = [max(remaining, key=lambda i: (n_const(i), -i))]
    remaining.discard(order[0])
    bound = _pattern_vars(patterns[order[0]])
    while remaining:
        nxt = max(
            remaining,
            key=lambda i: (len(bound & _pattern_vars(patterns[i])), n_const(i), -i),
        )
        order.append(nxt)
        remaining.discard(nxt)
        bound |= _pattern_vars(patterns[nxt])
    return order


def _join_patterns(
    triples: DataFrame, patterns: list[Pattern]
) -> tuple[DataFrame, set[str]]:
    """Join a pattern list in greedy connectivity order."""
    order = _greedy_order(patterns)
    acc, bound = _pattern_frame(triples, patterns[order[0]])
    for i in order[1:]:
        nxt, nvars = _pattern_frame(triples, patterns[i])
        shared = sorted(bound & nvars)
        if shared:
            acc = acc.join(nxt, on=shared, how="inner")
        else:
            # disconnected BGP component: genuine cross product per
            # SPARQL semantics (rare; the planner only reaches this
            # when no connected pattern remains)
            acc = acc.crossJoin(nxt)
        bound |= nvars
    return acc, bound


def _exec_branch(
    triples: DataFrame, b: Branch
) -> tuple[DataFrame, set[str]]:
    acc, bound = _join_patterns(triples, b.patterns)
    for opt in b.optionals:
        odf, ovars = _join_patterns(triples, opt)
        shared = sorted(bound & ovars)
        if not shared:
            raise ValueError(
                "BGP: OPTIONAL group shares no variable with the required patterns"
            )
        acc = acc.join(odf, on=shared, how="left")
        bound |= ovars
    # SPARQL group scope: FILTERs apply after OPTIONALs have bound
    # their variables (a filter on an OPTIONAL var is legal)
    for f in b.filters:
        acc = acc.where(F.expr(f))
    return acc, bound


def execute_bgp(triples: DataFrame, query: BGPQuery | str) -> DataFrame:
    """Run a BGP SELECT over a triples DataFrame (schemas.TRIPLES
    shape). Accepts a parsed BGPQuery or SPARQL text.

    UNION branches execute independently and union by name with
    missing variables null-filled (SPARQL union semantics); OPTIONAL
    groups LEFT-join on their shared variables, new variables coming
    back null where the group has no match."""
    q = parse_sparql(query) if isinstance(query, str) else query
    frames = [_exec_branch(triples, b) for b in q.branches]
    bound: set[str] = set().union(*(v for _, v in frames))
    aligned = []
    for df, dvars in frames:
        missing = sorted(bound - dvars)
        aligned.append(
            df.select(
                *sorted(dvars),
                *(F.lit(None).cast("string").alias(v) for v in missing),
            )
        )
    acc = aligned[0]
    for df in aligned[1:]:
        acc = acc.unionByName(df)
    if q.select:
        missing_sel = [v for v in q.select if v not in bound]
        if missing_sel:
            raise ValueError(f"BGP: SELECT variables not bound: {missing_sel}")
        acc = acc.select(*q.select)
    else:
        acc = acc.select(*sorted(bound))
    if q.distinct:
        acc = acc.distinct()
    if q.order_by:
        acc = acc.orderBy(
            *(F.col(v).asc() if asc else F.col(v).desc() for v, asc in q.order_by)
        )
    if q.limit is not None:
        acc = acc.limit(q.limit)
    return acc
