"""SPARQL 1.1 UPDATE subset over the triples DataFrame.

The reference's Jena models are mutable: every `model.add(...)` /
`model.remove(...)` call in OntologyCUIProcessor.java (the batch-update
stage E5, the reject-removal path, the static-RDF append S6) is an
in-place graph update, and Jena exposes the same capability to users as
SPARQL UPDATE (UpdateAction over any Model). This module supplies that
surface Spark-first: updates are PURE — they take a triples DataFrame
and return the updated triples DataFrame (immutable lineage, so the
result can be written back via sources/graph_sink.py or rdf_sink.py,
checkpointed, or diffed against the input).

Supported forms (documented subset):

* ``INSERT DATA { ground triples }``
* ``DELETE DATA { ground triples }``
* ``DELETE WHERE { patterns }`` (patterns are both the match group and
  the delete template)
* ``DELETE { template } INSERT { template } WHERE { group }`` with
  either clause optional (but at least one), the WHERE group supporting
  the full bgp.py group grammar (OPTIONAL / FILTER / BIND / VALUES /
  EXISTS / MINUS / property paths).
* ``op1 ; op2 ; ...`` — a sequence, applied left to right (SPARQL
  update-request semantics: each operation sees the previous result).
* Named graphs, on a QUADS frame (triples + nullable ``graph`` column,
  e.g. from ``read_nquads``): ``GRAPH <g> { ... }`` blocks inside
  INSERT/DELETE DATA label their rows; ``WITH <g>`` before a templated
  op makes g the active graph (WHERE matches inside g, templates
  insert/delete inside g); a plain WHERE on a quads frame matches the
  DEFAULT graph and its GRAPH blocks the named view — exactly
  execute_bgp's dataset convention. Quad identity (delete/insert set
  joins) includes the graph label null-safely. On a plain triples
  frame, graph-targeted ops raise; graph-less updates behave
  identically on both frame shapes.
* Graph management (§3.2): ``CLEAR/DROP [SILENT] GRAPH <g> | DEFAULT
  | NAMED | ALL`` (DROP ≡ CLEAR — a graph exists exactly while it has
  rows) and ``COPY/MOVE/ADD [SILENT] src TO dst`` (COPY replaces dst,
  ADD set-unions into it, MOVE also clears src; src = dst is a no-op
  per spec). All are pure filters/unions over the quads frame — the
  only join is ADD's anti-join, hinted like the insert path.

Scale design — why this is the 100 TB shape:

* Deletions apply as ONE null-safe 5-column LEFT ANTI join. With the
  default ``hint_broadcast=True`` the delete set is broadcast, so the
  base graph is never shuffled — a map-side anti join over the full
  scan. (Set it False when a DELETE WHERE template matches a large
  fraction of the graph; Catalyst then picks a shuffled anti join.)
* Insertions preserve SET semantics (a graph has no duplicate triples)
  without a global ``distinct()`` over the whole graph: the inserted
  frame is deduped locally (it is solution-bounded, orders of magnitude
  smaller than the graph), the already-present subset is found with a
  broadcast LEFT SEMI probe of the kept graph (output ≤ |inserts|),
  and only genuinely-new triples union in. Total cost: two scans of
  the base graph, ZERO exchanges of it.
* A triple in base ∩ deletes ∩ inserts stays present (SPARQL applies
  DELETE then INSERT per operation) — which is why the semi probe runs
  against the post-delete graph, not the input.

Null semantics: ``obj_lang`` is NULL for IRIs and plain literals, so
the triple-identity join compares it with ``<=>`` (eqNullSafe) — the
relational twin of RDF term equality used by the DuckDB oracle's set
operators (which also treat NULLs as equal).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import (
    _STD_PREFIXES,
    Branch,
    Pattern,
    Term,
    _emit_construct,
    _exec_branch,
    _parse_group,
    _strip_prefix_decls,
    _tokenize,
    _P,
)

_TRIPLE_COLS = ("subj", "pred", "obj", "obj_lang", "obj_is_literal")


@dataclass
class UpdateOp:
    """One parsed update operation."""

    # ground rows for the DATA forms:
    # (subj, pred, obj, lang, is_literal, graph-or-None)
    insert_rows: list[tuple] = field(default_factory=list)
    delete_rows: list[tuple] = field(default_factory=list)
    # template+WHERE forms
    delete_template: list[Pattern] | None = None
    insert_template: list[Pattern] | None = None
    where: Branch | None = None
    # WITH <iri>: the active graph — WHERE matches inside it, templates
    # insert/delete inside it (None = default graph)
    graph: str | None = None
    # graph management (SPARQL 1.1 Update §3.2), quads frames only:
    # ("clear", target) with target an IRI | "DEFAULT" | "NAMED" | "ALL",
    # or ("copy"|"move"|"add", src, dst) with src/dst an IRI | "DEFAULT".
    # DROP ≡ CLEAR here: a graph exists exactly while it has rows (no
    # empty-graph registry), which is also why SILENT is accepted and
    # ignored — there is nothing to be non-silent about.
    manage: tuple | None = None


def _ground_rows(
    patterns: list[Pattern], ctx: str, graph: str | None = None
) -> list[tuple]:
    rows = []
    for s, p, o in patterns:
        for t, pos in ((s, "subject"), (p, "predicate")):
            if t.kind == "var":
                raise ValueError(f"UPDATE: {ctx} DATA must be ground (?{t.value})")
            if t.kind == "literal":
                raise ValueError(f"UPDATE: literal {pos} in {ctx} DATA")
        if o.kind == "var":
            raise ValueError(f"UPDATE: {ctx} DATA must be ground (?{o.value})")
        rows.append(
            (
                s.value,
                p.value,
                o.value,
                o.lang if o.kind == "literal" else None,
                o.kind == "literal",
                graph,
            )
        )
    # set-dedupe here (driver-side, the block is literal text) so the
    # insert path needs no distinct() exchange at all
    return list(dict.fromkeys(rows))


def _parse_template(p: _P, ctx: str) -> list[Pattern]:
    """A { template } group: plain triples only (no FILTER/OPTIONAL/...)."""
    p.expect("{")
    b = Branch()
    _parse_group(p, b)
    if (
        b.filters or b.optionals or b.optional_subs or b.binds
        or b.values or b.exists or b.minus or b.graphs
        or b.subqueries or b.groups
    ):
        raise ValueError(
            f"UPDATE: {ctx} template must be plain triples "
            "(target a named graph with WITH <iri>)"
        )
    for s, pr, o in b.patterns:
        if pr.kind not in ("iri", "var"):
            raise ValueError(f"UPDATE: {ctx} template predicates must be IRIs or vars")
    if not b.patterns:
        raise ValueError(f"UPDATE: empty {ctx} template")
    return b.patterns


def parse_update(text: str) -> list[UpdateOp]:
    """Parse a SPARQL UPDATE request (one or more ';'-separated ops)."""
    prefixes = dict(_STD_PREFIXES)
    declared, body = _strip_prefix_decls(text)
    prefixes.update(declared)
    p = _P(_tokenize(body), prefixes)
    ops: list[UpdateOp] = []
    def _graph_ref(p: _P, ctx: str, *, clear_forms: bool) -> str:
        nxt = p.peek()
        if nxt is None:
            raise ValueError(f"UPDATE: {ctx} needs a graph reference")
        low = nxt.lower()
        if low == "graph":
            p.next()
            t = p.term()
            if t.kind != "iri":
                raise ValueError(f"UPDATE: {ctx} GRAPH needs an <IRI>")
            return t.value
        if low == "default":
            p.next()
            return "DEFAULT"
        if clear_forms and low in ("named", "all"):
            p.next()
            return low.upper()
        # bare <iri>: legal per the COPY/MOVE/ADD grammar (GraphOrDefault
        # ::= DEFAULT | GRAPH? iri); accepted for CLEAR/DROP too as a
        # harmless superset of GraphRefAll
        t = p.term()
        if t.kind != "iri":
            raise ValueError(f"UPDATE: {ctx} needs GRAPH <iri> | DEFAULT")
        return t.value

    while p.peek() is not None:
        tok = p.next().lower()
        op = UpdateOp()
        if tok in ("clear", "drop", "copy", "move", "add"):
            if p.peek() and p.peek().lower() == "silent":
                p.next()
            if tok in ("clear", "drop"):
                op.manage = ("clear", _graph_ref(p, tok.upper(), clear_forms=True))
            else:
                src = _graph_ref(p, tok.upper(), clear_forms=False)
                if p.peek() is None or p.next().lower() != "to":
                    raise ValueError(f"UPDATE: {tok.upper()} needs 'TO'")
                dst = _graph_ref(p, tok.upper(), clear_forms=False)
                op.manage = (tok, src, dst)
            ops.append(op)
            if p.peek() == ";":
                p.next()
            continue
        if tok == "with":
            # WITH <iri>: active graph for the following templated op
            gterm = p.term()
            if gterm.kind != "iri":
                raise ValueError("UPDATE: WITH needs an <IRI>")
            op.graph = gterm.value
            if p.peek() is None:
                raise ValueError("UPDATE: WITH needs an operation")
            tok = p.next().lower()
            if tok not in ("insert", "delete") or (
                p.peek() and p.peek().lower() == "data"
            ):
                raise ValueError(
                    "UPDATE: WITH applies to templated INSERT/DELETE ops "
                    "(use GRAPH blocks inside DATA forms)"
                )
        if tok in ("insert", "delete") and p.peek() and p.peek().lower() == "data":
            p.next()
            p.expect("{")
            b = Branch()
            _parse_group(p, b)
            if (b.filters or b.optionals or b.optional_subs or b.binds
                    or b.values or b.exists or b.minus or b.subqueries or b.groups):
                raise ValueError("UPDATE: DATA block must be plain triples")
            rows = _ground_rows(b.patterns, tok.upper())
            # GRAPH <g> { ... } sub-blocks: ground rows labeled with g
            for gterm, gpats in b.graphs:
                if gterm.kind != "iri":
                    raise ValueError("UPDATE: GRAPH in DATA needs an <IRI>")
                rows += _ground_rows(gpats, tok.upper(), graph=gterm.value)
            rows = list(dict.fromkeys(rows))
            if tok == "insert":
                op.insert_rows = rows
            else:
                op.delete_rows = rows
        elif tok == "delete" and p.peek() and p.peek().lower() == "where":
            # DELETE WHERE { patterns }: the group is its own template
            p.next()
            pats = _parse_template(p, "DELETE WHERE")
            op.delete_template = pats
            op.where = Branch(patterns=list(pats))
        elif tok in ("insert", "delete"):
            if tok == "delete":
                op.delete_template = _parse_template(p, "DELETE")
                if p.peek() and p.peek().lower() == "insert":
                    p.next()
                    op.insert_template = _parse_template(p, "INSERT")
            else:
                op.insert_template = _parse_template(p, "INSERT")
            if p.peek() is None or p.peek().lower() != "where":
                raise ValueError("UPDATE: expected WHERE after template(s)")
            p.next()
            p.expect("{")
            b = Branch()
            _parse_group(p, b)
            op.where = b
        else:
            raise ValueError(f"UPDATE: unsupported operation {tok!r}")
        ops.append(op)
        if p.peek() == ";":
            p.next()
    if not ops:
        raise ValueError("UPDATE: empty request")
    return ops


def _rows_frame(
    triples: DataFrame, rows: list[tuple], *, quads: bool
) -> DataFrame:
    ddl = (
        "`subj` string, `pred` string, `obj` string, "
        "`obj_lang` string, `obj_is_literal` boolean"
    )
    if quads:
        return triples.sparkSession.createDataFrame(
            rows, ddl + ", `graph` string"
        )
    return triples.sparkSession.createDataFrame(
        [r[:5] for r in rows], ddl
    )


def _identity_cond(l: str, r: str, *, quads: bool = False):  # noqa: E741
    c = F.col
    cond = (
        (c(f"{l}.subj") == c(f"{r}.subj"))
        & (c(f"{l}.pred") == c(f"{r}.pred"))
        & (c(f"{l}.obj") == c(f"{r}.obj"))
        & c(f"{l}.obj_lang").eqNullSafe(c(f"{r}.obj_lang"))
        & (c(f"{l}.obj_is_literal") == c(f"{r}.obj_is_literal"))
    )
    if quads:
        # quad identity includes the graph label (NULL = default graph,
        # compared null-safely like obj_lang)
        cond = cond & c(f"{l}.graph").eqNullSafe(c(f"{r}.graph"))
    return cond


def _apply_manage(
    quads_df: DataFrame, manage: tuple, *, hint_broadcast: bool
) -> DataFrame:
    g = F.col("graph")

    def _sel(ref: str):  # rows IN the referenced graph
        return g.isNull() if ref == "DEFAULT" else g.eqNullSafe(F.lit(ref))

    if manage[0] == "clear":
        target = manage[1]
        if target == "ALL":
            return quads_df.where(F.lit(False))
        if target == "NAMED":
            return quads_df.where(g.isNull())
        return quads_df.where(~_sel(target))
    kind, src, dst = manage
    if src == dst:
        return quads_df  # COPY/MOVE/ADD g TO g is a no-op
    dst_lit = F.lit(None).cast("string") if dst == "DEFAULT" else F.lit(dst)
    relabeled = quads_df.where(_sel(src)).withColumn("graph", dst_lit)
    if kind == "copy":
        # dst is REPLACED by src's content
        return quads_df.where(~_sel(dst)).unionByName(relabeled)
    if kind == "move":
        return (
            quads_df.where(~_sel(dst) & ~_sel(src)).unionByName(relabeled)
        )
    # add: set-union into dst — anti-join the relabeled src rows against
    # the existing dst slice (hinted broadcast like the insert path;
    # pass hint_broadcast=False when dst is the big side and AQE should
    # pick the strategy)
    existing = quads_df.where(_sel(dst))
    ex = F.broadcast(existing) if hint_broadcast else existing
    new = relabeled.alias("l").join(
        ex.alias("r"),
        _identity_cond("l", "r", quads=True),
        "left_anti",
    )
    return quads_df.unionByName(new)


def _apply_one(
    triples: DataFrame, op: UpdateOp, *, hint_broadcast: bool
) -> DataFrame:
    quads = "graph" in triples.columns
    if op.manage is not None:
        if not quads:
            raise ValueError(
                "UPDATE: graph management (CLEAR/DROP/COPY/MOVE/ADD) needs "
                "a quads frame (triples + 'graph' column)"
            )
        return _apply_manage(
            triples.select(*_TRIPLE_COLS, "graph"),
            op.manage,
            hint_broadcast=hint_broadcast,
        )
    if not quads and (
        op.graph is not None
        or any(r[5] is not None for r in op.insert_rows)
        or any(r[5] is not None for r in op.delete_rows)
    ):
        raise ValueError(
            "UPDATE: graph-targeted operation (WITH / GRAPH) needs a "
            "quads frame (triples + 'graph' column, e.g. read_nquads)"
        )
    cols = (*_TRIPLE_COLS, "graph") if quads else _TRIPLE_COLS
    deletes: DataFrame | None = None
    inserts: DataFrame | None = None
    if op.delete_rows:
        deletes = _rows_frame(triples, op.delete_rows, quads=quads)
    if op.insert_rows:
        inserts = _rows_frame(triples, op.insert_rows, quads=quads)
    if op.where is not None:
        want_meta = frozenset(
            t.value
            for tmpl in (op.delete_template or [], op.insert_template or [])
            for pat in tmpl
            for t in (pat[2],)
            if t.kind == "var"
        )
        # Dataset views mirror execute_bgp's convention: on a quads
        # frame, plain WHERE patterns match the DEFAULT graph (NULL
        # label) and GRAPH blocks the named view. WITH <g> swaps the
        # active graph to g (per SPARQL WITH semantics); GRAPH blocks
        # inside a WITH-scoped WHERE would need the full dataset, so
        # they are rejected as out of subset.
        src, named = triples, None
        if quads:
            if op.graph is not None:
                if op.where.graphs:
                    raise ValueError(
                        "UPDATE: GRAPH inside a WITH-scoped WHERE is not supported"
                    )
                src = triples.where(
                    F.col("graph").eqNullSafe(F.lit(op.graph))
                ).select(*_TRIPLE_COLS)
            else:
                src = triples.where(F.col("graph").isNull()).select(
                    *_TRIPLE_COLS
                )
                named = triples.where(F.col("graph").isNotNull())
        acc, bound = _exec_branch(src, op.where, want_meta, named)
        if op.delete_template:
            deletes = _emit_construct(acc, op.delete_template, bound)
        if op.insert_template:
            inserts = _emit_construct(acc, op.insert_template, bound)
        if quads and deletes is not None and "graph" not in deletes.columns:
            deletes = deletes.withColumn(
                "graph", F.lit(op.graph).cast("string")
            )
        if quads and inserts is not None and "graph" not in inserts.columns:
            inserts = inserts.withColumn(
                "graph", F.lit(op.graph).cast("string")
            )

    kept = triples.select(*cols)
    if deletes is not None:
        d = F.broadcast(deletes) if hint_broadcast else deletes
        kept = kept.alias("l").join(
            d.alias("r"), _identity_cond("l", "r", quads=quads), "left_anti"
        )
    if inserts is not None:
        # already set-deduped: DATA rows in the parser, template inserts
        # by _emit_construct's distinct() (a CONSTRUCT result is a graph)
        ins = inserts.select(*cols)
        ins_b = F.broadcast(ins) if hint_broadcast else ins
        # which inserts already exist POST-delete (re-inserting a deleted
        # triple must re-add it) — broadcast semi probe, small output
        # (≤ |inserts| up to base-side duplicates, which the anti join
        # below tolerates on its right side)
        existing = kept.alias("l").join(
            ins_b.alias("r"), _identity_cond("l", "r", quads=quads), "left_semi"
        )
        new = ins.alias("l").join(
            (F.broadcast(existing) if hint_broadcast else existing).alias("r"),
            _identity_cond("l", "r", quads=quads),
            "left_anti",
        )
        kept = kept.unionByName(new)
    return kept


def apply_update(
    triples: DataFrame,
    update: str | list[UpdateOp],
    *,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Apply a SPARQL UPDATE request to a triples frame; returns the
    updated frame (the input is untouched — write it back with
    graph_sink/rdf_sink to persist).

    ``hint_broadcast=True`` (default) broadcasts the delete/insert
    sides so the base graph is never exchanged; set False when a
    template is expected to match a large fraction of the graph.
    """
    ops = parse_update(update) if isinstance(update, str) else update
    out = triples
    for op in ops:
        out = _apply_one(out, op, hint_broadcast=hint_broadcast)
    return out
