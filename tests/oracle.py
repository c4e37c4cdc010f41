"""Independent pure-Python oracles for the KG pipeline (FIXTURES.md §6).

Deliberately implemented with different algorithms than the engine
(O(n·labels) scans, no tries) — fixture-sized, so quadratic is fine.
These produce the golden triples for the P/R ≥ 0.95 gate.
"""

from __future__ import annotations

import re

_EDGE = re.compile(r"^[^\w]+|[^\w]+$")


def _norm(tok: str) -> str:
    return _EDGE.sub("", tok.lower())


def mentions_oracle(text: str, labels: list[tuple[str, str, str, str]]):
    """Leftmost-longest non-overlapping phrase matching, independent
    implementation: tries every label at every token position.

    labels: (concept_iri, label, kind, lang); pref/alt/hidden only,
    CUI-shaped labels excluded (mirrors engine policy). Returns
    [(start_token_idx, concept_iri, n_tokens)] in scan order.
    """
    cui_rx = re.compile(r"^C[0-9]{7}$")
    # phrase (tuple of norm tokens) -> (concept, kind_rank) keep best kind
    kind_rank = {"pref": 0, "alt": 1, "hidden": 2}
    phrases: dict[tuple, tuple[str, int]] = {}
    for concept, label, kind, lang in labels:
        if kind not in kind_rank or cui_rx.fullmatch(label.strip()):
            continue
        toks = tuple(t for t in (_norm(x) for x in label.split()) if t)
        if not toks:
            continue
        prev = phrases.get(toks)
        if prev is None or kind_rank[kind] < prev[1]:
            phrases[toks] = (concept, kind_rank[kind])
    if not phrases:
        return []
    max_len = max(len(p) for p in phrases)
    toks = [t for t in (_norm(x) for x in text.split()) if t]
    out = []
    i = 0
    while i < len(toks):
        matched = False
        for ln in range(min(max_len, len(toks) - i), 0, -1):
            cand = tuple(toks[i : i + ln])
            if cand in phrases:
                out.append((i, phrases[cand][0], ln))
                i += ln
                matched = True
                break
        if not matched:
            i += 1
    return out


def mention_triples_oracle(pages, labels) -> set[tuple[str, str, str]]:
    """Golden (page_url, sifr:mention, concept_iri) triple set."""
    pred = "http://purl.lirmm.fr/ontology/SIFR/mention"
    triples = set()
    for url, _ts, _html, text, _lang in pages:
        for _i, concept, _ln in mentions_oracle(text, labels):
            triples.add((url, pred, concept))
    return triples


def precision_recall(
    emitted: set[tuple], golden: set[tuple]
) -> tuple[float, float]:
    tp = len(emitted & golden)
    p = tp / len(emitted) if emitted else 1.0
    r = tp / len(golden) if golden else 1.0
    return p, r


def cascade_oracle(fx):
    """Reference processCUIs/processTUIs re-implemented imperatively
    (OntologyCUIProcessor.java:121-231,273-297) over the fixture."""
    concepts = sorted({c for (c, _l, _k, _lg) in fx.ontology_labels})
    labels_by_c: dict[str, list] = {}
    for c, lbl, kind, lg in fx.ontology_labels:
        labels_by_c.setdefault(c, []).append((lbl, kind, lg))
    maps_by_src: dict[str, list] = {}
    for s, p, t in fx.mappings:
        maps_by_src.setdefault(s, []).append((p, t))
    umls_by_code: dict[str, set] = {}
    for code, cui, lat, s in fx.umls_concepts:
        umls_by_code.setdefault(code, set()).add(cui)
    sty_by_cui: dict[str, set] = {}
    for cui, tui in fx.umls_semtypes:
        sty_by_cui.setdefault(cui, set()).add(tui)
    tgt_cuis = getattr(fx, "target_cuis", {})
    cui_rx = re.compile(r"^C[0-9]{7}$")

    out = {}
    for c in concepts:
        # code finder: min notation, else URI fragment before '_'
        notations = sorted(l for (l, k, _g) in labels_by_c.get(c, []) if k == "notation")
        code = notations[0] if notations else None
        if code is None and "#" in c:
            frag = c.split("#", 1)[1].split("_", 1)[0]
            code = frag or None
        cuis = sorted(fx.concept_cuis.get(c, []))
        stage = "own_cui"
        if not cuis:
            alt = sorted(
                l.strip()
                for (l, k, _g) in labels_by_c.get(c, [])
                if k == "alt" and cui_rx.fullmatch(l.strip())
            )
            if alt:
                cuis, stage = alt, "cui_in_alt_label"
            else:
                mapped = set()
                for p, t in maps_by_src.get(c, []):
                    mapped.update(tgt_cuis.get(t, []))
                if mapped:
                    cuis, stage = sorted(mapped), "cui_in_mappings"
                elif code is not None and umls_by_code.get(code):
                    cuis, stage = sorted(umls_by_code[code]), "cui_through_code"
                else:
                    cuis, stage = [], "remaining_without_cui"
        # TUIs
        tuis = sorted(fx.concept_tuis.get(c, []))
        tstage = "own_tui"
        if not tuis:
            if cuis:
                ts = set()
                for cui in cuis:
                    ts.update(sty_by_cui.get(cui, []))
                tuis, tstage = sorted(ts), ("tui_from_umls_by_cui" if ts else "remaining_without_tui")
            else:
                # reference bug-compat: looks up mapping SOURCE classes in
                # the target delegate -> (here) always empty
                tuis, tstage = [], "remaining_without_tui"
        out[c] = (code, cuis, stage, tuis, tstage)
    return out


def union_find_oracle(edges):
    """Independent union-find canonicalization oracle (path-halving
    find, min-root-wins merge) → {node: canonical} for every node seen
    in ``edges``. Shared by the CC tests and the pipeline golden so the
    two suites cannot drift apart."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}
