"""Driver-contract query registry: every SURVEY.md §2 operator family
exercised over the generic testdata tables, each with a DuckDB-ANSI
oracle twin (CORRECTNESS gate).

Each entry: ``NAME -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
Column names/aliases match the oracle exactly (driver hashes sorted-by-
column-name values). Floats are rounded on BOTH sides before compare.

Parity gotchas encoded here (learned against DuckDB 1.0):
  * DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
    replace-all; backrefs are ``\\1`` vs Spark's ``$1``.
  * ``list_cosine_similarity`` on FLOAT lists computes in float32 —
    cast to DOUBLE[] to match Spark's double aggregation.
  * Spark ``sequence(a,b)`` is end-INclusive; DuckDB ``range(a,b)``
    end-EXclusive.
  * Spark ``slice(arr, i, n)`` (1-based, length) vs DuckDB ``arr[i:j]``
    (1-based, end-inclusive).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Mention-detection label dictionary (fixed literal list so the oracle
# can inline the same VALUES).
LABELS = ["scan", "filter", "join", "window", "hash", "merge", "agg", "batch"]

QueryFn = Callable[[SparkSession, str], DataFrame]
_REG: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn):
        _REG[name] = (fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Driver-facing ordering: the CORRECTNESS snapshot verifies only the
# FIRST 50 keys of ``queries()``, so queries that have never had a
# driver-green row (the round-4 SPARQL/graph/inference/BPE/profiling
# layer) are listed here to occupy the window; everything else follows
# in registration order and keeps judge/check_oracle+pytest coverage.
# New oracle-gated queries should be appended here in the round they
# land so they get a driver row immediately.
_DRIVER_FIRST: list[str] = [
    "sparql_graph_path_group",
    "turtle_full_parse",
    "multimodal_real_decode",
    "rdfxml_full_parse",
    "turtle_sink_roundtrip",
    "sparql_nested_union",
    "sparql_optional_bind",
    "owl_sameas_consolidation",
    "bpe_token_count",
    "model_quality_score",
    "ann_ivf_kmeans_topk",
    "bpe_token_ids",
    "sparql_bgp",
    "graph_pagerank",
    "owl_restrictions_entail",
    "gopher_quality",
    "transitive_closure",
    "sparql_path_closure",
    "owl_class_expr_entail",
    "sparql_agg",
    "sparql_construct",
    "sparql_values_bind",
    "sparql_ask",
    "sparql_negation",
    "sparql_path_opt_offset",
    "sparql_describe",
    "sparql_group_concat",
    "sparql_update",
    "graph_triangle_count",
    "graph_bfs_distances",
    "graph_label_prop",
    "rdfs_entailment",
    "skos_integrity_audit",
    "sparql_named_graphs",
    "sparql_path_elem_mod",
    "rdfs_plus_entailment",
    "sparql_subquery",
    "table_profile",
    "rdfs_entail_incremental",
    "functional_violations",
    "duplicate_spans",
    "graph_personalized_pr",
    "sparql_order_expr",
    "shacl_validate",
    "sparql_typed_order",
    "rdfs_plus_entail_incremental",
    "sparql_path_group",
    "graph_pagerank_named",
    "sparql_term_fns",
    "semantic_dedup",
]


def _ordered_names() -> list[str]:
    first = [n for n in _DRIVER_FIRST if n in _REG]
    seen = set(first)
    return first + [n for n in _REG if n not in seen]


def queries() -> dict[str, QueryFn]:
    return {k: _REG[k][0] for k in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {k: _REG[k][1] for k in _ordered_names() if _REG[k][1] is not None}


# ===========================================================================
# KG / text path
# ===========================================================================

_LABEL_VALUES = ", ".join(f"('{label}')" for label in LABELS)


@register(
    "mention_detect",
    f"""
    WITH labels(label) AS (VALUES {_LABEL_VALUES}),
    hits AS (
      SELECT d.doc_id, l.label,
             len(list_filter(str_split(d.text, ' '), x -> x = l.label)) AS n_mentions
      FROM documents d CROSS JOIN labels l
    )
    SELECT doc_id, label, n_mentions FROM hits WHERE n_mentions > 0
    """,
)
def q_mention_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 analog, SQL-checkable form: exact-token dictionary mention
    counts per document (the trie operator itself is exercised by the
    KG pipeline tests; this proves the same counting semantics on the
    generic corpus). Broadcast dim × map-side count — no shuffle until
    the (tiny) result."""
    docs = _t(spark, sf_dir, "documents")
    labels = spark.createDataFrame([(l,) for l in LABELS], "label string")
    hits = docs.crossJoin(F.broadcast(labels)).select(
        "doc_id",
        "label",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda x: x == F.col("label"))
        ).cast("bigint").alias("n_mentions"),  # bigint: DuckDB len() type
    )
    return hits.where(F.col("n_mentions") > 0)


@register(
    "decontaminate",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 6),
                                          i -> array_to_string(t[i:i+7], ' '))) AS gs
      FROM toks
    ),
    doc_grams AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    bench AS (SELECT DISTINCT g FROM doc_grams WHERE doc_id % 17 = 0),
    hits AS (
      SELECT doc_id, count(*) AS c
      FROM doc_grams JOIN bench USING (g)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(h.c, 0) AS n_contaminated,
           coalesce(h.c, 0) > 0 AS is_contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination (word-8-gram overlap with a
    benchmark set — here every 17th document): the real
    ``ngram_decontaminate`` operator, broadcast benchmark dictionary,
    map-side corpus explode, one partial-aggregated shuffle."""
    from sifr_project_java_ontology_processing_spark.operators.textanalysis import (
        ngram_decontaminate,
    )

    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 17 == 0)
    return ngram_decontaminate(docs, benchmark, n=8)


@register(
    "corpus_curation",
    """
    WITH base AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY md5(coalesce(text, ''))) AS keeper
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             list_filter(str_split(lower(coalesce(text, '')), ' '),
                         x -> x <> '') AS t
      FROM documents
    ),
    quality AS (
      SELECT doc_id, len(t) AS n_tokens,
             len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS n_stop
      FROM toks
    ),
    langc AS (
      SELECT doc_id,
        len(list_filter(t, x -> x IN ('the','and','of','to','a'))) AS c_en,
        len(list_filter(t, x -> x IN ('le','la','et','les','des'))) AS c_fr,
        len(list_filter(t, x -> x IN ('der','und','die','das','ein'))) AS c_de,
        len(list_filter(t, x -> x IN ('el','los','las','una','y'))) AS c_es
      FROM toks
    ),
    langp AS (
      SELECT doc_id,
        CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
             WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
             WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
             WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
             ELSE 'fr' END AS pred_lang
      FROM langc
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 6),
                    i -> array_to_string(t[i:i+7], ' ')))) AS g
      FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
    cont AS (SELECT DISTINCT doc_id FROM grams JOIN bench USING (g)),
    decided AS (
      SELECT b.doc_id, b.keeper,
        CASE WHEN b.doc_id <> b.keeper THEN 'exact_dup'
             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
             WHEN q.n_tokens < 20
                  OR (CASE WHEN q.n_tokens = 0 THEN 0.0
                      ELSE q.n_stop / CAST(q.n_tokens AS DOUBLE) END) < 0.05
               THEN 'quality'
             WHEN l.pred_lang <> 'en' THEN 'lang'
             ELSE '' END AS drop_reason
      FROM base b
      JOIN quality q USING (doc_id)
      JOIN langp l USING (doc_id)
      LEFT JOIN cont c USING (doc_id)
    )
    SELECT doc_id, keeper, drop_reason, drop_reason = '' AS is_kept
    FROM decided
    """,
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation decision (exact-dup keeper >
    decontamination > quality > language, one reason per doc) — the
    real ``curation.curate_corpus`` operator with the same benchmark
    rule as `decontaminate` (every 17th doc)."""
    from sifr_project_java_ontology_processing_spark.operators.curation import (
        curate_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 17 == 0)
    return curate_corpus(docs, benchmark, n=8)


@register(
    "pii_scrub",
    r"""
    WITH withpii AS (
      SELECT doc_id,
        text || ' contact user' || doc_id || '@Example-Mail.org or admin'
             || doc_id || '@ex.io ip 10.0.' || (doc_id % 256) || '.7 acct '
             || (100000000 + doc_id * 7919) AS text
      FROM documents
    )
    SELECT doc_id,
      len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ipv4,
      len(regexp_extract_all(text, '[0-9]{9,}')) AS n_longnums,
      md5(regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
          '[0-9]{9,}', '<NUM>', 'g')) AS scrubbed_md5
    FROM withpii
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (corpus hygiene): deterministic emails / dotted
    quads / long account numbers appended per doc, counted then
    scrubbed by ``functions.web.scrub_pii`` — every regex
    RE2-compatible so the oracle replays the exact rewrites; the
    scrubbed text is compared by md5."""
    from sifr_project_java_ontology_processing_spark.functions.web import (
        pii_counts,
        scrub_pii,
    )

    d = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.lit(" contact user"), d.cast("string"), F.lit("@Example-Mail.org or admin"),
        d.cast("string"), F.lit("@ex.io ip 10.0."),
        (d % 256).cast("string"), F.lit(".7 acct "),
        (F.lit(100000000) + d * 7919).cast("string"),
    )
    n_em, n_ip, n_num = pii_counts(text)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        n_em.cast("bigint").alias("n_emails"),
        n_ip.cast("bigint").alias("n_ipv4"),
        n_num.cast("bigint").alias("n_longnums"),
        F.md5(scrub_pii(text)).alias("scrubbed_md5"),
    )


@register(
    "repetition_quality",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, t, len(t) AS n,
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ELSE CAST([] AS VARCHAR[]) END AS bg
      FROM toks
    )
    SELECT doc_id,
      round(CASE WHEN len(bg) = 0 THEN 0.0
            ELSE (len(bg) - len(list_distinct(bg))) / CAST(len(bg) AS DOUBLE)
            END, 6) AS dup_bigram_frac,
      round(CASE WHEN n = 0 THEN 0.0
            ELSE list_max(list_transform(list_distinct(t),
                          d -> len(list_filter(t, x -> x = d)))) / CAST(n AS DOUBLE)
            END, 6) AS top_token_frac
    FROM feats
    """,
)
def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (duplicate-bigram fraction,
    mode-token share) — map-only pure expressions, SQL-replayed."""
    from sifr_project_java_ontology_processing_spark.operators.textanalysis import (
        repetition_ratios,
    )

    return repetition_ratios(_t(spark, sf_dir, "documents"))


@register(
    "url_normalize",
    r"""
    WITH u AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 4 = 2
           THEN 'HTTPS://Ex' || (doc_id % 7) || '.COM:443'
           ELSE 'HTTP://WWW.Example' || (doc_id % 7) || '.COM:80' END)
        || '/A/b/' || doc_id
        || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
        || (CASE WHEN doc_id % 4 = 1 THEN '' ELSE
             '?id=' || doc_id
             || (CASE WHEN doc_id % 2 = 0
                 THEN '&utm_source=feed&utm_medium=rss' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0 THEN '&fbclid=AbC123' ELSE '' END)
           END)
        || '#frag' AS url
      FROM documents
    ),
    n1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS s FROM u),
    n2 AS (SELECT doc_id,
             CASE WHEN regexp_extract(s, '^([a-zA-Z][a-zA-Z0-9+.-]*://)', 1) = ''
                  THEN s
                  ELSE lower(regexp_extract(s, '^([a-zA-Z][a-zA-Z0-9+.-]*://)', 1))
                       || regexp_extract(s, '^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/?#]*@)', 2)
                       || lower(regexp_extract(s, '^([a-zA-Z][a-zA-Z0-9+.-]*://)(?:[^/?#]*@)?([^/?#]*)', 2))
                       || regexp_replace(s, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '')
             END AS s FROM n1),
    n3 AS (SELECT doc_id, regexp_replace(regexp_replace(s,
             '^(http://(?:[^/?#]*@)?[^/:?#]*):80((/|\?).*)?$', '\1\2'),
             '^(https://(?:[^/?#]*@)?[^/:?#]*):443((/|\?).*)?$', '\1\2') AS s FROM n2),
    n4 AS (SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(s,
               '&(utm_[a-zA-Z0-9_]+|gclid|fbclid)=[^&]*', '', 'g'),
               '\?(utm_[a-zA-Z0-9_]+|gclid|fbclid)=[^&]*&?', '?'),
               '[?]$', '') AS s FROM n3),
    n5 AS (SELECT doc_id, regexp_replace(s, '^([^?]*[^/?])/$', '\1') AS s FROM n4)
    SELECT doc_id, s AS url_norm,
           lower(regexp_extract(s, '^([a-zA-Z][a-zA-Z0-9+.-]*://)(?:[^/?#]*@)?([^/?#]*)', 2)) AS host
    FROM n5
    """,
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (training-data-pipeline key hygiene):
    deterministic messy URLs (case-variant hosts, default ports, utm/
    fbclid params, fragments, trailing slashes) synthesized per doc,
    canonicalized by ``functions.web.normalize_url`` — pure codegen
    column expressions, each regex RE2-compatible so DuckDB replays the
    exact rewrite chain."""
    from sifr_project_java_ontology_processing_spark.functions.web import (
        normalize_url,
        url_host,
    )

    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 4 == 2, F.concat(F.lit("HTTPS://Ex"), (d % 7).cast("string"), F.lit(".COM:443")))
        .otherwise(F.concat(F.lit("HTTP://WWW.Example"), (d % 7).cast("string"), F.lit(".COM:80"))),
        F.lit("/A/b/"),
        d.cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 1, F.lit("")).otherwise(
            F.concat(
                F.lit("?id="),
                d.cast("string"),
                F.when(d % 2 == 0, F.lit("&utm_source=feed&utm_medium=rss")).otherwise(F.lit("")),
                F.when(d % 5 == 0, F.lit("&fbclid=AbC123")).otherwise(F.lit("")),
            )
        ),
        F.lit("#frag"),
    )
    norm = normalize_url(url)
    return _t(spark, sf_dir, "documents").select(
        "doc_id", norm.alias("url_norm"), url_host(norm).alias("host")
    )


# Joined-path mention dictionary. Single-token labels share no token with
# the two-token phrases, and each phrase's two tokens are distinct — so the
# operator's greedy non-overlapping longest-match scan emits EVERY naive
# occurrence (no occurrence can start inside another match's span), making
# the count exactly replayable in SQL.
_JOINED_SINGLES = ["filter", "join", "window", "hash", "merge", "agg", "batch"]
_JOINED_PHRASES = [("slow", "scan"), ("big", "vector"), ("fast", "table")]

_JOINED_SINGLE_VALUES = ", ".join(f"('{w}')" for w in _JOINED_SINGLES)
_JOINED_PHRASE_VALUES = ", ".join(
    f"('{a} {b}', '{a}', '{b}')" for a, b in _JOINED_PHRASES
)


@register(
    "mention_detect_joined",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    singles(label) AS (VALUES {_JOINED_SINGLE_VALUES}),
    phrases(label, a, b) AS (VALUES {_JOINED_PHRASE_VALUES}),
    s_hits AS (
      SELECT doc_id, label,
             len(list_filter(t, x -> x = label)) AS n
      FROM toks CROSS JOIN singles
    ),
    p_hits AS (
      SELECT doc_id, label,
             len(list_filter(range(1, len(t)), i -> t[i] = a AND t[i+1] = b)) AS n
      FROM toks CROSS JOIN phrases
    ),
    all_hits AS (SELECT * FROM s_hits UNION ALL SELECT * FROM p_hits)
    SELECT doc_id, label, n AS n_mentions, n * length(label) AS span_chars
    FROM all_hits WHERE n > 0
    """,
)
def q_mention_detect_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 scale path: the REAL no-broadcast inverted-index mention
    detector (``detect_mentions_joined`` — token equi-join + cogrouped
    greedy resolve, label dim never collected/broadcast) run over the
    documents corpus with a mixed single/two-token dictionary, then
    aggregated per (doc, label). span_chars additionally pins the span
    arithmetic (text is single-space separated, so each phrase span is
    exactly ``len(label)`` chars)."""
    from sifr_project_java_ontology_processing_spark.operators.mentions import (
        detect_mentions_joined,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"), "text", "lang"
    )
    dict_rows = [(f"c:{w}", w, "pref", "en") for w in _JOINED_SINGLES] + [
        (f"c:{a} {b}", f"{a} {b}", "pref", "en") for a, b in _JOINED_PHRASES
    ]
    labels = spark.createDataFrame(
        dict_rows, "concept_iri string, label string, label_kind string, lang string"
    )
    mentions = detect_mentions_joined(spark, docs, labels, text_col="text")
    return mentions.groupBy(
        F.col("url").cast("bigint").alias("doc_id"),
        F.col("concept_iri").substr(F.lit(3), F.lit(1000)).alias("label"),
    ).agg(
        F.count("*").alias("n_mentions"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("span_chars"),
    )


@register(
    "regex_filter",
    """
    SELECT doc_id FROM documents
    WHERE regexp_matches(text, 'scan [a-z]+ filter')
    """,
)
def q_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4-family regex predicate pushed into the scan."""
    return (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").rlike("scan [a-z]+ filter"))
        .select("doc_id")
    )


@register(
    "lang_keep_drop",
    """
    WITH flagged AS (
      SELECT doc_id, source, lang,
             max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               OVER (PARTITION BY source) AS has_en
      FROM documents
    )
    SELECT doc_id, source, lang FROM flagged
    WHERE has_en = 0 OR lang = 'en' OR lang = ''
    """,
)
def q_lang_keep_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — the reference's multilingual cleaner
    (cli/OWLOntologyCleaner.java:169-247): within each group, if any row
    has the target lang, drop other langs (empty lang always kept)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    flagged = docs.withColumn(
        "has_en", F.max(F.when(F.col("lang") == "en", 1).otherwise(0)).over(w)
    )
    return flagged.where(
        (F.col("has_en") == 0) | (F.col("lang") == "en") | (F.col("lang") == "")
    ).select("doc_id", "source", "lang")


@register(
    "freq_share",
    """
    SELECT doc_id, source,
           round(n_chars / sum(n_chars) OVER (PARTITION BY source), 6) AS char_share
    FROM documents
    """,
)
def q_freq_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 — per-group frequency normalization
    (EHealth2017DictionaryToSkos.java:381-392) as a window sum."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    return docs.select(
        "doc_id",
        "source",
        F.round(F.col("n_chars") / F.sum("n_chars").over(w), 6).alias("char_share"),
    )


@register(
    "argmax_per_group",
    """
    SELECT source, lang AS top_lang, n AS n_docs FROM (
      SELECT source, lang, count(*) AS n,
             row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang ASC) AS rn
      FROM documents GROUP BY source, lang
    ) t WHERE rn = 1
    """,
)
def q_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — most-frequent-code argmax
    (EHealth2017DictionaryToSkos.java:318-343): deterministic tie-break
    by key asc, not hash order."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), F.col("n").alias("n_docs"))
    )


@register(
    "token_count",
    """
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ws_tokens,
           cast(list_sum(list_transform(
             list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> ''),
             x -> cast(ceil(len(x) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data accounting: whitespace tokens +
    a deterministic BPE-ish subword estimate (ceil(len/4) per word)."""
    from sifr_project_java_ontology_processing_spark.functions.text import (
        bpe_ish_token_count,
        word_count,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        word_count(F.col("text")).cast("bigint").alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("bigint").alias("bpe_ish_tokens"),
    )


@register(
    "quality_score",
    """
    WITH feats AS (
      SELECT doc_id,
        len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_tokens,
        len(text) AS n_chars_m,
        len(list_filter(str_split(text, ' '), x -> x IN ('the','a','of','and','to'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens,
           round(CASE WHEN n_tokens = 0 THEN 0.0
                 ELSE (n_chars_m - n_tokens + 1) / CAST(n_tokens AS DOUBLE) END, 6) AS avg_word_len,
           round(CASE WHEN n_tokens = 0 THEN 0.0
                 ELSE n_stop / CAST(n_tokens AS DOUBLE) END, 6) AS stopword_ratio
    FROM feats
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality features (length / stopword ratios) — the
    heuristic-quality-scoring stage of a training-data pipeline."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    stop = F.filter(
        F.split(F.col("text"), " "),
        lambda x: x.isin("the", "a", "of", "and", "to"),
    )
    n_tokens = F.size(toks)
    feats = docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.length("text").alias("n_chars_m"),
        F.size(stop).alias("n_stop"),
    )
    return feats.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.when(F.col("n_tokens") == 0, 0.0).otherwise(
                (F.col("n_chars_m") - F.col("n_tokens") + 1)
                / F.col("n_tokens").cast("double")
            ),
            6,
        ).alias("avg_word_len"),
        F.round(
            F.when(F.col("n_tokens") == 0, 0.0).otherwise(
                F.col("n_stop") / F.col("n_tokens").cast("double")
            ),
            6,
        ).alias("stopword_ratio"),
    )


# ===========================================================================
# Relational operator family (SURVEY §2.3-2.7) over TPC-H-ish tables
# ===========================================================================


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A9 family — hash aggregate with map-side partial agg
    (Catalyst automatic); filter pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "region_customer_count",
    """
    SELECT r_name, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name
    """,
)
def q_region_customer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J5 family — fact × two broadcast dims, then agg."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "fallback_cascade",
    """
    SELECT o_orderkey,
      CASE WHEN o_orderstatus = 'F' THEN o_orderpriority
           WHEN c_mktsegment IS NOT NULL THEN c_mktsegment
           ELSE 'UNKNOWN' END AS resolved,
      CASE WHEN o_orderstatus = 'F' THEN 'own'
           WHEN c_mktsegment IS NOT NULL THEN 'customer'
           ELSE 'none' END AS stage
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_fallback_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — coalesce-join fallback cascade with stage tag (the generic
    shape of the CUI cascade, over testdata)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    own = F.col("o_orderstatus") == "F"
    return j.select(
        "o_orderkey",
        F.when(own, F.col("o_orderpriority"))
        .when(F.col("c_mktsegment").isNotNull(), F.col("c_mktsegment"))
        .otherwise("UNKNOWN")
        .alias("resolved"),
        F.when(own, "own")
        .when(F.col("c_mktsegment").isNotNull(), "customer")
        .otherwise("none")
        .alias("stage"),
    )


@register(
    "window_top1",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
)
def q_window_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/O1 — deterministic top-1 per key (latest order; ties by key)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "preflabel_pick",
    """
    SELECT p_brand, p_name AS pref_label FROM (
      SELECT p_brand, p_name,
        row_number() OVER (PARTITION BY p_brand ORDER BY
          (CAST(len(regexp_replace(p_name, '[^A-ZÀ-ÖØ-Þ]', '', 'g')) AS DOUBLE)
             / len(p_name) < 0.25) DESC,
          len(p_name) ASC, p_name ASC) AS rn
      FROM part
    ) t WHERE rn = 1
    """,
)
def q_preflabel_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — the reference's prefLabel heuristic
    (EHealth2017DictionaryToSkos.java:404-425): shortest label whose
    uppercase-ish ratio < 0.25, fallback to any label."""
    from sifr_project_java_ontology_processing_spark.functions.text import uppercase_ratio

    p = _t(spark, sf_dir, "part")
    good = uppercase_ratio(F.col("p_name")) < 0.25
    w = Window.partitionBy("p_brand").orderBy(
        F.desc(good), F.asc(F.length("p_name")), F.asc("p_name")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("p_brand", F.col("p_name").alias("pref_label"))
    )


@register(
    "anti_join_orders",
    """
    SELECT o_orderkey FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def q_anti_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E3 — targeted removal as left_anti join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey")


@register(
    "range_join_buckets",
    """
    SELECT e.event_id, b.bucket
    FROM events e
    JOIN (VALUES ('low', 0.0, 5.0), ('mid', 5.0, 20.0), ('high', 20.0, 1e18))
         AS b(bucket, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    """,
)
def q_range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — value-vs-range theta join against a broadcast range table
    (chapter assignment, EHealth2017DictionaryToSkos.java:394-402)."""
    e = _t(spark, sf_dir, "events")
    b = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 1e18)],
        "bucket string, lo double, hi double",
    )
    return e.join(
        F.broadcast(b), (e.value >= b.lo) & (e.value < b.hi)
    ).select("event_id", "bucket")


@register(
    "label_concat",
    """
    SELECT r.r_name, string_agg(n.n_name, ' ' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_label_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A7 — deterministic sorted concat (prefLabel description)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(" ", F.sort_array(F.collect_list("n_name"))).alias("nations")
        )
    )


@register(
    "triple_pattern",
    """
    SELECT n.n_name AS subj, 'in_region' AS pred, r.r_name AS obj
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE n.n_name >= 'M'
    """,
)
def q_triple_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 — triple-pattern match (s-prefix, p fixed, ?o) over a
    triples view built from testdata."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    triples = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_name").alias("subj"),
        F.lit("in_region").alias("pred"),
        F.col("r_name").alias("obj"),
    )
    return triples.where(F.col("subj") >= "M")


@register(
    "code_normalize",
    """
    SELECT code, regexp_replace(code, '^([A-Z][0-9]{2})([0-9]{1,2})$', '\\1.\\2') AS normalized
    FROM (
      SELECT DISTINCT concat(upper(substr(p_brand, 1, 1)),
                             lpad(CAST(p_partkey % 100 AS VARCHAR), 2, '0'),
                             CAST(p_size % 10 AS VARCHAR)) AS code
      FROM part
    ) t
    """,
)
def q_code_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — ICD-10 compact-code normalization over synthesized codes."""
    from sifr_project_java_ontology_processing_spark.functions.text import normalize_code

    p = _t(spark, sf_dir, "part")
    codes = p.select(
        F.concat(
            F.upper(F.substring("p_brand", 1, 1)),
            F.lpad((F.col("p_partkey") % 100).cast("string"), 2, "0"),
            (F.col("p_size") % 10).cast("string"),
        ).alias("code")
    ).distinct()
    return codes.select("code", normalize_code(F.col("code")).alias("normalized"))


@register(
    "events_hourly",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream table — the
    batch twin of the Structured Streaming path (streaming/)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "sessionize_gap",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch(ts) - lag(epoch(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) > 1800
                  THEN 1 ELSE 0 END AS gap_flag
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization, batch twin of the applyInPandasWithState
    streaming operator (streaming/sessionize.py) — the previously
    SQL-ungated stateful op now has a DuckDB oracle for its batch
    semantics (lag + cumulative session ids)."""
    from sifr_project_java_ontology_processing_spark.streaming.sessionize import (
        sessionize_batch,
    )

    e = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = sessionize_batch(e, gap_seconds=1800)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "total_value",
    )


@register(
    "xsd_lang_literals",
    """
    SELECT lit,
           str_split(lit, '^^')[1] AS stripped,
           CASE WHEN regexp_matches(lit, '^"[^"]*"@[a-z][a-z]$')
                THEN regexp_extract(lit, '^"([^"]*)"@', 1) ELSE lit END AS value,
           CASE WHEN regexp_matches(lit, '^"[^"]*"@[a-z][a-z]$')
                THEN regexp_extract(lit, '@([a-z][a-z])$', 1) ELSE 'en' END AS lang
    FROM (
      SELECT CASE n_nationkey % 3
               WHEN 0 THEN n_name || '^^xsd:string'
               WHEN 1 THEN '"' || n_name || '"@fr'
               ELSE n_name END AS lit
      FROM nation
    ) t
    """,
)
def q_xsd_lang_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (XSD-type strip) + P6 (lang-literal parse, default 'en') over
    synthesized reference-style literal strings — previously unit-only."""
    from sifr_project_java_ontology_processing_spark.functions.text import (
        parse_lang_literal,
        strip_xsd_type,
    )

    n = _t(spark, sf_dir, "nation")
    lits = n.select(
        F.when(F.col("n_nationkey") % 3 == 0, F.concat("n_name", F.lit("^^xsd:string")))
        .when(F.col("n_nationkey") % 3 == 1, F.concat(F.lit('"'), "n_name", F.lit('"@fr')))
        .otherwise(F.col("n_name"))
        .alias("lit")
    )
    value, lang = parse_lang_literal(F.col("lit"))
    return lits.select(
        "lit",
        strip_xsd_type(F.col("lit")).alias("stripped"),
        value.alias("value"),
        lang.alias("lang"),
    )


@register(
    "cc_components_distributed",
    """
    WITH RECURSIVE
    edges AS (SELECT 'n:' || n_nationkey AS src, 'r:' || n_regionkey AS dst FROM nation),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, r) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.node
    )
    SELECT node AS iri, min(r) AS canonical_iri
    FROM reach GROUP BY node HAVING node <> min(r)
    """,
)
def q_cc_components_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED large-star/small-star CC path (driver_threshold=0
    forces it past the union-find shortcut) against the same
    recursive-CTE oracle as cc_components — the scale route is now
    oracle-gated, not just unit-tested."""
    from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
        connected_components,
    )

    n = _t(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    return connected_components(edges, driver_threshold=0)


# Shared CTE: documents wrapped as a MEDIA-shaped table with the
# deterministic fake decode (sha256-derived pseudo-metadata) replayed
# in SQL — gates the multimodal mapInPandas plumbing end-to-end.
_MEDIA_DECODE_CTE = """
    m AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             sha256(text) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    decoded AS (
      SELECT media_id, media_type,
             CASE WHEN media_type IN ('image', 'video')
                  THEN CAST(16 + CAST(('0x' || substr(h, 1, 4)) AS INT) % 4080 AS INT) END AS width,
             CASE WHEN media_type IN ('image', 'video')
                  THEN CAST(16 + CAST(('0x' || substr(h, 5, 4)) AS INT) % 2160 AS INT) END AS height,
             CASE WHEN media_type IN ('audio', 'video')
                  THEN CAST(CAST(('0x' || substr(h, 9, 6)) AS BIGINT) % 600000 AS INT) END AS duration_ms,
             h AS digest, n_bytes
      FROM m
    )
"""


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    )


@register(
    "multimodal_decode",
    f"""
    WITH {_MEDIA_DECODE_CTE}
    SELECT media_id, media_type, width, height, duration_ms, digest, n_bytes
    FROM decoded
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing (operators/multimodal.py): binary
    blobs → typed metadata via Arrow-batched mapInPandas with the
    deterministic fake decoder; the oracle replays the sha256-derived
    pseudo-decode in SQL, so schema/batching/threading are all gated."""
    from sifr_project_java_ontology_processing_spark.operators.multimodal import (
        decode_media,
    )

    dec = decode_media(_media_from_documents(spark, sf_dir))
    return dec.select(
        "media_id", "media_type", "width", "height", "duration_ms", "digest", "n_bytes"
    )


@register(
    "multimodal_frame_plan",
    f"""
    WITH {_MEDIA_DECODE_CTE}
    SELECT media_id, CAST(i * 1000 AS BIGINT) AS frame_ts_ms
    FROM decoded, UNNEST(range(0, least(duration_ms // 1000 + 1, 16))) AS t(i)
    WHERE media_type = 'video' AND duration_ms IS NOT NULL
    """,
)
def q_multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (pure Catalyst sequence+explode): one
    row per frame timestamp to decode downstream."""
    from sifr_project_java_ontology_processing_spark.operators.multimodal import (
        decode_media,
        frame_sample_plan,
    )

    dec = decode_media(_media_from_documents(spark, sf_dir))
    out = frame_sample_plan(dec, every_ms=1000, max_frames=16)
    return out.select("media_id", F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"))


# ===========================================================================
# Training-data ops: dedup / similarity / fingerprints (operators/dedup.py,
# operators/similarity.py, operators/textanalysis.py)
# ===========================================================================

# Shared DuckDB shingle CTE (word 5-grams, distinct per doc) — mirrors
# operators.dedup.shingle_array semantics exactly.
_SHINGLE_CTE = """
    toks AS (SELECT doc_id, text, list_filter(str_split(text, ' '), x -> x <> '') AS ts
             FROM documents),
    sh0 AS (SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS shingle
            FROM toks, UNNEST(range(1, greatest(len(ts) - 3, 1))) AS u(i)),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)
"""


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keeper
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifr_project_java_ontology_processing_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLE_CTE},
    hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1000),
    shc AS (SELECT doc_id, shingle FROM sh
            WHERE shingle NOT IN (SELECT shingle FROM hot)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM shc a JOIN shc b ON a.shingle = b.shingle
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(i / CAST(sa.n_sh + sb.n_sh - i AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE i / CAST(sa.n_sh + sb.n_sh - i AS DOUBLE) >= 0.2
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped Jaccard with the SAME stop-shingle cap (df > 1000) on
    both sides — the oracle diverging from the operator's default at
    scale was a round-2 review finding; now the cap is part of the
    spec, not a silent Spark-side approximation."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.2, max_shingle_df=1000
    )


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_SHINGLE_CTE},
    seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
    mh AS (SELECT doc_id, seed,
                  min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
           FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 2 AS band,
                     md5(CAST(seed // 2 AS VARCHAR) || '|' ||
                         string_agg(mh, '|' ORDER BY seed)) AS bucket
              FROM mh GROUP BY doc_id, seed // 2)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
    WHERE a.doc_id < b.doc_id
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), n=5, k=8, bands=4)


@register(
    "fuzzy_decontaminate",
    f"""
    WITH {_SHINGLE_CTE},
    seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
    mh AS (SELECT doc_id, seed,
                  min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
           FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 2 AS band,
                     md5(CAST(seed // 2 AS VARCHAR) || '|' ||
                         string_agg(mh, '|' ORDER BY seed)) AS bucket
              FROM mh GROUP BY doc_id, seed // 2),
    cands AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS bench_id
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket
              WHERE b.doc_id % 17 = 0),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_id, c.bench_id, count(*) AS i
              FROM cands c
              JOIN sh d ON d.doc_id = c.doc_id
              JOIN sh b ON b.doc_id = c.bench_id AND b.shingle = d.shingle
              GROUP BY c.doc_id, c.bench_id),
    jacs AS (SELECT i.doc_id,
                    max(round(i.i / CAST(sd.n_sh + sb.n_sh - i.i AS DOUBLE), 6)) AS mj
             FROM inter i
             JOIN sizes sd ON sd.doc_id = i.doc_id
             JOIN sizes sb ON sb.doc_id = i.bench_id
             GROUP BY i.doc_id)
    SELECT d.doc_id,
           coalesce(j.mj, 0.0) AS max_jaccard,
           coalesce(j.mj, 0.0) >= 0.5 AS is_fuzzy_contaminated
    FROM documents d LEFT JOIN jacs j USING (doc_id)
    """,
)
def q_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (near-duplicate) decontamination vs the same every-17th-doc
    benchmark as `decontaminate`: cross-corpus banded MinHash-LSH
    candidates → exact Jaccard verify → per-doc max. The md5-derived
    signatures make the whole path SQL-replayable."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        fuzzy_decontaminate,
    )

    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 17 == 0)
    return fuzzy_decontaminate(docs, benchmark, n=5, k=8, bands=4, threshold=0.5)


# Shared DuckDB CTE computing the md5-derived 60-bit SimHash signature —
# bit-for-bit the same as operators.dedup.simhash_md5.
_SIMHASH_SIG_CTE = """
    stoks AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(list_filter(str_split(text, ' '), x -> x <> ''))) AS tok
      FROM documents
    ),
    sh_h AS (SELECT doc_id, md5(tok) AS hx FROM stoks),
    sh_bits AS (
      SELECT doc_id, b,
             ((strpos('0123456789abcdef', substr(hx, b // 4 + 1, 1)) - 1) >> (b % 4)) & 1 AS bit
      FROM sh_h, UNNEST(range(0, 60)) AS t(b)
    ),
    sh_votes AS (SELECT doc_id, b, sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
                 FROM sh_bits GROUP BY 1, 2),
    sh_sig AS (SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
               FROM sh_votes GROUP BY doc_id)
"""


@register(
    "dedup_simhash",
    f"""
    WITH {_SIMHASH_SIG_CTE}
    SELECT doc_a, doc_b, hamming FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sh_sig a JOIN sh_sig b ON a.doc_id < b.doc_id
    ) t WHERE hamming <= 3
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on the oracle-replayable md5 signature:
    Spark generates candidates via 4×15-bit banded buckets (pigeonhole-
    exact for hamming ≤ 3) + popcount verify; the oracle checks ALL
    pairs — equality proves the banding loses nothing."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        simhash_md5,
        simhash_neardup_pairs,
    )

    sig = simhash_md5(_t(spark, sf_dir, "documents"))
    out = simhash_neardup_pairs(
        signatures=sig, max_hamming=3, prefix_bands=4, bits=60
    )
    return out.select("doc_a", "doc_b", F.col("hamming").cast("bigint").alias("hamming"))


@register(
    "embedding_decontaminate",
    """
    SELECT a.vec_id,
           round(max(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))), 6)
             AS max_cos,
           round(max(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))), 6)
             >= 0.99 AS is_semantic_contaminated
    FROM embeddings a CROSS JOIN embeddings b
    WHERE b.vec_id % 17 = 0
    GROUP BY a.vec_id
    """,
)
def q_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination vs the every-17th-vector benchmark:
    broadcast benchmark matrix + blocked GEMM per corpus partition
    (map-only); the oracle checks the exact max-cosine per vector."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        embedding_decontaminate,
    )

    emb = _t(spark, sf_dir, "embeddings")
    benchmark = emb.where(F.col("vec_id") % 17 == 0)
    return embedding_decontaminate(emb, benchmark, threshold=0.99)


@register(
    "ann_cosine_topk",
    """
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT qa AS query_id, vb AS neighbor_id, cs AS cos_sim,
             row_number() OVER (PARTITION BY qa ORDER BY cs DESC, vb ASC) AS rank
      FROM (
        SELECT a.vec_id AS qa, b.vec_id AS vb,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS cs
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
      ) s
    ) t WHERE rank <= 5
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # mode pinned: testdata embeddings are dimension-sized, so the
    # broadcast-GEMM path is the right plan AND the sizing count() job
    # disappears (deterministic plan for the bench)
    out = brute_force_topk(emb, queries_df, k=5, mode="broadcast")
    # bigint rank: DuckDB row_number() type
    return out.select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))


# Inline UMLS-term dim for the -mc match-fallback gate: each CUI's term
# shares tokens with some documents (LABELS words appear in doc text).
_MF_TERMS = [
    (f"X{i}", f"C{7000000 + i:07d}", "ENG",
     f"{label} {LABELS[(i + 2) % len(LABELS)]} data processing")
    for i, label in enumerate(LABELS)
]
_MF_VALUES = ", ".join(f"('{cui}', '{s}')" for (_c, cui, _l, s) in _MF_TERMS)


@register(
    "umls_match_fallback",
    f"""
    WITH terms(cui, term) AS (VALUES {_MF_VALUES}),
    d AS (SELECT CAST(doc_id AS VARCHAR) AS concept_iri, text AS description
          FROM documents),
    dt AS (SELECT concept_iri,
                  unnest(list_distinct(list_filter(str_split(lower(description), ' '),
                                                   x -> x <> ''))) AS tok
           FROM d),
    tt AS (SELECT cui,
                  unnest(list_distinct(list_filter(str_split(lower(term), ' '),
                                                   x -> x <> ''))) AS tok
           FROM terms),
    ov AS (SELECT dt.concept_iri, tt.cui, count(*) AS overlap
           FROM dt JOIN tt USING (tok) GROUP BY 1, 2),
    short AS (SELECT concept_iri, cui,
                     row_number() OVER (PARTITION BY concept_iri
                                        ORDER BY overlap DESC, cui ASC) AS rn
              FROM ov),
    scored AS (
      SELECT s.concept_iri, s.cui,
        0.7 * (CAST(len(list_intersect(
                 list_distinct(list_filter(str_split(lower(d.description), ' '), x -> x <> '')),
                 list_distinct(list_filter(str_split(lower(t.term), ' '), x -> x <> ''))))
               AS DOUBLE)
          / (len(list_intersect(
                 list_distinct(list_filter(str_split(lower(d.description), ' '), x -> x <> '')),
                 list_distinct(list_filter(str_split(lower(t.term), ' '), x -> x <> ''))))
             + 1.0 * len(list_filter(
                 list_distinct(list_filter(str_split(lower(d.description), ' '), x -> x <> '')),
                 x -> NOT list_contains(
                   list_distinct(list_filter(str_split(lower(t.term), ' '), x -> x <> '')), x)))
             + 0.5 * len(list_filter(
                 list_distinct(list_filter(str_split(lower(t.term), ' '), x -> x <> '')),
                 x -> NOT list_contains(
                   list_distinct(list_filter(str_split(lower(d.description), ' '), x -> x <> '')), x)))))
        + 0.3 * (1.0 - levenshtein(lower(d.description), lower(t.term))
                 / CAST(greatest(len(d.description), len(t.term), 1) AS DOUBLE)) AS score
      FROM short s
      JOIN d ON d.concept_iri = s.concept_iri
      JOIN terms t ON t.cui = s.cui
      WHERE s.rn <= 50
    ),
    winners AS (
      SELECT concept_iri, cui FROM (
        SELECT concept_iri, cui, score,
               row_number() OVER (PARTITION BY concept_iri
                                  ORDER BY score DESC, cui ASC) AS wrn
        FROM scored) t WHERE wrn = 1 AND score > 0
    )
    SELECT d.concept_iri,
           coalesce(w.cui, '') AS cuis,
           CASE WHEN w.cui IS NOT NULL THEN 'matched_umls_fallback'
                ELSE 'remaining_without_cui' END AS cui_stage,
           w.cui IS NOT NULL AS matched
    FROM d LEFT JOIN winners w ON d.concept_iri = w.concept_iri
    """,
)
def q_umls_match_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-mc gate (OntologyCUIProcessor.java:149-152 semantics): every
    document plays a cascade-rejected concept; its text is the concept
    description scored against the full inline UMLS term dim via the
    token inverted index + Tversky/levenshtein blend. The oracle
    replicates the whole path in SQL (DuckDB levenshtein + list ops)."""
    from sifr_project_java_ontology_processing_spark.operators.scoring import (
        match_fallback,
    )

    docs = _t(spark, sf_dir, "documents")
    cascade_out = docs.select(
        F.col("doc_id").cast("string").alias("concept_iri"),
        F.lit(None).cast("string").alias("code"),
        F.array().cast("array<string>").alias("cuis"),
        F.lit("remaining_without_cui").alias("cui_stage"),
    )
    descriptions = docs.select(
        F.col("doc_id").cast("string").alias("concept_iri"),
        F.col("text").alias("description"),
    )
    umls = spark.createDataFrame(
        _MF_TERMS, "code string, cui string, lat string, str string"
    )
    out = match_fallback(cascade_out, descriptions, umls)
    return out.select(
        "concept_iri",
        F.concat_ws("|", "cuis").alias("cuis"),
        "cui_stage",
        "matched",
    )


# Candidate concept descriptions for TF-IDF link scoring: each label's
# description overlaps its own name, the next label, and shared filler.
_DESC_ROWS = [
    (label, f"{label} {LABELS[(i + 1) % len(LABELS)]} pipeline stage")
    for i, label in enumerate(LABELS)
]
_DESC_VALUES = ", ".join(f"('{c}', '{d}')" for c, d in _DESC_ROWS)


@register(
    "tfidf_link_score",
    f"""
    WITH labels(concept, descr) AS (VALUES {_DESC_VALUES}),
    dtok AS (SELECT doc_id, unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS token
             FROM documents),
    dtf AS (SELECT doc_id, token, count(*) AS tf FROM dtok GROUP BY 1, 2),
    dfreq AS (SELECT token, count(*) AS df FROM dtf GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM documents),
    idf AS (SELECT token, ln((n + 1.0) / (df + 1.0)) + 1.0 AS idf FROM dfreq, nn),
    dv0 AS (SELECT doc_id, token, tf * idf AS w FROM dtf JOIN idf USING (token)),
    dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM dv0 GROUP BY 1),
    dv AS (SELECT doc_id, token, w / nm AS w FROM dv0 JOIN dnorm USING (doc_id)),
    ctok AS (SELECT concept, unnest(list_filter(str_split(lower(descr), ' '), x -> x <> '')) AS token
             FROM labels),
    ctf AS (SELECT concept, token, count(*) AS tf FROM ctok GROUP BY 1, 2),
    cv0 AS (SELECT concept, token, tf * idf AS w FROM ctf JOIN idf USING (token)),
    cnorm AS (SELECT concept, sqrt(sum(w * w)) AS nm FROM cv0 GROUP BY 1),
    cv AS (SELECT concept, token, w / nm AS w FROM cv0 JOIN cnorm USING (concept)),
    cand AS (SELECT d.doc_id, l.concept FROM documents d JOIN labels l
             ON len(list_filter(str_split(d.text, ' '), x -> x = l.concept)) > 0),
    score AS (SELECT dv.doc_id, cv.concept, sum(dv.w * cv.w) AS cos
              FROM dv JOIN cv USING (token) GROUP BY 1, 2)
    SELECT c.doc_id, c.concept AS concept_iri,
           round(coalesce(s.cos, 0.0), 6) AS tfidf_cosine
    FROM cand c LEFT JOIN score s
      ON c.doc_id = s.doc_id AND c.concept = s.concept
    """,
)
def q_tfidf_link_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_star link scorer, TF-IDF half (operators/linkscore.py):
    cosine between the document's TF-IDF context vector and each
    candidate concept description's vector, IDF from the same corpus.
    Candidates = exact-token mention hits (the J9 shape)."""
    from sifr_project_java_ontology_processing_spark.operators.linkscore import (
        tfidf_link_scores,
    )

    docs = _t(spark, sf_dir, "documents")
    descriptions = spark.createDataFrame(
        _DESC_ROWS, "concept_iri string, description string"
    )
    labels = spark.createDataFrame([(l,) for l in LABELS], "concept_iri string")
    candidates = (
        docs.crossJoin(F.broadcast(labels))
        .where(
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda x: x == F.col("concept_iri"))
            )
            > 0
        )
        .select("doc_id", "concept_iri")
    )
    return tfidf_link_scores(docs, candidates, descriptions)


@register(
    "rdf_roundtrip",
    """
    SELECT 'http://ex/n/' || n_name AS subj, p.pred AS pred,
           CASE p.pred
             WHEN 'http://ex/p/in_region' THEN 'http://ex/r/' || CAST(n_regionkey AS VARCHAR)
             WHEN 'http://ex/p/label' THEN n_name
             ELSE n_name || ' has "quotes" and \\ and ' || chr(9) || chr(10) || 'end'
           END AS obj,
           CASE p.pred WHEN 'http://ex/p/label' THEN 'en' END AS obj_lang,
           p.pred <> 'http://ex/p/in_region' AS obj_is_literal
    FROM nation
    CROSS JOIN (VALUES ('http://ex/p/in_region'), ('http://ex/p/label'),
                       ('http://ex/p/note')) AS p(pred)
    """,
)
def q_rdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S8 round-trip: triples built from nation → N-Triples line
    serialization (rdf_sink) → parsed back (rdf_io), including the
    escaping gauntlet (quotes, backslash, tab, newline). The oracle is
    the ORIGINAL triple set — a hash match proves format∘parse is the
    identity."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        parse_ntriples_lines,
    )
    from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
        to_ntriples_lines,
    )

    n = _t(spark, sf_dir, "nation")
    subj = F.concat(F.lit("http://ex/n/"), F.col("n_name"))
    iri_t = n.select(
        subj.alias("subj"),
        F.lit("http://ex/p/in_region").alias("pred"),
        F.concat(F.lit("http://ex/r/"), F.col("n_regionkey").cast("string")).alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
    )
    lang_t = n.select(
        subj.alias("subj"),
        F.lit("http://ex/p/label").alias("pred"),
        F.col("n_name").alias("obj"),
        F.lit("en").alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
    )
    gnarly = n.select(
        subj.alias("subj"),
        F.lit("http://ex/p/note").alias("pred"),
        F.concat(F.col("n_name"), F.lit(' has "quotes" and \\ and \t\nend')).alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("src_url"),
    )
    triples = iri_t.unionByName(lang_t).unionByName(gnarly)
    lines = to_ntriples_lines(triples)
    return parse_ntriples_lines(lines, "line").select(
        "subj", "pred", "obj", "obj_lang", "obj_is_literal"
    )


def _lsh_planes_values(dim: int, n_planes: int) -> str:
    """Inline the deterministic md5-derived hyperplanes as DuckDB list
    literals so the oracle replays the exact bucket assignment (the
    planes are pure Python constants — no RNG, no engine hashing)."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        _hyperplane,
    )

    rows = []
    for p in range(n_planes):
        vs = ", ".join(repr(v) for v in _hyperplane(dim, p))
        rows.append(f"({p}, [{vs}])")
    return ", ".join(rows)


@register(
    "ann_lsh_topk",
    f"""
    WITH planes(p, vs) AS (VALUES {_lsh_planes_values(64, 4)}),
    bucketed AS (
      SELECT e.vec_id, e.embedding,
             CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65),
                    i -> CAST(e.embedding[i] AS DOUBLE) * pl.vs[i])) >= 0
                  THEN 1 << pl.p ELSE 0 END) AS INT) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, e.embedding
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id ASC) AS rank
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 8
    ) t WHERE rank <= 5
    """,
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifr_project_java_ontology_processing_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(emb, queries_df, dim=64, k=5, n_planes=4)
    return out.select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))


@register(
    "ann_ivf_topk",
    """
    WITH cents AS (
      SELECT embedding AS cvec,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cidx
      FROM embeddings
      QUALIFY cidx <= 16
    ),
    allsims AS (
      SELECT e.vec_id, e.embedding, c.cidx,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                     CAST(c.cvec AS DOUBLE[])), 9) DESC,
                        c.cidx ASC) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, embedding, cidx FROM allsims WHERE rn = 1),
    probes AS (SELECT vec_id, embedding, cidx FROM allsims WHERE vec_id < 8 AND rn <= 4)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                     CAST(a.embedding AS DOUBLE[])), 6) DESC,
                        a.vec_id ASC) AS rank
      FROM (SELECT DISTINCT vec_id, embedding, cidx FROM probes) p
      JOIN assign a ON a.cidx = p.cidx AND a.vec_id <> p.vec_id
    ) t WHERE rank <= 5
    """,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k: md5-deterministic centroid pick,
    nearest-cell assignment, nprobe=4 probing, exact rank within
    candidates — the oracle recomputes the identical index in SQL."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, queries_df, dim=64, k=5, m=16, nprobe=4)
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank")
    )


@register(
    "embedding_neardup",
    """
    SELECT vec_a, vec_b, cos_sim FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) t WHERE cos_sim >= 0.3
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        neardup_pairs,
    )

    return neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, mode="broadcast"
    )


@register(
    "doc_fingerprint",
    f"""
    WITH {_SHINGLE_CTE},
    fp AS (SELECT doc_id, min(md5(shingle)) AS f FROM sh GROUP BY doc_id)
    SELECT d.doc_id, coalesce(fp.f, md5(d.text)) AS fingerprint
    FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifr_project_java_ontology_processing_spark.operators.textanalysis import (
        doc_fingerprint,
    )

    return doc_fingerprint(_t(spark, sf_dir, "documents"))


@register(
    "doc_rolling_hash",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(str_split(text, ' '), x -> x <> ''),
                 t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
    FROM documents
    """,
)
def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive Karp–Rabin-style rolling fingerprint (the task
    mandate's 'document fingerprinting (rolling hash)' — the
    min-shingle doc_fingerprint is its order-insensitive sibling)."""
    from sifr_project_java_ontology_processing_spark.operators.textanalysis import (
        rolling_fingerprint,
    )

    return rolling_fingerprint(_t(spark, sf_dir, "documents"))


@register(
    "lang_id",
    """
    WITH c AS (
      SELECT doc_id,
        len(list_filter(str_split(lower(text),' '), x -> x IN ('the','and','of','to','a'))) AS c_en,
        len(list_filter(str_split(lower(text),' '), x -> x IN ('le','la','et','les','des'))) AS c_fr,
        len(list_filter(str_split(lower(text),' '), x -> x IN ('der','und','die','das','ein'))) AS c_de,
        len(list_filter(str_split(lower(text),' '), x -> x IN ('el','los','las','una','y'))) AS c_es
      FROM documents)
    SELECT doc_id,
      CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
           WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
           WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
           WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
           ELSE 'fr' END AS pred_lang,
      CAST(greatest(c_de, c_en, c_es, c_fr) AS BIGINT) AS marker_hits
    FROM c
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifr_project_java_ontology_processing_spark.operators.textanalysis import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


@register(
    "cc_components",
    """
    WITH RECURSIVE
    edges AS (SELECT 'n:' || n_nationkey AS src, 'r:' || n_regionkey AS dst FROM nation),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, r) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.node
    )
    SELECT node AS iri, min(r) AS canonical_iri
    FROM reach GROUP BY node HAVING node <> min(r)
    """,
)
def q_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (large-star/small-star iterative self-joins)
    on the nation–region bipartite graph; oracle = recursive-CTE
    reachability min-label."""
    from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
        connected_components,
    )

    n = _t(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    return connected_components(edges)


@register(
    "salted_hot_counts",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
)
def q_salted_hot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (north_rule skew handling): the
    5 hot event_type keys would each land on one reducer in a naive
    plan; salted_count spreads each across 16 buckets first. The oracle
    is the plain GROUP BY — results must be identical."""
    from sifr_project_java_ontology_processing_spark.operators.canonicalize import (
        salted_count,
    )

    return salted_count(_t(spark, sf_dir, "events"), ["event_type"], salt_buckets=16)


@register(
    "minhash_signatures",
    f"""
    WITH {_SHINGLE_CTE},
    seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
    mh AS (SELECT doc_id, seed,
                  min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
           FROM sh CROSS JOIN seeds GROUP BY doc_id, seed)
    SELECT doc_id, string_agg(mh, '|' ORDER BY seed) AS sig
    FROM mh GROUP BY doc_id
    """,
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (portable md5 family), serialized
    for engine-agnostic comparison."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        minhash_signatures,
    )

    sigs = minhash_signatures(_t(spark, sf_dir, "documents"), n=5, k=8)
    return sigs.select("doc_id", F.concat_ws("|", F.col("sig")).alias("sig"))


@register(
    "dedup_simhash_md5",
    f"""
    WITH {_SIMHASH_SIG_CTE}
    SELECT doc_id, simhash FROM sh_sig
    """,
)
def q_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-replayable SimHash signature (md5-derived bits); the
    xxhash64 near-dup pair variant remains as dedup_simhash."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import simhash_md5

    return simhash_md5(_t(spark, sf_dir, "documents"))


# MinHash-LSH candidate pairs as a reusable CTE (identical to the
# dedup_minhash_lsh oracle) — the front half of the LSH→verify path.
_LSH_CAND_CTE = f"""
    {_SHINGLE_CTE},
    seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
    mh AS (SELECT doc_id, seed,
                  min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
           FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (SELECT doc_id, seed // 2 AS band,
                     md5(CAST(seed // 2 AS VARCHAR) || '|' ||
                         string_agg(mh, '|' ORDER BY seed)) AS bucket
              FROM mh GROUP BY doc_id, seed // 2),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
             WHERE a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
              FROM cand c
              JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
              GROUP BY 1, 2),
    verified AS (
      SELECT i.doc_a, i.doc_b,
             round(i.i / CAST(sa.n_sh + sb.n_sh - i.i AS DOUBLE), 6) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE i.i / CAST(sa.n_sh + sb.n_sh - i.i AS DOUBLE) >= 0.2)
"""


@register(
    "dedup_lsh_verified",
    f"""
    WITH {_LSH_CAND_CTE}
    SELECT doc_a, doc_b, jaccard FROM verified
    """,
)
def q_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical scale path for near-dup: MinHash-LSH candidate
    generation → exact Jaccard verify on candidates ONLY. No
    shingle×shingle self-join anywhere in the plan (asserted by
    tests/test_plans.py) — shuffle is bounded by |candidates|."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        jaccard_verify,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    cands = minhash_lsh_pairs(docs, n=5, k=8, bands=4)
    return jaccard_verify(docs, cands, n=5, threshold=0.2)


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_LSH_CAND_CTE},
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM verified
            UNION SELECT doc_b, doc_a FROM verified),
    reach(node, r) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.node
    ),
    canon AS (SELECT node, min(r) AS c FROM reach GROUP BY node)
    SELECT d.doc_id,
           coalesce(m.c, d.doc_id) AS keeper,
           (coalesce(m.c, d.doc_id) = d.doc_id) AS is_kept
    FROM documents d LEFT JOIN canon m ON d.doc_id = m.node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: LSH candidates → exact-Jaccard verify →
    connected components → per-cluster min-id keeper + kept/dropped
    view over the whole corpus. Oracle replays components with a
    recursive reachability CTE."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        dedup_clusters,
        jaccard_verify,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    verified = jaccard_verify(
        docs, minhash_lsh_pairs(docs, n=5, k=8, bands=4), n=5, threshold=0.2
    )
    return dedup_clusters(docs, verified)


@register(
    "turtle_full_parse",
    """
    SELECT 'http://ex/n/' || n_name AS subj, p.pred AS pred,
           CASE p.pred
             WHEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
               THEN 'http://www.w3.org/2004/02/skos/core#Concept'
             WHEN 'http://www.w3.org/2004/02/skos/core#prefLabel' THEN n_name
             WHEN 'http://www.w3.org/2004/02/skos/core#altLabel'
               THEN 'alias ' || n_name
             WHEN 'http://ex/p/region'
               THEN 'http://ex/r/' || CAST(n_regionkey AS VARCHAR)
             ELSE CAST(n_nationkey AS VARCHAR)
           END AS obj,
           CASE p.pred
             WHEN 'http://www.w3.org/2004/02/skos/core#prefLabel' THEN 'en'
             WHEN 'http://www.w3.org/2004/02/skos/core#altLabel' THEN 'fr'
           END AS obj_lang,
           p.pred NOT IN ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                          'http://ex/p/region') AS obj_is_literal
    FROM nation
    CROSS JOIN (VALUES
      ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
      ('http://www.w3.org/2004/02/skos/core#prefLabel'),
      ('http://www.w3.org/2004/02/skos/core#altLabel'),
      ('http://ex/p/region'),
      ('http://ex/p/key')) AS p(pred)
    """,
)
def q_turtle_full_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-Turtle parser gate (S1 tail, round-3 VERDICT #2): each
    nation row is rendered as a MULTI-LINE Turtle document with ';'/','
    continuations, @prefix declarations, a langtagged literal pair, a
    datatyped literal and numeric shorthand, then parsed back by the
    real tokenizer+recursive-descent parser (rdf_io.parse_turtle_text)
    inside mapInPandas — distributed, one doc per row. The oracle is
    the original row set: a hash match proves render∘parse identity."""
    import pandas as pd

    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        parse_turtle_text,
    )

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")

    def _render_parse(it):
        cols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "src_url"]
        for pdf in it:
            rows: list[tuple] = []
            for key, name, rk in zip(
                pdf["n_nationkey"], pdf["n_name"], pdf["n_regionkey"]
            ):
                doc = (
                    "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
                    "@prefix ex: <http://ex/p/> .\n"
                    f"<http://ex/n/{name}> a skos:Concept ;\n"
                    f'    skos:prefLabel "{name}"@en ;\n'
                    f'    skos:altLabel "alias {name}"@fr ;\n'
                    f"    ex:region <http://ex/r/{rk}> ;\n"
                    f"    ex:key {key} .\n"
                )
                rows.extend(parse_turtle_text(doc, None))
            yield pd.DataFrame(rows, columns=cols)

    out = n.mapInPandas(
        _render_parse,
        schema="subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string",
    )
    return out.select("subj", "pred", "obj", "obj_lang", "obj_is_literal")


def _synth_media_blob(doc_id: int) -> tuple[str, bytes]:
    """Deterministic REAL container bytes per doc: even ids → an 8-bit
    RGB PNG sized (1 + id%64, 1 + id%48); odd ids → a mono 16-bit
    8 kHz WAV with 800 + (id%100)*80 frames. Stdlib-only, executor-side."""
    import io
    import struct
    import wave
    import zlib

    if doc_id % 2 == 0:
        w, h = 1 + doc_id % 64, 1 + doc_id % 48

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
        return "image", (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )
    frames = 800 + (doc_id % 100) * 80
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(b"\x00\x00" * frames)
    return "audio", buf.getvalue()


@register(
    "multimodal_real_decode",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           CASE WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 64 AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 48 AS INT) END AS height,
           CASE WHEN doc_id % 2 = 1
                THEN CAST((800 + (doc_id % 100) * 80) * 1000 // 8000 AS INT)
           END AS duration_ms
    FROM documents
    """,
)
def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec-path gate (round-3 VERDICT #7): genuine PNG and WAV
    container bytes are synthesized per document on the executors
    (stdlib-only), then decoded by ``real_decoder`` — actual IHDR and
    RIFF parsing, not the sha256 pseudo-decode. The oracle replays the
    generating formulas, so a decoder regression (wrong endianness,
    off-by-one in the marker walk, frames/rate math) hash-mismatches."""
    import pandas as pd

    from sifr_project_java_ontology_processing_spark.operators.multimodal import (
        decode_media,
        real_decoder,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def _synth(it):
        for pdf in it:
            ids, types, blobs = [], [], []
            for did in pdf["doc_id"]:
                mtype, blob = _synth_media_blob(int(did))
                ids.append(did)
                types.append(mtype)
                blobs.append(blob)
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "content": blobs}
            )

    media = docs.mapInPandas(
        _synth, schema="media_id long, media_type string, content binary"
    )
    return decode_media(media, real_decoder).select(
        "media_id", "media_type", "width", "height", "duration_ms"
    )


@register(
    "rdfxml_full_parse",
    """
    SELECT 'http://ex/n/' || n_name AS subj, p.pred AS pred,
           CASE p.pred
             WHEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
               THEN 'http://www.w3.org/2002/07/owl#Class'
             WHEN 'http://www.w3.org/2004/02/skos/core#prefLabel' THEN n_name
             WHEN 'http://ex/p/region'
               THEN 'http://ex/r/' || CAST(n_regionkey AS VARCHAR)
             ELSE 'note <b>' || n_name || '</b> end'
           END AS obj,
           CASE p.pred
             WHEN 'http://www.w3.org/2004/02/skos/core#prefLabel' THEN 'en'
           END AS obj_lang,
           p.pred NOT IN ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                          'http://ex/p/region') AS obj_is_literal
    FROM nation
    CROSS JOIN (VALUES
      ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
      ('http://www.w3.org/2004/02/skos/core#prefLabel'),
      ('http://ex/p/region'),
      ('http://ex/p/note')) AS p(pred)
    """,
)
def q_rdfxml_full_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF/XML reader gate (S12 tail): each nation row rendered as an
    RDF/XML document — typed node element, xml:lang literal,
    rdf:resource and a parseType="Literal" property with inner markup —
    parsed back by the SAX reader inside mapInPandas (distributed, one
    doc per row). The oracle is the original row set; a hash match
    proves render∘parse identity incl. the XMLLiteral capture."""
    import pandas as pd

    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        _parse_rdfxml_bytes,
    )

    n = _t(spark, sf_dir, "nation").select("n_name", "n_regionkey")

    def _render_parse(it):
        cols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "src_url"]
        for pdf in it:
            rows: list[tuple] = []
            for name, rk in zip(pdf["n_name"], pdf["n_regionkey"]):
                doc = (
                    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
                    ' xmlns:skos="http://www.w3.org/2004/02/skos/core#"'
                    ' xmlns:owl="http://www.w3.org/2002/07/owl#"'
                    ' xmlns:ex="http://ex/p/">'
                    f'<owl:Class rdf:about="http://ex/n/{name}">'
                    f'<skos:prefLabel xml:lang="en">{name}</skos:prefLabel>'
                    f'<ex:region rdf:resource="http://ex/r/{rk}"/>'
                    f'<ex:note rdf:parseType="Literal">note <b>{name}</b> end</ex:note>'
                    "</owl:Class></rdf:RDF>"
                )
                rows.extend(_parse_rdfxml_bytes(doc.encode(), None))
            yield pd.DataFrame(rows, columns=cols)

    out = n.mapInPandas(
        _render_parse,
        schema="subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string",
    )
    return out.select("subj", "pred", "obj", "obj_lang", "obj_is_literal")


@register(
    "turtle_sink_roundtrip",
    """
    SELECT 'http://ex/n/' || n_name AS subj, p.pred AS pred,
           CASE p.pred
             WHEN 'http://ex/p/in_region' THEN 'http://ex/r/' || CAST(n_regionkey AS VARCHAR)
             WHEN 'http://ex/p/label' THEN n_name
             ELSE n_name || ' has "quotes" and \\ and ' || chr(9) || chr(10) || 'end'
           END AS obj,
           CASE p.pred WHEN 'http://ex/p/label' THEN 'en' END AS obj_lang,
           p.pred <> 'http://ex/p/in_region' AS obj_is_literal
    FROM nation
    CROSS JOIN (VALUES ('http://ex/p/in_region'), ('http://ex/p/label'),
                       ('http://ex/p/note')) AS p(pred)
    """,
)
def q_turtle_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/S9 .ttl sink gate: the SAME triple set as ``rdf_roundtrip``
    (escaping gauntlet included) serialized by ``to_turtle_lines`` with
    prefix COMPACTION, then parsed back line-by-line by the full Turtle
    parser on the executors. Oracle = the original set, shared with
    rdf_roundtrip — a hash match proves ttl-format∘parse is the
    identity including compaction/expansion symmetry."""
    import pandas as pd

    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        parse_turtle_text,
    )
    from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
        to_turtle_lines,
    )

    prefixes = {"exp": "http://ex/p/", "exn": "http://ex/n/"}
    header = "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in prefixes.items())

    n = _t(spark, sf_dir, "nation")
    subj = F.concat(F.lit("http://ex/n/"), F.col("n_name"))

    def leg(pred, obj, lang, lit):
        return n.select(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            lang.alias("obj_lang"), F.lit(lit).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("src_url"),
        )

    triples = (
        leg("http://ex/p/in_region",
            F.concat(F.lit("http://ex/r/"), F.col("n_regionkey").cast("string")),
            F.lit(None).cast("string"), False)
        .unionByName(leg("http://ex/p/label", F.col("n_name"), F.lit("en"), True))
        .unionByName(leg(
            "http://ex/p/note",
            F.concat(F.col("n_name"), F.lit(' has "quotes" and \\ and \t\nend')),
            F.lit(None).cast("string"), True))
    )
    lines = to_turtle_lines(triples, prefixes)

    def _parse(it):
        cols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "src_url"]
        for pdf in it:
            rows: list[tuple] = []
            for line in pdf["line"]:
                rows.extend(parse_turtle_text(header + line, None))
            yield pd.DataFrame(rows, columns=cols)

    out = lines.mapInPandas(
        _parse,
        schema="subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean, src_url string",
    )
    return out.select("subj", "pred", "obj", "obj_lang", "obj_is_literal")


@register(
    "corpus_sample",
    """
    SELECT doc_id, lang FROM documents
    WHERE CASE lang
      WHEN 'en' THEN substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) < '80000000'
      WHEN 'fr' THEN substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) < '40000000'
      WHEN 'de' THEN TRUE
      ELSE FALSE END
    """,
)
def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (training-data mixing): keep
    50% of en, 25% of fr, all of de, none of the rest — decided by
    md5(id:seed) thresholds, NOT RNG, so reruns/retries/cluster-size
    changes keep byte-identical samples. Map-only; the oracle replays
    the exact hash decision per row."""
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        stratified_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, {"en": 0.5, "fr": 0.25, "de": 1.0}, stratum_col="lang", seed=42
    )
    return out.select("doc_id", "lang")


@register(
    "corpus_upsample",
    """
    SELECT doc_id, CAST(t.copy AS INT) AS copy
    FROM documents,
         UNNEST(range(0, 2 + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':43'),
                                               1, 8) < '4ccccccc'
                              THEN 1 ELSE 0 END)) AS t(copy)
    """,
)
def q_corpus_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture upsampling at rate 2.3: every doc gets 2
    copies, ~30% (hash-chosen, stable) get a third — reproducible
    epochs for weighted data mixes. Map-only explode."""
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        upsample,
    )

    docs = _t(spark, sf_dir, "documents")
    return upsample(docs, 2.3, seed=43).select("doc_id", "copy")


@register(
    "sequence_pack",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, n_tok,
           (cum - n_tok) // 512 AS start_seq,
           (cum - n_tok) % 512 AS start_offset,
           greatest(cum - 1, cum - n_tok) // 512 AS end_seq
    FROM c
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing plan at budget 512: the
    global token cumsum runs as a two-phase distributed prefix sum
    (range sort + per-partition offsets), NEVER a single-partition
    global window; the oracle replays the same cumsum in SQL."""
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        pack_sequences,
    )

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=512)


@register(
    "corpus_mix",
    """
    SELECT doc_id, source, CAST(t.copy AS INT) AS copy
    FROM documents,
         UNNEST(range(0,
           (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END)
           + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':43'), 1, 8) <
                       (CASE source WHEN 'src0' THEN '80000000'
                                    WHEN 'src1' THEN '40000000'
                                    ELSE '00000000' END)
                  THEN 1 ELSE 0 END)) AS t(copy)
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture in one pass: src0 at rate 2.5 (2 copies + a
    deterministic half get a third), src1 at 0.25 (hash-kept quarter),
    everything else at 1.0 — a when-chain per row, never one
    scan-per-source union. The oracle replays the copy-count
    arithmetic exactly."""
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        mix_corpora,
    )

    docs = _t(spark, sf_dir, "documents")
    out = mix_corpora(docs, {"src0": 2.5, "src1": 0.25}, seed=43)
    return out.select("doc_id", "source", "copy")


@register(
    "embedding_dedup_clusters",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6) >= 0.985
    ),
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, r) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.node
    ),
    canon AS (SELECT node, min(r) AS c FROM reach GROUP BY node)
    SELECT e.vec_id AS doc_id,
           coalesce(m.c, e.vec_id) AS keeper,
           (coalesce(m.c, e.vec_id) = e.vec_id) AS is_kept
    FROM embeddings e LEFT JOIN canon m ON e.vec_id = m.node
    """,
)
def q_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality dedup composition: embedding-cosine near-dup
    pairs (blocked GEMM) feed the SAME connected-component keeper as
    the text LSH path — one keeper operator serves every similarity
    modality. Oracle replays pairs exactly and components with a
    recursive CTE."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        dedup_clusters,
    )
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        neardup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = neardup_pairs(emb, threshold=0.985, mode="broadcast").select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    docs = emb.select(F.col("vec_id").alias("doc_id"))
    return dedup_clusters(docs, pairs)


def _bpe_counts_csv() -> str:
    from sifr_project_java_ontology_processing_spark.functions.bpe import (
        fixture_counts_path,
    )

    return fixture_counts_path()


@register(
    "bpe_token_count",
    f"""
    WITH fixture AS (
      SELECT doc_id, text_md5, n_bpe_tokens
      FROM read_csv('{_bpe_counts_csv()}', header=true)
    )
    SELECT d.doc_id, f.n_bpe_tokens
    FROM documents d
    JOIN fixture f
      ON f.doc_id = d.doc_id AND f.text_md5 = md5(coalesce(d.text, ''))
    """,
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL byte-level BPE token counting (round-3 VERDICT #4): the
    distributed Arrow-batched encoder (``functions.bpe``) runs over
    the documents whose (doc_id, md5(text)) appear in the committed
    fixture; the oracle replays the counts the PURE-PYTHON reference
    encoder produced at fixture-generation time
    (``scripts/gen_bpe_fixture.py``) — so a drifted merge loop, cache
    bug, or batching bug hash-mismatches. The md5 key keeps a changed
    testdata table from silently poisoning the compare."""
    from sifr_project_java_ontology_processing_spark.functions.bpe import (
        bpe_token_count,
        fixture_counts_path,
        load_fixture_merges,
    )

    docs = _t(spark, sf_dir, "documents")
    fix = spark.read.csv(
        fixture_counts_path(),
        header=True,
        schema="doc_id long, text_md5 string, n_bpe_tokens int, ids_md5 string",
    ).select("doc_id", "text_md5")
    cond = (F.col("d.doc_id") == F.col("f.doc_id")) & (
        F.md5(F.coalesce(F.col("d.text"), F.lit(""))) == F.col("f.text_md5")
    )
    matched = (
        docs.alias("d")
        .join(F.broadcast(fix.alias("f")), cond, "left_semi")
        .select("doc_id", "text")
    )
    return bpe_token_count(matched, load_fixture_merges())


@register(
    "model_quality_score",
    r"""
    WITH labeled AS (
      SELECT doc_id * 2 + 1 AS rid, doc_id, 'real' AS variant,
             coalesce(text, '') AS text, 1 AS label
      FROM documents
      UNION ALL
      SELECT doc_id * 2 AS rid, doc_id, 'gibberish' AS variant,
             array_to_string(list_transform(range(1, 9),
               i -> substr(md5(doc_id || '_' || i), 1, 6)), ' ') AS text,
             0 AS label
      FROM documents
    ),
    tokarr AS (
      SELECT rid, label,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS tks
      FROM labeled
    ),
    toks AS (
      SELECT rid, label,
             unnest(list_distinct(list_concat(tks,
               flatten(list_transform(tks, t ->
                 list_transform(range(1, len('<' || t || '>') - 1),
                   i -> substr('<' || t || '>', CAST(i AS INT), 3))))))) AS token
      FROM tokarr
    ),
    w AS (
      SELECT token,
             ln((sum(label) + 0.5) / (sum(1 - label) + 0.5)) AS weight
      FROM toks GROUP BY token
    ),
    bias AS (
      SELECT ln((sum(label) + 0.5) / (sum(1 - label) + 0.5)) AS b FROM labeled
    ),
    z AS (
      SELECT t.rid, sum(coalesce(w.weight, 0.0)) AS z
      FROM toks t LEFT JOIN w USING (token)
      GROUP BY t.rid
    )
    SELECT l.doc_id, l.variant,
           round(1.0 / (1.0 + exp(-(bias.b + coalesce(z.z, 0.0)))), 6)
             AS model_quality,
           1.0 / (1.0 + exp(-(bias.b + coalesce(z.z, 0.0)))) > 0.5 AS is_good
    FROM labeled l LEFT JOIN z USING (rid) CROSS JOIN bias
    """,
)
def q_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (round-3 VERDICT #5): the fastText-
    style broadcast linear classifier (``operators.quality_model``),
    trained END-TO-END inside the query on a deterministic labeled set
    (real corpus text = good vs md5-derived gibberish = bad) and then
    scoring both variants of every doc. The oracle re-derives the NB
    log-odds weights, bias and sigmoid scores in SQL — training AND
    scoring are both hash-gated."""
    from sifr_project_java_ontology_processing_spark.operators.quality_model import (
        score_quality_model,
        train_quality_weights,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    gib = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("_"),
                        i.cast("string"),
                    )
                ),
                1,
                6,
            ),
        ),
    )
    labeled = (
        docs.select(
            (F.col("doc_id") * 2 + 1).alias("rid"),
            F.col("doc_id"),
            F.lit("real").alias("variant"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.lit(1).alias("label"),
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") * 2).alias("rid"),
                F.col("doc_id"),
                F.lit("gibberish").alias("variant"),
                gib.alias("text"),
                F.lit(0).alias("label"),
            )
        )
    )
    weights, bias = train_quality_weights(labeled, id_col="rid")
    scored = score_quality_model(labeled, weights, bias, id_col="rid")
    return scored.select(
        F.floor(F.col("rid") / 2).cast("long").alias("doc_id"),
        F.when(F.col("rid") % 2 == 1, "real").otherwise("gibberish").alias("variant"),
        "model_quality",
        "is_good",
    )


def _ivf_fixture():
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "ivf_centroids_sf001.json",
    )
    with open(path) as f:
        return json.load(f)


def _ivf_cents_values() -> str:
    """Inline the committed k-means codebook as DuckDB list literals
    (repr() is the shortest round-trip form — the parsed doubles are
    bit-identical to what the Spark side loads from the same JSON)."""
    fx = _ivf_fixture()
    rows = []
    for i, vec in enumerate(fx["centroids"]):
        vs = ", ".join(repr(v) for v in vec)
        rows.append(f"({i + 1}, [{vs}])")
    return ", ".join(rows)


@register(
    "ann_ivf_kmeans_topk",
    f"""
    WITH cents(cidx, cvec) AS (VALUES {_ivf_cents_values()}),
    allsims AS (
      SELECT e.vec_id, e.embedding, c.cidx,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                     CAST(c.cvec AS DOUBLE[])), 9) DESC,
                        c.cidx ASC) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, embedding, cidx FROM allsims WHERE rn = 1),
    probes AS (SELECT vec_id, embedding, cidx FROM allsims WHERE vec_id < 8 AND rn <= 3)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                     CAST(a.embedding AS DOUBLE[])), 6) DESC,
                        a.vec_id ASC) AS rank
      FROM (SELECT DISTINCT vec_id, embedding, cidx FROM probes) p
      JOIN assign a ON a.cidx = p.cidx AND a.vec_id <> p.vec_id
    ) t WHERE rank <= 5
    """,
)
def q_ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over a TRAINED spherical-k-means codebook (round-3
    VERDICT #3): the committed fixture codebook (10 × 64, 5 Lloyd's
    rounds on sf0.01 embeddings, deterministic md5 init) is passed as
    an explicit codebook, so the cell-assignment / probe / rank path
    replays against the same literals in SQL. Training itself is gated
    by the recall harness (test_similarity: kmeans >= md5 pick at
    equal nprobe, strictly better at nprobe 2-3)."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        ivf_topk,
    )

    fx = _ivf_fixture()
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(
        emb, queries_df, dim=fx["dim"], k=5, m=fx["m"], nprobe=3,
        codebook=fx["centroids"],
    )
    return out.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank")
    )


def _synth_mp4_blob(doc_id: int) -> bytes:
    """Deterministic REAL ISO-BMFF bytes per doc: ftyp + moov[mvhd +
    trak[tkhd]] with w = 160 + (id%10)*16, h = 90 + (id%10)*9,
    duration_ms = 1000 + (id%60)*500 (timescale 1000). Stdlib-only,
    executor-side — the video sibling of ``_synth_media_blob``."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    w = 160 + (doc_id % 10) * 16
    h = 90 + (doc_id % 10) * 9
    dur = 1000 + (doc_id % 60) * 500
    ftyp = box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", 1000, dur) + bytes(80))
    tkhd = box(b"tkhd", bytes(76) + struct.pack(">II", w << 16, h << 16))
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


@register(
    "multimodal_video_decode",
    """
    SELECT doc_id AS media_id,
           CAST(160 + (doc_id % 10) * 16 AS INT) AS width,
           CAST(90 + (doc_id % 10) * 9 AS INT) AS height,
           CAST(1000 + (doc_id % 60) * 500 AS INT) AS duration_ms
    FROM documents
    """,
)
def q_multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode (closes round-3 'missing #2' to the
    extent possible without codec libs): genuine MP4 (ISO BMFF) bytes
    synthesized per document on the executors, then parsed by
    ``real_decoder`` → ``mp4_info`` — an actual box walk reading mvhd
    duration and tkhd 16.16 dimensions. The oracle replays the
    generating formulas, so an endianness / offset / fixed-point
    regression hash-mismatches. Frame decode (needs ffmpeg) remains an
    honest NotImplementedError."""
    import pandas as pd

    from sifr_project_java_ontology_processing_spark.operators.multimodal import (
        decode_media,
        real_decoder,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def _synth(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "video",
                    "content": [_synth_mp4_blob(int(d)) for d in pdf["doc_id"]],
                }
            )

    media = docs.mapInPandas(
        _synth, schema="media_id long, media_type string, content binary"
    )
    return decode_media(media, real_decoder).select(
        "media_id", "width", "height", "duration_ms"
    )


@register(
    "bpe_token_ids",
    f"""
    WITH fixture AS (
      SELECT doc_id, text_md5, ids_md5
      FROM read_csv('{_bpe_counts_csv()}', header=true)
    )
    SELECT d.doc_id, f.ids_md5
    FROM documents d
    JOIN fixture f
      ON f.doc_id = d.doc_id AND f.text_md5 = md5(coalesce(d.text, ''))
    """,
)
def q_bpe_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE ENCODING gate (ids, not just counts): the distributed
    encoder's token-id sequence per document, digested as
    md5(comma-joined ids), vs the pure-Python reference encoding
    committed in the fixture. Exercises the byte→merge→vocab-id path
    end-to-end — an id-table regression (wrong rank order, missing
    base-byte ids) hash-mismatches even when counts stay right."""
    from sifr_project_java_ontology_processing_spark.functions.bpe import (
        bpe_token_ids,
        fixture_counts_path,
        load_fixture_merges,
    )

    docs = _t(spark, sf_dir, "documents")
    fix = spark.read.csv(
        fixture_counts_path(),
        header=True,
        schema="doc_id long, text_md5 string, n_bpe_tokens int, ids_md5 string",
    ).select("doc_id", "text_md5")
    cond = (F.col("d.doc_id") == F.col("f.doc_id")) & (
        F.md5(F.coalesce(F.col("d.text"), F.lit(""))) == F.col("f.text_md5")
    )
    matched = (
        docs.alias("d")
        .join(F.broadcast(fix.alias("f")), cond, "left_semi")
        .select("doc_id", "text")
    )
    ids = bpe_token_ids(matched, load_fixture_merges())
    return ids.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.col("token_ids"))).alias("ids_md5"),
    )


# ===========================================================================
# Round 4 (cont.): SPARQL BGP, graph analytics, paragraph dedup, chunking
# ===========================================================================

_BGP_SPARQL = """
PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
PREFIX ex: <http://ex/p/>
SELECT ?n ?nl ?rl WHERE {
  ?n a skos:Concept .
  ?n skos:prefLabel ?nl .
  ?n ex:region ?r .
  ?r skos:prefLabel ?rl .
  FILTER(regex(?nl, "A"))
}
"""


@register(
    "sparql_bgp",
    """
    SELECT 'http://ex/n/' || n_name AS n,
           n_name AS nl,
           r_name AS rl
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE regexp_matches(n_name, 'A')
    """,
)
def q_sparql_bgp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL BGP subset executor (plans/bgp.py — the Jena-ARQ query
    capability the reference gets for free): a 4-pattern star+chain
    query with a FILTER, parsed from SPARQL text and compiled to
    constant-pushed scans + shared-variable equi-joins in greedy
    connectivity order. The triples frame is built declaratively from
    nation/region; the oracle replays the query relationally."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    SKOS = "http://www.w3.org/2004/02/skos/core#"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n_iri = F.concat(F.lit("http://ex/n/"), F.col("n_name"))
    r_iri = F.concat(F.lit("http://ex/r/"), F.col("n_regionkey").cast("string"))
    rr_iri = F.concat(F.lit("http://ex/r/"), F.col("r_regionkey").cast("string"))

    def trip(subj, pred, obj, lit: bool, lang=None):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            (F.lit(lang) if lang else F.lit(None).cast("string")).alias("obj_lang"),
            F.lit(lit).alias("obj_is_literal"),
        )

    nt = n.select(
        F.explode(
            F.array(
                trip(n_iri, f"{RDF}type", F.lit(f"{SKOS}Concept"), False),
                trip(n_iri, f"{SKOS}prefLabel", F.col("n_name"), True, "en"),
                trip(n_iri, "http://ex/p/region", r_iri, False),
            )
        ).alias("t")
    ).select("t.*")
    rt = r.select(
        trip(rr_iri, f"{SKOS}prefLabel", F.col("r_name"), True, "en").alias("t")
    ).select("t.*")
    triples = nt.unionByName(rt)
    return execute_bgp(triples, _BGP_SPARQL)


# deterministic KG-shaped edge list over lineitem: supplier→part
# (bipartite bulk), part→group hub (skewed in-degree), hub→supplier
# (closes cycles). Disjoint node namespaces by prefix.
_PR_EDGES_SQL = """
      SELECT DISTINCT 's:' || CAST(l_suppkey AS VARCHAR) AS src,
                      'p:' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem
      UNION
      SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR),
                      'g:' || CAST(l_partkey % 50 AS VARCHAR)
      FROM lineitem
      UNION
      SELECT DISTINCT 'g:' || CAST(l_partkey % 50 AS VARCHAR),
                      's:' || CAST((l_partkey % 50) * 2 % 100 AS VARCHAR)
      FROM lineitem
"""


def _pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one lineitem scan emitting all three edge kinds map-side (explode
    # of a 3-struct array) instead of three scans unioned — same edge
    # SET after the distinct (guide §2.3: scan once, project early)
    li = _t(spark, sf_dir, "lineitem")
    s = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    p = F.concat(F.lit("p:"), F.col("l_partkey").cast("string"))
    g = F.concat(F.lit("g:"), (F.col("l_partkey") % 50).cast("string"))
    s2 = F.concat(
        F.lit("s:"), ((F.col("l_partkey") % 50) * 2 % 100).cast("string")
    )
    return (
        li.select(
            F.explode(
                F.array(
                    F.struct(s.alias("src"), p.alias("dst")),
                    F.struct(p.alias("src"), g.alias("dst")),
                    F.struct(g.alias("src"), s2.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )


@register(
    "graph_pagerank",
    f"""
    WITH e AS ({_PR_EDGES_SQL}),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
    c1 AS (SELECT e.dst AS node, sum(r0.rank / deg.d) AS m
           FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r1 AS (SELECT n.node,
                  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * coalesce(c1.m, 0)
                    AS rank
           FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
    c2 AS (SELECT e.dst AS node, sum(r1.rank / deg.d) AS m
           FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r2 AS (SELECT n.node,
                  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * coalesce(c2.m, 0)
                    AS rank
           FROM nodes n LEFT JOIN c2 ON n.node = c2.node),
    c3 AS (SELECT e.dst AS node, sum(r2.rank / deg.d) AS m
           FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r3 AS (SELECT n.node,
                  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * coalesce(c3.m, 0)
                    AS rank
           FROM nodes n LEFT JOIN c3 ON n.node = c3.node)
    SELECT node, round(rank, 6) AS rank FROM r3
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-salience PageRank over a KG-shaped edge list (north-star
    'iterative DataFrame self-joins with checkpointing', the CC
    sibling): 3 fixed iterations, damping 0.85, dangling mass not
    redistributed (classic Spark formulation). Edges are repartitioned
    on src ONCE and persisted with out-degree folded in; each
    iteration shuffles only the rank frame and cuts lineage via
    localCheckpoint. The oracle unrolls the same 3 iterations as CTEs."""
    from sifr_project_java_ontology_processing_spark.operators.graph import pagerank

    ranks = pagerank(_pr_edges(spark, sf_dir), iterations=3, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@register(
    "graph_degree_stats",
    f"""
    WITH e AS ({_PR_EDGES_SQL}),
    tagged AS (
      SELECT src AS node, 1 AS o, 0 AS i FROM e
      UNION ALL
      SELECT dst, 0, 1 FROM e
    ),
    ds AS (SELECT node, CAST(sum(o) + sum(i) AS BIGINT) AS degree
           FROM tagged GROUP BY node)
    SELECT degree, count(*) AS n_nodes FROM ds GROUP BY degree
    """,
)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram over the same KG edge list — the hub/power-law
    diagnostic that decides where salting is needed. One partial-agg
    pass for per-node degrees, one for the histogram."""
    from sifr_project_java_ontology_processing_spark.operators.graph import (
        degree_histogram,
    )

    h = degree_histogram(_pr_edges(spark, sf_dir))
    return h.select(
        F.col("degree").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
    )


@register(
    "paragraph_dedup",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    segs AS (
      SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT)),
                            i -> array_to_string(t[i*10+1:i*10+10], ' ')) AS gs
      FROM toks
    ),
    flat0 AS (
      SELECT doc_id, unnest(list_transform(gs, (g, i) -> {'pos': i - 1, 'para': g})) AS u
      FROM segs
    ),
    flat AS (
      SELECT doc_id, u.pos AS pos, u.para AS para,
             md5(lower(trim(u.para))) AS k
      FROM flat0 WHERE trim(u.para) <> ''
    ),
    kept AS (
      SELECT doc_id, pos, para FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
        FROM flat
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(para, chr(10) ORDER BY pos) AS txt
      FROM kept GROUP BY doc_id
    ),
    np AS (SELECT doc_id, count(*) AS n_paras FROM flat GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(np.n_paras, 0) AS n_paras,
           coalesce(agg.n_kept, 0) AS n_kept,
           md5(coalesce(agg.txt, '')) AS dedup_hash
    FROM documents d
    LEFT JOIN np USING (doc_id) LEFT JOIN agg USING (doc_id)
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level keep-first-occurrence dedup (RefinedWeb/CCNet
    line dedup): documents are re-segmented into 10-token paragraphs
    (synthetic docs are single-line), then ``dedup.paragraph_dedup``
    keeps each normalized paragraph's first global (doc_id, pos)
    occurrence and reassembles the doc. Every input doc survives
    (possibly empty); compare is md5(text_dedup)."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        paragraph_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    nseg = F.expr("CAST(ceil(size(_t) / 10.0) AS INT)")
    segs = docs.select(F.col("doc_id"), toks.alias("_t")).select(
        "doc_id",
        F.when(
            F.size("_t") > 0,
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i * 10 + 1, 10)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_gs"),
    )
    view = segs.select("doc_id", F.array_join("_gs", "\n").alias("text"))
    out = paragraph_dedup(view, id_col="doc_id", text_col="text", sep="\n")
    return out.select(
        "doc_id",
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.md5("text_dedup").alias("dedup_hash"),
    )


@register(
    "doc_chunks",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    ch AS (
      SELECT doc_id, t,
             unnest(range(0, greatest((len(t) - 8 + 23) // 24, 1))) AS chunk_id
      FROM toks
    )
    SELECT doc_id, chunk_id,
           len(t[chunk_id*24+1:chunk_id*24+32]) AS n_chunk_tokens,
           array_to_string(t[chunk_id*24+1:chunk_id*24+32], ' ') AS chunk_text
    FROM ch
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window document chunking (sampling.chunk_documents):
    32-token chunks with 8 tokens of overlap (stride 24) — the
    long-document shaping pass before embedding. Pure Catalyst
    map-only plan; the oracle replays the same slicing (Spark slice
    is (start, LENGTH) 1-based; DuckDB t[a:b] is end-inclusive)."""
    from sifr_project_java_ontology_processing_spark.operators.sampling import (
        chunk_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=32, overlap=8)


@register(
    "transitive_closure",
    """
    WITH e AS (
      SELECT DISTINCT 'n:' || CAST(p_partkey AS VARCHAR) AS src,
                      'n:' || CAST(p_partkey // 10 AS VARCHAR) AS dst
      FROM part WHERE p_partkey > 0
    ),
    d1 AS (SELECT src, dst, 1 AS depth FROM e),
    d2 AS (SELECT d1.src, e.dst, 2 AS depth FROM d1 JOIN e ON d1.dst = e.src),
    d3 AS (SELECT d2.src, e.dst, 3 AS depth FROM d2 JOIN e ON d2.dst = e.src),
    d4 AS (SELECT d3.src, e.dst, 4 AS depth FROM d3 JOIN e ON d3.dst = e.src)
    SELECT src, dst, depth FROM d1
    UNION ALL SELECT src, dst, depth FROM d2
    UNION ALL SELECT src, dst, depth FROM d3
    UNION ALL SELECT src, dst, depth FROM d4
    """,
)
def q_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKOS broader+ ancestor expansion (graph.transitive_closure):
    the part keys form a decimal tree (k → k div 10, root n:0), depth
    ≤ 4; the operator's frontier BFS with per-level anti-join must
    reproduce the unrolled 4-level join chain exactly (a tree has
    unique paths, so depths and pair sets match 1:1)."""
    from sifr_project_java_ontology_processing_spark.operators.graph import (
        transitive_closure,
    )

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") > 0)
    e = part.select(
        F.concat(F.lit("n:"), F.col("p_partkey").cast("string")).alias("src"),
        F.concat(
            F.lit("n:"), F.expr("p_partkey div 10").cast("string")
        ).alias("dst"),
    ).distinct()
    out = transitive_closure(e, max_depth=4)
    return out.select("src", "dst", F.col("depth").cast("int").alias("depth"))


# ===========================================================================
# Round 4 (cont. 2): SPARQL property paths + aggregates (plans/bgp.py)
# ===========================================================================


def _nation_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic KG over nation/region for the SPARQL path/agg
    gates: nation nodes typed ex:Nation with a name literal, a
    ``within`` edge to their region, region label + alt-label
    literals, and a ``prev`` chain n_nationkey → n_nationkey-1 (a
    25-deep path for closure depth coverage)."""
    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n_iri = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))
    r_iri = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))
    rr_iri = F.concat(F.lit("r:"), F.col("r_regionkey").cast("string"))

    def trip(subj, pred, obj, lit: bool):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(lit).alias("obj_is_literal"),
        )

    nt = n.select(
        F.explode(
            F.array(
                trip(n_iri, RDF_T, F.lit("http://ex/Nation"), False),
                trip(n_iri, "http://ex/name", F.col("n_name"), True),
                trip(n_iri, "http://ex/within", r_iri, False),
            )
        ).alias("t")
    ).select("t.*")
    prev = (
        n.where(F.col("n_nationkey") > 0)
        .select(
            trip(
                n_iri,
                "http://ex/prev",
                F.concat(F.lit("n:"), (F.col("n_nationkey") - 1).cast("string")),
                False,
            ).alias("t")
        )
        .select("t.*")
    )
    rt = r.select(
        F.explode(
            F.array(
                trip(rr_iri, "http://ex/label", F.col("r_name"), True),
                trip(
                    rr_iri,
                    "http://ex/alt",
                    F.concat(F.lit("alt-"), F.col("r_name")),
                    True,
                ),
            )
        ).alias("t")
    ).select("t.*")
    return nt.unionByName(prev).unionByName(rt)


@register(
    "sparql_path_closure",
    """
    WITH RECURSIVE reach(a, b) AS (
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR),
             'n:' || CAST(n_nationkey - 1 AS VARCHAR)
      FROM nation WHERE n_nationkey > 0
      UNION
      SELECT r.a, 'n:' || CAST(n.n_nationkey - 1 AS VARCHAR)
      FROM reach r
      JOIN nation n ON r.b = 'n:' || CAST(n.n_nationkey AS VARCHAR)
      WHERE n.n_nationkey > 0
    )
    SELECT a, b FROM reach ORDER BY a, b
    """,
)
def q_sparql_path_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ``+`` closure path (plans/bgp.py → graph.transitive_
    closure): the 25-deep ``prev`` chain over nation keys expands to
    all 300 ordered ancestor pairs; the oracle replays it with a
    recursive CTE. Exercises the BFS frontier loop at depth 24 —
    the shape that must survive deep SKOS hierarchies at scale."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?a ?b WHERE { ?a ex:prev+ ?b } ORDER BY ?a ?b""",
    )


@register(
    "sparql_path_seq_alt",
    """
    SELECT n_name AS nl, l
    FROM nation
    JOIN (
      SELECT r_regionkey, r_name AS l FROM region
      UNION ALL
      SELECT r_regionkey, 'alt-' || r_name FROM region
    ) labels ON n_regionkey = labels.r_regionkey
    ORDER BY nl, l
    """,
)
def q_sparql_path_seq_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL sequence + inverse + alternation paths in one BGP:
    ``?r ^ex:within/ex:name ?nl`` walks region→nation backwards then
    to the name literal (desugared to internal join variables), and
    ``ex:label|ex:alt`` compiles to ONE IN-filtered scan (pushdown-
    eligible) instead of a UNION of two scans."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?nl ?l WHERE {
             ?r ^ex:within/ex:name ?nl .
             ?r ex:label|ex:alt ?l .
           } ORDER BY ?nl ?l""",
    )


@register(
    "sparql_agg",
    """
    SELECT 'r:' || CAST(n_regionkey AS VARCHAR) AS r,
           count(*) AS n_nations,
           min(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    HAVING count(*) >= 5
    ORDER BY r
    """,
)
def q_sparql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL aggregates (COUNT + MIN with GROUP BY/HAVING/ORDER BY)
    compiled to a partial-aggregating groupBy over the joined BGP —
    map-side combine keeps the shuffle to one row per (region,
    aggregate), the same relational shape the oracle runs."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?r (COUNT(?n) AS ?n_nations) (MIN(?nl) AS ?first_name)
           WHERE { ?n ex:within ?r . ?n ex:name ?nl }
           GROUP BY ?r HAVING(?n_nations >= 5) ORDER BY ?r""",
    )


@register(
    "sparql_construct",
    """
    WITH base AS (
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS n,
             'r:' || CAST(n_regionkey AS VARCHAR) AS r,
             r_name AS l
      FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT DISTINCT * FROM (
      SELECT n AS subj, 'http://ex/locatedIn' AS pred, r AS obj,
             CAST(NULL AS VARCHAR) AS obj_lang, FALSE AS obj_is_literal
      FROM base
      UNION ALL
      SELECT r, 'http://ex/regionName', l, NULL, TRUE FROM base
    )
    """,
)
def q_sparql_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT (plans/bgp.py::_emit_construct): a two-triple
    template instantiated over the nation⋈region BGP, returning a
    schemas.TRIPLES-shaped graph. Object variables carry their RDF
    term metadata (lang tag, literal flag) through companion columns
    riding the solution frame — ?r stays an IRI, ?l a literal — and
    the result is set-deduped (each region's name triple emits once
    though ~5 nations instantiate it). One narrow projection per
    template triple, union, distinct: no per-solution Python."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           CONSTRUCT {
             ?n <http://ex/locatedIn> ?r .
             ?r <http://ex/regionName> ?l .
           }
           WHERE { ?n ex:within ?r . ?r ex:label ?l . }""",
    )


@register(
    "sparql_values_bind",
    """
    SELECT n_name AS nl, r_name AS rl,
           lower(r_name) || ':' || n_name AS tag
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND (starts_with(n_name, 'I') OR contains(n_name, 'A'))
    ORDER BY nl
    """,
)
def q_sparql_values_bind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL VALUES + BIND (plans/bgp.py): an inline two-row VALUES
    block joins constant bindings onto the BGP solution (a broadcast
    hash join of a literal local relation — never a shuffle), BIND
    computes a derived column with the CONCAT/LCASE builtin subset
    inside whole-stage codegen, and the FILTER uses STRSTARTS/
    CONTAINS. The oracle replays the same expressions relationally
    (both sides share DuckDB/Spark-common SQL function semantics)."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?nl ?rl ?tag WHERE {
             ?n ex:within ?r .
             ?n ex:name ?nl .
             ?r ex:label ?rl .
             VALUES ?rl { "ASIA" "EUROPE" }
             BIND(CONCAT(LCASE(?rl), ":", ?nl) AS ?tag)
             FILTER(STRSTARTS(?nl, "I") || CONTAINS(?nl, "A"))
           } ORDER BY ?nl""",
    )


@register(
    "sparql_ask",
    """
    SELECT count(*) > 0 AS ask
    FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND starts_with(n_name, 'J')
    """,
)
def q_sparql_ask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ASK (plans/bgp.py): existence of a JAPAN-like nation in
    ASIA, compiled to the BGP join plus ONE global boolean aggregate —
    exactly one output row whether or not solutions exist (per SPARQL
    ASK semantics; count(*)>0 keeps the empty-input case true-typed)."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           ASK WHERE {
             ?n ex:within ?r .
             ?r ex:label "ASIA" .
             ?n ex:name ?nl .
             FILTER(STRSTARTS(?nl, "J"))
           }""",
    )


@register(
    "sparql_negation",
    """
    SELECT n_name AS nl, r_name AS rl
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE EXISTS (SELECT 1 FROM nation m
                  WHERE m.n_nationkey = n.n_nationkey + 1)
      AND r_name <> 'ASIA'
    ORDER BY nl
    """,
)
def q_sparql_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL negation (plans/bgp.py): FILTER EXISTS compiles to a
    left-SEMI join on the shared variable (?n must have an inbound
    ``prev`` edge) and MINUS to a left-ANTI join (?r must not carry
    the ASIA label) — both the Spark-native shapes, broadcast-eligible
    under AQE, never widening the solution frame. The oracle replays
    them as EXISTS / <> subqueries relationally."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?nl ?rl WHERE {
             ?n ex:name ?nl .
             ?n ex:within ?r .
             ?r ex:label ?rl .
             FILTER EXISTS { ?m ex:prev ?n }
             MINUS { ?r ex:label "ASIA" . }
           } ORDER BY ?nl""",
    )


@register(
    "sparql_not_exists_unbound",
    """
    SELECT n_name AS nl FROM nation n
    WHERE NOT EXISTS (
      SELECT 1 FROM nation m JOIN region r ON m.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND (n.n_nationkey = 0 OR m.n_nationkey = n.n_nationkey - 1))
    ORDER BY nl
    """,
)
def q_sparql_not_exists_unbound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL unbound-variable compatibility in NOT EXISTS
    (plans/bgp.py::_compat_negation_join): ?p is OPTIONAL-bound (the
    first nation has no ``prev`` edge), and the spec treats an unbound
    shared variable as compatible-with-anything — so nation 0 is
    removed whenever ANY nation sits in ASIA, while bound rows are
    removed only on a value match. Compiled as a null-mask split of
    the solution frame into hash/broadcast equi-joins (no non-equi
    nested loop). The oracle replays compatibility as
    ``n_nationkey = 0 OR value-match`` inside a relational
    NOT EXISTS."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?nl WHERE {
             ?n ex:name ?nl .
             OPTIONAL { ?n ex:prev ?p }
             FILTER NOT EXISTS { ?p ex:within ?r0 . ?r0 ex:label "ASIA" . }
           } ORDER BY ?nl""",
    )


@register(
    "sparql_minus_unbound",
    """
    SELECT n_name AS nl FROM nation n
    WHERE NOT EXISTS (
      SELECT 1 FROM nation m JOIN region r ON m.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND n.n_nationkey > 0 AND m.n_nationkey = n.n_nationkey - 1)
    ORDER BY nl
    """,
)
def q_sparql_minus_unbound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINUS vs NOT EXISTS on an unbound shared variable: MINUS keeps
    SPARQL's domain-overlap rule, so nation 0 (unbound ?p — no bound
    variable in common with the inner solutions) is KEPT where the
    NOT EXISTS twin removes it. Same null-mask-split compilation
    (plans/bgp.py::_compat_negation_join), the all-null subset passing
    through untouched. The oracle keys removal on
    ``n_nationkey > 0 AND value-match``."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?nl WHERE {
             ?n ex:name ?nl .
             OPTIONAL { ?n ex:prev ?p }
             MINUS { ?p ex:within ?r0 . ?r0 ex:label "ASIA" . }
           } ORDER BY ?nl""",
    )


@register(
    "lm_perplexity",
    r"""
    WITH docs0 AS (
      SELECT doc_id, coalesce(text, '') AS text FROM documents
    ),
    labeled AS (
      SELECT doc_id * 2 + 1 AS rid, doc_id, 'real' AS variant, text
      FROM docs0
      UNION ALL
      SELECT doc_id * 2 AS rid, doc_id, 'gibberish' AS variant,
             array_to_string(list_transform(range(1, 9),
               i -> substr(md5(doc_id || '_' || i), 1, 6)), ' ') AS text
      FROM docs0
    ),
    tok AS (
      SELECT rid, doc_id, variant,
             list_concat(list_concat(['<s>'],
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')), ['</s>']) AS pt
      FROM labeled
    ),
    pairs AS (
      SELECT rid, doc_id, variant,
             pt[CAST(i AS INT)] AS ctx, pt[CAST(i AS INT) + 1] AS tok
      FROM (SELECT rid, doc_id, variant, pt,
                   unnest(range(1, len(pt))) AS i FROM tok)
    ),
    train AS (SELECT ctx, tok FROM pairs WHERE variant = 'real'),
    bg AS (SELECT ctx, tok, count(*) AS c FROM train GROUP BY ctx, tok),
    cxt AS (SELECT ctx, count(*) AS cc FROM train GROUP BY ctx),
    v AS (SELECT count(DISTINCT tok) AS v FROM train),
    sc AS (
      SELECT p.rid, p.doc_id, p.variant,
             -avg(ln((coalesce(b.c, 0) + 0.1)
                     / (coalesce(x.cc, 0) + 0.1 * (v.v + 1)))) AS ce
      FROM pairs p
      LEFT JOIN bg b ON p.ctx = b.ctx AND p.tok = b.tok
      LEFT JOIN cxt x ON p.ctx = x.ctx
      CROSS JOIN v
      GROUP BY p.rid, p.doc_id, p.variant
    )
    SELECT r.doc_id, round(r.ce, 4) AS ce_real, round(g.ce, 4) AS ce_gib,
           g.ce > r.ce AS gib_worse
    FROM sc r JOIN sc g ON r.doc_id = g.doc_id
    WHERE r.variant = 'real' AND g.variant = 'gibberish'
    """,
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM perplexity filter (operators/lm_perplexity.py):
    a word-bigram add-α model is TRAINED inside the query on the real
    corpus text (two partial-agg groupBys), then both the real text
    and a md5-derived gibberish variant of every doc are scored via
    broadcast count joins + one per-doc partial agg. The gibberish
    twin must always score a higher cross-entropy (``gib_worse``) —
    the signal CCNet's head/middle/tail split keys on. Training and
    scoring both replay relationally in the oracle (same counts, same
    Lidstone formula); the per-doc avg makes sum-order FP drift
    sub-round(4)."""
    from sifr_project_java_ontology_processing_spark.operators.lm_perplexity import (
        score_perplexity,
        train_word_lm,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    lm = train_word_lm(docs, alpha=0.1)
    gib = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("_"),
                        i.cast("string"),
                    )
                ),
                1,
                6,
            ),
        ),
    )
    # score BOTH variants in one pass (union + composite key) instead of
    # two separate explode→join→agg pipelines self-joined at the end —
    # one corpus scan, one exchange, no join (guide §2.4); every doc
    # yields both variants (empty text still scores the (<s>,</s>)
    # bigram), so the max-when pivot is exactly the former inner join
    both = docs.select(
        "doc_id", F.lit("r").alias("_v"), F.col("text")
    ).unionByName(docs.select("doc_id", F.lit("g").alias("_v"), gib.alias("text")))
    scored = score_perplexity(both, lm, id_col=["doc_id", "_v"])
    ce = F.col("cross_entropy")
    return scored.groupBy("doc_id").agg(
        F.round(F.max(F.when(F.col("_v") == "r", ce)), 4).alias("ce_real"),
        F.round(F.max(F.when(F.col("_v") == "g", ce)), 4).alias("ce_gib"),
        (
            F.max(F.when(F.col("_v") == "g", ce))
            > F.max(F.when(F.col("_v") == "r", ce))
        ).alias("gib_worse"),
    )


@register(
    "sparql_path_opt_offset",
    """
    SELECT nl, b FROM (
      SELECT n_name AS nl, 'n:' || CAST(n_nationkey AS VARCHAR) AS b
      FROM nation
      UNION ALL
      SELECT n_name, 'n:' || CAST(n_nationkey - 1 AS VARCHAR)
      FROM nation WHERE n_nationkey > 0
    ) ORDER BY nl, b OFFSET 3
    """,
)
def q_sparql_path_opt_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL ``?`` zero-or-one path + OFFSET (plans/bgp.py): for each
    nation, itself (zero-length identity) plus its single ``prev``
    neighbour — one edge scan unioned with the node identity, no
    closure loop — then the total ORDER BY makes OFFSET deterministic.
    The oracle replays identity+edge as a UNION ALL with OFFSET."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?nl ?b WHERE { ?a ex:name ?nl . ?a ex:prev? ?b }
           ORDER BY ?nl ?b OFFSET 3""",
    )


@register(
    "sparql_describe",
    """
    WITH sel AS (
      SELECT n_nationkey AS k, n_name, n_regionkey
      FROM nation WHERE n_regionkey = 0
    )
    SELECT 'n:' || CAST(k AS VARCHAR) AS subj,
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
           'http://ex/Nation' AS obj,
           CAST(NULL AS VARCHAR) AS obj_lang, FALSE AS obj_is_literal
    FROM sel
    UNION ALL
    SELECT 'n:' || CAST(k AS VARCHAR), 'http://ex/name', n_name, NULL, TRUE
    FROM sel
    UNION ALL
    SELECT 'n:' || CAST(k AS VARCHAR), 'http://ex/within',
           'r:' || CAST(n_regionkey AS VARCHAR), NULL, FALSE
    FROM sel
    UNION ALL
    SELECT 'n:' || CAST(k AS VARCHAR), 'http://ex/prev',
           'n:' || CAST(k - 1 AS VARCHAR), NULL, FALSE
    FROM sel WHERE k > 0
    """,
)
def q_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE (plans/bgp.py): the forward description of
    every nation in region r:0 — the WHERE group binds ?n, then ONE
    left-semi join pulls every triple whose subject is a described
    resource (type, name, within, prev edges). The oracle replays
    the per-subject triple groups as UNION ALL branches."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           DESCRIBE ?n WHERE { ?n ex:within <r:0> }""",
    )


@register(
    "sparql_group_concat",
    """
    SELECT 'r:' || CAST(n_regionkey AS VARCHAR) AS r,
           string_agg(n_name, ', ' ORDER BY n_name) AS names,
           min(n_name) AS one
    FROM nation GROUP BY n_regionkey ORDER BY r
    """,
)
def q_sparql_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL GROUP_CONCAT + SAMPLE (plans/bgp.py): per-region sorted
    name concatenation (order pinned to lexical so both engines agree
    — SPARQL leaves GROUP_CONCAT order undefined) and deterministic
    SAMPLE (lexical min). collect_list+sort_array+array_join stays one
    partial-aggregating groupBy; the oracle is string_agg ORDER BY."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?r (GROUP_CONCAT(?nl; SEPARATOR=", ") AS ?names)
                  (SAMPLE(?nl) AS ?one)
           WHERE { ?n ex:within ?r . ?n ex:name ?nl }
           GROUP BY ?r ORDER BY ?r""",
    )


# ===========================================================================
# Round 4 (cont. 3): SPARQL UPDATE (plans/sparql_update.py)
# ===========================================================================

_NATION_TRIPLES_SQL = """
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS subj,
             'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
             'http://ex/Nation' AS obj,
             CAST(NULL AS VARCHAR) AS obj_lang, false AS obj_is_literal
      FROM nation
      UNION ALL
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'http://ex/name',
             n_name, NULL, true
      FROM nation
      UNION ALL
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'http://ex/within',
             'r:' || CAST(n_regionkey AS VARCHAR), NULL, false
      FROM nation
      UNION ALL
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'http://ex/prev',
             'n:' || CAST(n_nationkey - 1 AS VARCHAR), NULL, false
      FROM nation WHERE n_nationkey > 0
      UNION ALL
      SELECT 'r:' || CAST(r_regionkey AS VARCHAR), 'http://ex/label',
             r_name, NULL, true
      FROM region
      UNION ALL
      SELECT 'r:' || CAST(r_regionkey AS VARCHAR), 'http://ex/alt',
             'alt-' || r_name, NULL, true
      FROM region
"""


@register(
    "sparql_update",
    f"""
    WITH base AS ({_NATION_TRIPLES_SQL}),
    matched AS (
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS n_iri,
             'r:' || CAST(n_regionkey AS VARCHAR) AS r_iri
      FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE regexp_matches(r_name, 'A')
    ),
    deleted AS (
      SELECT n_iri AS subj, 'http://ex/within' AS pred, r_iri AS obj,
             CAST(NULL AS VARCHAR) AS obj_lang, false AS obj_is_literal
      FROM matched
    ),
    inserted AS (
      SELECT n_iri, 'http://ex/in', r_iri, CAST(NULL AS VARCHAR), false
      FROM matched
      UNION ALL
      SELECT r_iri, 'http://ex/hasNation', n_iri, NULL, false FROM matched
      UNION ALL
      SELECT 'g:root', 'http://ex/label', 'Root', NULL, true
    )
    SELECT subj, pred, obj, obj_lang, obj_is_literal FROM (
      SELECT * FROM (SELECT * FROM base EXCEPT SELECT * FROM deleted)
      UNION
      SELECT * FROM inserted
    )
    """,
)
def q_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UPDATE (plans/sparql_update.py — the Jena UpdateAction
    capability behind the reference's model.add/model.remove batch
    stages): a two-operation request — DELETE/INSERT WHERE rewiring
    ``within`` edges of nations in 'A'-regions to ``in`` +
    reverse ``hasNation`` edges, then an INSERT DATA op — applied as
    broadcast anti/semi joins (the base graph is scanned, never
    exchanged). The oracle replays it relationally as
    (base EXCEPT deleted) UNION inserted — DuckDB set operators use
    the same NULL-equal identity as the eqNullSafe join."""
    from sifr_project_java_ontology_processing_spark.plans.sparql_update import (
        apply_update,
    )

    triples = _nation_triples(spark, sf_dir)
    return apply_update(
        triples,
        """PREFIX ex: <http://ex/>
           DELETE { ?n ex:within ?r }
           INSERT { ?n ex:in ?r . ?r ex:hasNation ?n }
           WHERE { ?n ex:within ?r . ?r ex:label ?l
                   FILTER(regex(?l, "A")) } ;
           INSERT DATA { <g:root> ex:label "Root" }""",
    )


# ===========================================================================
# Round 4 (cont. 3): graph analytics — triangles, multi-source BFS, LPA
# ===========================================================================


@register(
    "graph_triangle_count",
    """
    WITH raw AS (
      SELECT DISTINCT 'p:' || CAST(l1.l_partkey AS VARCHAR) AS a,
                      'p:' || CAST(l2.l_partkey AS VARCHAR) AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM raw),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    corners AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ),
    nodes AS (SELECT a AS node FROM und UNION SELECT b FROM und),
    cnt AS (SELECT node, count(*) AS t FROM corners GROUP BY node)
    SELECT n.node, CAST(coalesce(c.t, 0) AS BIGINT) AS triangles
    FROM nodes n LEFT JOIN cnt c ON n.node = c.node
    """,
)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (graph.triangle_count) over the
    part-co-occurrence graph: parts appearing in the same order are
    linked, so every order with >= 3 distinct parts contributes
    triangles — the KG-density / over-merge diagnostic. The operator
    enumerates wedges only at the (degree, node)-smallest corner
    (degree orientation, O(sqrt(m)) fan-out bound); the oracle replays
    the orientation-invariant triangle set with plain lexical a<b<c
    self-joins, which must agree exactly."""
    from sifr_project_java_ontology_processing_spark.operators.graph import (
        triangle_count,
    )

    # co-occurrence pairs via per-order part-set arrays: one groupBy
    # shuffle + map-side pair enumeration (orders are tiny sets), not a
    # self-join that shuffles the fact table twice (guide §2.4). No
    # .distinct() here — triangle_count's own undirected-dedup covers
    # it, so the former fixture distinct was a redundant full shuffle.
    # Same pair SET as the l1⋈l2 self-join the oracle replays.
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("_pk")
    )
    pairs = per_order.select(
        F.explode(
            F.flatten(
                F.transform(
                    "_pk",
                    lambda a: F.transform(
                        F.filter(F.col("_pk"), lambda b: a < b),
                        lambda b: F.struct(a.alias("_a"), b.alias("_b")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p._a").alias("src"), F.col("p._b").alias("dst"))
    # Count on the raw integer partkeys and prefix "p:" only on the
    # per-node RESULT: the triangle set is invariant under any injective
    # relabeling (least/greatest merely canonicalizes pair order, and
    # the (degree, node) orientation changes enumeration order, never
    # the set), so shuffles, sorts and the ~170M-element
    # array_intersect all run on longs instead of strings.
    out = triangle_count(pairs)
    return out.select(
        F.concat(F.lit("p:"), F.col("node").cast("string")).alias("node"),
        F.col("triangles").cast("long").alias("triangles"),
    )


@register(
    "graph_bfs_distances",
    """
    SELECT 'n:0' AS node, 0 AS dist
    UNION ALL
    SELECT 'n:' || CAST(p_partkey AS VARCHAR),
           CAST(ceil(length(CAST(p_partkey AS VARCHAR)) / 2.0) AS INT)
    FROM part WHERE p_partkey > 0
    """,
)
def q_graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level BFS distances (graph.bfs_distances) from the root of
    the decimal tree over part keys, with SKIP edges: k div 10 -> k
    (append one digit) AND k div 100 -> k (append two digits). The
    shortcut edges create diamonds, so the frontier BFS must keep the
    MINIMUM hop count — which for this graph has the closed form
    ceil(digits(k)/2) that the oracle states directly (every prefix of
    a valid key is a smaller valid key, so 2-digit jumps are always
    available; the engine must discover that relationally)."""
    from sifr_project_java_ontology_processing_spark.operators.graph import (
        bfs_distances,
    )

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") > 0)
    k = F.col("p_partkey")
    e1 = part.select(
        F.concat(F.lit("n:"), F.expr("p_partkey div 10").cast("string")).alias("src"),
        F.concat(F.lit("n:"), k.cast("string")).alias("dst"),
    )
    e2 = part.select(
        F.concat(F.lit("n:"), F.expr("p_partkey div 100").cast("string")).alias("src"),
        F.concat(F.lit("n:"), k.cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2).distinct()
    srcs = spark.createDataFrame([("n:0",)], "node string")
    out = bfs_distances(edges, srcs, max_depth=8)
    return out.select("node", F.col("dist").cast("int").alias("dist"))


@register(
    "graph_label_prop",
    """
    WITH raw AS (
      SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS s,
             'n:' || CAST(c_nationkey AS VARCHAR) AS d
      FROM customer
      UNION ALL
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR),
             'r:' || CAST(n_regionkey AS VARCHAR)
      FROM nation
    ),
    und AS (
      SELECT DISTINCT f, n FROM (
        SELECT s AS f, d AS n FROM raw
        UNION ALL
        SELECT d, s FROM raw
      ) WHERE f <> n
    ),
    l0 AS (SELECT DISTINCT n AS node, n AS label FROM und),
    c1 AS (
      SELECT und.n AS node, l0.label, count(*) AS c
      FROM und JOIN l0 ON und.f = l0.node
      GROUP BY und.n, l0.label
    ),
    l1 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c1
      ) WHERE rn = 1
    ),
    c2 AS (
      SELECT und.n AS node, l1.label, count(*) AS c
      FROM und JOIN l1 ON und.f = l1.node
      GROUP BY und.n, l1.label
    ),
    l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c2
      ) WHERE rn = 1
    )
    SELECT node, label FROM l2
    """,
)
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation
    (graph.label_propagation, 2 iterations) over the
    customer -> nation -> region hierarchy — community detection where
    the ground-truth communities are the nation stars. Classic async
    LPA is run-order-dependent; the synchronous variant with the
    (count DESC, label ASC) tie-break replays exactly as two unrolled
    count+row_number CTE rounds in the oracle."""
    from sifr_project_java_ontology_processing_spark.operators.graph import (
        label_propagation,
    )

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    e1 = cust.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    e2 = nat.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    return label_propagation(e1.unionByName(e2), iterations=2)


# ===========================================================================
# Round 4 (cont. 4): RDFS entailment + SKOS integrity audit
# ===========================================================================

_RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
_RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


_RDFS_ENTAIL_SQL = f"""
    WITH sc AS (
      SELECT DISTINCT 'c:' || p_brand AS sub,
             'c:Mfgr#' || substr(p_brand, 7, 1) AS sup FROM part
      UNION SELECT DISTINCT 'c:Mfgr#' || substr(p_brand, 7, 1), 'c:Product' FROM part
      UNION SELECT 'c:Product', 'c:Thing'
    ),
    sp AS (
      SELECT 'x:madeBy' AS sub, 'x:relatedTo' AS sup
      UNION ALL SELECT 'x:relatedTo', 'x:linked'
    ),
    dom AS (SELECT 'x:madeBy' AS p, 'c:Artifact' AS c),
    rng AS (SELECT 'x:relatedTo' AS p, 'c:Maker' AS c),
    inst_type AS (
      SELECT 'i:' || CAST(p_partkey AS VARCHAR) AS s, 'c:' || p_brand AS o
      FROM part
    ),
    inst_prop AS (
      SELECT DISTINCT 'i:' || CAST(p_partkey AS VARCHAR) AS s,
             'x:madeBy' AS p, 'm:Mfgr#' || substr(p_brand, 7, 1) AS o
      FROM part
    ),
    sc2 AS (SELECT a.sub, b.sup FROM sc a JOIN sc b ON a.sup = b.sub),
    sc3 AS (SELECT a.sub, b.sup FROM sc2 a JOIN sc b ON a.sup = b.sub),
    scc AS (SELECT * FROM sc UNION SELECT * FROM sc2 UNION SELECT * FROM sc3),
    spc AS (
      SELECT * FROM sp
      UNION SELECT a.sub, b.sup FROM sp a JOIN sp b ON a.sup = b.sub
    ),
    prop_all AS (
      SELECT s, p, o FROM inst_prop
      UNION
      SELECT i.s, spc.sup, i.o FROM inst_prop i JOIN spc ON i.p = spc.sub
    ),
    t2 AS (SELECT pa.s AS x, dom.c FROM prop_all pa JOIN dom ON pa.p = dom.p),
    t3 AS (SELECT pa.o AS x, rng.c FROM prop_all pa JOIN rng ON pa.p = rng.p),
    types0 AS (
      SELECT s AS x, o AS c FROM inst_type
      UNION SELECT x, c FROM t2
      UNION SELECT x, c FROM t3
    ),
    types AS (
      SELECT * FROM types0
      UNION SELECT t.x, scc.sup FROM types0 t JOIN scc ON t.c = scc.sub
    )
    SELECT DISTINCT subj, pred, obj,
           CAST(NULL AS VARCHAR) AS obj_lang, false AS obj_is_literal
    FROM (
      SELECT sub AS subj, '{_RDFS_NS}subClassOf' AS pred, sup AS obj FROM scc
      UNION ALL
      SELECT sub, '{_RDFS_NS}subPropertyOf', sup FROM spc
      UNION ALL
      SELECT p, '{_RDFS_NS}domain', c FROM dom
      UNION ALL
      SELECT p, '{_RDFS_NS}range', c FROM rng
      UNION ALL
      SELECT s, p, o FROM prop_all
      UNION ALL
      SELECT x, '{_RDF_TYPE_IRI}', c FROM types
    )
    """


@register(
    "rdfs_entailment",
    _RDFS_ENTAIL_SQL,
)
def q_rdfs_entailment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS materialization (inference.rdfs_entail) over an ontology
    synthesized from part: brand ⊑ mfgr ⊑ Product ⊑ Thing class chain
    (closure depth 3), madeBy ⊑ relatedTo ⊑ linked property chain,
    domain(madeBy)=Artifact, range(relatedTo)=Maker — so every rule
    fires, and rdfs3 fires on an rdfs7-DERIVED assertion. The operator
    closes the schema and applies all rules as broadcast joins against
    the instance stream; the oracle unrolls the closures (known depth)
    and rule joins as CTEs. Exact set equality. (Fixture shared with
    rdfs_entail_incremental via _rdfs_fixture.)"""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_entail,
    )

    from_part, static = _rdfs_fixture(spark, sf_dir)
    tcols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal"]
    return rdfs_entail(
        from_part.select(*tcols).distinct().unionByName(static)
    )


_SKOS_NS = "http://www.w3.org/2004/02/skos/core#"


@register(
    "skos_integrity_audit",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS concept,
           'missing_preflabel' AS issue
    FROM nation WHERE n_nationkey % 3 = 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'multiple_preflabel'
    FROM nation WHERE n_nationkey % 3 <> 0 AND n_nationkey % 5 = 0
    UNION ALL
    SELECT 'r:' || CAST(r_regionkey AS VARCHAR), 'broader_cycle' FROM region
    UNION ALL
    SELECT 'o:' || CAST(s_suppkey AS VARCHAR), 'orphan_concept' FROM supplier
    """,
)
def q_skos_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKOS integrity audit (inference.skos_audit) over a vocabulary
    synthesized with every defect class: nations are concepts broader
    their region (labels withheld for key%3==0 → missing_preflabel;
    an extra @en label added for key%5==0, key%3≠0 →
    multiple_preflabel S14 violation); the 5 regions form a broader
    5-cycle (cycle detection via bounded closure); suppliers are
    labeled concepts with no semantic links → orphan_concept. The
    oracle states the defect sets closed-form from the construction;
    the engine must discover them relationally."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        skos_audit,
    )

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sup = _t(spark, sf_dir, "supplier")
    C, PL, BR = _SKOS_NS + "Concept", _SKOS_NS + "prefLabel", _SKOS_NS + "broader"
    n_iri = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))
    r_of_n = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))
    r_iri = F.concat(F.lit("r:"), F.col("r_regionkey").cast("string"))
    r_next = F.concat(F.lit("r:"), ((F.col("r_regionkey") + 1) % 5).cast("string"))
    o_iri = F.concat(F.lit("o:"), F.col("s_suppkey").cast("string"))

    def trip(s, p, o, lang=None, lit=False):
        return F.struct(
            s.alias("subj"),
            F.lit(p).alias("pred"),
            o.alias("obj"),
            (F.lit(lang) if lang else F.lit(None).cast("string")).alias("obj_lang"),
            F.lit(lit).alias("obj_is_literal"),
        )

    nt = nat.select(
        F.explode(
            F.filter(
                F.array(
                    trip(n_iri, _RDF_TYPE_IRI, F.lit(C)),
                    trip(n_iri, BR, r_of_n),
                    F.when(
                        F.col("n_nationkey") % 3 != 0,
                        trip(n_iri, PL, F.col("n_name"), "en", True),
                    ),
                    F.when(
                        (F.col("n_nationkey") % 3 != 0)
                        & (F.col("n_nationkey") % 5 == 0),
                        trip(
                            n_iri, PL, F.concat(F.lit("alt-"), F.col("n_name")),
                            "en", True,
                        ),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("t")
    ).select("t.*")
    rt = reg.select(
        F.explode(
            F.array(
                trip(r_iri, _RDF_TYPE_IRI, F.lit(C)),
                trip(r_iri, PL, F.col("r_name"), "en", True),
                trip(r_iri, BR, r_next),
            )
        ).alias("t")
    ).select("t.*")
    ot = sup.select(
        F.explode(
            F.array(
                trip(o_iri, _RDF_TYPE_IRI, F.lit(C)),
                trip(o_iri, PL, F.col("s_name"), "en", True),
            )
        ).alias("t")
    ).select("t.*")
    return skos_audit(nt.unionByName(rt).unionByName(ot))


@register(
    "sparql_named_graphs",
    """
    SELECT 'r:' || CAST(r_regionkey AS VARCHAR) AS g,
           r_name AS rl, n_name AS nm
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_sparql_named_graphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL named-graph join (plans/bgp.py GRAPH support — the Jena
    Dataset/NamedModel capability): nation facts are stored one named
    graph per region (graph IRI = the region node), region labels live
    in the default graph; ``GRAPH ?g {...}`` binds the graph label,
    which then joins a default-graph pattern AS A SUBJECT — the
    dataset views are two filters over one quads scan. The oracle is
    the equivalent relational join."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    n_iri = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))
    g_iri = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))
    r_iri = F.concat(F.lit("r:"), F.col("r_regionkey").cast("string"))
    nul = F.lit(None).cast("string")
    named = nat.select(
        n_iri.alias("subj"),
        F.lit("http://ex/name").alias("pred"),
        F.col("n_name").alias("obj"),
        nul.alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        g_iri.alias("graph"),
    )
    dflt = reg.select(
        r_iri.alias("subj"),
        F.lit("http://ex/label").alias("pred"),
        F.col("r_name").alias("obj"),
        nul.alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        nul.alias("graph"),
    )
    quads = named.unionByName(dflt)
    return execute_bgp(
        quads,
        """PREFIX ex: <http://ex/>
           SELECT ?g ?rl ?nm WHERE {
             GRAPH ?g { ?n ex:name ?nm . }
             ?g ex:label ?rl .
           }""",
    )


@register(
    "nquads_roundtrip",
    """
    SELECT 'http://ex/n/' || n_name AS subj, 'http://ex/p/note' AS pred,
           n_name || ' has "quotes" and \\ and ' || chr(9) || chr(10) || '<end>' AS obj,
           CAST(NULL AS VARCHAR) AS obj_lang, true AS obj_is_literal,
           'http://ex/g/' || CAST(n_regionkey AS VARCHAR) AS graph
    FROM nation
    UNION ALL
    SELECT 'http://ex/n/' || n_name, 'http://ex/p/in_region',
           'http://ex/r/' || CAST(n_regionkey AS VARCHAR),
           NULL, false, NULL
    FROM nation
    UNION ALL
    SELECT '_:n' || CAST(n_nationkey AS VARCHAR), 'http://ex/p/label',
           n_name, 'en', true, '_:g' || CAST(n_regionkey AS VARCHAR)
    FROM nation
    """,
)
def q_nquads_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Quads sink∘source identity gate (sources/rdf_io.read_nquads +
    rdf_sink.to_nquads_lines — the named-graph twin of rdf_roundtrip):
    literal rows with the full escaping gauntlet (quotes, backslash,
    tab, newline, an angle-bracketed token that must NOT be read as a
    graph label) in an IRI-named graph; IRI objects in the DEFAULT
    graph (no graph term on the line); blank-node subjects with
    @lang literals in a BLANK-NODE-labeled graph. Serialize → parse
    must be the identity; oracle = the original quad set."""
    from sifr_project_java_ontology_processing_spark.sources.rdf_io import (
        parse_nquads_lines,
    )
    from sifr_project_java_ontology_processing_spark.sources.rdf_sink import (
        to_nquads_lines,
    )

    n = _t(spark, sf_dir, "nation")
    nul = F.lit(None).cast("string")

    def leg(subj, pred, obj, lang, lit, graph):
        return n.select(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            lang.alias("obj_lang"), F.lit(lit).alias("obj_is_literal"),
            graph.alias("graph"),
        )

    quads = (
        leg(
            F.concat(F.lit("http://ex/n/"), F.col("n_name")),
            "http://ex/p/note",
            F.concat(F.col("n_name"), F.lit(' has "quotes" and \\ and \t\n<end>')),
            nul, True,
            F.concat(F.lit("http://ex/g/"), F.col("n_regionkey").cast("string")),
        )
        .unionByName(leg(
            F.concat(F.lit("http://ex/n/"), F.col("n_name")),
            "http://ex/p/in_region",
            F.concat(F.lit("http://ex/r/"), F.col("n_regionkey").cast("string")),
            nul, False, nul,
        ))
        .unionByName(leg(
            F.concat(F.lit("_:n"), F.col("n_nationkey").cast("string")),
            "http://ex/p/label", F.col("n_name"), F.lit("en"), True,
            F.concat(F.lit("_:g"), F.col("n_regionkey").cast("string")),
        ))
    )
    lines = to_nquads_lines(quads)
    out = parse_nquads_lines(lines, "line")
    return out.select(
        "subj", "pred", "obj", "obj_lang", "obj_is_literal", "graph"
    )


_RDFS_PLUS_SQL = f"""
    WITH e AS (
      SELECT DISTINCT 'n:' || CAST(p_partkey // 10 AS VARCHAR) AS s,
             'n:' || CAST(p_partkey AS VARCHAR) AS o
      FROM part WHERE p_partkey > 0
    ),
    d2 AS (SELECT a.s, b.o FROM e a JOIN e b ON a.o = b.s),
    d3 AS (SELECT a.s, b.o FROM d2 a JOIN e b ON a.o = b.s),
    d4 AS (SELECT a.s, b.o FROM d3 a JOIN e b ON a.o = b.s),
    clo AS (
      SELECT s, o FROM e UNION SELECT s, o FROM d2
      UNION SELECT s, o FROM d3 UNION SELECT s, o FROM d4
    ),
    adj AS (
      SELECT 'a:' || CAST(n_nationkey AS VARCHAR) AS s,
             'a:' || CAST((n_nationkey + 1) % 25 AS VARCHAR) AS o
      FROM nation
    ),
    adj_sym AS (SELECT s, o FROM adj UNION SELECT o, s FROM adj)
    SELECT DISTINCT subj, pred, obj,
           CAST(NULL AS VARCHAR) AS obj_lang, false AS obj_is_literal
    FROM (
      SELECT 'p:contains' AS subj, '{_RDF_TYPE_IRI}' AS pred,
             'http://www.w3.org/2002/07/owl#TransitiveProperty' AS obj
      UNION ALL SELECT 'p:contains', 'http://www.w3.org/2002/07/owl#inverseOf',
             'p:within'
      UNION ALL SELECT 'p:adjacent', '{_RDF_TYPE_IRI}',
             'http://www.w3.org/2002/07/owl#SymmetricProperty'
      UNION ALL SELECT 'p:contains', '{_RDFS_NS}range', 'c:Node'
      UNION ALL SELECT s, 'p:contains', o FROM clo
      UNION ALL SELECT o, 'p:within', s FROM clo
      UNION ALL SELECT s, 'p:adjacent', o FROM adj_sym
      UNION ALL SELECT o, '{_RDF_TYPE_IRI}', 'c:Node' FROM clo
    )
    """


@register("rdfs_plus_entailment", _RDFS_PLUS_SQL)
def q_rdfs_plus_entailment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS-Plus / OWL-lite materialization (inference.rdfs_plus_entail):
    the part decimal tree as a TRANSITIVE ``p:contains`` (pooled
    pred-fused frontier-BFS closure), its declared INVERSE ``p:within``
    (which must mirror every CLOSURE pair — the post-closure
    re-application), a SYMMETRIC nation-ring ``p:adjacent``, and
    range(contains)=c:Node firing on derived assertions. The oracle
    unrolls the 4-level closure and states the mirrors/types
    closed-form."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_plus_entail,
    )

    contains, adjacent, static = _rdfs_plus_fixture(spark, sf_dir)
    return rdfs_plus_entail(
        contains.drop("_k")
        .unionByName(adjacent.drop("_k"))
        .unionByName(static),
        max_transitive_depth=6,
    )


def _rdfs_plus_fixture(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The rdfs_plus_entailment asserted graph, shared by the full and
    incremental gates. contains/adjacent carry a ``_k`` split key
    (partkey / nationkey) so the incremental twin can peel a delta."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INVERSEOF,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        RDFS_RANGE,
        RDF_TYPE,
    )

    part = _t(spark, sf_dir, "part").where(F.col("p_partkey") > 0)
    nat = _t(spark, sf_dir, "nation")
    nul = F.lit(None).cast("string")

    def row(s, p, o):
        return F.struct(
            s.alias("subj"),
            (F.lit(p) if isinstance(p, str) else p).alias("pred"),
            o.alias("obj"),
            nul.alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )

    contains = part.select(
        F.col("p_partkey").alias("_k"),
        row(
            F.concat(F.lit("n:"), F.expr("p_partkey div 10").cast("string")),
            "p:contains",
            F.concat(F.lit("n:"), F.col("p_partkey").cast("string")),
        ).alias("t"),
    ).select("_k", "t.*").dropDuplicates(
        ["subj", "pred", "obj", "obj_lang", "obj_is_literal"]
    )
    adjacent = nat.select(
        F.col("n_nationkey").alias("_k"),
        row(
            F.concat(F.lit("a:"), F.col("n_nationkey").cast("string")),
            "p:adjacent",
            F.concat(F.lit("a:"), ((F.col("n_nationkey") + 1) % 25).cast("string")),
        ).alias("t"),
    ).select("_k", "t.*")
    static = spark.createDataFrame(
        [
            ("p:contains", RDF_TYPE, OWL_TRANSITIVE, None, False),
            ("p:contains", OWL_INVERSEOF, "p:within", None, False),
            ("p:adjacent", RDF_TYPE, OWL_SYMMETRIC, None, False),
            ("p:contains", RDFS_RANGE, "c:Node", None, False),
        ],
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    return contains, adjacent, static


@register("rdfs_plus_entail_incremental", _RDFS_PLUS_SQL)
def q_rdfs_plus_entail_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-naive incremental maintenance for the PLUS tier
    (inference.rdfs_plus_entail_delta — round-5 VERDICT ask #4): the
    rdfs_plus_entailment fixture is SPLIT — every 7th part's
    ``p:contains`` edge and every 5th nation's symmetric ``p:adjacent``
    edge arrive as a later instance-only delta batch. The delta
    touches the TRANSITIVE and SYMMETRIC properties, which the plain
    RDFS delta operator would bounce to a full re-entailment; here the
    new closure pairs come from bridging the delta through the old
    closure (C ∪ (C?ΔC?)+ — broadcast joins + a closure job over
    delta-incident pairs only) and must hash-identically equal the
    one-shot materialization (same oracle SQL as rdfs_plus_entailment)."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_plus_entail,
        rdfs_plus_entail_delta,
    )

    contains, adjacent, static = _rdfs_plus_fixture(spark, sf_dir)
    base = (
        contains.where(F.col("_k") % 7 != 0)
        .drop("_k")
        .unionByName(adjacent.where(F.col("_k") % 5 != 0).drop("_k"))
        .unionByName(static)
    )
    delta = (
        contains.where(F.col("_k") % 7 == 0)
        .drop("_k")
        .unionByName(adjacent.where(F.col("_k") % 5 == 0).drop("_k"))
    )
    entailed = rdfs_plus_entail(base, max_transitive_depth=6)
    return rdfs_plus_entail_delta(entailed, delta, max_transitive_depth=6)


@register(
    "sparql_subquery",
    """
    SELECT 'r:' || CAST(r_regionkey AS VARCHAR) AS r, r_name AS rl,
           CAST(count(*) AS BIGINT) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey, r_name
    """,
)
def q_sparql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 subquery (plans/bgp.py ``{ SELECT ... }`` groups —
    the ARQ sub-SELECT capability): an inner GROUP BY aggregation over
    ``ex:within`` membership joined to the outer region-label pattern
    on the projected variable. The subquery evaluates as its own
    solution frame; non-projected inner variables stay scoped. Oracle
    = the equivalent relational aggregate join."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?r ?rl ?n WHERE {
             ?r ex:label ?rl .
             { SELECT ?r (COUNT(?x) AS ?n) WHERE { ?x ex:within ?r . }
               GROUP BY ?r }
           }""",
    )


@register(
    "table_profile",
    """
    SELECT 'o_custkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(min(o_custkey) AS VARCHAR) AS min_value,
           CAST(max(o_custkey) AS VARCHAR) AS max_value,
           avg(o_custkey) AS avg_value,
           CAST(sum(o_custkey) AS DOUBLE) AS sum_value
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderkey) AS BIGINT),
           CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR),
           avg(o_orderkey), CAST(sum(o_orderkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(min(o_orderstatus) AS VARCHAR),
           CAST(max(o_orderstatus) AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM orders
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (operators/profiling.py::profile_table, exact
    mode): null counts, exact distinct counts, lexical min/max and
    numeric moments for four orders columns — ALL computed in ONE
    aggregation pass (single scan, partial-agg), then pivoted one row
    per column via stack(). The approx=True twin swaps exact distincts
    for HyperLogLog++ sketches (single narrow pass, no expand — the
    100 TB default); the oracle replays the exact mode per column."""
    from sifr_project_java_ontology_processing_spark.operators.profiling import (
        profile_table,
    )

    orders = _t(spark, sf_dir, "orders")
    return profile_table(
        orders, ["o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus"]
    )


def _rdfs_fixture(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The rdfs_entailment asserted graph (shared by the full and
    incremental gates)."""
    part = _t(spark, sf_dir, "part")
    nul = F.lit(None).cast("string")

    def trip(s, pr, o):
        return F.struct(
            s.alias("subj"),
            (F.lit(pr) if isinstance(pr, str) else pr).alias("pred"),
            o.alias("obj"),
            nul.alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )

    brand = F.concat(F.lit("c:"), F.col("p_brand"))
    mfgr = F.concat(F.lit("c:Mfgr#"), F.substring(F.col("p_brand"), 7, 1))
    inst = F.concat(F.lit("i:"), F.col("p_partkey").cast("string"))
    maker = F.concat(F.lit("m:Mfgr#"), F.substring(F.col("p_brand"), 7, 1))
    sub_cls = f"{_RDFS_NS}subClassOf"
    sub_prp = f"{_RDFS_NS}subPropertyOf"
    from_part = part.select(
        F.col("p_partkey"),
        F.explode(
            F.array(
                trip(brand, sub_cls, mfgr),
                trip(mfgr, sub_cls, F.lit("c:Product")),
                trip(inst, _RDF_TYPE_IRI, brand),
                trip(inst, "x:madeBy", maker),
            )
        ).alias("t"),
    ).select("p_partkey", "t.*")
    static = spark.createDataFrame(
        [
            ("c:Product", sub_cls, "c:Thing", None, False),
            ("x:madeBy", sub_prp, "x:relatedTo", None, False),
            ("x:relatedTo", sub_prp, "x:linked", None, False),
            ("x:madeBy", f"{_RDFS_NS}domain", "c:Artifact", None, False),
            ("x:relatedTo", f"{_RDFS_NS}range", "c:Maker", None, False),
        ],
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    return from_part, static


@register("rdfs_entail_incremental", _RDFS_ENTAIL_SQL)
def q_rdfs_entail_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-naive incremental maintenance gate
    (inference.rdfs_entail_delta): the rdfs_entailment fixture is SPLIT
    — instance triples of parts with p_partkey % 7 == 0 arrive as a
    later delta batch — and the incrementally-maintained graph must
    hash-identically equal the full one-shot entailment (the oracle is
    the SAME SQL as rdfs_entailment). Proves new-batch cost is
    rules-over-the-delta + one anti-join, not a re-materialization."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        rdfs_entail,
        rdfs_entail_delta,
    )

    from_part, static = _rdfs_fixture(spark, sf_dir)
    tcols = ["subj", "pred", "obj", "obj_lang", "obj_is_literal"]
    is_delta = (F.col("p_partkey") % 7 == 0) & ~F.col("pred").startswith(
        "http://www.w3.org/2000/01/rdf-schema#"
    )
    base = (
        from_part.where(~is_delta).select(*tcols).distinct().unionByName(static)
    )
    delta = from_part.where(is_delta).select(*tcols).distinct()
    return rdfs_entail_delta(rdfs_entail(base), delta)


@register(
    "functional_violations",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS node, 'p:region' AS pred,
           CAST(2 AS BIGINT) AS n_values, 'functional' AS kind
    FROM nation WHERE n_nationkey % 5 = 0
    UNION ALL
    SELECT 'v:' || CAST(s_suppkey % 40 AS VARCHAR), 'p:code',
           CAST(count(DISTINCT s_suppkey) AS BIGINT), 'inverse_functional'
    FROM supplier GROUP BY s_suppkey % 40
    HAVING count(DISTINCT s_suppkey) > 1
    """,
)
def q_functional_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-one consistency audit (inference.functional_violations):
    p:region declared owl:FunctionalProperty (nations with key%5==0 get
    a second region edge → functional violations); p:code declared
    owl:InverseFunctionalProperty with supplier codes folded mod 40 →
    shared values are entity-resolution signals. Oracle states the
    violation sets closed-form."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_FUNCTIONAL,
        OWL_INVERSE_FUNCTIONAL,
        RDF_TYPE,
        functional_violations,
    )

    nat = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier")
    nul = F.lit(None).cast("string")

    def row(s, p, o):
        return F.struct(
            s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"),
            nul.alias("obj_lang"), F.lit(False).alias("obj_is_literal"),
        )

    n_iri = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))
    r1 = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))
    r2 = F.concat(F.lit("r:"), ((F.col("n_regionkey") + 1) % 5).cast("string"))
    nt = nat.select(
        F.explode(
            F.filter(
                F.array(
                    row(n_iri, "p:region", r1),
                    F.when(F.col("n_nationkey") % 5 == 0, row(n_iri, "p:region", r2)),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("t")
    ).select("t.*")
    st = sup.select(
        row(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")),
            "p:code",
            F.concat(F.lit("v:"), (F.col("s_suppkey") % 40).cast("string")),
        ).alias("t")
    ).select("t.*")
    decl = spark.createDataFrame(
        [
            ("p:region", RDF_TYPE, OWL_FUNCTIONAL, None, False),
            ("p:code", RDF_TYPE, OWL_INVERSE_FUNCTIONAL, None, False),
        ],
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    out = functional_violations(nt.unionByName(st).unionByName(decl))
    return out.select(
        "node", "pred", F.col("n_values").cast("long").alias("n_values"), "kind"
    )


_BOILER = " ".join(f"bp{i}" for i in range(24))


@register(
    "duplicate_spans",
    f"""
    WITH docs2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' ' || '{_BOILER}'
                  ELSE text END AS text
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
      FROM docs2
    ),
    wins AS (
      SELECT doc_id, CAST(u.i AS INT) AS pos,
             md5(array_to_string(t[u.i + 1 : u.i + 20], ' ')) AS h
      FROM toks, UNNEST(range(0, greatest(len(t) - 20 + 1, 0))) AS u(i)
      WHERE len(t) >= 20
    ),
    hot AS (SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT DISTINCT w.doc_id, w.pos FROM wins w JOIN hot USING (h)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN max(pos + 20) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR pos > max(pos + 20) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS ni
      FROM hits
    ),
    grp AS (
      SELECT doc_id, pos,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_token,
           CAST(max(pos) + 20 AS BIGINT) AS end_token
    FROM grp GROUP BY doc_id, island
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-region detection
    (dedup.duplicate_spans → merge_duplicate_regions): a 24-token
    boilerplate is appended to every 10th document, and every
    20-token window shared by ≥2 docs is found via hashed windows +
    one distinct-doc partial agg, then merged into maximal regions
    (gaps-and-islands per doc). Finds BOTH the planted boilerplate
    and any natural cross-doc duplication; the oracle replays windows,
    hot-hash selection, and island merging relationally."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        duplicate_spans,
        merge_duplicate_regions,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" " + _BOILER)),
        ).otherwise(F.col("text")).alias("text"),
    )
    spans = duplicate_spans(docs, span_tokens=20, stride=1, min_docs=2)
    out = merge_duplicate_regions(spans, span_tokens=20)
    return out.select(
        "doc_id",
        F.col("start_token").cast("long").alias("start_token"),
        F.col("end_token").cast("long").alias("end_token"),
    )


@register(
    "graph_personalized_pr",
    f"""
    WITH e AS ({_PR_EDGES_SQL}),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    rv AS (SELECT node,
                  CASE WHEN node LIKE 'g:%' THEN CAST(1.0 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END AS r
           FROM nodes),
    r0 AS (SELECT node, r AS rank FROM rv),
    c1 AS (SELECT e.dst AS node, sum(r0.rank / deg.d) AS m
           FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r1 AS (SELECT rv.node,
                  CAST(0.15 AS DOUBLE) * rv.r + CAST(0.85 AS DOUBLE) * coalesce(c1.m, 0) AS rank
           FROM rv LEFT JOIN c1 ON rv.node = c1.node),
    c2 AS (SELECT e.dst AS node, sum(r1.rank / deg.d) AS m
           FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r2 AS (SELECT rv.node,
                  CAST(0.15 AS DOUBLE) * rv.r + CAST(0.85 AS DOUBLE) * coalesce(c2.m, 0) AS rank
           FROM rv LEFT JOIN c2 ON rv.node = c2.node),
    c3 AS (SELECT e.dst AS node, sum(r2.rank / deg.d) AS m
           FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r3 AS (SELECT rv.node,
                  CAST(0.15 AS DOUBLE) * rv.r + CAST(0.85 AS DOUBLE) * coalesce(c3.m, 0) AS rank
           FROM rv LEFT JOIN c3 ON rv.node = c3.node)
    SELECT node, round(rank, 6) AS rank FROM r3
    """,
)
def q_graph_personalized_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized (topic-sensitive) PageRank over the KG edge list:
    teleport mass concentrated on the 50 group-hub nodes, so rank is
    relatedness to the hubs (seed-set entity relatedness — the KG
    recommendation primitive). Same resident-edge iteration shape as
    graph_pagerank with the reset vector riding the node frame; the
    oracle unrolls 3 iterations with the seeded reset vector."""
    from sifr_project_java_ontology_processing_spark.operators.graph import pagerank

    edges = _pr_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .where(F.col("node").startswith("g:"))
        .distinct()
    )
    ranks = pagerank(edges, iterations=3, damping=0.85, reset_nodes=seeds)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@register(
    "graph_diff",
    """
    WITH old AS (
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS subj,
             'p:name' AS pred, n_name AS obj,
             CAST(NULL AS VARCHAR) AS obj_lang, true AS obj_is_literal
      FROM nation
      UNION ALL
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'p:in',
             'r:' || CAST(n_regionkey AS VARCHAR), NULL, false
      FROM nation
    ),
    new AS (
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS subj,
             'p:name' AS pred,
             CASE WHEN n_nationkey % 4 = 0 THEN n_name || '!' ELSE n_name END AS obj,
             CAST(NULL AS VARCHAR) AS obj_lang, true AS obj_is_literal
      FROM nation
      UNION ALL
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'p:in',
             'r:' || CAST(n_regionkey AS VARCHAR), NULL, false
      FROM nation WHERE n_nationkey % 3 <> 0
    )
    SELECT subj, pred, obj, obj_lang, obj_is_literal, 'added' AS change
    FROM (SELECT * FROM new EXCEPT SELECT * FROM old)
    UNION ALL
    SELECT subj, pred, obj, obj_lang, obj_is_literal, 'removed'
    FROM (SELECT * FROM old EXCEPT SELECT * FROM new)
    """,
)
def q_graph_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ontology release diff (metrics.graph_diff): version 2 renames
    every 4th nation (add+remove pair per rename) and drops every 3rd
    nation's region edge (remove only); everything else is unchanged
    and must NOT appear. Two null-safe anti-joins vs the oracle's
    EXCEPT-based set difference (DuckDB EXCEPT uses the same
    null-equal identity as eqNullSafe)."""
    from sifr_project_java_ontology_processing_spark.operators.metrics import (
        graph_diff,
    )

    nat = _t(spark, sf_dir, "nation")
    nul = F.lit(None).cast("string")

    def leg(df, subj, pred, obj, lit):
        return df.select(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            nul.alias("obj_lang"), F.lit(lit).alias("obj_is_literal"),
        )

    n_iri = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))
    r_iri = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))
    old = leg(nat, n_iri, "p:name", F.col("n_name"), True).unionByName(
        leg(nat, n_iri, "p:in", r_iri, False)
    )
    new_name = F.when(
        F.col("n_nationkey") % 4 == 0, F.concat(F.col("n_name"), F.lit("!"))
    ).otherwise(F.col("n_name"))
    new = leg(nat, n_iri, "p:name", new_name, True).unionByName(
        leg(nat.where(F.col("n_nationkey") % 3 != 0), n_iri, "p:in", r_iri, False)
    )
    return graph_diff(old, new)


@register(
    "shacl_validate",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS focus, 's_name' AS shape_id,
           'x:name' AS path, 'min_count' AS constraint_name, '0' AS value
    FROM nation WHERE n_nationkey % 5 = 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_name', 'x:name',
           'max_count', '2'
    FROM nation WHERE n_nationkey % 7 = 0 AND n_nationkey % 5 <> 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_name', 'x:name',
           'pattern', lower(n_name)
    FROM nation WHERE n_nationkey % 3 = 0 AND n_nationkey % 5 <> 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_within', 'x:within',
           'min_count', '0'
    FROM nation WHERE n_nationkey % 4 = 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_within', 'x:within',
           'class', 'x:bad'
    FROM nation WHERE n_nationkey % 6 = 0 AND n_nationkey % 4 <> 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_code', 'x:code',
           'datatype', 'X' || CAST(n_nationkey AS VARCHAR)
    FROM nation WHERE n_nationkey % 9 = 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_seg', 'x:seg',
           'in', 'odd-size'
    FROM nation WHERE n_nationkey % 8 = 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_tag', 'x:tag',
           'min_length', 'ab'
    FROM nation WHERE n_nationkey % 10 = 0
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 's_tag', 'x:tag',
           'max_length', 'toolongtag'
    FROM nation WHERE n_nationkey % 11 = 0 AND n_nationkey % 10 <> 0
    """,
)
def q_shacl_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite validation (operators/shacl.py — the declarative twin
    of the reference's hand-coded cleaning rules): nations carry
    planted defects for every constraint kind — missing names
    (minCount), doubled names (maxCount), lowercased names (pattern),
    dropped region links (minCount), links to an untyped node
    (sh:class) — plus the round-5 extended constraints: non-integer
    codes (sh:datatype lexical space), an out-of-list segment (sh:in),
    and too-short/too-long tags (sh:minLength/maxLength). The compiled
    per-shape plan must find exactly the planted set, which the oracle
    states closed-form."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        RDF_TYPE,
    )
    from sifr_project_java_ontology_processing_spark.operators.shacl import (
        SHAPE_SCHEMA_EXT,
        validate_shapes,
    )

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    nul = F.lit(None).cast("string")
    k = F.col("n_nationkey")
    n_iri = F.concat(F.lit("n:"), k.cast("string"))
    r_iri = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))

    def trip(s, p, o, lit):
        return F.struct(
            s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"),
            nul.alias("obj_lang"), F.lit(lit).alias("obj_is_literal"),
        )

    primary = F.when(k % 3 == 0, F.lower(F.col("n_name"))).otherwise(
        F.col("n_name")
    )
    rows = nat.select(
        F.explode(
            F.filter(
                F.array(
                    trip(n_iri, RDF_TYPE, F.lit("x:Nation"), False),
                    F.when(k % 5 != 0, trip(n_iri, "x:name", primary, True)),
                    F.when(
                        (k % 7 == 0) & (k % 5 != 0),
                        trip(n_iri, "x:name",
                             F.concat(F.col("n_name"), F.lit("-2")), True),
                    ),
                    F.when(
                        k % 4 != 0,
                        trip(
                            n_iri, "x:within",
                            F.when(k % 6 == 0, F.lit("x:bad")).otherwise(r_iri),
                            False,
                        ),
                    ),
                    trip(
                        n_iri, "x:code",
                        F.when(
                            k % 9 == 0, F.concat(F.lit("X"), k.cast("string"))
                        ).otherwise((k + 1000).cast("string")),
                        True,
                    ),
                    trip(
                        n_iri, "x:seg",
                        F.when(k % 8 == 0, F.lit("odd-size"))
                        .when(k % 2 == 0, F.lit("small"))
                        .otherwise(F.lit("big")),
                        True,
                    ),
                    trip(
                        n_iri, "x:tag",
                        F.when(k % 10 == 0, F.lit("ab"))
                        .when(k % 11 == 0, F.lit("toolongtag"))
                        .otherwise(F.concat(F.lit("tag"), k.cast("string"))),
                        True,
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("t")
    ).select("t.*")
    rt = reg.select(
        trip(
            F.concat(F.lit("r:"), F.col("r_regionkey").cast("string")),
            RDF_TYPE, F.lit("x:Region"), False,
        ).alias("t")
    ).select("t.*")
    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    shapes = spark.createDataFrame(
        [
            ("s_name", "x:Nation", "x:name", 1, 1, "Literal", "^NATION",
             None, None, None, None, None),
            ("s_within", "x:Nation", "x:within", 1, None, "IRI", None,
             "x:Region", None, None, None, None),
            ("s_code", "x:Nation", "x:code", None, None, None, None,
             None, XSD_INT, None, None, None),
            ("s_seg", "x:Nation", "x:seg", None, None, None, None,
             None, None, ["small", "big"], None, None),
            ("s_tag", "x:Nation", "x:tag", None, None, None, None,
             None, None, None, 3, 6),
        ],
        SHAPE_SCHEMA_EXT,
    )
    return validate_shapes(rows.unionByName(rt), shapes)


# ===========================================================================
# Round 5: SPARQL typed-numeric ordering
# ===========================================================================

_TYPED_ORDER_SPARQL = """
PREFIX ex: <http://ex/>
SELECT ?c ?b WHERE {
  ?c ex:bal ?b .
  FILTER(?b > 50000)
} ORDER BY DESC(?b) ?c LIMIT 40
"""


@register(
    "sparql_typed_order",
    """
    WITH t(c, b, dt) AS (
      SELECT 'c:' || CAST(c_custkey AS VARCHAR),
             CASE WHEN c_custkey % 7 = 0 THEN 'n/a'
                  ELSE CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR)
             END,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE 'http://www.w3.org/2001/XMLSchema#integer'
             END
      FROM customer
      UNION ALL
      SELECT 'c:' || CAST(c_custkey AS VARCHAR), '123456789', NULL
      FROM customer WHERE c_custkey % 11 = 0
    ),
    f AS (
      SELECT c, b,
             CASE WHEN dt = 'http://www.w3.org/2001/XMLSchema#integer'
                  THEN TRY_CAST(b AS DOUBLE) END AS n
      FROM t
      WHERE TRY_CAST(b AS DOUBLE) > 50000
    )
    SELECT c, b FROM f
    ORDER BY n DESC NULLS LAST, b DESC,
             TRY_CAST(c AS DOUBLE) ASC NULLS LAST, c ASC
    LIMIT 40
    """,
)
def q_sparql_typed_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL typed-numeric ordering (round-5 VERDICT ask #3 — the
    Jena/ARQ behavior a SPARQL user expects for xsd:integer literals):
    account balances as integer-cents literals typed
    ``^^xsd:integer``, a 'n/a' untyped literal every 7th customer, and
    a numeric-LOOKING but UNTYPED decoy ('123456789') every 11th.
    ``execute_bgp(..., typed_numerics=True)`` must (a) order the
    top-40 numerically (lexical ordering would rank '999xx' above
    '10000xx' — different set, hash mismatch), (b) keep the decoy out
    of the numeric ranks because its datatype column is NULL
    (datatype-GATED casting, not blind try-cast), and (c) filter
    ?b > 50000 numerically with type-error rows dropped, not crashed.
    The oracle replays the exact (numeric NULLS LAST, lexical) sort
    key in DuckDB."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    cust = _t(spark, sf_dir, "customer")
    c_iri = F.concat(F.lit("c:"), F.col("c_custkey").cast("string"))
    cents = F.round(F.col("c_acctbal") * 100).cast("long").cast("string")
    is_na = F.col("c_custkey") % 7 == 0
    base = cust.select(
        c_iri.alias("subj"),
        F.lit("http://ex/bal").alias("pred"),
        F.when(is_na, F.lit("n/a")).otherwise(cents).alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.when(is_na, F.lit(None).cast("string"))
        .otherwise(F.lit(XSD_INT))
        .alias("obj_datatype"),
    )
    decoy = cust.where(F.col("c_custkey") % 11 == 0).select(
        c_iri.alias("subj"),
        F.lit("http://ex/bal").alias("pred"),
        F.lit("123456789").alias("obj"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("obj_datatype"),
    )
    return execute_bgp(
        base.unionByName(decoy), _TYPED_ORDER_SPARQL, typed_numerics=True
    )


@register(
    "sparql_path_group",
    """
    SELECT 'n:' || CAST(a.n_nationkey AS VARCHAR) AS a,
           'n:' || CAST(b.n_nationkey AS VARCHAR) AS b
    FROM nation a JOIN nation b
      ON a.n_nationkey > b.n_nationkey
     AND (a.n_nationkey - b.n_nationkey) % 2 = 0
    """,
)
def q_sparql_path_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parenthesized property-path groups (plans/bgp.py — round-5
    VERDICT ask #6): ``(ex:prev/ex:prev)+`` over the 25-deep nation
    ``prev`` chain. The group compiles to a DERIVED edge frame (two
    pred-filtered scans joined on a fresh midpoint = the two-step
    relation k -> k-2), then the ``+`` closure runs the frontier-BFS
    transitive_closure over it — so the result is exactly the
    even-positive-distance pairs, which the oracle states closed-form
    as a key-arithmetic self-join."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?a ?b WHERE { ?a (ex:prev/ex:prev)+ ?b }""",
    )


@register(
    "graph_pagerank_named",
    f"""
    WITH e AS ({_PR_EDGES_SQL}),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
    c1 AS (SELECT e.dst AS node, sum(r0.rank / deg.d) AS m
           FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r1 AS (SELECT n.node,
                  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * coalesce(c1.m, 0)
                    AS rank
           FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
    c2 AS (SELECT e.dst AS node, sum(r1.rank / deg.d) AS m
           FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r2 AS (SELECT n.node,
                  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * coalesce(c2.m, 0)
                    AS rank
           FROM nodes n LEFT JOIN c2 ON n.node = c2.node),
    c3 AS (SELECT e.dst AS node, sum(r2.rank / deg.d) AS m
           FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
           GROUP BY e.dst),
    r3 AS (SELECT n.node,
                  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * coalesce(c3.m, 0)
                    AS rank
           FROM nodes n LEFT JOIN c3 ON n.node = c3.node)
    SELECT node, round(rank, 6) AS rank FROM r3
    """,
)
def q_graph_pagerank_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quads-aware analytics (round-5 VERDICT ask #7): the pagerank
    edge list is wrapped in a QUADS frame as graph ``g:main``, with
    REVERSED decoy edges planted in graph ``g:noise`` and self-style
    decoys in the default graph. ``named_graph_edges(quads, "g:main")``
    is one pushdown-eligible literal filter (partition-pruning-eligible
    on a graph-partitioned table); ranks over the restricted view must
    match the plain graph_pagerank oracle exactly — any leak from the
    other graphs shifts every rank and hash-mismatches."""
    from sifr_project_java_ontology_processing_spark.operators.graph import (
        named_graph_edges,
        pagerank,
    )

    e = _pr_edges(spark, sf_dir)
    nul = F.lit(None).cast("string")

    def quad(src, dst, g):
        return [
            F.col(src).alias("subj"),
            F.lit("x:link").alias("pred"),
            F.col(dst).alias("obj"),
            nul.alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
            (F.lit(g) if g else nul).alias("graph"),
        ]

    quads = (
        e.select(*quad("src", "dst", "g:main"))
        .unionByName(e.select(*quad("dst", "src", "g:noise")))
        .unionByName(e.limit(500).select(*quad("src", "src", None)))
    )
    ranks = pagerank(
        named_graph_edges(quads, "g:main"), iterations=3, damping=0.85
    )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@register(
    "sparql_term_fns",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS s,
           'fr' AS lg,
           'lit' AS kind
    FROM nation
    WHERE n_nationkey % 2 = 0 AND n_nationkey % 3 = 0
    """,
)
def q_sparql_term_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 RDF-term inspector builtins (plans/bgp.py round 5):
    ``lang()`` / ``datatype()`` / ``isIRI`` / ``isLiteral`` / ``IF``
    compiled against the ``__m_*`` term-metadata companions projected
    at the pattern scan. Fixture: every nation gets a lang-tagged note
    (fr for even keys, en for odd) and a score literal typed
    ``^^xsd:integer`` only when key %% 3 == 0 (plain otherwise — which
    RDF 1.1 makes xsd:string, so datatype() discriminates); the filter
    keeps fr-tagged notes with integer-typed scores and the BINDs
    re-derive the tag and term kind. Oracle states the key arithmetic
    closed-form."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    nat = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    n_iri = F.concat(F.lit("n:"), k.cast("string"))
    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    nul = F.lit(None).cast("string")
    note = nat.select(
        n_iri.alias("subj"),
        F.lit("http://ex/note").alias("pred"),
        F.col("n_name").alias("obj"),
        F.when(k % 2 == 0, F.lit("fr")).otherwise(F.lit("en")).alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        nul.alias("obj_datatype"),
    )
    score = nat.select(
        n_iri.alias("subj"),
        F.lit("http://ex/score").alias("pred"),
        k.cast("string").alias("obj"),
        nul.alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        F.when(k % 3 == 0, F.lit(XSD_INT)).otherwise(nul).alias("obj_datatype"),
    )
    return execute_bgp(
        note.unionByName(score),
        """PREFIX ex: <http://ex/>
           SELECT ?s ?lg ?kind WHERE {
             ?s ex:note ?v .
             ?s ex:score ?w .
             BIND(lang(?v) AS ?lg)
             BIND(IF(isIRI(?v), "iri", "lit") AS ?kind)
             FILTER(lang(?v) = "fr" &&
                    datatype(?w) = <http://www.w3.org/2001/XMLSchema#integer> &&
                    isLiteral(?w))
           }""",
    )


@register(
    "sparql_str_num_fns",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS s,
           floor(n_nationkey - 12.5) AS fl,
           floor(n_nationkey - 12.5 + 0.5) AS rd,
           abs(n_nationkey - 12.5) AS ab,
           CASE WHEN instr(n_name, 'A') > 0
                THEN substr(n_name, instr(n_name, 'A') + 1)
                ELSE '' END AS aft
    FROM nation WHERE n_nationkey % 2 = 0
    """,
)
def q_sparql_str_num_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL string/numeric builtins + langMatches (plans/bgp.py
    round 5): scores are half-integer literals straddling zero, so
    FLOOR/CEIL/ROUND/ABS exercise fn:round's toward-+inf .5 ties and
    the try_cast type-error path, STRAFTER splits the note's lexical
    form on its first 'A', and langMatches(lang(?v), "fr") keeps the
    fr-tagged (even-key) notes. All map-side Catalyst expressions over
    one pattern join; the oracle states the key arithmetic
    closed-form."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    nat = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    n_iri = F.concat(F.lit("n:"), k.cast("string"))
    nul = F.lit(None).cast("string")
    note = nat.select(
        n_iri.alias("subj"),
        F.lit("http://ex/note").alias("pred"),
        F.col("n_name").alias("obj"),
        F.when(k % 2 == 0, F.lit("fr")).otherwise(F.lit("en")).alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        nul.alias("obj_datatype"),
    )
    score = nat.select(
        n_iri.alias("subj"),
        F.lit("http://ex/score").alias("pred"),
        (k - 12.5).cast("string").alias("obj"),
        nul.alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        nul.alias("obj_datatype"),
    )
    return execute_bgp(
        note.unionByName(score),
        """PREFIX ex: <http://ex/>
           SELECT ?s ?fl ?rd ?ab ?aft WHERE {
             ?s ex:score ?w .
             ?s ex:note ?v .
             FILTER(langMatches(lang(?v), "fr"))
             BIND(FLOOR(?w) AS ?fl)
             BIND(ROUND(?w) AS ?rd)
             BIND(ABS(?w) AS ?ab)
             BIND(STRAFTER(?v, "A") AS ?aft)
           }""",
    )


@register(
    "sparql_hash_fns",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS s,
           md5(n_name) AS h,
           sha256(n_name) AS h2,
           'n:' || CAST(n_nationkey AS VARCHAR) AS u
    FROM nation
    WHERE regexp_matches(n_name, 'nation_1', 'i')
    """,
)
def q_sparql_hash_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 17.4.4 hash builtins + 17.4.3.14 regex flags +
    17.4.2.8 IRI() (plans/bgp.py round 5): MD5/SHA256 over the lexical
    form as lowercase hex (DuckDB twins exist for exactly these two —
    SHA1/384/512 and ENCODE_FOR_URI are pytest-gated against
    hashlib/urllib instead), regex(?v, pat, "i") compiled to the
    inline (?i) Java/RE2-common flag group, and IRI(?s) as identity on
    an already-absolute lexical form. All map-side Catalyst
    expressions on one pattern scan."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    nat = _t(spark, sf_dir, "nation")
    nul = F.lit(None).cast("string")
    triples = nat.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("http://ex/name").alias("pred"),
        F.col("n_name").alias("obj"),
        nul.alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        nul.alias("obj_datatype"),
    )
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?s ?h ?h2 ?u WHERE {
             ?s ex:name ?v .
             BIND(MD5(?v) AS ?h)
             BIND(SHA256(?v) AS ?h2)
             BIND(IRI(?s) AS ?u)
             FILTER(regex(?v, "nation_1", "i"))
           }""",
    )


@register(
    "semantic_dedup",
    f"""
    WITH cents(cidx, cvec) AS (VALUES {_ivf_cents_values()}),
    allsims AS (
      SELECT e.vec_id, e.embedding, c.cidx,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                     CAST(c.cvec AS DOUBLE[])), 9) DESC,
                        c.cidx ASC) AS rn
      FROM embeddings e CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, embedding, cidx FROM allsims WHERE rn = 1),
    dups AS (
      SELECT DISTINCT a.vec_id
      FROM assign a JOIN assign b
        ON a.cidx = b.cidx AND b.vec_id < a.vec_id
       AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
    )
    SELECT a.vec_id, CAST(a.cidx AS INT) AS cell,
           (d.vec_id IS NOT NULL) AS is_dup
    FROM assign a LEFT JOIN dups d ON a.vec_id = d.vec_id
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic dedup
    (similarity.semantic_dedup): nearest-centroid assignment against
    the committed trained codebook, within-cell keep-first near-dup
    marking at cosine >= 0.3. Pair cost is sum-of-cell-sizes-squared
    instead of the n^2 GEMM — the published web-scale shape — with the
    pair join one hash join on the cell id and the cosine a JVM-side
    aggregate expression. The oracle replays assignment (round-9,
    lowest-index ties) and the keep-first rule verbatim."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        semantic_dedup,
    )

    fx = _ivf_fixture()
    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, fx["centroids"], threshold=0.3)


# ===========================================================================
# Round 5 (cont.): nested groups, complex OPTIONAL, ORDER BY expressions
# ===========================================================================


@register(
    "sparql_nested_union",
    """
    WITH nat AS (
      SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS n, n_name, n_regionkey
      FROM nation
    ),
    u AS (
      SELECT n, r_name AS v
      FROM nat JOIN region ON n_regionkey = r_regionkey
      UNION ALL
      SELECT n, n_name FROM nat
    )
    SELECT n, v FROM u ORDER BY n, v
    """,
)
def q_sparql_nested_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION nested INSIDE a group, joined with a sibling pattern —
    the shape SPARQL group semantics require and a top-level-only
    UNION cannot express (plans/bgp.py::_parse_group_union). The
    union sub-plan evaluates bottom-up (branch vars align
    null-filled: the first alternative binds ?r, the second does
    not) and joins the enclosing ?n a ex:Nation scan on the shared
    variable. The oracle replays it as a relational UNION ALL
    joined to the typed-node set."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """SELECT ?n ?v WHERE {
             ?n a <http://ex/Nation> .
             { ?n <http://ex/within> ?r . ?r <http://ex/label> ?v . }
             UNION
             { ?n <http://ex/name> ?v . }
           } ORDER BY ?n ?v""",
    )


@register(
    "sparql_optional_bind",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS n,
           CASE WHEN n_nationkey > 0
                THEN UPPER('n:' || CAST(n_nationkey - 1 AS VARCHAR)) END AS pu,
           CASE WHEN n_nationkey > 1
                THEN 'n:' || CAST(n_nationkey - 2 AS VARCHAR) END AS pp
    FROM nation ORDER BY n
    """,
)
def q_sparql_optional_bind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL with full group semantics (plans/bgp.py
    ``optional_subs``): the group carries a BIND and a nested
    OPTIONAL, so it compiles to an independent SELECT-* sub-plan
    LEFT-joined on ?n — the group's bind/inner-join apply inside it,
    a failing group leaves the outer row with unbound vars. n:0 has
    no prev (whole group unbound); n:1's prev n:0 has no prev of its
    own (?pu bound, ?pp unbound) — both null shapes replayed by the
    oracle's CASE arms."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """SELECT ?n ?pu ?pp WHERE {
             ?n <http://ex/name> ?nm .
             OPTIONAL {
               ?n <http://ex/prev> ?p .
               BIND(UCASE(?p) AS ?pu)
               OPTIONAL { ?p <http://ex/prev> ?pp . }
             }
           } ORDER BY ?n""",
    )


@register(
    "sparql_order_expr",
    """
    SELECT n_name AS nm
    FROM nation
    ORDER BY LENGTH(n_name) DESC, n_name
    LIMIT 10
    """,
)
def q_sparql_order_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY expression keys (plans/bgp.py): DESC(STRLEN(?nm))
    with the plain-var tie-break making the order total, sliced by
    LIMIT so the ordering is semantically visible to the
    order-insensitive hash compare (a wrong sort picks a different
    top-10). Expression keys sort pre-projection inside the same
    Catalyst TakeOrderedAndProject as var keys."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """SELECT ?nm WHERE { ?n <http://ex/name> ?nm . }
           ORDER BY DESC(STRLEN(?nm)) ?nm LIMIT 10""",
    )


@register(
    "owl_sameas_consolidation",
    """
    WITH nat AS (SELECT n_nationkey AS k, n_name FROM nation)
    SELECT DISTINCT * FROM (
      SELECT 'm:' || CAST(k AS VARCHAR) AS subj,
             'http://ex/name' AS pred, n_name AS obj,
             CAST(NULL AS VARCHAR) AS obj_lang, TRUE AS obj_is_literal
      FROM nat
      UNION ALL
      SELECT 'm:' || CAST(k AS VARCHAR), 'http://ex/tag',
             't:' || CAST(k % 5 AS VARCHAR), NULL, TRUE
      FROM nat
      UNION ALL
      SELECT 's:' || CAST(k AS VARCHAR), 'http://ex/name', n_name, NULL, TRUE
      FROM nat WHERE k < 5
      UNION ALL
      -- the n:k -> o:k link fact collapses to the entailed self-loop
      SELECT 'm:' || CAST(k AS VARCHAR), 'http://ex/link',
             'm:' || CAST(k AS VARCHAR), NULL, FALSE
      FROM nat WHERE k % 3 = 0
    )
    """,
)
def q_owl_sameas_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """owl:sameAs consolidation (inference.sameas_consolidate — OWL RL
    eq-rep-s/p/o as ONE canonical rewrite, never the quadratic
    eq-sym/eq-trans closure): 3-member identity chains m:k↔n:k↔o:k
    collapse onto the lexicographic-min canonical m:k, facts asserted
    on different members of one component (the n:k and o:k tag rows)
    merge to a single set row, a predicate-position identity
    (ex:name2 sameAs ex:name) rewrites the s:k facts' predicate
    (eq-rep-p), and the sameAs links themselves drop (each collapses
    to a self-loop by construction). The oracle replays the statically
    known canonicals and the set-dedup relationally."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_SAMEAS,
        sameas_consolidate,
    )

    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("string")

    def trip(subj, pred, obj, lit: bool):
        return F.struct(
            subj.alias("subj"),
            pred.alias("pred") if not isinstance(pred, str) else F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(lit).alias("obj_is_literal"),
        )

    m_iri = F.concat(F.lit("m:"), k)
    n_iri = F.concat(F.lit("n:"), k)
    o_iri = F.concat(F.lit("o:"), k)
    tag = F.concat(F.lit("t:"), (F.col("n_nationkey") % 5).cast("string"))
    per_nation = n.select(
        F.explode(
            F.array(
                trip(m_iri, OWL_SAMEAS, n_iri, False),
                trip(n_iri, OWL_SAMEAS, o_iri, False),
                trip(n_iri, "http://ex/name", F.col("n_name"), True),
                # the same tag fact asserted on TWO members of the
                # component — must collapse to one row after the merge
                trip(n_iri, "http://ex/tag", tag, True),
                trip(o_iri, "http://ex/tag", tag, True),
            )
        ).alias("t")
    ).select("t.*")
    # a fact BETWEEN two members of one component: survives as the
    # entailed self-loop (eq-rep), never silently dropped
    loop_facts = n.where(F.col("n_nationkey") % 3 == 0).select(
        trip(n_iri, "http://ex/link", o_iri, False).alias("t")
    ).select("t.*")
    pred_facts = n.where(F.col("n_nationkey") < 5).select(
        trip(
            F.concat(F.lit("s:"), k), "http://ex/name2", F.col("n_name"), True
        ).alias("t")
    ).select("t.*")
    pred_identity = spark.createDataFrame(
        [("http://ex/name2", OWL_SAMEAS, "http://ex/name", None, False)],
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean",
    )
    triples = (
        per_nation.unionByName(loop_facts)
        .unionByName(pred_facts)
        .unionByName(pred_identity)
    )
    return sameas_consolidate(triples)


@register(
    "owl_restrictions_entail",
    """
    WITH nat AS (SELECT n_nationkey AS k FROM nation),
    rows AS (
      -- restriction axioms (schema dimension)
      SELECT 'RA' AS subj, 'http://www.w3.org/2002/07/owl#allValuesFrom' AS pred,
             'D' AS obj, CAST(NULL AS VARCHAR) AS obj_lang, FALSE AS obj_is_literal
      UNION ALL SELECT 'RA', 'http://www.w3.org/2002/07/owl#onProperty', 'p', NULL, FALSE
      UNION ALL SELECT 'RS', 'http://www.w3.org/2002/07/owl#someValuesFrom', 'D', NULL, FALSE
      UNION ALL SELECT 'RS', 'http://www.w3.org/2002/07/owl#onProperty', 'p', NULL, FALSE
      UNION ALL SELECT 'RQ', 'http://www.w3.org/2002/07/owl#someValuesFrom',
                       'http://www.w3.org/2002/07/owl#Thing', NULL, FALSE
      UNION ALL SELECT 'RQ', 'http://www.w3.org/2002/07/owl#onProperty', 'q', NULL, FALSE
      UNION ALL SELECT 'RH', 'http://www.w3.org/2002/07/owl#hasValue', 'gold', NULL, TRUE
      UNION ALL SELECT 'RH', 'http://www.w3.org/2002/07/owl#onProperty', 'tier', NULL, FALSE
      -- instance facts
      UNION ALL SELECT 'n:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'RA',
                       NULL, FALSE FROM nat WHERE k % 2 = 0
      UNION ALL SELECT 'n:' || CAST(k AS VARCHAR), 'p', 'm:' || CAST(k AS VARCHAR),
                       NULL, FALSE FROM nat
      UNION ALL SELECT 'n:' || CAST(k AS VARCHAR), 'q', 'w', NULL, FALSE
                FROM nat WHERE k % 3 = 0
      UNION ALL SELECT 'n:' || CAST(k AS VARCHAR), 'tier', 'gold', NULL, TRUE
                FROM nat WHERE k % 5 = 0
      UNION ALL SELECT 'h:1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                       'RH', NULL, FALSE
      -- cls-avf: n:k type RA, n:k p m:k => m:k type D (even k)
      UNION ALL SELECT 'm:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'D',
                       NULL, FALSE FROM nat WHERE k % 2 = 0
      -- cls-svf1 (round 2, via the avf-derived typing): n:k type RS (even k)
      UNION ALL SELECT 'n:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'RS',
                       NULL, FALSE FROM nat WHERE k % 2 = 0
      -- cls-svf2 (owl:Thing filler): n:k type RQ (k % 3 = 0)
      UNION ALL SELECT 'n:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'RQ',
                       NULL, FALSE FROM nat WHERE k % 3 = 0
      -- cls-hv2: n:k tier gold => n:k type RH (k % 5 = 0)
      UNION ALL SELECT 'n:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'RH',
                       NULL, FALSE FROM nat WHERE k % 5 = 0
      -- cls-hv1: h:1 type RH => h:1 tier gold
      UNION ALL SELECT 'h:1', 'tier', 'gold', NULL, TRUE
    )
    SELECT DISTINCT * FROM rows
    """,
)
def q_owl_restrictions_entail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OWL RL restriction-class entailment to fixpoint
    (inference.restrictions_entail — the class-expression tier Jena's
    OWL Micro reasoner adds over RDFS-Plus): allValuesFrom types the
    p-fillers of RA members (cls-avf), that DERIVED typing then
    satisfies someValuesFrom in round 2 (cls-svf1 — real chaining,
    not one-shot rules), an owl:Thing filler types every q-subject
    (cls-svf2), and hasValue runs both directions (cls-hv1/hv2) on
    full literal term identity. Axiom dimensions broadcast; the only
    exchanges are the two genuinely fact-correlating joins (svf1/avf),
    both pre-pruned to restriction-relevant typings. The oracle
    unrolls the 2-round fixpoint closed-form per nation key."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_ALLVALUES,
        OWL_HASVALUE,
        OWL_ONPROPERTY,
        OWL_SOMEVALUES,
        OWL_THING,
        RDF_TYPE,
        restrictions_entail,
    )

    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    n_iri = F.concat(F.lit("n:"), k.cast("string"))
    m_iri = F.concat(F.lit("m:"), k.cast("string"))

    def trip(subj, pred, obj, lit: bool):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(lit).alias("obj_is_literal"),
        )

    sch = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean"
    )
    axioms = spark.createDataFrame(
        [
            ("RA", OWL_ALLVALUES, "D", None, False),
            ("RA", OWL_ONPROPERTY, "p", None, False),
            ("RS", OWL_SOMEVALUES, "D", None, False),
            ("RS", OWL_ONPROPERTY, "p", None, False),
            ("RQ", OWL_SOMEVALUES, OWL_THING, None, False),
            ("RQ", OWL_ONPROPERTY, "q", None, False),
            ("RH", OWL_HASVALUE, "gold", None, True),
            ("RH", OWL_ONPROPERTY, "tier", None, False),
            ("h:1", RDF_TYPE, "RH", None, False),
        ],
        sch,
    )
    inst = (
        n.select(
            F.explode(
                F.array(
                    trip(n_iri, "p", m_iri, False),
                    F.when(k % 2 == 0, trip(n_iri, RDF_TYPE, F.lit("RA"), False)),
                    F.when(k % 3 == 0, trip(n_iri, "q", F.lit("w"), False)),
                    F.when(k % 5 == 0, trip(n_iri, "tier", F.lit("gold"), True)),
                )
            ).alias("t")
        )
        .where(F.col("t").isNotNull())
        .select("t.*")
    )
    return restrictions_entail(inst.unionByName(axioms))


@register(
    "gopher_quality",
    """
    WITH feat AS (
      SELECT doc_id,
        list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                    w -> w <> '') AS words,
        list_filter(string_split(coalesce(text, ''), chr(10)),
                    ln -> trim(ln) <> '') AS lines,
        coalesce(text, '') AS t
      FROM documents
    ),
    m AS (
      SELECT doc_id,
        len(words) AS n_words,
        round(coalesce(list_sum(list_transform(words,
                                w -> CAST(length(w) AS DOUBLE))), 0)
              / greatest(len(words), 1), 6) AS mean_word_len,
        round(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
              / CAST(greatest(len(words), 1) AS DOUBLE), 6) AS frac_alpha_words,
        round((
            (length(t) - length(replace(t, '#', '')))
          + (length(t) - length(replace(t, '...', ''))) / 3.0
          + (length(t) - length(replace(t, '…', '')))
        ) / greatest(len(words), 1), 6) AS symbol_word_ratio,
        round(len(list_filter(lines, ln -> regexp_matches(trim(ln), '^[•\\-\\*]')))
              / CAST(greatest(len(lines), 1) AS DOUBLE), 6) AS bullet_line_frac,
        round(len(list_filter(lines, ln -> regexp_matches(trim(ln), '(\\.\\.\\.|…)$')))
              / CAST(greatest(len(lines), 1) AS DOUBLE), 6) AS ellipsis_line_frac,
        ( CAST(list_contains(list_transform(words, w -> lower(w)), 'the') AS INT)
        + CAST(list_contains(list_transform(words, w -> lower(w)), 'be') AS INT)
        + CAST(list_contains(list_transform(words, w -> lower(w)), 'to') AS INT)
        + CAST(list_contains(list_transform(words, w -> lower(w)), 'of') AS INT)
        + CAST(list_contains(list_transform(words, w -> lower(w)), 'and') AS INT)
        + CAST(list_contains(list_transform(words, w -> lower(w)), 'that') AS INT)
        + CAST(list_contains(list_transform(words, w -> lower(w)), 'have') AS INT)
        + CAST(list_contains(list_transform(words, w -> lower(w)), 'with') AS INT)
        ) AS stopword_hits
      FROM feat
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
           symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
           stopword_hits,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_word_ratio <= 0.1
            AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3
            AND frac_alpha_words >= 0.8
            AND stopword_hits >= 2) AS gopher_pass
    FROM m
    """,
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-suite quality filter (operators/quality_rules.py —
    Rae et al. 2021 A1.1): word-count bounds, mean word length,
    symbol-to-word ratio (#/ellipsis), bullet- and ellipsis-line
    fractions, alphabetic-word fraction, stop-word presence — all as
    JVM-side higher-order-function expressions (split/filter/
    aggregate/transform) in ONE mapped stage over the parquet scan:
    no shuffle, no Python, streams at input bandwidth at 100 TB. The
    oracle replays every feature with DuckDB's list lambdas."""
    from sifr_project_java_ontology_processing_spark.operators.quality_rules import (
        gopher_quality,
    )

    docs = _t(spark, sf_dir, "documents")
    return gopher_quality(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        "symbol_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "stopword_hits",
        "gopher_pass",
    )


@register(
    "sparql_graph_path_group",
    """
    WITH RECURSIVE e AS (
      SELECT 'r:' || CAST(n_regionkey AS VARCHAR) AS g,
             'n:' || CAST(n_nationkey AS VARCHAR) AS src,
             'n:' || CAST(n_nationkey - 1 AS VARCHAR) AS dst
      FROM nation WHERE n_nationkey > 0
    ),
    reach(g, s, t) AS (
      SELECT g, src, dst FROM e
      UNION
      SELECT r.g, r.s, e.dst
      FROM reach r JOIN e ON e.g = r.g AND e.src = r.t
    )
    SELECT g, s, t FROM reach
    """,
)
def q_sparql_graph_path_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path group closure INSIDE GRAPH ?g (plans/bgp.py::
    _group_closure_frame with graph fusing): per nation k>0 the named
    graph of its region holds n:k -a-> mid:k -b-> n:k-1, so (a/b)+
    closes the key-descending chain but ONLY while consecutive keys
    share a region — the graph label is fused into the derived-edge
    keys, so one distributed closure covers all 5 graphs and paths
    can never hop regions. The oracle is a per-graph recursive CTE
    over the same step relation."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    n = _t(spark, sf_dir, "nation").where(F.col("n_nationkey") > 0)
    k = F.col("n_nationkey")
    g = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))
    n_iri = F.concat(F.lit("n:"), k.cast("string"))
    mid = F.concat(F.lit("mid:"), k.cast("string"))
    prev = F.concat(F.lit("n:"), (k - 1).cast("string"))

    def quad(subj, pred, obj):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
            g.alias("graph"),
        )

    quads = n.select(
        F.explode(F.array(quad(n_iri, "a", mid), quad(mid, "b", prev))).alias("t")
    ).select("t.*")
    return execute_bgp(
        quads,
        "SELECT ?g ?s ?t WHERE { GRAPH ?g { ?s (<a>/<b>)+ ?t . } }",
    )


@register(
    "sparql_path_elem_mod",
    """
    WITH RECURSIVE reach(a, b) AS (
      SELECT n_nationkey, n_nationkey - 1 FROM nation WHERE n_nationkey > 0
      UNION
      SELECT r.a, n.n_nationkey - 1
      FROM reach r JOIN nation n ON n.n_nationkey = r.b
      WHERE n.n_nationkey > 0
    )
    SELECT DISTINCT 'n:' || CAST(r.a AS VARCHAR) AS n,
           'r:' || CAST(n2.n_regionkey AS VARCHAR) AS rg
    FROM reach r JOIN nation n2 ON n2.n_nationkey = r.b
    """,
)
def q_sparql_path_elem_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-element path modifier inside a group (plans/bgp.py:
    ``(prev+/within)``): the prev element closes FIRST (frontier-BFS
    over the 25-deep key chain), then composes with one within hop —
    every nation reaches the regions of ALL its ancestors, deduped to
    set semantics (two ancestors in one region emit one row). The
    oracle is the recursive prev closure joined to the ancestor's
    region."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    triples = _nation_triples(spark, sf_dir)
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?n ?rg WHERE { ?n (ex:prev+/ex:within) ?rg }""",
    )


@register(
    "owl_class_expr_entail",
    """
    WITH nat AS (SELECT n_nationkey AS k FROM nation),
    rows AS (
      -- class-expression axioms + their RDF lists (schema dimension)
      SELECT 'CI' AS subj, 'http://www.w3.org/2002/07/owl#intersectionOf' AS pred,
             '_:i0' AS obj, CAST(NULL AS VARCHAR) AS obj_lang, FALSE AS obj_is_literal
      UNION ALL SELECT '_:i0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'A', NULL, FALSE
      UNION ALL SELECT '_:i0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:i1', NULL, FALSE
      UNION ALL SELECT '_:i1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'B', NULL, FALSE
      UNION ALL SELECT '_:i1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil', NULL, FALSE
      UNION ALL SELECT 'CU', 'http://www.w3.org/2002/07/owl#unionOf', '_:u0', NULL, FALSE
      UNION ALL SELECT '_:u0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'B', NULL, FALSE
      UNION ALL SELECT '_:u0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:u1', NULL, FALSE
      UNION ALL SELECT '_:u1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'E', NULL, FALSE
      UNION ALL SELECT '_:u1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil', NULL, FALSE
      UNION ALL SELECT 'CJ', 'http://www.w3.org/2002/07/owl#intersectionOf', '_:j0', NULL, FALSE
      UNION ALL SELECT '_:j0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'CU', NULL, FALSE
      UNION ALL SELECT '_:j0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:j1', NULL, FALSE
      UNION ALL SELECT '_:j1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'D', NULL, FALSE
      UNION ALL SELECT '_:j1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil', NULL, FALSE
      UNION ALL SELECT 'CO', 'http://www.w3.org/2002/07/owl#oneOf', '_:o0', NULL, FALSE
      UNION ALL SELECT '_:o0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'n:1', NULL, FALSE
      UNION ALL SELECT '_:o0', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:o1', NULL, FALSE
      UNION ALL SELECT '_:o1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'n:2', NULL, FALSE
      UNION ALL SELECT '_:o1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:o2', NULL, FALSE
      UNION ALL SELECT '_:o2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'gold', NULL, TRUE
      UNION ALL SELECT '_:o2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil', NULL, FALSE
      UNION ALL SELECT 'y', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'CI', NULL, FALSE
      -- instance typings per nation key
      UNION ALL SELECT 'x:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'A',
                       NULL, FALSE FROM nat WHERE k % 2 = 0
      UNION ALL SELECT 'x:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'B',
                       NULL, FALSE FROM nat WHERE k % 3 = 0
      UNION ALL SELECT 'x:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'E',
                       NULL, FALSE FROM nat WHERE k % 5 = 0
      UNION ALL SELECT 'x:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'D',
                       NULL, FALSE FROM nat WHERE k % 4 = 0
      -- scm-int / scm-uni schema entailments
      UNION ALL SELECT 'CI', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'A', NULL, FALSE
      UNION ALL SELECT 'CI', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'B', NULL, FALSE
      UNION ALL SELECT 'CJ', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'CU', NULL, FALSE
      UNION ALL SELECT 'CJ', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'D', NULL, FALSE
      UNION ALL SELECT 'B', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'CU', NULL, FALSE
      UNION ALL SELECT 'E', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'CU', NULL, FALSE
      -- cls-oo: IRI members typed; the literal member emits nothing
      UNION ALL SELECT 'n:1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'CO', NULL, FALSE
      UNION ALL SELECT 'n:2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'CO', NULL, FALSE
      -- cls-int2 on y (asserted CI), then cls-uni on the DERIVED y:B
      UNION ALL SELECT 'y', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'A', NULL, FALSE
      UNION ALL SELECT 'y', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'B', NULL, FALSE
      UNION ALL SELECT 'y', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'CU', NULL, FALSE
      -- cls-int1: x:k : CI iff A and B (k % 6 = 0)
      UNION ALL SELECT 'x:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'CI',
                       NULL, FALSE FROM nat WHERE k % 6 = 0
      -- cls-uni: x:k : CU iff B or E (k % 3 = 0 or k % 5 = 0)
      UNION ALL SELECT 'x:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'CU',
                       NULL, FALSE FROM nat WHERE k % 3 = 0 OR k % 5 = 0
      -- chained cls-int1: x:k : CJ iff CU (derived) and D
      UNION ALL SELECT 'x:' || CAST(k AS VARCHAR),
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'CJ',
                       NULL, FALSE FROM nat WHERE (k % 3 = 0 OR k % 5 = 0) AND k % 4 = 0
    )
    SELECT DISTINCT * FROM rows
    """,
)
def q_owl_class_expr_entail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OWL RL boolean class expressions to fixpoint
    (inference.class_expressions_entail — intersectionOf / unionOf /
    oneOf, the tier Jena OntModels add over the restriction rules;
    reference parity: reference OntologyLoader.java model layer):
    RDF lists walk DRIVER-side into broadcast member dimensions,
    scm-int/scm-uni/cls-oo derive from the dimensions alone, cls-int2
    and cls-uni are broadcast joins on the DELTA's type slice, and
    cls-int1's ALL-k conjunction is a partial-agg count==k over
    member-pruned typings. Real chaining: cls-uni derives x:CU, which
    completes the CJ = CU∧D conjunction in round 2 (and y's asserted
    CI unfolds through int2 then re-lifts through uni). The oracle
    unrolls the fixpoint closed-form per nation key."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_INTERSECTION,
        OWL_ONEOF,
        OWL_UNION,
        RDF_TYPE,
        class_expressions_entail,
    )

    RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    first, rest, nil = RDF_NS + "first", RDF_NS + "rest", RDF_NS + "nil"
    sch = (
        "subj string, pred string, obj string, obj_lang string, "
        "obj_is_literal boolean"
    )

    def rdf_list(prefix: str, members: list) -> list:
        rows = []
        for i, (m, lit) in enumerate(members):
            node = f"{prefix}{i}"
            nxt = f"{prefix}{i + 1}" if i + 1 < len(members) else nil
            rows.append((node, first, m, None, lit))
            rows.append((node, rest, nxt, None, False))
        return rows

    axioms = spark.createDataFrame(
        [
            ("CI", OWL_INTERSECTION, "_:i0", None, False),
            *rdf_list("_:i", [("A", False), ("B", False)]),
            ("CU", OWL_UNION, "_:u0", None, False),
            *rdf_list("_:u", [("B", False), ("E", False)]),
            ("CJ", OWL_INTERSECTION, "_:j0", None, False),
            *rdf_list("_:j", [("CU", False), ("D", False)]),
            ("CO", OWL_ONEOF, "_:o0", None, False),
            *rdf_list("_:o", [("n:1", False), ("n:2", False), ("gold", True)]),
            ("y", RDF_TYPE, "CI", None, False),
        ],
        sch,
    )
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    x_iri = F.concat(F.lit("x:"), k.cast("string"))

    def typ(cls):
        return F.struct(
            x_iri.alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.lit(cls).alias("obj"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(False).alias("obj_is_literal"),
        )

    inst = (
        n.select(
            F.explode(
                F.array(
                    F.when(k % 2 == 0, typ("A")),
                    F.when(k % 3 == 0, typ("B")),
                    F.when(k % 5 == 0, typ("E")),
                    F.when(k % 4 == 0, typ("D")),
                )
            ).alias("t")
        )
        .where(F.col("t").isNotNull())
        .select("t.*")
    )
    return class_expressions_entail(axioms.unionByName(inst))


@register(
    "owl_consistency_check",
    """
    WITH n AS (SELECT n_nationkey AS k, n_regionkey AS r FROM nation),
         s AS (SELECT s_suppkey AS k FROM supplier)
    SELECT 'cax-dw' AS rule, 'n:' || CAST(k AS VARCHAR) AS subj,
           'c:even' AS pred, 'c:small' AS obj
    FROM n WHERE k % 2 = 0 AND k < 10
    UNION ALL
    SELECT 'prp-irp', 'n:' || CAST(k AS VARCHAR), 'p:near',
           'n:' || CAST(k AS VARCHAR)
    FROM n WHERE k % 7 = k
    UNION ALL
    SELECT 'prp-asyp',
           least('n:' || CAST(k AS VARCHAR),
                 'n:' || CAST((k + 1) % 25 AS VARCHAR)),
           'p:gt',
           greatest('n:' || CAST(k AS VARCHAR),
                    'n:' || CAST((k + 1) % 25 AS VARCHAR))
    FROM n WHERE k % 6 = 0
    UNION ALL
    SELECT 'prp-pdw', 'n:' || CAST(k AS VARCHAR), 'p:reg|p:reg2',
           'r:' || CAST(r AS VARCHAR)
    FROM n WHERE k % 4 = 0
    UNION ALL
    SELECT 'eq-diff1',
           least('n:' || CAST(k AS VARCHAR), 'n:' || CAST(k + 100 AS VARCHAR)),
           'http://www.w3.org/2002/07/owl#sameAs',
           greatest('n:' || CAST(k AS VARCHAR),
                    'n:' || CAST(k + 100 AS VARCHAR))
    FROM n WHERE k % 6 = 0
    UNION ALL
    SELECT 'cls-nothing2', 'n:' || CAST(k AS VARCHAR),
           'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
           'http://www.w3.org/2002/07/owl#Nothing'
    FROM n WHERE k % 11 = 10
    UNION ALL
    SELECT 'prp-npa1', 's:' || CAST(k AS VARCHAR), 'p:rank',
           'v:' || CAST(k % 5 AS VARCHAR)
    FROM s WHERE k % 10 = k % 5
    UNION ALL
    SELECT 'prp-npa2', 's:' || CAST(k AS VARCHAR), 'p:tag',
           't' || CAST(k % 4 AS VARCHAR)
    FROM s WHERE k % 3 = k % 4
    """,
)
def q_owl_consistency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OWL RL consistency audit (inference.consistency_violations): the
    profile's "false"-conclusion rules (cax-dw, prp-irp, prp-asyp,
    prp-pdw, eq-diff1, cls-nothing2, prp-npa1/2) materialized as a
    violations frame over a synthetic graph built from nation (25
    individuals, disjoint classes / irreflexive / asymmetric /
    property-disjoint / sameAs-differentFrom / owl:Nothing plants) and
    supplier (reified NegativePropertyAssertions, individual- and
    literal-valued). The oracle states each rule's violation set
    closed-form from the same arithmetic plants. The reference merges
    SKOS/UMLS models unchecked (OntologyMerger.java:34-58); this is the
    validation pass a web-scale KG build runs after merge."""
    from sifr_project_java_ontology_processing_spark.operators.inference import (
        OWL_ASYMMETRIC,
        OWL_DIFFERENTFROM,
        OWL_DISJOINTWITH,
        OWL_IRREFLEXIVE,
        OWL_NOTHING,
        OWL_NPA_PROP,
        OWL_NPA_SOURCE,
        OWL_NPA_TARGET,
        OWL_NPA_VALUE,
        OWL_PROPDISJOINTWITH,
        OWL_SAMEAS,
        RDF_TYPE,
        consistency_violations,
    )

    nat = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier")
    nul = F.lit(None).cast("string")

    def row(s, p, o, lit=False):
        return F.struct(
            s.alias("subj"),
            (p if not isinstance(p, str) else F.lit(p)).alias("pred"),
            o.alias("obj"),
            nul.alias("obj_lang"), F.lit(lit).alias("obj_is_literal"),
        )

    k = F.col("n_nationkey")
    ni = F.concat(F.lit("n:"), k.cast("string"))
    succ = F.concat(F.lit("n:"), ((k + 1) % 25).cast("string"))
    far = F.concat(F.lit("n:"), (k + 100).cast("string"))
    ri = F.concat(F.lit("r:"), F.col("n_regionkey").cast("string"))
    nt = nat.select(
        F.explode(
            F.filter(
                F.array(
                    row(ni, RDF_TYPE, F.when(k % 2 == 0, F.lit("c:even")).otherwise(F.lit("c:odd"))),
                    F.when(k < 10, row(ni, RDF_TYPE, F.lit("c:small"))),
                    row(ni, "p:near", F.concat(F.lit("n:"), (k % 7).cast("string"))),
                    row(ni, "p:gt", succ),
                    F.when(k % 6 == 0, row(succ, "p:gt", ni)),
                    row(ni, "p:reg", ri),
                    F.when(k % 4 == 0, row(ni, "p:reg2", ri)),
                    F.when(k % 3 == 0, row(ni, OWL_SAMEAS, far)),
                    F.when(k % 6 == 0, row(far, OWL_DIFFERENTFROM, ni)),
                    F.when(k % 11 == 10, row(ni, RDF_TYPE, F.lit(OWL_NOTHING))),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("t")
    ).select("t.*")

    sk = F.col("s_suppkey")
    si = F.concat(F.lit("s:"), sk.cast("string"))
    na = F.concat(F.lit("_:na"), sk.cast("string"))
    nb = F.concat(F.lit("_:nb"), sk.cast("string"))
    st = sup.select(
        F.explode(
            F.array(
                row(na, OWL_NPA_SOURCE, si),
                row(na, OWL_NPA_PROP, F.lit("p:rank")),
                row(na, OWL_NPA_TARGET, F.concat(F.lit("v:"), (sk % 10).cast("string"))),
                row(si, "p:rank", F.concat(F.lit("v:"), (sk % 5).cast("string"))),
                row(nb, OWL_NPA_SOURCE, si),
                row(nb, OWL_NPA_PROP, F.lit("p:tag")),
                row(nb, OWL_NPA_VALUE, F.concat(F.lit("t"), (sk % 3).cast("string")), True),
                row(si, "p:tag", F.concat(F.lit("t"), (sk % 4).cast("string")), True),
            )
        ).alias("t")
    ).select("t.*")

    axioms = spark.createDataFrame(
        [
            ("c:even", OWL_DISJOINTWITH, "c:small", None, False),
            ("p:near", RDF_TYPE, OWL_IRREFLEXIVE, None, False),
            ("p:gt", RDF_TYPE, OWL_ASYMMETRIC, None, False),
            ("p:reg", OWL_PROPDISJOINTWITH, "p:reg2", None, False),
        ],
        "subj string, pred string, obj string, obj_lang string, obj_is_literal boolean",
    )
    return consistency_violations(
        nt.unionByName(st).unionByName(axioms)
    ).select("rule", "subj", "pred", "obj")


@register(
    "sparql_in_sameterm",
    """
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR) AS s, n_name AS nm
    FROM nation
    WHERE ((n_nationkey % 2 = 0) = (n_nationkey % 3 = 0))
      AND CAST(n_nationkey AS VARCHAR)
            IN ('0','3','4','6','9','11','12','15','18','21','24')
      AND n_name NOT IN ('KENYA', 'PERU')
    """,
)
def q_sparql_in_sameterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 IN / NOT IN term lists and sameTerm() (plans/bgp.py
    round 5). Fixture: every nation carries the SAME lexical note
    under ex:a and ex:b but with lang tags assigned by different
    moduli (fr on even keys vs fr on %3==0 keys), so
    ``sameTerm(?va, ?vb)`` is true exactly when the two tag rules
    agree — term identity discriminates on the lang leg while the
    lexical leg is constant. ``?w IN (...)`` then keeps an explicit
    key list compared on the lexical form (numbers in the list
    compile as their lexical strings), and ``?nm NOT IN`` drops two
    names. All three compile to one map-side Catalyst predicate over
    the pattern join — no shuffle beyond the subject equi-joins. The
    oracle replays the modulus identity and both lists closed-form."""
    from sifr_project_java_ontology_processing_spark.plans.bgp import execute_bgp

    nat = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    n_iri = F.concat(F.lit("n:"), k.cast("string"))
    nul = F.lit(None).cast("string")

    def note(pred, tag_cond):
        return nat.select(
            n_iri.alias("subj"),
            F.lit(pred).alias("pred"),
            F.col("n_name").alias("obj"),
            F.when(tag_cond, F.lit("fr")).otherwise(nul).alias("obj_lang"),
            F.lit(True).alias("obj_is_literal"),
            nul.alias("obj_datatype"),
        )

    score = nat.select(
        n_iri.alias("subj"),
        F.lit("http://ex/score").alias("pred"),
        k.cast("string").alias("obj"),
        nul.alias("obj_lang"),
        F.lit(True).alias("obj_is_literal"),
        nul.alias("obj_datatype"),
    )
    triples = (
        note("http://ex/a", k % 2 == 0)
        .unionByName(note("http://ex/b", k % 3 == 0))
        .unionByName(score)
    )
    return execute_bgp(
        triples,
        """PREFIX ex: <http://ex/>
           SELECT ?s ?nm WHERE {
             ?s ex:a ?va .
             ?s ex:b ?vb .
             ?s ex:score ?w .
             BIND(str(?va) AS ?nm)
             FILTER(sameTerm(?va, ?vb))
             FILTER(?w IN (0, 3, 4, 6, 9, 11, 12, 15, 18, 21, 24))
             FILTER(?nm NOT IN ("KENYA", "PERU"))
           }""",
    )
