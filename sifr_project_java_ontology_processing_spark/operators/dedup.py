"""Corpus deduplication operators — the training-data-pipeline layer
(task mandate: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).

Not present in the reference (it dedups only triples/labels via
TreeSets); these are the operators a 100 TB web corpus needs before the
KG pipeline sees it.

Design for scale:
  * exact dedup — one hash-shuffle groupBy; the canonical keeper is
    min(id) (deterministic, O3).
  * MinHash+LSH — the scale path for near-dup: per-doc signatures are
    map-side (explode shingles → groupBy doc — shuffle bounded by
    #shingles); candidate pairs come from BAND-BUCKET equality joins
    (shuffle keyed on (band, bucket)), never an all-pairs product.
    Hashes are md5-based so the DuckDB oracle can replay them exactly.
  * n-gram Jaccard — exact verification on candidate pairs (or, at
    test scale, all pairs sharing ≥1 shingle). The shingle self-join is
    quadratic per hot shingle: at scale, stop-shingle removal (drop
    shingles with doc-frequency above a cap) bounds it — exposed via
    ``max_shingle_df``.
  * SimHash — 64-bit bit-vote signature via xxhash64 (JVM-side);
    near-dups = signatures within Hamming distance k over banded
    prefix buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens(text_col) -> F.Column:
    return F.filter(F.split(text_col, " "), lambda x: x != "")


def shingle_array(text_col, n: int = 5) -> F.Column:
    """Distinct word n-gram shingles; docs with < n tokens yield none.
    Pure Catalyst expressions (sequence/transform/slice) — no UDF."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    arr = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, F.array_distinct(arr)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), n)).alias("shingle")
    )


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (text_hash, n_docs, keeper): one row per distinct content."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.col(id_col)).alias("keeper"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle.

    → (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded(6).
    ``max_shingle_df`` drops stop-shingles (doc frequency > cap) before
    the self-join — the knob that keeps the join subquadratic at scale.
    """
    sh = doc_shingles(docs, id_col, text_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 8,
) -> DataFrame:
    """→ (id, sig array<string>[k]): sig[i] = min(md5(i || '|' || shingle)).

    md5-lexicographic-min is a valid uniform MinHash family and is
    byte-reproducible in any engine (the DuckDB oracle replays it)."""
    sh = doc_shingles(docs, id_col, text_col, n)
    seeded = sh.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed"),
        "shingle",
    ).select(
        id_col,
        "seed",
        F.md5(
            F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))
        ).alias("h"),
    )
    mins = seeded.groupBy(id_col, "seed").agg(F.min("h").alias("mh"))
    return mins.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "mh"))),
            lambda s: s["mh"],
        ).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: same bucket in ≥1 band (band = r=k/bands
    consecutive signature rows hashed together). → (doc_a, doc_b)."""
    r = k // bands
    sig = minhash_signatures(docs, id_col, text_col, n, k)
    band_df = sig.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).select(
        id_col,
        "band",
        F.md5(
            F.concat_ws(
                "|",
                F.col("band").cast("string"),
                F.concat_ws("|", F.slice(F.col("sig"), F.col("band") * r + 1, r)),
            )
        ).alias("bucket"),
    )
    a = band_df.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = band_df.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash: per token, xxhash64 → ±1 vote per bit; signature
    bit = sign of the vote sum. All JVM-side (explode + bit ops + agg).
    → (id, simhash bigint)."""
    tok = docs.select(
        id_col, F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bits = tok.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END").alias("vote"),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bands: int = 4,
) -> DataFrame:
    """Near-dup candidates: docs whose simhashes agree on ≥1 of
    ``prefix_bands`` 16-bit bands (pigeonhole: hamming ≤ max_hamming ⇒
    some band equal when max_hamming < prefix_bands*?); verified by
    exact popcount ≤ max_hamming. → (doc_a, doc_b, hamming)."""
    sig = simhash64(docs, id_col, text_col)
    width = 64 // prefix_bands
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(prefix_bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, band * {width}) & {(1 << width) - 1}"),
    )
    a = banded.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sa"), "band", "band_val")
    b = banded.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sb"), "band", "band_val")
    pairs = (
        a.join(b, ["band", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return pairs.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def simhash_md5(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """Portable SimHash variant: token bits derive from md5 hex digits
    instead of xxhash64, so any engine (the DuckDB oracle included) can
    replay the signature bit-for-bit. 60 bits (15 hex chars) keeps the
    accumulated value clear of signed-bigint overflow in every dialect.
    The xxhash64 variant (``simhash64``) stays the production fast path.
    → (id, simhash bigint)."""
    tok = docs.select(
        id_col, F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    ).withColumn("hx", F.md5("tok"))
    bit_rows = tok.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        "hx",
    ).withColumn(
        "bit",
        F.expr(
            "shiftright(instr('0123456789abcdef', substring(hx, CAST(b / 4 AS INT) + 1, 1)) - 1, "
            "b % 4) & 1"
        ),
    )
    votes = bit_rows.groupBy(id_col, "b").agg(
        F.sum(F.when(F.col("bit") == 1, 1).otherwise(-1)).alias("v")
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )
