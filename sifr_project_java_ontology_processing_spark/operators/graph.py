"""Graph analytics over the constructed KG edge list.

The north-star pipeline materializes nodes/edges tables
(sources/graph_sink.py); downstream KG consumers want salience and
degree diagnostics over them. Reference analog: the reference's Jena
models support graph traversal; its metrics CSVs report per-class
counts (MetricsWriter usage in OntologyCUIProcessor.java) — degree
stats are the distributed twin. PageRank is the classic entity-
salience score for canonical-IRI ranking.

Scale design:

* ``pagerank`` is the iterative-DataFrame-joins shape the north star
  names for CC: edges are hash-REPARTITIONED ON ``src`` ONCE and
  persisted, so every iteration's contribution join shuffles only the
  (node, rank) frame — the big edge relation stays put (on a real
  cluster, write the edge table bucketed by src and even that one-time
  shuffle disappears). Out-degrees are folded into the persisted edge
  frame so each iteration is scan→join→partial-agg→union, nothing
  else.
* Each iteration ends with ``localCheckpoint`` — lineage is cut
  exactly like canonicalize.connected_components, so 20 iterations do
  not build a 20-deep physical lineage; the loop caches are released
  once the checkpointed result materializes.
* Dangling nodes (no out-edges) follow the classic Spark-example
  formulation: their mass is not redistributed; every node keeps the
  (1-d) teleport floor via the left join. This keeps the iteration a
  pure equi-join + partial agg (no global sum barrier per iteration)
  and is the standard large-scale approximation.
* ``degree_stats`` / ``degree_histogram`` are single partial-agg
  passes (map-side combine), skew-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    partitions: int | None = None,
    eager_checkpoint: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank). rank_0 = 1.0 for every node;
    rank_{t+1}(n) = (1-d) + d * sum_{m->n} rank_t(m) / outdeg(m).
    Deterministic: no sampling, no float order-dependence beyond
    Spark's partial-agg sum (commutative over doubles produced from
    identical partitioning — the registry oracle rounds).

    The resident edge frame pays exactly ONE exchange: repartition on
    src, then out-degree via a whole-partition window (a local sort,
    no groupBy+join-back), persisted. Each iteration shuffles only the
    rank frame onto that partitioning. localCheckpoint per iteration
    cuts lineage; it is LAZY by default (checkpoints materialize
    bottom-up on the first action — one job instead of one per
    iteration). Set ``eager_checkpoint=True`` for very deep iteration
    counts where logical-plan depth itself becomes a cost.
    """
    from pyspark.sql import Window

    # pin ONE partition count for the whole loop: the cached edge frame
    # and the per-iteration rank exchange must agree, or EnsureRequirements
    # re-shuffles the (big) cached side every iteration — the exact
    # mismatch AQE's high initialPartitionNum would otherwise create
    n_part = partitions or int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # out-degree folded in with a window over the partitioning we just
    # created: no extra exchange, one wide edge relation reused every
    # iteration
    e = (
        e.repartition(n_part, "src")
        .withColumn("_deg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .persist()
    )

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            e.join(
                ranks.withColumnRenamed("node", "src").repartition(n_part, "src"),
                "src",
            )
            .select("dst", (F.col("rank") / F.col("_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("_in"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=eager_checkpoint)
        )
    if not eager_checkpoint:
        ranks.count()  # materialize the lazy checkpoint chain (one job)
    # the result is checkpointed — release the loop caches instead of
    # pinning executor storage for the session lifetime
    e.unpersist()
    nodes.unpersist()
    return ranks


def degree_stats(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node (node, out_degree, in_degree, degree). One shuffle:
    the union is exploded map-side into (node, is_out) and partially
    aggregated before exchange."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    tagged = e.select(
        F.col("src").alias("node"), F.lit(1).alias("_o"), F.lit(0).alias("_i")
    ).unionByName(
        e.select(F.col("dst").alias("node"), F.lit(0).alias("_o"), F.lit(1).alias("_i"))
    )
    return tagged.groupBy("node").agg(
        F.sum("_o").alias("out_degree"),
        F.sum("_i").alias("in_degree"),
        (F.sum("_o") + F.sum("_i")).alias("degree"),
    )


def degree_histogram(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(degree, n_nodes) distribution — the KG-quality diagnostic
    (power-law head = hub entities needing salt; see
    canonicalize.salted_count)."""
    return (
        degree_stats(edges, src=src, dst=dst)
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
    )


def triples_to_edges(triples: DataFrame, *, preds: list[str] | None = None) -> DataFrame:
    """Project a triples frame (schemas.TRIPLES) to a (src, dst) edge
    list: IRI→IRI statements only (literals are node attributes, not
    edges), optionally restricted to a predicate whitelist — the
    pushdown-friendly shape graph_sink partitions by."""
    e = triples.where(~F.col("obj_is_literal"))
    if preds is not None:
        e = e.where(F.col("pred").isin(preds))
    return e.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))


def transitive_closure(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Reachability pairs (src, dst, depth) with BFS-minimal depth —
    the SKOS ``broader+`` / ontology-ancestor expansion (the reference
    hand-writes exactly the 2-hop case as chained joins,
    OntologyCUIProcessor mapping stage / cascade J3; this is the
    general fixed-point twin).

    Frontier BFS over iterative self-joins: each level joins the
    previous frontier to the (cached, src-partitioned) edge relation,
    anti-joins already-seen pairs (so diamonds don't re-expand and the
    first-seen depth is the minimum), and localCheckpoints to cut
    lineage — the CC/pagerank scale shape. With ``max_depth`` set the
    loop is depth-bounded and runs with NO driver fixpoint probes
    (lazy checkpoints, one materialization); with ``max_depth=None``
    it runs to fixpoint with an O(1) isEmpty probe per level (DAG
    input required — a cycle never reaches fixpoint, so a 1000-level
    safety cap raises).
    """
    n_part = partitions or int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    e = (
        edges.select(F.col(src).alias("_mid"), F.col(dst).alias("dst"))
        .repartition(n_part, "_mid")
        .persist()
    )
    paths = (
        e.select(F.col("_mid").alias("src"), "dst")
        .withColumn("depth", F.lit(1))
        .localCheckpoint(eager=max_depth is None)
    )
    frontier, depth = paths, 1
    cap = max_depth if max_depth is not None else 1000
    while depth < cap:
        nxt = (
            frontier.withColumnRenamed("dst", "_mid")
            .repartition(n_part, "_mid")
            .join(e, "_mid")
            .select("src", "dst", (F.col("depth") + 1).alias("depth"))
            .dropDuplicates(["src", "dst"])
            .join(paths, ["src", "dst"], "left_anti")
            .localCheckpoint(eager=max_depth is None)
        )
        if max_depth is None and nxt.isEmpty():
            break
        paths = paths.unionByName(nxt).localCheckpoint(eager=max_depth is None)
        frontier = nxt
        depth += 1
    else:
        if max_depth is None:
            raise ValueError("transitive_closure: no fixpoint in 1000 levels (cycle?)")
    if max_depth is not None:
        paths.count()  # materialize the lazy checkpoint chain (one job)
    e.unpersist()  # result is checkpointed; don't pin the edge cache
    return paths
