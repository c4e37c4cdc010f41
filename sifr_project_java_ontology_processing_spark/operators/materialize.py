"""Single shared materialize-once primitive.

Several operators have an intermediate that multiple plan branches
consume (the pruned token stream, LSH band/candidate frames, the
capped shingle stream). Spark does not dedupe duplicated subtrees —
divergent column pruning defeats exchange canonicalization (verified
empirically, round 3) — so without materialization each consumer
re-runs the whole upstream pipeline, including Python UDF passes.

``materialize_once`` is an eager ``localCheckpoint`` with DISK-ONLY
2-REPLICA storage when the runtime supports a storage level (Spark
4.x): blocks live on two executors, so a single executor loss — the
routine event on a 1000-node preemptible cluster — does NOT abort the
job the way default (unreplicated) local checkpoints would. The
remaining trade-offs, accepted deliberately:

  * plan construction triggers a Spark job (the materialization is
    eager by design — lazy persist lets concurrent branches race and
    double-compute);
  * a simultaneous loss of BOTH replicas still fails the job; use
    ``DataFrame.checkpoint`` to reliable storage where a checkpoint
    dir is configured and the intermediate is worth the extra I/O
    (see canonicalize.connected_components' ``reliable`` flag).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize_once(df: DataFrame) -> DataFrame:
    """Compute ``df`` exactly once, now; return a lineage-cut frame all
    downstream branches read from (cluster: replicated) disk blocks."""
    master = df.sparkSession.sparkContext.master or ""
    # local mode has one block manager — requesting 2 replicas only
    # produces a warning per block, never a second copy
    level = StorageLevel.DISK_ONLY if master.startswith("local") else (
        StorageLevel.DISK_ONLY_2
    )
    try:
        return df.localCheckpoint(eager=True, storageLevel=level)
    except TypeError:  # older API without storageLevel
        return df.localCheckpoint(eager=True)
