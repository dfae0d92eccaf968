"""Lineage-cutting for iterative operators (connected components,
PageRank, k-means, LSH signature reuse).

Iterative DataFrame algorithms must truncate the logical plan each
round or the plan grows exponentially (Catalyst re-analyzes the whole
unrolled loop every round). Two ways to cut:

- ``localCheckpoint`` (default): materializes partitions into executor
  block storage. Fast (no DFS write) but NOT resilient — if an executor
  is preempted or OOM-killed, the blocks are gone and, with lineage
  truncated, the job cannot recompute them. Fine for local[] testing
  and clusters without preemption.
- reliable ``checkpoint``: writes to the SparkContext checkpoint
  directory (HDFS/S3 on a real cluster). Survives executor loss; the
  safe default for 1000-executor spot/preemptible fleets at 100 TB.

Selection is a session conf so deployments flip it without code
changes:

    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir", "s3://bucket/ckpt")

See SCALE.md "Lineage and fault tolerance".
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.graft.checkpoint.reliable"
CKPT_DIR_CONF = "spark.graft.checkpoint.dir"


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage, honoring the
    session's checkpoint-reliability conf (see module docstring)."""
    spark = df.sparkSession
    reliable = spark.conf.get(RELIABLE_CONF, "false").lower() == "true"
    if not reliable:
        return df.localCheckpoint(eager=True)
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        configured = spark.conf.get(CKPT_DIR_CONF, None)
        if configured is None:
            # A driver-local temp dir is only a real checkpoint target
            # when driver and executors share the filesystem (local
            # mode). On a cluster, silently checkpointing to /tmp would
            # recreate the exact executor-loss data hole reliable mode
            # exists to close -- fail fast instead.
            if not sc.master.startswith("local"):
                raise ValueError(
                    f"{RELIABLE_CONF}=true on a non-local master requires "
                    f"{CKPT_DIR_CONF} to point at a shared filesystem "
                    "(hdfs://... or s3://...)"
                )
            configured = tempfile.mkdtemp(prefix="graft-ckpt-")
        sc.setCheckpointDir(configured)
    return df.checkpoint(eager=True)
