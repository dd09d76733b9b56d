"""Lineage-cut policy for iterative loops.

Iterated plans (Pregel rounds, repeat_until frontiers, LSH self-join
inputs) must truncate lineage or the plan tree grows without bound.
``localCheckpoint`` stores blocks on executors — fast, but lost with an
executor in cluster mode, which kills a long PageRank run. When the
session has a reliable checkpoint directory configured
(``spark.sparkContext.setCheckpointDir(...)`` — HDFS/S3 on a cluster),
every lineage cut upgrades to a reliable ``checkpoint()`` that survives
executor loss; otherwise the executor-local fast path is used (the
right default on local[*], where executor loss means JVM death anyway).

Reference parity: Titan's FulgoraGraphComputer persists BSP state per
superstep into the backend for exactly this recoverability
(olap/computer/FulgoraGraphComputer.java:142-211).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage, reliably when the session allows it."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
