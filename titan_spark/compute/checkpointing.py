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

from contextlib import contextmanager

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage, reliably when the session allows it."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


@contextmanager
def scoped_shuffle_partitions(spark, rows: int, rows_per_partition: int = 50_000):
    """Size shuffle parallelism to the loop's data for the duration of
    an iterative loop, then restore the session default.

    Iterated joins re-shuffle a SMALL state relation every round (a
    near-dup pair graph is orders of magnitude smaller than its
    corpus); at the session's corpus-sized partition count each round
    pays rounds × partitions near-empty task launches. On local[*]
    task launch is cheap enough that this is noise, but on a cluster
    each empty task is a scheduler round-trip — a 20-round loop at
    10k corpus-sized partitions is 200k wasted launches. AQE cannot
    help here: the per-round eager lineage cut materializes through
    the RDD boundary before AQE's final-stage coalescing applies. The
    override never RAISES parallelism past the session setting, so
    corpus-scale loops (PageRank over every edge) keep their full
    partition count.

    Concurrency contract: this mutates the session-global
    ``spark.sql.shuffle.partitions`` for the loop's duration, so
    another query planned concurrently ON THE SAME SparkSession would
    see the reduced value. That matches the engine's current
    single-tenant batch model (one driver program per session, as in
    every test/bench/catalog path). If a multi-tenant server mode is
    added, scope the setting per plan instead: replace the conf
    override with explicit ``.repartition(target, key)`` on the loop's
    state relation, which is plan-local by construction.
    """
    conf = "spark.sql.shuffle.partitions"
    old = spark.conf.get(conf)
    target = max(1, min(int(old), rows // rows_per_partition + 1))
    spark.conf.set(conf, str(target))
    try:
        yield target
    finally:
        spark.conf.set(conf, old)
