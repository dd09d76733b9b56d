"""AQE skew-join proof for supernode hop joins (SURVEY §2 C9).

The reference partitions hot vertices (VertexIDAssigner); this engine
delegates hop-join skew to AQE. These tests PROVE the delegation on a
deterministic supernode fixture instead of asserting it: ~10% of all
edges funnel through one join key, and with the skew thresholds scaled
down to fixture size (production defaults trigger at 256MB partitions)
the final adaptive plan shows the hot partition split.
"""

from pyspark.sql import functions as F

from titan_spark.sources.fixtures import supernode_graph

# Fixture-scale analogs of the production defaults: the frontier's hot
# partition is ~10k constant keys (compresses to a few KB), so the
# 256MB/64MB defaults are scaled to 1KB/512B. forceOptimizeSkewedJoin
# lifts AQE's no-extra-shuffle heuristic — the downstream group-by
# re-shuffles anyway, which is the common shape of a hop + aggregate.
_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_supernode_two_hop_aqe_splits_hot_partition(spark):
    old = _with_confs(spark, _SKEW_CONFS)
    try:
        g = supernode_graph(spark, 100_000)
        df = g.V().out("spoke").out("hubout").group_count("id")
        rows = {r["id"]: r["count"] for r in df.collect()}
        # every 10th of 1..99999 funnels through the hub to 32 targets
        assert len(rows) == 32 and set(rows.values()) == {9999}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan  # SortMergeJoin(skew=true)
        assert "skewed" in plan  # AQEShuffleRead skewed
    finally:
        _restore(spark, old)


def test_supernode_counts_invariant_to_skew_handling(spark):
    # the split is a physical rewrite only — default confs (no forced
    # split at this fixture size) produce identical results
    g = supernode_graph(spark, 50_000)
    df = g.V().out("spoke").out("hubout").group_count("id")
    rows = {r["id"]: r["count"] for r in df.collect()}
    assert len(rows) == 32 and set(rows.values()) == {4999}
    # hub degree sanity: ~10% of all edges touch vertex 0
    e = g.edges
    hub = e.filter((F.col("src") == 0) | (F.col("dst") == 0)).count()
    assert abs(hub / e.count() - 0.09) < 0.02
