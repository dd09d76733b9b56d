"""Synthetic skew fixtures: supernode graphs built from ``spark.range``.

The reference handles hot vertices by partitioning them across the
cluster (``VertexIDAssigner``/``IDManager.java:24``; SURVEY §4.2). This
engine's equivalent claim (SURVEY §2 C9) is that AQE splits skewed hop
join partitions at runtime. This module generates the graph that
PROVES that claim instead of asserting it: one hub vertex owning ~10%
of all edges, deterministic (pure column arithmetic over ranges, no
files, no RNG), sized by a single ``n``.

Shape for ``supernode_graph(n, hub_fanout)``:
- vertices ``0..n-1``; vertex 0 is the hub;
- ``ring``  edges ``i -> (i % (n-1)) + 1`` for every i >= 1 (everyone
  has an out-edge, the graph has no sinks);
- ``spoke`` edges ``i -> 0`` for every 10th i (~10% of all edges point
  at the hub);
- ``hubout`` edges ``0 -> 1..hub_fanout`` (the hub's own adjacency).

A two-hop ``V().out('spoke').out('hubout')`` then funnels ~n/10
traversers through the single hub key — the worst-case join skew a
power-law graph produces, in miniature.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from titan_spark.graph import PropertyGraph


def supernode_graph(
    spark: SparkSession, n: int = 100_000, hub_fanout: int = 32
) -> PropertyGraph:
    """Deterministic supernode graph: ~n×1.1 edges, ~10% incident to
    vertex 0."""
    v = spark.range(n).select(F.col("id"), F.lit("node").alias("label"))
    base = spark.range(1, n)
    ring = base.select(
        (F.col("id") + 1_000_000_000).alias("edge_id"),
        F.col("id").alias("src"),
        (F.col("id") % (n - 1) + 1).alias("dst"),
        F.lit("ring").alias("label"),
    )
    spokes = base.filter(F.col("id") % 10 == 0).select(
        (F.col("id") + 2_000_000_000).alias("edge_id"),
        F.col("id").alias("src"),
        F.lit(0).cast("long").alias("dst"),
        F.lit("spoke").alias("label"),
    )
    hub_out = spark.range(1, hub_fanout + 1).select(
        (F.col("id") + 3_000_000_000).alias("edge_id"),
        F.lit(0).cast("long").alias("src"),
        F.col("id").alias("dst"),
        F.lit("hubout").alias("label"),
    )
    return PropertyGraph(v, ring.unionByName(spokes).unionByName(hub_out))


def k4_chain_graph(spark: SparkSession, n_blocks: int = 2000) -> PropertyGraph:
    """Deterministic truss fixture: ``n_blocks`` disjoint K4 cliques
    (vertices ``4b..4b+3``) chained by single connector edges
    ``4b+3 → 4b+4``. Every clique edge lies in exactly 2 triangles
    (the 4-truss keeps all of them); every connector lies in none (any
    truss drops it on the first peel). Pure column arithmetic over
    ``spark.range`` — replayable verbatim in a SQL oracle."""
    v = spark.range(4 * n_blocks).select(F.col("id"), F.lit("node").alias("label"))
    blocks = spark.range(n_blocks)
    pair_offsets = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    clique = None
    for i, (p, q) in enumerate(pair_offsets):
        part = blocks.select(
            (F.col("id") + (i + 1) * 1_000_000_000).alias("edge_id"),
            (F.col("id") * 4 + p).alias("src"),
            (F.col("id") * 4 + q).alias("dst"),
            F.lit("clique").alias("label"),
        )
        clique = part if clique is None else clique.unionByName(part)
    connectors = spark.range(n_blocks - 1).select(
        (F.col("id") + 7_000_000_000).alias("edge_id"),
        (F.col("id") * 4 + 3).alias("src"),
        (F.col("id") * 4 + 4).alias("dst"),
        F.lit("link").alias("label"),
    )
    return PropertyGraph(v, clique.unionByName(connectors))


def block_cycle_digraph(
    spark: SparkSession, n_blocks: int = 512, block: int = 8
) -> PropertyGraph:
    """Deterministic DIRECTED SCC fixture: ``n_blocks`` blocks of
    ``block`` consecutive ids. Every block is a directed chain
    ``i -> i+1``; blocks with ``block_idx % 3 != 2`` close the chain
    back to the block head (one directed cycle per block = one
    non-trivial SCC), blocks with ``block_idx % 3 == 2`` stay open
    chains (every vertex its own SCC). Block heads additionally point
    at the next block's head, linking the SCC condensation into a DAG.

    Ground truth is closed-form: component(v) = block_head(v) for
    cyclic blocks, v itself for chain blocks — the oracle states it
    directly rather than replaying the algorithm (a stronger check).
    Pure column arithmetic over ``spark.range``; no files, no RNG.
    """
    n = n_blocks * block
    v = spark.range(n).select(F.col("id"), F.lit("node").alias("label"))
    ids = spark.range(n)
    head = (F.col("id") / block).cast("long") * block
    in_block_next = F.col("id") + 1
    chain = ids.filter((F.col("id") % block) != block - 1).select(
        (F.col("id") + 1_000_000_000).alias("edge_id"),
        F.col("id").alias("src"),
        in_block_next.alias("dst"),
        F.lit("step").alias("label"),
    )
    closing = (
        ids.filter(
            ((F.col("id") % block) == block - 1)
            & (((F.col("id") / block).cast("long") % 3) != 2)
        ).select(
            (F.col("id") + 2_000_000_000).alias("edge_id"),
            F.col("id").alias("src"),
            head.alias("dst"),
            F.lit("close").alias("label"),
        )
    )
    cross = ids.filter(
        ((F.col("id") % block) == 0) & (F.col("id") + block < n)
    ).select(
        (F.col("id") + 3_000_000_000).alias("edge_id"),
        F.col("id").alias("src"),
        (F.col("id") + block).alias("dst"),
        F.lit("link").alias("label"),
    )
    return PropertyGraph(v, chain.unionByName(closing).unionByName(cross))
