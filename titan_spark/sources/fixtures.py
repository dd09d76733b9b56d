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


def formula_gray_bmp_media(ids_df, id_col: str = "doc_id",
                           width: int = 8, height: int = 8):
    """Deterministic grayscale-BMP media fixture for the perceptual
    image-dedup oracle (r10): one REAL 24-bpp BI_RGB BMP payload per
    input id, pixels from a pure integer formula so the SQL oracle can
    recompute the decoded luminance grid without touching bytes.

    Groups of four: ids sharing ``id // 4`` depict the same base image
    ``v0(r, c) = h60(base:r:c) % 191`` — the engine's portable md5
    hash (functions/hashing.py), whose per-cell independence makes
    DISTINCT bases uncorrelated noise ~bits/2 apart. (Arithmetic
    formulas — linear or multiply-mod — leave adjacent cells on a
    lattice, and unrelated images then collide within the Hamming
    radius.) Each variant adds a uniform brightness shift
    ``(id % 4) * 3`` (dHash-invariant — a constant offset preserves
    every adjacent-pixel comparison, and 190 + 9 + 50 < 256 means no
    clipping), and variant 3 additionally perturbs the single pixel
    (0, 0) by +50, flipping at most one dHash bit. Within-group pairs
    therefore sit at Hamming <= 1.

    The payload is built by :func:`~titan_spark.pipeline.multimodal.
    encode_gray_bmp` inside a mapInPandas kernel, so the catalog row
    exercises encode -> REAL stdlib BMP decode -> dHash end to end
    while the oracle replays only the closed-form pixel math."""
    import hashlib

    import pandas as pd

    from titan_spark.pipeline.multimodal import encode_gray_bmp

    def h60(s: str) -> int:
        # the Python twin of functions/hashing.portable_hash64: top 60
        # bits of md5, non-negative, identical in Spark SQL and DuckDB
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def kernel(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                base = i - i % 4
                bright = (i % 4) * 3
                rows = [
                    [
                        h60(f"{base}:{r}:{c}") % 191
                        + bright
                        + (50 if i % 4 == 3 and r == 0 and c == 0 else 0)
                        for c in range(width)
                    ]
                    for r in range(height)
                ]
                payloads.append(encode_gray_bmp(rows))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    base = ids_df.select(F.col(id_col).cast("long").alias("media_id"))
    return base.mapInPandas(
        kernel, "media_id long, payload binary"
    ).select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.expr(
            "named_struct('width', CAST(NULL AS INT), 'height', "
            "CAST(NULL AS INT), 'sample_rate', CAST(NULL AS INT), "
            "'duration_ms', CAST(NULL AS INT))"
        ).alias("meta"),
    )
