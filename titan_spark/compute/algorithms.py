"""Library vertex programs: PageRank, single-source shortest distance,
degree counting.

Semantics match the reference test programs so results validate
against the same closed-form oracles:

- PageRank (``titan-test/.../olap/PageRankVertexProgram.java:75-95``):
  PR_{t+1}(v) = (1-α)/N + α·Σ_{u→v} PR_t(u)/outdeg(u); no dangling
  redistribution; validated by ``OLAPTest.java:511-535`` (per-depth
  closed form on a b-ary tree, sum tolerance 1e-3).
- Shortest distance (``ShortestDistanceVertexProgram.java``): seed=0,
  message = dist + weight, min-combiner, fixpoint with frontier
  early-stop (the reference's Memory ``incr`` flag).
- Degree counting (``OLAPTest.java:194-219``): per-vertex edge count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from titan_spark.compute.pregel import pregel, run_iterations
from titan_spark.graph import PropertyGraph


def pagerank(
    graph: PropertyGraph,
    alpha: float = 0.85,
    iterations: int = 10,
    edge_labels: tuple[str, ...] = (),
    checkpoint_every: int = 5,
) -> DataFrame:
    """Returns DataFrame(id, pagerank).

    The degree pre-round of the reference (messages over inE at
    iteration 0) is a plain aggregation here. Edges+degrees are
    computed once and cached; each round is one shuffle on dst.
    """
    e = graph.edges
    if edge_labels:
        e = e.filter(F.col("label").isin(list(edge_labels)))
    e = e.select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # contribution edges: src, dst, outdeg(src) — built once, cached
    contrib_e = e.join(outdeg, "src").cache()

    n = graph.vertices.count()
    ranks = graph.vertices.select("id").withColumn("pagerank", F.lit(1.0 / n))
    base = (1.0 - alpha) / n

    def step(state: DataFrame, i: int) -> DataFrame:
        msgs = (
            contrib_e.join(state, contrib_e["src"] == state["id"])
            .select(F.col("dst").alias("id"), (F.col("pagerank") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        return (
            state.drop("pagerank")
            .join(msgs, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                    "pagerank"
                ),
            )
        )

    return run_iterations(ranks, step, iterations, checkpoint_every)


def shortest_distance(
    graph: PropertyGraph,
    seed_id: int,
    weight_col: str | None = None,
    direction: str = "out",
    edge_labels: tuple[str, ...] = (),
    max_iterations: int = 50,
) -> DataFrame:
    """Single-source shortest distance → DataFrame(id, distance);
    unreachable vertices have NULL distance.

    Frontier iteration: only vertices improved in the previous round
    send messages, so round cost tracks the frontier, not |V| — the
    scalable form of the reference's fixpoint-with-incr-flag loop.
    """
    e = graph.edges
    if edge_labels:
        e = e.filter(F.col("label").isin(list(edge_labels)))
    w = F.col(f"edge.{weight_col}").cast("double") if weight_col else F.lit(1.0)
    msg = F.col("src.distance") + w if direction == "out" else F.col("dst.distance") + w
    kwargs = {"msg_to_dst": msg} if direction == "out" else {"msg_to_src": msg}

    result = pregel(
        graph.vertices,
        e,
        initial={
            "distance": F.when(F.col("id") == seed_id, F.lit(0.0)).otherwise(
                F.lit(None).cast("double")
            ),
            "_active": F.col("id") == seed_id,
        },
        agg=F.min("msg").alias("newdist"),
        update={
            "distance": F.when(
                F.col("newdist") < F.coalesce(F.col("distance"), F.lit(float("inf"))),
                F.col("newdist"),
            ).otherwise(F.col("distance")),
            "_active": F.col("newdist")
            < F.coalesce(F.col("distance"), F.lit(float("inf"))),
        },
        max_iterations=max_iterations,
        active_col="_active",
        **kwargs,
    )
    return result.select("id", "distance")


def degree_count(graph: PropertyGraph, direction: str = "both") -> DataFrame:
    """Per-vertex degree including zero-degree vertices (A4)."""
    deg = graph.degrees(direction)
    return (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce(F.col("degree"), F.lit(0)).alias("degree"))
    )
