"""Phase-level A/B for k_core at scale (guide §1: measure first).

Variant A mirrors HEAD's loop (symmetric 2x edge set, convergence on
the dropped count, broadcast anti-join peel, spill every round).
Variant B runs the identical peel on the normalized a<b HALF-size edge
set (degrees from the endpoint union; same drops, same converged set,
same (id, core_degree) output) — every dedup shuffle, parquet spill and
peel scan touches half the rows.

Usage: python tools/prof_kcore2.py <sf_dir> [k] [rounds] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from titan_spark.plans.catalog import OFF, graph, tables  # noqa: E402
from titan_spark.session import get_spark  # noqa: E402
from titan_spark.compute.checkpointing import (  # noqa: E402
    cut_lineage,
    scoped_shuffle_partitions,
)
from titan_spark.graph import PropertyGraph  # noqa: E402


def fixture(spark, sf_dir):
    g = graph(spark, sf_dir)
    li = tables(spark, sf_dir)["lineitem"]
    v = g.vertices.filter(F.col("label").isin(["order", "part", "supplier"])).select(
        "id", "label"
    )
    base = g.edges.filter(F.col("label").isin(["contains", "supplied_by"])).select(
        "edge_id", "src", "dst", "label"
    )
    extra = li.select(
        F.lit(0).cast("long").alias("edge_id"),
        (F.lit(OFF["order"]) + F.col("l_orderkey")).cast("long").alias("src"),
        (F.lit(OFF["supplier"]) + F.col("l_suppkey")).cast("long").alias("dst"),
        F.lit("assigned").alias("label"),
    )
    return PropertyGraph(v, base.unionByName(extra))


def run_sym(spark, sf_dir, k, rounds):
    """Mirror of HEAD's k_core loop."""
    t0 = time.monotonic()
    e = fixture(spark, sf_dir).edges
    sym = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    sym = cut_lineage(sym, eager=True, round_idx=0, spill_period=1)
    n_edges = sym.count()
    print(f"  [sym] build+count: {time.monotonic() - t0:.2f}s n={n_edges}", flush=True)
    with scoped_shuffle_partitions(sym.sparkSession, n_edges):
        for i in range(rounds):
            tr = time.monotonic()
            deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
            dropped = cut_lineage(
                deg.filter(F.col("d") < k).select(F.col("u").alias("id")), eager=False
            )
            n_drop = dropped.count()
            td = time.monotonic()
            print(f"  [sym] round {i} dropcount: {td - tr:.2f}s n_drop={n_drop}", flush=True)
            if n_drop == 0:
                break
            d = F.broadcast(dropped)
            new_sym = (
                sym.join(d.withColumnRenamed("id", "u"), "u", "left_anti")
                .join(d.withColumnRenamed("id", "v"), "v", "left_anti")
                .select("u", "v")
            )
            sym = cut_lineage(new_sym, eager=True, round_idx=i, spill_period=1)
            print(f"  [sym] round {i} peel+spill: {time.monotonic() - td:.2f}s", flush=True)
    tr = time.monotonic()
    out = (
        sym.groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )
    n = out.count()
    print(f"  [sym] final agg: {time.monotonic() - tr:.2f}s n_core={n}", flush=True)
    print(f"  [sym] TOTAL: {time.monotonic() - t0:.2f}s", flush=True)


def run_half(spark, sf_dir, k, rounds):
    """Same peel on the normalized a<b half-size edge set."""
    t0 = time.monotonic()
    e = fixture(spark, sf_dir).edges
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    und = cut_lineage(und, eager=True, round_idx=0, spill_period=1)
    n_und = und.count()
    print(f"  [half] build+count: {time.monotonic() - t0:.2f}s n={n_und}", flush=True)
    final_deg = None
    with scoped_shuffle_partitions(und.sparkSession, 2 * n_und):
        for i in range(rounds):
            tr = time.monotonic()
            deg = (
                und.select(F.col("a").alias("id"))
                .unionAll(und.select(F.col("b").alias("id")))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("d"))
            )
            dropped = cut_lineage(
                deg.filter(F.col("d") < k).select("id"), eager=False
            )
            n_drop = dropped.count()
            td = time.monotonic()
            print(f"  [half] round {i} dropcount: {td - tr:.2f}s n_drop={n_drop}", flush=True)
            if n_drop == 0:
                final_deg = deg
                break
            d = F.broadcast(dropped)
            new_und = (
                und.join(d.withColumnRenamed("id", "a"), "a", "left_anti")
                .join(d.withColumnRenamed("id", "b"), "b", "left_anti")
                .select("a", "b")
            )
            und = cut_lineage(new_und, eager=True, round_idx=i, spill_period=1)
            print(f"  [half] round {i} peel+spill: {time.monotonic() - td:.2f}s", flush=True)
    tr = time.monotonic()
    if final_deg is None:
        final_deg = (
            und.select(F.col("a").alias("id"))
            .unionAll(und.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
    out = final_deg.filter(F.col("d") >= k).select(
        "id", F.col("d").alias("core_degree")
    )
    n = out.count()
    print(f"  [half] final agg: {time.monotonic() - tr:.2f}s n_core={n}", flush=True)
    print(f"  [half] TOTAL: {time.monotonic() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    sf_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = get_spark()
    spark.sparkContext.setJobDescription("prof_kcore2")
    for rep in range(reps):
        print(f"--- rep {rep} ---", flush=True)
        run_sym(spark, sf_dir, k, rounds)
        run_half(spark, sf_dir, k, rounds)
