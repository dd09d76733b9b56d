"""Phase-level timing for k_core (guide §1: measure first).

Times (a) the symmetrized edge build, (b) each peeling round, and
(c) the final degree aggregation, in one warm JVM, using the same
catalog fixture as the `k_core` headline query.

Usage: python tools/prof_kcore.py <sf_dir> [k] [rounds]
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


def run(spark, sf_dir, k, rounds):
    t0 = time.monotonic()
    g = fixture(spark, sf_dir)
    e = g.edges
    sym = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    sym = cut_lineage(sym, eager=True, round_idx=0, spill_period=1)
    n_edges = sym.count()
    t1 = time.monotonic()
    print(f"build+count: {t1 - t0:.2f}s  n_edges={n_edges}", flush=True)
    with scoped_shuffle_partitions(sym.sparkSession, n_edges):
        for i in range(rounds):
            tr = time.monotonic()
            deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
            keep = deg.filter(F.col("d") >= k).select(F.col("u").alias("id"))
            new_sym = (
                sym.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
                .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
                .select("u", "v")
            )
            new_sym = cut_lineage(new_sym, eager=True, round_idx=i, spill_period=1)
            n_new = new_sym.count()
            sym = new_sym
            print(
                f"round {i}: {time.monotonic() - tr:.2f}s  n_edges={n_new}",
                flush=True,
            )
            if n_new == n_edges:
                break
            n_edges = n_new
    tr = time.monotonic()
    out = (
        sym.groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )
    n = out.count()
    print(f"final agg: {time.monotonic() - tr:.2f}s  n_core={n}", flush=True)
    print(f"TOTAL: {time.monotonic() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    sf_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark()
    spark.sparkContext.setJobDescription("prof_kcore")
    for rep in range(2):
        print(f"--- rep {rep} ---", flush=True)
        run(spark, sf_dir, k, rounds)
