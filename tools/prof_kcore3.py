"""r12 k_core A/B (VERDICT r11 #3): HEAD's loop re-aggregates the full
endpoint union every round; these variants maintain degrees
INCREMENTALLY — subtract the dropped endpoints' credits, computable
from the tiny dropped set x surviving adjacency (guide §2.1).

- ``head``: mirror of HEAD's loop (normalized a<b edge set, per-round
  full degree re-agg, broadcast anti-join peel, parquet spill per round).
- ``inc``: incremental degrees + shrinking edge set (per-round spill of
  the surviving edges stays, but the 2|E|-row groupBy per round is
  replaced by a broadcast loss count over the dropped set).
- ``inc_norw``: incremental degrees + NO edge rewrites at all — the
  edge relation is written once; each round's loss scan filters by the
  cumulative dropped set (broadcast). No edge-set-sized write after
  round 0.

All three produce identical (id, core_degree) output (the loss
subtraction is exact: d_new(v) = d_old(v) - #removed edges incident to
v; vertices reaching d=0 leave the degree table exactly as the
endpoint-union form forgets them).

Usage: python tools/prof_kcore3.py <sf_dir> [k] [rounds] [reps] [variants]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from titan_spark.session import get_spark  # noqa: E402
from titan_spark.compute.checkpointing import (  # noqa: E402
    cut_lineage,
    scoped_shuffle_partitions,
)

from tools.prof_kcore2 import fixture  # noqa: E402

_CAP = 8_000_000


def _build(spark, sf_dir):
    e = fixture(spark, sf_dir).edges
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    und = cut_lineage(und, eager=True, round_idx=0, spill_period=1)
    return und


def run_head(spark, sf_dir, k, rounds):
    t0 = time.monotonic()
    und = _build(spark, sf_dir)
    n_und = und.count()
    print(f"  [head] build: {time.monotonic() - t0:.2f}s n={n_und}", flush=True)
    final_deg = None
    with scoped_shuffle_partitions(spark, 2 * n_und):
        for i in range(rounds):
            tr = time.monotonic()
            deg = (
                und.select(F.col("a").alias("id"))
                .unionAll(und.select(F.col("b").alias("id")))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("d"))
            )
            deg = cut_lineage(deg, eager=False)
            dropped = deg.filter(F.col("d") < k).select("id")
            n_drop = dropped.count()
            if n_drop == 0:
                final_deg = deg
                print(f"  [head] round {i}: converged check {time.monotonic() - tr:.2f}s", flush=True)
                break
            d = F.broadcast(dropped)
            new_und = (
                und.join(d.withColumnRenamed("id", "a"), "a", "left_anti")
                .join(d.withColumnRenamed("id", "b"), "b", "left_anti")
                .select("a", "b")
            )
            und = cut_lineage(new_und, eager=True, round_idx=i, spill_period=1)
            print(f"  [head] round {i}: {time.monotonic() - tr:.2f}s dropped={n_drop}", flush=True)
    if final_deg is None:
        final_deg = (
            und.select(F.col("a").alias("id"))
            .unionAll(und.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
    out = final_deg.filter(F.col("d") >= k).select("id", F.col("d").alias("core_degree"))
    n = out.count()
    print(f"  [head] TOTAL: {time.monotonic() - t0:.2f}s n_core={n}", flush=True)
    return out


def run_inc(spark, sf_dir, k, rounds, rewrite=True):
    tag = "inc" if rewrite else "inc_norw"
    t0 = time.monotonic()
    und = _build(spark, sf_dir)
    n_und = und.count()
    print(f"  [{tag}] build: {time.monotonic() - t0:.2f}s n={n_und}", flush=True)
    with scoped_shuffle_partitions(spark, 2 * n_und):
        deg = (
            und.select(F.col("a").alias("id"))
            .unionAll(und.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        deg = cut_lineage(deg, eager=False)
        dropped_all = None  # cumulative, only for rewrite=False
        for i in range(rounds):
            tr = time.monotonic()
            dropped = deg.filter(F.col("d") < k).select("id")
            n_drop = dropped.count()
            if n_drop == 0:
                print(f"  [{tag}] round {i}: converged check {time.monotonic() - tr:.2f}s", flush=True)
                break
            d = F.broadcast(dropped)
            if rewrite:
                gone_a, gone_b = d.withColumnRenamed("id", "a"), d.withColumnRenamed("id", "b")
                loss = (
                    und.join(gone_a, "a", "left_semi")
                    .join(gone_b, "b", "left_anti")
                    .select(F.col("b").alias("id"))
                    .unionAll(
                        und.join(gone_b, "b", "left_semi")
                        .join(gone_a, "a", "left_anti")
                        .select(F.col("a").alias("id"))
                    )
                    .groupBy("id")
                    .agg(F.count(F.lit(1)).alias("_l"))
                )
                new_und = (
                    und.join(gone_a, "a", "left_anti")
                    .join(gone_b, "b", "left_anti")
                    .select("a", "b")
                )
            else:
                dropped_all = (
                    dropped
                    if dropped_all is None
                    else dropped_all.unionByName(dropped)
                )
                dropped_all = cut_lineage(dropped_all, eager=True, round_idx=i, spill_period=1)
                dall = F.broadcast(dropped_all)
                gone_a, gone_b = d.withColumnRenamed("id", "a"), d.withColumnRenamed("id", "b")
                all_a, all_b = dall.withColumnRenamed("id", "a"), dall.withColumnRenamed("id", "b")
                loss = (
                    und.join(gone_a, "a", "left_semi")
                    .join(all_b, "b", "left_anti")
                    .select(F.col("b").alias("id"))
                    .unionAll(
                        und.join(gone_b, "b", "left_semi")
                        .join(all_a, "a", "left_anti")
                        .select(F.col("a").alias("id"))
                    )
                    .groupBy("id")
                    .agg(F.count(F.lit(1)).alias("_l"))
                )
            new_deg = (
                deg.filter(F.col("d") >= k)
                .join(F.broadcast(loss), "id", "left")
                .select(
                    "id", (F.col("d") - F.coalesce("_l", F.lit(0))).alias("d")
                )
                .filter(F.col("d") > 0)
            )
            deg = cut_lineage(new_deg, eager=False, round_idx=i)
            if rewrite:
                und = cut_lineage(new_und, eager=True, round_idx=i, spill_period=1)
            print(f"  [{tag}] round {i}: {time.monotonic() - tr:.2f}s dropped={n_drop}", flush=True)
    out = deg.filter(F.col("d") >= k).select("id", F.col("d").alias("core_degree"))
    n = out.count()
    print(f"  [{tag}] TOTAL: {time.monotonic() - t0:.2f}s n_core={n}", flush=True)
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    variants = sys.argv[5].split(",") if len(sys.argv) > 5 else ["head", "inc", "inc_norw"]
    spark = get_spark()
    spark.sparkContext.setJobDescription("prof_kcore3")
    outs = {}
    for rep in range(reps):
        print(f"--- rep {rep} ---", flush=True)
        for v in variants:
            if v == "head":
                outs["head"] = run_head(spark, sf_dir, k, rounds)
            elif v == "inc":
                outs["inc"] = run_inc(spark, sf_dir, k, rounds, rewrite=True)
            elif v == "inc_norw":
                outs["inc_norw"] = run_inc(spark, sf_dir, k, rounds, rewrite=False)
        if rep == 0 and "head" in outs and len(outs) > 1:
            base = outs["head"]
            for v, o in outs.items():
                if v == "head":
                    continue
                miss = o.exceptAll(base).count() + base.exceptAll(o).count()
                print(f"  CHECK {v} vs head: mismatches={miss}", flush=True)
