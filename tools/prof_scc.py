"""Phase-level timing for strongly_connected_components on the
sf-scaled block-cycle bench fixture (guide §1: measure first).

Mirrors HEAD's FW-BW loop with per-phase prints: subgraph build,
each forward round (candidate+bump count, color merge), each backward
round, retire. Usage:

    python tools/prof_scc.py <n_blocks> [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from titan_spark.session import get_spark  # noqa: E402
from titan_spark.sources.fixtures import block_cycle_digraph  # noqa: E402
from titan_spark.compute.checkpointing import (  # noqa: E402
    cut_lineage,
    scoped_shuffle_partitions,
)


def run(spark, n_blocks, max_outer=25, max_inner=80):
    t0 = time.monotonic()
    g = block_cycle_digraph(spark, n_blocks=n_blocks, block=8)
    ed_all = (
        g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    remaining = cut_lineage(g.vertices.select("id"), eager=True)
    done = None
    print(f"  setup: {time.monotonic() - t0:.2f}s", flush=True)
    for _outer in range(max_outer):
        to = time.monotonic()
        if remaining.limit(1).count() == 0:
            break
        sub_e = (
            ed_all.join(remaining.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(remaining.withColumnRenamed("id", "v"), "v", "left_semi")
            .cache()
        )
        n_sub = sub_e.count()
        print(f"  outer {_outer} sub_e build: {time.monotonic() - to:.2f}s n={n_sub}", flush=True)
        with scoped_shuffle_partitions(spark, n_sub):
            tf = time.monotonic()
            color = cut_lineage(remaining.select("id", F.col("id").alias("color")), eager=True)
            frontier = color
            for _i in range(max_inner):
                tr = time.monotonic()
                cand = (
                    sub_e.join(frontier.select(F.col("id").alias("u"), "color"), "u")
                    .groupBy(F.col("v").alias("id"))
                    .agg(F.max("color").alias("_nc"))
                )
                bumped = (
                    cand.join(color, "id")
                    .filter(F.col("_nc") > F.col("color"))
                    .select("id", F.col("_nc").alias("color"))
                )
                bumped = cut_lineage(bumped, eager=False, round_idx=_i)
                nb = bumped.count()
                t_b = time.monotonic()
                if nb == 0:
                    print(f"    fwd {_i}: bump {t_b - tr:.2f}s n=0 (converged)", flush=True)
                    break
                color = cut_lineage(
                    color.join(bumped, "id", "left_anti").unionByName(bumped),
                    eager=False,
                )
                frontier = bumped
                print(f"    fwd {_i}: bump {t_b - tr:.2f}s n={nb} merge+ {time.monotonic() - t_b:.2f}s", flush=True)
            print(f"  outer {_outer} forward total: {time.monotonic() - tf:.2f}s", flush=True)
            tb = time.monotonic()
            members = cut_lineage(
                color.filter(F.col("color") == F.col("id")).select("id", "color"),
                eager=True,
            )
            bfront = members
            for _i in range(max_inner):
                tr = time.monotonic()
                cand = (
                    sub_e.join(bfront.select(F.col("id").alias("v"), "color"), "v")
                    .select(F.col("u").alias("id"), "color")
                    .join(color.withColumnRenamed("color", "_uc"), "id")
                    .filter(F.col("_uc") == F.col("color"))
                    .select("id", "color")
                    .dropDuplicates(["id"])
                )
                new = cut_lineage(cand.join(members, "id", "left_anti"), eager=False, round_idx=_i)
                nn = new.count()
                t_b = time.monotonic()
                if nn == 0:
                    print(f"    bwd {_i}: {t_b - tr:.2f}s n=0 (converged)", flush=True)
                    break
                members = cut_lineage(members.unionByName(new), eager=False)
                bfront = new
                print(f"    bwd {_i}: {t_b - tr:.2f}s n={nn} merge+ {time.monotonic() - t_b:.2f}s", flush=True)
            print(f"  outer {_outer} backward total: {time.monotonic() - tb:.2f}s", flush=True)
            tr = time.monotonic()
            rep = members.groupBy("color").agg(F.min("id").alias("component"))
            assigned = members.join(rep, "color").select("id", "component")
            done = assigned if done is None else done.unionByName(assigned)
            done = cut_lineage(done, eager=True)
            remaining = cut_lineage(
                remaining.join(members.select("id"), "id", "left_anti"), eager=True
            )
            print(f"  outer {_outer} retire: {time.monotonic() - tr:.2f}s", flush=True)
        sub_e.unpersist()
    n = done.count()
    print(f"  TOTAL: {time.monotonic() - t0:.2f}s n_assigned={n}", flush=True)


def run_bcast(spark, n_blocks, max_outer=25, max_inner=80, cap=8_000_000):
    """Variant B: broadcast the count-known frontier/bumped/bfront
    relations; dedupe backward candidates BEFORE the color join so AQE
    broadcasts the small side instead of shuffling color."""
    t0 = time.monotonic()
    g = block_cycle_digraph(spark, n_blocks=n_blocks, block=8)
    ed_all = (
        g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    remaining = cut_lineage(g.vertices.select("id"), eager=True)
    done = None
    print(f"  setup: {time.monotonic() - t0:.2f}s", flush=True)
    for _outer in range(max_outer):
        to = time.monotonic()
        if remaining.limit(1).count() == 0:
            break
        sub_e = (
            ed_all.join(remaining.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(remaining.withColumnRenamed("id", "v"), "v", "left_semi")
            .cache()
        )
        n_sub = sub_e.count()
        print(f"  outer {_outer} sub_e build: {time.monotonic() - to:.2f}s n={n_sub}", flush=True)
        with scoped_shuffle_partitions(spark, n_sub):
            tf = time.monotonic()
            color = cut_lineage(remaining.select("id", F.col("id").alias("color")), eager=True)
            frontier = color
            n_front = None  # unknown (full) on round 0
            for _i in range(max_inner):
                tr = time.monotonic()
                fr = frontier.select(F.col("id").alias("u"), "color")
                if n_front is not None and n_front <= cap:
                    fr = F.broadcast(fr)
                cand = (
                    sub_e.join(fr, "u")
                    .groupBy(F.col("v").alias("id"))
                    .agg(F.max("color").alias("_nc"))
                )
                bumped = (
                    cand.join(color, "id")
                    .filter(F.col("_nc") > F.col("color"))
                    .select("id", F.col("_nc").alias("color"))
                )
                bumped = cut_lineage(bumped, eager=False, round_idx=_i)
                nb = bumped.count()
                t_b = time.monotonic()
                if nb == 0:
                    print(f"    fwd {_i}: bump {t_b - tr:.2f}s n=0 (converged)", flush=True)
                    break
                bm = bumped
                if nb <= cap:
                    bm = F.broadcast(bumped)
                color = cut_lineage(
                    color.join(bm, "id", "left_anti").unionByName(bumped),
                    eager=False,
                )
                frontier = bumped
                n_front = nb
                print(f"    fwd {_i}: bump {t_b - tr:.2f}s n={nb} merge+ {time.monotonic() - t_b:.2f}s", flush=True)
            print(f"  outer {_outer} forward total: {time.monotonic() - tf:.2f}s", flush=True)
            tb = time.monotonic()
            members = cut_lineage(
                color.filter(F.col("color") == F.col("id")).select("id", "color"),
                eager=True,
            )
            bfront = members
            n_bf = None
            for _i in range(max_inner):
                tr = time.monotonic()
                bf = bfront.select(F.col("id").alias("v"), "color")
                if n_bf is not None and n_bf <= cap:
                    bf = F.broadcast(bf)
                # dedupe candidate (id, color) pairs BEFORE the color
                # join: gives AQE a sized stage to broadcast, and after
                # the same-color filter at most one row per id survives,
                # so the old post-join dropDuplicates(["id"]) is implied
                cand = (
                    sub_e.join(bf, "v")
                    .select(F.col("u").alias("id"), "color")
                    .dropDuplicates(["id", "color"])
                    .join(color.withColumnRenamed("color", "_uc"), "id")
                    .filter(F.col("_uc") == F.col("color"))
                    .select("id", "color")
                )
                new = cut_lineage(cand.join(members, "id", "left_anti"), eager=False, round_idx=_i)
                nn = new.count()
                t_b = time.monotonic()
                if nn == 0:
                    print(f"    bwd {_i}: {t_b - tr:.2f}s n=0 (converged)", flush=True)
                    break
                members = cut_lineage(members.unionByName(new), eager=False)
                bfront = new
                n_bf = nn
                print(f"    bwd {_i}: {t_b - tr:.2f}s n={nn} merge+ {time.monotonic() - t_b:.2f}s", flush=True)
            print(f"  outer {_outer} backward total: {time.monotonic() - tb:.2f}s", flush=True)
            tr = time.monotonic()
            rep = members.groupBy("color").agg(F.min("id").alias("component"))
            assigned = members.join(rep, "color").select("id", "component")
            done = assigned if done is None else done.unionByName(assigned)
            done = cut_lineage(done, eager=True)
            remaining = cut_lineage(
                remaining.join(members.select("id"), "id", "left_anti"), eager=True
            )
            print(f"  outer {_outer} retire: {time.monotonic() - tr:.2f}s", flush=True)
        sub_e.unpersist()
    n = done.count()
    print(f"  TOTAL: {time.monotonic() - t0:.2f}s n_assigned={n}", flush=True)
    return done


if __name__ == "__main__":
    n_blocks = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else ["sym", "bcast"]
    spark = get_spark()
    spark.sparkContext.setJobDescription("prof_scc")
    for rep in range(reps):
        print(f"--- rep {rep} ---", flush=True)
        if "sym" in variants:
            run(spark, n_blocks)
        if "bcast" in variants:
            run_bcast(spark, n_blocks)
