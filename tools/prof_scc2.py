"""r12 SCC A/B at the sf-scaled block-cycle fixture: HEAD's FW-BW loop
vs two candidate restructures (guide §2.1/§2.3):

- ``delta``: the color table is carried as a DELTA map (only vertices
  whose color > id; color(v) = coalesce(cmap(v), v)). HEAD rewrites and
  scans the FULL |V|-row color relation every inner round of both
  fixpoints; the delta form's per-round state is bump-sized. Round-by-
  round bump/collect sets are provably identical (pure representation
  change).
- ``delta_trim``: delta + FW-BW-Trim (VERDICT r11 #1): before the
  coloring fixpoint, iteratively retire vertices with zero in- or
  zero out-degree in the remaining subgraph as singleton SCCs
  (no cycle can pass through them), with incremental degree
  maintenance (subtract dropped endpoints' credits — k_core-style)
  instead of per-round re-aggregation.

Usage: python tools/prof_scc2.py <n_blocks> [reps] [variants]
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


def run_delta(spark, n_blocks, max_outer=25, max_inner=80, trim=False):
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
        big_state = n_sub > 2_000_000
        spill = 1 if big_state else 5
        with scoped_shuffle_partitions(spark, n_sub):
            # ---------------- optional trim phase ----------------
            if trim:
                tt = time.monotonic()
                din = sub_e.groupBy(F.col("v").alias("id")).agg(
                    F.count(F.lit(1)).alias("din")
                )
                dout = sub_e.groupBy(F.col("u").alias("id")).agg(
                    F.count(F.lit(1)).alias("dout")
                )
                deg = (
                    remaining.join(din, "id", "left")
                    .join(dout, "id", "left")
                    .select(
                        "id",
                        F.coalesce("din", F.lit(0)).alias("din"),
                        F.coalesce("dout", F.lit(0)).alias("dout"),
                    )
                )
                deg = cut_lineage(deg, eager=True, round_idx=0, spill_period=spill)
                n_trimmed = 0
                for _t in range(max_inner):
                    dropped = deg.filter(
                        (F.col("din") == 0) | (F.col("dout") == 0)
                    ).select("id")
                    dropped = cut_lineage(dropped, eager=False, round_idx=_t, spill_period=spill)
                    nd = dropped.count()
                    if nd == 0:
                        break
                    n_trimmed += nd
                    single = dropped.select("id", F.col("id").alias("component"))
                    done = single if done is None else done.unionByName(single)
                    d = F.broadcast(dropped)
                    lin = (
                        sub_e.join(d.withColumnRenamed("id", "u"), "u", "left_semi")
                        .join(d.withColumnRenamed("id", "v"), "v", "left_anti")
                        .groupBy(F.col("v").alias("id"))
                        .agg(F.count(F.lit(1)).alias("lin"))
                    )
                    lout = (
                        sub_e.join(d.withColumnRenamed("id", "v"), "v", "left_semi")
                        .join(d.withColumnRenamed("id", "u"), "u", "left_anti")
                        .groupBy(F.col("u").alias("id"))
                        .agg(F.count(F.lit(1)).alias("lout"))
                    )
                    deg = (
                        deg.join(d, "id", "left_anti")
                        .join(F.broadcast(lin), "id", "left")
                        .join(F.broadcast(lout), "id", "left")
                        .select(
                            "id",
                            (F.col("din") - F.coalesce("lin", F.lit(0))).alias("din"),
                            (F.col("dout") - F.coalesce("lout", F.lit(0))).alias("dout"),
                        )
                    )
                    deg = cut_lineage(deg, eager=True, round_idx=_t, spill_period=spill)
                print(f"  outer {_outer} trim: {time.monotonic() - tt:.2f}s trimmed={n_trimmed}", flush=True)
                if n_trimmed:
                    done = cut_lineage(done, eager=True, round_idx=0, spill_period=spill)
                    remaining = cut_lineage(deg.select("id"), eager=True, round_idx=0, spill_period=spill)
                    sub_e2 = (
                        sub_e.join(remaining.withColumnRenamed("id", "u"), "u", "left_semi")
                        .join(remaining.withColumnRenamed("id", "v"), "v", "left_semi")
                        .cache()
                    )
                    n_sub = sub_e2.count()
                    sub_e.unpersist()
                    sub_e = sub_e2
                    print(f"  outer {_outer} sub_e after trim: n={n_sub}", flush=True)
                    if n_sub == 0:
                        # leftover isolated survivors (none possible: trim
                        # retires all zero-degree ids) — remaining is empty
                        sub_e.unpersist()
                        continue

            # ---------------- forward fixpoint, delta color ----------------
            tf = time.monotonic()
            cmap = remaining.select("id", F.col("id").alias("color")).limit(0)
            frontier = remaining.select("id", F.col("id").alias("color"))
            for _i in range(max_inner):
                tr0 = time.monotonic()
                cand = (
                    sub_e.join(frontier.select(F.col("id").alias("u"), "color"), "u")
                    .groupBy(F.col("v").alias("id"))
                    .agg(F.max("color").alias("_nc"))
                )
                bumped = (
                    cand.join(cmap, "id", "left")
                    .filter(F.col("_nc") > F.coalesce(F.col("color"), F.col("id")))
                    .select("id", F.col("_nc").alias("color"))
                )
                bumped = cut_lineage(bumped, eager=False, round_idx=_i, spill_period=spill)
                nb = bumped.count()
                t_b = time.monotonic()
                if nb == 0:
                    print(f"    fwd {_i}: bump {t_b - tr0:.2f}s n=0", flush=True)
                    break
                cmap = cut_lineage(
                    cmap.join(bumped, "id", "left_anti").unionByName(bumped),
                    eager=False,
                    round_idx=(_i if big_state else None),
                    spill_period=spill,
                )
                frontier = bumped
                print(f"    fwd {_i}: bump {t_b - tr0:.2f}s n={nb} merge+ {time.monotonic() - t_b:.2f}s", flush=True)
            print(f"  outer {_outer} forward total: {time.monotonic() - tf:.2f}s", flush=True)
            # ---------------- backward collection ----------------
            tb = time.monotonic()
            members = cut_lineage(
                remaining.join(cmap, "id", "left_anti").select(
                    "id", F.col("id").alias("color")
                ),
                eager=True,
                round_idx=(0 if big_state else None),
                spill_period=spill,
            )
            # uncollected = remaining \ members, shrinks as collection
            # proceeds: the freshness test is a semi/anti pair against
            # the SHRINKING side instead of an anti-join against the
            # growing members relation
            # members = remaining \ cmap, so the uncollected set IS
            # cmap's id set — no extra anti-join needed
            uncollected = cmap.select("id")
            collected_parts = [members]
            bfront = members
            for _i in range(max_inner):
                tr0 = time.monotonic()
                cand = (
                    sub_e.join(bfront.select(F.col("id").alias("v"), "color"), "v")
                    .select(F.col("u").alias("id"), "color")
                    .join(cmap.withColumnRenamed("color", "_uc"), "id", "left")
                    .filter(F.coalesce("_uc", F.col("id")) == F.col("color"))
                    .select("id", "color")
                    .dropDuplicates(["id"])
                )
                new = cut_lineage(
                    cand.join(uncollected, "id", "left_semi"),
                    eager=False,
                    round_idx=_i,
                    spill_period=spill,
                )
                nn = new.count()
                t_b = time.monotonic()
                if nn == 0:
                    print(f"    bwd {_i}: {t_b - tr0:.2f}s n=0", flush=True)
                    break
                collected_parts.append(new)
                uncollected = cut_lineage(
                    uncollected.join(new.select("id"), "id", "left_anti"),
                    eager=False,
                    round_idx=(_i if big_state else None),
                    spill_period=spill,
                )
                bfront = new
                print(f"    bwd {_i}: {t_b - tr0:.2f}s n={nn} uncol- {time.monotonic() - t_b:.2f}s", flush=True)
            members = collected_parts[0]
            for p in collected_parts[1:]:
                members = members.unionByName(p)
            print(f"  outer {_outer} backward total: {time.monotonic() - tb:.2f}s", flush=True)
            tr = time.monotonic()
            rep = members.groupBy("color").agg(F.min("id").alias("component"))
            assigned = members.join(rep, "color").select("id", "component")
            done = assigned if done is None else done.unionByName(assigned)
            done = cut_lineage(done, eager=True, round_idx=(0 if big_state else None), spill_period=spill)
            remaining = cut_lineage(
                remaining.join(members.select("id"), "id", "left_anti"),
                eager=True,
                round_idx=(0 if big_state else None),
                spill_period=spill,
            )
            print(f"  outer {_outer} retire: {time.monotonic() - tr:.2f}s", flush=True)
        sub_e.unpersist()
    n = done.count()
    print(f"  TOTAL: {time.monotonic() - t0:.2f}s n_assigned={n}", flush=True)
    return done


def run_delta2(spark, n_blocks, max_outer=25, max_inner=80):
    """delta + (a) forward cmap carried as a UNION of checkpointed bump
    parts, resolved to (id, max color) once after convergence — the
    per-round anti-join+union rewrite of the growing cmap disappears;
    (b) backward phase joins candidates against a SHRINKING
    uncolmap (uncollected id→color) — one inner join replaces the
    cmap left-join + members anti-join, and the leftover uncolmap IS
    the next outer round's remaining set."""
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
        big_state = n_sub > 2_000_000
        spill = 1 if big_state else 5
        bcast_cap = 4_000_000
        with scoped_shuffle_partitions(spark, n_sub):
            tf = time.monotonic()
            parts = []
            cmap_u = None
            frontier = remaining.select("id", F.col("id").alias("color"))
            n_front = None
            for _i in range(max_inner):
                tr0 = time.monotonic()
                fr = frontier.select(F.col("id").alias("u"), "color")
                if n_front is not None and n_front <= bcast_cap:
                    fr = F.broadcast(fr)
                cand = (
                    sub_e.join(fr, "u")
                    .groupBy(F.col("v").alias("id"))
                    .agg(F.max("color").alias("_nc"))
                )
                if cmap_u is None:
                    bumped = cand.filter(F.col("_nc") > F.col("id")).select(
                        "id", F.col("_nc").alias("color")
                    )
                else:
                    bumped = (
                        cand.join(cmap_u, "id", "left")
                        .groupBy("id", "_nc")
                        .agg(F.max("color").alias("_cur"))
                        .filter(F.col("_nc") > F.coalesce(F.col("_cur"), F.col("id")))
                        .select("id", F.col("_nc").alias("color"))
                    )
                bumped = cut_lineage(bumped, eager=False, round_idx=_i, spill_period=spill)
                nb = bumped.count()
                t_b = time.monotonic()
                if nb == 0:
                    print(f"    fwd {_i}: bump {t_b - tr0:.2f}s n=0", flush=True)
                    break
                parts.append(bumped)
                cmap_u = bumped if cmap_u is None else cmap_u.unionByName(bumped)
                frontier = bumped
                n_front = nb
                print(f"    fwd {_i}: bump {t_b - tr0:.2f}s n={nb}", flush=True)
            # resolve final colors once: colors only increase, so the
            # max over all bump parts is the converged color
            if cmap_u is None:
                cmap = remaining.select("id", F.col("id").alias("color")).limit(0)
            else:
                cmap = cmap_u.groupBy("id").agg(F.max("color").alias("color"))
            cmap = cut_lineage(cmap, eager=True, round_idx=(0 if big_state else None), spill_period=spill)
            print(f"  outer {_outer} forward total: {time.monotonic() - tf:.2f}s", flush=True)
            tb = time.monotonic()
            members0 = cut_lineage(
                remaining.join(cmap, "id", "left_anti").select(
                    "id", F.col("id").alias("color")
                ),
                eager=True,
                round_idx=(0 if big_state else None),
                spill_period=spill,
            )
            uncolmap = cmap
            n_uncol = None
            bparts = [members0]
            bfront = members0
            for _i in range(max_inner):
                tr0 = time.monotonic()
                um = uncolmap.withColumnRenamed("color", "_uc")
                if n_uncol is not None and n_uncol <= bcast_cap:
                    um = F.broadcast(um)
                cand = (
                    sub_e.join(bfront.select(F.col("id").alias("v"), "color"), "v")
                    .select(F.col("u").alias("id"), "color")
                    .join(um, "id")
                    .filter(F.col("_uc") == F.col("color"))
                    .select("id", "color")
                    .dropDuplicates(["id"])
                )
                new = cut_lineage(cand, eager=False, round_idx=_i, spill_period=spill)
                nn = new.count()
                t_b = time.monotonic()
                if nn == 0:
                    print(f"    bwd {_i}: {t_b - tr0:.2f}s n=0", flush=True)
                    break
                bparts.append(new)
                uncolmap = cut_lineage(
                    uncolmap.join(F.broadcast(new.select("id")) if nn <= bcast_cap else new.select("id"), "id", "left_anti"),
                    eager=False,
                    round_idx=_i,
                    spill_period=spill,
                )
                bfront = new
                n_uncol = None  # lazy; count below only when needed
                print(f"    bwd {_i}: {t_b - tr0:.2f}s n={nn} ", flush=True)
            members = bparts[0]
            for p in bparts[1:]:
                members = members.unionByName(p)
            print(f"  outer {_outer} backward total: {time.monotonic() - tb:.2f}s", flush=True)
            tr = time.monotonic()
            rep = members.groupBy("color").agg(F.min("id").alias("component"))
            assigned = members.join(rep, "color").select("id", "component")
            done = assigned if done is None else done.unionByName(assigned)
            done = cut_lineage(done, eager=True, round_idx=(0 if big_state else None), spill_period=spill)
            # remaining' = still-uncollected vertices = leftover uncolmap
            remaining = cut_lineage(
                uncolmap.select("id"),
                eager=True,
                round_idx=(0 if big_state else None),
                spill_period=spill,
            )
            print(f"  outer {_outer} retire: {time.monotonic() - tr:.2f}s", flush=True)
        sub_e.unpersist()
    n = done.count()
    print(f"  TOTAL: {time.monotonic() - t0:.2f}s n_assigned={n}", flush=True)
    return done


def check(spark, n_blocks, done):
    """Closed-form ground truth of the fixture."""
    n = n_blocks * 8
    ids = spark.range(n)
    head = (F.col("id") / 8).cast("long") * 8
    cyclic = ((F.col("id") / 8).cast("long") % 3) != 2
    truth = ids.select(
        "id", F.when(cyclic, head).otherwise(F.col("id")).alias("component")
    )
    d = done.select("id", "component")
    miss = d.exceptAll(truth).count() + truth.exceptAll(d).count()
    print(f"  CHECK: mismatches={miss}", flush=True)
    return miss == 0


if __name__ == "__main__":
    n_blocks = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else ["delta", "delta_trim"]
    spark = get_spark()
    spark.sparkContext.setJobDescription("prof_scc2")
    for rep in range(reps):
        print(f"--- rep {rep} ---", flush=True)
        for v in variants:
            print(f" variant {v}", flush=True)
            if v == "delta":
                d = run_delta(spark, n_blocks, trim=False)
                check(spark, n_blocks, d)
            elif v == "delta_trim":
                d = run_delta(spark, n_blocks, trim=True)
                check(spark, n_blocks, d)
            elif v == "delta2":
                d = run_delta2(spark, n_blocks)
                check(spark, n_blocks, d)
            elif v == "head":
                from tools.prof_scc import run as run_head

                run_head(spark, n_blocks)
