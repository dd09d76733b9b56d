"""Micro-dissection of ONE SCC forward round at the sf10 fixture:
times each sub-step (message join+agg, color join, checkpoint+count,
color merge) in isolation to find where the ~2.5 s/round goes.

Usage: python tools/prof_scc_round.py <n_blocks>
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


def main(n_blocks):
    spark = get_spark()
    spark.sparkContext.setJobDescription("prof_scc_round")
    g = block_cycle_digraph(spark, n_blocks=n_blocks, block=8)
    ed_all = (
        g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    remaining = cut_lineage(g.vertices.select("id"), eager=True)
    sub_e = (
        ed_all.join(remaining.withColumnRenamed("id", "u"), "u", "left_semi")
        .join(remaining.withColumnRenamed("id", "v"), "v", "left_semi")
        .cache()
    )
    n_sub = sub_e.count()
    print(f"sub_e: {n_sub}", flush=True)
    with scoped_shuffle_partitions(spark, n_sub):
        color = cut_lineage(remaining.select("id", F.col("id").alias("color")), eager=True)
        # run two real rounds to reach steady state (frontier = bumped)
        frontier = color
        for _i in range(2):
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
            color = cut_lineage(
                color.join(bumped, "id", "left_anti").unionByName(bumped), eager=False
            )
            frontier = bumped
            print(f"warm round {_i}: n={nb}", flush=True)

        # ---- dissected round 2 (steady state) ----
        for rep in range(2):
            t = time.monotonic()
            color.count()
            print(f"[{rep}] materialize color chain: {time.monotonic() - t:.2f}s", flush=True)

            t = time.monotonic()
            msgs = sub_e.join(frontier.select(F.col("id").alias("u"), "color"), "u")
            n_m = msgs.count()
            print(f"[{rep}] msg join only: {time.monotonic() - t:.2f}s n={n_m}", flush=True)

            t = time.monotonic()
            cand = msgs.groupBy(F.col("v").alias("id")).agg(F.max("color").alias("_nc"))
            n_c = cand.count()
            print(f"[{rep}] + groupBy: {time.monotonic() - t:.2f}s n={n_c}", flush=True)

            t = time.monotonic()
            bumped_plan = (
                cand.join(color, "id")
                .filter(F.col("_nc") > F.col("color"))
                .select("id", F.col("_nc").alias("color"))
            )
            nb = bumped_plan.count()
            print(f"[{rep}] full bump count (no ckpt): {time.monotonic() - t:.2f}s n={nb}", flush=True)

            t = time.monotonic()
            b2 = cut_lineage(bumped_plan, eager=False, round_idx=99)
            nb2 = b2.count()
            print(f"[{rep}] full bump count (ckpt): {time.monotonic() - t:.2f}s n={nb2}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]))
