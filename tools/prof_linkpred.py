"""Phase-level timing for link_prediction on the geography subgraph
(VERDICT r11 #5: the query drifted 1.38-1.42x vs r9 in 3 of 5 runs on
untouched code and was never phase-profiled above sf0.1).

Phases, each forced with its own count/noop so the wall is attributable:
adjacency build+cache, degree agg, wedge pair generation (with the
max_center_degree=30 cap), scoring join, final assembly.

Usage: python tools/prof_linkpred.py <sf_dir> [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from titan_spark.session import get_spark  # noqa: E402
from titan_spark.compute.checkpointing import cut_lineage  # noqa: E402


def run(spark, sf_dir, max_center_degree=30):
    from titan_spark.plans.catalog import _geo_subgraph

    t0 = time.monotonic()
    graph = _geo_subgraph(spark, sf_dir)
    e = graph.edges
    ad = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .cache()
    )
    n_ad = ad.count()
    t1 = time.monotonic()
    print(f"  adjacency: {t1 - t0:.2f}s n={n_ad}", flush=True)
    deg = cut_lineage(
        ad.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("deg")),
        eager=True,
    )
    n_deg = deg.count()
    t2 = time.monotonic()
    print(f"  degrees: {t2 - t1:.2f}s n={n_deg}", flush=True)
    centers = ad.select(F.col("v").alias("w"), F.col("u").alias("n"))
    ok = deg.filter(F.col("deg") <= max_center_degree).select(F.col("id").alias("w"))
    centers = centers.join(ok, "w", "left_semi")
    a = centers.select("w", F.col("n").alias("id_a"))
    b = centers.select("w", F.col("n").alias("id_b"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    pairs = cut_lineage(pairs, eager=True)
    n_pairs = pairs.count()
    t3 = time.monotonic()
    print(f"  wedge pairs: {t3 - t2:.2f}s n={n_pairs}", flush=True)
    na = ad.select(F.col("u").alias("id_a"), F.col("v").alias("w"))
    nb = ad.select(F.col("u").alias("id_b"), F.col("v").alias("w"))
    commons = (
        pairs.join(na, "id_a")
        .join(nb, ["id_b", "w"])
        .join(deg.select(F.col("id").alias("w"), F.col("deg").alias("dw")), "w")
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log("dw")), 6).alias("adamic_adar"),
            F.round(F.sum(1.0 / F.col("dw")), 6).alias("resource_allocation"),
        )
    )
    commons = cut_lineage(commons, eager=True)
    n_c = commons.count()
    t4 = time.monotonic()
    print(f"  scoring join: {t4 - t3:.2f}s n={n_c}", flush=True)
    da = deg.select(F.col("id").alias("id_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("id_b"), F.col("deg").alias("db"))
    out = (
        pairs.join(commons, ["id_a", "id_b"], "left")
        .join(da, "id_a", "left")
        .join(db, "id_b", "left")
        .select("id_a", "id_b", F.coalesce("common_neighbors", F.lit(0)).alias("cn"))
    )
    out.write.format("noop").mode("overwrite").save()
    t5 = time.monotonic()
    print(f"  assembly: {t5 - t4:.2f}s", flush=True)
    print(f"  TOTAL: {t5 - t0:.2f}s", flush=True)
    ad.unpersist()


if __name__ == "__main__":
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark()
    spark.sparkContext.setJobDescription("prof_linkpred")
    for rep in range(reps):
        print(f"--- rep {rep} ({sf_dir}) ---", flush=True)
        run(spark, sf_dir)
