"""Sub-stage profile of prefix_filter_candidates (r12: the candidate
stage became the dominant dedup cost once the verify join broadcasts).

Stages, each isolated with an eager cut or noop so the wall is
attributable: posting explode+hash (with and without the cut), shingle
frequency agg, freq-join + per-doc rank window + prefix filter, prefix
self-join + pair dedup.

Usage: SPARK_GRAFT_CPUS=32 python tools/prof_cand12.py <sf_dir>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from titan_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1]
    threshold = 0.5
    spark = get_spark("prof_cand12")
    sc = spark.sparkContext
    from titan_spark.pipeline.dedup import shingles
    from titan_spark.compute.checkpointing import cut_lineage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = cut_lineage(
        docs.select(
            F.col("doc_id").alias("_id"), shingles(F.col("text"), 3).alias("_sh")
        ).withColumn("_sz", F.size("_sh")),
        eager=True,
    )
    print("docs:", docs.count(), flush=True)

    posts_lazy = sh.select("_id", "_sz", F.explode("_sh").alias("_gs")).select(
        "_id", "_sz", F.xxhash64("_gs").alias("_g")
    )

    sc.setJobDescription("cand: posts noop (explode+hash only)")
    t0 = time.time(); noop(posts_lazy)
    print("posts-compute:", round(time.time() - t0, 1), flush=True)

    sc.setJobDescription("cand: posts cut (localCheckpoint)")
    t0 = time.time(); posts = cut_lineage(posts_lazy, eager=True)
    print("posts-cut:", round(time.time() - t0, 1), flush=True)

    sc.setJobDescription("cand: freq agg")
    t0 = time.time()
    freq = posts.groupBy("_g").agg(F.count(F.lit(1)).alias("_f"))
    noop(freq)
    print("freq:", round(time.time() - t0, 1), flush=True)

    sc.setJobDescription("cand: ranked window + cut")
    t0 = time.time()
    ranked = (
        posts.join(freq, "_g")
        .withColumn(
            "_r", F.row_number().over(Window.partitionBy("_id").orderBy("_f", "_g"))
        )
        .filter(
            F.col("_r") <= F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1
        )
        .select("_id", "_sz", "_g", "_r")
    )
    ranked = cut_lineage(ranked, eager=True)
    n_ranked = ranked.count()
    print("ranked:", round(time.time() - t0, 1), "rows:", n_ranked, flush=True)

    sc.setJobDescription("cand: prefix self-join + dedup")
    t0 = time.time()
    a, b = ranked.alias("a"), ranked.alias("b")
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a._sz") + F.col("b._sz"))
    )
    out = (
        a.join(
            b,
            (F.col("a._g") == F.col("b._g"))
            & (F.col("a._id") < F.col("b._id"))
            & (
                F.least("a._sz", "b._sz").cast("double")
                >= F.lit(threshold) * F.greatest("a._sz", "b._sz")
            )
            & (
                F.lit(1)
                + F.least(
                    F.col("a._sz") - F.col("a._r"), F.col("b._sz") - F.col("b._r")
                )
                >= alpha
            ),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    noop(out)
    print("selfjoin+dedup:", round(time.time() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
