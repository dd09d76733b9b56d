"""One-off stage profiler for dedup_clusters at a given SF dir.

Times the three stages separately: prefix-filter candidates, jaccard
verify, connected components — so a scale regression can be located
instead of guessed at. Usage: python tools/profile_dedup.py <sf_dir>
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from titan_spark.pipeline.dedup import (
        shingles,
        prefix_filter_candidates,
        jaccard_pairs,
        dedup_clusters,
    )
    from titan_spark.compute.checkpointing import cut_lineage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    sh = cut_lineage(
        docs.select(
            F.col("doc_id").alias("_id"), shingles(F.col("text"), 3).alias("_sh")
        ).withColumn("_sz", F.size("_sh")),
        eager=True,
    )
    print("shingle:", round(time.time() - t0, 1), "docs:", docs.count())

    t0 = time.time()
    cand = cut_lineage(
        prefix_filter_candidates(docs, threshold=0.5, shingle_df=sh), eager=True
    )
    print("candidates:", round(time.time() - t0, 1), "n_cand:", cand.count())

    t0 = time.time()
    j = jaccard_pairs(docs, cand, shingle_df=sh)
    pairs = cut_lineage(
        j.filter(F.col("jaccard") >= 0.5).select("id_a", "id_b"), eager=True
    )
    print("verify:", round(time.time() - t0, 1), "n_pairs:", pairs.count())

    t0 = time.time()
    out = dedup_clusters(pairs)
    n = out.count()
    print("cc:", round(time.time() - t0, 1), "rows:", n)


if __name__ == "__main__":
    main()
