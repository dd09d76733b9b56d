"""r12 stage profiler for dedup_clusters under the REAL engine session.

tools/profile_dedup.py builds its own SparkSession whose config diverges
from titan_spark.session.get_spark (no adaptive coalescing, its own
memory sizing); its stage numbers are not comparable to the bench JVM.
This one uses get_spark() + the exact catalog pipeline, timing the four
stages separately with the noop sink where a stage is lazy.

Usage: SPARK_GRAFT_CPUS=32 python tools/prof_dedup12.py <sf_dir>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from titan_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("prof_dedup12")
    from titan_spark.pipeline.dedup import (
        shingles,
        prefix_filter_candidates,
        jaccard_pairs,
        dedup_clusters,
    )
    from titan_spark.compute.checkpointing import cut_lineage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sc = spark.sparkContext

    sc.setJobDescription("dedup: shingle pass")
    t0 = time.time()
    sh = cut_lineage(
        docs.select(
            F.col("doc_id").alias("_id"), shingles(F.col("text"), 3).alias("_sh")
        ).withColumn("_sz", F.size("_sh")),
        eager=True,
    )
    print("shingle:", round(time.time() - t0, 1), "docs:", docs.count(), flush=True)

    sc.setJobDescription("dedup: candidates")
    t0 = time.time()
    cand = cut_lineage(
        prefix_filter_candidates(docs, threshold=0.5, shingle_df=sh), eager=True
    )
    n_cand = cand.count()
    print("candidates:", round(time.time() - t0, 1), "n_cand:", n_cand, flush=True)

    sc.setJobDescription("dedup: verify")
    t0 = time.time()
    j = jaccard_pairs(docs, cand, shingle_df=sh)
    pairs = cut_lineage(
        j.filter(F.col("jaccard") >= 0.5).select("id_a", "id_b"), eager=True
    )
    print("verify:", round(time.time() - t0, 1), "n_pairs:", pairs.count(), flush=True)

    sc.setJobDescription("dedup: cc")
    t0 = time.time()
    out = dedup_clusters(pairs)
    n = out.count()
    print("cc:", round(time.time() - t0, 1), "rows:", n, flush=True)


if __name__ == "__main__":
    main()
