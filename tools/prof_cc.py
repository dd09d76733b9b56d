"""Per-round profiler for the connected-components loop on the sf10
semantic-dedup pair graph. First run with ``--build <sf_dir>`` to
materialize the verified pairs to /tmp/cc_pairs.parquet; then run
without args to time the CC loop round-by-round against that file.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

PAIRS = "/tmp/cc_pairs.parquet"


def get_session():
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def build(sf_dir):
    spark = get_session()
    from titan_spark.pipeline.similarity import (
        _dot,
        _lsh_candidates,
        _norm,
        _resolve_planes,
    )

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_planes = _resolve_planes(df, None)
    cand = _lsh_candidates(df, 8, n_planes, "embedding", "vec_id")
    va = df.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        _norm(F.col("embedding")).alias("_na"),
    )
    vb = df.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        _norm(F.col("embedding")).alias("_nb"),
    )
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_dot("va", "vb") / (F.col("_na") * F.col("_nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b")
    )
    pairs.write.mode("overwrite").parquet(PAIRS)
    print("built", spark.read.parquet(PAIRS).count(), "pairs")


def run_cc():
    spark = get_session()
    from titan_spark.compute.checkpointing import cut_lineage, scoped_shuffle_partitions

    pairs = spark.read.parquet(PAIRS)
    t_all = time.time()
    und = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .dropDuplicates(["u", "v"])
        .cache()
    )
    n_und = und.count()
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .dropDuplicates(["id"])
    )
    state = cut_lineage(ids.select("id", F.col("id").alias("component")), eager=True)
    print(f"setup: {time.time()-t_all:.1f}s n_und={n_und}")

    with scoped_shuffle_partitions(spark, n_und):
        live = und.select("u", "v")
        for i in range(60):
            t0 = time.time()
            if i > 0:
                lab_u = state.select(F.col("id").alias("u"), F.col("component").alias("cu"))
                lab_v = state.select(F.col("id").alias("v"), F.col("component").alias("cv"))
                live = (
                    live.select("u", "v")
                    .join(lab_u, "u")
                    .join(lab_v, "v")
                    .filter(F.col("cu") != F.col("cv"))
                    .select(F.col("cu").alias("u"), F.col("cv").alias("v"))
                    .dropDuplicates(["u", "v"])
                )
                live = cut_lineage(live, eager=True, round_idx=i)
            t1 = time.time()
            n_live = live.count()
            nbr = live.groupBy(F.col("u").alias("component")).agg(F.min("v").alias("nbr_min"))
            ptr = state.select(F.col("id").alias("component"), F.col("component").alias("jump"))
            if i >= 2:
                hop = ptr.select(F.col("component").alias("jump"), F.col("jump").alias("jump2"))
                ptr = ptr.join(hop, "jump", "left").select(
                    "component", F.coalesce("jump2", "jump").alias("jump")
                )
            new_state = (
                state.join(nbr, "component", "left")
                .join(ptr, "component", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_min"), F.col("component")),
                        F.coalesce(F.col("jump"), F.col("component")),
                    ).alias("component"),
                    F.col("component").alias("_old"),
                )
            )
            t2 = time.time()
            new_state = cut_lineage(new_state, eager=True, round_idx=i)
            changed = new_state.filter(F.col("component") < F.col("_old")).limit(1).count()
            state = new_state.select("id", "component")
            print(
                f"round {i}: contract={t1-t0:.2f}s live={n_live} "
                f"state={time.time()-t2:.2f}s total={time.time()-t0:.2f}s changed={changed}"
            )
            if changed == 0:
                break
    n = state.count()
    comp = state.select(F.countDistinct("component")).first()[0]
    print(f"CC total: {time.time()-t_all:.1f}s rows={n} components={comp}")


if __name__ == "__main__":
    if "--build" in sys.argv:
        build(sys.argv[sys.argv.index("--build") + 1])
    else:
        run_cc()
