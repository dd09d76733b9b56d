"""A/B the tightened per-pair positional filter for prefix_filter_candidates.

Old (r9-r11): per-collision PPJoin positional check inside the join,
keep pair if ANY collision passes (equivalent to first-collision bound
because the bound is monotonically non-increasing along the collision
sequence).

New (r12 prototype): per-pair bound using ALL prefix collisions —
within-doc rank order equals the canonical global order, so every
overlap element canonically before the k-th prefix collision is itself
a prefix collision; hence overlap <= c + min(|A|-ra_last, |B|-rb_last).
Filtering pairs below alpha = ceil(t/(1+t)(|A|+|B|)) preserves recall.

Usage: SPARK_GRAFT_CPUS=32 python tools/prof_posfilter.py <sf_dir>
Prints candidate counts (old vs new), timing for each candidate stage,
and asserts new ⊆ old plus that every verified pair survives.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from titan_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    threshold = 0.5
    spark = get_spark("prof_posfilter")
    from titan_spark.pipeline.dedup import shingles, jaccard_pairs
    from titan_spark.compute.checkpointing import cut_lineage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = cut_lineage(
        docs.select(
            F.col("doc_id").alias("_id"), shingles(F.col("text"), 3).alias("_sh")
        ).withColumn("_sz", F.size("_sh")),
        eager=True,
    )

    posts = cut_lineage(
        sh.select("_id", "_sz", F.explode("_sh").alias("_gs")).select(
            "_id", "_sz", F.xxhash64("_gs").alias("_g")
        ),
        eager=True,
    )
    freq = posts.groupBy("_g").agg(F.count(F.lit(1)).alias("_f"))
    ranked = (
        posts.join(freq, "_g")
        .withColumn(
            "_r",
            F.row_number().over(Window.partitionBy("_id").orderBy("_f", "_g")),
        )
        .filter(
            F.col("_r") <= F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1
        )
        .select("_id", "_sz", "_g", "_r")
    )
    ranked = cut_lineage(ranked, eager=True)
    a, b = ranked.alias("a"), ranked.alias("b")
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a._sz") + F.col("b._sz"))
    )
    size_ok = F.least("a._sz", "b._sz").cast("double") >= F.lit(threshold) * F.greatest(
        "a._sz", "b._sz"
    )

    # --- OLD: any-collision first-bound filter + dropDuplicates
    t0 = time.time()
    old = (
        a.join(
            b,
            (F.col("a._g") == F.col("b._g"))
            & (F.col("a._id") < F.col("b._id"))
            & size_ok
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
    old = cut_lineage(old, eager=True)
    n_old = old.count()
    t_old = time.time() - t0
    print(f"old candidates: {n_old} in {t_old:.1f}s", flush=True)

    # --- NEW: keep all collisions passing the weak per-collision bound,
    # group per pair, apply the tight last-collision bound
    t0 = time.time()
    coll = a.join(
        b,
        (F.col("a._g") == F.col("b._g"))
        & (F.col("a._id") < F.col("b._id"))
        & size_ok
        # weak per-collision bound (k <= min(ra, rb)): failing it proves
        # the whole pair fails, so dropping the row is recall-safe
        & (
            F.least("a._r", "b._r")
            + F.least(
                F.col("a._sz") - F.col("a._r"), F.col("b._sz") - F.col("b._r")
            )
            >= alpha
        ),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.col("a._sz").alias("sz_a"),
        F.col("b._sz").alias("sz_b"),
        F.col("a._r").alias("ra"),
        F.col("b._r").alias("rb"),
    )
    g = coll.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("c"),
        F.max("ra").alias("ra_max"),
        F.max("rb").alias("rb_max"),
        F.max("sz_a").alias("sz_a"),
        F.max("sz_b").alias("sz_b"),
    )
    alpha_g = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("sz_a") + F.col("sz_b"))
    )
    new = g.filter(
        F.col("c")
        + F.least(F.col("sz_a") - F.col("ra_max"), F.col("sz_b") - F.col("rb_max"))
        >= alpha_g
    ).select("id_a", "id_b")
    new = cut_lineage(new, eager=True)
    n_new = new.count()
    t_new = time.time() - t0
    print(f"new candidates: {n_new} in {t_new:.1f}s  ({n_new/max(n_old,1):.3f}x)", flush=True)

    # safety: new ⊆ old and every verified pair survives the new filter
    extra = new.join(old, ["id_a", "id_b"], "left_anti").count()
    print(f"new-not-in-old: {extra} (must be 0)", flush=True)
    verified_old = (
        jaccard_pairs(docs, old, shingle_df=sh)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    verified_old = cut_lineage(verified_old, eager=True)
    n_ver = verified_old.count()
    lost = verified_old.join(new, ["id_a", "id_b"], "left_anti").count()
    print(f"verified pairs: {n_ver}, lost by new filter: {lost} (must be 0)", flush=True)

    # end-to-end verify timing on the new candidate set
    t0 = time.time()
    vnew = (
        jaccard_pairs(docs, new, shingle_df=sh)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    n_vnew = cut_lineage(vnew, eager=True).count()
    print(f"verify(new): {time.time()-t0:.1f}s, pairs {n_vnew}", flush=True)


if __name__ == "__main__":
    main()
