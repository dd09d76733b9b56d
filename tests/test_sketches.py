"""Count-min sketch contracts (pipeline/sketches.py)."""

from pyspark.sql import functions as F

from titan_spark.functions.text import tokenize
from titan_spark.pipeline.sketches import cms_build, cms_estimate, cms_heavy_hitters


def _docs(spark):
    rows = [
        (1, "apple apple apple banana cherry"),
        (2, "apple banana banana durian elder"),
        (3, "apple cherry fig grape hazel iris"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cms_never_underestimates(spark):
    df = _docs(spark)
    terms = df.select(F.explode(tokenize(F.col("text"))).alias("term"))
    true = {r["term"]: r["n"] for r in terms.groupBy("term").agg(F.count("*").alias("n")).collect()}
    sk = cms_build(terms, "term")
    est = {r["term"]: r["est"] for r in cms_estimate(sk, terms.distinct(), "term").collect()}
    assert set(est) == set(true)
    for t, n in true.items():
        assert est[t] >= n  # CM is an overestimate, never under


def test_cms_heavy_hitters_finds_top_terms(spark):
    df = _docs(spark)
    top = cms_heavy_hitters(df, k=2).collect()
    assert top[0]["term"] == "apple" and top[0]["est"] >= 5
    assert top[1]["term"] == "banana" and top[1]["est"] >= 3


def test_cms_mergeable_across_partitions(spark):
    """Sketch of the union == elementwise sum of the partial sketches."""
    df = _docs(spark)
    t1 = df.filter("doc_id <= 2").select(F.explode(tokenize(F.col("text"))).alias("term"))
    t2 = df.filter("doc_id = 3").select(F.explode(tokenize(F.col("text"))).alias("term"))
    whole = {(r["row"], r["bucket"]): r["c"] for r in cms_build(
        df.select(F.explode(tokenize(F.col("text"))).alias("term")), "term").collect()}
    p1 = {(r["row"], r["bucket"]): r["c"] for r in cms_build(t1, "term").collect()}
    p2 = {(r["row"], r["bucket"]): r["c"] for r in cms_build(t2, "term").collect()}
    merged = dict(p1)
    for k, v in p2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


# ------------------------------------------------------------- HyperLogLog


def test_hll_estimate_accuracy(spark):
    """p=8 (256 registers) has theoretical stderr 1.04/sqrt(m) ~ 6.5%;
    a 10k-distinct stream must estimate within 4 sigma (26%), and in
    practice lands much closer."""
    from titan_spark.pipeline.sketches import hll_distinct

    items = spark.range(10_000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("item")
    )
    est = hll_distinct(items, "item", p=8).collect()[0]["estimate"]
    assert abs(est - 10_000) / 10_000 < 0.26
    # duplicates never change the registers: 3x the same stream
    tripled = items.unionByName(items).unionByName(items)
    est3 = hll_distinct(tripled, "item", p=8).collect()[0]["estimate"]
    assert est3 == est


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities fall into the linear-counting branch and are
    near-exact (it is exact until register collisions)."""
    from titan_spark.pipeline.sketches import hll_distinct

    items = spark.range(30).select(F.concat(F.lit("x"), F.col("id")).alias("item"))
    est = hll_distinct(items, "item", p=8).collect()[0]["estimate"]
    assert abs(est - 30) <= 2


def test_hll_merge_equals_rebuild(spark):
    """union+max of shard sketches == sketch of the union (lossless
    mergeability — the property that makes it a shard/day aggregate)."""
    from titan_spark.pipeline.sketches import hll_build, hll_merge

    a = spark.range(0, 4000).select(F.concat(F.lit("u"), F.col("id")).alias("item"))
    b = spark.range(3000, 7000).select(F.concat(F.lit("u"), F.col("id")).alias("item"))
    whole = {
        r["bucket"]: r["max_rho"]
        for r in hll_build(a.unionByName(b), "item").collect()
    }
    merged = {
        r["bucket"]: r["max_rho"]
        for r in hll_merge(hll_build(a, "item"), hll_build(b, "item")).collect()
    }
    assert merged == whole


def test_hll_registers_match_duckdb(spark, tmp_path):
    """The register table replays bit-identically in DuckDB from the
    same h60 bit budget (the oracle contract of the hll_users row)."""
    import duckdb

    from titan_spark.pipeline.sketches import hll_build, hll_register_sql

    items = spark.range(500).select(
        F.concat(F.lit("k"), F.col("id")).alias("item")
    )
    pq = str(tmp_path / "items.parquet")
    items.write.parquet(pq)
    got = {
        r["bucket"]: r["max_rho"] for r in hll_build(items, "item", p=8).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW items AS SELECT * FROM '{pq}/*.parquet'")
    want = dict(con.execute(hll_register_sql("item", "items", p=8)).fetchall())
    assert got == want


def test_hll_grouped_merges_to_global(spark):
    """Per-group register tables merge (elementwise max) into exactly
    the whole-corpus sketch — the windowed-composition property that
    motivates exposing registers as rows."""
    from pyspark.sql import functions as F

    from titan_spark.pipeline.sketches import (
        hll_build,
        hll_build_grouped,
        hll_estimate,
        hll_estimate_grouped,
        hll_merge,
    )

    items = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("u"), (F.col("id") % 1700).cast("string")).alias("item"),
    )
    grouped = hll_build_grouped(items, ["grp"], "item", p=8).cache()
    merged = hll_merge(grouped.select("bucket", F.col("max_rho"))).collect()
    direct = hll_build(items, "item", p=8).collect()
    assert sorted((r["bucket"], r["max_rho"]) for r in merged) == sorted(
        (r["bucket"], r["max_rho"]) for r in direct
    )
    # per-group estimates track the exact distinct counts (p=8 -> ~6.5%
    # standard error; allow 3 sigma)
    exact = {
        r["grp"]: r["n"]
        for r in items.groupBy("grp").agg(F.countDistinct("item").alias("n")).collect()
    }
    for r in hll_estimate_grouped(grouped, ["grp"], p=8).collect():
        assert abs(r["estimate"] - exact[r["grp"]]) / exact[r["grp"]] < 0.2
    # merged estimate tracks the global distinct count
    [gl] = hll_estimate(hll_merge(grouped.select("bucket", "max_rho")), p=8).collect()
    assert abs(gl["estimate"] - 1700) / 1700 < 0.2


def test_ddsketch_accuracy_and_merge(spark):
    """DDSketch: (1) every quantile estimate is within the relative
    error alpha of the exact quantile; (2) per-shard sketches merge
    losslessly into the whole-corpus sketch; (3) zeros and negatives
    land in their dedicated sign buckets and order correctly."""
    from pyspark.sql import functions as F

    from titan_spark.pipeline.sketches import dd_build, dd_merge, dd_quantiles

    vals = spark.range(10000).select(
        (F.col("id") % 4).alias("shard"),
        (F.pow(F.lit(1.001), F.col("id") % 997) * 3.7).alias("v"),
    )
    alpha = 0.01
    whole = dd_build(vals, "v", alpha=alpha)
    # merged shards == whole-corpus sketch, bucket for bucket
    shards = [
        dd_build(vals.filter(F.col("shard") == s), "v", alpha=alpha)
        for s in range(4)
    ]
    merged = dd_merge(*shards).collect()
    direct = whole.collect()
    assert sorted(tuple(r) for r in merged) == sorted(tuple(r) for r in direct)
    # relative-error bound vs exact percentiles
    exact = vals.agg(
        F.expr("percentile(v, array(0.5, 0.9, 0.99))").alias("p")
    ).first()["p"]
    est = {
        r["q"]: r["estimate"]
        for r in dd_quantiles(whole, (0.5, 0.9, 0.99), alpha=alpha).collect()
    }
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        assert abs(est[q] - ex) / ex <= alpha + 1e-9, (q, est[q], ex)
    # signs: negatives mirror, zeros dedicated bucket, ordering holds
    mixed = spark.createDataFrame(
        [(-100.0,), (-1.0,), (0.0,), (1.0,), (100.0,)], ["v"]
    )
    sk = dd_build(mixed, "v", alpha=alpha)
    q = {r["q"]: r["estimate"] for r in dd_quantiles(sk, (0.0, 0.5, 1.0), alpha=alpha).collect()}
    assert q[0.0] < 0 and abs(q[0.5]) < 1e-9 and q[1.0] > 0
    assert abs(q[0.0] + 100) / 100 <= alpha + 1e-9
    assert abs(q[1.0] - 100) / 100 <= alpha + 1e-9


# ---------------------------------------------------------------------------
# Bloom filter


def test_bloom_no_false_negatives_and_absent_rejects(spark):
    from titan_spark.pipeline.sketches import bloom_build, bloom_probe

    present = [f"in-{i}" for i in range(50)]
    absent = [f"out-{i}" for i in range(50)]
    items = spark.createDataFrame([(x,) for x in present], ["item"])
    bloom = bloom_build(items, "item", m_bits=1 << 16, k=3)
    probes = spark.createDataFrame([(x,) for x in present + absent], ["item"])
    got = {
        r["item"]: r["maybe_present"]
        for r in bloom_probe(probes, "item", bloom, m_bits=1 << 16, k=3).collect()
    }
    for x in present:
        assert got[x] is True  # Bloom NEVER false-negatives
    # 50 items in 65536 bits: FP rate ~= 1e-8 -- all absents reject
    for x in absent:
        assert got[x] is False


def test_bloom_merge_equals_union_build(spark):
    from titan_spark.pipeline.sketches import bloom_build, bloom_merge

    a = spark.createDataFrame([(f"a{i}",) for i in range(20)], ["item"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(20)], ["item"])
    merged = sorted(
        r["pos"]
        for r in bloom_merge(
            bloom_build(a, "item", m_bits=4096, k=3),
            bloom_build(b, "item", m_bits=4096, k=3),
        ).collect()
    )
    whole = sorted(
        r["pos"]
        for r in bloom_build(a.unionByName(b), "item", m_bits=4096, k=3).collect()
    )
    assert merged == whole  # lossless merge == bitwise OR


def test_bloom_decontaminate_matches_exact_at_large_m(spark):
    """With m >> k*n the FP rate vanishes and the sketch path must
    reproduce the exact ngram_decontaminate table value-for-value; at
    a deliberately tiny m the sketch may only ever OVERcount (Bloom
    has no false negatives), never drop a contaminated doc."""
    from titan_spark.pipeline.decontam import (
        bloom_decontaminate,
        hash_eval_split,
        ngram_decontaminate,
    )

    rows = [
        (i, f"alpha beta gamma delta shared{i % 7} tail{i} epsilon zeta eta")
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    train, ev = hash_eval_split(docs, mod=10)
    exact = {
        r["doc_id"]: r["n_hit_grams"]
        for r in ngram_decontaminate(train, ev, n=4).collect()
    }
    big = {
        r["doc_id"]: r["n_hit_grams"]
        for r in bloom_decontaminate(train, ev, n=4, m_bits=1 << 20, k=3).collect()
    }
    assert big == exact
    tiny = {
        r["doc_id"]: r["n_hit_grams"]
        for r in bloom_decontaminate(train, ev, n=4, m_bits=256, k=2).collect()
    }
    for doc, n in exact.items():
        assert tiny.get(doc, 0) >= n  # overcount only, never undercount


def test_kmv_build_exact_mode_and_theta(spark):
    """A set with <= k distinct items is stored exactly: theta_h is the
    full hash space, n_kept == |S|, one row per distinct item (dups
    collapse)."""
    from titan_spark.pipeline.sketches import kmv_build

    rows = [("a", f"item{i}") for i in range(10)] + [("a", "item0")]
    d = spark.createDataFrame(rows, "s string, item string")
    out = kmv_build(d, "s", "item", k=64).collect()
    assert len(out) == 10
    assert all(r["theta_h"] == 2**60 and r["n_kept"] == 10 for r in out)


def test_kmv_intersection_exact_when_small(spark):
    """Both sets within k: n_common and est_common equal the true
    intersection exactly (theta = full space)."""
    from titan_spark.pipeline.sketches import kmv_intersection

    rows = [("a", f"x{i}") for i in range(30)] + [
        ("b", f"x{i}") for i in range(20, 50)
    ]
    d = spark.createDataFrame(rows, "s string, item string")
    [r] = kmv_intersection(d, "s", "item", k=64).collect()
    assert (r["set_a"], r["set_b"]) == ("a", "b")
    assert r["n_common"] == 10 and r["est_common"] == 10.0


def test_kmv_intersection_recovers_planted_overlap(spark):
    """Sketch path (sets >> k): planted |A|=|B|=600, |A∩B|=200; the
    theta-intersection estimate lands within 3σ of truth
    (RSE ≈ 1/√(k−1) on the sampled fraction)."""
    from titan_spark.pipeline.sketches import kmv_intersection

    shared = [f"s{i}" for i in range(200)]
    rows = [("a", x) for x in shared + [f"a{i}" for i in range(400)]]
    rows += [("b", x) for x in shared + [f"b{i}" for i in range(400)]]
    d = spark.createDataFrame(rows, "s string, item string")
    k = 128
    [r] = kmv_intersection(d, "s", "item", k=k).collect()
    # sampling rate θ ≈ k/600; n_common ~ Binomial(200, θ) →
    # σ(est) ≈ sqrt(200/θ) ≈ 31 at θ≈0.21; allow 3σ
    assert abs(r["est_common"] - 200) < 95, r
    assert r["n_common"] < 128


def test_kmv_disjoint_sets_zero(spark):
    """Disjoint sets: the pair row exists with n_common = 0 and
    est_common = 0.0 (LEFT join contract, no dropped pairs)."""
    from titan_spark.pipeline.sketches import kmv_intersection

    rows = [("a", f"x{i}") for i in range(100)] + [
        ("b", f"y{i}") for i in range(100)
    ]
    d = spark.createDataFrame(rows, "s string, item string")
    [r] = kmv_intersection(d, "s", "item", k=32).collect()
    assert r["n_common"] == 0 and r["est_common"] == 0.0
