"""Repetition signals, n-gram decontamination, semantic dedup."""

from pyspark.sql import functions as F

from titan_spark.pipeline.decontam import hash_eval_split, ngram_decontaminate
from titan_spark.pipeline.similarity import semantic_dedup_clusters
from titan_spark.pipeline.text_quality import repetition_stats


def test_repetition_stats_values(spark):
    d = spark.createDataFrame(
        [
            (1, "a a a a"),           # one token repeated: all fracs maximal
            (2, "a b c d"),           # all distinct: no repetition
            (3, "a b a b a"),         # "a b"×2 + "b a"×2 of 4 bigrams
            (4, ""),                  # empty doc: zeros, no NULLs
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[1]["dup_2gram_frac"] == round(2 / 3, 4)  # "a a"×3 → 2 dups
    assert rows[1]["top_2gram_frac"] == 1.0
    assert rows[2]["top_token_frac"] == 0.25
    assert rows[2]["dup_2gram_frac"] == 0.0
    assert rows[3]["dup_2gram_frac"] == 0.5
    assert rows[3]["top_2gram_frac"] == 0.5
    assert rows[4]["n_tokens"] == 0
    assert rows[4]["top_token_frac"] == 0.0 and rows[4]["dup_2gram_frac"] == 0.0


def test_ngram_decontaminate_flags_verbatim_copy(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix text the quick brown fox suffix"),  # one shared 4-gram
            (2, "completely unrelated training text here"),
            (3, "the quick brown fox jumps elsewhere"),     # two shared 4-grams
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_hit_grams"] for r in ngram_decontaminate(train, eval_df).collect()}
    assert hits == {1: 1, 3: 2}


def test_ngram_decontaminate_shuffle_fallback(spark):
    # VERDICT r3 #8: above max_broadcast_grams the broadcast hint drops and
    # the join shuffles — results must be identical on both paths
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(1, "prefix text the quick brown fox suffix"),
         (3, "the quick brown fox jumps elsewhere")],
        "doc_id long, text string",
    )
    bc = ngram_decontaminate(train, eval_df)  # eval grams << default cap
    shuf = ngram_decontaminate(train, eval_df, max_broadcast_grams=1)
    assert "ResolvedHint" not in shuf._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in bc._jdf.queryExecution().analyzed().toString()
    as_dict = lambda df: {r["doc_id"]: r["n_hit_grams"] for r in df.collect()}
    assert as_dict(bc) == as_dict(shuf) == {1: 1, 3: 2}


def test_hash_eval_split_is_partition(spark):
    d = spark.createDataFrame([(i, "x") for i in range(300)], "doc_id long, text string")
    train, ev = hash_eval_split(d, mod=10)
    t = {r["doc_id"] for r in train.collect()}
    e = {r["doc_id"] for r in ev.collect()}
    assert t | e == set(range(300)) and not (t & e)
    assert 10 < len(e) < 60  # ~30 expected


def test_quality_funnel_monotone_and_counts(spark):
    from titan_spark.pipeline.text_quality import quality_funnel

    d = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and then it runs to the old barn while birds watch on"),
            (2, "short"),                                   # fails length
            (3, " ".join(["spam spam"] * 30)),              # fails repetition
            # fails lang only (es markers, distinct tokens, decent quality)
            (4, "el la de que uno dos tres cuatro cinco seis siete ocho "
                "nueve diez once doce trece catorce quince mundo libro casa perro gato"),
        ],
        "doc_id long, text string",
    )
    r = quality_funnel(d, min_tokens=10).collect()[0]
    assert r["n_docs"] == 4
    # funnel counts are monotone non-increasing
    seq = [r["n_docs"], r["n_pass_length"], r["n_pass_repetition"], r["n_pass_quality"], r["n_pass_lang"]]
    assert seq == sorted(seq, reverse=True)
    assert r["n_pass_length"] == 3          # doc 2 out
    assert r["n_pass_repetition"] == 2      # doc 3 out
    assert r["n_pass_lang"] == 1            # doc 4 out (es), doc 1 survives


def test_semantic_dedup_clusters_near_dups(spark):
    # two planted near-dup groups (identical vectors land in the same
    # LSH bucket in every table) plus isolated vectors
    base_a = [1.0, 0.0, 0.5, -0.25] * 4
    base_b = [-0.5, 1.0, 0.0, 0.75] * 4
    rows = [
        (1, base_a), (2, base_a), (3, base_a),
        (10, base_b), (11, base_b),
        (20, [1.0, -1.0] * 8), (21, [0.0, 1.0, -1.0, 0.5] * 4),
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["cluster_rep"] for r in
           semantic_dedup_clusters(d, threshold=0.95, dim=16).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == 10
    assert 20 not in out and 21 not in out  # no near-dup ⇒ not in any cluster


def test_plane_dots_backends_agree_on_buckets(spark):
    # the Arrow matmul backend and the JVM fold may differ in the last
    # ulp of a dot product, but every consumer reads only the SIGN
    # (bucket packing) — assert the two backends bucket the real
    # corpus identically, and that the Arrow path propagates nulls
    from titan_spark.pipeline.similarity import (
        _det_planes,
        _pack_bits,
        _plane_dots_arrow,
        _plane_dots_fold,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = _det_planes(64, 16)
    both = df.select(
        "vec_id",
        _pack_bits(_plane_dots_arrow(F.col("embedding"), planes), 0, 16).alias("ba"),
        _pack_bits(_plane_dots_fold(F.col("embedding"), planes), 0, 16).alias("bf"),
    )
    assert both.filter("ba <> bf").count() == 0

    withnull = df.limit(3).withColumn(
        "embedding",
        F.when(F.col("vec_id") == df.limit(1).collect()[0]["vec_id"], F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    out = withnull.select(_plane_dots_arrow(F.col("embedding"), planes).alias("d")).collect()
    assert sum(1 for r in out if r["d"] is None) == 1


def test_adaptive_planes_formula():
    # holds expected bucket occupancy ~16 as the corpus grows; floors at
    # the historical 8 so small-corpus results (and the pinned driver
    # oracles at ~2k vectors) are bit-identical to the fixed-width era
    from titan_spark.pipeline.similarity import adaptive_planes

    assert adaptive_planes(0) == 8
    assert adaptive_planes(2_000) == 8        # ceil(log2(125)) = 7 -> floor
    assert adaptive_planes(20_000) == 11      # ceil(log2(1250))
    assert adaptive_planes(200_000) == 14
    assert adaptive_planes(2_000_000_000) == 27  # 100-TB-ish corpus: fine width
    assert adaptive_planes(4_096, target_occupancy=16) == 8
    assert adaptive_planes(8_192, target_occupancy=16) == 9


def test_lsh_topk_pairs_default_matches_pinned_width(spark):
    # at sub-threshold corpus sizes the adaptive default must reproduce
    # the pinned n_planes=8 result exactly (that is what keeps the
    # driver's baked plane-literal oracles green)
    from titan_spark.pipeline.similarity import lsh_topk_pairs

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = lsh_topk_pairs(df, k=10).collect()
    pinned = lsh_topk_pairs(df, k=10, n_planes=8).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in pinned]


def test_containment_decontaminate_asymmetric(spark):
    """A short eval doc fully embedded in a long train page scores
    containment 1.0 (the Jaccard between the pair would be tiny) and a
    disjoint pair never appears; thresholding keeps only the flagged
    pair."""
    from titan_spark.pipeline.decontam import containment_decontaminate

    eval_df = spark.createDataFrame(
        [(100, "what is the capital of france")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (
                1,
                "intro text here what is the capital of france "
                "and lots of unrelated filler words follow "
                "one two three four five six seven eight nine ten",
            ),
            (2, "completely different content about spark joins"),
        ],
        "doc_id long, text string",
    )
    rows = containment_decontaminate(
        train, eval_df, n=3, threshold=0.5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["eval_doc_id"]) == (1, 100)
    # eval doc has 6 tokens -> 4 distinct 3-grams, all inside doc 1
    assert r["n_eval_grams"] == 4 and r["n_shared"] == 4
    assert r["containment"] == 1.0


def test_containment_partial_below_threshold_drops(spark):
    from titan_spark.pipeline.decontam import containment_decontaminate

    eval_df = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    # shares exactly 1 of the 4 distinct 3-grams -> containment 0.25
    train = spark.createDataFrame(
        [(1, "alpha beta gamma unrelated tail words")],
        "doc_id long, text string",
    )
    assert (
        containment_decontaminate(train, eval_df, n=3, threshold=0.5).count()
        == 0
    )
    got = containment_decontaminate(
        train, eval_df, n=3, threshold=0.2
    ).collect()
    assert len(got) == 1 and got[0]["containment"] == 0.25


def test_ngram_novelty_closed_form(spark):
    """Three docs: an exact dup pair scores 0 novelty (every gram
    appears in the twin), the unique doc scores 1.0; counts match the
    clamped-slice shingle contract (shorter-than-n docs -> one
    whole-doc gram)."""
    from titan_spark.pipeline.text_quality import ngram_novelty

    d = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely novel words never repeated anywhere else"),
            (4, "tiny"),  # < n tokens -> one whole-doc shingle
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(d, n=8).collect()}
    # 9 tokens -> 2 distinct 8-grams, both shared with the twin
    assert rows[1]["n_grams"] == 2 and rows[1]["novel_grams"] == 0
    assert rows[1]["novelty"] == 0.0 and rows[2]["novelty"] == 0.0
    assert rows[3]["novelty"] == 1.0
    assert rows[4]["n_grams"] == 1 and rows[4]["novelty"] == 1.0
