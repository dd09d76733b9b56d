"""Hashed-n-gram NB classifier (pipeline/classify.py): closed-form
weight math, featurization, edge cases, held-out generalization on a
class-distinct vocabulary, and the CCNet quality-distillation shape on
real documents."""

import math

from pyspark.sql import functions as F


def _fake_hash(col):
    """Deterministic test 'hash': gram length — makes bucket
    assignment hand-computable (buckets collide exactly when gram
    lengths match)."""
    return F.length(col).cast("long")


def test_hashed_gram_rows_features(spark):
    from titan_spark.pipeline.classify import hashed_gram_rows

    docs = spark.createDataFrame([(1, "aa bbb aa")], ["doc_id", "text"])
    # grams: aa(2), bbb(3), aa(2), 'aa bbb'(6), 'bbb aa'(6)
    rows = hashed_gram_rows(
        docs, n_buckets=100, hash_fn=_fake_hash
    ).collect()
    buckets = sorted(r["bucket"] for r in rows)
    assert buckets == [2, 2, 3, 6, 6]
    # unigrams only
    rows = hashed_gram_rows(
        docs, n_buckets=100, use_bigrams=False, hash_fn=_fake_hash
    ).collect()
    assert sorted(r["bucket"] for r in rows) == [2, 2, 3]
    # single-token doc has no bigrams, and bucket wraps modulo n_buckets
    one = spark.createDataFrame([(1, "abcde")], ["doc_id", "text"])
    rows = hashed_gram_rows(one, n_buckets=3, hash_fn=_fake_hash).collect()
    assert [r["bucket"] for r in rows] == [5 % 3]


def test_nb_closed_form(spark):
    """Hand-computed multinomial NB on a 4-doc corpus with the
    length-hash: weights, prior, default weight and scores all match
    the closed form exactly."""
    from titan_spark.pipeline.classify import nb_score, nb_train

    nb, alpha = 10, 0.5
    # positive docs use 2-char tokens, negative docs 3-char tokens;
    # unigrams only so bucket = token length
    docs = spark.createDataFrame(
        [
            (0, "aa bb", True),
            (2, "cc dd aa", True),
            (4, "xxx yyy", False),
            (6, "zzz xxx qqq", False),
        ],
        ["doc_id", "text", "y"],
    )
    weights, stats = nb_train(
        docs,
        "y",
        n_buckets=nb,
        alpha=alpha,
        use_bigrams=False,
        hash_fn=_fake_hash,
        calibrate=False,  # pin the raw 0 boundary for the closed form
    )
    # occurrence counts: bucket 2 -> (5 pos, 0 neg); bucket 3 -> (0, 5)
    tp, tn = 5.0, 5.0
    w2 = math.log((5 + alpha) / (tp + alpha * nb)) - math.log(
        (0 + alpha) / (tn + alpha * nb)
    )
    w3 = math.log((0 + alpha) / (tp + alpha * nb)) - math.log(
        (5 + alpha) / (tn + alpha * nb)
    )
    got = {r["bucket"]: r["w"] for r in weights.collect()}
    assert abs(got[2] - w2) < 1e-12 and abs(got[3] - w3) < 1e-12
    assert abs(stats["b0"] - 0.0) < 1e-12  # balanced classes
    wd = math.log(alpha / (tp + alpha * nb)) - math.log(alpha / (tn + alpha * nb))
    assert abs(stats["w_default"] - wd) < 1e-12 and wd == 0.0  # tp == tn

    test = spark.createDataFrame(
        [
            (1, "ee ff"),       # two bucket-2 grams -> 2*w2 > 0
            (3, "www"),         # one bucket-3 gram -> w3 < 0
            (5, "abcd"),        # bucket 4: unseen -> w_default = 0
            (7, ""),            # zero grams -> score = b0
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in nb_score(test, weights, stats).collect()}
    assert abs(out[1]["score"] - round(2 * w2, 4)) < 1e-9 and out[1]["pred"] == 1
    assert abs(out[3]["score"] - round(w3, 4)) < 1e-9 and out[3]["pred"] == 0
    assert out[5]["score"] == 0.0 and out[5]["n_grams"] == 1
    assert out[7]["score"] == 0.0 and out[7]["n_grams"] == 0


def test_nb_generalizes_synthetic_vocab(spark):
    """Genuine generalization on a corpus with class-distinct
    vocabulary plus shared noise words: held-out accuracy must be
    near-perfect and far above the majority baseline."""
    from titan_spark.pipeline.classify import nb_score, nb_train

    shared = "alpha beta gamma delta"
    rows = []
    for i in range(120):
        if i % 3 == 0:  # negative class mentions storm/cloud words
            rows.append((i, f"{shared} storm cloud rain thunder w{i % 7}", False))
        else:
            rows.append((i, f"{shared} sunny bright clear sky w{i % 7}", True))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 != 0)
    weights, stats = nb_train(train, "y", n_buckets=1 << 12)
    scored = nb_score(test, weights, stats)
    joined = scored.join(docs.select("doc_id", "y"), "doc_id")
    agg = joined.agg(
        F.sum(((F.col("pred") == 1) == F.col("y")).cast("int")).alias("c"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["c"] == agg["n"], (agg["c"], agg["n"])


def test_nb_mimics_quality_target(spark, sf_dir):
    """The CCNet distillation shape on real documents: train against
    the doc_quality composite label on the even half; the held-out
    half must classify well above the majority baseline (the hashed
    gram distribution genuinely carries the target's signal, and the
    calibrated threshold fixes multinomial NB's length bias)."""
    from titan_spark.pipeline.classify import nb_score, nb_train
    from titan_spark.pipeline.text_quality import doc_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lab = doc_quality(docs).select(
        "doc_id", (F.col("quality_score") >= 0.6).alias("y")
    )
    labeled = docs.select("doc_id", "text").join(lab, "doc_id")
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 != 0)
    weights, stats = nb_train(train, "y", n_buckets=1 << 16)
    assert stats["threshold"] > 0.0  # calibration moved the boundary
    scored = nb_score(test.drop("y"), weights, stats)
    joined = scored.join(lab, "doc_id")
    agg = joined.agg(
        F.sum(((F.col("pred") == 1) == F.col("y")).cast("int")).alias("c"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("int")).alias("np"),
    ).collect()[0]
    acc = agg["c"] / agg["n"]
    majority = max(agg["np"], agg["n"] - agg["np"]) / agg["n"]
    assert acc > majority + 0.1, (acc, majority)
    assert acc > 0.85, acc


def test_nb_weight_table_bounded(spark):
    """The model never exceeds the bucket space — the fastText hashing
    trick's memory bound, the property that holds at 100 TB."""
    from titan_spark.pipeline.classify import nb_train

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2}", i % 2 == 0) for i in range(50)],
        ["doc_id", "text", "y"],
    )
    nb = 8
    weights, stats = nb_train(docs, "y", n_buckets=nb, hash_fn="portable")
    assert weights.count() <= nb
    assert weights.agg(F.max("bucket")).collect()[0][0] < nb
    assert stats["n_buckets"] == nb


def test_dsir_closed_form(spark):
    """Hand-computed DSIR log-ratio on the length-hash: per-bucket
    log p_target − log p_raw, per-doc sums, zero-gram docs score 0."""
    from titan_spark.pipeline.classify import dsir_importance

    nb, alpha = 10, 0.5
    target = spark.createDataFrame(
        [(100, "aa bb"), (101, "cc aa")], ["doc_id", "text"]
    )  # 4 occurrences in bucket 2
    raw = spark.createDataFrame(
        [(1, "dd ee"), (2, "xxx yyy"), (3, "")],
        ["doc_id", "text"],
    )  # bucket 2 x2 (doc1), bucket 3 x2 (doc2), none (doc3)
    out = {
        r["doc_id"]: r
        for r in dsir_importance(
            raw, target, n_buckets=nb, use_bigrams=False, hash_fn=_fake_hash
        ).collect()
    }
    tt, tr = 4.0, 4.0
    w2 = math.log((4 + alpha) / (tt + alpha * nb)) - math.log(
        (2 + alpha) / (tr + alpha * nb)
    )
    w3 = math.log((0 + alpha) / (tt + alpha * nb)) - math.log(
        (2 + alpha) / (tr + alpha * nb)
    )
    assert abs(out[1]["log_importance"] - round(2 * w2, 4)) < 1e-9
    assert abs(out[2]["log_importance"] - round(2 * w3, 4)) < 1e-9
    assert out[1]["log_importance"] > 0 > out[2]["log_importance"]
    assert out[3]["log_importance"] == 0.0 and out[3]["n_grams"] == 0


def test_dsir_resample_prefers_target_like(spark):
    """End to end: resampling with DSIR weights concentrates the
    selection on raw docs that share the target's vocabulary, and the
    selection is deterministic (same seed → same set)."""
    from titan_spark.pipeline.classify import dsir_resample

    target = spark.createDataFrame(
        [(1000 + i, "physics quantum electron proton field") for i in range(5)],
        ["doc_id", "text"],
    )
    rows = []
    for i in range(60):
        if i % 3 == 0:  # target-like third
            rows.append((i, f"quantum field electron study w{i % 5}"))
        else:
            rows.append((i, f"cooking recipe garlic onion pepper w{i % 5}"))
    raw = spark.createDataFrame(rows, ["doc_id", "text"])
    sel = dsir_resample(raw, target, n=15, seed=3, n_buckets=1 << 12)
    ids = sorted(r["doc_id"] for r in sel.collect())
    assert len(ids) == 15
    target_like = sum(1 for i in ids if i % 3 == 0)
    assert target_like >= 12, target_like  # heavily skewed to target-like
    ids2 = sorted(
        r["doc_id"]
        for r in dsir_resample(raw, target, n=15, seed=3, n_buckets=1 << 12).collect()
    )
    assert ids == ids2


def test_nb_null_labels_excluded(spark):
    """Documents with NULL labels are excluded from training entirely
    (r10, ADVICE): the fitted weights, prior and totals must be
    identical to training on the labeled subset alone — not silently
    absorbed into the negative class."""
    from titan_spark.pipeline.classify import nb_train

    labeled_only = spark.createDataFrame(
        [(0, "aa bb", True), (2, "xxx yyy", False)],
        ["doc_id", "text", "y"],
    )
    with_nulls = spark.createDataFrame(
        [(0, "aa bb", True), (2, "xxx yyy", False), (4, "cc dd ee", None)],
        "doc_id long, text string, y boolean",
    )
    kw = dict(
        n_buckets=10, use_bigrams=False, hash_fn=_fake_hash, calibrate=False
    )
    w_ref, s_ref = nb_train(labeled_only, "y", **kw)
    w_got, s_got = nb_train(with_nulls, "y", **kw)
    ref = {r["bucket"]: r["w"] for r in w_ref.collect()}
    got = {r["bucket"]: r["w"] for r in w_got.collect()}
    assert ref == got  # null-label doc contributed zero counts
    assert s_ref["b0"] == s_got["b0"]
    assert s_ref["w_default"] == s_got["w_default"]


def test_nb_calibration_ignores_zero_gram_docs_and_pred_uses_rounded(spark):
    """Two cross-engine-parity contracts (r10, ADVICE): (a) the
    calibrated threshold comes from gram-bearing training docs only —
    an empty-text doc (score = b0 exactly, no feature evidence) must
    not shift the class means, because the oracle's per-gram GROUP BY
    can never see it; (b) pred decides on the ROUNDED score, the same
    4dp value both engines publish."""
    from titan_spark.pipeline.classify import nb_score, nb_train

    base = [
        (0, "aa bb aa", True),
        (2, "cc dd", True),
        (4, "xxx yyy", False),
        (6, "zzz www qqq", False),
    ]
    kw = dict(n_buckets=10, use_bigrams=False, hash_fn=_fake_hash)
    _, s_ref = nb_train(spark.createDataFrame(base, ["doc_id", "text", "y"]), "y", **kw)
    weights, s_got = nb_train(
        spark.createDataFrame(base + [(8, "", True)], ["doc_id", "text", "y"]),
        "y",
        **kw,
    )
    # the empty positive doc changes the PRIOR (doc counts) but must
    # not enter the threshold means beyond that prior shift: recompute
    # the reference threshold under the same b0 by rebuilding it from
    # the gram-bearing docs' scores
    scored = {
        r["doc_id"]: r
        for r in nb_score(
            spark.createDataFrame(base + [(8, "", True)], ["doc_id", "text", "y"]),
            weights,
            s_got,
        ).collect()
    }
    pos_scores = [scored[0]["score"], scored[2]["score"]]  # gram-bearing pos
    neg_scores = [scored[4]["score"], scored[6]["score"]]
    expected_thr = round(
        (sum(pos_scores) / 2 + sum(neg_scores) / 2) / 2, 4
    )
    assert abs(s_got["threshold"] - expected_thr) < 1e-9, (
        s_got["threshold"],
        expected_thr,
    )
    del s_ref
    # pred is exactly (rounded score > threshold) on every row
    for r in scored.values():
        assert r["pred"] == int(r["score"] > s_got["threshold"]), r
