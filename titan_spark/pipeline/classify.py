"""Hashed-n-gram Naive Bayes text classifier — the fastText-style
production quality/language filter (Joulin et al. 2017 "Bag of
Tricks"; CCNet and the GPT-3 curation recipe train exactly this shape
to keep high-quality documents at corpus scale).

Training is ONE corpus pass in closed form (multinomial Naive Bayes
with Laplace smoothing), not SGD: per-class hashed-feature occurrence
counts → per-bucket log-odds. Closed form means (a) the fitted model
is a DataFrame — mergeable, inspectable, persistable like every other
sketch in this engine — and (b) the whole train+score pipeline replays
in ANSI SQL, so the operator is value-checked end to end rather than
rows-only.

Scale shape (the 100-TB question): features are HASHED into a fixed
bucket space, so the model is ≤ ``n_buckets`` rows however large the
corpus vocabulary — the fastText hashing trick. Training is explode →
groupBy(bucket): one shuffle of integer keys whose cardinality is
capped by ``n_buckets``. Scoring joins the weight table back
broadcast (guarded by the same threshold pattern as the Bloom probe),
so inference is one scan over the corpus with a map-side join — no
per-row Python, no iteration, nothing all-pairs.

Reference parity: the reference's raw-index scoring surface ranks
documents by a per-term weight sum over matched terms
(graphdb/query/graph/GraphCentricQueryBuilder.java + the external
index provider's scoring); this operator is the same
explode/weight-join/sum shape with LEARNED per-term weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from titan_spark.functions.hashing import resolve_hash_fn
from titan_spark.functions.text import tokenize

# broadcast the weight table only while it is plausibly executor-memory
# sized; above this the join falls back to a shuffle hash join
_BROADCAST_MAX_BUCKETS = 1 << 22


def hashed_gram_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    use_bigrams: bool = True,
    hash_fn="portable",
) -> DataFrame:
    """One row per gram OCCURRENCE (multinomial counts): word unigrams
    + optional word bigrams, hashed into ``n_buckets`` integer buckets.
    Gram text never leaves the scan stage — only the integer bucket
    shuffles (the same keep-text-in-the-scan rule as the Bloom
    decontaminator)."""
    h = resolve_hash_fn(hash_fn)
    toks = tokenize(F.col(text_col))
    if use_bigrams:
        n = F.size(toks)
        bigrams = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bigrams)
    else:
        grams = toks
    return docs.select(
        F.col(id_col).alias("_id"), F.explode(grams).alias("gram")
    ).select(
        "_id", F.pmod(h(F.col("gram")), F.lit(n_buckets)).cast("int").alias("bucket")
    )


def nb_train(
    docs: DataFrame,
    label_col,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    alpha: float = 0.5,
    use_bigrams: bool = True,
    hash_fn="portable",
    calibrate: bool = True,
) -> tuple[DataFrame, dict]:
    """Fit binary multinomial NB in closed form. ``label_col`` is a
    boolean Column (or name) — True = positive class.

    Returns ``(weights, stats)``: ``weights`` is a ``(bucket, w)``
    DataFrame with ``w = log P(bucket|pos) − log P(bucket|neg)``
    (Laplace-``alpha`` smoothed); ``stats`` carries the scalar model
    parameters — ``b0`` (log class-prior odds), ``w_default`` (the
    smoothed log-odds of a bucket never seen in training, applied to
    unseen buckets at inference), and the config needed to featurize
    identically at score time. The only driver-side data movement is
    one 4-scalar aggregate collect (the totals), the same 1-row
    pattern as the TF-IDF/perplexity operators."""
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    # NULL labels are excluded from training (not absorbed into the
    # negative class): an unlabeled row is missing data, and silently
    # counting it as negative would skew both the bucket counts and
    # the fitted prior
    from titan_spark.compute.checkpointing import cut_lineage

    labeled = docs.select(
        F.col(id_col).alias("_id"), lbl.cast("boolean").alias("_pos")
    ).filter(F.col("_pos").isNotNull())
    # (id, bool) per doc, referenced three times (feature join, prior
    # aggregate, calibration join) — materialized once so a label
    # expression that is itself a corpus pass (e.g. the doc_quality
    # composite) is not recomputed per consumer
    labeled = cut_lineage(labeled, eager=True)
    rows = hashed_gram_rows(
        docs, text_col, id_col, n_buckets, use_bigrams, hash_fn
    ).join(labeled, "_id")
    counts = rows.groupBy("bucket").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("n_neg"),
    )
    # bucket counts are bounded by n_buckets; materialized once — the
    # totals collect below, the calibration pass, and every later
    # consumer of `weights` would otherwise re-run the train-corpus
    # gram explode + groupBy per reference (measured 3x per query)
    counts = cut_lineage(counts, eager=True)
    tot = counts.agg(
        F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn")
    ).collect()[0]
    dtot = labeled.agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("dp"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("dn"),
    ).collect()[0]
    import math

    tp = float(tot["tp"] or 0.0)
    tn = float(tot["tn"] or 0.0)
    denom_p = tp + alpha * n_buckets
    denom_n = tn + alpha * n_buckets
    weights = counts.select(
        "bucket",
        (
            F.log((F.col("n_pos") + F.lit(alpha)) / F.lit(denom_p))
            - F.log((F.col("n_neg") + F.lit(alpha)) / F.lit(denom_n))
        ).alias("w"),
    )
    stats = {
        "b0": math.log(float(dtot["dp"]) / float(dtot["dn"]))
        if dtot["dp"] and dtot["dn"]
        else 0.0,
        "w_default": math.log(alpha / denom_p) - math.log(alpha / denom_n),
        "threshold": 0.0,
        "n_buckets": n_buckets,
        "alpha": alpha,
        "use_bigrams": use_bigrams,
        "hash_fn": hash_fn,
        "text_col": text_col,
        "id_col": id_col,
    }
    if calibrate:
        # decision-threshold calibration (standard NB practice): the
        # raw 0 boundary is length-biased for multinomial NB — longer
        # documents accumulate more (mostly same-signed) per-gram
        # terms. Score the TRAINING set with the fitted weights and
        # put the boundary at the midpoint of the two class-mean
        # scores: one more corpus pass + a 2-scalar collect, still
        # closed form and SQL-replayable.
        # zero-gram documents are excluded from the class means: they
        # carry no feature evidence (score = b0 exactly), so including
        # them would only pull the means toward the prior — and the
        # oracle's per-gram GROUP BY can never see them, so exclusion
        # is also what keeps the two engines' thresholds identical
        train_scores = (
            nb_score(docs, weights, stats)
            .filter(F.col("n_grams") > 0)
            .join(labeled, [F.col(id_col) == F.col("_id")])
        )
        means = train_scores.agg(
            F.avg(F.when(F.col("_pos"), F.col("score"))).alias("mp"),
            F.avg(F.when(~F.col("_pos"), F.col("score"))).alias("mn"),
        ).collect()[0]
        if means["mp"] is not None and means["mn"] is not None:
            stats["threshold"] = round(
                (float(means["mp"]) + float(means["mn"])) / 2.0, 4
            )
    return weights, stats


def nb_score(docs: DataFrame, weights: DataFrame, stats: dict) -> DataFrame:
    """Score documents with a fitted model: per-doc
    ``score = b0 + Σ_occurrences w(bucket)`` with ``w_default`` for
    buckets unseen in training; ``pred = 1`` when the log-odds exceed
    the calibrated threshold. Zero-gram documents keep ``score = b0`` (restored by a
    left join — the explode drops them). Output: (id_col, n_grams,
    score, pred)."""
    id_col = stats["id_col"]
    rows = hashed_gram_rows(
        docs,
        stats["text_col"],
        id_col,
        stats["n_buckets"],
        stats["use_bigrams"],
        stats["hash_fn"],
    )
    w = (
        F.broadcast(weights)
        if stats["n_buckets"] <= _BROADCAST_MAX_BUCKETS
        else weights
    )
    per_doc = (
        rows.join(w, "bucket", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("w"), F.lit(stats["w_default"]))).alias("_sw"),
        )
    )
    score = F.round(F.lit(stats["b0"]) + F.coalesce(F.col("_sw"), F.lit(0.0)), 4)
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            score.alias("score"),
            # pred compares the ROUNDED score to the threshold: the raw
            # per-doc double sum is summation-order-dependent at the ulp
            # level (score is rounded to 4dp precisely to absorb this),
            # so deciding on the unrounded sum could flip pred near the
            # boundary between engines while score itself agrees
            (score > F.lit(stats.get("threshold", 0.0))).cast("int").alias("pred"),
        )
    )


def train_score_split(
    docs: DataFrame,
    label_col,
    mod: int = 2,
    **kwargs,
) -> DataFrame:
    """Convenience pipeline: fit on docs with ``id % mod == 0``, score
    the held-out rest — the honest generalization shape (self-scoring
    the training set overstates any classifier)."""
    id_col = kwargs.get("id_col", "doc_id")
    train = docs.filter(F.col(id_col) % mod == 0)
    test = docs.filter(F.col(id_col) % mod != 0)
    weights, stats = nb_train(train, label_col, **kwargs)
    return nb_score(test, weights, stats)


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 16,
    alpha: float = 0.5,
    use_bigrams: bool = True,
    hash_fn="portable",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    DSIR): score every document of the RAW corpus by how much it
    resembles a small TARGET exemplar corpus, using the log-ratio of
    the two corpora's hashed-n-gram distributions —
    ``w(b) = log p_target(b) − log p_raw(b)`` per bucket (Laplace-α
    smoothed), ``log_importance(doc) = Σ_occurrences w(bucket)``.
    The standard pretraining-data selection operator: resample raw
    documents with probability ∝ exp(log_importance) to shift the raw
    distribution toward the target domain.

    Same scale shape as the NB classifier (it IS the same estimator
    with corpora as classes and no prior): two explode →
    integer-key groupBy passes bounded by ``n_buckets``, a 2-scalar
    collect, one broadcast weight join — and the whole computation
    replays in ANSI SQL. Returns (id_col, n_grams, log_importance)
    for every raw document; zero-gram docs score 0."""
    from titan_spark.compute.checkpointing import cut_lineage

    rows_t = hashed_gram_rows(
        target, text_col, id_col, n_buckets, use_bigrams, hash_fn
    )
    # raw-corpus gram rows feed both the distribution estimate and the
    # per-doc scoring join — materialized once instead of re-running
    # the tokenize -> explode -> hash pass per consumer
    rows_r = cut_lineage(
        hashed_gram_rows(raw, text_col, id_col, n_buckets, use_bigrams, hash_fn),
        eager=True,
    )
    counts = (
        rows_t.select("bucket", F.lit(1).alias("_t"), F.lit(0).alias("_r"))
        .unionByName(
            rows_r.select("bucket", F.lit(0).alias("_t"), F.lit(1).alias("_r"))
        )
        .groupBy("bucket")
        .agg(F.sum("_t").alias("n_t"), F.sum("_r").alias("n_r"))
    )
    # bounded by n_buckets; the totals collect and the weights join
    # both read it
    counts = cut_lineage(counts, eager=True)
    tot = counts.agg(
        F.sum("n_t").alias("tt"), F.sum("n_r").alias("tr")
    ).collect()[0]
    import math

    denom_t = float(tot["tt"] or 0.0) + alpha * n_buckets
    denom_r = float(tot["tr"] or 0.0) + alpha * n_buckets
    w_default = math.log(alpha / denom_t) - math.log(alpha / denom_r)
    weights = counts.select(
        "bucket",
        (
            F.log((F.col("n_t") + F.lit(alpha)) / F.lit(denom_t))
            - F.log((F.col("n_r") + F.lit(alpha)) / F.lit(denom_r))
        ).alias("w"),
    )
    w = (
        F.broadcast(weights)
        if n_buckets <= _BROADCAST_MAX_BUCKETS
        else weights
    )
    per_doc = (
        rows_r.join(w, "bucket", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("w"), F.lit(w_default))).alias("_sw"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.round(F.coalesce(F.col("_sw"), F.lit(0.0)), 4).alias(
                "log_importance"
            ),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    seed: int = 0,
    **kwargs,
) -> DataFrame:
    """DSIR end to end: importance scores → weighted sample WITHOUT
    replacement of ``n`` raw documents with weight
    ``exp(log_importance)`` (Efraimidis-Spirakis via
    ``sampling.weighted_sample`` — deterministic, oracle-replayable).
    Log-importances are centered on their maximum before exp — a
    constant factor, which the WRS key comparison cancels, so the
    selection is unchanged while exp never overflows."""
    from titan_spark.pipeline.sampling import weighted_sample

    id_col = kwargs.get("id_col", "doc_id")
    scores = dsir_importance(raw, target, **kwargs)
    m = scores.agg(F.max("log_importance")).collect()[0][0] or 0.0
    weighted = raw.join(
        scores.select(
            id_col, F.exp(F.col("log_importance") - F.lit(float(m))).alias("_iw")
        ),
        id_col,
    )
    return weighted_sample(weighted, n, "_iw", id_col=id_col, seed=seed).drop(
        "_iw"
    )
