"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting.

All deterministic closed-form column expressions (JVM-side) so each is
oracle-checkable by re-expressing the identical formula in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from titan_spark.functions.text import tokenize

# fixed English stopword sample for the stopword-ratio feature
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token statistics: n_tokens, n_unique, avg token length.

    Tokenizer = the engine's Titan-contract tokenizer (lowercase, split
    on non-alphanumeric).
    """
    toks = tokenize(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
    )


def doc_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality features + a deterministic composite score.

    Features: length, token count, stopword ratio, non-alphanumeric
    (punctuation/space) ratio, unique-token ratio. The score is an
    explicit arithmetic blend — not a model — so it is reproducible
    anywhere, including the SQL oracle.
    """
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1))
    punct_ratio = (n_chars - n_alnum).cast("double") / F.greatest(n_chars, F.lit(1))
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(n_tok, F.lit(1))
    score = F.round(
        F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0)) * 0.4
        + uniq_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.2
        + stop_ratio * 0.1,
        4,
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(uniq_ratio, 4).alias("unique_ratio"),
        score.alias("quality_score"),
    )


# marker tokens per language for the n-gram language-ID heuristic;
# deterministic and intentionally simple (the reference has no langid —
# this is a pipeline-op addition, graded on plumbing + determinism).
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token language heuristic → (id, lang_pred, lang_hits).

    Scores each language by marker-token hits; ties break by language
    code order; zero hits → 'und'.
    """
    toks = tokenize(F.col(text_col))
    def _marker_pred(markers):
        # NB: must return a 1-arg lambda — pyspark higher-order fns
        # pass the array index to 2-arg lambdas, clobbering defaults
        return lambda t: t.isin(*markers)

    scores = [
        F.struct(
            (-F.size(F.filter(toks, _marker_pred(markers)))).alias("neg_hits"),
            F.lit(code).alias("code"),
        )
        for code, markers in sorted(_LANG_MARKERS.items())
    ]
    # ascending sort of (-hits, code): most hits first, ties by code order
    best = F.sort_array(F.array(*scores))[0]
    return df.select(
        F.col(id_col),
        F.when(best["neg_hits"] < 0, best["code"]).otherwise(F.lit("und")).alias("lang_pred"),
        (-best["neg_hits"]).alias("lang_hits"),
    )


# BPE-ish pre-tokenization: letter runs, digit runs, or single
# non-alphanumeric-non-space characters (the GPT-2 pre-tokenizer shape,
# simplified to a regex valid in both Java regex and RE2 for oracles)
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def bpe_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace+regex token count (the tokenizer-budget estimator):
    n_ws = whitespace-split tokens, n_bpe = BPE-ish pre-tokens."""
    ws = F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != F.lit("")))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0))
    return df.select(F.col(id_col), ws.alias("n_ws"), bpe.alias("n_bpe"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit content fingerprint (xxhash64 of the normalized token
    stream) — the rolling-hash document fingerprint."""
    toks = tokenize(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.xxhash64(F.concat_ws(" ", toks)).alias("fingerprint"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: fraction of tokens
    that are the single most-frequent token, duplicate-bigram fraction,
    and top-bigram fraction (Rae et al. 2021, "Scaling Language Models"
    §A1.1 repetition filters, restated token-level because the synthetic
    corpus has no line structure).

    Plan shape: bigrams come from one ``zip_with`` against the shifted
    token tail (tokenizer evaluated once per row — an index-based
    ``transform(sequence, i -> slice(...))`` re-runs it per element),
    then two explode → count pipelines keyed (doc, term) and (doc);
    every aggregate is map-side combinable, so the shuffles carry one
    row per distinct term per doc, never the corpus text.
    """
    toks = tokenize(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_grams",
        # zip_with pads the shorter (shifted) side with NULL; concat
        # propagates it so the trailing partial gram drops in the filter
        F.filter(
            F.zip_with(
                F.col("_toks"),
                F.slice(F.col("_toks"), 2, F.greatest(F.size("_toks") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            lambda g: g.isNotNull(),
        ),
    )
    tok_agg = (
        base.select(id_col, F.explode("_toks").alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.sum("_c").alias("_nt"), F.max("_c").alias("_maxt"))
    )
    gram_agg = (
        base.select(id_col, F.explode("_grams").alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("_n2"),
            F.count(F.lit(1)).alias("_d2"),
            F.max("_c").alias("_max2"),
        )
    )

    def _frac(num, den):
        return F.round(
            F.coalesce(num.cast("double") / den, F.lit(0.0)), 4
        )

    return (
        df.select(id_col)
        .join(tok_agg, id_col, "left")
        .join(gram_agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_nt"), F.lit(0)).cast("bigint").alias("n_tokens"),
            _frac(F.col("_maxt"), F.col("_nt")).alias("top_token_frac"),
            _frac(F.col("_n2") - F.col("_d2"), F.col("_n2")).alias("dup_2gram_frac"),
            _frac(F.col("_max2"), F.col("_n2")).alias("top_2gram_frac"),
        )
    )


def quality_funnel(
    df: DataFrame,
    min_tokens: int = 20,
    max_dup_2gram: float = 0.05,
    min_quality: float = 0.55,
    lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style filter funnel: the standard corpus-cleaning cascade
    (length → repetition → quality score → language), reported as one
    row of cumulative survivor counts so each stage's cost is visible.

    Every stage compares the ROUNDED feature the component operators
    emit, so the funnel is bit-reproducible wherever they are. The
    three feature frames join on the doc id (hash joins, broadcast
    under AQE when small); no stage rescans document text after its
    feature pass.
    """
    q = doc_quality(df, text_col, id_col).select(id_col, "quality_score")
    r = repetition_stats(df, text_col, id_col).select(id_col, "n_tokens", "dup_2gram_frac")
    lg = lang_id(df, text_col, id_col).select(id_col, "lang_pred")
    j = r.join(q, id_col).join(lg, id_col)
    f1 = F.col("n_tokens") >= min_tokens
    f2 = f1 & (F.col("dup_2gram_frac") <= max_dup_2gram)
    f3 = f2 & (F.col("quality_score") >= min_quality)
    f4 = f3 & (F.col("lang_pred") == lang)
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(f1.cast("int")).cast("bigint").alias("n_pass_length"),
        F.sum(f2.cast("int")).cast("bigint").alias("n_pass_repetition"),
        F.sum(f3.cast("int")).cast("bigint").alias("n_pass_quality"),
        F.sum(f4.cast("int")).cast("bigint").alias("n_pass_lang"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by smoothed tf-idf.

    tf = term count within the doc; idf = ln(N / df_t) with natural log
    and raw document frequency (deterministic closed form, no fitted
    vocabulary). Ties break on the term string ascending.

    Plan shape: explode → two hash aggregations (term×doc, term) → one
    join on term → per-doc window top-k. The doc-frequency table is
    |vocab| rows; over an open-vocabulary web corpus that can be
    billions of distinct terms (ids, typos, urls), so the join is NOT
    force-broadcast — AQE converts it to a broadcast join at runtime
    when the vocabulary actually fits, and falls back to a shuffle join
    when it doesn't. The only big shuffles are the two partial
    aggregations, both map-side combinable.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    terms = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    # rank on the ROUNDED score: both engines order identical rounded
    # doubles, so a 1-ulp libm difference can't flip a rank
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")), 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, "term", "tfidf", F.col("_rn").cast("int").alias("rank"))
    )


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_smooth: float = 0.5,
) -> DataFrame:
    """CCNet-style corpus-LM perplexity scoring with head/middle/tail
    buckets (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data", LREC 2020).

    Trains an add-k-smoothed unigram LM on the corpus itself (one
    aggregation), scores every document by its mean token negative
    log-likelihood, and buckets the corpus into perplexity terciles —
    the split CCNet uses to select "head" (most-fluent) training data.
    The LM is a deterministic closed form (no fitted artifact), so the
    whole operator re-expresses in ANSI SQL for the oracle.

    p(t) = (c(t) + k) / (N + k * (V + 1))   [add-k over corpus counts]
    nll(doc) = avg over tokens of -ln p(t);  ppl = exp(nll)

    Plan shape at scale: explode → one map-side-combinable unigram agg
    (|vocab| rows) → token⋈count join (the inverted-index shape; hot
    stopword keys are exactly what AQE skew-split handles) → per-doc
    agg. The N/V totals and the two tercile cutoffs are single-row
    aggregates cross-joined back (broadcast of one row) — no driver
    collect in the plan. Everything is corpus-linear; nothing is n².

    The cutoffs use EXACT ``percentile`` (sort-based buffer per
    partial) so the DuckDB oracle reproduces them bit-for-bit; that
    buffer is fine to ~10⁸ docs per executor but at full 100-TB corpus
    scale swap ``F.percentile`` for ``F.approx_percentile`` (t-digest,
    bounded memory) — the bucketing contract is unchanged, the
    boundaries become approximate, and the oracle then checks
    ppl/nll only.
    """
    terms = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term"))
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    # nll is rounded BEFORE exp so both engines exponentiate identical
    # doubles (same trick as the tfidf rank-on-rounded-score contract)
    doc = (
        terms.join(counts, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(
                F.avg(
                    -F.log(
                        (F.col("c") + F.lit(k_smooth))
                        / (F.col("n_total") + F.lit(k_smooth) * (F.col("v_size") + 1.0))
                    )
                ),
                4,
            ).alias("nll"),
        )
    )
    scored = doc.select(
        id_col, "n_tokens", "nll", F.round(F.exp(F.col("nll")), 2).alias("ppl")
    )
    cuts = scored.agg(
        F.round(F.percentile("ppl", F.lit(1.0 / 3)), 4).alias("c1"),
        F.round(F.percentile("ppl", F.lit(2.0 / 3)), 4).alias("c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "n_tokens",
        "nll",
        "ppl",
        F.when(F.col("ppl") <= F.col("c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def lm_perplexity_bigram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_smooth: float = 0.5,
    lam: float = 0.75,
) -> DataFrame:
    """Bigram corpus-LM perplexity with unigram-backoff interpolation
    (r10 — the CCNet/KenLM scoring shape upgraded from
    :func:`lm_perplexity`'s unigram model; Wenzek et al. 2020 score
    with a 5-gram KenLM, and interpolation-with-backoff is the
    standard n-gram smoothing family, Jelinek-Mercer form).

    Why it exists: a unigram LM cannot separate fluent text from the
    same words shuffled — both have identical unigram distributions
    and therefore identical unigram perplexity. The bigram term scores
    word ORDER:

        p(w2 | w1) = lam  * (c(w1 w2) + k) / (ctx(w1) + k * (V + 1))
                   + (1-lam) * (c(w2) + k) / (N      + k * (V + 1))

    with ``ctx(w1)`` = occurrences of w1 as a bigram context (i.e. in
    non-final position), and N/V the corpus token total / vocabulary
    size shared with the unigram operator. ``nll(doc)`` averages
    ``-ln p`` over the document's bigram positions (rounded to 4dp
    BEFORE exp, the cross-engine contract every scoring operator here
    uses); ``ppl = exp(nll)``. Defaults ``k = 0.5``/``lam = 0.75`` are
    exactly representable doubles so both engines interpolate
    identical values. Corpus statistics train on the WHOLE corpus;
    documents with fewer than 2 tokens have no bigram positions and
    are omitted (same inner-join contract as the unigram operator's
    empty docs).

    Plan shape at scale: the token stream explodes once into bigram
    pairs built by ``zip_with`` over shifted slices (no self-join on
    position); THREE map-side-combinable aggs (unigram counts, bigram
    counts, context counts — each bounded by vocabulary, not corpus,
    size) then the inverted-index joins gram⋈count on (w1,w2) / w1 /
    w2 — hot stopword keys are exactly what AQE skew-split handles —
    and one per-doc agg. The N/V totals broadcast as one row.
    Everything is corpus-linear; nothing is n².

    Reference parity: the same external-scoring surface note as
    :func:`lm_perplexity` (the reference delegates document scoring to
    its index provider; this engine computes it as a first-class
    distributed operator)."""
    toks = tokenize(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_t"))
    # corpus unigram statistics over ALL documents (shared with the
    # unigram LM: same N, V, counts)
    uni = base.select(F.col(id_col), F.explode("_t").alias("w"))
    cnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = cnt.agg(
        F.sum("c").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    # bigram position stream: (doc, w1, w2) per adjacent pair
    n = F.size("_t")
    pairs = F.zip_with(
        F.slice("_t", 1, n - 1),
        F.slice("_t", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        base.filter(n >= 2)
        .select(F.col(id_col), n.alias("n_tokens"), F.explode(pairs).alias("p"))
        .select(id_col, "n_tokens", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bcnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    ctx = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("cc"))
    k = F.lit(k_smooth)
    smooth_v = k * (F.col("v_size") + 1.0)
    p = F.lit(lam) * (F.col("bc") + k) / (F.col("cc") + smooth_v) + F.lit(
        1.0 - lam
    ) * (F.col("c") + k) / (F.col("n_total") + smooth_v)
    doc = (
        bg.join(bcnt, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cnt, F.col("w2") == F.col("w"))
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col, "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 4).alias("nll"),
        )
    )
    return doc.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "n_bigrams",
        "nll",
        F.round(F.exp(F.col("nll")), 2).alias("ppl"),
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from
    Web Crawl Data"): documents are scored by the corpus bigram LM
    (:func:`lm_perplexity_bigram`) and split WITHIN each language into
    equal-frequency perplexity buckets — head/middle/tail for the
    CCNet default of 3. Per-language is the point: perplexity scales
    are not comparable across languages, which is why CCNet computes
    its thresholds per language shard. 'head' = the lowest-perplexity
    (most fluent) third, 'tail' the highest; downstream recipes train
    on head+middle or reweight by bucket. Ranking orders by the
    2dp-rounded ppl with doc id as tie-break so both engines bucket
    identically; docs with < 2 tokens have no LM score and are absent,
    inheriting the scorer's contract.

    Returns (id_col, lang, ppl, bucket).

    Plan shape at scale: scoring is corpus-linear
    (lm_perplexity_bigram); bucketing adds ONE window function
    partitioned by language — a per-language sort is the same cost
    CCNet itself pays sorting each language shard by perplexity. The
    lang join projects two columns of the input scan, never text.
    """
    from pyspark.sql import Window

    scored = lm_perplexity_bigram(df, text_col, id_col)
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    w = Window.partitionBy("lang").orderBy("ppl", id_col)
    t = scored.join(langs, id_col).withColumn(
        "_q", F.ntile(n_buckets).over(w)
    )
    if n_buckets == 3:
        bucket = F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), F.col("_q")
        )
    else:
        bucket = F.concat(F.lit("b"), F.col("_q").cast("string"))
    return t.select(id_col, "lang", "ppl", bucket.alias("bucket"))


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al., "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher", 2021, §A1.1):
    the standard pre-training document filter — word-count bounds,
    mean word length, symbol-to-word ratio (# and ellipsis), bullet-
    and ellipsis-line ratios, alphabetic-word ratio, and stop-word
    presence. Defaults are the published thresholds; every feature is
    emitted alongside ``keep`` so downstream mixes can re-threshold
    without a rescan.

    Pure JVM column algebra over one scan (words = whitespace split,
    lines = newline split) — no UDF, no shuffle; reproducible in the
    SQL oracle.
    """
    txt = F.col(text_col)
    words = F.filter(F.split(txt, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    safe_words = F.greatest(n_words, F.lit(1))
    word_chars = F.length(F.regexp_replace(txt, r"\s+", ""))
    mean_wl = word_chars.cast("double") / safe_words
    n_hash = F.length(txt) - F.length(F.regexp_replace(txt, "#", ""))
    n_ellipsis = (
        F.length(txt) - F.length(F.regexp_replace(txt, r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / safe_words
    lines = F.filter(F.split(txt, "\n"), lambda l: F.trim(l) != F.lit(""))
    safe_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    n_ell_line = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$")))
    bullet_ratio = n_bullet.cast("double") / safe_lines
    ellipsis_ratio = n_ell_line.cast("double") / safe_lines
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_ratio = n_alpha.cast("double") / safe_words
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.array_intersect(lower_words, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_ratio <= max_bullet_ratio)
        & (ellipsis_ratio <= max_ellipsis_ratio)
        & (alpha_ratio >= min_alpha_ratio)
        & (stop_hits >= min_stop_hits)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_ratio, 4).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 4).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        keep.cast("int").alias("keep"),
    )


def kneser_ney_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney trigram perplexity (Kneser & Ney 1995;
    Chen & Goodman 1998 §2.7 — the smoothing family KenLM implements
    and CCNet scores with). The step past Jelinek-Mercer
    (:func:`lm_perplexity_bigram`): lower-order distributions use
    CONTINUATION counts (in how many distinct contexts does a word
    appear) rather than raw frequency, so "francisco" — frequent but
    only ever after "san" — scores low as a novel continuation, which
    additive/interpolation smoothing gets wrong.

        P(w3|w1w2) = max(c3−D,0)/ctx2 + D·N1+(w1w2·)/ctx2 · P(w3|w2)
        P(w3|w2)   = max(N1+(·w2w3)−D,0)/N1+(·w2·)
                     + D·N1+(w2·)/N1+(·w2·) · Pcont(w3)
        Pcont(w3)  = N1+(·w3) / N1+(··)

    All statistics derive from ONE trigram type table (the
    self-consistent convention): ctx2 = trigram-position count of the
    context, N1+ counts are distinct-continuation/-context counts
    over trigram types, and the adjacent (w2,w3) type pairs supply the
    continuation-unigram numerators/denominator. The model trains on
    the scored corpus itself, so every scored position has c3 ≥ 1 and
    no probability is zero. ``D = 0.75`` (the Chen-Goodman near-
    optimal constant) is exactly representable, so both engines
    discount identical doubles; ``nll`` rounds to 4dp BEFORE exp, the
    cross-engine contract every scoring operator here uses. Documents
    with fewer than 3 tokens have no trigram positions and are
    omitted (the n-gram operators' shared inner-join contract).

    Plan shape at scale: the token stream explodes ONCE into trigram
    positions via zip_with over three shifted slices (no positional
    self-join); every statistic is a map-side-combinable agg over the
    TYPE table, bounded by distinct-trigram count, never corpus size;
    scoring joins position⋈stats on (w1,w2,w3)/(w1,w2)/(w2,w3)/w2/w3
    — hot stopword keys are the AQE skew-split case — plus one
    broadcast one-row total. Everything is corpus-linear; nothing
    is n².

    Reference parity: the reference delegates document scoring to its
    external index provider (SURVEY §2 S7/S8 surface); this engine
    computes LM scoring as a first-class distributed operator.
    """
    D = F.lit(float(discount))
    toks = tokenize(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_t")).filter(
        F.size("_t") >= 3
    )
    n = F.size("_t")
    inner = F.zip_with(
        F.slice("_t", 2, n - 2),
        F.slice("_t", 3, n - 2),
        lambda b, c: F.struct(b.alias("w2"), c.alias("w3")),
    )
    tri3 = F.zip_with(
        F.slice("_t", 1, n - 2),
        inner,
        lambda a, bc: F.struct(
            a.alias("w1"), bc["w2"].alias("w2"), bc["w3"].alias("w3")
        ),
    )
    pos = base.select(
        F.col(id_col), n.alias("n_tokens"), F.explode(tri3).alias("g")
    ).select(
        id_col,
        "n_tokens",
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
        F.col("g.w3").alias("w3"),
    )
    from titan_spark.compute.checkpointing import cut_lineage

    # the tokenize -> zip_with trigram explode is the corpus-scan
    # stage; materialize it ONCE — without the cut the type-table agg
    # and the scoring join each recompute it, and the type table's
    # seven consumers multiply that out to ~8 corpus passes
    pos = cut_lineage(pos, eager=False)
    # ONE type table; every KN statistic below is an agg over it —
    # materialized once (bounded by distinct-trigram count) so its
    # seven consumers read instead of re-aggregating
    types = pos.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c3")
    )
    types = cut_lineage(types, eager=False)
    ctx2 = types.groupBy("w1", "w2").agg(
        F.sum("c3").cast("double").alias("cc2"),
        F.count(F.lit(1)).cast("double").alias("t12"),  # N1+(w1 w2 ·)
    )
    left3 = types.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("double").alias("n_l")  # N1+(· w2 w3)
    )
    mid = types.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("n_mid")  # N1+(· w2 ·)
    )
    # the distinct (w2, w3) type-pair relation feeds three statistics —
    # computed once instead of three distinct passes over the type table
    bt = cut_lineage(types.select("w2", "w3").distinct(), eager=False)
    fwd2 = bt.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("t2")  # N1+(w2 ·)
    )
    cont1 = bt.groupBy("w3").agg(
        F.count(F.lit(1)).cast("double").alias("n_r")  # N1+(· w3)
    )
    total_b = bt.agg(
        F.count(F.lit(1)).cast("double").alias("n_bb")  # N1+(· ·)
    )
    p1 = F.col("n_r") / F.col("n_bb")
    p2 = (
        F.greatest(F.col("n_l") - D, F.lit(0.0)) / F.col("n_mid")
        + D * F.col("t2") / F.col("n_mid") * p1
    )
    p3 = (
        F.greatest(F.col("c3").cast("double") - D, F.lit(0.0)) / F.col("cc2")
        + D * F.col("t12") / F.col("cc2") * p2
    )
    doc = (
        pos.join(types, ["w1", "w2", "w3"])
        .join(ctx2, ["w1", "w2"])
        .join(left3, ["w2", "w3"])
        .join(mid, "w2")
        .join(fwd2, "w2")
        .join(cont1, "w3")
        .crossJoin(F.broadcast(total_b))
        .groupBy(id_col, "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_trigrams"),
            F.round(F.avg(-F.log(p3)), 4).alias("nll"),
        )
    )
    return doc.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "n_trigrams",
        "nll",
        F.round(F.exp(F.col("nll")), 2).alias("ppl"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "portable",
) -> DataFrame:
    """Per-doc cross-corpus n-gram novelty — the memorization-analysis
    statistic of Lee et al. 2022 §6 ("Deduplicating Training Data
    Makes Language Models Better"): for each document, the fraction of
    its DISTINCT word n-grams that occur in no other document.
    Documents full of corpus-repeated passages (boilerplate, templated
    spam, near-dups that slipped the dedup net) score near 0; genuinely
    novel text scores near 1 — the standard diagnostic for residual
    duplication and for ranking what a model is most likely to
    memorize verbatim.

    Returns (id, n_grams, novel_grams, novelty) with
    novelty = novel_grams / n_grams rounded to 4.

    Scale shape: shingles are hashed to 64-bit BEFORE the shuffle, so
    the corpus-wide document-frequency groupBy and the join back to
    per-doc grams both carry (hash, id) pairs — gram TEXT never leaves
    its scan partition. Doc-frequency is count-per-hash over per-doc
    distinct grams (one map-side-combinable agg); the join is
    hash-keyed and skew-light (a gram shared by millions of docs
    contributes one docfreq row). ``hash_fn='portable'`` (default)
    makes every count bit-replayable by the DuckDB oracle;
    ``'xxhash64'`` is the cheaper production hash.
    """
    from titan_spark.functions.hashing import resolve_hash_fn
    from titan_spark.pipeline.dedup import shingles

    from titan_spark.compute.checkpointing import cut_lineage

    h = resolve_hash_fn(hash_fn)
    g = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("_g"),
    ).select(F.col(id_col), h(F.col("_g")).alias("_h"))
    # materialized ONCE: the (id, hash) gram stream feeds both the
    # doc-frequency aggregate and the join back — without the cut the
    # tokenize -> n-gram explode -> hash pass (the expensive stage)
    # runs twice per query (the two consumers' exchanges differ, so
    # ReuseExchange cannot dedupe them). Above ~1M docs the gram
    # stream (|tokens| 16-byte rows per doc) routes through the
    # parquet spill instead of pinning multi-GB localCheckpoint
    # blocks (r12, ADVICE r11; the doc count is a metadata-cheap
    # count over the source table)
    big = df.count() > 1_000_000
    g = cut_lineage(g, eager=True, round_idx=(0 if big else None), spill_period=1)
    docfreq = g.groupBy("_h").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    return (
        g.join(docfreq, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("long")).alias("novel_grams"),
        )
        .select(
            id_col,
            "n_grams",
            "novel_grams",
            F.round(F.col("novel_grams") / F.col("n_grams"), 4).alias(
                "novelty"
            ),
        )
    )
