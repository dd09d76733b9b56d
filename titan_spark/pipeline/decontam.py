"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/holdout set.

The standard pre-training hygiene pass (GPT-3 App. C / PaLM §7 style):
any training doc containing an n-gram that also occurs in the eval set
is contaminated and gets down-weighted or dropped. Expressed as pure
DataFrame algebra: shingle both sides with the engine's tokenizer,
broadcast the (small) eval n-gram set, count distinct colliding grams
per training doc.

Scale shape: the eval set is benchmark-sized (thousands of docs) no
matter how big the corpus is, so its distinct-gram set broadcasts and
the training side stays a narrow scan → explode → broadcast hash join
→ one map-side-combinable count keyed by doc id. No shuffle ever
carries document text; nothing is O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from titan_spark.compute.checkpointing import cut_lineage
from titan_spark.pipeline.dedup import shingles


def ngram_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_grams: int = 5_000_000,
) -> DataFrame:
    """(id, n_hit_grams) for every training doc sharing ≥1 word n-gram
    with the eval set. ``n_hit_grams`` counts the doc's *distinct*
    contaminated grams (shingles are per-doc distinct).

    Docs shorter than ``n`` tokens contribute their whole token stream
    as one shingle (the :func:`~titan_spark.pipeline.dedup.shingles`
    contract), so short eval probes still match verbatim copies.

    Broadcast guard (VERDICT r3 #8): the eval-gram set is usually
    benchmark-sized and broadcasts, but the contract is only "smaller
    than the corpus" — a caller decontaminating against a huge holdout
    must not OOM the driver on a forced broadcast. The distinct gram
    set is materialized once (it is read twice anyway: count + join);
    above ``max_broadcast_grams`` the hint is dropped and the join
    shuffles on the gram key instead.
    """
    eval_grams = cut_lineage(
        eval_df.select(F.explode(shingles(F.col(text_col), n)).alias("_g")).distinct(),
        eager=True,
    )
    small = eval_grams.count() <= max_broadcast_grams
    right = F.broadcast(eval_grams) if small else eval_grams
    return (
        train_df.select(F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("_g"))
        .join(right, "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit_grams"))
    )


def hash_eval_split(
    df: DataFrame, mod: int = 20, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, eval) split on the portable 60-bit hash of
    the id — the same h60 used by the sampling operators, so the split
    is reproducible in any engine (``hash % mod == 0`` → eval)."""
    from titan_spark.functions.hashing import portable_hash64

    is_eval = F.pmod(portable_hash64(F.col(id_col).cast("string")), F.lit(mod)) == 0
    return df.filter(~is_eval), df.filter(is_eval)


def bloom_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 3,
    hash_fn="portable",
    max_broadcast_bits: int = 64_000_000,
) -> DataFrame:
    """(id, n_hit_grams) like :func:`ngram_decontaminate`, probing a
    Bloom filter of the eval n-grams instead of the gram set itself.

    Why the sketch variant exists: the exact path broadcasts the eval
    DISTINCT-GRAM strings — fine for benchmark-sized holdouts, but a
    large blocklist (every eval suite + licensed-content fingerprints)
    can reach billions of grams, and above the broadcast guard the
    exact join degrades to shuffling every document's grams by string
    key. The Bloom side is bounded by ``m_bits`` rows of longs no
    matter how many grams went in, always broadcasts, and the train
    side ships (gram-hash positions, doc id) — never gram text. The
    price is a documented false-positive rate ≈ (1 − e^(−k·n/m))^k:
    hits overcount slightly, never undercount (no false negatives), so
    a Bloom pre-screen keeps every truly contaminated doc and an exact
    pass over the (small) flagged survivors removes the FPs when
    exactness matters.

    With ``hash_fn='portable'`` both engines compute the identical
    filter — including its false positives — so the whole sketch path
    is value-checkable against the SQL oracle, not just row-counted.
    """
    from titan_spark.pipeline.sketches import _bloom_positions, bloom_build

    eval_grams = eval_df.select(
        F.explode(shingles(F.col(text_col), n)).alias("_g")
    )
    bloom = cut_lineage(
        bloom_build(eval_grams, "_g", m_bits=m_bits, k=k, hash_fn=hash_fn),
        eager=True,
    )
    # the set-bit table is bounded by m_bits, but force-broadcasting a
    # filter built with a very large m would OOM the driver the same
    # way a huge gram set would in the exact path — above the guard the
    # hint drops and the position join shuffles (AQE may still choose
    # broadcast from the measured size)
    right = F.broadcast(bloom) if m_bits <= max_broadcast_bits else bloom
    pos = _bloom_positions(F.col("_g"), m_bits, k, hash_fn)
    # grams are identified by their slot in the per-doc distinct shingle
    # array (posexplode index), so the all-k count groups on two integer
    # keys — gram TEXT never leaves the scan stage; only (doc id, slot,
    # bit position) triples reach the join and aggregates
    train_pos = train_df.select(
        F.col(id_col), F.posexplode(shingles(F.col(text_col), n)).alias("_gi", "_g")
    ).select(id_col, "_gi", F.explode(pos).alias("pos"))
    return (
        train_pos.join(right, "pos")
        .groupBy(id_col, "_gi")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit_grams"))
    )


def containment_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_grams: int = 5_000_000,
) -> DataFrame:
    """Pair-wise n-gram CONTAINMENT decontamination — the GPT-3
    App. C / The-Pile rule, one level stricter than the per-train-doc
    gram counts of :func:`ngram_decontaminate`: a training doc is
    contaminated BY a specific eval doc when it contains at least
    ``threshold`` of that eval doc's distinct n-grams,
    C(t, e) = |G_t ∩ G_e| / |G_e|. Containment is asymmetric (a short
    benchmark question fully embedded in a long web page scores 1.0
    where Jaccard would round to 0), which is exactly why eval-leakage
    checks use it instead of the symmetric dedup similarity.

    Returns one row per flagged (train, eval) pair:
    (id, eval_doc_id, n_shared, n_eval_grams, containment ROUND 4).

    Scale shape: the eval side is benchmark-sized regardless of corpus
    size, so its exploded (gram, eval id) relation broadcasts (same
    ``max_broadcast_grams`` guard as ngram_decontaminate — above it
    the join falls back to a gram-keyed shuffle); the training side
    stays a narrow scan → explode → broadcast hash join. The per-pair
    intersection count groups on (train id, eval id) — both sides'
    shingles are per-doc distinct, so plain count(*) IS |G_t ∩ G_e| —
    and the tiny per-eval gram totals broadcast-join onto the flagged
    pairs. Nothing is O(corpus²) and no shuffle carries document text.
    """
    ev = cut_lineage(
        eval_df.select(
            F.col(id_col).alias("_eid"),
            F.explode(shingles(F.col(text_col), n)).alias("_g"),
        ),
        eager=True,
    )
    small = ev.count() <= max_broadcast_grams
    right = F.broadcast(ev) if small else ev
    evn = ev.groupBy("_eid").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_grams")
    )
    pairs = (
        train_df.select(
            F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("_g")
        )
        .join(right, "_g")
        .groupBy(id_col, "_eid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        pairs.join(F.broadcast(evn), "_eid")
        .filter(F.col("n_shared") / F.col("n_eval_grams") >= threshold)
        .select(
            id_col,
            F.col("_eid").alias("eval_doc_id"),
            "n_shared",
            "n_eval_grams",
            F.round(F.col("n_shared") / F.col("n_eval_grams"), 4).alias(
                "containment"
            ),
        )
    )
