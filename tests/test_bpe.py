"""BPE tokenizer training closed-form contracts (pipeline/bpe.py)."""

from titan_spark.pipeline.bpe import EOW, bpe_segment, learn_bpe, word_frequencies


def test_learn_bpe_classic_example(spark):
    """Sennrich's worked corpus shape: 'low' x5, 'lower' x2 — the first
    merge must be the most frequent adjacent pair. Counts: every word
    contains l-o and o-w (7 each); 'low' ends w-_ (5), 'lower' has
    w-e, e-r, r-_ (2 each). Tie l-o vs o-w breaks lexicographically."""
    docs = [(1, "low low low low low lower lower")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges = learn_bpe(df, n_merges=3)
    assert merges[0] == ("l", "o", 7)
    # after merging 'lo': pairs lo-w (7) dominate
    assert merges[1] == ("lo", "w", 7)
    # then 'low'-_ (5) beats lower's tail pairs (2)
    assert merges[2] == ("low", EOW, 5)


def test_learn_bpe_deterministic_and_early_stop(spark):
    df = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    m1 = learn_bpe(df, n_merges=10)
    m2 = learn_bpe(df, n_merges=10)
    assert m1 == m2
    # 'ab' has pairs a-b, b-_ -> after 2 merges one symbol remains;
    # the loop stops before n_merges
    assert len(m1) <= 3


def test_bpe_segment_compression(spark):
    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest widest")], ["doc_id", "text"]
    )
    merges = learn_bpe(df, n_merges=8)
    seg = {r["doc_id"]: r for r in bpe_segment(df, merges).collect()}
    # segmentation never exceeds char+EOW count and shrinks with merges
    assert seg[1]["n_tokens"] == 3
    base1 = sum(len(w) + 1 for w in ["low", "low", "lower"])
    assert seg[1]["n_subwords"] < base1
    no_merge = {r["doc_id"]: r for r in bpe_segment(df, []).collect()}
    assert no_merge[1]["n_subwords"] == base1
