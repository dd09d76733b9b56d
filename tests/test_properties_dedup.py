"""Property-based verification of the dedup-family recall guarantees.

The scale design rests on two exactness claims that deserve adversarial
inputs, not just fixtures:

- prefix filtering (PPJoin) emits EVERY pair with Jaccard >= t
  (recall 1.0), so candidate-restricted verification equals all-pairs;
- the SimHash banded pigeonhole join emits EVERY pair within the
  hamming radius.

Hypothesis generates small corpora from a tiny vocabulary (maximizing
collisions — the adversarial regime for both algorithms) and compares
against brute force computed in Python from the same tokenizer contract.
"""

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from titan_spark.pipeline.dedup import (
    jaccard_pairs,
    prefix_filter_candidates,
    simhash_dup_pairs,
)

VOCAB = ["a", "b", "c", "dd", "ee"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=10,
)


def _py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_shingles(text, n=3):
    toks = _py_tokens(text)
    if not toks:
        return {""}
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_prefix_filter_recall_is_exact(spark, texts):
    t = 0.5
    rows = [(i, s) for i, s in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    cands = prefix_filter_candidates(d, t)
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(d, cands).filter(F.col("jaccard") >= t).collect()
    }
    # brute force over all pairs with the same shingle contract
    want = set()
    sh = {i: _py_shingles(s) for i, s in rows}
    for i, _ in rows:
        for j, _ in rows:
            if i < j:
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j]) or 1
                if inter / union >= t:
                    want.add((i, j))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_simhash_banding_recall_within_radius(spark, texts):
    from titan_spark.pipeline.dedup import simhash

    rows = [(i, s) for i, s in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(d).collect()}
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dup_pairs(d, max_hamming=3).collect()
    }
    want = {}
    ids = sorted(sigs)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin(sigs[i] ^ sigs[j]).count("1")
                if h <= 3:
                    want[(i, j)] = h
    assert got == want


def test_line_dedup_keeps_first_occurrence_and_reassembles(spark):
    from titan_spark.pipeline.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            # doc 1 defines lines A, B; B repeats inside the same doc
            (1, "alpha alpha\nbravo bravo\nbravo bravo"),
            # doc 2 repeats A (dropped), adds C
            (2, "alpha alpha\ncharlie charlie"),
            # doc 3 is entirely duplicates -> no surviving lines
            (3, "bravo bravo\nalpha alpha"),
            # doc 4 empty -> contributes nothing
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1]["text"] == "alpha alpha\nbravo bravo" and out[1]["kept_lines"] == 2
    assert out[2]["text"] == "charlie charlie" and out[2]["kept_lines"] == 1


def test_line_dedup_token_mode_windows(spark):
    from titan_spark.pipeline.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # windows (k=3): "a b c", "d e f"
            (2, "a b c x"),       # "a b c" duplicate of doc1 pos0; "x" kept
            (3, "d e f"),         # fully duplicate -> dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           line_dedup(docs, mode="tokens", tokens_per_line=3).collect()}
    assert set(out) == {1, 2}
    assert out[1]["text"] == "a b c d e f"
    assert out[2]["text"] == "x" and out[2]["kept_lines"] == 1


def test_repeated_passage_stats(spark):
    """Windowed exact-substring dedup: a passage repeated verbatim in
    two docs marks both docs' overlapping windows; a unique doc scores
    0; short docs clamp to one whole-doc window."""
    from titan_spark.pipeline.dedup import repeated_passage_stats

    boiler = "this license text is repeated verbatim across many documents word for word"
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, boiler + " one two three four five six seven eight nine"),
            (3, "a completely unique document about distributed query engines and parquet"),
            (4, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in repeated_passage_stats(docs, window=5, min_docs=2).collect()
    }
    assert out[1]["n_repeated"] > 0 and out[2]["n_repeated"] > 0
    assert out[3]["n_repeated"] == 0
    # the shared 12-token prefix yields 8 shared 5-windows in each doc
    assert out[1]["n_repeated"] == out[2]["n_repeated"] == 8
    # short doc: one whole-doc window, unique
    assert out[4]["n_windows"] == 1 and out[4]["n_repeated"] == 0
    assert abs(out[3]["repeat_frac"]) < 1e-9


def test_boilerplate_passage_removal_boundaries(spark):
    """The Lee et al. removal transform's edges: passages within the
    distinct-doc threshold keep ALL occurrences (including within-doc
    repeats — one doc is one distinct doc however often it repeats
    itself); boilerplate keeps only the corpus-first (id, pos)
    occurrence; fully-boilerplate documents disappear; short docs are
    one whole-doc passage."""
    from pyspark.sql import functions as F

    from titan_spark.pipeline.dedup import boilerplate_passage_removal

    w = 3  # 3-token passages
    boiler = "common header block"      # appears in docs 1,2,3 -> boilerplate
    own = "unique body content"         # per-doc unique middle
    selfrep = "self repeat line"        # twice in doc 4 ONLY -> kept both
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma"),
            (2, f"{boiler} delta epsilon zeta"),
            (3, boiler),                 # fully boilerplate -> vanishes
            (4, f"{selfrep} {own} {selfrep}"),
            (5, "tiny"),                 # < window tokens -> one passage
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_passage_removal(
            docs, window=w, max_docs=1
        ).collect()
    }
    # doc 1 is the corpus-first occurrence of the boilerplate passage
    assert out[1]["text"] == f"{boiler} alpha beta gamma"
    assert out[1]["n_passages"] == 2 and out[1]["kept_passages"] == 2
    # docs 2's copy is cut; its own content survives
    assert out[2]["text"] == "delta epsilon zeta"
    assert out[2]["n_passages"] == 2 and out[2]["kept_passages"] == 1
    # doc 3 was nothing but boilerplate
    assert 3 not in out
    # doc 4's self-repeat is NOT cross-doc boilerplate: both copies stay
    assert out[4]["text"] == f"{selfrep} {own} {selfrep}"
    assert out[4]["kept_passages"] == 3
    # doc 5: single whole-doc passage, untouched
    assert out[5]["text"] == "tiny" and out[5]["n_passages"] == 1

    # raising the threshold above the repetition degree disables removal
    full = boilerplate_passage_removal(docs, window=w, max_docs=3)
    assert full.agg(F.sum("kept_passages")).collect()[0][0] == \
        full.agg(F.sum("n_passages")).collect()[0][0]


def test_boilerplate_passage_removal_delimiter_mode(spark):
    """Delimiter segmentation: line-structured corpora cut on real
    line boundaries and reassemble with the same separator."""
    from titan_spark.pipeline.dedup import boilerplate_passage_removal

    docs = spark.createDataFrame(
        [
            (1, "copyright notice\nreal content one"),
            (2, "copyright notice\nreal content two"),
            (3, "copyright notice\nreal content three"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in boilerplate_passage_removal(
            docs, mode="delimiter", delimiter="\n", max_docs=1
        ).collect()
    }
    assert out[1] == "copyright notice\nreal content one"
    assert out[2] == "real content two"
    assert out[3] == "real content three"


def _py_passages(text, k):
    toks = _py_tokens(text)
    n_lines = max(-(-len(toks) // k), 1)
    segs = [" ".join(toks[i * k : i * k + k]) for i in range(n_lines)]
    return [s for s in segs if s]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy, st.integers(min_value=1, max_value=3))
def test_boilerplate_removal_matches_brute_force(spark, texts, max_docs):
    """Adversarial corpora from a tiny vocabulary (maximal passage
    collisions): the Spark transform equals a brute-force Python
    implementation of the same contract — passages in > max_docs
    distinct docs keep only the corpus-first (id, pos) occurrence,
    everything else keeps all occurrences, docs reassemble in passage
    order, fully-cut docs disappear."""
    from titan_spark.pipeline.dedup import boilerplate_passage_removal

    k = 2
    rows = [(i, s) for i, s in enumerate(texts)]
    segs = {i: _py_passages(s, k) for i, s in rows}
    ndocs = {}
    for i, ps in segs.items():
        for p in set(ps):
            ndocs[p] = ndocs.get(p, 0) + 1
    boiler = {p for p, c in ndocs.items() if c > max_docs}
    first = {}
    for i in sorted(segs):
        for pos, p in enumerate(segs[i]):
            if p in boiler and p not in first:
                first[p] = (i, pos)
    expected = {}
    for i in sorted(segs):
        kept = [
            p
            for pos, p in enumerate(segs[i])
            if p not in boiler or first[p] == (i, pos)
        ]
        if kept:
            expected[i] = (len(segs[i]), len(kept), " ".join(kept))

    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_passages"], r["kept_passages"], r["text"])
        for r in boilerplate_passage_removal(
            d, window=k, max_docs=max_docs
        ).collect()
    }
    assert got == expected


def test_g711_roundtrip_exhaustive():
    """EVERY int16 sample: the kernel's mu-law/A-law expansion of the
    independent audioop compressor's byte equals audioop's own
    expansion — the decoder is byte-exact over the entire companding
    range, no hypothesis needed (the domain is enumerable)."""
    import pytest

    audioop = pytest.importorskip("audioop")  # stdlib until 3.13

    from titan_spark.pipeline.multimodal import (
        _alaw_to_linear,
        _mulaw_to_linear,
    )

    import struct

    for s in range(-32768, 32768, 7):  # stride 7 covers all byte codes
        raw = struct.pack("<h", s)
        ub = audioop.lin2ulaw(raw, 2)[0]
        ab = audioop.lin2alaw(raw, 2)[0]
        assert _mulaw_to_linear(ub) == int.from_bytes(
            audioop.ulaw2lin(bytes([ub]), 2), "little", signed=True
        )
        assert _alaw_to_linear(ab) == int.from_bytes(
            audioop.alaw2lin(bytes([ab]), 2), "little", signed=True
        )


def _py_exact_substring(texts, k):
    """Brute-force reference for exact_substring_removal's contract."""
    from collections import Counter

    toks = {i: _py_tokens(s) for i, s in enumerate(texts)}
    toks = {i: t for i, t in toks.items() if t}
    wins, cnt = [], Counter()
    for i in sorted(toks):
        t = toks[i]
        for s in range(len(t) - k + 1):
            key = " ".join(t[s : s + k])
            wins.append((i, s, key))
            cnt[key] += 1
    first = {}
    for i, s, key in wins:  # built in (id, start) order
        if cnt[key] >= 2 and key not in first:
            first[key] = (i, s)
    removed = {i: set() for i in toks}
    for i, s, key in wins:
        if cnt[key] >= 2 and first[key] != (i, s):
            removed[i].update(range(s, s + k))
    out = {}
    for i in sorted(toks):
        kept = [t for p, t in enumerate(toks[i]) if p not in removed[i]]
        if kept:
            out[i] = (len(toks[i]), len(toks[i]) - len(kept), " ".join(kept))
    return out


def test_exact_substring_removal_closed_form(spark):
    """A 5-token span shared by two docs (k=3): the later doc loses the
    whole merged span (overlapping windows fuse into one maximal cut),
    the corpus-first doc is untouched, and a doc shorter than k passes
    through verbatim even when its text occurs elsewhere."""
    from titan_spark.pipeline.dedup import exact_substring_removal

    rows = [
        (0, "x1 x2 a b c d e x3"),
        (1, "y1 a b c d e y2 y3"),
        (2, "a b"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["text"])
        for r in exact_substring_removal(d, k=3).collect()
    }
    assert got == {
        0: (8, 0, "x1 x2 a b c d e x3"),
        1: (8, 5, "y1 y2 y3"),
        2: (2, 0, "a b"),
    }


def test_exact_substring_removal_within_doc(spark):
    """Within-document repetition dedups too (Lee et al. dedup within
    AND across): 'm n o p' repeated in one doc keeps only its first
    occurrence."""
    from titan_spark.pipeline.dedup import exact_substring_removal

    d = spark.createDataFrame(
        [(7, "m n o p m n o p")], "doc_id long, text string"
    )
    [r] = exact_substring_removal(d, k=4).collect()
    assert (r["n_tokens"], r["removed_tokens"], r["text"]) == (8, 4, "m n o p")


def test_exact_substring_fully_removed_doc_disappears(spark):
    """A doc that is entirely a later occurrence of a duplicated span
    drops out of the output (fully cut), like boilerplate_removal."""
    from titan_spark.pipeline.dedup import exact_substring_removal

    rows = [(0, "a b c d"), (1, "a b c d")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["text"])
        for r in exact_substring_removal(d, k=4).collect()
    }
    assert got == {0: (4, 0, "a b c d")}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_exact_substring_removal_matches_brute_force(spark, texts):
    """Adversarial tiny-vocabulary corpora (maximal window collisions):
    the Spark transform — overlapping k-windows, corpus-first winner
    election, interval-merged cut — equals the brute-force Python
    reference on every generated corpus."""
    from titan_spark.pipeline.dedup import exact_substring_removal

    k = 2
    expected = _py_exact_substring(texts, k)
    d = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["text"])
        for r in exact_substring_removal(d, k=k).collect()
    }
    assert got == expected
