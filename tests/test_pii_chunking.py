"""PII detection/redaction + chunking/sequence-packing invariants."""

import pytest
from pyspark.sql import functions as F

from titan_spark.pipeline.chunking import chunk_documents, pack_sequence_index
from titan_spark.pipeline.pii import pii_redact, pii_stats


def test_pii_stats_counts(spark):
    d = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.co.uk or admin@test.io thanks"),
            (2, "server 10.0.0.1 and 192.168.1.255 up"),
            (3, "call 555-123-4567 now"),
            (4, "clean text with no identifiers at all"),
            (5, "mix: x@y.org from 8.8.8.8 dial 800-555-0100"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_stats(d).collect()}
    assert (rows[1]["n_email"], rows[1]["n_pii"]) == (2, 2)
    assert (rows[2]["n_ipv4"], rows[2]["n_pii"]) == (2, 2)
    assert (rows[3]["n_phone"], rows[3]["n_pii"]) == (1, 1)
    assert rows[4]["n_pii"] == 0
    assert (rows[5]["n_email"], rows[5]["n_ipv4"], rows[5]["n_phone"]) == (1, 1, 1)


def test_pii_redact_replaces_and_preserves_rest(spark):
    d = spark.createDataFrame(
        [(1, "reach x@y.org at 10.1.2.3 or 555-123-4567 ok")],
        "doc_id long, text string",
    )
    out = pii_redact(d).first()["text"]
    assert out == "reach <EMAIL> at <IP> or <PHONE> ok"
    # idempotent: a second pass changes nothing
    d2 = spark.createDataFrame([(1, out)], "doc_id long, text string")
    assert pii_redact(d2).first()["text"] == out


def test_chunking_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(70))
    d = spark.createDataFrame([(1, text), (2, "a b"), (3, "")], "doc_id long, text string")
    rows = chunk_documents(d, chunk_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts at 0 and 56 -> 64-token + 14-token chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_tokens"] for r in c1] == [64, 14]
    assert c1[0]["chunk_text"].split()[56:] == c1[1]["chunk_text"].split()[:8]  # overlap
    # short doc: one whole-doc chunk; empty doc: no chunks
    assert [r["n_tokens"] for r in by_doc[2]] == [2]
    assert 3 not in by_doc
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=8, overlap=8)


def test_chunking_skips_redundant_tail(spark):
    # 60-token doc, chunk=64, overlap=8: the window at 56 would hold
    # only tokens 56..59, all inside the previous window's overlap tail
    d = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(60)))], "doc_id long, text string"
    )
    rows = chunk_documents(d, chunk_tokens=64, overlap=8).collect()
    assert [(r["chunk_idx"], r["n_tokens"]) for r in rows] == [(0, 60)]
    # overlap > chunk/2 drops several tail windows; surviving indexes
    # stay dense and the doc stays fully covered
    d2 = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(11)))], "doc_id long, text string"
    )
    rows2 = sorted(
        chunk_documents(d2, chunk_tokens=10, overlap=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["chunk_idx"], r["n_tokens"]) for r in rows2] == [(0, 10), (1, 9)]
    assert rows2[1]["chunk_text"].split()[0] == "t2"  # start = idx * stride
    assert rows2[1]["chunk_text"].split()[-1] == "t10"  # tail token covered


def test_pack_sequence_index_invariants(spark):
    import random

    rng = random.Random(7)
    docs = [(i, " ".join("w" for _ in range(rng.randint(1, 40)))) for i in range(100)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    budget = 64
    idx = pack_sequence_index(d, budget=budget, num_parts=8).collect()
    total = sum(len(t[1].split()) for t in docs)
    # per-document spans partition the document exactly
    by_doc = {}
    for r in idx:
        by_doc.setdefault(r["doc_id"], []).append((r["tok_start"], r["tok_end"]))
    for i, text in docs:
        spans = sorted(by_doc[i])
        n = len(text.split())
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (a, b), (c, e) in zip(spans, spans[1:]):
            assert b == c  # contiguous, non-overlapping
    # per-window spans sum to budget (except the last window)
    by_win = {}
    for r in idx:
        by_win.setdefault(r["window_id"], 0)
        by_win[r["window_id"]] += r["tok_end"] - r["tok_start"]
    last = max(by_win)
    assert set(by_win) == set(range(last + 1))  # dense window ids
    for w, n in by_win.items():
        assert n == budget or (w == last and n == total - last * budget)


def test_pack_matches_single_partition_reference(spark):
    # distributed prefix sum == the obvious one-partition formulation
    docs = [(i, " ".join("w" for _ in range(3 + (i * 7) % 13))) for i in range(50)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["window_id"], r["doc_id"], r["tok_start"], r["tok_end"])
        for r in pack_sequence_index(d, budget=32, num_parts=5).collect()
    }
    # reference: python cumsum
    off, ref = 0, set()
    for i, text in docs:
        n = len(text.split())
        for w in range(off // 32, (off + n - 1) // 32 + 1):
            lo, hi = max(w * 32, off), min((w + 1) * 32, off + n)
            ref.add((w, i, lo - off, hi - off))
        off += n
    assert got == ref


def _plan(df):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pii_and_chunking_plans_are_narrow(spark, sf_dir):
    # scrubbing and chunking must stay shuffle-free scan projections
    from titan_spark.sources.tpch import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    assert "Exchange" not in _plan(pii_redact(docs))
    assert "Exchange" not in _plan(pii_stats(docs))
    assert "Exchange" not in _plan(chunk_documents(docs))


def test_pack_windows_avoids_global_window(spark, sf_dir):
    # the packing prefix sum must never plan a one-task global sort:
    # no SinglePartition exchange anywhere in the plan
    from titan_spark.sources.tpch import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    p = _plan(pack_sequence_index(docs, budget=256, num_parts=8))
    assert "SinglePartition" not in p


def test_ivf_assign_broadcast_path_matches_literal(spark, sf_dir):
    # above LITERAL_CENTROID_MAX the centroids ship as one broadcast row
    # instead of plan literals — identical assignments, O(1) plan size
    from titan_spark.pipeline.similarity import ivf_assign, ivf_centroids
    from titan_spark.sources.tpch import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    dim = len(emb.select("embedding").first()[0])
    cents = ivf_centroids(dim, 12)
    lit = {r["vec_id"]: r["_cell"] for r in ivf_assign(emb, cents).select("vec_id", "_cell").collect()}
    bc = {
        r["vec_id"]: r["_cell"]
        for r in ivf_assign(emb, cents, literal_max=0).select("vec_id", "_cell").collect()
    }
    assert lit == bc and len(set(lit.values())) > 1
    # the broadcast plan moves no data: a BroadcastExchange for the
    # one-row centroid relation, no hash-partitioned shuffle
    plan = ivf_assign(emb, cents, literal_max=0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan and "hashpartitioning" not in plan


def test_kmeans_lloyd_deterministic_and_improves(spark, sf_dir):
    from titan_spark.pipeline.similarity import _det_planes, kmeans_lloyd
    from titan_spark.sources.tpch import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    a1, c1 = kmeans_lloyd(emb, k=4, n_iter=1)
    a2, c2 = kmeans_lloyd(emb, k=4, n_iter=2)
    # deterministic: same call, same result
    a1b, c1b = kmeans_lloyd(emb, k=4, n_iter=1)
    assert c1 == c1b
    assert {(r["vec_id"], r["cell"]) for r in a1.collect()} == {
        (r["vec_id"], r["cell"]) for r in a1b.collect()
    }
    # every vector lands in a valid cell
    cells = {r["cell"] for r in a2.collect()}
    assert cells <= set(range(4))

    # Lloyd monotonicity: total within-cluster SSE never increases
    def sse(cents):
        import math

        rows = emb.select("vec_id", "embedding").collect()
        tot = 0.0
        for r in rows:
            v = [float(x) for x in r["embedding"]]
            tot += min(sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents)
        return tot

    c0 = [list(c) for c in _det_planes(len(c1[0]), 4)]
    assert sse(c1) <= sse(c0) + 1e-6
    assert sse(c2) <= sse(c1) + 1e-6


def test_quantize_int8_roundtrip(spark, sf_dir):
    from titan_spark.pipeline.similarity import dequantize_int8, quantize_int8
    from titan_spark.sources.tpch import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    q = quantize_int8(emb)
    rows = q.collect()
    assert all(-127 <= c <= 127 for r in rows for c in r["qvec"])
    # reconstruction error bounded by scale/2 per component
    orig = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    deq = {r["vec_id"]: (r["scale"], r["embedding"]) for r in dequantize_int8(q).collect()}
    for vid, (scale, recon) in deq.items():
        err = max(abs(a - b) for a, b in zip(orig[vid], recon))
        assert err <= scale / 2 + 1e-7


def test_shard_assignment_balance_and_partition(spark):
    from titan_spark.pipeline.chunking import shard_assignment, shard_manifest

    rows = [(i, " ".join(f"w{j}" for j in range((i % 13) + 1))) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    asg = shard_assignment(df, n_shards=4)
    got = asg.collect()
    # every doc assigned exactly once, shard ids in range
    assert sorted(r["doc_id"] for r in got) == list(range(200))
    assert {r["shard"] for r in got} == {0, 1, 2, 3}
    # token balance: contiguous cuts deviate by at most one document
    man = {r["shard"]: r["n_tokens"] for r in shard_manifest(asg).collect()}
    total = sum(man.values())
    max_doc = max((i % 13) + 1 for i in range(200))
    for s in range(4):
        assert abs(man[s] - total / 4) <= max_doc
    # deterministic across evaluations
    again = {(r["doc_id"], r["shard"]) for r in shard_assignment(df, n_shards=4).collect()}
    assert again == {(r["doc_id"], r["shard"]) for r in got}


def test_shard_assignment_seed_changes_layout(spark):
    from titan_spark.pipeline.chunking import shard_assignment

    rows = [(i, "a b c") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {(r["doc_id"], r["shard"]) for r in shard_assignment(df, 4, seed=0).collect()}
    b = {(r["doc_id"], r["shard"]) for r in shard_assignment(df, 4, seed=7).collect()}
    assert a != b


def test_secrets_scan_entropy_closed_form(spark):
    """Closed-form entropy pins: a 20-char single-letter run has
    entropy 0 (candidate, never flagged); a run of 16 distinct hex
    chars repeated has entropy exactly 4.0; short runs are not
    candidates at all."""
    from titan_spark.pipeline.pii import secrets_scan

    d = spark.createDataFrame(
        [
            (1, "prefix " + "a" * 20 + " suffix"),
            (2, "key = " + "0123456789abcdef" * 2),   # 32 chars, H = 4.0
            (3, "short run abc123 only"),
            (4, "two runs " + "b" * 25 + " and " + "0123456789abcdef" * 2),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in secrets_scan(d).collect()}
    assert rows[1]["n_candidates"] == 1 and rows[1]["n_high_entropy"] == 0
    assert rows[1]["max_entropy"] == 0.0 and not rows[1]["has_secret"]
    assert rows[2]["n_candidates"] == 1 and rows[2]["n_high_entropy"] == 1
    assert rows[2]["max_entropy"] == 4.0 and rows[2]["has_secret"]
    assert rows[3]["n_candidates"] == 0 and not rows[3]["has_secret"]
    assert rows[4]["n_candidates"] == 2 and rows[4]["n_high_entropy"] == 1
    assert rows[4]["max_entropy"] == 4.0
