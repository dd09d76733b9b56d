"""Document chunking and training-sequence packing.

The two layout passes between a cleaned corpus and a training run:

- ``chunk_documents``: split each document into fixed-size token
  windows with overlap (RAG / embedding ingestion layout). Pure array
  algebra over the token stream — tokenize once, ``sequence`` +
  ``transform`` + one ``explode``; no shuffle, scales linearly.

- ``pack_sequence_index``: concatenate the corpus token stream in
  ``doc_id`` order and cut it into fixed ``budget``-token training
  windows, emitting which span of each document lands in which window
  (the GPT-style "document packing" index). Needs a global running
  offset — computed as a DISTRIBUTED prefix sum (range-partition by
  id, partition-local cumulative sums, tiny per-partition totals
  broadcast back), never a single-partition global window: the
  classic ``Window.orderBy(...)`` cumsum collapses 100 TB onto one
  task, which is exactly the scale bug this module exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from titan_spark.compute.checkpointing import cut_lineage
from titan_spark.functions.text import tokenize


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between neighbours.

    Window starts step by ``chunk_tokens - overlap``; the final window
    may be short; empty documents yield no chunks. The token stream is
    materialized once per row and sliced per window (slice on a bound
    lambda variable — no re-tokenization per chunk).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
    tk = F.col("_toks")
    n = F.size(tk)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    # A window starting at s > 0 with s + overlap >= n is entirely
    # contained in its predecessor's overlap tail — it adds no new
    # tokens, only duplicate content downstream. Dropping it keeps the
    # surviving starts a stride-spaced prefix, so the transform index
    # still equals s // stride.
    starts = F.filter(starts, lambda s: (s == 0) | (s + F.lit(overlap) < n))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.slice(tk, s + 1, chunk_tokens).alias("toks"),
        ),
    )
    exploded = base.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).filter(F.size("_c.toks") > 0)
    return exploded.select(
        id_col,
        F.col("_c.chunk_idx").cast("int").alias("chunk_idx"),
        F.size("_c.toks").cast("int").alias("n_tokens"),
        F.array_join("_c.toks", " ").alias("chunk_text"),
    )


def _distributed_offsets(
    counts: DataFrame, id_col: str | list[str], n_col: str, num_parts: int
) -> tuple[DataFrame, int]:
    """Add ``_offset`` = tokens before this row in ``id_col`` order
    (one column or a list of tie-broken order columns), via range
    partition + local cumsum + broadcast partition totals; returns
    (frame, grand_total).

    The per-partition totals relation is ``num_parts`` rows — a scalar
    collect at any scale — and every heavy operation keys on the range
    partition, so the prefix sum costs two narrow passes instead of a
    one-task global sort."""
    order_cols = [id_col] if isinstance(id_col, str) else list(id_col)
    parted = counts.repartitionByRange(
        num_parts, *[F.col(c) for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    # Materialize before the totals collect: the returned plan must see
    # the SAME partition assignment the totals were computed from.
    # Without the cut, the range shuffle re-executes for the returned
    # plan and correctness would silently ride on RangePartitioner's
    # boundary sampling being reproducible across jobs.
    local = cut_lineage(parted.withColumn("_cum", F.sum(n_col).over(w)), eager=True)
    totals = (
        local.groupBy("_pid").agg(F.max("_cum").alias("_ptotal")).orderBy("_pid").collect()
    )
    base, bases = 0, {}
    for r in totals:
        bases[r["_pid"]] = base
        base += r["_ptotal"]
    base_map = F.create_map(
        *[F.lit(x) for kv in bases.items() for x in kv]
    )
    return (
        local.withColumn(
            "_offset", (F.col("_cum") - F.col(n_col) + base_map[F.col("_pid")]).cast("long")
        ).drop("_cum"),
        base,
    )


def pack_sequence_index(
    df: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 32,
) -> DataFrame:
    """(window_id, id, tok_start, tok_end) — the packed-training-window
    index: window ``w`` holds global tokens [w*budget, (w+1)*budget),
    and each row says which half-open token span [tok_start, tok_end)
    of a document lands in that window.

    Every document spans windows floor(off/budget) ..
    floor((off+n-1)/budget); one explode over that (usually length-1)
    range emits the index. Invariants (tested): per-window spans sum to
    ``budget`` (except the final window) and per-document spans
    partition the document.
    """
    counts = df.select(
        F.col(id_col), F.size(tokenize(F.col(text_col))).cast("long").alias("_n")
    ).filter(F.col("_n") > 0)
    with_off, _ = _distributed_offsets(counts, id_col, "_n", num_parts)
    first_w = F.floor(F.col("_offset") / budget)
    last_w = F.floor((F.col("_offset") + F.col("_n") - 1) / budget)
    win = F.explode(F.sequence(first_w, last_w)).alias("window_id")
    out = with_off.select(F.col(id_col), "_n", "_offset", win)
    lo = F.greatest(F.col("window_id") * budget, F.col("_offset"))
    hi = F.least((F.col("window_id") + 1) * budget, F.col("_offset") + F.col("_n"))
    return out.select(
        F.col("window_id").cast("long"),
        id_col,
        (lo - F.col("_offset")).cast("long").alias("tok_start"),
        (hi - F.col("_offset")).cast("long").alias("tok_end"),
    )


def shard_assignment(
    df: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 32,
    seed: int = 0,
) -> DataFrame:
    """Token-balanced training-shard layout: (id, shard, n_tokens).

    Documents are laid out in a deterministic pseudo-random order (the
    portable hash bucket, tie-broken by id — the training-time global
    shuffle), the token stream is prefix-summed with the same
    distributed machinery as ``pack_sequence_index``, and contiguous
    cuts give shard = (offset · n_shards) div total — every shard gets
    total/n_shards tokens ±1 document. Integer division keeps the cut
    exact at any corpus size (a double quotient drifts past 2^53
    tokens).

    Scale: one tokenize pass, one range shuffle on the hash order, a
    num_parts-row totals collect. Nothing global-windowed, nothing n².
    """
    from titan_spark.pipeline.sampling import hash_bucket

    counts = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), seed).alias("_ord"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    with_off, total = _distributed_offsets(counts, ["_ord", id_col], "_n", num_parts)
    return with_off.select(
        F.col(id_col),
        F.expr(f"CAST((_offset * {int(n_shards)}) DIV {int(total)} AS INT)").alias("shard"),
        F.col("_n").cast("int").alias("n_tokens"),
    )


def shard_manifest(assignment: DataFrame) -> DataFrame:
    """Per-shard rollup of a ``shard_assignment`` result: (shard,
    n_docs, n_tokens) — the sidecar manifest a training job reads."""
    return assignment.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
