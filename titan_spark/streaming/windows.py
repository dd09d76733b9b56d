"""Structured Streaming over the events stream: windowed aggregations,
watermarked late-data handling, and custom stateful sessionization.

These are additive Spark-native capabilities (the reference has no
stream SQL — SURVEY §2.8 note); they make the change-log/CDC surface a
full streaming engine: the same queries run over ``readStream`` with
checkpointed exactly-once sinks at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts {ts_type}, user_id long, event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream source. The parquet column is
    TIMESTAMP(NANOS), which Spark surfaces either as ``bigint`` (under
    nanosAsLong) or ``timestamp_ntz`` depending on the reader path —
    probe the batch schema so the stream schema matches, then normalize
    to a µs TIMESTAMP via the shared loader helper."""
    from titan_spark.sources.tpch import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_dt = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes).get("ts")
    ts_type = "long" if batch_dt == "bigint" else batch_dt
    # FileStreamSource requires a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA.format(ts_type=ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding window counts + sums per event_type with a
    watermark bounding state for late data."""
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-based) per user — the streaming twin
    of the batch lag-gap sessionization in the catalog."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("sess.start").alias("sess_start"),
            F.unix_timestamp("sess.end").alias("sess_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication with bounded state: emit the first
    occurrence of each key, drop re-deliveries that arrive within the
    watermark horizon.

    This is the ingest-side twin of the batch exact-dedup operator —
    at-least-once sources (Kafka, CDC replays, retried uploads)
    duplicate records, and an unbounded ``dropDuplicates`` would hold
    every key ever seen in state. ``dropDuplicatesWithinWatermark``
    evicts state once the event-time watermark passes, so state size
    tracks the duplication window, not stream history.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def run_to_memory_sink(stream_df: DataFrame, name: str, checkpoint: str, output_mode: str = "complete"):
    """Drain all available input through the streaming query into an
    in-memory table (test/bench harness; swap for kafka/delta sinks in
    production). Complete mode emits windows still open at end-of-input
    (append mode would hold them until the watermark passes)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream–static enrichment join: attach dimension attributes to a
    stream with NO streaming state — Spark re-plans the static side per
    micro-batch (it may broadcast under AQE), so dimension updates are
    picked up between batches and nothing accumulates. The canonical
    ingest-enrichment shape (events × user/account/catalog dims)."""
    return events.join(dim, on, how)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Stream–stream interval join: pair records of two streams sharing
    ``key`` whose event times fall within ``within`` of each other.

    Both sides carry watermarks and the join predicate bounds the time
    difference in BOTH directions, so each side's state store holds
    only (watermark + within) worth of rows — the bounded-state form
    Structured Streaming requires for stream-stream equi-joins. The
    classic correlation shape: click↔impression, request↔response,
    order↔payment. Every right-side column comes back prefixed ``r_``
    (the two streams usually share a schema; unprefixed output would be
    ambiguous), except the join key, which is dropped.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns]).withWatermark(
        f"r_{right_ts}", watermark
    )
    lt, rt = l[left_ts], r[f"r_{right_ts}"]
    cond = (
        (lt >= rt - F.expr(f"INTERVAL {within}"))
        & (lt <= rt + F.expr(f"INTERVAL {within}"))
        & (l[key] == r[f"r_{key}"])
    )
    return l.join(r, cond).drop(f"r_{key}")
