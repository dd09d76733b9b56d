"""Streaming ingest near-dup dedup against a persistent signature
store — the incremental form of the batch MinHash+LSH pipeline
(pipeline/dedup.py), for corpora that arrive as a stream.

Per micro-batch (foreachBatch):

1. band incoming docs' minhash signatures (same deterministic hashes
   as the batch pipeline — a doc gets the same bands in either mode);
2. docs sharing ANY band with the store are near-dup suspects →
   dropped (the store side of the join is bucketed parquet keyed on
   the band hash; the probe reads only matching buckets at scale);
3. within-batch collisions resolve greedily — the lower doc id of
   each candidate pair survives (documented divergence from the batch
   pipeline's full transitive clustering: a stream can't see forward);
4. survivors' band rows append to the store WITH the batch id; history
   reads take only STRICTLY EARLIER batches and drop duplicate
   (band, band_hash, doc) rows, so a retried batch (foreachBatch is
   at-least-once) reproduces its first attempt's survivors — the sink
   output is idempotent, not just the store.

State is the store itself — bounded by unique-document volume, not
stream length; no executor state store grows with the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from titan_spark.pipeline.dedup import minhash_signatures

_STORE_SCHEMA = "band int, band_hash long, doc_id long, batch_id long"
# the persistent store is hive-partitioned on pmod(band_hash, N): a
# micro-batch's probe reads ONLY the bucket directories its own band
# hashes land in (partition-pruned scan), so probe IO is bounded by
# the matching buckets instead of the whole store — the ReadMarker
# bounded-read-interval analog (diskstorage/log/ReadMarker.java)
_N_BUCKETS = 64


def _bucket_of(band_hash):
    return F.pmod(band_hash, F.lit(_N_BUCKETS)).cast("int")


class IncrementalDedup:
    """foreachBatch processor: near-dup-filtered ingest with a
    persistent banded-signature store."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        bands: int = 8,
        num_hashes: int = 32,
        hash_fn: str = "xxhash64",
        compact_every: int = 8,
    ):
        self.spark = spark
        self.store_dir = store_dir
        self.text_col = text_col
        self.id_col = id_col
        self.bands = bands
        self.num_hashes = num_hashes
        self.hash_fn = hash_fn
        # small-file compaction cadence (0 disables): every Nth batch
        # rewrites the store to one file per bucket after its append
        self.compact_every = compact_every
        # once bucket= dirs have been seen the layout never reverts
        # (appends and compaction both write bucketed) — cache the
        # positive answer so steady-state probes skip the listdir
        self._known_bucketed = False

    def warm_up(self) -> None:
        """One-time bootstrap (call at construction/stream start, off
        the per-batch latency path): run the full ``process_batch``
        plan twice — once against a missing store and once against the
        bucketed store the first pass created — on a two-doc synthetic
        batch in a throwaway directory. This compiles both plan shapes'
        whole-stage codegen (minhash + banding, empty-store probe,
        partition-pruned bucket probe, bucketed parquet append) before
        the first real micro-batch, which otherwise pays the JIT +
        codegen cost on the latency path (measured ~2-3x the
        steady-state batch wall)."""
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="dedup_warmup_")
        try:
            probe = IncrementalDedup(
                self.spark,
                os.path.join(tmp, "store"),
                text_col=self.text_col,
                id_col=self.id_col,
                bands=self.bands,
                num_hashes=self.num_hashes,
                hash_fn=self.hash_fn,
                compact_every=0,
            )
            seed = self.spark.createDataFrame(
                [(0, "warm up shingle one"), (1, "warm up shingle two")],
                f"{self.id_col} long, {self.text_col} string",
            )
            probe.process_batch(seed, 0).count()
            probe.process_batch(
                seed.filter(F.col(self.id_col) == 1), 1
            ).count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # -- store --------------------------------------------------------
    def _store(
        self, buckets: list[int] | None = None, dedup: bool = True
    ) -> DataFrame:
        """Read the signature store; ``buckets`` restricts the scan to
        the named band-hash buckets (partition-pruned — only those
        bucket directories are read). Legacy non-partitioned stores are
        read whole with the bucket derived on the fly. ``dedup=False``
        skips the 3-column retry-dedup shuffle for probe paths that
        apply their own coarser distinct."""
        if not os.path.exists(self.store_dir):
            # crash-recovery for compact()'s swap window: if the store
            # was renamed away but the fully-written compacted copy
            # never took its place, finish the swap (the tmp dir is
            # only ever complete at that point — the write finishes
            # before any rename starts)
            tmp = self.store_dir.rstrip("/") + ".compacting"
            if os.path.exists(tmp):
                os.rename(tmp, self.store_dir)
            else:
                return self.spark.createDataFrame(
                    [], _STORE_SCHEMA + ", bucket int"
                )
        bucketed = self._known_bucketed or any(
            e.startswith("bucket=") for e in os.listdir(self.store_dir)
        )
        self._known_bucketed = bucketed
        if bucketed:
            df = self.spark.read.schema(_STORE_SCHEMA + ", bucket int").parquet(
                self.store_dir
            )
            if buckets is not None:
                df = df.filter(F.col("bucket").isin([int(b) for b in buckets]))
        else:
            df = (
                self.spark.read.schema(_STORE_SCHEMA)
                .parquet(self.store_dir)
                .withColumn("bucket", _bucket_of(F.col("band_hash")))
            )
        if dedup:
            df = df.dropDuplicates(["band", "band_hash", "doc_id"])
        return df

    def compact(self) -> None:
        """Rewrite the store to one file per bucket. Micro-batch appends
        accumulate one file per touched bucket per batch, so probe
        latency at high batch counts becomes footer/listing-bound —
        the classic small-file problem; LSM stores solve it with
        compaction and so does this (single-writer context: call
        between batches, e.g. via ``compact_every``). Duplicate
        (band, band_hash, doc_id) rows keep their MIN batch_id so the
        strictly-earlier retry semantics are preserved."""
        if not os.path.exists(self.store_dir):
            return
        if not any(e.startswith("bucket=") for e in os.listdir(self.store_dir)):
            return
        import shutil

        compacted = (
            self.spark.read.schema(_STORE_SCHEMA + ", bucket int")
            .parquet(self.store_dir)
            .groupBy("band", "band_hash", "doc_id", "bucket")
            .agg(F.min("batch_id").alias("batch_id"))
            .select("band", "band_hash", "doc_id", "batch_id", "bucket")
        )
        tmp = self.store_dir.rstrip("/") + ".compacting"
        old = self.store_dir.rstrip("/") + ".retired"
        compacted.repartition(_N_BUCKETS, "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(tmp)
        # swap via rename-then-delete: a crash at any point leaves
        # either the original store or the fully-written compacted one
        # on disk — never a deleted store with the replacement still
        # at the tmp path (rmtree-then-rename had exactly that window)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.store_dir, old)
        os.rename(tmp, self.store_dir)
        shutil.rmtree(old, ignore_errors=True)
        # drop Spark's cached file listing for the path — the next
        # probe must see the compacted files, not the deleted originals
        self.spark.catalog.refreshByPath(self.store_dir)

    def _band_rows(self, df: DataFrame) -> DataFrame:
        """(band, band_hash, doc_id) rows — one per band per doc, the
        same banding the batch LSH join keys on."""
        sigs = minhash_signatures(
            df, self.text_col, self.id_col, self.num_hashes, hash_fn=self.hash_fn
        )
        rows = self.num_hashes // self.bands
        from titan_spark.functions.hashing import resolve_hash_fn

        h64 = resolve_hash_fn(self.hash_fn)
        # identical band-hash construction to the batch pipeline's
        # lsh_candidate_pairs, so a doc's (band, band_hash) rows are the
        # same whether it arrived by stream or batch
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    h64(
                        F.concat_ws(
                            ",",
                            *[F.col("signature")[b * rows + i] for i in range(rows)],
                        )
                    ).alias("band_hash"),
                )
                for b in range(self.bands)
            ]
        )
        return sigs.select(F.col(self.id_col).alias("doc_id"), F.explode(bands).alias("b")).select(
            F.col("b.band").alias("band"), F.col("b.band_hash").alias("band_hash"), "doc_id"
        )

    # -- batch step ---------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Filter one micro-batch against history; returns survivors
        (also appends their band rows to the store).

        History is restricted to STRICTLY EARLIER batches
        (``batch_id < this batch``): foreachBatch is at-least-once, and
        a retried batch must not see its own prior attempt's appended
        band rows — otherwise every incoming doc self-collides and the
        retry returns zero survivors while the first attempt's sink
        output was lost with the crash. Filtering by batch id makes the
        retry reproduce the first attempt's survivors exactly
        (idempotent sink output, not just an idempotent store)."""
        incoming = self._band_rows(batch_df).withColumn(
            "bucket", _bucket_of(F.col("band_hash"))
        )
        # the batch's band rows feed the bucket probe AND the history
        # join — cache so minhashing runs once
        incoming = incoming.cache()
        probe_buckets = [
            r["bucket"] for r in incoming.select("bucket").distinct().collect()
        ]
        # probe path: only distinct (band, band_hash) matters, so skip
        # the 3-column retry-dedup shuffle (dedup=False)
        store = self._store(probe_buckets, dedup=False).filter(
            F.col("batch_id") < F.lit(int(batch_id))
        )
        # history collisions: any shared band drops the incoming doc
        hist_dupes = (
            incoming.join(
                store.select("band", "band_hash").dropDuplicates(),
                ["band", "band_hash"],
                "left_semi",
            )
            .select("doc_id")
            .distinct()
        )
        # within-batch collisions: greedy keep-lowest-id per pair,
        # derived straight off the CACHED band rows — the old path
        # called lsh_candidate_pairs on the fresh docs and then
        # _band_rows on the survivors, re-minhashing the batch twice;
        # the banding join below is the same (band, band_hash)
        # collision test without a second (or third) shingle+hash pass
        fresh_bands = incoming.join(hist_dupes, "doc_id", "left_anti")
        a = fresh_bands.select("band", "band_hash", F.col("doc_id").alias("id_a"))
        b = fresh_bands.select("band", "band_hash", F.col("doc_id").alias("id_b"))
        losers = (
            a.join(b, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        survivors = batch_df.join(
            hist_dupes.withColumnRenamed("doc_id", self.id_col),
            self.id_col,
            "left_anti",
        ).join(
            losers.withColumnRenamed("doc_id", self.id_col),
            self.id_col,
            "left_anti",
        )
        out_rows = (
            fresh_bands.join(losers, "doc_id", "left_anti")
            .select("band", "band_hash", "doc_id")
            .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            .withColumn("bucket", _bucket_of(F.col("band_hash")))
        )
        # one file per touched bucket per batch (repartition on the
        # partition key), keeping the per-bucket file count — and hence
        # probe IO — proportional to batches, not shuffle partitions
        out_rows.repartition(_N_BUCKETS, "bucket").write.mode("append").partitionBy(
            "bucket"
        ).parquet(self.store_dir)
        incoming.unpersist(blocking=False)
        if self.compact_every and (int(batch_id) + 1) % self.compact_every == 0:
            # survivors' lazy plan reads the PRE-compaction store files
            # (via the history probe) — materialize before the rewrite
            # deletes them
            survivors = survivors.localCheckpoint(eager=True)
            self.compact()
        return survivors

    def run_stream(self, stream_df: DataFrame, checkpoint_dir: str, sink_fn=None):
        """Wire as a foreachBatch sink; ``sink_fn(survivors, batch_id)``
        receives the filtered batch (default: discard — the store is
        the output)."""

        def step(batch_df: DataFrame, batch_id: int) -> None:
            survivors = self.process_batch(batch_df, batch_id)
            if sink_fn is not None:
                sink_fn(survivors, batch_id)

        return (
            stream_df.writeStream.foreachBatch(step)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
