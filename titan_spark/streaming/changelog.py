"""Change-data-capture log + processors (Titan's streaming surface).

Reference (SURVEY §2.8): Titan's "streaming" is a write-ahead /
user change log with registered processors —
``core/log/LogProcessorFramework.java:11-21`` gives callbacks
``ChangeProcessor(tx, txId, ChangeState{ADDED,REMOVED})``
(``core/log/ChangeState.java:16-35``), backed by the ``txlog`` /
``systemlog`` KCVS stores; readers resume from a ``ReadMarker``
(``diskstorage/log/ReadMarker.java``).

Spark mapping: the log is a parquet/Delta append stream of
``(op, element_kind, element_id, payload, tx_id, ts)`` rows.
Processors are Structured Streaming jobs — ``foreachBatch`` is the
ChangeProcessor callback, the streaming checkpoint is the ReadMarker,
and at-least-once delivery comes from the sink's checkpointing.
Batch replay (``TransactionRecovery``) is the same code path run with
a bounded read.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_LOG_SCHEMA = (
    "op string, element_kind string, element_id long, payload string, tx_id long, ts timestamp"
)

_OPS = ("ADD", "REMOVE")
_KINDS = ("vertex", "edge", "property")


class ChangeLogWriter:
    """Writes mutation batches to a named log directory (the user log).

    Titan fires user-log events on commit
    (``StandardTitanGraph.java:634-776``); here each ``log_*`` call is
    one committed transaction's worth of changes.
    """

    def __init__(self, spark: SparkSession, log_dir: str):
        self.spark = spark
        self.log_dir = log_dir
        self._tx_counter = 0

    def log_changes(
        self,
        rows: list[tuple[str, str, int, dict[str, Any]]],
        tx_id: int | None = None,
    ) -> int:
        """rows: (op, element_kind, element_id, payload_dict)."""
        self._tx_counter += 1
        tx = tx_id if tx_id is not None else self._tx_counter
        for op, kind, _eid, _p in rows:
            if op not in _OPS:
                raise ValueError(f"op must be one of {_OPS}, got {op!r}")
            if kind not in _KINDS:
                raise ValueError(f"element_kind must be one of {_KINDS}, got {kind!r}")
        df = self.spark.createDataFrame(
            [(op, kind, eid, json.dumps(payload), tx) for op, kind, eid, payload in rows],
            "op string, element_kind string, element_id long, payload string, tx_id long",
        ).withColumn("ts", F.current_timestamp())
        df.write.mode("append").parquet(self.log_dir)
        return tx


class LogProcessorFramework:
    """Register ChangeProcessor callbacks over a change log.

    ``process_stream`` runs them as a Structured Streaming query
    (checkpoint = ReadMarker, at-least-once); ``process_batch`` replays
    a bounded window (TransactionRecovery analog).
    """

    def __init__(self, spark: SparkSession, log_dir: str):
        self.spark = spark
        self.log_dir = log_dir
        self._processors: list[Callable[[DataFrame, int], None]] = []

    def add_processor(self, fn: Callable[[DataFrame, int], None]) -> "LogProcessorFramework":
        """fn(batch_df, batch_id): batch_df has CHANGE_LOG_SCHEMA rows."""
        self._processors.append(fn)
        return self

    def _dispatch(self, batch_df: DataFrame, batch_id: int) -> None:
        for fn in self._processors:
            fn(batch_df, batch_id)

    def process_stream(self, checkpoint_dir: str, trigger_once: bool = True):
        """Start the streaming processor; returns the StreamingQuery.

        ``trigger_once=True`` drains the backlog and stops (good for
        tests and batch-ish replay); otherwise micro-batches run until
        ``query.stop()``.
        """
        stream = (
            self.spark.readStream.schema(CHANGE_LOG_SCHEMA).parquet(self.log_dir)
        )
        writer = stream.writeStream.foreachBatch(self._dispatch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def process_batch(
        self, since_tx: int | None = None, until_tx: int | None = None
    ) -> None:
        """Bounded replay of the log through the processors."""
        df = self.spark.read.schema(CHANGE_LOG_SCHEMA).parquet(self.log_dir)
        if since_tx is not None:
            df = df.filter(F.col("tx_id") >= since_tx)
        if until_tx is not None:
            df = df.filter(F.col("tx_id") <= until_tx)
        self._dispatch(df, -1)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    id_col: str = "id",
    element_kind: str = "vertex",
) -> DataFrame:
    """Fold a change batch into a table: REMOVEs anti-join, ADDs append.

    The 'emulated MERGE' for environments without Delta: last-writer-
    wins per (element_kind, element_id) within the batch (highest
    tx_id), applied over the base table of the given kind — ids are
    per-kind namespaces, so an edge change never shadows a vertex
    change with the same numeric id.
    """
    from pyspark.sql import Window

    changes = changes.filter(F.col("element_kind") == element_kind)
    w = Window.partitionBy("element_kind", "element_id").orderBy(
        F.col("tx_id").desc(), F.col("ts").desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    removed = latest.filter(F.col("op") == "REMOVE").select(
        F.col("element_id").alias(id_col)
    )
    added = latest.filter(F.col("op") == "ADD")
    survived = base.join(removed, id_col, "left_anti")
    # ADD payloads become rows: parse JSON payload with the base schema
    add_rows = added.select(
        F.col("element_id").alias(id_col),
        F.from_json(F.col("payload"), base.drop(id_col).schema).alias("_p"),
    ).select(id_col, "_p.*")
    return survived.join(
        add_rows.select(id_col), id_col, "left_anti"
    ).unionByName(add_rows, allowMissingColumns=True)
