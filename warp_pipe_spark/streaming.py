"""Structured Streaming capture + apply — the live half of the engine.

Parity map (SURVEY.md §2.8):
  - S1/S2 listeners → `readStream` over a changeset drop-dir (file
    source; each arriving file ≈ one NOTIFY batch). Kafka+Debezium or a
    JDBC keyset poll slot into the same contract — anything that yields
    AUDIT_LOG_SCHEMA rows.
  - StartFromLSN/ID/Timestamp → checkpointLocation + an optional
    `since_id` filter unioned with backfill (batch read ahead of the
    stream).
  - ShutdownAfterLastChangeset (A8) → `trigger(availableNow=True)`:
    drain everything present, then stop — the native convergence
    semantics.
  - at-least-once + dup-skip (axon_sql.go:133-144) → exactly-once:
    checkpoint offsets + the idempotent last-writer-wins merge in
    foreachBatch (apply.merge_batch is a pure function of state ∪ batch).

The foreachBatch sink keeps per-table state as parquet; each micro-batch
does one keyed shuffle (the merge fold) — at cluster scale you'd swap
the parquet rewrite for Delta MERGE, same plan shape.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from warp_pipe_spark.apply import merge_batch
from warp_pipe_spark.changeset import AUDIT_LOG_SCHEMA


def changeset_stream(
    spark: SparkSession,
    drop_dir: str,
    schema=None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S2: unbounded changeset source from a drop directory.

    `maxFilesPerTrigger` is the backpressure knob (the reference's
    unbuffered-channel blocking, pipeline.go:12)."""
    reader = spark.readStream.format(fmt).schema(schema or AUDIT_LOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(drop_dir)


class ParquetStateSink:
    """foreachBatch apply target: maintains replayed state at `state_dir`.

    Idempotent: re-running a micro-batch converges to the same state
    (merge_batch is last-writer-wins on (table, pk, id))."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        pk_cols: Sequence[str] = ("pk",),
        id_col: str = "id",
        kind_col: str = "action",
        table_col: str = "table_name",
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.pk_cols = list(pk_cols)
        self.id_col = id_col
        self.kind_col = kind_col
        self.table_col = table_col

    def read_state(self) -> DataFrame | None:
        if not os.path.exists(self.state_dir):
            return None
        try:
            return self.spark.read.parquet(self.state_dir)
        except Exception:
            return None

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        state = self.read_state()
        new_state = merge_batch(
            state,
            batch,
            self.pk_cols,
            self.id_col,
            self.kind_col,
            self.table_col,
        )
        # rewrite via temp dir: parquet has no transactional MERGE; on a
        # cluster this is a Delta MERGE with the same logical plan.
        tmp = self.state_dir + "._tmp"
        new_state.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.state_dir)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        self.apply_batch(batch, batch_id)


def apply_stream(
    stream: DataFrame,
    sink: ParquetStateSink,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Wire a changeset stream into the apply sink.

    available_now=True reproduces ShutdownAfterLastChangeset (A8);
    False tails forever like the reference's default loop."""
    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    stream: DataFrame,
    id_cols: tuple[str, ...] = ("id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once delivery → effectively-once on the stream itself.

    The reference's LR listener replays the full slot history on every
    restart (lr_listener.go:125-127 — the standby LSN never advances),
    so duplicate redelivery is the NORM, not a corner case. This drops
    redeliveries inside the watermark horizon before they reach the
    sink; the idempotent merge sink (LWW on (table, pk, id)) still
    absorbs anything older than the horizon. Dedup state is bounded by
    the watermark — O(distinct ids per horizon), never O(history) — so
    it holds at 100 TB/day stream volume."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def wal2json_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """S1 LR-mode parity: tail a directory of wal2json JSONL messages
    (one document per line, the shape Debezium/wal2json emit) and decode
    to normalized changesets. The decode is pure Catalyst (P4), so the
    streaming plan is scan → narrow codegen stage."""
    from warp_pipe_spark.decoders import decode_wal2json

    raw = spark.readStream.format("text").load(drop_dir)
    return decode_wal2json(raw, message_col="value")


def console_json_stream(stream: DataFrame, checkpoint_dir: str) -> StreamingQuery:
    """S7 stdout JSON sink: one JSON object per changeset
    (internal/cli/warp_pipe.go:101-114)."""
    jsonl = stream.select(F.to_json(F.struct(*stream.columns)).alias("value"))
    return (
        jsonl.writeStream.format("console")
        .option("truncate", "false")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
