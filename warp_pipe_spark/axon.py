"""Axon facade — the sync daemon (axon.go:49-270): replay a source
changeset log onto a target table state, then verify convergence.

Spark restatement of the Run loop (axon.go:143-173):
  - full-history replay + live tail = backfill batch union streaming
    foreachBatch merge (the reference starts NotifyListener at
    StartFromID(0), axon.go:112);
  - per-change insert/update/delete routing (axon.go:277-286) becomes
    the set-based last-writer-wins fold (apply.replay);
  - ShutdownAfterLastChangeset → trigger(availableNow=True);
  - Verify (axon.go:181-270) → per-table digest comparison.

Sequence sync (A5/A6) is Postgres-specific; `sequence_report` computes
the values a JDBC sink adapter would `setval` — one aggregate pass, not
the reference's per-row round-trips.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from warp_pipe_spark.apply import replay
from warp_pipe_spark.catalog import sequence_sync_values
from warp_pipe_spark.pipeline import Pipeline
from warp_pipe_spark.streaming import ParquetStateSink, apply_stream, changeset_stream


class Axon:
    def __init__(
        self,
        spark: SparkSession,
        pk_cols: Sequence[str] = ("pk",),
        id_col: str = "id",
        kind_col: str = "action",
        table_col: str = "table_name",
        pipeline: Pipeline | None = None,
    ):
        self.spark = spark
        self.pk_cols = list(pk_cols)
        self.id_col = id_col
        self.kind_col = kind_col
        self.table_col = table_col
        self.pipeline = pipeline

    # -- batch run (ShutdownAfterLastChangeset semantics) ---------------

    def run_batch(self, changesets: DataFrame) -> DataFrame:
        """One-shot converged apply: the entire log folded to state.
        Equivalent to Run with ShutdownAfterLastChangeset=true over a
        quiesced source."""
        if self.pipeline is not None:
            changesets = self.pipeline.run(changesets)
        return replay(
            changesets, self.pk_cols, self.id_col, self.kind_col, self.table_col
        )

    # -- streaming run ---------------------------------------------------

    def run_stream(
        self,
        drop_dir: str,
        state_dir: str,
        checkpoint_dir: str,
        schema=None,
        available_now: bool = True,
    ):
        """Tail a changeset drop-dir and maintain target state.
        available_now=True drains and stops (A8); False runs forever."""
        stream = changeset_stream(self.spark, drop_dir, schema=schema)
        if self.pipeline is not None:
            stream = self.pipeline.run(stream)
        sink = ParquetStateSink(
            self.spark,
            state_dir,
            pk_cols=self.pk_cols,
            id_col=self.id_col,
            kind_col=self.kind_col,
            table_col=self.table_col,
        )
        return apply_stream(stream, sink, checkpoint_dir, available_now=available_now)

    # -- verification (axon.go:181-270) ---------------------------------

    def verify(
        self,
        source_state: DataFrame,
        target_state: DataFrame,
        cols: Sequence[str] | None = None,
        scalable: bool = True,
    ) -> dict[str, bool]:
        """Per-table digest compare; returns {table: converged}.

        Mirrors Axon.Verify's per-table loop but in two aggregate
        passes total (groupBy table) instead of one query per table."""
        cols = list(cols or source_state.columns)
        if self.table_col not in cols:
            cols = [self.table_col] + cols

        def per_table(df: DataFrame) -> dict[str, tuple]:
            value_cols = [c for c in cols if c != self.table_col]
            from pyspark.sql import functions as F

            from warp_pipe_spark.verify import row_hash

            if scalable:
                h = F.conv(F.substring(row_hash(value_cols), 1, 15), 16, 10).cast(
                    "decimal(38,0)"
                )
                agg = df.select(self.table_col, h.alias("h")).groupBy(self.table_col).agg(
                    F.count("h").alias("n"), F.sum("h").alias("d")
                )
            else:
                h = row_hash(value_cols)
                agg = (
                    df.select(self.table_col, h.alias("h"))
                    .groupBy(self.table_col)
                    .agg(
                        F.count("h").alias("n"),
                        F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("d"),
                    )
                )
            return {r[self.table_col]: (r["n"], r["d"]) for r in agg.collect()}

        s, t = per_table(source_state.select(*cols)), per_table(target_state.select(*cols))
        return {tbl: s.get(tbl) == t.get(tbl) for tbl in sorted(set(s) | set(t))}

    def sequence_report(self, state: DataFrame, serial_cols: Sequence[str]) -> dict[str, int]:
        """A5: the setval targets a JDBC sink would emit after apply."""
        return sequence_sync_values(state, serial_cols)

    def sync_sequences(
        self,
        state: DataFrame,
        seq_map,
        executor,
        orphan_last_values=None,
    ) -> list[str]:
        """A5/A6 execution: emit the setval statement list from applied
        state (one aggregation per table, not one round-trip per row —
        axon_schema.go:137-163 collapsed to its fixpoint) and run it
        against the target via `executor(stmt)`. Returns the statements
        executed, in order (column sequences first, then orphans)."""
        from warp_pipe_spark.sequences import (
            column_setval_statements,
            execute_sequence_sync,
            orphan_setval_statements,
        )

        stmts = column_setval_statements(state, seq_map, table_col=self.table_col)
        if orphan_last_values:
            stmts += orphan_setval_statements(orphan_last_values)
        return execute_sequence_sync(executor, stmts)
