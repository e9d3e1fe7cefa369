"""WarpPipe facade — the library contract of the reference
(`NewWarpPipe` → `Open` → `ListenForChanges` → consumer loop → `Close`,
warp_pipe.go:40-155, demo usage build/demo-service/main.go:30-69).

Spark restatement: construction wires a source (changeset drop-dir,
an existing DataFrame, or a JDBC audit table), `changes()` returns the
live streaming DataFrame with the whitelist → ignore pipeline applied
(stage order fixed, ignore wins — warp_pipe.go:95-144), and
`changes_batch()` is the bounded backfill (StartFromID/Timestamp,
notify_listener.go:20-32). `Close` has no analog: streaming queries own
their lifecycle via the returned handles.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from warp_pipe_spark.changeset import AUDIT_LOG_SCHEMA
from warp_pipe_spark.filters import ignore_tables, whitelist_tables
from warp_pipe_spark.pipeline import Pipeline
from warp_pipe_spark.store import ChangesetStore
from warp_pipe_spark.streaming import changeset_stream


@dataclass
class WarpPipeConfig:
    """Mirrors config.go:14-51 (WP_* env config) minus Postgres
    connection detail, which lives in the source options."""

    whitelist_tables: Sequence[str] = field(default_factory=tuple)
    ignore_tables: Sequence[str] = field(default_factory=tuple)
    start_from_id: int | None = None
    start_from_timestamp: str | None = None
    schema_col: str = "schema_name"
    table_col: str = "table_name"


class WarpPipe:
    def __init__(
        self,
        spark: SparkSession,
        config: WarpPipeConfig | None = None,
        *,
        drop_dir: str | None = None,
        log_df: DataFrame | None = None,
        schema=None,
        pipeline: Pipeline | None = None,
    ):
        if (drop_dir is None) == (log_df is None):
            raise ValueError("exactly one of drop_dir / log_df is required")
        self.spark = spark
        self.config = config or WarpPipeConfig()
        self.drop_dir = drop_dir
        self.log_df = log_df
        self.schema = schema or AUDIT_LOG_SCHEMA
        self.pipeline = pipeline

    # -- the two listen modes -------------------------------------------

    def changes(self) -> DataFrame:
        """Streaming changeset DataFrame (S1/S2 ListenForChanges) with
        the built-in filter stages applied in reference order."""
        if self.drop_dir is None:
            raise ValueError("streaming changes() requires a drop_dir source")
        stream = changeset_stream(self.spark, self.drop_dir, schema=self.schema)
        return self._apply_stages(stream)

    def changes_batch(self) -> DataFrame:
        """Bounded backfill: StartFromID/StartFromTimestamp replay
        (S3/S4) with the same filter stages."""
        df = self.log_df
        if df is None:
            df = self.spark.read.schema(self.schema).parquet(self.drop_dir)
        store = ChangesetStore(df)
        if self.config.start_from_id is not None:
            df = store.since_id(self.config.start_from_id)
        elif self.config.start_from_timestamp is not None:
            df = store.since_timestamp(self.config.start_from_timestamp)
        return self._apply_stages(df)

    # -- internals -------------------------------------------------------

    def _apply_stages(self, df: DataFrame) -> DataFrame:
        c = self.config
        df = whitelist_tables(df, list(c.whitelist_tables), c.schema_col, c.table_col)
        df = ignore_tables(df, list(c.ignore_tables), c.schema_col, c.table_col)
        if self.pipeline is not None:
            df = self.pipeline.run(df)
        return df
