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


LOG_LEVELS = ("trace", "debug", "info", "warn", "error", "fatal", "panic")


def parse_log_level(level: str) -> str:
    """config.go ParseLogLevel parity: logrus.ParseLevel's full set —
    trace/debug/info/warn/error/fatal/panic (config_test.go:81-128;
    logrus's own error message lists all seven)."""
    if level not in LOG_LEVELS:
        raise ValueError(f"invalid log level {level!r} (one of {LOG_LEVELS})")
    return level


def _env(name: str, default: str | None = None) -> str | None:
    """envconfig.Process("wp", ...) lookup order: WP_<NAME> first, bare
    <NAME> as fallback (config.go:53-69; config_test.go exercises both
    namespaced and bare forms)."""
    import os

    v = os.environ.get(f"WP_{name}")
    if v is None:
        v = os.environ.get(name)
    return v if v is not None else default


@dataclass
class WarpPipeConfig:
    """Mirrors config.go:14-51 (WP_* env config). Postgres connection
    fields are carried for JDBC sources; the file-based sources ignore
    them."""

    whitelist_tables: Sequence[str] = field(default_factory=tuple)
    ignore_tables: Sequence[str] = field(default_factory=tuple)
    replication_mode: str = "lr"
    replication_slot_name: str | None = None
    start_from_lsn: int | None = None
    start_from_id: int | None = None
    start_from_timestamp: str | None = None
    log_level: str = "info"
    db_host: str | None = None
    db_port: int | None = None
    db_user: str | None = None
    db_pass: str | None = None
    db_name: str | None = None
    db_schema: str | None = None
    schema_col: str = "schema_name"
    table_col: str = "table_name"

    @classmethod
    def from_env(cls) -> "WarpPipeConfig":
        """NewConfigFromEnv parity (config.go:53-75): WP_-namespaced env
        vars with bare-name fallback; comma-separated table lists;
        defaults REPLICATION_MODE=lr, LOG_LEVEL=info."""

        def _list(name: str) -> tuple[str, ...]:
            v = _env(name)
            return tuple(s.strip() for s in v.split(",") if s.strip()) if v else ()

        def _int(name: str) -> int | None:
            v = _env(name)
            return int(v) if v is not None else None

        return cls(
            whitelist_tables=_list("WHITELIST_TABLES"),
            ignore_tables=_list("IGNORE_TABLES"),
            replication_mode=_env("REPLICATION_MODE", "lr"),
            replication_slot_name=_env("REPLICATION_SLOT_NAME"),
            start_from_lsn=_int("START_FROM_LSN"),
            start_from_id=_int("START_FROM_ID"),
            start_from_timestamp=_env("START_FROM_TIMESTAMP"),
            log_level=parse_log_level(_env("LOG_LEVEL", "info")),
            db_host=_env("DB_HOST"),
            db_port=_int("DB_PORT"),
            db_user=_env("DB_USER"),
            db_pass=_env("DB_PASS"),
            db_name=_env("DB_NAME"),
            db_schema=_env("DB_SCHEMA"),
        )


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
