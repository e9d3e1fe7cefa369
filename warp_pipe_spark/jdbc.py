"""JDBC adapters for a live Postgres audit table — the in-repo parity
path for S1/S2 capture plus the catalog/DDL surface (S10-S12).

No Postgres exists in the test container, so everything here is
import-safe and connection-free until called with a real url; the
builders return configured readers / SQL text so the shapes are unit-
testable offline.

Scale notes baked in:
  - backfill reads are PARTITIONED on the monotone id
    (partitionColumn/numPartitions) — the replacement for the
    reference's O(n²) LIMIT/OFFSET pagination loop
    (changeset_store.go:128-149);
  - the live tail is a keyset micro-batch poll (`id > last_offset`,
    one indexed range scan per trigger) driven from foreachBatch —
    Spark has no LISTEN/NOTIFY, push becomes poll (SURVEY.md §2.8);
  - predicates push down through the JDBC source (Catalyst emits
    WHERE into the remote query).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

AUDIT_TABLE = "warp_pipe.changesets"


def audit_reader(
    spark: SparkSession,
    url: str,
    table: str = AUDIT_TABLE,
    lower_id: int = 0,
    upper_id: int | None = None,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
):
    """Partitioned JDBC reader over the audit log (S3 backfill path).

    Returns the configured DataFrameReader; .load() connects.

    upper_id is REQUIRED for a parallel backfill: JDBC bounds set the
    partition STRIDE only (they never filter rows), so a degenerate
    (lower, lower+1) range would collapse the read to one task quietly
    streaming the whole table — the exact failure this partitioned
    reader exists to replace. Callers read `SELECT max(id)` first (one
    indexed lookup) and pass it; upper_id=None raises."""
    if upper_id is None:
        raise ValueError(
            "upper_id is required: JDBC partition bounds are stride-only "
            "(never a row filter) — fetch SELECT max(id) first, or the "
            "backfill silently degenerates to a single partition"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", "id")
        .option("lowerBound", str(lower_id))
        .option("upperBound", str(upper_id))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def keyset_query(table: str, last_id: int, limit: int | None = None) -> str:
    """One keyset poll (S2 tail): strictly-after `last_id`, id order.
    Indexed range scan — no OFFSET, so the reference's pagination race
    (changeset_store.go:128-149, rows shifting between OFFSET pages)
    cannot happen.

    Concurrent-writer caveat (inherent to ANY id-keyset tail, ours and
    the reference's alike): BIGSERIAL ids are assigned at nextval time,
    not commit time, so a still-uncommitted row with a LOWER id than an
    already-committed one becomes visible only after the offset has
    passed it — and is then permanently skipped. Mitigations: poll with
    a safety horizon (confirm only ids older than the oldest in-flight
    transaction), or use the gap-free logical-replication tail
    (lr_client.py), which orders by commit LSN. The LR path is this
    repo's recommended live tail; the keyset poll is the
    Spark-has-no-LISTEN/NOTIFY fallback.

    limit=0 is honored as LIMIT 0 (a zero-row poll), never as
    'unbounded'."""
    q = f"SELECT * FROM {table} WHERE id > {int(last_id)} ORDER BY id"
    if limit is not None:
        q += f" LIMIT {int(limit)}"
    return q


def poll_microbatch(
    spark: SparkSession,
    url: str,
    last_id: int,
    table: str = AUDIT_TABLE,
    limit: int = 100_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Fetch the next micro-batch of changesets after `last_id`."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", keyset_query(table, last_id, limit))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def keyset_fetch(
    url: str,
    table: str = AUDIT_TABLE,
    properties: dict[str, str] | None = None,
):
    """Fetch factory for streaming.KeysetPoller backed by a live JDBC
    audit table: each poll round is one indexed keyset range scan
    (poll_microbatch), the S2 tail loop of notify_listener.go:87-129."""

    def fetch(spark: SparkSession, last_id: int, limit: int) -> DataFrame:
        return poll_microbatch(
            spark, url, last_id, table=table, limit=limit, properties=properties
        )

    return fetch


# --- DDL text (S10/S11 setup/teardown; shapes per FIXTURES.md §2) ----------

def check_target_version(server_version: str) -> None:
    """A7 version gate (axon_schema.go:22-50): the MERGE-style upsert
    needs Postgres ON CONFLICT, introduced in 9.5 — reject `9.x` with
    x < 5. Callers feed the result of `SHOW server_version` from their
    JDBC connection; raises ValueError on unsupported targets."""
    import re as _re

    def _lead_int(txt: str) -> int:
        m = _re.match(r"\d+", txt)
        if not m:
            raise ValueError(f"unparseable server_version: {server_version!r}")
        return int(m.group())

    # leading digit runs: '9.5beta1' is 9.5 (supported), '10beta1' is
    # 10 — a bare int() would crash on the suffix, and mapping a
    # suffixed minor to 0 would wrongly reject a 9.5 prerelease
    parts = server_version.split(".")
    major = _lead_int(parts[0])
    minor = _lead_int(parts[1]) if len(parts) > 1 else 0
    if major == 9 and minor < 5:
        raise ValueError(f"Target DB Unsupported Version: {server_version}")


def setup_ddl(audit_schema: str = "warp_pipe") -> list[str]:
    """DDL a driver-side JDBC connection executes to provision the
    audit log: schema, changesets table, replay indexes. (The
    reference additionally installs a row_to_json AFTER-trigger per
    captured table; trigger bodies are target-dialect-specific and
    belong to the deployment, not the engine.)"""
    t = f"{audit_schema}.changesets"
    return [
        f"CREATE SCHEMA IF NOT EXISTS {audit_schema}",
        (
            f"CREATE TABLE IF NOT EXISTS {t} ("
            "id BIGSERIAL PRIMARY KEY, "
            "ts TIMESTAMPTZ NOT NULL DEFAULT now(), "
            "action TEXT NOT NULL CHECK (action IN ('INSERT','UPDATE','DELETE')), "
            "schema_name TEXT NOT NULL, "
            "table_name TEXT NOT NULL, "
            "relid BIGINT, "
            "new_values JSON, "
            "old_values JSON)"
        ),
        f"CREATE INDEX IF NOT EXISTS changesets_ts_idx ON {t} (ts)",
        f"CREATE INDEX IF NOT EXISTS changesets_action_idx ON {t} (action)",
        f"CREATE INDEX IF NOT EXISTS changesets_table_idx ON {t} (table_name)",
    ]


def teardown_ddl(audit_schema: str = "warp_pipe") -> list[str]:
    """S11 (db/schema.go:32-39)."""
    return [f"DROP SCHEMA IF EXISTS {audit_schema} CASCADE"]


def slot_lag_query(slot: str | None = None) -> str:
    """Replication-slot health: per-slot restart/confirmed LSNs plus
    the WAL bytes the slot is RETAINING (pg_current_wal_lsn minus
    restart_lsn) — the number an operator alarms on, because a stalled
    consumer's slot pins WAL until the disk fills. active/active_pid
    say whether a consumer is attached right now. The reference ships
    no monitoring surface; this is the query its operators end up
    writing by hand."""
    where = f"WHERE slot_name = '{slot}'" if slot else ""
    return (
        "SELECT slot_name, plugin, slot_type, active, active_pid, "
        "restart_lsn::TEXT AS restart_lsn, "
        "confirmed_flush_lsn::TEXT AS confirmed_flush_lsn, "
        "pg_wal_lsn_diff(pg_current_wal_lsn(), restart_lsn)::BIGINT "
        "AS retained_wal_bytes, "
        "pg_wal_lsn_diff(pg_current_wal_lsn(), confirmed_flush_lsn)"
        "::BIGINT AS confirm_lag_bytes "
        f"FROM pg_replication_slots {where}".rstrip()
    )


def snapshot_jdbc_options(
    table: str,
    snapshot_name: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Spark JDBC reader options for a PARALLEL backfill pinned to an
    exported snapshot (lr_client.create_slot_with_snapshot): every
    partition's connection runs `sessionInitStatement` before its
    range query, attaching the SAME snapshot — the pg_dump --jobs
    mechanism, so N concurrent partition scans all observe exactly the
    slot's consistent point and the subsequent tail has zero
    gap/overlap. This is the 100 TB shape of the bootstrap: the
    driver-side snapshot_read is for small control tables; a fact
    table backfills as `spark.read.format("jdbc").options(**these)`.

    Caveat (documented, driver-specific): the init statement opens the
    transaction the partition query must run inside, which requires
    the JDBC driver to not autocommit between the init statement and
    the query — for the PostgreSQL driver Spark issues them on the
    same connection and the standard consistent-read recipe is exactly
    this statement pair. The exporting walsender must keep its
    transaction open (no further commands) until every partition has
    BEGUN its read.
    """
    opts = {
        "dbtable": table,
        "sessionInitStatement": (
            "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
            f"SET TRANSACTION SNAPSHOT '{snapshot_name}'"
        ),
    }
    if partition_column is not None:
        if None in (lower_bound, upper_bound, num_partitions):
            raise ValueError(
                "partition_column requires lower_bound, upper_bound "
                "and num_partitions (Spark JDBC range-partitioning "
                "contract)"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def tables_list_query(schemas: Sequence[str]) -> str:
    """S12 discovery: enumerate candidate tables per schema."""
    in_list = ", ".join(f"'{s}'" for s in schemas)
    return (
        "SELECT table_schema AS schema_name, table_name "
        "FROM information_schema.tables "
        f"WHERE table_type = 'BASE TABLE' AND table_schema IN ({in_list})"
    )


def primary_keys_query(schemas: Sequence[str]) -> str:
    """A4/G4 PK discovery feed for catalog.primary_keys()."""
    in_list = ", ".join(f"'{s}'" for s in schemas)
    return (
        "SELECT kcu.table_schema, kcu.table_name, kcu.column_name, "
        "kcu.ordinal_position "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "  ON tc.constraint_name = kcu.constraint_name "
        " AND tc.table_schema = kcu.table_schema "
        # constraint names are unique per TABLE, not per schema: without
        # this, table a's PRIMARY KEY row cross-matches table b's
        # same-named UNIQUE constraint columns and the PK map corrupts
        " AND tc.table_name = kcu.table_name "
        "WHERE tc.constraint_type = 'PRIMARY KEY' "
        f"  AND tc.table_schema IN ({in_list})"
    )
