"""ChangesetStore — queries over the replayable changeset log.

Parity: internal/store/changeset_store.go (S3-S6, G1, G2, O1, O2).

The reference pages through Postgres with `LIMIT 500 OFFSET k` loops
(changeset_store.go:17, :128-149 — O(n²) rescans and a skip/dup race we
deliberately do not reproduce, SURVEY.md §4). In Spark the log is a
partitioned parquet/Delta table: an ordered replay is a partitioned scan
with the predicate pushed into the file source — no pagination needed at
any scale. Retention "DELETE WHERE" becomes an anti-filter rewrite of
the log (or a Delta DELETE where available).
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ChangesetStore:
    """Wraps the audit-log DataFrame (AUDIT_LOG_SCHEMA-shaped or the
    typed/decoded variant — anything with `id` and `ts` columns)."""

    def __init__(self, df: DataFrame, id_col: str = "id", ts_col: str = "ts"):
        self.df = df
        self.id_col = id_col
        self.ts_col = ts_col

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str, **kw) -> "ChangesetStore":
        return cls(spark.read.parquet(path), **kw)

    # -- backfill / replay (S3, S4) ---------------------------------------

    def since_id(self, start_id: int) -> DataFrame:
        """S3 GetSinceID (changeset_store.go:114-150): `id >= x ORDER BY id`.

        The filter pushes into the parquet scan (min/max row-group
        skipping); the global sort only matters for single-consumer
        replay — for distributed apply, replay() re-orders per key.
        """
        return self.df.filter(F.col(self.id_col) >= F.lit(start_id)).orderBy(self.id_col)

    def since_timestamp(self, ts: "_dt.datetime | str") -> DataFrame:
        """S4 GetSinceTimestamp (changeset_store.go:153-189)."""
        return self.df.filter(F.col(self.ts_col) >= F.lit(ts)).orderBy(self.ts_col)

    # -- point lookup (S5) -------------------------------------------------

    def by_id(self, cid: int) -> DataFrame:
        """S5 GetByID (changeset_store.go:67-78): pushed-down point predicate."""
        return self.df.filter(F.col(self.id_col) == F.lit(cid))

    # -- retention (S6) ----------------------------------------------------

    def delete_before_id(self, cid: int) -> DataFrame:
        """S6 DeleteBeforeID (changeset_store.go:192-198): returns the
        retained log (anti-filter rewrite; the reference's exec is itself
        a no-op stub, changeset_store.go:104-106)."""
        return self.df.filter(F.col(self.id_col) >= F.lit(cid))

    def delete_before_timestamp(self, ts: "_dt.datetime | str") -> DataFrame:
        """S6 DeleteBeforeTimestamp (changeset_store.go:200-207)."""
        return self.df.filter(F.col(self.ts_col) >= F.lit(ts))


    # -- stats (G1, G2, A8) ------------------------------------------------

    def stats(self) -> DataFrame:
        """G1 count (axon_schema.go:52-60) + G2 latest id
        (warp_pipe.go:172 `ORDER BY id DESC LIMIT 1` → max).
        One partial-aggregated pass, no sort."""
        return self.df.agg(
            F.count(self.id_col).alias("changeset_count"),
            F.max(self.id_col).alias("max_id"),
        )

    def count(self) -> int:
        return self.df.count()

    def max_id(self) -> "int | None":
        """Highest changeset id, or None on an EMPTY log — callers doing
        resume arithmetic must handle the no-changesets case explicitly
        (the previous `-> int` annotation hid a None return)."""
        row = self.df.agg(F.max(self.id_col).alias("m")).collect()[0]
        return row["m"]

    def is_latest_changeset(self, cid: int) -> bool:
        """A8 convergence detector (warp_pipe.go:169-190). In streaming,
        `trigger(availableNow=True)` is the native drain-and-stop."""
        return self.max_id() == cid


# -- retention, executed at the storage layer -------------------------------


def retention_compact(
    spark: SparkSession,
    path: str,
    before_id: int | None = None,
    before_ts: "_dt.datetime | str | None" = None,
    id_col: str = "id",
    ts_col: str = "ts",
) -> dict[str, int]:
    """S6 retention EXECUTED against storage, not just viewed: rewrite
    the parquet changeset store keeping rows at/after the horizon, then
    swap the rewritten dir in. Goes beyond the reference, whose delete
    exec is literally `return nil` (changeset_store.go:104-106) — its
    audit log grows forever.

    Swap discipline: write to `<path>._compact`, move the old dir to
    `<path>._trash`, rename the new dir in, then drop the trash. This
    is a single-writer maintenance job (retention is cron-shaped, not
    concurrent with appends); a crash between the two renames leaves
    the full dataset at `._trash`, and `io.recover_swap` (called on
    entry) restores it — the data always exists in full at exactly one
    of the two locations. On a cluster the same statement is a Delta
    `DELETE WHERE id < h` with ACID semantics and the identical
    anti-filter plan.

    Returns {"kept": n, "deleted": m}.
    """
    from warp_pipe_spark.io import recover_swap

    recover_swap(path)
    if (before_id is None) == (before_ts is None):
        raise ValueError("exactly one of before_id / before_ts required")
    df = spark.read.parquet(path)
    # NULL-safe keep: a row whose retention column is NULL cannot be
    # proven old — it must be KEPT and counted. A bare `col >= lit`
    # is NULL for it, which would destroy the row in the rewrite while
    # counting it in NEITHER 'kept' nor 'deleted' (silent, unaccounted
    # data loss from a maintenance job).
    col = F.col(id_col) if before_id is not None else F.col(ts_col)
    bound = F.lit(int(before_id)) if before_id is not None else F.lit(before_ts)
    keep = col.isNull() | (col >= bound)
    counts = df.agg(
        F.count(F.when(keep, 1)).alias("kept"),
        F.count(F.when(~keep, 1)).alias("deleted"),
    ).first()
    tmp, trash = path + "._compact", path + "._trash"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    df.filter(keep).write.mode("overwrite").parquet(tmp)
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash)
    return {"kept": int(counts["kept"]), "deleted": int(counts["deleted"])}
