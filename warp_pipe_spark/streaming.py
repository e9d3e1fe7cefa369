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

import abc
import json
import os
import shutil
from collections.abc import Sequence
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

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


class StateCorruptError(RuntimeError):
    """State exists but cannot be trusted — distinct from 'no state yet'
    so a reader never silently restarts from empty on a damaged store."""


class StateSink(abc.ABC):
    """Contract shared by every micro-batch state sink the KeysetPoller
    (or foreachBatch) can drive. Concrete sinks must expose an `id_col`
    attribute (the keyset/ordering column) and implement `apply_batch`.

    `batch_stats` exists on the BASE class precisely so that adding a
    fast path to one sink can never again break another (the r14
    `MergeStateSink` AttributeError): the default derives the poller's
    offset watermark with one aggregate job and returns `touched=None`,
    meaning "I have no routing hint — call `apply_batch(batch,
    batch_id)` plainly and let the sink derive its own touched set".
    Sinks that CAN fold routing into the same job (ParquetStateSink)
    override it and return a non-None `touched`, and must then accept
    `apply_batch(..., touched=...)`."""

    id_col: str

    @abc.abstractmethod
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Apply one micro-batch. Must be idempotent under redelivery."""

    def batch_stats(
        self, batch: DataFrame
    ) -> "tuple[list[tuple[str, int | None]] | None, int | None, int]":
        """(touched, max_id, n_rows) over `batch` in one Spark job.
        touched=None = no routing hint (default); max_id=None = empty
        batch. Overrides must keep max_id/n_rows covering EVERY row
        with a non-null id — the poller's offset must advance past rows
        the sink cannot apply, or a poison row stalls the tail forever.

        Collected via `observe` + a noop-sink write, not `.agg()`: the
        metrics ride along the scan itself, so there is no
        single-partition exchange and the whole derivation is ONE
        exchange-free job (r15; the agg form was two jobs per round
        under AQE — the shuffle-stage job plus the post-shuffle
        collect)."""
        obs = Observation()
        batch.observe(
            obs,
            F.max(F.col(self.id_col)).alias("_mx"),
            F.count(F.col(self.id_col)).alias("_n"),
        ).write.format("noop").mode("overwrite").save()
        vals = obs.get
        return None, vals["_mx"], int(vals["_n"])

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        self.apply_batch(batch, batch_id)


class ParquetStateSink(StateSink):
    """foreachBatch apply target: maintains replayed state at `state_dir`.

    Layout — versioned per-table dirs behind an atomically-swapped
    pointer (the same commit discipline as Delta's `_last_checkpoint`):

        state_dir/_POINTER.json         {"batch_id": N, "tables":
                                         {"users": "tables/users/v_3", ...}}
        state_dir/tables/<t>/v_<batch>  parquet rows for one table

    With `n_buckets=B`, each table's state is further split by
    `pmod(hash(pk), B)` — pointer keys become "users#b5" and dirs
    `tables/users/v_<batch>/_wpb=5` (all touched buckets of a table are
    laid down by ONE partitionBy write; a bucket emptied by deletes
    loses its pointer entry) — so a micro-batch touching k keys of
    one hot table reads+rewrites O(k/B of its state), not the whole
    table. This is axon's per-row upsert (axon_sql.go:77-106) at scale
    without Delta: bucket count fixes the rewrite granularity the way a
    MERGE's file-skipping would.

    Guarantees:
      - ATOMIC: new table versions are fully written BEFORE the pointer
        is replaced with os.replace (atomic on POSIX); a crash at any
        point leaves the previous pointer valid. No torn state, ever.
      - INCREMENTAL: only tables (buckets, if bucketed) present in the
        micro-batch are read, merged, and rewritten — per-batch cost is
        O(touched state), not O(all state). Untouched files stay closed.
        Restricting the merge to touched buckets is safe because the
        bucket is a pure function of the pk: rows outside a touched
        bucket cannot be affected by any changeset in the batch.
      - IDEMPOTENT: re-running a micro-batch converges to the same
        state (merge_batch is last-writer-wins on (table, pk, id)), so
        checkpoint replay after a crash is safe.

    LOCAL-FS CONTRACT: the staged write commits via `os.replace` /
    `shutil.rmtree` / `os.listdir` against `state_dir`, so the state
    dir must be a driver-local path on one POSIX filesystem (the
    fixtures use tmpfs). There the per-batch renames are metadata-only
    and `os.replace` is atomic. On HDFS the same sequencing holds via
    FileSystem.rename; on an OBJECT STORE (s3://, gs://) renames are
    COPY+DELETE — neither atomic nor metadata-only — so this sink does
    not apply there: swap the parquet rewrite for a Delta/Iceberg MERGE
    commit, which keeps the identical plan shape (keyed merge per
    touched table) behind the table format's own atomic commit.
    """

    POINTER = "_POINTER.json"
    POINTER_LOG = "_POINTER_LOG.jsonl"

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        pk_cols: Sequence[str] = ("pk",),
        id_col: str = "id",
        kind_col: str = "action",
        table_col: str = "table_name",
        n_buckets: int | None = None,
        retain_history: bool = False,
        truncate_kinds: "tuple[str, ...] | None" = None,
    ):
        if n_buckets is not None and n_buckets < 1:
            # 0 would round-trip through the pointer as falsy and collide
            # with the unbucketed (None) layout on read-back
            raise ValueError(f"n_buckets must be >= 1 or None, got {n_buckets}")
        self.spark = spark
        self.state_dir = state_dir
        self.pk_cols = list(pk_cols)
        self.id_col = id_col
        self.kind_col = kind_col
        self.table_col = table_col
        self.n_buckets = n_buckets
        # retain_history=True: superseded version dirs are KEPT and every
        # committed pointer is appended to a log, enabling
        # read_state_asof(batch_id) time travel (Delta-style). Storage
        # then grows with change volume until externally vacuumed.
        self.retain_history = retain_history
        # truncate_kinds: opt in (pass apply.TRUNCATE_KINDS) when the
        # stream can carry `truncate` changesets — only the pgoutput
        # source emits them (one per truncated table); audit-trigger and
        # keyset sources cannot. A truncate then clears the table via
        # merge_batch's table-clear fold, and the incremental read set
        # is WIDENED to every committed bucket of the truncated table
        # (the clear must reach buckets the batch's own rows don't
        # touch). Off by default: truncate-free sources keep the
        # O(touched)-buckets contract with zero extra per-batch work.
        self.truncate_kinds = tuple(truncate_kinds) if truncate_kinds else None

    # -- pointer ---------------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, self.POINTER)

    def _read_meta(self) -> dict | None:
        """Full pointer metadata (tables + committed schema), or None if
        no committed state yet; StateCorruptError = state that exists
        but can't be read (never silently treated as empty)."""
        path = self._pointer_path()
        if not os.path.exists(path):
            tables_dir = os.path.join(self.state_dir, "tables")
            if os.path.isdir(tables_dir) and os.listdir(tables_dir):
                raise StateCorruptError(
                    f"state data exists under {tables_dir} but the pointer "
                    f"{path} is missing"
                )
            return None
        try:
            with open(path) as f:
                meta = json.load(f)
            committed_buckets = meta.get("n_buckets") or None
            if committed_buckets != self.n_buckets:
                raise StateCorruptError(
                    f"state at {self.state_dir} was committed with "
                    f"n_buckets={committed_buckets}, sink configured with "
                    f"n_buckets={self.n_buckets} — bucket layout is fixed "
                    "at first commit"
                )
            meta["tables"] = dict(meta["tables"])
            return meta
        except StateCorruptError:
            raise
        except (OSError, ValueError, KeyError, TypeError) as e:
            raise StateCorruptError(f"unreadable state pointer {path}: {e}") from e

    def _read_pointer(self) -> dict[str, str] | None:
        meta = self._read_meta()
        return None if meta is None else meta["tables"]

    def _commit_pointer(
        self,
        tables: dict[str, str],
        batch_id: int,
        schema: dict | None = None,
    ) -> None:
        """`schema` is the state-row schema (StructType.jsonValue) every
        committed version dir is readable UNDER (missing columns in
        older dirs null-fill — the additive-evolution contract): storing
        it lets readers skip parquet schema inference entirely (the
        mergeSchema footer job was one of the five jobs every poll round
        paid, r15). None (first empty commit / pre-r15 pointers) falls
        back to the mergeSchema read."""
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._pointer_path() + f".tmp.{batch_id}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "batch_id": batch_id,
                    "n_buckets": self.n_buckets,
                    "tables": tables,
                    "schema": schema,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path())  # atomic commit point

    @staticmethod
    def _merge_schema_json(
        committed: dict | None, new_state_schema: StructType
    ) -> dict:
        """Widen the committed schema json with the columns this batch's
        merged state carries. The union keeps columns only UNTOUCHED
        tables' dirs still hold (the batch's merge never sees them, but
        the committed reader must), appends genuinely new columns, and
        fails loudly on a same-name/different-type conflict — exactly
        unionByName's contract, extended across tables the batch does
        not touch. Everything is stored nullable: an old dir null-fills
        columns it predates, so no column can be promised non-null."""

        def nullable(dt: dict) -> dict:
            if isinstance(dt, dict):
                if dt.get("type") == "struct":
                    return {
                        "type": "struct",
                        "fields": [
                            {**f, "nullable": True, "type": nullable(f["type"])}
                            for f in dt["fields"]
                        ],
                    }
                if dt.get("type") == "array":
                    return {
                        **dt,
                        "containsNull": True,
                        "elementType": nullable(dt["elementType"]),
                    }
                if dt.get("type") == "map":
                    return {
                        **dt,
                        "valueContainsNull": True,
                        "keyType": nullable(dt["keyType"]),
                        "valueType": nullable(dt["valueType"]),
                    }
            return dt
        new = nullable(new_state_schema.jsonValue())
        if not committed:
            return new
        merged = [dict(f) for f in committed["fields"]]
        by_name = {f["name"]: f for f in merged}
        for f in new["fields"]:
            old = by_name.get(f["name"])
            if old is None:
                merged.append(f)
            elif old["type"] != f["type"]:
                raise ValueError(
                    f"state column {f['name']!r} changed type "
                    f"{old['type']!r} -> {f['type']!r} — type changes "
                    "need an explicit migration, not a silent cast"
                )
        return {"type": "struct", "fields": merged}

    def _bucket_col(self):
        return F.pmod(F.hash(*[F.col(c) for c in self.pk_cols]), F.lit(self.n_buckets))

    BUCKET_PART = "_wpb"  # partition-dir column for bucketed writes
    TABLE_PART = "_wpt"  # staging partition-dir column (one write/batch)
    #: Spark writes null/empty partition values under this marker dir.
    #: table_name NULL rows are filtered before the write, so within a
    #: staging dir the marker can only mean the empty-string table.
    HIVE_DEFAULT = "__HIVE_DEFAULT_PARTITION__"

    def _key(self, table: str, bucket: "int | None") -> str:
        return table if bucket is None else f"{table}#b{bucket}"

    def _reject_marker_tables(self, tables) -> None:
        """A table literally named __HIVE_DEFAULT_PARTITION__ would be
        written UNESCAPED by Spark's partitioned write, colliding with
        the marker for the empty-string table — its state would be
        silently filed under the wrong pointer key (ADVICE r14). Reject
        it loudly up front; no real source emits that name."""
        for t in tables:
            if t == self.HIVE_DEFAULT:
                raise ValueError(
                    f"table name {t!r} collides with Spark's default-"
                    "partition marker and cannot be stored by "
                    "ParquetStateSink — rename the table upstream"
                )

    def _table_rel(self, table: str, batch_id: int, bucket: "int | None" = None) -> str:
        base = f"tables/{quote(table, safe='')}/v_{batch_id}"
        if bucket is not None:
            # one partitionBy write per table lays every touched bucket
            # under the same version dir; each bucket's pointer entry
            # references its partition subdir directly (reading the
            # subdir yields the data columns only — the partition column
            # lives in the dir name, not the files)
            base += f"/{self.BUCKET_PART}={bucket}"
        return base

    def _fresh_table_rel(
        self, table: str, batch_id: int, pointer: dict[str, str]
    ) -> str:
        """Version-dir rel for this delivery that never clobbers a dir a
        committed reader references. The pre-r15 shape rmtree'd the
        canonical `v_<batch>` dir on a REDELIVERED batch_id BEFORE the
        new pointer was committed — if the committed pointer referenced
        that exact dir (commit landed, offset didn't, crash, replay), a
        crash between rmtree and commit left the pointer pointing at
        deleted state, violating the class guarantee that 'a crash at
        any point leaves the previous pointer valid'. Now: a colliding
        dir that nothing references (orphan of a delivery that died
        pre-commit) is cleared and reused; a referenced one is left
        untouched and this delivery lands under `v_<batch>.r<n>` — it
        becomes garbage only AFTER the pointer commit, where the
        existing post-commit sweep (or retain_history) handles it."""
        rel = self._table_rel(table, batch_id)
        if not os.path.lexists(os.path.join(self.state_dir, rel)):
            return rel
        if rel not in self._referenced_table_rels(pointer):
            shutil.rmtree(
                os.path.join(self.state_dir, rel), ignore_errors=True
            )
            return rel
        n = 1
        while os.path.lexists(os.path.join(self.state_dir, f"{rel}.r{n}")):
            n += 1
        return f"{rel}.r{n}"

    def _referenced_table_rels(self, pointer: dict[str, str]) -> set[str]:
        """Table-level version dirs some committed state still reads:
        the live pointer's, plus every history entry's when
        retain_history (time travel reads them)."""

        def table_level(rel: str) -> str:
            return rel.split("/" + self.BUCKET_PART + "=")[0]

        refs = {table_level(r) for r in pointer.values()}
        if self.retain_history:
            log = os.path.join(self.state_dir, self.POINTER_LOG)
            try:
                with open(log) as f:
                    for line in f:
                        if not line.strip():
                            continue
                        try:
                            entry = json.loads(line)
                        except ValueError:
                            continue
                        refs.update(
                            table_level(r)
                            for r in entry.get("tables", {}).values()
                        )
            except OSError:
                pass
        return refs

    def _read_tables(
        self, rels: Sequence[str], schema: dict | None = None
    ) -> DataFrame | None:
        """ONE multi-path scan over every referenced version dir — a
        per-dir read + N-way union builds an O(N) plan that dominates
        micro-batch latency once batches touch many buckets (a uniform
        5-table × 32-bucket batch = 160 dirs). All dirs share the state
        schema, and each path is its own listing root (leaf dirs, so no
        partition-column discovery).

        `schema` (the pointer's committed schema json, r15) skips
        parquet schema inference outright — no footer is opened before
        the consuming job runs, and version dirs written before a
        source-side ALTER TABLE ADD COLUMN null-fill the missing
        columns (the parquet reader clips files to the requested
        schema). Without it (pre-r15 pointers, history entries) the
        mergeSchema read provides the same null-fill semantics at the
        cost of a footer-scan job."""
        if not rels:
            return None
        dirs = [os.path.join(self.state_dir, r) for r in rels]
        try:
            if schema is not None:
                return self.spark.read.schema(
                    StructType.fromJson(schema)
                ).parquet(*dirs)
            return self.spark.read.option("mergeSchema", "true").parquet(*dirs)
        except Exception as e:
            raise StateCorruptError(
                f"pointer references unreadable state dirs {dirs}: {e}"
            ) from e

    # -- public surface ----------------------------------------------------

    def read_state(self) -> DataFrame | None:
        """Full committed state (all tables), or None if none committed."""
        meta = self._read_meta()
        if not meta or not meta["tables"]:
            return None
        return self._read_tables(
            sorted(meta["tables"].values()), schema=meta.get("schema")
        )

    def batch_stats(
        self, batch: DataFrame
    ) -> "tuple[list[tuple[str, int | None]], int | None, int]":
        """ONE Spark job serving the poller AND the sink's own planning:
        per-(table[, bucket]) max-id/row-count over `batch`. Returns
        (touched, max_id, n_rows) where `touched` is exactly the set
        apply_batch would derive from its distinct-collect (NULL-table
        rows excluded — the sink skips them) while max_id/n_rows cover
        EVERY batch row with a non-null id (the poller's offset must
        advance past rows the sink cannot apply, or a poison row would
        stall the tail forever). Callers that feed the result straight
        back as apply_batch(touched=...) save one full pass over the
        batch per micro-batch — the keyset poller's round cost was two
        batch scans (offset agg + touched distinct) plus the write.

        Collected via `observe` + a noop-sink write (r15): the three
        aggregates (global max/count + the touched collect_set) ride
        along the scan itself, so the whole derivation is ONE
        exchange-free job — the groupBy form was an AQE shuffle-stage
        job plus the post-shuffle collect every round. collect_set is
        bounded by |tables| × n_buckets distinct structs, the same
        cardinality the groupBy shipped."""
        if self.n_buckets:
            tb = F.struct(
                F.col(self.table_col).alias("_t"),
                self._bucket_col().alias("_b"),
            )
        else:
            tb = F.struct(F.col(self.table_col).alias("_t"))
        obs = Observation()
        batch.observe(
            obs,
            F.max(F.col(self.id_col)).alias("_mx"),
            F.count(F.col(self.id_col)).alias("_n"),
            F.collect_set(tb).alias("_tb"),
        ).write.format("noop").mode("overwrite").save()
        vals = obs.get
        touched = sorted(
            (r["_t"], int(r["_b"]) if self.n_buckets else None)
            for r in vals["_tb"]
            if r["_t"] is not None
        )
        self._reject_marker_tables(t for t, _ in touched)
        return touched, vals["_mx"], int(vals["_n"])

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        touched: "list[tuple[str, int | None]] | None" = None,
    ) -> None:
        meta = self._read_meta()
        pointer = None if meta is None else meta["tables"]
        committed_schema = None if meta is None else meta.get("schema")
        if pointer is None:
            # commit an EMPTY pointer before the first version dirs are
            # written: a crash mid-first-batch then leaves (valid empty
            # pointer + orphan version dirs) instead of (data under
            # tables/ with no pointer), which _read_pointer must treat
            # as corruption — without this, dying inside the very first
            # micro-batch wedges every restart behind StateCorruptError
            self._commit_pointer({}, batch_id=-1)
            pointer = {}
        # rows whose routing key is NULL (decoders emit null-struct rows
        # for malformed input lines) cannot be applied to any table —
        # they would poison-pill the batch forever under at-least-once
        # redelivery (sorted()/quote() TypeError on every retry). The
        # pipeline's dead-letter stage is where such rows are surfaced;
        # the sink's contract is to apply the applicable rows.
        batch = batch.filter(F.col(self.table_col).isNotNull())
        truncated: set[str] = set()
        if self.truncate_kinds:
            truncated = {
                r[0]
                for r in batch.filter(
                    F.col(self.kind_col).isin(*self.truncate_kinds)
                )
                .select(self.table_col)
                .distinct()
                .collect()
            }
        if touched is None:
            # no caller-supplied hint — batch_stats on the (already
            # null-filtered) batch derives the same touched set in one
            # exchange-free observe job (r15; the distinct-collect was
            # an AQE shuffle job + collect per direct apply_batch call)
            touched, _, _ = self.batch_stats(batch)
        if truncated:
            # a truncate must clear EVERY committed bucket of its
            # table, including ones no batch row hashes into — widen
            # the read+rewrite set to all of the table's pointer keys
            extra = set()
            for t in truncated:
                for k in pointer:
                    suffix = k[len(t) + 2:]
                    if (
                        self.n_buckets
                        and k.startswith(f"{t}#b")
                        and suffix.isdigit()
                    ):
                        extra.add((t, int(suffix)))
                    elif not self.n_buckets and k == t:
                        extra.add((t, None))
            touched = sorted(set(touched) | extra)
        if not touched:
            return
        self._reject_marker_tables(t for t, _ in touched)
        keys = [self._key(t, b) for t, b in touched]
        # read ONLY the touched tables'/buckets' current state
        old_rels = {k: pointer[k] for k in keys if k in pointer}
        state = (
            self._read_tables(sorted(old_rels.values()), schema=committed_schema)
            if old_rels
            else None
        )
        new_state = merge_batch(
            state, batch, self.pk_cols, self.id_col, self.kind_col,
            self.table_col, truncate_kinds=self.truncate_kinds,
        )
        # ONE write job per micro-batch, whatever it touches (r14; the
        # r13 shape was one job per touched TABLE, and before that one
        # per touched bucket): the merged state — which by construction
        # contains exactly the touched tables/buckets — is laid down in
        # a single partitionBy(_wpt[, _wpb]) write into a staging dir,
        # then each `_wpt=<table>` subtree is renamed to the table's
        # version dir. Steady micro-batch latency on this path is
        # dominated by fixed per-job cost (task dispatch + commit
        # protocol), so a 5-table batch was paying 5× it for no extra
        # bytes; same-filesystem renames are metadata-only. The
        # duplicated `_wpt` partition column (the table column stays a
        # DATA column) keeps the files byte-compatible with the r13
        # layout — readers are unchanged. Because the single write is
        # the only action on `new_state`, the merge no longer needs a
        # persist/unpersist bracket.
        new_pointer = dict(pointer)
        # widen the committed schema with this batch's merged-state
        # columns BEFORE the write: the commit below must describe every
        # dir the new pointer references, including untouched tables'
        # (see _merge_schema_json). Derived from the plan, not a job.
        new_schema = self._merge_schema_json(committed_schema, new_state.schema)
        staging = os.path.join(self.state_dir, f"_staging.{batch_id}")
        shutil.rmtree(staging, ignore_errors=True)
        part_cols = [self.TABLE_PART]
        out = new_state.withColumn(self.TABLE_PART, F.col(self.table_col))
        if self.n_buckets:
            out = out.withColumn(self.BUCKET_PART, self._bucket_col())
            part_cols.append(self.BUCKET_PART)
        out.write.mode("overwrite").partitionBy(*part_cols).parquet(staging)
        written: dict[str, str] = {}  # table -> table-level rel landed
        for d in os.listdir(staging):
            if not d.startswith(self.TABLE_PART + "="):
                continue  # _SUCCESS etc.
            enc = d[len(self.TABLE_PART) + 1:]
            t = "" if enc == self.HIVE_DEFAULT else unquote(enc)
            rel = self._fresh_table_rel(t, batch_id, pointer)
            vdir = os.path.join(self.state_dir, rel)
            os.makedirs(os.path.dirname(vdir), exist_ok=True)
            os.replace(os.path.join(staging, d), vdir)
            written[t] = rel
        shutil.rmtree(staging, ignore_errors=True)
        for t, b in touched:
            trel = written.get(t)
            if trel is not None and (
                b is None
                or os.path.isdir(
                    os.path.join(
                        self.state_dir, f"{trel}/{self.BUCKET_PART}={b}"
                    )
                )
            ):
                new_pointer[self._key(t, b)] = (
                    trel if b is None else f"{trel}/{self.BUCKET_PART}={b}"
                )
            else:
                # every row of the table/bucket was deleted: no
                # partition dir was written — empty state is NO pointer
                # entry (a dir with no parquet files would be
                # unreadable on restart)
                new_pointer.pop(self._key(t, b), None)
        self._commit_pointer(new_pointer, batch_id, schema=new_schema)
        if self.retain_history:
            # history entry AFTER the commit point: a crash between the
            # two leaves the newest commit missing from the log (asof
            # falls back one batch) but never logs an uncommitted
            # pointer. Current state is always read_state(), log-free.
            with open(os.path.join(self.state_dir, self.POINTER_LOG), "a") as f:
                json.dump(
                    {
                        "batch_id": batch_id,
                        "tables": new_pointer,
                        "schema": new_schema,
                    },
                    f,
                )
                f.write("\n")
                f.flush()
                os.fsync(f.fileno())
            return
        # superseded versions are garbage after the commit point
        for k, rel in old_rels.items():
            if new_pointer.get(k) != rel:
                shutil.rmtree(os.path.join(self.state_dir, rel), ignore_errors=True)

    def vacuum_history(self, keep_last: int = 10) -> int:
        """Bound time-travel storage (the VACUUM to retain_history's
        time travel): keep only the newest `keep_last` history entries,
        delete version dirs referenced EXCLUSIVELY by dropped entries
        (a dir shared with any surviving entry — an untouched table's
        version — stays), and rewrite the log atomically. Returns the
        number of dirs deleted. The current pointer is always safe: its
        rels appear in the newest entry."""
        if not self.retain_history:
            raise ValueError("vacuum_history requires retain_history=True")
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        log = os.path.join(self.state_dir, self.POINTER_LOG)
        if not os.path.exists(log):
            return 0
        with open(log) as f:
            entries = [json.loads(x) for x in f if x.strip()]
        if len(entries) <= keep_last:
            return 0
        dropped, kept = entries[:-keep_last], entries[-keep_last:]
        live = {rel for e in kept for rel in e["tables"].values()}
        dead = {
            rel for e in dropped for rel in e["tables"].values()
        } - live
        for rel in sorted(dead):
            shutil.rmtree(os.path.join(self.state_dir, rel), ignore_errors=True)
        tmp = log + ".tmp"
        with open(tmp, "w") as f:
            for e in kept:
                json.dump(e, f)
                f.write("\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, log)
        return len(dead)

    def read_state_asof(self, batch_id: int) -> "DataFrame | None":
        """Time travel: full state as of the LAST commit with
        batch_id <= `batch_id` (None if no commit that old). Requires
        retain_history=True — each history entry is a complete pointer
        (untouched tables keep their old version rels), so as-of reads
        are one multi-path scan, same cost shape as read_state()."""
        if not self.retain_history:
            raise ValueError("read_state_asof requires retain_history=True")
        log = os.path.join(self.state_dir, self.POINTER_LOG)
        if not os.path.exists(log):
            return None
        chosen = None
        with open(log) as f:
            for line in f:
                if not line.strip():
                    continue
                entry = json.loads(line)
                if entry["batch_id"] <= batch_id:
                    chosen = entry
        if chosen is None or not chosen["tables"]:
            return None
        return self._read_tables(
            sorted(chosen["tables"].values()), schema=chosen.get("schema")
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        self.apply_batch(batch, batch_id)


class KeysetPoller:
    """S2 live tail as a runnable micro-batch loop — the push→poll
    translation of the reference's LISTEN/NOTIFY listener
    (notify_listener.go:87-129): each round fetches the keyset slice
    strictly after the committed offset (`id > last_id ORDER BY id`,
    the StartFromID contract), applies it through the idempotent state
    sink, then durably advances the offset file.

    Delivery contract: the offset commits AFTER the sink commit, so a
    crash between the two redelivers the batch on restart —
    at-least-once transport, absorbed by the sink's last-writer-wins
    merge into an exactly-once observable effect (the same upgrade the
    reference gets from its dup-skip, axon_sql.go:133-144, but proven
    by construction instead of per-row error handling).

    `fetch(spark, last_id, limit)` abstracts the source:
    `jdbc.keyset_fetch` for a live Postgres audit table (one indexed
    range scan per round), `parquet_keyset_fetch` / a DataFrame closure
    for file-backed tables (tests, replays). Because each round is
    bounded by `limit`, memory is O(batch) regardless of backlog size —
    a poller pointed at a 100 TB backlog just takes more rounds.
    """

    def __init__(
        self,
        spark: SparkSession,
        fetch,
        sink: ParquetStateSink,
        offset_path: str,
        start_from_id: int = 0,
        limit: int = 100_000,
    ):
        self.spark = spark
        self.fetch = fetch
        self.sink = sink
        self.offset_path = offset_path
        self.start_from_id = start_from_id
        self.limit = limit

    def committed_offset(self) -> int:
        if not os.path.exists(self.offset_path):
            return self.start_from_id
        try:
            with open(self.offset_path) as f:
                return int(json.load(f)["last_id"])
        except (OSError, ValueError, KeyError, TypeError) as e:
            raise StateCorruptError(
                f"unreadable offset file {self.offset_path}: {e}"
            ) from e

    def _commit_offset(self, last_id: int) -> None:
        tmp = self.offset_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_id": last_id}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.offset_path)

    def poll_once(self) -> int:
        """One micro-batch round; returns rows applied (0 = drained)."""
        last = self.committed_offset()
        batch = self.fetch(self.spark, last, self.limit).persist()
        try:
            # one job yields the offset watermark AND (for sinks with
            # the fast path) the routing hint (r14: the separate
            # max/count agg plus the sink's distinct-collect were two
            # full batch passes of pure fixed job cost per round).
            # Every StateSink has batch_stats — the base class default
            # is the plain offset aggregate with touched=None, meaning
            # "no hint, call apply_batch plainly" (MergeStateSink folds
            # its own touched set from the post-truncate winners). The
            # getattr covers duck-typed sinks that predate the ABC.
            stats = getattr(self.sink, "batch_stats", None)
            if stats is not None:
                touched, mx, n = stats(batch)
            else:
                top = batch.agg(
                    F.max("id").alias("mx"), F.count("id").alias("n")
                ).first()
                touched, mx, n = None, top["mx"], int(top["n"])
            if mx is None:
                return 0
            if touched is not None:
                # high-watermark id doubles as the sink's version tag —
                # monotone per keyset contract, stable across redelivery
                self.sink.apply_batch(batch, batch_id=int(mx), touched=touched)
            else:
                self.sink.apply_batch(batch, batch_id=int(mx))
            self._commit_offset(int(mx))
            return int(n)
        finally:
            batch.unpersist()

    def run_until_drained(self, max_rounds: int = 1_000_000) -> int:
        """A8 ShutdownAfterLastChangeset: poll until a round is empty."""
        total = 0
        for _ in range(max_rounds):
            n = self.poll_once()
            if n == 0:
                return total
            total += n
        return total


def parse_notify_payload(payload: str) -> tuple[int, str]:
    """The reference trigger's pg_notify payload is
    '<changeset_id>_<timestamp>' (db/sql.go:70); split and parse the
    id, raising ValueError on garbage exactly where the reference logs
    and errors (notify_listener.go:151-160). The timestamp text is
    returned unparsed — current_timestamp::TEXT never contains '_'."""
    head, _, rest = payload.partition("_")
    return int(head), rest


def notify_driven_drain(
    listener,
    poller: KeysetPoller,
    channel: str = "warp_pipe_new_changeset",
    max_notifications: int | None = None,
    notify_timeout_s: float | None = None,
) -> int:
    """S2 PUSH mode — the reference's actual LISTEN/NOTIFY shape
    (notify_listener.go:76-139) on top of the keyset loop: LISTEN on a
    dedicated plain connection, block until the audit trigger's
    pg_notify lands, then drain the poller. Each wake-up drains to
    empty (batch catch-up), so one notification after a burst applies
    the WHOLE burst — strictly stronger than the reference's
    fetch-one-changeset-per-notification, with the same at-least-once →
    exactly-once upgrade the poller's offset commit provides. The
    poller is also guaranteed to pass the notified id: NOTIFY fires on
    the trigger's transaction COMMIT, so the row is already visible to
    the fetch.

    `listener` is an LRClient connected with replication=False.
    Returns total rows applied; `max_notifications` bounds the loop,
    `notify_timeout_s` lets the socket raise TimeoutError when the
    channel goes quiet (the caller's drain-vs-hang policy, same shape
    as the tails')."""
    listener.listen(channel)
    total = 0
    n_seen = 0
    while max_notifications is None or n_seen < max_notifications:
        note = listener.wait_for_notification(timeout_s=notify_timeout_s)
        n_seen += 1
        notified_id, _ts = parse_notify_payload(note.payload)
        total += poller.run_until_drained()
        if poller.committed_offset() < notified_id:
            # fetch lag cannot explain this (commit-then-notify order):
            # the offset store and the audit log disagree — surface it
            raise StateCorruptError(
                f"drained to offset {poller.committed_offset()} but the "
                f"notification announced changeset {notified_id}"
            )
    return total


def parquet_keyset_fetch(path: str):
    """Fetch factory over a growing parquet audit dir (each poll re-lists
    the dir, so newly-arrived files are visible next round)."""

    def fetch(spark: SparkSession, last_id: int, limit: int) -> DataFrame:
        return (
            spark.read.parquet(path)
            .filter(F.col("id") > last_id)
            .orderBy("id")
            .limit(limit)
        )

    return fetch


def dataframe_keyset_fetch(df: DataFrame):
    """Fetch factory over any id-keyed DataFrame (derived logs, views)."""

    def fetch(spark: SparkSession, last_id: int, limit: int) -> DataFrame:
        return df.filter(F.col("id") > last_id).orderBy("id").limit(limit)

    return fetch


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


def wal2json_stream(
    spark: SparkSession,
    drop_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1 LR-mode parity: tail a directory of wal2json JSONL messages
    (one document per line, the shape Debezium/wal2json emit) and decode
    to normalized changesets. The decode is pure Catalyst (P4), so the
    streaming plan is scan → narrow codegen stage.

    max_files_per_trigger: backpressure knob (same contract as
    changeset_stream) — the tail writes one file per committed
    transaction, so 1 here means one micro-batch per source commit."""
    from warp_pipe_spark.decoders import decode_wal2json

    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(drop_dir)
    return decode_wal2json(raw, message_col="value")


def debezium_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """S1 via the idiomatic Kafka+Debezium deployment: tail a directory
    of Debezium-envelope JSONL (the shape `readStream.format("kafka")`
    + a value cast delivers; a file drop-dir stands in for the topic in
    this sandbox) and decode to normalized changesets. Swapping the
    source for real Kafka changes ONE line (the reader format) — the
    decode plan is identical."""
    from warp_pipe_spark.decoders import decode_debezium

    raw = spark.readStream.format("text").load(drop_dir)
    return decode_debezium(raw, message_col="value")


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
