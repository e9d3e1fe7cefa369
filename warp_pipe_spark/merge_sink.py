"""Transactional-MERGE state sink — the Delta/Iceberg-shaped twin of
ParquetStateSink (A1-A3 at scale).

The reference applies each changeset row-at-a-time: INSERT with
dup-skip, upsert UPDATE, DELETE-by-PK (axon_sql.go:59-122). On a
transactional table format the whole micro-batch becomes ONE statement
per touched table:

    MERGE INTO <target> t
    USING <batch winners> s
      ON t.<pk> = s.<pk>
    WHEN MATCHED AND s.<kind> = 'DELETE' AND s.<id> >= t.<id> THEN DELETE
    WHEN MATCHED AND s.<id> > t.<id> THEN UPDATE SET ...
    WHEN NOT MATCHED AND (s.<kind> IS NULL OR s.<kind> <> 'DELETE')
      THEN INSERT ...   -- NULL kind is not provably a delete

"batch winners" is the last-writer-wins fold of the micro-batch by
(table, pk) WITH tombstones kept (apply.replay drop_deletes=False), so
the MERGE source has exactly one row per key — a MERGE whose source
contains duplicate keys is rejected or non-deterministic on every
engine. The id guards make redelivery a no-op (same winners re-merged:
matched rows carry t.id = s.id, so UPDATE's strict > skips them;
re-deleted keys simply don't match), upgrading the poller's
at-least-once transport to exactly-once observable state — the same
contract ParquetStateSink proves with its versioned pointer.

The sink is adapter-based because this sandbox has no delta-spark:
`MergeExecutor` is the seam. `DeltaMergeExecutor` drives a real
DeltaTable merge builder when the library exists; `SqlMergeExecutor`
emits the portable MERGE INTO text for engines reached over SQL
(Iceberg/Spark SQL syntax); `InMemoryMergeExecutor` implements the same
semantics with plain DataFrame ops so the sink contract is testable
here. tests/test_merge_sink.py runs the KeysetPoller drain/redelivery
contract against the in-memory executor and pins the emitted SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp_pipe_spark.apply import TRUNCATE_KINDS, replay
from warp_pipe_spark.streaming import StateSink

DELETE_KINDS = ("delete", "DELETE")


def batch_winners(
    batch: DataFrame,
    pk_cols: Sequence[str],
    id_col: str = "id",
    kind_col: str = "action",
    table_col: str = "table_name",
) -> DataFrame:
    """LWW fold of one micro-batch to one row per (table, pk), keeping
    delete tombstones — the conflict-free MERGE source."""
    return replay(
        batch,
        pk_cols,
        id_col=id_col,
        kind_col=kind_col,
        table_col=table_col,
        drop_deletes=False,
    )


def merge_statement(
    target: str,
    source: str,
    pk_cols: Sequence[str],
    value_cols: Sequence[str],
    id_col: str = "id",
    kind_col: str = "action",
    dialect: str = "spark",
) -> str:
    """The portable MERGE INTO text for one table. `value_cols` are the
    non-pk payload columns to carry into the target (id included
    automatically so future merges can compare recency).

    dialect: the ONE spot the text diverges by engine is null-safe key
    equality — "spark" (also Delta/Iceberg) spells it `<=>`, "ansi"
    (PostgreSQL 15+, SQL:2023) spells it `IS NOT DISTINCT FROM`.
    Everything else (conditional MATCHED DELETE/UPDATE, conditional
    NOT MATCHED INSERT) is common. The ansi text is EXECUTED against a
    live PostgreSQL in tests/test_live_pg.py, not just pinned."""
    if dialect not in ("spark", "ansi"):
        raise ValueError(f"unknown MERGE dialect {dialect!r}; use spark|ansi")
    eq = "t.{c} <=> s.{c}" if dialect == "spark" else "t.{c} IS NOT DISTINCT FROM s.{c}"
    on = " AND ".join(eq.format(c=c) for c in pk_cols)
    cols = [*pk_cols, id_col, *value_cols]
    # second dialect divergence, found by EXECUTING the text on PG 15:
    # ansi MERGE forbids alias-qualifying the UPDATE SET targets
    # ('column "t" of relation ... does not exist'); Spark/Delta allow
    # (and disambiguate with) the t. prefix
    set_lhs = "t.{c}" if dialect == "spark" else "{c}"
    sets = ", ".join(
        f"{set_lhs.format(c=c)} = s.{c}" for c in cols if c not in pk_cols
    )
    ins_cols = ", ".join(cols)
    ins_vals = ", ".join(f"s.{c}" for c in cols)
    dk = ", ".join(f"'{k}'" for k in DELETE_KINDS)
    return (
        f"MERGE INTO {target} t\n"
        f"USING {source} s\n"
        f"  ON {on}\n"
        f"WHEN MATCHED AND s.{kind_col} IN ({dk}) AND s.{id_col} >= t.{id_col}"
        f" THEN DELETE\n"
        f"WHEN MATCHED AND s.{id_col} > t.{id_col} THEN UPDATE SET {sets}\n"
        # NULL-safe: NOT IN is NULL (not true) for a NULL kind, which
        # would silently drop the row — replay/ParquetStateSink keep
        # NULL-kind rows (not provably deletes), so every sink must
        f"WHEN NOT MATCHED AND (s.{kind_col} IS NULL OR s.{kind_col}"
        f" NOT IN ({dk})) THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def payload_cols(
    columns: Sequence[str],
    pk_cols: Sequence[str],
    id_col: str,
    kind_col: str,
    table_col: str,
) -> list[str]:
    """The columns a MERGE writes into a per-entity target: everything
    except the keys, the recency id (added separately), the changeset
    kind, and the table-routing column — the latter two are transport
    metadata, not entity state, and per-entity targets don't have
    them."""
    return [
        c for c in columns if c not in (*pk_cols, id_col, kind_col, table_col)
    ]


class SqlMergeExecutor:
    """Registers the winners as a temp view and runs the MERGE text via
    spark.sql — the path for Iceberg catalogs or any SQL-reachable
    MERGE engine. Targets must already exist as tables. The routing
    column (`table_col`) and the kind column are excluded from
    UPDATE SET / INSERT — per-entity targets carry entity state only.

    evolve_schema=True turns a mid-stream source-side ALTER TABLE ADD
    COLUMN into the matching target DDL: payload columns the target
    lacks are added (`ALTER TABLE ... ADD COLUMNS (...)`, types from
    the winners' schema) BEFORE the MERGE, which then writes them;
    pre-evolution target rows read NULL — the same additive contract
    as apply.merge_batch/ParquetStateSink. Off by default: unexpected
    schema drift should fail loudly unless evolution is opted into."""

    def __init__(
        self,
        spark: SparkSession,
        target_for=lambda t: t,
        table_col: str = "table_name",
        evolve_schema: bool = False,
    ):
        self.spark = spark
        self.target_for = target_for
        self.table_col = table_col
        self.evolve_schema = evolve_schema
        self._view_seq = 0

    def merge(
        self,
        table: str,
        winners: DataFrame,
        pk_cols: Sequence[str],
        id_col: str,
        kind_col: str,
    ) -> None:
        # per-executor-instance, per-call unique view: a name derived
        # from the table alone races when two sinks on one session
        # merge the same source table into DIFFERENT targets (sink A's
        # view overwritten by B's before A's MERGE runs = cross-target
        # corruption); dropped in the finally below, never leaked
        self._view_seq += 1
        view = f"_wp_merge_src_{id(self):x}_{self._view_seq}"
        winners.createOrReplaceTempView(view)
        try:
            value_cols = payload_cols(
                winners.columns, pk_cols, id_col, kind_col, self.table_col
            )
            target = self.target_for(table)
            if self.evolve_schema:
                have = set(self.spark.table(target).columns)
                need = [
                    f
                    for f in winners.schema.fields
                    if f.name in value_cols and f.name not in have
                ]
                if need:
                    ddl = ", ".join(
                        f"{f.name} {f.dataType.simpleString()}" for f in need
                    )
                    self.spark.sql(f"ALTER TABLE {target} ADD COLUMNS ({ddl})")
            self.spark.sql(
                merge_statement(
                    target, view, pk_cols, value_cols, id_col, kind_col
                )
            )
        finally:
            self.spark.catalog.dropTempView(view)

    def clear(self, table: str, up_to_id: int, id_col: str) -> None:
        """Table-clear for a `truncate` changeset: delete every target
        row at-or-before the truncate's id. The id guard (not an
        unconditional DELETE) makes redelivery a no-op — rows merged
        AFTER the truncate carry higher ids and survive a replayed
        clear, the same idempotence contract as the MERGE conditions."""
        self.spark.sql(
            f"DELETE FROM {self.target_for(table)} "
            f"WHERE {id_col} <= {int(up_to_id)}"
        )


class DeltaMergeExecutor:
    """Drives delta-spark's merge builder when the library is present
    (import is deferred so the module loads in environments without
    it). path_for maps a table name to its Delta location.

    Writes exactly the columns the SQL path writes — pk + id + payload,
    with the kind and routing columns excluded via explicit set/values
    maps (updateAll/insertAll would leak transport metadata into the
    per-entity target). tests/test_merge_sink.py pins the builder call
    sequence with a recorded-call fake so the contract is enforced even
    without delta-spark installed."""

    def __init__(
        self,
        spark: SparkSession,
        path_for,
        table_col: str = "table_name",
        evolve_schema: bool = False,
    ):
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as e:  # pragma: no cover - no delta in sandbox
            raise ImportError(
                "delta-spark is not installed; use SqlMergeExecutor or "
                "InMemoryMergeExecutor"
            ) from e
        self.spark = spark
        self.path_for = path_for
        self.table_col = table_col
        self.evolve_schema = evolve_schema

    _AUTOMERGE_KEY = "spark.databricks.delta.schema.autoMerge.enabled"

    def merge(self, table, winners, pk_cols, id_col, kind_col):
        from delta.tables import DeltaTable

        prev = None
        if self.evolve_schema:
            # Delta's documented evolution switch: merge adds source
            # columns missing from the target (additive only), the
            # exact contract SqlMergeExecutor implements via ALTER.
            # The conf is session-global, so save/restore around the
            # merge — otherwise evolution leaks into every other Delta
            # merge on the session, including executors constructed
            # with evolve_schema=False.
            prev = self.spark.conf.get(self._AUTOMERGE_KEY, None)
            self.spark.conf.set(self._AUTOMERGE_KEY, "true")
        try:
            tgt = DeltaTable.forPath(self.spark, self.path_for(table))
            cond = " AND ".join(f"t.{c} <=> s.{c}" for c in pk_cols)
            dk = ", ".join(f"'{k}'" for k in DELETE_KINDS)
            value_cols = payload_cols(
                winners.columns, pk_cols, id_col, kind_col, self.table_col
            )
            upd = {c: f"s.{c}" for c in (id_col, *value_cols)}
            ins = {c: f"s.{c}" for c in (*pk_cols, id_col, *value_cols)}
            (
                tgt.alias("t")
                .merge(winners.alias("s"), cond)
                .whenMatchedDelete(
                    f"s.{kind_col} IN ({dk}) AND s.{id_col} >= t.{id_col}"
                )
                .whenMatchedUpdate(f"s.{id_col} > t.{id_col}", upd)
                .whenNotMatchedInsert(
                    f"s.{kind_col} IS NULL OR s.{kind_col} NOT IN ({dk})", ins
                )
                .execute()
            )
        finally:
            if self.evolve_schema:
                if prev is None:
                    self.spark.conf.unset(self._AUTOMERGE_KEY)
                else:
                    self.spark.conf.set(self._AUTOMERGE_KEY, prev)

    def clear(self, table, up_to_id, id_col):
        """Truncate table-clear, id-guarded for redelivery idempotence
        (see SqlMergeExecutor.clear)."""
        from delta.tables import DeltaTable

        DeltaTable.forPath(self.spark, self.path_for(table)).delete(
            f"{id_col} <= {int(up_to_id)}"
        )


class InMemoryMergeExecutor:
    """Same MERGE semantics as DataFrame ops over a dict of per-table
    frames — the sandbox test twin. Deliberately NOT implemented via
    apply.merge_batch: an independent formulation (anti-join keep +
    stale-match keep + qualifying-source rows) so tests comparing it to
    the replay oracle check the MERGE conditions, not the oracle against
    itself."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}

    def merge(self, table, winners, pk_cols, id_col, kind_col):
        pk = list(pk_cols)
        # NULL kind ⇒ NOT a delete, exactly like the SQL MERGE's
        # `kind IN (…)` branch (NULL skips the DELETE arm but the
        # UPDATE arm tests only the ids): without the coalesce, the
        # NULL propagates through `~beaten` and drops the TARGET row
        # from kept_old — a divergence between the executors
        is_delete = F.coalesce(
            F.col(f"s.{kind_col}").isin(*DELETE_KINDS), F.lit(False)
        )
        old = self.tables.get(table)
        if old is None:
            new = winners.filter(
                F.col(kind_col).isNull() | ~F.col(kind_col).isin(*DELETE_KINDS)
            )
            self.tables[table] = self.spark.createDataFrame(
                new.collect(), new.schema
            )
            return
        o, s = old.alias("t"), winners.alias("s")
        cond = None
        for c in pk:
            eq = F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
            cond = eq if cond is None else cond & eq
        # WHEN MATCHED ... THEN DELETE / UPDATE: a target row survives
        # unchanged iff no source row beats it
        beaten = (is_delete & (F.col(f"s.{id_col}") >= F.col(f"t.{id_col}"))) | (
            ~is_delete & (F.col(f"s.{id_col}") > F.col(f"t.{id_col}"))
        )
        kept_old = (
            o.join(s.filter(F.lit(True)), cond, "left")
            .filter(F.col(f"s.{id_col}").isNull() | ~beaten)
            .select([F.col(f"t.{c}") for c in old.columns])
        )
        # UPDATE winners + NOT MATCHED inserts: qualifying source rows.
        # Columns the target has but the winners lack keep the TARGET
        # row's old value — MERGE's UPDATE SET only touches the source's
        # value columns (a null-fill here would diverge from
        # SqlMergeExecutor in the narrowing direction).
        upd = (
            s.join(o, cond, "inner")
            .filter(~is_delete & (F.col(f"s.{id_col}") > F.col(f"t.{id_col}")))
            .select(
                [F.col(f"s.{c}") for c in winners.columns]
                + [
                    F.col(f"t.{c}").alias(c)
                    for c in old.columns
                    if c not in winners.columns
                ]
            )
        )
        ins = (
            s.join(o, cond, "left_anti")
            .filter(
                F.col(kind_col).isNull() | ~F.col(kind_col).isin(*DELETE_KINDS)
            )
            .select(winners.columns)
        )
        # name-aligned union with null fill: the in-memory twin carries
        # the same additive schema-evolution contract as the real
        # executors (SqlMergeExecutor ALTER-before-MERGE, Delta
        # autoMerge) and apply.merge_batch
        new = kept_old.unionByName(upd, allowMissingColumns=True).unionByName(
            ins, allowMissingColumns=True
        )
        # materialize so the next merge doesn't re-execute a growing plan
        self.tables[table] = self.spark.createDataFrame(new.collect(), new.schema)

    def clear(self, table, up_to_id, id_col):
        """Truncate table-clear, id-guarded like the real executors."""
        cur = self.tables.get(table)
        if cur is not None:
            self.tables[table] = cur.filter(F.col(id_col) > int(up_to_id))

    def read_state(self) -> DataFrame | None:
        dfs = list(self.tables.values())
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            # additive evolution can widen one table's frame and not
            # another's — null-fill like the merge path, never throw
            out = out.unionByName(d, allowMissingColumns=True)
        return out


class MergeStateSink(StateSink):
    """foreachBatch/KeysetPoller-compatible sink over a MergeExecutor:
    fold the micro-batch to winners, then one MERGE per touched table.
    Atomicity and redelivery-idempotence come from the target format's
    transaction (Delta/Iceberg commit) plus the id-guarded conditions.

    on_truncate: what a `truncate` changeset in the batch does (only
    the pgoutput source emits them, one per truncated table).
      - 'error' (default): raise — a truncate must NEVER silently fold
        into the MERGE as an upsert-shaped no-op row; an operator who
        hits this either enables 'clear' or routes truncates to a
        dead-letter with pipeline.reject_truncates() upstream.
      - 'clear': table-clear semantics — executor.clear(table, id)
        deletes target rows at-or-before the truncate id, and batch
        rows the truncate supersedes are dropped before the fold
        (apply.split_truncates' contract). Redelivery stays a no-op:
        the clear is id-guarded, post-truncate rows survive it.
      - 'unchecked': SKIP the per-batch truncate scan entirely — for
        sources that cannot emit truncates (audit-trigger mode,
        wal2json v1), where paying a detection aggregation every
        micro-batch forever buys nothing. Explicit opt-out, never the
        default: a pgoutput source behind 'unchecked' would fold a
        table clear as an upsert-shaped no-op, the exact silent
        corruption 'error' exists to stop.
    """

    def __init__(
        self,
        spark: SparkSession,
        executor,
        pk_cols: Sequence[str] = ("pk",),
        id_col: str = "id",
        kind_col: str = "action",
        table_col: str = "table_name",
        on_truncate: str = "error",
    ):
        if on_truncate not in ("error", "clear", "unchecked"):
            raise ValueError(
                "on_truncate must be 'error', 'clear' or 'unchecked', "
                f"got {on_truncate!r}"
            )
        self.spark = spark
        self.executor = executor
        self.pk_cols = list(pk_cols)
        self.id_col = id_col
        self.kind_col = kind_col
        self.table_col = table_col
        self.on_truncate = on_truncate

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        # unroutable rows (NULL table_name) are skipped like
        # ParquetStateSink does — sorted() would TypeError on None and
        # the equality route below can never match them anyway
        batch = batch.filter(F.col(self.table_col).isNotNull())
        # per-table latest-truncate marks: one tiny agg job per batch —
        # the price of never letting a table clear slip through as an
        # upsert. Tables number O(tables); the collect is the same
        # driver-side routing read as `touched` below. Truncate-free
        # sources skip the scan with on_truncate='unchecked'.
        marks = {}
        if self.on_truncate != "unchecked":
            marks = {
                r[0]: r[1]
                for r in batch.filter(
                    F.col(self.kind_col).isin(*TRUNCATE_KINDS)
                )
                .groupBy(self.table_col)
                .agg(F.max(self.id_col))
                .collect()
            }
        if marks:
            if self.on_truncate == "error":
                raise ValueError(
                    "truncate changeset(s) for table(s) "
                    f"{sorted(marks)} reached MergeStateSink("
                    "on_truncate='error'); construct the sink with "
                    "on_truncate='clear' or dead-letter truncates "
                    "upstream (pipeline.reject_truncates)"
                )
            superseded = F.col(self.kind_col).isin(*TRUNCATE_KINDS)
            for t, tid in marks.items():
                superseded = superseded | (
                    (F.col(self.table_col) == t)
                    & (F.col(self.id_col) <= tid)
                )
            # coalesce: NULL kind must read "not superseded", not NULL
            batch = batch.filter(~F.coalesce(superseded, F.lit(False)))
            for t in sorted(marks):
                self.executor.clear(t, marks[t], self.id_col)
        winners = batch_winners(
            batch, self.pk_cols, self.id_col, self.kind_col, self.table_col
        ).persist()
        try:
            touched = [
                r[0] for r in winners.select(self.table_col).distinct().collect()
            ]
            for t in sorted(touched):
                self.executor.merge(
                    t,
                    winners.filter(F.col(self.table_col) == t),
                    self.pk_cols,
                    self.id_col,
                    self.kind_col,
                )
        finally:
            winners.unpersist()

    def read_state(self) -> DataFrame | None:
        return self.executor.read_state()

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        self.apply_batch(batch, batch_id)
