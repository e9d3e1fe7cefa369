"""Apply/merge — fold a changeset stream into final table state.

Parity: axon's write path (A1 insert, A2 upsert, A3 delete-by-PK,
O4 duplicate-skip; axon_sql.go:59-194, axon.go:277-286).

The reference applies record-at-a-time SQL against a target Postgres,
catching unique_violation per row. Spark-first restatement: the apply is
a **set-based last-writer-wins fold** —

    dropDuplicates(id)                       # O4: at-least-once → once
    row_number() OVER (PARTITION BY table, pk ORDER BY id DESC) = 1
    filter(kind != 'delete')                 # delete tombstones win

— one shuffle on the key, partial aggregation free, AQE handles skewed
keys. Replaying N changesets over K distinct keys is O(N) with a single
exchange instead of N round-trips. This is §2.10 q6, the flagship query.

`merge_batch` is the incremental form used by streaming foreachBatch:
union(target_state, batch) → same fold → rewritten target. Idempotent by
construction (replaying a batch yields the same state), which upgrades
the reference's at-least-once to effective exactly-once per sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipe_spark.changeset import KIND_DELETE, KIND_TRUNCATE

TRUNCATE_KINDS = (KIND_TRUNCATE, "TRUNCATE")


def split_truncates(
    changesets: DataFrame,
    id_col: str = "id",
    kind_col: str = "action",
    table_col: str | None = "table_name",
    truncate_kinds: tuple[str, ...] = TRUNCATE_KINDS,
    keep_latest_mark: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Give `truncate` changesets table-clear semantics: returns
    (effective, marks) where `marks` is one row per truncated table —
    (table, _wp_trunc_id = the table's LATEST truncate id) — and
    `effective` is the log with every change at-or-before that truncate
    removed (the truncate rows themselves included): exactly the rows a
    re-created table would still see. Feeding `effective` to the LWW
    fold is then correct by construction — no truncate row can ever be
    folded into final state as an upsert-shaped no-op.

    keep_latest_mark=True keeps each table's LATEST truncate row in
    `effective` (the tombstone form, used by replay's tombstone mode):
    carried through merged state it acts as a persistent watermark, so
    a LATE-arriving change older than the truncate is still cleared by
    the next fold — the exact analogue of keeping delete tombstones
    under out-of-order delivery. The tombstone occupies the table's
    NULL-pk slot (truncates carry no key).

    Plan shape: the marks side is a filter+agg over the log (near-empty
    in the common no-truncate case) and joins back BROADCAST — truncated
    tables number O(tables), never O(rows), so this survives any scale.
    The guard is opt-in from `replay(truncate_kinds=...)` to keep the
    flagship fold's pinned single-exchange plan when the source cannot
    emit truncates (audit triggers, wal2json — only our pgoutput source
    generates them, pgoutput.py truncate fan-out).
    """
    is_trunc = F.col(kind_col).isin(*truncate_kinds)
    key = [table_col] if table_col else []
    marks = (
        changesets.filter(is_trunc)
        .groupBy(*key)
        .agg(F.max(F.col(id_col)).alias("_wp_trunc_id"))
    )
    if table_col:
        joined = changesets.join(F.broadcast(marks), on=table_col, how="left")
    else:
        # single-table log: marks is 0-or-1 rows; a LEFT join on a
        # constant keeps every change when no truncate exists (a plain
        # cross join against an empty marks frame would drop them all)
        joined = changesets.join(F.broadcast(marks), F.lit(True), "left")
    survives = F.col("_wp_trunc_id").isNull() | (
        F.col(id_col) > F.col("_wp_trunc_id")
    )
    if keep_latest_mark:
        survives = survives | (
            is_trunc & (F.col(id_col) == F.col("_wp_trunc_id"))
        )
    effective = joined.filter(survives).drop("_wp_trunc_id")
    return effective, marks


def replay(
    changesets: DataFrame,
    pk_cols: Sequence[str],
    id_col: str = "id",
    kind_col: str = "action",
    table_col: str | None = "table_name",
    delete_kinds: tuple[str, ...] = (KIND_DELETE, "DELETE"),
    drop_deletes: bool = True,
    truncate_kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Fold changesets (typed/decoded form: one column per field) into
    final state: last writer wins per PK, delete tombstones drop rows.

    truncate_kinds: pass TRUNCATE_KINDS when the log can carry
    `truncate` changesets (our pgoutput source emits one per truncated
    table) — each table's rows at-or-before its latest truncate are
    cleared via split_truncates BEFORE the fold, so a truncate is a
    table clear, never an upsert-shaped no-op row. Opt-in (default
    None) because the guard adds a broadcast join the pinned
    single-exchange flagship plan doesn't need for truncate-free
    sources (audit triggers, wal2json).

    O4 duplicate-skip comes for free: a redelivered changeset (same id,
    same content) lands in the same (table, pk) partition and only the
    rn=1 row survives — no separate dropDuplicates(id) pass, which
    would cost a second full shuffle keyed by id.

    pk_cols may be composite (db/schema.go:226-258 supports multi-column
    PKs). The single shuffle is on (table, pk) — the natural key — and
    survives scale-up; no global sort is required. Spark's
    WindowGroupLimit rewrites the rank filter into a partial per-group
    top-1 BEFORE the exchange, so the shuffle carries ~one row per key.
    """
    if truncate_kinds:
        # tombstone mode (drop_deletes=False) keeps the latest truncate
        # row per table as a persistent watermark, same rationale as
        # delete tombstones under out-of-order delivery
        changesets, _ = split_truncates(
            changesets, id_col, kind_col, table_col, truncate_kinds,
            keep_latest_mark=not drop_deletes,
        )
    parts = ([table_col] if table_col else []) + list(pk_cols)
    w = Window.partitionBy(*parts).orderBy(F.col(id_col).desc())
    folded = (
        changesets.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if drop_deletes:
        # NULL-safe: ~isin evaluates to NULL (not True) for a NULL kind
        # (the audit schema allows it), which would silently drop the
        # row from final state as if it were a delete tombstone
        folded = folded.filter(
            F.col(kind_col).isNull() | ~F.col(kind_col).isin(*delete_kinds)
        )
    return folded


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: Sequence[str],
    table_col: str | None = "table_name",
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Batch CDC — derive the changeset log that transforms snapshot
    `old` into snapshot `new`: the trigger-free capture mode every
    initial sync / periodic-full-load deployment needs (the reference
    only captures via triggers/replication; diffing two snapshots is
    the standard alternative when neither can be installed).

    One null-safe FULL OUTER join on (table, pk) — a single co-keyed
    shuffle, linear at any snapshot size:
      key only in new            → INSERT (new row values)
      key only in old            → DELETE (old row values)
      in both, any value differs → UPDATE (new row values)
      in both, identical         → no row
    Output: (action, <keys>, <compare_cols>) with IS-DISTINCT-FROM
    (null-safe) value comparison, so NULL→value and value→NULL edits
    are real UPDATEs.
    """
    keys = ([table_col] if table_col else []) + list(pk_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    # presence markers, NOT key nullability: the join is null-safe, so a
    # NULL key is a legitimate matchable value — testing keys[0] IS NULL
    # would misclassify such rows (e.g. an old-only NULL-pk row as INSERT)
    o = old.select(*keys, *compare_cols).withColumn("_in_old", F.lit(True)).alias("o")
    n = new.select(*keys, *compare_cols).withColumn("_in_new", F.lit(True)).alias("n")
    cond = None
    for k in keys:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o._in_old").isNotNull()
    in_new = F.col("n._in_new").isNotNull()
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        changed = ne if changed is None else changed | ne
    action = (
        F.when(~in_old, F.lit("INSERT"))
        .when(~in_new, F.lit("DELETE"))
        .when(changed if changed is not None else F.lit(False), F.lit("UPDATE"))
    )
    side = lambda c: F.when(  # noqa: E731
        F.col("_action") == "DELETE", F.col(f"o.{c}")
    ).otherwise(F.col(f"n.{c}"))
    return (
        j.withColumn("_action", action)
        .filter(F.col("_action").isNotNull())
        .select(
            F.col("_action").alias("action"),
            *[side(k).alias(k) for k in keys],
            *[side(c).alias(c) for c in compare_cols],
        )
    )


def merge_batch(
    target_state: DataFrame | None,
    batch: DataFrame,
    pk_cols: Sequence[str],
    id_col: str = "id",
    kind_col: str = "action",
    table_col: str | None = "table_name",
    keep_tombstones: bool = False,
    truncate_kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Incremental MERGE: existing state + new changesets → new state.

    truncate_kinds: see replay — a `truncate` changeset in the batch
    clears the table's prior state too, because state rows carry their
    original ids (all < the truncate id) and the union feeds one fold.
    NOTE: with micro-batches a truncate only clears state whose ids the
    union can see — which is all of it, since target rows keep their
    last id. Correct across any batch split, same argument as
    tombstones.

    Target rows are treated as changesets with their original last id —
    a new changeset for the same PK wins iff its id is higher; a delete
    removes the row (A2's ON CONFLICT upsert + A3's DELETE-by-PK,
    axon_sql.go:77-122). Update-before-insert upserts a row, matching
    the reference's upsert-insert behavior (axon_sql.go:92-103).

    keep_tombstones: retain DELETE rows in the state instead of
    dropping them at each merge. With in-order micro-batches (the
    streaming source's delivery order) tombstones are unnecessary;
    under OUT-OF-ORDER delivery they are required — dropping a delete
    immediately lets a late-arriving lower-id change resurrect the row.
    With tombstones the fold converges to the one-shot replay for ANY
    partitioning of the log into batches (strictly stronger than the
    reference's ordered-stream assumption); filter the delete rows out
    when publishing the final state.

    ADDITIVE SCHEMA EVOLUTION: the two sides are aligned by NAME with
    missing columns null-filled (a source-side ALTER TABLE ADD COLUMN
    mid-stream is routine in CDC). A column new in the batch reads as
    NULL on pre-evolution state rows; a column the batch no longer
    carries is KEPT, NULL on new rows — state data is never silently
    dropped. The LWW fold then resolves per-PK: the winning version's
    value (possibly NULL, if that version predates the column) is the
    correct as-of value. Same-name/different-type conflicts still fail
    loudly in unionByName — type changes need an explicit migration,
    not a silent cast.
    """
    drop = not keep_tombstones
    if target_state is None:
        return replay(batch, pk_cols, id_col, kind_col, table_col,
                      drop_deletes=drop, truncate_kinds=truncate_kinds)
    unioned = target_state.unionByName(batch, allowMissingColumns=True)
    return replay(unioned, pk_cols, id_col, kind_col, table_col,
                  drop_deletes=drop, truncate_kinds=truncate_kinds)
