"""Sequence synchronization (A5/A6) — the execution path.

Parity: axon_schema.go:99-221. The reference discovers SERIAL-backed
column sequences from information_schema (loadColumnSequences,
:99-128), orphan sequences with no owning column (loadOrphanSequences,
:169-196), and then issues `SELECT setval(seq, val, true)` per insert
(updateColumnSequence :137-163, updateOrphanSequences :198-221) — one
target round-trip PER ROW inserted, which BASELINE.md flags as its
write-amplification hot spot.

Spark-first restatement: sequence state is a pure function of the
APPLIED state — `setval` only ever needs the max applied value, so the
whole sync is ONE grouped aggregation over final state (every serial
column of every table in a single groupBy(table) pass) followed by one
tiny ordered statement list executed against the target. O(tables)
target round trips per convergence point instead of O(rows).

No live Postgres exists in this container; the discovery SQL builders
return text (like jdbc.py's DDL builders) and `execute_sequence_sync`
takes any executor callable — a JDBC cursor adapter in production, a
mock recording statements in tests.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- discovery (driver-side SQL text, axon_schema.go:99-128 / :169-196) ----


def column_sequences_query(schema: str = "public") -> str:
    """SERIAL-backed columns: default LIKE 'nextval(%' — the exact
    predicate the reference uses (axon_schema.go:104-114)."""
    return (
        "SELECT table_name, column_name, column_default "
        "FROM information_schema.columns "
        f"WHERE table_schema = '{schema}' "
        "AND column_default LIKE 'nextval(%'"
    )


def orphan_sequences_query(schema: str = "public") -> str:
    """All sequences in the schema (axon_schema.go:173-177); orphans =
    this set minus the column-attached ones."""
    return (
        "SELECT sequence_name FROM information_schema.sequences "
        f"WHERE sequence_schema = '{schema}'"
    )


def parse_sequence_default(column_default: str) -> str | None:
    """Extract the sequence name from a column default like
    ``nextval('users_id_seq'::regclass)`` — the reference splits on
    single quotes and takes the middle (axon_schema.go:120-121)."""
    if not column_default.startswith("nextval("):
        return None
    parts = column_default.split("'")
    return parts[1] if len(parts) >= 3 else None


def column_sequences(
    rows: Sequence[tuple[str, str, str]],
) -> dict[tuple[str, str], str]:
    """(table, column) → sequence name, from column_sequences_query rows."""
    out: dict[tuple[str, str], str] = {}
    for table, column, default in rows:
        seq = parse_sequence_default(default)
        if seq:
            out[(table, column)] = seq
    return out


def orphan_sequence_names(
    all_sequences: Sequence[str], seq_map: Mapping[tuple[str, str], str]
) -> list[str]:
    """Sequences owned by no column (axon_schema.go:181-193)."""
    connected = set(seq_map.values())
    return sorted(s for s in all_sequences if s not in connected)


# -- statement emission ------------------------------------------------------


def setval_statement(sequence: str, value: int) -> str:
    """One `setval(seq, val, true)` — is_called=true so the next
    nextval returns value+1, matching the reference's call shape
    (axon_schema.go:148-156)."""
    return f"SELECT setval('{sequence}', {int(value)}, true)"


def column_setval_statements(
    state: DataFrame,
    seq_map: Mapping[tuple[str, str], str],
    table_col: str = "table_name",
) -> list[str]:
    """The full column-sequence sync as an ordered statement list from
    literally ONE aggregation over applied state: a single
    groupBy(table) computing the max of every serial column anywhere in
    the map (a serial column absent from some table's rows is just NULL
    there and drops out). One Spark job for T tables, one target
    round-trip per statement — never one per inserted row."""
    by_table: dict[str, list[tuple[str, str]]] = {}
    for (table, column), seq in sorted(seq_map.items()):
        by_table.setdefault(table, []).append((column, seq))
    if not by_table:
        return []
    # only columns the state FRAME carries: a discovered serial column
    # whose table never applied a changeset is absent from the wide
    # schema, and referencing it would abort the whole sync with
    # UNRESOLVED_COLUMN instead of the per-table skip below. Cast
    # before max — map-form decoded state keeps values as STRINGS and
    # a lexicographic max('10','9') = '9' under-advances the sequence
    # into duplicate-key violations.
    all_cols = sorted(
        {c for cols in by_table.values() for c, _ in cols} & set(state.columns)
    )
    if not all_cols:
        return []
    rows = state.groupBy(table_col).agg(
        *[F.max(F.col(c).cast("bigint")).alias(c) for c in all_cols]
    ).collect()
    maxima = {r[table_col]: r for r in rows}
    stmts: list[str] = []
    for table in sorted(by_table):
        row = maxima.get(table)
        if row is None:
            continue  # no applied rows for this table → nothing to sync
        for column, seq in by_table[table]:
            if column not in all_cols:
                continue  # column absent from state → nothing to sync
            value = row[column]
            if value is not None:
                stmts.append(setval_statement(seq, value))
    return stmts


def orphan_setval_statements(last_values: Mapping[str, int]) -> list[str]:
    """A6: orphan sequences carry the SOURCE's last_value verbatim
    (axon_schema.go:198-221); the caller reads them with
    `SELECT last_value FROM <seq>` on the source connection."""
    return [setval_statement(seq, v) for seq, v in sorted(last_values.items())]


def execute_sequence_sync(
    executor: Callable[[str], object], statements: Sequence[str]
) -> list[str]:
    """Run the statements against a target in order. setval is
    non-transactional in Postgres (the reference cites the manual for
    running these outside any transaction), so plain sequential
    execution IS the reference behavior. Returns the executed list."""
    for stmt in statements:
        executor(stmt)
    return list(statements)
