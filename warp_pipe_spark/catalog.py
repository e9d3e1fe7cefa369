"""Catalog metadata — table discovery, PK resolution, sequence sync.

Parity: S12 GenerateTablesList (db/schema.go:165-214), A4 PK cache
(axon_schema.go:62-95, G4 string_agg groupBy), A5/A6 sequence sync
(axon_schema.go:99-221), A7 version gate (axon_schema.go:22-50).

In the reference these are `information_schema` queries against live
Postgres. Here the catalog is data: a small DataFrame (or plain dicts)
of (schema, table, pk_columns). PK lookup at apply time is a driver-side
broadcast dict — never a per-row join. Sequence syncing is a
Postgres-ism that only exists when the sink is JDBC; we keep the
interface and implement the value computation (max of the serial column,
one partial-aggregated pass) with the `setval` emission left to the JDBC
sink adapter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def generate_tables_list(
    catalog: DataFrame,
    schemas: Sequence[str],
    include: Sequence[str] = (),
    exclude: Sequence[str] = (),
) -> DataFrame:
    """S12: enumerate tables in `schemas`, apply include/exclude sets
    (include minus exclude, db/schema.go:165-214).

    `catalog` has columns (schema_name, table_name, ...). All driver-side
    scale-free metadata — the DataFrame form exists so it can also run
    against a JDBC `information_schema` read unchanged.
    """
    df = catalog.filter(F.col("schema_name").isin(list(schemas)))
    if include:
        df = df.filter(F.col("table_name").isin(list(include)))
    if exclude:
        df = df.filter(~F.col("table_name").isin(list(exclude)))
    return df


def primary_keys(constraints: DataFrame) -> DataFrame:
    """A4/G4: PK columns per table from a key-usage catalog
    (axon_schema.go:67-77's LEFT JOIN + string_agg GROUP BY).

    Input columns: (table_name, column_name, ordinal_position) plus
    table_schema when discovery spans multiple schemas — grouping
    includes it whenever present, because two schemas can each hold a
    `users` with DIFFERENT primary keys; a table-name-only group would
    merge them into a bogus composite PK that replay would silently
    fold on. Output: (…, table_name, pk_columns ARRAY<STRING> in
    ordinal order). `collect_list` inside `sort_array` over
    (position, name) structs keeps ordinal order without a global sort.
    """
    keys = (
        ["table_schema", "table_name"]
        if "table_schema" in constraints.columns
        else ["table_name"]
    )
    return (
        constraints.groupBy(*keys)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ordinal_position", "column_name"))
                ),
                lambda s: s["column_name"],
            ).alias("pk_columns")
        )
    )


def primary_key_map(constraints: DataFrame) -> dict[str, list[str]]:
    """Driver-side broadcastable dict, the A4 cache (axon_schema.go:13-20)."""
    return {
        r["table_name"]: list(r["pk_columns"]) for r in primary_keys(constraints).collect()
    }


def sequence_sync_values(df: DataFrame, serial_cols: Sequence[str]) -> dict[str, int]:
    """A5: for each serial column, the value `setval(seq, v, true)` must
    advance to — max over the applied state (axon_schema.go:137-163).
    One aggregation pass for all columns, not one per row as in the
    reference (its per-insert round-trip is the write-amplification bug
    noted in BASELINE.md)."""
    if not serial_cols:
        return {}
    # cast before max: map-form decoded state keeps values as STRINGS,
    # and a lexicographic max('10','9') = '9' would under-advance the
    # sequence into duplicate-key violations on the next insert. Only
    # columns present in the frame participate (a serial column whose
    # table never applied a row has no state to advance); NULL maxes
    # (zero rows) are dropped rather than emitted as None.
    present = [c for c in serial_cols if c in df.columns]
    if not present:
        return {}
    row = df.agg(
        *[F.max(F.col(c).cast("bigint")).alias(c) for c in present]
    ).collect()[0]
    return {c: int(row[c]) for c in present if row[c] is not None}
