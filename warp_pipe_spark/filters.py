"""Table whitelist / ignore filters — P2/P3 (warp_pipe.go:97-144).

Pattern grammar (three forms, warp_pipe.go:100-117):
  - ``schema.table`` — exact schema + table
  - ``schema.*``     — every table in schema
  - ``table``        — bare table name, any schema

Precedence: whitelist first, then ignore — **ignore wins** (stage order
warp_pipe.go:95-144; config.go:29-31). Both compile to a single boolean
Catalyst expression, so on a partitioned log the predicate prunes
partitions / pushes into the parquet scan instead of running per record
as in the reference's Go stage functions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_match(
    patterns: Sequence[str],
    schema_col: str = "schema_name",
    table_col: str = "table_name",
) -> Column:
    """Boolean Column: row's (schema, table) matches ANY pattern."""
    if not patterns:
        return F.lit(False)
    schema_c, table_c = F.col(schema_col), F.col(table_col)
    conds: list[Column] = []
    bare: list[str] = []
    for p in patterns:
        if "." in p:
            s, t = p.split(".", 1)
            if t == "*":
                conds.append(schema_c == s)
            else:
                conds.append((schema_c == s) & (table_c == t))
        else:
            bare.append(p)
    if bare:
        conds.append(table_c.isin(bare))
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def whitelist_tables(
    df: DataFrame,
    patterns: Sequence[str],
    schema_col: str = "schema_name",
    table_col: str = "table_name",
) -> DataFrame:
    """P2: keep only matching tables; empty patterns = no-op (the
    reference only installs the stage when patterns exist,
    warp_pipe.go:95-96)."""
    if not patterns:
        return df
    return df.filter(table_match(patterns, schema_col, table_col))


def ignore_tables(
    df: DataFrame,
    patterns: Sequence[str],
    schema_col: str = "schema_name",
    table_col: str = "table_name",
) -> DataFrame:
    """P3: drop matching tables. Apply after whitelist so ignore wins.

    NULL-safe: a row with NULL schema/table does not MATCH any pattern,
    so ignore must KEEP it (three-valued logic would evaluate ~NULL =
    NULL and silently drop it — the inverse of whitelist semantics,
    where a NULL row correctly fails to match and is dropped). Malformed
    rows are the dead-letter path's job, not a filter side effect."""
    if not patterns:
        return df
    return df.filter(
        ~F.coalesce(table_match(patterns, schema_col, table_col), F.lit(False))
    )
