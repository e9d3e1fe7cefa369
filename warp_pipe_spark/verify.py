"""Integrity verification — per-table digests, source vs target.

Parity: G3 `pg_md5_hashagg` — the reference installs a custom ordered
md5-chain aggregate `md5(acc || md5(row_text))` and compares
source vs target per table (db/schema.go:290-334, axon.go:225-268).

That fold is order-sensitive and inherently serial — a wrong shape for a
distributed engine. We provide:

- ``table_digest``: order-NORMALIZED digest — md5 over the
  concatenation of per-row md5s sorted by their own hash value.
  Equal multisets of rows ⇔ equal digest, which is the property the
  reference actually uses (source state == target state). One
  `collect_list` per table (bounded by table cardinality of hashes,
  32 bytes/row); fine at verify time for dimension-scale tables.
- ``table_digest_scalable``: fully distributed commutative digest —
  (sum of 60-bit row-hash ints, xor-free bigint sum + count). No
  collect, no sort, partial-aggregated map-side; the 100 TB path.

Both digest the same canonical row text, so `verify_tables` can compare
any two DataFrames (e.g. replayed state vs oracle state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_text(cols: Sequence[str]) -> F.Column:
    """Canonical row rendering ≈ `CAST((t.*) AS TEXT)` (axon.go:242-249):
    pipe-joined string casts with a NULL sentinel.

    Values are ESCAPED before joining (backslash doubled, then the pipe
    delimiter backslash-escaped, NULL → unescaped `\\N`): without it,
    rows ('a|b','c') and ('a','b|c') render identically and a literal
    backslash-N value aliases NULL — distinct tables could digest equal
    and verify_tables would report a false convergence. Postgres's
    `CAST((t.*) AS TEXT)` escapes its delimiters for the same reason.
    DuckDB replay of the same rendering:
    coalesce(replace(replace(c::VARCHAR,'\\','\\\\'),'|','\\|'),'\\N')."""
    parts = [
        F.coalesce(
            F.replace(
                F.replace(F.col(c).cast("string"), F.lit("\\"), F.lit("\\\\")),
                F.lit("|"),
                F.lit("\\|"),
            ),
            F.lit("\\N"),
        )
        for c in cols
    ]
    return F.concat_ws("|", *parts)


def row_hash(cols: Sequence[str]) -> F.Column:
    return F.md5(row_text(cols))


def table_digest(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row: (row_count, digest) — order-normalized md5 chain."""
    cols = cols or df.columns
    h = row_hash(cols).alias("h")
    return df.select(h).agg(
        F.count("h").alias("row_count"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("digest"),
    )


def table_digest_scalable(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row: (row_count, digest_sum) — commutative 60-bit-hash sum.

    The 60-bit hashes accumulate in DECIMAL(38,0) (a bigint would
    overflow after ~8 rows of 2^60-scale values; decimal holds ~1e20
    rows). Fully partial-aggregated: scales to any row count with one
    tiny shuffle.
    """
    cols = cols or df.columns
    h60 = F.conv(F.substring(row_hash(cols), 1, 15), 16, 10).cast("decimal(38,0)")
    return df.select(h60.alias("h")).agg(
        F.count("h").alias("row_count"),
        # STRING surface type: a DECIMAL(38,0) and e.g. DuckDB's HUGEINT
        # render identically as digit strings, so cross-engine comparisons
        # never depend on how a consumer normalizes wide decimals.
        F.sum("h").cast("string").alias("digest_sum"),
    )


def verify_tables(
    source: DataFrame,
    target: DataFrame,
    cols: Sequence[str] | None = None,
    scalable: bool = True,
) -> bool:
    """Axon.Verify (axon.go:181-270): equal digests ⇒ converged."""
    cols = cols or source.columns
    fn = table_digest_scalable if scalable else table_digest
    s = fn(source.select(*cols), cols).collect()[0]
    t = fn(target.select(*cols), cols).collect()[0]
    return tuple(s) == tuple(t)


def ordered_md5_chain(df: DataFrame, order_cols: Sequence[str], cols: Sequence[str] | None = None) -> str:
    """Faithful wire-compatible variant of `pg_md5_hashagg(... ORDER BY pk)`
    (db/schema.go:311-321): fold md5(acc || md5(row)) in pk order.

    Serial by definition — streamed through toLocalIterator so the driver
    holds one partition at a time. Use only for small tables / parity
    tests; verify_tables is the production path.
    """
    import hashlib

    cols = cols or df.columns
    it = (
        df.select(row_hash(cols).alias("h"), *order_cols)
        .orderBy(*order_cols)
        .select("h")
        .toLocalIterator()
    )
    acc = ""
    for row in it:
        acc = hashlib.md5((acc + row["h"]).encode()).hexdigest()
    return acc
