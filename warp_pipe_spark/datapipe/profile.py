"""Dataset profiling — the "dataset card" generator a training-data
pipeline runs over every new corpus drop before anything else trusts
it: per-column row/null counts, a KMV distinct-count estimate, and
typed min/max, in a fixed small number of passes whose shuffles carry
only sketch-sized data.

Shape (the part that matters at 100 TB):
  * counts/min/max: ONE narrow aggregate over the table — a single
    output row, map-side partial everywhere — exploded driver-lessly
    into long-format rows;
  * distinct: the registered events_kmv_distinct sketch generalized
    per column — melt to (column, h60) rows, hash-distinct (map-side
    partial combine), then rank ≤ k per column with WindowGroupLimit
    (each task ships at most k hashes per column); estimate =
    (k−1)·2^60 / kth_hash with the textbook exact-small branch;
  * null_micro is an exact integer micro-fraction (`div`), the house
    threshold-feeding convention.

Determinism: h60 is the md5-derived house hash (DuckDB-replayable),
ratios are integer arithmetic, min/max are the raw typed values
(numeric → double, string → binary-collation min/max — both engines
compare UTF-8 bytes). Complex-typed columns (arrays, structs, maps,
binary) profile counts-only: their members have no cross-engine
ordering or stable string form, and a hash of a Spark-rendered struct
would not replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.text import h60

_NUMERIC = {"byte", "short", "integer", "long", "float", "double", "decimal"}
_SIMPLE = _NUMERIC | {"string", "boolean", "date", "timestamp", "timestamp_ntz"}


def profile_table(
    df: DataFrame, columns: list[str] | None = None, k: int = 64
) -> DataFrame:
    """Profile `columns` (default: every simple-typed column) of `df`.

    Returns one row per column, ordered by column name:
      (column, n_rows, n_null, null_micro, distinct_est,
       min_num, max_num, min_str, max_str)
    distinct_est is the KMV estimate over the column's 60-bit value
    hashes (exact below k distinct); min/max_num populate for numeric
    columns (double-cast), min/max_str for strings; both NULL
    otherwise. Timestamps/dates/booleans profile counts+distinct only
    (their min/max lives in the typed domain — cast upstream if a
    numeric view is wanted)."""
    types = dict(
        (f.name, f.dataType.typeName().split("(")[0]) for f in df.schema.fields
    )
    if columns is None:
        columns = [c for c in df.columns if types[c] in _SIMPLE]
    unknown = [c for c in columns if c not in types]
    if unknown:
        raise ValueError(f"profile_table: no such column(s): {unknown}")
    complex_cols = [c for c in columns if types[c] not in _SIMPLE]
    if complex_cols:
        raise ValueError(
            f"profile_table: complex-typed column(s) {complex_cols} have "
            "no cross-engine ordering or stable hash form — project a "
            "derived simple column first"
        )
    if not columns:
        raise ValueError("profile_table: nothing to profile")

    # pass 1: one aggregate row -> long format via an inline explode
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null__{c}")
        )
        if types[c] in _NUMERIC:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min__{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max__{c}"))
        if types[c] == "string":
            aggs.append(F.min(F.col(c)).alias(f"__mins__{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__maxs__{c}"))
    one = df.agg(*aggs)
    per_col = one.select(
        "__n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__null__{c}").alias("n_null"),
                        (
                            F.col(f"__min__{c}")
                            if types[c] in _NUMERIC
                            else F.lit(None).cast("double")
                        ).alias("min_num"),
                        (
                            F.col(f"__max__{c}")
                            if types[c] in _NUMERIC
                            else F.lit(None).cast("double")
                        ).alias("max_num"),
                        (
                            F.col(f"__mins__{c}")
                            if types[c] == "string"
                            else F.lit(None).cast("string")
                        ).alias("min_str"),
                        (
                            F.col(f"__maxs__{c}")
                            if types[c] == "string"
                            else F.lit(None).cast("string")
                        ).alias("max_str"),
                    )
                    for c in columns
                ]
            )
        ).alias("p"),
    ).select(
        F.col("p.column").alias("column"),
        F.col("__n_rows").alias("n_rows"),
        F.col("p.n_null").alias("n_null"),
        F.expr(
            "CAST(CASE WHEN __n_rows = 0 THEN 0 "
            "ELSE p.n_null * 1000000 div __n_rows END AS BIGINT)"
        ).alias("null_micro"),
        "p.min_num",
        "p.max_num",
        "p.min_str",
        "p.max_str",
    )

    # pass 2: per-column KMV — melt, distinct, k-smallest per column
    from warp_pipe_spark.io import explode_nonnull

    melted = explode_nonnull(
        df,
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    h60(F.col(c).cast("string")).alias("h"),
                )
                for c in columns
            ]
        ),
        "m",
    ).select("m.column", "m.h").filter(F.col("h").isNotNull()).distinct()
    w = Window.partitionBy("column").orderBy(F.col("h").asc())
    kmv = (
        melted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_actual"),
            F.max("h").alias("kth_hash"),
        )
        .select(
            "column",
            F.when(F.col("k_actual") < k, F.col("k_actual"))
            .otherwise(
                F.floor(
                    (F.lit(k) - 1) * F.pow(F.lit(2.0), 60) / F.col("kth_hash")
                ).cast("long")
            )
            .alias("distinct_est"),
        )
    )
    return (
        per_col.join(kmv, "column", "left")
        .withColumn(
            "distinct_est", F.coalesce("distinct_est", F.lit(0).cast("long"))
        )
        .select(
            "column",
            "n_rows",
            "n_null",
            "null_micro",
            "distinct_est",
            "min_num",
            "max_num",
            "min_str",
            "max_str",
        )
        .orderBy("column")
    )
