"""Temporal joins Spark has no native operator for: as-of join and
bounded range (interval) join, built scale-first.

As-of join — "for each left row, the latest right row with
right_ts <= left_ts per key" — is NOT expressed as a range join (that
plan is O(|L|·|R|) per key and Spark would nested-loop it). The
scalable form is the union+window trick:

    union(left-tagged, right-tagged)
      -> ONE shuffle keyed by the join key
      -> in-partition sort by (ts, side, seq)
      -> last(right_payload, ignoreNulls) over rows-unbounded-preceding

Cost: one exchange + one sort, linear in |L|+|R| — the same shape a
1000-executor cluster wants. Rows at equal timestamps resolve
right-before-left (an as-of match INCLUDES right_ts == left_ts), and
right-side ties are broken by a caller-supplied sequence column so the
result is deterministic (DuckDB's ASOF JOIN replays it exactly).

Range join — "left rows within [start, end] of right intervals" —
equi-joins on coarse time buckets first (each interval explodes into
its covered buckets, each left row into one bucket), then refines with
the precise predicate. Expansion is bounded by interval_length /
bucket_width, so the exchange stays linear instead of the cross-product
a raw theta-join plan degenerates to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_seq: str | None = None,
) -> DataFrame:
    """For each left row: the payload of the latest right row with
    right_ts <= left_ts and matching `key`. Left rows with no prior
    right row keep NULL payloads (left-outer as-of).

    right_seq breaks right-side timestamp ties deterministically
    (highest seq wins, matching "latest row" semantics).
    """
    lcols = left.columns
    seq = F.col(right_seq) if right_seq else F.lit(0)
    # Rows that cannot participate in an as-of match under SQL/DuckDB
    # ASOF semantics must not leak matches: a NULL right_ts sorts FIRST
    # ascending and would become the "latest prior row" for left rows
    # that have no real predecessor, and NULL keys group together under
    # partitionBy although a join would never equate them. Drop them
    # from the right side; NULL-key/NULL-ts left rows keep NULL
    # payloads by construction (nothing precedes them).
    right = right.filter(F.col(right_ts).isNotNull() & F.col(key).isNotNull())
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal ts
        seq.cast("long").alias("_seq"),
        F.struct(*payload_cols).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *lcols,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.unionByName(l)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*lcols, *[F.col("_match")[c].alias(c) for c in payload_cols])
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Left rows falling inside [right_start, right_end] per key:
    coarse equi-join on (key, time-bucket) — intervals explode into the
    buckets they cover, left rows map to one bucket — then the exact
    BETWEEN refines. Returns left ⋈ right matched pairs (inner).

    bucket should be >= the typical interval length so the per-interval
    explosion stays O(1); the equi-join keeps Catalyst in hash-join
    land (broadcast or shuffle by (key, bucket)) instead of the
    nested-loop a bare inequality join forces.
    """
    if bucket != "1 day":
        raise ValueError("only '1 day' buckets are implemented")

    # Buckets are CALENDAR days, not fixed 86400s steps: sequence over
    # timestamps with an INTERVAL step lands on the same midnights
    # date_trunc('day') produces in ANY session timezone. Stepping unix
    # seconds drifts one hour off the truncated left-side buckets at a
    # DST transition (a 23/25-hour day), silently dropping matches.
    from warp_pipe_spark.io import explode_nonnull

    r = explode_nonnull(
        right,
        F.sequence(
            F.date_trunc("day", F.col(right_start)),
            F.date_trunc("day", F.col(right_end)),
            F.expr("INTERVAL 1 DAY"),
        ),
        "_bucket",
    )
    l = left.withColumn(  # noqa: E741
        "_bucket", F.date_trunc("day", F.col(left_ts))
    )
    joined = l.join(r, [key, "_bucket"]).filter(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.drop("_bucket")
