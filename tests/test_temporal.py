"""As-of join and bucketed range join: edge semantics on controlled
fixtures — equal-timestamp matches, no-prior-row nulls, right-side tie
break, and intervals crossing bucket (midnight) boundaries."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.temporal import asof_join, range_join_buckets


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, ts("2024-01-01 10:00:00")),  # before any right row
            (2, 1, ts("2024-01-01 12:00:00")),  # equal ts -> matches
            (3, 1, ts("2024-01-01 15:00:00")),  # after both right rows
            (4, 2, ts("2024-01-01 12:00:00")),  # other key
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 12:00:00"), 10, "a"),
            (1, ts("2024-01-01 12:00:00"), 11, "b"),  # same ts, higher seq
            (1, ts("2024-01-01 14:00:00"), 12, "c"),
            (2, ts("2024-01-01 11:00:00"), 20, "z"),
        ],
        "user_id LONG, ts TIMESTAMP, seq LONG, tag STRING",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = {
        r["event_id"]: (r["seq"], r["tag"])
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            payload_cols=["seq", "tag"], right_seq="seq",
        ).collect()
    }
    assert out[1] == (None, None)  # nothing at-or-before 10:00
    assert out[2] == (11, "b")  # equal ts matches; seq tie-break -> b
    assert out[3] == (12, "c")  # latest prior
    assert out[4] == (20, "z")  # per-key isolation


def test_range_join_crosses_midnight(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 23:30:00"), 1.0),  # in window (day 1)
            (1, ts("2024-01-02 00:30:00"), 2.0),  # in window (day 2)
            (1, ts("2024-01-02 02:00:00"), 4.0),  # exactly at win_end
            (1, ts("2024-01-02 02:00:01"), 8.0),  # just outside
            (2, ts("2024-01-02 00:30:00"), 16.0),  # wrong key
        ],
        "user_id LONG, ev_ts TIMESTAMP, value DOUBLE",
    )
    right = spark.createDataFrame(
        [(100, 1, ts("2024-01-01 23:00:00"), ts("2024-01-02 02:00:00"))],
        "win_id LONG, user_id LONG, win_start TIMESTAMP, win_end TIMESTAMP",
    )
    got = (
        range_join_buckets(
            left, right, key="user_id", left_ts="ev_ts",
            right_start="win_start", right_end="win_end",
        )
        .groupBy("win_id")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    assert [(r["win_id"], r["s"], r["n"]) for r in got] == [(100, 7.0, 3)]


def test_last_touch_variants_agree_on_click_ts_ties(spark):
    """Two clicks at the IDENTICAL timestamp before one purchase: the
    join variant's max(ROW(ts, id)) and the as-of variant's right_seq
    tie-break must both pick the higher click_id — pinned so the two
    registered attribution paths can never diverge on ties."""
    import datetime

    from pyspark.sql import functions as F

    from warp_pipe_spark.datapipe.temporal import asof_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    clicks = spark.createDataFrame(
        [(1, t0, 7), (2, t0, 7)],
        "click_id LONG, cts TIMESTAMP, user_id LONG",
    )
    purchases = spark.createDataFrame(
        [(9, datetime.datetime(2024, 1, 1, 12, 10), 7)],
        "purchase_id LONG, pts TIMESTAMP, user_id LONG",
    )
    # as-of path
    a = asof_join(
        purchases, clicks, key="user_id", left_ts="pts", right_ts="cts",
        payload_cols=["click_id", "cts"], right_seq="click_id",
    ).collect()
    assert [(r["purchase_id"], r["click_id"]) for r in a] == [(9, 2)]
    # join path (the events_attribution_last aggregation shape)
    j = clicks.join(purchases, "user_id").filter(
        (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES"))
    )
    best = F.max(F.struct(F.unix_millis("cts").alias("cms"),
                          F.col("click_id").alias("cid")))
    b = j.groupBy("purchase_id").agg(best["cid"].alias("click_id")).collect()
    assert [(r["purchase_id"], r["click_id"]) for r in b] == [(9, 2)]


def test_asof_null_right_rows_never_match(spark):
    """A right row with NULL ts sorts first ascending and would become
    the 'latest prior row' for left rows with no real predecessor; a
    NULL key groups with NULL-key left rows under partitionBy although
    a join never equates NULLs. Neither may produce a match — DuckDB's
    ASOF JOIN (the replay oracle) yields none for either."""
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00")), (2, None, ts("2024-01-01 10:00:00"))],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, None, 99, "ghost"), (None, ts("2024-01-01 09:00:00"), 88, "nullkey")],
        "user_id LONG, rts TIMESTAMP, v LONG, tag STRING",
    )
    out = asof_join(left, right, "user_id", "ts", "rts", ["v", "tag"]).collect()
    by_id = {r["event_id"]: (r["v"], r["tag"]) for r in out}
    # key 1's only right row has NULL ts -> no prior row -> NULL payload
    assert by_id[1] == (None, None)
    # NULL-key left row must not match the NULL-key right row
    assert by_id[2] == (None, None)


def test_range_join_buckets_survive_dst_transition(spark):
    """Calendar-day buckets, not 86400s steps: in a DST session
    timezone a fixed-seconds sequence lands one hour off the truncated
    midnights after spring-forward, the equi-join keys never meet, and
    an in-interval match silently disappears."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        left = spark.createDataFrame(
            [(1, 1, ts("2026-03-09 12:00:00"))],  # day after spring-forward
            "event_id LONG, key LONG, ts TIMESTAMP",
        )
        right = spark.createDataFrame(
            [(1, ts("2026-03-07 00:30:00"), ts("2026-03-10 23:00:00"), "w")],
            "key LONG, start TIMESTAMP, stop TIMESTAMP, tag STRING",
        )
        got = range_join_buckets(
            left, right, "key", "ts", "start", "stop"
        ).collect()
        assert len(got) == 1 and got[0]["tag"] == "w"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
