"""Event-time analytics: batch rollup/sessionization + the streaming
windowed aggregation with watermark (late-data surface, §2.8 ext)."""

import pytest

from warp_pipe_spark.analytics import hourly_rollup, sessionize, streaming_hourly
from warp_pipe_spark.io import read_table
from warp_pipe_spark.streaming import wal2json_stream


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def test_hourly_rollup_totals(events):
    out = hourly_rollup(events)
    assert out.agg({"n_events": "sum"}).collect()[0][0] == events.count()


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),  # same session (10 min gap)
        (1, "2024-01-01 01:00:00"),  # new session (50 min gap)
        (2, "2024-01-01 00:00:00"),  # separate user
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts_s"]).selectExpr(
        "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
    )
    out = sessionize(ev, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(by_user[1]) == [1, 2]
    assert by_user[2] == [1]


@pytest.mark.soak
def test_streaming_hourly_with_watermark(spark, tmp_path, events):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    events.limit(500).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = streaming_hourly(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_mem")
        .outputMode("append")  # append requires the watermark to close windows
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; final windows stay
    # open, so we assert the query ran and produced a valid (possibly
    # empty) closed set bounded by the batch totals
    closed = spark.sql("SELECT coalesce(sum(n_events), 0) FROM hourly_mem").collect()[0][0]
    assert 0 <= closed <= 500


@pytest.mark.soak
def test_wal2json_stream_decodes(spark, tmp_path):
    import json

    src = tmp_path / "wal"
    src.mkdir()
    msg = {
        "change": [
            {
                "id": 1,
                "kind": "insert",
                "schema": "public",
                "table": "users",
                "columnnames": ["id"],
                "columntypes": ["integer"],
                "columnvalues": [1],
            }
        ],
        "nextlsn": "0/1",
    }
    (src / "m.jsonl").write_text(json.dumps(msg) + "\n")
    stream = wal2json_stream(spark, str(src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("wal_mem")
        .option("checkpointLocation", str(tmp_path / "wal_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # assert the query actually terminated: under heavy suite load the
    # r14-driver run timed out here and the bare 0-row read produced a
    # misleading assertion failure instead of "stream did not finish"
    assert q.awaitTermination(300), "wal2json stream did not finish in 300s"
    rows = spark.sql("SELECT * FROM wal_mem").collect()
    assert len(rows) == 1 and rows[0]["kind"] == "insert" and rows[0]["table"] == "users"
