"""Structured Streaming capture → apply: drop-dir source, foreachBatch
merge sink, availableNow drain (A8), idempotent restart."""

import pytest

from warp_pipe_spark.apply import replay
from warp_pipe_spark.streaming import ParquetStateSink, apply_stream, changeset_stream

SCHEMA = "id LONG, action STRING, table_name STRING, pk LONG, val STRING"

BATCH1 = [
    (1, "INSERT", "users", 1, "a"),
    (2, "INSERT", "users", 2, "b"),
]
BATCH2 = [
    (3, "DELETE", "users", 1, "a"),
    (4, "UPDATE", "users", 2, "b2"),
    (5, "INSERT", "users", 3, "c"),
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "drop"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )


def _run(spark, drop, state, ckpt):
    from pyspark.sql import types as T

    schema = T.StructType.fromDDL(SCHEMA)
    stream = changeset_stream(spark, drop, schema=schema)
    sink = ParquetStateSink(spark, state, pk_cols=["pk"])
    q = apply_stream(stream, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    return sink


def test_stream_apply_matches_batch_replay(spark, dirs):
    drop, state, ckpt = dirs
    _write(spark, BATCH1, drop)
    _write(spark, BATCH2, drop)
    sink = _run(spark, drop, state, ckpt)
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}

    full = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {(r["pk"], r["val"]) for r in replay(full, ["pk"]).collect()}
    assert got == want == {(2, "b2"), (3, "c")}


def test_incremental_restart_resumes_from_checkpoint(spark, dirs):
    drop, state, ckpt = dirs
    _write(spark, BATCH1, drop)
    sink = _run(spark, drop, state, ckpt)
    assert {r["pk"] for r in sink.read_state().collect()} == {1, 2}

    # new files arrive; restarting with the same checkpoint processes
    # ONLY the new batch (StartFrom semantics) and converges
    _write(spark, BATCH2, drop)
    sink = _run(spark, drop, state, ckpt)
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {(2, "b2"), (3, "c")}


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """At-least-once redelivery (same changeset id in later files) is
    collapsed to one row inside the watermark horizon."""
    import datetime as dt

    from warp_pipe_spark.streaming import dedup_stream

    drop = str(tmp_path / "drop_dd")
    schema = "id LONG, ts TIMESTAMP, action STRING, pk LONG"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [(1, t0, "INSERT", 1), (2, t0, "INSERT", 2)]
    # file 2 redelivers id=2 (restart replay) plus a new id=3
    rows2 = [(2, t0, "INSERT", 2), (3, t0, "UPDATE", 1)]
    for rows in (rows1, rows2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(drop)

    from pyspark.sql import types as T

    stream = changeset_stream(spark, drop, schema=T.StructType.fromDDL(schema))
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id for r in spark.sql("SELECT id FROM dedup_out").collect()}
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").first().n
    assert got == {1, 2, 3}
    assert n == 3
