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
