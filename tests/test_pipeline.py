"""Pipeline stage semantics — mirrors pipeline_test.go:12-100: chained
stages (PII column removal → uppercase table → drop test users), nil
drop, and the out-of-band error channel."""

import pytest

from warp_pipe_spark.pipeline import (
    Pipeline,
    drop_where_stage,
    remove_column_stage,
    uppercase_table_stage,
)


@pytest.fixture()
def changesets(spark):
    rows = [
        (1, "insert", "users", {"id": "1", "password": "hunter2", "is_test": "false"}),
        (2, "insert", "users", {"id": "2", "password": "secret", "is_test": "true"}),
    ]
    return spark.createDataFrame(
        rows, "id LONG, kind STRING, table STRING, new_values MAP<STRING,STRING>"
    )


def test_reference_three_stage_pipeline(changesets):
    # pipeline_test.go: remove PII column, uppercase table, drop test rows
    p = (
        Pipeline()
        .add_record_stage("remove_password", remove_column_stage("password"))
        .add_record_stage("uppercase_table", uppercase_table_stage())
        .add_record_stage(
            "drop_test_users", drop_where_stage(lambda r: r["new_values"].get("is_test") == "true")
        )
    )
    out = p.run(changesets).collect()
    assert len(out) == 1  # one changeset dropped
    row = out[0]
    assert row["table"] == "USERS"
    assert "password" not in row["new_values"]
    assert row["new_values"]["id"] == "1"


def test_dataframe_stage_chaining(changesets):
    from pyspark.sql import functions as F

    p = (
        Pipeline()
        .add_stage("only_inserts", lambda df: df.filter(F.col("kind") == "insert"))
        .add_stage("tag", lambda df: df.withColumn("tag", F.lit("x")))
    )
    out = p.run(changesets)
    assert out.count() == 2
    assert "tag" in out.columns


def test_error_routes_to_dead_letter_and_stream_continues(changesets):
    # pipeline.go:17-27: a stage error is reported out-of-band; the
    # stream keeps going
    def boom(rec):
        if rec["id"] == 2:
            raise ValueError("bad record")
        return rec

    p = Pipeline().add_record_stage("boom", boom)
    ok, dead = p.run_with_errors(changesets)
    assert [r["id"] for r in ok.collect()] == [1]
    bad = dead.collect()
    assert len(bad) == 1 and bad[0]["id"] == 2
    assert "boom" in bad[0]["_wp_error"]


def test_record_stage_order_matters(changesets):
    # drop-then-transform ≠ transform-then-drop (insertion order is
    # execution order, pipeline.go:76-89)
    p1 = (
        Pipeline()
        .add_record_stage("drop_all", drop_where_stage(lambda r: True))
        .add_record_stage("upper", uppercase_table_stage())
    )
    assert p1.run(changesets).count() == 0


def test_run_with_errors_single_pass(spark, changesets):
    # VERDICT r2 item 1: consuming BOTH sides of run_with_errors must
    # execute each record stage exactly once per record (the mapped
    # frame is persisted before the ok/dead split).
    acc = spark.sparkContext.accumulator(0)

    def counting(rec):
        acc.add(1)
        if rec["id"] == 2:
            raise ValueError("bad record")
        return rec

    p = Pipeline().add_record_stage("counting", counting)
    ok, dead = p.run_with_errors(changesets)
    assert ok.count() == 1
    assert dead.count() == 1
    assert acc.value == 2  # 2 records, one pass each — not 4
    p.unpersist()
