"""WarpPipe / Axon facades — the reference's library contract
(warp_pipe.go:40-155, axon.go:49-270) restated over DataFrames."""

import pytest

from warp_pipe_spark.axon import Axon
from warp_pipe_spark.io import derive_changesets
from warp_pipe_spark.pipeline import Pipeline
from warp_pipe_spark.warp_pipe import WarpPipe, WarpPipeConfig


@pytest.fixture(scope="module")
def log(spark, sf_dir):
    return derive_changesets(spark, sf_dir)


def test_warp_pipe_requires_exactly_one_source(spark, log):
    with pytest.raises(ValueError):
        WarpPipe(spark)
    with pytest.raises(ValueError):
        WarpPipe(spark, drop_dir="/tmp/x", log_df=log)


def test_warp_pipe_batch_filters_and_start_from(spark, log):
    cfg = WarpPipeConfig(
        whitelist_tables=["public.*"],
        ignore_tables=["view", "error"],
        start_from_id=5000,  # sf0.001 ids run 0..~10000
    )
    wp = WarpPipe(spark, cfg, log_df=log)
    out = wp.changes_batch()
    tables = {r[0] for r in out.select("table_name").distinct().collect()}
    assert tables == {"click", "purchase", "signup"}
    assert out.filter("id < 5000").count() == 0


def test_warp_pipe_user_pipeline_appended(spark, log):
    from pyspark.sql import functions as F

    p = Pipeline().add_stage("only_inserts", lambda df: df.filter(F.col("action") == "INSERT"))
    wp = WarpPipe(spark, WarpPipeConfig(), log_df=log, pipeline=p)
    out = wp.changes_batch()
    assert {r[0] for r in out.select("action").distinct().collect()} == {"INSERT"}


def test_axon_run_batch_and_verify_converged(spark, log):
    ax = Axon(spark)
    state = ax.run_batch(log)
    assert state.count() > 0
    verdict = ax.verify(state, state)
    assert verdict and all(verdict.values())


def test_axon_verify_detects_divergence(spark, log):
    ax = Axon(spark)
    state = ax.run_batch(log)
    broken = state.filter("pk != 3")  # drop one row from one table
    verdict = ax.verify(state, broken, scalable=True)
    assert not all(verdict.values())
    assert any(verdict.values())  # only the touched table diverges


def test_axon_sequence_report(spark, log):
    ax = Axon(spark)
    state = ax.run_batch(log)
    rep = ax.sequence_report(state, ["pk", "id"])
    assert rep["pk"] == state.agg({"pk": "max"}).collect()[0][0]


def test_axon_run_stream_converges_to_batch(spark, log, tmp_path):
    """§3.3 end-to-end in streaming mode: drop-dir tail -> pipeline ->
    merge sink; availableNow drain (A8) must converge to run_batch and
    pass verify against it."""
    drop = str(tmp_path / "drop")
    log.coalesce(1).write.mode("append").parquet(drop)

    ax = Axon(spark, pk_cols=["pk"])
    q = ax.run_stream(
        drop,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=log.schema,
    )
    q.awaitTermination(120)

    from warp_pipe_spark.streaming import ParquetStateSink

    streamed = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"]).read_state()
    batch = ax.run_batch(log)
    verdict = ax.verify(
        batch, streamed, cols=["table_name", "pk", "user_id", "event_type"]
    )
    assert verdict and all(verdict.values())
