"""End-to-end demo of the whole CDC surface — capture → transform →
apply → verify — on the synthetic testdata. Runnable as:

    python examples/cdc_pipeline_demo.py [sf_dir]

Mirrors the reference's two entry points in one script: the CLI
streamer (§3.1: stream → filters → JSON lines) and the axon sync
daemon (§3.3: replay + live tail → idempotent apply → checksum verify),
restated as Structured Streaming micro-batches.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warp_pipe_spark import Axon, Pipeline, WarpPipe, WarpPipeConfig, get_spark
from warp_pipe_spark.io import derive_changesets


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("cdc_demo", cpus=8, shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="wp_demo_")
    drop = os.path.join(work, "drop")

    # -- capture: the changeset log lands as two micro-batch files ------
    log = derive_changesets(spark, sf_dir)
    b1, b2 = log.filter(F.col("id") % 2 == 0), log.filter(F.col("id") % 2 == 1)
    b1.coalesce(1).write.mode("append").parquet(drop)
    b2.coalesce(1).write.mode("append").parquet(drop)
    print(f"log: {log.count()} changesets in 2 drop files under {drop}")

    # -- §3.1 CLI streamer shape: filters -> JSON lines ------------------
    def drop_errors(rec):  # user record stage (P1 contract)
        return None if rec["table_name"] == "error" else rec

    pipe = Pipeline().add_record_stage("drop_error_tables", drop_errors)
    wp = WarpPipe(
        spark,
        WarpPipeConfig(whitelist_tables=["public.click", "public.purchase", "error"]),
        log_df=log,
        pipeline=pipe,
    )
    filtered = wp.changes_batch()
    print("after whitelist+ignore pipeline:", filtered.count(), "changesets")
    from warp_pipe_spark.changeset import to_json_lines

    for row in to_json_lines(filtered.orderBy("id").limit(3)).collect():
        print("  json:", row["json"][:110], "...")

    # -- §3.3 axon: streamed apply, then converge + verify ---------------
    ax = Axon(spark, pk_cols=["pk"])
    q = ax.run_stream(
        drop, os.path.join(work, "state"), os.path.join(work, "ckpt"),
        schema=log.schema,
    )
    q.awaitTermination(120)
    from warp_pipe_spark.streaming import ParquetStateSink

    streamed = ParquetStateSink(
        spark, os.path.join(work, "state"), pk_cols=["pk"]
    ).read_state()
    batch = ax.run_batch(log)
    print(f"state: streamed={streamed.count()} rows, batch replay={batch.count()} rows")

    verdict = ax.verify(
        batch, streamed, cols=["table_name", "pk", "user_id", "event_type"]
    )
    print("verify (per-table digest match):", verdict)
    assert all(verdict.values()), "source and target diverged!"
    print("OK — streamed apply converged to batch replay")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
