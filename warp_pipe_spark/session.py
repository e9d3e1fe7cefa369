"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM; on a real cluster the same declarative plans
partition across executors — every knob here is chosen so the plan that
runs on local[32] is the plan we'd want on 1000 executors:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting,
  which is what survives a 100x scale-up without retuning.
- shuffle.partitions sized to cores locally; on a cluster AQE re-derives
  parallelism from `advisoryPartitionSizeInBytes` so the static number
  only sets the pre-AQE ceiling.
- Arrow enabled: every Pandas-UDF boundary is columnar-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "warp_pipe_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # files.maxPartitionBytes default 128m is right for the cluster
        # target; leave it so local plans match cluster plans.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
