"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webdedup",
    cores: int | str | None = None,
    shuffle_partitions: int = 32,
    advisory_partition_size: str = "4m",
    min_partition_size: str = "1m",
    extra: dict | None = None,
) -> SparkSession:
    """Local session tuned for the dedup pipeline.

    On a real cluster these configs ship unchanged via spark-submit --conf;
    AQE + skew-join stay on so hot LSH buckets that survive salting are still
    split at runtime.

    ``advisory_partition_size`` / ``min_partition_size`` default to small
    values that keep every local core fed at test/bench corpus sizes; at
    production shuffle volumes pass Spark's own defaults ("64m" / "1m") —
    a 4m advisory size there multiplies post-shuffle partition counts ~16x,
    inflating task-scheduling and small-file overhead for no benefit.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            advisory_partition_size,
        )
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            min_partition_size,
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("WEBDEDUP_ARROW_BATCH", "4096"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("WEBDEDUP_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
