"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webdedup",
    cores: int | str | None = None,
    shuffle_partitions: int = 32,
    extra: dict | None = None,
) -> SparkSession:
    """Local session tuned for the dedup pipeline.

    On a real cluster these configs ship unchanged via spark-submit --conf;
    AQE + skew-join stay on so hot LSH buckets that survive salting are still
    split at runtime.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # at bench scale the default 64m advisory size coalesces small
        # shuffles to 1-2 tasks, capping parallelism well below the core
        # count (at production partition sizes this never binds) — keep
        # coalesced partitions small enough to feed every core
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("WEBDEDUP_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
