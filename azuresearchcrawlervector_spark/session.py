"""SparkSession builder with the engine's required configuration.

Scale stance: these settings are what we'd ship to a 1000-executor
cluster; locally only ``master`` and the shuffle-partition count differ.
AQE is on (runtime skew-join splitting + partition coalescing), Arrow is
on (every UDF in this engine is a pandas/Arrow UDF), session TZ is pinned
UTC for DuckDB-oracle comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "azuresearchcrawlervector-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local: ~cores; on a real cluster this would be 2-3x total cores
        # or left to AQE's coalescing from a higher initial value.
        shuffle_partitions = cpus
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # CPU-heavy Arrow UDF stages (HTML parse, image decode) run at
        # scan parallelism: 128 MB splits over a few-hundred-MB payload
        # table would cap those stages at a handful of tasks. 16 MB keeps
        # every core fed; IO-bound pure-scan jobs lose little.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
