"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
same conf keys are what we'd set cluster-side at 100 TB, where the
only changes are master/cores and shuffle-partition count (sized to
~128 MB per task post-AQE-coalesce, not a fixed constant).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink_ecommerce_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local mode: ~1 shuffle partition per core. On a real cluster
        # AQE coalesces from a deliberately high initial number, so we
        # set initialPartitionNum high and let AQE shrink.
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # test parquet stores events.ts as TIMESTAMP(NANOS); read the raw
        # int64 and convert in catalog.table (Spark has no nanos type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local fixtures are single small files — split finer so scan
        # tasks ≈ cores (a cluster with many files keeps the 128m
        # default; override via SPARK_GRAFT_MAX_PARTITION_BYTES)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
