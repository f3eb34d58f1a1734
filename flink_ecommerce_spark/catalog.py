"""Table loading: parquet directories -> DataFrames.

Reads are plain ``spark.read.parquet`` so Catalyst gets full
predicate-pushdown / column-pruning / partition-pruning freedom; at
100 TB the same call points at a partitioned table root and prune
rules take care of the rest. Nothing here materializes.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

from .schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. `name` must be one of TABLE_NAMES.

    Works on ANY SparkSession (the driver supplies its own): the two
    correctness-critical session confs are set here, dynamically —
    UTC timezone (oracle parity for date/year extraction) and
    nanosAsLong (events.ts is parquet TIMESTAMP(NANOS), which Spark
    only reads as a raw int64).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # int64 nanos → truncate to micros (same as DuckDB's
        # nanos→micros truncation, integer division).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
