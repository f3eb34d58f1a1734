"""Output data layout: partitioned/sorted parquet writers.

At 100 TB the sink layout *is* the read-side performance story:
date-partitioned directories give partition pruning to every
downstream time-ranged query, and within-file sorting by a secondary
key gives min/max row-group skipping. These helpers encode the
layout conventions; they are thin by design — the value is the
convention, not the code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_col: str | None = "user_id",
    mode: str = "overwrite",
) -> None:
    """Write events partitioned by event date (dt=YYYY-MM-DD dirs).
    Downstream `WHERE dt BETWEEN ...` prunes directories before any
    I/O; `sort_col` sorting inside each partition enables row-group
    min/max skipping for point lookups."""
    out = df.withColumn("dt", F.to_date(ts_col))
    out = out.repartition("dt")
    if sort_col:
        out = out.sortWithinPartitions("dt", sort_col)
    out.write.mode(mode).partitionBy("dt").parquet(path)


def read_events_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
