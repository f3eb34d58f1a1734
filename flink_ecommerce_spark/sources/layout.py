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


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-cluster rows across output files on `cluster_cols`:
    repartitionByRange gives each file a narrow, pairwise-disjoint
    slice of the leading key's domain, and sortWithinPartitions keeps
    every row group's min/max tight inside it. Any downstream range or
    point predicate on the leading key then skips all but the touched
    row groups via parquet statistics — the single biggest read-side
    lever after directory partitioning, and the right layout for the
    secondary access path a hypertable-style rollup would index.

    Scale: one range-exchange (sampled boundaries) + local sort; cost
    amortizes over every future scan. Prefer the coarse dt-directory
    partitioning (write_events_partitioned) for time, this for the
    high-cardinality secondary key."""
    n = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    order_col: str = "doc_id",
    mode: str = "overwrite",
) -> int:
    """Export fixed-size training shards: range-repartition on
    ``order_col`` into ceil(n / rows_per_shard) partitions (shard
    boundaries follow the global order, so the shard a row lands in
    is reproducible run-to-run and independent of cluster
    parallelism), sort within each shard, and cap file size with
    maxRecordsPerFile as the enforcement backstop. Returns the
    partition count. NOTE — eager: sizing the shard count runs one
    count() job before the write (the same deliberate tradeoff as
    user_value_quartiles, documented there)."""
    import math

    n = df.count()
    n_parts = max(1, math.ceil(n / rows_per_shard))
    (
        df.repartitionByRange(n_parts, order_col)
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )
    return n_parts
