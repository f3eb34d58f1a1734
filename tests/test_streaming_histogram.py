"""Streaming histogram sketch: structural state bound + batch
equivalence (counter addition commutes with micro-batching)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.streaming.histogram import (
    HIST_BUCKETS,
    bucket_index,
    percentile_estimates,
    streaming_histogram,
)

VMIN, VMAX = 0.0, 500.0


def _write_chunk(spark, path, rows, chunk):
    spark.createDataFrame(rows, "value double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/chunk={chunk}")


def test_streaming_histogram_equals_batch(spark, tmp_path):
    rows1 = [(float(v),) for v in range(0, 300, 7)]
    rows2 = [(float(v),) for v in range(1, 500, 11)] + [
        (-50.0,),  # below range -> clamps into bucket 0
        (1e9,),  # above range -> clamps into the last bucket
    ]
    src = str(tmp_path / "vals")
    _write_chunk(spark, src, rows1, 1)
    _write_chunk(spark, src, rows2, 2)

    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_histogram(stream, VMIN, VMAX)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hist_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["idx"]: r["cnt"] for r in spark.sql("SELECT * FROM hist_out").collect()
    }

    batch_df = spark.createDataFrame(rows1 + rows2, "value double")
    batch = {
        r["idx"]: r["cnt"]
        for r in batch_df.select(
            bucket_index(F.col("value"), VMIN, VMAX).alias("idx")
        )
        .groupBy("idx")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert streamed == batch
    assert len(streamed) <= HIST_BUCKETS  # structural bound
    assert streamed[0] >= 1 and streamed[HIST_BUCKETS - 1] >= 1  # clamps landed


def test_percentile_estimates_from_cells(spark):
    vals = [(float(v),) for v in range(1, 1001)]  # uniform 1..1000
    df = spark.createDataFrame(vals, "value double")
    cells = (
        df.select(bucket_index(F.col("value"), 0.0, 1000.0).alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    est = percentile_estimates(cells, 0.0, 1000.0)
    w = 1000.0 / HIST_BUCKETS
    for p in (0.5, 0.9, 0.99):
        true = p * 1000.0
        assert true - 1e-9 <= est[p] <= true + w + 1e-9
