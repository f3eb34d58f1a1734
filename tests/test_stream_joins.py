"""Streaming joins: stream-stream interval join with watermarks, and
stream-static dimension enrichment — the two join modes Structured
Streaming supports and the reference (join-free) never had."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _write(spark, path, rows, chunk):
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/chunk={chunk}")


def test_stream_stream_interval_join(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    src = str(tmp_path / "ev")
    _write(
        spark,
        src,
        [
            (1, t0, 1, "click", 0.0),
            (1, t0 + dt.timedelta(minutes=30), 2, "purchase", 9.0),  # in window
            (1, t0 + dt.timedelta(hours=2), 3, "purchase", 5.0),  # outside
            (2, t0, 4, "purchase", 3.0),  # no prior click for user 2
        ],
        0,
    )
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string, value double"
        )
        .parquet(f"{src}/chunk=*")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT click_id, purchase_id FROM ssj").collect()
    assert {(r["click_id"], r["purchase_id"]) for r in rows} == {(1, 2)}


def test_stream_static_enrichment(spark, tmp_path):
    """Streaming fact enriched with a static dimension (broadcast
    join against a batch DataFrame — no state, no watermark needed)."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "ev2")
    _write(
        spark,
        src,
        [(1, t0, 1, "purchase", 10.0), (2, t0, 2, "purchase", 20.0)],
        0,
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "bronze")], "user_id long, tier string"
    )
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string, value double"
        )
        .parquet(f"{src}/chunk=*")
    )
    enriched = stream.join(F.broadcast(dim), "user_id").select(
        "event_id", "tier", "value"
    )
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["event_id"]: r["tier"] for r in spark.sql("SELECT * FROM enriched").collect()}
    assert rows == {1: "gold", 2: "bronze"}
