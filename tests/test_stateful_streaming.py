"""Streaming sessionization (applyInPandasWithState): state carries
open sessions across micro-batches; closed sessions match the batch
gap-cumsum sessionization.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_ecommerce_spark.streaming.stateful import (
    SESSION_GAP_SECONDS,
    streaming_sessions,
)


def _write_chunk(spark, path, rows, chunk):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/chunk={chunk}")


def test_sessions_close_across_microbatches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    gap = dt.timedelta(seconds=SESSION_GAP_SECONDS + 60)
    small = dt.timedelta(minutes=5)
    # user 1: 3 events, then (next chunk) a gap -> first session closes
    chunk1 = [
        (1, base, 1),
        (1, base + small, 2),
        (1, base + 2 * small, 3),
        (2, base, 4),
    ]
    chunk2 = [
        (1, base + 2 * small + gap, 5),  # closes user1 session (3 events)
        (2, base + gap, 6),  # closes user2 session (1 event)
        (2, base + gap + small, 7),  # same session as event 6
    ]
    src = str(tmp_path / "src")
    _write_chunk(spark, src, chunk1, 1)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    out = streaming_sessions(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT count(*) FROM sessions_out").collect()[0][0] == 0

    _write_chunk(spark, src, chunk2, 2)
    q.processAllAvailable()
    q.stop()

    rows = {
        (r["user_id"], r["n_events"]): r
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    assert (1, 3) in rows and (2, 1) in rows
    s1 = rows[(1, 3)]
    assert s1["session_start"] == base and s1["session_end"] == base + 2 * small


def test_streaming_sessions_match_batch_closed_sessions(spark, tmp_path):
    """Replaying generator events chunked: every closed streaming
    session appears in the batch sessionization with identical
    bounds."""
    from flink_ecommerce_spark.sources import generator

    txn = generator.transactions(spark, n_rows=800, seed=23)
    events = txn.select(
        F.abs(F.hash("customerId") % 50).alias("user_id"),
        F.col("transactionDate").alias("ts"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    # split into 3 time-ordered chunks written sequentially so the
    # file stream replays them in event-time order (the stateful op,
    # like the reference's keyed state, assumes in-order arrival;
    # late-data handling would need a watermark + timeout flush)
    import time

    all_rows = sorted(events.collect(), key=lambda r: (r["ts"], r["event_id"]))
    src = str(tmp_path / "gen")
    n = len(all_rows)
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = all_rows[lo : lo + (n + 2) // 3]
        spark.createDataFrame(
            chunk, "user_id long, ts timestamp, event_id long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/chunk={i}")
        time.sleep(0.05)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    out = streaming_sessions(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("gen_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM gen_sessions"
    ).collect()

    # batch truth: gap-cumsum sessionization of the SAME rows
    batch = spark.read.parquet(f"{src}/chunk=*")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    micros = F.expr("unix_micros(ts)")
    sess = (
        batch.withColumn(
            "new_sess",
            F.when(
                (micros - F.lag(micros).over(w)).isNull()
                | ((micros - F.lag(micros).over(w)) > SESSION_GAP_SECONDS * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    batch_keys = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sess
    }
    for r in streamed:
        key = (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        assert key in batch_keys, f"streamed session {key} not in batch truth"
    assert len(streamed) > 0
