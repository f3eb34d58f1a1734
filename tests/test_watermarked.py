"""Watermarked streaming: windowed aggregation emits closed windows;
streaming dedup suppresses duplicate keys across micro-batches."""

from __future__ import annotations

import datetime as dt

from flink_ecommerce_spark.schemas import TRANSACTION_SCHEMA
from flink_ecommerce_spark.streaming.watermarked import dedup_stream, windowed_sales


def _txn(tid, ts, amount):
    return (
        tid, "product1", "laptop", "electronic", 10.0, 1, "apple",
        amount, "USD", "u1", ts, "credit_card",
    )


def _write(spark, path, rows, chunk):
    spark.createDataFrame(rows, TRANSACTION_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/chunk={chunk}")


def test_windowed_sales_emits_closed_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    d1 = dt.datetime(2024, 1, 1, 5, 0, 0)
    d2 = dt.datetime(2024, 1, 2, 12, 0, 0)
    d3 = dt.datetime(2024, 1, 3, 12, 0, 0)
    _write(spark, src, [_txn("a", d1, 10.0), _txn("b", d1, 5.0)], 0)
    _write(spark, src, [_txn("c", d2, 7.0)], 1)
    _write(spark, src, [_txn("d", d3, 1.0)], 2)

    stream = (
        spark.readStream.schema(TRANSACTION_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        windowed_sales(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("win_sales")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["window_start"]: r["total_sales"]
        for r in spark.sql("SELECT * FROM win_sales").collect()
    }
    # day-1 and day-2 windows closed once the watermark passed them;
    # day-3 stays open (append mode emits only finalized windows)
    assert rows[dt.datetime(2024, 1, 1)] == 15.0
    assert rows[dt.datetime(2024, 1, 2)] == 7.0
    assert dt.datetime(2024, 1, 3) not in rows


def test_dedup_stream_suppresses_duplicates(spark, tmp_path):
    src = str(tmp_path / "src2")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    _write(spark, src, [_txn("x", t0, 10.0), _txn("y", t0, 5.0)], 0)
    # duplicate key "x" again in a later micro-batch, inside the horizon
    _write(
        spark,
        src,
        [_txn("x", t0 + dt.timedelta(minutes=5), 10.0), _txn("z", t0, 1.0)],
        1,
    )

    stream = (
        spark.readStream.schema(TRANSACTION_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ids = [r["transactionId"] for r in spark.sql("SELECT * FROM dedup_out").collect()]
    assert sorted(ids) == ["x", "y", "z"], ids


def _utxn(tid, user, ts, amount):
    return (
        tid, "product1", "laptop", "electronic", 10.0, 1, "apple",
        amount, "USD", user, ts, "credit_card",
    )


def test_session_sales_merges_within_gap_and_closes(spark, tmp_path):
    from flink_ecommerce_spark.streaming.watermarked import session_sales

    src = str(tmp_path / "src3")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # u1: two txns 10 min apart (one session), then one 2h later (new
    # session); u2: a single txn. A far-future row advances the
    # watermark so every earlier session closes and emits.
    _write(
        spark,
        src,
        [_utxn("a", "u1", t0, 10.0), _utxn("b", "u1", t0 + dt.timedelta(minutes=10), 5.0)],
        0,
    )
    _write(
        spark,
        src,
        [_utxn("c", "u1", t0 + dt.timedelta(hours=2), 7.0), _utxn("d", "u2", t0, 1.0)],
        1,
    )
    _write(spark, src, [_utxn("e", "u3", t0 + dt.timedelta(days=2), 2.0)], 2)

    stream = (
        spark.readStream.schema(TRANSACTION_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        session_sales(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_sales")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        (r["key"], r["session_start"]): (r["n_txn"], r["session_spend"])
        for r in spark.sql("SELECT * FROM sess_sales").collect()
    }
    # u1's first two txns merged into one session (gap 30m > 10m apart)
    assert rows[("u1", t0)] == (2, 15.0)
    # the 2h-later txn started a NEW session
    assert rows[("u1", t0 + dt.timedelta(hours=2))] == (1, 7.0)
    assert rows[("u2", t0)] == (1, 1.0)
    # u3's far-future session is still open -> not emitted in append mode
    assert not any(k == "u3" for k, _ in rows)


def test_sliding_sales_overlapping_windows_close(spark, tmp_path):
    from flink_ecommerce_spark.streaming.watermarked import sliding_sales

    src = str(tmp_path / "src4")
    t0 = dt.datetime(2024, 1, 1, 10, 7, 0)
    _write(spark, src, [_txn("a", t0, 10.0)], 0)
    # far-future row advances the watermark so t0's windows all close
    _write(spark, src, [_txn("b", t0 + dt.timedelta(days=2), 1.0)], 1)

    stream = (
        spark.readStream.schema(TRANSACTION_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        sliding_sales(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("slide_sales")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = [
        r
        for r in spark.sql("SELECT * FROM slide_sales").collect()
        if r["total_sales"] == 10.0
    ]
    # the 10:07 transaction closed in exactly its 4 overlapping windows
    assert sorted(r["window_start"] for r in rows) == [
        dt.datetime(2024, 1, 1, 9, 15),
        dt.datetime(2024, 1, 1, 9, 30),
        dt.datetime(2024, 1, 1, 9, 45),
        dt.datetime(2024, 1, 1, 10, 0),
    ]
    assert all(r["n_txn"] == 1 for r in rows)
