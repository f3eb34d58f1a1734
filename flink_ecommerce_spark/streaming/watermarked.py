"""Watermarked streaming variants — the production-hardened path the
reference never built (it runs watermark-free with unbounded state,
DataStreamJob.java:98; SURVEY.md §7 risk 5 keeps that for parity and
documents these as the bounded-state alternative).

- ``windowed_sales``: event-time tumbling windows + watermark; state
  for closed windows is dropped once the watermark passes, so state
  is O(open windows × keys) instead of O(all history).
- ``dedup_stream``: exact streaming dedup on the upsert key within
  the watermark horizon (dropDuplicatesWithinWatermark) — the
  streaming twin of the reference's idempotent ON CONFLICT sink:
  duplicates arriving within the horizon are suppressed at the
  source instead of absorbed by the database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_sales(
    stream: DataFrame,
    ts_col: str = "transactionDate",
    amount_col: str = "totalAmount",
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window totals with late-data cutoff."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.round(F.sum(amount_col), 2).alias("total_sales"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "total_sales",
        )
    )


def sliding_sales(
    stream: DataFrame,
    ts_col: str = "transactionDate",
    amount_col: str = "totalAmount",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding event-time windows (the streaming twin of the batch
    ``plans/temporal.py::sliding_event_counts``): each transaction
    lands in window/slide overlapping windows, closed windows emit in
    append mode once the watermark passes, and their state drops — so
    state is O(open windows), with window/slide concurrently open per
    key space. Completes the window-family matrix: tumbling, session,
    and sliding each exist batch-side and stream-side."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count("*").alias("n_txn"),
            F.round(F.sum(amount_col), 2).alias("total_sales"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_txn",
            "total_sales",
        )
    )


def session_sales(
    stream: DataFrame,
    key_col: str = "customerId",
    ts_col: str = "transactionDate",
    amount_col: str = "totalAmount",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time SESSION windows per key (F.session_window — gap-based
    dynamic windows, the streaming twin of the batch
    ``plans/analytics.py::session_window_stats``). A session closes
    once the watermark passes its end + gap, the closed window emits in
    append mode, and its state is dropped — so state is O(open
    sessions), not O(history). Two events of one key merge into one
    session iff they are within ``gap``; the engine merges sessions
    that late (but in-watermark) events bridge."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_txn"),
            F.round(F.sum(amount_col), 2).alias("session_spend"),
        )
        .select(
            F.col(key_col).alias("key"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_txn",
            "session_spend",
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "transactionDate",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on the upsert key within the watermark
    horizon. State holds one entry per key seen inside the horizon."""
    keys = key_cols or ["transactionId"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
