"""Continuous aggregate (hypertable-style rollup): a materialized
time-bucketed rollup plus an on-the-fly raw tail, unioned so readers
see EXACT totals while only the unmaterialized tail is computed live.

This is the TimescaleDB continuous-aggregate read path re-expressed
in DataFrames: the streaming job (or a periodic batch) maintains the
rollup table for buckets wholly before a refresh threshold (the same
idempotent keyed-upsert machinery as the sales branches,
streaming/sinks.py); queries call ``rollup_with_tail`` and pay the
aggregation cost of only the post-threshold slice.

Scale: the materialized side is a plain scan of an already-tiny
rollup table (one row per bucket × key — prune it by time predicate
like any partitioned fact). The tail side aggregates only rows with
``ts >= threshold``: with the raw table date-partitioned
(sources/layout.py::write_events_partitioned), that filter prunes to
the last partition(s) before any I/O. The union is exact because the
threshold is bucket-ALIGNED: a bucket is either wholly materialized
or wholly in the tail — never split (enforced here by flooring the
threshold to a bucket boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET = "1 hour"


def time_bucket_rollup(
    events: DataFrame,
    bucket: str = DEFAULT_BUCKET,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """The rollup aggregate: per (bucket_start, key) count + sum.
    One map-side-combined shuffle on (bucket_start, key); the window
    function F.window assigns buckets scan-side, no join."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), bucket).alias("__w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            F.col("__w.start").alias("bucket_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def bucket_floor(ts, bucket: str = DEFAULT_BUCKET):
    """Floor a timestamp column/literal to its bucket start — the
    alignment rollup_with_tail requires of its threshold."""
    return F.window(ts, bucket)["start"]


def rollup_with_tail(
    materialized: DataFrame,
    raw_events: DataFrame,
    threshold,
    bucket: str = DEFAULT_BUCKET,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Exact rollup over ALL data = materialized buckets strictly
    before the (bucket-aligned) ``threshold`` + live aggregation of
    raw rows at/after it. ``threshold`` is a timestamp-like literal
    or Column; it is floored to a bucket boundary here so no bucket
    is ever half-materialized, half-live."""
    thr = bucket_floor(F.lit(threshold).cast("timestamp"), bucket)
    head = materialized.filter(F.col("bucket_start") < thr)
    tail = time_bucket_rollup(
        raw_events.filter(F.col(ts_col).cast("timestamp") >= thr),
        bucket,
        ts_col,
        key_col,
        value_col,
    )
    return head.select(
        "bucket_start", key_col, "n_events", "total_value"
    ).unionByName(tail)
