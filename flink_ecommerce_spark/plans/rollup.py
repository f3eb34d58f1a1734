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


def refresh_rollup(
    materialized: DataFrame,
    raw_events: DataFrame,
    window_start,
    window_end,
    bucket: str = DEFAULT_BUCKET,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Batch incremental refresh — the
    ``refresh_continuous_aggregate`` analog: recompute the
    bucket-aligned [window_start, window_end) slice from raw events
    and splice it into the materialized rollup, REPLACING any
    existing rows for those buckets. Periodic maintenance calls this
    with (last_threshold, now); re-running it over an OLD window
    folds in late-arriving data for exactly those buckets (buckets
    outside the window stay untouched — Timescale's semantics).

    Exactness: both bounds are floored to bucket edges, so the
    recomputed slice covers whole buckets only, and the anti-filter
    removes exactly the rows the slice replaces. Scale: the raw scan
    is bounded by the refresh window (partition-pruned when the raw
    table is date-partitioned); the splice touches the tiny rollup
    table only. Returns the new materialized frame — persisting it
    is the caller's sink (keyed upsert or StagedMergeSink, both
    idempotent on (bucket_start, key))."""
    # The two bounds are floored EAGERLY (two driver scalars):
    # Spark rejects multiple F.window expressions in one plan node,
    # and literal bounds keep the main plan free of window exprs
    # entirely (the delta's time_bucket_rollup keeps the only one).
    spark = materialized.sparkSession

    def _floor(v):
        return (
            spark.range(1)
            .select(
                bucket_floor(F.lit(v).cast("timestamp"), bucket).alias("t")
            )
            .collect()[0]["t"]
        )

    ws = F.lit(_floor(window_start)).cast("timestamp")
    we = F.lit(_floor(window_end)).cast("timestamp")
    delta = time_bucket_rollup(
        raw_events.filter(
            (F.col(ts_col).cast("timestamp") >= ws)
            & (F.col(ts_col).cast("timestamp") < we)
        ),
        bucket,
        ts_col,
        key_col,
        value_col,
    )
    kept = materialized.filter(
        (F.col("bucket_start") < ws) | (F.col("bucket_start") >= we)
    )
    return kept.select(
        "bucket_start", key_col, "n_events", "total_value"
    ).unionByName(delta)
