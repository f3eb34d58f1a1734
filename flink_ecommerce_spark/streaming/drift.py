"""Streaming distribution-drift monitor: PSI of the live value
stream against a static baseline profile, at state bounded BY
CONSTRUCTION.

The batch ``value_psi_by_type`` asks "did the distribution move
between two halves of history"; in production the question is "is
TODAY's stream sliding away from the profile we trained/launched
on". This module answers it the structural-bound way the other
streaming sketches do: the stream reduces to a running
(event_type, bucket) count — at most #types × n_buckets state rows
no matter how many events flow (counts sum, so the aggregation
commutes with micro-batching) — and each emission joins the static
baseline table to produce per-type PSI via the SAME arithmetic core
(``plans.analytics.psi_from_bucket_counts``) the batch op uses, so
the two monitors can never disagree on what PSI means.

Usage shape (foreachBatch, like the admission CLI): the streaming
aggregation runs in update/complete mode; the PSI join against the
baseline runs per emission over the tiny count table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.analytics import psi_from_bucket_counts, value_bucket


def baseline_value_buckets(
    events: DataFrame, n_buckets: int = 10, bucket_width: float = 10.0
) -> DataFrame:
    """(event_type, bucket, n) — the static baseline profile,
    computed ONCE from a reference corpus and broadcast thereafter."""
    return (
        events.select(
            "event_type",
            value_bucket(F.col("value"), n_buckets, bucket_width).alias(
                "bucket"
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def streaming_value_buckets(
    events: DataFrame, n_buckets: int = 10, bucket_width: float = 10.0
) -> DataFrame:
    """Event stream → running (event_type, bucket, n) counts. A
    streaming groupBy whose state is capped at #types × n_buckets
    rows; identical binning to the baseline builder."""
    return (
        events.select(
            "event_type",
            value_bucket(F.col("value"), n_buckets, bucket_width).alias(
                "bucket"
            ),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_vs_baseline(
    current: DataFrame, baseline: DataFrame, n_buckets: int = 10
) -> DataFrame:
    """(event_type, n_baseline, n_current, psi) — PSI of the
    accumulated stream counts against the static baseline, through
    the shared arithmetic core. Both inputs are (event_type, bucket,
    n) tables; types present in either side participate (absent-side
    counts are zero and Laplace smoothing keeps every term finite)."""
    b = baseline.select(
        "event_type", "bucket", F.col("n").alias("nb")
    )
    c = current.select("event_type", "bucket", F.col("n").alias("nc"))
    counts = b.join(c, ["event_type", "bucket"], "full").fillna(
        0, ["nb", "nc"]
    )
    return psi_from_bucket_counts(counts, n_buckets)


def streaming_digit_counts(events: DataFrame) -> DataFrame:
    """Event stream → running (event_type, digit, n) first-digit
    counts: the streaming half of the Benford integrity screen.
    State is capped at #types × 9 rows BY CONSTRUCTION (digits are
    1-9) no matter how many events flow, and counts sum, so the
    aggregation commutes with micro-batching — the final table
    equals the batch ``plans.analytics.digit_counts`` over the same
    rows (pinned in tests)."""
    from ..plans.analytics import digit_counts

    return digit_counts(events)


def benford_report(counts: DataFrame) -> DataFrame:
    """Per-emission Benford report over the tiny accumulated count
    table — the SAME arithmetic core as the batch
    ``value_benford_by_type`` (shared ``benford_from_digit_counts``),
    so the streaming and batch screens cannot disagree on what a
    deviation means."""
    from ..plans.analytics import benford_from_digit_counts

    return benford_from_digit_counts(counts)
