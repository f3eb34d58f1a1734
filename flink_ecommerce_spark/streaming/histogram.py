"""Streaming histogram sketch: running value-distribution counters on
a live stream with state bounded BY CONSTRUCTION — the streaming twin
of ``plans/temporal.value_percentiles_hist`` and the second operator
here (after the Count-Min sketch) whose state bound is structural: a
groupBy on the bucket index can never hold more than ``buckets`` rows
no matter how many values flow.

Unlike the batch op, a stream cannot take a global (min, max) first —
the bounds are a FIXED parameter, supplied from a historical batch
profile (``value_percentiles_hist``'s bounds, a data contract, or the
sensor's physical range). Out-of-range values clamp into the edge
buckets, preserving total mass; when the clamped share grows, the
bounds are stale — re-profile and restart the sketch. Counter
addition commutes with micro-batching, so the running cell table
equals the batch histogram over the same rows (pinned in tests), and
percentile estimates read off the cumulative table exactly as in the
batch op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIST_BUCKETS = 256


def bucket_index(
    value: F.Column, vmin: float, vmax: float, buckets: int = HIST_BUCKETS
) -> F.Column:
    """Fixed-range bucket index with edge clamping (total mass is
    preserved; out-of-range values saturate into buckets 0 / n-1)."""
    if not vmax > vmin:
        raise ValueError("need vmax > vmin for a fixed-range histogram")
    w = (vmax - vmin) / float(buckets)
    raw = F.floor((value - F.lit(vmin)) / F.lit(w))
    return F.greatest(F.lit(0), F.least(F.lit(buckets - 1), raw))


def streaming_histogram(
    stream: DataFrame,
    vmin: float,
    vmax: float,
    buckets: int = HIST_BUCKETS,
    value_col: str = "value",
) -> DataFrame:
    """value stream → running (idx, cnt) bucket counts. Use with
    ``outputMode("update")``/``"complete"``; aggregation state is at
    most ``buckets`` rows."""
    idx = bucket_index(F.col(value_col), vmin, vmax, buckets)
    return (
        stream.select(idx.alias("idx"))
        .groupBy("idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def percentile_estimates(
    cells, vmin: float, vmax: float, buckets: int = HIST_BUCKETS,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> dict[float, float]:
    """Driver-side read of a collected cell table [(idx, cnt), ...]:
    upper-edge percentile estimates, error ≤ one bucket width (plus
    any clamped-mass distortion at the edges)."""
    w = (vmax - vmin) / float(buckets)
    cells = sorted((r["idx"], r["cnt"]) for r in cells)
    n = sum(c for _, c in cells)
    out: dict[float, float] = {}
    for p in ps:
        cum = 0
        for idx, cnt in cells:
            cum += cnt
            if cum >= p * n:
                out[p] = min(vmin + w * (idx + 1), vmax)
                break
    return out
