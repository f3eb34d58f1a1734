"""Streaming anomaly scores: per-event-type running z-scores with
Welford state — the streaming twin of the batch
``plans.analytics.daily_anomaly_scores`` (which baselines each day
against its trailing week; a stream can't wait for the day to close,
so this scores EACH EVENT against everything the key has seen so
far).

State per event_type is THREE numbers — (n, mean, M2) in Welford's
online form — so state is O(#types) no matter how long the stream
runs: the canonical bounded-state monitoring operator, next to the
Count-Min sketch and the fixed-range histogram. Each value is scored
against the PRE-update baseline (its own arrival must not dilute the
baseline that judges it — the same self-exclusion rule as the batch
op's trailing frame), then folded in. z is NULL until the key holds
at least ``min_baseline`` observations or while the running variance
is zero ("no baseline" stays explicit, never a fake 0.0 score).

Scores depend on ARRIVAL ORDER (any online scorer's semantics):
within a micro-batch group the rows are sorted by (ts, event_id)
for determinism, but cross-batch order is the stream's order. The
pytest drives explicit micro-batches and pins the scores to a pure
Python Welford reference.

Reference for the extension surface: the Flink job has no anomaly
operator (DataStreamJob.java:84-337 is maps + keyed reduces); this
lives on the monitoring side of the extension inventory
(SURVEY.md §2.6).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MIN_BASELINE = 5  # observations before a z-score is emitted

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("z_score", DoubleType()),
        StructField("baseline_n", LongType()),
    ]
)

# state: Welford accumulator (count, mean, sum of squared deviations)
ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def welford_score_and_update(
    values: list[float], n: int, mean: float, m2: float, min_baseline: int
) -> tuple[list[float | None], list[int], int, float, float]:
    """Pure-Python core (also the test reference): score each value
    against the state BEFORE it, then fold it in. Non-finite values
    (a NULL ``value`` column reaches pandas as NaN) score None and
    are NOT folded — one bad event must never poison the baseline
    forever (the batch twin ``daily_anomaly_scores`` likewise ignores
    NULLs via F.sum). Returns (scores, base_ns, n, mean, m2), where
    base_ns[i] is the baseline size each score was computed against."""
    scores: list[float | None] = []
    base_ns: list[int] = []
    for v in values:
        base_ns.append(n)
        if not math.isfinite(v):
            scores.append(None)
            continue
        if n >= min_baseline and m2 > 0:
            sd = math.sqrt(m2 / (n - 1))
            scores.append(round((v - mean) / sd, 6) + 0.0)
        else:
            scores.append(None)
        n += 1
        delta = v - mean
        mean += delta / n
        m2 += delta * (v - mean)
    return scores, base_ns, n, mean, m2


def _score_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (etype,) = key
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    parts = list(pdfs)
    if parts:
        pdf = pd.concat(parts).sort_values(["ts", "event_id"])
        scores, base_ns, n, mean, m2 = welford_score_and_update(
            [float(v) for v in pdf["value"]], n, mean, m2, MIN_BASELINE
        )
        state.update((int(n), float(mean), float(m2)))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(pdf),
                "ts": pdf["ts"].values,
                "event_id": pdf["event_id"].values,
                "value": pdf["value"].values,
                "z_score": pd.array(scores, dtype="float64"),
                "baseline_n": base_ns,
            }
        )
    else:
        state.update((int(n), float(mean), float(m2)))


def streaming_anomaly_scores(events: DataFrame) -> DataFrame:
    """events(event_type, ts, event_id, value, ...) stream → scored
    event stream (append mode). State: 3 numbers per event_type."""
    return (
        events.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _score_group,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
