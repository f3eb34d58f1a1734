"""Custom stateful streaming operator: per-user streaming
sessionization via ``applyInPandasWithState``.

This is the Spark pattern for operators that Structured Streaming's
built-in aggregations can't express: arbitrary per-key state (here:
the open session) updated per micro-batch, emitting completed
sessions in append mode. The reference has no such operator (its
keyed reduces map onto plain update-mode aggregation — SURVEY.md
§1.3); this exists for the extension surface, mirroring the batch
``plans.analytics.user_sessions`` semantics (30-minute gap).

Scale notes: state lives in the state store (RocksDB/HDFS-backed),
one entry per user — bounded by key cardinality, not event volume.
Arrow batches flow through pandas per key-group; no driver-side
anything. For production you'd add a timeout
(GroupStateTimeout.ProcessingTimeTimeout) to flush idle sessions;
tests drive closure with the data itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SECONDS = 30 * 60

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

# state: (last_ts_micros, session_start_micros, n_events)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("start_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_us, start_us, n_events = state.get
    else:
        last_us = start_us = -1
        n_events = 0

    closed: list[tuple[int, int, int]] = []  # (start_us, end_us, n)
    # one sort across ALL Arrow batches of this group (a group can
    # span batches; per-batch sorting would interleave wrongly)
    parts = [
        pdf["ts"].astype("datetime64[us]").astype("int64") for pdf in pdfs
    ]
    if parts:
        ts_all = pd.concat(parts).sort_values()
        for t in ts_all:
            if last_us < 0:
                start_us, last_us, n_events = t, t, 1
            elif t - last_us > SESSION_GAP_SECONDS * 1_000_000:
                closed.append((start_us, last_us, n_events))
                start_us, last_us, n_events = t, t, 1
            else:
                # a late event from an earlier micro-batch can sort
                # before the open session's end — never move the
                # session end (or its gap anchor) backwards
                last_us = max(last_us, t)
                start_us = min(start_us, t)
                n_events += 1

    state.update((int(last_us), int(start_us), int(n_events)))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                "n_events": [c[2] for c in closed],
            }
        )


def streaming_sessions(events: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) stream → completed-session stream.
    Open sessions stay in state until a later event closes them."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
