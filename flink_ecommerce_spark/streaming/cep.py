"""Streaming CEP: the view -> click -> purchase episode detector as a
per-user state machine — Flink CEP's marquee pattern
(`begin("view").followedBy("click").followedBy("purchase")`) in
Structured Streaming form.

State per user is THREE nullable timestamps (the earliest view, the
earliest post-view click, the earliest post-click purchase progress)
— a fixed-width tuple regardless of stream volume, the canonical
bounded-state shape. An episode emits exactly once, when its
purchase step completes; the state then resets so the NEXT chain can
match (repeating-match semantics; the batch twin
``plans.temporal.first_conversion_episode`` extracts only the first
episode, equality on single-episode streams is pinned in tests).

In-order caveat (documented, standard for processing-time CEP): rows
are consumed in arrival order within each micro-batch, sorted by
``ts`` inside the batch; late cross-batch arrivals that belong
BEFORE an already-consumed step are not retroactively matched — the
same contract as the reference's no-watermark keyed state. Feed
event-time-ordered replays (or watermarked re-sorts) when exactness
against the batch op matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EPISODE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("view_ts", TimestampType()),
        StructField("click_ts", TimestampType()),
        StructField("purchase_ts", TimestampType()),
        StructField("seconds_to_convert", DoubleType()),
    ]
)

# (view_ts, click_ts) progress; epoch micros, -1 = unset
EPISODE_STATE_SCHEMA = StructType(
    [
        StructField("view_us", LongType()),
        StructField("click_us", LongType()),
    ]
)


def _episode_group(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    (user_id,) = key
    view_us, click_us = state.get if state.exists else (-1, -1)
    out = []
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("ts", kind="mergesort")  # stable in-batch order
    for ts, etype in zip(rows["ts"], rows["event_type"]):
        us = int(pd.Timestamp(ts).value // 1000)
        if view_us < 0:
            if etype == "view":
                view_us = us
        elif click_us < 0:
            if etype == "click" and us > view_us:
                click_us = us
        else:
            if etype == "purchase" and us > click_us:
                out.append(
                    {
                        "user_id": int(user_id),
                        "view_ts": pd.Timestamp(view_us * 1000),
                        "click_ts": pd.Timestamp(click_us * 1000),
                        "purchase_ts": pd.Timestamp(us * 1000),
                        "seconds_to_convert": round(
                            (us - view_us) / 1e6, 6
                        ),
                    }
                )
                view_us, click_us = -1, -1  # reset: repeating matches
    state.update((int(view_us), int(click_us)))
    if out:
        yield pd.DataFrame(out)


def streaming_episodes(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, event_type, ...) → completed
    episode stream. Append-mode output; fixed-width state per user."""
    keyed = events.select("user_id", "ts", "event_type")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _episode_group,
        outputStructType=EPISODE_OUTPUT_SCHEMA,
        stateStructType=EPISODE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PATTERN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
        StructField("seconds_to_complete", DoubleType()),
    ]
)

# (step index reached, last matched ts in epoch micros, start ts)
PATTERN_STATE_SCHEMA = StructType(
    [
        StructField("step", LongType()),
        StructField("last_us", LongType()),
        StructField("start_us", LongType()),
    ]
)


def _make_pattern_group(pattern: list[str], within_us: int | None):
    n = len(pattern)

    def _group(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        step, last_us, start_us = (
            state.get if state.exists else (0, -1, -1)
        )
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            us = int(pd.Timestamp(ts).value // 1000)
            # within(): an in-progress chain whose window has lapsed
            # resets BEFORE the event is considered, so the event can
            # seed a fresh chain (Flink CEP's timed-out partial match
            # is discarded, not the event)
            if (
                within_us is not None
                and step > 0
                and us - start_us > within_us
            ):
                step, last_us, start_us = 0, -1, -1
            if etype == pattern[step] and us > last_us:
                if step == 0:
                    start_us = us
                step += 1
                last_us = us
                if step == n:
                    out.append(
                        {
                            "user_id": int(user_id),
                            "start_ts": pd.Timestamp(start_us * 1000),
                            "end_ts": pd.Timestamp(us * 1000),
                            "seconds_to_complete": round(
                                (us - start_us) / 1e6, 6
                            ),
                        }
                    )
                    step, last_us, start_us = 0, us, -1
        state.update((int(step), int(last_us), int(start_us)))
        if out:
            yield pd.DataFrame(out)

    return _group


def streaming_pattern_matches(
    events: DataFrame,
    pattern: list[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """Generalized N-step sequential pattern (`followedBy` chains of
    any length): emit (user_id, start_ts, end_ts,
    seconds_to_complete) per completed strictly-increasing match,
    repeating. State per user is a FIXED 3-long tuple regardless of
    pattern length or stream volume — ad-hoc funnels of any depth
    (e.g. signup -> view -> click -> purchase) cost the same state.
    ``streaming_episodes`` remains the specialized 3-step surface
    carrying every intermediate step's timestamp.

    ``within_seconds`` is Flink CEP's ``within()``: a partial match
    older than the window is discarded the moment a later event
    arrives — the event itself can seed a fresh chain (timed-out
    partials drop, events don't)."""
    assert pattern, "pattern must be non-empty"
    within_us = (
        int(within_seconds * 1_000_000) if within_seconds is not None else None
    )
    keyed = events.select("user_id", "ts", "event_type")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_pattern_group(list(pattern), within_us),
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
