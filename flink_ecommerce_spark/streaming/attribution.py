"""Streaming Markov transition accumulator — the live twin of
``plans.temporal.markov_attribution``'s matrix build: journey
transition edges (START → touch → … → CONV) emitted as they happen,
so the downstream (src, dst) count aggregate — STRUCTURALLY capped
at (channels+2)² rows — is always current and the attribution
matrix can be recomputed at any trigger without replaying history.

State per user is ONE short string: the state of the previous kept
event ('' = journey start). A purchase (CONV) resets it, starting
the next journey — identical split semantics to the batch builder's
strictly-earlier-CONV running count.

NULL-edge caveat (documented): the batch twin closes every dangling
journey with a terminal → NULL edge because a bounded table HAS an
end; a stream cannot know that no further touch will arrive, so the
dangling edge stays pending in state (production would emit it on an
idle timeout — the state machinery supports it; the batch/stream
equality contract in tests therefore compares the dst <> 'NULL'
edge counts, which is every edge the stream can legally know).

In-order caveat shared with streaming/cep.py: rows are consumed in
arrival order, sorted by (ts, event_id) inside each micro-batch;
cross-batch late arrivals are not retroactively spliced — the
reference's no-watermark keyed-state contract. Feed event-time-
ordered replays when exactness against the batch matrix matters.

Reference scope: the reference job (DataStreamJob.java) keeps keyed
running aggregates over a transaction stream; this op is the same
bounded-keyed-state shape applied to the attribution matrix.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from ..plans.temporal import TOUCH_CHANNELS

EDGE_OUTPUT_SCHEMA = StructType(
    [
        StructField("src", StringType()),
        StructField("dst", StringType()),
    ]
)

# the previous kept event's state; '' = start of a journey
EDGE_STATE_SCHEMA = StructType([StructField("last", StringType())])


def _edge_group(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    (last,) = state.get if state.exists else ("",)
    out = []
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    for etype in rows["event_type"]:
        st = "CONV" if etype == "purchase" else etype
        out.append({"src": last if last else "START", "dst": st})
        last = "" if st == "CONV" else st
    state.update((last,))
    if out:
        yield pd.DataFrame(out)


def streaming_transition_edges(events: DataFrame) -> DataFrame:
    """events stream → (src, dst) journey-edge stream (append mode).
    Filter to touches+purchases happens here so the per-user state
    machine only ever sees journey-relevant rows."""
    keyed = events.filter(
        F.col("event_type").isin(*TOUCH_CHANNELS, "purchase")
    ).select("user_id", "ts", "event_id", "event_type")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _edge_group,
        outputStructType=EDGE_OUTPUT_SCHEMA,
        stateStructType=EDGE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
