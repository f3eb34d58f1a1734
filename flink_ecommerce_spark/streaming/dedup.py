"""Streaming MinHash dedup — the training-data dedup path on a live
document stream.

The batch suite dedups a static corpus (operators/dedup.py); a
continuously-ingesting pipeline needs the same decision per arriving
document: "has this content (exactly, or reworded-whitespace) been
seen before?". Structured Streaming's dropDuplicatesWithinWatermark
covers exact keys (streaming/watermarked.py:42); this operator covers
CONTENT identity:

1. per-row MinHash signature via array expressions
   (operators.dedup.minhash_signature_array — no explode/groupBy, so
   it runs as a stateless map inside the stream), falling back to the
   normalized-text hash for docs too short to shingle;
2. an applyInPandasWithState filter keyed by the signature digest:
   the FIRST document per signature is emitted, every later arrival
   is counted into state and suppressed.

State: one (first_doc_id, n_seen) entry per distinct signature —
bounded by distinct content, not stream volume. ``ttl_ms`` ages out
cold signatures (ProcessingTimeTimeout): state then holds only
signatures seen within the TTL horizon, so a 100 TB/day stream keeps
state proportional to the dedup window instead of all-time distinct
content — at the documented cost that a duplicate arriving after its
signature expired is re-emitted (window-scoped dedup semantics).

Parity note: matching FULL signatures means "MinHash-identical"
content — near-exact dedup robust to whitespace/formatting, the
streaming analogue of batch dedup_exact_normalized, with band-level
candidate generation left to the batch LSH pass (a stream can't
cheaply verify Jaccard across arbitrary history).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.dedup import minhash_signature_array

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("sig_key", StringType()),
        StructField("doc_id", LongType()),
    ]
)

# state: (first_doc_id, n_seen)
DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_doc_id", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def signature_key(text_col: F.Column) -> F.Column:
    """Digest of the per-row MinHash signature; docs with no shingles
    (< shingle-width words) fall back to the normalized-text hash so
    short docs dedup exactly instead of all colliding on NULL."""
    sig = minhash_signature_array(text_col)
    sig_digest = F.md5(
        F.concat_ws("_", F.transform(sig, lambda m: m.cast("string")))
    )
    norm_digest = F.md5(
        F.concat_ws(
            " ", F.split(F.lower(F.trim(text_col)), r"\s+")
        )
    )
    return F.when(sig.isNotNull(), sig_digest).otherwise(norm_digest)


def _make_dedup_group(ttl_ms: int | None):
    def _dedup_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # cold signature aged out; next arrival re-emits
            return
        (sig_key,) = key
        if state.exists:
            first_id, n_seen = state.get
            fresh = False
        else:
            first_id, n_seen = None, 0
            fresh = True
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(d) for d in pdf["doc_id"])
        n_seen += len(ids)
        if fresh and ids:
            first_id = min(ids)  # deterministic within the micro-batch
        state.update((int(first_id), int(n_seen)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # any arrival refreshes the TTL
        if fresh and ids:
            yield pd.DataFrame({"sig_key": [sig_key], "doc_id": [first_id]})

    return _dedup_group


def streaming_minhash_dedup(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_ms: int | None = None,
) -> DataFrame:
    """documents(id, text) stream → first-seen-per-signature stream.
    Within one micro-batch the smallest doc_id wins (deterministic);
    across batches the earliest batch wins. ``ttl_ms`` bounds state to
    the signatures seen within that processing-time horizon (see
    module docstring for the re-emission tradeoff)."""
    keyed = documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        signature_key(F.col(text_col)).alias("sig_key"),
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("sig_key").applyInPandasWithState(
        _make_dedup_group(ttl_ms),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
