"""Streaming sequence packing — running context-window assignment on
a live document stream.

The batch op (operators/packing.py) chunk-assigns a static corpus
with a window cumsum; a continuously-ingesting pipeline instead needs
each arriving document placed at the CURRENT end of its source's
token stream. That running end is one long per source — exactly the
keyed-state shape ``applyInPandasWithState`` holds:

1. token counts are computed stream-side as a stateless column (same
   expression as the batch op, JVM regexp);
2. the stateful step only does a vectorized cumsum per micro-batch
   group on top of the carried total (state = ONE long per source,
   bounded by the number of sources, not stream volume).

Ordering semantics: within a micro-batch, documents of a source are
packed in doc_id order (deterministic); across batches, arrival order
IS the stream order — the same contract as any streaming append log.
Replaying a corpus through the stream in doc_id order therefore
reproduces the batch assignment exactly (pinned in
tests/test_packing_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.packing import CTX_LEN

PACKING_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_tokens", LongType()),
        StructField("tok_offset", LongType()),
        StructField("first_chunk", LongType()),
        StructField("last_chunk", LongType()),
    ]
)

# state: running token total for the source's stream
PACKING_STATE_SCHEMA = StructType([StructField("tok_total", LongType())])


def _make_packing_group(ctx_len: int):
    def _pack_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        total = state.get[0] if state.exists else 0
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            state.update((int(total),))
            return
        pdf = pd.concat(parts).sort_values("doc_id")
        n = pdf["n_tokens"].to_numpy()
        offsets = total + n.cumsum() - n
        width = n.copy()
        width[width < 1] = 1  # empty docs occupy zero width at their offset
        state.update((int(total + n.sum()),))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "source": source,
                "n_tokens": n,
                "tok_offset": offsets,
                "first_chunk": offsets // ctx_len,
                "last_chunk": (offsets + width - 1) // ctx_len,
            }
        )

    return _pack_group


def streaming_sequence_packing(
    documents: DataFrame, ctx_len: int = CTX_LEN
) -> DataFrame:
    """documents(doc_id, source, text) stream → chunk assignments with
    the batch op's schema. State per source is a single running token
    total."""
    t = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.size(F.expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .cast("long")
        .alias("n_tokens"),
    )
    return t.groupBy("source").applyInPandasWithState(
        _make_packing_group(ctx_len),
        outputStructType=PACKING_OUTPUT_SCHEMA,
        stateStructType=PACKING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
