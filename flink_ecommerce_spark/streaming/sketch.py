"""Streaming Count-Min sketch: corpus term frequencies on a live
document stream with state bounded BY CONSTRUCTION.

Every other streaming aggregate here bounds state by key-space
argument (calendar keys, TTL, FIFO caps); the Count-Min sketch is
the operator whose state bound is structural — a streaming groupBy
on (j, bucket) can never hold more than DEPTH x WIDTH rows no matter
how many distinct terms the stream carries. That makes it the
canonical "frequency view over an unbounded vocabulary stream":
update-mode emits the changed cells per micro-batch, and the final
cell table equals the batch sketch over the same documents (pinned
in tests), because counter addition commutes with micro-batching —
the same mergeability that lets daily batch sketches roll up into
monthly ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import CM_DEPTH, CM_WIDTH, _cm_cells
from ..operators.textprep import words


def streaming_countmin(
    documents: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """documents stream → running (j, bucket, n) cell counts.
    Use with ``outputMode("update")``/``"complete"``; the aggregation
    state is at most depth x width rows."""
    terms = documents.select(
        F.explode(words(F.col(text_col))).alias("term")
    )
    cells = terms.select(
        F.explode(_cm_cells(F.col("term"), depth, width)).alias("c")
    )
    return (
        cells.groupBy(
            F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket")
        ).agg(F.count(F.lit(1)).alias("n"))
    )


def streaming_hll(
    documents_or_events: DataFrame,
    key_col: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Key stream → running HyperLogLog registers (bucket, max_rank).
    The cardinality twin of ``streaming_countmin``: a streaming
    groupBy on bucket whose state can never exceed 2^p rows no
    matter how many distinct keys flow, because per-bucket MAX — like
    the Count-Min sum — commutes with micro-batching. The emitted
    register table equals the batch ``hll_registers`` over the same
    rows (pinned in tests) and feeds the same estimator / merge
    path."""
    from ..operators.sketch import _hll_bucket_rank

    bucket, rank = _hll_bucket_rank(
        F.col(key_col).cast("string"), p
    )
    return (
        documents_or_events.select(
            bucket.alias("bucket"), rank.alias("rank")
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def streaming_source_minhash(
    documents: DataFrame, num_hashes: int | None = None
) -> DataFrame:
    """Document stream → running per-source MinHash signatures
    (source, mh0..mh{H-1}): the third structurally-bounded sketch —
    state is ≤ #sources rows of H longs no matter how many documents
    or shingles flow, because element-wise MIN, like Count-Min's sum
    and HLL's max, commutes with micro-batching. The emitted
    signature table equals the batch per-source signatures inside
    ``operators.dedup.source_overlap_minhash`` over the same
    documents (pinned in tests), so pairwise overlap estimates can be
    read live off a stream — the mixture-design double-count check as
    a monitoring surface, and a shard's streamed signature merges
    into the fleet's stored one by the same MIN."""
    from ..operators.dedup import MINHASH_PRIME, NUM_HASHES
    from ..operators.textprep import shingles_from_words
    from ..functions.portable import hash32_from_digest, salted_md5

    h = num_hashes or NUM_HASHES
    sh = documents.select(
        "source",
        F.explode(shingles_from_words(words(F.col("text")))).alias(
            "shingle"
        ),
    )
    hashed = sh.select(
        "source", salted_md5(F.col("shingle"), salt="mh").alias("__d")
    ).select(
        "source",
        hash32_from_digest("__d", half=0).alias("h1"),
        hash32_from_digest("__d", half=1).alias("h2"),
    )
    return hashed.groupBy("source").agg(
        *[
            F.min((F.col("h1") + i * F.col("h2")) % MINHASH_PRIME).alias(
                f"mh{i}"
            )
            for i in range(h)
        ]
    )
