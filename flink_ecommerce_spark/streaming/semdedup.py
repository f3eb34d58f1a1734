"""Streaming semantic dedup — SemDeDup semantics on a live embedding
ingest stream.

Batch ``operators.similarity.semantic_dedup`` dedups a static corpus;
a continuously-ingesting pipeline needs the same decision per
arriving vector: "is this semantically a duplicate of something
already admitted?". Two stages, mirroring the batch split between
index build and probe:

1. **Cell assignment as a pure per-row expression.** The coarse
   quantizer (label centroids from ``build_ivf_index`` on the
   historical corpus) is collected to the driver — k×d doubles — and
   inlined as literal arrays, so the argmin over centroids runs as
   ``array_min`` over a struct array: stateless, codegen'd, legal in
   a streaming projection (no stream-side aggregation, no join). The
   (d2, label) struct ordering reproduces the batch argmin tie-break
   exactly.

2. **A greedy ε-net per cell in applyInPandasWithState.** State per
   cell holds the admitted representatives (id + vector). Each
   arrival (processed in vec_id order within a micro-batch for
   determinism) is exact-cosine-checked against its cell's reps:
   within ``threshold`` of any → suppressed; otherwise emitted and
   appended. ``max_reps_per_cell`` bounds state with FIFO eviction —
   the streaming analog of a dedup window (a duplicate of an evicted
   rep re-admits, documented recall cost) — and ``ttl_ms`` ages out
   whole COLD cells via ProcessingTimeTimeout, the same state-aging
   contract as ``streaming/dedup.py`` (state ∝ content seen within
   the TTL horizon, not all-time).

Semantics note (deliberate, tested): the batch operator drops a
vector iff an EARLIER vector is within the threshold, even when that
earlier vector was itself dropped; the stream can only compare
against what it ADMITTED (dropped vectors are gone). On chains
a~b, b~c with a!~c, batch drops {b, c}, streaming drops {b} and
admits c — the sequential greedy ε-net. Without chains the two kept
sets coincide (asserted in tests)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..operators.similarity import SEMDEDUP_THRESHOLD

SEMDEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("cell", IntegerType()),
        StructField("vec_id", LongType()),
    ]
)

# state: admitted representatives for the cell, FIFO order
SEMDEDUP_STATE_SCHEMA = StructType(
    [
        StructField("rep_ids", ArrayType(LongType())),
        StructField("rep_vecs", ArrayType(ArrayType(DoubleType()))),
    ]
)


def cell_expr(
    emb: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-centroid cell as a single expression: min over literal
    (d2, label) structs — struct ordering gives the (d2 ASC, label
    ASC) tie-break of the batch argmin. Linear in k per row, zero
    state, so it runs in any streaming projection."""
    cands = []
    for label, cvec in centroids:
        lit_c = F.array(*[F.lit(float(v)) for v in cvec])
        d2 = F.aggregate(
            F.zip_with(
                emb, lit_c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cands.append(F.struct(d2.alias("d2"), F.lit(int(label)).alias("label")))
    return F.array_min(F.array(*cands))["label"]


def _make_semdedup_group(
    threshold: float, max_reps_per_cell: int, ttl_ms: int | None = None
):
    import numpy as np

    def _group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # cold cell aged out; later dups re-admit
            return
        (cell,) = key
        if state.exists:
            rep_ids, rep_vecs = state.get
            rep_ids = list(rep_ids)
            reps = [np.asarray(v, dtype=np.float64) for v in rep_vecs]
        else:
            rep_ids, reps = [], []
        rows = []
        for pdf in pdfs:
            for vid, emb in zip(pdf["vec_id"], pdf["embedding"]):
                rows.append((int(vid), np.asarray(emb, dtype=np.float64)))
        rows.sort(key=lambda r: r[0])  # deterministic within the batch
        admitted: list[int] = []
        for vid, v in rows:
            nv = np.linalg.norm(v)
            dup = False
            for r in reps:
                nr = np.linalg.norm(r)
                denom = max(nv * nr, 1e-12)
                if round(float(v @ r) / denom, 6) >= threshold:
                    dup = True
                    break
            if not dup:
                admitted.append(vid)
                rep_ids.append(vid)
                reps.append(v)
        if len(rep_ids) > max_reps_per_cell:  # FIFO window
            rep_ids = rep_ids[-max_reps_per_cell:]
            reps = reps[-max_reps_per_cell:]
        state.update((rep_ids, [list(map(float, r)) for r in reps]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # any arrival refreshes
        if admitted:
            yield pd.DataFrame(
                {"cell": [int(cell)] * len(admitted), "vec_id": admitted}
            )

    return _group


def streaming_semantic_dedup(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = SEMDEDUP_THRESHOLD,
    max_reps_per_cell: int = 10_000,
    ttl_ms: int | None = None,
) -> DataFrame:
    """embeddings(vec_id, embedding) stream → admitted (cell, vec_id)
    stream. ``centroids`` is the collected output of the batch
    ``build_ivf_index`` / ``_centroid_arrays`` on the historical
    corpus (the index build stays batch; the stream only probes).

    Scale: the stream shuffles once on cell; per-cell state is at
    most ``max_reps_per_cell`` vectors, and the per-arrival check is
    reps-per-cell dot products inside the Arrow batch — the same
    cell-local cost profile as the batch operator, paid incrementally.
    Growing the historical corpus K (more cells) keeps reps-per-cell
    pinned, exactly like ``semdedup_bits_for``."""
    keyed = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"),
        cell_expr(F.col("embedding"), centroids).alias("cell"),
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("cell").applyInPandasWithState(
        _make_semdedup_group(threshold, max_reps_per_cell, ttl_ms),
        outputStructType=SEMDEDUP_OUTPUT_SCHEMA,
        stateStructType=SEMDEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
