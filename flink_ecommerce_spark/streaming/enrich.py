"""Stream-static enrichment: join a live stream against a dimension
table — the Flink "lookup/broadcast join" pattern (the reference job
carries category in-band, DataStreamJob.java:318-331, so it never
needed one; any production variant of it does: category → margin,
customer → segment, product → hierarchy).

Two refresh disciplines, because Spark offers a real trade:

- ``enrich_with_dim`` — a plan-time stream-static join. The static
  side is planned ONCE: its file listing is pinned at analysis, so
  rows added to the dim after the stream starts are invisible. In
  exchange the join is a broadcast hash join inside every micro-batch
  (dim ships to executors once per batch, no shuffle of the stream).
  Right for dims that are fixed for the life of the job.
- ``EnrichingSink`` — a foreachBatch sink that RE-READS the dim
  lazily per micro-batch via a loader callable. Guaranteed
  slowly-changing-dim freshness (each batch sees the dim as of its
  own start), at the cost of a dim re-read per batch — which for a
  broadcast-sized dim is the cheap part of the batch anyway. This is
  the micro-batch analog of Flink's broadcast-state pattern, where
  dim updates flow to all workers between elements.

Scale: the dim must be broadcast-sized (the usual case for category /
customer-segment dims). A beyond-memory dim needs the stream keyed
and the dim bucketed — that's `operators/scale.py::write_bucketed`
plus a shuffle join, and at that point the right tool is usually a
batch backfill, not a per-batch join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Plan-time stream-static join, dim broadcast. ``how`` is
    restricted to the modes Structured Streaming supports with the
    stream on the left ('inner', 'left')."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"stream-static join with the stream on the left supports "
            f"'inner' or 'left', got {how!r}"
        )
    return stream.join(F.broadcast(dim), on=on, how=how)


class EnrichingSink:
    """foreachBatch sink wrapper: per micro-batch, reload the dim via
    ``dim_loader()``, broadcast-join the batch against it, and hand
    the enriched batch to ``inner`` (any object with the repo's sink
    protocol: ``write_batch(df, epoch_id)``).

    The loader runs on the driver at batch start — each micro-batch
    is enriched against the dim AS OF that moment, the freshness
    contract a slowly-changing dim needs (pinned by
    tests/test_enrich.py: a dim row updated between batches enriches
    only the later batch)."""

    def __init__(
        self,
        inner,
        dim_loader: Callable[[], DataFrame],
        on: str | list[str],
        how: str = "left",
    ) -> None:
        if how not in ("inner", "left"):
            raise ValueError("EnrichingSink supports 'inner' or 'left'")
        self.inner = inner
        self.dim_loader = dim_loader
        self.on = on
        self.how = how

    def write_batch(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        dim = self.dim_loader()
        enriched = batch_df.join(F.broadcast(dim), on=self.on, how=self.how)
        self.inner.write_batch(enriched, epoch_id)

    def foreach_batch(self):
        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.write_batch(batch_df, epoch_id)

        return fn
