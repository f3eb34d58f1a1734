"""Stream-static enrichment (streaming/enrich.py): batch-equivalence
of the plan-time join, broadcast in the plan, and the per-batch dim
refresh contract of EnrichingSink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ecommerce_spark.streaming.enrich import EnrichingSink, enrich_with_dim
from flink_ecommerce_spark.streaming.sinks import MemoryUpsertSink

DIM_V1 = [("purchase", "core", 0.30), ("view", "growth", 0.05)]
DIM_V2 = [("purchase", "core", 0.45), ("view", "growth", 0.05)]
DIM_SCHEMA = "event_type string, segment string, margin double"
EVENT_SCHEMA = "event_id long, event_type string, value double"


def _write_events(spark, path, rows, chunk):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/chunk={chunk}")


def test_stream_static_join_matches_batch(spark, tmp_path):
    rows = [
        (1, "purchase", 10.0),
        (2, "view", 1.0),
        (3, "error", 0.0),  # no dim row -> left join keeps it with nulls
    ]
    src = str(tmp_path / "ev")
    _write_events(spark, src, rows, 1)
    dim = spark.createDataFrame(DIM_V1, DIM_SCHEMA)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    out = enrich_with_dim(stream, dim, on="event_type")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM enriched_out").collect())
    )
    batch = sorted(
        map(
            tuple,
            spark.createDataFrame(rows, EVENT_SCHEMA)
            .join(dim, "event_type", "left")
            .collect(),
        )
    )
    assert got == batch
    assert len(got) == 3  # left join retained the dim-less event


def test_stream_static_join_is_broadcast(spark):
    """The micro-batch physical plan must broadcast the dim, never
    shuffle the stream."""
    dim = spark.createDataFrame(DIM_V1, DIM_SCHEMA)
    batch = spark.createDataFrame(
        [(1, "purchase", 10.0)], EVENT_SCHEMA
    )
    plan = (
        batch.join(F.broadcast(dim), "event_type", "left")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_stream_static_rejects_unsupported_modes(spark):
    dim = spark.createDataFrame(DIM_V1, DIM_SCHEMA)
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="inner.*left|'inner' or 'left'"):
        enrich_with_dim(stream, dim, on="value", how="full")


def test_enriching_sink_refreshes_dim_between_batches(spark, tmp_path):
    """The SCD contract: a dim value updated between micro-batches
    enriches the later batch with the NEW value while rows already
    written keep the value their batch saw."""
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(DIM_V1, DIM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(dim_path)

    src = str(tmp_path / "ev")
    _write_events(spark, src, [(1, "purchase", 10.0)], 1)

    inner = MemoryUpsertSink(("event_id",))
    sink = EnrichingSink(
        inner,
        dim_loader=lambda: spark.read.parquet(dim_path),
        on="event_type",
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()

    # dim changes between batches: purchase margin 0.30 -> 0.45
    spark.createDataFrame(DIM_V2, DIM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(dim_path)
    _write_events(spark, src, [(2, "purchase", 20.0)], 2)
    q.processAllAvailable()
    q.stop()

    margins = {k[0]: row["margin"] for k, row in inner.state.items()}
    assert margins == {1: 0.30, 2: 0.45}
