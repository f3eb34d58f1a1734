"""Streaming Markov transition edges: cross-batch journey state,
purchase-resets-journey semantics, and count equality with the batch
matrix builder on the non-NULL edge set."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_ecommerce_spark.streaming.attribution import (
    streaming_transition_edges,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _ev(i, minute, user, etype):
    return (i, dt.datetime(2024, 1, 1, 10, minute), user, etype, 1.0, "{}")


def _write_chunk(spark, path, rows, chunk):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/chunk={chunk}")


def _run(spark, tmp_path, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/ev/chunk=*")
    )
    q = (
        streaming_transition_edges(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmp_path}/ckpt_{name}")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_edges_cross_batch_and_purchase_reset(spark, tmp_path):
    src = f"{tmp_path}/ev"
    # batch 1: user 1 clicks; user 2 views
    _write_chunk(spark, src, [_ev(1, 0, 1, "click"), _ev(2, 0, 2, "view")], 1)
    # batch 2: user 1 purchases (click->CONV) then views — the view
    # must start a FRESH journey (START->view), not chain off CONV
    _write_chunk(
        spark, src, [_ev(3, 5, 1, "purchase"), _ev(4, 6, 1, "view")], 2
    )
    rows = [(r["src"], r["dst"]) for r in _run(spark, tmp_path, "attr_out")]
    assert sorted(rows) == [
        ("START", "click"),
        ("START", "view"),  # user 2
        ("START", "view"),  # user 1's post-purchase fresh journey
        ("click", "CONV"),
    ]


def test_stream_counts_equal_batch_matrix_nonnull(spark, tmp_path):
    """Ordered replay of a fixture slice: streaming (src, dst) counts
    == the batch transition builder's edge counts on dst <> 'NULL'
    (the stream cannot know a journey ended — see module docstring)."""
    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.plans.temporal import (
        TOUCH_CHANNELS,
        _markov_transitions,
    )

    from tests.conftest import SF_SMALL

    ev = (
        catalog.table(spark, SF_SMALL, "events")
        .filter(F.col("user_id") % 17 == 0)
        .localCheckpoint(eager=True)
    )
    src = f"{tmp_path}/ev"
    pdf = ev.orderBy("ts", "event_id").toPandas()
    half = len(pdf) // 2
    for chunk, part in enumerate([pdf.iloc[:half], pdf.iloc[half:]], 1):
        chunk_df = spark.createDataFrame(part).select(
            F.col("event_id").cast("long"),
            F.col("ts").cast("timestamp"),
            F.col("user_id").cast("long"),
            "event_type",
            F.col("value").cast("double"),
            "props",
        )
        chunk_df.coalesce(1).write.mode("overwrite").parquet(
            f"{src}/chunk={chunk}"
        )
    rows = _run(spark, tmp_path, "attr_replay")
    got = {}
    for r in rows:
        got[(r["src"], r["dst"])] = got.get((r["src"], r["dst"]), 0) + 1

    # batch edge counts before normalization: rebuild from the same
    # slice, drop the journey-end NULL edges
    edges = (
        ev.filter(F.col("event_type").isin(*TOUCH_CHANNELS, "purchase"))
    )
    # _markov_transitions normalizes; recount its edge layer here
    from pyspark.sql import Window

    evs = edges.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    w_u = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev2 = evs.withColumn(
        "j",
        F.coalesce(
            F.sum(F.when(F.col("state") == "CONV", 1).otherwise(0)).over(w_u),
            F.lit(0),
        ),
    )
    w_j = Window.partitionBy("user_id", "j").orderBy("ts", "event_id")
    batch = (
        ev2.withColumn("prev", F.lag("state").over(w_j))
        .select(
            F.coalesce("prev", F.lit("START")).alias("src"),
            F.col("state").alias("dst"),
        )
        .groupBy("src", "dst")
        .count()
    )
    want = {(r["src"], r["dst"]): r["count"] for r in batch.collect()}
    assert got == want
    # sanity: the slice actually exercised conversions and chains
    assert any(dst == "CONV" for _, dst in want)
    assert any(src not in ("START",) for src, _ in want)
