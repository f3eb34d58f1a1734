"""Streaming CEP episode detection: cross-batch state machine,
in-order replay equals the batch extractor on single-episode users,
and repeating matches emit one row per completed chain."""

from __future__ import annotations

import datetime as dt

from flink_ecommerce_spark.streaming.cep import streaming_episodes

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


def test_episode_completes_across_batches(spark, tmp_path):
    src = str(tmp_path / "ev")
    # batch 1: user 1 views then clicks; user 2 clicks (no view yet)
    _write_chunk(spark, src, [
        _ev(1, 0, 1, "view"), _ev(2, 1, 1, "click"), _ev(3, 1, 2, "click"),
    ], 1)
    # batch 2: user 1 purchases (completes); user 2 views (chain just
    # starting — click BEFORE the view must not count)
    _write_chunk(spark, src, [
        _ev(4, 5, 1, "purchase"), _ev(5, 6, 2, "view"),
    ], 2)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_episodes(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM cep_out").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert r["seconds_to_convert"] == 300.0  # minute 0 -> minute 5


def test_streaming_matches_batch_on_ordered_replay(spark, tmp_path):
    from flink_ecommerce_spark.plans.temporal import first_conversion_episode

    rows = [
        _ev(1, 0, 1, "view"), _ev(2, 2, 1, "click"), _ev(3, 4, 1, "purchase"),
        _ev(4, 1, 2, "view"), _ev(5, 3, 2, "view"), _ev(6, 5, 2, "click"),
        _ev(7, 6, 2, "purchase"),
        _ev(8, 0, 3, "purchase"), _ev(9, 1, 3, "click"),  # never completes
    ]
    src = str(tmp_path / "ev")
    _write_chunk(spark, src, rows, 1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_episodes(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_eq")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["view_ts"], r["click_ts"], r["purchase_ts"])
        for r in spark.sql("SELECT * FROM cep_eq").collect()
    }
    batch = first_conversion_episode(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()
    want = {
        (r["user_id"], r["view_ts"], r["click_ts"], r["purchase_ts"])
        for r in batch
    }
    assert got == want and len(want) == 2


def test_repeating_matches_emit_per_chain(spark, tmp_path):
    rows = [
        _ev(1, 0, 1, "view"), _ev(2, 1, 1, "click"), _ev(3, 2, 1, "purchase"),
        _ev(4, 3, 1, "view"), _ev(5, 4, 1, "click"), _ev(6, 5, 1, "purchase"),
    ]
    src = str(tmp_path / "ev")
    _write_chunk(spark, src, rows, 1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_episodes(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_rep")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT COUNT(*) FROM cep_rep").collect()[0][0] == 2


def test_generalized_pattern_any_length(spark, tmp_path):
    """4-step pattern completes across batches; an interleaved
    non-matching event type is ignored; the post-completion reset
    requires the NEXT chain to start fresh."""
    from flink_ecommerce_spark.streaming.cep import streaming_pattern_matches

    rows1 = [
        _ev(1, 0, 1, "signup"), _ev(2, 1, 1, "view"), _ev(3, 2, 1, "error"),
        _ev(4, 3, 1, "click"),
    ]
    rows2 = [_ev(5, 4, 1, "purchase"), _ev(6, 5, 1, "view")]
    src = str(tmp_path / "ev")
    _write_chunk(spark, src, rows1, 1)
    _write_chunk(spark, src, rows2, 2)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_pattern_matches(
            stream, ["signup", "view", "click", "purchase"]
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_gen")
        .option("checkpointLocation", str(tmp_path / "ckptg"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM cep_gen").collect()
    assert len(rows) == 1
    assert rows[0]["seconds_to_complete"] == 240.0  # minute 0 -> 4


def test_within_window_discards_stale_partials(spark, tmp_path):
    """within(): a view->click chain that ages past the window is
    discarded when the purchase finally arrives — but a fresh chain
    inside the window completes."""
    from flink_ecommerce_spark.streaming.cep import streaming_pattern_matches

    rows = [
        # chain 1: view at 0, click at 1, purchase at 20 — the
        # partial is 19 min old at purchase time, window is 5 min
        _ev(1, 0, 1, "view"), _ev(2, 1, 1, "click"), _ev(3, 20, 1, "purchase"),
        # chain 2: tight chain inside the window
        _ev(4, 30, 1, "view"), _ev(5, 31, 1, "click"), _ev(6, 32, 1, "purchase"),
    ]
    src = str(tmp_path / "ev")
    _write_chunk(spark, src, rows, 1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_pattern_matches(
            stream, ["view", "click", "purchase"], within_seconds=300
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_win")
        .option("checkpointLocation", str(tmp_path / "ckptw"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows_out = spark.sql("SELECT * FROM cep_win").collect()
    assert len(rows_out) == 1
    assert rows_out[0]["seconds_to_complete"] == 120.0  # minute 30 -> 32
