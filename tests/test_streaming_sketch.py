"""Streaming Count-Min: the replayed stream's final cell table equals
the batch sketch (counter addition commutes with micro-batching) and
state is structurally bounded."""

from __future__ import annotations

from flink_ecommerce_spark.operators.sketch import CM_DEPTH, CM_WIDTH, countmin_sketch
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA
from flink_ecommerce_spark.streaming.sketch import streaming_countmin

ROWS = [
    (0, "spark streams count words while words stream past", "en", "s", 10),
    (1, "count min sketch cells bound state by construction", "en", "s", 10),
    (2, "words repeat words repeat words repeat once more", "en", "s", 10),
    (3, "a second batch adds more words to the same cells", "en", "s", 10),
]


def _write_chunk(spark, path, rows, chunk):
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/chunk={chunk}")


def test_streaming_sketch_converges_to_batch(spark, tmp_path):
    src = str(tmp_path / "docs")
    _write_chunk(spark, src, ROWS[:2], 1)
    _write_chunk(spark, src, ROWS[2:], 2)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_countmin(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["j"], r["bucket"]): r["n"]
        for r in spark.sql("SELECT * FROM cm_out").collect()
    }
    batch = spark.createDataFrame(ROWS, DOCUMENTS_SCHEMA)
    want = {
        (r["j"], r["bucket"]): r["n"] for r in countmin_sketch(batch).collect()
    }
    assert got == want
    assert len(got) <= CM_DEPTH * CM_WIDTH  # the structural bound


def test_streaming_hll_converges_to_batch(spark, tmp_path):
    """Replayed stream's final registers equal the batch sketch
    (per-bucket MAX commutes with micro-batching); state bounded at
    2^p rows by construction."""
    from flink_ecommerce_spark.operators.sketch import hll_registers
    from flink_ecommerce_spark.streaming.sketch import streaming_hll

    src = str(tmp_path / "ev")
    rows1 = [(i, i % 37) for i in range(200)]
    rows2 = [(200 + i, 30 + (i % 55)) for i in range(200)]
    schema = "event_id long, user_id long"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/chunk=1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/chunk=2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_hll(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["bucket"], r["max_rank"])
        for r in spark.sql("SELECT * FROM hll_out").collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        (r["bucket"], r["max_rank"])
        for r in hll_registers(batch).collect()
    }
    assert got == want
    assert len(got) <= 256
