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


def test_streaming_source_minhash_converges_to_batch(spark, tmp_path):
    """Per-source MIN signatures commute with micro-batching: the
    streamed final state equals the batch signature table, so live
    overlap estimates match offline ones."""
    from pyspark.sql import functions as F

    from flink_ecommerce_spark.operators.dedup import (
        MINHASH_PRIME,
        NUM_HASHES,
    )
    from flink_ecommerce_spark.functions.portable import (
        hash32_from_digest,
        salted_md5,
    )
    from flink_ecommerce_spark.operators.textprep import (
        shingles_from_words,
        words,
    )
    from flink_ecommerce_spark.streaming.sketch import (
        streaming_source_minhash,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s1", 10),
        (1, "beta gamma delta epsilon zeta eta", "en", "s2", 10),
        (2, "totally different words over here now", "en", "s1", 10),
        (3, "alpha beta gamma delta epsilon zeta", "en", "s2", 10),
    ]
    src = str(tmp_path / "docs")
    _write_chunk(spark, src, rows[:2], 1)
    _write_chunk(spark, src, rows[2:], 2)
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    q = (
        streaming_source_minhash(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("smh_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_smh"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(NUM_HASHES))
        for r in spark.sql("SELECT * FROM smh_out").collect()
    }
    batch = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    sh = batch.select(
        "source",
        F.explode(shingles_from_words(words(F.col("text")))).alias("s"),
    )
    hashed = sh.select(
        "source", salted_md5(F.col("s"), salt="mh").alias("__d")
    ).select(
        "source",
        hash32_from_digest("__d", half=0).alias("h1"),
        hash32_from_digest("__d", half=1).alias("h2"),
    )
    want = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(NUM_HASHES))
        for r in hashed.groupBy("source")
        .agg(
            *[
                F.min(
                    (F.col("h1") + i * F.col("h2")) % MINHASH_PRIME
                ).alias(f"mh{i}")
                for i in range(NUM_HASHES)
            ]
        )
        .collect()
    }
    assert got == want
    assert len(got) == 2  # structural bound: one row per source
