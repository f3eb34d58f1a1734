"""Streaming sequence packing: cross-micro-batch offset continuation
and exact equivalence with the batch op on an in-order replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.packing import sequence_packing
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA
from flink_ecommerce_spark.streaming.packing import streaming_sequence_packing


def _write_chunk(spark, src, rows, chunk):
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{src}/chunk={chunk}")


def test_streaming_packing_continues_offsets_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs")
    _write_chunk(spark, src, [(0, "s", "a b c"), (1, "s", "d e")], 1)

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    out = streaming_sequence_packing(stream, ctx_len=4)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pack_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # second batch: the source's stream continues at token 5
    _write_chunk(spark, src, [(2, "s", "f g h i"), (3, "t", "x")], 2)
    q.processAllAvailable()
    q.stop()

    rows = {
        r["doc_id"]: r for r in spark.sql("SELECT * FROM pack_out").collect()
    }
    assert (rows[0]["tok_offset"], rows[1]["tok_offset"]) == (0, 3)
    # doc 2 starts at 5 (carried state), spans tokens 5..8 -> chunks 1..2
    assert rows[2]["tok_offset"] == 5
    assert (rows[2]["first_chunk"], rows[2]["last_chunk"]) == (1, 2)
    # a new source starts its own stream at 0
    assert rows[3]["tok_offset"] == 0


def test_streaming_packing_matches_batch_on_inorder_replay(spark, tmp_path):
    docs = [
        (i, f"word{i} " * (i % 7 + 1) + ("tail" if i % 3 else ""), "en",
         f"s{i % 3}", 10)
        for i in range(60)
    ]
    bdf = spark.createDataFrame(docs, DOCUMENTS_SCHEMA)
    expected = {
        (r["doc_id"]): tuple(r)
        for r in sequence_packing(bdf, ctx_len=16).collect()
    }

    src = str(tmp_path / "replay")
    bdf.select("doc_id", "source", "text").coalesce(1).write.parquet(
        f"{src}/chunk=1"
    )
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .parquet(f"{src}/chunk=*")
    )
    out = streaming_sequence_packing(stream, ctx_len=16)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("pack_replay")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: tuple(
            r[c] for c in ["doc_id", "source", "n_tokens", "tok_offset",
                           "first_chunk", "last_chunk"]
        )
        for r in spark.sql("SELECT * FROM pack_replay").collect()
    }
    want = {
        k: tuple(v[i] for i in range(6)) for k, v in expected.items()
    }
    assert got == want and len(got) == 60
