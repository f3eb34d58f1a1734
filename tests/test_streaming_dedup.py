"""Streaming MinHash dedup: content-identity filtering across
micro-batches, equivalent to the batch signature-grouping truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators import dedup
from flink_ecommerce_spark.streaming.dedup import (
    signature_key,
    streaming_minhash_dedup,
)


def _write_chunk(spark, path, rows, chunk):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/chunk={chunk}")


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again"
    chunk1 = [
        (1, base),
        (2, "an entirely different document about spark structured streaming"),
        (3, "the quick  brown fox\tjumps over the lazy dog again and  again"),
    ]
    chunk2 = [
        (4, base),  # cross-batch duplicate of doc 1 -> suppressed
        (5, "short doc"),  # < shingle width: normalized-hash fallback
        (6, "short  doc"),  # whitespace variant of 5 -> suppressed
        (7, "a genuinely new document arriving in the second batch here"),
    ]
    src = str(tmp_path / "docs")
    _write_chunk(spark, src, chunk1, 1)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    out = streaming_minhash_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    first = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    # doc 3 is a whitespace variant of doc 1 -> same signature, min wins
    assert first == {1, 2}

    _write_chunk(spark, src, chunk2, 2)
    q.processAllAvailable()
    q.stop()
    kept = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert kept == {1, 2, 5, 7}


def test_streaming_dedup_matches_batch_signature_grouping(spark, tmp_path):
    """The streamed keep-set equals the batch truth: min doc_id per
    signature key over the full corpus (when batches arrive in
    doc_id order, so min-per-batch == global min)."""
    from tests.conftest import SF_SMALL
    from flink_ecommerce_spark import catalog

    docs = catalog.table(spark, SF_SMALL, "documents").select("doc_id", "text")
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    src = str(tmp_path / "corpus")
    n = len(rows)
    step = (n + 2) // 3
    for i, lo in enumerate(range(0, n, step)):
        _write_chunk(spark, src, rows[lo : lo + step], i)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
    )
    out = streaming_minhash_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("corpus_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["doc_id"] for r in spark.sql("SELECT * FROM corpus_dedup").collect()
    }

    batch_truth = {
        r["keep"]
        for r in docs.select(signature_key(F.col("text")).alias("k"), "doc_id")
        .groupBy("k")
        .agg(F.min("doc_id").alias("keep"))
        .collect()
    }
    assert streamed == batch_truth
    assert len(streamed) <= docs.count()


def test_rowwise_signature_matches_batch_minhash(spark):
    """minhash_signature_array (streaming form) must produce exactly
    the aggregate minhash_signatures values (batch form)."""
    from tests.conftest import SF_SMALL
    from flink_ecommerce_spark import catalog

    docs = catalog.table(spark, SF_SMALL, "documents").limit(50)
    rowwise = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id", dedup.minhash_signature_array(F.col("text")).alias("sig")
        ).collect()
    }
    batch = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(dedup.NUM_HASHES)]
        for r in dedup.minhash_signatures(docs).collect()
    }
    assert set(rowwise) == set(batch)
    for doc_id, sig in rowwise.items():
        expected = batch[doc_id]
        if sig is None:
            assert all(v is None for v in expected)
        else:
            assert sig == expected, f"doc {doc_id}"
