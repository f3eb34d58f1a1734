"""Streaming semantic dedup: cross-batch ε-net filtering against a
batch-built centroid index, and the documented greedy-vs-batch chain
divergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.similarity import (
    _centroid_arrays,
    semantic_dedup,
)
from flink_ecommerce_spark.streaming.semdedup import (
    cell_expr,
    streaming_semantic_dedup,
)

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _centroid_rows(spark, emb_df):
    return [
        (r["label"], list(r["cvec"])) for r in _centroid_arrays(emb_df).collect()
    ]


def _write_chunk(spark, path, rows, chunk):
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/chunk={chunk}")


def _run_stream(spark, tmp_path, src, centroids, queryname):
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
        .drop("label")
    )
    out = streaming_semantic_dedup(stream, centroids)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryname)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{queryname}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {
        r["vec_id"] for r in spark.sql(f"SELECT * FROM {queryname}").collect()
    }


def test_streaming_semdedup_cross_batch_suppression(spark, tmp_path):
    # history defines the centroids; the stream carries a near-copy
    # of an earlier arrival in a LATER batch -> suppressed by state
    hist = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    centroids = _centroid_rows(spark, spark.createDataFrame(hist, EMB_SCHEMA))
    chunk1 = [
        (10, [1.0, 0.0, 0.0, 0.0], 0),
        (11, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    chunk2 = [
        (20, [1.0, 0.005, 0.0, 0.0], 0),  # near-copy of 10 -> suppressed
        (21, [0.0, 1.0, 0.0, 0.0], 0),  # genuinely new -> admitted
    ]
    src = str(tmp_path / "emb")
    _write_chunk(spark, src, chunk1, 1)
    _write_chunk(spark, src, chunk2, 2)
    kept = _run_stream(spark, tmp_path, src, centroids, "semdedup_out")
    assert kept == {10, 11, 21}


def test_streaming_cell_matches_batch_assignment(spark):
    # the literal-centroid argmin expression must reproduce the batch
    # build_ivf_index cell for every fixture vector
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = _centroid_rows(spark, emb)
    expr_cells = emb.select(
        "vec_id", cell_expr(F.col("embedding"), centroids).alias("cell")
    )
    batch_cells = semantic_dedup(emb).select("vec_id", "cell")
    diff = (
        expr_cells.alias("a")
        .join(batch_cells.alias("b"), "vec_id")
        .filter(F.col("a.cell") != F.col("b.cell"))
        .count()
    )
    assert diff == 0


def test_streaming_greedy_vs_batch_chain_semantics(spark, tmp_path):
    # chain a~b, b~c, a!~c: batch drops {b, c}; the stream admits c
    # because b was never admitted — the documented ε-net divergence
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.98, 0.199, 0.0, 0.0], 0),
        (2, [0.92, 0.39, 0.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    batch_kept = {
        r["vec_id"] for r in semantic_dedup(emb).collect() if r["kept"]
    }
    assert batch_kept == {0}
    centroids = _centroid_rows(spark, emb)
    src = str(tmp_path / "emb_chain")
    _write_chunk(spark, src, rows, 1)
    kept = _run_stream(spark, tmp_path, src, centroids, "semdedup_chain")
    assert kept == {0, 2}


def test_streaming_semdedup_no_chains_matches_batch(spark, tmp_path):
    # without chains the greedy ε-net and the batch senior-wins rule
    # admit the same set: pairs are either clear dups or clearly apart
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.002, 0.0, 0.0], 0),  # dup of 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.003, 0.0], 0),  # dup of 2
        (4, [0.0, 0.0, 1.0, 0.0], 1),
        (5, [0.0, 0.0, 0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    batch_kept = {
        r["vec_id"] for r in semantic_dedup(emb).collect() if r["kept"]
    }
    centroids = _centroid_rows(spark, emb)
    src = str(tmp_path / "emb_nochain")
    _write_chunk(spark, src, rows[:3], 1)
    _write_chunk(spark, src, rows[3:], 2)
    kept = _run_stream(spark, tmp_path, src, centroids, "semdedup_nochain")
    assert kept == batch_kept


def test_streaming_semdedup_fifo_eviction_readmits(spark, tmp_path):
    # cap 1: admitting B evicts A's rep, so a later copy of A
    # re-admits — the documented dedup-window semantics
    hist = [(0, [1.0, 0.0, 0.0, 0.0], 0)]
    centroids = _centroid_rows(spark, spark.createDataFrame(hist, EMB_SCHEMA))
    src = str(tmp_path / "emb_fifo")
    _write_chunk(spark, src, [(1, [1.0, 0.0, 0.0, 0.0], 0)], 1)
    _write_chunk(spark, src, [(2, [0.0, 1.0, 0.0, 0.0], 0)], 2)
    _write_chunk(spark, src, [(3, [1.0, 0.001, 0.0, 0.0], 0)], 3)
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk=*")
        .drop("label")
    )
    out = streaming_semantic_dedup(stream, centroids, max_reps_per_cell=1)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("semdedup_fifo")
        .option("checkpointLocation", str(tmp_path / "ckpt_fifo"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {
        r["vec_id"] for r in spark.sql("SELECT * FROM semdedup_fifo").collect()
    }
    # 3 is a near-copy of 1, but 1's rep was evicted when 2 arrived
    assert kept == {1, 2, 3}
