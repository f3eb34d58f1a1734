"""Sequence packing (concat-and-chunk): offsets, chunk straddling,
empty docs, per-source independence, skew-shard variant, and the
no-global-sort plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.packing import (
    packing_efficiency,
    sequence_packing,
)
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA


def _docs(spark, rows):
    # (doc_id, text, source) with lang/n_chars filler
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOCUMENTS_SCHEMA
    )


def test_packing_offsets_and_straddle(spark):
    rows = [
        (0, "a b c", "s1"),          # 3 tokens, offset 0
        (1, " ".join(["w"] * 6), "s1"),  # 6 tokens, offset 3 -> straddles ctx=8
        (2, "x y", "s1"),            # offset 9
        (3, "only doc", "s2"),       # separate source restarts at 0
    ]
    out = {
        r["doc_id"]: r
        for r in sequence_packing(_docs(spark, rows), ctx_len=8).collect()
    }
    assert (out[0]["tok_offset"], out[0]["first_chunk"], out[0]["last_chunk"]) == (0, 0, 0)
    # doc 1: tokens 3..8 -> chunks 0 and 1
    assert (out[1]["tok_offset"], out[1]["first_chunk"], out[1]["last_chunk"]) == (3, 0, 1)
    assert (out[2]["tok_offset"], out[2]["first_chunk"]) == (9, 1)
    assert (out[3]["tok_offset"], out[3]["first_chunk"]) == (0, 0)


def test_packing_empty_doc_zero_width(spark):
    rows = [(0, "a b", "s"), (1, "", "s"), (2, "c d e", "s")]
    out = {
        r["doc_id"]: r
        for r in sequence_packing(_docs(spark, rows), ctx_len=4).collect()
    }
    assert out[1]["n_tokens"] == 0
    assert out[1]["first_chunk"] == out[1]["last_chunk"] == 0
    # the empty doc consumes no tokens: doc 2 starts right after doc 0
    assert out[2]["tok_offset"] == 2


def test_packing_efficiency_fill_ratio(spark):
    rows = [(0, " ".join(["w"] * 10), "s")]  # 10 tokens, ctx 8 -> 2 chunks
    eff = packing_efficiency(
        sequence_packing(_docs(spark, rows), ctx_len=8), ctx_len=8
    ).collect()
    assert len(eff) == 1
    r = eff[0]
    assert (r["total_tokens"], r["n_chunks"]) == (10, 2)
    assert r["fill_ratio_micro"] == round(10 / 16 * 1_000_000)


def test_packing_shards_cover_all_docs(spark):
    rows = [(i, "a b c", "s") for i in range(20)]
    packed = sequence_packing(_docs(spark, rows), ctx_len=4, n_streams=4)
    got = packed.groupBy().agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")).collect()[0]
    assert (got["t"], got["n"]) == (60, 20)
    # each shard's offsets restart at 0: 4 docs with offset 0 per source
    assert packed.filter(F.col("tok_offset") == 0).count() == 4


def test_packing_sharded_output_carries_stream_column(spark):
    """n_streams>1 output must identify the stream, or chunk indices
    from different shards of one source collide (two docs both at
    first_chunk=0); packing_efficiency must count chunks per stream
    and sum, not max across streams."""
    rows = [(i, "a b c", "s") for i in range(20)]
    packed = sequence_packing(_docs(spark, rows), ctx_len=4, n_streams=4)
    assert "stream" in packed.columns
    # one stream-origin doc per shard: 4 rows share first_chunk=0 but
    # each carries a distinct stream id
    zero = packed.filter(F.col("tok_offset") == 0)
    assert zero.count() == 4
    assert zero.select("stream").distinct().count() == 4
    # each stream: 5 docs x 3 tokens = 15 tokens -> 4 chunks of ctx 4;
    # per-source chunk count is the SUM over streams (16), not
    # max(last_chunk)+1 (4)
    eff = packing_efficiency(packed, ctx_len=4).collect()
    assert len(eff) == 1
    assert (eff[0]["total_tokens"], eff[0]["n_chunks"]) == (60, 16)
    assert eff[0]["fill_ratio_micro"] == round(60 / 64 * 1_000_000)


def test_packing_default_schema_unchanged(spark):
    """n_streams=1 (the oracle-certified path) keeps the original
    6-column schema with no stream column."""
    rows = [(0, "a b", "s")]
    packed = sequence_packing(_docs(spark, rows))
    assert packed.columns == [
        "doc_id", "source", "n_tokens", "tok_offset", "first_chunk", "last_chunk"
    ]


def test_packing_plan_no_single_partition(spark):
    rows = [(i, "a b c", f"s{i % 3}") for i in range(30)]
    plan = sequence_packing(_docs(spark, rows))._sc is not None and \
        sequence_packing(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan  # window partitions on source


def test_unigram_surprisal_hand_computed(spark):
    import math

    from flink_ecommerce_spark.operators.text import unigram_surprisal

    # corpus: "a a b" + "a" -> counts: a=3, b=1, total=4
    rows = [(0, "a a b", "s"), (1, "a", "s")]
    out = {
        r["doc_id"]: r for r in unigram_surprisal(_docs(spark, rows)).collect()
    }
    p_a, p_b = 3 / 4, 1 / 4
    exp0 = -(2 * math.log(p_a) + math.log(p_b)) / 3
    assert out[0]["avg_surprisal_micro"] == math.floor(exp0 * 1_000_000 + 0.5)
    assert out[1]["avg_surprisal_micro"] == math.floor(
        -math.log(p_a) * 1_000_000 + 0.5
    )
    assert out[0]["n_words"] == 3 and out[1]["n_words"] == 1


def test_doc_chunks_overlap_and_tail(spark):
    from flink_ecommerce_spark.operators.packing import doc_chunks

    rows = [(0, " ".join(f"w{i}" for i in range(10)), "s")]
    out = sorted(
        doc_chunks(_docs(spark, rows), chunk_tokens=6, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 4 over 10 words -> starts 0, 4, 8
    assert [(r["chunk_idx"], r["start_tok"], r["n_chunk_tokens"]) for r in out] == [
        (0, 0, 6), (1, 4, 6), (2, 8, 2)
    ]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3 w4 w5"
    assert out[1]["chunk_text"] == "w4 w5 w6 w7 w8 w9"  # 2-token overlap
    assert out[2]["chunk_text"] == "w8 w9"  # short tail, no padding


def test_bigram_surprisal_hand_computed(spark):
    import math

    from flink_ecommerce_spark.operators.text import bigram_surprisal

    # corpus bigrams: "a b" x2 (docs 0,1), "b a" x1 (doc 0)
    # context counts: a=3 (a,a in doc0 + a in doc1), b=2
    rows = [(0, "a b a", "s"), (1, "a b", "s"), (2, "solo", "s")]
    out = {
        r["doc_id"]: r for r in bigram_surprisal(_docs(spark, rows)).collect()
    }
    p_ab = 2 / 3   # cnt2("a b")=2 / cnt1("a")=3
    p_ba = 1 / 2   # cnt2("b a")=1 / cnt1("b")=2
    exp0 = -(math.log(p_ab) + math.log(p_ba)) / 2
    assert out[0]["avg_bigram_surprisal_micro"] == math.floor(
        exp0 * 1_000_000 + 0.5
    )
    assert out[1]["avg_bigram_surprisal_micro"] == math.floor(
        -math.log(p_ab) * 1_000_000 + 0.5
    )
    assert 2 not in out  # single-word doc has no bigrams


def test_shard_manifest_order_independent_and_change_sensitive(spark):
    from flink_ecommerce_spark.operators.packing import shard_manifest

    rows = [(i, f"doc body number {i} " + "w " * (i % 17), "s") for i in range(40)]
    d = _docs(spark, rows)
    base = {r["shard"]: r.asDict() for r in shard_manifest(d).collect()}

    # partitioning / row order cannot change any manifest field
    scrambled = d.repartition(7).sortWithinPartitions(F.desc("doc_id"))
    assert {r["shard"]: r.asDict() for r in shard_manifest(scrambled).collect()} == base

    # editing ONE doc's text flips its shard's checksum and nothing else
    edited = d.withColumn(
        "text",
        # prepend glued to the first token: content changes, token
        # count (and hence shard assignment) does not
        F.when(F.col("doc_id") == 3, F.concat(F.lit("!"), F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    after = {r["shard"]: r.asDict() for r in shard_manifest(edited).collect()}
    changed = [
        s for s in base if after[s]["content_checksum"] != base[s]["content_checksum"]
    ]
    assert len(changed) == 1
    for s in base:
        assert after[s]["n_docs"] == base[s]["n_docs"]
