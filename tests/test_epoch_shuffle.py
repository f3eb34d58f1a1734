"""epoch_shuffle: permutation correctness, seed behavior, shard
balance, partitioning-invariance, and the no-global-sort plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.functions.portable import hash32
from flink_ecommerce_spark.operators.packing import epoch_shuffle
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 6) for i in range(n)], DOCUMENTS_SCHEMA
    )


def test_epoch_shuffle_is_a_permutation(spark):
    n = 257  # not a multiple of the bucket count or shard count
    out = epoch_shuffle(_docs(spark, n), seed=0).collect()
    assert len(out) == n
    assert sorted(r["pos"] for r in out) == list(range(n))
    assert len({r["doc_id"] for r in out}) == n


def test_epoch_shuffle_matches_global_hash_order(spark):
    """pos must equal the rank in a plain global (hash, doc_id) sort —
    the bucket decomposition is an optimization, not a semantic."""
    d = _docs(spark, 100)
    got = {r["doc_id"]: r["pos"] for r in epoch_shuffle(d, seed=3).collect()}
    ref = (
        d.select("doc_id", hash32(F.col("doc_id").cast("string"), salt="ep3").alias("h"))
        .orderBy("h", "doc_id")
        .collect()
    )
    for rank, r in enumerate(ref):
        assert got[r["doc_id"]] == rank


def test_epoch_shuffle_seed_changes_order_stably(spark):
    d = _docs(spark, 200)
    e0a = {r["doc_id"]: r["pos"] for r in epoch_shuffle(d, seed=0).collect()}
    e0b = {r["doc_id"]: r["pos"] for r in epoch_shuffle(d, seed=0).collect()}
    e1 = {r["doc_id"]: r["pos"] for r in epoch_shuffle(d, seed=1).collect()}
    assert e0a == e0b  # same seed -> identical permutation
    assert e0a != e1  # different epoch -> different order
    # and it is not the identity (hash actually scrambles)
    assert any(e0a[i] != i for i in range(200))


def test_epoch_shuffle_partitioning_invariant(spark):
    """Repartitioning or reordering the input cannot change any
    (doc_id, pos, shard) row — the shard-stability contract."""
    d = _docs(spark, 150)
    base = sorted(map(tuple, epoch_shuffle(d, seed=5).collect()))
    scrambled = d.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    assert sorted(map(tuple, epoch_shuffle(scrambled, seed=5).collect())) == base


def test_epoch_shuffle_shard_sizes_within_one(spark):
    n, shards = 203, 8
    sizes = (
        epoch_shuffle(_docs(spark, n), seed=0, n_shards=shards)
        .groupBy("shard")
        .count()
        .collect()
    )
    counts = {r["shard"]: r["count"] for r in sizes}
    assert set(counts) == set(range(shards))
    assert max(counts.values()) - min(counts.values()) <= 1
    # round-robin deal: shard = pos % n_shards exactly
    assert counts[0] == -(-n // shards)


def test_epoch_shuffle_plan_no_global_sort(spark):
    """The corpus-sized side must never pass through a SinglePartition
    sort/window; only the 2^bucket_bits offset table may."""
    plan = (
        epoch_shuffle(_docs(spark, 50), seed=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the within-bucket window partitions by __b (no global range
    # sort over the data); the only single-partition stage is the
    # 2^bucket_bits-row offsets table
    assert "Exchange rangepartitioning" not in plan
