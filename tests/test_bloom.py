"""Bloom-filter admission gate: the sketch's defining guarantees —
no false negatives EVER, false positives at the designed rate,
distinct-union mergeability — plus the plan property that makes it a
100 TB gate (the m-bit filter broadcasts; the batch never shuffles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark import catalog
from flink_ecommerce_spark.operators import dedup
from flink_ecommerce_spark.operators.sketch import (
    BLOOM_BITS,
    BLOOM_HASHES,
    bloom_admission,
    bloom_bits,
)

from tests.conftest import SF_SMALL


def _docs(spark):
    return catalog.table(spark, SF_SMALL, "documents")


def test_bloom_no_false_negatives_on_exact_duplicates(spark):
    """Every corpus doc replayed verbatim as a 'new' row must report
    maybe_seen — the no-false-negative guarantee, tested on the
    strongest case (the whole corpus resubmitted)."""
    docs = _docs(spark)
    verdict = bloom_admission(docs.select("doc_id", "text"), docs)
    n_missed = verdict.filter(~F.col("maybe_seen")).count()
    assert n_missed == 0


def test_bloom_no_false_negatives_under_whitespace_renorm(spark):
    """The gate normalizes like dedup_exact(normalized=True): a
    re-whitespaced repost of a corpus doc still trips the filter."""
    docs = _docs(spark)
    reposts = docs.select(
        "doc_id",
        F.concat(F.lit("  "), F.regexp_replace("text", r" ", "   ")).alias(
            "text"
        ),
    )
    verdict = bloom_admission(reposts, docs)
    assert verdict.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_false_positive_rate_within_design(spark):
    """Unseen docs (text perturbed with a nonce no corpus doc
    contains) should pass the gate almost always: fp ~
    (1 - e^(-k*n/m))^k, ~0.1% at the fixture's n≈500. Assert a 20x
    slack bound so the test pins the order of magnitude, not luck."""
    docs = _docs(spark)
    unseen = docs.select(
        "doc_id", F.concat(F.lit("nonce-7f3a9 "), "text").alias("text")
    )
    n = docs.count()
    verdict = bloom_admission(unseen, docs)
    n_fp = verdict.filter(F.col("maybe_seen")).count()
    k, m = BLOOM_HASHES, BLOOM_BITS
    import math

    design_fp = (1.0 - math.exp(-k * n / m)) ** k
    assert n_fp <= max(5, 20 * design_fp * n)


def test_bloom_superset_of_exact_rejections(spark):
    """Admission soundness vs the exact path: every new-batch doc the
    exact incremental gate drops as already-present MUST be flagged
    maybe_seen (the Bloom gate can over-flag, never under-flag)."""
    docs = _docs(spark)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    admitted_exact = {
        r["doc_id"]
        for r in dedup.incremental_dedup(new, corpus).select("doc_id").collect()
    }
    flagged = {
        r["doc_id"]
        for r in bloom_admission(new, corpus)
        .filter(F.col("maybe_seen"))
        .collect()
    }
    rejected_exact = {
        r["doc_id"] for r in new.select("doc_id").collect()
    } - admitted_exact
    assert rejected_exact <= flagged


def test_bloom_bits_mergeable_by_distinct_union(spark):
    """Shard-and-merge equals whole-corpus build: filters from two
    corpus halves union (distinct) into exactly the full filter —
    what lets each ingest day build its own filter independently."""
    docs = _docs(spark)
    whole = {r["pos"] for r in bloom_bits(docs).collect()}
    a = bloom_bits(docs.filter(F.col("doc_id") % 2 == 0))
    b = bloom_bits(docs.filter(F.col("doc_id") % 2 != 0))
    merged = {r["pos"] for r in a.union(b).distinct().collect()}
    assert merged == whole


def test_bloom_admission_broadcasts_filter_not_batch(spark):
    """The m-bit filter (≤ BLOOM_BITS rows) must be the broadcast
    side; a sort-merge join here would shuffle the new batch on pos
    — wrong shape at 100 TB."""
    docs = _docs(spark)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    plan = (
        bloom_admission(new, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
