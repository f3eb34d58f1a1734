"""Dedup clustering on crafted near-duplicates: docs sharing most
shingles must land in one cluster; unrelated docs stay singletons."""

from __future__ import annotations

from flink_ecommerce_spark.operators.dedup import dedup_clusters
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun today"
)


def test_near_duplicates_cluster_together(spark):
    docs = spark.createDataFrame(
        [
            (0, BASE, "en", "s", len(BASE)),
            (1, BASE + " extra", "en", "s", len(BASE) + 6),  # near-dup of 0
            (2, BASE.replace("fox", "wolf"), "en", "s", len(BASE)),  # near-dup
            (3, "completely different text about spark query engines "
                "and distributed columnar execution at large scale", "en", "s", 100),
            (4, "another unrelated document mentioning kafka topics "
                "postgres upserts and flink keyed state semantics", "en", "s", 100),
        ],
        DOCUMENTS_SCHEMA,
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs).collect()}
    assert clusters[0] == clusters[1] == clusters[2] == 0
    assert clusters[3] == 3 and clusters[4] == 4


def test_chain_clusters_merge(spark):
    """A chain of appended-suffix near-duplicates merges into one
    cluster through the pair graph. (LSH recall on SHORT low-overlap
    docs is legitimately probabilistic — band collision at jaccard
    0.6 with 8 shingles is ~0.43 — so the chain uses high-overlap
    near-dups, which is also the realistic near-dup regime.)"""
    a = BASE
    b = BASE + " omega"
    c = BASE + " omega psi"
    docs = spark.createDataFrame(
        [(0, a, "en", "s", 1), (1, b, "en", "s", 1), (2, c, "en", "s", 1)],
        DOCUMENTS_SCHEMA,
    )
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, threshold=0.5).collect()
    }
    assert len(set(clusters.values())) == 1, clusters
