"""Lexical retrieval (operators/retrieval.py): the index-equals-scan
guarantee for phrase search, BM25 ranking semantics, and the
prefix-filter Jaccard join's exactness against uncapped brute force.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ecommerce_spark import catalog
from flink_ecommerce_spark.operators import dedup, retrieval

from tests.conftest import SF_SMALL

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], DOC_SCHEMA
    )


# ------------------------------------------------------------- phrase search


def test_phrase_index_equals_scan_on_fixture(spark):
    docs = catalog.table(spark, SF_SMALL, "documents")
    idx = retrieval.phrase_search(docs).collect()
    scan = retrieval.phrase_scan(docs).collect()
    assert sorted(map(tuple, idx)) == sorted(map(tuple, scan))
    assert len(idx) > 0  # the default phrase must actually exercise the path


def test_phrase_three_terms_and_overlap(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a"),  # "a b a" occurs at 1 and 3 (overlapping)
            (2, "a b c a b a"),  # occurs at 4
            (3, "b a b"),  # never
            (4, "a b"),  # too short
        ],
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in retrieval.phrase_search(docs, "a b a").collect()
    }
    assert got == {1: (2, 1), 2: (1, 4)}
    scan = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in retrieval.phrase_scan(docs, "a b a").collect()
    }
    assert scan == got


def test_phrase_absent_is_empty(spark):
    docs = _docs(spark, [(1, "x y z"), (2, "y z x")])
    assert retrieval.phrase_search(docs, "z y").count() == 0
    assert retrieval.phrase_scan(docs, "z y").count() == 0


def test_single_term_phrase_counts_occurrences(spark):
    docs = _docs(spark, [(1, "w q w"), (2, "q")])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in retrieval.phrase_search(docs, "w").collect()
    }
    assert got == {1: (2, 1)}


# --------------------------------------------------------------------- BM25


def test_bm25_rank_shape(spark):
    docs = catalog.table(spark, SF_SMALL, "documents")
    rows = retrieval.bm25_topk(docs).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(retrieval.BM25_QUERIES)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= retrieval.BM25_K
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)  # Lucene idf is always positive


def test_bm25_term_match_required(spark):
    """Every returned doc contains at least one query term."""
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "delta epsilon"),
            (3, "alpha alpha delta"),
            (4, "zeta eta theta"),
        ],
    )
    rows = retrieval.bm25_topk(docs, {"q": "alpha delta"}).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
    top = min(rows, key=lambda r: r["rank"])
    assert top["doc_id"] == 3  # matches both terms, one of them twice


def test_bm25_idf_prefers_rare_terms(spark):
    """Two docs with equal length and tf: the one matching the RARER
    term scores higher."""
    filler = [(i, "filler common words here") for i in range(10, 30)]
    # 'common' appears in many docs, 'rare' in one
    docs = _docs(
        spark,
        [(1, "rare word pad"), (2, "common word pad"), *filler],
    )
    rows = retrieval.bm25_topk(docs, {"q": "rare common"}).collect()
    score = {r["doc_id"]: r["score"] for r in rows}
    assert score[1] > score[2]


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc wins (b > 0)."""
    docs = _docs(
        spark,
        [
            (1, "hit miss"),
            (2, "hit miss miss miss miss miss miss miss"),
            (3, "pad pad pad"),
        ],
    )
    rows = retrieval.bm25_topk(docs, {"q": "hit"}).collect()
    score = {r["doc_id"]: r["score"] for r in rows}
    assert set(score) == {1, 2}
    assert score[1] > score[2]


# ------------------------------------------------------------ hybrid fusion


def test_hybrid_rrf_fusion_semantics(spark):
    """RRF fundamentals on the fixture: ranks contiguous, scores
    monotone, and every fused score equals 1/(K+sem_rk) + 1/(K+lex_rk)
    recomputed from the two modality shortlists."""
    docs = catalog.table(spark, SF_SMALL, "documents")
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    from flink_ecommerce_spark.operators.similarity import knn_bruteforce

    fused = retrieval.hybrid_search_rrf(docs, emb).collect()
    sem = {
        (r["query_id"], r["neighbor_id"]): r["rk"]
        for r in knn_bruteforce(emb, k=retrieval.HYBRID_M).collect()
    }
    lex = {
        (r["query_id"], r["doc_id"]): r["lex_rk"]
        for r in retrieval.lexical_topk(docs).collect()
    }
    assert fused
    for r in fused:
        key = (r["query_id"], r["doc_id"])
        expect = 0.0
        if key in sem:
            expect += 1.0 / (retrieval.RRF_K + sem[key])
        if key in lex:
            expect += 1.0 / (retrieval.RRF_K + lex[key])
        assert expect > 0  # every fused doc came from a shortlist
        assert abs(r["rrf_score"] - expect) < 1e-6
    by_q: dict = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["rrf_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_hybrid_rrf_both_modalities_beat_one(spark):
    """A doc on both shortlists at rank r outranks a doc holding rank
    r on only one — the reason fusion exists."""
    docs = catalog.table(spark, SF_SMALL, "documents")
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    from flink_ecommerce_spark.operators.similarity import knn_bruteforce

    sem = {
        (r["query_id"], r["neighbor_id"]): r["rk"]
        for r in knn_bruteforce(emb, k=retrieval.HYBRID_M).collect()
    }
    lex = {
        (r["query_id"], r["doc_id"]): r["lex_rk"]
        for r in retrieval.lexical_topk(docs).collect()
    }
    fused = {
        (r["query_id"], r["doc_id"]): r["rrf_score"]
        for r in retrieval.hybrid_search_rrf(docs, emb).collect()
    }
    both = [k for k in fused if k in sem and k in lex]
    # structural check: any doc in both lists with ranks (ra, rb) beats
    # a doc whose single rank is >= max(ra, rb)
    for b in both:
        rb = max(sem[b], lex[b])
        for o in fused:
            if (o in sem) != (o in lex):
                ro = sem.get(o, lex.get(o))
                if o[0] == b[0] and ro >= rb:
                    assert fused[b] > fused[o]


# ------------------------------------------------- prefix-filter Jaccard join


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8])
def test_prefix_jaccard_exact_vs_bruteforce(spark, threshold):
    """The exactness guarantee: prefix filtering must reproduce the
    UNCAPPED all-shared-shingle brute force at every threshold
    (ngram_jaccard_pairs with the df ceiling disabled)."""
    docs = catalog.table(spark, SF_SMALL, "documents")
    pruned = dedup.prefix_jaccard_pairs(docs, threshold=threshold).collect()
    brute = dedup.ngram_jaccard_pairs(
        docs, threshold=threshold, max_df_frac=1.1
    ).collect()
    # both sides carry the jaccard_micro integer contract (prefix
    # migrated on its r09 window rotation) — identical raw ratio,
    # identical quantization, so the match is exact
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard_micro"]) for r in pruned)
    want = sorted((r["doc_a"], r["doc_b"], r["jaccard_micro"]) for r in brute)
    assert got == want


def test_prefix_jaccard_hot_shingle_correctness(spark):
    """A shingle shared by EVERY doc (the hot-bucket case that forces
    ngram_jaccard_pairs' df cap) must not break exactness: the hot
    shingle sorts last in the df order, so it stays out of prefixes,
    yet pairs whose similarity depends on it are still found."""
    stop = "of the and"  # one shared shingle across all docs
    rows = [
        (1, f"{stop} alpha beta gamma delta"),
        (2, f"{stop} alpha beta gamma epsilon"),
        (3, f"{stop} zeta eta theta iota"),
        (4, "totally different words entirely here now"),
    ]
    docs = _docs(spark, rows)
    got = dedup.prefix_jaccard_pairs(docs, threshold=0.3).collect()
    brute = dedup.ngram_jaccard_pairs(docs, threshold=0.3, max_df_frac=1.1).collect()
    assert sorted((r["doc_a"], r["doc_b"]) for r in got) == sorted(
        (r["doc_a"], r["doc_b"]) for r in brute
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert (1, 2) in pairs  # near-dup pair found
    assert (1, 4) not in pairs


def test_prefix_jaccard_identical_docs(spark):
    docs = _docs(
        spark,
        [(1, "p q r s t"), (2, "p q r s t"), (3, "u v w x y")],
    )
    got = dedup.prefix_jaccard_pairs(docs, threshold=0.9).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard_micro"]) for r in got] == [
        (1, 2, 1_000_000)
    ]


def test_prefix_jaccard_short_docs_no_crash(spark):
    docs = _docs(spark, [(1, "one two"), (2, "a"), (3, "")])
    assert dedup.prefix_jaccard_pairs(docs).count() == 0


def test_book_length_doc_survives_shingle_paths(spark):
    """A 20k-word document must flow through the shingle-based ops in
    one piece — the zip_with shingle builder is O(w) per row, never
    O(words²) (the transform-with-slice antipattern), so book-length
    docs are linear work."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    book = " ".join(rng.choice(vocab) for _ in range(20_000))
    docs = _docs(
        spark,
        [(1, book), (2, book), (3, "a short unrelated document here")],
    )
    pairs = dedup.prefix_jaccard_pairs(docs, threshold=0.9).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard_micro"]) for r in pairs] == [
        (1, 2, 1_000_000)
    ]
    sigs = dedup.minhash_signatures(docs).collect()
    assert len(sigs) == 3
    hits = retrieval.phrase_search(docs, book.split()[0] + " " + book.split()[1])
    assert hits.count() >= 1


def test_phrase_scan_rejects_quote_terms(spark):
    docs = _docs(spark, [(1, "x y")])
    with pytest.raises(ValueError, match="quote"):
        retrieval.phrase_scan(docs, "it's here")
