"""Round-7 additions (second block): the LSH candidate-precision
meter, the NB margin-calibration report, and item-item co-purchase
neighbors."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ecommerce_spark.operators.classifier import (
    CALIB_MAX_BUCKET,
    MICRO,
    calibration_by_margin,
)
from flink_ecommerce_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    lsh_candidate_pairs,
    lsh_candidate_precision,
)
from flink_ecommerce_spark.plans.tpch import item_neighbors_topk
from flink_ecommerce_spark.schemas import DOCUMENTS_SCHEMA

from tests.conftest import SF_SMALL


def _docs(spark, rows):
    """rows: (text, lang, source) triples."""
    return spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, (t, lang, s) in enumerate(rows)],
        DOCUMENTS_SCHEMA,
    )


def _fixture_docs(spark):
    from flink_ecommerce_spark import catalog

    return catalog.table(spark, SF_SMALL, "documents")


# ---------------------------------------------------- lsh_candidate_precision


def test_precision_identical_docs_all_verify(spark):
    """A corpus of exact duplicates: every candidate pair verifies
    at Jaccard 1, so precision_u == 1e6."""
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [(txt, "en", "s")] * 4)
    [r] = lsh_candidate_precision(docs).collect()
    assert r["n_candidates"] == 6  # C(4,2) — every band collides
    assert r["n_verified"] == 6
    assert r["precision_u"] == 1_000_000


def test_precision_empty_corpus_zero_row(spark):
    docs = _docs(spark, []).limit(0)
    [r] = lsh_candidate_precision(docs).collect()
    assert (r["n_candidates"], r["n_verified"], r["precision_u"]) == (0, 0, 0)


def test_precision_bounded_by_pair_query(spark):
    """The exact cross-multiplication verify is at least as strict as
    lsh_candidate_pairs' ROUND(j, 6) >= tau filter, so n_verified is
    bounded by the certified pair query's output on the same corpus
    (and never exceeds the candidate count)."""
    docs = _fixture_docs(spark)
    [r] = lsh_candidate_precision(docs).collect()
    n_pairs = lsh_candidate_pairs(docs, JACCARD_THRESHOLD).count()
    assert 0 <= r["n_verified"] <= r["n_candidates"]
    assert r["n_verified"] <= n_pairs
    assert r["precision_u"] == (r["n_verified"] * 1_000_000) // max(
        r["n_candidates"], 1
    )


# ----------------------------------------------------- classifier_calibration


def test_calibration_separable_corpus_high_margin_correct(spark):
    """Classes with disjoint vocabularies: every doc predicts its own
    lang, margins land in the top bucket, accuracy is 1e6."""
    rows = [("aa bb cc dd ee ff gg hh aa bb cc dd", "en", "s")] * 3 + [
        ("xx yy zz ww vv uu tt ss xx yy zz ww", "fr", "s")
    ] * 3
    out = calibration_by_margin(_docs(spark, rows)).collect()
    assert sum(r["n_docs"] for r in out) == 6
    for r in out:
        assert 0 <= r["margin_bucket"] <= CALIB_MAX_BUCKET
        assert r["n_correct"] == r["n_docs"]
        assert r["acc_u"] == 1_000_000


def test_calibration_single_class_margin_zero(spark):
    """One class: no runner-up, margin pins to bucket 0, and the
    predictions are trivially correct."""
    rows = [("hello world foo bar", "en", "s")] * 4
    out = calibration_by_margin(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["margin_bucket"] == 0
    assert r["n_docs"] == 4 and r["n_correct"] == 4
    assert r["acc_u"] == MICRO


def test_calibration_fixture_totals(spark):
    """Bucket populations partition the scored docs (docs with >= 1
    in-vocabulary token), and acc_u is the exact integer ratio."""
    docs = _fixture_docs(spark)
    out = calibration_by_margin(docs).collect()
    from flink_ecommerce_spark.operators.textprep import words

    n_scored = docs.filter(F.size(words("text")) > 0).count()
    assert sum(r["n_docs"] for r in out) == n_scored
    for r in out:
        assert r["acc_u"] == (r["n_correct"] * 1_000_000) // r["n_docs"]


# ---------------------------------------------------------- dp_source_counts


def test_dp_mechanism_matches_python_replica(spark):
    """Laplace inverse-CDF with the portable hash seed, replicated in
    pure Python: same u, same mechanism arithmetic (1-micro tolerance
    for libm-vs-JVM ln)."""
    import hashlib
    import math

    from flink_ecommerce_spark.operators.text import dp_source_counts

    rows = [("t", "en", "a")] * 7 + [("t", "en", "b")] * 3
    docs = _docs(spark, rows)
    got = {r["source"]: r for r in dp_source_counts(docs).collect()}
    for src, n in [("a", 7), ("b", 3)]:
        h = int(hashlib.md5(f"dp:{src}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        c = u - 0.5
        noise = (-1.0 * math.copysign(1.0, c) if c != 0 else 0.0) * math.log(
            1.0 - 2.0 * abs(c)
        )
        # centi-grid noise quantization (ADVICE r07): the floor sits
        # on the coarse 1e-2 grid, then the output is exact integer
        # arithmetic — the replica matches exactly, no ulp tolerance
        want = n * 1_000_000 + math.floor(noise * 100.0 + 0.5) * 10_000
        assert got[src]["noisy_n_docs_micro"] == want
        assert got[src]["epsilon_micro"] == 1_000_000


def test_dp_epsilon_scales_noise(spark):
    """Same seed, so |noise| scales exactly 1/epsilon (up to micro
    rounding): the eps=0.5 deviation is twice the eps=1 deviation."""
    from flink_ecommerce_spark.operators.text import dp_source_counts

    rows = [("t", "en", "a")] * 5
    docs = _docs(spark, rows)
    [r1] = dp_source_counts(docs, epsilon=1.0).collect()
    [r2] = dp_source_counts(docs, epsilon=0.5).collect()
    d1 = r1["noisy_n_docs_micro"] - 5_000_000
    d2 = r2["noisy_n_docs_micro"] - 5_000_000
    assert abs(d2 - 2 * d1) <= 10_000  # one centi-grid step per release
    assert r2["epsilon_micro"] == 500_000


def test_dp_never_releases_true_count(spark):
    """The output schema carries no raw count column, and on the
    fixture no source's noisy release equals its true count in micro
    units (noise is continuous — an exact hit means a leak bug)."""
    from flink_ecommerce_spark.operators.text import dp_source_counts

    docs = _fixture_docs(spark)
    out = dp_source_counts(docs)
    assert set(out.columns) == {
        "source",
        "noisy_n_docs_micro",
        "epsilon_micro",
    }
    true_counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in out.collect():
        assert r["noisy_n_docs_micro"] != true_counts[r["source"]] * 1_000_000


# ------------------------------------------------------- item_neighbors_topk


def _lineitem(spark, baskets):
    """baskets: list of part-id lists; order keys are positional."""
    rows = [
        (ok + 1, p)
        for ok, parts in enumerate(baskets)
        for p in parts
    ]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_item_neighbors_exact_jaccard(spark):
    """parts 1,2 co-occur in 2 of their baskets: n_1 = 3, n_2 = 2,
    support = 2 -> jaccard_u = 2e6 // (3 + 2 - 2) = 666666."""
    li = _lineitem(spark, [[1, 2], [1, 2], [1, 3], [3, 4]])
    out = {
        (r["part"], r["neighbor"]): r
        for r in item_neighbors_topk(li).collect()
    }
    # support >= 2 keeps only the (1, 2) edge, in both directions
    assert set(out) == {(1, 2), (2, 1)}
    for key in [(1, 2), (2, 1)]:
        assert out[key]["support"] == 2
        assert out[key]["jaccard_u"] == (2 * 1_000_000) // (3 + 2 - 2)
        assert out[key]["rank"] == 1


def test_item_neighbors_topk_cap_and_order(spark):
    """A hub part with many neighbors keeps only k, ranked by
    jaccard_u desc with neighbor-id tie-break."""
    # hub 1 pairs twice with each of 2..5; neighbor 2 also gets a
    # third co-basket -> strictly higher jaccard for (1, 2)
    baskets = []
    for n in [2, 3, 4, 5]:
        baskets += [[1, n], [1, n]]
    baskets += [[1, 2]]
    li = _lineitem(spark, baskets)
    rows = [
        r
        for r in item_neighbors_topk(li, k=2).collect()
        if r["part"] == 1
    ]
    assert len(rows) == 2
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
    best = min(rows, key=lambda r: r["rank"])
    assert best["neighbor"] == 2  # 3 shared baskets beats 2
    second = max(rows, key=lambda r: r["rank"])
    assert second["neighbor"] == 3  # jaccard tie among 3,4,5 -> min id


def test_item_neighbors_symmetric_on_fixture(spark):
    """Every edge appears in both directions with identical
    jaccard_u whenever both endpoints keep it in their top-k."""
    from flink_ecommerce_spark import catalog

    li = catalog.table(spark, SF_SMALL, "lineitem")
    rows = item_neighbors_topk(li, k=1000).collect()  # k big = no cut
    vals = {(r["part"], r["neighbor"]): r["jaccard_u"] for r in rows}
    for (a, b), j in vals.items():
        assert vals[(b, a)] == j


# -------------------------------------------------------- markov_attribution


def _events(spark, rows):
    """rows: (event_id, user_id, event_type) with ts = epoch + id."""
    import datetime

    from flink_ecommerce_spark.schemas import EVENTS_SCHEMA

    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + datetime.timedelta(minutes=eid), uid, et, 1.0, "{}")
            for eid, uid, et in rows
        ],
        EVENTS_SCHEMA,
    )


def test_markov_hand_computed_removal_effects(spark):
    """user 1: click -> purchase; user 2: view -> (end).
    START splits 1/2-1/2; click always converts, view never does, so
    base pconv = 0.5, removing click drops it to 0 (full effect) and
    removing view changes nothing."""
    from flink_ecommerce_spark.plans.temporal import markov_attribution

    ev = _events(spark, [(1, 1, "click"), (2, 1, "purchase"), (3, 2, "view")])
    got = {r["channel"]: r for r in markov_attribution(ev).collect()}
    assert got["click"]["base_pconv_u"] == 500_000
    assert got["click"]["removed_pconv_u"] == 0
    assert got["click"]["effect_u"] == 500_000
    assert got["click"]["share_u"] == 1_000_000
    assert got["view"]["removed_pconv_u"] == 500_000
    assert got["view"]["effect_u"] == 0
    assert got["view"]["share_u"] == 0


def test_markov_journey_split_at_purchase(spark):
    """A purchase terminates its own journey: purchase-first user
    contributes START->CONV, and the touch AFTER it starts a fresh
    journey (START->click, click->NULL)."""
    from flink_ecommerce_spark.plans.temporal import _markov_transitions

    ev = _events(spark, [(1, 1, "purchase"), (2, 1, "click")])
    trans = {
        (r["src"], r["dst"]): r["p_u"]
        for r in _markov_transitions(ev).collect()
    }
    assert trans[("START", "CONV")] == 500_000
    assert trans[("START", "click")] == 500_000
    assert trans[("click", "NULL")] == 1_000_000


def test_markov_no_conversions_all_zero(spark):
    """Zero purchases: base pconv 0, all effects 0, shares 0 (the
    GREATEST guard, no division error)."""
    from flink_ecommerce_spark.plans.temporal import markov_attribution

    ev = _events(spark, [(1, 1, "click"), (2, 2, "view")])
    for r in markov_attribution(ev).collect():
        assert r["base_pconv_u"] == 0
        assert r["effect_u"] == 0 and r["share_u"] == 0


# ------------------------------------------------------------ retrieval_eval


def test_retrieval_eval_relevance_and_rank(spark):
    """AND-relevance: only the doc with BOTH terms is relevant; BM25
    ranks it first (two matching terms beat one), so rr = 1."""
    from flink_ecommerce_spark.operators.retrieval import retrieval_eval

    docs = _docs(
        spark,
        [
            ("foo bar baz qux quux corge", "en", "s"),
            ("foo aaa bbb ccc ddd eee", "en", "s"),
            ("zzz yyy xxx www vvv uuu", "en", "s"),
        ],
    )
    [r] = retrieval_eval(docs, queries={"qa": "foo bar"}).collect()
    assert r["n_relevant"] == 1
    assert r["first_rel_rank"] == 1
    assert r["rr_u"] == 1_000_000


def test_retrieval_eval_no_relevant_doc(spark):
    """A query term absent from the corpus: nothing satisfies AND,
    so the row reports 0/0/0 instead of dropping."""
    from flink_ecommerce_spark.operators.retrieval import retrieval_eval

    docs = _docs(spark, [("foo bar baz", "en", "s")])
    [r] = retrieval_eval(docs, queries={"qz": "foo zzz"}).collect()
    assert (r["n_relevant"], r["first_rel_rank"], r["rr_u"]) == (0, 0, 0)


def test_retrieval_eval_fixture_nonvacuous(spark):
    """Every default query has relevant docs on the fixture and the
    reciprocal rank is consistent with its first_rel_rank."""
    from flink_ecommerce_spark.operators.retrieval import retrieval_eval

    out = retrieval_eval(_fixture_docs(spark)).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_relevant"] > 0
        if r["first_rel_rank"] > 0:
            assert r["rr_u"] == 1_000_000 // r["first_rel_rank"]


# ----------------------------------------------------------------- winnowing


def _winnow_python(text, w=4, k=3):
    """Pure-python winnowing replica: words -> k-gram shingles ->
    salted hash32 -> per-window rightmost-min -> distinct (h, pos)."""
    import hashlib

    ws = text.split()
    sh = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
    hs = [
        int(hashlib.md5(f"wn:{s}".encode()).hexdigest()[:8], 16) for s in sh
    ]
    n = len(hs)
    fps = set()
    for start in range(max(n - w, 0) + 1):
        win = hs[start : start + w]
        m = min(win)
        pos = start + max(i for i, h in enumerate(win) if h == m)
        fps.add((m, pos))
    return sh, fps


def test_winnowing_matches_python_replica(spark):
    from flink_ecommerce_spark.operators.dedup import winnowing_fingerprints

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    sh, fps = _winnow_python(text)
    [r] = winnowing_fingerprints(_docs(spark, [(text, "en", "s")])).collect()
    assert r["n_shingles"] == len(sh)
    assert r["n_fingerprints"] == len(fps)
    n_windows = max(len(sh) - 4, 0) + 1
    assert r["density_u"] == (len(fps) * 1_000_000) // n_windows


def test_winnowing_short_doc_single_fingerprint(spark):
    """A 3-word doc has one shingle -> one truncated window -> one
    fingerprint, density 1e6; a 2-word doc has no shingles and is
    absent."""
    from flink_ecommerce_spark.operators.dedup import winnowing_fingerprints

    out = {
        r["doc_id"]: r
        for r in winnowing_fingerprints(
            _docs(spark, [("one two three", "en", "s"), ("one two", "en", "s")])
        ).collect()
    }
    assert set(out) == {0}
    assert out[0]["n_shingles"] == 1
    assert out[0]["n_fingerprints"] == 1
    assert out[0]["density_u"] == 1_000_000


def test_winnowing_guarantee_shared_run(spark):
    """The paper's no-miss floor: two docs sharing a run of
    >= w+k-1 = 6 words must share at least one fingerprint hash."""
    from flink_ecommerce_spark.operators.dedup import winnowing_overlap_pairs

    shared = "lorem ipsum dolor sit amet consectetur"
    docs = _docs(
        spark,
        [
            (f"aaa bbb ccc {shared} ddd eee", "en", "s"),
            (f"xxx yyy {shared} zzz www vvv", "en", "s"),
            ("unrelated words entirely different tokens here", "en", "s"),
        ],
    )
    # max_df_frac=1.0: on a 3-doc corpus the default 0.5 ceiling
    # calls every shared hash "hot" (df 2 > 1.5) — the cap is a scale
    # guard for real corpora, not for fixtures this small
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnowing_overlap_pairs(
            docs, min_shared=1, max_df_frac=1.0
        ).collect()
    }
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_winnowing_identical_docs_share_all(spark):
    """Exact duplicates share every fingerprint hash: n_shared equals
    each doc's (position-independent) fingerprint-hash count."""
    from flink_ecommerce_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )

    txt = "p q r s t u v w x y z aa bb cc"
    docs = _docs(spark, [(txt, "en", "s")] * 2)
    [fp] = (
        winnowing_fingerprints(docs).filter(F.col("doc_id") == 0).collect()
    )
    [pair] = winnowing_overlap_pairs(docs, max_df_frac=1.0).collect()
    assert (pair["doc_a"], pair["doc_b"]) == (0, 1)
    # distinct hashes can be fewer than (h, pos) fingerprints
    assert 1 <= pair["n_shared"] <= fp["n_fingerprints"]


def test_winnowing_random_corpus_matches_python_replica(spark):
    """The r09 zero-shuffle array rewrite vs the sequential replica,
    on 120 seeded random docs over a 9-word vocab (tiny vocab forces
    repeated shingles, exercising the rightmost tie-break and the
    distinct collapse): the EXACT (hash, position) fingerprint set
    must match per document — not just the counts."""
    import random

    from flink_ecommerce_spark.operators.dedup import (
        WINNOW_POS_MOD,
        _winnow_keys,
    )

    rng = random.Random(9)
    vocab = ["a", "b", "c", "d", "e", "f", "g", "h", "i"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(120)
    ]
    expected = {}
    for i, t in enumerate(texts):
        if len(t.split()) < 3:  # no shingles: replica's window loop
            continue  # would run once over an empty list
        sh, fps = _winnow_python(t)
        expected[i] = fps
    got = {}
    for r in _winnow_keys(_docs(spark, [(t, "en", "s") for t in texts])).collect():
        h, pos = divmod(r["key"], WINNOW_POS_MOD)
        got.setdefault(r["doc_id"], set()).add((h, WINNOW_POS_MOD - 1 - pos))
    assert got == expected


# ------------------------------------------------------------ the two meters


def test_journey_length_hist_hand_case(spark):
    """user 1: click+purchase = one journey of length 2; user 2: one
    dangling view = length 1. Shares are exact integer micro."""
    from flink_ecommerce_spark.plans.temporal import journey_length_hist

    ev = _events(spark, [(1, 1, "click"), (2, 1, "purchase"), (3, 2, "view")])
    got = {r["journey_len"]: r for r in journey_length_hist(ev).collect()}
    assert got[1]["n_journeys"] == 1 and got[1]["cum_share_u"] == 500_000
    assert got[2]["n_journeys"] == 1 and got[2]["cum_share_u"] == 1_000_000


def test_journey_hist_meters_markov_truncation(spark):
    """The meter's purpose: the fixture's journeys must overwhelmingly
    fit the MARKOV_STEPS horizon (else markov_attribution's truncation
    claim is wrong and this test is the tripwire)."""
    from flink_ecommerce_spark import catalog
    from flink_ecommerce_spark.plans.temporal import (
        MARKOV_STEPS,
        journey_length_hist,
    )

    ev = catalog.table(spark, SF_SMALL, "events")
    rows = sorted(
        journey_length_hist(ev).collect(), key=lambda r: r["journey_len"]
    )
    covered = max(
        r["cum_share_u"] for r in rows if r["journey_len"] <= MARKOV_STEPS
    )
    assert covered >= 900_000  # >= 90% of journeys inside the horizon


def test_basket_size_hist_hand_case(spark):
    from flink_ecommerce_spark.plans.tpch import basket_size_hist

    li = _lineitem(spark, [[1, 2], [3], [4, 5, 6]])
    got = {r["basket_size"]: r for r in basket_size_hist(li).collect()}
    assert [got[i]["n_orders"] for i in (1, 2, 3)] == [1, 1, 1]
    assert got[1]["cum_share_u"] == 333_333
    assert got[2]["cum_share_u"] == 666_666
    assert got[3]["cum_share_u"] == 1_000_000


def test_basket_hist_bounds_pair_cost(spark):
    """The histogram IS the co-purchase cost model: sum C(size, 2)
    over the histogram equals the unthresholded pair count the
    self-join generates."""
    from flink_ecommerce_spark.plans.tpch import basket_size_hist

    li = _lineitem(spark, [[1, 2, 3], [1, 2], [7]])
    hist = basket_size_hist(li).collect()
    pair_work = sum(
        r["n_orders"] * r["basket_size"] * (r["basket_size"] - 1) // 2
        for r in hist
    )
    op = li.distinct()
    a, b = op.alias("a"), op.alias("b")
    n_pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).count()
    assert pair_work == n_pairs == 4


# ------------------------------------------------------------ retrieval_ndcg


def test_ndcg_identity_on_fixture(spark):
    """ndcg = dcg·1e6 // idcg, and idcg matches the packed-prefix
    python replica of the per-term micro quantization."""
    import math

    from flink_ecommerce_spark.operators.retrieval import (
        BM25_K,
        retrieval_ndcg,
    )

    for r in retrieval_ndcg(_fixture_docs(spark)).collect():
        m = min(r["n_relevant"], BM25_K)
        want_idcg = sum(
            math.floor(1_000_000.0 / math.log2(i + 1.0) + 0.5)
            for i in range(1, m + 1)
        )
        assert r["idcg_micro"] == want_idcg
        assert r["ndcg_micro"] == (r["dcg_micro"] * 1_000_000) // max(
            r["idcg_micro"], 1
        )


def test_ndcg_penalizes_buried_relevant_doc(spark):
    """An irrelevant doc with a saturated rare term outranks the one
    relevant (both-terms) doc, so nDCG < 1 while MRR-style metrics
    still see a hit: the shortlist-grading property that motivates
    the op."""
    import math

    from flink_ecommerce_spark.operators.retrieval import (
        bm25_topk,
        retrieval_ndcg,
    )

    filler = [(f"common w{i} x{i} y{i} z{i}", "en", "s") for i in range(8)]
    docs = _docs(
        spark,
        filler
        + [
            ("common rare", "en", "s"),  # doc 8: relevant (both terms)
            ("rare rare rare rare", "en", "s"),  # doc 9: irrelevant
        ],
    )
    q = {"qx": "common rare"}
    ranks = {
        r["doc_id"]: r["rank"]
        for r in bm25_topk(docs, q).collect()
    }
    assert ranks[9] < ranks[8]  # construction sanity: relevant buried
    [r] = retrieval_ndcg(docs, queries=q).collect()
    assert r["n_relevant"] == 1
    want_dcg = math.floor(
        1_000_000.0 / math.log2(ranks[8] + 1.0) + 0.5
    )
    assert r["dcg_micro"] == want_dcg
    assert r["idcg_micro"] == 1_000_000  # one relevant -> ideal rank 1
    assert r["ndcg_micro"] == want_dcg  # < 1e6: the burial is visible


def test_ndcg_no_relevant_reports_zero(spark):
    from flink_ecommerce_spark.operators.retrieval import retrieval_ndcg

    docs = _docs(spark, [("foo bar baz", "en", "s")])
    [r] = retrieval_ndcg(docs, queries={"qz": "foo zzz"}).collect()
    assert (r["dcg_micro"], r["idcg_micro"], r["ndcg_micro"]) == (0, 0, 0)


# ---------------------------------------------------------- dup_quality_report


def test_dup_quality_buckets_and_means(spark):
    """3 identical copies + 1 unique doc: copies land in bucket 3
    with the copy text's own quality as the mean (identical text =>
    identical score)."""
    from flink_ecommerce_spark.operators.text import (
        dup_quality_report,
        quality_scores_int,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely different unique content with other words here"
    docs = _docs(spark, [(dup, "en", "s")] * 3 + [(uniq, "en", "s")])
    got = {r["n_copies_bucket"]: r for r in dup_quality_report(docs).collect()}
    q = {
        r["doc_id"]: r["quality_micro"]
        for r in quality_scores_int(docs).collect()
    }
    assert got[3]["n_groups"] == 1 and got[3]["n_docs"] == 3
    assert got[3]["mean_quality_micro"] == q[0]  # any copy's score
    assert got[1]["n_groups"] == 1 and got[1]["n_docs"] == 1
    assert got[1]["mean_quality_micro"] == q[3]


def test_dup_quality_bucket_cap(spark):
    """7 copies with the default cap land in the '5 or more' bucket."""
    from flink_ecommerce_spark.operators.text import dup_quality_report

    docs = _docs(spark, [("same text every time here", "en", "s")] * 7)
    [r] = dup_quality_report(docs).collect()
    assert r["n_copies_bucket"] == 5
    assert r["n_docs"] == 7 and r["n_groups"] == 1


def test_dup_quality_partitions_corpus(spark):
    """Bucket doc counts partition the corpus exactly."""
    from flink_ecommerce_spark.operators.text import dup_quality_report

    docs = _fixture_docs(spark)
    out = dup_quality_report(docs).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
