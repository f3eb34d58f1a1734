"""ANN quality: the approximate indexes must actually approximate —
recall@k of LSH and IVF against the brute-force truth."""

from __future__ import annotations

from flink_ecommerce_spark import catalog
from flink_ecommerce_spark.operators import similarity

from tests.conftest import SF_SMALL


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    truth = _topk_sets(similarity.knn_bruteforce(emb))
    approx = _topk_sets(similarity.ivf_topk(emb))
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    mean_recall = sum(recalls) / len(recalls)
    # labels are weak quantizers on random-ish data; the point is the
    # machinery returns a sane, nonempty, mostly-overlapping result
    assert mean_recall >= 0.2, f"IVF mean recall {mean_recall:.2f}"
    assert all(len(v) <= similarity.DEFAULT_K for v in approx.values())


def test_lsh_recall_and_candidate_reduction(spark):
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    truth = _topk_sets(similarity.knn_bruteforce(emb))
    approx = _topk_sets(similarity.ann_lsh_topk(emb))
    # every ANN neighbor must be a real vector and self-free
    for q, ns in approx.items():
        assert q not in ns
    # LSH searches ~1/2^P of the corpus; recall is best-effort but
    # the result must be nonempty for most queries
    assert len(approx) >= len(truth) // 2


def _pair_set(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.collect()}


def test_lsh_plane_band_cost_recall_tradeoff(spark):
    """The scale knobs must move cost and recall the right way:
    fewer planes → wider buckets → MORE candidate pairs (cost);
    more bands at the same planes → a SUPERSET of pairs (recall)."""
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    base = _pair_set(similarity.embedding_near_dup_pairs(emb, threshold=-1.0))
    wide = _pair_set(
        similarity.embedding_near_dup_pairs(emb, threshold=-1.0, n_planes=4)
    )
    banded = _pair_set(
        similarity.embedding_near_dup_pairs(emb, threshold=-1.0, n_bands=2)
    )
    assert len(wide) > len(base)  # 2^4 buckets vs 2^8 → more pairs
    assert banded >= base  # band 0 is the single-band bucketing
    # ann through the multi-band path stays self-free and k-bounded
    multi = similarity.ann_lsh_topk(emb, n_bands=2).collect()
    assert multi
    for r in multi:
        assert r["query_id"] != r["neighbor_id"]
        assert r["rk"] <= similarity.DEFAULT_K


def test_lsh_planner_recall_dominates_static_grid(spark):
    """BASELINE.md requires lsh_plan_for's recommendation to dominate
    the bench grid. The recall axis is deterministic, so it's pinned
    here at sf0.01 against every static grid config; the wall-clock
    axis is recorded per-round in the bench JSON's ann_grid block
    (timings in a unit test would be noise)."""
    from tests.conftest import SF_MEDIUM

    emb = catalog.table(spark, SF_MEDIUM, "embeddings")
    truth = _topk_sets(similarity.knn_bruteforce(emb))

    def mean_recall(planes, bands):
        got = _topk_sets(similarity.ann_lsh_topk(emb, n_planes=planes, n_bands=bands))
        return sum(
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ) / len(truth)

    plan = similarity.lsh_plan_for(emb.count())
    planned = mean_recall(*plan)
    static = {
        (p, b): mean_recall(p, b)
        for p, b in ((similarity.N_PLANES, 1), (similarity.N_PLANES, 4), (16, 1), (16, 4))
        if (p, b) != plan
    }
    assert all(planned >= r for r in static.values()), (plan, planned, static)


def test_knn_int8_zero_vector_no_nan(spark):
    """An all-zero embedding must quantize to zeros (guarded scale),
    not 0/0 = NaN — NaN scores diverge between engines."""
    import math

    from flink_ecommerce_spark.schemas import EMBEDDINGS_SCHEMA

    dim = similarity.EMB_DIM
    rows = [
        (0, [0.0] * dim, 0),                       # zero vector as a query
        (1, [1.0] + [0.0] * (dim - 1), 0),
        (2, [0.5] + [0.0] * (dim - 1), 0),
    ]
    emb = spark.createDataFrame(rows, EMBEDDINGS_SCHEMA)
    out = similarity.knn_int8(emb, k=2, n_queries=3).collect()
    assert out  # the join must still produce scored pairs
    for r in out:
        assert not math.isnan(r["cos_sim_q8"]), r
    # the zero vector's cosine against anything is exactly 0
    zero_scores = {r["cos_sim_q8"] for r in out if r["query_id"] == 0}
    assert zero_scores == {0.0}


def test_lsh_plan_for_sizing():
    # occupancy pinning goes BOTH ways: a tiny corpus gets few planes
    # (big buckets -> real recall; scanning half of 2k rows is cheap)
    assert similarity.lsh_plan_for(2_000) == (1, 1)
    assert similarity.lsh_plan_for(5_000) == (3, 1)
    # single-band while buckets stay >= the N_PLANES width
    assert similarity.lsh_plan_for(200_000) == (8, 1)
    # 100TB scale: planes grow with log2(n), bands recover recall
    planes, bands = similarity.lsh_plan_for(1_000_000_000)
    assert planes >= 19 and bands > 1
    # the bench rehearsal's premise: a 10x corpus (sf0.1 -> ~sf1
    # embeddings counts) must change the recommendation — the planner
    # moves with the data, it isn't a constant in disguise
    assert similarity.lsh_plan_for(5_000) != similarity.lsh_plan_for(50_000)
    # expected occupancy stays ~target as corpus grows 1000x
    p1, _ = similarity.lsh_plan_for(10_000_000)
    p2, _ = similarity.lsh_plan_for(10_000_000_000)
    assert 9 <= p2 - p1 <= 11


def test_ivf_index_reuse_across_query_batches(spark):
    """build once / probe many: two separate probe batches against
    one prebuilt index must union to exactly the fused ivf_topk
    answer for the combined query set."""
    from pyspark.sql import functions as F

    from flink_ecommerce_spark import catalog
    from tests.conftest import SF_SMALL

    emb = catalog.table(spark, SF_SMALL, "embeddings")
    assign, cents = similarity.build_ivf_index(emb)
    assign = assign.localCheckpoint(eager=True)  # "persisted" index

    def qbatch(lo, hi):
        return emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )

    probe_a = similarity.ivf_probe(assign, cents, qbatch(0, 5)).collect()
    probe_b = similarity.ivf_probe(assign, cents, qbatch(5, 10)).collect()
    fused = similarity.ivf_topk(emb, n_queries=10).collect()
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    got = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in probe_a + probe_b}
    want = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in fused}
    assert got == want and len(want) == 50


def test_knn_int8_recall_vs_float(spark):
    """int8 quantization must preserve most of the float top-k: the
    symmetric per-vector scale cancels in cosine, so the only loss is
    rounding of 64 components to 8 bits."""
    from flink_ecommerce_spark import catalog
    from tests.conftest import SF_SMALL

    emb = catalog.table(spark, SF_SMALL, "embeddings")
    truth = {}
    for r in similarity.knn_bruteforce(emb).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in similarity.knn_int8(emb).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(got[q] & n) / len(n) for q, n in truth.items()]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_pq_codes_shape_and_range(spark):
    """Every vector gets exactly PQ_M codes, each a valid codebook
    index (labels 0..9 are the deterministic codewords)."""
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    codes = similarity.pq_codes(emb).collect()
    assert len(codes) == n * similarity.PQ_M
    assert all(0 <= r["code"] < similarity.PQ_N_CODES for r in codes)
    assert all(0 <= r["m"] < similarity.PQ_M for r in codes)


def test_pq_adc_recall_vs_bruteforce(spark):
    """ADC over 8 one-byte codes must still mostly agree with exact
    cosine top-k — the quantization is lossy but not random."""
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    truth = _topk_sets(similarity.knn_bruteforce(emb))
    approx = _topk_sets(similarity.pq_ann_topk(emb))
    recalls = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.2, f"PQ ADC mean recall {mean_recall:.2f}"
    assert all(len(v) <= similarity.DEFAULT_K for v in approx.values())


def test_pq_adc_orders_reconstruction_distance(spark):
    """Sanity on the ADC metric itself: for a corpus vector, ADC
    distance equals the exact distance between the query subvectors
    and the vector's reconstructed codewords — so identical vectors
    (same codes) get identical ADC distances. Pin a weaker invariant
    that survives quantization: each query's OWN near-duplicate (if
    its codes match) ranks first."""
    from pyspark.sql import functions as F

    emb = catalog.table(spark, SF_SMALL, "embeddings")
    # duplicate query vectors under new ids: the duplicate shares all
    # codes with the query, so its ADC distance is the minimum
    # (reconstruction error only) and it must appear in the top-k
    base = emb.filter(F.col("vec_id") < similarity.DEFAULT_N_QUERIES)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    dups = base.select(
        (F.col("vec_id") + max_id + 1).alias("vec_id"), "embedding", "label"
    )
    approx = _topk_sets(similarity.pq_ann_topk(emb.unionByName(dups)))
    for q in range(similarity.DEFAULT_N_QUERIES):
        assert (q + max_id + 1) in approx[q], (
            f"query {q}: its exact duplicate missed the ADC top-k"
        )


def test_pq_rerank_beats_raw_adc_recall(spark):
    """The two-stage pattern must recover recall: exact re-rank of a
    50-candidate ADC shortlist can only improve on raw ADC top-k, and
    with a 10%-of-corpus shortlist it should approach brute force."""
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    truth = _topk_sets(similarity.knn_bruteforce(emb))
    adc = _topk_sets(similarity.pq_ann_topk(emb))
    rer = _topk_sets(similarity.pq_ann_rerank(emb))

    def mean_recall(approx):
        return sum(
            len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
        ) / len(truth)

    assert mean_recall(rer) >= mean_recall(adc)
    assert mean_recall(rer) >= 0.5, f"rerank recall {mean_recall(rer):.2f}"


def test_ivf_pq_recall_and_routing(spark):
    """IVF-PQ: results come only from routed cells (subset of
    ivf_topk's candidate discipline) and recall is pinned to a sane
    floor; every query returns <= k rows."""
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    truth = _topk_sets(similarity.knn_bruteforce(emb))
    got = _topk_sets(similarity.ivf_pq_topk(emb))
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.2
    assert all(len(v) <= similarity.DEFAULT_K for v in got.values())


def test_embedding_drift_detects_rotation_and_volume(spark):
    """Identical snapshots: cos=1, l2=0. A negated (180°-rotated)
    label: cos=-1. A label missing from one side: NULL geometry,
    NULL count on the absent side."""
    rows = [
        (1, [1.0, 0.0, 2.0], 0),
        (2, [0.0, 1.0, 2.0], 0),
        (3, [3.0, 4.0, 0.0], 1),
        (4, [1.0, 1.0, 1.0], 2),
    ]
    schema = "vec_id long, embedding array<float>, label int"
    old = spark.createDataFrame(rows, schema)
    same = similarity.embedding_drift(old, old)
    for r in same.collect():
        assert r["centroid_cos"] == 1.0 and r["centroid_l2"] == 0.0
        assert r["n_old"] == r["n_new"]

    flipped = [
        (10, [-1.0, 0.0, -2.0], 0),
        (11, [0.0, -1.0, -2.0], 0),
        (12, [3.0, 4.0, 0.0], 1),
    ]  # label 2 vanished in the new snapshot
    new = spark.createDataFrame(flipped, schema)
    got = {r["label"]: r for r in similarity.embedding_drift(old, new).collect()}
    assert got[0]["centroid_cos"] == -1.0
    assert got[1]["centroid_cos"] == 1.0 and got[1]["centroid_l2"] == 0.0
    assert got[2]["n_new"] is None and got[2]["centroid_cos"] is None
    assert got[2]["n_old"] == 1


def test_corpus_diversity_matches_literal_pairwise_mean(spark):
    """The closed form (||Σu||² − n)/(n(n−1)) must equal the literal
    mean over all ordered pairs' cosines, computed in NumPy."""
    import numpy as np

    rng = [
        [1.0, 0.0, 0.0],
        [0.8, 0.6, 0.0],
        [0.0, 1.0, 0.0],
        [0.5, 0.5, 0.70710678],
    ]
    rows = [(i, v, 0) for i, v in enumerate(rng)] + [(10, [2.0, 0.0, 0.0], 1)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["label"]: r for r in similarity.corpus_diversity(emb).collect()}

    m = np.array(rng, dtype=np.float64)
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = u @ u.T
    n = len(u)
    literal = (sims.sum() - np.trace(sims)) / (n * (n - 1))
    assert abs(got[0]["mean_pairwise_cos"] - literal) < 1e-5
    assert got[0]["n_vectors"] == 4
    # single-member label: no pairs -> NULL
    assert got[1]["mean_pairwise_cos"] is None
    assert got[1]["n_vectors"] == 1 and got[1]["mean_norm"] == 2.0


def test_topk_per_key_equals_single_window(spark):
    """Bucketed two-phase top-k must be row-identical to the plain
    per-key window under the same total order — including rounded-
    score TIES at the k boundary (engineered below: every score is
    drawn from 5 distinct values, so ties abound)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [
        (q, n, round(rng.choice([0.1, 0.2, 0.3, 0.4, 0.5]), 6))
        for q in range(4)
        for n in rng.sample(range(1000), 200)
    ]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos_sim double"
    )
    order = [F.desc("cos_sim"), F.asc("neighbor_id")]
    got = {
        tuple(r)
        for r in similarity.topk_per_key(
            scored, "query_id", order, 5, salt_col="neighbor_id"
        ).select("query_id", "neighbor_id", "cos_sim", "rk").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(*order)
    ref = {
        tuple(r)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == ref
