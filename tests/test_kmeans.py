"""K-means: Spark DataFrame implementation must match an independent
NumPy reference exactly (same deterministic init + iteration count)."""

from __future__ import annotations

import numpy as np

from flink_ecommerce_spark import catalog
from flink_ecommerce_spark.operators.clustering import kmeans_assign

from tests.conftest import SF_SMALL

K = 8
N_ITER = 5


def _numpy_kmeans(X, ids, k, n_iter):
    order = np.argsort(ids)
    cents = X[order[:k]].astype(np.float64).copy()
    assign = None
    for _ in range(n_iter):
        # 9dp distance / 6dp centroid quantization mirrors the
        # engine-portable determinism anchors in clustering.py
        d = np.round(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 9)
        assign = d.argmin(axis=1)  # first index on ties, like the Spark impl
        for c in range(k):
            pts = X[assign == c]
            if len(pts):
                cents[c] = np.round(pts.mean(axis=0), 6)
    return assign


def test_kmeans_matches_numpy_reference(spark):
    emb = catalog.table(spark, SF_SMALL, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    expected = _numpy_kmeans(X, ids, K, N_ITER)
    exp_map = {int(i): int(c) for i, c in zip(ids, expected)}

    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, k=K, n_iter=N_ITER).collect()
    }
    mismatches = [i for i in exp_map if got[i] != exp_map[i]]
    assert not mismatches, f"{len(mismatches)} assignment mismatches: {mismatches[:5]}"
    # sanity: more than one cluster in use
    assert len(set(got.values())) > 1
